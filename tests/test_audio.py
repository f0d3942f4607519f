"""WAV/PCM codec + audio stages (solaris_ray/stages/audio.py)."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages import audio


def test_wav_roundtrip_mono():
    s = (np.arange(1000) % 997 - 498).astype(np.int16)
    buf = audio.wav_encode(s, rate=8000)
    back, rate = audio.wav_decode(buf)
    assert rate == 8000 and back.shape == (1000, 1)
    assert np.array_equal(back[:, 0], s)


def test_wav_roundtrip_stereo_and_float_input():
    rng = np.random.default_rng(3)
    f = rng.uniform(-1, 1, (500, 2))
    buf = audio.wav_encode(f, rate=44100)
    back, rate = audio.wav_decode(buf)
    assert rate == 44100 and back.shape == (500, 2)
    assert np.abs(back - np.round(f * 32767)).max() <= 1


def test_wav_decode_skips_extra_chunks_and_pcm8():
    import struct

    s8 = np.array([0, 128, 255, 64], np.uint8)
    data = s8.tobytes()
    extra = b"LIST" + struct.pack("<I", 4) + b"INFO"
    buf = (
        b"RIFF" + struct.pack("<I", 36 + len(extra) + len(data)) + b"WAVE"
        + extra
        + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 8000, 8000, 1, 8)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    back, rate = audio.wav_decode(buf)
    assert rate == 8000 and back.shape == (4, 1)
    assert back[0, 0] == -32768 and back[1, 0] == 0


def test_wav_decode_float32():
    import struct

    f = np.array([0.0, 0.5, -0.5, 1.0], "<f4")
    data = f.tobytes()
    buf = (
        b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE"
        + b"fmt " + struct.pack("<IHHIIHH", 16, 3, 1, 16000, 64000, 4, 32)
        + b"data" + struct.pack("<I", len(data)) + data
    )
    back, rate = audio.wav_decode(buf)
    assert rate == 16000
    assert list(back[:, 0]) == [0, 16384, -16384, 32767]


def test_wav_garbage_raises():
    with pytest.raises(ValueError):
        audio.wav_decode(b"not a wav")
    with pytest.raises(ValueError):
        audio.wav_decode(b"RIFF\x00\x00\x00\x00WAVE")  # no fmt/data


def test_audio_stats_exact():
    s = np.array([3, -4, 0, 5], np.int16)  # sum sq = 50
    tbl = pa.table(
        {"media_id": pa.array(["a"]), "bytes": pa.array([audio.wav_encode(s, 8000)])}
    )
    out = audio.AudioStats()(tbl).to_pylist()[0]
    assert out["n_samples"] == 4 and out["rate"] == 8000 and out["peak"] == 5
    assert out["rms6"] == round((50 / 4) ** 0.5, 6)
    assert out["duration6"] == round(4 / 8000, 6)


def test_audio_clips_tumbling_and_ragged_tail():
    s = np.arange(2500, dtype=np.int16)
    tbl = pa.table(
        {"media_id": pa.array(["a"]), "bytes": pa.array([audio.wav_encode(s, 1000)])}
    )
    out = audio.AudioClips(clip_s=1.0)(tbl).to_pandas()
    # 2500 samples @ 1000 Hz, 1 s clips: two full + one 500-sample tail
    # (>= 0.5 of a clip -> kept)
    assert list(out["clip_idx"]) == [0, 1, 2]
    assert list(out["n_samples"]) == [1000, 1000, 500]
    back, rate = audio.wav_decode(out.iloc[2]["bytes"])
    assert rate == 1000 and np.array_equal(back[:, 0], s[2000:])
    # tail below min_frac is dropped
    out2 = audio.AudioClips(clip_s=1.0, min_frac=0.6)(tbl).to_pandas()
    assert list(out2["clip_idx"]) == [0, 1]


# --- G.711 / ADPCM codecs (round 4b) ---------------------------------------


def test_g711_code_idempotence():
    """expand->compress is the identity on codes (except mu-law 0x7F,
    G.711's 'negative zero', which re-encodes as positive zero 0xFF)."""
    codes = np.arange(256, dtype=np.uint8)
    u = audio.ulaw_compress(audio.ulaw_expand(codes))
    mismatch = np.nonzero(u != codes)[0]
    assert list(mismatch) == [0x7F] and u[0x7F] == 0xFF
    assert np.array_equal(audio.alaw_compress(audio.alaw_expand(codes)), codes)


def test_g711_matches_audioop_reference():
    """Bit-exact vs CPython's audioop (the canonical Sun g711.c)."""
    audioop = pytest.importorskip("audioop")
    x = np.arange(-32768, 32768, dtype=np.int16)
    raw = x.astype("<i2").tobytes()
    codes = np.arange(256, dtype=np.uint8)
    assert np.array_equal(
        np.frombuffer(audioop.lin2ulaw(raw, 2), np.uint8), audio.ulaw_compress(x))
    assert np.array_equal(
        np.frombuffer(audioop.ulaw2lin(codes.tobytes(), 2), "<i2"),
        audio.ulaw_expand(codes))
    assert np.array_equal(
        np.frombuffer(audioop.lin2alaw(raw, 2), np.uint8), audio.alaw_compress(x))
    assert np.array_equal(
        np.frombuffer(audioop.alaw2lin(codes.tobytes(), 2), "<i2"),
        audio.alaw_expand(codes))


def test_adpcm_transition_matches_audioop():
    """The IMA decode transition function is bit-exact vs audioop's
    adpcm2lin (Jansen adpcm.c) given the same state.  audioop's raw
    stream is high-nibble-first; WAV IMA blocks are low-first, so the
    comparison feeds pair-swapped nibbles."""
    audioop = pytest.importorskip("audioop")
    rng = np.random.default_rng(3)
    nibs = rng.integers(0, 16, size=400, dtype=np.uint8)
    packed = (nibs[0::2] | (nibs[1::2] << 4)).astype(np.uint8).tobytes()
    ref = np.frombuffer(audioop.adpcm2lin(packed, 2, (0, 0))[0], "<i2")
    order = nibs.reshape(-1, 2)[:, ::-1].reshape(-1)
    mine = audio._ima_decode_blocks(order[None, :], np.array([0]), np.array([0]))[0]
    assert np.array_equal(ref, mine[1:])


def test_g711_wav_roundtrip_error_bound():
    rng = np.random.default_rng(7)
    sig = rng.normal(0, 6000, 4000).clip(-32768, 32767).astype(np.int16)
    for law, bound in (("ulaw", 1024), ("alaw", 512)):
        back, rate = audio.wav_decode(audio.wav_encode_g711(sig, 8000, law))
        assert rate == 8000 and back.shape == (4000, 1)
        err = np.abs(back[:, 0].astype(np.int32) - sig.astype(np.int32))
        assert err.max() <= bound


def test_adpcm_wav_roundtrip_snr_and_lengths():
    t = np.arange(20000) / 8000.0
    sig = (8000 * np.sin(2 * np.pi * 440 * t)).astype(np.int16)
    back, rate = audio.wav_decode(audio.wav_encode_adpcm(sig, 8000))
    assert rate == 8000 and back.shape[0] == len(sig)
    noise = back[:, 0].astype(np.float64) - sig
    snr = 10 * np.log10((sig.astype(np.float64) ** 2).sum() / (noise ** 2).sum())
    assert snr > 22.0
    # ragged tails across block boundaries (spb=505 at block_align=256)
    rng = np.random.default_rng(11)
    for n in (1, 2, 504, 505, 506, 1011):
        x = rng.integers(-20000, 20000, n).astype(np.int16)
        y, _ = audio.wav_decode(audio.wav_encode_adpcm(x, 8000))
        assert y.shape[0] == n


def test_audio_stats_over_g711_and_adpcm():
    """AudioStats consumes compressed WAVs through the same decode seam."""
    s = (np.sin(np.arange(800) / 20.0) * 12000).astype(np.int16)
    tbl = pa.table({
        "media_id": pa.array(["u", "a", "i"]),
        "bytes": pa.array([
            audio.wav_encode_g711(s, 8000, "ulaw"),
            audio.wav_encode_g711(s, 8000, "alaw"),
            audio.wav_encode_adpcm(s, 8000),
        ]),
    })
    out = audio.AudioStats()(tbl).to_pandas().set_index("media_id")
    ref_rms = float(np.sqrt((s.astype(np.int64) ** 2).sum() / len(s)))
    for mid in ("u", "a", "i"):
        assert out.loc[mid, "n_samples"] == 800
        assert out.loc[mid, "rate"] == 8000
        assert abs(out.loc[mid, "rms6"] - ref_rms) / ref_rms < 0.05


# --- resample + spectrogram (round 4b) --------------------------------------


def test_resample_length_math_and_flat_exact():
    import math

    rng = np.random.default_rng(21)
    for n, src, dst in ((8000, 8000, 16000), (8000, 44100, 16000),
                        (999, 16000, 8000), (100, 22050, 16000)):
        x = rng.integers(-1000, 1000, n).astype(np.int16)
        y = audio.resample_audio(x, src, dst)
        g = math.gcd(src, dst)
        assert y.shape == (-(-n * (dst // g) // (src // g)), 1)
    flat = np.full(5000, 1234, np.int16)
    y = audio.resample_audio(flat, 8000, 16000)[:, 0]
    # unity-DC-gain phases: flat passes exactly away from the edges
    assert np.array_equal(y[24:-24], np.full(len(y) - 48, 1234))


def test_resample_preserves_bandlimited_tone():
    i = np.arange(8000, dtype=np.float64)
    s = (10000 * np.sin(2 * np.pi * 440 * i / 8000)).astype(np.int16)
    y = audio.resample_audio(s, 8000, 16000)[:, 0]
    rms_in = np.sqrt((s.astype(np.float64) ** 2).mean())
    rms_out = np.sqrt((y.astype(np.float64) ** 2).mean())
    assert abs(rms_out / rms_in - 1.0) < 0.01
    # downsample back and compare against the original (interior)
    z = audio.resample_audio(y, 16000, 8000)[:, 0]
    err = np.abs(z[100:-100].astype(np.float64) - s[100:len(z)-100])
    assert err.max() < 200  # < 2% of amplitude


def test_spectrogram_parseval_and_dominant_bin():
    i = np.arange(4096, dtype=np.float64)
    s = (12000 * np.sin(2 * np.pi * 1000 * i / 8000)).astype(np.int16)
    tbl = pa.table({"media_id": pa.array(["x"]),
                    "bytes": pa.array([audio.wav_encode(s, 8000)])})
    out = audio.AudioSpectrogram(win=256, hop=128)(tbl).to_pandas()
    assert len(out) == (4096 - 256) // 128 + 1
    assert out["parseval_ok"].min() == 1
    # 1000 Hz at 8 kHz, win 256 -> bin 32
    assert (out["dominant_bin"] == 32).all()
    # exact time energy for frame 0
    te0 = int((s[:256].astype(np.int64) ** 2).sum())
    assert out.iloc[0]["time_energy"] == te0


def test_resample_stage_over_compressed_input():
    """AudioResample decodes through the sniffer, so FLAC input works."""
    from solaris_ray.stages.flac import flac_encode

    i = np.arange(4000, dtype=np.float64)
    s = (8000 * np.sin(2 * np.pi * 300 * i / 8000)).astype(np.int16)
    tbl = pa.table({"media_id": pa.array(["f"]),
                    "bytes": pa.array([flac_encode(s, 8000)])})
    out = audio.AudioResample(16000)(tbl).to_pandas()
    assert out.iloc[0]["n_out"] == 8000
    assert abs(out.iloc[0]["rms_ratio6"] - 1.0) < 0.02
    back, rate = audio.wav_decode(out.iloc[0]["bytes"])
    assert rate == 16000 and back.shape[0] == 8000


def test_fingerprint_invariances_and_separation():
    fps = {}
    for base in range(6):
        i = np.arange(6000, dtype=np.float64)
        s = (5000 * np.sin(2 * np.pi * (200 + 90 * base) * i / 8000)
             + 2500 * np.sin(2 * np.pi * (700 + 55 * base) * i / 8000)
             ).astype(np.int16)
        variants = [s, (s.astype(np.int32) * 2).astype(np.int16),
                    (-s.astype(np.int32)).astype(np.int16)]
        tbl = pa.table({
            "media_id": pa.array(list(range(3)), pa.int64()),
            "bytes": pa.array([audio.wav_encode(v, 8000) for v in variants]),
        })
        out = audio.AudioFingerprint()(tbl).to_pandas()
        assert out["afp"].nunique() == 1  # scale/sign invariant
        fps[base] = out["afp"].iloc[0]
    assert len(set(fps.values())) == 6  # distinct content separates


def test_silence_segments_merging_and_energy():
    sig = np.zeros(256 * 20, np.int16)
    sig[256 * 3:256 * 6] = 3000   # frames 3..5
    sig[256 * 8:256 * 9] = 3000   # frame 8 (isolated)
    sig[256 * 14:256 * 15] = 3000  # frames 14 and 16 with a 1-frame gap
    sig[256 * 16:256 * 17] = 3000
    tbl = pa.table({"media_id": pa.array(["v"]),
                    "bytes": pa.array([audio.wav_encode(sig, 8000)])})
    out = audio.SilenceSegments(win=256, threshold=1_000_000,
                                max_gap=1)(tbl).to_pandas()
    # gap of exactly 1 frame (15) merges 14 and 16 into one segment
    assert out[["start_frame", "end_frame"]].values.tolist() == [
        [3, 6], [8, 9], [14, 17]]
    # energy counts only the active frames' samples (gap frame is 0)
    assert out.iloc[2]["energy"] == 2 * 256 * 3000 * 3000
    # max_gap=0: no merging
    out0 = audio.SilenceSegments(win=256, threshold=1_000_000,
                                 max_gap=0)(tbl).to_pandas()
    assert len(out0) == 4


def test_fingerprint_preserves_string_media_ids():
    """Review finding: AudioFingerprint hardcoded int64 ids; it must
    pass through the input id column type like every sibling stage."""
    i = np.arange(6000, dtype=np.float64)
    s = (5000 * np.sin(2 * np.pi * 300 * i / 8000)).astype(np.int16)
    tbl = pa.table({
        "media_id": pa.array(["aud_1", "aud_2"]),
        "bytes": pa.array([audio.wav_encode(s, 8000)] * 2),
    })
    out = audio.AudioFingerprint()(tbl).to_pandas()
    assert list(out["media_id"]) == ["aud_1", "aud_2"]
    assert out["afp"].iloc[0] == out["afp"].iloc[1]


def test_mel_bands_partition_of_unity_and_dominant_band():
    from solaris_ray.stages.audio import AudioMelBands, _mel_filterbank

    fb = _mel_filterbank(20, 129, 8000)
    assert np.allclose(fb.sum(axis=0), 1.0)  # partition of unity
    i = np.arange(4096, dtype=np.float64)
    for hz in (300, 1000, 3000):
        s = (12000 * np.sin(2 * np.pi * hz * i / 8000)).astype(np.int16)
        tbl = pa.table({"media_id": pa.array(["m"]),
                        "bytes": pa.array([audio.wav_encode(s, 8000)])})
        out = AudioMelBands()(tbl).to_pandas()
        assert out["conserve_ok"].min() == 1
        # higher tone -> higher (or equal) dominant mel band
        if hz == 300:
            low_band = out["top_mel"].mode()[0]
        elif hz == 3000:
            assert out["top_mel"].mode()[0] > low_band
