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
