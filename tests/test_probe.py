"""Container probing (solaris_ray/stages/probe.py)."""

import struct

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.probe import (
    MediaProbe, make_mp3, make_ogg_vorbis, media_probe, mp3_probe, ogg_probe)


def test_mp3_frame_walk_and_id3_skip():
    m = mp3_probe(make_mp3(50, 44100, 128, stereo=True))
    assert (m["n_frames"], m["sample_rate"], m["channels"]) == (50, 44100, 2)
    assert m["duration6"] == round(50 * 1152 / 44100, 6)
    assert m["vbr"] == 0 and m["bitrate_kbps"] == 128
    m2 = mp3_probe(make_mp3(30, 32000, 64, stereo=False, id3=True))
    assert (m2["n_frames"], m2["channels"], m2["bitrate_kbps"]) == (30, 1, 64)


def test_mp3_xing_vbr_shortcut():
    """A Xing header in the first frame reports the frame count
    without walking the stream."""
    base = make_mp3(5, 44100, 128, stereo=True)
    flen = 144 * 128 * 1000 // 44100
    first = bytearray(base[:flen])
    xing = b"Xing" + struct.pack(">I", 1) + struct.pack(">I", 9999)
    first[36:36 + len(xing)] = xing  # MPEG1 stereo side info = 32 bytes
    m = mp3_probe(bytes(first) + base[flen:])
    assert m["n_frames"] == 9999 and m["vbr"] == 1
    assert m["duration6"] == round(9999 * 1152 / 44100, 6)


def test_ogg_vorbis_probe():
    o = ogg_probe(make_ogg_vorbis(48000, 16000, 1, 3))
    assert o["codec"] == "vorbis" and o["sample_rate"] == 16000
    assert o["duration6"] == 3.0 and o["n_pages"] == 4
    st = ogg_probe(make_ogg_vorbis(44100, 44100, 2, 5))
    assert st["channels"] == 2 and st["duration6"] == 1.0


def test_media_probe_sniffs_all_containers():
    from solaris_ray.stages.audio import wav_encode
    from solaris_ray.stages.flac import flac_encode
    from solaris_ray.stages.video import avi_encode

    s = (np.arange(4000) % 997 - 498).astype(np.int16)
    cases = {
        "wav": (wav_encode(s, 8000), ("wav", "pcm", 8000, 4000)),
        "flac": (flac_encode(s, 16000), ("flac", "flac", 16000, 4000)),
        "mp3": (make_mp3(20, 44100), ("mp3", "mp3", 44100, 20)),
        "ogg": (make_ogg_vorbis(32000, 16000), ("ogg", "vorbis", 16000, 4)),
        "avi": (avi_encode(np.full((4, 32, 48, 3), 128, np.uint8), fps=5),
                ("avi", "mjpeg", 5, 4)),
    }
    tbl = pa.table({
        "media_id": pa.array(list(cases)),
        "bytes": pa.array([v[0] for v in cases.values()]),
    })
    out = MediaProbe()(tbl).to_pandas().set_index("media_id")
    for mid, (_, (cont, codec, rate, units)) in cases.items():
        row = out.loc[mid]
        assert (row["container"], row["codec"]) == (cont, codec)
        assert (row["sample_rate"], row["n_units"]) == (rate, units)


def test_probe_garbage_raises():
    with pytest.raises(ValueError):
        media_probe(b"\x00" * 100)
    with pytest.raises(ValueError):
        mp3_probe(b"ID3\x03\x00\x00\x00\x00\x00\x10" + b"\x00" * 16)
    with pytest.raises(ValueError):
        ogg_probe(b"OggX" + b"\x00" * 60)


def test_probe_truncation_fuzz():
    """Truncated prefixes of every container either raise ValueError
    or return consistent metadata — no struct errors or hangs."""
    from solaris_ray.stages.audio import wav_encode
    from solaris_ray.stages.flac import flac_encode
    from solaris_ray.stages.video import avi_encode

    s = (np.arange(1200) % 601 - 300).astype(np.int16)
    bufs = [
        wav_encode(s, 8000),
        flac_encode(s, 8000),
        make_mp3(12, 44100),
        make_ogg_vorbis(8000, 16000),
        avi_encode(np.full((3, 32, 48, 3), 128, np.uint8), fps=5),
    ]
    for buf in bufs:
        for cut in range(1, len(buf), max(1, len(buf) // 37)):
            try:
                m = media_probe(buf[:cut])
                assert m["sample_rate"] > 0
            except ValueError:
                pass


def test_header_probe_agrees_with_decoders():
    """Header-only probe numbers must equal full-decode numbers for
    every wav format family and flac."""
    from solaris_ray.stages.audio import (
        wav_decode, wav_encode, wav_encode_adpcm, wav_encode_g711)
    from solaris_ray.stages.flac import flac_encode

    s = (np.arange(3700) % 601 - 300).astype(np.int16)
    cases = {
        "pcm": wav_encode(s, 8000),
        "g711u": wav_encode_g711(s, 8000, "ulaw"),
        "g711a": wav_encode_g711(s, 8000, "alaw"),
        "adpcm": wav_encode_adpcm(s, 8000),
        "flac": flac_encode(s, 16000),
    }
    for codec, buf in cases.items():
        m = media_probe(buf)
        assert m["codec"] == codec
        if codec == "flac":
            from solaris_ray.stages.flac import flac_decode
            dec, rate = flac_decode(buf)
        else:
            dec, rate = wav_decode(buf)
        assert m["n_units"] == dec.shape[0], codec
        assert m["sample_rate"] == rate
        assert m["channels"] == dec.shape[1]


def test_mpeg2_mono_xing_and_zero_rate_guards():
    """Review findings: Xing window must not wrap negative for MPEG2
    mono (side info 9 bytes), and corrupt zero-rate/zero-fps headers
    raise ValueError, not ZeroDivisionError."""
    # MPEG2 mono frame: version bits 10, layer III, 16 kHz, 64 kbps
    from solaris_ray.stages.probe import _MP3_BITRATE_V2_L3

    bi = _MP3_BITRATE_V2_L3.index(64)
    hdr = bytes([0xFF, 0xF3, (bi << 4) | (2 << 2), 3 << 6])
    flen = 72 * 64 * 1000 // 16000
    frame = bytearray(hdr + b"\x00" * (flen - 4))
    xing = b"Xing" + struct.pack(">I", 1) + struct.pack(">I", 777)
    frame[13:13 + len(xing)] = xing  # 4-byte header + 9-byte side info
    m = mp3_probe(bytes(frame) * 3)
    assert m["n_frames"] == 777 and m["vbr"] == 1

    from solaris_ray.stages.audio import wav_encode
    from solaris_ray.stages.video import avi_encode

    wav = bytearray(wav_encode(np.zeros(100, np.int16), 8000))
    wav[24:28] = b"\x00\x00\x00\x00"  # rate = 0
    with pytest.raises(ValueError):
        media_probe(bytes(wav))

    avi = bytearray(avi_encode(np.full((2, 16, 16, 3), 99, np.uint8), fps=5))
    i = avi.find(b"avih") + 8
    avi[i:i + 4] = b"\x00\x00\x00\x00"  # us_per_frame = 0 -> fps 0
    with pytest.raises(ValueError):
        media_probe(bytes(avi))


def test_ogg_opus_probe_pre_skip():
    from solaris_ray.stages.probe import make_ogg_opus

    o = ogg_probe(make_ogg_opus(96000, pre_skip=312, channels=2))
    assert o["codec"] == "opus" and o["sample_rate"] == 48000
    assert o["channels"] == 2
    assert o["duration6"] == 2.0  # granule minus pre-skip, at 48 kHz
    m = media_probe(make_ogg_opus(48000))
    assert (m["container"], m["codec"], m["duration6"]) == ("ogg", "opus", 1.0)


def test_mp3_vbri_header():
    """Fraunhofer VBRI (offset 32 after the frame header): frame count
    at VBRI+14 shortcuts the walk."""
    base = make_mp3(5, 44100, 128, stereo=True)
    flen = 144 * 128 * 1000 // 44100
    first = bytearray(base[:flen])
    vbri = (b"VBRI" + struct.pack(">HHH", 1, 0, 80)
            + struct.pack(">I", 123456) + struct.pack(">I", 4321))
    first[36:36 + len(vbri)] = vbri
    m = mp3_probe(bytes(first) + base[flen:])
    assert m["n_frames"] == 4321 and m["vbr"] == 1
    assert m["duration6"] == round(4321 * 1152 / 44100, 6)
