"""GIF codec: LZW roundtrip, palettes, interlace, extensions, limits."""

import struct

import numpy as np
import pytest

from solaris_ray.raster.gif import (
    _lzw_decode,
    _lzw_encode,
    gif_decode,
    gif_encode,
)


def test_lzw_roundtrip_patterns():
    for mcs, data in [
        (8, bytes(range(256)) * 3),
        (8, b"\x00" * 5000),                 # long runs force k-w-k chains
        (2, bytes([0, 1, 2, 3] * 100)),
        (8, np.random.RandomState(1).randint(0, 256, 20000, np.uint8).tobytes()),
    ]:
        enc = _lzw_encode(data, mcs)
        assert _lzw_decode(enc, mcs, len(data)) == data


def test_lzw_kwk_special_case():
    # 'ababab...' exercises code == next_code on decode
    data = b"abababababababab"
    enc = _lzw_encode(data, 8)
    assert _lzw_decode(enc, 8, len(data)) == data


def test_gray_roundtrip_exact():
    rng = np.random.RandomState(7)
    for h, w in [(1, 1), (5, 3), (64, 48)]:
        img = rng.randint(0, 256, (h, w), np.uint8)
        dec = gif_decode(gif_encode(img))
        assert dec.shape == (h, w, 3)
        for c in range(3):
            assert np.array_equal(dec[:, :, c], img)


def test_table_overflow_emits_clear_and_survives():
    # >4096 distinct phrases forces the CLEAR-on-full path
    rng = np.random.RandomState(3)
    img = rng.randint(0, 256, (128, 128), np.uint8)
    dec = gif_decode(gif_encode(img))
    assert np.array_equal(dec[:, :, 0], img)


def test_paletted_roundtrip():
    pal = np.array([[255, 0, 0], [0, 255, 0], [0, 0, 255], [9, 9, 9]], np.uint8)
    idx = np.array([[0, 1, 2], [3, 2, 1]], np.uint8)
    dec = gif_decode(gif_encode(idx, palette=pal))
    assert np.array_equal(dec, pal[idx])


def test_index_exceeding_palette_raises():
    pal = np.zeros((2, 3), np.uint8)
    with pytest.raises(ValueError, match="palette"):
        gif_encode(np.array([[0, 5]], np.uint8), palette=pal)


def _descriptor_offset(buf) -> int:
    # header(6) + logical screen descriptor(7) + global color table
    return 13 + (2 << (buf[10] & 0x07)) * 3


def test_extension_blocks_are_skipped():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    buf = bytearray(gif_encode(img))
    # splice a Graphic Control Extension right before the image block
    i = _descriptor_offset(buf)
    assert buf[i] == 0x2C
    gce = b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    buf[i:i] = gce
    dec = gif_decode(bytes(buf))
    assert np.array_equal(dec[:, :, 0], img)


def test_interlaced_stream_decodes():
    # build an interlaced variant by hand: rows permuted per the 4-pass
    # order, interlace flag set
    img = (np.arange(64, dtype=np.uint8).reshape(8, 8) * 4)
    h = 8
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    plain = bytearray(gif_encode(img[order]))
    i = _descriptor_offset(plain)
    assert plain[i] == 0x2C
    # image descriptor packed byte is at offset i+9
    plain[i + 9] |= 0x40
    dec = gif_decode(bytes(plain))
    assert np.array_equal(dec[:, :, 0], img)


def test_rejects_non_gif():
    with pytest.raises(ValueError, match="not a GIF"):
        gif_decode(b"PNG....")


def test_container_fields():
    img = np.zeros((4, 6), np.uint8)
    buf = gif_encode(img)
    assert buf[:6] == b"GIF89a"
    w, h = struct.unpack_from("<HH", buf, 6)
    assert (w, h) == (6, 4)
    assert buf[-1] == 0x3B


def test_codec_dispatch():
    from solaris_ray.raster import codec

    img = np.arange(48, dtype=np.uint8).reshape(6, 8) * 5
    buf = codec.encode(img, "gif")
    dec = codec.decode(buf, "gif")
    assert np.array_equal(dec[:, :, 0], img)


def test_truncated_streams_raise_valueerror():
    img = np.arange(64, dtype=np.uint8).reshape(8, 8) * 3
    buf = gif_encode(img)
    for cut in (4, 12, 14, len(buf) // 2, len(buf) - 2):
        with pytest.raises(ValueError):
            gif_decode(buf[:cut])


def test_codec_encode_gray_as_rgb_and_color_refused():
    from solaris_ray.raster import codec

    g = np.arange(16, dtype=np.uint8).reshape(4, 4) * 10
    rgb = np.repeat(g[:, :, None], 3, axis=2)
    dec = codec.decode(codec.encode(rgb, "gif"), "gif")
    assert np.array_equal(dec[:, :, 0], g)
    color = rgb.copy()
    color[0, 0, 1] += 1
    with pytest.raises(ValueError, match="palette"):
        codec.encode(color, "gif")
