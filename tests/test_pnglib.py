"""libpng decode path: parity with the pure decoder + foreign-PNG space.

Foreign variants are hand-built with test-local writers (adaptive
filters, palette, 16-bit) — streams the repo's own encoder never
emits, so the fast path's generality is tested against the spec, not
against itself.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from solaris_ray.raster import codec
from solaris_ray.raster.pnglib import available, png_decode_fast

pytestmark = pytest.mark.skipif(not available(), reason="libpng not present")

RNG = np.random.default_rng(11)


def _chunk(tag, payload):
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _write_filtered_png(arr, filters):
    """8-bit RGB PNG using the given per-row filter types (test-local)."""
    h, w, c = arr.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = bytearray()
    prev = np.zeros(w * c, dtype=np.int32)
    for y in range(h):
        line = arr[y].reshape(-1).astype(np.int32)
        f = filters[y % len(filters)]
        raw.append(f)
        if f == 0:
            enc = line
        elif f == 1:  # Sub
            enc = line.copy()
            enc[c:] -= line[:-c]
        elif f == 2:  # Up
            enc = line - prev
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(c, np.int32), line[:-c]])
            enc = line - ((left + prev) >> 1)
        else:  # Paeth
            enc = np.empty_like(line)
            for x in range(w * c):
                a = int(line[x - c]) if x >= c else 0
                b = int(prev[x])
                cc = int(prev[x - c]) if x >= c else 0
                enc[x] = line[x] - _paeth(a, b, cc)
        raw += (enc & 0xFF).astype(np.uint8).tobytes()
        prev = line
    return (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def test_parity_with_pure_decoder_on_own_streams():
    for shape in [(64, 96, 3), (37, 23, 4), (50, 40)]:
        img = RNG.integers(0, 256, size=shape, dtype=np.uint8)
        buf = codec.png_encode(img, level=4)
        assert np.array_equal(codec.png_decode(buf), png_decode_fast(buf))


@pytest.mark.parametrize("filters", [[1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_foreign_filtered_png(filters):
    img = RNG.integers(0, 256, size=(23, 31, 3), dtype=np.uint8)
    buf = _write_filtered_png(img, filters)
    assert np.array_equal(png_decode_fast(buf), img)
    # the pure decoder also reads filters 1-4 (slow path) — cross-check
    assert np.array_equal(codec.png_decode(buf), img)


def test_foreign_palette_png():
    pal = RNG.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = RNG.integers(0, 16, size=(20, 20), dtype=np.uint8)
    ihdr = struct.pack(">IIBBBBB", 20, 20, 8, 3, 0, 0, 0)  # color type 3
    raw = b"".join(b"\x00" + idx[y].tobytes() for y in range(20))
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"PLTE", pal.tobytes())
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = png_decode_fast(buf)
    assert np.array_equal(out, pal[idx])


def test_foreign_16bit_png_narrows_to_8():
    img16 = RNG.integers(0, 65536, size=(12, 17, 3), dtype=np.uint16)
    ihdr = struct.pack(">IIBBBBB", 17, 12, 16, 2, 0, 0, 0)
    raw = b"".join(b"\x00" + img16[y].astype(">u2").tobytes() for y in range(12))
    buf = (
        b"\x89PNG\r\n\x1a\n"
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw))
        + _chunk(b"IEND", b"")
    )
    out = png_decode_fast(buf)
    assert out.shape == (12, 17, 3) and out.dtype == np.uint8
    # png_image semantics: 16-bit samples are linear light, so the
    # 8-bit narrowing applies the sRGB transfer; assert against it
    lin = img16.astype(np.float64) / 65535.0
    # png_image's 16->8 narrowing encodes with a pure gamma-2.2 power
    # law (empirically exact, not the piecewise sRGB transfer)
    expect = np.round(255.0 * lin ** (1 / 2.2))
    assert np.abs(out.astype(float) - expect).max() <= 3  # fixed-point table slop


def test_codec_decode_routes_through_fast_path():
    img = RNG.integers(0, 256, size=(33, 44, 3), dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(img, "png"), "png"), img)
    assert np.array_equal(codec.decode(codec.encode(img, "qnt"), "qnt") >> 3, img >> 3)
