"""Foreign baseline-TIFF decode: streams our encoder never writes.

The reference accepts arbitrary GDAL-readable TIFFs
(/root/reference/solaris/utils/io.py:6-151); gtiff_decode must read the
common baseline space — both byte orders, multi-strip chunky layout,
Deflate / PackBits / LZW compression, horizontal-differencing
predictor — not just its own encoder's output.  These tests hand-build
each variant with independent mini-encoders (test-local, spec-derived)
and require exact pixel recovery.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from solaris_ray.raster.gtiff import gtiff_decode, gtiff_encode


def _packbits(raw: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(raw), 128):
        chunk = raw[i : i + 128]
        out.append(len(chunk) - 1)
        out += chunk
    return bytes(out)


def _lzw(raw: bytes) -> bytes:
    """Minimal TIFF-LZW encoder (MSB-first, early code-width change)."""
    out_bits: list[tuple[int, int]] = []
    table = {bytes([i]): i for i in range(256)}
    nxt, width = 258, 9
    out_bits.append((256, width))
    wbuf = b""
    for byte in raw:
        t = wbuf + bytes([byte])
        if t in table:
            wbuf = t
        else:
            out_bits.append((table[wbuf], width))
            table[t] = nxt
            nxt += 1
            if nxt == (1 << width):  # early change
                if width < 12:
                    width += 1
                else:
                    out_bits.append((256, width))
                    table = {bytes([i]): i for i in range(256)}
                    nxt, width = 258, 9
            wbuf = bytes([byte])
    if wbuf:
        out_bits.append((table[wbuf], width))
    out_bits.append((257, width))
    bb = nb = 0
    enc = bytearray()
    for code, wd in out_bits:
        bb = (bb << wd) | code
        nb += wd
        while nb >= 8:
            enc.append((bb >> (nb - 8)) & 0xFF)
            nb -= 8
    if nb:
        enc.append((bb << (8 - nb)) & 0xFF)
    return bytes(enc)


def build_tiff(arr, compression=1, predictor=1, rows_per_strip=None, bo="<"):
    """Assemble a chunky baseline TIFF byte-by-byte (test-local writer)."""
    h, w, c = arr.shape
    rps = rows_per_strip or h
    strips = []
    for y0 in range(0, h, rps):
        rows = arr[y0 : y0 + rps]
        data = rows
        if predictor == 2:
            d = rows.reshape(rows.shape[0], -1, c).astype(np.int16)
            d[:, 1:] = np.diff(rows.reshape(rows.shape[0], -1, c).astype(np.int16), axis=1)
            data = (d & 0xFF).astype(np.uint8)
        raw = data.tobytes()
        if compression == 8:
            raw = zlib.compress(raw)
        elif compression == 32773:
            raw = _packbits(raw)
        elif compression == 5:
            raw = _lzw(raw)
        strips.append(raw)
    E = bo
    n_strips = len(strips)
    tags: list[tuple[int, int, int, bytes]] = []

    def tag(t, type_, vals):
        fmt = {3: "H", 4: "I"}[type_]
        tags.append((t, type_, len(vals), struct.pack(f"{E}{len(vals)}{fmt}", *vals)))

    tag(256, 3, [w])
    tag(257, 3, [h])
    tag(258, 3, [8] * c)
    tag(259, 3, [compression])
    tag(262, 3, [2])
    tag(277, 3, [c])
    tag(278, 3, [rps])
    tag(284, 3, [1])
    if predictor != 1:
        tag(317, 3, [predictor])
    tag(273, 4, [0] * n_strips)
    tag(279, 4, [len(s) for s in strips])
    tags.sort()
    n = len(tags)
    overflow_off = 8 + 2 + 12 * n + 4
    osize = sum(len(p) for _, _, _, p in tags if len(p) > 4)
    strip_base = overflow_off + osize
    offs = []
    p = strip_base
    for s in strips:
        offs.append(p)
        p += len(s)
    entries = bytearray()
    overflow = bytearray()
    opos = overflow_off
    for t, ty, cnt, payload in tags:
        if t == 273:
            payload = struct.pack(f"{E}{n_strips}I", *offs)
        if len(payload) <= 4:
            entries += struct.pack(f"{E}HHI", t, ty, cnt) + payload.ljust(4, b"\0")
        else:
            entries += struct.pack(f"{E}HHI", t, ty, cnt) + struct.pack(f"{E}I", opos)
            overflow += payload
            opos += len(payload)
    hdr = (b"II" if E == "<" else b"MM") + struct.pack(f"{E}H", 42) + struct.pack(f"{E}I", 8)
    body = struct.pack(f"{E}H", n) + entries + struct.pack(f"{E}I", 0)
    return hdr + body + bytes(overflow) + b"".join(strips)


def build_tiled_tiff(arr, tile_w=16, tile_l=16, compression=1, predictor=1,
                     bo="<", planar=1):
    """Assemble a TILED TIFF byte-by-byte (tags 322-325; test-local
    writer, fully independent of gtiff_encode's tiled path)."""
    h, w, c = arr.shape
    ta = (w + tile_w - 1) // tile_w
    td = (h + tile_l - 1) // tile_l
    pad = np.zeros((td * tile_l, ta * tile_w, c), arr.dtype)
    pad[:h, :w] = arr
    tiles = []
    bands = range(c) if planar == 2 else [None]
    for b in bands:
        for ty in range(td):
            for tx in range(ta):
                t = pad[ty * tile_l : (ty + 1) * tile_l,
                        tx * tile_w : (tx + 1) * tile_w]
                t = t[:, :, b : b + 1] if planar == 2 else t
                data = t
                if predictor == 2:
                    d = t.astype(np.int16).copy()
                    d[:, 1:] = np.diff(t.astype(np.int16), axis=1)
                    data = (d & 0xFF).astype(np.uint8)
                raw = data.tobytes()
                if compression == 8:
                    raw = zlib.compress(raw)
                elif compression == 32773:
                    raw = _packbits(raw)
                elif compression == 5:
                    raw = _lzw(raw)
                tiles.append(raw)
    E = bo
    tags: list[tuple[int, int, int, bytes]] = []

    def tag(t, type_, vals):
        fmt = {3: "H", 4: "I"}[type_]
        tags.append((t, type_, len(vals), struct.pack(f"{E}{len(vals)}{fmt}", *vals)))

    tag(256, 3, [w])
    tag(257, 3, [h])
    tag(258, 3, [8] * c)
    tag(259, 3, [compression])
    tag(262, 3, [2])
    tag(277, 3, [c])
    tag(284, 3, [planar])
    if predictor != 1:
        tag(317, 3, [predictor])
    tag(322, 4, [tile_w])
    tag(323, 4, [tile_l])
    tag(324, 4, [0] * len(tiles))
    tag(325, 4, [len(s) for s in tiles])
    tags.sort()
    n = len(tags)
    overflow_off = 8 + 2 + 12 * n + 4
    osize = sum(len(p) for _, _, _, p in tags if len(p) > 4)
    tile_base = overflow_off + osize
    offs = []
    p = tile_base
    for s in tiles:
        offs.append(p)
        p += len(s)
    entries = bytearray()
    overflow = bytearray()
    opos = overflow_off
    for t, ty, cnt, payload in tags:
        if t == 324:
            payload = struct.pack(f"{E}{len(tiles)}I", *offs)
        if len(payload) <= 4:
            entries += struct.pack(f"{E}HHI", t, ty, cnt) + payload.ljust(4, b"\0")
        else:
            entries += struct.pack(f"{E}HHI", t, ty, cnt) + struct.pack(f"{E}I", opos)
            overflow += payload
            opos += len(payload)
    hdr = (b"II" if E == "<" else b"MM") + struct.pack(f"{E}H", 42) + struct.pack(f"{E}I", 8)
    body = struct.pack(f"{E}H", n) + entries + struct.pack(f"{E}I", 0)
    return hdr + body + bytes(overflow) + b"".join(tiles)


IMG = np.random.default_rng(7).integers(0, 256, size=(37, 23, 3), dtype=np.uint8)


@pytest.mark.parametrize(
    "kw",
    [
        dict(rows_per_strip=10),
        dict(compression=8, rows_per_strip=16),
        dict(compression=32773, rows_per_strip=7),
        dict(compression=5, rows_per_strip=37),
        dict(compression=5, predictor=2, rows_per_strip=8),
        dict(compression=8, predictor=2, rows_per_strip=5, bo=">"),
    ],
    ids=["multistrip", "deflate", "packbits", "lzw", "lzw-predictor", "deflate-predictor-bigendian"],
)
def test_foreign_tiff_decodes_exact(kw):
    arr, _ = gtiff_decode(build_tiff(IMG, **kw))
    assert np.array_equal(arr, IMG)


def test_lzw_long_stream_code_width_growth():
    # enough distinct strings to push the code table past 9/10/11 bits
    data = np.arange(64 * 257, dtype=np.uint16).astype(np.uint8).reshape(257, 64, 1)
    arr, _ = gtiff_decode(build_tiff(data, compression=5))
    assert np.array_equal(arr, data)


def test_tiff_is_native_fmt_now():
    from solaris_ray.raster import codec
    from solaris_ray.stages.multimodal import NATIVE_FMTS, STUB_FMTS, decode_any

    assert "tiff" in NATIVE_FMTS and "tiff" not in STUB_FMTS
    buf = build_tiff(IMG, compression=8, rows_per_strip=9)
    out = decode_any(buf, "tiff", IMG.shape[1], IMG.shape[0], strict=True)
    assert np.array_equal(out, IMG)
    assert np.array_equal(codec.decode(codec.encode(IMG, "tiff"), "tiff"), IMG)


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(tile_w=32, tile_l=16),
        dict(compression=8),
        dict(compression=5, predictor=2),
        dict(compression=32773, bo=">"),
        dict(planar=2, compression=8),
    ],
    ids=["plain", "rect-tiles", "deflate", "lzw-predictor",
         "packbits-bigendian", "planar-deflate"],
)
def test_foreign_tiled_tiff_decodes_exact(kw):
    # 37x23 is not tile-aligned: edge tiles carry padding to crop
    arr, _ = gtiff_decode(build_tiled_tiff(IMG, **kw))
    assert np.array_equal(arr, IMG)


def test_foreign_tiled_tiff_large_multitile():
    big = np.random.default_rng(11).integers(
        0, 256, size=(70, 90, 3), dtype=np.uint8)
    arr, _ = gtiff_decode(build_tiled_tiff(big, tile_w=32, tile_l=32,
                                           compression=8, predictor=2))
    assert np.array_equal(arr, big)


def test_own_encoder_tiled_roundtrip():
    buf = gtiff_encode(IMG, transform=(0.5, 0, 100, 0, -0.5, 200),
                       epsg=32616, nodata=0, tile=16)
    arr, meta = gtiff_decode(buf)
    assert np.array_equal(arr, IMG)
    assert meta["epsg"] == 32616 and meta["nodata"] == 0.0
    assert meta["transform"][0] == 0.5
    with pytest.raises(ValueError):
        gtiff_encode(IMG, tile=20)  # not a multiple of 16


def test_own_encoder_meta_roundtrip_still_exact():
    buf = gtiff_encode(IMG, transform=(0.5, 0, 100, 0, -0.5, 200), epsg=32616, nodata=0)
    arr, meta = gtiff_decode(buf)
    assert np.array_equal(arr, IMG)
    assert meta["epsg"] == 32616 and meta["nodata"] == 0.0
