"""Minimal uncompressed GeoTIFF codec (pure struct-packing, no GDAL).

Closes the last sink-format gap vs the reference's
``create_multiband_geotiff`` (/root/reference/solaris/raster/image.py:157-210):
band-sequential (PlanarConfiguration=2, matching GDAL's per-band
``WriteArray`` loop), uncompressed strips, with the GeoTIFF
georeferencing tags the reference sets through ``SetProjection`` /
``SetGeoTransform`` / ``SetNoDataValue``:

- ModelPixelScale (33550) + ModelTiepoint (33922) for axis-aligned
  geotransforms, ModelTransformation (34264) for rotated ones,
- GeoKeyDirectory (34735) carrying the EPSG code (projected or
  geographic model type),
- GDAL_NODATA (42113, ASCII) for the nodata value.

Same philosophy as the PNG codec in ``codec.py``: a real,
spec-compliant container written byte-by-byte, so the engine's tiles /
masks tables can round-trip through the format GIS stacks expect
without a GDAL wheel.  dtypes: uint8/uint16/int16/float32/float64.

Array convention matches ``codec.py``: [Y, X] or [Y, X, C].
"""

from __future__ import annotations

import struct

import numpy as np

_LE = "<"
_TYPE_ASCII, _TYPE_SHORT, _TYPE_LONG, _TYPE_DOUBLE = 2, 3, 4, 12
_TYPE_SIZE = {_TYPE_ASCII: 1, _TYPE_SHORT: 2, _TYPE_LONG: 4, _TYPE_DOUBLE: 8}

# numpy dtype -> (BitsPerSample, SampleFormat)
_FMT = {
    np.dtype(np.uint8): (8, 1),
    np.dtype(np.uint16): (16, 1),
    np.dtype(np.int16): (16, 2),
    np.dtype(np.float32): (32, 3),
    np.dtype(np.float64): (64, 3),
}
_BACK = {(8, 1): np.uint8, (16, 1): np.uint16, (16, 2): np.int16,
         (32, 3): np.float32, (64, 3): np.float64}


def _pack_values(type_: int, values) -> bytes:
    if type_ == _TYPE_ASCII:
        return values  # already bytes, NUL-terminated by caller
    fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[type_]
    return struct.pack(f"{_LE}{len(values)}{fmt}", *values)


def gtiff_encode(arr: np.ndarray, transform=None, epsg: int | None = None,
                 nodata: float | None = None,
                 tile: int | None = None) -> bytes:
    """[Y,X] or [Y,X,C] array -> uncompressed band-sequential GeoTIFF.

    ``transform`` is an affine in the engine's (a,b,c,d,e,f) order
    (geo_x = a*px + b*py + c); axis-aligned transforms use the
    PixelScale+Tiepoint pair, rotated ones the full ModelTransformation
    matrix — mirroring how GDAL persists ``SetGeoTransform``.

    ``tile``: when set (a multiple of 16, per the TIFF 6.0 spec),
    writes the TILED layout (TileWidth/TileLength/TileOffsets/
    TileByteCounts, chunky interleave) with zero-padded edge tiles —
    the layout GDAL writes with ``TILED=YES``.
    """
    arr = np.asarray(arr)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if arr.dtype not in _FMT:
        raise ValueError(f"unsupported dtype {arr.dtype}")
    bits, sfmt = _FMT[arr.dtype]
    bpp = bits // 8

    if tile is not None:
        if tile % 16:
            raise ValueError("TIFF tile dims must be multiples of 16")
        ta = (w + tile - 1) // tile
        td = (h + tile - 1) // tile
        pad = np.zeros((td * tile, ta * tile, c), arr.dtype)
        pad[:h, :w] = arr
        band_bytes = [
            np.ascontiguousarray(
                pad[ty * tile : (ty + 1) * tile, tx * tile : (tx + 1) * tile]
            ).tobytes()
            for ty in range(td) for tx in range(ta)
        ]
    else:
        # band-sequential strips: one strip per band, RowsPerStrip = h
        band_bytes = [np.ascontiguousarray(arr[:, :, i]).tobytes() for i in range(c)]
    strip_counts = [len(b) for b in band_bytes]

    entries: list[tuple[int, int, int, bytes]] = []  # (tag, type, count, payload)

    def tag(t: int, type_: int, values) -> None:
        n = len(values) if not isinstance(values, bytes) else len(values)
        entries.append((t, type_, n, _pack_values(type_, values)))

    tag(256, _TYPE_LONG, [w])
    tag(257, _TYPE_LONG, [h])
    tag(258, _TYPE_SHORT, [bits] * c)
    tag(259, _TYPE_SHORT, [1])  # no compression
    tag(262, _TYPE_SHORT, [2 if c == 3 else 1])  # RGB / BlackIsZero
    if tile is not None:
        tag(322, _TYPE_LONG, [tile])
        tag(323, _TYPE_LONG, [tile])
        tag(324, _TYPE_LONG, [0] * len(band_bytes))  # TileOffsets, pass 2
        tag(325, _TYPE_LONG, strip_counts)
        tag(284, _TYPE_SHORT, [1])  # tiled path writes chunky interleave
    else:
        tag(273, _TYPE_LONG, [0] * c)  # StripOffsets, filled in pass 2
        tag(278, _TYPE_LONG, [h])
        tag(279, _TYPE_LONG, strip_counts)
        tag(284, _TYPE_SHORT, [2])  # planar: band-sequential
    tag(277, _TYPE_SHORT, [c])
    tag(339, _TYPE_SHORT, [sfmt] * c)

    if transform is not None:
        a, b, c_, d, e, f = (
            transform if isinstance(transform, (tuple, list))
            else (transform.a, transform.b, transform.c,
                  transform.d, transform.e, transform.f)
        )
        if b == 0.0 and d == 0.0:
            tag(33550, _TYPE_DOUBLE, [a, -e, 0.0])
            tag(33922, _TYPE_DOUBLE, [0.0, 0.0, 0.0, c_, f, 0.0])
        else:
            tag(34264, _TYPE_DOUBLE,
                [a, b, 0.0, c_, d, e, 0.0, f, 0.0, 0.0, 0.0, 0.0,
                 0.0, 0.0, 0.0, 1.0])
    if epsg is not None:
        geographic = not (32600 < epsg <= 32660 or 32700 < epsg <= 32760)
        keys = [
            (1024, 0, 1, 2 if geographic else 1),  # GTModelType
            (1025, 0, 1, 1),  # RasterPixelIsArea
            (2048 if geographic else 3072, 0, 1, epsg),
        ]
        flat = [1, 1, 0, len(keys)]
        for kk in keys:
            flat.extend(kk)
        tag(34735, _TYPE_SHORT, flat)
    if nodata is not None:
        s = (f"{int(nodata)}" if float(nodata).is_integer() else repr(float(nodata)))
        tag(42113, _TYPE_ASCII, s.encode("ascii") + b"\x00")

    entries.sort(key=lambda t_: t_[0])

    # layout: header(8) | IFD | overflow values | strips.  Two passes:
    # pass 1 sizes the layout (StripOffsets payload has fixed size), so
    # pass 2 can emit the real strip offsets — byte layout identical.
    def _layout(entries_: list[tuple[int, int, int, bytes]]):
        n_ent = len(entries_)
        overflow_off = 8 + 2 + n_ent * 12 + 4
        overflow: list[bytes] = []
        cur = overflow_off
        locs: list[bytes] = []
        for _t, _type, _n, payload in entries_:
            if len(payload) <= 4:
                locs.append(payload.ljust(4, b"\x00"))
            else:
                if cur % 2:
                    overflow.append(b"\x00")
                    cur += 1
                locs.append(struct.pack(f"{_LE}I", cur))
                overflow.append(payload)
                cur += len(payload)
        if cur % 2:
            overflow.append(b"\x00")
            cur += 1
        return locs, overflow, cur  # cur == pixel data offset

    _, _, data_off = _layout(entries)
    offs, pos = [], data_off
    for n_b in strip_counts:
        offs.append(pos)
        pos += n_b
    off_tag = 324 if tile is not None else 273
    idx_off = next(i for i, e_ in enumerate(entries) if e_[0] == off_tag)
    entries[idx_off] = (off_tag, _TYPE_LONG, len(offs),
                        _pack_values(_TYPE_LONG, offs))
    locs, overflow, data_off2 = _layout(entries)
    assert data_off2 == data_off

    out = [struct.pack(f"{_LE}2sHI", b"II", 42, 8)]
    out.append(struct.pack(f"{_LE}H", len(entries)))
    for (t_, type_, n, _), loc in zip(entries, locs):
        out.append(struct.pack(f"{_LE}HHI", t_, type_, n) + loc)
    out.append(struct.pack(f"{_LE}I", 0))  # next IFD
    out.extend(overflow)
    out.extend(band_bytes)
    return b"".join(out)


def _lzw_decode(data: bytes) -> bytes:
    """TIFF-variant LZW (MSB-first codes, ClearCode=256, EOI=257,
    early code-width change) — TIFF 6.0 §13."""
    CLEAR, EOI = 256, 257
    out = bytearray()
    table: list[bytes] = []
    bitbuf = 0
    nbits = 0
    width = 9
    pos = 0
    prev: bytes | None = None

    def reset():
        nonlocal table, width, prev
        table = [bytes([i]) for i in range(256)] + [b"", b""]
        width = 9
        prev = None

    reset()
    n = len(data)
    while True:
        while nbits < width:
            if pos >= n:
                return bytes(out)
            bitbuf = (bitbuf << 8) | data[pos]
            pos += 1
            nbits += 8
        code = (bitbuf >> (nbits - width)) & ((1 << width) - 1)
        nbits -= width
        if code == EOI:
            return bytes(out)
        if code == CLEAR:
            reset()
            continue
        if prev is None:
            entry = table[code]
        elif code < len(table):
            entry = table[code]
            table.append(prev + entry[:1])
        else:  # KwKwK case
            entry = prev + prev[:1]
            table.append(entry)
        out += entry
        prev = entry
        # early change: width bumps when the NEXT code would overflow
        if len(table) + 1 >= (1 << width) and width < 12:
            width += 1
    return bytes(out)


def _packbits_decode(data: bytes) -> bytes:
    """Apple PackBits RLE — TIFF 6.0 §9."""
    out = bytearray()
    i, n = 0, len(data)
    while i < n:
        h = data[i]
        i += 1
        if h < 128:  # literal run of h+1 bytes
            out += data[i : i + h + 1]
            i += h + 1
        elif h > 128:  # repeat next byte 257-h times
            out += data[i : i + 1] * (257 - h)
            i += 1
        # h == 128: no-op
    return bytes(out)


def _decomp_strip(raw: bytes, compression: int) -> bytes:
    if compression == 1:
        return raw
    if compression in (8, 32946):  # Adobe / old-style deflate
        import zlib

        return zlib.decompress(raw)
    if compression == 5:
        return _lzw_decode(raw)
    if compression == 32773:
        return _packbits_decode(raw)
    raise ValueError(f"unsupported TIFF compression {compression}")


def gtiff_decode(buf: bytes):
    """(Geo)TIFF bytes -> (array [Y,X,C], meta dict).

    meta: {"transform": (a,b,c,d,e,f) | None, "epsg": int | None,
    "nodata": float | None}.  Reads what the encoder writes plus the
    common baseline-TIFF space: both byte orders, chunky or planar
    strips with any RowsPerStrip, uncompressed / Deflate / LZW /
    PackBits strips, and the horizontal-differencing predictor — so
    foreign ``tiff`` payloads decode for real, not through the
    multimodal stub (reference accepts arbitrary GDAL-readable TIFFs,
    /root/reference/solaris/utils/io.py:6-151).
    """
    buf = bytes(buf)
    if buf[:2] == b"II":
        bo = "<"
    elif buf[:2] == b"MM":
        bo = ">"
    else:
        raise ValueError("not a TIFF")
    if struct.unpack(f"{bo}H", buf[2:4])[0] != 42:
        raise ValueError("not a TIFF (bad magic)")
    (ifd_off,) = struct.unpack(f"{bo}I", buf[4:8])
    (n_ent,) = struct.unpack(f"{bo}H", buf[ifd_off : ifd_off + 2])
    tags: dict[int, tuple[int, int, bytes]] = {}
    p = ifd_off + 2
    for _ in range(n_ent):
        t_, type_, n = struct.unpack(f"{bo}HHI", buf[p : p + 8])
        size = _TYPE_SIZE.get(type_, 1) * n
        if size <= 4:
            payload = buf[p + 8 : p + 8 + size]
        else:
            (off,) = struct.unpack(f"{bo}I", buf[p + 8 : p + 12])
            payload = buf[off : off + size]
        tags[t_] = (type_, n, payload)
        p += 12

    def vals(t_, default=None):
        if t_ not in tags:
            return default
        type_, n, payload = tags[t_]
        if type_ == _TYPE_ASCII:
            return payload.rstrip(b"\x00").decode("ascii")
        fmt = {_TYPE_SHORT: "H", _TYPE_LONG: "I", _TYPE_DOUBLE: "d"}[type_]
        return list(struct.unpack(f"{bo}{n}{fmt}", payload))

    compression = vals(259, [1])[0]
    w, h = vals(256)[0], vals(257)[0]
    c = vals(277, [1])[0]
    bits = vals(258, [8])[0]
    sfmt = vals(339, [1])[0]
    dtype = np.dtype(_BACK[(bits, sfmt)]).newbyteorder(bo)
    base_dtype = np.dtype(_BACK[(bits, sfmt)])
    planar = vals(284, [1])[0]
    predictor = vals(317, [1])[0]
    offs, counts = vals(273), vals(279)

    def undiff(a: np.ndarray) -> np.ndarray:
        """Undo horizontal differencing (predictor=2) along X."""
        if predictor != 2:
            return a
        if base_dtype.kind not in "iu":
            raise ValueError("predictor 2 on non-integer samples")
        work = a.astype(np.int64).cumsum(axis=1)
        return (work & ((1 << bits) - 1)).astype(base_dtype)

    tile_w = vals(322)
    if tile_w is not None:
        # tiled layout (TileWidth/TileLength/TileOffsets/TileByteCounts):
        # the other half of real-world GeoTIFFs.  Tiles are always full
        # size in the file — edge tiles carry padding that is cropped on
        # assembly; the predictor resets per tile row, which the same
        # per-row cumsum handles because each tile decodes separately.
        tw = tile_w[0]
        tl = vals(323)[0]
        toffs, tcounts = vals(324), vals(325)
        ta = (w + tw - 1) // tw
        td = (h + tl - 1) // tl

        def _tile(o, n_, cc):
            flat = _decomp_strip(buf[o : o + n_], compression)
            t = np.frombuffer(flat, dtype=dtype, count=tl * tw * cc).reshape(tl, tw, cc)
            return undiff(t) if predictor == 2 else t

        if planar == 2:
            per_band = ta * td
            bands = []
            for b in range(c):
                band = np.zeros((h, w), base_dtype)
                for ti in range(per_band):
                    o = toffs[b * per_band + ti]
                    n_ = tcounts[b * per_band + ti]
                    ty, tx = divmod(ti, ta)
                    y0, x0 = ty * tl, tx * tw
                    t = _tile(o, n_, 1)[:, :, 0]
                    band[y0 : min(y0 + tl, h), x0 : min(x0 + tw, w)] = \
                        t[: h - y0, : w - x0].astype(base_dtype, copy=False)
                bands.append(band)
            arr = np.stack(bands, axis=-1)
        else:
            arr = np.zeros((h, w, c), base_dtype)
            for ti, (o, n_) in enumerate(zip(toffs, tcounts)):
                ty, tx = divmod(ti, ta)
                y0, x0 = ty * tl, tx * tw
                t = _tile(o, n_, c)
                arr[y0 : min(y0 + tl, h), x0 : min(x0 + tw, w)] = \
                    t[: h - y0, : w - x0].astype(base_dtype, copy=False)
    elif planar == 2:
        # strips cycle through band 0's rows, then band 1's, ...
        rps = vals(278, [h])[0]
        per_band = (h + rps - 1) // rps
        bands = []
        for b in range(c):
            flat = b"".join(
                _decomp_strip(buf[o : o + n_], compression)
                for o, n_ in zip(
                    offs[b * per_band : (b + 1) * per_band],
                    counts[b * per_band : (b + 1) * per_band],
                )
            )
            band = np.frombuffer(flat, dtype=dtype, count=h * w).reshape(h, w)
            bands.append(undiff(band[:, :, None])[:, :, 0])
        arr = np.stack(bands, axis=-1)
    else:
        flat = b"".join(
            _decomp_strip(buf[o : o + n_], compression) for o, n_ in zip(offs, counts)
        )
        arr = np.frombuffer(flat, dtype=dtype, count=h * w * c).reshape(h, w, c)
        if predictor == 2:
            # differencing is per sample within a row, channels interleaved
            arr = undiff(arr.reshape(h, w, c))
    arr = np.ascontiguousarray(arr.astype(base_dtype, copy=False))

    transform = None
    if 34264 in tags:
        m = vals(34264)
        transform = (m[0], m[1], m[3], m[4], m[5], m[7])
    elif 33550 in tags and 33922 in tags:
        sx, sy, _ = vals(33550)
        tp = vals(33922)
        transform = (sx, 0.0, tp[3], 0.0, -sy, tp[4])
    epsg = None
    if 34735 in tags:
        g = vals(34735)
        n_keys = g[3]
        for i in range(n_keys):
            kid, loc, cnt, val = g[4 + 4 * i : 8 + 4 * i]
            if kid in (3072, 2048) and loc == 0:
                epsg = val
    nd = vals(42113)
    nodata = float(nd) if nd is not None else None
    return arr, {"transform": transform, "epsg": epsg, "nodata": nodata}
