"""Image codecs for the ``bytes`` column of the images/tiles tables.

The driver-mandated input table carries encoded images
(``fmt: string`` ∈ {"png", "qnt"}), mirroring the reference's GeoTIFF
read path (solaris/utils/io.py:6-151 ``imread``,
solaris/preproc/image.py:43-79 GDAL loader).  No PIL/imagecodecs wheel
exists in this environment, so:

- ``png``: a real, spec-compliant PNG codec (stdlib zlib; 8-bit gray /
  RGB / RGBA, filter 0 on encode, filters 0-4 on decode).  Lossless.
- ``qnt``: a deliberately *lossy* format — 5-bit per-channel
  quantization then PNG — standing in for JPEG so the
  PSNR ≥ 40 dB acceptance check (BASELINE.json input_hint) is a real
  check: 5-bit quantization yields PSNR ≈ 41 dB on natural-ish data.

All functions are per-image; batch stages loop over rows of the binary
column (decode cost dominates, the loop is not the bottleneck).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(arr: np.ndarray, level: int = 4) -> bytes:
    """[Y,X] or [Y,X,C] uint8 -> PNG bytes (C in {1,3,4})."""
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]  # 2 = gray+alpha
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    # filter byte 0 per scanline
    raw = np.empty((h, w * c + 1), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), level)
    return _PNG_SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat) + _chunk(b"IEND", b"")


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters (types 0-4)."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ftype = raw[y, 0]
        line = raw[y, 1:].astype(np.int32)
        prev = out[y - 1].astype(np.int32) if y > 0 else np.zeros(stride, dtype=np.int32)
        if ftype == 0:
            out[y] = line
        elif ftype == 2:  # Up
            out[y] = (line + prev) & 0xFF
        elif ftype in (1, 3, 4):  # Sub / Average / Paeth need sequential left
            cur = np.zeros(stride, dtype=np.int32)
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                b = prev[x]
                if ftype == 1:
                    val = line[x] + a
                elif ftype == 3:
                    val = line[x] + ((a + b) >> 1)
                else:
                    cc = prev[x - bpp] if x >= bpp else 0
                    p = a + b - cc
                    pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                    pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                    val = line[x] + pred
                cur[x] = val & 0xFF
            out[y] = cur
        else:
            raise ValueError(f"bad PNG filter type {ftype}")
    return out


def png_decode(buf: bytes) -> np.ndarray:
    """PNG bytes -> [Y,X] (gray) or [Y,X,C] uint8."""
    if buf[:8] != _PNG_SIG:
        raise ValueError("not a PNG")
    pos = 8
    w = h = None
    color_type = None
    idat = b""
    while pos < len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        payload = buf[pos + 8 : pos + 8 + length]
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", payload)
            if depth != 8 or interlace != 0:
                raise ValueError("only 8-bit non-interlaced PNG supported")
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    c = {0: 1, 4: 2, 2: 3, 6: 4}[color_type]
    stride = w * c
    raw = np.frombuffer(zlib.decompress(idat), dtype=np.uint8).reshape(h, stride + 1)
    out = _unfilter(raw, h, stride, c).reshape(h, w, c)
    return out[:, :, 0] if c == 1 else out


QNT_BITS = 5  # 5-bit quantization → PSNR ≈ 41 dB (just above the 40 dB gate)


def qnt_encode(arr: np.ndarray, level: int = 4) -> bytes:
    """Lossy encode: quantize to QNT_BITS bits/channel, then PNG."""
    arr = np.asarray(arr, dtype=np.uint8)
    shift = 8 - QNT_BITS
    q = (arr >> shift) << shift
    q = q + (1 << (shift - 1))  # mid-rise reconstruction level
    return b"QNT0" + png_encode(q.astype(np.uint8), level)


def qnt_decode(buf: bytes) -> np.ndarray:
    if buf[:4] != b"QNT0":
        raise ValueError("not a QNT buffer")
    return decode(buf[4:], "png")


def f64_encode(arr: np.ndarray) -> bytes:
    """Raw float64 [H,W] / [H,W,C] container — lossless carrier for
    SAR complex pairs, calibration outputs and lat/lon/alt grids
    (reference keeps these as in-memory float/complex ndarrays,
    preproc/sar.py:35-101; we need an at-rest binary column format).
    Layout: b"F64\\x00" + <III (h, w, c)> + C-order little-endian
    float64 payload."""
    a = np.asarray(arr, dtype="<f8")
    if a.ndim == 2:
        a = a[:, :, None]
    h, w, c = a.shape
    return b"F64\x00" + struct.pack("<III", h, w, c) + a.tobytes()


def f64_decode(buf: bytes) -> np.ndarray:
    if buf[:4] != b"F64\x00":
        raise ValueError("not an F64 buffer")
    h, w, c = struct.unpack("<III", buf[4:16])
    out = np.frombuffer(buf[16:], dtype="<f8").reshape(h, w, c)
    return out[:, :, 0] if c == 1 else out


def encode(arr: np.ndarray, fmt: str, level: int = 4) -> bytes:
    """``level`` is the zlib effort (0 = stored, still spec-compliant
    PNG).  Noisy imagery defeats deflate (≤4% smaller at 16x the CPU),
    so throughput-critical intermediate tiles use level 0; persisted
    outputs keep the default."""
    if fmt == "png":
        return png_encode(arr, level)
    if fmt == "qnt":
        return qnt_encode(arr, level)
    if fmt == "f64":
        return f64_encode(arr)
    if fmt in ("gtif", "tif", "tiff"):
        from .gtiff import gtiff_encode

        return gtiff_encode(arr)
    if fmt in ("jpeg", "jpg"):
        from .jpeg import jpeg_encode

        return jpeg_encode(arr, quality=95)
    if fmt == "webp":
        from .webp import webp_encode

        return webp_encode(arr, lossless=True)
    if fmt == "gif":
        from .gif import gif_encode

        if arr.ndim == 3 and arr.shape[2] == 1:
            arr = arr[:, :, 0]
        elif arr.ndim == 3 and arr.shape[2] == 3:
            # gray stored as identical RGB channels (the gif_decode
            # output shape) collapses losslessly; true color would need
            # palette quantization — refuse rather than quietly degrade
            if not (np.array_equal(arr[:, :, 0], arr[:, :, 1])
                    and np.array_equal(arr[:, :, 0], arr[:, :, 2])):
                raise ValueError(
                    "gif encode: true-color input needs a palette; "
                    "only grayscale (equal channels) is lossless"
                )
            arr = arr[:, :, 0]
        return gif_encode(arr)
    raise ValueError(f"unsupported fmt {fmt!r}")


def decode(buf: bytes, fmt: str) -> np.ndarray:
    if fmt == "png":
        # libpng fast path when the system library exists (3x on our
        # own filter-0 streams; required for foreign filtered /
        # 16-bit / palette / interlaced PNGs, which the pure decoder
        # rejects or unfilters per-byte in Python)
        from . import pnglib

        if pnglib.available():
            return pnglib.png_decode_fast(bytes(buf))
        return png_decode(bytes(buf))
    if fmt == "qnt":
        return qnt_decode(bytes(buf))
    if fmt == "f64":
        return f64_decode(bytes(buf))
    if fmt in ("gtif", "tif", "tiff"):
        # gtiff_decode reads general baseline TIFF too (both byte
        # orders, deflate/LZW/PackBits strips, predictor 2), so plain
        # ``tiff`` payloads are native, not stubbed
        from .gtiff import gtiff_decode

        arr, _ = gtiff_decode(bytes(buf))
        return arr[:, :, 0] if arr.shape[2] == 1 else arr
    if fmt in ("jpeg", "jpg"):
        from .jpeg import jpeg_decode

        return jpeg_decode(bytes(buf))
    if fmt == "webp":
        from .webp import webp_decode

        return webp_decode(bytes(buf))
    if fmt == "gif":
        from .gif import gif_decode

        return gif_decode(bytes(buf))
    raise ValueError(f"unsupported fmt {fmt!r}")


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 255.0) -> float:
    """Peak signal-to-noise ratio in dB (acceptance: ≥ 40 dB for lossy)."""
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    mse = np.mean((a - b) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak * peak / mse))
