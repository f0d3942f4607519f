"""WebP codec via the system ``libwebp`` shared library (ctypes).

The container has no PIL/imagecodecs wheel, but it does ship
``libwebp.so.7`` as a system library — binding it with stdlib ctypes
makes ``webp`` a REAL format (decode any lossy/lossless WebP, encode
lossless and lossy) with zero installs.  This is the self-upgrading
seam promised in solaris_ray.stages.multimodal: on boxes without the
library, ``available()`` is False and webp stays a documented stub.

Reference parity: the reference reads whatever its imaging stack
accepts (/root/reference/solaris/utils/io.py:6-151); webp corpora are
first-class in training-data pipelines (input_hint ``fmt`` column).

All calls are per-image and GIL-releasing inside libwebp; batch stages
loop over rows of the binary column like the other codecs.
"""

from __future__ import annotations

import ctypes

import numpy as np

_lib = None
try:  # pragma: no cover - environment probe
    _lib = ctypes.CDLL("libwebp.so.7")
except OSError:
    try:
        _lib = ctypes.CDLL("libwebp.so")
    except OSError:
        _lib = None

if _lib is not None:
    _lib.WebPGetInfo.restype = ctypes.c_int
    _lib.WebPGetInfo.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    _lib.WebPDecodeRGBA.restype = ctypes.POINTER(ctypes.c_uint8)
    _lib.WebPDecodeRGBA.argtypes = [
        ctypes.c_char_p,
        ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int),
        ctypes.POINTER(ctypes.c_int),
    ]
    for enc in ("WebPEncodeLosslessRGB", "WebPEncodeLosslessRGBA"):
        fn = getattr(_lib, enc)
        fn.restype = ctypes.c_size_t
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
    for enc in ("WebPEncodeRGB", "WebPEncodeRGBA"):
        fn = getattr(_lib, enc)
        fn.restype = ctypes.c_size_t
        fn.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_int,
            ctypes.c_float,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
        ]
    _lib.WebPFree.restype = None
    _lib.WebPFree.argtypes = [ctypes.c_void_p]


def available() -> bool:
    return _lib is not None


def webp_decode(buf: bytes) -> np.ndarray:
    """WebP bytes (lossy or lossless) -> [Y,X,3] or [Y,X,4] uint8.

    Alpha is kept only when the image actually uses it (any pixel with
    alpha != 255), matching the PNG codec's channel behavior.
    """
    if _lib is None:
        raise NotImplementedError("libwebp not present on this system")
    buf = bytes(buf)
    w, h = ctypes.c_int(), ctypes.c_int()
    if not _lib.WebPGetInfo(buf, len(buf), ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("not a WebP bitstream")
    ptr = _lib.WebPDecodeRGBA(buf, len(buf), ctypes.byref(w), ctypes.byref(h))
    if not ptr:
        raise ValueError("WebP decode failed")
    try:
        n = w.value * h.value * 4
        arr = np.ctypeslib.as_array(ptr, shape=(n,)).reshape(h.value, w.value, 4).copy()
    finally:
        _lib.WebPFree(ptr)
    if (arr[:, :, 3] == 255).all():
        return np.ascontiguousarray(arr[:, :, :3])
    return arr


def webp_encode(arr: np.ndarray, lossless: bool = True, quality: float = 90.0) -> bytes:
    """[Y,X], [Y,X,3] or [Y,X,4] uint8 -> WebP bytes.

    Lossless by default (exact roundtrip); ``lossless=False`` uses the
    lossy VP8 path at the given quality.
    """
    if _lib is None:
        raise NotImplementedError("libwebp not present on this system")
    arr = np.asarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = np.repeat(arr[:, :, None], 3, axis=2)
    if arr.shape[2] == 1:
        arr = np.repeat(arr, 3, axis=2)
    h, w, c = arr.shape
    if c not in (3, 4):
        raise ValueError(f"webp encode needs 3 or 4 channels, got {c}")
    data = np.ascontiguousarray(arr).tobytes()
    out = ctypes.POINTER(ctypes.c_uint8)()
    if lossless:
        fn = _lib.WebPEncodeLosslessRGBA if c == 4 else _lib.WebPEncodeLosslessRGB
        size = fn(data, w, h, w * c, ctypes.byref(out))
    else:
        fn = _lib.WebPEncodeRGBA if c == 4 else _lib.WebPEncodeRGB
        size = fn(data, w, h, w * c, ctypes.c_float(quality), ctypes.byref(out))
    if size == 0 or not out:
        raise ValueError("WebP encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        _lib.WebPFree(out)
