"""libpng binding (simplified ``png_image`` API, stdlib ctypes).

Decode-side upgrade for the PNG codec: the system ``libpng16`` reads
the FULL PNG space (filters 1-4 at C speed, 16-bit depth, palette,
interlaced) where the pure-Python decoder in ``codec.py`` supports the
8-bit non-interlaced subset and unfilters per-byte in Python.  Encode
stays pure-Python (numpy rows + stdlib zlib are already C-speed and
byte-deterministic across boxes).

The ``png_image`` struct is the stable flat ABI added in libpng 1.6
precisely for foreign-function use — no version-dependent opaque
structs touched.
"""

from __future__ import annotations

import ctypes

import numpy as np

PNG_IMAGE_VERSION = 1
_FLAG_ALPHA = 0x01
_FLAG_COLOR = 0x02
_FLAG_LINEAR = 0x04
_FLAG_COLORMAP = 0x08


class _PngImage(ctypes.Structure):
    _fields_ = [
        ("opaque", ctypes.c_void_p),
        ("version", ctypes.c_uint32),
        ("width", ctypes.c_uint32),
        ("height", ctypes.c_uint32),
        ("format", ctypes.c_uint32),
        ("flags", ctypes.c_uint32),
        ("colormap_entries", ctypes.c_uint32),
        ("warning_or_error", ctypes.c_uint32),
        ("message", ctypes.c_char * 64),
    ]


_lib = None
try:  # pragma: no cover - environment probe
    _lib = ctypes.CDLL("libpng16.so.16")
except OSError:
    try:
        _lib = ctypes.CDLL("libpng16.so")
    except OSError:
        _lib = None

if _lib is not None:
    _lib.png_image_begin_read_from_memory.restype = ctypes.c_int
    _lib.png_image_begin_read_from_memory.argtypes = [
        ctypes.POINTER(_PngImage),
        ctypes.c_char_p,
        ctypes.c_size_t,
    ]
    _lib.png_image_finish_read.restype = ctypes.c_int
    _lib.png_image_finish_read.argtypes = [
        ctypes.POINTER(_PngImage),
        ctypes.c_void_p,  # background
        ctypes.c_void_p,  # buffer
        ctypes.c_int,  # row_stride
        ctypes.c_void_p,  # colormap
    ]
    _lib.png_image_free.restype = None
    _lib.png_image_free.argtypes = [ctypes.POINTER(_PngImage)]


def available() -> bool:
    return _lib is not None


def png_decode_fast(buf: bytes) -> np.ndarray:
    """PNG bytes -> [Y,X] (gray) or [Y,X,C] uint8 via libpng.

    Channel count follows the source image (palette expands to its
    color format; 16-bit narrows to 8), matching the pure-Python
    decoder's conventions on the subset both support.
    """
    if _lib is None:
        raise NotImplementedError("libpng not present on this system")
    img = _PngImage()
    img.version = PNG_IMAGE_VERSION
    if not _lib.png_image_begin_read_from_memory(ctypes.byref(img), buf, len(buf)):
        raise ValueError(f"not a PNG: {img.message.decode(errors='replace')}")
    try:
        fmt = img.format
        # request the 8-bit sRGB equivalent of the source layout
        want = fmt & (_FLAG_ALPHA | _FLAG_COLOR)
        img.format = want
        channels = 1 + (1 if want & _FLAG_ALPHA else 0) + (2 if want & _FLAG_COLOR else 0)
        out = np.empty(img.height * img.width * channels, dtype=np.uint8)
        ok = _lib.png_image_finish_read(
            ctypes.byref(img),
            None,
            out.ctypes.data_as(ctypes.c_void_p),
            0,
            None,
        )
        if not ok:
            raise ValueError(f"PNG decode failed: {img.message.decode(errors='replace')}")
        arr = out.reshape(img.height, img.width, channels)
        return arr[:, :, 0] if channels == 1 else arr
    finally:
        _lib.png_image_free(ctypes.byref(img))
