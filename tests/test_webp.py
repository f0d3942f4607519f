"""WebP codec via system libwebp (raster/webp.py).

Gated on library availability so the suite still passes on boxes
without libwebp (where webp remains a documented stub).
"""

from __future__ import annotations

import numpy as np
import pytest

from solaris_ray.raster import codec
from solaris_ray.raster.webp import available, webp_decode, webp_encode

pytestmark = pytest.mark.skipif(not available(), reason="libwebp not present")

X, Y = np.meshgrid(np.arange(96), np.arange(64))
RGB = np.stack([(X * 3 + Y) % 256, (X ^ Y) % 256, (X // 2 + Y // 3) % 256], axis=-1).astype(
    np.uint8
)


def test_lossless_rgb_roundtrip_exact():
    out = webp_decode(webp_encode(RGB, lossless=True))
    assert out.shape == RGB.shape and np.array_equal(out, RGB)


def test_lossless_rgba_roundtrip_exact():
    rgba = np.dstack([RGB, (55 + (X + Y) % 200).astype(np.uint8)])
    out = webp_decode(webp_encode(rgba, lossless=True))
    assert out.shape == rgba.shape and np.array_equal(out, rgba)


def test_gray_widens_to_rgb():
    g = ((X * 5 + Y * 7) % 256).astype(np.uint8)
    out = webp_decode(webp_encode(g, lossless=True))
    assert np.array_equal(out, np.repeat(g[:, :, None], 3, axis=2))


def test_lossy_quality_psnr():
    yy, xx = np.indices((64, 96), dtype=np.float64)
    smooth = (128 + 90 * np.sin(xx / 23) * np.cos(yy / 17)).clip(0, 255).astype(np.uint8)
    smooth = np.repeat(smooth[:, :, None], 3, axis=2)
    out = webp_decode(webp_encode(smooth, lossless=False, quality=95))
    assert codec.psnr(smooth, out[:, :, :3]) >= 40.0


def test_codec_routing_and_decode_any():
    from solaris_ray.stages.multimodal import NATIVE_FMTS, decode_any

    assert "webp" in NATIVE_FMTS
    buf = codec.encode(RGB, "webp")
    assert np.array_equal(codec.decode(buf, "webp"), RGB)
    out = decode_any(buf, "webp", RGB.shape[1], RGB.shape[0], strict=True)
    assert np.array_equal(out, RGB)


def test_garbage_rejected():
    with pytest.raises(ValueError):
        webp_decode(b"not a webp at all" * 4)
