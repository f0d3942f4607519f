"""Preproc pixel ops — solaris.utils.io / preproc.image / preproc.sar
/ preproc.optical scalar kernels as stateless map_batches bodies.

All kernels take decoded [H,W,C] arrays; ``apply_image_op`` wraps any
of them into a decode -> op -> encode batch stage so they compose like
the reference's PipeSegment ``*`` chains
(/root/reference/solaris/preproc/pipesegment.py:6-346) — here
composition is just a list of ops applied per batch.

Covered (SURVEY.md §2.2):
- scale_for_model / rescale (utils/io.py:154-305): minmax, zscore,
  8-bit rescale.
- SelectBands / SwapChannels / DropChannel (preproc/image.py:334-501,
  nets/transform.py:77-148).
- RGB<->HSV (preproc/optical.py:9-92) — vectorized, not per-pixel
  colorsys.
- SAR scalar ops (preproc/sar.py:17-127): amplitude, intensity,
  phase, decibels over complex data carried as (re, im) channel pairs.
- Multilook (preproc/sar.py:130-155): uniform box filter.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..raster import codec


# --- pixel kernels ([H,W,C] -> [H,W,C']) ---------------------------------

def minmax_scale(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    lo, hi = f.min(), f.max()
    return (f - lo) / (hi - lo) if hi > lo else np.zeros_like(f)


def zscore_scale(img: np.ndarray) -> np.ndarray:
    f = img.astype(np.float64)
    sd = f.std()
    return (f - f.mean()) / sd if sd > 0 else np.zeros_like(f)


def select_bands(img: np.ndarray, bands: list[int]) -> np.ndarray:
    return img[:, :, bands]


def swap_channels(img: np.ndarray, a: int, b: int) -> np.ndarray:
    out = img.copy()
    out[:, :, [a, b]] = out[:, :, [b, a]]
    return out


def drop_channel(img: np.ndarray, idx: int) -> np.ndarray:
    keep = [i for i in range(img.shape[2]) if i != idx]
    return img[:, :, keep]


def rgb_to_hsv(img: np.ndarray) -> np.ndarray:
    """Vectorized RGB->HSV on [0,255] uint8 -> float64 [0,1] channels."""
    f = img.astype(np.float64) / 255.0
    r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
    mx = f.max(axis=2)
    mn = f.min(axis=2)
    d = mx - mn
    h = np.zeros_like(mx)
    nz = d > 0
    rmax = nz & (mx == r)
    gmax = nz & (mx == g) & ~rmax
    bmax = nz & ~rmax & ~gmax
    h[rmax] = ((g - b)[rmax] / d[rmax]) % 6
    h[gmax] = (b - r)[gmax] / d[gmax] + 2
    h[bmax] = (r - g)[bmax] / d[bmax] + 4
    h /= 6.0
    s = np.where(mx > 0, d / np.where(mx > 0, mx, 1), 0.0)
    return np.stack([h, s, mx], axis=2)


def hsv_to_rgb(img: np.ndarray) -> np.ndarray:
    h, s, v = img[:, :, 0] * 6.0, img[:, :, 1], img[:, :, 2]
    i = np.floor(h).astype(np.int64) % 6
    f = h - np.floor(h)
    p = v * (1 - s)
    q = v * (1 - f * s)
    t = v * (1 - (1 - f) * s)
    r = np.choose(i, [v, q, p, p, t, v])
    g = np.choose(i, [t, v, v, q, p, p])
    b = np.choose(i, [p, p, t, v, v, q])
    return np.clip(np.rint(np.stack([r, g, b], axis=2) * 255.0), 0, 255).astype(np.uint8)


# --- SAR ops: complex carried as channel pairs (re0, im0, re1, im1, ...) --

def _as_complex(img: np.ndarray) -> np.ndarray:
    assert img.shape[2] % 2 == 0, "SAR layout is (re, im) channel pairs"
    return img[:, :, 0::2].astype(np.float64) + 1j * img[:, :, 1::2].astype(np.float64)


def sar_amplitude(img: np.ndarray) -> np.ndarray:
    return np.abs(_as_complex(img))


def sar_intensity(img: np.ndarray) -> np.ndarray:
    a = np.abs(_as_complex(img))
    return a * a


def sar_phase(img: np.ndarray) -> np.ndarray:
    return np.angle(_as_complex(img))


def sar_decibels(img: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    return 10.0 * np.log10(sar_intensity(img) + eps)


def multilook(img: np.ndarray, k: int) -> np.ndarray:
    """Uniform k x k box-filter multilook (preproc/sar.py:130-155) via
    integral image (O(HW) regardless of k)."""
    f = img.astype(np.float64)
    pad = k // 2
    p = np.pad(f, ((pad + 1, k - 1 - pad), (pad + 1, k - 1 - pad), (0, 0)), mode="edge")
    ii = p.cumsum(axis=0).cumsum(axis=1)
    h, w = f.shape[:2]
    s = (
        ii[k : k + h, k : k + w]
        - ii[:h, k : k + w]
        - ii[k : k + h, :w]
        + ii[:h, :w]
    )
    return s / (k * k)


# --- stage wrapper -------------------------------------------------------

class ImageOp:
    """map_batches body: decode -> composed kernels -> encode.

    ``ops`` is a list of (fn, kwargs); float results are min-max scaled
    back to uint8 for the codec (lossless formats keep exact uint8 ops
    exact).
    """

    def __init__(self, ops: list, out_fmt: str = "png"):
        self.ops = ops
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, out_w, out_h = [], [], []
        for i in range(batch.num_rows):
            img = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            if img.ndim == 2:
                img = img[:, :, None]
            for fn, kwargs in self.ops:
                img = fn(img, **kwargs)
                if img.ndim == 2:
                    img = img[:, :, None]
            if img.dtype != np.uint8:
                lo, hi = img.min(), img.max()
                img = (
                    np.zeros(img.shape, dtype=np.uint8)
                    if hi <= lo
                    else np.clip(np.rint((img - lo) / (hi - lo) * 255), 0, 255).astype(np.uint8)
                )
            out_bytes.append(codec.encode(img.squeeze(-1) if img.shape[2] == 1 else img, self.out_fmt))
            out_h.append(img.shape[0])
            out_w.append(img.shape[1])
        cols = {n: batch[n] for n in batch.column_names if n not in ("bytes", "fmt", "w", "h")}
        cols["bytes"] = pa.array(out_bytes, pa.binary())
        cols["fmt"] = pa.array([self.out_fmt] * batch.num_rows, pa.string())
        cols["w"] = pa.array(out_w, pa.int32())
        cols["h"] = pa.array(out_h, pa.int32())
        return pa.table(cols)


def apply_image_ops(images, ops: list, out_fmt: str = "png", batch_size: int = 8):
    return images.map_batches(
        ImageOp(ops, out_fmt), batch_format="pyarrow", batch_size=batch_size
    )
