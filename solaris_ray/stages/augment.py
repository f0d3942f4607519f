"""Augmentations — solaris.nets.transform re-expressed, deterministic.

Reference (/root/reference/solaris/nets/transform.py): albumentations
passthrough + custom DropChannel (:77), SwapChannels (:105), Rotate
(:149), RandomScale (:194); config-dict -> Compose via
``process_aug_dict``/``_get_aug`` (:420-507).

Here each aug is a pure kernel; randomness is seeded PER ROW from
(seed, crc32(image_id)) so any worker produces identical output for a
row at any parallelism (SURVEY.md §2.2 "rng seeded per-row for
determinism").  ``build_augmenter`` mirrors the reference's
name-registry config dict.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa

from ..raster import codec
from .preproc import drop_channel, swap_channels


def flip_lr(img: np.ndarray, rng=None) -> np.ndarray:
    return img[:, ::-1]


def flip_ud(img: np.ndarray, rng=None) -> np.ndarray:
    return img[::-1]


def rotate90(img: np.ndarray, k: int = 1, rng=None) -> np.ndarray:
    return np.rot90(img, k=k, axes=(0, 1))


def rotate(img: np.ndarray, angle_deg: float, rng=None, fill=0) -> np.ndarray:
    """Arbitrary rotation about the center, nearest-neighbor sampling
    (Rotate, transform.py:149-193; border filled with ``fill``)."""
    h, w = img.shape[:2]
    theta = np.radians(angle_deg)
    cy, cx = (h - 1) / 2.0, (w - 1) / 2.0
    yy, xx = np.indices((h, w))
    # inverse map: output pixel -> source pixel
    xs = (xx - cx) * np.cos(theta) + (yy - cy) * np.sin(theta) + cx
    ys = -(xx - cx) * np.sin(theta) + (yy - cy) * np.cos(theta) + cy
    xi = np.rint(xs).astype(np.int64)
    yi = np.rint(ys).astype(np.int64)
    ok = (xi >= 0) & (xi < w) & (yi >= 0) & (yi < h)
    out = np.full_like(img, fill)
    out[yy[ok], xx[ok]] = img[yi[ok], xi[ok]]
    return out


def random_rotate(img: np.ndarray, rng: np.random.Generator, limit: float = 45.0) -> np.ndarray:
    return rotate(img, float(rng.uniform(-limit, limit)))


def random_scale(img: np.ndarray, rng: np.random.Generator,
                 lo: float = 0.8, hi: float = 1.2) -> np.ndarray:
    """Scale then center-crop/pad back to the input size
    (RandomScale, transform.py:194-243)."""
    h, w = img.shape[:2]
    s = float(rng.uniform(lo, hi))
    nh, nw = max(1, int(round(h * s))), max(1, int(round(w * s)))
    yi = (np.arange(nh) * h // nh)
    xi = (np.arange(nw) * w // nw)
    scaled = img[yi][:, xi]
    out = np.zeros_like(img)
    ch = min(h, nh)
    cw = min(w, nw)
    oy, ox = (h - ch) // 2, (w - cw) // 2
    sy, sx = (nh - ch) // 2, (nw - cw) // 2
    out[oy : oy + ch, ox : ox + cw] = scaled[sy : sy + ch, sx : sx + cw]
    return out


AUG_REGISTRY = {
    "flip_lr": lambda img, rng, **kw: flip_lr(img),
    "flip_ud": lambda img, rng, **kw: flip_ud(img),
    "rotate90": lambda img, rng, k=1, **kw: rotate90(img, k),
    "rotate": lambda img, rng, limit=45.0, **kw: random_rotate(img, rng, limit),
    "random_scale": lambda img, rng, lo=0.8, hi=1.2, **kw: random_scale(img, rng, lo, hi),
    "swap_channels": lambda img, rng, a=0, b=1, **kw: swap_channels(img, a, b),
    "drop_channel": lambda img, rng, idx=0, **kw: drop_channel(img, idx),
}


class Augmenter:
    """map_batches body: config-dict pipeline with per-row seeding.

    ``config`` mirrors process_aug_dict: an ordered dict of
    {aug_name: {**kwargs, 'p': probability}}.
    """

    def __init__(self, config: dict[str, dict], seed: int = 42, out_fmt: str = "png"):
        unknown = set(config) - set(AUG_REGISTRY)
        if unknown:
            raise ValueError(f"unknown augs {unknown}; known: {sorted(AUG_REGISTRY)}")
        self.config = config
        self.seed = seed
        self.out_fmt = out_fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes = []
        for i in range(batch.num_rows):
            iid = batch["image_id"][i].as_py()
            rng = np.random.default_rng([self.seed, zlib.crc32(iid.encode())])
            img = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            if img.ndim == 2:
                img = img[:, :, None]
            for name, kwargs in self.config.items():
                p = kwargs.get("p", 1.0)
                if rng.random() < p:
                    kw = {k: v for k, v in kwargs.items() if k != "p"}
                    img = AUG_REGISTRY[name](img, rng, **kw)
                    if img.ndim == 2:
                        img = img[:, :, None]
            out_bytes.append(
                codec.encode(np.ascontiguousarray(img.squeeze(-1) if img.shape[2] == 1 else img), self.out_fmt)
            )
        cols = {n: batch[n] for n in batch.column_names if n not in ("bytes", "fmt")}
        cols["bytes"] = pa.array(out_bytes, pa.binary())
        cols["fmt"] = pa.array([self.out_fmt] * batch.num_rows, pa.string())
        return pa.table(cols)


def augment(images, config: dict[str, dict], seed: int = 42, batch_size: int = 8):
    return images.map_batches(
        Augmenter(config, seed), batch_format="pyarrow", batch_size=batch_size
    )
