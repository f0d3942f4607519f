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
    return scale_to(img, float(rng.uniform(lo, hi)))


def scale_to(img: np.ndarray, s: float) -> np.ndarray:
    """Deterministic core of random_scale (param drawn by the caller —
    the image/mask pair path draws once and applies to both)."""
    h, w = img.shape[:2]
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


def random_crop(img: np.ndarray, rng: np.random.Generator,
                height: int, width: int) -> np.ndarray:
    """Albumentations RandomCrop: uniform top-left inside the valid
    range; crop larger than the image raises (same as the reference)."""
    h, w = img.shape[:2]
    if height > h or width > w:
        raise ValueError(f"crop {height}x{width} exceeds image {h}x{w}")
    top = int(rng.integers(0, h - height + 1))
    left = int(rng.integers(0, w - width + 1))
    return img[top : top + height, left : left + width]


def center_crop(img: np.ndarray, height: int, width: int) -> np.ndarray:
    """Albumentations CenterCrop."""
    h, w = img.shape[:2]
    if height > h or width > w:
        raise ValueError(f"crop {height}x{width} exceeds image {h}x{w}")
    top = (h - height) // 2
    left = (w - width) // 2
    return img[top : top + height, left : left + width]


def random_brightness_contrast(img: np.ndarray, rng: np.random.Generator,
                               brightness_limit: float = 0.2,
                               contrast_limit: float = 0.2) -> np.ndarray:
    """Albumentations RandomBrightnessContrast (brightness_by_max):
    out = clip(img * (1 + contrast) + brightness * 255)."""
    alpha = 1.0 + float(rng.uniform(-contrast_limit, contrast_limit))
    beta = float(rng.uniform(-brightness_limit, brightness_limit)) * 255.0
    return np.clip(np.rint(img.astype(np.float64) * alpha + beta),
                   0, 255).astype(np.uint8)


def hue_saturation_value(img: np.ndarray, rng: np.random.Generator,
                         hue_shift_limit: float = 20.0,
                         sat_shift_limit: float = 30.0,
                         val_shift_limit: float = 20.0) -> np.ndarray:
    """Albumentations HueSaturationValue through the engine's own
    vectorized HSV kernels (preproc.rgb_to_hsv / hsv_to_rgb); shift
    limits are in albumentations units (hue degrees/2 out of 180,
    sat/val out of 255)."""
    from .preproc import hsv_to_rgb, rgb_to_hsv

    if img.shape[2] < 3:
        return img  # albumentations no-ops on non-RGB too
    hsv = rgb_to_hsv(img[:, :, :3])
    dh = float(rng.uniform(-hue_shift_limit, hue_shift_limit)) / 180.0
    ds = float(rng.uniform(-sat_shift_limit, sat_shift_limit)) / 255.0
    dv = float(rng.uniform(-val_shift_limit, val_shift_limit)) / 255.0
    hsv[:, :, 0] = (hsv[:, :, 0] + dh) % 1.0
    hsv[:, :, 1] = np.clip(hsv[:, :, 1] + ds, 0.0, 1.0)
    hsv[:, :, 2] = np.clip(hsv[:, :, 2] + dv, 0.0, 1.0)
    out = hsv_to_rgb(hsv)
    if img.shape[2] > 3:
        out = np.concatenate([out, img[:, :, 3:]], axis=2)
    return out


def normalize(img: np.ndarray, mean=(0.485, 0.456, 0.406),
              std=(0.229, 0.224, 0.225),
              max_pixel_value: float = 255.0) -> np.ndarray:
    """Albumentations Normalize: (img/max - mean) / std per channel,
    float64 out.  Terminal by convention (like the reference, where it
    precedes ToTensor); the Augmenter switches to the float codec when
    the pipeline ends on a float image."""
    mean = np.asarray(mean, np.float64)
    std = np.asarray(std, np.float64)
    c = img.shape[2]
    return (img.astype(np.float64) / max_pixel_value
            - mean[:c].reshape(1, 1, -1)) / std[:c].reshape(1, 1, -1)


AUG_REGISTRY = {
    "flip_lr": lambda img, rng, **kw: flip_lr(img),
    "flip_ud": lambda img, rng, **kw: flip_ud(img),
    "rotate90": lambda img, rng, k=1, **kw: rotate90(img, k),
    "rotate": lambda img, rng, limit=45.0, **kw: random_rotate(img, rng, limit),
    "random_scale": lambda img, rng, lo=0.8, hi=1.2, **kw: random_scale(img, rng, lo, hi),
    "swap_channels": lambda img, rng, a=0, b=1, **kw: swap_channels(img, a, b),
    "drop_channel": lambda img, rng, idx=0, **kw: drop_channel(img, idx),
    # albumentations-name aliases (transform.py:21-118 passthrough list)
    "HorizontalFlip": lambda img, rng, **kw: flip_lr(img),
    "VerticalFlip": lambda img, rng, **kw: flip_ud(img),
    "RandomRotate90": lambda img, rng, **kw: rotate90(img, int(rng.integers(0, 4))),
    "Rotate": lambda img, rng, limit=45.0, **kw: random_rotate(img, rng, limit),
    "RandomCrop": lambda img, rng, height=32, width=32, **kw: random_crop(img, rng, height, width),
    "CenterCrop": lambda img, rng, height=32, width=32, **kw: center_crop(img, height, width),
    "RandomBrightnessContrast": lambda img, rng, brightness_limit=0.2, contrast_limit=0.2, **kw:
        random_brightness_contrast(img, rng, brightness_limit, contrast_limit),
    "HueSaturationValue": lambda img, rng, hue_shift_limit=20.0, sat_shift_limit=30.0,
        val_shift_limit=20.0, **kw:
        hue_saturation_value(img, rng, hue_shift_limit, sat_shift_limit, val_shift_limit),
    "Normalize": lambda img, rng, mean=(0.485, 0.456, 0.406), std=(0.229, 0.224, 0.225),
        max_pixel_value=255.0, **kw: normalize(img, mean, std, max_pixel_value),
}


# image+mask pair application: spatial params are drawn ONCE and
# applied to both arrays (the reference's albumentations Compose
# transforms image and mask together, transform.py:420-507);
# photometric ops touch the image only — but consume the SAME rng
# draws as the image-only path, so the image output is bit-identical
# whether or not a mask rides along.
def _pair_crop_window(rng, h, w, height, width):
    if height > h or width > w:
        raise ValueError(f"crop {height}x{width} exceeds image {h}x{w}")
    top = int(rng.integers(0, h - height + 1))
    left = int(rng.integers(0, w - width + 1))
    return top, left


PAIR_REGISTRY = {
    "flip_lr": lambda i, m, rng, **kw: (flip_lr(i), flip_lr(m)),
    "flip_ud": lambda i, m, rng, **kw: (flip_ud(i), flip_ud(m)),
    "rotate90": lambda i, m, rng, k=1, **kw: (rotate90(i, k), rotate90(m, k)),
    "swap_channels": lambda i, m, rng, a=0, b=1, **kw: (swap_channels(i, a, b), m),
    "drop_channel": lambda i, m, rng, idx=0, **kw: (drop_channel(i, idx), m),
    "HorizontalFlip": lambda i, m, rng, **kw: (flip_lr(i), flip_lr(m)),
    "VerticalFlip": lambda i, m, rng, **kw: (flip_ud(i), flip_ud(m)),
    "CenterCrop": lambda i, m, rng, height=32, width=32, **kw:
        (center_crop(i, height, width), center_crop(m, height, width)),
    "Normalize": lambda i, m, rng, mean=(0.485, 0.456, 0.406),
        std=(0.229, 0.224, 0.225), max_pixel_value=255.0, **kw:
        (normalize(i, mean, std, max_pixel_value), m),
}


def _pair_rotate(i, m, rng, limit=45.0, **kw):
    ang = float(rng.uniform(-limit, limit))
    return rotate(i, ang), rotate(m, ang)


def _pair_rr90(i, m, rng, **kw):
    k = int(rng.integers(0, 4))
    return rotate90(i, k), rotate90(m, k)


def _pair_random_crop(i, m, rng, height=32, width=32, **kw):
    top, left = _pair_crop_window(rng, i.shape[0], i.shape[1], height, width)
    return (i[top:top + height, left:left + width],
            m[top:top + height, left:left + width])


def _pair_random_scale(i, m, rng, lo=0.8, hi=1.2, **kw):
    s = float(rng.uniform(lo, hi))
    return scale_to(i, s), scale_to(m, s)


def _pair_bc(i, m, rng, brightness_limit=0.2, contrast_limit=0.2, **kw):
    return random_brightness_contrast(i, rng, brightness_limit, contrast_limit), m


def _pair_hsv(i, m, rng, hue_shift_limit=20.0, sat_shift_limit=30.0,
              val_shift_limit=20.0, **kw):
    return hue_saturation_value(i, rng, hue_shift_limit, sat_shift_limit,
                                val_shift_limit), m


PAIR_REGISTRY.update({
    "rotate": _pair_rotate,
    "Rotate": _pair_rotate,
    "RandomRotate90": _pair_rr90,
    "RandomCrop": _pair_random_crop,
    "random_scale": _pair_random_scale,
    "RandomBrightnessContrast": _pair_bc,
    "HueSaturationValue": _pair_hsv,
})


class Augmenter:
    """map_batches body: config-dict pipeline with per-row seeding.

    ``config`` mirrors process_aug_dict: an ordered dict of
    {aug_name: {**kwargs, 'p': probability}}.  With ``mask_col`` the
    stage transforms (image, mask) PAIRS: spatial ops share one
    parameter draw, photometric ops touch the image only, and the
    image bytes come out bit-identical to the image-only path.
    """

    def __init__(self, config: dict[str, dict], seed: int = 42, out_fmt: str = "png",
                 mask_col: str | None = None):
        unknown = set(config) - set(AUG_REGISTRY)
        if unknown:
            raise ValueError(f"unknown augs {unknown}; known: {sorted(AUG_REGISTRY)}")
        if mask_col is not None:
            missing = set(config) - set(PAIR_REGISTRY)
            if missing:
                raise ValueError(
                    f"augs {missing} have no image+mask pair application")
        self.config = config
        self.seed = seed
        self.out_fmt = out_fmt
        self.mask_col = mask_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_bytes, out_fmts, out_w, out_h, out_mask = [], [], [], [], []
        for i in range(batch.num_rows):
            iid = batch["image_id"][i].as_py()
            rng = np.random.default_rng([self.seed, zlib.crc32(iid.encode())])
            img = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            if img.ndim == 2:
                img = img[:, :, None]
            mask = None
            if self.mask_col is not None:
                mask = codec.decode(batch[self.mask_col][i].as_py(), "png")
                if mask.ndim == 2:
                    mask = mask[:, :, None]
            for name, kwargs in self.config.items():
                p = kwargs.get("p", 1.0)
                if rng.random() < p:
                    kw = {k: v for k, v in kwargs.items() if k != "p"}
                    if mask is None:
                        img = AUG_REGISTRY[name](img, rng, **kw)
                    else:
                        img, mask = PAIR_REGISTRY[name](img, mask, rng, **kw)
                        if mask.ndim == 2:
                            mask = mask[:, :, None]
                    if img.ndim == 2:
                        img = img[:, :, None]
            # a float-typed result (Normalize terminal stage) rides the
            # float codec; integer images keep the configured format
            fmt = "f64" if np.issubdtype(img.dtype, np.floating) else self.out_fmt
            out_bytes.append(
                codec.encode(np.ascontiguousarray(img.squeeze(-1) if img.shape[2] == 1 else img), fmt)
            )
            out_fmts.append(fmt)
            out_w.append(img.shape[1])
            out_h.append(img.shape[0])
            if mask is not None:
                out_mask.append(codec.encode(
                    np.ascontiguousarray(
                        mask.squeeze(-1) if mask.shape[2] == 1 else mask),
                    "png"))
        cols = {n: batch[n] for n in batch.column_names
                if n not in ("bytes", "fmt", "w", "h", self.mask_col)}
        cols["bytes"] = pa.array(out_bytes, pa.binary())
        cols["fmt"] = pa.array(out_fmts, pa.string())
        if self.mask_col is not None:
            cols[self.mask_col] = pa.array(out_mask, pa.binary())
        # crops change dims — refresh w/h when the input carried them
        if "w" in batch.column_names:
            cols["w"] = pa.array(out_w, batch.schema.field("w").type)
        if "h" in batch.column_names:
            cols["h"] = pa.array(out_h, batch.schema.field("h").type)
        return pa.table(cols)


def augment(images, config: dict[str, dict], seed: int = 42, batch_size: int = 8,
            mask_col: str | None = None):
    return images.map_batches(
        Augmenter(config, seed, mask_col=mask_col),
        batch_format="pyarrow", batch_size=batch_size
    )
