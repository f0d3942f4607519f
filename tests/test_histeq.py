"""Histogram equalization: hand-computed twin over a real PNG."""

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.raster.codec import encode
from solaris_ray.stages.stretch import hist_equalize


def _ref_eq(img):
    flat = img.ravel()
    hist = np.bincount(flat, minlength=256)
    cdf = np.cumsum(hist)
    n = int(cdf[-1])
    cdf_min = int(cdf[np.flatnonzero(hist)[0]])
    lut = (np.maximum(cdf - cdf_min, 0) * 255 // max(n - cdf_min, 1)).astype(
        np.int64
    )
    return lut[flat]


def _images(arrays):
    rows = {
        "image_id": [], "bytes": [], "fmt": [], "w": [], "h": [],
    }
    for i, a in enumerate(arrays):
        rows["image_id"].append(f"t_{i}")
        rows["bytes"].append(encode(a, "png"))
        rows["fmt"].append("png")
        rows["w"].append(a.shape[1])
        rows["h"].append(a.shape[0])
    return ray.data.from_arrow(
        pa.table(
            {
                "image_id": pa.array(rows["image_id"], pa.string()),
                "bytes": pa.array(rows["bytes"], pa.binary()),
                "fmt": pa.array(rows["fmt"], pa.string()),
                "w": pa.array(rows["w"], pa.int32()),
                "h": pa.array(rows["h"], pa.int32()),
            }
        )
    )


def test_equalize_matches_reference(ray_session):
    rng = np.random.default_rng(3)
    arrays = [
        rng.integers(40, 90, (32, 32)).astype(np.uint8),  # low contrast
        (np.arange(1024).reshape(32, 32) % 256).astype(np.uint8),
        np.full((16, 16), 77, np.uint8),  # constant -> all zeros
    ]
    out = hist_equalize(_images(arrays)).sort("image_id").to_pandas()
    for i, a in enumerate(arrays):
        ref = _ref_eq(a)
        row = out[out["image_id"] == f"t_{i}"].iloc[0]
        assert row["eq_sum"] == int(ref.sum())
        assert row["eq_min"] == int(ref.min())
        assert row["eq_max"] == int(ref.max())
    # constant image maps to zeros; full-range ramp stays full-range
    assert out[out["image_id"] == "t_2"]["eq_sum"].iloc[0] == 0
    assert out[out["image_id"] == "t_1"]["eq_max"].iloc[0] == 255
    # equalization stretches the low-contrast image to ~full range
    assert out[out["image_id"] == "t_0"]["eq_max"].iloc[0] > 200
