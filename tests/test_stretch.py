"""Global contrast-stretch tests against a naive numpy twin (exact
integer rescale, quantile_disc rank semantics for the percentiles)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.raster import codec
from solaris_ray.stages.stretch import contrast_stretch, global_percentiles


def _images_ds(arrays, n_blocks=2):
    rows = {
        "image_id": [f"img_{i}" for i in range(len(arrays))],
        "bytes": [codec.encode(a.astype(np.uint8), "png") for a in arrays],
        "fmt": ["png"] * len(arrays),
        "w": [a.shape[1] for a in arrays],
        "h": [a.shape[0] for a in arrays],
    }
    t = pa.table(
        {
            "image_id": pa.array(rows["image_id"], pa.string()),
            "bytes": pa.array(rows["bytes"], pa.binary()),
            "fmt": pa.array(rows["fmt"], pa.string()),
            "w": pa.array(rows["w"], pa.int64()),
            "h": pa.array(rows["h"], pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(arrays, q_lo, q_hi):
    allpx = np.sort(np.concatenate([a.ravel() for a in arrays]))
    n = allpx.size
    lo = int(allpx[math.ceil(q_lo * n) - 1])
    hi = int(allpx[math.ceil(q_hi * n) - 1])
    span = max(hi - lo, 1)
    out = {}
    for i, a in enumerate(arrays):
        v = np.minimum(np.maximum(a.astype(np.int64) - lo, 0) * 255 // span, 255)
        out[f"img_{i}"] = (int(v.sum()), int(v.min()), int(v.max()), lo, hi)
    return out


def test_percentiles_match_rank_semantics():
    rng = np.random.default_rng(2)
    arrays = [rng.integers(10, 200, size=(16, 16)).astype(np.uint8) for _ in range(5)]
    lo, hi, n = global_percentiles(_images_ds(arrays), 0.02, 0.98)
    allpx = np.sort(np.concatenate([a.ravel() for a in arrays]))
    assert n == allpx.size
    assert lo == int(allpx[math.ceil(0.02 * n) - 1])
    assert hi == int(allpx[math.ceil(0.98 * n) - 1])


def test_stretch_matches_naive():
    rng = np.random.default_rng(4)
    arrays = [rng.integers(0, 256, size=(12, 20)).astype(np.uint8) for _ in range(8)]
    got = {
        r["image_id"]: (r["px_sum"], r["px_min"], r["px_max"], r["lo"], r["hi"])
        for r in contrast_stretch(_images_ds(arrays), 0.02, 0.98).take_all()
    }
    assert got == _naive(arrays, 0.02, 0.98)


def test_constant_corpus_degenerate_span():
    arrays = [np.full((8, 8), 77, np.uint8) for _ in range(3)]
    got = contrast_stretch(_images_ds(arrays), 0.02, 0.98).take_all()
    for r in got:
        # lo == hi == 77 -> span clamps to 1, (77-77)*255 = 0 everywhere
        assert (r["px_sum"], r["px_min"], r["px_max"]) == (0, 0, 0)


def test_rejects_bad_quantiles():
    arrays = [np.zeros((4, 4), np.uint8)]
    with pytest.raises(ValueError):
        contrast_stretch(_images_ds(arrays), 0.9, 0.1)
