"""Clark-Evans index tests against a naive O(n^2) twin."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.pointstats import clark_evans


def _q_ds(pts, n_blocks=3):
    t = pa.table(
        {
            "point_id": pa.array([p[0] for p in pts], pa.int64()),
            "x": pa.array([float(p[1]) for p in pts], pa.float64()),
            "y": pa.array([float(p[2]) for p in pts], pa.float64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _f_ds(pts, n_blocks=3):
    t = pa.table(
        {
            "feature_id": pa.array([p[0] for p in pts], pa.int64()),
            "cx": pa.array([float(p[1]) for p in pts], pa.float64()),
            "cy": pa.array([float(p[2]) for p in pts], pa.float64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(qs, fs, area):
    import numpy as np

    s = 0.0
    for qid, qx, qy in qs:
        best = min(
            (qx - fx) ** 2 + (qy - fy) ** 2
            for fid, fx, fy in fs
            if fid != qid
        )
        s += math.sqrt(best)
    mean = s / len(qs)
    r = mean / (0.5 / math.sqrt(len(fs) / area))
    return round(mean, 6), round(r, 6)


def test_random_pattern():
    rng = np.random.default_rng(23)
    pts = [
        (i, float(rng.uniform(0, 500)), float(rng.uniform(0, 500)))
        for i in range(300)
    ]
    got = clark_evans(_q_ds(pts), _f_ds(pts), area=500.0 * 500.0).take_all()[0]
    mean6, r6 = _naive(pts, pts, 500.0 * 500.0)
    assert got["n_q"] == 300 and got["n_feat"] == 300
    assert got["mean_nn6"] == pytest.approx(mean6, abs=2e-6)
    assert got["r6"] == pytest.approx(r6, abs=2e-6)
    assert 0.7 < got["r6"] < 1.3  # uniform-random ~ 1


def test_clumped_duplicates_score_low():
    # coincident duplicates: NN distance 0 for every point -> R = 0
    pts = [(i, float(10 * (i % 5)), 0.0) for i in range(50)]
    got = clark_evans(_q_ds(pts), _f_ds(pts), area=2500.0).take_all()[0]
    assert got["mean_nn6"] == 0.0 and got["r6"] == 0.0


def test_query_subset_of_features():
    pts = [(i, float(i * 3), float(i * 7 % 40)) for i in range(40)]
    qs = pts[:10]
    got = clark_evans(_q_ds(qs), _f_ds(pts), area=1.0e4).take_all()[0]
    mean6, r6 = _naive(qs, pts, 1.0e4)
    assert got["n_q"] == 10 and got["n_feat"] == 40
    assert got["mean_nn6"] == pytest.approx(mean6, abs=2e-6)
    assert got["r6"] == pytest.approx(r6, abs=2e-6)


def test_rejects_bad_inputs():
    pts = [(1, 0.0, 0.0)]
    with pytest.raises(ValueError):
        clark_evans(_q_ds(pts), _f_ds(pts), area=0.0)
    with pytest.raises(ValueError):
        clark_evans(_q_ds(pts), _f_ds(pts), area=1.0)
