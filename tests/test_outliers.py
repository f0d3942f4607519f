"""MAD outlier tests against a naive twin with quantile_disc rank
semantics (0-based index ceil(q*n)-1)."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.outliers import mad_outliers


def _ds(rows, n_blocks=3):
    t = pa.table(
        {
            "grp": pa.array([r[0] for r in rows], pa.string()),
            "val": pa.array([int(r[1]) for r in rows], pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _med_disc(vals):
    s = sorted(vals)
    return s[math.ceil(0.5 * len(s)) - 1]


def _naive(rows, k):
    groups = {}
    for g, v in rows:
        groups.setdefault(g, []).append(int(v))
    out = {}
    for g, vs in groups.items():
        med = _med_disc(vs)
        devs = [abs(v - med) for v in vs]
        mad = _med_disc(devs)
        n_out = sum(1 for d in devs if d > k * mad)
        out[g] = (med, mad, n_out)
    return out


def _run(rows, k):
    got = mad_outliers(_ds(rows), "grp", "val", k=k).take_all()
    return {r["grp"]: (r["med"], r["mad"], r["n_out"]) for r in got}


def test_basic_outliers():
    rows = [("a", v) for v in [10, 11, 12, 13, 14, 1000]] + [
        ("b", v) for v in [5, 5, 5, 5]
    ]
    got = _run(rows, 3)
    assert got == _naive(rows, 3)
    assert got["a"][2] == 1        # the 1000
    assert got["b"][1] == 0        # constant group: mad 0
    assert got["b"][2] == 0        # dev > 0 never happens


def test_constant_group_with_one_deviant():
    # mad = 0 -> ANY nonzero deviation is an outlier (dev > 0)
    rows = [("c", 7)] * 9 + [("c", 8)]
    got = _run(rows, 3)
    assert got == _naive(rows, 3)
    assert got["c"] == (7, 0, 1)


def test_random_matches_naive():
    rng = np.random.default_rng(11)
    rows = [
        (f"g{int(rng.integers(0, 6))}", int(rng.integers(0, 500)))
        for _ in range(4000)
    ]
    for k in (2, 3):
        assert _run(rows, k) == _naive(rows, k)


def test_rejects_bad_k():
    with pytest.raises(ValueError):
        mad_outliers(_ds([("a", 1)]), "grp", "val", k=0)
