"""Per-entity OLS slope tests against a naive exact-fraction twin."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.trend import trend_slope, _DAY_US


def _ds(rows, n_blocks=3):
    # rows: (user, day, value_float)
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[1] * _DAY_US + 3600 * 10**6 for r in rows],
                         "datetime64[us]"),
                pa.timestamp("us"),
            ),
            "value": pa.array([float(r[2]) for r in rows], pa.float64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(rows):
    by_u = {}
    for u, day, val in rows:
        by_u.setdefault(u, []).append((day, round(val * 100)))
    out = {}
    for u, pts in by_u.items():
        d0 = min(d for d, _ in pts)
        n = len(pts)
        st = sum(d - d0 for d, _ in pts)
        sv = sum(v for _, v in pts)
        stv = sum((d - d0) * v for d, v in pts)
        st2 = sum((d - d0) ** 2 for d, _ in pts)
        num = n * stv - st * sv
        den = n * st2 - st * st
        if den > 0:
            slope = (1 if num >= 0 else -1) * (abs(10**6 * num) // den)
        else:
            slope = 0
        out[u] = (n, num, den, slope)
    return out


def _run(rows):
    got = trend_slope(_ds(rows)).take_all()
    return {r["user_id"]: (r["n_events"], r["num"], r["den"], r["slope_e6"])
            for r in got}


def test_exact_upward_trend():
    rows = [(1, d, 1.00 * (d + 1)) for d in range(5)]  # +100 cents/day
    got = _run(rows)
    assert got == _naive(rows)
    assert got[1][3] == 100 * 10**6


def test_flat_and_single_day():
    rows = [(1, 3, 5.0), (1, 3, 7.0), (2, 0, 1.0)]
    got = _run(rows)
    assert got == _naive(rows)
    assert got[1][3] == 0 and got[2][3] == 0  # den = 0 cases


def test_negative_trend_trunc_semantics():
    rows = [(1, 0, 10.00), (1, 1, 9.99), (1, 2, 9.97)]  # ~-1.5 cents/day
    got = _run(rows)
    assert got == _naive(rows)
    assert got[1][3] < 0


def test_random_matches_naive():
    rng = np.random.default_rng(61)
    rows = [
        (int(rng.integers(0, 30)), int(rng.integers(0, 400)),
         float(rng.integers(1, 50000)) / 100.0)
        for _ in range(3000)
    ]
    assert _run(rows) == _naive(rows)
