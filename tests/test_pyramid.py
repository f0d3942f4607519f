"""Tile-pyramid rollup tests: brute-force python parity, parent/child
consistency invariants, and the batch-partial pre-aggregation."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.geom import cells
from solaris_ray.stages import pyramid


def _pts(n=500, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 4096, n).astype(np.float64)
    y = rng.integers(0, 4096, n).astype(np.float64)
    v = rng.integers(0, 50, n).astype(np.float64)
    return x, y, v


def _run(x, y, v, base, minr, value=True):
    tbl = pa.table({"x": pa.array(x), "y": pa.array(y), "v": pa.array(v)})
    out = pyramid.pyramid_rollup(
        ray.data.from_arrow(tbl), base_res=base, min_res=minr,
        value_col="v" if value else None,
    ).to_pandas()
    return out


def test_matches_bruteforce():
    x, y, v = _pts()
    out = _run(x, y, v, base=20, minr=16)
    for r in range(16, 21):
        edge = cells.cell_edge(r)
        ix = np.floor((x - cells.ORIGIN) / edge).astype(np.int64)
        iy = np.floor((y - cells.ORIGIN) / edge).astype(np.int64)
        sub = out[out["res"] == r]
        got = {(a, b): (n, s) for a, b, n, s in
               zip(sub["ix"], sub["iy"], sub["n_points"], sub["sum_val"])}
        expect = {}
        for i in range(len(x)):
            k = (ix[i], iy[i])
            n0, s0 = expect.get(k, (0, 0.0))
            expect[k] = (n0 + 1, s0 + v[i])
        assert got == expect


def test_levels_conserve_totals():
    x, y, v = _pts(seed=3)
    out = _run(x, y, v, base=19, minr=13)
    for r in range(13, 20):
        sub = out[out["res"] == r]
        assert sub["n_points"].sum() == len(x)
        assert abs(sub["sum_val"].sum() - v.sum()) < 1e-9


def test_single_level_and_count_only():
    x, y, v = _pts(seed=7)
    out = _run(x, y, v, base=18, minr=18, value=False)
    assert set(out["res"]) == {18}
    assert out["n_points"].sum() == len(x)
    assert (out["sum_val"] == out["n_points"]).all()  # value=1.0 default


def test_partials_preaggregate_within_batch():
    # all points in one cell -> each batch emits ONE partial row per level
    x = np.full(1000, 100.0)
    y = np.full(1000, 200.0)
    v = np.ones(1000)
    tbl = pa.table({"x": pa.array(x), "y": pa.array(y), "v": pa.array(v)})
    part = pyramid._partials(tbl, base_res=18, min_res=12,
                             x_col="x", y_col="y", value_col="v")
    assert part.num_rows == 7  # one row per level, not 7000
    assert part["n"].to_pylist() == [1000] * 7
