"""IDW interpolation tests.

Oracle: dense python twin of the identical integer-weight arithmetic.
Covers radius filtering, the d²=0 clamp, no-neighbor omission,
block-count invariance, and floor-division estimates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.idw import W_SCALE, idw_interpolate


def _ds(x, y, v, n_blocks=3):
    t = pa.table(
        {
            "x": pa.array(np.asarray(x, np.float64)),
            "y": pa.array(np.asarray(y, np.float64)),
            "v": pa.array(np.asarray(v, np.int64)),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _dense(x, y, v, q, radius):
    out = {}
    r2 = radius * radius
    for qi, (qx, qy) in enumerate(q):
        cnt = wsum = num = 0
        for xi, yi, vi in zip(x, y, v):
            d2 = (int(xi) - qx) ** 2 + (int(yi) - qy) ** 2
            if d2 <= r2:
                w = W_SCALE // max(d2, 1)
                cnt += 1
                wsum += w
                num += w * int(vi)
        if cnt:
            out[qi] = (cnt, wsum, num // wsum)
    return out


def _run(x, y, v, q, radius, n_blocks=3):
    res = idw_interpolate(_ds(x, y, v, n_blocks), np.asarray(q, np.int64),
                          radius).take_all()
    return {r["qid"]: (r["n_obs"], r["wsum"], r["est"]) for r in res}


def test_idw_matches_dense_twin():
    rng = np.random.RandomState(11)
    x = rng.randint(0, 200, 80)
    y = rng.randint(0, 200, 80)
    v = rng.randint(0, 50, 80)
    q = [(50, 50), (150, 150), (0, 0), (199, 0)]
    assert _run(x, y, v, q, 60) == _dense(x, y, v, q, 60)


def test_idw_coincident_point_dominates():
    # obs exactly at the query gets weight W_SCALE (d² clamped to 1)
    x, y, v = [10, 94], [10, 10], [7, 99]
    got = _run(x, y, v, [(10, 10)], 100)
    want = _dense(x, y, v, [(10, 10)], 100)
    assert got == want
    # the clamped self-weight drags the estimate to the coincident value
    assert got[0][2] == 7


def test_idw_no_neighbor_queries_absent():
    got = _run([0], [0], [5], [(0, 1), (500, 500)], 10)
    assert set(got) == {0}


def test_idw_block_invariance():
    rng = np.random.RandomState(12)
    x = rng.randint(0, 300, 120)
    y = rng.randint(0, 300, 120)
    v = rng.randint(0, 100, 120)
    q = [(i * 60 + 30, j * 60 + 30) for i in range(5) for j in range(5)]
    assert _run(x, y, v, q, 80, n_blocks=1) == _run(x, y, v, q, 80, n_blocks=9)
