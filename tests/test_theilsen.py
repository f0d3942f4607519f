"""Theil-Sen: brute pairwise-median twin, outlier robustness, caps."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.theilsen import theil_sen


def _brute(t, v):
    ms = []
    for i in range(t.size):
        for j in range(t.size):
            if t[i] < t[j]:
                dy, dt = int(v[j] - v[i]), int(t[j] - t[i])
                s = (dy * 10**6) // dt if dy >= 0 else -((-dy) * 10**6 // dt)
                ms.append(s)
    if not ms:
        return 0, None
    ms.sort()
    return len(ms), ms[(len(ms) - 1) // 2]


def _run(keys, ts, vals, **kw):
    t = pa.table(
        {
            "k": pa.array(np.asarray(keys, np.int64)),
            "t": pa.array(np.asarray(ts, np.int64)),
            "v": pa.array(np.asarray(vals, np.int64)),
        }
    )
    return (
        theil_sen(
            ray.data.from_arrow(t).repartition(4),
            key_col="k", t_col="t", v_col="v", **kw,
        )
        .sort("key")
        .to_pandas()
        .set_index("key")
    )


def test_matches_brute_with_ties(ray_session):
    rng = np.random.default_rng(6)
    n, nk = 1200, 11
    keys = rng.integers(0, nk, n)
    ts = rng.integers(0, 80, n)  # heavy timestamp ties
    vals = rng.integers(-50, 50, n)
    out = _run(keys, ts, vals)
    for kk in range(nk):
        m = keys == kk
        np_, med = _brute(ts[m], vals[m])
        assert out.loc[kk, "n_pairs"] == np_
        if med is None:
            assert out.loc[kk, "slope_u"] is None or np.isnan(
                out.loc[kk, "slope_u"]
            )
        else:
            assert out.loc[kk, "slope_u"] == med


def test_outlier_robustness(ray_session):
    t = np.arange(30)
    v = 5 * t
    v[7] = 100000  # one wild outlier
    out = _run(np.zeros(30), t, v)
    assert out.loc[0, "slope_u"] == 5_000_000  # slope 5.0 exactly


def test_cap_raises(ray_session):
    with pytest.raises(Exception, match="max_key_rows"):
        _run(np.zeros(50), np.arange(50), np.arange(50), max_key_rows=10)
