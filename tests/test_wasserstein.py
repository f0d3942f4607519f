"""W1-to-global: scipy-free brute twin, identical-distribution zero."""

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.wasserstein import w1_to_global


def _brute_w1(a, b):
    """Exact W1 between two integer samples via sorted-support cdf."""
    sup = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), sup, side="right") / a.size
    fb = np.searchsorted(np.sort(b), sup, side="right") / b.size
    return float(np.sum(np.abs(fa[:-1] - fb[:-1]) * np.diff(sup)))


def _run(keys, vals):
    t = pa.table(
        {
            "k": pa.array(list(keys), pa.string()),
            "v": pa.array(np.asarray(vals, np.int64)),
        }
    )
    out = w1_to_global(
        ray.data.from_arrow(t).repartition(4), key_col="k", val_col="v"
    ).to_pandas()
    return out.set_index("key")


def test_matches_brute(ray_session):
    rng = np.random.default_rng(8)
    keys, vals = [], []
    data = {}
    for kk, (lo, hi, n) in {
        "a": (0, 50, 400), "b": (20, 90, 300), "c": (0, 200, 150)
    }.items():
        v = rng.integers(lo, hi, n)
        data[kk] = v
        keys += [kk] * n
        vals += v.tolist()
    out = _run(keys, vals)
    allv = np.concatenate(list(data.values()))
    for kk, v in data.items():
        want = _brute_w1(v.astype(np.int64), allv.astype(np.int64))
        got = out.loc[kk, "w1u"] / 1e6
        assert abs(got - want) < 2e-6
        assert out.loc[kk, "n"] == v.size


def test_single_source_is_zero(ray_session):
    out = _run(["x"] * 50, np.arange(50))
    assert out.loc["x", "w1u"] == 0
