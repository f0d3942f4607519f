"""Deterministic Poisson bootstrap."""

import hashlib

import numpy as np
import pyarrow as pa

from solaris_ray.stages.bootstrap import (
    POISSON1_THRESHOLDS_MICRO,
    poisson_bootstrap,
)


def _weight(key: str, salt: str = "boot") -> int:
    h = int.from_bytes(hashlib.md5((salt + key).encode()).digest()[:8],
                       "little") % 1_000_000
    return int(np.searchsorted(POISSON1_THRESHOLDS_MICRO, h, side="right"))


def test_weights_mean_near_one():
    # Poisson(1): the hash-derived weights must average ~1
    w = [_weight(f"{i}_0") for i in range(20_000)]
    assert 0.97 < np.mean(w) < 1.03
    assert max(w) <= 9


def test_replicates_match_scalar_replay(ray_session):
    import ray.data

    n = 400
    v = np.arange(n, dtype=np.int64) * 3
    ds = ray.data.from_arrow(pa.table({"k": np.arange(n), "v": v}))
    out = (
        poisson_bootstrap(ds, "k", "v", n_reps=4)
        .to_pandas().set_index("rep").sort_index()
    )
    for b in range(4):
        w = np.array([_weight(f"{i}_{b}") for i in range(n)])
        assert out.loc[b, "n_eff"] == w.sum()
        assert out.loc[b, "wsum"] == (w * v).sum()
        assert out.loc[b, "mean6"] == round((w * v).sum() / w.sum(), 6)


def test_bootstrap_spread_brackets_true_mean(ray_session):
    import ray.data

    rng = np.random.default_rng(12)
    v = rng.integers(0, 1000, 5000)
    ds = ray.data.from_arrow(pa.table({"k": np.arange(5000), "v": v}))
    out = poisson_bootstrap(ds, "k", "v", n_reps=16).to_pandas()
    means = out["mean6"].to_numpy()
    assert means.min() <= v.mean() <= means.max()
    # replicate spread is O(sigma/sqrt(n)) — sanity band
    assert means.std() < 5 * v.std() / np.sqrt(v.size)
