"""Exact distributed dominance counting (IEJoin-class aggregate)."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.dominance import (
    _dominance_in_order,
    _same_bucket_counts,
    dominance_counts,
)


def _brute(t, v):
    return ((t[None, :] < t[:, None]) & (v[None, :] > v[:, None])).sum(axis=1)


def test_in_order_kernel_matches_quadratic():
    rng = np.random.default_rng(1)
    v = rng.integers(0, 50, 500)
    want = np.array([
        (v[:i] > v[i]).sum() for i in range(v.size)
    ], dtype=np.int64)
    assert (_dominance_in_order(v) == want).all()


def test_same_bucket_kernel_excludes_equal_t():
    t = np.array([1, 1, 1, 2, 2], dtype=np.int64)
    v = np.array([5, 9, 1, 3, 9], dtype=np.int64)
    ids = np.arange(5)
    got = _same_bucket_counts(t, ids, v)
    assert (got == _brute(t, v)).all()
    # the all-equal-t degenerate case: nothing counts
    assert (_same_bucket_counts(np.ones(4, np.int64), np.arange(4),
                                np.array([4, 3, 2, 1])) == 0).all()


@pytest.mark.parametrize("pb,qb", [(1, 1), (4, 4), (16, 16)])
def test_dominance_counts_vs_bruteforce(ray_session, pb, qb):
    rng = np.random.default_rng(7)
    n = 800
    t = rng.integers(0, 120, n)
    v = rng.integers(0, 40, n)
    ds = __import__("ray").data.from_arrow(
        pa.table({"id": np.arange(n), "t": t, "v": v})
    )
    out = (
        dominance_counts(ds, "id", "t", "v", n_tbuckets=pb, n_vbuckets=qb)
        .to_pandas().sort_values("id")
    )
    assert (out["dom"].to_numpy() == _brute(t, v)).all()


def test_dominance_sorted_ascending_is_zero(ray_session):
    # t ascending and v ascending: no earlier element is ever larger
    n = 200
    ds = __import__("ray").data.from_arrow(
        pa.table({"id": np.arange(n), "t": np.arange(n), "v": np.arange(n)})
    )
    out = dominance_counts(ds, "id", "t", "v").to_pandas()
    assert (out["dom"] == 0).all()


def test_dominance_reverse_sorted_is_index(ray_session):
    # t ascending, v descending: every earlier element dominates
    n = 200
    ds = __import__("ray").data.from_arrow(
        pa.table({"id": np.arange(n), "t": np.arange(n),
                  "v": n - np.arange(n)})
    )
    out = dominance_counts(ds, "id", "t", "v").to_pandas().sort_values("id")
    assert (out["dom"].to_numpy() == np.arange(n)).all()


def test_kendall_tau_matches_bruteforce(ray_session):
    from solaris_ray.stages.dominance import kendall_tau

    rng = np.random.default_rng(11)
    n = 400
    t = rng.integers(0, 80, n)
    v = (t * 3 + rng.integers(0, 60, n)).astype(np.int64)  # positive trend
    ds = __import__("ray").data.from_arrow(
        pa.table({"id": np.arange(n), "t": t, "v": v})
    )
    out = kendall_tau(ds, "id", "t", "v").to_pandas().iloc[0]
    # quadratic reference
    dt = t[:, None] - t[None, :]
    dv = v[:, None] - v[None, :]
    iu = np.triu_indices(n, 1)
    s = np.sign(dt[iu]) * np.sign(dv[iu])
    c, d = int((s > 0).sum()), int((s < 0).sum())
    tt = int((dt[iu] == 0).sum())
    tv_ = int((dv[iu] == 0).sum())
    pairs = n * (n - 1) // 2
    tau = round((c - d) / np.sqrt(float(pairs - tt) * float(pairs - tv_)), 6)
    assert out["concordant"] == c and out["discordant"] == d
    assert out["ties_t"] == tt and out["ties_v"] == tv_
    assert out["tau6"] == tau
    assert out["tau6"] > 0.5  # the planted trend is visible
