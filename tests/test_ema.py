"""Exact-integer per-key EMA (time-major vectorized recurrence)."""

import numpy as np
import pyarrow as pa

from solaris_ray.stages.ema import ema_final, ema_kernel


def _scalar_ema(xs, shift):
    s = xs[0]
    for x in xs[1:]:
        s = (((1 << shift) - 1) * s + x) >> shift
    return s


def test_kernel_matches_scalar_replay():
    rng = np.random.default_rng(5)
    n = 2000
    key = rng.integers(0, 37, n)
    t = rng.integers(0, 10_000, n)
    ids = np.arange(n)
    x = rng.integers(0, 50_000, n)
    uniq, cnt, s = ema_kernel(key, t, ids, x, shift=2)
    for i, k in enumerate(uniq):
        m = key == k
        order = np.lexsort((ids[m], t[m]))
        want = _scalar_ema(x[m][order].tolist(), 2)
        assert s[i] == want, k
        assert cnt[i] == m.sum()


def test_kernel_tie_order_uses_id():
    # equal timestamps: the id tiebreak decides the replay order
    key = np.zeros(3, np.int64)
    t = np.zeros(3, np.int64)
    ids = np.array([2, 0, 1])
    x = np.array([100, 0, 40], np.int64)
    _, _, s = ema_kernel(key, t, ids, x, shift=2)
    assert s[0] == _scalar_ema([0, 40, 100], 2)


def test_single_event_key_is_identity():
    uniq, cnt, s = ema_kernel(
        np.array([9]), np.array([5]), np.array([1]), np.array([777]), 2
    )
    assert uniq.tolist() == [9] and cnt.tolist() == [1] and s.tolist() == [777]


def test_ema_final_dataset(ray_session):
    import ray.data

    n = 500
    rng = np.random.default_rng(9)
    tbl = pa.table({
        "k": rng.integers(0, 20, n),
        "t": rng.integers(0, 1000, n),
        "i": np.arange(n),
        "x": rng.integers(0, 10_000, n),
    })
    out = (
        ema_final(ray.data.from_arrow(tbl), "k", "t", "i", "x", shift=3)
        .to_pandas().set_index("key").sort_index()
    )
    key = tbl["k"].to_numpy()
    t, ids, x = tbl["t"].to_numpy(), tbl["i"].to_numpy(), tbl["x"].to_numpy()
    for k in np.unique(key):
        m = key == k
        order = np.lexsort((ids[m], t[m]))
        assert out.loc[k, "ema"] == _scalar_ema(x[m][order].tolist(), 3)
        assert out.loc[k, "n"] == m.sum()
