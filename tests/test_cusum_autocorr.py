"""CUSUM + lag autocorrelation: sequential twins, segment isolation."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.autocorr import lag_autocorr
from solaris_ray.stages.cusum import cusum_alarms


def _seq_cusum(vals, mu0, k, h):
    s, alarms, first, mx = 0, 0, -1, 0
    for i, x in enumerate(vals):
        s = max(0, s + (x - mu0 - k))
        mx = max(mx, s)
        if s > h:
            alarms += 1
            if first < 0:
                first = i
    return alarms, first, mx


def _mk(keys, ts, vals):
    return ray.data.from_arrow(
        pa.table(
            {
                "k": pa.array(np.asarray(keys, np.int64)),
                "t": pa.array(np.asarray(ts, np.int64)),
                "id": pa.array(np.arange(len(keys), dtype=np.int64)),
                "v": pa.array(np.asarray(vals, np.int64)),
            }
        )
    ).repartition(5)


@pytest.mark.parametrize("seed", [0, 3])
def test_cusum_matches_sequential(ray_session, seed):
    rng = np.random.default_rng(seed)
    n, nk = 4000, 23
    keys = rng.integers(0, nk, n)
    ts = rng.integers(0, 10_000, n)
    vals = rng.integers(0, 40, n)
    out = (
        cusum_alarms(
            _mk(keys, ts, vals), key_col="k", order_cols=["t"],
            val_col="v", mu0=15, slack=2, h=60, id_col="id",
        )
        .sort("key")
        .to_pandas()
        .set_index("key")
    )
    ids = np.arange(n)
    for kk in range(nk):
        m = keys == kk
        order = np.lexsort((ids[m], ts[m]))
        a, f, mx = _seq_cusum(vals[m][order], 15, 2, 60)
        row = out.loc[kk]
        assert (row["n_alarms"], row["first_alarm"], row["max_s"]) == (a, f, mx)


def test_cusum_negative_never_alarms(ray_session):
    out = (
        cusum_alarms(
            _mk([1] * 5, range(5), [0] * 5), key_col="k",
            order_cols=["t"], val_col="v", mu0=10, slack=0, h=1, id_col="id",
        )
        .to_pandas()
        .iloc[0]
    )
    assert out["n_alarms"] == 0 and out["first_alarm"] == -1 and out["max_s"] == 0


@pytest.mark.parametrize("lag", [1, 3])
def test_autocorr_matches_numpy(ray_session, lag):
    rng = np.random.default_rng(11)
    n, nk = 3000, 17
    keys = rng.integers(0, nk, n)
    ts = rng.integers(0, 10_000, n)
    vals = rng.integers(0, 500, n)
    out = (
        lag_autocorr(
            _mk(keys, ts, vals), key_col="k", order_cols=["t"],
            val_col="v", lag=lag, id_col="id",
        )
        .sort("key")
        .to_pandas()
        .set_index("key")
    )
    ids = np.arange(n)
    for kk in range(nk):
        m = keys == kk
        order = np.lexsort((ids[m], ts[m]))
        v = vals[m][order].astype(np.int64)
        x, y = v[:-lag], v[lag:]
        row = out.loc[kk]
        assert row["n"] == x.size
        assert row["sx"] == x.sum() and row["sy"] == y.sum()
        assert row["sxy"] == (x * y).sum()
        if x.size > 1 and np.ptp(x) and np.ptp(y):
            want = np.corrcoef(x, y)[0, 1]
            assert abs(row["r6"] / 1e6 - want) < 2e-6


def test_autocorr_short_series_null_r(ray_session):
    out = (
        lag_autocorr(
            _mk([7], [0], [5]), key_col="k", order_cols=["t"],
            val_col="v", lag=1, id_col="id",
        )
        .to_pandas()
        .iloc[0]
    )
    assert out["n"] == 0 and out["r6"] is None or np.isnan(out["r6"])
