"""rolling_median2: exact per-series windowed medians."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.rolling import rolling_median2


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _rows(ds):
    tbls = list(ds.iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(tbls).to_pylist()
    return sorted(out, key=lambda r: r["event_id"])


def test_rolling_median_matches_numpy(ray_session):
    rng = np.random.RandomState(7)
    n, k = 400, 5
    ent = rng.randint(0, 9, n)
    ts = rng.randint(0, 10_000, n) * 1_000_000
    vals = rng.randint(-500, 500, n) / 100.0
    ev = _ds(pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(ts, pa.int64()),
        "user_id": pa.array(ent, pa.int64()),
        "value": pa.array(vals, pa.float64()),
    }))
    got = {r["event_id"]: (r["n_win"], r["med2"]) for r in _rows(rolling_median2(ev, k=k))}

    cents = np.round(vals * 100).astype(np.int64)
    order = np.lexsort((np.arange(n), ts, ent))
    series = {}
    for i in order:
        s = series.setdefault(ent[i], [])
        s.append(i)
        win = sorted(cents[j] for j in s[-k:])
        w = len(win)
        med2 = win[(w - 1) // 2] + win[w // 2]
        assert got[i] == (w, med2), f"row {i}"


def test_rolling_median_window_one_and_bad_k(ray_session):
    ev = _ds(pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([1, 2], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "value": pa.array([1.0, 3.0], pa.float64()),
    }))
    rows = _rows(rolling_median2(ev, k=1))
    assert [r["med2"] for r in rows] == [200, 600]
    with pytest.raises(ValueError):
        rolling_median2(ev, k=0)
