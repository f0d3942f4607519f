"""Rolling-distinct-actives (WAU) tests.

Oracle: naive per-day set scan with the identical trailing-window
semantics.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.actives import rolling_actives, _DAY_US


def _events_ds(rows, n_blocks=3):
    # rows: (user, day)
    u = np.array([r[0] for r in rows], np.int64)
    ts = np.array([r[1] * _DAY_US + (i % 24) * 3600 * 10**6
                   for i, r in enumerate(rows)], "datetime64[us]")
    t = pa.table({"user_id": pa.array(u), "ts": pa.array(ts, pa.timestamp("us"))})
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(rows, window):
    pairs = {(u, d) for u, d in rows}
    days = {d for _, d in pairs}
    out = {}
    lo, hi = min(days), max(days) + window
    for day in range(lo, hi):
        n = len({u for u, d in pairs if day - window < d <= day})
        if n:
            out[day] = n
    return out


def _run(rows, window):
    got = rolling_actives(_events_ds(rows), window=window).take_all()
    return {r["day"]: r["n_active"] for r in got}


def test_wau_basic():
    rows = [(1, 10), (1, 12), (2, 10), (3, 17), (1, 10)]
    got = _run(rows, 7)
    assert got == _naive(rows, 7)
    assert got[10] == 2           # users 1, 2 on day 10
    assert got[16] == 2           # both still inside trailing 7 of day 16
    assert got[17] == 2           # user 2 aged out (10+7<=17), user 3 in


def test_dau_window_one():
    rows = [(1, 5), (2, 5), (1, 6)]
    assert _run(rows, 1) == {5: 2, 6: 1}


def test_wau_random_bucket_invariance():
    rng = np.random.default_rng(9)
    rows = [(int(rng.integers(0, 50)), int(rng.integers(1000, 1040)))
            for _ in range(3000)]
    for w in (3, 7):
        assert _run(rows, w) == _naive(rows, w)


def test_wau_rejects_bad_window():
    with pytest.raises(ValueError):
        rolling_actives(_events_ds([(1, 1)]), window=0)
