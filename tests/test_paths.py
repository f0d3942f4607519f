"""Session-path tests against a naive twin (same gap rule and
(ts, event_id) total order)."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.paths import session_paths


def _ds(rows, n_blocks=3):
    # rows: (event_id, user, ts_us, type)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[2] for r in rows], "datetime64[us]"),
                pa.timestamp("us"),
            ),
            "event_type": pa.array([r[3] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(rows, gap_us, top_k):
    by_user = {}
    for eid, u, ts, ty in rows:
        by_user.setdefault(u, []).append((ts, eid, ty))
    c = Counter()
    for u, evs in by_user.items():
        evs.sort()
        path = []
        prev = None
        for ts, eid, ty in evs:
            if prev is not None and ts - prev > gap_us:
                c["->".join(path)] += 1
                path = []
            path.append(ty)
            prev = ts
        if path:
            c["->".join(path)] += 1
    ranked = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))
    return ranked[:top_k]


def _run(rows, gap_us, top_k):
    got = session_paths(_ds(rows), gap_us=gap_us, top_k=top_k).take_all()
    return [(r["path"], r["n_sessions"]) for r in got]


GAP = 30 * 60 * 1_000_000


def test_basic_paths():
    m = 60 * 1_000_000
    rows = [
        (1, 1, 0 * m, "view"), (2, 1, 5 * m, "click"),          # view->click
        (3, 1, 90 * m, "view"), (4, 1, 95 * m, "click"),        # view->click
        (5, 2, 0 * m, "view"), (6, 2, 5 * m, "buy"),            # view->buy
        (7, 3, 0 * m, "view"),                                   # view
    ]
    got = _run(rows, GAP, 10)
    assert got == _naive(rows, GAP, 10)
    assert got[0] == ("view->click", 2)


def test_tie_order_same_timestamp():
    # equal ts resolved by event_id both sides
    rows = [(2, 1, 1000, "b"), (1, 1, 1000, "a"), (3, 1, 2000, "c")]
    got = _run(rows, GAP, 5)
    assert got == [("a->b->c", 1)]


def test_random_matches_naive():
    rng = np.random.default_rng(13)
    types = ["view", "click", "buy", "error"]
    rows = [
        (
            i,
            int(rng.integers(0, 40)),
            int(rng.integers(0, 3 * 3600)) * 1_000_000,
            types[int(rng.integers(0, 4))],
        )
        for i in range(3000)
    ]
    assert _run(rows, GAP, 20) == _naive(rows, GAP, 20)


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        session_paths(_ds([(1, 1, 0, "a")]), gap_us=0)
    with pytest.raises(ValueError):
        session_paths(_ds([(1, 1, 0, "a")]), gap_us=1, top_k=0)
