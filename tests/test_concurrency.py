"""Peak-concurrency tests against a naive sweep (inclusive interval
semantics, earliest-instant tie break)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.concurrency import peak_concurrency


def _ds(ivals, n_blocks=3):
    t = pa.table(
        {
            "start_us": pa.array([i[0] for i in ivals], pa.int64()),
            "end_us": pa.array([i[1] for i in ivals], pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(ivals):
    if not ivals:
        return (0, -1)
    events = {}
    for s, e in ivals:
        events[s] = events.get(s, 0) + 1
        events[e + 1] = events.get(e + 1, 0) - 1
    peak, t_at, cur = 0, -1, 0
    for t in sorted(events):
        cur += events[t]
        if cur > peak:
            peak, t_at = cur, t
    return (peak, t_at)


def _run(ivals):
    r = peak_concurrency(_ds(ivals)).take_all()[0]
    return (r["peak"], r["t_us"])


def test_basic_overlap():
    ivals = [(0, 10), (5, 15), (8, 9), (20, 30)]
    assert _run(ivals) == _naive(ivals) == (3, 8)


def test_inclusive_endpoints_touching():
    # [0,5] and [5,10] overlap AT 5 (inclusive semantics)
    ivals = [(0, 5), (5, 10)]
    assert _run(ivals) == _naive(ivals) == (2, 5)


def test_earliest_tie_instant():
    ivals = [(0, 1), (0, 1), (10, 11), (10, 11)]
    assert _run(ivals) == _naive(ivals) == (2, 0)


def test_random_matches_naive_across_blocks():
    rng = np.random.default_rng(21)
    ivals = []
    for _ in range(2000):
        s = int(rng.integers(0, 10_000))
        ivals.append((s, s + int(rng.integers(0, 500))))
    assert _run(ivals) == _naive(ivals)
