"""Distributed 2-D skyline tests — brute-force dominance twin."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.skyline import skyline, _frontier_mask


def _brute(a, b):
    keep = []
    for i in range(len(a)):
        dominated = any(
            (a[j] >= a[i] and b[j] <= b[i]) and (a[j] > a[i] or b[j] < b[i])
            for j in range(len(a))
        )
        keep.append(not dominated)
    return np.array(keep, bool)


def _run(a, b, n_blocks=4):
    t = pa.table(
        {
            "rid": pa.array(np.arange(len(a), dtype=np.int64)),
            "a": pa.array(np.array(a, np.int64)),
            "b": pa.array(np.array(b, np.int64)),
        }
    )
    ds = ray.data.from_arrow(t).repartition(n_blocks)
    rows = skyline(ds, "a", "b").take_all()
    return sorted(r["rid"] for r in rows)


def test_frontier_mask_matches_brute_random():
    rng = np.random.RandomState(3)
    a = rng.randint(0, 40, 300)
    b = rng.randint(0, 40, 300)
    got = _frontier_mask(a.astype(np.int64), b.astype(np.int64))
    want = _brute(a, b)
    assert np.array_equal(got, want)


def test_skyline_keeps_all_exact_ties():
    # two identical frontier points: both kept; a dominated twin: dropped
    a = [10, 10, 9, 5]
    b = [1, 1, 1, 0]
    got = _run(a, b)
    assert got == [0, 1, 3]


def test_skyline_block_invariance():
    rng = np.random.RandomState(9)
    a = rng.randint(0, 100, 500).tolist()
    b = rng.randint(0, 100, 500).tolist()
    want = sorted(np.flatnonzero(_brute(a, b)).tolist())
    assert _run(a, b, n_blocks=1) == want
    assert _run(a, b, n_blocks=13) == want


def test_skyline_single_row_and_monotone_chain():
    assert _run([7], [3]) == [0]
    # strictly improving chain: only the last point survives
    assert _run([1, 2, 3], [3, 2, 1]) == [2]
