"""Transition-matrix, equi-width histogram, and percent-rank tests.

Oracles: naive pandas/python twins with the identical semantics
(LEAD ordering incl. id tie-break; edge-clamped bins; ties-share
rank micro-units).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.histogram import group_histogram
from solaris_ray.stages.ntile import group_percent_rank
from solaris_ray.stages.transitions import transition_matrix


def _events_ds(rows, n_blocks=3):
    # rows: (user, type, ts_us, event_id)
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows]),
            "ts": pa.array(
                np.array([r[2] for r in rows], "datetime64[us]"),
                pa.timestamp("us"),
            ),
            "event_id": pa.array([r[3] for r in rows], pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive_transitions(rows):
    out = {}
    for u in {r[0] for r in rows}:
        mine = sorted((r[2], r[3], r[1]) for r in rows if r[0] == u)
        for a, b in zip(mine, mine[1:]):
            out[(a[2], b[2])] = out.get((a[2], b[2]), 0) + 1
    return out


def test_transitions_with_ts_ties():
    rows = [
        (1, "view", 10, 1), (1, "click", 10, 2), (1, "buy", 20, 3),
        (2, "view", 5, 4), (2, "view", 6, 5),
        (3, "err", 1, 6),                      # single event: no pair
    ]
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in transition_matrix(_events_ds(rows)).take_all()}
    assert got == _naive_transitions(rows)
    assert got[("view", "click")] == 1  # tie broken by event_id


def test_transitions_random():
    rng = np.random.default_rng(2)
    types = ["a", "b", "c", "d"]
    rows = [(int(rng.integers(0, 30)), types[int(rng.integers(0, 4))],
             int(rng.integers(0, 500)), i) for i in range(2500)]
    got = {(r["from_type"], r["to_type"]): r["n"]
           for r in transition_matrix(_events_ds(rows)).take_all()}
    assert got == _naive_transitions(rows)


def test_histogram_exact_and_clamped():
    vals = [(-5, "a"), (0, "a"), (99, "a"), (100, "a"), (999, "a"),
            (1000, "a"), (42, "b"), (1_000_000, "b")]
    t = pa.table(
        {
            "source": pa.array([s for _, s in vals]),
            "n_chars": pa.array([v for v, _ in vals], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(3)
    got = {(r["source"], r["bin"]): r["n"]
           for r in group_histogram(ds, "source", "n_chars", 10, 0, 1000).take_all()}
    # bin width 100; -5 clamps into bin 0, >=1000 clamps into bin 9
    assert got == {("a", 0): 3, ("a", 1): 1, ("a", 9): 2,
                   ("b", 0): 1, ("b", 9): 1}
    assert sum(got.values()) == len(vals)  # every row counted


def test_histogram_rejects_bad_params():
    ds = ray.data.from_arrow(
        pa.table({"source": pa.array(["a"]), "n_chars": pa.array([1], pa.int64())})
    )
    with pytest.raises(ValueError):
        group_histogram(ds, "source", "n_chars", 0, 0, 10)
    with pytest.raises(ValueError):
        group_histogram(ds, "source", "n_chars", 4, 10, 10)


def _naive_percent_rank(rows, scale=10**6):
    df = pd.DataFrame(rows, columns=["doc_id", "lang", "n_chars"])
    out = {}
    for _, grp in df.groupby("lang"):
        n = len(grp)
        for _, row in grp.iterrows():
            rk = int((grp["n_chars"] < row.n_chars).sum())  # ties share
            out[int(row.doc_id)] = rk * scale // (n - 1) if n > 1 else 0
    return out


def test_percent_rank_ties_and_singletons():
    rows = [(1, "a", 5), (2, "a", 5), (3, "a", 7), (4, "a", 9),
            (5, "b", 3)]
    t = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "lang": pa.array([r[1] for r in rows]),
            "n_chars": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(2)
    got = {r["doc_id"]: r["pr_micro"]
           for r in group_percent_rank(ds, "lang", "n_chars", "doc_id").take_all()}
    assert got == _naive_percent_rank(rows)
    assert got[1] == got[2] == 0          # tied lowest pair shares rank 1
    assert got[4] == 10**6                # max row hits exactly 1.0
    assert got[5] == 0                    # singleton partition
