"""Type co-occurrence / PMI tests against a naive twin."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.cooccur import type_cooccurrence


def _ds(rows, n_blocks=3):
    t = pa.table(
        {
            "user_id": pa.array([r[0] for r in rows], pa.int64()),
            "event_type": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(rows):
    by_u = {}
    for u, t in rows:
        by_u.setdefault(u, set()).add(t)
    n = len(by_u)
    marg = Counter()
    pair = Counter()
    for u, ts in by_u.items():
        for t in ts:
            marg[t] += 1
        ts = sorted(ts)
        for i in range(len(ts)):
            for j in range(i + 1, len(ts)):
                pair[(ts[i], ts[j])] += 1
    out = {}
    for (a, b), c in pair.items():
        out[(a, b)] = (
            c, marg[a], marg[b],
            round(math.log((c * n) / (marg[a] * marg[b])), 6),
        )
    return out


def _run(rows):
    got = type_cooccurrence(_ds(rows)).take_all()
    return {
        (r["ta"], r["tb"]): (r["n_both"], r["n_a"], r["n_b"], r["pmi6"])
        for r in got
    }


def test_basic_pairs():
    rows = [
        (1, "view"), (1, "click"), (1, "view"),
        (2, "view"), (2, "buy"),
        (3, "view"), (3, "click"),
        (4, "error"),
    ]
    got = _run(rows)
    expect = _naive(rows)
    assert got == expect
    assert got[("click", "view")][0] == 2


def test_random_matches_naive():
    rng = np.random.default_rng(51)
    types = ["a", "b", "c", "d", "e"]
    rows = [
        (int(rng.integers(0, 100)), types[int(rng.integers(0, 5))])
        for _ in range(3000)
    ]
    got = _run(rows)
    expect = _naive(rows)
    assert set(got) == set(expect)
    for k in got:
        assert got[k][:3] == expect[k][:3]
        assert got[k][3] == np.round(expect[k][3], 6)


def test_single_type_users_emit_no_pairs():
    rows = [(1, "a"), (2, "a"), (3, "b")]
    assert _run(rows) == {}
