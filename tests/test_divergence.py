"""Per-source KL divergence tests against a naive dense twin
(re.split tokens, textbook KL, 6-dp round)."""

from __future__ import annotations

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.divergence import source_kl


def _ds(rows, n_blocks=3):
    t = pa.table(
        {
            "source": pa.array([r[0] for r in rows], pa.string()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(rows):
    st = Counter()
    for s, text in rows:
        for tok in re.split(r"\s+", text.strip()):
            st[(s, tok)] += 1
    ns = Counter()
    ct = Counter()
    for (s, t), c in st.items():
        ns[s] += c
        ct[t] += c
    n = sum(ns.values())
    out = {}
    for s in ns:
        kl = 0.0
        for (s2, t), c in st.items():
            if s2 != s:
                continue
            p = c / ns[s]
            q = ct[t] / n
            kl += p * math.log(p / q)
        out[s] = (ns[s], round(kl, 6))
    return out


def _run(rows):
    got = source_kl(_ds(rows)).take_all()
    return {r["source"]: (r["n_tokens"], r["kl6"]) for r in got}


def test_identical_sources_zero_kl():
    rows = [("a", "x y z"), ("b", "x y z")]
    got = _run(rows)
    assert got == _naive(rows)
    assert got["a"][1] == 0.0 and got["b"][1] == 0.0


def test_skewed_source_positive_kl():
    rows = [("a", "x x x x"), ("b", "x y z w q r s t")]
    got = _run(rows)
    expect = _naive(rows)
    assert got == expect
    assert got["a"][1] > 0.0


def test_random_matches_naive():
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(30)]
    rows = []
    for i in range(300):
        s = f"s{int(rng.integers(0, 4))}"
        # give each source a biased vocabulary slice
        lo = 5 * int(s[1])
        words = [
            vocab[int(rng.integers(lo, min(lo + 15, 30)))]
            for _ in range(int(rng.integers(1, 20)))
        ]
        rows.append((s, " ".join(words)))
    got = _run(rows)
    expect = _naive(rows)
    assert set(got) == set(expect)
    for s in got:
        assert got[s][0] == expect[s][0]
        assert got[s][1] == np.round(expect[s][1], 6)
