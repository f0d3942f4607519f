"""TF-IDF top-k tests vs a hand-computed / pure-Python oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.tfidf import tfidf_topk


def _ds(texts, n_blocks=1):
    tbl = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "text": pa.array(texts),
        }
    )
    d = ray.data.from_arrow(tbl)
    return d.repartition(n_blocks) if n_blocks > 1 else d


def _py_tfidf(texts, k):
    tfs = [Counter(t.strip().split()) for t in texts]
    df = Counter()
    for tf in tfs:
        df.update(tf.keys())
    n = float(len(texts))
    out = []
    for i, tf in enumerate(tfs):
        scored = sorted(
            ((round(c * math.log(n / df[t]), 6), t, c) for t, c in tf.items()),
            key=lambda x: (-x[0], x[1]),
        )[:k]
        for r, (s, t, c) in enumerate(scored, 1):
            out.append((i, r, t, c, df[t], s))
    return out


def test_tfidf_hand_corpus(ray_session):
    texts = [
        "apple banana apple cherry",
        "banana cherry cherry date",
        "apple date date date egg",
        "fig fig fig fig",
    ]
    got = (
        tfidf_topk(_ds(texts), k=3)
        .to_pandas()
        .sort_values(["doc_id", "rank"])
        .reset_index(drop=True)
    )
    exp = _py_tfidf(texts, 3)
    assert len(got) == len(exp)
    for row, (d, r, t, tf, df, s) in zip(got.itertuples(index=False), exp):
        assert (row.doc_id, row.rank, row.term, row.tf, row.df) == (d, r, t, tf, df)
        assert abs(row.score6 - s) < 1e-9


def test_tfidf_tie_break_by_term(ray_session):
    # all terms appear once in one doc each -> equal scores, rank by term asc
    texts = ["zeta alpha mid", "other words here"]
    got = tfidf_topk(_ds(texts), k=3).to_pandas()
    d0 = got[got.doc_id == 0].sort_values("rank")
    assert list(d0["term"]) == ["alpha", "mid", "zeta"]


def test_tfidf_block_invariance(ray_session):
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(40)]
    texts = [
        " ".join(rng.choice(vocab, size=rng.integers(5, 30)))
        for _ in range(120)
    ]
    a = tfidf_topk(_ds(texts, 1), k=4).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    b = tfidf_topk(_ds(texts, 7), k=4).to_pandas().sort_values(
        ["doc_id", "rank"]).reset_index(drop=True)
    assert a.equals(b)
