"""BM25 ranked retrieval tests vs a pure-Python oracle."""

from __future__ import annotations

import math
from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.bm25 import bm25_topk


def _py_bm25(texts, terms, k, k1=1.2, b=0.75):
    tfs = [Counter(t.strip().split()) for t in texts]
    N = len(texts)
    dls = [sum(c.values()) for c in tfs]
    avgdl = sum(dls) / N
    df = {t: sum(1 for c in tfs if t in c) for t in terms}
    idf = {t: math.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5)) for t in terms}
    out = []
    for i, c in enumerate(tfs):
        s, hit = 0.0, False
        for t in terms:
            tf = c.get(t, 0)
            if tf:
                hit = True
                s += idf[t] * tf * (k1 + 1.0) / (
                    tf + k1 * (1.0 - b + b * dls[i] / avgdl))
        if hit:
            out.append((i, round(s, 6)))
    out.sort(key=lambda x: (-x[1], x[0]))
    return out[:k]


def _ds(texts):
    return ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    ).repartition(3)


def test_bm25_matches_python(ray_session):
    rng = np.random.default_rng(23)
    vocab = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [" ".join(rng.choice(vocab, size=rng.integers(3, 25)))
             for _ in range(80)]
    got = bm25_topk(_ds(texts), ["alpha", "zeta"], k=10).to_pandas()
    exp = _py_bm25(texts, ["alpha", "zeta"], 10)
    assert list(zip(got["doc_id"], got["score6"])) == [
        (d, s) for d, s in exp
    ] or all(
        gd == ed and abs(gs - es) < 2e-6
        for (gd, gs), (ed, es) in zip(zip(got["doc_id"], got["score6"]), exp)
    )


def test_bm25_rare_term_outranks_common(ray_session):
    texts = ["common common common", "common rare", "common common"] + \
            ["filler words only"] * 10
    got = bm25_topk(_ds(texts), ["rare", "common"], k=3).to_pandas()
    assert got["doc_id"].iloc[0] == 1  # the doc with the rare term wins


def test_bm25_no_match_empty(ray_session):
    got = bm25_topk(_ds(["a b c", "d e f"]), ["zzz"], k=5).to_pandas()
    assert len(got) == 0
