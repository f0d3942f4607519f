"""Naive-Bayes counts: collections.Counter twin, empty-text guard."""

import collections

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.nbayes import nbayes_counts


def _run(docs):
    t = pa.table(
        {
            "text": pa.array([s for s, _ in docs], pa.string()),
            "lang": pa.array([c for _, c in docs], pa.string()),
        }
    )
    out = nbayes_counts(
        ray.data.from_arrow(t).repartition(4), class_col="lang"
    )
    return out.to_pandas()


def test_matches_counter(ray_session):
    rng = np.random.default_rng(2)
    vocab = [f"w{i}" for i in range(15)]
    docs = []
    for i in range(200):
        cls = f"c{i % 3}"
        k = int(rng.integers(1, 12))
        docs.append((" ".join(rng.choice(vocab, k)), cls))
    out = _run(docs)
    cnt = collections.Counter()
    cls_toks = collections.Counter()
    cls_docs = collections.Counter()
    for text, cls in docs:
        ws = text.split()
        cls_docs[cls] += 1
        cls_toks[cls] += len(ws)
        for w in ws:
            cnt[(cls, w)] += 1
    assert len(out) == len(cnt)
    for _, r in out.iterrows():
        assert cnt[(r["cls"], r["tok"])] == r["cnt"]
        assert cls_toks[r["cls"]] == r["cls_tokens"]
        assert cls_docs[r["cls"]] == r["cls_docs"]
    # sorted output
    assert list(out["cls"]) == sorted(out["cls"])


def test_empty_text_counts_doc_but_no_tokens(ray_session):
    out = _run([("", "a"), ("x x", "a"), ("  ", "a")])
    assert list(out["tok"]) == ["x"]
    assert out.iloc[0]["cnt"] == 2
    assert out.iloc[0]["cls_tokens"] == 2
    assert out.iloc[0]["cls_docs"] == 3
