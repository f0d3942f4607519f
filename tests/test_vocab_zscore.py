"""Heavy-hitters and group z-score tests vs pure-Python oracles."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.normalize import group_zscore
from solaris_ray.stages.tfidf import vocab_topk


def test_vocab_topk_exact_counts_and_ties(ray_session):
    texts = ["b a a", "c b a", "d c b a", "e z z"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(4, dtype=np.int64)),
                  "text": pa.array(texts)})
    ).repartition(3)
    got = vocab_topk(ds, k=4).to_pandas()
    c = Counter(" ".join(texts).split())
    exp = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:4]
    assert list(zip(got["term"], got["cnt"])) == exp


def test_group_zscore_matches_numpy(ray_session):
    rng = np.random.default_rng(14)
    langs = rng.choice(["en", "fr", "de"], size=200)
    vals = rng.integers(10, 5000, size=200)
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(200, dtype=np.int64)),
                "lang": pa.array(langs.tolist()),
                "n_chars": pa.array(vals.astype(np.int64)),
            }
        )
    ).repartition(5)
    got = group_zscore(ds, "lang", "n_chars", "doc_id").to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    for lg in ["en", "fr", "de"]:
        m = langs == lg
        x = vals[m].astype(np.float64)
        exp = np.round((x - x.mean()) / x.std(), 6)
        np.testing.assert_allclose(
            got[got.lang == lg]["z6"].to_numpy(), exp, atol=2e-6
        )


def test_group_zscore_constant_group(ray_session):
    ds = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(np.arange(5, dtype=np.int64)),
                "lang": pa.array(["x"] * 5),
                "n_chars": pa.array(np.full(5, 42, np.int64)),
            }
        )
    )
    got = group_zscore(ds, "lang", "n_chars", "doc_id").to_pandas()
    assert (got["z6"] == 0.0).all()


def test_boolean_search_and(ray_session):
    from solaris_ray.stages.text import boolean_search

    texts = ["join hash scan join", "join hash", "scan hash join scan",
             "nothing here", "join join join"]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(5, dtype=np.int64)),
                  "text": pa.array(texts)})
    ).repartition(2)
    got = boolean_search(ds, ["join", "hash", "scan"]).to_pandas().sort_values(
        "doc_id").reset_index(drop=True)
    assert list(got["doc_id"]) == [0, 2]
    assert list(got["n_hits"]) == [4, 4]
