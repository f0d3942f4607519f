"""Tests for repetition stats, PII scrubbing, and the two-pass corpus
ops (decontamination, bigram-LM scoring).

Oracle strategy: slow pure-Python reimplementations on small
deterministic inputs, plus edge cases (empty text, single token, no
PII, all-duplicate docs).
"""

from __future__ import annotations

import hashlib
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages import text


REP_DOCS = [
    "a a a b a b",
    "x",
    "",
    "  spaced   out  ",
    "c d c d c d c",
    "one two two two three",
    "z z z z z z z z",
]


def _rep_table():
    return pa.table(
        {
            "doc_id": pa.array(range(len(REP_DOCS)), pa.int64()),
            "text": pa.array(REP_DOCS),
        }
    )


def test_repetition_stats_matches_python():
    out = text.repetition_stats(_rep_table()).to_pydict()
    for i, t in enumerate(REP_DOCS):
        toks = re.split(r"\s+", t.strip())
        n, nd = len(toks), len(set(toks))
        bgs = [toks[j] + " " + toks[j + 1] for j in range(n - 1)]
        top = max([bgs.count(x) for x in set(bgs)], default=0)
        mr = cur = 1
        for j in range(1, n):
            cur = cur + 1 if toks[j] == toks[j - 1] else 1
            mr = max(mr, cur)
        assert out["n_tokens"][i] == n
        assert out["n_distinct_tokens"][i] == nd
        assert out["dup_token_frac"][i] == (n - nd) / n
        assert out["top_bigram_n"][i] == top
        assert out["max_run"][i] == mr


def test_repetition_stats_flags_degenerate_doc():
    out = text.repetition_stats(_rep_table()).to_pydict()
    # "z z z z z z z z": one distinct token, max run = all of it
    assert out["dup_token_frac"][6] == 7 / 8
    assert out["top_bigram_frac"][6] == 1.0
    assert out["max_run"][6] == 8


PII_DOCS = [
    "mail bob.smith+x@ex-ample.co.uk or a@b.io today",
    "call 555-123-4567 then ping 10.0.0.1",
    "no pii at all",
    "",
]


def test_pii_scrub_counts_and_redacts():
    b = pa.table(
        {
            "doc_id": pa.array(range(len(PII_DOCS)), pa.int64()),
            "text": pa.array(PII_DOCS),
        }
    )
    out = text.pii_scrub(b).to_pydict()
    assert out["n_emails"] == [2, 0, 0, 0]
    assert out["n_phones"] == [0, 1, 0, 0]
    assert out["n_ips"] == [0, 1, 0, 0]
    scrubbed = "call <PHONE> then ping <IP>"
    assert out["clean_fp"][1] == hashlib.md5(scrubbed.encode()).hexdigest()
    # untouched rows hash their original text
    assert out["clean_fp"][2] == hashlib.md5(b"no pii at all").hexdigest()


def test_pii_scrub_email_eats_phone_digits_in_order():
    # staged semantics: the email is removed first, so digits inside it
    # never count as a phone
    b = pa.table(
        {
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["555-123-4567@example.com"]),
        }
    )
    out = text.pii_scrub(b).to_pydict()
    assert out["n_emails"] == [1]
    assert out["n_phones"] == [0]


CORPUS_DOCS = [
    "the quick brown fox jumps over the lazy dog again and again",
    "the quick brown cat sat on the mat",
    "completely different words here nothing shared at all",
    "the quick brown fox strikes again said the lazy dog",
]
BENCH_TEXT = "the quick brown fox jumps over the lazy dog"


@pytest.fixture(scope="module")
def corpus_ds(ray_session):
    import ray

    return ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array(range(1, len(CORPUS_DOCS) + 1), pa.int64()),
                "text": pa.array(CORPUS_DOCS),
            }
        )
    )


def test_decontaminate_matches_sets(ray_session, corpus_ds):
    import ray

    from solaris_ray.stages import corpus

    bench = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([99], pa.int64()), "text": pa.array([BENCH_TEXT])})
    )
    out = corpus.decontaminate(corpus_ds, bench, k=10).to_pandas().set_index("doc_id")
    bset = {BENCH_TEXT[i : i + 10] for i in range(len(BENCH_TEXT) - 9)}
    for d, t in zip(range(1, len(CORPUS_DOCS) + 1), CORPUS_DOCS):
        gs = {t[i : i + 10] for i in range(len(t) - 9)}
        assert out.loc[d, "n_grams"] == len(gs)
        assert out.loc[d, "n_overlap"] == len(gs & bset)
        assert out.loc[d, "contaminated"] == int(bool(gs & bset))
    assert out["contaminated"].tolist() == [1, 1, 0, 1]


def test_decontaminate_short_docs_have_no_grams(ray_session):
    import ray

    from solaris_ray.stages import corpus

    docs = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([1], pa.int64()), "text": pa.array(["tiny"])})
    )
    bench = ray.data.from_arrow(
        pa.table({"doc_id": pa.array([2], pa.int64()), "text": pa.array([BENCH_TEXT])})
    )
    out = corpus.decontaminate(docs, bench, k=10).to_pandas()
    assert out["n_grams"].tolist() == [0]
    assert out["contaminated"].tolist() == [0]


def test_bigram_lm_matches_counter(ray_session, corpus_ds):
    from solaris_ray.stages import corpus

    def bgs(t):
        toks = t.split()
        return [toks[i] + " " + toks[i + 1] for i in range(len(toks) - 1)]

    allbg = Counter()
    for t in CORPUS_DOCS:
        allbg.update(bgs(t))
    vocab = {b: c for b, c in allbg.items() if c >= 2}
    out = corpus.bigram_lm_scores(corpus_ds, min_count=2).to_pandas().set_index("doc_id")
    for d, t in zip(range(1, len(CORPUS_DOCS) + 1), CORPUS_DOCS):
        bl = bgs(t)
        assert out.loc[d, "n_bigrams"] == len(bl)
        assert out.loc[d, "n_covered"] == sum(1 for b in bl if b in vocab)
        assert out.loc[d, "lm_hits"] == sum(vocab.get(b, 0) for b in bl)


def test_bigram_lm_separate_train_corpus(ray_session, corpus_ds):
    import ray

    from solaris_ray.stages import corpus

    # train on a corpus that only contains "the quick": every other
    # bigram scores 0
    train = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([1, 2, 3], pa.int64()),
                "text": pa.array(["the quick", "the quick", "the quick"]),
            }
        )
    )
    out = (
        corpus.bigram_lm_scores(corpus_ds, min_count=2, train_ds=train)
        .to_pandas()
        .set_index("doc_id")
    )
    for d, t in zip(range(1, len(CORPUS_DOCS) + 1), CORPUS_DOCS):
        toks = t.split()
        n_tq = sum(
            1 for i in range(len(toks) - 1) if (toks[i], toks[i + 1]) == ("the", "quick")
        )
        assert out.loc[d, "n_covered"] == n_tq
        assert out.loc[d, "lm_hits"] == 3 * n_tq


def test_chunk_documents_edges(ray_session):
    import pyarrow as pa
    import ray
    from solaris_ray.stages.corpus import chunk_documents

    docs = ray.data.from_arrow(
        pa.table(
            {
                "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
                "text": pa.array(["", "ab", "x" * 10, "y" * 11]),
            }
        )
    )
    rows = chunk_documents(docs, size=10, overlap=4).take_all()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk"], r["n_chars"]) for r in rows}
    # empty + short docs emit exactly one chunk
    assert got[(0, 0)] == ("", 0)
    assert got[(1, 0)] == ("ab", 2)
    # len == size: one chunk (len - overlap = 6 <= stride)
    assert got[(2, 0)] == ("x" * 10, 10)
    assert (2, 1) not in got
    # len == size + 1: second chunk adds the 1 new char (+ overlap)
    assert got[(3, 0)] == ("y" * 10, 10)
    assert got[(3, 1)] == ("y" * 5, 5)
    assert len(rows) == 5


def test_paragraph_dedup_winner_and_rebuild(ray_session):
    import hashlib

    import ray.data

    from solaris_ray.stages.corpus import paragraph_dedup

    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array([
            "A\n\nB\n\nA",        # intra-doc dup: second A loses
            "B\n\nC",             # B lost to doc 1
            "A\n\nB",             # both lose
        ], pa.string()),
    })
    out = paragraph_dedup(ray.data.from_arrow(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert out.loc[1, "n_para"] == 3 and out.loc[1, "n_kept"] == 2
    assert out.loc[1, "clean_md5"] == hashlib.md5(b"A\n\nB").hexdigest()
    assert out.loc[2, "n_kept"] == 1
    assert out.loc[2, "clean_md5"] == hashlib.md5(b"C").hexdigest()
    assert out.loc[3, "n_kept"] == 0
    assert out.loc[3, "clean_md5"] == hashlib.md5(b"").hexdigest()


def test_paragraph_dedup_no_dups_is_identity(ray_session):
    import hashlib

    import ray.data

    from solaris_ray.stages.corpus import paragraph_dedup

    docs = pa.table({
        "doc_id": pa.array([7, 8], pa.int64()),
        "text": pa.array(["x\n\ny", "z"], pa.string()),
    })
    out = paragraph_dedup(ray.data.from_arrow(docs)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert (out.n_para == out.n_kept).all()
    assert out.loc[7, "clean_md5"] == hashlib.md5(b"x\n\ny").hexdigest()


def test_dsir_weights_favor_target_like_docs(ray_session):
    import ray.data

    from solaris_ray.stages.corpus import dsir_weights

    raw = pa.table({
        "doc_id": pa.array(list(range(8)), pa.int64()),
        "text": pa.array(
            ["alpha beta gamma"] * 4 + ["delta epsilon zeta"] * 4, pa.string()),
    })
    target = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array(["alpha beta", "beta gamma alpha"], pa.string()),
    })
    out = dsir_weights(ray.data.from_arrow(raw),
                       ray.data.from_arrow(target)).to_pandas() \
        .set_index("doc_id").sort_index()
    assert (out.n_toks == 3).all()
    # docs sharing the target's vocabulary must outscore the others
    assert out.loc[:3, "logw"].min() > out.loc[4:, "logw"].max()
