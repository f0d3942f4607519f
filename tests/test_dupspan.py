"""Duplicate-span detection (exact k-gram coverage) tests.

Oracle: slow pure-Python set-of-covered-positions on small inputs,
plus edge cases (doc shorter than k, internal repeats only, full-doc
duplicate pairs, gram on a doc boundary stays per-doc).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages import dupspan


def _py_cover(docs: dict[int, str], k: int, min_count: int = 2):
    from collections import Counter

    grams = Counter()
    for t in docs.values():
        for i in range(len(t) - k + 1):
            grams[t[i : i + k]] += 1
    out = {}
    for did, t in docs.items():
        covered = set()
        for i in range(len(t) - k + 1):
            if grams[t[i : i + k]] >= min_count:
                covered.update(range(i, i + k))
        if covered:
            out[did] = len(covered)
    return out


def _run(docs: dict[int, str], k: int, min_count: int = 2):
    tbl = pa.table(
        {
            "doc_id": pa.array(list(docs), pa.int64()),
            "text": pa.array(list(docs.values())),
        }
    )
    ds = ray.data.from_arrow(tbl)
    out = dupspan.duplicate_spans(ds, k=k, min_count=min_count).to_pandas()
    return dict(zip(out["doc_id"], out["dup_chars"]))


def test_matches_python_oracle():
    docs = {
        0: "the quick brown fox jumps over the lazy dog again and again",
        1: "the quick brown fox sat still",
        2: "completely unrelated content here",
        3: "xyz" * 20,  # internal repeats
        4: "",  # empty
        5: "short",  # < k
    }
    k = 10
    expect = _py_cover(docs, k)
    got = _run(docs, k)
    assert got == expect


def test_full_duplicate_pair_fully_covered():
    body = "".join(chr(97 + (i * 7) % 26) for i in range(200))
    docs = {10: body, 11: body, 12: "no dup material at all zz"}
    got = _run(docs, 32)
    assert got == {10: 200, 11: 200}


def test_rolling_hash_equals_direct():
    texts = ["hello world rolling hash", "abcabcabc", ""]
    k = 4
    rows, pos, h = dupspan.rolling_gram_hashes(texts, k)
    np.seterr(over="ignore")
    B = np.uint64(1000003)
    for r, p, hv in zip(rows, pos, h):
        g = texts[int(r)][int(p) : int(p) + k]
        acc = np.uint64(0)
        for ch in g:
            acc = acc * B + np.uint64(ord(ch))
        assert acc == hv


def test_min_count_three():
    docs = {0: "A" * 40, 1: "A" * 40, 2: "A" * 40, 3: "B" * 40 + "C"}
    # with min_count=3 the AAAA grams appear >=3 times (3 docs x many
    # positions); B-grams appear 31 times within one doc -> also >= 3
    got = _run(docs, 10, min_count=3)
    assert got[0] == 40 and got[1] == 40 and got[2] == 40
    # the B-run grams repeat 31x within doc 3 (>= 3), covering the 40
    # B's; the single "BBBBBBBBBC" gram occurs once so the trailing C
    # (position 40) stays uncovered
    assert got[3] == 40
