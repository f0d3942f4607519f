"""Edit-distance-1 join tests — brute-force Levenshtein twin."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.editdist import editdist1_pairs, _verify_leq1


def _lev(a: str, b: str) -> int:
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1,
                cur[j - 1] + 1,
                prev[j - 1] + (a[i - 1] != b[j - 1]),
            )
        prev = cur
    return prev[n]


def _brute_pairs(strs):
    out = set()
    for i in range(len(strs)):
        for j in range(i + 1, len(strs)):
            if _lev(strs[i], strs[j]) <= 1:
                out.add((i, j))
    return out


def _run(strs, n_blocks=3, **kw):
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(strs), dtype=np.int64)),
            "s": pa.array(strs, pa.string()),
        }
    )
    ds = ray.data.from_arrow(t).repartition(n_blocks)
    rows = editdist1_pairs(ds, **kw).take_all()
    return {(r["id_a"], r["id_b"]) for r in rows}


def test_editdist_basic_ops():
    strs = [
        "cat",      # 0
        "cut",      # 1: substitution of 0
        "cats",     # 2: insertion on 0
        "ca",       # 3: deletion of 0
        "dog",      # 4: unrelated
        "cat",      # 5: exact duplicate of 0
        "",         # 6: empty
        "c",        # 7: one char (dist 1 from "" and "ca")
    ]
    assert _run(strs) == _brute_pairs(strs)


def test_editdist_random_short_strings():
    rng = np.random.RandomState(5)
    alpha = "abc"
    strs = [
        "".join(alpha[k] for k in rng.randint(0, 3, rng.randint(1, 5)))
        for _ in range(80)
    ]
    assert _run(strs) == _brute_pairs(strs)


def test_editdist_no_false_positives_from_shared_deletions():
    # "ab"/"ba" share deletion keys {a, b} but are at distance 2
    assert _run(["ab", "ba"]) == set()


def test_editdist_numbered_names_fixture_shape():
    strs = [f"Customer#{i:09d}" for i in range(1, 60)]
    assert _run(strs, n_blocks=5) == _brute_pairs(strs)


def test_verify_kernel_length_edge_cases():
    sa = np.array([b"", b"a", b"abc", b"abcd", b"xy"], dtype=object)
    sb = np.array([b"a", b"", b"abd", b"abc", b"yx"], dtype=object)
    assert _verify_leq1(sa, sb).tolist() == [True, True, True, True, False]
