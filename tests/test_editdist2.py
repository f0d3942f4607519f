"""editdist_pairs (k=2): generalized FastSS vs brute-force Levenshtein."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.editdist import _verify_leq_k, editdist_pairs


def _lev(a: str, b: str) -> int:
    la, lb = len(a), len(b)
    dp = list(range(lb + 1))
    for i in range(1, la + 1):
        prev = dp[0]
        dp[0] = i
        for j in range(1, lb + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1,
                        prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[lb]


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _pairs(ds):
    tbls = list(ds.iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(tbls).to_pylist() if tbls else []
    return {(r["id_a"], r["id_b"]) for r in out}


def test_verify_leq_k_matches_dp():
    rng = np.random.RandomState(9)
    strs = ["".join(chr(97 + c) for c in rng.randint(0, 4, rng.randint(0, 7)))
            for _ in range(60)]
    sa, sb = [], []
    for i in range(len(strs)):
        for j in range(len(strs)):
            sa.append(strs[i].encode())
            sb.append(strs[j].encode())
    for k in (1, 2):
        got = _verify_leq_k(np.asarray(sa, object), np.asarray(sb, object), k)
        want = np.array([_lev(a.decode(), b.decode()) <= k
                         for a, b in zip(sa, sb)])
        assert np.array_equal(got, want)


@pytest.mark.parametrize("k", [1, 2])
def test_pairs_match_bruteforce(ray_session, k):
    rng = np.random.RandomState(4)
    strs = ["".join(chr(97 + c) for c in rng.randint(0, 3, rng.randint(1, 8)))
            for _ in range(120)]
    t = pa.table({
        "doc_id": pa.array(np.arange(len(strs)), pa.int64()),
        "s": pa.array(strs),
    })
    got = _pairs(editdist_pairs(_ds(t), k=k))
    want = {(i, j)
            for i in range(len(strs)) for j in range(i + 1, len(strs))
            if _lev(strs[i], strs[j]) <= k}
    assert got == want


def test_k_validation(ray_session):
    t = _ds(pa.table({"doc_id": pa.array([1], pa.int64()),
                      "s": pa.array(["x"])}))
    with pytest.raises(ValueError):
        editdist_pairs(t, k=3)
