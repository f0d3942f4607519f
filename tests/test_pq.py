"""Product-quantization tests.

Oracle: a dense numpy/python twin of the identical int64 arithmetic —
exact equality for encode and ADC.  Also: trained codebooks beat the
formula codebooks on recall for clustered data (the operator is a real
quantizer, not just a parity fixture), block-count invariance, the
self-exclusion convention, and the dim-mismatch guard.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages import pq


def _ds(ids, X, n_blocks=3):
    t = pa.table(
        {
            "vec_id": pa.array(np.asarray(ids, np.int64)),
            "embedding": pa.array([list(map(float, r)) for r in X],
                                  pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _dense_codes(X, books, quant=1000):
    Xq = np.floor(np.asarray(X, np.float64) * quant + 0.5).astype(np.int64)
    m, ksub, dsub = books.shape
    out = np.empty((Xq.shape[0], m), np.int64)
    for i in range(Xq.shape[0]):
        for s in range(m):
            v = Xq[i, s * dsub : (s + 1) * dsub]
            d = [int(((v - books[s, c]) ** 2).sum()) for c in range(ksub)]
            out[i, s] = int(np.argmin(d))
    return out


def _dense_adc(Xq_row, codes, books, quant=1000):
    q = np.floor(np.asarray(Xq_row, np.float64) * quant + 0.5).astype(np.int64)
    m, ksub, dsub = books.shape
    dists = []
    for row in codes:
        tot = 0
        for s in range(m):
            v = q[s * dsub : (s + 1) * dsub]
            tot += int(((v - books[s, int(row[s])]) ** 2).sum())
        dists.append(tot)
    return np.asarray(dists, np.int64)


def test_pq_encode_matches_dense_twin():
    rng = np.random.RandomState(3)
    X = np.round(rng.uniform(-0.5, 0.5, (40, 16)), 4).astype(np.float32)
    books = pq.seeded_codebooks(16, m=4, ksub=5)
    got = pq.pq_encode(_ds(range(40), X), books).sort("vec_id").take_all()
    want = _dense_codes(X, books)
    for i, row in enumerate(got):
        assert [row[f"c{s}"] for s in range(4)] == list(want[i])


def test_pq_adc_topk_exact_and_self_excluded():
    rng = np.random.RandomState(4)
    X = np.round(rng.uniform(-0.5, 0.5, (30, 8)), 4).astype(np.float32)
    books = pq.seeded_codebooks(8, m=2, ksub=4)
    codes_ds = pq.pq_encode(_ds(range(30), X), books)
    got = pq.pq_adc_topk(
        codes_ds, np.array([0, 7]), X[[0, 7]].astype(np.float64), books, k=3
    ).take_all()
    codes = _dense_codes(X, books)
    by_q = {}
    for row in got:
        by_q.setdefault(row["query_id"], []).append(row)
    for qid in (0, 7):
        d = _dense_adc(X[qid], codes, books)
        order = np.lexsort((np.arange(30), d))
        order = order[order != qid][:3]
        rows = sorted(by_q[qid], key=lambda r: r["rank"])
        assert [r["vec_id"] for r in rows] == list(order)
        assert [r["dist"] for r in rows] == [int(d[i]) for i in order]
        assert all(r["vec_id"] != qid for r in rows)


def test_pq_block_invariance():
    rng = np.random.RandomState(5)
    X = np.round(rng.uniform(-0.4, 0.4, (50, 16)), 4).astype(np.float32)
    books = pq.seeded_codebooks(16, m=4, ksub=8)
    q = X[[2, 9]].astype(np.float64)

    def run(nb):
        codes = pq.pq_encode(_ds(range(50), X, n_blocks=nb), books)
        out = pq.pq_adc_topk(codes, np.array([2, 9]), q, books, k=5)
        return [(r["query_id"], r["rank"], r["vec_id"], r["dist"])
                for r in out.sort(["query_id", "rank"]).take_all()]

    assert run(1) == run(7)


def test_pq_trained_codebooks_recall_beats_formula():
    # 4 tight clusters in 8-d: trained PQ must put same-cluster vectors
    # nearest; the arbitrary formula codebooks generally won't
    rng = np.random.RandomState(6)
    centers = rng.uniform(-0.4, 0.4, (4, 8))
    X = np.repeat(centers, 25, axis=0) + rng.normal(0, 0.01, (100, 8))
    X = X.astype(np.float32)
    ds = _ds(range(100), X)
    books = pq.train_codebooks(ds, 8, m=2, ksub=4, sample_size=100)
    codes_ds = pq.pq_encode(ds, books)
    qids = np.array([0, 25, 50, 75])
    out = pq.pq_adc_topk(
        codes_ds, qids, X[qids].astype(np.float64), books, k=10
    ).take_all()
    hits = sum(
        1 for r in out if r["vec_id"] // 25 == r["query_id"] // 25
    )
    assert hits >= 36  # >= 90% same-cluster recall@10


def test_pq_dim_mismatch_raises():
    X = np.zeros((4, 12), np.float32)
    books = pq.seeded_codebooks(16, m=4, ksub=4)
    with pytest.raises(Exception, match="dim"):
        pq.pq_encode(_ds(range(4), X), books).take_all()


def test_pq_seeded_codebooks_reject_uneven_split():
    with pytest.raises(ValueError, match="divide"):
        pq.seeded_codebooks(10, m=4)
