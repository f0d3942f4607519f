"""Ranked-retrieval metrics vs a brute-force python scorer."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.rank import (
    discount_micro,
    reciprocal_micro,
    retrieval_metrics,
)


def _brute(rows, k=10):
    du, ru = discount_micro(k), reciprocal_micro(k)
    byq = {}
    for q, d, s, r in rows:
        byq.setdefault(q, []).append((d, s, r))
    out = {}
    for q, docs in byq.items():
        ranked = sorted(docs, key=lambda t: (-t[1], t[0]))
        ideal = sorted(docs, key=lambda t: (-t[2], t[0]))
        dcg = sum(r * int(du[i]) for i, (_, _, r) in enumerate(ranked[:k]) if r > 0)
        idcg = sum(r * int(du[i]) for i, (_, _, r) in enumerate(ideal[:k]) if r > 0)
        hits = sum(1 for (_, _, r) in ranked[:k] if r > 0)
        n_rel = sum(1 for (_, _, r) in docs if r > 0)
        first = next((i + 1 for i, (_, _, r) in enumerate(ranked[:k]) if r > 0), None)
        out[q] = dict(
            n_rel=n_rel,
            dcg_u=dcg,
            idcg_u=idcg,
            ndcg6=round(dcg / idcg, 6) if idcg > 0 else 0.0,
            mrr6=int(ru[first - 1]) / 1e6 if first else 0.0,
            recall6=round(hits / n_rel, 6) if n_rel else 0.0,
        )
    return out


def _runs_ds(rows):
    return ray.data.from_arrow(
        pa.table(
            {
                "query_id": pa.array([r[0] for r in rows], pa.int64()),
                "doc_id": pa.array([r[1] for r in rows], pa.int64()),
                "score": pa.array([r[2] for r in rows], pa.float64()),
                "rel": pa.array([r[3] for r in rows], pa.int64()),
            }
        )
    ).repartition(4)


def test_retrieval_metrics_match_brute(ray_session):
    rng = np.random.default_rng(5)
    rows = []
    for q in range(17):
        for d in range(rng.integers(3, 40)):
            rows.append(
                (q, q * 1000 + d, float(rng.uniform(0, 100)), int(rng.integers(0, 4)))
            )
    got = retrieval_metrics(_runs_ds(rows), k=10).to_pandas()
    exp = _brute(rows, k=10)
    assert len(got) == len(exp)
    for _, row in got.iterrows():
        e = exp[row["query_id"]]
        for col in ("n_rel", "dcg_u", "idcg_u", "ndcg6", "mrr6", "recall6"):
            assert row[col] == e[col], (row["query_id"], col, row[col], e[col])


def test_retrieval_metrics_edge_cases(ray_session):
    rows = [
        # q0: no relevant docs at all -> all-zero metrics
        (0, 1, 9.0, 0), (0, 2, 8.0, 0),
        # q1: single perfectly-ranked relevant doc -> ndcg=mrr=recall=1
        (1, 3, 9.0, 2), (1, 4, 8.0, 0),
        # q2: relevant doc beyond k=2 -> mrr 0, recall 0, ndcg 0
        (2, 5, 9.0, 0), (2, 6, 8.0, 0), (2, 7, 7.0, 3),
        # q3: score tie broken by doc_id both sides
        (3, 9, 5.0, 0), (3, 8, 5.0, 1),
    ]
    got = retrieval_metrics(_runs_ds(rows), k=2).to_pandas()
    g = {int(r["query_id"]): r for _, r in got.iterrows()}
    assert g[0]["ndcg6"] == 0.0 and g[0]["mrr6"] == 0.0 and g[0]["n_rel"] == 0
    assert g[1]["ndcg6"] == 1.0 and g[1]["mrr6"] == 1.0 and g[1]["recall6"] == 1.0
    assert g[2]["ndcg6"] == 0.0 and g[2]["mrr6"] == 0.0 and g[2]["recall6"] == 0.0
    assert g[2]["n_rel"] == 1
    # q3: doc 8 (lower id) wins the tie -> relevant at rank 1
    assert g[3]["mrr6"] == 1.0


def test_filtered_ann_restricts_to_query_group(ray_session):
    from solaris_ray.stages.ann import brute_topk, filtered_topk

    rng = np.random.default_rng(9)
    n, dim = 400, 16
    V = rng.standard_normal((n, dim))
    labels = np.arange(n, dtype=np.int64) % 3
    corpus = ray.data.from_arrow(
        pa.table(
            {
                "vec_id": pa.array(np.arange(n, dtype=np.int64)),
                "embedding": pa.array(V.tolist(), pa.list_(pa.float64())),
                "label": pa.array(labels),
            }
        )
    ).repartition(4)
    qids = np.arange(6, dtype=np.int64)
    got = filtered_topk(corpus, qids, V[:6], labels[:6], k=5).to_pandas()
    # every returned neighbor shares its query's label
    for _, r in got.iterrows():
        assert labels[int(r["vec_id"])] == labels[int(r["query_id"])]
    # and equals brute force over only the query's label class
    for q in qids:
        mask = labels == labels[q]
        sub = corpus.map_batches(
            lambda b, m=labels[q]: b.filter(
                pa.compute.equal(b["label"], int(m))),
            batch_format="pyarrow",
        )
        exp = brute_topk(sub, np.array([q]), V[q:q+1], k=5).to_pandas()
        g = got[got["query_id"] == q].sort_values("rank")
        assert list(g["vec_id"]) == list(exp.sort_values("rank")["vec_id"])
