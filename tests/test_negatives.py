"""Contrastive negative mining tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.negatives import mine_negatives


def _ds(ids, n_blocks=1):
    d = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.asarray(ids, np.int64))})
    )
    return d.repartition(n_blocks) if n_blocks > 1 else d


def _py_negatives(ids, k):
    ids = sorted(ids)
    n = len(ids)
    out = []
    for r, a in enumerate(ids):
        for j in range(1, k + 1):
            off = 1 + ((j * 2654435761 + r) % (n - 1))
            out.append((a, j, ids[(r + off) % n]))
    return sorted(out)


def test_negatives_match_python_and_never_self(ray_session):
    ids = [3, 7, 11, 20, 21, 35, 40, 41, 55, 90]
    got = mine_negatives(_ds(ids, 3), k=4).to_pandas().sort_values(
        ["anchor_id", "j"]).reset_index(drop=True)
    exp = _py_negatives(ids, 4)
    assert list(map(tuple, got.itertuples(index=False))) == exp
    assert (got["anchor_id"] != got["neg_id"]).all()
    assert len(got) == len(ids) * 4


def test_negatives_block_invariance(ray_session):
    ids = list(range(0, 600, 3))
    a = mine_negatives(_ds(ids, 1), k=3).to_pandas().sort_values(
        ["anchor_id", "j"]).reset_index(drop=True)
    b = mine_negatives(_ds(ids, 7), k=3).to_pandas().sort_values(
        ["anchor_id", "j"]).reset_index(drop=True)
    assert a.equals(b)
