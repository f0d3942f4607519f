"""Distributed Lloyd k-means tests vs a pure-numpy oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.ann import seeded_centroids
from solaris_ray.stages.cluster import kmeans_assign


def _make_ds(V: np.ndarray, n_blocks: int = 4):
    ids = np.arange(len(V), dtype=np.int64)
    tbl = pa.table(
        {
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([r.tolist() for r in V], pa.list_(pa.float32())),
        }
    )
    return ray.data.from_arrow(tbl).repartition(n_blocks)


def _np_kmeans(V, k, dim, iters, seed, round_dp=6):
    V = V.astype(np.float64)
    C = seeded_centroids(dim, k, seed).astype(np.float64)
    for _ in range(iters):
        cl = np.argmax(V @ C.T, axis=1)
        newC = C.copy()
        for c in range(k):
            m = cl == c
            if m.any():
                newC[c] = np.round(V[m].mean(axis=0), round_dp)
        C = newC
    return np.argmax(V @ C.T, axis=1)


def test_kmeans_matches_numpy_multi_iter(ray_session):
    rng = np.random.default_rng(3)
    V = rng.normal(size=(400, 16)).astype(np.float32)
    got = (
        kmeans_assign(_make_ds(V), k=5, dim=16, iters=3, seed=7)
        .to_pandas()
        .sort_values("vec_id")
    )
    exp = _np_kmeans(V, 5, 16, 3, 7)
    assert (got["cluster"].to_numpy() == exp).all()


def test_kmeans_empty_cluster_keeps_seed(ray_session):
    # all points near one direction -> most clusters stay empty and
    # must keep their seed centroid (run completes, assignment stable)
    rng = np.random.default_rng(5)
    base = rng.normal(size=8)
    V = (base + 0.01 * rng.normal(size=(50, 8))).astype(np.float32)
    got = (
        kmeans_assign(_make_ds(V, 2), k=6, dim=8, iters=2, seed=7)
        .to_pandas()
        .sort_values("vec_id")
    )
    exp = _np_kmeans(V, 6, 8, 2, 7)
    assert (got["cluster"].to_numpy() == exp).all()


def test_kmeans_block_count_invariant(ray_session):
    # partial-sum combine must not depend on how data is blocked
    rng = np.random.default_rng(11)
    V = rng.normal(size=(300, 12)).astype(np.float32)
    a = (
        kmeans_assign(_make_ds(V, 1), k=4, dim=12, iters=2, seed=7)
        .to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    )
    b = (
        kmeans_assign(_make_ds(V, 8), k=4, dim=12, iters=2, seed=7)
        .to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    )
    assert (a == b).all()
