"""Distributed covariance / PCA tests vs numpy oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.pca import covariance_partials, pca_project


def _ds(V, n_blocks=1):
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(V), dtype=np.int64)),
            "embedding": pa.array([r.tolist() for r in V], pa.list_(pa.float32())),
        }
    )
    d = ray.data.from_arrow(tbl)
    return d.repartition(n_blocks) if n_blocks > 1 else d


def test_covariance_matches_numpy(ray_session):
    rng = np.random.default_rng(6)
    V = rng.normal(size=(300, 10)).astype(np.float32)
    n, mean, cov = covariance_partials(_ds(V, 5), dim=10)
    Vd = V.astype(np.float64)
    assert n == 300
    np.testing.assert_allclose(mean, Vd.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(cov, np.cov(Vd, rowvar=False, bias=True), atol=1e-10)


def test_covariance_block_invariant(ray_session):
    rng = np.random.default_rng(8)
    V = rng.normal(size=(200, 6)).astype(np.float32)
    _, m1, c1 = covariance_partials(_ds(V, 1), dim=6)
    _, m8, c8 = covariance_partials(_ds(V, 8), dim=6)
    np.testing.assert_allclose(m1, m8, atol=1e-12)
    np.testing.assert_allclose(c1, c8, atol=1e-12)


def test_pca_projection_recovers_structure(ray_session):
    # data with one dominant direction: PC1 must align with it
    rng = np.random.default_rng(10)
    direction = rng.normal(size=8)
    direction /= np.linalg.norm(direction)
    t = rng.normal(size=(500, 1)) * 10.0
    V = (t * direction + 0.01 * rng.normal(size=(500, 8))).astype(np.float32)
    got = (
        pca_project(_ds(V, 4), dim=8, k=2)
        .to_pandas()
        .sort_values("vec_id")
    )
    P = np.array(got["pc"].tolist())
    # PC1 variance dominates and correlates with the latent t
    corr = np.corrcoef(P[:, 0], t.ravel())[0, 1]
    assert abs(corr) > 0.999
    assert P[:, 0].var() > 50 * P[:, 1].var()


def test_pca_deterministic_signs(ray_session):
    rng = np.random.default_rng(12)
    V = rng.normal(size=(150, 5)).astype(np.float32)
    a = pca_project(_ds(V, 1), dim=5, k=3).to_pandas().sort_values("vec_id")
    b = pca_project(_ds(V, 6), dim=5, k=3).to_pandas().sort_values("vec_id")
    Pa = np.array(a["pc"].tolist())
    Pb = np.array(b["pc"].tolist())
    np.testing.assert_allclose(Pa, Pb, atol=1e-8)
