"""Exact AUC: sklearn-free rank twin, tie handling, degenerate input."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.auc import auc_exact


def _ref_auc(scores, labels):
    """Brute pair counting: wins + half-ties over pos x neg pairs."""
    pos = scores[labels == 1]
    neg = scores[labels == 0]
    wins = (pos[:, None] > neg[None, :]).sum()
    ties = (pos[:, None] == neg[None, :]).sum()
    return wins, ties, pos.size, neg.size


def _run(scores, labels):
    t = pa.table(
        {
            "score": pa.array(scores.astype(np.int64)),
            "label": pa.array(labels.astype(np.int64)),
        }
    )
    out = auc_exact(ray.data.from_arrow(t).repartition(4))
    return {k: out[k][0].as_py() for k in out.schema.names}


@pytest.mark.parametrize("seed", [0, 5])
def test_matches_pair_counting(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 3000
    scores = rng.integers(0, 50, n)  # heavy ties
    labels = rng.integers(0, 2, n)
    got = _run(scores, labels)
    wins, ties, npos, nneg = _ref_auc(scores, labels)
    assert got["n_pos"] == npos and got["n_neg"] == nneg
    assert got["u2"] == 2 * wins + ties
    assert got["auc6"] == (2 * wins + ties) * 1_000_000 // (2 * npos * nneg)


def test_perfect_and_inverted(ray_session):
    scores = np.array([10, 11, 12, 1, 2, 3])
    labels = np.array([1, 1, 1, 0, 0, 0])
    assert _run(scores, labels)["auc6"] == 1_000_000
    assert _run(scores, 1 - labels)["auc6"] == 0


def test_one_class_raises(ray_session):
    with pytest.raises(Exception, match="both classes"):
        _run(np.array([1, 2, 3]), np.array([1, 1, 1]))
