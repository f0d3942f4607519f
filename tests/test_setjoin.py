"""Exact Jaccard set-similarity join: brute-force parity, thresholds,
empty/degenerate docs."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.setjoin import jaccard_set_join


def _brute(docs, tau100):
    sets = {i: set(t.split()) for i, t in docs}
    out = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            if not sets[a] or not sets[b]:
                continue
            i = len(sets[a] & sets[b])
            u = len(sets[a] | sets[b])
            if 100 * i >= tau100 * u:
                out[(a, b)] = (i, u)
    return out


def _run(docs, tau100):
    t = pa.table(
        {
            "doc_id": pa.array([i for i, _ in docs], pa.int64()),
            "text": pa.array([s for _, s in docs], pa.string()),
        }
    )
    df = (
        jaccard_set_join(ray.data.from_arrow(t), tau100=tau100)
        .sort(["id_a", "id_b"])
        .to_pandas()
    )
    if df.empty:
        return {}
    return {
        (a, b): (i, u)
        for a, b, i, u in zip(df.id_a, df.id_b, df.inter, df.uni)
    }


def test_matches_brute_random(ray_session):
    rng = np.random.default_rng(13)
    vocab = [f"w{i}" for i in range(40)]
    docs = []
    for i in range(120):
        k = int(rng.integers(3, 20))
        words = rng.choice(vocab, size=k, replace=True)
        docs.append((i, " ".join(words)))
    for tau in (50, 80, 100):
        assert _run(docs, tau) == _brute(docs, tau)


def test_exact_duplicates_and_empty(ray_session):
    docs = [
        (1, "a b c"),
        (2, "c b a a"),  # same distinct set
        (3, ""),  # empty: never pairs
        (4, "a b"),
    ]
    got = _run(docs, 100)
    assert got == {(1, 2): (3, 3)}
    got80 = _run(docs, 60)
    assert got80 == {(1, 2): (3, 3), (1, 4): (2, 3), (2, 4): (2, 3)}


def test_tau_validation(ray_session):
    with pytest.raises(ValueError):
        jaccard_set_join(None, tau100=0)
