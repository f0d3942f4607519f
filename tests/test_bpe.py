"""Distributed BPE training (solaris_ray/stages/bpe.py) vs the
pure-Python reference twin — merge tables must match EXACTLY,
including (count desc, pair asc) tie-breaks and greedy left-to-right
overlap resolution inside symbol runs."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.bpe import reference_bpe, train_bpe


@pytest.fixture(scope="module")
def _ray(ray_session):
    import ray

    return ray


def _run(texts, n_merges, _ray):
    ds = _ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts),
    }))
    got = train_bpe(ds, n_merges=n_merges).to_pandas()
    return [tuple(r) for r in got.itertuples(index=False)]


def test_matches_reference_on_word_corpus(_ray):
    rng = np.random.default_rng(7)
    vocab = ["low", "lower", "lowest", "newer", "wider", "new", "bpe",
             "banana", "bandana"]
    texts = [" ".join(rng.choice(vocab, rng.integers(3, 12)))
             for _ in range(200)]
    assert _run(texts, 15, _ray) == reference_bpe(texts, 15)


def test_overlapping_runs_greedy_left_to_right(_ray):
    """'aaaa'-style words: a run of identical-pair matches must merge
    greedily from the left (positions 0, 2, ...), exactly like the
    sequential reference."""
    texts = ["aaaa aaa aaaaa"] * 40 + ["ab aab"] * 10
    assert _run(texts, 10, _ray) == reference_bpe(texts, 10)


def test_tie_breaks_deterministic(_ray):
    # every pair appears equally often: order decided purely by the
    # (left, right) ascending tie-break
    texts = ["xy yx"] * 30
    assert _run(texts, 6, _ray) == reference_bpe(texts, 6)
