"""Count-min sketch tests: never-undercount, bounded overcount,
block-count invariance, collision behavior."""

from __future__ import annotations

from collections import Counter

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.sketch import cms_build, cms_check, cms_estimate


def _ds(texts, n_blocks=1):
    d = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
                  "text": pa.array(texts)})
    )
    return d.repartition(n_blocks) if n_blocks > 1 else d


def test_cms_never_undercounts_and_brackets(ray_session):
    rng = np.random.default_rng(19)
    vocab = [f"tok{i}" for i in range(500)]
    # zipf-ish frequencies
    texts = [" ".join(rng.choice(vocab, size=40,
                                 p=np.arange(500, 0, -1) / np.arange(500, 0, -1).sum()))
             for _ in range(200)]
    grid, n = cms_build(_ds(texts, 5))
    exact = Counter(" ".join(texts).split())
    terms = np.asarray(list(exact), object)
    est = cms_estimate(grid, terms)
    true = np.asarray([exact[t] for t in terms], np.int64)
    assert (est >= true).all()
    assert (est <= true + 0.01 * n).all()
    assert n == sum(exact.values())


def test_cms_block_invariance(ray_session):
    texts = [f"a b c d{i % 7}" for i in range(100)]
    g1, n1 = cms_build(_ds(texts, 1))
    g8, n8 = cms_build(_ds(texts, 8))
    assert n1 == n8 and (g1 == g8).all()


def test_cms_check_all_ok(ray_session):
    texts = ["join hash scan " * 5, "join merge sort " * 3, "scan scan scan"]
    got = cms_check(_ds(texts), k=5).to_pandas()
    assert (got["ok"] == 1).all()
    exact = Counter(" ".join(texts).split())
    for r in got.itertuples(index=False):
        assert exact[r.term] == r.cnt


def test_hll_accuracy_across_cardinalities(ray_session):
    from solaris_ray.stages.sketch import hll_distinct

    for n_distinct in (50, 2000, 20000):
        vals = [f"v{i % n_distinct}" for i in range(n_distinct * 2)]
        ds = ray.data.from_arrow(
            pa.table({"doc_id": pa.array(np.arange(len(vals), dtype=np.int64)),
                      "text": pa.array(vals)})
        ).repartition(4)
        est = hll_distinct(ds, "text")
        assert abs(est - n_distinct) <= 0.08 * n_distinct, (n_distinct, est)


def test_hll_merge_invariance(ray_session):
    from solaris_ray.stages.sketch import hll_distinct

    vals = [f"u{i}" for i in range(3000)]
    ds1 = ray.data.from_arrow(
        pa.table({"v": pa.array(vals)})
    )
    est1 = hll_distinct(ds1, "v")
    est8 = hll_distinct(ds1.repartition(8), "v")
    assert est1 == est8  # register max-merge is order/partition invariant
