"""Cross-source n-gram overlap matrix tests vs a pure-Python oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.corpus import source_overlap


def _py_overlap(texts, sources, n=3):
    sets = {}
    for t, s in zip(texts, sources):
        toks = t.strip().split()
        grams = {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}
        sets.setdefault(s, set()).update(grams)
    out = {}
    keys = sorted(sets)
    for i, a in enumerate(keys):
        for b in keys[i + 1:]:
            inter = len(sets[a] & sets[b])
            if inter:
                out[(a, b)] = (inter,
                               round(inter / (len(sets[a]) + len(sets[b]) - inter), 6))
    return out


def test_source_overlap_matches_python(ray_session):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(15)]
    texts = [" ".join(rng.choice(vocab, size=12)) for _ in range(60)]
    sources = [f"s{i % 4}" for i in range(60)]
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(60, dtype=np.int64)),
                  "text": pa.array(texts),
                  "source": pa.array(sources)})
    ).repartition(4)
    got = source_overlap(ds, n=3).to_pandas()
    gm = {(r.src_a, r.src_b): (r.inter, r.jac6) for r in got.itertuples(index=False)}
    exp = _py_overlap(texts, sources)
    assert set(gm) == set(exp)
    for k in exp:
        assert gm[k][0] == exp[k][0]
        assert abs(gm[k][1] - exp[k][1]) < 1e-9


def test_source_overlap_disjoint(ray_session):
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(np.arange(2, dtype=np.int64)),
                  "text": pa.array(["a b c d", "x y z w"]),
                  "source": pa.array(["s0", "s1"])})
    )
    got = source_overlap(ds, n=3).to_pandas()
    assert len(got) == 0
