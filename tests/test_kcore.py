"""k-core: sequential-peel twin, plan parity, degeneracies."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.kcore import kcore


def _ref_kcore(src, dst, k):
    """Sequential peel over an adjacency dict — the textbook twin."""
    adj = {}
    for s, d in zip(src.tolist(), dst.tolist()):
        if s == d:
            continue
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    changed = True
    while changed:
        changed = False
        for n in list(adj):
            if len(adj[n]) < k:
                for nb in adj.pop(n):
                    adj[nb].discard(n)
                changed = True
    return {n: len(v) for n, v in adj.items() if v}


def _run(src, dst, k, **kw):
    e = ray.data.from_arrow(
        pa.table({"src": pa.array(src), "dst": pa.array(dst)})
    ).repartition(4)
    out = kcore(e, k=k, **kw).to_pandas()
    return dict(zip(out.get("node", []), out.get("deg", [])))


@pytest.mark.parametrize("seed,k", [(0, 3), (1, 4), (2, 5)])
def test_matches_sequential(ray_session, seed, k):
    rng = np.random.default_rng(seed)
    n, m = 300, 1600
    src = rng.integers(0, n, m).astype(np.int64)
    dst = rng.integers(0, n, m).astype(np.int64)
    assert _run(src, dst, k) == _ref_kcore(src, dst, k)


def test_plan_parity(ray_session):
    rng = np.random.default_rng(7)
    src = rng.integers(0, 200, 900).astype(np.int64)
    dst = rng.integers(0, 200, 900).astype(np.int64)
    st = {}
    a = _run(src, dst, 4)
    b = _run(src, dst, 4, small_edge_limit=0, stats_out=st)
    assert st["plan"] == "peel-rounds"
    assert a == b


def test_triangle_and_selfloops(ray_session):
    src = np.array([0, 1, 2, 3, 3], np.int64)
    dst = np.array([1, 2, 0, 3, 0], np.int64)  # triangle + self-loop + tail
    got = _run(src, dst, 2)
    assert got == {0: 2, 1: 2, 2: 2}
    assert _run(src, dst, 3) == {}


def test_k_validation(ray_session):
    with pytest.raises(ValueError):
        kcore(None, k=0)
