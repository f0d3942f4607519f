"""Spatial dissolve tests vs brute-force overlap + union-find."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages.dissolve import dissolve, overlap_pairs


def _rects_ds(rects):
    return ray.data.from_arrow(
        pa.table(
            {
                "fid": pa.array(np.arange(len(rects), dtype=np.int64)),
                "x0": pa.array([r[0] for r in rects], pa.float64()),
                "y0": pa.array([r[1] for r in rects], pa.float64()),
                "x1": pa.array([r[2] for r in rects], pa.float64()),
                "y1": pa.array([r[3] for r in rects], pa.float64()),
            }
        )
    ).repartition(3)


def _brute_pairs(rects):
    out = set()
    for i in range(len(rects)):
        for j in range(i + 1, len(rects)):
            a, b = rects[i], rects[j]
            if max(a[0], b[0]) < min(a[2], b[2]) and max(a[1], b[1]) < min(a[3], b[3]):
                out.add((i, j))
    return out


def _uf(n, pairs):
    p = list(range(n))

    def find(x):
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            p[max(ra, rb)] = min(ra, rb)
    comp = {}
    for i in range(n):
        comp.setdefault(find(i), []).append(i)
    return {i: min(m) for m in comp.values() for i in m}


def test_overlap_pairs_exactly_once_across_cells(ray_session):
    # big rect spans many cells and overlaps several small ones:
    # owner-cell rule must emit each pair exactly once
    rects = [(0, 0, 1000, 1000)] + [
        (100 * i + 50, 300, 100 * i + 130, 400) for i in range(8)
    ]
    got = overlap_pairs(_rects_ds(rects), cell=256.0).to_pandas()
    pairs = sorted(map(tuple, got[["doc_a", "doc_b"]].itertuples(index=False)))
    assert pairs == sorted(_brute_pairs(rects))
    assert len(pairs) == len(set(pairs))  # no duplicates


def test_dissolve_matches_union_find(ray_session):
    rng = np.random.default_rng(37)
    rects = []
    for _ in range(120):
        x, y = rng.uniform(0, 2000, 2)
        w, h = rng.uniform(20, 180, 2)
        rects.append((x, y, x + w, y + h))
    got = dissolve(_rects_ds(rects), cell=256.0).to_pandas()
    exp = _uf(len(rects), _brute_pairs(rects))
    assert dict(zip(got["fid"], got["component"])) == exp


def test_dissolve_touching_edges_do_not_join(ray_session):
    rects = [(0, 0, 100, 100), (100, 0, 200, 100), (50, 200, 80, 260)]
    got = dissolve(_rects_ds(rects), cell=64.0).to_pandas()
    assert sorted(got["component"]) == [0, 1, 2]  # all singletons


def test_dense_cell_mass_duplicates_bounded(ray_session):
    # 10k identical rects stack in ONE cell: the spanning path must
    # emit O(m) edges (not ~5e7 pairs) and resolve to one component
    rects = [(10.0, 10.0, 50.0, 50.0)] * 10_000
    ds = _rects_ds(rects)
    pairs = overlap_pairs(ds, cell=256.0, spanning=True, dense_cutoff=512)
    n_pairs = pairs.count()
    assert n_pairs < 2 * len(rects)  # spanning edges, not all-pairs
    got = dissolve(ds, cell=256.0).to_pandas()
    assert set(got["component"]) == {0}


def test_spanning_mode_same_components_as_pair_mode(ray_session):
    # forced-dense spanning path must yield identical components to the
    # exact all-pairs path on clustered random data
    from solaris_ray.stages.components import connected_components

    rng = np.random.default_rng(11)
    rects = []
    for cx, cy in [(100, 100), (600, 150), (300, 700)]:
        for _ in range(60):
            x, y = rng.uniform(cx, cx + 220), rng.uniform(cy, cy + 220)
            w, h = rng.uniform(10, 90, 2)
            rects.append((x, y, x + w, y + h))
    ds = _rects_ds(rects)
    nodes = ds.select_columns(["fid"])
    exp = _uf(len(rects), _brute_pairs(rects))
    for cutoff in (2, 16):  # force the dense/chunked path
        pairs = overlap_pairs(ds, cell=256.0, spanning=True,
                              dense_cutoff=cutoff)
        got = connected_components(pairs, nodes, node_col="fid").to_pandas()
        assert dict(zip(got["fid"], got["component"])) == exp


def test_pair_mode_dense_path_exactly_once(ray_session):
    # chunk-blocked pair mode (dense_cutoff below cell population) must
    # reproduce the exact all-pairs owner-cell emission
    rects = [(0, 0, 1000, 1000)] + [
        (100 * i + 50, 300, 100 * i + 130, 400) for i in range(8)
    ]
    got = overlap_pairs(_rects_ds(rects), cell=256.0,
                        dense_cutoff=3).to_pandas()
    pairs = sorted(map(tuple, got[["doc_a", "doc_b"]].itertuples(index=False)))
    assert pairs == sorted(_brute_pairs(rects))
    assert len(pairs) == len(set(pairs))
