"""DBSCAN tests against a naive O(n^2) twin with identical label
conventions (min-core-id component labels, min-core-neighbour border
assignment, -1 noise)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.dbscan import dbscan


def _pts_ds(pts, n_blocks=3):
    t = pa.table(
        {
            "point_id": pa.array([p[0] for p in pts], pa.int64()),
            "x": pa.array([float(p[1]) for p in pts], pa.float64()),
            "y": pa.array([float(p[2]) for p in pts], pa.float64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(pts, eps, min_pts):
    ids = np.array([p[0] for p in pts], np.int64)
    xy = np.array([[p[1], p[2]] for p in pts], np.float64)
    d2 = ((xy[:, None, :] - xy[None, :, :]) ** 2).sum(-1)
    within = d2 <= eps * eps
    core = within.sum(1) >= min_pts
    # components of the core-core graph, label = min core id
    lab = {int(i): int(i) for i in ids[core]}
    changed = True
    while changed:
        changed = False
        for i in np.nonzero(core)[0]:
            for j in np.nonzero(within[i] & core)[0]:
                a, b = int(ids[i]), int(ids[j])
                m = min(lab[a], lab[b])
                if lab[a] != m or lab[b] != m:
                    lab[a] = lab[b] = m
                    changed = True
    out = {}
    for i in range(len(ids)):
        pid = int(ids[i])
        if core[i]:
            out[pid] = lab[pid]
        else:
            nbrs = ids[within[i] & core]
            out[pid] = lab[int(nbrs.min())] if nbrs.size else -1
    return out


def _run(pts, eps, min_pts):
    got = dbscan(_pts_ds(pts), eps=eps, min_pts=min_pts).take_all()
    return {r["point_id"]: r["cluster"] for r in got}


def test_two_blobs_and_noise():
    pts = (
        [(i, 10 + (i % 3), 10 + (i // 3)) for i in range(9)]          # blob A
        + [(100 + i, 200 + (i % 3), 200 + (i // 3)) for i in range(9)]  # blob B
        + [(500, 500.0, 500.0)]                                         # noise
    )
    got = _run(pts, eps=2.0, min_pts=4)
    assert got == _naive(pts, 2.0, 4)
    assert got[500] == -1
    assert len({got[i] for i in range(9)}) == 1
    assert got[0] != got[100]


def test_border_points_join_min_core_neighbor():
    # dense core line + one point reachable from a single core
    pts = [(i, float(i), 0.0) for i in range(5)] + [(9, 4.9, 0.9)]
    got = _run(pts, eps=1.5, min_pts=3)
    assert got == _naive(pts, 1.5, 3)


def test_random_matches_naive_across_cells():
    rng = np.random.default_rng(7)
    pts = [
        (i, float(rng.uniform(0, 300)), float(rng.uniform(0, 300)))
        for i in range(400)
    ]
    for eps, mp in ((12.0, 4), (25.0, 6)):
        assert _run(pts, eps, mp) == _naive(pts, eps, mp)


def test_negative_coordinates():
    pts = [(i, -50.0 + (i % 3), -50.0 + (i // 3)) for i in range(9)]
    got = _run(pts, eps=2.0, min_pts=4)
    assert got == _naive(pts, 2.0, 4)


def test_exact_duplicate_sites_collapse():
    # many coincident points (the site-collapse path): multiplicity
    # makes a lone duplicated location core on its own
    pts = (
        [(i, 5.0, 5.0) for i in range(6)]          # 6 coincident -> core
        + [(50, 5.5, 5.0)]                           # border of that site
        + [(60, 400.0, 400.0), (61, 400.0, 400.0)]  # 2 coincident -> noise
    )
    got = _run(pts, eps=1.0, min_pts=4)
    assert got == _naive(pts, 1.0, 4)
    assert got[0] == 0 and got[5] == 0   # cluster label = min core id
    assert got[50] == 0                  # border joins via min core nbr
    assert got[60] == -1 and got[61] == -1


def test_duplicates_split_across_blocks():
    # fragments of one site arrive in different input blocks; counts
    # and labels must still be exact
    pts = [(i, 10.0, 10.0) for i in range(8)] + [(100, 12.0, 10.0)]
    got = dbscan(_pts_ds(pts, n_blocks=6), eps=3.0, min_pts=5).take_all()
    m = {r["point_id"]: r["cluster"] for r in got}
    assert m == _naive(pts, 3.0, 5)
    assert all(m[i] == 0 for i in range(8))
    assert m[100] == 0  # core too (9 weighted nbrs), same component


def test_rejects_bad_params():
    with pytest.raises(ValueError):
        dbscan(_pts_ds([(1, 0, 0)]), eps=0.0, min_pts=3)
    with pytest.raises(ValueError):
        dbscan(_pts_ds([(1, 0, 0)]), eps=1.0, min_pts=0)
