"""Convex hull boundary points: brute-force parity, degeneracies."""

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.hull import _boundary_mask, group_convex_hull


def _brute_boundary(x, y):
    """Supporting-edge characterization, brute force — the SQL twin."""
    n = x.size
    pts = list(zip(x.tolist(), y.tolist()))
    uniq = set(pts)
    if len(uniq) == 1:
        return np.ones(n, bool)
    on = np.zeros(n, bool)
    for a in uniq:
        for b in uniq:
            if a == b:
                continue
            cr = [
                (b[0] - a[0]) * (ry - a[1]) - (b[1] - a[1]) * (rx - a[0])
                for rx, ry in uniq
            ]
            if min(cr) < 0:
                continue
            for i, (px, py) in enumerate(pts):
                c = (b[0] - a[0]) * (py - a[1]) - (b[1] - a[1]) * (px - a[0])
                if (
                    c == 0
                    and min(a[0], b[0]) <= px <= max(a[0], b[0])
                    and min(a[1], b[1]) <= py <= max(a[1], b[1])
                ):
                    on[i] = True
    return on


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_boundary_mask_matches_brute(seed):
    rng = np.random.default_rng(seed)
    n = 60
    x = rng.integers(0, 12, n)  # small grid: duplicates + collinear
    y = rng.integers(0, 12, n)
    got = _boundary_mask(x.astype(np.int64), y.astype(np.int64))
    want = _brute_boundary(x, y)
    assert (got == want).all()


def test_degenerate_groups():
    # single point
    assert _boundary_mask(np.array([5]), np.array([7])).all()
    # all identical
    assert _boundary_mask(np.array([3, 3, 3]), np.array([1, 1, 1])).all()
    # all collinear: every point on the segment is boundary
    x = np.array([0, 1, 2, 3, 2], np.int64)
    y = np.array([0, 2, 4, 6, 4], np.int64)
    assert _boundary_mask(x, y).all()
    # square with strict interior point
    x = np.array([0, 0, 4, 4, 2, 2], np.int64)
    y = np.array([0, 4, 0, 4, 2, 0], np.int64)
    m = _boundary_mask(x, y)
    assert m.tolist() == [True, True, True, True, False, True]


def test_group_convex_hull_dataset(ray_session):
    rng = np.random.default_rng(5)
    n = 300
    t = pa.table(
        {
            "group": pa.array((np.arange(n) % 3).astype(np.int64)),
            "point_id": pa.array(np.arange(n, dtype=np.int64)),
            "x": pa.array(rng.integers(0, 30, n).astype(np.float64)),
            "y": pa.array(rng.integers(0, 30, n).astype(np.float64)),
        }
    )
    out = (
        group_convex_hull(ray.data.from_arrow(t))
        .sort(["group", "point_id"])
        .to_pandas()
    )
    df = t.to_pandas()
    for g in range(3):
        sub = df[df["group"] == g]
        want = _brute_boundary(
            sub["x"].to_numpy().astype(np.int64),
            sub["y"].to_numpy().astype(np.int64),
        )
        got_ids = set(out[out["group"] == g]["point_id"])
        assert got_ids == set(sub["point_id"].to_numpy()[want])


def test_rejects_fractional_coords(ray_session):
    t = pa.table(
        {
            "group": pa.array([0], pa.int64()),
            "point_id": pa.array([0], pa.int64()),
            "x": pa.array([0.5]),
            "y": pa.array([1.0]),
        }
    )
    with pytest.raises(Exception, match="non-integer"):
        group_convex_hull(ray.data.from_arrow(t)).to_pandas()
