"""Segment-intersection join: proper crossings, exactly-once."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.segjoin import segment_intersections


def _seg_table(rows):
    ids, x0, y0, x1, y1 = zip(*rows)
    return pa.table({
        "seg_id": pa.array(ids, pa.int64()),
        "x0": pa.array(x0, pa.int64()), "y0": pa.array(y0, pa.int64()),
        "x1": pa.array(x1, pa.int64()), "y1": pa.array(y1, pa.int64()),
    })


def _run(a_rows, b_rows, **kw):
    import ray.data

    out = segment_intersections(
        ray.data.from_arrow(_seg_table(a_rows)),
        ray.data.from_arrow(_seg_table(b_rows)), **kw
    ).to_pandas()
    if out.empty or "a_id" not in out.columns:
        return set()
    return set(zip(out.a_id, out.b_id))


def test_plain_cross(ray_session):
    assert _run([(0, 0, 0, 10, 10)], [(7, 0, 10, 10, 0)]) == {(0, 7)}


def test_shared_endpoint_is_not_proper(ray_session):
    assert _run([(0, 0, 0, 10, 10)], [(1, 10, 10, 20, 0)]) == set()


def test_t_touch_is_not_proper(ray_session):
    # B ends exactly on A's interior: o-value zero => excluded
    assert _run([(0, 0, 0, 20, 0)], [(1, 10, 0, 10, 9)]) == set()


def test_collinear_overlap_is_not_proper(ray_session):
    assert _run([(0, 0, 0, 20, 0)], [(1, 5, 0, 30, 0)]) == set()


def test_parallel_disjoint(ray_session):
    assert _run([(0, 0, 0, 10, 0)], [(1, 0, 5, 10, 5)]) == set()


def test_cross_on_cell_boundary_counted_once(ray_session):
    # crossing exactly at (256, 256) — the corner of four cells
    got = _run([(0, 0, 256, 512, 256)], [(9, 256, 0, 256, 512)], cell=256)
    assert got == {(0, 9)}


def test_bruteforce_parity_random(ray_session):
    rng = np.random.default_rng(4)

    def mk(n, seed):
        r = np.random.default_rng(seed)
        x0 = r.integers(0, 2000, n)
        y0 = r.integers(0, 2000, n)
        return [
            (i, int(x0[i]), int(y0[i]),
             int(np.clip(x0[i] + r.integers(-700, 700), 0, 2048)),
             int(np.clip(y0[i] + r.integers(-700, 700), 0, 2048)))
            for i in range(n)
        ]

    A, B = mk(120, 1), mk(120, 2)
    got = _run(A, B)
    want = set()
    for i, ax0, ay0, ax1, ay1 in A:
        for j, bx0, by0, bx1, by1 in B:
            dax, day = ax1 - ax0, ay1 - ay0
            dbx, dby = bx1 - bx0, by1 - by0
            o1 = dax * (by0 - ay0) - day * (bx0 - ax0)
            o2 = dax * (by1 - ay0) - day * (bx1 - ax0)
            o3 = dbx * (ay0 - by0) - dby * (ax0 - bx0)
            o4 = dbx * (ay1 - by0) - dby * (ax1 - bx0)
            if 0 not in (o1, o2, o3, o4) and (o1 > 0) != (o2 > 0) \
                    and (o3 > 0) != (o4 > 0):
                want.add((i, j))
    assert got == want


def test_negative_coords_cross(ray_session):
    # regression: crossing at y≈-100 previously decoded the owner cell
    # as (cx-1, cy+2^21) and emitted nothing
    assert _run([(0, -200, -100, 200, -100)], [(3, 0, -300, 0, 100)]) \
        == {(0, 3)}
    # same shape entirely in the negative quadrant
    assert _run([(0, -900, -450, -100, -450)], [(5, -500, -900, -500, -10)]) \
        == {(0, 5)}


def test_bruteforce_parity_signed(ray_session):
    def mk(n, seed):
        r = np.random.default_rng(seed)
        x0 = r.integers(-1500, 1500, n)
        y0 = r.integers(-1500, 1500, n)
        return [
            (i, int(x0[i]), int(y0[i]),
             int(np.clip(x0[i] + r.integers(-700, 700), -2048, 2048)),
             int(np.clip(y0[i] + r.integers(-700, 700), -2048, 2048)))
            for i in range(n)
        ]

    A, B = mk(100, 11), mk(100, 12)
    got = _run(A, B)
    want = set()
    for i, ax0, ay0, ax1, ay1 in A:
        for j, bx0, by0, bx1, by1 in B:
            dax, day = ax1 - ax0, ay1 - ay0
            dbx, dby = bx1 - bx0, by1 - by0
            o1 = dax * (by0 - ay0) - day * (bx0 - ax0)
            o2 = dax * (by1 - ay0) - day * (bx1 - ax0)
            o3 = dbx * (ay0 - by0) - dby * (ax0 - bx0)
            o4 = dbx * (ay1 - by0) - dby * (ax1 - bx0)
            if 0 not in (o1, o2, o3, o4) and (o1 > 0) != (o2 > 0) \
                    and (o3 > 0) != (o4 > 0):
                want.add((i, j))
    assert got == want


def test_maximal_coords_no_overflow(ray_session):
    # near-maximal segments at the ±2^20 budget: the ownership
    # cross-products exceed int64 and must be exact (object-int path)
    L = 1 << 20
    got = _run([(0, -L, -L + 1, L, L)], [(1, -L, L, L, -L + 1)],
               cell=1 << 18, max_span=128)
    assert got == {(0, 1)}


def test_coord_limit_enforced(ray_session):
    with pytest.raises(Exception):
        _run([(0, 0, 0, 1 << 21, 5)], [(1, 0, 1, 5, 1)])
