"""Tests for the bucketed 1-D range join."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solaris_ray.stages import rangejoin


def _brute(pids, vs, iids, los, his):
    out = set()
    for p, v in zip(pids, vs):
        for i, lo, hi in zip(iids, los, his):
            if lo <= v <= hi:
                out.add((int(p), int(i)))
    return out


def _run(ray_session, pids, vs, iids, los, his, width):
    import ray

    pts = ray.data.from_arrow(
        pa.table({"point_id": pa.array(pids, pa.int64()), "v": pa.array(vs, pa.float64())})
    ).repartition(3)
    ivs = ray.data.from_arrow(
        pa.table(
            {
                "interval_id": pa.array(iids, pa.int64()),
                "lo": pa.array(los, pa.float64()),
                "hi": pa.array(his, pa.float64()),
            }
        )
    ).repartition(2)
    out = rangejoin.range_join(pts, ivs, width=width).to_pandas()
    return out


def test_range_join_matches_brute_force(ray_session):
    rng = np.random.default_rng(5)
    pids = np.arange(200)
    vs = rng.uniform(-100, 100, size=200).round(3)
    iids = np.arange(50)
    los = rng.uniform(-120, 90, size=50).round(3)
    his = los + rng.uniform(0, 60, size=50).round(3)
    out = _run(ray_session, pids, vs, iids, los, his, width=16.0)
    got = {(int(p), int(i)) for p, i in zip(out.point_id, out.interval_id)}
    assert got == _brute(pids, vs, iids, los, his)
    # exactly-once semantics: no duplicate pairs even for wide intervals
    assert len(out) == len(got)


def test_range_join_closed_boundaries(ray_session):
    out = _run(ray_session, [1, 2, 3], [10.0, 20.0, 20.5], [7], [10.0], [20.0], width=4.0)
    got = {(int(p), int(i)) for p, i in zip(out.point_id, out.interval_id)}
    assert got == {(1, 7), (2, 7)}  # both endpoints inclusive, 20.5 out


def test_range_join_interval_spanning_many_buckets(ray_session):
    # one huge interval covers everything; still one pair per point
    out = _run(ray_session, list(range(10)), [float(i) * 7 for i in range(10)],
               [99], [-1000.0], [1000.0], width=2.0)
    assert sorted(out.point_id.tolist()) == list(range(10))
    assert (out.interval_id == 99).all()
