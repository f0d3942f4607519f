"""Tests for distributed global rank and compact-set AOI filtering."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solaris_ray.stages import compact, rank

BASE = 262144


def test_global_rank_matches_argsort(ray_session):
    import ray

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, size=300).astype(np.int64)  # heavy ties
    ids = np.arange(300, dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"id": pa.array(ids), "v": pa.array(vals)})
    ).repartition(5)
    out = rank.global_rank(ds, sort_cols=["v", "id"]).to_pandas().sort_values("rank")
    order = np.lexsort((ids, vals))
    assert out.id.tolist() == ids[order].tolist()
    assert out["rank"].tolist() == list(range(1, 301))
    assert out.pct_rank.iloc[0] == 0.0 and out.pct_rank.iloc[-1] == 1.0
    # exact percentile arithmetic
    assert out.pct_rank.tolist() == [(r - 1) / 299 for r in range(1, 301)]


def test_global_rank_single_row(ray_session):
    import ray

    ds = ray.data.from_arrow(pa.table({"id": pa.array([7], pa.int64())}))
    out = rank.global_rank(ds, sort_cols=["id"]).to_pandas()
    assert out["rank"].tolist() == [1] and out.pct_rank.tolist() == [0.0]


def test_aoi_cell_filter_matches_cover(ray_session):
    import ray

    # AOI: an 8x8 res-19 block (compacts to one res-16 cell) plus a
    # stray cell; points on a grid, some inside, some out
    ids = [
        (19 << 58) | ((BASE + x) << 29) | (BASE + y)
        for x in range(8)
        for y in range(8)
    ] + [(19 << 58) | ((BASE + 20) << 29) | (BASE + 5)]
    aoi = compact.compact_cells(
        ray.data.from_arrow(
            pa.table({"cell": pa.array(np.array(ids, dtype=np.uint64).astype(np.int64))})
        ),
        base_res=19,
        min_res=16,
    )
    # the compact set really is multi-res (16 + 19)
    aoi_tbl = compact.collect_compact_set(aoi)
    assert sorted(set(aoi_tbl["res"].to_pylist())) == [16, 19]

    # world coords: res-19 cell (BASE+i, BASE+j) covers [32*i, 32*i+32)
    pts_xy = [(0.0, 0.0), (255.9, 255.9), (256.0, 0.0), (650.0, 170.0), (999.0, 999.0)]
    inside = [True, True, False, True, False]  # 650//32=20, 170//32=5 -> stray cell
    pts = ray.data.from_arrow(
        pa.table(
            {
                "point_id": pa.array(range(len(pts_xy)), pa.int64()),
                "x": pa.array([p[0] for p in pts_xy], pa.float64()),
                "y": pa.array([p[1] for p in pts_xy], pa.float64()),
            }
        )
    )
    out = compact.aoi_cell_filter(pts, aoi).to_pandas()
    assert sorted(out.point_id.tolist()) == [i for i, k in enumerate(inside) if k]
