"""Tile-pyramid rollup: multi-zoom cell aggregation in ONE shuffle.

The north_star design keys everything on hierarchical cells
(geom/cells.py quadtree, the H3/S2 analogue); map-tile serving and
zoom-level statistics need the same aggregate at EVERY zoom level
between ``base_res`` and ``min_res`` (count of points / sum of a value
per cell per level — the classic tile-pyramid build, e.g. tippecanoe's
density rollup or H3 ``cell_to_parent`` aggregation ladders).

Scale design (100 TB): a naive build runs one groupby per level
(L shuffles) or re-reads the input L times.  Here each ``map_batches``
task computes, for its batch, the PARTIAL aggregate at every level
(np.unique on the batch's cell ids, then shift-right parent chaining —
parent ix/iy are child ix/iy >> 1 because edges are powers of two),
and emits ~distinct-cells-per-batch rows per level — a geometric
series dominated by the finest level.  One multi-key
``groupby(res, ix, iy)`` sum finishes the pyramid: single shuffle,
shuffle volume ~= the finest level's partials, never the raw points.

Reference cite: the reference's tiling grid (solaris/tile/raster_tile.py
tile_exists grid walk) is single-resolution; the pyramid is the
multi-resolution generalization the cell index makes cheap.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..geom import cells

PARTIAL_SCHEMA = pa.schema(
    [
        ("res", pa.int64()),
        ("ix", pa.int64()),
        ("iy", pa.int64()),
        ("n", pa.int64()),
        ("sv", pa.float64()),
    ]
)


def _partials(batch: pa.Table, base_res: int, min_res: int,
              x_col: str, y_col: str, value_col: str | None) -> pa.Table:
    xs = batch[x_col].to_numpy().astype(np.float64)
    ys = batch[y_col].to_numpy().astype(np.float64)
    if value_col is None:
        vals = np.ones(len(xs), dtype=np.float64)
    else:
        vals = batch[value_col].to_numpy().astype(np.float64)
    edge = cells.cell_edge(base_res)
    ix = np.floor((xs - cells.ORIGIN) / edge).astype(np.int64)
    iy = np.floor((ys - cells.ORIGIN) / edge).astype(np.int64)
    out = {k: [] for k in ("res", "ix", "iy", "n", "sv")}
    for r in range(base_res, min_res - 1, -1):
        # composite key for np.unique without tuple overhead
        key = (ix.astype(np.int64) << np.int64(30)) | iy
        uk, inv, cnt = np.unique(key, return_inverse=True, return_counts=True)
        sv = np.bincount(inv, weights=vals, minlength=len(uk))
        out["res"].append(np.full(len(uk), r, dtype=np.int64))
        out["ix"].append(uk >> np.int64(30))
        out["iy"].append(uk & np.int64((1 << 30) - 1))
        out["n"].append(cnt.astype(np.int64))
        out["sv"].append(sv)
        ix >>= 1
        iy >>= 1
    return pa.table(
        {k: pa.array(np.concatenate(v)) for k, v in out.items()},
        schema=PARTIAL_SCHEMA,
    )


def pyramid_rollup(points_ds, base_res: int, min_res: int,
                   x_col: str = "x", y_col: str = "y",
                   value_col: str | None = None):
    """(res, ix, iy, n_points, sum_val) for every nonempty cell at every
    resolution in ``[min_res, base_res]`` — one shuffle total."""
    if not (0 <= min_res <= base_res <= cells.MAX_RES):
        raise ValueError(f"need 0 <= min_res <= base_res <= {cells.MAX_RES}")
    from ray.data.aggregate import Sum

    partials = points_ds.map_batches(
        lambda b: _partials(b, base_res, min_res, x_col, y_col, value_col),
        batch_format="pyarrow",
        batch_size=8192,
    )
    agg = partials.groupby(["res", "ix", "iy"]).aggregate(Sum("n"), Sum("sv"))

    def _rename(b: pa.Table) -> pa.Table:
        return pa.table(
            {
                "res": b["res"],
                "ix": b["ix"],
                "iy": b["iy"],
                "n_points": pc.cast(b["sum(n)"], pa.int64()),
                "sum_val": b["sum(sv)"],
            }
        )

    return agg.map_batches(_rename, batch_format="pyarrow")
