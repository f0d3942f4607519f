"""Spatial dissolve — merge transitively-overlapping features.

The geopandas ``dissolve`` / ``unary_union`` analogue at scale: find
every pair of overlapping footprints with a cell-partitioned
self-join, then resolve transitive overlap closure with the engine's
distributed connected components (stages/components.py).  Reference
context: solaris merges touching footprints via shapely's unary_union
inside one process (`/root/reference/solaris/vector/mask.py` contact
handling); a trillion-footprint layer needs the pair graph + CC
composition instead.

Self-join shape (the exactly-once idiom shared with stages/rangejoin
and stages/knn): every rect replicates to the grid cells it covers;
inside a cell all candidate pairs are generated vectorized, and a pair
is EMITTED only by the owner cell — the cell containing the
intersection's min corner — so no global dedup pass is needed.

Output: (feature id, component) — component = min feature id of the
dissolve group; singletons are their own group.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def overlap_pairs(rects, cell: float = 256.0, id_col: str = "fid",
                  n_buckets: int = 256):
    """rects (fid, x0, y0, x1, y1) -> distinct overlapping pairs
    (doc_a < doc_b).  Overlap = strict interior intersection
    (touching edges do NOT join), evaluated identically in the SQL
    oracle."""
    rep_schema = pa.schema(
        [("cx", pa.int64()), ("cy", pa.int64()), ("cb", pa.int64()),
         (id_col, pa.int64()),
         ("x0", pa.float64()), ("y0", pa.float64()),
         ("x1", pa.float64()), ("y1", pa.float64())]
    )

    def _replicate(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return rep_schema.empty_table()
        fid = batch[id_col].to_numpy(zero_copy_only=False)
        x0 = batch["x0"].to_numpy(zero_copy_only=False)
        y0 = batch["y0"].to_numpy(zero_copy_only=False)
        x1 = batch["x1"].to_numpy(zero_copy_only=False)
        y1 = batch["y1"].to_numpy(zero_copy_only=False)
        cx0 = np.floor(x0 / cell).astype(np.int64)
        cx1 = np.floor(x1 / cell).astype(np.int64)
        cy0 = np.floor(y0 / cell).astype(np.int64)
        cy1 = np.floor(y1 / cell).astype(np.int64)
        nx = cx1 - cx0 + 1
        ny = cy1 - cy0 + 1
        reps = (nx * ny).astype(np.int64)
        total = int(reps.sum())
        row = np.repeat(np.arange(fid.size, dtype=np.int64), reps)
        within = np.arange(total, dtype=np.int64) - np.repeat(
            np.cumsum(reps) - reps, reps)
        cx = cx0[row] + within % nx[row]
        cy = cy0[row] + within // nx[row]
        cb = ((cx * np.int64(73856093)) ^ (cy * np.int64(19349663))) % np.int64(
            n_buckets)
        return pa.table(
            {
                "cx": pa.array(cx, pa.int64()),
                "cy": pa.array(cy, pa.int64()),
                "cb": pa.array(np.abs(cb), pa.int64()),
                id_col: pa.array(fid[row], pa.int64()),
                "x0": pa.array(x0[row], pa.float64()),
                "y0": pa.array(y0[row], pa.float64()),
                "x1": pa.array(x1[row], pa.float64()),
                "y1": pa.array(y1[row], pa.float64()),
            }
        )

    pair_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def _pairs(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m < 2:
            return pair_schema.empty_table()
        cx = group["cx"].to_numpy(zero_copy_only=False)
        cy = group["cy"].to_numpy(zero_copy_only=False)
        fid = group[id_col].to_numpy(zero_copy_only=False)
        x0 = group["x0"].to_numpy(zero_copy_only=False)
        y0 = group["y0"].to_numpy(zero_copy_only=False)
        x1 = group["x1"].to_numpy(zero_copy_only=False)
        y1 = group["y1"].to_numpy(zero_copy_only=False)
        # a bucket may hold several distinct cells (hash collisions):
        # process per distinct (cx, cy) via sorted runs
        key = cx * np.int64(1 << 32) + cy
        o = np.argsort(key, kind="stable")
        key_s = key[o]
        starts = np.flatnonzero(np.r_[True, key_s[1:] != key_s[:-1]])
        ends = np.r_[starts[1:], key_s.size]
        out_a, out_b = [], []
        for s, e in zip(starts, ends):
            idx = o[s:e]
            if idx.size < 2:
                continue
            ia, ib = np.triu_indices(idx.size, k=1)
            A, B = idx[ia], idx[ib]
            ox0 = np.maximum(x0[A], x0[B])
            oy0 = np.maximum(y0[A], y0[B])
            hit = (
                (ox0 < np.minimum(x1[A], x1[B]))
                & (oy0 < np.minimum(y1[A], y1[B]))
                # owner-cell rule: only the cell holding the
                # intersection's min corner emits the pair
                & (np.floor(ox0 / cell).astype(np.int64) == cx[idx[0]])
                & (np.floor(oy0 / cell).astype(np.int64) == cy[idx[0]])
            )
            if not hit.any():
                continue
            fa, fb = fid[A[hit]], fid[B[hit]]
            out_a.append(np.minimum(fa, fb))
            out_b.append(np.maximum(fa, fb))
        if not out_a:
            return pair_schema.empty_table()
        return pa.table(
            {
                "doc_a": pa.array(np.concatenate(out_a), pa.int64()),
                "doc_b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    return (
        rects.map_batches(_replicate, batch_format="pyarrow", batch_size=4096)
        .groupby("cb")
        .map_groups(_pairs, batch_format="pyarrow")
    )


def dissolve(rects, cell: float = 256.0, id_col: str = "fid",
             max_rounds: int = 50):
    """rects -> (fid, component): transitive-overlap dissolve groups."""
    from .components import connected_components

    pairs = overlap_pairs(rects, cell=cell, id_col=id_col)
    return connected_components(
        pairs, rects.select_columns([id_col]), node_col=id_col,
        max_rounds=max_rounds,
    )
