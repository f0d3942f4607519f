"""kNN join — for every point row, its k nearest features.

Not present in the reference (single-process shapely users call
``sindex.nearest``); required by BASELINE.json north_rule ("kNN joins
between tile footprints and building/road vector layers").  Design per
SURVEY.md §2.4: per-cell candidate lookup with H3-``grid_disk``-style
ring expansion (geom.cells.neighbors) until the k-th best distance is
provably inside the searched rings.

Correctness argument for the stop rule: every cell in ring ``r`` around
a point's cell is at least ``(r-1) * edge`` away from any point inside
the center cell, so once ``(r-1) * edge > d_k`` (current k-th best
distance) no unsearched feature can improve the result.  Ties are
broken by ``feature_id`` ascending (a pinned total order, same role as
the conf-desc tiebreak pinned in
/root/reference/solaris/eval/base.py:532-533).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom import cells

KNN_SCHEMA = pa.schema(
    [
        ("point_id", pa.int64()),
        ("feature_id", pa.int64()),
        ("rank", pa.int32()),
        ("d2", pa.float64()),
    ]
)


class CentroidIndex:
    """Cell-bucketed feature centroids: cell id -> (row indices)."""

    __slots__ = ("feature_id", "xy", "buckets", "cell_res", "edge")

    def __init__(self, tbl: pa.Table, cell_res: int, x_col: str = "cx", y_col: str = "cy"):
        self.cell_res = cell_res
        self.edge = cells.cell_edge(cell_res)
        self.feature_id = tbl["feature_id"].to_numpy().astype(np.int64)
        self.xy = np.stack(
            [tbl[x_col].to_numpy().astype(np.float64), tbl[y_col].to_numpy().astype(np.float64)],
            axis=1,
        )
        cc = cells.cell_of_point(self.xy[:, 0], self.xy[:, 1], cell_res)
        order = np.argsort(cc, kind="stable")
        cc = cc[order]
        uniq, starts = np.unique(cc, return_index=True)
        ends = np.append(starts[1:], len(cc))
        self.buckets = {
            int(u): order[s:e] for u, s, e in zip(uniq.tolist(), starts, ends)
        }

    def candidates(self, cell: int, ring: int) -> np.ndarray:
        """Feature rows in cells at exactly ring distance ``ring``."""
        if ring == 0:
            got = self.buckets.get(int(cell))
            return got if got is not None else np.empty(0, dtype=np.int64)
        res, ix, iy = cells.cell_decode(np.asarray([cell], dtype=np.uint64))
        r, x, y = int(res[0]), int(ix[0]), int(iy[0])
        n = 1 << 29
        out = []
        for dx in range(-ring, ring + 1):
            for dy in range(-ring, ring + 1):
                if max(abs(dx), abs(dy)) != ring:
                    continue
                cx, cy = x + dx, y + dy
                if 0 <= cx < n and 0 <= cy < n:
                    got = self.buckets.get((r << 58) | (cx << 29) | cy)
                    if got is not None:
                        out.append(got)
        return np.concatenate(out) if out else np.empty(0, dtype=np.int64)


def knn_for_cell_group(
    index: CentroidIndex,
    cell: int,
    point_id: np.ndarray,
    px: np.ndarray,
    py: np.ndarray,
    k: int,
    max_ring: int,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """All points sharing one cell → their kNN rows (vectorized).

    Expands rings together for the whole group; the stop bound uses the
    group's worst (largest) current d_k, so no point stops early.
    """
    cand_rows = np.empty(0, dtype=np.int64)
    ring = 0
    npts = len(px)
    while True:
        new = index.candidates(cell, ring)
        if len(new):
            cand_rows = np.concatenate([cand_rows, new])
        have = len(cand_rows)
        if have >= k:
            # current k-th best per point (group worst) from what we have
            dx = px[:, None] - index.xy[cand_rows, 0][None, :]
            dy = py[:, None] - index.xy[cand_rows, 1][None, :]
            d2 = dx * dx + dy * dy
            kk = min(k, have)
            part = np.partition(d2, kk - 1, axis=1)[:, kk - 1]
            worst_dk = float(np.sqrt(part.max()))
            if (ring - 1) * index.edge > worst_dk or ring >= max_ring:
                break
        elif ring >= max_ring:
            break
        ring += 1
    if len(cand_rows) == 0:
        z = np.empty(0, dtype=np.int64)
        return z, z, z.astype(np.int32), z.astype(np.float64)
    dx = px[:, None] - index.xy[cand_rows, 0][None, :]
    dy = py[:, None] - index.xy[cand_rows, 1][None, :]
    d2 = dx * dx + dy * dy
    fids = index.feature_id[cand_rows]
    kk = min(k, len(cand_rows))
    # top-k per point with (d2, feature_id) total order.  argpartition
    # alone is WRONG at ties: candidates equal to the kth distance get
    # cut arbitrarily, ignoring the feature_id tiebreak (surfaces with
    # duplicate centroid positions).  Keep EVERY candidate at <= the
    # kth value, then lexsort that short slice.
    kth = (
        np.partition(d2, kk - 1, axis=1)[:, kk - 1]
        if len(cand_rows) > kk
        else d2.max(axis=1)
    )
    rows_pid, rows_fid, rows_rank, rows_d2 = [], [], [], []
    for i in range(npts):
        ci = np.nonzero(d2[i] <= kth[i])[0]
        o = ci[np.lexsort((fids[ci], d2[i][ci]))][:kk]
        rows_pid.append(np.full(len(o), point_id[i], dtype=np.int64))
        rows_fid.append(fids[o])
        rows_rank.append(np.arange(1, len(o) + 1, dtype=np.int32))
        rows_d2.append(d2[i][o])
    return (
        np.concatenate(rows_pid),
        np.concatenate(rows_fid),
        np.concatenate(rows_rank),
        np.concatenate(rows_d2),
    )


class BroadcastKNNJoiner:
    """Actor-pool map_batches body: points × broadcast centroid index."""

    def __init__(self, features_ref, k: int = 3, cell_res: int = 13, max_ring: int = 512,
                 id_col: str = "point_id", x_col: str = "x", y_col: str = "y",
                 fx_col: str = "cx", fy_col: str = "cy"):
        import ray

        obj = features_ref if isinstance(features_ref, (pa.Table, CentroidIndex)) else ray.get(features_ref)
        self.index = obj if isinstance(obj, CentroidIndex) else CentroidIndex(obj, cell_res, fx_col, fy_col)
        self.k = k
        self.max_ring = max_ring
        self.id_col, self.x_col, self.y_col = id_col, x_col, y_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        pid = batch[self.id_col].to_numpy().astype(np.int64)
        px = batch[self.x_col].to_numpy().astype(np.float64)
        py = batch[self.y_col].to_numpy().astype(np.float64)
        pc = cells.cell_of_point(px, py, self.index.cell_res)
        order = np.argsort(pc, kind="stable")
        pc_s = pc[order]
        uniq, starts = np.unique(pc_s, return_index=True)
        ends = np.append(starts[1:], len(pc_s))
        outs = []
        for c, s, e in zip(uniq.tolist(), starts, ends):
            rows = order[s:e]
            outs.append(
                knn_for_cell_group(
                    self.index, int(c), pid[rows], px[rows], py[rows], self.k, self.max_ring
                )
            )
        if not outs:
            return KNN_SCHEMA.empty_table()
        return pa.table(
            {
                "point_id": np.concatenate([o[0] for o in outs]),
                "feature_id": np.concatenate([o[1] for o in outs]),
                "rank": np.concatenate([o[2] for o in outs]),
                "d2": np.concatenate([o[3] for o in outs]),
            },
            schema=KNN_SCHEMA,
        )


def broadcast_knn_join(
    points,
    features: pa.Table,
    k: int = 3,
    cell_res: int | None = None,
    concurrency=None,
    batch_size: int = 2048,
    **col_kwargs,
):
    """points Dataset × in-memory centroid table → kNN rows Dataset."""
    import ray

    from ..runtime import auto_concurrency

    if concurrency is None:
        concurrency = auto_concurrency()
    if cell_res is None:
        fx = features[col_kwargs.get("fx_col", "cx")]
        fy = features[col_kwargs.get("fy_col", "cy")]
        import pyarrow.compute as _pc

        cell_res = cells.choose_res(
            float(_pc.min(fx).as_py()), float(_pc.min(fy).as_py()),
            float(_pc.max(fx).as_py()), float(_pc.max(fy).as_py()),
            features.num_rows, target_per_cell=32,
        )
    ref = ray.put(CentroidIndex(features, cell_res,
                                col_kwargs.get("fx_col", "cx"), col_kwargs.get("fy_col", "cy")))
    return points.map_batches(
        BroadcastKNNJoiner,
        fn_constructor_kwargs={"features_ref": ref, "k": k, "cell_res": cell_res, **col_kwargs},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )
