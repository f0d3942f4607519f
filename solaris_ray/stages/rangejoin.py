"""Distributed 1-D range join: points x intervals (v in [lo, hi]).

A generic interval join the reference lacks (its spatial clip join is
the 2-D analogue; this is the scalar version needed for
value-in-window joins — score bands, time ranges, length buckets).

Shape: pick a bucket width; each interval replicates to every bucket
it overlaps (duplication factor = avg interval span / width, logged);
each point lands in exactly ONE bucket, so every qualifying (point,
interval) pair meets in exactly one group — no output dedup pass.
One ``groupby(bucket)`` co-shuffle of narrow rows; in-bucket matching
is a vectorized lo/hi comparison (chunked so memory stays bounded,
buckets above ``max_bucket`` intervals are truncated WITH a logged
warning, mirroring the capped-bucket pattern of the dedup stages).

Bucket width trades replication vs. group size; pick it near the
median interval span (duplication ~2) — the ``joins.choose_res``
density heuristic applies unchanged in 1-D.
"""

from __future__ import annotations

import logging

import numpy as np
import pyarrow as pa

logger = logging.getLogger(__name__)


def range_join(
    points_ds,
    intervals_ds,
    width: float,
    point_id: str = "point_id",
    value_col: str = "v",
    interval_id: str = "interval_id",
    lo_col: str = "lo",
    hi_col: str = "hi",
    max_bucket: int = 100_000,
):
    """Inner join points to intervals with lo <= v <= hi (closed ends).

    Returns (point_id, interval_id, v) rows.
    """

    def _tag_points(batch: pa.Table) -> pa.Table:
        v = batch[value_col].to_numpy().astype(np.float64)
        return pa.table(
            {
                "bkt": pa.array(np.floor(v / width).astype(np.int64)),
                "side": pa.array(np.zeros(len(v), dtype=np.int8)),
                "id": pa.array(batch[point_id].to_numpy().astype(np.int64)),
                "a": pa.array(v),
                "b": pa.array(v),
            }
        )

    def _tag_intervals(batch: pa.Table) -> pa.Table:
        lo = batch[lo_col].to_numpy().astype(np.float64)
        hi = batch[hi_col].to_numpy().astype(np.float64)
        iid = batch[interval_id].to_numpy().astype(np.int64)
        b0 = np.floor(lo / width).astype(np.int64)
        b1 = np.floor(hi / width).astype(np.int64)
        counts = np.maximum(b1 - b0 + 1, 0)
        total = int(counts.sum())
        if len(lo):
            dup = total / len(lo)
            if dup > 8:
                logger.info("range_join interval duplication %.1fx (width=%g)", dup, width)
        rep = np.repeat(np.arange(len(lo)), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        off = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        return pa.table(
            {
                "bkt": pa.array(np.repeat(b0, counts) + off),
                "side": pa.array(np.ones(total, dtype=np.int8)),
                "id": pa.array(iid[rep]),
                "a": pa.array(lo[rep]),
                "b": pa.array(hi[rep]),
            }
        )

    tagged = points_ds.map_batches(_tag_points, batch_format="pyarrow").union(
        intervals_ds.map_batches(_tag_intervals, batch_format="pyarrow")
    )

    def _match(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy()
        pmask = side == 0
        imask = ~pmask
        empty = pa.table(
            {
                point_id: pa.array([], pa.int64()),
                interval_id: pa.array([], pa.int64()),
                value_col: pa.array([], pa.float64()),
            }
        )
        if not pmask.any() or not imask.any():
            return empty
        pid = group["id"].to_numpy()[pmask]
        v = group["a"].to_numpy()[pmask]
        iid = group["id"].to_numpy()[imask]
        lo = group["a"].to_numpy()[imask]
        hi = group["b"].to_numpy()[imask]
        if len(iid) > max_bucket:
            logger.warning(
                "range_join bucket %s truncated: %d of %d intervals dropped",
                group["bkt"][0].as_py(), len(iid) - max_bucket, len(iid),
            )
            iid, lo, hi = iid[:max_bucket], lo[:max_bucket], hi[:max_bucket]
        # sort intervals by lo; points by v — sweep in value order so the
        # candidate window per point is intervals with lo <= v (prefix),
        # then one vectorized hi >= v filter per chunk of points
        io = np.argsort(lo, kind="stable")
        iid, lo, hi = iid[io], lo[io], hi[io]
        po = np.argsort(v, kind="stable")
        pid, v = pid[po], v[po]
        out_p, out_i, out_v = [], [], []
        CH = 512
        for s in range(0, len(v), CH):
            vv = v[s : s + CH]
            cut = np.searchsorted(lo, vv.max(), side="right")
            if cut == 0:
                continue
            m = (lo[None, :cut] <= vv[:, None]) & (hi[None, :cut] >= vv[:, None])
            pi, ii = np.nonzero(m)
            out_p.append(pid[s + pi])
            out_i.append(iid[ii])
            out_v.append(vv[pi])
        if not out_p:
            return empty
        return pa.table(
            {
                point_id: pa.array(np.concatenate(out_p), pa.int64()),
                interval_id: pa.array(np.concatenate(out_i), pa.int64()),
                value_col: pa.array(np.concatenate(out_v), pa.float64()),
            }
        )

    return tagged.groupby("bkt").map_groups(_match, batch_format="pyarrow")
