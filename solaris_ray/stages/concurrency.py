"""Peak interval concurrency (max simultaneous sessions).

Capacity diagnostic over an interval table: the maximum number of
intervals simultaneously open, and the EARLIEST instant it happens —
``concurrency(t) = #{i : start_i <= t <= end_i}``.

Classic sweep-line, distributed with the same two-pass global-prefix
shape as sequence packing (stages/pack.py) and graph node-id
assignment: boundary deltas (+1 at start, -1 at end+1) are
pre-aggregated by instant (one groupby — each distinct time appears
once, so no cross-block same-instant split can misread the sweep),
range-sorted by time, then each block reports (total, local max
prefix, earliest argmax time) — THREE scalars per block to the
driver, never rows.  The block offsets make local maxima globally
comparable; ties resolve to the earliest time.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def peak_concurrency(intervals, start_col: str = "start_us",
                     end_col: str = "end_us"):
    """intervals: Dataset with inclusive [start_col, end_col] int64
    instants.  -> one row (peak, t_us): max simultaneous intervals and
    the earliest instant achieving it (0, -1 on empty input)."""
    import ray

    def _deltas(batch: pa.Table) -> pa.Table:
        s = batch[start_col].to_numpy(zero_copy_only=False).astype(np.int64)
        e = batch[end_col].to_numpy(zero_copy_only=False).astype(np.int64)
        t = np.concatenate([s, e + 1])
        d = np.concatenate(
            [np.ones(s.size, np.int64), np.full(e.size, -1, np.int64)]
        )
        order = np.argsort(t, kind="stable")
        t, d = t[order], d[order]
        starts = np.flatnonzero(np.r_[True, t[1:] != t[:-1]])
        sums = np.add.reduceat(d, starts) if t.size else d
        return pa.table(
            {
                "t": pa.array(t[starts], pa.int64()),
                "d": pa.array(sums.astype(np.int64), pa.int64()),
            }
        )

    agg = (
        intervals.map_batches(_deltas, batch_format="pyarrow")
        .groupby("t")
        .sum("d")
        .map_batches(
            lambda b: pa.table(
                {"t": b["t"], "d": pc.cast(b["sum(d)"], pa.int64())}
            ),
            batch_format="pyarrow",
        )
        .sort("t")
        .materialize()
    )
    refs = agg.to_arrow_refs()  # range-ordered blocks, object-store resident

    @ray.remote
    def _block_stats(block: pa.Table):
        if block.num_rows == 0:
            return 0, None, None
        d = block["d"].to_numpy(zero_copy_only=False)
        t = block["t"].to_numpy(zero_copy_only=False)
        p = np.cumsum(d)
        j = int(np.argmax(p))  # first occurrence = earliest in-block
        return int(p[-1]), int(p[j]), int(t[j])

    stats = ray.get([_block_stats.remote(r) for r in refs])
    offset = 0
    peak, t_at = 0, -1
    for total, local_max, local_t in stats:
        if local_max is not None and offset + local_max > peak:
            peak, t_at = offset + local_max, local_t
        offset += total
    return ray.data.from_arrow(
        pa.table(
            {
                "peak": pa.array([peak], pa.int64()),
                "t_us": pa.array([t_at], pa.int64()),
            }
        )
    )
