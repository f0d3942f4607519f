"""Event-time window operators — tumbling / sliding / session.

The reference is a pure batch system (SURVEY.md §2.10: no windows);
these are the training-data-pipeline analytics ops the driver mandate
adds.  All operate on event-time columns (no wall-clock state), so
they are plain grouped transforms under the streaming executor:

- tumbling: key = floor(ts / width)           (one window per event)
- sliding:  keys = the width/slide windows covering ts  (fan-out)
- session:  per-entity sort + gap split        (groupby(entity))

Timestamps are int64 epoch-microseconds throughout (hash-stable).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def tumbling_key(ts_us: np.ndarray, width_us: int) -> np.ndarray:
    return (ts_us // width_us) * width_us


def sliding_keys(ts_us: np.ndarray, width_us: int, slide_us: int) -> tuple[np.ndarray, np.ndarray]:
    """(row_idx, window_start) pairs — each event lands in
    width/slide windows (the fan-out that makes sliding windows a
    flat-map, not stateful streaming)."""
    n_per = width_us // slide_us
    first = ((ts_us - width_us + slide_us) // slide_us) * slide_us
    offs = np.arange(n_per) * slide_us
    starts = first[:, None] + offs[None, :]
    valid = (starts <= ts_us[:, None]) & (ts_us[:, None] < starts + width_us)
    ri, ci = np.nonzero(valid)
    return ri, starts[ri, ci]


def sliding_window_counts(events, width_us: int, slide_us: int,
                          ts_col: str = "ts", type_col: str = "event_type"):
    """events -> (window_start_us, event_type, n) via fan-out + groupby."""
    from ray.data.aggregate import Count

    def _fan(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch[ts_col], pa.int64()).to_numpy()
        ri, ws = sliding_keys(ts, width_us, slide_us)
        return pa.table(
            {
                "window_start_us": pa.array(ws, pa.int64()),
                type_col: batch[type_col].take(pa.array(ri)),
            }
        )

    agg = (
        events.map_batches(_fan, batch_format="pyarrow", batch_size=16384)
        .groupby(["window_start_us", type_col])
        .aggregate(Count())
    )
    return agg.map_batches(
        lambda b: pa.table(
            {
                "window_start_us": b["window_start_us"],
                type_col: b[type_col],
                "n": pc.cast(b["count()"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
    )


def sessionize(events, gap_us: int, entity_col: str = "user_id",
               ts_col: str = "ts", id_col: str = "event_id"):
    """events -> (entity, session_id, n_events, start_us, end_us).

    Classic gap-based sessionization: per-entity sort by (ts, id),
    session breaks where the gap exceeds ``gap_us``; sessions numbered
    1..k per entity in time order.  Entities are the parallel unit.
    """

    def _sessions(group: pa.Table) -> pa.Table:
        ts = pc.cast(group[ts_col], pa.int64()).to_numpy()
        ids = group[id_col].to_numpy()
        order = np.lexsort((ids, ts))
        ts = ts[order]
        brk = np.ones(len(ts), dtype=np.int64)
        if len(ts) > 1:
            brk[1:] = (np.diff(ts) > gap_us).astype(np.int64)
        sess = np.cumsum(brk)
        uniq, starts = np.unique(sess, return_index=True)
        ends = np.append(starts[1:], len(sess))
        ent = group[entity_col][0].as_py()
        return pa.table(
            {
                entity_col: pa.array([ent] * len(uniq), group[entity_col].type),
                "session_id": pa.array(uniq, pa.int64()),
                "n_events": pa.array((ends - starts).astype(np.int64)),
                "start_us": pa.array(ts[starts], pa.int64()),
                "end_us": pa.array(ts[ends - 1], pa.int64()),
            }
        )

    return events.groupby(entity_col).map_groups(_sessions, batch_format="pyarrow")
