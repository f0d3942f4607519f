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


def watermark_late_counts(events, delay_us: int, n_ranges: int = 128,
                          id_col: str = "event_id", ts_col: str = "ts_us",
                          type_col: str = "event_type"):
    """Watermarked late-event accounting (the streaming-semantics
    primitive batch engines re-derive): with arrival order = ``id_col``
    and watermark(e) = max event-time strictly before e's arrival, an
    event is LATE iff ``ts < watermark − delay_us`` — the rows a
    streaming window operator would drop or quarantine.

    Distributed shape (the per-block-offset global-prefix idiom): the
    arrival axis splits into ``n_ranges`` contiguous id ranges; pass 1
    reduces each range to its max event-time (one O(ranges) table —
    the ONLY driver-touching artifact), the exclusive prefix-max over
    ranges seeds pass 2, where each range group sorts by arrival id
    and runs one vectorized ``np.maximum.accumulate``.  Output:
    (event_type, n_events, n_late) int64 rows.
    """
    import ray

    from ._buckets import distinct_reduce

    # range width from the driver-visible id bound (one metadata-cheap
    # max): ids are dense test-side; at scale pass an explicit width
    hi = events.max(id_col)
    width = max(1, (int(hi) + n_ranges) // n_ranges)

    def _tag2(b: pa.Table) -> pa.Table:
        eid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({
            "eid": pa.array(eid, pa.int64()),
            "ts": pa.array(
                b[ts_col].to_numpy(zero_copy_only=False).astype(np.int64),
                pa.int64()),
            "etype": b[type_col],
            "rb": pa.array(eid // np.int64(width), pa.int64()),
        })

    tagged = events.map_batches(_tag2, batch_format="pyarrow")
    rng_max = distinct_reduce(
        tagged.map_batches(
            lambda b: pa.table({"rb": b["rb"], "mx": b["ts"]}),
            batch_format="pyarrow"),
        ["rb"], aggs={"mx": "max"}).to_pandas()
    pre = np.full(int(rng_max["rb"].max()) + 2 if len(rng_max) else 1,
                  np.iinfo(np.int64).min, np.int64)
    if len(rng_max):
        mx = np.full(pre.size - 1, np.iinfo(np.int64).min, np.int64)
        mx[rng_max["rb"].to_numpy()] = rng_max["mx"].to_numpy()
        pre[1:] = np.maximum.accumulate(mx)  # pre[r] = max over ranges < r
    pre_ref = ray.put(pre)

    out_schema = pa.schema([
        ("event_type", pa.string()), ("n_events", pa.int64()),
        ("n_late", pa.int64()),
    ])

    def _late(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return out_schema.empty_table()
        p = ray.get(pre_ref)
        eid = group["eid"].to_numpy(zero_copy_only=False)
        ts = group["ts"].to_numpy(zero_copy_only=False)
        et = np.asarray(group["etype"].to_pylist(), dtype=object)
        order = np.argsort(eid, kind="stable")
        ts_o, et_o = ts[order], et[order]
        rb = int(eid[order[0]] // width)
        seed = p[rb] if rb < p.size else np.iinfo(np.int64).min
        run = np.maximum.accumulate(np.concatenate(([seed], ts_o)))[:-1]
        # run > ts + delay (NOT ts < run - delay): the int64-min seed
        # minus delay wraps and would flag the very first arrival
        late = run > ts_o + delay_us
        uniq, inv = np.unique(et_o, return_inverse=True)
        n = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        nl = np.bincount(inv, weights=late.astype(np.float64),
                         minlength=uniq.size).astype(np.int64)
        return pa.table({
            "event_type": pa.array(uniq.tolist(), pa.string()),
            "n_events": pa.array(n, pa.int64()),
            "n_late": pa.array(nl, pa.int64()),
        })

    partial = tagged.groupby("rb").map_groups(_late, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    agg = partial.groupby("event_type").aggregate(Sum("n_events"), Sum("n_late"))
    return agg.map_batches(
        lambda b: pa.table({
            "event_type": b["event_type"],
            "n_events": pc.cast(b["sum(n_events)"], pa.int64()),
            "n_late": pc.cast(b["sum(n_late)"], pa.int64()),
        }),
        batch_format="pyarrow",
    )

