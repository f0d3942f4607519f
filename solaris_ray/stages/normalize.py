"""Per-group z-score normalization — grouped feature scaling.

Two streaming passes, no shuffle of data rows: pass 1 computes exact
integer partials (group, n, sum, sum-of-squares) per batch and
combines them in a tiny ``groupby(group)`` (group cardinality rows);
pass 2 broadcasts the per-group stats (``ray.put`` once) and maps the
z-score over batches.  Because the moments are exact int64/object
sums, engine and SQL oracle execute the IDENTICAL float expression
``round((x - sm/n) / sqrt(ss/n - (sm/n)^2), 6)`` on identical
operands — bit-exact, no summation-order sensitivity at all.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def group_zscore(ds, group_col: str, val_col: str, id_col: str,
                 round_dp: int = 6):
    """rows -> (id, group, value, z6); z within group, population std.

    Groups with zero variance emit z6 = 0.0 (matching the oracle's
    CASE guard)."""
    import ray

    part_schema = pa.schema(
        [(group_col, pa.string()), ("n", pa.int64()),
         ("sm", pa.int64()), ("ss", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return part_schema.empty_table()
        t = pa.table(
            {
                group_col: batch[group_col],
                "v": pc.cast(batch[val_col], pa.int64()),
                "v2": pc.multiply(
                    pc.cast(batch[val_col], pa.int64()),
                    pc.cast(batch[val_col], pa.int64()),
                ),
            }
        )
        agg = t.group_by([group_col]).aggregate(
            [("v", "count"), ("v", "sum"), ("v2", "sum")]
        )
        return pa.table(
            {
                group_col: agg[group_col],
                "n": pc.cast(agg["v_count"], pa.int64()),
                "sm": pc.cast(agg["v_sum"], pa.int64()),
                "ss": pc.cast(agg["v2_sum"], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    stats_rows = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=4096)
        .groupby(group_col)
        .aggregate(Sum("n"), Sum("sm"), Sum("ss"))
        .take_all()  # one row per group — tiny by construction
    )
    stats = {
        r[group_col]: (r["sum(n)"], r["sum(sm)"], r["sum(ss)"])
        for r in stats_rows
    }
    sref = ray.put(stats)

    out_schema = pa.schema(
        [(id_col, pa.int64()), (group_col, pa.string()),
         (val_col, pa.int64()), ("z6", pa.float64())]
    )

    def _z(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        st = ray.get(sref)
        g = np.asarray(batch[group_col].to_pylist(), object)
        x = pc.cast(batch[val_col], pa.int64()).to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(g, return_inverse=True)
        n = np.array([st[u][0] for u in uniq], np.float64)
        sm = np.array([st[u][1] for u in uniq], np.float64)
        ss = np.array([st[u][2] for u in uniq], np.float64)
        mean = (sm / n)[inv]
        var = (ss / n)[inv] - mean * mean
        with np.errstate(divide="ignore", invalid="ignore"):
            z = np.where(
                var > 0, np.round((x - mean) / np.sqrt(np.abs(var)), round_dp), 0.0
            )
        return pa.table(
            {
                id_col: pc.cast(batch[id_col], pa.int64()),
                group_col: batch[group_col],
                val_col: pa.array(x, pa.int64()),
                "z6": pa.array(z, pa.float64()),
            }
        )

    return ds.map_batches(_z, batch_format="pyarrow", batch_size=4096)
