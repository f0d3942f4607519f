"""Equi-width histogram per group — partial bincounts, one combine.

Distribution monitoring over a curated corpus (length/score histograms
per source or language) is a partial-aggregable reduction: each batch
bins its own rows into the caller-fixed [lo, hi) range (out-of-range
values clamp into the edge bins, so every row is counted and the SQL
twin can spell the same LEAST/GREATEST clamp), emits per-(group, bin)
partial counts, and ONE small shuffle combines them.  The wide data
never moves — only |groups| * n_bins count rows per batch.

Bin math is exact int64: ``bin = clamp((v - lo) * n_bins // (hi - lo),
0, n_bins - 1)`` — multiplication before floor-division avoids any
float boundary ambiguity between numpy and SQL.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def group_histogram(
    ds,
    group_col: str,
    val_col: str,
    n_bins: int,
    lo: int,
    hi: int,
):
    """-> (group, bin, n): exact equi-width histogram of ``val_col``
    (int64) within each group over the fixed range [lo, hi)."""
    if n_bins < 1:
        raise ValueError("n_bins must be >= 1")
    if hi <= lo:
        raise ValueError("hi must be > lo")
    from ray.data.aggregate import Sum
    import pyarrow.compute as pc

    out_schema = pa.schema(
        [(group_col, pa.string()), ("bin", pa.int64()), ("n", pa.int64())]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = np.clip((v - lo) * n_bins // (hi - lo), 0, n_bins - 1)
        df = pd.DataFrame(
            {group_col: batch[group_col].to_numpy(zero_copy_only=False),
             "bin": b}
        )
        g = df.groupby([group_col, "bin"], sort=False).size().rename("n").reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    out = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=16384)
        .groupby([group_col, "bin"])
        .aggregate(Sum("n"))
    )

    def _finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        return pa.table(
            {
                group_col: batch[group_col],
                "bin": pc.cast(batch["bin"], pa.int64()),
                "n": pc.cast(batch["sum(n)"], pa.int64()),
            }
        )

    return out.map_batches(_finish, batch_format="pyarrow")
