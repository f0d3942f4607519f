"""Pivot (long -> wide): per-key count and sum columns per category.

The classic reshape between event logs and feature tables: one row per
(user, event_type) observation becomes one row per user with a column
per event type — the feature-matrix layout model trainers consume.

Categories are an EXPLICIT caller-supplied list (the SQL-twin
conditional-aggregation contract: the output schema must be static).
Rows whose category is not listed fall into none of the columns —
same as SQL's CASE WHEN.

Shape: per-batch PARTIAL pivot (factorize categories against the
fixed list, one bincount per output column) then ONE small
groupby(key).sum over already-wide rows — the pre-aggregate-then-
shuffle discipline: the exchange carries one row per (key, batch),
never one per event.  Everything int64 (sums are of the caller's
integerized value column).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pivot_counts(
    ds,
    key_col: str,
    cat_col: str,
    categories: list[str],
    val_col: str | None = None,
):
    """Dataset -> one row per key: ``<cat>_n`` count columns (and
    ``<cat>_sum`` int64 sum columns when ``val_col`` is given), one per
    entry of ``categories``."""
    if len(set(categories)) != len(categories):
        raise ValueError("pivot_counts: duplicate categories")
    cats = list(categories)

    def _partial(batch: pa.Table) -> pa.Table:
        k = batch[key_col].to_numpy(zero_copy_only=False).astype(np.int64)
        c = np.asarray(batch[cat_col].to_pylist(), dtype=object)
        v = (
            batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
            if val_col is not None
            else None
        )
        uk, kinv = np.unique(k, return_inverse=True)
        cols: dict = {key_col: pa.array(uk, pa.int64())}
        for ci, cat in enumerate(cats):
            m = c == cat
            cnt = np.bincount(kinv[m], minlength=uk.size).astype(np.int64)
            cols[f"{cat}_n"] = pa.array(cnt, pa.int64())
            if v is not None:
                s = np.zeros(uk.size, np.int64)
                np.add.at(s, kinv[m], v[m])
                cols[f"{cat}_sum"] = pa.array(s, pa.int64())
        return pa.table(cols)

    wide = ds.map_batches(_partial, batch_format="pyarrow")
    agg_cols = [c for c in wide.schema().names if c != key_col]
    from ray.data.aggregate import Sum

    out = wide.groupby(key_col).aggregate(*[Sum(c) for c in agg_cols])

    def _rename(batch: pa.Table) -> pa.Table:
        cols = {key_col: batch[key_col]}
        for c in agg_cols:
            cols[c] = batch[f"sum({c})"]
        return pa.table(cols)

    return out.map_batches(_rename, batch_format="pyarrow")
