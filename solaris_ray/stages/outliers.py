"""Robust per-group outlier detection via MAD (median absolute
deviation).

Quality curation flags documents whose length is wildly off their
group's typical value; mean/stddev z-scores (stages/zscore.py) are
themselves skewed by the outliers, so the robust estimator is the
median pair: ``med = median(x)``, ``mad = median(|x - med|)``, flag
``|x - med| > k * mad``.

Two exact distributed median passes ride the existing
``group_quantiles`` machinery (one bucketed co-shuffle each, lexsort
segments, DuckDB ``quantile_disc`` rank semantics).  Between passes
only the per-group medians move — #groups rows, broadcast once via
``ray.put`` and looked up per UNIQUE group value inside each batch
(factorized, no per-row Python).  The final count is a per-batch
partial sum + one tiny groupby.

Integer rank semantics throughout (group_quantiles enforces an
int64 value column), so the gate is hash-exact by construction.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .quantiles import group_quantiles


def mad_outliers(ds, group_col: str, value_col: str, k: int = 3):
    """-> one row per group: (group_col, med, mad, n_out) where n_out
    counts rows with |value - med| > k * mad."""
    import ray

    if k < 1:
        raise ValueError("k must be >= 1")

    def _to_map(med_ds) -> dict:
        return {
            r[group_col]: int(r["value"]) for r in med_ds.take_all()
        }  # per-group scalars: #groups rows, the broadcast side

    med = _to_map(group_quantiles(ds, group_col, value_col, [0.5]))
    med_ref = ray.put(med)

    def _dev(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        v = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ray.get(med_ref)
        uniq, inv = np.unique(g, return_inverse=True)
        med_u = np.array([m[u] for u in uniq], np.int64)
        dev = np.abs(v - med_u[inv])
        return pa.table(
            {
                group_col: batch[group_col],
                "dev": pa.array(dev, pa.int64()),
            }
        )

    dev_ds = ds.map_batches(_dev, batch_format="pyarrow")
    mad = _to_map(group_quantiles(dev_ds, group_col, "dev", [0.5]))
    mad_ref = ray.put(mad)

    def _flag_partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        dev = batch["dev"].to_numpy(zero_copy_only=False)
        mm = ray.get(mad_ref)
        uniq, inv = np.unique(g, return_inverse=True)
        mad_u = np.array([mm[u] for u in uniq], np.int64)
        out = dev > k * mad_u[inv]
        n_out = np.bincount(inv, weights=out, minlength=uniq.size)
        return pa.table(
            {
                group_col: pa.array(uniq),
                "n_out": pa.array(n_out.astype(np.int64), pa.int64()),
            }
        )

    counts = (
        dev_ds.map_batches(_flag_partial, batch_format="pyarrow")
        .groupby(group_col)
        .sum("n_out")
    )

    out_schema = pa.schema(
        [
            (group_col, pa.string()),
            ("med", pa.int64()),
            ("mad", pa.int64()),
            ("n_out", pa.int64()),
        ]
    )

    def _final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        g = batch[group_col].to_numpy(zero_copy_only=False)
        n = batch["sum(n_out)"].to_numpy(zero_copy_only=False).astype(np.int64)
        m = ray.get(med_ref)
        mm = ray.get(mad_ref)
        uniq, inv = np.unique(g, return_inverse=True)
        med_u = np.array([m[u] for u in uniq], np.int64)
        mad_u = np.array([mm[u] for u in uniq], np.int64)
        return pa.table(
            {
                group_col: pa.array(g),
                "med": pa.array(med_u[inv], pa.int64()),
                "mad": pa.array(mad_u[inv], pa.int64()),
                "n_out": pa.array(n, pa.int64()),
            }
        )

    return counts.map_batches(_final, batch_format="pyarrow")
