"""Mann–Whitney U rank-sum test between two groups, exact.

The distribution-free two-sample location test — the curation
question "does group A score higher than group B?" without normality
assumptions.  Tie-aware: ranks are kept in 2× units so tie-averaged
ranks stay integers, making the U statistic exact int64; the normal
approximation z (with the standard tie correction) is the only float,
evaluated identically by the SQL twin on identical integer operands.

Scale plan: the whole sample compresses to its VALUE HISTOGRAM —
per-batch (value, count, count_group1) partials, one int-bucketed
co-shuffle, and a driver-side finish over the O(distinct values)
table (the histogram/wasserstein precedent; value domains are
bounded, rows are not).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._buckets import bucket_of


def mann_whitney(ds, group_col: str, val_col: str, g1: str, g2: str,
                 n_buckets: int = 16) -> pa.Table:
    """-> one row (n1, n2, u2, t3t, z6): U for group ``g1`` in 2×
    units (exact), the tie mass Σ(t³−t), and the tie-corrected z."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        g = batch[group_col].to_numpy(zero_copy_only=False)
        keep = (g == g1) | (g == g2)
        v = batch[val_col].to_numpy().astype(np.int64)[keep]
        is1 = (g[keep] == g1).astype(np.int64)
        uniq, inv = np.unique(v, return_inverse=True)
        return pa.table({
            "v": pa.array(uniq, pa.int64()),
            "c": np.bincount(inv).astype(np.int64),
            "c1": np.bincount(inv, weights=is1).astype(np.int64),
            "kb": pa.array(bucket_of(uniq, n_buckets), pa.int64()),
        })

    def _combine(group: pa.Table) -> pa.Table:
        v = group["v"].to_numpy()
        c = group["c"].to_numpy()
        c1 = group["c1"].to_numpy()
        uniq, inv = np.unique(v, return_inverse=True)
        return pa.table({
            "v": pa.array(uniq, pa.int64()),
            "c": np.bincount(inv, weights=c).astype(np.int64),
            "c1": np.bincount(inv, weights=c1).astype(np.int64),
        })

    hist = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=16384)
        .groupby("kb").map_groups(_combine, batch_format="pyarrow")
        .to_pandas()  # O(distinct values) rows — the compressed sample
    ).sort_values("v")
    c = hist["c"].to_numpy().astype(np.int64)
    c1 = hist["c1"].to_numpy().astype(np.int64)
    sv = np.concatenate(([0], np.cumsum(c)[:-1]))
    r2_1 = int((c1 * (2 * sv + c + 1)).sum())
    n1 = int(c1.sum())
    n2 = int((c - c1).sum())
    n = n1 + n2
    u2 = r2_1 - n1 * (n1 + 1)
    t3t = int((c ** 3 - c).sum())
    var = n1 * n2 / 12.0 * ((n + 1) - t3t / (n * (n - 1.0)))
    z = (u2 - n1 * n2) / (2.0 * np.sqrt(var)) if var > 0 else 0.0
    return pa.table({
        "n1": pa.array([n1], pa.int64()),
        "n2": pa.array([n2], pa.int64()),
        "u2": pa.array([u2], pa.int64()),
        "t3t": pa.array([t3t], pa.int64()),
        "z6": pa.array([round(float(z), 6)], pa.float64()),
    })
