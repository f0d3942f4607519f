"""Per-group 1-D Wasserstein-1 distance to the global distribution.

Distribution-drift monitoring for mixed-source corpora: W1 ("earth
mover's" on the line) between each source's value distribution and the
corpus-wide one — the robust companion to `stages/divergence.py`'s KL
(which explodes on disjoint support; W1 degrades gracefully and has
units of the value).

Exactness: for integer values, W1(F_s, F_g) = sum over consecutive
distinct support values v_i < v_{i+1} of |F_s(v_i) - F_g(v_i)| *
(v_{i+1} - v_i), and with F as count ratios the numerator
|cum_s * N_g - cum_g * N_s| is exact integer arithmetic.  The final
micro-unit ratio uses arbitrary-precision Python ints (the driver-side
table is support-sized), so there is no overflow and the SQL twin's
HUGEINT arithmetic matches bit for bit.

Shape: per-batch partial (key, value, count) rows -> ONE small groupby
— the exchange is bounded by (distinct values x groups), never row
count; the cumulative merge over the support runs on the driver (the
stretch.py global-histogram discipline).  For unbounded-cardinality
value domains, quantize first (the auc.py contract).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT = pa.schema(
    [
        ("key", pa.string()),
        ("n", pa.int64()),
        ("w1u", pa.int64()),
    ]
)


def w1_to_global(ds, key_col: str, val_col: str) -> pa.Table:
    """Dataset with a string group column and an integer value column
    -> one row per group: (key, n, w1u) where w1u is the W1 distance
    to the all-groups distribution in micro value-units (truncated)."""

    def _partial(batch: pa.Table) -> pa.Table:
        k = np.asarray(batch[key_col].to_pylist(), dtype=object)
        v = batch[val_col].to_numpy(zero_copy_only=False).astype(np.int64)
        import pandas as pd

        g = (
            pd.DataFrame({"k": k, "v": v})
            .groupby(["k", "v"], sort=False)
            .size()
            .reset_index(name="c")
        )
        return pa.table(
            {
                "k": pa.array(list(g["k"]), pa.string()),
                "v": pa.array(g["v"].to_numpy().astype(np.int64), pa.int64()),
                "c": pa.array(g["c"].to_numpy().astype(np.int64), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["k", "v"])
        .sum("c")
        .to_pandas()
    )
    if hist.empty:
        return _OUT.empty_table()
    keys = sorted(hist["k"].unique())
    support = np.sort(hist["v"].unique().astype(np.int64))
    gaps = np.diff(support)
    # per-key cumulative counts at every support point
    cum_g = np.zeros(support.size, dtype=object)
    per_key = {}
    for kk in keys:
        sub = hist[hist["k"] == kk]
        cnt = np.zeros(support.size, np.int64)
        pos = np.searchsorted(support, sub["v"].to_numpy().astype(np.int64))
        cnt[pos] = sub["sum(c)"].to_numpy().astype(np.int64)
        per_key[kk] = np.cumsum(cnt)
        cum_g = cum_g + per_key[kk]
    n_g = int(cum_g[-1])
    out_k, out_n, out_w = [], [], []
    for kk in keys:
        cum_s = per_key[kk]
        n_s = int(cum_s[-1])
        # arbitrary-precision: |cum_s*N_g - cum_g*N_s| * gap summed
        num = 0
        for i in range(support.size - 1):
            num += abs(int(cum_s[i]) * n_g - int(cum_g[i]) * n_s) * int(
                gaps[i]
            )
        w1u = num * 1_000_000 // (n_s * n_g) if n_s else 0
        out_k.append(kk)
        out_n.append(n_s)
        out_w.append(int(w1u))
    return pa.table(
        {
            "key": pa.array(out_k, pa.string()),
            "n": pa.array(out_n, pa.int64()),
            "w1u": pa.array(out_w, pa.int64()),
        }
    )
