"""Decision-stump split evaluation in exact integer arithmetic.

Training-data op (feature diagnostics / weak-learner fitting): given
(feature, value, label) points with integer feature values and binary
labels, score every candidate threshold of every feature with the
weighted Gini impurity of the induced split — as an exact integer
fraction, so the DuckDB twin is hash-identical and no float tie ever
flips an argmin.

For split ``value <= t`` with left (n_le, pos_le) and right
(n_gt, pos_gt) out of n = n_le + n_gt:

  cost = [2 * (pos_le*neg_le*n_gt + pos_gt*neg_gt*n_le)]  /  [n_le*n_gt*n]

(the standard 2*p*(1-p) Gini, cleared of denominators).  Exact while
n^3 < 2^63 (n up to ~2 million rows per feature) — the kernel raises
past that instead of silently wrapping; the count columns stay exact at
any scale.

Distributed shape: one map_batches pass reduces each block to partial
(feature, value) -> (n, pos) counts (distinct integer feature values
are the small side by construction), one tiny groupby(feature) finishes
with a cumulative pass.  The wide input never shuffles.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def stump_split_scores(points, feature_col: str = "feature",
                       value_col: str = "value", label_col: str = "label"):
    """points (feature: string, value: int64, label: 0/1) ->
    per (feature, threshold): n_le, pos_le, n_gt, pos_gt,
    gini_num, gini_den (exact integer weighted-Gini fraction)."""

    def _partial(batch: pa.Table) -> pa.Table:
        feat = batch[feature_col].to_numpy(zero_copy_only=False)
        val = batch[value_col].to_numpy(zero_copy_only=False).astype(np.int64)
        lab = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        uf, fc = np.unique(feat, return_inverse=True)
        o = np.lexsort((val, fc))
        fc, val, lab = fc[o], val[o], lab[o]
        new = np.r_[True, (fc[1:] != fc[:-1]) | (val[1:] != val[:-1])]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        n = np.bincount(seg).astype(np.int64)
        pos = np.zeros(n.size, np.int64)
        np.add.at(pos, seg, lab)
        return pa.table(
            {
                feature_col: pa.array(uf[fc[starts]], pa.string()),
                value_col: pa.array(val[starts], pa.int64()),
                "n": pa.array(n, pa.int64()),
                "pos": pa.array(pos, pa.int64()),
            }
        )

    partials = points.map_batches(_partial, batch_format="pyarrow",
                                  batch_size=65536)

    out_schema = pa.schema(
        [(feature_col, pa.string()), ("threshold", pa.int64()),
         ("n_le", pa.int64()), ("pos_le", pa.int64()),
         ("n_gt", pa.int64()), ("pos_gt", pa.int64()),
         ("gini_num", pa.int64()), ("gini_den", pa.int64())]
    )

    def _thresholds(group: pa.Table) -> pa.Table:
        val = group[value_col].to_numpy(zero_copy_only=False)
        n = group["n"].to_numpy(zero_copy_only=False)
        pos = group["pos"].to_numpy(zero_copy_only=False)
        if val.size == 0:
            return out_schema.empty_table()
        # combine the per-block partials for this feature
        o = np.argsort(val, kind="stable")
        val, n, pos = val[o], n[o], pos[o]
        newv = np.r_[True, val[1:] != val[:-1]]
        seg = np.cumsum(newv) - 1
        nseg = int(seg[-1]) + 1
        nn = np.zeros(nseg, np.int64)
        pp = np.zeros(nseg, np.int64)
        np.add.at(nn, seg, n)
        np.add.at(pp, seg, pos)
        uval = val[newv]
        ntot, ptot = int(nn.sum()), int(pp.sum())
        if ntot > 2_000_000:
            raise ValueError(
                f"stump_split_scores: n={ntot} rows in one feature — "
                "n^3 exceeds int64; use the count columns downstream or "
                "pre-aggregate"
            )
        n_le = np.cumsum(nn)[:-1]
        pos_le = np.cumsum(pp)[:-1]
        thr = uval[:-1]
        n_gt = ntot - n_le
        pos_gt = ptot - pos_le
        neg_le = n_le - pos_le
        neg_gt = n_gt - pos_gt
        num = 2 * (pos_le * neg_le * n_gt + pos_gt * neg_gt * n_le)
        den = n_le * n_gt * ntot
        feat = group[feature_col][0].as_py()
        return pa.table(
            {
                feature_col: pa.array([feat] * thr.size, pa.string()),
                "threshold": pa.array(thr, pa.int64()),
                "n_le": pa.array(n_le, pa.int64()),
                "pos_le": pa.array(pos_le, pa.int64()),
                "n_gt": pa.array(n_gt, pa.int64()),
                "pos_gt": pa.array(pos_gt, pa.int64()),
                "gini_num": pa.array(num, pa.int64()),
                "gini_den": pa.array(den, pa.int64()),
            }
        )

    return partials.groupby(feature_col).map_groups(
        _thresholds, batch_format="pyarrow"
    )
