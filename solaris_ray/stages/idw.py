"""Inverse-distance-weighted (IDW) spatial interpolation.

The classic Shepard (1968) surface estimator — the raster twin of the
reference's vector joins: predict a value at query locations from
nearby observations, weight 1/d².  Solaris users run exactly this to
densify sparse ground-truth layers before mask generation
(`/root/reference/solaris/vector/` has the geometry plumbing but no
estimator).

Determinism recipe: integer micro-unit weights.  With integer
coordinates, d² is exact int64 and the weight is the INTEGER
``w = 10^9 // max(d², 1)`` — so the weighted sums Σw·v and Σw are
order-free int64 arithmetic and the estimate ``Σw·v // Σw`` is
hash-identical to a SQL twin.  (The d²=0 clamp makes a coincident
observation simply the heaviest vote rather than a division fault —
document-level convention shared with the oracle.)

Scale shape: the QUERY side is broadcast (a lookup-table-sized set of
target locations — a prediction grid tile, ``ray.put`` once), the
OBSERVATION side streams.  One vectorized ``map_batches`` computes
per-batch partial (qid, cnt, wsum, num) rows — the observations never
shuffle; only q-row partials meet in one tiny groupby.  For query sets
too large to broadcast, tile the grid and run per-tile (the pyramid
stage's decomposition); each tile is this same operator.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ray.data.aggregate import Sum

W_SCALE = 10**9


def idw_interpolate(
    obs,
    query_xy: np.ndarray,
    radius: float,
    x_col: str = "x",
    y_col: str = "y",
    v_col: str = "v",
):
    """``obs`` dataset of integer-coordinate points + values, a small
    (nq, 2) query-location array -> (qid, n_obs, wsum, est): the IDW
    estimate from all observations within ``radius``.  Queries with no
    observation in range are absent from the output."""
    q = np.asarray(query_xy, np.int64)
    nq = q.shape[0]
    r2 = int(radius) * int(radius)
    out_schema = pa.schema(
        [("qid", pa.int64()), ("cnt", pa.int64()),
         ("wsum", pa.int64()), ("num", pa.int64())]
    )

    # queries sorted by x: each observation's in-radius queries lie in
    # one contiguous x-band of this order, found by two searchsorteds —
    # candidate volume drops from nq per obs to the band occupancy
    # (dense-matrix d2 was the 13 s in the round-4o bench)
    qorder = np.argsort(q[:, 0], kind="stable")
    qx_s = q[qorder, 0]
    qy_s = q[qorder, 1]
    rad = int(radius)

    def _partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch[v_col].to_numpy(zero_copy_only=False).astype(np.int64)
        n = x.size
        lo = np.searchsorted(qx_s, x - rad, side="left")
        hi = np.searchsorted(qx_s, x + rad, side="right")
        cnt_band = (hi - lo).astype(np.int64)
        tot = int(cnt_band.sum())
        if tot == 0:
            return out_schema.empty_table()
        oi = np.repeat(np.arange(n, dtype=np.int64), cnt_band)
        flat = (
            np.arange(tot, dtype=np.int64)
            - np.repeat(np.cumsum(cnt_band) - cnt_band, cnt_band)
            + np.repeat(lo, cnt_band)
        )
        dx = qx_s[flat] - x[oi]
        dy = qy_s[flat] - y[oi]
        d2 = dx * dx + dy * dy
        keep2 = d2 <= r2
        qi = qorder[flat[keep2]]
        oi = oi[keep2]
        w = W_SCALE // np.maximum(d2[keep2], 1)
        cnt = np.bincount(qi, minlength=nq).astype(np.int64)
        wsum = np.zeros(nq, np.int64)
        np.add.at(wsum, qi, w)
        num = np.zeros(nq, np.int64)
        np.add.at(num, qi, w * v[oi])
        keep = cnt > 0
        return pa.table(
            {
                "qid": pa.array(np.arange(nq, dtype=np.int64)[keep]),
                "cnt": pa.array(cnt[keep]),
                "wsum": pa.array(wsum[keep]),
                "num": pa.array(num[keep]),
            }
        )

    agg = (
        obs.map_batches(_partial, batch_format="pyarrow")
        .groupby("qid")
        .aggregate(Sum("cnt"), Sum("wsum"), Sum("num"))
    )

    def _final(batch: pa.Table) -> pa.Table:
        wsum = batch["sum(wsum)"].to_numpy(zero_copy_only=False).astype(np.int64)
        num = batch["sum(num)"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "qid": batch["qid"],
                "n_obs": pa.array(
                    batch["sum(cnt)"].to_numpy(zero_copy_only=False).astype(np.int64)
                ),
                "wsum": pa.array(wsum),
                "est": pa.array(num // wsum, pa.int64()),
            }
        )

    return agg.map_batches(_final, batch_format="pyarrow")
