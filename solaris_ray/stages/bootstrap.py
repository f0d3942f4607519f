"""Deterministic Poisson bootstrap — resampled aggregates at scale.

The online/streaming bootstrap (Poisson(1) replicate weights per row)
is how confidence intervals are estimated over data too large to
resample by permutation: each row independently contributes
``w ~ Poisson(1)`` copies to each of B replicates, and the replicate
statistics' spread estimates the sampling distribution.

Determinism: the weight is a pure function of (salt, row id,
replicate) — md5-low-8-LE mod 1e6 pushed through the integer
Poisson(1) inverse-CDF thresholds — so results are bit-stable at any
parallelism AND SQL-reproducible (the hex-expansion macro + a
VALUES threshold table).  No state, no shuffle beyond one tiny
B-row aggregate; at 100 TB the per-batch cost is B hash passes,
which a production caller trades off via B.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# cumulative Poisson(1) CDF in exact micro-units: weight = #{t <= h}
POISSON1_THRESHOLDS_MICRO = np.asarray(
    [367879, 735758, 919698, 981011, 996340, 999405, 999916, 999989, 999998],
    np.int64,
)


def _hash_micro(keys, salt: str) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5((salt + k).encode()).digest()[:8],
                           "little") % 1_000_000
            for k in keys
        ),
        dtype=np.int64, count=len(keys),
    )


def poisson_bootstrap(ds, id_col: str, val_col: str, n_reps: int = 16,
                      salt: str = "boot"):
    """-> (rep, n_eff, wsum, mean6) per replicate: Poisson-weighted
    exact integer count/sum and the replicate mean."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch[id_col], pa.string()).to_pylist()
        v = batch[val_col].to_numpy().astype(np.int64)
        reps, ns, ws = [], [], []
        for b in range(n_reps):
            h = _hash_micro([f"{k}_{b}" for k in ids], salt)
            w = np.searchsorted(POISSON1_THRESHOLDS_MICRO, h, side="right")
            reps.append(b)
            ns.append(int(w.sum()))
            ws.append(int((w * v).sum()))
        return pa.table({
            "rep": pa.array(reps, pa.int64()),
            "n_eff": pa.array(ns, pa.int64()),
            "wsum": pa.array(ws, pa.int64()),
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=16384)
        .groupby("rep").aggregate(Sum("n_eff"), Sum("wsum"))
    )

    def _finish(b: pa.Table) -> pa.Table:
        n = pc.cast(b["sum(n_eff)"], pa.int64()).to_numpy()
        w = pc.cast(b["sum(wsum)"], pa.int64()).to_numpy()
        mean = np.round(np.where(n > 0, w / np.maximum(n, 1), 0.0), 6)
        return pa.table({
            "rep": pc.cast(b["rep"], pa.int64()),
            "n_eff": pa.array(n, pa.int64()),
            "wsum": pa.array(w, pa.int64()),
            "mean6": pa.array(mean, pa.float64()),
        })

    return agg.map_batches(_finish, batch_format="pyarrow")
