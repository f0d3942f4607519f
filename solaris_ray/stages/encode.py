"""Supervised feature-prep operators — target encoding, calibration.

``target_encode``: smoothed mean-target encoding of a categorical
column (the classic high-cardinality categorical treatment for tabular
training data).  ``enc = (pos + m * global_mean) / (cnt + m)`` with
additive-smoothing strength ``m`` — rare categories shrink toward the
global rate instead of memorizing noise.

``reliability_bins``: calibration-curve (reliability diagram) counts
for a probabilistic scorer — bin predictions by score decile, emit per
bin the exact integer (n, positives, score mass).  The downstream ECE /
Brier decomposition is a driver-side O(bins) formula.

Scale plan, both: per-batch integer partials (categories/bins × 3
int64 cells per batch — pre-combined), one tiny groupby, global
moments derived FROM the per-category table (no second pass over the
data), broadcast into the final O(categories) map.  Floats appear only
in the last expression, evaluated identically by the SQL twin on
identical integer operands, rounded 6 dp at the sync point (the repo's
k-means float-parity recipe).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def target_encode(ds, cat_col: str, target_col: str, m: float = 20.0):
    """-> (cat, cnt, pos, enc6) per category.

    ``target_col`` must be integer-valued 0/1 (binarize upstream so
    the distributed sums stay exact).
    """
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        cats = batch[cat_col].to_numpy(zero_copy_only=False)
        tgt = batch[target_col].to_numpy().astype(np.int64)
        uniq, inv = np.unique(cats, return_inverse=True)
        return pa.table({
            "cat": pa.array(uniq.tolist(), pa.string()),
            "cnt": np.bincount(inv).astype(np.int64),
            "pos": np.bincount(inv, weights=tgt).astype(np.int64),
        })

    # materialize the small per-category table: it fans out to the
    # global-moment aggregate AND the final map (NOTES.md fan-out rule)
    per_cat = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("cat")
        .aggregate(Sum("cnt"), Sum("pos"))
        .materialize()
    )
    totals = per_cat.aggregate(Sum("sum(cnt)"), Sum("sum(pos)"))
    g_cnt = int(totals["sum(sum(cnt))"])
    g_pos = int(totals["sum(sum(pos))"])
    g_mean = g_pos / g_cnt  # identical float expression SQL-side

    def _final(b: pa.Table) -> pa.Table:
        cnt = pc.cast(b["sum(cnt)"], pa.int64()).to_numpy()
        pos = pc.cast(b["sum(pos)"], pa.int64()).to_numpy()
        enc = np.round((pos + m * g_mean) / (cnt + m), 6)
        return pa.table({
            "cat": b["cat"],
            "cnt": pa.array(cnt, pa.int64()),
            "pos": pa.array(pos, pa.int64()),
            "enc6": pa.array(enc, pa.float64()),
        })

    return per_cat.map_batches(_final, batch_format="pyarrow")


def score_micro(keys: list[str], salt: str = "cal") -> np.ndarray:
    """Deterministic pseudo-model score in exact micro-probability
    units: md5(salt || key) low 8 bytes little-endian mod 1e6 — the
    repo's md5-low-8-LE idiom (stages/split.py), SQL-reproducible via
    the hex-expansion macro."""
    return np.fromiter(
        (
            int.from_bytes(
                hashlib.md5((salt + k).encode("utf-8")).digest()[:8], "little"
            ) % 1_000_000
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def reliability_bins(ds, key_col: str, label_col: str, n_bins: int = 10,
                     salt: str = "cal"):
    """-> (bin, n, pos, score_sum) — exact integer reliability-diagram
    counts with the deterministic micro-unit scorer."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        keys = pc.cast(batch[key_col], pa.string()).to_pylist()
        s = score_micro(keys, salt)
        lab = batch[label_col].to_numpy().astype(np.int64)
        b = s * n_bins // 1_000_000
        t = pa.table({
            "bin": pa.array(b, pa.int64()),
            "n": pa.array(np.ones_like(b), pa.int64()),
            "pos": pa.array(lab, pa.int64()),
            "score_sum": pa.array(s, pa.int64()),
        }).group_by("bin").aggregate([
            ("n", "sum"), ("pos", "sum"), ("score_sum", "sum")
        ])
        # rename BY NAME: the key column's position in group_by output
        # is pyarrow-version-dependent (keys-first on 16.x, keys-last
        # on older releases); positional rename would silently swap
        # bin and count columns on a version change
        return pa.table({
            "bin": t["bin"],
            "n": t["n_sum"],
            "pos": t["pos_sum"],
            "score_sum": t["score_sum_sum"],
        })

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=8192)
        .groupby("bin")
        .aggregate(Sum("n"), Sum("pos"), Sum("score_sum"))
    )
    return agg.map_batches(
        lambda b: pa.table({
            "bin": pc.cast(b["bin"], pa.int64()),
            "n": pc.cast(b["sum(n)"], pa.int64()),
            "pos": pc.cast(b["sum(pos)"], pa.int64()),
            "score_sum": pc.cast(b["sum(score_sum)"], pa.int64()),
        }),
        batch_format="pyarrow",
    )
