"""Clark-Evans nearest-neighbour index (point-pattern dispersion).

The classic field statistic for "is this point set clumped, random,
or dispersed?" (Clark & Evans 1954): ``R = mean_nn / E[nn]`` with
``E[nn] = 0.5 / sqrt(density)``.  R << 1 means clumped (e.g. the
duplicate-heavy lattices this engine's dedup ladder exists for),
R ~= 1 Poisson-random, R -> ~2.15 perfectly dispersed.

Rides the existing both-sides-large kNN machinery
(knn.cell_partitioned_knn_join, halo replication + straggler brute
pass): k=2 per query point guarantees at least one non-self
neighbour even under exact-coordinate duplicates, a per-point min
over the non-self rows gives the NN distance, and only (count, sum
of sqrt) scalars reach the driver.  Float discipline: identical
division/sqrt expression on both engine and oracle sides, 6-dp
round (sum error ~1e-12 against the 1e-6 grid).
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import knn


def clark_evans(
    queries,
    features,
    area: float,
    cell_res: int = 16,
    id_col: str = "point_id",
):
    """queries: (point_id, x, y); features: (feature_id, cx, cy) — the
    full point set, superset of queries.  ``area``: the observation
    window size the density is measured against.
    -> one row (n_q, n_feat, mean_nn6, r6)."""
    import ray

    if area <= 0:
        raise ValueError("area must be > 0")
    n_feat = features.count()
    if n_feat < 2:
        raise ValueError("need >= 2 features for a nearest neighbour")

    out = knn.cell_partitioned_knn_join(
        queries, features, k=2, cell_res=cell_res, id_col=id_col
    )

    def _nn_partial(batch: pa.Table) -> pa.Table:
        t = batch.filter(
            pc.not_equal(batch[id_col], batch["feature_id"])
        )
        pid = t[id_col].to_numpy(zero_copy_only=False)
        d2 = t["d2"].to_numpy(zero_copy_only=False)
        order = np.argsort(pid, kind="stable")
        pid, d2 = pid[order], d2[order]
        starts = np.flatnonzero(np.r_[True, pid[1:] != pid[:-1]])
        mins = np.minimum.reduceat(d2, starts) if pid.size else d2
        return pa.table(
            {
                "pid": pa.array(pid[starts], pa.int64()),
                "d2min": pa.array(mins, pa.float64()),
            }
        )

    # one row per query point leaves the kNN stage's own combine; the
    # groupby collapses block-split points exactly
    per_point = (
        out.map_batches(_nn_partial, batch_format="pyarrow")
        .groupby("pid")
        .min("d2min")
    )

    sums = per_point.map_batches(
        lambda b: pa.table(
            {
                "n": pa.array([b.num_rows], pa.int64()),
                "s": pa.array(
                    [float(np.sqrt(b["min(d2min)"].to_numpy()).sum())],
                    pa.float64(),
                ),
            }
        ),
        batch_format="pyarrow",
    ).sum(["n", "s"]) or {}
    n_q = int(sums.get("sum(n)") or 0)
    s = float(sums.get("sum(s)") or 0.0)

    if n_q == 0:
        mean_nn = 0.0
        r = 0.0
    else:
        mean_nn = s / n_q
        expected = 0.5 / math.sqrt(n_feat / area)
        r = mean_nn / expected

    return ray.data.from_arrow(
        pa.table(
            {
                "n_q": pa.array([n_q], pa.int64()),
                "n_feat": pa.array([int(n_feat)], pa.int64()),
                "mean_nn6": pa.array([round(mean_nn, 6)], pa.float64()),
                "r6": pa.array([round(r, 6)], pa.float64()),
            }
        )
    )
