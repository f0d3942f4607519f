"""ROC AUC for binary labels over integer scores — exact, distributed.

Classifier-quality gating for curation pipelines (quality-filter
thresholds, CLIP-alignment cutoffs): AUC is the Mann-Whitney U
statistic, which for integer scores reduces to EXACT integer
arithmetic over per-score count aggregates — no float ranks, no
sampling.

Shape: one partial-aggregate pass — per batch, (score, n, n_pos)
counts — then ONE small groupby(score); the distinct-score table
(bounded by the score domain, not the row count) comes to the driver,
where midranks fall out of a cumulative sum.  With ties handled by
midranks,

    2U = 2 * sum_pos(midrank) - n_pos * (n_pos + 1)

is always an integer (2 * midrank is), and AUC = U / (n_pos * n_neg).
Emitted as (n_pos, n_neg, u2, auc6): u2 = 2U exactly, auc6 the
truncated micro-unit ratio — the moran.py float-free gate recipe.

Partitioning assumption: the DISTINCT score domain fits the driver
(integer scores — logits quantized to fixed-point, percent scores,
hash buckets).  For unbounded domains pre-quantize; AUC over a
quantized score is the AUC of the quantized classifier, stated
honestly rather than hidden in float rank noise.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT = pa.schema(
    [
        ("n_pos", pa.int64()),
        ("n_neg", pa.int64()),
        ("u2", pa.int64()),
        ("auc6", pa.int64()),
    ]
)


def auc_exact(ds, score_col: str = "score", label_col: str = "label") -> pa.Table:
    """Dataset with integer ``score`` and 0/1 ``label`` -> one row
    (n_pos, n_neg, u2, auc6).  Raises if labels are one-class (AUC
    undefined)."""

    def _partial(batch: pa.Table) -> pa.Table:
        s = batch[score_col].to_numpy(zero_copy_only=False).astype(np.int64)
        y = batch[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if y.size and ((y < 0) | (y > 1)).any():
            raise ValueError("auc_exact: label must be 0/1")
        uniq, inv = np.unique(s, return_inverse=True)
        n = np.bincount(inv, minlength=uniq.size).astype(np.int64)
        npos = np.zeros(uniq.size, np.int64)
        np.add.at(npos, inv, y)
        return pa.table(
            {
                "s": pa.array(uniq, pa.int64()),
                "n": pa.array(n, pa.int64()),
                "np": pa.array(npos, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    g = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby("s")
        .aggregate(Sum("n"), Sum("np"))
        .to_pandas()
        .sort_values("s")
    )
    n = g["sum(n)"].to_numpy().astype(np.int64)
    npos = g["sum(np)"].to_numpy().astype(np.int64)
    total_pos = int(npos.sum())
    total = int(n.sum())
    total_neg = total - total_pos
    if total_pos == 0 or total_neg == 0:
        raise ValueError("auc_exact: need both classes present")
    # 1-based midrank of score-group i, doubled to stay integral:
    # 2*midrank = 2*(rows before group) + (group size + 1)
    before = np.cumsum(n) - n
    mid2 = 2 * before + n + 1
    sum_pos_rank2 = int((npos * mid2).sum())
    u2 = sum_pos_rank2 - total_pos * (total_pos + 1)
    auc6 = (u2 * 1_000_000) // (2 * total_pos * total_neg)
    return pa.table(
        {
            "n_pos": pa.array([total_pos], pa.int64()),
            "n_neg": pa.array([total_neg], pa.int64()),
            "u2": pa.array([u2], pa.int64()),
            "auc6": pa.array([auc6], pa.int64()),
        }
    )
