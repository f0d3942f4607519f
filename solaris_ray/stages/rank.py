"""Distributed global ranking / percentile normalization.

``global_rank`` assigns every row its 1-based rank under a total order
(sort columns + caller-supplied unique tiebreakers) plus the exact
percentile (rank-1)/(n-1) — the feature-normalization primitive
(score -> percentile) that otherwise tempts a driver-side sort.

Shape: one distributed ``ds.sort`` (range-partitioned shuffle), then
ordered per-block offset enumeration — the graph node-id idiom
(stages/graph.py:dedup_nodes): only per-block ROW COUNTS come to the
driver (one int per block); blocks stay in the object store and are
re-emitted zero-copy with a rank column prepended.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def global_rank(ds, sort_cols: list[str], pct: bool = True):
    """Rank all rows by ``sort_cols`` ascending (1-based, dense total
    order — include a unique key in ``sort_cols`` for determinism).

    Appends ``rank`` (int64) and, when ``pct``, ``pct_rank`` (double,
    (rank-1)/(n-1); 0.0 for a single row).
    """
    import ray

    ordered = ds.sort(sort_cols).materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def _nrows(block: pa.Table) -> int:
        return block.num_rows

    @ray.remote
    def _assign(block: pa.Table, offset: int, total: int) -> pa.Table:
        rank = offset + np.arange(1, block.num_rows + 1, dtype=np.int64)
        out = block.append_column("rank", pa.array(rank))
        if pct:
            denom = max(total - 1, 1)
            out = out.append_column(
                "pct_rank", pa.array((rank - 1) / denom, pa.float64())
            )
        return out

    counts = ray.get([_nrows.remote(r) for r in refs])
    total = int(sum(counts))
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1])) if counts else []
    return ray.data.from_arrow_refs(
        [_assign.remote(r, int(o), total) for r, o in zip(refs, offsets)]
    )
