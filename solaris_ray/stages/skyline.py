"""Distributed 2-D skyline (Pareto frontier) — maximize one column,
minimize the other.

Multi-objective selection is a first-class curation primitive at
100 TB: "keep the documents on the quality/length frontier", "the
images on the resolution/blur frontier".  The geospatial reference
has the same shape in proposal thinning (best score per footprint
size; `/root/reference/solaris/eval/base.py` keeps max-IoU matches).

Scale design: the skyline of a union is a subset of the union of
per-block skylines, so ONE streaming ``map_batches`` pass reduces
every block to its local frontier (vectorized sort + running-min —
no pairwise dominance tests), and a single final task merges the
tiny survivors with the same kernel.  The input never shuffles and
nothing larger than the per-block frontiers is ever held anywhere.

Dominance is non-strict with a strictness escape (the standard
definition): row r is dominated iff some u has u.a >= r.a and
u.b <= r.b with at least one strict.  Exact ties (a, b) equal are
mutually non-dominating, so ALL duplicate frontier rows are kept —
the kernel runs on distinct (a, b) pairs and re-emits every carrier
row, which keeps output deterministic and hash-exact vs a SQL
``NOT EXISTS`` twin.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _frontier_mask(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Boolean mask of skyline rows (maximize a, minimize b), exact
    ties all kept.  O(n log n), fully vectorized."""
    if a.size == 0:
        return np.zeros(0, bool)
    # sort rows by a desc, b asc (duplicates adjacent — no axis-0
    # unique, which is slow); a DISTINCT pair is on the frontier iff
    # its b is strictly below every earlier (higher-a) distinct b,
    # and every duplicate of a frontier pair is kept
    order = np.lexsort((b, -a))
    sa, sb = a[order], b[order]
    first = np.ones(sa.size, bool)
    first[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
    db = sb[first]
    keep_d = np.ones(db.size, bool)
    if db.size > 1:
        keep_d[1:] = db[1:] < np.minimum.accumulate(db)[:-1]
    keep_sorted = keep_d[np.cumsum(first) - 1]
    mask = np.empty(sa.size, bool)
    mask[order] = keep_sorted
    return mask


def skyline(ds, max_col: str, min_col: str):
    """Dataset -> its Pareto-frontier rows (all columns carried
    through).  ``max_col`` is maximized, ``min_col`` minimized; both
    must be numeric.  Output row set is deterministic (a set — order
    up to the caller's sort)."""

    def _local(batch: pa.Table) -> pa.Table:
        a = batch[max_col].to_numpy(zero_copy_only=False)
        b = batch[min_col].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_frontier_mask(a, b)))

    partial = ds.map_batches(_local, batch_format="pyarrow").materialize()

    import ray
    import ray.data

    @ray.remote
    def _merge(*blocks):
        nonempty = [blk for blk in blocks if blk.num_rows]
        if not nonempty:
            return blocks[0] if blocks else pa.table({})
        t = pa.concat_tables(nonempty, promote_options="default")
        a = t[max_col].to_numpy(zero_copy_only=False)
        b = t[min_col].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(_frontier_mask(a, b)))

    ref = _merge.remote(*partial.to_arrow_refs())
    return ray.data.from_arrow_refs([ref])
