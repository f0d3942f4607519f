"""Training-batch layout ops — aspect-ratio bucket batching and
byte-budget shard layout.

Beyond-reference operators (the reference stops at chips/masks on
disk, e.g. solaris/nets/datagen.py:369-497 feeds a local torch
DataLoader); at 100 TB the engine must also LAY OUT the training set:

- ``aspect_bucket_batches``: the image-generation training idiom
  (variable-aspect corpora train on per-batch uniform aspect buckets):
  assign every image to the nearest aspect bucket from a fixed ladder,
  deterministically permute within each bucket (salted md5 — a pure
  function of the row, so the layout is reproducible and
  subset-stable), and pack consecutive runs of ``batch_size`` into
  training batches, dropping each bucket's ragged tail.
- ``shard_layout``: WebDataset-style sequential sharding: under a
  caller-fixed total order, each row's shard is
  ``floor(start_offset / budget_bytes)`` of its global byte offset —
  a deterministic, resume-stable map from row to shard file.

Scale shape (both ops): ONE distributed range-partitioned ``ds.sort``
(the only all-to-all), then the per-block offset idiom of
stages/rank.py / stages/graph.py — only per-block COUNTS (or byte
sums) come to the driver, one scalar per (block, bucket); blocks stay
in the object store and are re-emitted with layout columns appended.
Bucket assignment compares cross-multiplied INTEGER distances
(|w*bd - h*bn| scaled by the other bucket's h*bd), so ties and
ordering are exact — no float-log hazards between the engine and a
SQL twin.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

# (numerator, denominator) aspect ladder — portrait to landscape
DEFAULT_BUCKETS: list[tuple[int, int]] = [(1, 2), (3, 4), (1, 1), (4, 3), (2, 1)]


def assign_aspect_bucket(w: np.ndarray, h: np.ndarray,
                         buckets: list[tuple[int, int]]) -> np.ndarray:
    """Nearest-bucket index by |w/h - bn/bd|, compared exactly via
    cross-multiplication: dist_i < dist_j  <=>
    |w*bd_i - h*bn_i| * (h*bd_j)  <  |w*bd_j - h*bn_j| * (h*bd_i).
    First bucket wins ties (stable argmin)."""
    w = w.astype(np.int64)
    h = h.astype(np.int64)
    best = np.zeros(len(w), dtype=np.int64)
    bn0, bd0 = buckets[0]
    best_num = np.abs(w * bd0 - h * bn0)  # numerator of current best
    best_den = h * bd0                    # its denominator
    for i, (bn, bd) in enumerate(buckets[1:], start=1):
        num = np.abs(w * bd - h * bn)
        den = h * bd
        better = num * best_den < best_num * den  # strict: ties keep earlier
        best = np.where(better, i, best)
        best_num = np.where(better, num, best_num)
        best_den = np.where(better, den, best_den)
    return best


def aspect_bucket_batches(
    images,
    batch_size: int,
    buckets: list[tuple[int, int]] | None = None,
    salt: str = "aspect",
    id_col: str = "image_id",
    w_col: str = "w",
    h_col: str = "h",
    drop_ragged: bool = True,
):
    """-> rows (id, w, h, bucket_id, batch_idx, slot), one per image
    that lands in a FULL batch (ragged per-bucket tails dropped when
    ``drop_ragged``).  Deterministic at any parallelism: the in-bucket
    order is (md5(salt || id), id)."""
    import ray

    buckets = buckets if buckets is not None else DEFAULT_BUCKETS

    def _assign(batch: pa.Table) -> pa.Table:
        w = batch[w_col].to_numpy(zero_copy_only=False)
        h = batch[h_col].to_numpy(zero_copy_only=False)
        ids = batch[id_col].to_pylist()
        hexr = [hashlib.md5((salt + str(k)).encode("utf-8")).hexdigest() for k in ids]
        return pa.table(
            {
                id_col: batch[id_col],
                w_col: pa.array(w.astype(np.int64), pa.int64()),
                h_col: pa.array(h.astype(np.int64), pa.int64()),
                "bucket_id": pa.array(assign_aspect_bucket(w, h, buckets), pa.int64()),
                "hex_rank": pa.array(hexr, pa.string()),
            }
        )

    tagged = images.map_batches(_assign, batch_format="pyarrow")
    ordered = tagged.sort(["bucket_id", "hex_rank", id_col]).materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def _hist(block: pa.Table):
        b = block["bucket_id"].to_numpy(zero_copy_only=False)
        vals, counts = np.unique(b, return_counts=True)
        return list(zip(vals.tolist(), counts.tolist()))

    hists = ray.get([_hist.remote(r) for r in refs])
    totals: dict[int, int] = {}
    # per-block start offset within each bucket (blocks are in sorted
    # order, buckets are contiguous runs across the block sequence)
    block_starts: list[dict[int, int]] = []
    for hist in hists:
        starts = {}
        for bucket, cnt in hist:
            starts[bucket] = totals.get(bucket, 0)
            totals[bucket] = starts[bucket] + cnt
        block_starts.append(starts)
    n_batches = {b: t // batch_size for b, t in totals.items()}

    @ray.remote
    def _layout(block: pa.Table, starts: dict, keep_batches: dict) -> pa.Table:
        b = block["bucket_id"].to_numpy(zero_copy_only=False)
        rank = np.empty(len(b), dtype=np.int64)
        # contiguous runs per bucket inside the sorted block
        change = np.nonzero(np.diff(b))[0] + 1
        bounds = np.concatenate(([0], change, [len(b)]))
        for lo, hi in zip(bounds[:-1], bounds[1:]):
            if lo == hi:
                continue
            rank[lo:hi] = starts.get(int(b[lo]), 0) + np.arange(hi - lo)
        batch_idx = rank // batch_size
        out = block.drop_columns(["hex_rank"]).append_column(
            "batch_idx", pa.array(batch_idx, pa.int64())
        ).append_column("slot", pa.array(rank % batch_size, pa.int64()))
        if drop_ragged:
            limit = np.asarray([keep_batches.get(int(x), 0) for x in b], dtype=np.int64)
            out = out.filter(pa.array(batch_idx < limit))
        return out

    return ray.data.from_arrow_refs(
        [_layout.remote(r, s, n_batches) for r, s in zip(refs, block_starts)]
    )


def shard_layout(
    ds,
    size_col: str,
    budget: int,
    order_cols: list[str],
    keep_cols: list[str] | None = None,
):
    """-> input rows (or ``keep_cols``) + ``shard_id`` + ``shard_off``:
    under the total order ``order_cols``, a row whose payload starts at
    global byte offset S lands in shard S // budget at offset
    S % budget.  Rows may straddle a budget boundary (the writer seals
    a shard after the row that crosses it) — the assignment is what
    must be deterministic and resume-stable."""
    import ray

    ordered = ds.sort(order_cols).materialize()
    refs = ordered.to_arrow_refs()

    @ray.remote
    def _bytes(block: pa.Table) -> int:
        return int(np.sum(block[size_col].to_numpy(zero_copy_only=False)))

    sums = ray.get([_bytes.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(sums)[:-1])) if sums else []

    @ray.remote
    def _assign(block: pa.Table, offset: int) -> pa.Table:
        sz = block[size_col].to_numpy(zero_copy_only=False).astype(np.int64)
        start = offset + np.concatenate(([0], np.cumsum(sz)[:-1]))
        out = block if keep_cols is None else block.select(keep_cols)
        return out.append_column(
            "shard_id", pa.array(start // budget, pa.int64())
        ).append_column("shard_off", pa.array(start % budget, pa.int64()))

    return ray.data.from_arrow_refs(
        [_assign.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )
