"""Deterministic train/val/test splitting for training-data pipelines.

``hash_split`` buckets each row by a salted MD5 of its key column —
the split is a pure function of (key, salt), so it is stable across
runs, machines, partitionings and dataset growth (a new document never
moves an old one between splits).  Fully vectorizable per batch: no
shuffle, no state, no driver participation — the cheapest possible
operator at 100 TB.

Bucket = md5(salt || key) low 8 bytes little-endian, mod 100 — the
same md5-low-8-LE idiom the MinHash shingle hash uses
(solaris_ray/stages/dedup.py:94), so the DuckDB oracle recomputes it
with the established hex-digit SQL expansion.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _bucket_of(keys: list[str], salt: str) -> np.ndarray:
    return np.fromiter(
        (
            int.from_bytes(hashlib.md5((salt + k).encode("utf-8")).digest()[:8], "little") % 100
            for k in keys
        ),
        dtype=np.int64,
        count=len(keys),
    )


def split_batch(
    batch: pa.Table,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
) -> pa.Table:
    """Adds ``bucket`` (0..99) and ``split`` columns to the batch."""
    weights = weights or {"train": 0.9, "val": 0.05, "test": 0.05}
    names = list(weights)
    # cumulative integer thresholds over 100 buckets
    edges = np.cumsum([int(round(100 * weights[n])) for n in names])
    edges[-1] = 100
    keys = pc.cast(batch[key_col], pa.string()).to_pylist()
    b = _bucket_of(keys, salt)
    idx = np.searchsorted(edges, b, side="right")
    labels = np.asarray(names, dtype=object)[idx]
    return batch.append_column("bucket", pa.array(b, pa.int64())).append_column(
        "split", pa.array(labels.tolist(), pa.string())
    )


def hash_split(
    ds,
    key_col: str = "doc_id",
    weights: dict[str, float] | None = None,
    salt: str = "",
):
    return ds.map_batches(
        lambda t: split_batch(t, key_col, weights, salt),
        batch_format="pyarrow",
        batch_size=8192,
    )
