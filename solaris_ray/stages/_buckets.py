"""Shared shuffle-bucket hash.

One definition of the Knuth multiplicative bucket key used by the
bucketed co-shuffle stages (triangles, pagerank, funnel, ...) so the
constant and modulo semantics cannot silently diverge between
operators.  numpy's Python-style ``%`` keeps the result non-negative
even when the int64 product wraps.
"""

from __future__ import annotations

import numpy as np


def bucket_of(x: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((x * np.int64(2654435761)) % np.int64(n_buckets)).astype(np.int64)
