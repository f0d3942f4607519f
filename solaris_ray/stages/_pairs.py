"""Closed-form within-segment pair enumeration (the editdist/theilsen
triangle idiom, factored for new operators).

Given sorted-segment lengths ``counts`` (rows already grouped
contiguously), returns global row indices (ia, ib) for every unordered
pair inside each segment, plus the segment id per pair — fully
vectorized, no Python loop over segments or pairs.
"""

from __future__ import annotations

import numpy as np


def segment_pairs(counts: np.ndarray, starts: np.ndarray):
    """(ia, ib, segp): all i<j pairs within each segment.

    ``counts[k]`` rows starting at ``starts[k]``; output arrays have
    sum(counts*(counts-1)/2) entries.
    """
    counts = counts.astype(np.int64)
    m = counts * (counts - 1) // 2
    tot = int(m.sum())
    if tot == 0:
        z = np.zeros(0, np.int64)
        return z, z, z
    segp = np.repeat(np.arange(counts.size), m)
    r = np.arange(tot, dtype=np.int64) - np.repeat(np.cumsum(m) - m, m)
    c = counts[segp]

    def _S(i):
        return i * (c - 1) - i * (i - 1) // 2

    tri_i = np.floor(
        (2 * c - 1 - np.sqrt((2 * c - 1.0) ** 2 - 8.0 * r)) / 2
    ).astype(np.int64)
    tri_i = np.clip(tri_i, 0, c - 2)
    tri_i -= (_S(tri_i) > r).astype(np.int64)
    tri_i += (_S(tri_i + 1) <= r).astype(np.int64)
    tri_j = r - _S(tri_i) + tri_i + 1
    base = starts[segp]
    return base + tri_i, base + tri_j, segp
