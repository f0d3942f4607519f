"""Segment-intersection join — proper crossings between two line sets.

The line×line sibling of the engine's polygon-clip / PIP / kNN spatial
joins (reference road networks, /root/reference/solaris/vector/graph.py,
are exactly such segment sets): report every pair (a, b) whose open
segments properly cross.  "Proper" means all four orientation tests
are strictly nonzero — touching endpoints and collinear overlaps are
excluded, which keeps the predicate pure integer sign arithmetic that
a SQL twin states verbatim.

Scale plan: the dbscan/ripley cell recipe.  Each segment replicates to
every grid cell its bbox overlaps (bounded by ``max_span`` cells); the
pair test runs inside a ``groupby(cell)`` co-shuffle, vectorized over
the candidate matrix after a bbox prefilter.  Exactly-once emission:
the crossing POINT lies in exactly one cell (half-open boxes), and
only that owner cell reports the pair — the point is rational
(num/den), so ownership is four cross-multiplied int64 comparisons,
no floats anywhere.

Coordinate budget: |x|,|y| ≤ 2^20 keeps every orientation determinant
inside int64 (|o| ≤ 2^43).  The ownership cross-products can exceed
int64 at this budget (den ≤ 2^43, so db·s_num ≤ 2^64), so they are
evaluated in exact Python-int (object-dtype) arithmetic — only the few
candidates that already passed the bbox + orientation filters reach
that path, so the cost is negligible.  Cell keys are packed with a
positive bias so the pack/decode round-trips for negative cells too.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_COORD_LIMIT = 1 << 20
_KEY_SHIFT = 1 << 22  # packed-key stride; biased cells stay well below it

_SEG_COLS = ("seg_id", "x0", "y0", "x1", "y1")


def _cell_bias(cell: int) -> int:
    """Bias making every cell index non-negative before packing, so the
    floor-div/mod decode is a true inverse for signed cells (negative
    coordinates previously decoded to a far-away box and dropped proper
    crossings at y<0)."""
    return _COORD_LIMIT // cell + 2


def _check(arr: np.ndarray) -> np.ndarray:
    a = arr.astype(np.int64)
    if a.size and (np.abs(a).max() > _COORD_LIMIT):
        raise ValueError(f"segment coords must be within ±{_COORD_LIMIT}")
    return a


def _cells_for(batch: pa.Table, side: int, cell: int, max_span: int) -> pa.Table:
    cols = {c: _check(batch[c].to_numpy()) for c in _SEG_COLS}
    xlo = np.minimum(cols["x0"], cols["x1"]) // cell
    xhi = np.maximum(cols["x0"], cols["x1"]) // cell
    ylo = np.minimum(cols["y0"], cols["y1"]) // cell
    yhi = np.maximum(cols["y0"], cols["y1"]) // cell
    span = (xhi - xlo + 1) * (yhi - ylo + 1)
    if span.size and span.max() > max_span:
        raise ValueError(
            f"segment bbox spans {int(span.max())} cells > max_span="
            f"{max_span}; raise cell size")
    reps = span.astype(np.int64)
    idx = np.repeat(np.arange(reps.size), reps)
    # per-replica local ordinal -> (cx, cy) within the bbox rectangle
    local = np.arange(idx.size) - np.repeat(
        np.concatenate(([0], np.cumsum(reps)[:-1])), reps)
    w = (xhi - xlo + 1)[idx]
    cx = xlo[idx] + local % w
    cy = ylo[idx] + local // w
    off = _cell_bias(cell)
    out = {
        "cell": pa.array((cx + off) * _KEY_SHIFT + (cy + off), pa.int64()),
        "side": pa.array(np.full(idx.size, side, np.int64), pa.int64()),
    }
    for c in _SEG_COLS:
        out[c] = pa.array(cols[c][idx], pa.int64())
    return pa.table(out)


def _cross_pairs(group: pa.Table, cell: int) -> pa.Table:
    side = group["side"].to_numpy()
    A = {c: group[c].to_numpy()[side == 0] for c in _SEG_COLS}
    B = {c: group[c].to_numpy()[side == 1] for c in _SEG_COLS}
    na, nb = A["seg_id"].size, B["seg_id"].size
    empty = pa.schema([("a_id", pa.int64()), ("b_id", pa.int64())]).empty_table()
    if na == 0 or nb == 0:
        return empty
    # bbox prefilter over the candidate matrix
    axlo = np.minimum(A["x0"], A["x1"])[:, None]
    axhi = np.maximum(A["x0"], A["x1"])[:, None]
    aylo = np.minimum(A["y0"], A["y1"])[:, None]
    ayhi = np.maximum(A["y0"], A["y1"])[:, None]
    bxlo = np.minimum(B["x0"], B["x1"])[None, :]
    bxhi = np.maximum(B["x0"], B["x1"])[None, :]
    bylo = np.minimum(B["y0"], B["y1"])[None, :]
    byhi = np.maximum(B["y0"], B["y1"])[None, :]
    cand = (axlo <= bxhi) & (bxlo <= axhi) & (aylo <= byhi) & (bylo <= ayhi)
    ai, bi = np.nonzero(cand)
    if ai.size == 0:
        return empty

    ax0, ay0 = A["x0"][ai], A["y0"][ai]
    ax1, ay1 = A["x1"][ai], A["y1"][ai]
    bx0, by0 = B["x0"][bi], B["y0"][bi]
    bx1, by1 = B["x1"][bi], B["y1"][bi]
    dax, day = ax1 - ax0, ay1 - ay0
    dbx, dby = bx1 - bx0, by1 - by0
    o1 = dax * (by0 - ay0) - day * (bx0 - ax0)
    o2 = dax * (by1 - ay0) - day * (bx1 - ax0)
    o3 = dbx * (ay0 - by0) - dby * (ax0 - bx0)
    o4 = dbx * (ay1 - by0) - dby * (ax1 - bx0)
    proper = ((o1 > 0) != (o2 > 0)) & ((o3 > 0) != (o4 > 0)) \
        & (o1 != 0) & (o2 != 0) & (o3 != 0) & (o4 != 0)
    if not proper.any():
        return empty
    keep = np.flatnonzero(proper)
    ai, bi = ai[keep], bi[keep]
    o1 = o1[keep]
    dax, day = dax[keep], day[keep]
    ax0, ay0 = ax0[keep], ay0[keep]
    bx0, by0 = bx0[keep], by0[keep]
    dbx, dby = dbx[keep], dby[keep]
    # crossing point p = b0 + s·db: cross(da, b0−a0) + s·cross(da, db)
    # = 0 ⇒ s = −o1/den with den = cross(da, db).  Evaluated in exact
    # Python-int arithmetic: db·s_num can reach ~2^64 at the ±2^20
    # coordinate budget, past int64; only the few filtered survivors
    # pay the object-dtype cost.
    den = dax.astype(object) * dby - day.astype(object) * dbx
    s_num = -o1.astype(object)
    flip = den < 0
    den = np.where(flip, -den, den)
    s_num = np.where(flip, -s_num, s_num)
    px_num = bx0 * den + dbx * s_num  # point x = px_num / den
    py_num = by0 * den + dby * s_num
    # owner cell: cx = floor(px / cell) etc., via half-open bounds;
    # decode subtracts the pack bias so negative cells round-trip
    cells = group["cell"].to_numpy()[side == 0][ai]
    off = _cell_bias(cell)
    cx = (cells // _KEY_SHIFT - off).astype(object)
    cy = (cells % _KEY_SHIFT - off).astype(object)
    own = (
        (px_num >= cx * cell * den) & (px_num < (cx + 1) * cell * den)
        & (py_num >= cy * cell * den) & (py_num < (cy + 1) * cell * den)
    ).astype(bool)
    return pa.table({
        "a_id": pa.array(A["seg_id"][ai[own]], pa.int64()),
        "b_id": pa.array(B["seg_id"][bi[own]], pa.int64()),
    })


def segment_intersections(a, b, cell: int = 256, max_span: int = 64):
    """Datasets of (seg_id, x0, y0, x1, y1) int rows -> (a_id, b_id)
    pairs whose open segments properly cross, exactly once each."""
    tagged = a.map_batches(
        lambda t: _cells_for(t, 0, cell, max_span),
        batch_format="pyarrow", batch_size=16384,
    ).union(b.map_batches(
        lambda t: _cells_for(t, 1, cell, max_span),
        batch_format="pyarrow", batch_size=16384,
    ))
    return tagged.groupby("cell").map_groups(
        lambda g: _cross_pairs(g, cell), batch_format="pyarrow",
    )
