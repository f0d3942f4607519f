"""Hierarchical spatial cell index (H3/S2 analogue, pure arithmetic).

The reference has no distributed partitioner (it is single-process);
the Ray build needs a spatial partition key to co-shuffle tiles with
vector features (SURVEY.md §4).  With no ``h3``/``s2sphere`` wheel in
the environment we implement a planar quadtree keyed scheme — the same
role H3 plays in the north_star design: a deterministic uint64 cell id
per (x, y, resolution), bbox covering, parent/child navigation, and
k-ring neighbors for kNN ring expansion.

Packing (uint64):  ``(res << 58) | (ix << 29) | iy`` with
``0 <= res <= 28`` and ``ix, iy < 2**29``.

World frame: planar CRS coordinates (UTM-style meters).  The world is
the square ``[ORIGIN, ORIGIN + WORLD_SIZE)``; cell edge at resolution
``r`` is ``WORLD_SIZE / 2**r`` — a power of two, so integer-coordinate
points hash identically in any engine (exact float arithmetic).
"""

from __future__ import annotations

import numpy as np

ORIGIN = -(2.0**23)          # meters; covers negative UTM-ish coords
WORLD_SIZE = 2.0**24         # ~16.7k km square world
MAX_RES = 28

_RES_SHIFT = np.uint64(58)
_IX_SHIFT = np.uint64(29)
_IY_MASK = np.uint64((1 << 29) - 1)


def cell_edge(res: int) -> float:
    """Cell edge length in world units at resolution ``res``."""
    return WORLD_SIZE / (1 << res)


def cell_of_point(xs: np.ndarray, ys: np.ndarray, res: int) -> np.ndarray:
    """Vectorized point -> cell id (uint64).

    Analogue of ``h3.latlng_to_cell`` in the north_star design; used to
    assign tiles (by center) and features (by bbox cover) to shuffle
    partitions.
    """
    edge = cell_edge(res)
    ix = np.floor((np.asarray(xs, dtype=np.float64) - ORIGIN) / edge).astype(np.uint64)
    iy = np.floor((np.asarray(ys, dtype=np.float64) - ORIGIN) / edge).astype(np.uint64)
    return (np.uint64(res) << _RES_SHIFT) | (ix << _IX_SHIFT) | iy


def cell_decode(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """cell ids -> (res, ix, iy) arrays."""
    cells = np.asarray(cells, dtype=np.uint64)
    res = (cells >> _RES_SHIFT).astype(np.int64)
    ix = ((cells >> _IX_SHIFT) & _IY_MASK).astype(np.int64)
    iy = (cells & _IY_MASK).astype(np.int64)
    return res, ix, iy


def cell_bounds(cells: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """cell ids -> (x0, y0, x1, y1) arrays in world units."""
    res, ix, iy = cell_decode(cells)
    edge = WORLD_SIZE / np.power(2.0, res)
    x0 = ORIGIN + ix * edge
    y0 = ORIGIN + iy * edge
    return x0, y0, x0 + edge, y0 + edge


def cover_bbox(minx, miny, maxx, maxy, res: int) -> np.ndarray:
    """All cells at ``res`` intersecting one bbox (scalar in, array out).

    This is the feature-replication step of the cell-partitioned
    spatial join (SURVEY.md §2.4): a feature is shipped to every cell
    its bbox touches, so the per-cell join is local.
    """
    edge = cell_edge(res)
    ix0 = int(np.floor((minx - ORIGIN) / edge))
    iy0 = int(np.floor((miny - ORIGIN) / edge))
    # right/top edges exclusive: a bbox touching a cell boundary only
    # belongs to the lower cell (half-open convention, matches tiling)
    ix1 = int(np.floor((maxx - ORIGIN) / edge - 1e-12))
    iy1 = int(np.floor((maxy - ORIGIN) / edge - 1e-12))
    ix1 = max(ix1, ix0)
    iy1 = max(iy1, iy0)
    ixs, iys = np.meshgrid(
        np.arange(ix0, ix1 + 1, dtype=np.uint64),
        np.arange(iy0, iy1 + 1, dtype=np.uint64),
        indexing="ij",
    )
    return (np.uint64(res) << _RES_SHIFT) | (ixs.ravel() << _IX_SHIFT) | iys.ravel()


def cover_bboxes(minx, miny, maxx, maxy, res: int) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized bbox covering for arrays of boxes.

    Returns (row_index, cell_id) pairs — the explode needed to
    replicate each feature to every covered cell.  Duplication factor
    = len(out) / len(minx); callers should log it (SURVEY.md §7.4).
    """
    edge = cell_edge(res)
    minx = np.asarray(minx, dtype=np.float64)
    if len(minx) == 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    miny = np.asarray(miny, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    ix0 = np.floor((minx - ORIGIN) / edge).astype(np.int64)
    iy0 = np.floor((miny - ORIGIN) / edge).astype(np.int64)
    ix1 = np.maximum(np.floor((maxx - ORIGIN) / edge - 1e-12).astype(np.int64), ix0)
    iy1 = np.maximum(np.floor((maxy - ORIGIN) / edge - 1e-12).astype(np.int64), iy0)
    nx = ix1 - ix0 + 1
    ny = iy1 - iy0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(minx), dtype=np.int64), counts)
    # local offset within each box's cell block
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_rep = np.repeat(ny, counts)
    dx = local // ny_rep
    dy = local % ny_rep
    ix = (np.repeat(ix0, counts) + dx).astype(np.uint64)
    iy = (np.repeat(iy0, counts) + dy).astype(np.uint64)
    cells = (np.uint64(res) << _RES_SHIFT) | (ix << _IX_SHIFT) | iy
    return row_idx, cells


def cell_parent(cells: np.ndarray, parent_res: int) -> np.ndarray:
    """Coarsen cell ids to a parent resolution (H3 ``cell_to_parent``)."""
    res, ix, iy = cell_decode(cells)
    shift = res - parent_res
    if np.any(shift < 0):
        raise ValueError("parent_res must be <= cell res")
    ix = (ix >> shift).astype(np.uint64)
    iy = (iy >> shift).astype(np.uint64)
    return (np.uint64(parent_res) << _RES_SHIFT) | (ix << _IX_SHIFT) | iy


def cell_children(cell: int) -> np.ndarray:
    """The 4 children of one cell (H3 ``cell_to_children``); used to
    split hot cells one level finer when salting (skew handling)."""
    res, ix, iy = cell_decode(np.asarray([cell], dtype=np.uint64))
    r, x, y = int(res[0]) + 1, int(ix[0]) << 1, int(iy[0]) << 1
    kids = [(x + dx, y + dy) for dx in (0, 1) for dy in (0, 1)]
    return np.asarray(
        [(r << 58) | (cx << 29) | cy for cx, cy in kids], dtype=np.uint64
    )


def neighbors(cell: int, k: int = 1) -> np.ndarray:
    """k-ring of cells around ``cell`` (including it) — H3 ``grid_disk``.

    Used by the kNN join's ring-expansion search (SURVEY.md §2.4:
    "neighbor cells via H3 grid_disk ring expansion").
    """
    res, ix, iy = cell_decode(np.asarray([cell], dtype=np.uint64))
    r, x, y = int(res[0]), int(ix[0]), int(iy[0])
    n = 1 << 29
    out = []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            cx, cy = x + dx, y + dy
            if 0 <= cx < n and 0 <= cy < n:
                out.append((r << 58) | (cx << 29) | cy)
    return np.asarray(out, dtype=np.uint64)


def choose_res(minx: float, miny: float, maxx: float, maxy: float,
               n: int, target_per_cell: int = 64) -> int:
    """Pick a resolution so the data bbox splits into ~n/target cells.

    A fixed resolution is a density bug: 15k features in a 3 km box at
    res 13 (2 km cells) all land in ~4 buckets and index lookups
    degenerate to linear scans (measured 87x slowdown on the kNN
    join).  H3 users tune `res` the same way; this automates it from
    the layer's bbox + count.
    """
    extent = max(maxx - minx, maxy - miny, 1e-9)
    cells_needed = max(1.0, n / max(1, target_per_cell))
    edge = extent / np.sqrt(cells_needed)
    res = int(np.floor(np.log2(WORLD_SIZE / max(edge, 1e-9))))
    return int(np.clip(res, 0, MAX_RES))
