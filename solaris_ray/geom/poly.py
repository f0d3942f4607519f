"""Packed-array polygon/linestring kernels (shapely-free).

Geometry batch representation ("packed rings"): a flat ``(N, 2)``
float64 coordinate array plus an ``offsets`` int64 array of length
``n_geoms + 1`` (Arrow list-offset convention) — ring ``i`` is
``coords[offsets[i]:offsets[i+1]]``.  Rings are closed implicitly
(last vertex need not repeat the first).

These kernels replace the reference's shapely scalar math
(.area/.length/.intersection/.intersects, solaris/eval/iou.py:4-44,
solaris/tile/vector_tile.py:227-324) with vectorized or tight-loop
numpy over whole batches.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "ring_areas",
    "ring_lengths",
    "ring_bboxes",
    "ring_centroids",
    "points_in_polygon",
    "clip_ring_to_box",
    "convex_intersection_area",
    "box_iou",
    "polygon_iou",
]


def _localize(coords: np.ndarray, offsets: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Translate each ring to its first vertex.

    Shoelace on raw UTM-magnitude coordinates (~1e6) loses ~1e-4 m²
    absolute to cancellation (cross terms ~1e12); local coordinates
    make areas/centroids exact to machine precision.
    """
    starts = offsets[:-1]
    counts = np.diff(offsets)
    if len(coords) == 0 or len(starts) == 0:
        return coords[:, 0], coords[:, 1]
    fx = np.repeat(coords[starts, 0], counts)
    fy = np.repeat(coords[starts, 1], counts)
    return coords[:, 0] - fx, coords[:, 1] - fy


def ring_areas(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """Shoelace area per ring (absolute value), vectorized over the batch.

    Replaces per-geometry ``geom.area`` loops (e.g. clip_gdf origarea,
    solaris/tile/vector_tile.py:303-306).
    """
    x, y = _localize(coords, offsets)
    # cross product of consecutive vertices, with wraparound per ring
    nxt = np.arange(1, len(coords) + 1)
    starts = offsets[:-1]
    ends = offsets[1:]
    # wrap: last vertex of ring i pairs with first vertex of ring i
    nxt[ends - 1] = starts
    cross = x * y[nxt] - x[nxt] * y
    # segment-sum per ring
    sums = np.add.reduceat(cross, starts) if len(starts) else np.empty(0)
    # reduceat with empty rings (offsets[i]==offsets[i+1]) yields wrong
    # values; mask them to 0
    empty = starts == ends
    if empty.any():
        sums = np.where(empty, 0.0, sums)
    return np.abs(sums) * 0.5


def signed_ring_areas(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    x, y = _localize(coords, offsets)
    nxt = np.arange(1, len(coords) + 1)
    starts = offsets[:-1]
    ends = offsets[1:]
    nxt[ends - 1] = starts
    cross = x * y[nxt] - x[nxt] * y
    sums = np.add.reduceat(cross, starts) if len(starts) else np.empty(0)
    empty = starts == ends
    if empty.any():
        sums = np.where(empty, 0.0, sums)
    return sums * 0.5


def ring_lengths(coords: np.ndarray, offsets: np.ndarray, closed: bool = True) -> np.ndarray:
    """Perimeter (closed=True) or polyline length (closed=False) per ring.

    Replaces ``geom.length`` (clip_gdf origlen,
    solaris/tile/vector_tile.py:307-310; road graph edge weights,
    solaris/vector/graph.py:79-88).
    """
    x = coords[:, 0]
    y = coords[:, 1]
    starts = offsets[:-1]
    ends = offsets[1:]
    nxt = np.arange(1, len(coords) + 1)
    if closed:
        nxt[ends - 1] = starts
    else:
        nxt[ends - 1] = ends - 1  # zero-length wrap segment
    seg = np.hypot(x[nxt] - x, y[nxt] - y)
    sums = np.add.reduceat(seg, starts) if len(starts) else np.empty(0)
    empty = starts == ends
    if empty.any():
        sums = np.where(empty, 0.0, sums)
    return sums


def ring_bboxes(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_geoms, 4) array of (minx, miny, maxx, maxy) per ring."""
    starts = offsets[:-1]
    n = len(starts)
    out = np.empty((n, 4), dtype=np.float64)
    if len(coords) == 0:
        return out
    x = coords[:, 0]
    y = coords[:, 1]
    out[:, 0] = np.minimum.reduceat(x, starts)
    out[:, 1] = np.minimum.reduceat(y, starts)
    out[:, 2] = np.maximum.reduceat(x, starts)
    out[:, 3] = np.maximum.reduceat(y, starts)
    return out


def ring_centroids(coords: np.ndarray, offsets: np.ndarray) -> np.ndarray:
    """(n_geoms, 2) polygon centroids (area-weighted, shoelace formula,
    localized per ring for numerical stability)."""
    x, y = _localize(coords, offsets)
    starts = offsets[:-1]
    ends = offsets[1:]
    nxt = np.arange(1, len(coords) + 1)
    nxt[ends - 1] = starts
    cross = x * y[nxt] - x[nxt] * y
    cx = (x + x[nxt]) * cross
    cy = (y + y[nxt]) * cross
    a = np.add.reduceat(cross, starts) * 0.5
    sx = np.add.reduceat(cx, starts)
    sy = np.add.reduceat(cy, starts)
    with np.errstate(divide="ignore", invalid="ignore"):
        out = np.stack([sx / (6.0 * a), sy / (6.0 * a)], axis=1)
    # degenerate (zero-area) rings: fall back to vertex mean
    bad = ~np.isfinite(out).all(axis=1)
    if bad.any():
        mx = np.add.reduceat(x, starts) / np.maximum(ends - starts, 1)
        my = np.add.reduceat(y, starts) / np.maximum(ends - starts, 1)
        out[bad, 0] = mx[bad]
        out[bad, 1] = my[bad]
    # back to world frame (x/y were localized to each ring's first vertex)
    if len(starts):
        out[:, 0] += coords[starts, 0]
        out[:, 1] += coords[starts, 1]
    return out


def points_in_polygon(px: np.ndarray, py: np.ndarray, ring: np.ndarray) -> np.ndarray:
    """Vectorized even-odd point-in-polygon test: many points vs ONE ring.

    Replaces the STRtree candidate + ``.intersects`` exact test for
    point features (solaris/tile/vector_tile.py:198-224).  Boundary
    points follow the even-odd crossing convention.
    """
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    x1 = np.roll(x0, -1)
    y1 = np.roll(y0, -1)
    inside = np.zeros(len(px), dtype=bool)
    for i in range(len(ring)):  # loop over edges (few), vectorized over points (many)
        cond = (y0[i] > py) != (y1[i] > py)
        if not cond.any():
            continue
        xint = (x1[i] - x0[i]) * (py - y0[i]) / (y1[i] - y0[i]) + x0[i]
        inside ^= cond & (px < xint)
    return inside


def clip_ring_to_box(ring: np.ndarray, minx: float, miny: float, maxx: float, maxy: float) -> np.ndarray:
    """Sutherland–Hodgman clip of one ring against an axis-aligned box.

    This is the tile-clip kernel of the vector tiler: the reference
    does ``gdf.intersection(shapely.box(*tile_bounds))``
    (solaris/tile/vector_tile.py:311-316).  A box is convex, so S-H is
    exact for any simple subject polygon.  Returns the clipped ring
    ((M, 2) array, possibly empty).
    """
    out = ring
    for axis, bound, keep_ge in ((0, minx, True), (0, maxx, False), (1, miny, True), (1, maxy, False)):
        if len(out) == 0:
            return out
        vals = out[:, axis]
        inside = vals >= bound if keep_ge else vals <= bound
        if inside.all():
            continue
        nxt = np.roll(np.arange(len(out)), -1)
        pieces = []

        def _isect(i, j):
            t = (bound - vals[i]) / (vals[j] - vals[i])
            p = out[i] + t * (out[j] - out[i])
            p[axis] = bound  # pin the constrained coordinate exactly
            return p

        for i in range(len(out)):
            j = nxt[i]
            if inside[i]:
                pieces.append(out[i])
                if not inside[j]:
                    pieces.append(_isect(i, j))
            elif inside[j]:
                pieces.append(_isect(i, j))
        out = np.asarray(pieces, dtype=np.float64).reshape(-1, 2)
    return out


def clip_line_to_box(
    pts: np.ndarray, minx: float, miny: float, maxx: float, maxy: float
) -> list[np.ndarray]:
    """Clip a polyline to an axis-aligned box (Liang–Barsky per segment).

    Returns a list of polyline pieces inside the box (the reference's
    ``line.intersection(box)`` may likewise return MultiLineString;
    vector_tile.py:311-316).  Adjacent surviving segments are merged.
    """
    pieces: list[list[np.ndarray]] = []
    cur: list[np.ndarray] = []
    for i in range(len(pts) - 1):
        p0, p1 = pts[i], pts[i + 1]
        d = p1 - p0
        t0, t1 = 0.0, 1.0
        ok = True
        for p, q in (
            (-d[0], p0[0] - minx),
            (d[0], maxx - p0[0]),
            (-d[1], p0[1] - miny),
            (d[1], maxy - p0[1]),
        ):
            if p == 0:
                if q < 0:
                    ok = False
                    break
            else:
                r = q / p
                if p < 0:
                    if r > t1:
                        ok = False
                        break
                    t0 = max(t0, r)
                else:
                    if r < t0:
                        ok = False
                        break
                    t1 = min(t1, r)
        if not ok or t0 > t1:
            if cur:
                pieces.append(cur)
                cur = []
            continue
        a = p0 + t0 * d
        b = p0 + t1 * d
        # inline closeness test (np.allclose costs ~25us per call and
        # this merge check runs per surviving segment in the hot join)
        if cur and abs(cur[-1][0] - a[0]) <= 1e-8 + 1e-5 * abs(a[0]) \
                and abs(cur[-1][1] - a[1]) <= 1e-8 + 1e-5 * abs(a[1]):
            cur.append(b)
        else:
            if cur:
                pieces.append(cur)
            cur = [a, b]
    if cur:
        pieces.append(cur)
    return [np.asarray(p) for p in pieces if len(p) >= 2]


def clip_polys_to_boxes_batch(
    P: np.ndarray,
    nv: np.ndarray,
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized Sutherland–Hodgman: K polygons vs K boxes at once.

    ``P`` is (K, M, 2) vertex-padded rings, ``nv`` the true vertex
    counts, boxes given per row.  Returns (P_out, nv_out) padded the
    same way; rows clipped away have ``nv_out < 3``.

    Emission rule and interpolation formula are IDENTICAL to the
    scalar ``clip_ring_to_box`` (t = (bound-v_i)/(v_j-v_i)), so results
    are bit-for-bit equal — the clip-join parity gate depends on that.
    This is the hot kernel of the spatial join: one pass handles every
    (tile, candidate) pair in a batch with no per-pair Python.
    """
    K, M, _ = P.shape
    if K == 0:
        return P, nv
    bounds = (
        (0, x0, True),
        (0, x1, False),
        (1, y0, True),
        (1, y1, False),
    )
    for axis, bound, keep_ge in bounds:
        M = P.shape[1]
        vals = P[:, :, axis]
        edge_mask = np.arange(M)[None, :] < nv[:, None]
        if keep_ge:
            inside = vals >= bound[:, None]
        else:
            inside = vals <= bound[:, None]
        inside &= edge_mask
        # next-vertex index with per-row wraparound
        nxt_idx = np.arange(1, M + 1)[None, :] % np.maximum(nv, 1)[:, None]
        rows = np.arange(K)[:, None]
        vals_j = vals[rows, nxt_idx]
        P_j = P[rows, nxt_idx]
        inside_j = np.take_along_axis(inside, nxt_idx, axis=1)
        cross = (inside != inside_j) & edge_mask
        emit_cur = inside  # emit current vertex when inside
        counts = emit_cur.astype(np.int64) + cross.astype(np.int64)
        nv_out = counts.sum(axis=1)
        M_out = int(nv_out.max()) if K else 0
        if M_out == 0:
            return np.zeros((K, 0, 2)), nv_out
        out = np.zeros((K, M_out, 2), dtype=np.float64)
        start = np.cumsum(counts, axis=1) - counts  # exclusive prefix sum
        # scatter current vertices
        r, c = np.nonzero(emit_cur)
        out[r, start[r, c]] = P[r, c]
        # scatter intersections (placed after the current vertex if any)
        r2, c2 = np.nonzero(cross)
        vi = vals[r2, c2]
        vj = vals_j[r2, c2]
        t = (bound[r2] - vi) / (vj - vi)
        pt = P[r2, c2] + t[:, None] * (P_j[r2, c2] - P[r2, c2])
        # the constrained coordinate IS the boundary: pin it exactly
        # (kills the t-interpolation ulp; axis-aligned inputs clip
        # bit-exactly, which the SQL join oracles rely on)
        pt[:, axis] = bound[r2]
        out[r2, start[r2, c2] + emit_cur[r2, c2]] = pt
        P, nv = out, nv_out
    return P, nv


def padded_ring_areas(P: np.ndarray, nv: np.ndarray) -> np.ndarray:
    """|shoelace| area of padded rings, summed in the same vertex order
    as the scalar ``ring_areas`` (bit-parity with the packed path)."""
    K, M, _ = P.shape
    if K == 0 or M == 0:
        return np.zeros(K)
    rows = np.arange(K)[:, None]
    nxt_idx = np.arange(1, M + 1)[None, :] % np.maximum(nv, 1)[:, None]
    # localize to the first vertex (same trick as ring_areas: UTM-scale
    # raw coords lose precision to cancellation)
    x = P[:, :, 0] - P[:, :1, 0]
    y = P[:, :, 1] - P[:, :1, 1]
    xj = x[rows, nxt_idx]
    yj = y[rows, nxt_idx]
    term = x * yj - xj * y
    term[np.arange(M)[None, :] >= nv[:, None]] = 0.0
    return np.abs(term.sum(axis=1)) * 0.5


def _clip_by_halfplane(poly: np.ndarray, p0: np.ndarray, p1: np.ndarray) -> np.ndarray:
    """Clip ``poly`` to the left half-plane of directed edge p0->p1."""
    if len(poly) == 0:
        return poly
    d = (p1[0] - p0[0]) * (poly[:, 1] - p0[1]) - (p1[1] - p0[1]) * (poly[:, 0] - p0[0])
    inside = d >= -1e-12
    if inside.all():
        return poly
    pieces = []
    n = len(poly)
    for i in range(n):
        j = (i + 1) % n
        if inside[i]:
            pieces.append(poly[i])
            if not inside[j]:
                t = d[i] / (d[i] - d[j])
                pieces.append(poly[i] + t * (poly[j] - poly[i]))
        elif inside[j]:
            t = d[i] / (d[i] - d[j])
            pieces.append(poly[i] + t * (poly[j] - poly[i]))
    return np.asarray(pieces, dtype=np.float64).reshape(-1, 2)


def _ccw(ring: np.ndarray) -> np.ndarray:
    """Orient a ring counter-clockwise (positive signed area)."""
    x = ring[:, 0]
    y = ring[:, 1]
    a = np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)
    return ring if a >= 0 else ring[::-1]


def convex_intersection_area(a: np.ndarray, b: np.ndarray) -> float:
    """Intersection area of two polygons where ``b`` is CONVEX.

    Sutherland–Hodgman of a against every edge of convex b; exact for
    convex b and simple a.  Used by the IoU matcher
    (reference: solaris/eval/iou.py:4-44 via shapely intersection).
    The synthetic corpus generates convex proposals/GT, so this is
    exact there; for concave b callers must rasterize instead.
    """
    if len(a) < 3 or len(b) < 3:
        return 0.0
    # localize both polygons (shoelace cancellation at UTM magnitudes)
    origin = a[0].copy()
    a = np.asarray(a, dtype=np.float64) - origin
    b = np.asarray(b, dtype=np.float64) - origin
    b = _ccw(b)
    out = a
    n = len(b)
    for i in range(n):
        out = _clip_by_halfplane(out, b[i], b[(i + 1) % n])
        if len(out) == 0:
            return 0.0
    x = out[:, 0]
    y = out[:, 1]
    return float(abs(np.sum(x * np.roll(y, -1) - np.roll(x, -1) * y)) * 0.5)


def polygon_iou(a: np.ndarray, b: np.ndarray) -> float:
    """IoU of two polygons (b convex; see convex_intersection_area).

    Mirrors ``calculate_iou`` (solaris/eval/iou.py:4-44):
    inter / (area_a + area_b - inter).
    """
    inter = convex_intersection_area(a, b)
    if inter == 0.0:
        return 0.0
    origin = a[0]
    ax = a[:, 0] - origin[0]
    ay = a[:, 1] - origin[1]
    bx = b[:, 0] - origin[0]
    by = b[:, 1] - origin[1]
    area_a = abs(np.sum(ax * np.roll(ay, -1) - np.roll(ax, -1) * ay)) * 0.5
    area_b = abs(np.sum(bx * np.roll(by, -1) - np.roll(bx, -1) * by)) * 0.5
    union = area_a + area_b - inter
    return float(inter / union) if union > 0 else 0.0


def buffer_convex(ring: np.ndarray, dist: float) -> np.ndarray:
    """Offset a CONVEX ring outward by ``dist`` (miter joins).

    Each edge line is shifted ``dist`` along its outward normal and
    consecutive shifted lines are intersected — the exact Minkowski sum
    with a disc up to the (rounded) corners, which miter joins
    overestimate slightly; the reference's shapely ``buffer`` uses
    round joins (solaris/vector/mask.py:567-666).  For the contact-mask
    use (spacing/2 buffers on near-rectangular footprints) the corner
    difference is sub-pixel.
    """
    r = ring[_ccw_order(ring)]
    n = len(r)
    e = np.roll(r, -1, axis=0) - r
    ln = np.hypot(e[:, 0], e[:, 1])
    ln[ln == 0] = 1.0
    # outward normal of a CCW ring is (dy, -dx) rotated: (e_y, -e_x)/|e|
    nx = e[:, 1] / ln
    ny = -e[:, 0] / ln
    p = r + dist * np.stack([nx, ny], axis=1)  # shifted edge start points
    d = e  # direction unchanged
    out = np.empty_like(r)
    for i in range(n):
        j = (i - 1) % n
        # intersect line j (p[j] + t*d[j]) with line i (p[i] + s*d[i])
        denom = d[j, 0] * d[i, 1] - d[j, 1] * d[i, 0]
        if abs(denom) < 1e-12:
            out[i] = p[i]
            continue
        t = ((p[i, 0] - p[j, 0]) * d[i, 1] - (p[i, 1] - p[j, 1]) * d[i, 0]) / denom
        out[i] = p[j] + t * d[j]
    return out


def _ccw_order(ring: np.ndarray) -> np.ndarray:
    x, y = ring[:, 0] - ring[0, 0], ring[:, 1] - ring[0, 1]
    area2 = float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))
    return np.arange(len(ring)) if area2 >= 0 else np.arange(len(ring))[::-1]


def internal_intersection_pairs(
    coords: np.ndarray, offsets: np.ndarray, buffer_dist: float = 0.0
) -> list[tuple[int, int, float]]:
    """Pairwise intersection areas among (optionally buffered) convex
    rings — ``geometries_internal_intersection`` semantics
    (solaris/utils/geo.py:421-477): bbox candidate prefilter, exact
    intersection per surviving pair.  Returns (i, j, area) triples.
    """
    n = len(offsets) - 1
    rings = [coords[offsets[i] : offsets[i + 1]] for i in range(n)]
    if buffer_dist > 0:
        rings = [buffer_convex(r, buffer_dist) for r in rings]
    bbox = np.asarray(
        [[r[:, 0].min(), r[:, 1].min(), r[:, 0].max(), r[:, 1].max()] for r in rings]
    ) if n else np.zeros((0, 4))
    out = []
    for i in range(n):
        for j in range(i + 1, n):
            if (
                bbox[i, 0] < bbox[j, 2]
                and bbox[i, 2] > bbox[j, 0]
                and bbox[i, 1] < bbox[j, 3]
                and bbox[i, 3] > bbox[j, 1]
            ):
                a = convex_intersection_area(rings[i], rings[j])
                if a > 0:
                    out.append((i, j, a))
    return out


def box_iou(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Pairwise IoU of two arrays of boxes (n,4) x (m,4) -> (n,m).

    Fully vectorized; the eval matcher uses it as a cheap prefilter
    before exact polygon IoU (replaces the reference's R-tree candidate
    lookup, solaris/eval/base.py:46,268-283).
    """
    a = np.asarray(a, dtype=np.float64)
    b = np.asarray(b, dtype=np.float64)
    ix0 = np.maximum(a[:, None, 0], b[None, :, 0])
    iy0 = np.maximum(a[:, None, 1], b[None, :, 1])
    ix1 = np.minimum(a[:, None, 2], b[None, :, 2])
    iy1 = np.minimum(a[:, None, 3], b[None, :, 3])
    iw = np.clip(ix1 - ix0, 0.0, None)
    ih = np.clip(iy1 - iy0, 0.0, None)
    inter = iw * ih
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    with np.errstate(divide="ignore", invalid="ignore"):
        iou = np.where(union > 0, inter / union, 0.0)
    return iou
