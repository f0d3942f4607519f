"""Rasterize / morphology / polygonize kernels (pure numpy).

Replacements for the rasterio.features + skimage.morphology calls at
the heart of the reference's mask generation:

- ``rasterize_rings``  ≙ rasterio.features.rasterize as used by
  footprint_mask (solaris/vector/mask.py:181-236): a pixel is burned
  when its CENTER is inside the polygon (even-odd rule).
- ``dilate_square`` / ``erode_square`` ≙ skimage square-strel
  morphology in boundary_mask (solaris/vector/mask.py:239-318).
- ``polygonize``       ≙ rasterio.features.shapes as used by
  mask_to_poly_geojson (solaris/vector/mask.py:718-818):
  4-connected components traced to rectilinear pixel-boundary rings.
- ``simplify_ring``    ≙ shapely ``.simplify`` (Douglas–Peucker).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "rasterize_rings",
    "rasterize_lines",
    "dilate_square",
    "erode_square",
    "label_components",
    "polygonize",
    "polygonize_full",
    "simplify_ring",
]


def rasterize_rings(
    coords: np.ndarray,
    offsets: np.ndarray,
    shape: tuple[int, int],
    values: np.ndarray | int = 255,
    out: np.ndarray | None = None,
    dtype=np.uint8,
) -> np.ndarray:
    """Burn packed rings (pixel coords) into a [H, W] array.

    ``values`` is a scalar burn value or a per-ring array (the
    reference's ``burn_field`` semantics, solaris/vector/mask.py:214).
    Later rings overwrite earlier ones, matching rasterio's default.
    Pixel-center even-odd scanline fill.
    """
    h, w = shape
    if out is None:
        out = np.zeros((h, w), dtype=dtype)
    n = len(offsets) - 1
    vals = np.full(n, values) if np.isscalar(values) else np.asarray(values)
    for i in range(n):
        ring = coords[offsets[i] : offsets[i + 1]]
        if len(ring) < 3:
            continue
        _fill_ring(out, ring, vals[i], h, w)
    return out


def _fill_ring(out: np.ndarray, ring: np.ndarray, value, h: int, w: int) -> None:
    x0 = ring[:, 0]
    y0 = ring[:, 1]
    # manual roll: np.roll's axis normalization costs more than the
    # whole fill on small rings
    x1 = np.empty_like(x0)
    x1[:-1] = x0[1:]
    x1[-1] = x0[0]
    y1 = np.empty_like(y0)
    y1[:-1] = y0[1:]
    y1[-1] = y0[0]
    ymin = max(int(np.ceil(y0.min() - 0.5)), 0)
    ymax = min(int(np.floor(y0.max() - 0.5)) + 1, h)  # exclusive
    if ymax <= ymin:
        return
    # window the parity accumulator to the ring's x-extent: crossings
    # can only toggle inside it, and parity left of it is 0 — a small
    # footprint on a wide tile otherwise pays O(rows * W) cumsum per
    # ring for O(rows * footprint) of actual work
    wx0 = max(int(np.ceil(x0.min() - 0.5)), 0)
    wx1 = min(int(np.ceil(x0.max() - 0.5)) + 1, w)  # exclusive
    if wx1 <= wx0:
        return
    ww = wx1 - wx0
    rows = np.arange(ymin, ymax)
    ys = rows + 0.5
    # edges crossing each scanline (half-open [min, max) to handle vertices)
    elo = np.minimum(y0, y1)
    ehi = np.maximum(y0, y1)
    nonhoriz = ehi > elo
    # diff-array fill: +1 at span start pixel, -1 at span end pixel
    acc = np.zeros((len(rows), ww + 1), dtype=np.int32)
    for e in np.nonzero(nonhoriz)[0]:
        m = (ys >= elo[e]) & (ys < ehi[e])
        if not m.any():
            continue
        xint = x0[e] + (ys[m] - y0[e]) * (x1[e] - x0[e]) / (y1[e] - y0[e])
        ri = rows[m] - ymin
        # crossing toggles parity at pixel index ceil(x - 0.5)
        px = np.ceil(xint - 0.5).astype(np.int64)
        px = np.clip(px, wx0, wx1) - wx0
        np.add.at(acc, (ri, px), 1)
    inside = (np.cumsum(acc[:, :-1], axis=1) % 2) == 1
    sub = out[ymin:ymax, wx0:wx1]
    sub[inside] = value


def rasterize_lines(
    coords: np.ndarray,
    offsets: np.ndarray,
    shape: tuple[int, int],
    value=255,
    out: np.ndarray | None = None,
    dtype=np.uint8,
) -> np.ndarray:
    """Burn polylines (1-px wide, Bresenham-ish via dense sampling).

    Used by the road mask before width dilation
    (road_mask, solaris/vector/mask.py:447-564 — the reference buffers
    then rasterizes; we rasterize the centerline then ``dilate_square``
    by width/2, equivalent for square caps on pixel grids).
    """
    h, w = shape
    if out is None:
        out = np.zeros((h, w), dtype=dtype)
    for i in range(len(offsets) - 1):
        pts = coords[offsets[i] : offsets[i + 1]]
        for j in range(len(pts) - 1):
            p0, p1 = pts[j], pts[j + 1]
            steps = int(max(abs(p1[0] - p0[0]), abs(p1[1] - p0[1])) * 2) + 1
            t = np.linspace(0.0, 1.0, steps)
            xs = np.clip((p0[0] + t * (p1[0] - p0[0])).astype(np.int64), 0, w - 1)
            ys = np.clip((p0[1] + t * (p1[1] - p0[1])).astype(np.int64), 0, h - 1)
            out[ys, xs] = value
    return out


def _sliding_minmax(arr: np.ndarray, k: int, op) -> np.ndarray:
    """Separable square-window min/max filter (edge-padded)."""
    if k <= 1:
        return arr
    pad = k // 2
    from numpy.lib.stride_tricks import sliding_window_view

    mode = "edge"
    a = np.pad(arr, ((pad, k - 1 - pad), (0, 0)), mode=mode)
    a = op(sliding_window_view(a, k, axis=0), axis=-1)
    a = np.pad(a, ((0, 0), (pad, k - 1 - pad)), mode=mode)
    a = op(sliding_window_view(a, k, axis=1), axis=-1)
    return a


def dilate_square(mask: np.ndarray, k: int) -> np.ndarray:
    """Morphological dilation with a k×k square structuring element."""
    return _sliding_minmax(mask, k, np.max)


def erode_square(mask: np.ndarray, k: int) -> np.ndarray:
    """Morphological erosion with a k×k square structuring element."""
    return _sliding_minmax(mask, k, np.min)


def label_components(mask: np.ndarray) -> tuple[np.ndarray, int]:
    """4-connected component labeling of a boolean mask.

    Two-pass union-find, vectorized row merging; labels start at 1.
    (rasterio.features.shapes uses 4-connectivity by default.)
    """
    h, w = mask.shape
    labels = np.zeros((h, w), dtype=np.int32)
    parent = [0]  # parent[i] for union-find; 0 = background sentinel

    def find(x: int) -> int:
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:
            parent[x], x = root, parent[x]
        return root

    nxt = 1
    for r in range(h):
        row = mask[r]
        runs = np.flatnonzero(np.diff(np.concatenate(([0], row.view(np.uint8), [0]))))
        for s, e in zip(runs[::2], runs[1::2]):
            above = labels[r - 1, s:e] if r > 0 else np.empty(0, dtype=np.int32)
            touching = np.unique(above[above > 0])
            if len(touching) == 0:
                parent.append(nxt)
                labels[r, s:e] = nxt
                nxt += 1
            else:
                roots = sorted({find(int(t)) for t in touching})
                keep = roots[0]
                for other in roots[1:]:
                    parent[other] = keep
                labels[r, s:e] = keep
    # flatten labels
    remap = np.arange(nxt, dtype=np.int32)
    for i in range(1, nxt):
        remap[i] = find(i)
    # compact to 1..n
    uniq, compact = np.unique(remap[1:], return_inverse=True)
    lut = np.zeros(nxt, dtype=np.int32)
    lut[1:] = compact + 1
    out = lut[remap[labels]]
    return out, int(out.max())


def _trace_loops(comp: np.ndarray) -> list[np.ndarray]:
    """ALL boundary loops of a 4-connected component.

    Directed pixel-edge following with interior on the left.  The
    directed boundary-edge set of a component decomposes into exactly
    one outer ring plus one loop per interior hole (rasterio
    ``features.shapes`` emits both — solaris/vector/mask.py:776-797).
    Returns open (N, 2) rings in (x, y) pixel-corner coordinates,
    collinear points merged; the OUTER ring is always first (it owns
    the lexicographically smallest boundary corner).
    """
    h, w = comp.shape
    padded = np.zeros((h + 2, w + 2), dtype=bool)
    padded[1:-1, 1:-1] = comp
    inside = padded
    # directed edges: key = start corner, val = list of (end corner)
    edges: dict[tuple[int, int], list[tuple[int, int]]] = {}
    n_edges = 0
    rs, cs = np.nonzero(comp)
    for r, c in zip(rs.tolist(), cs.tolist()):
        pr, pc = r + 1, c + 1
        if not inside[pr - 1, pc]:  # top edge, rightward
            edges.setdefault((c, r), []).append((c + 1, r))
            n_edges += 1
        if not inside[pr, pc + 1]:  # right edge, downward
            edges.setdefault((c + 1, r), []).append((c + 1, r + 1))
            n_edges += 1
        if not inside[pr + 1, pc]:  # bottom edge, leftward
            edges.setdefault((c + 1, r + 1), []).append((c, r + 1))
            n_edges += 1
        if not inside[pr, pc - 1]:  # left edge, upward
            edges.setdefault((c, r + 1), []).append((c, r))
            n_edges += 1
    loops: list[np.ndarray] = []
    while n_edges > 0:
        # start each loop at the smallest remaining corner; the first
        # loop traced is therefore the outer ring
        start = min(k for k, v in edges.items() if v)
        ring = [start]
        prev_dir = None
        cur = start
        while True:
            outs = edges[cur]
            if len(outs) == 1:
                nxt = outs.pop()
            else:
                # ambiguous corner (pinch): prefer the sharpest left
                # turn so each loop stays simple and closed
                def turn_key(cand):
                    dx, dy = cand[0] - cur[0], cand[1] - cur[1]
                    if prev_dir is None:
                        return 0
                    px, py = prev_dir
                    cross = px * dy - py * dx
                    dot = px * dx + py * dy
                    return -np.arctan2(cross, dot)

                nxt = min(outs, key=turn_key)
                outs.remove(nxt)
            n_edges -= 1
            prev_dir = (nxt[0] - cur[0], nxt[1] - cur[1])
            cur = nxt
            if cur == start:
                break
            ring.append(cur)
        arr = np.asarray(ring, dtype=np.float64)
        # merge collinear runs (rectilinear → keep corners only)
        if len(arr) > 2:
            prev_seg = arr - np.roll(arr, 1, axis=0)
            next_seg = np.roll(arr, -1, axis=0) - arr
            corner = (prev_seg[:, 0] * next_seg[:, 1] - prev_seg[:, 1] * next_seg[:, 0]) != 0
            arr = arr[corner]
        loops.append(arr)
    return loops


def _trace_boundary(comp: np.ndarray) -> np.ndarray:
    """Outer boundary only (back-compat wrapper over ``_trace_loops``)."""
    return _trace_loops(comp)[0]


def polygonize_full(
    mask: np.ndarray, min_area: float = 0.0
) -> list[tuple[np.ndarray, list[np.ndarray]]]:
    """mask > 0 -> [(outer_ring, [hole_rings...]), ...].

    Mirrors mask_to_poly_geojson (solaris/vector/mask.py:718-818) with
    rasterio ``features.shapes`` semantics: each 4-connected component
    becomes one polygon with its interior rings (holes).  ``min_area``
    filters on the component PIXEL count (net area).  Output order is
    deterministic: components sorted by (min row, min col).
    """
    labels, n = label_components(mask > 0)
    polys = []
    for i in range(1, n + 1):
        comp = labels == i
        area = float(comp.sum())
        if area < min_area:
            continue
        loops = _trace_loops(comp)
        polys.append((loops[0], loops[1:]))
    return polys


def polygonize(mask: np.ndarray, min_area: float = 0.0) -> list[np.ndarray]:
    """Outer rings only (back-compat; see ``polygonize_full`` for holes)."""
    return [outer for outer, _ in polygonize_full(mask, min_area)]


def simplify_ring(ring: np.ndarray, tolerance: float) -> np.ndarray:
    """Douglas–Peucker simplification of a closed ring (shapely
    ``.simplify`` analogue, solaris/vector/mask.py:804-809)."""
    if len(ring) <= 4 or tolerance <= 0:
        return ring
    pts = np.vstack([ring, ring[:1]])

    def dp(lo: int, hi: int, keep: np.ndarray) -> None:
        if hi <= lo + 1:
            return
        a, b = pts[lo], pts[hi]
        ab = b - a
        denom = np.hypot(*ab)
        seg = pts[lo + 1 : hi]
        if denom == 0:
            d = np.hypot(*(seg - a).T)
        else:
            d = np.abs(ab[0] * (seg[:, 1] - a[1]) - ab[1] * (seg[:, 0] - a[0])) / denom
        imax = int(np.argmax(d))
        if d[imax] > tolerance:
            keep[lo + 1 + imax] = True
            dp(lo, lo + 1 + imax, keep)
            dp(lo + 1 + imax, hi, keep)

    keep = np.zeros(len(pts), dtype=bool)
    keep[0] = keep[-1] = True
    dp(0, len(pts) - 1, keep)
    out = pts[keep]
    return out[:-1]
