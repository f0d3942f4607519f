"""Affine geotransform algebra (replaces the ``affine`` package).

Reference semantics: solaris/utils/geo.py:392-418 (``list_to_affine``
resolves GDAL-vs-rasterio element order), solaris/vector/polygon.py:55-65
(forward and inverse application to geometry coordinates).

An affine transform maps pixel (col, row) -> geo (x, y):

    x = a*col + b*row + c
    y = d*col + e*row + f

stored as the 6-tuple ``(a, b, c, d, e, f)`` (rasterio order).  GDAL
order is ``(c, a, b, f, d, e)``.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np


class Affine(NamedTuple):
    a: float
    b: float
    c: float
    d: float
    e: float
    f: float

    @staticmethod
    def identity() -> "Affine":
        return Affine(1.0, 0.0, 0.0, 0.0, 1.0, 0.0)

    @staticmethod
    def from_origin(west: float, north: float, xsize: float, ysize: float) -> "Affine":
        """North-up transform with pixel sizes (xsize, ysize>0 means y decreasing)."""
        return Affine(xsize, 0.0, west, 0.0, -ysize, north)


def list_to_affine(xform: list[float] | tuple[float, ...]) -> Affine:
    """6-element list -> Affine, auto-detecting rasterio vs GDAL order.

    Mirrors solaris/utils/geo.py:392-411: GDAL puts the x-offset first
    (element 0) and rasterio puts it third (element 2).  Heuristic (same
    as the reference): if element 2 is an integer-ish large offset and
    element 0 is small, it's rasterio order already; detection keys off
    which slots hold the (typically large) translation terms.
    """
    x = [float(v) for v in xform]
    if len(x) != 6:
        raise ValueError("affine transform must have 6 elements")
    # rasterio order: (a, b, c, d, e, f) with c,f = offsets
    # GDAL order:     (c, a, b, f, d, e) with elements 0,3 = offsets
    # Same heuristic shape as the reference: offsets are the values with
    # the largest magnitude; scale terms (a, e) are small and non-zero.
    if abs(x[0]) > abs(x[2]) and abs(x[3]) > abs(x[5]):
        # GDAL order
        c, a, b, f, d, e = x
        return Affine(a, b, c, d, e, f)
    return Affine(*x)


def invert_affine(t: Affine) -> Affine:
    """Inverse transform: geo (x, y) -> pixel (col, row).

    Reference uses ``~affine_obj`` (solaris/vector/polygon.py:64-65).
    """
    det = t.a * t.e - t.b * t.d
    if det == 0.0:
        raise ValueError("affine transform is singular")
    ia = t.e / det
    ib = -t.b / det
    id_ = -t.d / det
    ie = t.a / det
    ic = -(ia * t.c + ib * t.f)
    if_ = -(id_ * t.c + ie * t.f)
    return Affine(ia, ib, ic, id_, ie, if_)


def apply_affine(t: Affine, xs: np.ndarray, ys: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized forward application to coordinate arrays.

    Replaces shapely.affinity.affine_transform over whole geometry
    columns (solaris/vector/polygon.py:92-138) with one fused numpy op.
    """
    xs = np.asarray(xs, dtype=np.float64)
    ys = np.asarray(ys, dtype=np.float64)
    return t.a * xs + t.b * ys + t.c, t.d * xs + t.e * ys + t.f


def compose(t1: Affine, t2: Affine) -> Affine:
    """t1 ∘ t2 (apply t2 first, then t1)."""
    return Affine(
        t1.a * t2.a + t1.b * t2.d,
        t1.a * t2.b + t1.b * t2.e,
        t1.a * t2.c + t1.b * t2.f + t1.c,
        t1.d * t2.a + t1.e * t2.d,
        t1.d * t2.b + t1.e * t2.e,
        t1.d * t2.c + t1.e * t2.f + t1.f,
    )
