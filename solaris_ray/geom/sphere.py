"""Spherical-earth geometry: geodesic ring areas without projecting.

The reference computes areas in a projected CRS (reproject-to-UTM
then ``gdf.area``); for global footprints a spherical-excess area on
lon/lat coordinates avoids the zone round-trip entirely.  This is the
Chamberlain–Duquette algorithm (public: C&D 2007, "Some algorithms
for polygons on a sphere", JPL; also turf.js ``area``):

    A = |Σ_i (λ_{i+1} − λ_i) · (2 + sin φ_i + sin φ_{i+1})| · R² / 2

with λ/φ in radians over the closed ring and R the WGS84 mean
authalic-ish radius 6371008.8 m.  Exact for the sphere, a few 0.1%
from the ellipsoid — the standard web-scale approximation.
"""

from __future__ import annotations

import numpy as np

R_MEAN = 6371008.8  # mean earth radius, metres


def ring_area_sphere(lon: np.ndarray, lat: np.ndarray) -> float:
    """Signed-free spherical area (m²) of one lon/lat ring (closed or
    open; closure is implicit)."""
    lam = np.radians(np.asarray(lon, np.float64))
    phi = np.radians(np.asarray(lat, np.float64))
    if lam.size < 3:
        return 0.0
    lam2 = np.roll(lam, -1)
    phi2 = np.roll(phi, -1)
    s = np.sum((lam2 - lam) * (2.0 + np.sin(phi) + np.sin(phi2)))
    return abs(s) * R_MEAN * R_MEAN / 2.0


def rings_area_sphere(xs_list, ys_list) -> np.ndarray:
    """Vectorized-over-rows spherical areas for list-of-coord rows
    (the engine's (xs, ys) list-column convention)."""
    return np.asarray(
        [ring_area_sphere(np.asarray(x, np.float64), np.asarray(y, np.float64))
         for x, y in zip(xs_list, ys_list)], np.float64)
