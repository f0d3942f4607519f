"""Pure-numpy geometry kernels (no shapely / GDAL).

Coordinate convention: all batch kernels operate on *packed ring
arrays* — a flat ``coords`` float64 array of shape (N, 2) plus an
int32/int64 ``offsets`` array of length n_geoms+1 (Arrow list-offset
convention, zero-copy from ``list<list<double>>`` / parallel
``xs``/``ys`` list columns).  One ring per geometry in v1 (no interior
holes), which covers the synthetic SpaceNet-style corpus; Multi*
geometries are exploded to one row per part before the hot path
(reference: split_multi_geometries, solaris/utils/geo.py:480-587).
"""

from .affine import Affine, apply_affine, invert_affine, list_to_affine  # noqa: F401
from .cells import cell_of_point, cover_bbox, cell_children, cell_parent, neighbors  # noqa: F401
