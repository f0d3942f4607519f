"""Polygon coordinate transforms — solaris.vector.polygon re-expressed
as vectorized batch kernels over xs/ys list columns.

Reference (/root/reference/solaris/vector/polygon.py):

- ``convert_poly_coords`` (:17-89): apply affine (or inverse) to one
  geometry.
- ``affine_transform_gdf`` (:92-138): whole-column apply + optional
  precision rounding.
- ``georegister_px_df`` (:141-192): px->geo via a reference image's
  affine + CRS.
- ``geojson_to_px_gdf`` (:195-258): geo->px via the image's INVERSE
  affine (bbox semi-join upstream — stages.pip covers that).

All kernels operate on the FLATTENED Arrow list values (one numpy op
per batch, ragged structure preserved by reusing the offsets) — no
per-row Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geom.affine import Affine, invert_affine


def _flat_lists(batch: pa.Table, xs_col: str, ys_col: str):
    xs = batch[xs_col].combine_chunks() if isinstance(batch[xs_col], pa.ChunkedArray) else batch[xs_col]
    ys = batch[ys_col].combine_chunks() if isinstance(batch[ys_col], pa.ChunkedArray) else batch[ys_col]
    if isinstance(xs, pa.ChunkedArray):
        xs = pa.concat_arrays(xs.chunks)
        ys = pa.concat_arrays(ys.chunks)
    return xs.offsets, xs.values.to_numpy(), ys.values.to_numpy()


def _rebuild(batch: pa.Table, xs_col: str, ys_col: str, offsets, fx, fy) -> pa.Table:
    tbl = batch.set_column(
        batch.schema.get_field_index(xs_col), xs_col,
        pa.ListArray.from_arrays(offsets, pa.array(fx, pa.float64())),
    )
    return tbl.set_column(
        tbl.schema.get_field_index(ys_col), ys_col,
        pa.ListArray.from_arrays(offsets, pa.array(fy, pa.float64())),
    )


def affine_transform_batch(
    batch: pa.Table,
    t: Affine,
    inverse: bool = False,
    precision: int | None = None,
    xs_col: str = "xs",
    ys_col: str = "ys",
) -> pa.Table:
    """Apply ``t`` (or its inverse) to every ring in the batch.

    convert_poly_coords/affine_transform_gdf semantics incl. the
    optional ``precision`` rounding (polygon.py:118-137).
    """
    if inverse:
        t = invert_affine(t)
    offsets, x, y = _flat_lists(batch, xs_col, ys_col)
    nx = t.a * x + t.b * y + t.c
    ny = t.d * x + t.e * y + t.f
    if precision is not None:
        nx = np.round(nx, precision)
        ny = np.round(ny, precision)
    return _rebuild(batch, xs_col, ys_col, offsets, nx, ny)


def georegister_batch(
    batch: pa.Table,
    xs_col: str = "xs",
    ys_col: str = "ys",
    gt_cols: tuple[str, ...] = ("gt_a", "gt_b", "gt_c", "gt_d", "gt_e", "gt_f"),
) -> pa.Table:
    """Px->geo using the PER-ROW affine struct columns (georegister_px_df:
    each row is transformed by its own image's geotransform)."""
    offsets, x, y = _flat_lists(batch, xs_col, ys_col)
    counts = np.diff(offsets.to_numpy())
    g = {c: np.repeat(batch[c].to_numpy(), counts) for c in gt_cols}
    nx = g[gt_cols[0]] * x + g[gt_cols[1]] * y + g[gt_cols[2]]
    ny = g[gt_cols[3]] * x + g[gt_cols[4]] * y + g[gt_cols[5]]
    return _rebuild(batch, xs_col, ys_col, offsets, nx, ny)


def geo_to_px_batch(batch: pa.Table, xs_col: str = "xs", ys_col: str = "ys",
                    gt_cols: tuple[str, ...] = ("gt_a", "gt_b", "gt_c", "gt_d", "gt_e", "gt_f")) -> pa.Table:
    """Geo->px: per-row INVERSE affine (geojson_to_px_gdf:195-258)."""
    offsets, x, y = _flat_lists(batch, xs_col, ys_col)
    counts = np.diff(offsets.to_numpy())
    a = np.repeat(batch[gt_cols[0]].to_numpy(), counts)
    b = np.repeat(batch[gt_cols[1]].to_numpy(), counts)
    c = np.repeat(batch[gt_cols[2]].to_numpy(), counts)
    d = np.repeat(batch[gt_cols[3]].to_numpy(), counts)
    e = np.repeat(batch[gt_cols[4]].to_numpy(), counts)
    f = np.repeat(batch[gt_cols[5]].to_numpy(), counts)
    det = a * e - b * d
    px = (e * (x - c) - b * (y - f)) / det
    py = (-d * (x - c) + a * (y - f)) / det
    return _rebuild(batch, xs_col, ys_col, offsets, px, py)


def reduce_precision_batch(batch: pa.Table, precision: int,
                           xs_col: str = "xs", ys_col: str = "ys") -> pa.Table:
    """_reduce_geom_precision (solaris/utils/geo.py:590-594)."""
    offsets, x, y = _flat_lists(batch, xs_col, ys_col)
    return _rebuild(batch, xs_col, ys_col, offsets, np.round(x, precision), np.round(y, precision))


def explode_multi_batch(batch: pa.Table, parts_col: str = "n_parts") -> pa.Table:
    """split_multi_geometries analogue (solaris/utils/geo.py:480-587):
    rows whose geometry has multiple parts become one row per part with
    a within-group ordinal.  Here parts are already materialized as
    separate rows by upstream parsers; this helper renumbers
    ``obj_id`` per group — the cumcount semantics of
    ``_split_multigeom_row``."""
    import pyarrow.compute as pc

    group = batch["image_id"]
    # stable cumcount per group within the batch
    import pandas as pd

    s = pd.Series(group.to_pylist())
    ord_ = s.groupby(s, sort=False).cumcount().to_numpy()
    return batch.append_column("obj_id", pa.array(ord_.astype(np.int64)))


def split_multi_rows(batch: pa.Table, wkt_col: str = "wkt",
                     id_col: str = "feature_id") -> pa.Table:
    """WKT rows -> one row per polygon part with a within-feature
    ordinal (``split_multi_geometries`` + renumber,
    solaris/utils/geo.py:480-587 / _split_multigeom_row cumcount):
    POLYGON passes through as obj_id 0; each MULTIPOLYGON part gets
    its part index.  Output (id, obj_id, xs, ys) list-column rows.
    """
    from ..geom.wkt import parse_wkt

    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    out_id, out_ord, out_xs, out_ys = [], [], [], []
    for i, w in zip(ids.tolist(), batch[wkt_col].to_pylist()):
        gtype, rings = parse_wkt(w)
        for j, ring in enumerate(rings):
            r = ring
            # drop the closing vertex if present (engine list-column
            # convention stores open rings)
            if len(r) > 1 and (r[0] == r[-1]).all():
                r = r[:-1]
            out_id.append(i)
            out_ord.append(j)
            out_xs.append(r[:, 0].tolist())
            out_ys.append(r[:, 1].tolist())
    return pa.table({
        id_col: pa.array(out_id, pa.int64()),
        "obj_id": pa.array(out_ord, pa.int64()),
        "xs": pa.array(out_xs, pa.list_(pa.float64())),
        "ys": pa.array(out_ys, pa.list_(pa.float64())),
    })
