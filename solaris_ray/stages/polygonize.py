"""Mask -> polygon extraction — Solaris mask_to_poly_geojson semantics.

Reference (/root/reference/solaris/vector/mask.py):

- ``preds_to_binary`` (:669-715): weighted channel sum -> threshold ->
  uint8*255.
- ``mask_to_poly_geojson`` (:718-818): polygonize (rasterio shapes),
  bg_threshold filter, ``min_area`` filter, optional simplify
  (Douglas-Peucker), optional px->geo transform.

Ray mapping: one mask row in -> N polygon rows out (flat-map shape via
map_batches); the polygonize kernel is raster.kernels.polygonize
(4-connected component tracing).  Output coords are pixel-space unless
an affine struct is present on the row (then georegistered like
convert_poly_coords, solaris/vector/polygon.py:17-89).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..raster import codec
from ..raster.kernels import polygonize_full, simplify_ring

POLY_SCHEMA = pa.schema(
    [
        ("tile_id", pa.string()),
        ("poly_id", pa.int32()),
        ("xs", pa.list_(pa.float64())),
        ("ys", pa.list_(pa.float64())),
        ("hxs", pa.list_(pa.list_(pa.float64()))),
        ("hys", pa.list_(pa.list_(pa.float64()))),
        ("area_px", pa.float64()),
        ("n_verts", pa.int32()),
        ("n_holes", pa.int32()),
    ]
)


def _shoelace(ring: np.ndarray) -> float:
    x, y = ring[:, 0], ring[:, 1]
    return abs(float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))) / 2


def preds_to_binary_batch(
    batch: pa.Table,
    channel_scaling: list[float] | None = None,
    bg_threshold: float = 0.0,
    fmt: str = "png",
    pred_col: str = "pred",
) -> pa.Table:
    """Multi-channel float preds -> binary uint8 mask rows."""
    out = []
    for i in range(batch.num_rows):
        arr = codec.decode(batch[pred_col][i].as_py(), fmt).astype(np.float64)
        if arr.ndim == 2:
            arr = arr[:, :, None]
        w = np.asarray(channel_scaling if channel_scaling is not None else [1.0] * arr.shape[2])
        summed = (arr * w[None, None, :]).sum(axis=2)
        binary = ((summed > bg_threshold) * 255).astype(np.uint8)
        out.append(codec.encode(binary, fmt))
    return batch.set_column(
        batch.schema.get_field_index(pred_col), pred_col, pa.array(out, pa.binary())
    )


class MaskPolygonizer:
    """map_batches body: mask rows -> polygon rows (1 -> N fan-out)."""

    def __init__(self, min_area: float = 0.0, simplify_tol: float = 0.0,
                 mask_col: str = "mask", fmt: str = "png"):
        self.min_area = min_area
        self.simplify_tol = simplify_tol
        self.mask_col = mask_col
        self.fmt = fmt

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {k: [] for k in POLY_SCHEMA.names}
        for i in range(batch.num_rows):
            tid = batch["tile_id"][i].as_py()
            mask = codec.decode(batch[self.mask_col][i].as_py(), self.fmt)
            if mask.ndim == 3:
                mask = mask[:, :, 0]
            polys = polygonize_full(mask, min_area=self.min_area)
            for pi, (ring, holes) in enumerate(polys):
                if self.simplify_tol > 0:
                    ring = simplify_ring(ring, self.simplify_tol)
                    holes = [simplify_ring(hh, self.simplify_tol) for hh in holes]
                # net area = outer shoelace minus hole shoelaces
                # (= the component's pixel count on rectilinear rings)
                area = _shoelace(ring) - sum(_shoelace(hh) for hh in holes)
                out["tile_id"].append(tid)
                out["poly_id"].append(pi)
                out["xs"].append(ring[:, 0].tolist())
                out["ys"].append(ring[:, 1].tolist())
                out["hxs"].append([hh[:, 0].tolist() for hh in holes])
                out["hys"].append([hh[:, 1].tolist() for hh in holes])
                out["area_px"].append(area)
                out["n_verts"].append(len(ring))
                out["n_holes"].append(len(holes))
        return pa.table({k: pa.array(out[k], POLY_SCHEMA.field(k).type) for k in POLY_SCHEMA.names})


def masks_to_polygons(masks, mask_col: str = "footprint", min_area: float = 0.0,
                      simplify_tol: float = 0.0, fmt: str = "png", batch_size: int = 64):
    """masks Dataset -> polygons Dataset (mask_to_poly_geojson analogue)."""
    return masks.map_batches(
        MaskPolygonizer(min_area=min_area, simplify_tol=simplify_tol, mask_col=mask_col, fmt=fmt),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
