"""Focal (neighborhood) raster ops across tile boundaries — halo exchange.

The geospatial primitive behind slope / hillshade / smoothing
(reference analogue: solaris' tile-local raster math never crosses a
tile edge — `/root/reference/solaris/raster/image.py` stitches but does
not window).  A 3x3 focal window at a tile's edge needs up to 8
neighbor tiles' border pixels; at 100 TB you cannot co-locate whole
neighborhoods, so the engine does the classic halo exchange:

  1. ``map_batches`` over tiles: decode once, emit the OWN tile to its
     own (tx, ty) key plus 8 border strips (columns / rows / corner
     pixels — at most 2 x 64 + 2 x 64 + 4 px per tile, ~0.3% of the tile)
     keyed to each neighbor.  Pixels ship as raw uint8 binary.
  2. ONE ``groupby(tile)`` co-shuffle assembles the 66x66 padded array
     (missing neighbors = zero padding at the mosaic boundary), then a
     vectorized sliding-sum convolution.

The shuffle moves each tile's body exactly once plus 8 tiny strips —
no tile is replicated 9x (the naive alternative).

Output: (tile_x, tile_y, focal_total) — the integer sum over all tile
pixels of their 3x3-neighborhood sums, exact in int64.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_MSG_SCHEMA = pa.schema(
    [("kx", pa.int64()), ("ky", pa.int64()),
     ("sdx", pa.int64()), ("sdy", pa.int64()),
     ("payload", pa.binary())]
)

_OUT_SCHEMA = pa.schema(
    [("tile_x", pa.int64()), ("tile_y", pa.int64()),
     ("focal_total", pa.int64())]
)


def focal_sum(
    tiles,
    tile: int = 64,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
):
    """tiles (tile_x, tile_y, bytes, fmt) -> (tile_x, tile_y,
    focal_total): 3x3 focal sums with cross-tile halo exchange, zero
    padding outside the mosaic."""
    from ..raster import codec as _codec

    def _emit(batch: pa.Table) -> pa.Table:
        kx, ky, sdx, sdy, payload = [], [], [], [], []
        for i in range(batch.num_rows):
            tx = int(batch[x_col][i].as_py())
            ty = int(batch[y_col][i].as_py())
            img = _codec.decode(batch[bytes_col][i].as_py(),
                                batch[fmt_col][i].as_py())
            if img.ndim == 3:
                img = img[..., 0]
            img = np.ascontiguousarray(img[:tile, :tile], np.uint8)
            # own tile
            kx.append(tx); ky.append(ty); sdx.append(0); sdy.append(0)
            payload.append(img.tobytes())
            # 8 neighbors: receiver at (tx+dx, ty+dy) sees us at (-dx,-dy);
            # strip = our pixels nearest that neighbor
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    xs = slice(None) if dx == 0 else (
                        slice(tile - 1, tile) if dx == 1 else slice(0, 1))
                    ys = slice(None) if dy == 0 else (
                        slice(tile - 1, tile) if dy == 1 else slice(0, 1))
                    kx.append(tx + dx); ky.append(ty + dy)
                    sdx.append(-dx); sdy.append(-dy)
                    payload.append(np.ascontiguousarray(img[ys, xs]).tobytes())
        return pa.table(
            {
                "kx": pa.array(kx, pa.int64()),
                "ky": pa.array(ky, pa.int64()),
                "sdx": pa.array(sdx, pa.int64()),
                "sdy": pa.array(sdy, pa.int64()),
                "payload": pa.array(payload, pa.binary()),
            }
        )

    def _pad_slices(s: int) -> slice:
        # placement of a sender at offset s (-1/0/+1) along one axis of
        # the (tile+2)-wide padded array
        return {-1: slice(0, 1), 0: slice(1, tile + 1),
                1: slice(tile + 1, tile + 2)}[s]

    def _assemble(group: pa.Table) -> pa.Table:
        sdx = group["sdx"].to_numpy(zero_copy_only=False)
        sdy = group["sdy"].to_numpy(zero_copy_only=False)
        own = (sdx == 0) & (sdy == 0)
        if not own.any():
            # halo strips for a tile outside the mosaic — nothing to do
            return _OUT_SCHEMA.empty_table()
        padded = np.zeros((tile + 2, tile + 2), np.int64)
        for i in range(group.num_rows):
            ys, xs = _pad_slices(int(sdy[i])), _pad_slices(int(sdx[i]))
            h = ys.stop - ys.start
            w = xs.stop - xs.start
            padded[ys, xs] = np.frombuffer(
                group["payload"][i].as_py(), np.uint8
            ).reshape(h, w)
        s1 = padded[0:tile] + padded[1:tile + 1] + padded[2:tile + 2]
        f = s1[:, 0:tile] + s1[:, 1:tile + 1] + s1[:, 2:tile + 2]
        return pa.table(
            {
                "tile_x": pa.array([int(group["kx"][0].as_py())], pa.int64()),
                "tile_y": pa.array([int(group["ky"][0].as_py())], pa.int64()),
                "focal_total": pa.array([int(f.sum())], pa.int64()),
            }
        )

    return (
        tiles.map_batches(_emit, batch_format="pyarrow", batch_size=64)
        .groupby(["kx", "ky"])
        .map_groups(_assemble, batch_format="pyarrow")
    )


_GRAD_SCHEMA = pa.schema(
    [("tile_x", pa.int64()), ("tile_y", pa.int64()),
     ("abs_gx", pa.int64()), ("abs_gy", pa.int64()),
     ("grad_sq", pa.int64())]
)


def focal_gradients(
    tiles,
    tile: int = 64,
    x_col: str = "tile_x",
    y_col: str = "tile_y",
    bytes_col: str = "bytes",
    fmt_col: str = "fmt",
):
    """Horn-method DEM gradients with cross-tile halo exchange — the
    integer core of slope / aspect / hillshade (Horn 1981; GDAL's
    ``gdaldem slope`` uses the same 3x3 stencil):

        gx = (c + 2f + i) − (a + 2d + g)
        gy = (g + 2h + i) − (a + 2b + c)

    over the padded (tile+2)² array (zero outside the mosaic — same
    boundary convention as ``focal_sum``).  Output per tile:
    Σ|gx|, Σ|gy|, Σ(gx² + gy²) — all int64-exact, so a SQL twin
    restates the stencil verbatim on the global pixel formula; the
    float slope/aspect/illumination angles are one scalar expression
    away and stay pytest-covered (atan/cos are not hash-comparable).
    Shuffle shape identical to focal_sum: each tile body moves once
    plus 8 border strips.
    """
    from ..raster import codec as _codec

    def _emit(batch: pa.Table) -> pa.Table:
        kx, ky, sdx, sdy, payload = [], [], [], [], []
        for i in range(batch.num_rows):
            tx = int(batch[x_col][i].as_py())
            ty = int(batch[y_col][i].as_py())
            img = _codec.decode(batch[bytes_col][i].as_py(),
                                batch[fmt_col][i].as_py())
            if img.ndim == 3:
                img = img[..., 0]
            img = np.ascontiguousarray(img[:tile, :tile], np.uint8)
            kx.append(tx); ky.append(ty); sdx.append(0); sdy.append(0)
            payload.append(img.tobytes())
            for dx in (-1, 0, 1):
                for dy in (-1, 0, 1):
                    if dx == 0 and dy == 0:
                        continue
                    xs = slice(None) if dx == 0 else (
                        slice(tile - 1, tile) if dx == 1 else slice(0, 1))
                    ys = slice(None) if dy == 0 else (
                        slice(tile - 1, tile) if dy == 1 else slice(0, 1))
                    kx.append(tx + dx); ky.append(ty + dy)
                    sdx.append(-dx); sdy.append(-dy)
                    payload.append(np.ascontiguousarray(img[ys, xs]).tobytes())
        return pa.table(
            {
                "kx": pa.array(kx, pa.int64()),
                "ky": pa.array(ky, pa.int64()),
                "sdx": pa.array(sdx, pa.int64()),
                "sdy": pa.array(sdy, pa.int64()),
                "payload": pa.array(payload, pa.binary()),
            }
        )

    def _pad_slices(s: int) -> slice:
        return {-1: slice(0, 1), 0: slice(1, tile + 1),
                1: slice(tile + 1, tile + 2)}[s]

    def _assemble(group: pa.Table) -> pa.Table:
        sdx = group["sdx"].to_numpy(zero_copy_only=False)
        sdy = group["sdy"].to_numpy(zero_copy_only=False)
        own = (sdx == 0) & (sdy == 0)
        if not own.any():
            return _GRAD_SCHEMA.empty_table()
        p = np.zeros((tile + 2, tile + 2), np.int64)
        for i in range(group.num_rows):
            ys, xs = _pad_slices(int(sdy[i])), _pad_slices(int(sdx[i]))
            p[ys, xs] = np.frombuffer(
                group["payload"][i].as_py(), np.uint8
            ).reshape(ys.stop - ys.start, xs.stop - xs.start)
        # window letters (row-major a..i) around each interior pixel
        a = p[0:tile, 0:tile];     b = p[0:tile, 1:tile+1];     c = p[0:tile, 2:tile+2]
        d = p[1:tile+1, 0:tile];                                f = p[1:tile+1, 2:tile+2]
        g = p[2:tile+2, 0:tile];   h = p[2:tile+2, 1:tile+1];   i_ = p[2:tile+2, 2:tile+2]
        gx = (c + 2 * f + i_) - (a + 2 * d + g)
        gy = (g + 2 * h + i_) - (a + 2 * b + c)
        return pa.table(
            {
                "tile_x": pa.array([int(group["kx"][0].as_py())], pa.int64()),
                "tile_y": pa.array([int(group["ky"][0].as_py())], pa.int64()),
                "abs_gx": pa.array([int(np.abs(gx).sum())], pa.int64()),
                "abs_gy": pa.array([int(np.abs(gy).sum())], pa.int64()),
                "grad_sq": pa.array([int((gx * gx + gy * gy).sum())], pa.int64()),
            }
        )

    return (
        tiles.map_batches(_emit, batch_format="pyarrow", batch_size=64)
        .groupby(["kx", "ky"])
        .map_groups(_assemble, batch_format="pyarrow")
    )
