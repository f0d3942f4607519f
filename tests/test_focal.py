"""Focal halo-exchange tests vs a global-array numpy oracle."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.raster import codec
from solaris_ray.stages.focal import focal_sum


def _tiles_ds(tiles: dict, tile=32):
    tx, ty, blobs = [], [], []
    for (x, y), img in tiles.items():
        tx.append(x); ty.append(y)
        blobs.append(codec.encode(img.astype(np.uint8), "png"))
    return ray.data.from_arrow(
        pa.table(
            {
                "tile_x": pa.array(tx, pa.int64()),
                "tile_y": pa.array(ty, pa.int64()),
                "bytes": pa.array(blobs, pa.binary()),
                "fmt": pa.array(["png"] * len(tx), pa.string()),
            }
        )
    )


def _global_oracle(tiles: dict, tile=32):
    xs = [k[0] for k in tiles]; ys = [k[1] for k in tiles]
    W, H = (max(xs) + 1) * tile, (max(ys) + 1) * tile
    G = np.zeros((H + 2, W + 2), np.int64)  # 1px zero pad around world
    for (x, y), img in tiles.items():
        G[1 + y * tile:1 + (y + 1) * tile, 1 + x * tile:1 + (x + 1) * tile] = img
    s1 = G[0:H] + G[1:H + 1] + G[2:H + 2]
    F = s1[:, 0:W] + s1[:, 1:W + 1] + s1[:, 2:W + 2]
    out = {}
    for (x, y) in tiles:
        out[(x, y)] = int(F[y * tile:(y + 1) * tile, x * tile:(x + 1) * tile].sum())
    return out


def _run(tiles, tile=32):
    got = focal_sum(_tiles_ds(tiles, tile), tile=tile).to_pandas()
    return {(r.tile_x, r.tile_y): r.focal_total
            for r in got.itertuples(index=False)}


def test_focal_full_mosaic(ray_session):
    rng = np.random.default_rng(1)
    tiles = {(x, y): rng.integers(0, 251, (32, 32))
             for x in range(3) for y in range(3)}
    assert _run(tiles) == _global_oracle(tiles)


def test_focal_mosaic_with_hole(ray_session):
    # missing center tile -> its halo contributions are zeros on both
    # sides (engine drops strips sent to absent tiles; oracle zeros)
    rng = np.random.default_rng(2)
    tiles = {(x, y): rng.integers(0, 251, (32, 32))
             for x in range(3) for y in range(3) if (x, y) != (1, 1)}
    assert _run(tiles) == _global_oracle(tiles)


def test_focal_single_tile(ray_session):
    rng = np.random.default_rng(3)
    tiles = {(0, 0): rng.integers(0, 251, (32, 32))}
    assert _run(tiles) == _global_oracle(tiles)


def _grad_oracle(tiles: dict, tile=32):
    xs = [k[0] for k in tiles]; ys = [k[1] for k in tiles]
    W, H = (max(xs) + 1) * tile, (max(ys) + 1) * tile
    G = np.zeros((H + 2, W + 2), np.int64)
    for (x, y), img in tiles.items():
        G[1 + y * tile:1 + (y + 1) * tile, 1 + x * tile:1 + (x + 1) * tile] = img
    a = G[0:H, 0:W]; b = G[0:H, 1:W+1]; c = G[0:H, 2:W+2]
    d = G[1:H+1, 0:W]; f = G[1:H+1, 2:W+2]
    g = G[2:H+2, 0:W]; h = G[2:H+2, 1:W+1]; i_ = G[2:H+2, 2:W+2]
    gx = (c + 2*f + i_) - (a + 2*d + g)
    gy = (g + 2*h + i_) - (a + 2*b + c)
    out = {}
    for (x, y) in tiles:
        sl = np.s_[y*tile:(y+1)*tile, x*tile:(x+1)*tile]
        out[(x, y)] = (int(np.abs(gx[sl]).sum()), int(np.abs(gy[sl]).sum()),
                       int((gx[sl]**2 + gy[sl]**2).sum()))
    return out


def test_focal_gradients_match_global_oracle(ray_session):
    from solaris_ray.stages.focal import focal_gradients

    rng = np.random.default_rng(5)
    tiles = {(x, y): rng.integers(0, 256, (32, 32)) for x in range(3) for y in range(2)}
    out = focal_gradients(_tiles_ds(tiles), tile=32).to_pandas()
    want = _grad_oracle(tiles)
    got = {(r.tile_x, r.tile_y): (r.abs_gx, r.abs_gy, r.grad_sq)
           for r in out.itertuples()}
    assert got == want


def test_focal_gradients_flat_dem_is_zero(ray_session):
    from solaris_ray.stages.focal import focal_gradients

    # constant interior has zero gradient except at the mosaic edge
    tiles = {(0, 0): np.full((32, 32), 100)}
    out = focal_gradients(_tiles_ds(tiles), tile=32).to_pandas().iloc[0]
    want = _grad_oracle(tiles)[(0, 0)]
    assert (out.abs_gx, out.abs_gy, out.grad_sq) == want
    # interior-only check: a 30x30 inner region of a constant tile is flat
    rng_tiles = {(0, 0): np.full((32, 32), 7), (1, 0): np.full((32, 32), 7)}
    o2 = focal_gradients(_tiles_ds(rng_tiles), tile=32).to_pandas()
    w2 = _grad_oracle(rng_tiles)
    for r in o2.itertuples():
        assert (r.abs_gx, r.abs_gy, r.grad_sq) == w2[(r.tile_x, r.tile_y)]
