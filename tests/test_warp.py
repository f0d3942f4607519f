"""Raster warp/reproject kernel tests.

Independent oracles: identity warp, nearest integer upscale vs
np.repeat, 90-degree rotation vs np.rot90, bilinear round-trip PSNR,
and a UTM->4326->UTM CRS round-trip (raster branch of
/root/reference/solaris/utils/geo.py:24-107, tiler warp
raster_tile.py:350-365).
"""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.geom.affine import Affine
from solaris_ray.raster import codec
from solaris_ray.raster.warp import (
    calculate_default_transform,
    crs_transformer,
    warp_affine,
)


def _img(size=64, seed=3):
    rng = np.random.default_rng(seed)
    yy, xx = np.indices((size, size))
    base = ((xx * 3 + yy * 5) % 256).astype(np.uint8)
    return np.clip(base.astype(np.int32) + rng.integers(0, 30, (size, size)), 0, 255).astype(np.uint8)


def test_identity_warp_exact():
    img = _img()
    t = Affine.from_origin(1000.0, 2000.0, 0.5, 0.5)
    out = warp_affine(img, t, t, img.shape, method="nearest")
    assert np.array_equal(out, img)
    out_b = warp_affine(img, t, t, img.shape, method="bilinear")
    assert np.array_equal(out_b, img)


def test_nearest_2x_upscale_is_repeat():
    img = _img(32)
    t = Affine.from_origin(0.0, 32.0, 1.0, 1.0)
    dst = Affine.from_origin(0.0, 32.0, 0.5, 0.5)
    out = warp_affine(img, t, dst, (64, 64), method="nearest")
    assert np.array_equal(out, np.repeat(np.repeat(img, 2, axis=0), 2, axis=1))


def test_rot90_affine():
    img = _img(16)
    t = Affine.from_origin(0.0, 16.0, 1.0, 1.0)
    # dst grid whose x axis walks down source rows: 90-degree rotation
    dst = Affine(0.0, 1.0, 0.0, 1.0, 0.0, 0.0)
    # dst pixel (r, c) center -> geo (r+0.5, c+0.5); src px = (x, 16-y)
    out = warp_affine(img, t, dst, (16, 16), method="nearest")
    # geo x = col_src, geo y = 16 - row_src -> out[r, c] = img[15-c, r]
    expect = np.rot90(img, k=-1)[:, ::-1]  # derive independently below
    manual = np.empty_like(img)
    for r in range(16):
        for c in range(16):
            gx, gy = r + 0.5, c + 0.5
            sx, sy = int(gx), int(16.0 - gy)
            manual[r, c] = img[sy, sx]
    assert np.array_equal(out, manual)


def test_bilinear_halfpixel_shift_matches_mean():
    img = _img(32).astype(np.float64)
    t = Affine.from_origin(0.0, 32.0, 1.0, 1.0)
    dst = Affine(1.0, 0.0, 0.5, 0.0, -1.0, 32.0)  # half-pixel x shift
    out = warp_affine(img, t, dst, (32, 32), method="bilinear")
    # interior: out[r, c] = mean(img[r, c], img[r, c+1])
    expect = (img[:, :-1] + img[:, 1:]) / 2.0
    assert np.allclose(out[:, : 31], expect, atol=1e-9)


def _smooth(size):
    """Band-limited image (bilinear resampling is only near-lossless on
    smooth content; noise is legitimately destroyed by interpolation)."""
    yy, xx = np.indices((size, size), dtype=np.float64)
    v = 127 + 60 * np.sin(xx / 9.0) + 50 * np.cos(yy / 11.0)
    return np.clip(v, 0, 255).astype(np.uint8)


def test_bilinear_roundtrip_psnr():
    img = _smooth(64)
    t = Affine.from_origin(0.0, 64.0, 1.0, 1.0)
    up_t = Affine.from_origin(0.0, 64.0, 0.5, 0.5)
    up = warp_affine(img, t, up_t, (128, 128), method="bilinear")
    back = warp_affine(up, up_t, t, (64, 64), method="bilinear")
    assert codec.psnr(img, back) >= 40.0


def test_crs_roundtrip_warp_psnr():
    # UTM 16N image -> EPSG:4326 -> back; interior should survive >= 40 dB
    img = _smooth(96)
    t = Affine.from_origin(733601.0, 3725139.0, 0.5, 0.5)
    fwd, inv = crs_transformer(32616, 4326)
    dst_t, dw, dh = calculate_default_transform(t, 96, 96, fwd)
    warped = warp_affine(img, t, dst_t, (dh, dw), "bilinear", inv_fn=inv)
    _, inv2 = crs_transformer(4326, 32616)
    # warp back onto the ORIGINAL grid (same transform/shape) so the
    # comparison is pixel-aligned
    back = warp_affine(warped, dst_t, t, (96, 96), "bilinear", inv_fn=inv2)
    a = img[8:-8, 8:-8].astype(np.float64)
    b = back[8:-8, 8:-8].astype(np.float64)
    assert codec.psnr(a, b) >= 40.0


def test_reproject_raster_stage(ray_session):
    import ray

    from solaris_ray.raster.warp import reproject_raster

    img = _img(48)
    t = Affine.from_origin(733601.0, 3725139.0, 0.5, 0.5)
    tbl = pa.table(
        {
            "image_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([codec.encode(img, "png")], pa.binary()),
            "fmt": pa.array(["png"], pa.string()),
            "epsg": pa.array([32616], pa.int32()),
            "w": pa.array([48], pa.int32()),
            "h": pa.array([48], pa.int32()),
            "gt_a": pa.array([t.a]), "gt_b": pa.array([t.b]), "gt_c": pa.array([t.c]),
            "gt_d": pa.array([t.d]), "gt_e": pa.array([t.e]), "gt_f": pa.array([t.f]),
        }
    )
    out = reproject_raster(ray.data.from_arrow(tbl), 4326).to_pandas()
    assert len(out) == 1
    assert out["epsg"][0] == 4326
    assert abs(out["gt_a"][0]) < 1e-4  # degree-scale pixels now
    dec = codec.decode(out["bytes"][0], "png")
    assert dec.shape[:2] == (48, 48)


def test_tiler_dest_epsg_warp(ray_session):
    import ray

    from solaris_ray.sources import synth
    from solaris_ray.stages import tiler

    images, _ = synth.gen_shard(np.arange(2), 2, seed=42, size=128)
    tiles = tiler.cut_tiles(
        ray.data.from_arrow(images), tile_size=64, dest_epsg=4326
    ).to_pandas()
    assert len(tiles) == 8
    # degree-space bounds: x in UTM zone 16 lon range (-90..-84)
    assert (tiles["x0"] > -93).all() and (tiles["x1"] < -81).all()
    assert (tiles["y0"] > 25).all() and (tiles["y1"] < 40).all()
    # 3-decimal (non-metric) naming
    assert all("." in t.split("_", 2)[2] for t in tiles["tile_id"])


def test_reproject_raster_carries_nodata(ray_session):
    """ADVICE r2: a reprojected Dataset fed back into TileCutter must
    keep its (nonzero) nodata value instead of falling back to 0."""
    import ray

    from solaris_ray.raster.warp import reproject_raster

    img = _img(48)
    t = Affine.from_origin(733601.0, 3725139.0, 0.5, 0.5)
    tbl = pa.table(
        {
            "image_id": pa.array(["a"], pa.string()),
            "bytes": pa.array([codec.encode(img, "png")], pa.binary()),
            "fmt": pa.array(["png"], pa.string()),
            "epsg": pa.array([32616], pa.int32()),
            "w": pa.array([48], pa.int32()),
            "h": pa.array([48], pa.int32()),
            "gt_a": pa.array([t.a]), "gt_b": pa.array([t.b]), "gt_c": pa.array([t.c]),
            "gt_d": pa.array([t.d]), "gt_e": pa.array([t.e]), "gt_f": pa.array([t.f]),
            "nodata": pa.array([255.0], pa.float64()),
        }
    )
    out = reproject_raster(ray.data.from_arrow(tbl), 4326).to_pandas()
    assert "nodata" in out.columns
    assert out["nodata"][0] == 255.0
    # without a nodata input column the output omits it (schema-stable)
    out2 = reproject_raster(
        ray.data.from_arrow(tbl.drop_columns(["nodata"])), 4326
    ).to_pandas()
    assert "nodata" not in out2.columns


def test_tiler_warp_to_metric_dest_uses_int_names(ray_session):
    """ADVICE r2: save_tile naming keys on the DEST CRS unit
    (raster_tile.py:425-434) — a projected (UTM) warp target gets
    int-rounded tile names, not 3-decimal ones."""
    import ray

    from solaris_ray.sources import synth
    from solaris_ray.stages import tiler

    images, _ = synth.gen_shard(np.arange(1), 1, seed=42, size=128)
    # neighbour UTM zone: projected -> projected warp
    tiles = tiler.cut_tiles(
        ray.data.from_arrow(images), tile_size=64, dest_epsg=32617
    ).to_pandas()
    assert len(tiles) == 4
    assert all("." not in t.split("_", 2)[2] for t in tiles["tile_id"])
