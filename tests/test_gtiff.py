"""Pure-struct GeoTIFF codec + mask sink tests.

Mirrors the reference's mask sink round-trip
(/root/reference/tests/test_vector/test_mask.py:11-44: make mask ->
write GTiff -> read back -> array_equal) without GDAL/skimage: the
engine's own encoder/decoder is exercised, and the bitstream layout is
additionally validated against a hand-rolled independent TIFF/IFD
parser in the test (struct-level, not the codec's own reader).
"""

import struct

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.raster.gtiff import gtiff_decode, gtiff_encode


def test_roundtrip_dtypes_and_geo():
    rng = np.random.default_rng(5)
    t = (0.5, 0.0, 733601.0, 0.0, -0.5, 3725139.0)
    for arr in [
        rng.integers(0, 255, (37, 53), dtype=np.uint8),
        rng.integers(0, 255, (64, 64, 3), dtype=np.uint8),
        rng.integers(0, 60000, (32, 48)).astype(np.uint16),
        rng.normal(size=(16, 16, 2)).astype(np.float32),
        rng.integers(-30000, 30000, (20, 20)).astype(np.int16),
    ]:
        buf = gtiff_encode(arr, transform=t, epsg=32616, nodata=0)
        dec, meta = gtiff_decode(buf)
        a3 = arr[:, :, None] if arr.ndim == 2 else arr
        assert np.array_equal(dec, a3)
        assert meta == {"transform": t, "epsg": 32616, "nodata": 0.0}


def test_rotated_transform_uses_model_transformation():
    t = (1.0, 0.2, 5.0, 0.1, -1.0, 9.0)
    buf = gtiff_encode(np.zeros((8, 8), np.uint8), transform=t, epsg=4326, nodata=1.5)
    _, meta = gtiff_decode(buf)
    assert meta["transform"] == t
    assert meta["epsg"] == 4326 and meta["nodata"] == 1.5


def test_no_geo_tags_is_plain_tiff():
    buf = gtiff_encode(np.arange(64, dtype=np.uint8).reshape(8, 8))
    dec, meta = gtiff_decode(buf)
    assert meta == {"transform": None, "epsg": None, "nodata": None}
    assert np.array_equal(dec[:, :, 0], np.arange(64, dtype=np.uint8).reshape(8, 8))


def _parse_ifd_independent(buf):
    """Minimal independent TIFF parser (test-local, no codec reuse)."""
    assert buf[:2] == b"II" and struct.unpack("<H", buf[2:4])[0] == 42
    (off,) = struct.unpack("<I", buf[4:8])
    (n,) = struct.unpack("<H", buf[off : off + 2])
    tags = {}
    for i in range(n):
        p = off + 2 + 12 * i
        t, ty, cnt = struct.unpack("<HHI", buf[p : p + 8])
        tags[t] = (ty, cnt, buf[p + 8 : p + 12])
    return tags


def test_bitstream_layout_spec():
    """Tag ids sorted ascending, required baseline tags present, strip
    offsets point at the actual pixel bytes."""
    img = np.arange(48, dtype=np.uint8).reshape(6, 8)
    buf = gtiff_encode(img, transform=(1, 0, 0, 0, -1, 6), epsg=32616, nodata=0)
    tags = _parse_ifd_independent(buf)
    for required in (256, 257, 258, 259, 262, 273, 277, 278, 279, 284, 339):
        assert required in tags
    assert sorted(tags) == list(tags)
    ty, cnt, val = tags[273]
    (strip_off,) = struct.unpack("<I", val)  # count 1 -> inline
    assert buf[strip_off : strip_off + 48] == img.tobytes()


def test_masks_to_geotiff_sink(ray_session, tmp_path):
    """Reference mask-sink flow: rasterize -> multiband GTiff -> file ->
    read back -> equal channels (test_mask.py:23-39 analogue)."""
    import ray

    from solaris_ray.raster import codec
    from solaris_ray.stages import export, masks

    ts = 64
    g = pa.table(
        {
            "tile_id": pa.array(["t0"] * 2),
            "image_id": pa.array(["img"] * 2),
            "feature_id": pa.array([1, 2], pa.int64()),
            "class": pa.array(["building", "building"]),
            "xs": pa.array([[5.0, 20.0, 20.0, 5.0], [30.0, 50.0, 50.0, 30.0]], pa.list_(pa.float64())),
            "ys": pa.array([[5.0, 5.0, 18.0, 18.0], [22.0, 22.0, 40.0, 40.0]], pa.list_(pa.float64())),
            "x0": pa.array([0.0] * 2),
            "y0": pa.array([0.0] * 2),
            "x1": pa.array([64.0] * 2),
            "y1": pa.array([64.0] * 2),
        }
    )
    mk = masks.masks_from_join(ray.data.from_arrow(g), tile_size=ts)
    out = export.masks_to_geotiff(mk, epsg=32616, nodata=0.0).to_pandas()
    assert len(out) == 1 and out.iloc[0]["fmt"] == "gtif"
    p = tmp_path / f"{out.iloc[0]['tile_id']}.tif"
    p.write_bytes(out.iloc[0]["bytes"])
    dec, meta = gtiff_decode(p.read_bytes())
    assert meta["epsg"] == 32616 and meta["nodata"] == 0.0
    mk_df = mk.to_pandas()
    for j, ch in enumerate(("footprint", "boundary", "contact")):
        assert np.array_equal(dec[:, :, j], codec.decode(mk_df.iloc[0][ch], "png"))
