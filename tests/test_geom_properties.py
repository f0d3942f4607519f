"""Property-based tests (hypothesis) for the geometry/CRS/codec core —
randomized adversaries for the kernels whose unit tests use fixed
fixtures."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from solaris_ray.geom import crs
from solaris_ray.raster import codec


@settings(max_examples=50, deadline=None)
@given(
    lon=st.floats(-179.99, 179.99),
    lat=st.floats(-84.9, 84.9),
)
def test_webmercator_roundtrip_property(lon, lat):
    x, y = crs.latlon_to_webmercator(np.array([lon]), np.array([lat]))
    lon2, lat2 = crs.webmercator_to_latlon(x, y)
    assert abs(lon2[0] - lon) < 1e-9
    assert abs(lat2[0] - lat) < 1e-9


@settings(max_examples=50, deadline=None)
@given(
    lon=st.floats(-86.9, -85.1),
    lat=st.floats(24.1, 55.0),
)
def test_utm_zone16_roundtrip_property(lon, lat):
    e, n, _ = crs.latlon_to_utm(np.array([lon]), np.array([lat]), zone=16)
    lon2, lat2 = crs.utm_to_latlon(e, n, 16)
    assert abs(lon2[0] - lon) < 1e-7
    assert abs(lat2[0] - lat) < 1e-7


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_tiled_vs_stripped_gtiff_identical_pixels(data):
    from solaris_ray.raster.gtiff import gtiff_decode, gtiff_encode

    h = data.draw(st.integers(1, 70))
    w = data.draw(st.integers(1, 70))
    c = data.draw(st.sampled_from([1, 3]))
    seed = data.draw(st.integers(0, 2**31))
    img = np.random.default_rng(seed).integers(
        0, 256, (h, w, c) if c > 1 else (h, w), dtype=np.uint8)
    a, _ = gtiff_decode(gtiff_encode(img))
    b, _ = gtiff_decode(gtiff_encode(img, tile=16))
    want = img if img.ndim == 3 else img[:, :, None]
    assert np.array_equal(a, want)
    assert np.array_equal(b, want)


@settings(max_examples=25, deadline=None)
@given(st.data())
def test_segment_pack_decode_roundtrip_property(data):
    """The round-5 owner-cell bias must make pack/decode a true
    inverse across the whole signed cell range."""
    from solaris_ray.stages.segjoin import _KEY_SHIFT, _cell_bias

    cell = data.draw(st.sampled_from([1, 16, 256, 4096]))
    lim = (1 << 20) // cell + 1
    cx = data.draw(st.integers(-lim, lim))
    cy = data.draw(st.integers(-lim, lim))
    off = _cell_bias(cell)
    key = (cx + off) * _KEY_SHIFT + (cy + off)
    assert key >= 0
    assert key // _KEY_SHIFT - off == cx
    assert key % _KEY_SHIFT - off == cy


@settings(max_examples=20, deadline=None)
@given(st.data())
def test_distinct_reduce_kernel_matches_pandas(data):
    """The in-bucket reduce kernel (lexsort + reduceat) vs pandas
    groupby on random multisets — driver-side kernel parity (the
    Dataset path is covered by tests/test_buckets.py)."""
    import pandas as pd

    from solaris_ray.stages import _buckets

    n = data.draw(st.integers(1, 300))
    seed = data.draw(st.integers(0, 2**31))
    rng = np.random.default_rng(seed)
    ka = rng.integers(-20, 20, n)
    kb = rng.integers(-20, 20, n)
    v = rng.integers(-1000, 1000, n)
    # run the reduce kernel exactly as the stage does, single bucket
    tbl = pa.table({
        "a": pa.array(ka, pa.int64()), "b": pa.array(kb, pa.int64()),
        "v": pa.array(v, pa.int64()),
    })
    order = np.lexsort((kb, ka))
    sa, sb, sv = ka[order], kb[order], v[order]
    new = np.ones(n, bool)
    if n > 1:
        new[1:] = (sa[1:] != sa[:-1]) | (sb[1:] != sb[:-1])
    starts = np.flatnonzero(new)
    got = {(int(a_), int(b_)): int(m) for a_, b_, m in zip(
        sa[starts], sb[starts], np.minimum.reduceat(sv, starts))}
    want = pd.DataFrame({"a": ka, "b": kb, "v": v}).groupby(["a", "b"]).v.min()
    assert got == {k: int(x) for k, x in want.items()}


@settings(max_examples=30, deadline=None)
@given(st.data())
def test_png_roundtrip_property(data):
    h = data.draw(st.integers(1, 48))
    w = data.draw(st.integers(1, 48))
    seed = data.draw(st.integers(0, 2**31))
    img = np.random.default_rng(seed).integers(0, 256, (h, w), dtype=np.uint8)
    assert np.array_equal(codec.decode(codec.encode(img, "png"), "png"), img)


@settings(max_examples=40, deadline=None)
@given(
    lon0=st.floats(-179.0, 178.0),
    lat0=st.floats(-80.0, 79.0),
    dlon=st.floats(0.001, 0.5),
    dlat=st.floats(0.001, 0.5),
)
def test_geodesic_rect_area_matches_closed_form(lon0, lat0, dlon, dlat):
    from solaris_ray.geom.sphere import R_MEAN, ring_area_sphere

    xs = [lon0, lon0 + dlon, lon0 + dlon, lon0]
    ys = [lat0, lat0, lat0 + dlat, lat0 + dlat]
    got = ring_area_sphere(np.array(xs), np.array(ys))
    # exact spherical rect area: R^2 * dlam * (sin(p1) - sin(p0))
    want = R_MEAN**2 * np.radians(dlon) * (
        np.sin(np.radians(lat0 + dlat)) - np.sin(np.radians(lat0)))
    assert abs(got - abs(want)) < max(1e-6 * abs(want), 1e-3)


def test_geodesic_area_equator_degree_square():
    from solaris_ray.geom.sphere import ring_area_sphere

    # a 1-deg square at the equator is about 111.19 km x 111.19 km
    a = ring_area_sphere(np.array([0.0, 1.0, 1.0, 0.0]),
                         np.array([-0.5, -0.5, 0.5, 0.5]))
    assert abs(a - 111.19e3**2) < 0.01e9  # within 10 km^2


def test_geodesic_degenerate_ring_zero():
    from solaris_ray.geom.sphere import ring_area_sphere

    assert ring_area_sphere(np.array([1.0, 2.0]), np.array([3.0, 3.0])) == 0.0


def test_haversine_known_distance():
    from solaris_ray.stages.knn import haversine_m

    # equator: 1 degree of longitude = R * pi/180 ≈ 111.195 km
    d = haversine_m(np.array([0.0]), np.array([0.0]),
                    np.array([1.0]), np.array([0.0]))
    assert abs(d[0] - 6371008.8 * np.pi / 180) < 1e-6
    # antipodal points: half circumference
    d2 = haversine_m(np.array([0.0]), np.array([0.0]),
                     np.array([180.0]), np.array([0.0]))
    assert abs(d2[0] - 6371008.8 * np.pi) < 1e-3
    assert haversine_m(np.array([5.0]), np.array([5.0]),
                       np.array([5.0]), np.array([5.0]))[0] == 0.0


def test_haversine_topk_brute_parity(ray_session):
    import ray.data

    from solaris_ray.stages.knn import haversine_m, haversine_topk

    rng = np.random.default_rng(3)
    n = 400
    lon = rng.uniform(-10, 10, n)
    lat = rng.uniform(40, 50, n)
    pts = pa.table({
        "point_id": pa.array(np.arange(n), pa.int64()),
        "lon": pa.array(lon), "lat": pa.array(lat),
    })
    qlon, qlat = np.array([0.0, 5.0]), np.array([45.0, 42.0])
    out = haversine_topk(ray.data.from_arrow(pts), np.array([0, 1]),
                         qlon, qlat, k=4).to_pandas()
    for qi in (0, 1):
        d = haversine_m(np.full(n, qlon[qi]), np.full(n, qlat[qi]), lon, lat)
        dmm = np.trunc(d * 1000).astype(np.int64)
        order = np.lexsort((np.arange(n), dmm))[:4]
        got = out[out.query_id == qi].sort_values("rank")
        assert got.point_id.tolist() == order.tolist()
        assert got.dist_mm.tolist() == dmm[order].tolist()
