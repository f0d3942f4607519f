"""SAR sensor calibration (solaris/preproc/sar.py:339-660): Capella /
TerraSAR-X scale factors, grid->GCPs, grid->polygon, common-window
stack alignment — kernels + Dataset wrappers."""

import json

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.raster import codec
from solaris_ray.stages import calibrate as cal
from solaris_ray.stages import preproc as pp


# --- f64 codec -------------------------------------------------------------

def test_f64_roundtrip_2d_and_3d():
    a = np.arange(12, dtype=np.float64).reshape(3, 4)
    assert np.array_equal(codec.decode(codec.encode(a, "f64"), "f64"), a)
    b = np.linspace(-1, 1, 24).reshape(2, 4, 3)
    assert np.array_equal(codec.decode(codec.encode(b, "f64"), "f64"), b)


# --- scale factors -----------------------------------------------------------

CAPELLA_META = json.dumps({"collect": {"image": {"scale_factor": 3.0}}})
TSX_XML = "<root><calibration><calFactor>4.0</calFactor></calibration></root>"


def test_capella_scale_factor():
    img = np.arange(8, dtype=np.float64).reshape(2, 4)
    assert np.array_equal(cal.capella_scale(img, CAPELLA_META), 3.0 * img)


def test_terrasarx_scale_is_sqrt():
    img = np.ones((2, 2, 2))
    assert np.allclose(cal.terrasarx_scale(img, TSX_XML), 2.0)


def test_calibrate_scenes_dataset(ray_session):
    imgs = [np.full((4, 4), float(i + 1)) for i in range(3)]
    tbl = pa.table(
        {
            "scene_id": pa.array([0, 1, 2], pa.int64()),
            "bytes": pa.array([codec.encode(a, "f64") for a in imgs], pa.binary()),
            "fmt": pa.array(["f64"] * 3),
            "meta": pa.array([CAPELLA_META] * 3),
        }
    )
    out = cal.calibrate_scenes(ray.data.from_arrow(tbl), "capella").take_all()
    for row in out:
        arr = codec.decode(row["bytes"], row["fmt"])
        assert np.allclose(arr, 3.0 * (row["scene_id"] + 1))
        assert row["fmt"] == "f64"


# --- grids -------------------------------------------------------------------

def _affine_grid(h, w, lat0=10.0, lon0=20.0, dlat_r=2**-8, dlon_c=2**-10):
    """lat = lat0 + r*dlat_r, lon = lon0 + c*dlon_c, alt = (3r+5c) % 17 —
    dyadic steps keep every value exact in float64."""
    rr, cc = np.indices((h, w))
    return np.stack(
        [lat0 + rr * dlat_r, lon0 + cc * dlon_c, (3 * rr + 5 * cc) % 17], axis=2
    ).astype(np.float64)


def test_grid_to_gcps_sampling_and_affine_recovery():
    g = _affine_grid(301, 451)
    gcps = cal.grid_to_gcps(g, spacing=150)
    # rows 0,150,300 x cols 0,150,300,450
    assert gcps.shape == (12, 5)
    px, py = gcps[:, 0], gcps[:, 1]
    assert np.array_equal(gcps[:, 2], 20.0 + px * 2**-10)  # lon from col
    assert np.array_equal(gcps[:, 3], 10.0 + py * 2**-8)   # lat from row
    assert np.array_equal(gcps[:, 4], (3 * py + 5 * px) % 17)
    t = pp.fit_gcp_affine(gcps[:, :4])
    # recovered affine maps pixel -> (lon, lat) exactly
    assert np.allclose([t.a, t.b, t.c], [2**-10, 0.0, 20.0], atol=1e-12)
    assert np.allclose([t.d, t.e, t.f], [0.0, 2**-8, 10.0], atol=1e-12)


def test_grid_to_gcps_ranges_and_asymmetric_spacing():
    g = _affine_grid(100, 100)
    gcps = cal.grid_to_gcps(g, row_range=(10, 50), col_range=(0, 30),
                            row_spacing=20, col_spacing=15)
    rows = sorted(set(gcps[:, 1].tolist()))
    cols = sorted(set(gcps[:, 0].tolist()))
    assert rows == [10.0, 30.0, 50.0]
    assert cols == [0.0, 15.0, 30.0]


def test_terrasarx_georef_parse():
    xml = (
        "<georef><geolocationGrid>"
        + "".join(
            f"<gridPoint><lon>{c}.5</lon><lat>{r}.25</lat><height>{r+c}</height>"
            f"<col>{c}</col><row>{r}</row></gridPoint>"
            for r in range(2)
            for c in range(3)
        )
        + "</geolocationGrid></georef>"
    )
    gcps = cal.terrasarx_georef_to_gcps(xml)
    assert gcps.shape == (6, 5)
    assert np.array_equal(gcps[:, 0], [0, 1, 2, 0, 1, 2])
    assert np.array_equal(gcps[:, 3], [0.25, 0.25, 0.25, 1.25, 1.25, 1.25])


def test_attach_grid_gcps_join(ray_session):
    grids_tbl = pa.table(
        {
            "scene_id": pa.array([0, 1], pa.int64()),
            "bytes": pa.array(
                [codec.encode(_affine_grid(61, 61, lat0=float(10 + k)), "f64") for k in range(2)],
                pa.binary(),
            ),
            "fmt": pa.array(["f64"] * 2),
        }
    )
    scenes_tbl = pa.table(
        {
            "scene_id": pa.array([0, 1], pa.int64()),
            "name": pa.array(["a", "b"]),
        }
    )
    out = cal.attach_grid_gcps(
        ray.data.from_arrow(scenes_tbl), ray.data.from_arrow(grids_tbl),
        spacing=30,
    ).take_all()
    assert len(out) == 2
    for row in out:
        gcps = cal.unpack_gcps(row["gcps"])
        assert gcps.shape == (9, 5)  # rows/cols 0,30,60
        assert np.array_equal(gcps[0, 2:4], [20.0, 10.0 + row["scene_id"]])


# --- polygon -----------------------------------------------------------------

def test_grid_polygon_point_count_and_ring_closed():
    g = _affine_grid(201, 301)
    lons, lats, flags, geojson = cal.grid_to_polygon(g, step=100)
    # edges: rows 0..199 step 100 (2) + cols 0..299 (3) + rows 200..1 (2)
    # + cols 300..1 (3) + closing point
    assert len(lons) == 11
    assert lons[0] == lons[-1] and lats[0] == lats[-1]
    doc = json.loads(geojson)
    ring = doc["features"][0]["geometry"]["coordinates"][0]
    assert len(ring) == 11 and ring[0] == ring[-1]


@pytest.mark.parametrize(
    "lat_slant,flip_lon,north,east",
    [
        # northlooking = lat rises across the TOP row's columns
        # (corner3 vs corner0, sar.py:456); eastlooking likewise for lon
        (0, 1, False, True),
        (0, -1, False, False),
        (1, 1, True, True),
        (1, -1, True, False),
    ],
)
def test_grid_polygon_orientation_flags(lat_slant, flip_lon, north, east):
    rr, cc = np.indices((101, 101))
    g = np.stack(
        [
            10.0 + rr * 2**-8 + lat_slant * cc * 2**-12,
            20.0 + flip_lon * cc * 2**-10,
            np.zeros((101, 101)),
        ],
        axis=2,
    )
    lons, lats, (ccw, n, e), _ = cal.grid_to_polygon(g, step=50)
    assert (n, e) == (north, east)
    # output ring is ALWAYS counterclockwise in lon/lat space after
    # the enforced reversal: signed shoelace area > 0
    area = 0.5 * np.sum(lons[:-1] * lats[1:] - lons[1:] * lats[:-1])
    assert area > 0


def test_grid_polygons_dataset(ray_session):
    tbl = pa.table(
        {
            "scene_id": pa.array([7], pa.int64()),
            "bytes": pa.array([codec.encode(_affine_grid(101, 101), "f64")], pa.binary()),
            "fmt": pa.array(["f64"]),
        }
    )
    rows = cal.grid_polygons(ray.data.from_arrow(tbl), step=50).take_all()
    assert len(rows) == 9  # 2+2+2+2 edge points + closing
    # ccw flag records the AS-SAMPLED orientation (False for this
    # grid: the edge walk runs clockwise in lon/lat and is reversed)
    assert all(r["scene_id"] == 7 and not r["ccw"] for r in rows)


# --- common window -----------------------------------------------------------

def _shifted_grid(h, w, off_r, off_c, sub_r=0.0, sub_c=0.0):
    """Grid whose (0,0) pixel sits at master-row off_r, master-col
    off_c (plus a subpixel part) in the shared geography."""
    rr, cc = np.indices((h, w))
    lat = 10.0 + (rr + off_r + sub_r) * 2**-8
    lon = 20.0 + (cc + off_c + sub_c) * 2**-10
    return np.stack([lat, lon, np.zeros((h, w))], axis=2)


def test_common_window_integer_offsets():
    master = _shifted_grid(41, 41, 0, 0)
    shifted = _shifted_grid(41, 41, 5, -3)  # starts 5 rows south, 3 cols west
    windows, fine = cal.grid_common_window([master, shifted])
    assert np.allclose(fine, 0.0, atol=1e-9)
    w0, w1 = windows
    # master ref pixel (20,20); shifted's nearest pixel to the same
    # lat/lon is (15, 23).  extents: m=[20,20,20,20], s=[23,25,17,15]
    # mins=[20,20,17,15] -> windows per the reference arithmetic
    assert w0 == [0, 40, 37, 5]
    assert w1 == [3, 35, 40, 0]
    # both windows have identical size
    assert (w0[2] - w0[0], w0[1] - w0[3]) == (w1[2] - w1[0], w1[1] - w1[3])


def test_common_window_subpixel_offsets():
    master = _shifted_grid(41, 41, 0, 0)
    shifted = _shifted_grid(41, 41, 2, 1, sub_r=-0.25, sub_c=0.375)
    _, fine = cal.grid_common_window([master, shifted])
    # fine offset points from the nearest pixel TOWARD the reference
    assert np.allclose(fine[1], [0.25, -0.375], atol=1e-6)


def test_common_windows_dataset(ray_session):
    stacks = []
    for s in range(3):
        stacks.append((s, 0, _shifted_grid(31, 31, 0, 0)))
        stacks.append((s, 1, _shifted_grid(31, 31, s + 1, 0)))
    tbl = pa.table(
        {
            "stack_id": pa.array([t[0] for t in stacks], pa.int64()),
            "scene_id": pa.array([t[1] for t in stacks], pa.int64()),
            "bytes": pa.array([codec.encode(t[2], "f64") for t in stacks], pa.binary()),
            "fmt": pa.array(["f64"] * len(stacks)),
        }
    )
    rows = cal.common_windows(ray.data.from_arrow(tbl)).take_all()
    assert len(rows) == 6
    by_stack = {}
    for r in rows:
        by_stack.setdefault(r["stack_id"], []).append(r)
    for s, rs in by_stack.items():
        rs.sort(key=lambda r: r["scene_id"])
        # overlap shrinks by the stack's shift; sizes match across grids
        h0 = rs[0]["row_max"] - rs[0]["row_min"]
        h1 = rs[1]["row_max"] - rs[1]["row_min"]
        assert h0 == h1 == 30 - (s + 1)
