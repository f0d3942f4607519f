"""SAR sensor calibration — Capella / TerraSAR-X metadata-driven
radiometric + geometric calibration, re-expressed Ray-Data-first.

Reference surface (/root/reference/solaris/preproc/sar.py:339-660):

- ``CapellaScaleFactor``       (sar.py:339-348)  — scale complex/amp
  data by ``collect.image.scale_factor`` from the TIFF-tag JSON.
- ``CapellaGridToGCPs``        (sar.py:351-406)  — sample a [lat, lon,
  alt] grid raster every ``spacing`` pixels into GCPs.
- ``CapellaGridToPolygon``     (sar.py:409-475)  — walk the grid edges
  into a counterclockwise EPSG:4326 boundary ring (GeoJSON), with
  (counterclockwise, northlooking, eastlooking) orientation flags.
- ``CapellaGridCommonWindow``  (sar.py:478-597)  — align a stack of
  translated grids: haversine hill-climb to the master's center
  point, first-order subpixel offsets, intersected pixel windows.
- ``TerraSARXScaleFactor``     (sar.py:600-616)  — scale complex data
  by sqrt(calFactor) from the annotation XML.
- ``TerraSARXGeorefToGCPs``    (sar.py:619-660)  — parse
  ``geolocationGrid/gridPoint`` entries from GEOREF.xml into GCPs.

The reference runs these as per-scene PipeSegments over in-memory GDAL
objects.  Here every scene is a ROW: pixels live in a binary ``bytes``
column (fmt "f64" carries float/complex data losslessly; complex is
(re, im) channel pairs, the house convention of stages/preproc.py),
metadata in string columns (JSON / XML — stdlib parse, no GDAL), and
grids are f64-encoded [H, W, 3] (lat, lon, alt) binary rows.  Scale
factors are stateless ``map_batches`` kernels; grid ops are per-row
kernels; the common-window stack alignment is a ``groupby(stack_id)``
``map_groups`` (a stack is a handful of grids — the group IS the unit
of work, thousands of stacks parallelize across the cluster).

GCP layout everywhere: float64 rows ``(px, py, lon, lat, alt)`` —
px = column, py = row — so ``preproc.fit_gcp_affine(gcps[:, :4])`` and
``preproc.orthorectify`` consume them directly.
"""

from __future__ import annotations

import json
import math
import xml.etree.ElementTree as ET

import numpy as np
import pyarrow as pa

from ..raster import codec

EARTH_RADIUS_M = 6.371e6


# --- radiometric scale factors (per-pixel kernels) ------------------------

def capella_scale(img: np.ndarray, meta_json: str) -> np.ndarray:
    """CapellaScaleFactor (sar.py:339-348): multiply by the collect's
    ``scale_factor``.  ``meta_json`` is the TIFFTAG_IMAGEDESCRIPTION
    payload (a JSON document)."""
    factor = float(json.loads(meta_json)["collect"]["image"]["scale_factor"])
    return factor * img.astype(np.float64)


def terrasarx_scale(img: np.ndarray, cal_xml: str) -> np.ndarray:
    """TerraSARXScaleFactor (sar.py:600-616): multiply complex data by
    sqrt(calFactor) from the annotation XML."""
    root = ET.fromstring(cal_xml)
    factor = float(next(iter(root.iter("calFactor"))).text)
    return math.sqrt(factor) * img.astype(np.float64)


class ScaleCalibrator:
    """map_batches body: decode -> sensor scale kernel -> f64 encode.

    ``sensor`` in {"capella", "terrasarx"}; ``meta_col`` holds the
    JSON (Capella) or XML (TerraSAR-X) sidecar string per row."""

    def __init__(self, sensor: str, meta_col: str = "meta"):
        assert sensor in ("capella", "terrasarx")
        self.kernel = capella_scale if sensor == "capella" else terrasarx_scale
        self.meta_col = meta_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = []
        for i in range(batch.num_rows):
            img = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            out.append(codec.f64_encode(self.kernel(img, batch[self.meta_col][i].as_py())))
        keep = {n: batch[n] for n in batch.column_names if n not in ("bytes", "fmt")}
        keep["bytes"] = pa.array(out, pa.binary())
        keep["fmt"] = pa.array(["f64"] * batch.num_rows, pa.string())
        return pa.table(keep)


def calibrate_scenes(scenes, sensor: str, meta_col: str = "meta", batch_size: int = 8):
    """Dataset wrapper: radiometric calibration as a streaming stage."""
    return scenes.map_batches(
        ScaleCalibrator(sensor, meta_col), batch_format="pyarrow", batch_size=batch_size
    )


# --- grid -> GCPs ---------------------------------------------------------

def grid_to_gcps(
    grid: np.ndarray,
    spacing: int = 150,
    row_range: tuple[int, int] | None = None,
    col_range: tuple[int, int] | None = None,
    row_spacing: int | None = None,
    col_spacing: int | None = None,
) -> np.ndarray:
    """CapellaGridToGCPs (sar.py:351-406): sample the [H, W, 3]
    (lat, lon, alt) grid every spacing pixels -> (N, 5) float64 rows
    (px, py, lon, lat, alt).  Vectorized (the reference's double
    Python loop over sample points becomes one fancy-index)."""
    h, w = grid.shape[:2]
    rlo, rhi = row_range if row_range is not None else (0, h - 1)
    clo, chi = col_range if col_range is not None else (0, w - 1)
    rs = row_spacing if row_spacing is not None else spacing
    cs = col_spacing if col_spacing is not None else spacing
    rr = np.arange(rlo, rhi + 1, rs)
    cc = np.arange(clo, chi + 1, cs)
    ri, ci = np.meshgrid(rr, cc, indexing="ij")
    ri, ci = ri.ravel(), ci.ravel()
    return np.stack(
        [
            ci.astype(np.float64),          # px = column
            ri.astype(np.float64),          # py = row
            grid[ri, ci, 1],                # lon (band 1)
            grid[ri, ci, 0],                # lat (band 0)
            grid[ri, ci, 2],                # alt (band 2)
        ],
        axis=1,
    )


def terrasarx_georef_to_gcps(georef_xml: str) -> np.ndarray:
    """TerraSARXGeorefToGCPs (sar.py:619-660): parse
    geolocationGrid/gridPoint entries -> (N, 5) (px, py, lon, lat, alt)."""
    root = ET.fromstring(georef_xml)
    rows = [
        (
            float(gp.find("col").text),
            float(gp.find("row").text),
            float(gp.find("lon").text),
            float(gp.find("lat").text),
            float(gp.find("height").text),
        )
        for gp in root.findall("./geolocationGrid/gridPoint")
    ]
    return np.asarray(rows, dtype=np.float64).reshape(-1, 5)


def attach_grid_gcps(scenes, grids, on: str = "scene_id", spacing: int = 150,
                     strategy: str = "auto"):
    """Join each scene row to its grid row (1:1 on an int64 key) and
    attach a packed-f64 ``gcps`` binary column ((N, 5) rows; unpack
    with ``unpack_gcps``).  Grid pixels never ride along — the grid
    side is reduced to (key, gcps) FIRST, so the join moves only the
    sampled points, not [H, W, 3] rasters."""
    from .relational import hash_join

    def _sample(batch: pa.Table) -> pa.Table:
        gcps = []
        for i in range(batch.num_rows):
            g = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            gcps.append(grid_to_gcps(g, spacing=spacing).tobytes())
        return pa.table({"grid_key": batch[on], "gcps": pa.array(gcps, pa.binary())})

    gcp_rows = grids.map_batches(_sample, batch_format="pyarrow", batch_size=8)
    return hash_join(scenes, gcp_rows, on, "grid_key", how="inner", strategy=strategy)


def unpack_gcps(buf: bytes) -> np.ndarray:
    return np.frombuffer(buf, dtype=np.float64).reshape(-1, 5)


# --- grid -> boundary polygon ---------------------------------------------

def _edge_walk(nrows: int, ncols: int, step: int):
    """Pixel indices of the 4-edge boundary walk (sar.py:420-445),
    plus the 4 corner start indices.  Order matches the reference:
    left edge down, bottom edge right, right edge up, top edge left."""
    r0 = np.arange(0, nrows - 1, step)
    e0 = np.stack([r0, np.zeros_like(r0)], axis=1)
    c1 = np.arange(0, ncols - 1, step)
    e1 = np.stack([np.full_like(c1, nrows - 1), c1], axis=1)
    r2 = np.arange(nrows - 1, 0, -step)
    e2 = np.stack([r2, np.full_like(r2, ncols - 1)], axis=1)
    c3 = np.arange(ncols - 1, 0, -step)
    e3 = np.stack([np.zeros_like(c3), c3], axis=1)
    walk = np.concatenate([e0, e1, e2, e3], axis=0)
    walk = np.concatenate([walk, walk[:1]], axis=0)  # close the ring
    corners = np.stack([e0[0], e1[0], e2[0], e3[0]], axis=0)
    return walk, corners


def grid_to_polygon(grid: np.ndarray, step: int = 100, name: str = "grid"):
    """CapellaGridToPolygon (sar.py:409-475): boundary ring of the
    grid's lat/lon extent as (lons, lats) arrays enforced
    counterclockwise, plus the reference's orientation flags
    (counterclockwise-as-sampled, northlooking, eastlooking) and the
    GeoJSON string the reference emits."""
    nrows, ncols = grid.shape[:2]
    walk, corners = _edge_walk(nrows, ncols, step)
    lats = grid[walk[:, 0], walk[:, 1], 0]
    lons = grid[walk[:, 0], walk[:, 1], 1]
    clat = grid[corners[:, 0], corners[:, 1], 0]
    clon = grid[corners[:, 0], corners[:, 1], 1]
    vi = (clon[1] - clon[0], clat[1] - clat[0])
    vf = (clon[0] - clon[3], clat[0] - clat[3])
    ccw = bool(vf[0] * vi[1] - vf[1] * vi[0] > 0)
    if not ccw:
        lats = lats[::-1]
        lons = lons[::-1]
    north = bool(clat[3] > clat[0])
    east = bool(clon[3] > clon[0])
    coords = ", ".join(f"[ {lon} , {lat} , 0.0 ]" for lon, lat in zip(lons, lats))
    geojson = (
        '{ "type": "FeatureCollection", "name": "region_' + name + '", '
        '"crs": { "type": "name", "properties": { "name": '
        '"urn:ogc:def:crs:EPSG::4326" } }, "features": [ { "type": "Feature", '
        '"properties": { }, "geometry": { "type": "Polygon", "coordinates": '
        "[ [ " + coords + " ] ] } } ] }"
    )
    return lons, lats, (ccw, north, east), geojson


def grid_polygons(grids, step: int = 100, id_col: str = "scene_id"):
    """Dataset wrapper: one boundary-point row per ring vertex
    (id, point_idx, lon, lat) plus per-scene orientation flags —
    row-per-vertex keeps the output SQL-comparable and streaming
    (a single-string GeoJSON column is available via
    ``grid_to_polygon`` when a sink needs the document form)."""

    def _poly(batch: pa.Table) -> pa.Table:
        ids, idxs, lons_o, lats_o, ccw_o, n_o, e_o = [], [], [], [], [], [], []
        for i in range(batch.num_rows):
            g = codec.decode(batch["bytes"][i].as_py(), batch["fmt"][i].as_py())
            lons, lats, (ccw, north, east), _ = grid_to_polygon(g, step=step)
            k = batch[id_col][i].as_py()
            m = len(lons)
            ids.extend([k] * m)
            idxs.extend(range(m))
            lons_o.extend(lons.tolist())
            lats_o.extend(lats.tolist())
            ccw_o.extend([ccw] * m)
            n_o.extend([north] * m)
            e_o.extend([east] * m)
        return pa.table(
            {
                id_col: pa.array(ids),
                "point_idx": pa.array(idxs, pa.int64()),
                "lon": pa.array(lons_o, pa.float64()),
                "lat": pa.array(lats_o, pa.float64()),
                "ccw": pa.array(ccw_o, pa.bool_()),
                "northlooking": pa.array(n_o, pa.bool_()),
                "eastlooking": pa.array(e_o, pa.bool_()),
            }
        )

    return grids.map_batches(_poly, batch_format="pyarrow", batch_size=8)


# --- common window (stack alignment) --------------------------------------

def haversine(lat1, lon1, lat2, lon2, radius: float = EARTH_RADIUS_M):
    """Spherical distance (sar.py:545-558), degrees in."""
    lat1, lon1, lat2, lon2 = map(np.radians, (lat1, lon1, lat2, lon2))
    a = (
        np.sin((lat2 - lat1) / 2) ** 2
        + np.cos(lat1) * np.cos(lat2) * np.sin((lon2 - lon1) / 2) ** 2
    )
    return 2 * radius * np.arcsin(np.sqrt(a))


def _coarse_offset(latg: np.ndarray, long_: np.ndarray, lat_t: float, lon_t: float):
    """Hill-climb to the grid pixel nearest (lat_t, lon_t)
    (sar.py:560-580).  Same greedy walk as the reference — the grids
    are almost-regular so the walk is monotone; each step is O(1)."""
    b0, b1 = latg.shape[0] - 1, latg.shape[1] - 1
    p0, p1 = b0 // 2, b1 // 2

    def score(i, j):
        return haversine(latg[i, j], long_[i, j], lat_t, lon_t)

    while True:
        s = score(p0, p1)
        if p0 > 0 and score(p0 - 1, p1) < s:
            p0 -= 1
        elif p0 < b0 and score(p0 + 1, p1) < s:
            p0 += 1
        elif p1 > 0 and score(p0, p1 - 1) < s:
            p1 -= 1
        elif p1 < b1 and score(p0, p1 + 1) < s:
            p1 += 1
        else:
            return p0, p1


def _fine_offset(latg, long_, lat_t, lon_t, u, v):
    """First-order subpixel offset of the target from pixel (u, v)
    (sar.py:582-597)."""
    mlat, mlon = lat_t - latg[u, v], lon_t - long_[u, v]
    ulat, ulon = latg[u + 1, v] - latg[u, v], long_[u + 1, v] - long_[u, v]
    vlat, vlon = latg[u, v + 1] - latg[u, v], long_[u, v + 1] - long_[u, v]
    return (
        (mlat * ulat + mlon * ulon) / (ulat**2 + ulon**2),
        (mlat * vlat + mlon * vlon) / (vlat**2 + vlon**2),
    )


def grid_common_window(grids: list[np.ndarray], master: int = 0):
    """CapellaGridCommonWindow (sar.py:478-543): for a stack of
    equally-oriented, translated grids, the per-grid pixel window
    [col_min, row_max, col_max, row_min] of the overlap region plus
    each grid's (row, col) subpixel offset from exact alignment."""
    n = len(grids)
    order = [master] + [i for i in range(n) if i != master]
    localrefs, fine = [None] * n, [None] * n
    extents = [None] * n
    for step, idx in enumerate(order):
        lat, lon = grids[idx][:, :, 0], grids[idx][:, :, 1]
        if step == 0:
            localrefs[idx] = (lat.shape[0] // 2, lat.shape[1] // 2)
            fine[idx] = (0.0, 0.0)
            ref_lat = lat[localrefs[idx]]
            ref_lon = lon[localrefs[idx]]
        else:
            localrefs[idx] = _coarse_offset(lat, lon, ref_lat, ref_lon)
            fine[idx] = _fine_offset(lat, lon, ref_lat, ref_lon, *localrefs[idx])
        r, c = localrefs[idx]
        extents[idx] = [c, lat.shape[0] - r - 1, lat.shape[1] - c - 1, r]
    mins = [min(e[i] for e in extents) for i in range(4)]
    windows = []
    for idx in range(n):
        r, c = localrefs[idx]
        windows.append([c - mins[0], r + mins[1], c + mins[2], r - mins[3]])
    return windows, np.asarray(fine, dtype=np.float64)


def common_windows(grids, stack_col: str = "stack_id", order_col: str = "scene_id",
                   master: int = 0):
    """Dataset wrapper: ``groupby(stack_col).map_groups`` — one stack
    (a handful of co-collect grids, ordered by ``order_col``) per
    group; output one row per grid with its overlap window + subpixel
    offsets.  Stacks are the parallel unit; the full-corpus shuffle
    moves each grid raster exactly once."""

    def _stack(group: pa.Table) -> pa.Table:
        idx = pa.compute.sort_indices(group[order_col])
        group = group.take(idx)
        arrs = [
            codec.decode(group["bytes"][i].as_py(), group["fmt"][i].as_py())
            for i in range(group.num_rows)
        ]
        windows, fine = grid_common_window(arrs, master=master)
        w = np.asarray(windows, dtype=np.int64)
        return pa.table(
            {
                stack_col: group[stack_col],
                order_col: group[order_col],
                "col_min": pa.array(w[:, 0]),
                "row_max": pa.array(w[:, 1]),
                "col_max": pa.array(w[:, 2]),
                "row_min": pa.array(w[:, 3]),
                "fine_row": pa.array(fine[:, 0], pa.float64()),
                "fine_col": pa.array(fine[:, 1], pa.float64()),
            }
        )

    return grids.groupby(stack_col).map_groups(_stack, batch_format="pyarrow")
