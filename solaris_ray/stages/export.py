"""Exporters — COCO and YOLO label formats from the features table.

Reference:

- ``geojson2coco`` (/root/reference/solaris/data/coco.py:15-302 with
  ``df_to_coco_annos`` :305-461, category registry :462-495,
  ``make_coco_image_dict`` :498-541): dir-of-geojsons + images ->
  COCO JSON with per-image annotations in pixel coords.
- ``gdf_to_yolo`` (/root/reference/solaris/vector/polygon.py:329-417):
  normalized center/size bbox rows per feature, ``min_overlap``
  filter against the image frame.

Ray mapping (SURVEY.md §2.1 coco row): category registry = distinct +
zip-with-index on the driver (tiny); annotation building =
vectorized ``map_batches`` over feature rows; the final COCO dict is
assembled driver-side from the small annotation table (the reference
also ends in one JSON file).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

ANNO_SCHEMA = pa.schema(
    [
        ("annotation_id", pa.int64()),
        ("image_id", pa.string()),
        ("category_id", pa.int64()),
        ("bbox_x", pa.float64()),
        ("bbox_y", pa.float64()),
        ("bbox_w", pa.float64()),
        ("bbox_h", pa.float64()),
        ("area", pa.float64()),
    ]
)


def category_registry(features) -> dict[str, int]:
    """Distinct class -> contiguous ids (coco.py:462-495).

    The distinct runs ENGINE-side (``groupby`` shuffles only the tiny
    (class, count) pairs); the driver receives one row per distinct
    class, never the full column."""
    distinct = features.select_columns(["class"]).groupby("class").count().to_pandas()
    classes = sorted(distinct["class"].tolist())
    return {c: i + 1 for i, c in enumerate(classes)}


def coco_annotations(features, categories: dict[str, int]):
    """feature rows (pixel-space xs/ys) -> COCO annotation rows."""

    def _annos(batch: pa.Table) -> pa.Table:
        xs_l = batch["xs"].to_pylist()
        ys_l = batch["ys"].to_pylist()
        n = batch.num_rows
        bx = np.asarray([min(v) for v in xs_l])
        by = np.asarray([min(v) for v in ys_l])
        bw = np.asarray([max(v) for v in xs_l]) - bx
        bh = np.asarray([max(v) for v in ys_l]) - by
        # polygon area via shoelace per row
        areas = np.asarray(
            [
                abs(
                    float(
                        np.dot(np.asarray(x), np.roll(np.asarray(y), -1))
                        - np.dot(np.roll(np.asarray(x), -1), np.asarray(y))
                    )
                )
                / 2.0
                for x, y in zip(xs_l, ys_l)
            ]
        )
        cid = np.asarray([categories[c] for c in batch["class"].to_pylist()], dtype=np.int64)
        return pa.table(
            {
                "annotation_id": pc_cast_i64(batch["feature_id"]),
                "image_id": batch["image_id"],
                "category_id": pa.array(cid),
                "bbox_x": pa.array(bx),
                "bbox_y": pa.array(by),
                "bbox_w": pa.array(bw),
                "bbox_h": pa.array(bh),
                "area": pa.array(areas),
            }
        )

    return features.map_batches(_annos, batch_format="pyarrow", batch_size=4096)


def pc_cast_i64(arr):
    import pyarrow.compute as pc

    return pc.cast(arr, pa.int64())


def build_coco_dict(features, images_meta) -> dict:
    """Full COCO document (driver-side final assembly, like the
    reference's single-JSON sink)."""
    cats = category_registry(features)
    annos = coco_annotations(features, cats).to_pandas()
    # single-doc sink: every image row appears in the JSON "images"
    # list, so this driver pull is the output itself (metadata cols
    # only, never pixel bytes)
    imgs = images_meta.select_columns(["image_id", "w", "h"]).take_all()
    id_map = {r["image_id"]: i + 1 for i, r in enumerate(sorted(imgs, key=lambda r: r["image_id"]))}
    return {
        "images": [
            {"id": id_map[r["image_id"]], "file_name": r["image_id"], "width": int(r["w"]), "height": int(r["h"])}
            for r in sorted(imgs, key=lambda r: r["image_id"])
        ],
        "annotations": [
            {
                "id": int(a.annotation_id),
                "image_id": id_map[a.image_id],
                "category_id": int(a.category_id),
                "bbox": [a.bbox_x, a.bbox_y, a.bbox_w, a.bbox_h],
                "area": a.area,
                "iscrowd": 0,
            }
            for a in annos.itertuples()
        ],
        "categories": [{"id": i, "name": c} for c, i in cats.items()],
    }


def coco_annotations_dense(features, images_meta):
    """Annotation rows with DENSE image ids (row_number over sorted
    image_id — build_coco_dict's id_map, computed distributed).

    Dense ids come from ``global_rank`` over the images table; the
    attach is a co-shuffle on the image_id string (union + groupby),
    so no O(images) map ever forms on the driver.  Returns
    (annotations_ds, images_ranked_ds, categories_dict)."""
    from .rank import global_rank

    cats = category_registry(features)
    annos = coco_annotations(features, cats)
    imgs = global_rank(
        images_meta.select_columns(["image_id", "w", "h"]),
        ["image_id"], pct=False)

    a_schema = pa.schema([
        ("image_id", pa.string()), ("side", pa.int64()),
        ("annotation_id", pa.int64()), ("category_id", pa.int64()),
        ("bbox_x", pa.float64()), ("bbox_y", pa.float64()),
        ("bbox_w", pa.float64()), ("bbox_h", pa.float64()),
        ("area", pa.float64()), ("img_idx", pa.int64()),
    ])

    def _anno_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "image_id": pc_cast_str(b["image_id"]),
            "side": pa.array(np.ones(n, np.int64)),
            "annotation_id": pc_cast_i64(b["annotation_id"]),
            "category_id": pc_cast_i64(b["category_id"]),
            "bbox_x": b["bbox_x"], "bbox_y": b["bbox_y"],
            "bbox_w": b["bbox_w"], "bbox_h": b["bbox_h"],
            "area": b["area"],
            "img_idx": pa.nulls(n, pa.int64()),
        }, schema=a_schema)

    def _img_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table({
            "image_id": pc_cast_str(b["image_id"]),
            "side": pa.array(np.zeros(n, np.int64)),
            "annotation_id": pa.nulls(n, pa.int64()),
            "category_id": pa.nulls(n, pa.int64()),
            "bbox_x": pa.nulls(n, pa.float64()),
            "bbox_y": pa.nulls(n, pa.float64()),
            "bbox_w": pa.nulls(n, pa.float64()),
            "bbox_h": pa.nulls(n, pa.float64()),
            "area": pa.nulls(n, pa.float64()),
            "img_idx": pc_cast_i64(b["rank"]),
        }, schema=a_schema)

    def _attach(group: pa.Table) -> pa.Table:
        side = group["side"].to_numpy(zero_copy_only=False)
        img_rows = np.flatnonzero(side == 0)
        anno = group.filter(pa.array(side == 1))
        out_schema = pa.schema([
            ("annotation_id", pa.int64()), ("image_id", pa.int64()),
            ("category_id", pa.int64()),
            ("bbox_x", pa.float64()), ("bbox_y", pa.float64()),
            ("bbox_w", pa.float64()), ("bbox_h", pa.float64()),
            ("area", pa.float64()),
        ])
        if anno.num_rows == 0 or img_rows.size == 0:
            return out_schema.empty_table()
        idx = int(group["img_idx"][int(img_rows[0])].as_py())
        n = anno.num_rows
        return pa.table({
            "annotation_id": anno["annotation_id"],
            "image_id": pa.array(np.full(n, idx, np.int64)),
            "category_id": anno["category_id"],
            "bbox_x": anno["bbox_x"], "bbox_y": anno["bbox_y"],
            "bbox_w": anno["bbox_w"], "bbox_h": anno["bbox_h"],
            "area": anno["area"],
        }, schema=out_schema)

    dense = (
        annos.map_batches(_anno_side, batch_format="pyarrow")
        .union(imgs.map_batches(_img_side, batch_format="pyarrow"))
        .groupby("image_id")
        .map_groups(_attach, batch_format="pyarrow")
    )
    return dense, imgs, cats


def write_coco_shards(features, images_meta, out_dir: str) -> dict:
    """Sharded COCO sink: JSONL shards + one small manifest.

    ``build_coco_dict`` is a driver artifact by definition (the
    reference writes one JSON document); at 100x image counts both
    the annotations AND images lists dominate, so this sink streams
    annotation rows and image rows to JSONL shards (one per block,
    named by the shard's minimum id so re-runs are reproducible) and
    the driver assembles only the O(shards) manifest:
    {"categories", "annotation_shards", "image_shards", counts}.
    The shard union is byte-for-byte the single-doc lists (gate +
    pytest assert exactly that)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    dense, imgs, cats = coco_annotations_dense(features, images_meta)

    def _write_anno_shard(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.string())})
        rows = b.sort_by("annotation_id").to_pylist()
        path = os.path.join(
            out_dir, f"annotations-{rows[0]['annotation_id']:012d}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps({
                    "id": int(r["annotation_id"]),
                    "image_id": int(r["image_id"]),
                    "category_id": int(r["category_id"]),
                    "bbox": [r["bbox_x"], r["bbox_y"], r["bbox_w"], r["bbox_h"]],
                    "area": r["area"], "iscrowd": 0,
                }) + "\n")
        return pa.table({"path": pa.array([path]),
                         "n": pa.array([len(rows)], pa.int64()),
                         "kind": pa.array(["annotations"])})

    def _write_img_shard(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64()),
                             "kind": pa.array([], pa.string())})
        rows = b.sort_by("rank").to_pylist()
        path = os.path.join(out_dir, f"images-{rows[0]['rank']:012d}.jsonl")
        with open(path, "w") as f:
            for r in rows:
                f.write(json.dumps({
                    "id": int(r["rank"]), "file_name": r["image_id"],
                    "width": int(r["w"]), "height": int(r["h"]),
                }) + "\n")
        return pa.table({"path": pa.array([path]),
                         "n": pa.array([len(rows)], pa.int64()),
                         "kind": pa.array(["images"])})

    shard_rows = (
        dense.map_batches(_write_anno_shard, batch_format="pyarrow")
        .union(imgs.map_batches(_write_img_shard, batch_format="pyarrow"))
        .to_pandas()  # O(shards) rows — the manifest itself
    )
    manifest = {
        "categories": [{"id": i, "name": c} for c, i in cats.items()],
        "annotation_shards": sorted(
            shard_rows[shard_rows.kind == "annotations"]["path"].tolist()),
        "image_shards": sorted(
            shard_rows[shard_rows.kind == "images"]["path"].tolist()),
        "n_annotations": int(
            shard_rows[shard_rows.kind == "annotations"]["n"].sum()),
        "n_images": int(shard_rows[shard_rows.kind == "images"]["n"].sum()),
    }
    with open(os.path.join(out_dir, "manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def pc_cast_str(arr):
    import pyarrow.compute as pc

    return pc.cast(arr, pa.string())


def yolo_rows(features, img_w: int, img_h: int, categories: dict[str, int],
              min_overlap: float = 0.66):
    """feature rows -> YOLO label rows (class cx cy w h, normalized).

    ``min_overlap``: drop features whose in-frame bbox fraction is
    below the threshold (polygon.py:383-401 truncation rule).
    """

    def _yolo(batch: pa.Table) -> pa.Table:
        xs_l = batch["xs"].to_pylist()
        ys_l = batch["ys"].to_pylist()
        bx0 = np.asarray([min(v) for v in xs_l])
        by0 = np.asarray([min(v) for v in ys_l])
        bx1 = np.asarray([max(v) for v in xs_l])
        by1 = np.asarray([max(v) for v in ys_l])
        cx0 = np.clip(bx0, 0, img_w)
        cy0 = np.clip(by0, 0, img_h)
        cx1 = np.clip(bx1, 0, img_w)
        cy1 = np.clip(by1, 0, img_h)
        full = (bx1 - bx0) * (by1 - by0)
        inside = (cx1 - cx0) * (cy1 - cy0)
        keep = np.nonzero(np.where(full > 0, inside / np.where(full > 0, full, 1), 0.0) >= min_overlap)[0]
        cid = np.asarray([categories[c] for c in batch["class"].to_pylist()], dtype=np.int64)
        return pa.table(
            {
                "image_id": batch["image_id"].take(pa.array(keep)),
                "class_id": pa.array(cid[keep]),
                "cx": pa.array(((cx0 + cx1) / 2 / img_w)[keep]),
                "cy": pa.array(((cy0 + cy1) / 2 / img_h)[keep]),
                "w": pa.array(((cx1 - cx0) / img_w)[keep]),
                "h": pa.array(((cy1 - cy0) / img_h)[keep]),
            }
        )

    return features.map_batches(_yolo, batch_format="pyarrow", batch_size=4096)


EMPTY_GEOJSON = (
    '{"type": "FeatureCollection", "crs": {"type": "name", "properties": '
    '{"name": "urn:ogc:def:crs:OGC:1.3:CRS84"}}, "features": []}'
)


def write_tile_geojsons(tile_specs, joined, out_dir: str) -> "object":
    """VectorTiler sink: one GeoJSON FeatureCollection per tile
    (solaris/tile/vector_tile.py:94-112), empty tiles get the
    empty-geojson template (solaris/utils/tile.py:13-31 —
    ``save_empty_geojson``).

    Distributed: joined rows co-shuffle by tile_id and each group
    writes its own file; tiles with no features (anti-join of the spec
    table against the join output via the same union+groupby) write
    the empty template.  Returns a manifest Dataset
    (tile_id, path, n_features) — no driver-side feature rows.
    """
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)

    def _spec_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "tile_id": b["tile_id"],
                "side": pa.array(np.zeros(n, dtype=np.int8)),
                "feature_id": pa.nulls(n, pa.int64()),
                "class": pa.nulls(n, pa.string()),
                "xs": pa.nulls(n, pa.list_(pa.float64())),
                "ys": pa.nulls(n, pa.list_(pa.float64())),
            }
        )

    def _join_side(b: pa.Table) -> pa.Table:
        n = b.num_rows
        return pa.table(
            {
                "tile_id": b["tile_id"],
                "side": pa.array(np.ones(n, dtype=np.int8)),
                "feature_id": pc_cast_i64(b["feature_id"]),
                "class": b["class"],
                "xs": b["xs"],
                "ys": b["ys"],
            }
        )

    s = tile_specs.map_batches(_spec_side, batch_format="pyarrow")
    j = joined.map_batches(_join_side, batch_format="pyarrow")

    def _write(group: pa.Table) -> pa.Table:
        tid = group["tile_id"][0].as_py()
        side = group["side"].to_numpy()
        rows = np.nonzero(side == 1)[0]
        feats = []
        for i in rows.tolist():
            xs = group["xs"][i].as_py()
            ys = group["ys"][i].as_py()
            ring = [[x, y] for x, y in zip(xs, ys)]
            if ring and ring[0] != ring[-1]:
                ring.append(ring[0])
            feats.append(
                {
                    "type": "Feature",
                    "geometry": {"type": "Polygon", "coordinates": [ring]},
                    "properties": {
                        "feature_id": int(group["feature_id"][i].as_py()),
                        "class": group["class"][i].as_py(),
                    },
                }
            )
        path = os.path.join(out_dir, f"{tid}.geojson")
        if feats:
            doc = {"type": "FeatureCollection", "features": feats}
            with open(path, "w") as f:
                json.dump(doc, f)
        else:
            with open(path, "w") as f:
                f.write(EMPTY_GEOJSON)
        return pa.table(
            {
                "tile_id": pa.array([tid], pa.string()),
                "path": pa.array([path], pa.string()),
                "n_features": pa.array([len(feats)], pa.int64()),
            }
        )

    return s.union(j).groupby("tile_id").map_groups(_write, batch_format="pyarrow")


def masks_to_geotiff(masks_ds, channels=("footprint", "boundary", "contact"),
                     epsg: int | None = None, nodata: float | None = 0.0,
                     batch_size: int = 64):
    """mask rows -> (tile_id, image_id, bytes, fmt="gtif"): stack the
    per-channel mask PNGs into ONE multiband uncompressed GeoTIFF per
    tile — the reference's ``df_to_px_mask`` channel stack written via
    ``create_multiband_geotiff``
    (/root/reference/solaris/vector/mask.py:119-132,
    /root/reference/solaris/raster/image.py:157-210), as a binary
    column instead of one file per tile."""
    from ..raster import codec as _codec
    from ..raster.gtiff import gtiff_encode

    chans = list(channels)

    def _stack(batch: pa.Table) -> pa.Table:
        ids, imgs, bufs = [], [], []
        for i in range(batch.num_rows):
            planes = [
                _codec.decode(batch[ch][i].as_py(), "png") for ch in chans
            ]
            arr = np.stack(planes, axis=-1)
            bufs.append(gtiff_encode(arr, epsg=epsg, nodata=nodata))
            ids.append(batch["tile_id"][i].as_py())
            imgs.append(batch["image_id"][i].as_py())
        return pa.table(
            {
                "tile_id": pa.array(ids, pa.string()),
                "image_id": pa.array(imgs, pa.string()),
                "bytes": pa.array(bufs, pa.binary()),
                "fmt": pa.array(["gtif"] * len(ids), pa.string()),
            }
        )

    return masks_ds.map_batches(_stack, batch_format="pyarrow", batch_size=batch_size)
