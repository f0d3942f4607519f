"""Mask-generation and eval stages vs independent scalar oracles."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solaris_ray.geom.poly import points_in_polygon
from solaris_ray.raster import codec
from solaris_ray.stages import evaluate, masks

TS = 64  # tile size for tests


def _group_table(rects_px: list[tuple[float, float, float, float]], classes=None):
    """Joined-tile rows for one tile at geo bounds [0,TS)x[0,TS), px=1."""
    classes = classes or ["building"] * len(rects_px)
    xs, ys = [], []
    for (x0, y0, x1, y1) in rects_px:
        xs.append([x0, x1, x1, x0])
        ys.append([y0, y0, y1, y1])
    n = len(rects_px)
    return pa.table(
        {
            "tile_id": pa.array(["t0"] * n),
            "image_id": pa.array(["i0"] * n),
            "feature_id": pa.array(np.arange(n, dtype=np.int64)),
            "class": pa.array(classes),
            "xs": pa.array(xs, pa.list_(pa.float64())),
            "ys": pa.array(ys, pa.list_(pa.float64())),
            "x0": pa.array([0.0] * n),
            "y0": pa.array([0.0] * n),
            "x1": pa.array([float(TS)] * n),
            "y1": pa.array([float(TS)] * n),
        }
    )


def _pip_oracle_mask(rects):
    """Independent oracle: pixel-center PIP per rect (no scanline code)."""
    yy, xx = np.indices((TS, TS))
    cx = xx + 0.5
    # geo y1 - py*row = y; with y1=TS, py=1: geo_y = TS - (row + 0.5)
    cy = TS - (yy + 0.5)
    m = np.zeros((TS, TS), dtype=bool)
    for (x0, y0, x1, y1) in rects:
        ring = np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])
        m |= points_in_polygon(cx.ravel(), cy.ravel(), ring).reshape(TS, TS)
    return m


def test_footprint_mask_matches_pip_oracle():
    rects = [(5.0, 5.0, 20.0, 18.0), (30.0, 22.0, 50.0, 40.0)]
    out = masks.tile_masks(_group_table(rects), tile_size=TS)
    fp = codec.decode(out["footprint"][0].as_py(), "png")
    assert np.array_equal(fp > 0, _pip_oracle_mask(rects))


def test_boundary_mask_is_morphology_xor():
    rects = [(8.0, 8.0, 30.0, 30.0)]
    out = masks.tile_masks(_group_table(rects), tile_size=TS, boundary_width=3)
    fp = codec.decode(out["footprint"][0].as_py(), "png") > 0
    bd = codec.decode(out["boundary"][0].as_py(), "png") > 0
    from solaris_ray.raster.kernels import erode_square

    expected = fp ^ (erode_square(fp.astype(np.uint8), 3) > 0)
    assert np.array_equal(bd, expected)


def test_contact_mask_between_close_rects():
    # two rects 4 px apart: spacing 10 (k=5 dilation) must bridge them
    rects = [(5.0, 10.0, 20.0, 30.0), (24.0, 10.0, 40.0, 30.0)]
    out = masks.tile_masks(_group_table(rects), tile_size=TS, contact_spacing=10)
    ct = codec.decode(out["contact"][0].as_py(), "png") > 0
    fp = codec.decode(out["footprint"][0].as_py(), "png") > 0
    assert ct.any()
    assert not (ct & fp).any()  # contact never overlaps footprint
    # far-apart rects -> no contact
    far = [(5.0, 10.0, 15.0, 20.0), (45.0, 45.0, 60.0, 60.0)]
    out2 = masks.tile_masks(_group_table(far), tile_size=TS, contact_spacing=10)
    assert out2["contact_px"][0].as_py() == 0


def test_road_mask_width():
    g = _group_table([(10.0, 32.0, 54.0, 32.0)], classes=["road"])
    out = masks.tile_masks(g, tile_size=TS, road_width=5)
    rd = codec.decode(out["road"][0].as_py(), "png") > 0
    assert rd.any()
    cols = rd[:, 30]
    assert 4 <= cols.sum() <= 7  # ~width 5 vertical extent


def test_masks_from_join_and_instance(ray_session):
    import ray

    g = _group_table([(5.0, 5.0, 20.0, 18.0), (30.0, 22.0, 50.0, 40.0)])
    ds = ray.data.from_arrow(g)
    mk = masks.masks_from_join(ds, tile_size=TS).to_pandas()
    assert len(mk) == 1 and mk.iloc[0]["n_features"] == 2
    inst = masks.instance_masks(ds, tile_size=TS).to_pandas()
    assert len(inst) == 2
    # per-feature pixel sums partition the footprint (disjoint rects)
    assert inst["mask_px"].sum() == mk.iloc[0]["footprint_px"]


# --- eval ----------------------------------------------------------------

def _sq(x, y, s=10.0):
    return np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]])


def test_greedy_match_perfect():
    rings = [_sq(0, 0), _sq(20, 0), _sq(40, 0)]
    ids = np.arange(3, dtype=np.int64)
    conf = np.array([0.9, 0.8, 0.7])
    matched, ious, is_tp = evaluate.greedy_match_group(ids, conf, rings, ids, rings)
    assert is_tp.sum() == 3 and np.allclose(ious, 1.0)


def test_greedy_match_conf_order_decides():
    # two proposals on one GT: the higher-conf one wins, other is FP
    gt = [_sq(0, 0)]
    props = [_sq(1, 1), _sq(0.5, 0.5)]
    ids = np.array([10, 11], dtype=np.int64)
    conf = np.array([0.6, 0.9])
    matched, ious, is_tp = evaluate.greedy_match_group(
        ids, conf, props, np.array([7], dtype=np.int64), gt
    )
    # proposal 11 (conf .9) matches; 10 left unmatched
    assert is_tp.tolist() == [0, 1]
    assert matched.tolist() == [-1, 7]


def test_greedy_match_miniou_threshold():
    gt = [_sq(0, 0)]
    props = [_sq(6, 6)]  # IoU ~ (4*4)/(2*100-16) = 0.087
    m, i, t = evaluate.greedy_match_group(
        np.array([0], dtype=np.int64), np.array([1.0]), props,
        np.array([1], dtype=np.int64), gt, miniou=0.5,
    )
    assert t.sum() == 0 and i[0] > 0


def _mk_ds(ray, rows, schema):
    return ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))


PROP_SCHEMA = pa.schema(
    [
        ("proposal_id", pa.int64()),
        ("image_id", pa.string()),
        ("class", pa.string()),
        ("xs", pa.list_(pa.float64())),
        ("ys", pa.list_(pa.float64())),
        ("conf", pa.float64()),
    ]
)
GT_SCHEMA = pa.schema(
    [
        ("feature_id", pa.int64()),
        ("image_id", pa.string()),
        ("class", pa.string()),
        ("xs", pa.list_(pa.float64())),
        ("ys", pa.list_(pa.float64())),
    ]
)


def test_eval_scores_end_to_end(ray_session):
    import ray

    def prow(pid, img, ring, conf):
        return {"proposal_id": pid, "image_id": img, "class": "b",
                "xs": ring[:, 0].tolist(), "ys": ring[:, 1].tolist(), "conf": conf}

    def grow(fid, img, ring):
        return {"feature_id": fid, "image_id": img, "class": "b",
                "xs": ring[:, 0].tolist(), "ys": ring[:, 1].tolist()}

    props = [
        prow(0, "a", _sq(0, 0), 0.9),      # TP
        prow(1, "a", _sq(50, 50), 0.8),    # FP (no GT there)
        prow(2, "b", _sq(0, 0, 8), 0.7),   # TP vs gt (1,1) (IoU ~0.62)
    ]
    gts = [
        grow(0, "a", _sq(1, 1)),
        grow(1, "b", _sq(0, 0, 8)),
        grow(2, "b", _sq(30, 30)),          # FN
        grow(3, "c", _sq(0, 0)),            # image with no proposals -> FN
    ]
    scores = evaluate.eval_scores(
        _mk_ds(ray, props, PROP_SCHEMA), _mk_ds(ray, gts, GT_SCHEMA)
    ).to_pandas().set_index("image_id")
    assert scores.loc["a", "tp"] == 1 and scores.loc["a", "fp"] == 1 and scores.loc["a", "fn"] == 0
    assert scores.loc["b", "tp"] == 1 and scores.loc["b", "fn"] == 1
    assert scores.loc["c", "tp"] == 0 and scores.loc["c", "fn"] == 1
    assert scores.loc["a", "f1"] == 2 * 0.5 * 1.0 / 1.5


def test_rollup_recomputes_from_sums(ray_session):
    import ray

    rows = [
        {"image_id": "aoi1_img1", "tp": 1, "fp": 1, "fn": 0},
        {"image_id": "aoi1_img2", "tp": 0, "fp": 0, "fn": 2},
    ]
    schema = pa.schema(
        [("image_id", pa.string()), ("tp", pa.int64()), ("fp", pa.int64()), ("fn", pa.int64())]
    )
    ds = ray.data.from_arrow(pa.Table.from_pylist(rows, schema=schema))
    out = evaluate.rollup_scores(ds, key_fn=lambda s: s.split("_")[0]).to_pandas()
    assert len(out) == 1
    r = out.iloc[0]
    # summed: tp=1 fp=1 fn=2 -> P=.5 R=1/3 F1=0.4 (NOT mean of per-image F1)
    assert r["precision"] == 0.5 and abs(r["recall"] - 1 / 3) < 1e-12
    assert abs(r["f1"] - 0.4) < 1e-12


def test_pixel_scores(ray_session):
    import ray

    t = np.zeros((32, 32), dtype=np.uint8)
    t[4:20, 4:20] = 255
    p = np.zeros((32, 32), dtype=np.uint8)
    p[8:24, 4:20] = 255
    tbl = pa.table(
        {"truth": pa.array([codec.encode(t, "png")], pa.binary()),
         "pred": pa.array([codec.encode(p, "png")], pa.binary())}
    )
    out = evaluate.pixel_scores(ray.data.from_arrow(tbl))
    inter = 12 * 16
    union = 2 * 16 * 16 - inter
    assert out["tp"] == inter
    assert abs(out["iou"] - inter / union) < 1e-12


def test_average_precision_101():
    # all TPs first: AP = 1 when every GT found with no FPs
    assert evaluate.average_precision_101(np.array([1, 1, 1]), 3) == 1.0
    assert evaluate.average_precision_101(np.array([0, 0]), 3) == 0.0


def test_class_aware_matching(ray_session):
    import ray

    def prow(pid, img, cls, ring, conf):
        return {"proposal_id": pid, "image_id": img, "class": cls,
                "xs": ring[:, 0].tolist(), "ys": ring[:, 1].tolist(), "conf": conf}

    def grow(fid, img, cls, ring):
        return {"feature_id": fid, "image_id": img, "class": cls,
                "xs": ring[:, 0].tolist(), "ys": ring[:, 1].tolist()}

    # perfect geometry but WRONG class: class-aware must not match
    props = [prow(0, "a", "car", _sq(0, 0), 0.9)]
    gts = [grow(0, "a", "building", _sq(0, 0))]
    pd_ = evaluate.eval_scores(
        _mk_ds(ray, props, PROP_SCHEMA), _mk_ds(ray, gts, GT_SCHEMA), by_class=True
    ).to_pandas()
    assert pd_["tp"].sum() == 0 and pd_["fp"].sum() == 1 and pd_["fn"].sum() == 1
    # class-agnostic matches
    pd2 = evaluate.eval_scores(
        _mk_ds(ray, props, PROP_SCHEMA), _mk_ds(ray, gts, GT_SCHEMA), by_class=False
    ).to_pandas()
    assert pd2["tp"].sum() == 1


def test_relaxed_pixel_scores(ray_session):
    import ray

    t = np.zeros((32, 32), dtype=np.uint8)
    t[10:20, 10:20] = 255
    p = np.zeros((32, 32), dtype=np.uint8)
    p[12:22, 10:20] = 255  # shifted 2 px: strict precision < 1
    tbl = pa.table(
        {"truth": pa.array([codec.encode(t, "png")], pa.binary()),
         "pred": pa.array([codec.encode(p, "png")], pa.binary())}
    )
    strict = evaluate.pixel_scores(ray.data.from_arrow(tbl))
    relaxed = evaluate.relaxed_pixel_scores(ray.data.from_arrow(tbl), rho=3)
    assert strict["precision"] < 1.0
    assert relaxed["relaxed_precision"] == 1.0  # 2 px shift within rho=3
    assert relaxed["relaxed_recall"] == 1.0


def test_map_conf_desc_ordering(ray_session):
    """mAP must scan CONF-DESCENDING, not proposal-id order
    (/root/reference/solaris/eval/vector.py:473-474).  Here the two
    orderings give different APs: id-order would yield 1.0; the correct
    conf-desc order yields (51*1 + 50*0.5)/101."""
    import ray

    matches = pa.table(
        {
            "image_id": pa.array(["a"] * 4, pa.string()),
            "proposal_id": pa.array([0, 1, 2, 3], pa.int64()),
            "conf": pa.array([0.1, 0.9, 0.5, 0.7], pa.float64()),
            "matched_feature_id": pa.array([10, 11, -1, -1], pa.int64()),
            "iou": pa.array([0.9, 0.9, 0.0, 0.0], pa.float64()),
            "is_tp": pa.array([1, 1, 0, 0], pa.int8()),
        }
    )
    mAP, aps = evaluate.mean_average_precision(
        ray.data.from_arrow(matches), {"all": 2}
    )
    expect = (51 * 1.0 + 50 * 0.5) / 101
    assert abs(mAP - expect) < 1e-12
    assert set(aps) == {"all"}


def test_eval_matches_carries_conf(ray_session):
    import ray

    props = [
        {"proposal_id": 7, "image_id": "a", "class": "building",
         "xs": _sq(0, 0)[:, 0].tolist(), "ys": _sq(0, 0)[:, 1].tolist(), "conf": 0.75}
    ]
    gts = [
        {"feature_id": 3, "image_id": "a", "class": "building",
         "xs": _sq(0, 0)[:, 0].tolist(), "ys": _sq(0, 0)[:, 1].tolist()}
    ]
    out = evaluate.eval_matches(
        _mk_ds(ray, props, PROP_SCHEMA), _mk_ds(ray, gts, GT_SCHEMA)
    ).to_pandas()
    assert list(out["conf"]) == [0.75]
    assert list(out["is_tp"]) == [1]
