"""SCOT optimal matching + Hungarian solver tests."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solaris_ray.geom.assign import linear_sum_assignment
from solaris_ray.stages import evaluate


def test_hungarian_known_case():
    C = np.array([[4.0, 1, 3], [2, 0, 5], [3, 2, 2]])
    r, c = linear_sum_assignment(C)
    assert C[r, c].sum() == 5.0  # 1 + 2 + 2
    r, c = linear_sum_assignment(C, maximize=True)
    assert C[r, c].sum() == 11.0  # 4 + 5 + 2


def test_hungarian_beats_greedy():
    # greedy (row-wise argmax) picks 0.9 then is forced to 0.1 (total 1.0);
    # optimal picks 0.8 + 0.7 = 1.5
    iou = np.array([[0.9, 0.8], [0.7, 0.0]])
    r, c = linear_sum_assignment(iou, maximize=True)
    assert iou[r, c].sum() == 1.5


def _sq(x, y, s=10.0):
    return np.array([[x, y], [x + s, y], [x + s, y + s], [x, y + s]])


def _rows(items, id_name):
    out = []
    for (aoi, ts, oid, ring) in items:
        out.append(
            {
                "aoi": aoi,
                "timestep": ts,
                id_name: oid,
                "xs": ring[:, 0].tolist(),
                "ys": ring[:, 1].tolist(),
            }
        )
    schema = pa.schema(
        [
            ("aoi", pa.string()),
            ("timestep", pa.string()),
            (id_name, pa.int64()),
            ("xs", pa.list_(pa.float64())),
            ("ys", pa.list_(pa.float64())),
        ]
    )
    return pa.Table.from_pylist(out, schema=schema)


def test_scot_consistent_tracking(ray_session):
    import ray

    gt = _rows(
        [("a", "t0", 1, _sq(0, 0)), ("a", "t0", 2, _sq(30, 0)),
         ("a", "t1", 1, _sq(0, 0)), ("a", "t1", 2, _sq(30, 0))],
        "gt_id",
    )
    props = _rows(
        [("a", "t0", 101, _sq(1, 1)), ("a", "t0", 102, _sq(31, 1)),
         ("a", "t1", 101, _sq(1, 1)), ("a", "t1", 102, _sq(31, 1))],
        "track_id",
    )
    out = evaluate.scot_scores(
        ray.data.from_arrow(props), ray.data.from_arrow(gt)
    ).to_pandas()
    r = out.iloc[0]
    assert r["tp"] == 4 and r["fp"] == 0 and r["fn"] == 0
    assert r["mismatches"] == 0 and r["tracking_score"] == 1.0


def test_scot_identity_swap_penalized(ray_session):
    import ray

    gt = _rows(
        [("a", "t0", 1, _sq(0, 0)), ("a", "t0", 2, _sq(30, 0)),
         ("a", "t1", 1, _sq(0, 0)), ("a", "t1", 2, _sq(30, 0))],
        "gt_id",
    )
    # tracks swap identities at t1
    props = _rows(
        [("a", "t0", 101, _sq(1, 1)), ("a", "t0", 102, _sq(31, 1)),
         ("a", "t1", 102, _sq(1, 1)), ("a", "t1", 101, _sq(31, 1))],
        "track_id",
    )
    out = evaluate.scot_scores(
        ray.data.from_arrow(props), ray.data.from_arrow(gt)
    ).to_pandas()
    r = out.iloc[0]
    assert r["tp"] == 4
    assert r["mismatches"] == 2
    assert r["tracking_score"] == 0.0  # 1 - (0+0+2*2)/4


def test_scot_change_detection_fn(ray_session):
    import ray

    # building 2 appears only at t1 in GT; proposals never find it
    gt = _rows(
        [("a", "t0", 1, _sq(0, 0)), ("a", "t1", 1, _sq(0, 0)), ("a", "t1", 2, _sq(30, 0))],
        "gt_id",
    )
    props = _rows(
        [("a", "t0", 101, _sq(1, 1)), ("a", "t1", 101, _sq(1, 1))], "track_id"
    )
    out = evaluate.scot_scores(
        ray.data.from_arrow(props), ray.data.from_arrow(gt)
    ).to_pandas()
    r = out.iloc[0]
    assert r["tp"] == 2 and r["fn"] == 1 and r["fp"] == 0
