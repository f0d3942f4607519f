"""Image-entropy and trajectory-length tests against naive twins."""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pytest
import ray

from solaris_ray.raster import codec
from solaris_ray.stages.entropy import image_entropy
from solaris_ray.stages.trajectory import trajectory_length


def _images_ds(arrays):
    t = pa.table(
        {
            "image_id": pa.array([f"img_{i}" for i in range(len(arrays))]),
            "bytes": pa.array(
                [codec.encode(a.astype(np.uint8), "png") for a in arrays],
                pa.binary(),
            ),
            "fmt": pa.array(["png"] * len(arrays)),
            "w": pa.array([a.shape[1] for a in arrays], pa.int64()),
            "h": pa.array([a.shape[0] for a in arrays], pa.int64()),
        }
    )
    return ray.data.from_arrow(t).repartition(2)


def _naive_entropy(a):
    hist = np.bincount(a.ravel(), minlength=256).astype(np.float64)
    p = hist[hist > 0] / hist.sum()
    return round(float(-(p * np.log(p)).sum()), 6)


def test_entropy_matches_naive():
    rng = np.random.default_rng(31)
    arrays = [rng.integers(0, 256, size=(10, 14)).astype(np.uint8) for _ in range(6)]
    got = {r["image_id"]: r["h6"] for r in image_entropy(_images_ds(arrays)).take_all()}
    for i, a in enumerate(arrays):
        assert got[f"img_{i}"] == pytest.approx(_naive_entropy(a), abs=2e-6)


def test_entropy_constant_image_is_zero():
    arrays = [np.full((8, 8), 42, np.uint8)]
    got = image_entropy(_images_ds(arrays)).take_all()[0]
    assert got["h6"] == 0.0 and got["n_px"] == 64


def _ev_ds(rows, n_blocks=3):
    # rows: (event_id, user, ts_us, x, y)
    t = pa.table(
        {
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "user_id": pa.array([r[1] for r in rows], pa.int64()),
            "ts": pa.array(
                np.array([r[2] for r in rows], "datetime64[us]"),
                pa.timestamp("us"),
            ),
            "x": pa.array([float(r[3]) for r in rows], pa.float64()),
            "y": pa.array([float(r[4]) for r in rows], pa.float64()),
        }
    )
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive_traj(rows):
    by_u = {}
    for eid, u, ts, x, y in rows:
        by_u.setdefault(u, []).append((ts, eid, x, y))
    out = {}
    for u, evs in by_u.items():
        evs.sort()
        path = sum(
            math.hypot(evs[i][2] - evs[i - 1][2], evs[i][3] - evs[i - 1][3])
            for i in range(1, len(evs))
        )
        out[u] = (len(evs), round(path, 6))
    return out


def test_trajectory_matches_naive():
    rng = np.random.default_rng(33)
    rows = [
        (i, int(rng.integers(0, 20)), int(rng.integers(0, 10**7)),
         float(rng.uniform(0, 100)), float(rng.uniform(0, 100)))
        for i in range(2000)
    ]
    got = {
        r["user_id"]: (r["n_events"], r["path6"])
        for r in trajectory_length(_ev_ds(rows)).take_all()
    }
    naive = _naive_traj(rows)
    assert set(got) == set(naive)
    for u in got:
        assert got[u][0] == naive[u][0]
        assert got[u][1] == pytest.approx(naive[u][1], abs=2e-6)


def test_trajectory_single_event_user():
    rows = [(1, 7, 1000, 3.0, 4.0)]
    got = trajectory_length(_ev_ds(rows)).take_all()[0]
    assert (got["user_id"], got["n_events"], got["path6"]) == (7, 1, 0.0)


def test_trajectory_ts_tie_uses_event_id_order():
    rows = [(2, 1, 1000, 10.0, 0.0), (1, 1, 1000, 0.0, 0.0), (3, 1, 2000, 10.0, 10.0)]
    got = trajectory_length(_ev_ds(rows)).take_all()[0]
    assert got["path6"] == pytest.approx(20.0, abs=1e-9)  # 0->10 then up 10
