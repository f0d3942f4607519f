"""Aspect-ratio bucket batching + byte-budget shard layout
(stages/layout.py) — exact bucket argmin, determinism at any
parallelism, ragged-tail drop, straddling shard offsets."""

import hashlib

import numpy as np
import pyarrow as pa
import ray

from solaris_ray.stages import layout as lay


def test_assign_aspect_bucket_exact_cases():
    w = np.array([100, 200, 100, 70], dtype=np.int64)
    h = np.array([100, 100, 200, 80], dtype=np.int64)
    out = lay.assign_aspect_bucket(w, h, lay.DEFAULT_BUCKETS)
    # square -> (1,1)=idx2; 2:1 -> idx4; 1:2 -> idx0
    # 7/8 is EXACTLY between 3/4 and 1/1 -> tie resolves to the
    # earlier ladder entry (3,4)=idx1
    assert out.tolist() == [2, 4, 0, 1]


def _py_reference(rows, batch_size, salt="aspect"):
    """Pure-python oracle for the full layout."""
    tagged = []
    for rid, w, h in rows:
        b = int(lay.assign_aspect_bucket(np.array([w]), np.array([h]), lay.DEFAULT_BUCKETS)[0])
        hx = hashlib.md5((salt + rid).encode()).hexdigest()
        tagged.append((b, hx, rid, w, h))
    tagged.sort()
    out = {}
    counts = {}
    for b, hx, rid, w, h in tagged:
        r = counts.get(b, 0)
        counts[b] = r + 1
        out[rid] = (b, r // batch_size, r % batch_size)
    keep = {rid: v for rid, v in out.items() if v[1] < counts[v[0]] // batch_size}
    return keep


def _rows(n=97):
    return [(f"im{k}", 64 + (k * 37) % 129, 64 + (k * 91) % 111) for k in range(n)]


def test_aspect_bucket_batches_matches_reference(ray_session):
    rows = _rows()
    tbl = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows]),
            "w": pa.array([r[1] for r in rows], pa.int64()),
            "h": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    expect = _py_reference(rows, batch_size=4)
    got = {
        r["image_id"]: (r["bucket_id"], r["batch_idx"], r["slot"])
        for r in lay.aspect_bucket_batches(
            ray.data.from_arrow(tbl), batch_size=4
        ).take_all()
    }
    assert got == expect
    # every emitted batch is FULL: batch_size rows, slots 0..B-1
    per_batch = {}
    for rid, (b, bi, sl) in got.items():
        per_batch.setdefault((b, bi), []).append(sl)
    for slots in per_batch.values():
        assert sorted(slots) == [0, 1, 2, 3]


def test_aspect_batches_parallelism_invariant(ray_session):
    rows = _rows(60)
    tbl = pa.table(
        {
            "image_id": pa.array([r[0] for r in rows]),
            "w": pa.array([r[1] for r in rows], pa.int64()),
            "h": pa.array([r[2] for r in rows], pa.int64()),
        }
    )
    a = sorted(
        map(tuple, (
            (r["image_id"], r["bucket_id"], r["batch_idx"], r["slot"])
            for r in lay.aspect_bucket_batches(ray.data.from_arrow(tbl), 8).take_all()
        ))
    )
    b = sorted(
        map(tuple, (
            (r["image_id"], r["bucket_id"], r["batch_idx"], r["slot"])
            for r in lay.aspect_bucket_batches(
                ray.data.from_arrow(tbl).repartition(7), 8
            ).take_all()
        ))
    )
    assert a == b and len(a) > 0


def test_shard_layout_cumsum_and_straddle(ray_session):
    sizes = [400, 700, 250, 900, 100, 650]  # budget 1000: row 1 straddles
    tbl = pa.table(
        {
            "doc_id": pa.array(list(range(6)), pa.int64()),
            "nbytes": pa.array(sizes, pa.int64()),
        }
    )
    out = {
        r["doc_id"]: (r["shard_id"], r["shard_off"])
        for r in lay.shard_layout(
            ray.data.from_arrow(tbl).repartition(3),
            "nbytes", 1000, ["doc_id"],
        ).take_all()
    }
    starts = np.concatenate(([0], np.cumsum(sizes)[:-1]))
    expect = {i: (int(s // 1000), int(s % 1000)) for i, s in enumerate(starts)}
    assert out == expect
    # row 1 starts in shard 0 (off 400) even though it crosses 1000
    assert out[1] == (0, 400)
