"""distinct_reduce: the bucketed vectorized pair-distinct idiom."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages._buckets import bucket_of, distinct_reduce


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_bucket_of_nonnegative():
    x = np.array([-5, -1, 0, 1, 2**40], np.int64)
    b = bucket_of(x, 7)
    assert ((b >= 0) & (b < 7)).all()


def test_distinct_plain(ray_session):
    rng = np.random.default_rng(3)
    a = rng.integers(0, 50, 5000)
    b = rng.integers(0, 50, 5000)
    t = pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64())})
    out = distinct_reduce(_ds(t), ["id_a", "id_b"]).to_pandas()
    want = {(int(x), int(y)) for x, y in zip(a, b)}
    assert set(zip(out.id_a, out.id_b)) == want
    assert len(out) == len(want)


def test_distinct_with_min_max_sum(ray_session):
    t = pa.table({
        "k1": pa.array([1, 1, 2, 2, 2], pa.int64()),
        "k2": pa.array([7, 7, 9, 9, 9], pa.int64()),
        "v": pa.array([3.0, 5.0, 2.0, 8.0, 4.0], pa.float64()),
        "w": pa.array([1, 10, 100, 1000, 10000], pa.int64()),
    })
    out = distinct_reduce(
        _ds(t), ["k1", "k2"], aggs={"v": "max", "w": "sum"}
    ).to_pandas().sort_values("k1").reset_index(drop=True)
    assert out.v.tolist() == [5.0, 8.0]
    assert out.w.tolist() == [11, 11100]
    out2 = distinct_reduce(_ds(t), ["k1", "k2"], aggs={"v": "min"}).to_pandas()
    assert sorted(out2.v.tolist()) == [2.0, 3.0]


def test_distinct_matches_ray_groupby(ray_session):
    rng = np.random.default_rng(9)
    a = rng.integers(-100, 100, 3000)
    b = rng.integers(-100, 100, 3000)
    v = rng.integers(0, 1000, 3000)
    t = pa.table({"id_a": pa.array(a, pa.int64()), "id_b": pa.array(b, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    mine = distinct_reduce(_ds(t), ["id_a", "id_b"], aggs={"v": "min"}).to_pandas()
    ref = _ds(t).groupby(["id_a", "id_b"]).min("v").to_pandas()
    mine = mine.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    ref = ref.sort_values(["id_a", "id_b"]).reset_index(drop=True)
    assert mine.id_a.tolist() == ref.id_a.tolist()
    assert mine.v.tolist() == ref["min(v)"].tolist()


def test_unknown_agg_rejected(ray_session):
    t = pa.table({"k": pa.array([1], pa.int64()), "v": pa.array([1], pa.int64())})
    with pytest.raises(Exception):
        distinct_reduce(_ds(t), ["k"], aggs={"v": "median"}).to_pandas()


def test_distinct_float_keys(ray_session):
    t = pa.table({
        "x": pa.array([1.5, 1.5, -0.0, 0.0, 2.25], pa.float64()),
        "y": pa.array([2.0, 2.0, 3.0, 3.0, 4.0], pa.float64()),
        "v": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = distinct_reduce(_ds(t), ["x", "y"], aggs={"v": "sum"}).to_pandas()
    got = {(float(x), float(y)): int(v)
           for x, y, v in zip(out.x, out.y, out.v)}
    # -0.0 and +0.0 are ONE key; float values come back as floats
    assert got == {(1.5, 2.0): 3, (0.0, 3.0): 7, (2.25, 4.0): 5}
    assert out.x.dtype == np.float64
