"""Grouped HLL distinct check and schema-union parquet reads."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def test_hll_group_check_accuracy(ray_session):
    import ray.data

    from solaris_ray.stages.sketch import hll_group_check

    rng = np.random.default_rng(3)
    n = 20_000
    g = np.where(rng.random(n) < 0.5, "a", "b")
    # group a: ~2000 distinct, group b: ~300 distinct
    v = np.where(g == "a", rng.integers(0, 2000, n), rng.integers(0, 300, n))
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(g.tolist(), pa.string()),
        "v": pa.array(v, pa.int64()),
    }))
    out = hll_group_check(ds, "g", "v").to_pandas().set_index("grp")
    for grp in ("a", "b"):
        exact = len(np.unique(v[g == grp]))
        assert out.loc[grp, "exact_distinct"] == exact
        assert out.loc[grp, "hll_ok"] == 1


def test_read_parquet_union_null_fill(ray_session, tmp_path):
    from solaris_ray.sources.formats import read_parquet_union

    p1 = str(tmp_path / "s1.parquet")
    p2 = str(tmp_path / "s2.parquet")
    pq.write_table(pa.table({"k": pa.array([1, 2], pa.int64()),
                             "a": pa.array([10, 20], pa.int64())}), p1)
    pq.write_table(pa.table({"k": pa.array([3], pa.int64()),
                             "b": pa.array([7.5], pa.float64())}), p2)
    df = read_parquet_union([p1, p2]).to_pandas().sort_values("k")
    assert list(df.columns) == ["k", "a", "b"]
    assert df["k"].tolist() == [1, 2, 3]
    assert df["a"].tolist()[:2] == [10, 20] and np.isnan(df["a"].iloc[2])
    assert np.isnan(df["b"].iloc[0]) and df["b"].iloc[2] == 7.5


def test_read_parquet_union_promotes_types(ray_session, tmp_path):
    from solaris_ray.sources.formats import read_parquet_union

    p1 = str(tmp_path / "w1.parquet")
    p2 = str(tmp_path / "w2.parquet")
    pq.write_table(pa.table({"k": pa.array([1], pa.int32())}), p1)
    pq.write_table(pa.table({"k": pa.array([2**40], pa.int64())}), p2)
    df = read_parquet_union([p1, p2]).to_pandas().sort_values("k")
    assert df["k"].tolist() == [1, 2**40]
