"""Exact distributed quantiles + t-digest sketch accuracy."""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from solaris_ray.stages.quantiles import TDigest, exact_quantiles, tdigest_aggregate


def test_exact_quantiles_match_numpy(ray_session):
    import ray

    rng = np.random.default_rng(5)
    vals = rng.integers(0, 100000, 20000).astype(np.int64)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(8)
    qs = [0.1, 0.5, 0.9]
    out = exact_quantiles(ds, "v", qs).to_pandas()
    s = np.sort(vals, kind="stable")
    for q, got in zip(out["q"], out["value"]):
        assert got == float(s[int(np.floor(q * (len(s) - 1)))])


def test_exact_quantiles_skewed(ray_session):
    import ray

    # heavy duplication: one bucket holds most mass
    vals = np.concatenate([np.zeros(5000, dtype=np.int64), np.arange(100, dtype=np.int64)])
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(4)
    out = exact_quantiles(ds, "v", [0.5, 0.99]).to_pandas()
    s = np.sort(vals)
    assert out.iloc[0]["value"] == float(s[int(np.floor(0.5 * (len(s) - 1)))])
    assert out.iloc[1]["value"] == float(s[int(np.floor(0.99 * (len(s) - 1)))])


def test_tdigest_merge_accuracy():
    rng = np.random.default_rng(9)
    vals = rng.lognormal(3, 1, 50000)
    # shard into 10 digests and merge — simulates the map-side partials
    final = TDigest(200)
    for shard in np.array_split(vals, 10):
        d = TDigest(200)
        d.add(shard)
        final = final.merge(d)
    for q in (0.1, 0.5, 0.9, 0.99):
        est = final.quantile(q)
        true = np.quantile(vals, q)
        assert abs(est - true) / true < 0.05, (q, est, true)


def test_tdigest_aggregate_pipeline(ray_session):
    import ray

    rng = np.random.default_rng(13)
    vals = rng.normal(1000, 100, 30000)
    ds = ray.data.from_arrow(pa.table({"v": pa.array(vals)})).repartition(6)
    out = tdigest_aggregate(ds, "v", [0.5]).to_pandas()
    assert abs(out.iloc[0]["value"] - np.quantile(vals, 0.5)) < 10


def test_group_quantiles_match_duckdb_disc(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray

    from solaris_ray.stages.quantiles import group_quantiles

    rng = np.random.default_rng(13)
    srcs = np.array(["a", "bb", "ccc"])[rng.integers(0, 3, 500)]
    vals = rng.integers(0, 10_000, 500).astype(np.int64)
    ds = ray.data.from_arrow(
        pa.table({"source": pa.array(srcs), "n_chars": pa.array(vals)})
    ).repartition(4)
    got = (
        group_quantiles(ds, "source", "n_chars", [0.5, 0.9, 0.99])
        .to_pandas().sort_values(["source", "q"]).reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute("set threads=2")
    con.register("t", pa.table({"source": pa.array(srcs), "n_chars": pa.array(vals)}))
    exp = con.execute("""
        SELECT source, CAST(q AS DOUBLE) AS q, v FROM (
          SELECT source, 0.5 AS q, quantile_disc(n_chars, 0.5) AS v FROM t GROUP BY source
          UNION ALL SELECT source, 0.9, quantile_disc(n_chars, 0.9) FROM t GROUP BY source
          UNION ALL SELECT source, 0.99, quantile_disc(n_chars, 0.99) FROM t GROUP BY source)
        ORDER BY source, q""").df()
    assert list(got["source"]) == list(exp["source"])
    assert list(got["q"]) == list(exp["q"])
    assert list(got["value"]) == list(exp["v"])


def test_group_quantiles_rejects_float_column(ray_session):
    import pytest
    import ray

    from solaris_ray.stages.quantiles import group_quantiles

    ds = ray.data.from_arrow(
        pa.table({"g": pa.array(["a", "b"]), "v": pa.array([1.5, 2.5])})
    )
    with pytest.raises(TypeError, match="integer-typed"):
        group_quantiles(ds, "g", "v", [0.5])
