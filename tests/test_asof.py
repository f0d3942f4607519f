"""asof_join — nearest-prior join semantics vs a pure-pandas oracle."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _sides(seed=7, n_left=300, n_right=120, n_keys=9):
    rng = np.random.default_rng(seed)
    left = pa.table(
        {
            "key": pa.array(rng.integers(0, n_keys, n_left), pa.int64()),
            "ts": pa.array(rng.integers(0, 10_000, n_left), pa.int64()),
            "lval": pa.array(rng.integers(0, 1000, n_left), pa.int64()),
        }
    )
    right = pa.table(
        {
            "key": pa.array(rng.integers(0, n_keys, n_right), pa.int64()),
            # distinct per (key, ts): stride by row index
            "ts": pa.array(np.arange(n_right) * 37 % 9973, pa.int64()),
            "rval": pa.array(rng.integers(0, 1000, n_right), pa.int64()),
        }
    )
    return left, right


def _pandas_asof(left: pa.Table, right: pa.Table) -> pd.DataFrame:
    l = left.to_pandas().sort_values("ts", kind="stable")
    r = right.to_pandas().sort_values("ts", kind="stable")
    m = pd.merge_asof(l, r, on="ts", by="key", direction="backward",
                      suffixes=("", "_r"))
    return m.dropna(subset=["rval"])


@pytest.mark.parametrize("nblocks", [1, 4])
def test_matches_pandas_merge_asof(ray_session, nblocks):
    import ray
    from solaris_ray.stages.asof import asof_join

    left, right = _sides()
    out = (
        asof_join(
            ray.data.from_arrow(left).repartition(nblocks),
            ray.data.from_arrow(right).repartition(nblocks),
            on="ts", by="key", left_cols=["lval"], right_cols=["rval"],
        )
        .to_pandas()
        .sort_values(["key", "ts", "lval"], kind="stable")
        .reset_index(drop=True)
    )
    exp = (
        _pandas_asof(left, right)[["key", "ts", "lval", "rval"]]
        .sort_values(["key", "ts", "lval"], kind="stable")
        .reset_index(drop=True)
    )
    assert len(out) == len(exp)
    assert (out["key"].values == exp["key"].values).all()
    assert (out["ts"].values == exp["ts"].values).all()
    assert (out["lval"].values == exp["lval"].values).all()
    assert (out["rval"].values == exp["rval"].values).all()
    # matched right ts is always <= left ts
    assert (out["r_ts"].values <= out["ts"].values).all()


def test_no_prior_right_row_drops_left(ray_session):
    import ray
    from solaris_ray.stages.asof import asof_join

    left = pa.table({"key": pa.array([1, 1, 2], pa.int64()),
                     "ts": pa.array([5, 50, 5], pa.int64()),
                     "lval": pa.array([10, 20, 30], pa.int64())})
    right = pa.table({"key": pa.array([1, 2], pa.int64()),
                      "ts": pa.array([10, 100], pa.int64()),
                      "rval": pa.array([7, 8], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="ts", by="key", left_cols=["lval"], right_cols=["rval"]).to_pandas()
    # only (key=1, ts=50) has a prior right row (ts=10)
    assert len(out) == 1
    assert out.iloc[0]["lval"] == 20 and out.iloc[0]["rval"] == 7 and out.iloc[0]["r_ts"] == 10


def test_equal_timestamp_matches_inclusive(ray_session):
    import ray
    from solaris_ray.stages.asof import asof_join

    left = pa.table({"key": pa.array([1], pa.int64()),
                     "ts": pa.array([10], pa.int64()),
                     "lval": pa.array([1], pa.int64())})
    right = pa.table({"key": pa.array([1], pa.int64()),
                      "ts": pa.array([10], pa.int64()),
                      "rval": pa.array([42], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    on="ts", by="key", left_cols=["lval"], right_cols=["rval"]).to_pandas()
    assert len(out) == 1 and out.iloc[0]["rval"] == 42
