"""Forward fill + pivot: pandas twins, block-layout invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from solaris_ray.stages.ffill import forward_fill
from solaris_ray.stages.pivot import pivot_counts


def _ffill_fixture(seed=0, n=2000, keys=37):
    rng = np.random.default_rng(seed)
    k = rng.integers(0, keys, n).astype(np.int64)
    t = rng.integers(0, 500, n).astype(np.int64)  # heavy ts ties
    i = np.arange(n, dtype=np.int64)
    v = rng.integers(-100, 100, n).astype(np.int64)
    obs = rng.random(n) < 0.25
    return k, t, i, v, obs


def test_forward_fill_matches_pandas(ray_session):
    k, t, i, v, obs = _ffill_fixture()
    tbl = pa.table(
        {
            "k": pa.array(k),
            "t": pa.array(t),
            "id": pa.array(i),
            "v": pa.array(v, pa.int64(), mask=~obs),
        }
    )
    out = (
        forward_fill(
            ray.data.from_arrow(tbl).repartition(7),
            key_col="k", order_cols=["t"], val_col="v", id_col="id",
        )
        .sort("id")
        .to_pandas()
    )
    df = pd.DataFrame({"k": k, "t": t, "id": i, "v": np.where(obs, v, np.nan)})
    df = df.sort_values(["k", "t", "id"])
    df["filled"] = df.groupby("k")["v"].ffill()
    want = df.sort_values("id")["filled"].to_numpy()
    got = out["filled"].to_numpy(dtype=object)
    for g, w in zip(got, want):
        if np.isnan(w):
            assert g is None or (isinstance(g, float) and np.isnan(g)), (g, w)
        else:
            assert g == int(w), (g, w)


def test_pivot_matches_pandas(ray_session):
    rng = np.random.default_rng(4)
    n = 3000
    k = rng.integers(0, 50, n).astype(np.int64)
    cats = np.array(["a", "b", "c"])
    c = cats[rng.integers(0, 3, n)]
    v = rng.integers(0, 10, n).astype(np.int64)
    tbl = pa.table(
        {"u": pa.array(k), "cat": pa.array(c), "v": pa.array(v)}
    )
    out = (
        pivot_counts(
            ray.data.from_arrow(tbl).repartition(5),
            key_col="u", cat_col="cat", categories=["a", "b", "c"],
            val_col="v",
        )
        .sort("u")
        .to_pandas()
    )
    df = pd.DataFrame({"u": k, "cat": c, "v": v})
    for cat in "abc":
        sub = df[df["cat"] == cat].groupby("u")
        n_ref = sub.size().reindex(range(50), fill_value=0)
        s_ref = sub["v"].sum().reindex(range(50), fill_value=0)
        assert (out[f"{cat}_n"].to_numpy() == n_ref.to_numpy()).all()
        assert (out[f"{cat}_sum"].to_numpy() == s_ref.to_numpy()).all()


def test_pivot_unlisted_category_ignored(ray_session):
    tbl = pa.table(
        {
            "u": pa.array([1, 1, 2], pa.int64()),
            "cat": pa.array(["a", "zz", "a"]),
            "v": pa.array([5, 9, 2], pa.int64()),
        }
    )
    out = (
        pivot_counts(
            ray.data.from_arrow(tbl), key_col="u", cat_col="cat",
            categories=["a"], val_col="v",
        )
        .sort("u")
        .to_pandas()
    )
    assert out["a_n"].tolist() == [1, 1]
    assert out["a_sum"].tolist() == [5, 2]
