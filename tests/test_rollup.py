"""ROLLUP grouping-sets aggregate tests.

Oracle: pandas groupby per prefix level on the same rows — exact
int equality — plus the SQL empty-input convention (grand total row
always present) and 3-key cascade composition.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray

from solaris_ray.stages.rollup import rollup_aggregate


def _ds(rows, cols, n_blocks=3):
    t = pa.table({c: pa.array([r[i] for r in rows]) for i, c in enumerate(cols)})
    return ray.data.from_arrow(t).repartition(n_blocks)


def _naive(rows, cols, keys, vals, sentinel="*"):
    df = pd.DataFrame(rows, columns=cols)
    out = []
    for k in range(len(keys), 0, -1):
        g = df.groupby(keys[:k], sort=False)
        agg = g.size().rename("n_rows").to_frame()
        for v in vals:
            agg[f"sum_{v}"] = g[v].sum()
        agg = agg.reset_index()
        for dropped in keys[k:]:
            agg[dropped] = sentinel
        agg["lvl"] = k
        out.append(agg)
    tot = {kk: sentinel for kk in keys}
    tot["lvl"] = 0
    tot["n_rows"] = len(df)
    for v in vals:
        tot[f"sum_{v}"] = int(df[v].sum()) if len(df) else 0
    out.append(pd.DataFrame([tot]))
    cols_out = keys + ["lvl", "n_rows"] + [f"sum_{v}" for v in vals]
    res = pd.concat(out)[cols_out]
    return set(map(tuple, res.itertuples(index=False)))


def _run(rows, cols, keys, vals):
    got = rollup_aggregate(_ds(rows, cols), keys, vals).take_all()
    cols_out = keys + ["lvl", "n_rows"] + [f"sum_{v}" for v in vals]
    return set(tuple(r[c] for c in cols_out) for r in got)


def test_rollup_two_keys():
    rows = [
        ("web", "en", 10), ("web", "en", 5), ("web", "de", 7),
        ("wiki", "en", 3), ("wiki", "fr", 1), ("web", "de", 2),
    ]
    cols = ["source", "lang", "n"]
    assert _run(rows, cols, ["source", "lang"], ["n"]) == _naive(
        rows, cols, ["source", "lang"], ["n"]
    )


def test_rollup_three_keys_and_two_values():
    rng = np.random.default_rng(3)
    rows = [
        (f"s{int(rng.integers(0, 4))}", f"l{int(rng.integers(0, 3))}",
         f"t{int(rng.integers(0, 2))}", int(rng.integers(0, 100)),
         int(rng.integers(0, 10)))
        for _ in range(500)
    ]
    cols = ["a", "b", "c", "x", "y"]
    assert _run(rows, cols, ["a", "b", "c"], ["x", "y"]) == _naive(
        rows, cols, ["a", "b", "c"], ["x", "y"]
    )


def test_rollup_empty_input_emits_grand_total():
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array([], pa.string()), "x": pa.array([], pa.int64())})
    )
    got = rollup_aggregate(ds, ["a"], ["x"]).take_all()
    assert len(got) == 1
    assert got[0] == {"a": "*", "lvl": 0, "n_rows": 0, "sum_x": 0}


def test_rollup_rejects_no_keys():
    with pytest.raises(ValueError):
        rollup_aggregate(ray.data.range(1), [], ["id"])


def test_rollup_rejects_null_keys():
    # NULL keys would be dropped by pandas and COALESCE-aliased with
    # subtotal rows by the SQL twin — refuse loudly instead
    ds = ray.data.from_arrow(
        pa.table({"a": pa.array(["x", None, "x"]), "x": pa.array([1, 2, 4])})
    )
    with pytest.raises(Exception, match="contains nulls"):
        rollup_aggregate(ds, ["a"], ["x"]).take_all()
