"""cube_aggregate: all grouping sets, exact sums."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.rollup import cube_aggregate


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _rows(ds):
    tbls = list(ds.iter_batches(batch_format="pyarrow"))
    out = pa.concat_tables(tbls).to_pylist() if tbls else []
    return {(r["a"], r["b"]): (r["lvl"], r["n_rows"], r["sum_v"]) for r in out}


def test_two_key_cube(ray_session):
    t = pa.table({
        "a": pa.array(["x", "x", "y", "y", "y"]),
        "b": pa.array(["p", "q", "p", "p", "q"]),
        "v": pa.array([1, 2, 4, 8, 16], pa.int64()),
    })
    got = _rows(cube_aggregate(_ds(t), ["a", "b"], ["v"]))
    assert got[("x", "p")] == (2, 1, 1)
    assert got[("x", "q")] == (2, 1, 2)
    assert got[("y", "p")] == (2, 2, 12)
    assert got[("y", "q")] == (2, 1, 16)
    assert got[("x", "*")] == (1, 2, 3)
    assert got[("y", "*")] == (1, 3, 28)
    assert got[("*", "p")] == (1, 3, 13)   # the set ROLLUP cannot emit
    assert got[("*", "q")] == (1, 2, 18)
    assert got[("*", "*")] == (0, 5, 31)
    assert len(got) == 9


def test_cube_rejects_wide_and_empty_keys(ray_session):
    t = _ds(pa.table({"a": pa.array(["x"]), "v": pa.array([1], pa.int64())}))
    with pytest.raises(ValueError):
        cube_aggregate(t, [], ["v"])
    with pytest.raises(ValueError):
        cube_aggregate(t, ["a", "b", "c", "d", "e"], ["v"])


def test_cube_null_key_raises(ray_session):
    t = _ds(pa.table({"a": pa.array(["x", None]),
                      "v": pa.array([1, 2], pa.int64())}))
    with pytest.raises(Exception, match="null"):
        list(cube_aggregate(t, ["a"], ["v"]).iter_batches())
