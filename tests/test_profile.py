"""profile_table: exact per-column stats."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.profile import profile_table


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def test_profile_counts_and_ranges(ray_session):
    t = pa.table({
        "a": pa.array([5, 5, -2, 9, 9, 9], pa.int64()),
        "s": pa.array(["xx", None, "yyy", "xx", None, "z"]),
    })
    out = profile_table(
        _ds(t),
        {"a": lambda b: b["a"].to_numpy(zero_copy_only=False).astype(np.int64)},
        ["s"],
    )
    rows = {r["col"]: r for r in
            pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).to_pylist()}
    assert rows["a"] == {"col": "a", "n": 6, "n_null": 0, "n_distinct": 3,
                         "vmin": -2, "vmax": 9}
    # strings: 4 non-null rows + 2 nulls; distinct {xx, yyy, z};
    # byte-length range 1..3
    assert rows["s"] == {"col": "s", "n": 6, "n_null": 2, "n_distinct": 3,
                         "vmin": 1, "vmax": 3}


def test_profile_empty_input_emits_zero_rows_per_column(ray_session):
    t = pa.table({
        "a": pa.array([], pa.int64()),
        "s": pa.array([], pa.string()),
    })
    out = profile_table(
        _ds(t),
        {"a": lambda b: b["a"].to_numpy(zero_copy_only=False).astype(np.int64)},
        ["s"],
    )
    rows = {r["col"]: r for r in
            pa.concat_tables(list(out.iter_batches(batch_format="pyarrow"))).to_pylist()}
    assert rows["a"]["n"] == 0 and rows["a"]["n_distinct"] == 0
    assert rows["a"]["vmin"] is None and rows["a"]["vmax"] is None
    assert rows["s"]["n"] == 0 and rows["s"]["vmin"] is None
