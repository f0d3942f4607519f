"""merge_changes (MERGE/upsert) + scd2_intervals semantics."""

import numpy as np
import pyarrow as pa
import pytest

from solaris_ray.stages.cdc import merge_changes, scd2_intervals


def _ds(tbl):
    import ray.data

    return ray.data.from_arrow(tbl)


def _collect(ds):
    tbls = list(ds.iter_batches(batch_format="pyarrow"))
    return pa.concat_tables(tbls) if tbls else None


def test_merge_last_writer_wins_delete_insert(ray_session):
    base = _ds(pa.table({
        "k": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([10, 20, 30, 40], pa.int64()),
        "s": pa.array(["a", "b", "c", "d"]),
    }))
    changes = _ds(pa.table({
        "k": pa.array([1, 1, 2, 5, 3], pa.int64()),
        "seq": pa.array([7, 3, 1, 0, 9], pa.int64()),
        "op": pa.array(["U", "U", "D", "I", "D"]),
        "v": pa.array([111, 99, 0, 55, 0], pa.int64()),
        "s": pa.array(["u-late", "u-early", "x", "new", "x"]),
    }))
    out = _collect(merge_changes(base, changes, "k", "seq", "op", ["v", "s"]))
    rows = {r["k"]: (r["v"], r["s"]) for r in out.to_pylist()}
    # k=1: seq 7 beats seq 3; k=2 deleted; k=3 deleted; k=4 untouched; k=5 inserted
    assert rows == {1: (111, "u-late"), 4: (40, "d"), 5: (55, "new")}


def test_merge_duplicate_key_seq_raises(ray_session):
    base = _ds(pa.table({"k": pa.array([1], pa.int64()),
                         "v": pa.array([1], pa.int64())}))
    changes = _ds(pa.table({
        "k": pa.array([1, 1], pa.int64()),
        "seq": pa.array([2, 2], pa.int64()),
        "op": pa.array(["U", "U"]),
        "v": pa.array([5, 6], pa.int64()),
    }))
    with pytest.raises(Exception, match="duplicate"):
        _collect(merge_changes(base, changes, "k", "seq", "op", ["v"]))


def test_merge_negative_seq_rejected(ray_session):
    base = _ds(pa.table({"k": pa.array([1], pa.int64()),
                         "v": pa.array([1], pa.int64())}))
    changes = _ds(pa.table({
        "k": pa.array([1], pa.int64()),
        "seq": pa.array([-2], pa.int64()),
        "op": pa.array(["U"]),
        "v": pa.array([5], pa.int64()),
    }))
    with pytest.raises(Exception, match="seq must be >= 0"):
        _collect(merge_changes(base, changes, "k", "seq", "op", ["v"]))


def test_scd2_runs_collapse_and_close(ray_session):
    ev = _ds(pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([100, 200, 300, 400, 150, 250], pa.int64()),
        "user_id": pa.array([7, 7, 7, 7, 8, 8], pa.int64()),
        "event_type": pa.array(["a", "a", "b", "a", "x", "x"]),
    }))
    out = _collect(scd2_intervals(ev)).to_pylist()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["from_us"])):
        by_user.setdefault(r["user_id"], []).append(
            (r["status"], r["from_us"], r["to_us"], r["n_rows"]))
    assert by_user[7] == [("a", 100, 300, 2), ("b", 300, 400, 1),
                          ("a", 400, -1, 1)]
    assert by_user[8] == [("x", 150, -1, 2)]


def test_scd2_tie_break_by_event_id(ray_session):
    # equal timestamps: order falls back to event_id
    ev = _ds(pa.table({
        "event_id": pa.array([2, 1], pa.int64()),
        "ts": pa.array([100, 100], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
        "event_type": pa.array(["late", "early"]),
    }))
    out = sorted(_collect(scd2_intervals(ev)).to_pylist(),
                 key=lambda r: r["event_id"] if "event_id" in r else 0)
    statuses = {r["status"]: r for r in out}
    assert statuses["early"]["to_us"] == 100 and statuses["late"]["to_us"] == -1


def test_scd2_lookup_boundaries(ray_session):
    from solaris_ray.stages.cdc import scd2_lookup

    iv = _ds(pa.table({
        "user_id": pa.array([1, 1, 2], pa.int64()),
        "status": pa.array(["a", "b", "x"]),
        "from_us": pa.array([100, 300, 50], pa.int64()),
        "to_us": pa.array([300, -1, -1], pa.int64()),
    }))
    ev = _ds(pa.table({
        "event_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "ts": pa.array([100, 299, 300, 50, 49, 1000], pa.int64()),
        "user_id": pa.array([1, 1, 1, 1, 1, 2], pa.int64()),
    }))
    out = {r["event_id"]: r["status"]
           for r in _collect(scd2_lookup(ev, iv)).to_pylist()}
    # boundary ts=300 lands in the NEWER interval; ts 49/50 predate
    # user 1's first interval and drop
    assert out == {0: "a", 1: "a", 2: "b", 5: "x"}


def test_scd2_lookup_closed_gap_drops(ray_session):
    from solaris_ray.stages.cdc import scd2_lookup

    iv = _ds(pa.table({
        "user_id": pa.array([1], pa.int64()),
        "status": pa.array(["a"]),
        "from_us": pa.array([100], pa.int64()),
        "to_us": pa.array([200], pa.int64()),
    }))
    ev = _ds(pa.table({
        "event_id": pa.array([0, 1], pa.int64()),
        "ts": pa.array([150, 250], pa.int64()),
        "user_id": pa.array([1, 1], pa.int64()),
    }))
    out = {r["event_id"]: r["status"]
           for r in _collect(scd2_lookup(ev, iv)).to_pylist()}
    assert out == {0: "a"}  # 250 falls past the closed interval


def test_merge_unknown_op_raises(ray_session):
    base = _ds(pa.table({"k": pa.array([1], pa.int64()),
                         "v": pa.array([1], pa.int64())}))
    changes = _ds(pa.table({
        "k": pa.array([1], pa.int64()),
        "seq": pa.array([2], pa.int64()),
        "op": pa.array(["B"]),  # the internal base sentinel is not a feed op
        "v": pa.array([5], pa.int64()),
    }))
    with pytest.raises(Exception, match="unknown op"):
        _collect(merge_changes(base, changes, "k", "seq", "op", ["v"]))
