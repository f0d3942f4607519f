"""Alternate source formats: CSV / JSONL / Arrow IPC / ORC readers.

The engine must read whatever table format lands on disk (the
reference's io seam is format-agnostic past the read,
/root/reference/solaris/utils/io.py); these tests prove each format's
Ray read path is lossless against the parquet original and that
column pruning actually drops columns.
"""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from solaris_ray.sources import formats as F

SF_DIR = "/root/testdata/sf0.001"


def _pq_table(table: str) -> pa.Table:
    return pq.read_table(f"{SF_DIR}/{table}.parquet").replace_schema_metadata(None)


@pytest.mark.parametrize("fmt,table", [
    ("csv", "nation"),
    ("jsonl", "nation"),
    ("ipc", "nation"),
    ("orc", "nation"),
])
def test_roundtrip_lossless(ray_session, fmt, table):
    path = F.sidecar_path(SF_DIR, table, fmt)
    got = (
        F.read_any(path, fmt)
        .to_pandas()
        .sort_values("n_nationkey")
        .reset_index(drop=True)
    )
    want = _pq_table(table).to_pandas().sort_values("n_nationkey").reset_index(drop=True)
    # CSV/JSONL parsers may widen int32 → int64; compare values
    assert list(got.columns) == list(want.columns)
    for c in want.columns:
        assert got[c].astype(want[c].dtype).tolist() == want[c].tolist(), c


@pytest.mark.parametrize("fmt,cols", [
    ("csv", ["c_custkey", "c_mktsegment"]),
    ("jsonl", ["c_custkey", "c_mktsegment"]),
    ("ipc", ["c_custkey", "c_mktsegment"]),
    ("orc", ["c_custkey", "c_mktsegment"]),
])
def test_column_pruning(ray_session, fmt, cols):
    path = F.sidecar_path(SF_DIR, "customer", fmt)
    b = F.read_any(path, fmt, columns=cols).take_batch(10, batch_format="pyarrow")
    assert sorted(b.column_names) == sorted(cols)


def test_ipc_streams_multiple_batches(ray_session):
    # the sidecar writer chunks at 512 rows; events (1000 rows) must
    # produce >1 record batch so the datasource's streaming is exercised
    path = F.sidecar_path(SF_DIR, "events", "ipc")
    with pa.OSFile(path, "rb") as f:
        reader = pa.ipc.open_file(f)
        assert reader.num_record_batches > 1
    assert F.read_any(path, "ipc").count() == 1000


def test_orc_multi_stripe(ray_session):
    from pyarrow import orc

    path = F.sidecar_path(SF_DIR, "lineitem", "orc")
    assert orc.ORCFile(path).nstripes > 1
    assert F.read_any(path, "orc").count() == 6000


def test_timestamps_become_epoch_us():
    import json

    path = F.sidecar_path(SF_DIR, "events", "jsonl")
    with open(path) as fh:
        row = json.loads(fh.readline())
    assert "ts_us" in row and isinstance(row["ts_us"], int)
    assert "ts" not in row


def test_read_any_dispatch_errors():
    with pytest.raises(ValueError, match="unknown source format"):
        F.read_any("/tmp/x.xyz")
    with pytest.raises(ImportError, match="avro"):
        F.read_any("/tmp/x.avro")


def test_sidecar_idempotent():
    import os

    p1 = F.sidecar_path(SF_DIR, "region", "csv")
    m1 = os.path.getmtime(p1)
    p2 = F.sidecar_path(SF_DIR, "region", "csv")
    assert p1 == p2 and os.path.getmtime(p2) == m1
