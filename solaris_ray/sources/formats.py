"""Alternate source formats — CSV, JSONL, Arrow IPC (Feather v2), ORC.

A user of the reference engine feeds it whatever lands on disk; the
reference's io seam (``/root/reference/solaris/utils/io.py``) is
format-agnostic past the read, and so is this engine.  Parquet/Lance
are the primary path (``reader.py``); this module adds the other
table formats the stack can read WITHOUT new wheels:

- CSV and JSONL ride Ray's native ``read_csv`` / ``read_json``; CSV
  column pruning is pushed into the Arrow parser
  (``ConvertOptions.include_columns``) so dropped columns never
  materialize.
- Arrow IPC and ORC have no Ray reader in this version, so each gets a
  ``FileBasedDatasource`` subclass that streams record batches /
  stripes with native column pruning — files are never slurped whole,
  and the datasource inherits Ray's file-sharding, so a directory of
  shards reads in parallel exactly like parquet.

Avro: ``ray.data.read_avro`` exists but requires an avro decoder wheel
absent from this container, and pyarrow cannot write avro; gated out
with an ImportError seam rather than a fake.
"""

from __future__ import annotations

from typing import Iterator, List, Optional, Union

import pyarrow as pa

from ray.data.datasource import FileBasedDatasource

# Batches this size keep IPC/ORC block shapes comparable to the
# parquet reader's row-group-sized blocks.
_STREAM_BATCH_ROWS = 65536


class _RandomAccessDatasource(FileBasedDatasource):
    """Base for formats whose readers need a seekable file (IPC
    footer, ORC tail metadata): open random-access instead of the
    default sequential stream."""

    def _open_input_source(self, filesystem, path, **open_args):
        return filesystem.open_input_file(path)


class IpcDatasource(_RandomAccessDatasource):
    """Arrow IPC file (Feather v2) datasource with column pruning.

    Streams one record batch at a time via the IPC reader's
    random-access API — only the projected columns' buffers are read
    (IPC is column-contiguous per batch), so a metadata-only consumer
    never lifts payload bytes off storage.
    """

    _FILE_EXTENSIONS = ["arrow", "feather", "ipc"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        columns: Optional[List[str]] = None,
        **file_based_datasource_kwargs,
    ):
        super().__init__(paths, **file_based_datasource_kwargs)
        self._columns = columns

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        reader = pa.ipc.open_file(f)
        for i in range(reader.num_record_batches):
            batch = reader.get_batch(i)
            tbl = pa.Table.from_batches([batch])
            if self._columns is not None:
                tbl = tbl.select(self._columns)
            yield tbl


class OrcDatasource(_RandomAccessDatasource):
    """ORC datasource with stripe streaming and column pruning.

    ``pyarrow.orc`` reads per stripe; ``columns=`` prunes at the
    decoder so unselected columns stay on storage, matching the
    parquet reader's discipline.
    """

    _FILE_EXTENSIONS = ["orc"]

    def __init__(
        self,
        paths: Union[str, List[str]],
        columns: Optional[List[str]] = None,
        **file_based_datasource_kwargs,
    ):
        super().__init__(paths, **file_based_datasource_kwargs)
        self._columns = columns

    def _read_stream(self, f: "pa.NativeFile", path: str) -> Iterator[pa.Table]:
        from pyarrow import orc

        of = orc.ORCFile(f)
        for i in range(of.nstripes):
            batch = of.read_stripe(i, columns=self._columns)
            # pyarrow's ORC reader attaches file metadata dicts that
            # Ray's schema-dedup hash can't digest — strip them
            yield pa.Table.from_batches([batch]).replace_schema_metadata(None)


def read_ipc(paths, columns: Optional[List[str]] = None, **kwargs):
    """Read Arrow IPC (Feather v2) files as a Dataset, pruned."""
    import ray

    return ray.data.read_datasource(IpcDatasource(paths, columns=columns), **kwargs)


def read_orc(paths, columns: Optional[List[str]] = None, **kwargs):
    """Read ORC files as a Dataset, stripe-parallel, pruned."""
    import ray

    return ray.data.read_datasource(OrcDatasource(paths, columns=columns), **kwargs)


def read_csv(paths, columns: Optional[List[str]] = None, **kwargs):
    """Read CSV with column pruning pushed into the Arrow parser."""
    import ray
    from pyarrow import csv as pacsv

    convert = kwargs.pop("convert_options", None)
    if columns is not None:
        if convert is None:
            convert = pacsv.ConvertOptions()
        convert.include_columns = columns
    if convert is not None:
        kwargs["convert_options"] = convert
    return ray.data.read_csv(paths, **kwargs)


def read_jsonl(paths, columns: Optional[List[str]] = None, **kwargs):
    """Read newline-delimited JSON.  Arrow's JSON parser has no
    projection pushdown; prune immediately after parse so downstream
    blocks carry only the requested columns."""
    import ray

    ds = ray.data.read_json(paths, **kwargs)
    if columns is not None:
        ds = ds.select_columns(columns)
    return ds


_READERS = {
    "csv": read_csv,
    "jsonl": read_jsonl,
    "json": read_jsonl,
    "ipc": read_ipc,
    "arrow": read_ipc,
    "feather": read_ipc,
    "orc": read_orc,
}


def read_any(path: str, fmt: Optional[str] = None,
             columns: Optional[List[str]] = None, **kwargs):
    """Format-dispatch read.  ``fmt=None`` sniffs the extension;
    parquet/lance route through the primary reader seam."""
    if fmt is None:
        fmt = path.rsplit(".", 1)[-1].lower()
    if fmt in ("parquet", "lance"):
        from .reader import read_images

        return read_images(path, columns=columns, **kwargs)
    if fmt == "avro":
        raise ImportError(
            "avro requires a decoder wheel absent from this environment; "
            "ray.data.read_avro is the seam once one exists"
        )
    try:
        reader = _READERS[fmt]
    except KeyError:
        raise ValueError(f"unknown source format: {fmt!r}") from None
    return reader(path, columns=columns, **kwargs)


# ---------------------------------------------------------------------------
# Deterministic sidecar fixtures: derive a CSV/JSONL/IPC/ORC twin of a
# parquet fixture table under /tmp, once, atomically — gate queries
# read the sidecar through this module while the DuckDB oracle reads
# the original parquet, so a value-hash match proves the whole read
# path (writer included) is lossless.

def sidecar_path(sf_dir: str, table: str, fmt: str) -> str:
    """Build (once) and return the sidecar twin of ``table`` in ``fmt``."""
    import os
    import tempfile

    import pyarrow.parquet as pq

    base = os.path.basename(os.path.normpath(sf_dir)) or "sf"
    out_dir = os.path.join(tempfile.gettempdir(), "srx_sidecars", base)
    os.makedirs(out_dir, exist_ok=True)
    ext = {"jsonl": "jsonl", "csv": "csv", "ipc": "arrow", "orc": "orc"}[fmt]
    out = os.path.join(out_dir, f"{table}.{ext}")
    if os.path.exists(out):
        return out

    # metadata-free schema: the parquet writer's pandas blob would ride
    # into the sidecar and defeat Ray's streaming-executor schema dedup
    tbl = pq.read_table(f"{sf_dir}/{table}.parquet")
    tbl = tbl.replace_schema_metadata(None)
    # Timestamps don't survive CSV/JSONL round-trips portably; ship
    # them as epoch microseconds (the oracle uses epoch_us() to match).
    if fmt in ("csv", "jsonl"):
        for i, field in enumerate(tbl.schema):
            if pa.types.is_timestamp(field.type):
                us = tbl.column(i).cast(pa.timestamp("us")).cast(pa.int64())
                tbl = tbl.set_column(i, f"{field.name}_us", us)

    fd, tmp = tempfile.mkstemp(dir=out_dir, suffix="." + ext)
    os.close(fd)
    try:
        if fmt == "csv":
            from pyarrow import csv as pacsv

            pacsv.write_csv(tbl, tmp)
        elif fmt == "jsonl":
            _write_jsonl(tbl, tmp)
        elif fmt == "ipc":
            with pa.OSFile(tmp, "wb") as sink:
                with pa.ipc.new_file(sink, tbl.schema) as writer:
                    for batch in tbl.to_batches(max_chunksize=512):
                        writer.write_batch(batch)
        elif fmt == "orc":
            from pyarrow import orc

            orc.write_table(tbl, tmp, stripe_size=64 * 1024)
        os.replace(tmp, out)  # atomic: concurrent builders converge
    finally:
        if os.path.exists(tmp):
            os.unlink(tmp)
    return out


def _write_jsonl(tbl: pa.Table, path: str) -> None:
    import json

    cols = tbl.column_names
    with open(path, "w", encoding="utf-8") as fh:
        for row in zip(*(tbl.column(c).to_pylist() for c in cols)):
            fh.write(json.dumps(dict(zip(cols, row)), ensure_ascii=False))
            fh.write("\n")


def read_parquet_union(paths: list[str], **kwargs):
    """Read heterogeneous parquet shards (drifted schemas: columns
    added/dropped across shards) as ONE dataset over the UNION schema,
    null-filling columns a shard lacks — the schema-evolution
    ingestion seam.  Numeric widths are promoted via Arrow's
    unify_schemas; each shard is read separately (its own pruned
    read) and aligned by a per-batch map, so no shard pays for
    columns it doesn't store."""
    import ray
    import pyarrow.parquet as pq

    schemas = [pq.read_schema(p).remove_metadata() for p in paths]
    unified = pa.unify_schemas(schemas, promote_options="permissive")

    def _align(batch: pa.Table) -> pa.Table:
        cols = []
        for field in unified:
            if field.name in batch.column_names:
                cols.append(batch[field.name].cast(field.type))
            else:
                cols.append(pa.nulls(batch.num_rows, field.type))
        return pa.table(dict(zip(unified.names, cols)))

    parts = [
        ray.data.read_parquet(p, schema=s, **kwargs).map_batches(
            _align, batch_format="pyarrow")
        for p, s in zip(paths, schemas)
    ]
    ds = parts[0]
    for d in parts[1:]:
        ds = ds.union(d)
    return ds
