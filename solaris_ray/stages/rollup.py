"""Grouping-sets ROLLUP aggregate — every level from one wide shuffle.

Reporting over curated corpora (per source × language × license doc
counts with subtotal rows) wants SQL's ``GROUP BY ROLLUP``; the
reference has nothing relational.  The scale shape mirrors
``stages/pyramid.py``'s tile-pyramid rollup: the RAW data is shuffled
exactly once — per-batch partials at the FINEST key level feed one
``groupby`` — and every coarser level is re-aggregated from the
previous (already aggregated, distinct-key-combination-sized) level,
so subtotal derivation costs O(distinct keys), never a second pass
over the input.  Counts and sums compose under re-aggregation, which
is what makes the cascade exact.

Rolled-up key columns carry a caller-chosen sentinel (default ``*``)
instead of SQL NULL — the gate hash treats NULL and sentinel
differently across engines, and a printable sentinel keeps the output
a plain string column.  ``lvl`` = number of active (non-rolled) keys,
matching ``k - GROUPING(...)`` sums on the SQL side.

Values must be int64 (exact, order-free sums — the repo float idiom);
pre-scale monetary columns to cents in a prior ``map_batches``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _recast_agg(batch: pa.Table, cols: list[str], sums: list[str]) -> pa.Table:
    out = {}
    for k in cols:
        out[k] = batch[k]
    out["n_rows"] = pc.cast(batch["sum(n_rows)"], pa.int64())
    for s in sums:
        out[s] = pc.cast(batch[f"sum({s})"], pa.int64())
    return pa.table(out)


def _finest_level(ds, keys: list[str], value_cols: list[str],
                  sums: list[str], op_name: str):
    """ONE wide shuffle: per-batch partials at the finest key combo,
    combined by a single groupby, materialized as the fan-out point
    every grouping set re-aggregates from."""
    from ray.data.aggregate import Sum

    def _partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        for k in keys:
            if batch[k].null_count:
                # pandas groupby drops NaN groups and SQL ROLLUP/CUBE
                # would COALESCE a NULL group into the same spelling as
                # a subtotal row — both silently wrong; demand clean keys
                raise ValueError(
                    f"{op_name}: key column {k!r} contains nulls; "
                    "fill or filter them before aggregating"
                )
        data = {k: batch[k].to_numpy(zero_copy_only=False) for k in keys}
        for v in value_cols:
            data[v] = batch[v].to_numpy(zero_copy_only=False).astype(np.int64)
        df = pd.DataFrame(data)
        g = df.groupby(keys, sort=False).agg(
            n_rows=(value_cols[0] if value_cols else keys[0], "size"),
            **{s: (v, "sum") for s, v in zip(sums, value_cols)},
        ).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False).replace_schema_metadata(None)

    return (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=16384)
        .groupby(keys)
        .aggregate(Sum("n_rows"), *[Sum(s) for s in sums])
        .map_batches(lambda b, c=list(keys): _recast_agg(b, c, sums),
                     batch_format="pyarrow")
        .materialize()
    )


def rollup_aggregate(ds, keys: list[str], value_cols: list[str],
                     sentinel: str = "*"):
    """``ds`` (string key columns + int64 value columns) ->
    (keys..., lvl, n_rows, sum_<v>...) for every ROLLUP prefix level
    ``keys[:k]``, k = len(keys) .. 0 (the grand total always emits one
    row, zeros on empty input, matching SQL's ``()`` grouping set)."""
    if not keys:
        raise ValueError("keys must be non-empty")
    from ray.data.aggregate import Sum
    import ray

    sums = [f"sum_{v}" for v in value_cols]
    out_fields = [(k, pa.string()) for k in keys]
    out_fields += [("lvl", pa.int64()), ("n_rows", pa.int64())]
    out_fields += [(s, pa.int64()) for s in sums]
    out_schema = pa.schema(out_fields)

    finest = _finest_level(ds, keys, value_cols, sums, "rollup_aggregate")

    def _widen(batch: pa.Table, active: list[str]) -> pa.Table:
        n = batch.num_rows
        out = {}
        for k in keys:
            out[k] = (batch[k] if k in active
                      else pa.array([sentinel] * n, type=pa.string()))
        out["lvl"] = pa.array(np.full(n, len(active), np.int64))
        out["n_rows"] = batch["n_rows"]
        for s in sums:
            out[s] = batch[s]
        return pa.table(out, schema=out_schema)

    levels = [finest.map_batches(
        lambda b, a=list(keys): _widen(b, a), batch_format="pyarrow")]
    prev = finest
    for k in range(len(keys) - 1, 0, -1):
        active = keys[:k]
        cur = (
            prev.groupby(active)
            .aggregate(Sum("n_rows"), *[Sum(s) for s in sums])
            .map_batches(lambda b, c=list(active): _recast_agg(b, c, sums),
                         batch_format="pyarrow")
            .materialize()  # tiny (distinct prefix combos); read twice
        )
        levels.append(cur.map_batches(
            lambda b, a=list(active): _widen(b, a), batch_format="pyarrow"))
        prev = cur

    # grand total: scalar aggregation over the smallest level (tiny)
    tot = prev.sum(["n_rows"] + sums)
    if tot is None:  # empty input: SQL's () grouping set still emits
        tot = {}
    tot = {f"sum({c})": (tot.get(f"sum({c})") or 0) for c in ["n_rows"] + sums}
    row = {k: pa.array([sentinel]) for k in keys}
    row["lvl"] = pa.array([0], pa.int64())
    row["n_rows"] = pa.array([int(tot["sum(n_rows)"])], pa.int64())
    for s in sums:
        row[s] = pa.array([int(tot[f"sum({s})"])], pa.int64())
    levels.append(ray.data.from_arrow(pa.table(row, schema=out_schema)))

    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)

    def _pin(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        return batch.select(out_schema.names).cast(out_schema)

    return out.map_batches(_pin, batch_format="pyarrow")


def cube_aggregate(ds, keys: list[str], value_cols: list[str],
                   sentinel: str = "*"):
    """``GROUP BY CUBE``: every subset of ``keys`` as a grouping set.

    Same scale shape as ``rollup_aggregate`` — the raw data shuffles
    ONCE into the finest level; all 2^k - 1 coarser sets re-aggregate
    from that (distinct-combination-sized, pulled to the driver as
    aggregated small data) with vectorized numpy segment sums.  ``k``
    is capped at 4 (16 grouping sets) — a wider cube wants explicit
    grouping sets, not this operator.

    Output: (keys..., lvl = number of active keys, n_rows, sum_<v>...)
    with rolled-up key columns carrying ``sentinel``.
    """
    if not keys:
        raise ValueError("keys must be non-empty")
    if len(keys) > 4:
        raise ValueError("cube_aggregate caps at 4 keys (16 grouping sets)")
    import itertools

    import ray

    sums = [f"sum_{v}" for v in value_cols]
    out_fields = [(k, pa.string()) for k in keys]
    out_fields += [("lvl", pa.int64()), ("n_rows", pa.int64())]
    out_fields += [(s, pa.int64()) for s in sums]
    out_schema = pa.schema(out_fields)

    finest = _finest_level(ds, keys, value_cols, sums, "cube_aggregate")
    parts = list(finest.iter_batches(batch_format="pyarrow"))
    base = pa.concat_tables(parts) if parts else None

    out_tables = []

    kvals = (
        {k: base[k].to_numpy(zero_copy_only=False) for k in keys}
        if base is not None else {}
    )
    vvals = (
        {c: base[c].to_numpy(zero_copy_only=False).astype(np.int64)
         for c in ["n_rows"] + sums}
        if base is not None else {}
    )

    for r in range(len(keys), -1, -1):
        for active in itertools.combinations(keys, r):
            if base is None or base.num_rows == 0:
                if r == 0:
                    # SQL's () grouping set emits a zero row on empty input
                    row = {k: pa.array([sentinel]) for k in keys}
                    row["lvl"] = pa.array([0], pa.int64())
                    row["n_rows"] = pa.array([0], pa.int64())
                    for s in sums:
                        row[s] = pa.array([0], pa.int64())
                    out_tables.append(pa.table(row, schema=out_schema))
                continue
            if r == 0:
                row = {k: pa.array([sentinel]) for k in keys}
                row["lvl"] = pa.array([0], pa.int64())
                row["n_rows"] = pa.array([int(vvals["n_rows"].sum())], pa.int64())
                for s in sums:
                    row[s] = pa.array([int(vvals[s].sum())], pa.int64())
                out_tables.append(pa.table(row, schema=out_schema))
                continue
            # group the finest combos by the active subset (vectorized)
            codes = np.zeros(base.num_rows, np.int64)
            uniqs = []
            for k in active:
                u, inv = np.unique(kvals[k], return_inverse=True)
                codes = codes * (u.size + 1) + inv
                uniqs.append(u)
            order = np.argsort(codes, kind="stable")
            cs = codes[order]
            new = np.r_[True, cs[1:] != cs[:-1]]
            seg = np.cumsum(new) - 1
            nseg = int(seg[-1]) + 1
            first = order[np.flatnonzero(new)]
            row = {}
            for k in keys:
                if k in active:
                    row[k] = pa.array(kvals[k][first], pa.string())
                else:
                    row[k] = pa.array([sentinel] * nseg, pa.string())
            row["lvl"] = pa.array(np.full(nseg, r, np.int64))
            for c in ["n_rows"] + sums:
                acc = np.zeros(nseg, np.int64)
                np.add.at(acc, seg, vvals[c][order])
                row[c] = pa.array(acc, pa.int64())
            out_tables.append(pa.table(row, schema=out_schema))

    return ray.data.from_arrow(pa.concat_tables(out_tables))
