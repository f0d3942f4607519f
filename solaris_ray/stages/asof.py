"""As-of (nearest-prior) join — a time-series operator Ray Data lacks.

For each LEFT row, attach the latest RIGHT row of the same key whose
``on`` value is <= the left's (ANSI ``ASOF JOIN`` semantics, which the
DuckDB oracle runs verbatim).

Ray mapping (custom-operator rule, SURVEY.md §3): both sides are
tagged and co-shuffled with ONE ``groupby(by)`` so each group holds a
key's full timeline; inside the group a single ``np.searchsorted`` of
left timestamps into the sorted right timestamps resolves every match
vectorized — no per-row loop, no driver state.

Partitioning assumption: one key's rows fit in a worker (same contract
as every keyed ``map_groups``).  At 100 TB with hot keys, pre-bucket
``by`` into (key, time_bucket) and carry each bucket's last right row
into the next bucket (a per-bucket ``max`` pre-pass); the in-group
kernel below is unchanged under that refinement.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _with_side(t: pa.Table, side: int, all_cols: list[tuple[str, pa.DataType]]) -> pa.Table:
    """Project to the union schema (missing columns -> nulls) + side tag."""
    n = t.num_rows
    cols = {}
    for name, typ in all_cols:
        if name in t.column_names:
            cols[name] = pc.cast(t[name], typ)
        else:
            cols[name] = pa.nulls(n, typ)
    cols["_side"] = pa.array(np.full(n, side, dtype=np.int8))
    return pa.table(cols)


def asof_join(
    left,
    right,
    on: str = "ts",
    by: str = "key",
    left_cols: list[str] | None = None,
    right_cols: list[str] | None = None,
):
    """left/right: Datasets sharing ``on`` (orderable) and ``by`` columns.

    Returns one row per LEFT row: left_cols + right_cols (right side
    null when no prior right row exists — ASOF LEFT JOIN semantics are
    the caller's filter; this returns matches only, like ``ASOF JOIN``).
    """
    lschema = left.schema()
    rschema = right.schema()
    left_cols = left_cols or [n for n in lschema.names if n not in (on, by)]
    right_cols = right_cols or [n for n in rschema.names if n not in (on, by)]

    def _typ(schema, name):
        return schema.types[schema.names.index(name)]

    union_cols = [(by, _typ(lschema, by)), (on, _typ(lschema, on))]
    union_cols += [(c, _typ(lschema, c)) for c in left_cols]
    union_cols += [(c, _typ(rschema, c)) for c in right_cols]

    tagged_l = left.map_batches(
        lambda t: _with_side(t, 0, union_cols), batch_format="pyarrow"
    )
    tagged_r = right.map_batches(
        lambda t: _with_side(t, 1, union_cols), batch_format="pyarrow"
    )

    out_fields = (
        [(by, _typ(lschema, by)), (on, _typ(lschema, on))]
        + [(c, _typ(lschema, c)) for c in left_cols]
        + [(f"r_{on}", _typ(rschema, on))]
        + [(c, _typ(rschema, c)) for c in right_cols]
    )
    empty = pa.schema(out_fields).empty_table()

    def _group(g: pa.Table) -> pa.Table:
        side = g["_side"].to_numpy(zero_copy_only=False)
        lrow = np.nonzero(side == 0)[0]
        rrow = np.nonzero(side == 1)[0]
        if len(lrow) == 0 or len(rrow) == 0:
            return empty
        ts = g[on].to_numpy(zero_copy_only=False)
        lts = ts[lrow]
        rts = ts[rrow]
        rorder = np.argsort(rts, kind="stable")
        rts_s = rts[rorder]
        # latest right index with rts <= lts
        pos = np.searchsorted(rts_s, lts, side="right") - 1
        ok = pos >= 0
        li = lrow[ok]
        ri = rrow[rorder[pos[ok]]]
        cols = {by: g[by].take(pa.array(li)), on: g[on].take(pa.array(li))}
        for c in left_cols:
            cols[c] = g[c].take(pa.array(li))
        cols[f"r_{on}"] = g[on].take(pa.array(ri))
        for c in right_cols:
            cols[c] = g[c].take(pa.array(ri))
        return pa.table(cols, schema=empty.schema)

    return (
        tagged_l.union(tagged_r)
        .groupby(by)
        .map_groups(_group, batch_format="pyarrow")
    )
