"""Distributed triangle counting — degree-ordered node-iterator.

Graph-shaped corpus analysis (dedup-cluster audit, link-graph spam
metrics) needs triangle counts; the reference has no graph analytics.
This is the MapReduce-classic algorithm (Suri & Vassilvitskii, WWW'11):
orient every edge from its lower (degree, id) endpoint to the higher,
emit each low-endpoint's out-neighbor pairs as wedges, and close
wedges against the canonical edge set.  Degree ordering bounds
per-node wedge work by arboricity (out-degree <= O(sqrt(m))), so no
single group explodes even on power-law graphs.

All five shuffles move id-only int64 rows:
  degrees -> 2 bucketed degree-attach joins -> wedge generation
  (``groupby(src bucket)``, per-node pair expansion inside a
  vectorized bucket kernel) -> bucketed wedge-close join -> per-node
  count.

Partitioning assumption (documented per SURVEY custom-operator rule):
node ids fit 32 bits for the packed (u, v) bucket-local match key; a
10^12-node deployment would widen to 64-bit pair hashing with salt
splits.  Input edges must be canonical (a < b) and distinct.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def _bucket_of(x: np.ndarray, n_buckets: int) -> np.ndarray:
    return ((x * np.int64(2654435761)) % np.int64(n_buckets)).astype(np.int64)


def triangle_counts(edges, a_col: str = "a", b_col: str = "b",
                    n_buckets: int = 256):
    """edges (a < b, distinct) -> (node, tri_cnt) for every node in at
    least one triangle."""
    deg_schema = pa.schema([("k", pa.int64()), ("other", pa.int64()),
                            ("deg", pa.int64()), ("kb", pa.int64())])

    def _ends(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False)
        b = batch[b_col].to_numpy(zero_copy_only=False)
        n = np.concatenate([a, b])
        return pa.table({"node": pa.array(n, pa.int64())})

    deg = (
        edges.map_batches(_ends, batch_format="pyarrow")
        .groupby("node")
        .count()
    )  # (node, count())

    def _tag_edges(key_col: str):
        def _f(batch: pa.Table) -> pa.Table:
            k = batch[key_col].to_numpy(zero_copy_only=False)
            other = batch[b_col if key_col == a_col else a_col].to_numpy(
                zero_copy_only=False)
            return pa.table(
                {
                    "k": pa.array(k, pa.int64()),
                    "other": pa.array(other, pa.int64()),
                    "deg": pa.array(np.full(k.size, -1, np.int64), pa.int64()),
                    "kb": pa.array(_bucket_of(k, n_buckets), pa.int64()),
                }
            )
        return _f

    def _tag_deg(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False)
        d = batch["count()"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(n, pa.int64()),
                "other": pa.array(np.full(n.size, -1, np.int64), pa.int64()),
                "deg": pa.array(d.astype(np.int64), pa.int64()),
                "kb": pa.array(_bucket_of(n, n_buckets), pa.int64()),
            }
        )

    def _attach(out_deg_col: str):
        # within a bucket: searchsorted the (node -> deg) map onto edges
        def _f(group: pa.Table) -> pa.Table:
            k = group["k"].to_numpy(zero_copy_only=False)
            other = group["other"].to_numpy(zero_copy_only=False)
            dg = group["deg"].to_numpy(zero_copy_only=False)
            is_deg = other == -1
            nodes, degs = k[is_deg], dg[is_deg]
            o = np.argsort(nodes, kind="stable")
            nodes, degs = nodes[o], degs[o]
            ek, eo = k[~is_deg], other[~is_deg]
            if "deg0" in group.column_names:
                d0 = group["deg0"].to_numpy(zero_copy_only=False)[~is_deg]
            else:
                d0 = None
            pos = np.searchsorted(nodes, ek)
            dd = degs[pos]
            cols = {"k": pa.array(ek, pa.int64()),
                    "other": pa.array(eo, pa.int64())}
            if d0 is not None:
                cols["deg0"] = pa.array(d0, pa.int64())
            cols[out_deg_col] = pa.array(dd, pa.int64())
            return pa.table(cols)
        return _f

    # join deg(a) onto edges (key = a)
    e1 = (
        edges.map_batches(_tag_edges(a_col), batch_format="pyarrow")
        .union(deg.map_batches(_tag_deg, batch_format="pyarrow"))
        .groupby("kb")
        .map_groups(_attach("deg0"), batch_format="pyarrow")
    )  # (k=a, other=b, deg0=deg(a))

    def _rekey_b(batch: pa.Table) -> pa.Table:
        a = batch["k"].to_numpy(zero_copy_only=False)
        b = batch["other"].to_numpy(zero_copy_only=False)
        d0 = batch["deg0"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": pa.array(b, pa.int64()),
                "other": pa.array(a, pa.int64()),
                "deg": pa.array(np.full(a.size, -1, np.int64), pa.int64()),
                "deg0": pa.array(d0, pa.int64()),
                "kb": pa.array(_bucket_of(b, n_buckets), pa.int64()),
            }
        )

    def _tag_deg2(batch: pa.Table) -> pa.Table:
        t = _tag_deg(batch)
        neg = pa.array(np.full(t.num_rows, -1, np.int64), pa.int64())
        # same column order as _rekey_b so the union schemas line up
        return pa.table(
            {
                "k": t["k"], "other": t["other"], "deg": t["deg"],
                "deg0": neg, "kb": t["kb"],
            }
        )

    e2 = (
        e1.map_batches(_rekey_b, batch_format="pyarrow")
        .union(deg.map_batches(_tag_deg2, batch_format="pyarrow"))
        .groupby("kb")
        .map_groups(_attach("deg1"), batch_format="pyarrow")
    )  # (k=b, other=a, deg0=deg(a), deg1=deg(b))

    wedge_schema = pa.schema(
        [("u", pa.int64()), ("v", pa.int64()), ("apex", pa.int64()),
         ("is_edge", pa.int64()), ("pb", pa.int64())]
    )

    def _orient(batch: pa.Table) -> pa.Table:
        b = batch["k"].to_numpy(zero_copy_only=False)
        a = batch["other"].to_numpy(zero_copy_only=False)
        da = batch["deg0"].to_numpy(zero_copy_only=False)
        db = batch["deg1"].to_numpy(zero_copy_only=False)
        a_low = (da < db) | ((da == db) & (a < b))
        src = np.where(a_low, a, b)
        dst = np.where(a_low, b, a)
        return pa.table(
            {
                "src": pa.array(src, pa.int64()),
                "dst": pa.array(dst, pa.int64()),
                "sb": pa.array(_bucket_of(src, n_buckets), pa.int64()),
            }
        )

    def _wedges(group: pa.Table) -> pa.Table:
        src = group["src"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        o = np.argsort(src, kind="stable")
        src, dst = src[o], dst[o]
        starts = np.flatnonzero(np.r_[True, src[1:] != src[:-1]])
        ends = np.r_[starts[1:], src.size]
        us, vs, ap = [], [], []
        for s, e in zip(starts, ends):
            d = np.sort(dst[s:e])
            m = e - s
            if m < 2:
                continue
            ia, ib = np.triu_indices(m, k=1)
            us.append(d[ia]); vs.append(d[ib])
            ap.append(np.full(ia.size, src[s], np.int64))
        if not us:
            return wedge_schema.empty_table()
        u = np.concatenate(us); v = np.concatenate(vs)
        return pa.table(
            {
                "u": pa.array(u, pa.int64()),
                "v": pa.array(v, pa.int64()),
                "apex": pa.array(np.concatenate(ap), pa.int64()),
                "is_edge": pa.array(np.zeros(u.size, np.int64), pa.int64()),
                "pb": pa.array(_bucket_of(u * 31 + v, n_buckets), pa.int64()),
            }
        )

    def _edge_rows(batch: pa.Table) -> pa.Table:
        a = batch[a_col].to_numpy(zero_copy_only=False)
        b = batch[b_col].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "u": pa.array(a, pa.int64()),
                "v": pa.array(b, pa.int64()),
                "apex": pa.array(np.full(a.size, -1, np.int64), pa.int64()),
                "is_edge": pa.array(np.ones(a.size, np.int64), pa.int64()),
                "pb": pa.array(_bucket_of(a * 31 + b, n_buckets), pa.int64()),
            }
        )

    tri_schema = pa.schema([("node", pa.int64())])

    def _close(group: pa.Table) -> pa.Table:
        is_e = group["is_edge"].to_numpy(zero_copy_only=False) == 1
        u = group["u"].to_numpy(zero_copy_only=False)
        v = group["v"].to_numpy(zero_copy_only=False)
        key = (u.astype(np.int64) << 32) | v.astype(np.int64)
        ek = np.sort(key[is_e])
        wk = key[~is_e]
        if ek.size == 0 or wk.size == 0:
            return tri_schema.empty_table()
        pos = np.searchsorted(ek, wk)
        pos_c = np.clip(pos, 0, ek.size - 1)
        hit = ek[pos_c] == wk
        apex = group["apex"].to_numpy(zero_copy_only=False)[~is_e][hit]
        uu, vv = u[~is_e][hit], v[~is_e][hit]
        return pa.table(
            {"node": pa.array(np.concatenate([apex, uu, vv]), pa.int64())}
        )

    tri_nodes = (
        e2.map_batches(_orient, batch_format="pyarrow")
        .groupby("sb")
        .map_groups(_wedges, batch_format="pyarrow")
        .union(edges.map_batches(_edge_rows, batch_format="pyarrow"))
        .groupby("pb")
        .map_groups(_close, batch_format="pyarrow")
    )

    def _rename(batch: pa.Table) -> pa.Table:
        return pa.table(
            {"node": batch["node"],
             "tri_cnt": pa.compute.cast(batch["count()"], pa.int64())}
        )

    return tri_nodes.groupby("node").count().map_batches(
        _rename, batch_format="pyarrow"
    )
