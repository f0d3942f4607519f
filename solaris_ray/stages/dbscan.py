"""Distributed DBSCAN over point tables (cell-partitioned).

Density clustering for spatial curation (reference clusters features
per tile; DBSCAN is the classic density generalization — Ester et al.,
KDD'96).  Deterministic label convention so a SQL twin exists:

- a point is CORE iff >= ``min_pts`` points (itself included) lie
  within ``eps``;
- clusters are connected components of the core-core within-``eps``
  graph, labelled by the MINIMUM core id in the component;
- a BORDER point (non-core with >= 1 core neighbour) joins the
  cluster of its minimum-id core neighbour;
- everything else is noise, ``cluster = -1``.

Scale plan: grid cells of edge ``eps`` mean every within-``eps``
neighbour of a point lies in its 3x3 cell block.  Each point is
replicated to those 9 cells (id/x/y-only rows, 9x a 28-byte row — the
only data-size-proportional shuffle); cells are hash-bucketed so ONE
``groupby`` co-locates each cell with its halo.  Neighbour counts are
exact in the owner's group; within-``eps`` pairs are emitted
exactly once (owner-id < other-id in the owner's home cell).  Core
flags attach to pairs via the shared bucketed hash join; transitive
closure rides the existing large-star/small-star machinery
(components.connected_components) — id-only rows everywhere
downstream of the tag pass.

Partitioning assumption (SURVEY custom-operator rule): cell edge =
``eps`` bounds the halo at 3x3; per-cell point count is the skew
knob — a hot cell is a genuinely dense neighbourhood, exactly the
place DBSCAN's own O(n_cell^2) cost lives.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._buckets import bucket_of
from .components import connected_components
from .relational import hash_join

# grid offset/stride: cell indexes live in [0, 2^21), so the combined
# key (cx * 2^21 + cy) stays far inside int64 — supports extents up to
# ~±1M cells per axis relative to ``eps``.
_OFF = np.int64(1) << np.int64(20)
_STRIDE = np.int64(1) << np.int64(21)


def dbscan(
    points,
    eps: float,
    min_pts: int,
    id_col: str = "point_id",
    x_col: str = "x",
    y_col: str = "y",
    n_buckets: int = 64,
):
    """-> (point_id, cluster) for every input point; noise = -1."""
    if eps <= 0:
        raise ValueError("eps must be > 0")
    if min_pts < 1:
        raise ValueError("min_pts must be >= 1")
    eps2 = float(eps) * float(eps)

    # ---- tag: replicate each point to its 3x3 cell block ------------
    def _tag(batch: pa.Table) -> pa.Table:
        i = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        x = batch[x_col].to_numpy(zero_copy_only=False).astype(np.float64)
        y = batch[y_col].to_numpy(zero_copy_only=False).astype(np.float64)
        cx = np.floor(x / eps).astype(np.int64) + _OFF
        cy = np.floor(y / eps).astype(np.int64) + _OFF
        n = i.size
        ids = np.repeat(i, 9)
        xs = np.repeat(x, 9)
        ys = np.repeat(y, 9)
        dx = np.tile(np.repeat(np.arange(-1, 2, dtype=np.int64), 3), n)
        dy = np.tile(np.tile(np.arange(-1, 2, dtype=np.int64), 3), n)
        cell = (np.repeat(cx, 9) + dx) * _STRIDE + (np.repeat(cy, 9) + dy)
        own = ((dx == 0) & (dy == 0)).astype(np.int8)
        return pa.table(
            {
                "cell": pa.array(cell, pa.int64()),
                "own": pa.array(own, pa.int8()),
                "pid": pa.array(ids, pa.int64()),
                "px": pa.array(xs, pa.float64()),
                "py": pa.array(ys, pa.float64()),
                "gb": pa.array(bucket_of(cell, n_buckets), pa.int64()),
            }
        )

    # ---- per-bucket: exact counts + exactly-once pairs ---------------
    # kind 0 rows: (a=point id, b=|N_eps|); kind 1 rows: (a, b) pair.
    kab = pa.schema([("k", pa.int64()), ("a", pa.int64()), ("b", pa.int64())])

    def _local(group: pa.Table) -> pa.Table:
        cell = group["cell"].to_numpy(zero_copy_only=False)
        own = group["own"].to_numpy(zero_copy_only=False)
        ids = group["pid"].to_numpy(zero_copy_only=False)
        xs = group["px"].to_numpy(zero_copy_only=False)
        ys = group["py"].to_numpy(zero_copy_only=False)
        order = np.argsort(cell, kind="stable")
        cell, own, ids, xs, ys = (
            cell[order], own[order], ids[order], xs[order], ys[order]
        )
        starts = np.flatnonzero(
            np.concatenate(([True], cell[1:] != cell[:-1]))
        )
        ends = np.append(starts[1:], cell.size)
        out_k, out_a, out_b = [], [], []
        for s, e in zip(starts, ends):  # loop over CELLS, not rows
            o = own[s:e] == 1
            if not o.any():
                continue
            oi, ox, oy = ids[s:e][o], xs[s:e][o], ys[s:e][o]
            ai, ax, ay = ids[s:e], xs[s:e], ys[s:e]
            d2 = (ox[:, None] - ax[None, :]) ** 2 + (
                oy[:, None] - ay[None, :]
            ) ** 2
            within = d2 <= eps2
            out_k.append(np.zeros(oi.size, np.int64))
            out_a.append(oi)
            out_b.append(within.sum(axis=1).astype(np.int64))
            r, c = np.nonzero(within & (oi[:, None] < ai[None, :]))
            if r.size:
                out_k.append(np.ones(r.size, np.int64))
                out_a.append(oi[r])
                out_b.append(ai[c])
        if not out_k:
            return kab.empty_table()
        return pa.table(
            {
                "k": pa.array(np.concatenate(out_k), pa.int64()),
                "a": pa.array(np.concatenate(out_a), pa.int64()),
                "b": pa.array(np.concatenate(out_b), pa.int64()),
            }
        )

    tagged = (
        points.map_batches(_tag, batch_format="pyarrow")
        .groupby("gb")
        .map_groups(_local, batch_format="pyarrow")
        .materialize()
    )

    def _counts(batch: pa.Table) -> pa.Table:
        m = pc.equal(batch["k"], 0)
        t = batch.filter(m)
        return pa.table({"cid": t["a"], "n_nbr": t["b"]})

    def _pairs(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["k"], 1))
        return pa.table({"a": t["a"], "b": t["b"]})

    counts = tagged.map_batches(_counts, batch_format="pyarrow")
    pairs = tagged.map_batches(_pairs, batch_format="pyarrow")

    def _core(name):
        def _f(batch: pa.Table) -> pa.Table:
            t = batch.filter(pc.greater_equal(batch["n_nbr"], min_pts))
            return pa.table({name: t["cid"]})

        return _f

    core_a = counts.map_batches(_core("ka"), batch_format="pyarrow")
    core_b = counts.map_batches(_core("kb"), batch_format="pyarrow")

    # flag each pair endpoint's core-ness (left joins keep every pair)
    flagged = hash_join(
        hash_join(pairs, core_a, "a", "ka", how="left"),
        core_b, "b", "kb", how="left",
    ).materialize()

    def _cc_edges(batch: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(batch["ka"]), pc.is_valid(batch["kb"]))
        t = batch.filter(m)
        return pa.table({"ea": t["a"], "eb": t["b"]})

    def _border_cand(batch: pa.Table) -> pa.Table:
        av = pc.is_valid(batch["ka"])
        bv = pc.is_valid(batch["kb"])
        t = batch.filter(pc.xor(av, bv))
        a = t["a"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = t["b"].to_numpy(zero_copy_only=False).astype(np.int64)
        a_core = pc.is_valid(t["ka"]).to_numpy(zero_copy_only=False)
        bid = np.where(a_core, b, a)
        cnb = np.where(a_core, a, b)
        return pa.table(
            {"bid": pa.array(bid, pa.int64()), "cnb": pa.array(cnb, pa.int64())}
        )

    cc_edges = flagged.map_batches(_cc_edges, batch_format="pyarrow")
    core_nodes = counts.map_batches(
        lambda b: pa.table(
            {"node": b.filter(pc.greater_equal(b["n_nbr"], min_pts))["cid"]}
        ),
        batch_format="pyarrow",
    )

    out_schema = pa.schema([(id_col, pa.int64()), ("cluster", pa.int64())])
    pid_only = points.map_batches(
        lambda b: pa.table({id_col: pc.cast(b[id_col], pa.int64())}),
        batch_format="pyarrow",
    )

    # no cores at all -> every point is noise (also keeps downstream
    # schemas known: Ray reports schema=None for all-empty datasets)
    if core_nodes.count() == 0:
        return pid_only.map_batches(
            lambda b: pa.table(
                {
                    id_col: b[id_col],
                    "cluster": pa.array(
                        np.full(b.num_rows, -1, np.int64), pa.int64()
                    ),
                }
            ),
            batch_format="pyarrow",
        )

    comp = connected_components(
        cc_edges, core_nodes, id_a="ea", id_b="eb", node_col="node"
    )

    core_out = comp.map_batches(
        lambda b: pa.table({"pid2": b["node"], "cluster": b["component"]}),
        batch_format="pyarrow",
    )

    # border -> min-id core neighbour -> that core's component
    border_cand = flagged.map_batches(_border_cand, batch_format="pyarrow")
    if border_cand.count() == 0:
        # typed empty side keeps the union/join schemas known
        import ray

        border_out = ray.data.from_arrow(
            pa.schema([("pid2", pa.int64()), ("cluster", pa.int64())])
            .empty_table()
        )
    else:
        border_min = border_cand.groupby("bid").min("cnb")
        border_out = hash_join(
            border_min, comp, "min(cnb)", "node", how="inner"
        ).map_batches(
            lambda b: pa.table({"pid2": b["bid"], "cluster": b["component"]}),
            batch_format="pyarrow",
        )

    assigned = core_out.union(border_out)
    joined = hash_join(pid_only, assigned, id_col, "pid2", how="left")

    def _final(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return out_schema.empty_table()
        cl = pc.coalesce(batch["cluster"], pa.scalar(-1, pa.int64()))
        return pa.table({id_col: batch[id_col], "cluster": pc.cast(cl, pa.int64())})

    return joined.map_batches(_final, batch_format="pyarrow")
