"""Distributed weighted single-source(-set) shortest paths.

The weighted twin of `stages/bfs.py`: edge rows carry a non-negative
int64 weight, and the answer is the exact minimum WEIGHTED distance
from any seed (reference's road graphs —
/root/reference/solaris/vector/graph.py — are weighted by segment
length; "minutes to nearest depot" is this primitive, where bfs_hops
is only "blocks to nearest depot").

Algorithm: frontier-synchronous label-correcting relaxation
(Bellman-Ford with a frontier; the synchronous special case of
delta-stepping with one bucket).  All state rows are id-only int64
(node, dist) and the per-node merge is min() — order-free, so results
are bit-reproducible at any parallelism and hash-identical to a SQL
recursive-CTE twin.  Weights must be >= 0 (raise on negative: with a
frontier the label-correcting loop would still converge for negative
edges without negative cycles, but termination would no longer be
bounded by the hop length of shortest paths — refuse rather than
maybe-spin).

Per round, TWO bucketed co-shuffles exactly as bfs.py (frontier+edges
meet by source bucket, candidates+labels meet by node bucket); improved
labels re-enter the frontier.  Rounds run until the frontier empties —
bounded by the maximum HOP COUNT of any shortest path, not by total
weight.  Edge side is tagged and materialized once; state is
repartitioned per round (round-4i block-growth lesson).

Small graphs route to ONE remote task running the same label-correcting
loop over CSR with fully vectorized per-round relaxation
(scatter-min via np.minimum.at) — the bfs.py two-plan idiom: a
15-round frontier loop at 45k edges is ~20 s of fixed per-round Ray
Data overhead for ~50 ms of real work.  Both plans parity-tested.

Partitioning assumption (SURVEY custom-operator rule): node ids are
non-negative int64 (dst = -1 marks frontier rows in shuffle 1);
per-round shuffle volume is O(frontier out-degree + |labelled|) rows
of four int64s.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._buckets import bucket_of

_OUT_SCHEMA = pa.schema([("node", pa.int64()), ("dist", pa.int64())])


def _sssp_single_task(edge_side, state):
    """Small-graph plan: one remote task, CSR + vectorized rounds of
    scatter-min relaxation.  Blocks travel as object-store refs."""
    import ray

    @ray.remote
    def _sssp(n_edge_blocks, *blocks):
        eb = [b for b in blocks[:n_edge_blocks] if "dst" in b.schema.names]
        sb = [b for b in blocks[n_edge_blocks:] if "k" in b.schema.names]

        def _cat(tabs, col):
            if not tabs:
                return np.empty(0, np.int64)
            return np.concatenate(
                [t[col].to_numpy(zero_copy_only=False) for t in tabs]
            ).astype(np.int64)

        src, dst, w = _cat(eb, "k"), _cat(eb, "dst"), _cat(eb, "d")
        seeds = _cat(sb, "k")
        uniq, inv = np.unique(
            np.concatenate([src, dst, seeds]), return_inverse=True
        )
        n = uniq.size
        si = inv[: src.size]
        di = inv[src.size : src.size + dst.size]
        sdi = inv[src.size + dst.size :]
        order = np.argsort(si, kind="stable")
        si, adj, aw = si[order], di[order], w[order]
        indptr = np.zeros(n + 1, np.int64)
        np.cumsum(np.bincount(si, minlength=n), out=indptr[1:])
        INF = np.iinfo(np.int64).max
        dist = np.full(n, INF, np.int64)
        frontier = np.unique(sdi)
        dist[frontier] = 0
        while frontier.size:
            starts = indptr[frontier]
            deg = indptr[frontier + 1] - starts
            tot = int(deg.sum())
            if tot == 0:
                break
            idx = np.repeat(
                starts - np.concatenate(([0], np.cumsum(deg)[:-1])), deg
            ) + np.arange(tot)
            cand_n = adj[idx]
            cand_d = np.repeat(dist[frontier], deg) + aw[idx]
            best = np.full(n, INF, np.int64)
            np.minimum.at(best, cand_n, cand_d)
            improved = np.flatnonzero(best < dist)
            if improved.size == 0:
                break
            dist[improved] = best[improved]
            frontier = improved
        hit = dist < INF
        return pa.table(
            {
                "node": pa.array(uniq[hit], pa.int64()),
                "dist": pa.array(dist[hit], pa.int64()),
            }
        )

    e_refs = edge_side.to_arrow_refs()
    s_refs = state.to_arrow_refs()
    ref = _sssp.remote(len(e_refs), *e_refs, *s_refs)
    import ray.data

    return ray.data.from_arrow_refs([ref])


def sssp_dist(
    edges,
    seeds,
    src_col: str = "src",
    dst_col: str = "dst",
    w_col: str = "w",
    seed_col: str = "node",
    max_rounds: int = 256,
    n_buckets: int = 64,
    shuffle_blocks: int = 16,
    small_edge_limit: int = 500_000,
    stats_out: dict | None = None,
):
    """Directed weighted ``edges`` + ``seeds`` -> (node, dist): exact
    minimum int64 weighted distance from any seed (seeds at 0).
    Unreachable nodes are absent.  Weights must be non-negative int64.

    ``max_rounds`` is a safety valve — raises if the frontier is still
    non-empty when it trips (a partial relaxation must never pass as a
    converged one)."""

    def _tag_edges(batch: pa.Table) -> pa.Table:
        s = batch[src_col].to_numpy(zero_copy_only=False).astype(np.int64)
        d = batch[dst_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = batch[w_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if s.size and (s.min() < 0 or d.min() < 0):
            raise ValueError("sssp_dist requires non-negative node ids")
        if w.size and w.min() < 0:
            raise ValueError("sssp_dist requires non-negative weights")
        return pa.table(
            {
                "k": pa.array(s, pa.int64()),
                "dst": pa.array(d, pa.int64()),
                "d": pa.array(w, pa.int64()),  # edge rows: d carries w
                "kb": pa.array(bucket_of(s, n_buckets), pa.int64()),
            }
        )

    edge_side = (
        edges.map_batches(_tag_edges, batch_format="pyarrow")
        .repartition(shuffle_blocks)
        .materialize()
    )

    def _tag_seeds(batch: pa.Table) -> pa.Table:
        n = batch[seed_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if n.size and n.min() < 0:
            raise ValueError("sssp_dist requires non-negative node ids")
        k2 = np.concatenate([n, n])
        f2 = np.concatenate(
            [np.zeros(n.size, np.int64), np.ones(n.size, np.int64)]
        )
        return pa.table(
            {
                "k": pa.array(k2, pa.int64()),
                "d": pa.array(np.zeros(k2.size, np.int64)),
                "f": pa.array(f2, pa.int64()),
                "kb": pa.array(bucket_of(k2, n_buckets), pa.int64()),
            }
        )

    state = (
        seeds.map_batches(_tag_seeds, batch_format="pyarrow")
        .repartition(shuffle_blocks)
        .materialize()
    )

    n_edges = edge_side.count()
    if stats_out is not None:
        stats_out["edges"] = n_edges
    if n_edges <= small_edge_limit:
        if stats_out is not None:
            stats_out["plan"] = "single-task"
        return _sssp_single_task(edge_side, state)
    if stats_out is not None:
        stats_out["plan"] = "frontier-rounds"

    def _to_frontier_rows(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["f"], 1))
        k = t["k"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "k": t["k"],
                "dst": pa.array(np.full(k.size, -1, np.int64)),
                "d": t["d"],
                "kb": t["kb"],
            }
        )

    def _expand(group: pa.Table) -> pa.Table:
        # source-bucket kernel: (dst, dist[src] + w) per out-edge of a
        # frontier node
        k = group["k"].to_numpy(zero_copy_only=False)
        dst = group["dst"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        is_front = dst < 0
        fk, fd = k[is_front], d[is_front]
        order = np.argsort(fk, kind="stable")
        fk, fd = fk[order], fd[order]
        ek, ed, ew = k[~is_front], dst[~is_front], d[~is_front]
        if ek.size and fk.size:
            pos = np.searchsorted(fk, ek)
            pos_c = np.minimum(pos, fk.size - 1)
            hit = fk[pos_c] == ek
            out_n = ed[hit]
            out_d = fd[pos_c[hit]] + ew[hit]
        else:
            out_n = np.zeros(0, np.int64)
            out_d = np.zeros(0, np.int64)
        return pa.table(
            {
                "k": pa.array(out_n, pa.int64()),
                "d": pa.array(out_d, pa.int64()),
                "f": pa.array(np.ones(out_n.size, np.int64)),
                "kb": pa.array(bucket_of(out_n, n_buckets), pa.int64()),
            }
        )

    def _combine(group: pa.Table) -> pa.Table:
        k = group["k"].to_numpy(zero_copy_only=False)
        d = group["d"].to_numpy(zero_copy_only=False)
        f = group["f"].to_numpy(zero_copy_only=False)
        order = np.argsort(k, kind="stable")
        k, d, f = k[order], d[order], f[order]
        new = np.ones(k.size, bool)
        new[1:] = k[1:] != k[:-1]
        starts = np.flatnonzero(new)
        seg = np.cumsum(new) - 1
        mind = np.minimum.reduceat(d, starts)
        old = np.full(starts.size, np.iinfo(np.int64).max, np.int64)
        lab = f == 0
        old[seg[lab]] = d[lab]
        nodes = k[starts]
        improved = mind < old
        out_k = np.concatenate([nodes, nodes[improved]])
        out_d = np.concatenate([mind, mind[improved]])
        out_f = np.concatenate(
            [
                np.zeros(nodes.size, np.int64),
                np.ones(int(improved.sum()), np.int64),
            ]
        )
        return pa.table(
            {
                "k": pa.array(out_k, pa.int64()),
                "d": pa.array(out_d, pa.int64()),
                "f": pa.array(out_f, pa.int64()),
                "kb": pa.array(bucket_of(out_k, n_buckets), pa.int64()),
            }
        )

    def _front_count(batch: pa.Table) -> pa.Table:
        n = int(
            pc.sum(pc.cast(pc.equal(batch["f"], 1), pa.int64())).as_py() or 0
        )
        return pa.table({"n": pa.array([n], pa.int64())})

    rounds = 0
    while True:
        frontier_n = (
            state.map_batches(_front_count, batch_format="pyarrow").sum("n")
            or 0
        )
        if frontier_n == 0:
            break
        if rounds >= max_rounds:
            raise RuntimeError(
                f"sssp_dist: frontier still non-empty after "
                f"max_rounds={max_rounds}"
            )
        rounds += 1
        front = state.map_batches(_to_frontier_rows, batch_format="pyarrow")
        cands = (
            front.union(edge_side)
            .groupby("kb")
            .map_groups(_expand, batch_format="pyarrow")
        )

        def _labels_only(batch: pa.Table) -> pa.Table:
            return batch.filter(pc.equal(batch["f"], 0))

        state = (
            cands.union(state.map_batches(_labels_only, batch_format="pyarrow"))
            .groupby("kb")
            .map_groups(_combine, batch_format="pyarrow")
            .repartition(shuffle_blocks)
            .materialize()
        )

    if stats_out is not None:
        stats_out["rounds"] = rounds

    def _out(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.equal(batch["f"], 0))
        if t.num_rows == 0:
            return _OUT_SCHEMA.empty_table()
        return pa.table({"node": t["k"], "dist": t["d"]})

    return state.map_batches(_out, batch_format="pyarrow")
