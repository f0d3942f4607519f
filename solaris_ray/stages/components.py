"""Distributed connected components + fuzzy-dedup cluster resolution.

The reference (CosmiQ/solaris) stops at pairwise matching; web-scale
fuzzy dedup needs the step AFTER candidate pairs: resolve the pair
graph into connected components and keep one representative per
component (the RefinedWeb / SlimPajama recipe).  This implements
min-label propagation ("hash-to-min", Rastogi et al., ICDE'13) as an
iterated pair of Ray Data co-shuffles:

per round (all rows are 2-3 int64 columns — ids only, never payloads):
  1. ``groupby(node)`` over union(symmetric edges keyed by src,
     label records) — each group holds one label row + the node's
     outgoing edges; emit ``(dst, label)`` per edge + ``(node, label)``.
  2. ``groupby(node).aggregate(Min(label))`` -> new labels.

Labels are monotonically non-increasing (min over self + neighbors,
self included), so ``sum(label)`` strictly decreases until the fixed
point — convergence is detected by sum equality, no old-vs-new join.

Rounds = graph diameter.  Dedup pair graphs are unions of near-cliques
(every LSH bucket emits a clique), so diameter is small (2-4 typical);
``max_rounds`` bounds pathological chains.  For general million-
diameter graphs you would switch to large-star/small-star (Kiveris et
al., 2014) — same two-shuffle round shape, O(log^2 n) rounds; the
per-round plumbing here is exactly that shape, only the emit rule
differs.

Scale notes: the iterated labels table covers ONLY edge-touched nodes
(in a dedup pair graph, a small fraction of the corpus) — each round
shuffles O(touched) id-only rows, not O(all nodes); isolated nodes
rejoin at the end via one bucketed anti-join co-shuffle.  Labels are
materialized per round (required for iteration) and the convergence
sum reuses that materialization.  The edge table is materialized once
up front so each round re-reads blocks from the object store instead
of recomputing the upstream pair pipeline.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


_MSG_SCHEMA = pa.schema([("node", pa.int64()), ("label", pa.int64())])


def connected_components(
    edges,
    nodes,
    id_a: str = "doc_a",
    id_b: str = "doc_b",
    node_col: str = "doc_id",
    max_rounds: int = 50,
):
    """(edges Dataset, nodes Dataset) -> Dataset (node, component).

    ``component`` is the minimum node id reachable from ``node``;
    isolated nodes (present in ``nodes``, absent from ``edges``) are
    their own component.  ``nodes`` must cover every id that appears in
    ``edges``.
    """
    import ray
    from ray.data.aggregate import Min

    # symmetric edge list, materialized once: (src, dst), label = -1 tag
    def _sym(batch: pa.Table) -> pa.Table:
        a = batch[id_a].to_numpy(zero_copy_only=False)
        b = batch[id_b].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(np.concatenate([a, b]), pa.int64()),
                "dst": pa.array(np.concatenate([b, a]), pa.int64()),
            }
        )

    sym = edges.map_batches(_sym, batch_format="pyarrow").materialize()

    # iterate ONLY over edge-touched nodes: in a dedup pair graph they
    # are a small fraction of the corpus, so every propagation round
    # shuffles O(touched) labels instead of O(all nodes); isolated
    # nodes rejoin at the end via one anti-join co-shuffle
    touched = (
        sym.select_columns(["node"]).groupby("node").count()
        .map_batches(
            lambda b: pa.table({"node": b["node"], "label": b["node"]}),
            batch_format="pyarrow",
        )
    )
    lab = touched.materialize()
    has_edges = lab.count() > 0
    prev_sum = lab.sum("label") if has_edges else 0

    def _lab_as_msg(batch: pa.Table) -> pa.Table:
        # tag label records with dst = -1 so step 1 can tell them apart
        return pa.table(
            {
                "node": batch["node"],
                "dst": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
                "label": batch["label"],
            }
        )

    def _edge_as_msg(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "node": batch["node"],
                "dst": batch["dst"],
                "label": pa.array(np.full(batch.num_rows, -1, np.int64), pa.int64()),
            }
        )

    def _send(group: pa.Table) -> pa.Table:
        dst = group["dst"].to_numpy(zero_copy_only=False)
        own = dst == -1
        # exactly one label row per node by construction
        label = int(group["label"].to_numpy(zero_copy_only=False)[own][0])
        node = int(group["node"][0].as_py())
        out_nodes = np.concatenate([dst[~own], [node]])
        return pa.table(
            {
                "node": pa.array(out_nodes, pa.int64()),
                "label": pa.array(np.full(out_nodes.size, label, np.int64), pa.int64()),
            }
        )

    for _ in range(max_rounds if has_edges else 0):
        msgs = (
            lab.map_batches(_lab_as_msg, batch_format="pyarrow")
            .union(sym.map_batches(_edge_as_msg, batch_format="pyarrow"))
            .groupby("node")
            .map_groups(_send, batch_format="pyarrow")
        )
        lab = (
            msgs.groupby("node")
            .aggregate(Min("label"))
            .map_batches(
                lambda b: pa.table({"node": b["node"], "label": b["min(label)"]}),
                batch_format="pyarrow",
            )
            .materialize()
        )
        cur_sum = lab.sum("label")
        if cur_sum == prev_sum:  # labels only decrease; equality = fixed point
            break
        prev_sum = cur_sum

    resolved = lab.map_batches(
        lambda b: pa.table({node_col: b["node"], "component": b["label"]}),
        batch_format="pyarrow",
    )

    # isolated nodes: anti-join all nodes against the touched set in
    # one bucketed co-shuffle of id-only rows; each is its own component
    n_buckets = 256

    def _tag_all(batch: pa.Table) -> pa.Table:
        n = batch[node_col].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "touched": pa.array(np.zeros(n.size, np.int64), pa.int64()),
                "nb": pa.array((n % n_buckets).astype(np.int64), pa.int64()),
            }
        )

    def _tag_touched(batch: pa.Table) -> pa.Table:
        n = batch["node"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "node": pa.array(n, pa.int64()),
                "touched": pa.array(np.ones(n.size, np.int64), pa.int64()),
                "nb": pa.array((n % n_buckets).astype(np.int64), pa.int64()),
            }
        )

    iso_schema = pa.schema([(node_col, pa.int64()), ("component", pa.int64())])

    def _isolated(group: pa.Table) -> pa.Table:
        n = group["node"].to_numpy(zero_copy_only=False)
        t = group["touched"].to_numpy(zero_copy_only=False)
        tset = np.sort(np.unique(n[t == 1]))
        cand = n[t == 0]
        if tset.size:
            pos = np.clip(np.searchsorted(tset, cand), 0, tset.size - 1)
            cand = cand[tset[pos] != cand]
        if cand.size == 0:
            return iso_schema.empty_table()
        return pa.table(
            {node_col: pa.array(cand, pa.int64()),
             "component": pa.array(cand, pa.int64())}
        )

    isolated = (
        nodes.map_batches(_tag_all, batch_format="pyarrow")
        .union(lab.select_columns(["node"]).map_batches(
            _tag_touched, batch_format="pyarrow"))
        .groupby("nb")
        .map_groups(_isolated, batch_format="pyarrow")
    )
    return resolved.union(isolated)


def fuzzy_dedup(
    ds,
    n_perm: int = 64,
    bands: int = 16,
    shingle_n: int = 3,
    est_threshold: float = 0.5,
    max_bucket: int = 256,
    seed: int = 42,
    text_col: str = "text",
    id_col: str = "doc_id",
):
    """documents -> (doc_id, component, keep): full fuzzy-dedup resolve.

    MinHash/LSH candidate pairs (``dedup.minhash_candidate_pairs``) ->
    connected components -> keep the minimum-id document of each
    component (keep=1) and mark the rest as duplicates (keep=0).
    """
    from . import dedup

    pairs = dedup.minhash_candidate_pairs(
        ds, n_perm=n_perm, bands=bands, shingle_n=shingle_n,
        est_threshold=est_threshold, max_bucket=max_bucket, seed=seed,
        text_col=text_col, id_col=id_col,
    )
    comp = connected_components(
        pairs, ds.select_columns([id_col]), node_col=id_col
    )

    def _keep(batch: pa.Table) -> pa.Table:
        node = batch[id_col].to_numpy(zero_copy_only=False)
        c = batch["component"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: batch[id_col],
                "component": batch["component"],
                "keep": pa.array((node == c).astype(np.int64), pa.int64()),
            }
        )

    return comp.map_batches(_keep, batch_format="pyarrow")
