"""Exact distributed dominance counting (inequality-join aggregate).

For every row i, count the rows j with ``t_j < t_i AND v_j > v_i``
(both strict) — the IEJoin-class two-inequality self-join (Khayyat et
al., VLDB'15) reduced to its per-row aggregate: inversion counts,
Kendall-tau discordance, "how many earlier orders were bigger".

Scale plan — the pair space is partitioned three ways so no stage ever
enumerates cross-bucket pairs:

1. Rows are bucketed by t-value into P intervals and by v-value into Q
   intervals (boundaries from ``exact_rank_select``; equal values
   always share a bucket, so cross-bucket inequalities are strict by
   construction).
2. A P×Q count matrix N is aggregated (tiny), prefix-summed on the
   driver into ``M[p][q] = Σ_{p'<p, q'>q} N[p'][q']`` and broadcast:
   every strictly-cross-bucket pair is answered by ONE matrix lookup.
3. Same-t-bucket pairs: groupby(p) co-shuffle, an in-group
   chunked-histogram kernel (O(m·c + (m/c)·U), fully vectorized) with
   an equal-t run correction so ties in t never count.
4. Same-v-bucket / different-t-bucket pairs: groupby(q) co-shuffle;
   t-buckets are scanned in ascending order keeping a merged sorted
   value array, so each element's count is one ``searchsorted`` —
   ``p_j < p_i`` already implies ``t_j < t_i`` because t-buckets are
   disjoint value intervals.

The three partial counts union into one id-keyed co-shuffle; only
(id, count) rows ever move.  Total shuffle volume is O(rows), the
matrix is O(P·Q), and the quadratic term is confined to c-sized chunks
inside a bucket.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _dominance_in_order(v: np.ndarray) -> np.ndarray:
    """counts[i] = #{j < i : v[j] > v[i]} over positional order —
    chunked: previous chunks answered by a cumulative histogram of
    value ranks, the current chunk by one c×c boolean matrix."""
    m = v.size
    counts = np.zeros(m, np.int64)
    if m < 2:
        return counts
    vals, inv = np.unique(v, return_inverse=True)
    hist = np.zeros(vals.size, np.int64)
    c = max(32, int(2 * np.sqrt(m)))
    pos = np.arange(c)
    for s in range(0, m, c):
        e = min(s + c, m)
        chunk = inv[s:e]
        if s:
            cum = np.cumsum(hist)  # cum[r] = # previous with rank <= r
            counts[s:e] += s - cum[chunk]
        L = e - s
        gt = chunk[:, None] > chunk[None, :]
        before = pos[:L, None] < pos[None, :L]
        counts[s:e] += (gt & before).sum(axis=0, dtype=np.int64)
        np.add.at(hist, chunk, 1)
    return counts


def _same_bucket_counts(t: np.ndarray, ids: np.ndarray, v: np.ndarray):
    """Within one t-bucket: counts[i] = #{j : t_j < t_i, v_j > v_i}.
    Computed as dominance over (t, id) positional order minus the
    equal-t run contribution (ties in t must not count)."""
    order = np.lexsort((ids, t))
    tv = v[order]
    counts = _dominance_in_order(tv)
    ts = t[order]
    # subtract pairs inside equal-t runs (they are positional-before
    # but not strictly earlier in t)
    run_starts = np.flatnonzero(np.concatenate(([True], ts[1:] != ts[:-1])))
    run_ends = np.concatenate((run_starts[1:], [ts.size]))
    for s, e in zip(run_starts, run_ends):
        if e - s > 1:
            counts[s:e] -= _dominance_in_order(tv[s:e])
    out = np.zeros_like(counts)
    out[order] = counts
    return out


def _cross_bucket_counts(p: np.ndarray, ids: np.ndarray, v: np.ndarray):
    """Within one v-bucket: counts[i] = #{j : p_j < p_i, v_j > v_i}.
    t-buckets scanned ascending with a merged sorted value array."""
    order = np.lexsort((ids, p))
    ps, vs = p[order], v[order]
    counts = np.zeros(ps.size, np.int64)
    run_starts = np.flatnonzero(np.concatenate(([True], ps[1:] != ps[:-1])))
    run_ends = np.concatenate((run_starts[1:], [ps.size]))
    prev = np.empty(0, v.dtype)
    for s, e in zip(run_starts, run_ends):
        if prev.size:
            counts[s:e] = prev.size - np.searchsorted(prev, vs[s:e], side="right")
        prev = np.sort(np.concatenate((prev, vs[s:e])))
    out = np.zeros_like(counts)
    out[order] = counts
    return out


def kendall_tau(ds, id_col: str, t_col: str, v_col: str,
                n_tbuckets: int = 16, n_vbuckets: int = 16):
    """Exact Kendall tau-b between two integer columns, distributed.

    Discordant pairs come from ``dominance_counts`` (each discordant
    pair — strict t difference, opposite-strict v — is counted exactly
    once from its later-t endpoint); tie masses are three tiny
    groupby-count aggregates; concordant pairs fall out by pair-space
    complement.  The only float is the final tau expression, 6-dp
    rounded — SQL-twin-identical on identical int64 operands.

    -> one row: (n, concordant, discordant, ties_t, ties_v, ties_tv,
    tau6).
    """
    from ray.data.aggregate import Count, Sum

    def _c2(counts: np.ndarray) -> int:
        c = counts.astype(np.int64)
        return int((c * (c - 1) // 2).sum())

    def _tie_mass(keyed, cols):
        grp = keyed.groupby(cols).aggregate(Count())
        t = grp.to_pandas()
        return _c2(t["count()"].to_numpy())

    base = ds.map_batches(
        lambda b: pa.table({
            "id": pc.cast(b[id_col], pa.int64()),
            "t": pc.cast(b[t_col], pa.int64()),
            "v": pc.cast(b[v_col], pa.int64()),
        }),
        batch_format="pyarrow", batch_size=65536,
    ).materialize()

    n = base.count()
    pairs = n * (n - 1) // 2
    tt = _tie_mass(base, "t")
    tv = _tie_mass(base, "v")
    ttv = _tie_mass(base, ["t", "v"])
    dom = dominance_counts(base, "id", "t", "v",
                           n_tbuckets=n_tbuckets, n_vbuckets=n_vbuckets)
    d = int(dom.aggregate(Sum("dom"))["sum(dom)"])
    c = pairs - tt - tv + ttv - d
    denom = float(pairs - tt) * float(pairs - tv)
    tau = round((c - d) / np.sqrt(denom), 6) if denom > 0 else 0.0
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "concordant": pa.array([c], pa.int64()),
        "discordant": pa.array([d], pa.int64()),
        "ties_t": pa.array([tt], pa.int64()),
        "ties_v": pa.array([tv], pa.int64()),
        "ties_tv": pa.array([ttv], pa.int64()),
        "tau6": pa.array([tau], pa.float64()),
    })


def dominance_counts(ds, id_col: str, t_col: str, v_col: str,
                     n_tbuckets: int = 16, n_vbuckets: int = 16):
    """-> (id, dom) — for every row, the exact count of rows strictly
    earlier in ``t_col`` with strictly greater ``v_col``."""
    import ray
    from ray.data.aggregate import Sum

    from .quantiles import exact_rank_select

    base = ds.map_batches(
        lambda b: pa.table({
            "id": pc.cast(b[id_col], pa.int64()),
            "t": pc.cast(b[t_col], pa.int64()),
            "v": pc.cast(b[v_col], pa.int64()),
        }),
        batch_format="pyarrow", batch_size=65536,
    ).materialize()  # consumed by 2 rank selections + the assign pass

    n = base.count()
    pb = max(1, min(n_tbuckets, n))
    qb = max(1, min(n_vbuckets, n))
    t_bounds = np.asarray(
        exact_rank_select(base, "t", [(j * n) // pb for j in range(1, pb)])
        if pb > 1 else [], dtype=np.float64)
    v_bounds = np.asarray(
        exact_rank_select(base, "v", [(j * n) // qb for j in range(1, qb)])
        if qb > 1 else [], dtype=np.float64)

    def _assign(batch: pa.Table) -> pa.Table:
        t = batch["t"].to_numpy().astype(np.float64)
        v = batch["v"].to_numpy().astype(np.float64)
        return pa.table({
            "id": batch["id"],
            "t": batch["t"],
            "v": batch["v"],
            "p": pa.array(np.searchsorted(t_bounds, t, side="left"), pa.int64()),
            "q": pa.array(np.searchsorted(v_bounds, v, side="left"), pa.int64()),
        })

    assigned = base.map_batches(
        _assign, batch_format="pyarrow", batch_size=65536
    ).materialize()  # fans out to matrix + both kernels (id-width rows)

    # P×Q count matrix -> strict-cross-bucket prefix lookup
    def _cells(batch: pa.Table) -> pa.Table:
        key = (batch["p"].to_numpy() * (qb + 1) + batch["q"].to_numpy())
        uniq, cnt = np.unique(key, return_counts=True)
        return pa.table({"cell": pa.array(uniq, pa.int64()),
                         "n": pa.array(cnt, pa.int64())})

    cells = (
        assigned.map_batches(_cells, batch_format="pyarrow", batch_size=65536)
        .groupby("cell").aggregate(Sum("n")).to_pandas()
    )
    N = np.zeros((pb, qb), np.int64)
    cp = (cells["cell"].to_numpy() // (qb + 1)).astype(np.int64)
    cq = (cells["cell"].to_numpy() % (qb + 1)).astype(np.int64)
    N[cp, cq] = cells["sum(n)"].to_numpy()
    # M[p][q] = sum over p' < p, q' > q
    below = np.cumsum(N, axis=0)  # inclusive along p
    strict_p = np.vstack([np.zeros((1, qb), np.int64), below[:-1]])
    suffix_q = np.cumsum(strict_p[:, ::-1], axis=1)[:, ::-1]
    M = np.hstack([suffix_q[:, 1:], np.zeros((pb, 1), np.int64)])
    m_ref = ray.put(M)

    def _matrix_part(batch: pa.Table) -> pa.Table:
        mm = ray.get(m_ref)
        p = batch["p"].to_numpy()
        q = batch["q"].to_numpy()
        return pa.table({"id": batch["id"],
                         "c": pa.array(mm[p, q], pa.int64())})

    def _same_p(group: pa.Table) -> pa.Table:
        out = _same_bucket_counts(
            group["t"].to_numpy(), group["id"].to_numpy(),
            group["v"].to_numpy())
        return pa.table({"id": group["id"], "c": pa.array(out, pa.int64())})

    def _same_q(group: pa.Table) -> pa.Table:
        out = _cross_bucket_counts(
            group["p"].to_numpy(), group["id"].to_numpy(),
            group["v"].to_numpy())
        return pa.table({"id": group["id"], "c": pa.array(out, pa.int64())})

    parts = (
        assigned.map_batches(_matrix_part, batch_format="pyarrow",
                             batch_size=65536)
        .union(assigned.select_columns(["id", "t", "v", "p"])
               .groupby("p").map_groups(_same_p, batch_format="pyarrow"))
        .union(assigned.select_columns(["id", "p", "v", "q"])
               .groupby("q").map_groups(_same_q, batch_format="pyarrow"))
    )
    agg = parts.groupby("id").aggregate(Sum("c"))
    return agg.map_batches(
        lambda b: pa.table({"id": pc.cast(b["id"], pa.int64()),
                            "dom": pc.cast(b["sum(c)"], pa.int64())}),
        batch_format="pyarrow",
    )
