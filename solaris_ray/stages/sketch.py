"""Count-min sketch — approximate term counting for unbounded vocab.

At 100 TB the exact heavy-hitter path (``tfidf.vocab_topk``) shuffles
one row per distinct term; when the vocabulary itself is unbounded
(URLs, n-grams) the classic answer is a count-min sketch (Cormode &
Muthukrishnan '05): fixed-size counter grid, per-batch partial
sketches, ONE tiny groupby-sum combine — memory is O(depth x width)
regardless of vocab size, and estimates never undercount
(est >= true; est <= true + eps*N w.h.p. with width >= e/eps).

Hash family: crc32(term) with a per-row salt prefix — deterministic,
seedless, reproducible in any rerun (same reason the engine's other
sampling uses salted md5/crc).

``cms_check`` is the gate surface: estimates for the EXACT top-k terms
must bracket the true counts — (term, cnt, ok=1) rows the SQL oracle
reproduces with exact counts and a literal 1 (the t-digest pass-bit
idiom: the sketch's guarantee is the thing being hash-checked).
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import WORD_SPLIT

DEPTH = 4
WIDTH = 4096


def _rows_of(terms: np.ndarray) -> np.ndarray:
    """(n_terms, DEPTH) column indices for each term."""
    out = np.empty((terms.size, DEPTH), np.int64)
    for d in range(DEPTH):
        salt = f"cms{d}:"
        out[:, d] = [zlib.crc32((salt + t).encode("utf-8")) % WIDTH
                     for t in terms]
    return out


def cms_build(ds, text_col: str = "text"):
    """documents -> the combined (DEPTH, WIDTH) count grid (numpy) +
    total token count.  Per-batch partials, one tiny combine."""
    part_schema = pa.schema(
        [("g", pa.int64()), ("n", pa.int64()), ("grid", pa.list_(pa.int64()))]
    )

    def _partial(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), WORD_SPLIT
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        if flat.size == 0:
            return part_schema.empty_table()
        grid = np.zeros((DEPTH, WIDTH), np.int64)
        uniq, cnt = np.unique(flat, return_counts=True)
        rows = _rows_of(uniq)
        for d in range(DEPTH):
            np.add.at(grid[d], rows[:, d], cnt)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([int(flat.size)], pa.int64()),
                "grid": pa.array([grid.ravel().tolist()], pa.list_(pa.int64())),
            }
        )

    def _combine(group: pa.Table) -> pa.Table:
        from .ann import list_col_to_matrix

        g = list_col_to_matrix(group["grid"], np.int64).sum(axis=0)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "n": pa.array([int(pc.sum(group["n"]).as_py())], pa.int64()),
                "grid": pa.array([g.tolist()], pa.list_(pa.int64())),
            }
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=1024)
        .groupby("g")
        .map_groups(_combine, batch_format="pyarrow")
        .take_all()  # exactly one row
    )
    grid = np.asarray(rows[0]["grid"], np.int64).reshape(DEPTH, WIDTH)
    return grid, int(rows[0]["n"])


def cms_estimate(grid: np.ndarray, terms: np.ndarray) -> np.ndarray:
    rows = _rows_of(terms)
    ests = np.stack([grid[d][rows[:, d]] for d in range(DEPTH)], axis=1)
    return ests.min(axis=1)


def cms_check(ds, k: int = 30, eps: float = 0.01, text_col: str = "text",
              id_col: str = "doc_id"):
    """Gate surface: for the exact top-k terms, assert the CMS bracket
    est in [cnt, cnt + eps*N].  Output (term, cnt, ok)."""
    import ray

    from .tfidf import vocab_topk

    grid, n_total = cms_build(ds, text_col)
    top = vocab_topk(ds, k=k, text_col=text_col, id_col=id_col).take_all()
    terms = np.asarray([r["term"] for r in top], object)
    cnt = np.asarray([r["cnt"] for r in top], np.int64)
    est = cms_estimate(grid, terms)
    ok = ((est >= cnt) & (est <= cnt + eps * n_total)).astype(np.int64)
    return ray.data.from_arrow(
        pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "cnt": pa.array(cnt, pa.int64()),
                "ok": pa.array(ok, pa.int64()),
            }
        )
    )


# --- HyperLogLog ----------------------------------------------------------

HLL_P = 12                  # 2^12 = 4096 registers, rel. error ~1.6%
HLL_M = 1 << HLL_P


def _hll_partial(values: np.ndarray) -> np.ndarray:
    """64-bit md5-low hashes -> register maxima (one partial grid)."""
    import hashlib

    regs = np.zeros(HLL_M, np.int64)
    h = np.asarray(
        [int.from_bytes(hashlib.md5(v.encode("utf-8")).digest()[:8], "little")
         for v in values],
        np.uint64,
    )
    idx = (h & np.uint64(HLL_M - 1)).astype(np.int64)
    rest = (h >> np.uint64(HLL_P)).astype(np.uint64)
    # rho = position of the first 1-bit in the remaining 52 bits (1-based)
    rho = np.full(h.size, 64 - HLL_P + 1, np.int64)
    nz = rest != 0
    # count trailing zeros via bit tricks: x & -x isolates the lowest bit
    low = (rest[nz] & (~rest[nz] + np.uint64(1))).astype(np.uint64)
    rho[nz] = np.log2(low.astype(np.float64)).astype(np.int64) + 1
    np.maximum.at(regs, idx, rho)
    return regs


def hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with the small-range linear-counting
    correction (Flajolet et al. 2007)."""
    m = float(HLL_M)
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.power(2.0, -regs.astype(np.float64)))
    zeros = int((regs == 0).sum())
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def hll_distinct(ds, col: str):
    """Approximate COUNT(DISTINCT col): per-batch register partials,
    ONE elementwise-max combine — memory O(4096) regardless of
    cardinality, nothing but one grid row per batch shuffles."""
    part_schema = pa.schema([("g", pa.int64()), ("regs", pa.list_(pa.int64()))])

    def _partial(batch: pa.Table) -> pa.Table:
        vals = np.unique(
            pc.cast(batch[col], pa.string()).to_numpy(zero_copy_only=False)
        )
        if vals.size == 0:
            return part_schema.empty_table()
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "regs": pa.array([_hll_partial(vals).tolist()],
                                 pa.list_(pa.int64())),
            }
        )

    def _combine(group: pa.Table) -> pa.Table:
        from .ann import list_col_to_matrix

        regs = list_col_to_matrix(group["regs"], np.int64).max(axis=0)
        return pa.table(
            {
                "g": pa.array([0], pa.int64()),
                "regs": pa.array([regs.tolist()], pa.list_(pa.int64())),
            }
        )

    rows = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=4096)
        .groupby("g")
        .map_groups(_combine, batch_format="pyarrow")
        .take_all()
    )
    return hll_estimate(np.asarray(rows[0]["regs"], np.int64))


def hll_sketch(ds, col: str):
    """Bench surface: the HLL estimate ALONE (no exact twin) — one
    int64 row.  ``hll_check`` keeps the exact pass for correctness
    gating; benching that would time the exact twin, not the sketch."""
    import ray

    est = hll_distinct(ds, col)
    return ray.data.from_arrow(
        pa.table({"estimate": pa.array([int(round(est))], pa.int64())})
    )


def cms_sketch(ds, terms: list[str], text_col: str = "text"):
    """Bench surface: CMS build + point estimates for a fixed term
    list (no exact top-k twin).  Output (term, est)."""
    import ray

    grid, _n = cms_build(ds, text_col)
    t = np.asarray(terms, object)
    est = cms_estimate(grid, t)
    return ray.data.from_arrow(
        pa.table(
            {
                "term": pa.array(t, pa.string()),
                "est": pa.array(est, pa.int64()),
            }
        )
    )


def hll_check(ds, col: str, exact_ds=None, rel_tol: float = 0.10):
    """Gate surface: (n_exact, ok) — HLL estimate within rel_tol of the
    exact distinct count (pass-bit idiom)."""
    import ray

    est = hll_distinct(ds, col)
    exact = (exact_ds if exact_ds is not None else ds).groupby(
        col).count().count()
    ok = int(abs(est - exact) <= rel_tol * exact)
    return ray.data.from_arrow(
        pa.table(
            {
                "n_exact": pa.array([int(exact)], pa.int64()),
                "ok": pa.array([ok], pa.int64()),
            }
        )
    )


def hll_group_check(ds, group_col: str, val_col: str, rel_tol: float = 0.15):
    """Per-group approximate distinct (grouped HLL) with the exact-twin
    gate (the tdigest precedent): -> (group, exact_distinct, hll_ok).

    Scale plan: register partials are SPARSE rows (g, idx, rho) — only
    touched registers shuffle, max-combined by ``groupby(g, idx)``;
    the dense 4096-register grid is reconstituted per group only in
    the final O(groups) reduce.  The exact twin is a (g, val) distinct
    co-shuffle; a production caller drops it and keeps the sketch.
    """
    from ray.data.aggregate import Count, Max

    part_schema = pa.schema(
        [("g", pa.string()), ("idx", pa.int64()), ("rho", pa.int64())])

    def _partial(batch: pa.Table) -> pa.Table:
        gs = batch[group_col].to_numpy(zero_copy_only=False)
        vs = pc.cast(batch[val_col], pa.string()).to_numpy(zero_copy_only=False)
        out_g, out_i, out_r = [], [], []
        for g in np.unique(gs):
            regs = _hll_partial(np.unique(vs[gs == g]))
            nz = np.flatnonzero(regs)
            out_g.extend([str(g)] * nz.size)
            out_i.append(nz)
            out_r.append(regs[nz])
        if not out_g:
            return part_schema.empty_table()
        return pa.table({
            "g": pa.array(out_g, pa.string()),
            "idx": pa.array(np.concatenate(out_i), pa.int64()),
            "rho": pa.array(np.concatenate(out_r), pa.int64()),
        })

    sparse = (
        ds.map_batches(_partial, batch_format="pyarrow", batch_size=8192)
        .groupby(["g", "idx"]).aggregate(Max("rho"))
    )

    def _finish(group: pa.Table) -> pa.Table:
        regs = np.zeros(HLL_M, np.int64)
        idx = group["idx"].to_numpy(zero_copy_only=False)
        rho = group["max(rho)"].to_numpy(zero_copy_only=False)
        regs[idx] = rho
        return pa.table({
            "g": pa.array([group["g"][0].as_py()], pa.string()),
            "est": pa.array([hll_estimate(regs)], pa.float64()),
        })

    ests = sparse.groupby("g").map_groups(_finish, batch_format="pyarrow")

    exact = (
        ds.map_batches(
            lambda b: pa.table({
                "g": pc.cast(b[group_col], pa.string()),
                "v": pc.cast(b[val_col], pa.string()),
            }),
            batch_format="pyarrow", batch_size=8192)
        .groupby(["g", "v"]).aggregate(Count())
        .groupby("g").aggregate(Count())
    )

    # both sides are groups-sized (one row per group): driver merge
    e = exact.to_pandas()
    s = ests.to_pandas()
    m = e.merge(s, on="g")  # groups-sized tables only
    ok = (np.abs(m["est"].to_numpy() / m["count()"].to_numpy() - 1.0)
          <= rel_tol).astype(np.int64)
    return pa.table({
        "grp": pa.array(m["g"].tolist(), pa.string()),
        "exact_distinct": pa.array(m["count()"].to_numpy().astype(np.int64)),
        "hll_ok": pa.array(ok, pa.int64()),
    })
