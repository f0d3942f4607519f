"""Exact set-similarity self-join: all document pairs with Jaccard
(over DISTINCT whitespace tokens) >= tau, via prefix filtering.

The EXACT complement of the MinHash ladder (`stages/dedup.py`
approximates this relation; `stages/editdist.py` covers short strings)
— data-cleaning joins, citation matching, near-identical caption
detection where a guaranteed-no-miss answer is required.

Prefix filter (Chaudhuri et al. ICDE'06 / Bayardo et al. WWW'07
AllPairs): order tokens globally (rarest first); with sets sorted in
that order, two sets with Jaccard >= tau MUST share a token in their
first ``p = n - ceil(tau * n) + 1`` tokens.  Only prefix tokens are
emitted as join keys, so a common stopword shared by every document
never becomes a join key unless tau is tiny — frequency ordering puts
it last.  Ordering affects PRUNING only, never the answer: candidates
are verified with exact integer intersection counts
(``100 * inter >= tau100 * union`` — no float compare anywhere).

Shape: (1) one token-frequency groupby (partial counts per batch
first); the (token-hash, df) vocabulary is broadcast via ``ray.put``
— captions/titles have bounded vocabularies; for an unbounded-vocab
corpus swap the broadcast for a rank co-shuffle, the pairs stay exact
under ANY total order.  (2) one bucketed co-shuffle of prefix rows
(rank, doc_id, full rank-set as a list column); per-bucket pair
emission is capped + logged per token (dedup.py discipline) and
verified IN the bucket — sets never ride a second exchange (the
editdist.py lesson); (3) an id-only distinct collapses pairs that met
under several prefix tokens.

Token identity is a 64-bit siphash (pandas ``hash_array``): two
distinct tokens colliding would merge their df counts and could
miscount one intersection — probability ~ vocab^2 / 2^64 (~1e-12 at a
1e3 vocab, ~3e-9 at 1e6); documented, not hidden.
"""

from __future__ import annotations

import logging
import math

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._buckets import bucket_of
from .text import WORD_SPLIT

logger = logging.getLogger(__name__)

_PAIR = pa.schema(
    [
        ("id_a", pa.int64()),
        ("id_b", pa.int64()),
        ("inter", pa.int64()),
        ("uni", pa.int64()),
    ]
)


def _doc_token_hashes(batch: pa.Table, text_col: str, id_col: str):
    """Per doc: sorted DISTINCT token hashes.  Returns (ids, list of
    np arrays)."""
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.cast(batch[text_col], pa.string())),
        WORD_SPLIT,
    )
    flat = toks.combine_chunks() if hasattr(toks, "combine_chunks") else toks
    offs = flat.offsets.to_numpy(zero_copy_only=False)
    vals = np.asarray(flat.values.to_pylist(), dtype=object)
    h = pd.util.hash_array(vals).astype(np.int64)
    sets = []
    for i in range(ids.size):
        sets.append(np.unique(h[offs[i] : offs[i + 1]]))
    return ids, sets


def jaccard_set_join(
    ds,
    tau100: int = 60,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 64,
    max_key_bucket: int = 4096,
):
    """-> (id_a, id_b, inter, uni) for every unordered doc pair with
    100 * |A∩B| >= tau100 * |A∪B| over distinct whitespace tokens
    (id_a < id_b; docs with empty token sets never pair)."""
    if not 0 < tau100 <= 100:
        raise ValueError("jaccard_set_join: tau100 must be in (0, 100]")
    import ray

    # ---- pass 1: global token document frequencies -------------------
    def _tok_partial(batch: pa.Table) -> pa.Table:
        _, sets = _doc_token_hashes(batch, text_col, id_col)
        if not sets:
            return pa.table(
                {"tok": pa.array([], pa.int64()), "n": pa.array([], pa.int64())}
            )
        allh = np.concatenate(sets) if sets else np.empty(0, np.int64)
        uniq, cnt = np.unique(allh, return_counts=True)
        return pa.table(
            {"tok": pa.array(uniq, pa.int64()), "n": pa.array(cnt, pa.int64())}
        )

    df = (
        ds.map_batches(_tok_partial, batch_format="pyarrow")
        .groupby("tok")
        .sum("n")
        .to_pandas()
    )
    toks = df["tok"].to_numpy().astype(np.int64)
    dfs = df["sum(n)"].to_numpy().astype(np.int64)
    # rank 0 = rarest; ties broken by token hash for determinism
    order = np.lexsort((toks, dfs))
    rank_of = np.empty(toks.size, np.int64)
    rank_of[order] = np.arange(toks.size)
    sorted_toks = np.sort(toks)
    # rank lookup aligned to sorted token hashes
    rank_sorted = rank_of[np.argsort(toks, kind="stable")]
    vocab_ref = ray.put((sorted_toks, rank_sorted))
    logger.info("jaccard_set_join: vocabulary %d tokens", toks.size)

    # ---- pass 2: prefix emission with the full rank-set --------------
    def _emit(batch: pa.Table) -> pa.Table:
        sorted_t, rank_s = ray.get(vocab_ref)
        ids, sets = _doc_token_hashes(batch, text_col, id_col)
        out_rank, out_id, out_set = [], [], []
        for i in range(ids.size):
            s = sets[i]
            if s.size == 0:
                continue
            pos = np.searchsorted(sorted_t, s)
            ranks = np.sort(rank_s[pos])
            n = ranks.size
            p = n - math.ceil(tau100 * n / 100) + 1
            for r in ranks[:p]:
                out_rank.append(r)
                out_id.append(ids[i])
                out_set.append(ranks)
        if not out_rank:
            return pa.table(
                {
                    "r": pa.array([], pa.int64()),
                    "id": pa.array([], pa.int64()),
                    "set": pa.array([], pa.list_(pa.int64())),
                    "rb": pa.array([], pa.int64()),
                }
            )
        r = np.asarray(out_rank, np.int64)
        return pa.table(
            {
                "r": pa.array(r, pa.int64()),
                "id": pa.array(np.asarray(out_id, np.int64), pa.int64()),
                "set": pa.array(out_set, pa.list_(pa.int64())),
                "rb": pa.array(bucket_of(r, n_buckets), pa.int64()),
            }
        )

    def _pairs(group: pa.Table) -> pa.Table:
        # per-key verification is a boolean-membership MATMUL, not a
        # per-pair loop: group tokens remap to local columns, M is the
        # (docs x local-vocab) 0/1 matrix, M @ M.T is every pairwise
        # intersection count at BLAS speed
        r = group["r"].to_numpy(zero_copy_only=False)
        ids = group["id"].to_numpy(zero_copy_only=False)
        set_col = group["set"].combine_chunks()
        offs = set_col.offsets.to_numpy(zero_copy_only=False)
        vals = set_col.values.to_numpy(zero_copy_only=False)
        order = np.lexsort((ids, r))
        starts = np.flatnonzero(
            np.concatenate(([True], r[order][1:] != r[order][:-1]))
        )
        ends = np.append(starts[1:], r.size)
        oa, ob, oi, ou = [], [], [], []
        for s, e in zip(starts, ends):
            rows = order[s:e]
            c = rows.size
            if c < 2:
                continue
            if c > max_key_bucket:
                logger.warning(
                    "jaccard_set_join: token with %d prefix entries over "
                    "max_key_bucket=%d — candidates truncated",
                    c, max_key_bucket,
                )
                rows = rows[:max_key_bucket]
                c = rows.size
            lens = offs[rows + 1] - offs[rows]
            flat = np.concatenate([vals[offs[j] : offs[j + 1]] for j in rows])
            local, inv = np.unique(flat, return_inverse=True)
            m = np.zeros((c, local.size), np.float32)
            rowidx = np.repeat(np.arange(c), lens)
            m[rowidx, inv] = 1.0
            inter = (m @ m.T).astype(np.int64)
            sz = lens.astype(np.int64)
            uni = sz[:, None] + sz[None, :] - inter
            ok = 100 * inter >= tau100 * uni
            iu, ju = np.triu_indices(c, k=1)
            keep = ok[iu, ju] & (ids[rows][iu] != ids[rows][ju])
            iu, ju = iu[keep], ju[keep]
            ga, gb = ids[rows][iu], ids[rows][ju]
            lo = np.minimum(ga, gb)
            hi = np.maximum(ga, gb)
            oa.append(lo)
            ob.append(hi)
            oi.append(inter[iu, ju])
            ou.append(uni[iu, ju])
        if not oa:
            return _PAIR.empty_table()
        return pa.table(
            {
                "id_a": pa.array(np.concatenate(oa), pa.int64()),
                "id_b": pa.array(np.concatenate(ob), pa.int64()),
                "inter": pa.array(np.concatenate(oi), pa.int64()),
                "uni": pa.array(np.concatenate(ou), pa.int64()),
            }
        )

    verified = (
        ds.map_batches(_emit, batch_format="pyarrow")
        .groupby("rb")
        .map_groups(_pairs, batch_format="pyarrow")
    )
    # cross-bucket distinct (a pair can qualify under prefix tokens in
    # different buckets); inter/uni are identical on every copy
    from ray.data.aggregate import Max

    return (
        verified.groupby(["id_a", "id_b"])
        .aggregate(Max("inter"), Max("uni"))
        .map_batches(
            lambda b: (
                _PAIR.empty_table()
                if b.num_rows == 0 or "id_a" not in b.schema.names
                else pa.table(
                    {
                        "id_a": b["id_a"],
                        "id_b": b["id_b"],
                        "inter": b["max(inter)"],
                        "uni": b["max(uni)"],
                    }
                )
            ),
            batch_format="pyarrow",
        )
    )
