"""Distributed TF-IDF: per-document top-k distinctive terms.

Training-data curation primitive (topic tagging, keyword extraction,
quality filtering by term distinctiveness); the reference has no text
stack.  Tokenization = whitespace split of trimmed text, the corpus
convention shared with stages.text and every SQL oracle.

Shape (two bucketed co-shuffles, everything vectorized):
  1. ``map_batches``: explode tokens with Arrow C++
     (``split_pattern_regex`` -> ``list_flatten`` +
     ``list_parent_indices``), per-batch (doc, term) counts via
     ``pa.Table.group_by`` — rows leaving the stage are (doc_id, term,
     tf, bucket=crc32(term)%B), already combined per batch.
  2. ``groupby(bucket)``: all rows of a term land in one bucket; df =
     per-term row count (exact — (doc, term) is unique), attached by
     ``np.unique(return_inverse)``.  Bucketing by hash instead of
     ``groupby(term)`` keeps group count bounded at B instead of
     vocabulary-size (millions of tiny Python group calls at scale).
  3. ``groupby(doc_id % B)``: score = round(tf * ln(N/df), 6), per-doc
     rank by (score desc, term asc), keep top k.

Only (id, term, two ints) rows shuffle — never document bodies.
"""

from __future__ import annotations

import zlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import WORD_SPLIT

_TF_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("term", pa.string()),
     ("tf", pa.int64()), ("bucket", pa.int64())]
)
_DF_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("term", pa.string()),
     ("tf", pa.int64()), ("df", pa.int64()), ("dbucket", pa.int64())]
)
_OUT_SCHEMA = pa.schema(
    [("doc_id", pa.int64()), ("rank", pa.int64()), ("term", pa.string()),
     ("tf", pa.int64()), ("df", pa.int64()), ("score6", pa.float64())]
)


def vocab_topk(ds, k: int = 100, n_buckets: int = 256,
               text_col: str = "text", id_col: str = "doc_id"):
    """Global heavy-hitters: top-k terms by total occurrence count,
    ties broken by term asc.  Per-batch combine (Arrow group_by) ->
    hash-bucketed exact totals with a per-bucket top-k prune (safe: a
    term's rows all land in one bucket) -> tiny global sort + limit."""
    part_schema = pa.schema([("term", pa.string()), ("cnt", pa.int64()),
                             ("bucket", pa.int64())])

    def _count(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), WORD_SPLIT
        )
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return part_schema.empty_table()
        t = pa.table({"term": flat}).group_by(["term"]).aggregate([([], "count_all")])
        uniq = t["term"].to_numpy(zero_copy_only=False)
        ub = np.array(
            [zlib.crc32(u.encode("utf-8")) % n_buckets for u in uniq], np.int64
        )
        return pa.table(
            {
                "term": t["term"],
                "cnt": pc.cast(t["count_all"], pa.int64()),
                "bucket": pa.array(ub, pa.int64()),
            }
        )

    def _bucket_topk(group: pa.Table) -> pa.Table:
        terms = group["term"].to_numpy(zero_copy_only=False)
        cnt = group["cnt"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        tot = np.zeros(len(uniq), np.int64)
        np.add.at(tot, inv, cnt)
        order = np.lexsort((uniq, -tot))[:k]
        return pa.table(
            {
                "term": pa.array(uniq[order], pa.string()),
                "cnt": pa.array(tot[order], pa.int64()),
            }
        )

    return (
        ds.map_batches(_count, batch_format="pyarrow", batch_size=1024)
        .groupby("bucket")
        .map_groups(_bucket_topk, batch_format="pyarrow")
        .sort(["cnt", "term"], descending=[True, False])
        .limit(k)
    )


def tfidf_topk(ds, k: int = 5, n_buckets: int = 256,
               text_col: str = "text", id_col: str = "doc_id"):
    """documents -> (doc_id, rank, term, tf, df, score6), top-k terms
    per document by tf * ln(N/df), rank ties broken by term asc."""
    n_docs = ds.count()

    def _explode(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), WORD_SPLIT
        )
        flat = pc.list_flatten(toks)
        if len(flat) == 0:
            return _TF_SCHEMA.empty_table()
        parent = pc.list_parent_indices(toks)
        ids = pc.take(pc.cast(batch[id_col], pa.int64()), parent)
        tf = (
            pa.table({"doc_id": ids, "term": flat})
            .group_by(["doc_id", "term"])
            .aggregate([([], "count_all")])
        )
        terms = tf["term"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(terms, return_inverse=True)
        ub = np.array(
            [zlib.crc32(u.encode("utf-8")) % n_buckets for u in uniq], np.int64
        )
        return pa.table(
            {
                "doc_id": tf["doc_id"],
                "term": tf["term"],
                "tf": pc.cast(tf["count_all"], pa.int64()),
                "bucket": pa.array(ub[inv], pa.int64()),
            }
        )

    def _df(group: pa.Table) -> pa.Table:
        if group.num_rows == 0:
            return _DF_SCHEMA.empty_table()
        terms = group["term"].to_numpy(zero_copy_only=False)
        _, inv, cnt = np.unique(terms, return_inverse=True, return_counts=True)
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "doc_id": group["doc_id"],
                "term": group["term"],
                "tf": group["tf"],
                "df": pa.array(cnt[inv].astype(np.int64), pa.int64()),
                "dbucket": pa.array((doc % n_buckets).astype(np.int64), pa.int64()),
            }
        )

    def _topk(group: pa.Table) -> pa.Table:
        m = group.num_rows
        if m == 0:
            return _OUT_SCHEMA.empty_table()
        doc = group["doc_id"].to_numpy(zero_copy_only=False)
        term = group["term"].to_numpy(zero_copy_only=False)
        tf = group["tf"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = group["df"].to_numpy(zero_copy_only=False).astype(np.float64)
        score = np.round(tf * np.log(n_docs / df), 6)
        # sort by (doc asc, score desc, term asc); lexsort: last key primary
        order = np.lexsort((term, -score, doc))
        doc_s = doc[order]
        # per-doc positional rank over the sorted runs
        starts = np.flatnonzero(np.r_[True, doc_s[1:] != doc_s[:-1]])
        run_start = np.repeat(starts, np.diff(np.r_[starts, m]))
        rank = np.arange(m, dtype=np.int64) - run_start + 1
        keep = rank <= k
        sel = order[keep]
        return pa.table(
            {
                "doc_id": pa.array(doc[sel], pa.int64()),
                "rank": pa.array(rank[keep], pa.int64()),
                "term": pa.array(term[sel], pa.string()),
                "tf": pa.array(tf[sel].astype(np.int64), pa.int64()),
                "df": pa.array(df[sel].astype(np.int64), pa.int64()),
                "score6": pa.array(score[sel], pa.float64()),
            }
        )

    return (
        ds.map_batches(_explode, batch_format="pyarrow", batch_size=1024)
        .groupby("bucket")
        .map_groups(_df, batch_format="pyarrow")
        .groupby("dbucket")
        .map_groups(_topk, batch_format="pyarrow")
    )
