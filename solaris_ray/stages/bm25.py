"""BM25 ranked retrieval over the corpus — broadcast-query scoring.

The standard ranked-search primitive (Robertson-Sparck Jones BM25,
k1/b form).  Scale shape: the query side is tiny, so nothing shuffles
— two cheap metadata passes compute the query terms' document
frequencies and the corpus average length (partial sums per batch,
one tiny aggregate each), then scoring is a single streaming
``map_batches`` over the corpus and the global top-k is a sort+limit
over only the scored matches (docs containing >= 1 query term).

score(d) = sum over query terms t in d of
    ln(1 + (N - df_t + 0.5) / (df_t + 0.5))
    * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len_d / avgdl))

with len_d = token count.  Rounded to 6 dp on both engine and oracle
sides (the repo float idiom); ties broken by doc_id asc.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .text import WORD_SPLIT


def bm25_topk(ds, terms: list[str], k: int = 20, k1: float = 1.2,
              b: float = 0.75, text_col: str = "text",
              id_col: str = "doc_id", round_dp: int = 6):
    """documents -> top-k (doc_id, score6) by BM25 over ``terms``."""
    terms_arr = np.asarray(sorted(set(terms)), object)

    stat_schema = pa.schema(
        [("term", pa.string()), ("df", pa.int64()),
         ("n", pa.int64()), ("toks", pa.int64())]
    )

    def _stats(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return stat_schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), WORD_SPLIT
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        total_toks = int(flat.size)
        t_out, df_out = [], []
        for t in terms_arr:
            df_out.append(int(np.unique(parent[flat == t]).size))
            t_out.append(t)
        # one marker row per batch carries (n_docs, n_tokens) partials
        return pa.table(
            {
                "term": pa.array(list(t_out) + [""], pa.string()),
                "df": pa.array(df_out + [0], pa.int64()),
                "n": pa.array([0] * len(t_out) + [nrows], pa.int64()),
                "toks": pa.array([0] * len(t_out) + [total_toks], pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(_stats, batch_format="pyarrow", batch_size=1024)
        .groupby("term")
        .aggregate(Sum("df"), Sum("n"), Sum("toks"))
        .take_all()  # len(terms) + 1 rows — tiny by construction
    )
    N = sum(r["sum(n)"] for r in rows)
    total_toks = sum(r["sum(toks)"] for r in rows)
    avgdl = total_toks / N
    df = {r["term"]: r["sum(df)"] for r in rows if r["term"] != ""}
    idf = {
        t: np.log(1.0 + (N - df[t] + 0.5) / (df[t] + 0.5)) for t in terms_arr
    }

    out_schema = pa.schema([(id_col, pa.int64()), ("score6", pa.float64())])

    def _score(batch: pa.Table) -> pa.Table:
        nrows = batch.num_rows
        if nrows == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), WORD_SPLIT
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        dl = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(
            np.float64)
        score = np.zeros(nrows, np.float64)
        hit = np.zeros(nrows, bool)
        norm = k1 * (1.0 - b + b * dl / avgdl)
        for t in terms_arr:
            tf = np.bincount(parent[flat == t], minlength=nrows).astype(
                np.float64)
            has = tf > 0
            hit |= has
            score += np.where(
                has, idf[t] * tf * (k1 + 1.0) / (tf + norm), 0.0
            )
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[hit], pa.int64()),
                "score6": pa.array(np.round(score[hit], round_dp), pa.float64()),
            }
        )

    return (
        ds.map_batches(_score, batch_format="pyarrow", batch_size=1024)
        .sort(["score6", id_col], descending=[True, False])
        .limit(k)
    )
