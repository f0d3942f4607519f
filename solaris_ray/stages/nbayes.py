"""Multinomial naive-Bayes training — class-conditional token counts.

The supervised sibling of `stages/corpus.py`'s vocabulary pass:
training a lang-ID / source-ID / quality classifier over a curated
corpus is a counting job, and the counts ARE the model (log transforms
are a serve-time detail).  Emitting exact integer sufficient
statistics keeps the gate hash-exact — the bpe.py "merge-table-exact"
discipline.

Per (class, token): occurrence count over all docs of the class
(token MULTIPLICITY, the multinomial event model — not per-doc
presence).  Per class: total token count and doc count, denormalized
onto every row so a scorer can compute

    log P(tok | class) = log((cnt + alpha) / (class_tokens + alpha*V))

without a second lookup.  The distinct-vocabulary size V is a global
scalar the caller reads off the row count / distinct toks.

Shape: per-batch partial (class, token, n, and per-class doc/token
partials) -> ONE groupby((class, token)) sum; class totals ride the
same exchange as marker rows (token = '', never a real token after
whitespace split) instead of a second shuffle — one all-to-all total.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .text import WORD_SPLIT

_OUT = pa.schema(
    [
        ("cls", pa.string()),
        ("tok", pa.string()),
        ("cnt", pa.int64()),
        ("cls_tokens", pa.int64()),
        ("cls_docs", pa.int64()),
    ]
)


def nbayes_counts(
    ds,
    class_col: str = "lang",
    text_col: str = "text",
):
    """Dataset of labelled documents -> one row per (class, token)
    with the class-conditional count and the class's token/doc totals
    denormalized on (the trained multinomial NB model, exact)."""

    def _partial(batch: pa.Table) -> pa.Table:
        cls = np.asarray(batch[class_col].to_pylist(), dtype=object)
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.cast(batch[text_col], pa.string())),
            WORD_SPLIT,
        )
        flat = toks.combine_chunks() if hasattr(toks, "combine_chunks") else toks
        offs = flat.offsets.to_numpy(zero_copy_only=False)
        vals = np.asarray(flat.values.to_pylist(), dtype=object)
        lens = np.diff(offs)
        doc_cls = np.repeat(cls, lens)
        # drop empty tokens (an empty/whitespace text splits to [""]),
        # which would collide with the class-marker rows below
        nz = vals != ""
        doc_cls, vals = doc_cls[nz], vals[nz]
        # (class, token) partial counts via pandas factorize-pair
        df = pd.DataFrame({"c": doc_cls, "t": vals})
        g = df.groupby(["c", "t"], sort=False).size().reset_index(name="n")
        # class marker rows: token = "" cannot occur post-split
        dcls, dcnt = np.unique(cls, return_counts=True)
        # token totals per class from this batch
        tc = df.groupby("c", sort=False).size()
        mark_c = list(dcls)
        mark_docs = list(dcnt.astype(np.int64))
        mark_toks = [int(tc.get(c, 0)) for c in mark_c]
        return pa.table(
            {
                "cls": pa.array(
                    list(g["c"]) + mark_c, pa.string()
                ),
                "tok": pa.array(list(g["t"]) + [""] * len(mark_c), pa.string()),
                "n": pa.array(
                    list(g["n"].astype(np.int64)) + mark_toks, pa.int64()
                ),
                "docs": pa.array(
                    [0] * len(g) + mark_docs, pa.int64()
                ),
            }
        )

    from ray.data.aggregate import Sum

    agg = (
        ds.map_batches(_partial, batch_format="pyarrow")
        .groupby(["cls", "tok"])
        .aggregate(Sum("n"), Sum("docs"))
        .to_pandas()
    )
    # markers (tok == "") hold per-class totals; broadcast-join onto
    # the real rows driver-side — the model table is vocab-sized
    marks = agg[agg["tok"] == ""]
    tot_toks = dict(zip(marks["cls"], marks["sum(n)"]))
    tot_docs = dict(zip(marks["cls"], marks["sum(docs)"]))
    rows = agg[agg["tok"] != ""].sort_values(["cls", "tok"])
    return pa.table(
        {
            "cls": pa.array(list(rows["cls"]), pa.string()),
            "tok": pa.array(list(rows["tok"]), pa.string()),
            "cnt": pa.array(
                rows["sum(n)"].to_numpy().astype(np.int64), pa.int64()
            ),
            "cls_tokens": pa.array(
                [int(tot_toks[c]) for c in rows["cls"]], pa.int64()
            ),
            "cls_docs": pa.array(
                [int(tot_docs[c]) for c in rows["cls"]], pa.int64()
            ),
        }
    )
