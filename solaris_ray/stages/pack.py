"""Sequence packing — concat-and-chunk layout for LLM pretraining.

Documents are laid out in a deterministic global order (sorted by
``order_col``), conceptually concatenated token-by-token, and cut into
fixed-length training sequences of ``seq_len`` tokens.  Each document
row gains its token span in that global stream:

  ``start_tok``  - global offset of the document's first token
  ``bin_first``  - index of the first training sequence it touches
  ``bin_last``   - index of the last
  ``n_bins``     - how many sequences the document spans

This needs a GLOBAL prefix sum over token counts — the one genuinely
sequential ingredient — computed distributed, the same two-pass shape
as graph node-id assignment (solaris_ray/stages/graph.py:66-104):

  1. sort by the order column (Ray range-sort, streaming);
  2. per-block token totals come to the driver (ONE int per block);
  3. each block stamps its rows with ``block_offset + local_cumsum``
     in parallel — rows never leave the cluster.

At 100 TB the driver holds one integer per block (~10^5 ints), not
rows.  The layout is a pure function of the sorted order, so a resumed
or re-partitioned run reproduces identical spans.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa


def pack_sequences(docs, token_col: str = "n_tokens", order_col: str = "doc_id",
                   seq_len: int = 2048):
    """docs: Dataset with (order_col, token_col). Returns one row per doc
    with its packed-span columns (order_col, token_col carried through)."""
    import ray

    ordered = docs.sort(order_col).materialize()
    refs = ordered.to_arrow_refs()  # ordered blocks, still in the object store

    @ray.remote
    def _tok_total(block: pa.Table) -> int:
        if block.num_rows == 0 or token_col not in block.column_names:
            return 0
        return int(block[token_col].to_numpy().sum())

    @ray.remote
    def _stamp(block: pa.Table, offset: int) -> pa.Table:
        if block.num_rows == 0 or token_col not in block.column_names:
            return pa.schema(
                [
                    (order_col, pa.int64()),
                    (token_col, pa.int64()),
                    ("start_tok", pa.int64()),
                    ("bin_first", pa.int64()),
                    ("bin_last", pa.int64()),
                    ("n_bins", pa.int64()),
                ]
            ).empty_table()
        n = block[token_col].to_numpy().astype(np.int64)
        start = offset + np.concatenate([[0], np.cumsum(n)[:-1]])
        end = start + n  # exclusive
        bin_first = start // seq_len
        # empty docs occupy zero tokens: pin their span to the bin at start
        bin_last = np.where(n > 0, (end - 1) // seq_len, bin_first)
        return pa.table(
            {
                order_col: block[order_col],
                token_col: pa.array(n, pa.int64()),
                "start_tok": pa.array(start, pa.int64()),
                "bin_first": pa.array(bin_first, pa.int64()),
                "bin_last": pa.array(bin_last, pa.int64()),
                "n_bins": pa.array(bin_last - bin_first + 1, pa.int64()),
            }
        )

    totals = ray.get([_tok_total.remote(r) for r in refs])
    offsets = np.concatenate([[0], np.cumsum(totals)[:-1]]) if totals else []
    return ray.data.from_arrow_refs(
        [_stamp.remote(r, int(o)) for r, o in zip(refs, offsets)]
    )
