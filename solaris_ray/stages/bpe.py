"""Distributed BPE vocabulary training (Sennrich et al., ACL 2016).

The mandate's token layer counts tokens with "a BPE-ish regex"; this
trains the merge table itself.  The classic trainer shape keeps the
100-TB part cheap:

1. **Word frequencies** — the only corpus-scale pass: whitespace split
   via Arrow ``split_pattern`` + parent-index flatten (the
   split_sentences idiom, no Python row loop), then one
   ``groupby(word).sum(weight)``.  The distinct-word table is
   vocab-sized (millions, not billions) — everything after runs on it.
2. **Merge rounds** over the (symbols, count) table, each fully
   vectorized over the FLAT symbol array:
   - adjacent-pair counting with list-offset math (pairs never cross
     word boundaries), partial per batch + one small groupby;
   - top pair by (count desc, pair asc) — deterministic;
   - merge application as mask arithmetic: exact greedy left-to-right
     non-overlap inside runs of consecutive matches = keep the
     even offsets within each run (run-id cumsum + offset parity),
     then one re-pack of the flat array.
   The per-round table is materialized (the CC-rounds idiom: iterative
   algorithms re-execute their whole history otherwise).

Words carry the standard ``</w>`` end marker as a final symbol, so
merges distinguish word-internal from word-final units.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

END = "</w>"


def word_frequencies(ds, text_col: str = "text"):
    """Corpus -> (word, weight) Dataset: the one corpus-scale pass."""
    def _words(batch: pa.Table) -> pa.Table:
        parts = pc.split_pattern(
            pc.replace_substring_regex(batch[text_col], r"\s+", " "),
            pattern=" ")
        if isinstance(parts, pa.ChunkedArray):
            parts = parts.combine_chunks()
        flat = parts.flatten()
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        return pa.table({"word": flat,
                         "weight": pa.array(np.ones(len(flat), np.int64))})

    return ds.map_batches(_words, batch_format="pyarrow") \
             .groupby("word").sum("weight")


def _to_symbol_rows(batch: pa.Table) -> pa.Table:
    """(word, weight) -> flat symbol rows (wid local to batch handled
    upstream by carrying word strings; symbols start as characters +
    END)."""
    words = batch["word"].to_pylist()
    w = batch["sum(weight)" if "sum(weight)" in batch.column_names
              else "weight"].to_numpy(zero_copy_only=False)
    syms, offs = [], [0]
    for word in words:
        syms.extend(list(word))
        syms.append(END)
        offs.append(len(syms))
    return pa.table(
        {
            "word": batch["word"],
            "weight": pa.array(w.astype(np.int64), pa.int64()),
            "symbols": pa.array(
                [syms[offs[i]:offs[i + 1]] for i in range(len(words))],
                pa.list_(pa.string())),
        }
    )


def _pair_counts(batch: pa.Table) -> pa.Table:
    lists = batch["symbols"]
    if isinstance(lists, pa.ChunkedArray):
        lists = lists.combine_chunks()
    flat = np.asarray(lists.flatten().to_pylist(), dtype=object)
    offsets = lists.offsets.to_numpy(zero_copy_only=False)
    offsets = offsets - offsets[0]  # sliced arrays carry absolute offsets
    w = batch["weight"].to_numpy(zero_copy_only=False)
    if len(flat) == 0:
        return pa.table({"a": pa.array([], pa.string()),
                         "b": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    n = len(flat)
    # adjacent positions that do NOT cross a list boundary
    is_last = np.zeros(n, bool)
    is_last[offsets[1:] - 1] = True
    pos = np.flatnonzero(~is_last[:-1] if n > 1 else np.zeros(0, bool))
    parent = np.searchsorted(offsets, pos, side="right") - 1
    return pa.table(
        {
            "a": pa.array(flat[pos].tolist(), pa.string()),
            "b": pa.array(flat[pos + 1].tolist(), pa.string()),
            "cnt": pa.array(w[parent].astype(np.int64), pa.int64()),
        }
    )


def _apply_merge(a: str, b: str):
    merged = a + b

    def _f(batch: pa.Table) -> pa.Table:
        lists = batch["symbols"]
        if isinstance(lists, pa.ChunkedArray):
            lists = lists.combine_chunks()
        flat = np.asarray(lists.flatten().to_pylist(), dtype=object)
        offsets = lists.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
        offsets = offsets - offsets[0]  # sliced arrays carry absolute offsets
        n = len(flat)
        if n < 2:
            return batch
        is_last = np.zeros(n, bool)
        is_last[offsets[1:] - 1] = True
        m = np.zeros(n, bool)
        cand = np.flatnonzero(~is_last[:-1])
        cand = cand[(flat[cand] == a) & (flat[cand + 1] == b)]
        if len(cand) == 0:
            return batch
        # exact greedy left-to-right inside runs of consecutive
        # matches: run-id by gap breaks, keep even offsets in each run
        runs = np.cumsum(np.r_[True, np.diff(cand) != 1]) - 1
        first = np.r_[True, runs[1:] != runs[:-1]]
        run_start = cand[first][runs]
        keep = ((cand - run_start) % 2) == 0
        sel = cand[keep]
        m[sel] = True
        consumed = np.zeros(n, bool)
        consumed[sel + 1] = True
        out_mask = ~consumed
        new_flat = flat[out_mask].copy()
        # positions of kept matches within the packed array
        packed_idx = np.cumsum(out_mask) - 1
        new_flat[packed_idx[sel]] = merged
        # new offsets: each list shrinks by its consumed count
        consumed_per = np.add.reduceat(consumed.astype(np.int64),
                                       offsets[:-1]) \
            if len(offsets) > 1 else np.zeros(0, np.int64)
        lens = np.diff(offsets) - consumed_per
        new_offsets = np.concatenate([[0], np.cumsum(lens)])
        arr = pa.ListArray.from_arrays(
            pa.array(new_offsets, pa.int32()),
            pa.array(new_flat.tolist(), pa.string()))
        cols = {c: batch[c] for c in batch.column_names if c != "symbols"}
        cols["symbols"] = arr
        return pa.table(cols)

    return _f


def train_bpe(ds, n_merges: int = 30, text_col: str = "text"):
    """-> pa.Table (rank, left, right, pair_count): the merge table.

    Deterministic: top pair by (count desc, (left, right) asc).
    """
    words = word_frequencies(ds, text_col=text_col)
    table = words.map_batches(_to_symbol_rows,
                              batch_format="pyarrow").materialize()
    merges = []
    for rank in range(n_merges):
        counts = (table.map_batches(_pair_counts, batch_format="pyarrow")
                  .groupby(["a", "b"]).sum("cnt"))
        top = counts.to_pandas()
        if top.empty:
            break
        top = top.sort_values(["sum(cnt)", "a", "b"],
                              ascending=[False, True, True])
        row = top.iloc[0]
        if int(row["sum(cnt)"]) < 2:
            break
        merges.append((rank, str(row["a"]), str(row["b"]),
                       int(row["sum(cnt)"])))
        table = table.map_batches(_apply_merge(str(row["a"]), str(row["b"])),
                                  batch_format="pyarrow").materialize()
    return pa.table(
        {
            "rank": pa.array([m[0] for m in merges], pa.int64()),
            "left": pa.array([m[1] for m in merges], pa.string()),
            "right": pa.array([m[2] for m in merges], pa.string()),
            "pair_count": pa.array([m[3] for m in merges], pa.int64()),
        }
    )


def reference_bpe(texts: list[str], n_merges: int = 30):
    """Pure-Python reference twin (tests): must match train_bpe exactly."""
    from collections import Counter

    wc: Counter = Counter()
    for t in texts:
        for w in t.split():
            wc[w] += 1
    words = {w: list(w) + [END] for w in wc}
    merges = []
    for rank in range(n_merges):
        pairs: Counter = Counter()
        for w, syms in words.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += wc[w]
        if not pairs:
            break
        top = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        (a, b), cnt = top
        if cnt < 2:
            break
        merges.append((rank, a, b, cnt))
        for w, syms in words.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            words[w] = out
    return merges
