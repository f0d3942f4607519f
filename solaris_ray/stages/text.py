"""Text-analysis stages over a documents table (training-data ops).

Large-scale training-data pipeline operators the reference lacks but a
100 TB image+caption engine needs (captions ARE text): token counting,
quality scoring, language-ID heuristic, and content fingerprinting.
Everything is vectorized pyarrow.compute over ``batch_format="pyarrow"``
batches; the kernels are written to be bit-identical with ANSI-SQL
equivalents (DuckDB oracle in __ray_entry__.oracle_sql):

- tokens       = regexp-split of trimmed text on ``\\s+``
- n_chars      = UTF-8 character count (``length(text)``)
- stopword counts use RE2 word-boundary patterns (both Arrow and
  DuckDB are RE2-backed, so ``\\bthe\\b`` means the same thing)
- fingerprints = MD5 hex digest (``md5(text)``)

Integer outputs everywhere possible; the only floats are divisions of
integers computed with the same operands on both sides (IEEE-exact).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# language -> discriminative stopword regexes (word-bounded, RE2)
LANG_PATTERNS: dict[str, str] = {
    "de": r"\b(der|die|das|und|nicht)\b",
    "en": r"\b(the|and|of|to|is)\b",
    "es": r"\b(el|los|las|que|y)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "zh": r"[\x{4e00}-\x{9fff}]",  # CJK codepoint presence
}
# DuckDB spelling of the same patterns (RE2 there uses \x{...} too)
LANG_PATTERNS_SQL = LANG_PATTERNS

WORD_SPLIT = r"\s+"
BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def token_counts(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_tokens, n_bpe) — whitespace tokens + BPE-ish pieces.

    n_tokens matches ``length(string_split_regex(trim(text), '\\s+'))``;
    n_bpe matches ``length(regexp_extract_all(text, BPE_ISH))``.
    """
    text = batch[text_col]
    trimmed = pc.utf8_trim_whitespace(text)
    n_tokens = pc.list_value_length(pc.split_pattern_regex(trimmed, WORD_SPLIT))
    n_bpe = pc.count_substring_regex(text, BPE_ISH)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pc.cast(n_tokens, pa.int64()),
            "n_bpe": pc.cast(n_bpe, pa.int64()),
        }
    )


def quality_scores(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_chars, n_tokens, n_nonspace, avg_token_len, stop_ratio).

    The reference has no text ops; these mirror standard corpus-quality
    features (length / mean token length / stopword density).  All
    integers except the two divisions (same operands as the SQL oracle).
    """
    text = batch[text_col]
    n_chars = pc.cast(pc.utf8_length(text), pa.int64())
    trimmed = pc.utf8_trim_whitespace(text)
    n_tokens = pc.cast(
        pc.list_value_length(pc.split_pattern_regex(trimmed, WORD_SPLIT)), pa.int64()
    )
    n_nonspace = pc.cast(
        pc.utf8_length(pc.replace_substring(text, " ", "")), pa.int64()
    )
    n_stop = pc.cast(pc.count_substring_regex(text, LANG_PATTERNS["en"]), pa.int64())
    avg_token_len = pc.divide(pc.cast(n_nonspace, pa.float64()), pc.cast(n_tokens, pa.float64()))
    stop_ratio = pc.divide(pc.cast(n_stop, pa.float64()), pc.cast(n_tokens, pa.float64()))
    return pa.table(
        {
            id_col: batch[id_col],
            "n_chars": n_chars,
            "n_tokens": n_tokens,
            "n_nonspace": n_nonspace,
            "avg_token_len": avg_token_len,
            "stop_ratio": stop_ratio,
        }
    )


def lang_id(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, <per-lang counts>, pred_lang) — n-gram/stopword heuristic.

    pred_lang = argmax of stopword-hit counts, ties broken by language
    code ascending, 'und' (undetermined) when all counts are zero.
    """
    text = batch[text_col]
    counts = {
        lang: pc.cast(pc.count_substring_regex(text, pat), pa.int64()).to_numpy()
        for lang, pat in LANG_PATTERNS.items()
    }
    langs = sorted(counts)
    mat = np.stack([counts[l] for l in langs], axis=1)
    best = np.argmax(mat, axis=1)  # first max = lexicographically smallest lang
    pred = np.asarray(langs, dtype=object)[best]
    pred[mat.max(axis=1) == 0] = "und"
    cols = {id_col: batch[id_col]}
    for l in langs:
        cols[f"hits_{l}"] = pa.array(counts[l], pa.int64())
    cols["pred_lang"] = pa.array(pred.tolist(), pa.string())
    return pa.table(cols)


def repetition_stats(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """Gopher-style repetition features per document.

    (doc_id, n_tokens, n_distinct_tokens, dup_token_frac, n_bigrams,
    top_bigram_n, top_bigram_frac, max_run) — the repetition-removal
    signals from Rae et al. 2021 (Gopher, §A1.1): duplicate-token mass,
    most-frequent-bigram mass, and the longest consecutive same-token
    run.  Everything is integer counts (fractions are IEEE divisions of
    the same integers the SQL oracle divides); the heavy lifting is
    Arrow C++ group_by over the flattened token lists — no Python loop
    over rows or tokens.
    """
    text = pc.utf8_trim_whitespace(batch.column(text_col).combine_chunks())
    toks = pc.split_pattern_regex(text, WORD_SPLIT)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    n_tok = pc.list_value_length(toks).to_numpy().astype(np.int64)
    n = len(toks)
    rows = np.repeat(np.arange(n, dtype=np.int64), n_tok)
    flat = pc.list_flatten(toks)

    # distinct tokens per row (C++ hash aggregation)
    g = (
        pa.table({"r": pa.array(rows), "v": flat})
        .group_by(["r"])
        .aggregate([("v", "count_distinct")])
    )
    n_distinct = np.zeros(n, dtype=np.int64)
    n_distinct[g["r"].to_numpy()] = g["v_count_distinct"].to_numpy()

    # top bigram count per row: join adjacent tokens within a row
    adj = rows[1:] == rows[:-1] if len(rows) > 1 else np.zeros(0, dtype=bool)
    left = flat.slice(0, max(len(flat) - 1, 0))
    right = flat.slice(1)
    bigrams = pc.filter(
        pc.binary_join_element_wise(left, right, " "), pa.array(adj)
    )
    brows = rows[:-1][adj] if len(rows) > 1 else rows[:0]
    top_bigram = np.zeros(n, dtype=np.int64)
    if len(bigrams):
        g2 = (
            pa.table({"r": pa.array(brows), "b": bigrams})
            .group_by(["r", "b"])
            .aggregate([([], "count_all")])
        )
        g3 = g2.group_by(["r"]).aggregate([("count_all", "max")])
        top_bigram[g3["r"].to_numpy()] = g3["count_all_max"].to_numpy()

    # longest consecutive equal-token run per row
    max_run = np.zeros(n, dtype=np.int64)
    if len(rows):
        same = (
            adj & pc.equal(left, right).to_numpy(zero_copy_only=False)
            if len(rows) > 1
            else np.zeros(0, dtype=bool)
        )
        starts = np.flatnonzero(np.concatenate(([True], ~same)))
        run_len = np.diff(np.concatenate((starts, [len(rows)])))
        np.maximum.at(max_run, rows[starts], run_len)

    n_bigrams = np.maximum(n_tok - 1, 0)
    with np.errstate(divide="ignore", invalid="ignore"):
        dup_frac = np.where(n_tok > 0, (n_tok - n_distinct) / n_tok, 0.0)
        top_frac = np.where(n_bigrams > 0, top_bigram / n_bigrams, 0.0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_tokens": pa.array(n_tok),
            "n_distinct_tokens": pa.array(n_distinct),
            "dup_token_frac": pa.array(dup_frac, pa.float64()),
            "n_bigrams": pa.array(n_bigrams),
            "top_bigram_n": pa.array(top_bigram),
            "top_bigram_frac": pa.array(top_frac, pa.float64()),
            "max_run": pa.array(max_run),
        }
    )


# PII patterns (RE2 — identical semantics in Arrow and DuckDB, both
# RE2-backed: leftmost match, non-overlapping global replace)
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[-. ][0-9]{3,4}[-. ][0-9]{4}"
IPV4_RE = r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}"


def pii_scrub(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, n_emails, n_phones, n_ips, clean_fp) — PII redaction.

    Sequential scrub: emails -> ``<EMAIL>``, then phone-shaped numbers
    -> ``<PHONE>``, then IPv4 literals -> ``<IP>``; each stage counts
    matches on ITS input (post-prior-scrub), mirroring the SQL oracle's
    staged ``regexp_replace(..., 'g')``.  ``clean_fp`` is the MD5 of the
    fully scrubbed text so the gate hash covers the rewritten bytes,
    not just the counts.  All regex work is RE2 in Arrow C++.
    """
    t0 = batch.column(text_col).combine_chunks()
    n_emails = pc.cast(pc.count_substring_regex(t0, EMAIL_RE), pa.int64())
    t1 = pc.replace_substring_regex(t0, EMAIL_RE, "<EMAIL>")
    n_phones = pc.cast(pc.count_substring_regex(t1, PHONE_RE), pa.int64())
    t2 = pc.replace_substring_regex(t1, PHONE_RE, "<PHONE>")
    n_ips = pc.cast(pc.count_substring_regex(t2, IPV4_RE), pa.int64())
    t3 = pc.replace_substring_regex(t2, IPV4_RE, "<IP>")
    fps = [hashlib.md5(v.encode("utf-8")).hexdigest() for v in t3.to_pylist()]
    return pa.table(
        {
            id_col: batch[id_col],
            "n_emails": n_emails,
            "n_phones": n_phones,
            "n_ips": n_ips,
            "clean_fp": pa.array(fps, pa.string()),
        }
    )


def boolean_search(ds, terms: list[str], text_col: str = "text",
                   id_col: str = "doc_id"):
    """Conjunctive (AND) term search: docs containing EVERY query term.

    Output (doc_id, n_hits): n_hits = total occurrences of query terms.
    Pure streaming filter — the tiny query set is captured in the
    closure (broadcast once per task), NO shuffle; the scale shape of
    an inverted-index probe when the query side is small.
    """
    terms_arr = np.asarray(sorted(set(terms)), object)
    n_terms = len(terms_arr)
    out_schema = pa.schema([(id_col, pa.int64()), ("n_hits", pa.int64())])

    def _probe(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return out_schema.empty_table()
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(batch[text_col]), WORD_SPLIT
        )
        flat = pc.list_flatten(toks).to_numpy(zero_copy_only=False)
        parent = pc.list_parent_indices(toks).to_numpy(zero_copy_only=False)
        m = np.isin(flat, terms_arr)
        hits = np.bincount(parent[m], minlength=n).astype(np.int64)
        distinct = np.zeros(n, np.int64)
        for t in terms_arr:
            distinct += np.bincount(parent[flat == t], minlength=n) > 0
        keep = distinct == n_terms
        ids = pc.cast(batch[id_col], pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                id_col: pa.array(ids[keep], pa.int64()),
                "n_hits": pa.array(hits[keep], pa.int64()),
            }
        )

    return ds.map_batches(_probe, batch_format="pyarrow", batch_size=1024)


def md5_fingerprint(batch: pa.Table, text_col: str = "text", id_col: str = "doc_id") -> pa.Table:
    """(doc_id, fp) — MD5 content fingerprint, hex lowercase.

    hashlib has no vectorized form; the per-row loop is a C-call per
    row (digest cost dominates), acceptable for a fingerprint stage.
    """
    vals = batch[text_col].to_pylist()
    fps = [hashlib.md5(v.encode("utf-8")).hexdigest() for v in vals]
    return pa.table({id_col: batch[id_col], "fp": pa.array(fps, pa.string())})


def winnow_fingerprints(
    batch: pa.Table,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 5,
    window: int = 4,
) -> pa.Table:
    """(doc_id, n_grams, n_fps, min_fp) — winnowing document fingerprint.

    Rolling polynomial hash (base 1000003, mod 2^64) over k-grams of
    UNICODE CODEPOINTS, then the winnowing rule (min hash per sliding
    window, dedup'd) — the standard document-fingerprint sketch
    (Schleimer et al., SIGMOD'03).  Codepoints (not UTF-8 bytes) so the
    DuckDB oracle can reproduce the hashes exactly via unicode().
    """
    np.seterr(over="ignore")  # uint64 wraparound IS the hash ring
    B = np.uint64(1000003)
    texts = batch[text_col].to_pylist()
    n_grams_out, n_fps_out, min_fp_out = [], [], []
    powk = B ** np.uint64(k - 1)
    for t in texts:
        b = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32).astype(np.uint64)
        if len(b) < k:
            n_grams_out.append(0)
            n_fps_out.append(0)
            min_fp_out.append(0)
            continue
        # rolling hash h[i+1] = (h[i] - b[i]*B^(k-1)) * B + b[i+k]
        n = len(b) - k + 1
        h = np.zeros(n, dtype=np.uint64)
        acc = np.uint64(0)
        for j in range(k):  # k is tiny (5); the long axis is vectorized below
            acc = acc * B + b[j]
        h[0] = acc
        if n > 1:
            # vectorized roll: prefix products trick via cumulative update
            heads = b[: n - 1] * powk
            tails = b[k:]
            for i in range(1, n):  # O(n) scalar ops on uint64 — still cheap vs hashing libs
                acc = (acc - heads[i - 1]) * B + tails[i - 1]
                h[i] = acc
        if n >= window:
            from numpy.lib.stride_tricks import sliding_window_view

            mins = sliding_window_view(h, window).min(axis=1)
            fps = np.unique(mins)
        else:
            fps = np.unique(h.min(keepdims=True))
        n_grams_out.append(n)
        n_fps_out.append(len(fps))
        min_fp_out.append(int(fps.min()) if len(fps) else 0)
    return pa.table(
        {
            id_col: batch[id_col],
            "n_grams": pa.array(n_grams_out, pa.int64()),
            "n_fps": pa.array(n_fps_out, pa.int64()),
            "min_fp": pa.array(np.asarray(min_fp_out, dtype=np.uint64).astype(np.int64), pa.int64()),
        }
    )


def split_sentences(batch: pa.Table, sep: str = ". ",
                    text_col: str = "text",
                    id_col: str = "doc_id") -> pa.Table:
    """Sentence segmentation: one output row per sentence, fully
    vectorized — ``pc.split_pattern`` builds the list column and the
    flatten uses Arrow's parent-index kernel, no Python loop over
    rows.  The separator is a literal (RE2/`re` dialect differences
    don't exist for literals, so the SQL oracle's string_split is an
    exact twin).  Emits (doc_id, sent_idx, sentence, n_chars).
    """
    parts = pc.split_pattern(batch[text_col], pattern=sep)
    if isinstance(parts, pa.ChunkedArray):
        parts = parts.combine_chunks()
    flat = parts.flatten()
    parent = pc.list_parent_indices(parts)
    # per-list positional index: global arange minus each list's start
    offsets = parts.offsets.to_numpy(zero_copy_only=False)
    starts = offsets[:-1]
    idx = np.arange(len(flat), dtype=np.int64) - np.repeat(
        starts, np.diff(offsets))
    ids = batch[id_col].take(parent)
    return pa.table(
        {
            id_col: ids,
            "sent_idx": pa.array(idx, pa.int64()),
            "sentence": flat,
            "n_chars": pc.utf8_length(flat),
        }
    )


def feature_hash_counts(batch: pa.Table, n_buckets: int = 64,
                        text_col: str = "text",
                        id_col: str = "doc_id") -> pa.Table:
    """Hashing-trick vectorizer: (doc_id, bucket, cnt) sparse rows.

    bucket = little-endian low 8 bytes of md5(token) mod ``n_buckets``
    — the same md5 idiom as ``hash_split``, so a SQL twin reproduces
    the buckets exactly.  Hashing runs once per DISTINCT token in the
    batch (corpora repeat tokens heavily), then a lexsort-segment pass
    counts (doc, bucket) pairs; no per-row Python in the fan-out.
    """
    trimmed = pc.utf8_trim_whitespace(batch[text_col])
    toks = pc.split_pattern_regex(trimmed, WORD_SPLIT)
    flat = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    lengths = pc.list_value_length(flat).to_numpy(zero_copy_only=False)
    ids = batch[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
    doc_of = np.repeat(ids, lengths)
    words = flat.flatten().to_numpy(zero_copy_only=False)
    if words.size == 0:
        return pa.schema(
            [(id_col, pa.int64()), ("bucket", pa.int64()), ("cnt", pa.int64())]
        ).empty_table()
    uniq, inv = np.unique(words, return_inverse=True)
    ub = np.fromiter(
        (int.from_bytes(hashlib.md5(str(w).encode()).digest()[:8], "little")
         % n_buckets for w in uniq),
        np.int64, count=uniq.size,
    )
    bucket = ub[inv]
    o = np.lexsort((bucket, doc_of))
    d, b = doc_of[o], bucket[o]
    new = np.r_[True, (d[1:] != d[:-1]) | (b[1:] != b[:-1])]
    seg = np.cumsum(new) - 1
    cnt = np.bincount(seg).astype(np.int64)
    starts = np.flatnonzero(new)
    return pa.table(
        {
            id_col: pa.array(d[starts], pa.int64()),
            "bucket": pa.array(b[starts], pa.int64()),
            "cnt": pa.array(cnt, pa.int64()),
        }
    )
