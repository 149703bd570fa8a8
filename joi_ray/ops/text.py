"""Text-analysis stages: language ID, quality scoring, token counting,
document fingerprinting.  All kernels are Arrow C++ (RE2) — pandas
``str.count`` is a hidden Python-regex loop and was 5-10x slower; the
language profiles compile once per actor.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

# tiny per-language stopword profiles (public common-word lists)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "que", "pour"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "für"],
    "es": ["el", "la", "los", "de", "y", "un", "una", "es", "que", "para"],
    "it": ["il", "la", "di", "e", "un", "una", "che", "per", "non", "con"],
}

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^\sA-Za-z0-9]"  # BPE-ish pre-tokenizer split
_WORD = r"\b\w+\b"


def _count(arr: pa.Array, pattern: str) -> np.ndarray:
    return pc.count_substring_regex(arr, pattern).to_numpy(zero_copy_only=False).astype(np.float64)


class LangIdStage:
    """Stopword-hit language scorer; patterns built once per actor, counted
    with Arrow's RE2 engine per batch."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        self.text_col, self.out_col = text_col, out_col
        self.patterns = {
            lang: r"(?i)\b(?:" + "|".join(ws) + r")\b" for lang, ws in STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch[self.text_col].combine_chunks(), "")
        n_words = np.maximum(_count(s, _WORD), 1.0)
        scores = np.stack([_count(s, p) / n_words for p in self.patterns.values()])
        langs = np.array(list(self.patterns.keys()))
        best = langs[scores.argmax(axis=0)]
        best = np.where(scores.max(axis=0) > 0.01, best, "und")
        return batch.append_column(self.out_col, pa.array(best.astype(object), type=pa.string()))


_LANGID_CACHE: dict = {}


def lang_id_batch(batch: pa.Table, text_col: str = "text", out_col: str = "lang_pred") -> pa.Table:
    """Task-mode language ID: per-worker cached stage (no actor pool)."""
    key = (text_col, out_col)
    stage = _LANGID_CACHE.get(key)
    if stage is None:
        stage = LangIdStage(text_col, out_col)
        _LANGID_CACHE[key] = stage
    return stage(batch)


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality features + composite score: length, punct/digit/upper ratios,
    stopword ratio, mean word length — one vectorized Arrow pass."""
    s = pc.fill_null(batch[text_col].combine_chunks(), "")
    n_chars = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(np.float64)
    nz = np.maximum(n_chars, 1)
    n_words = _count(s, _WORD)
    punct = _count(s, r"[^\w\s]") / nz
    digits = _count(s, r"\d") / nz
    upper = _count(s, r"[A-Z]") / nz
    stop_ratio = _count(s, r"(?i)\b(?:" + "|".join(STOPWORDS["en"]) + r")\b") / np.maximum(n_words, 1)
    mean_word_len = np.where(n_words > 0, _count(s, r"\w") / np.maximum(n_words, 1), 0.0)
    score = (
        np.clip(n_words / 100.0, 0, 1) * 0.4
        + np.clip(1 - punct * 4, 0, 1) * 0.2
        + np.clip(stop_ratio * 5, 0, 1) * 0.2
        + np.clip(1 - digits * 5, 0, 1) * 0.1
        + ((mean_word_len > 2) & (mean_word_len < 12)).astype(np.float64) * 0.1
    )
    out = batch
    for name, v in [
        ("n_chars_q", n_chars.astype(np.int64)),
        ("n_words", n_words.astype(np.int64)),
        ("punct_ratio", punct),
        ("digit_ratio", digits),
        ("upper_ratio", upper),
        ("stopword_ratio", stop_ratio),
        ("mean_word_len", mean_word_len),
        ("quality_score", score),
    ]:
        out = out.append_column(name, pa.array(v))
    return out


def repetition_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Gopher-style repetition signals (Rae et al. 2021 §A1.1), one
    vectorized pass: per-doc token count, distinct-token count, most-
    frequent-token count, bigram count and distinct-bigram count.  All
    outputs are exact integers so downstream filters (dup-word fraction,
    top-token fraction, dup-bigram fraction) are integer-arithmetic
    comparisons — SQL-mirrorable with no float-rounding hazard.

    Scale shape: tokens explode batch-locally (Arrow split + one
    factorize), per-(doc, token) counts come from a single C-speed pandas
    groupby over integer codes, and nothing leaves the batch but five
    int64 columns — per-doc state only, no corpus-wide structures."""
    s = pc.fill_null(batch[text_col].combine_chunks(), "")
    lists = pc.split_pattern(s, " ")  # keeps empties — mirrors SQL string_split
    n = len(s)
    counts = pc.list_value_length(lists).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(lists)
    doc_idx = np.repeat(np.arange(n, dtype=np.int64), counts)
    codes = pd.factorize(flat.to_pandas(), sort=False)[0].astype(np.int64)

    per = pd.DataFrame({"d": doc_idx, "c": codes}).groupby(["d", "c"], sort=False).size()
    by_doc = per.groupby(level=0)
    nd_tok = by_doc.size().reindex(np.arange(n), fill_value=0).to_numpy()
    top_tok = by_doc.max().reindex(np.arange(n), fill_value=0).to_numpy()

    same = doc_idx[1:] == doc_idx[:-1]
    bdoc = doc_idx[:-1][same]
    vocab = int(codes.max()) + 1 if len(codes) else 1
    bkey = codes[:-1][same] * vocab + codes[1:][same]
    n_bg = np.bincount(bdoc, minlength=n).astype(np.int64)
    if len(bdoc):
        nd_bg = (
            pd.DataFrame({"d": bdoc, "k": bkey}).groupby("d", sort=False)["k"].nunique()
            .reindex(np.arange(n), fill_value=0).to_numpy()
        )
    else:
        nd_bg = np.zeros(n, dtype=np.int64)

    out = batch
    for name, v in [
        ("n_tok", counts),
        ("n_distinct_tok", nd_tok.astype(np.int64)),
        ("top_tok_n", top_tok.astype(np.int64)),
        ("n_bigram", n_bg),
        ("n_distinct_bigram", nd_bg.astype(np.int64)),
    ]:
        out = out.append_column(name, pa.array(v))
    return out


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count (\\S+ runs) + BPE-ish regex token count."""
    s = pc.fill_null(batch[text_col].combine_chunks(), "")
    ws = _count(s, r"\S+").astype(np.int64)
    bpe = _count(s, TOKEN_REGEX).astype(np.int64)
    return batch.append_column("ws_tokens", pa.array(ws)).append_column("bpe_tokens", pa.array(bpe))


def fingerprint_batch(batch: pa.Table, text_col: str = "text", *, normalize: bool = True) -> pa.Table:
    """64-bit content fingerprint of (optionally whitespace-normalized,
    lowercased) text — the exact-dedup / lineage key."""
    col = batch[text_col].combine_chunks()
    if normalize:
        col = pc.utf8_lower(pc.utf8_trim_whitespace(col))
        col = pc.replace_substring_regex(col, r"\s+", " ")
    s = col.to_pandas()
    h = pd.util.hash_pandas_object(s, index=False).to_numpy(dtype=np.uint64)
    return batch.append_column("fingerprint", pa.array(h.astype(np.int64)))


def token_top_k(ds, text_col: str = "text", *, k: int = 20, lowercase: bool = True):
    """Corpus-wide top-k token frequencies — the canonical vocabulary sweep.

    Scale shape: tokens explode batch-locally with Arrow's RE2 extractor,
    collapse to per-batch (token, count) partials (bounded by per-batch
    vocabulary, not token occurrences), reduce with ONE native groupby-sum
    keyed on token, and take the global top-k with a tiny sort.  No Python
    loops, no corpus-sized driver state — the only all-to-all sees the
    vocabulary, pre-compressed ~occurrences/vocab-fold by the partials."""
    import pyarrow as pa
    from ray.data.aggregate import Sum

    from .._env import REMOTE_KWARGS

    def partials(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch[text_col].combine_chunks(), "")
        if lowercase:
            s = pc.utf8_lower(s)
        flat = pc.list_flatten(pc.split_pattern_regex(s, r"\W+"))
        flat = flat.filter(pc.greater(pc.utf8_length(flat), 0))
        vc = pc.value_counts(flat)
        return pa.table({
            "token": vc.field("values"),
            "partial_n": pc.cast(vc.field("counts"), pa.int64()),
        })

    p = ds.map_batches(partials, batch_format="pyarrow", **REMOTE_KWARGS)
    totals = p.groupby("token").aggregate(Sum("partial_n", alias_name="n"))
    top = totals.sort(["n", "token"], descending=[True, False]).limit(k)
    return top.map_batches(
        lambda t: pa.table({"token": t["token"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow", **REMOTE_KWARGS)


def _doc_shingles(batch: pa.Table, text_col: str, id_col: str, n: int):
    """Distinct per-doc token n-gram strings -> (row_index, shingle) numpy/
    arrow pair.  Vectorized: one split, n shifted slices of the flat token
    array joined element-wise, a boundary mask, one drop_duplicates."""
    s = pc.fill_null(batch[text_col].combine_chunks(), "")
    toks = pc.split_pattern(s, " ")
    lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    L = len(flat)
    if L < n:
        return np.empty(0, np.int64), pa.array([], pa.string())
    doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), lens)
    m = L - n + 1
    parts = [flat.slice(j, m) for j in range(n)]
    sh = pc.binary_join_element_wise(*parts, " ")
    valid = doc_idx[:m] == doc_idx[n - 1:]
    g = pd.DataFrame({"d": doc_idx[:m][valid],
                      "s": sh.filter(pa.array(valid)).to_pandas()}).drop_duplicates()
    return g["d"].to_numpy(), pa.array(g["s"], pa.string())


def ngram_contamination(train_ds, bench_ds, text_col: str = "text",
                        id_col: str = "doc_id", *, n: int = 4):
    """Benchmark-overlap decontamination: per train doc, the number of
    distinct token ``n``-grams it shares with ANY benchmark document
    (rows with 0 shared are dropped).  At realistic n (>= 4 here, >= 8-13
    in published pipelines) chance collisions vanish, so surviving rows
    are true contamination events — near/exact copies of benchmark items.

    Scale contract: the BENCH side is benchmark-sized (tiny vs the
    corpus) — its distinct shingle set is collected once and broadcast
    via ``ray.put``; the train side streams, each batch resolving
    membership with one ``is_in`` against the shared set.  Exact strings
    (not hashes) are compared, so an oracle can reproduce the result."""
    import ray

    from .._env import REMOTE_KWARGS

    def bench_partial(batch: pa.Table) -> pa.Table:
        _, sh = _doc_shingles(batch, text_col, id_col, n)
        return pa.table({"s": pc.unique(sh)})

    blocks = [t for t in ray.get(
        bench_ds.map_batches(bench_partial, batch_format="pyarrow", **REMOTE_KWARGS)
        .to_arrow_refs()) if t.num_rows]  # 0-row Ray blocks carry no schema
    if not blocks:
        blocks = [pa.table({"s": pa.array([], pa.string())})]
    bench_set = pc.unique(pa.concat_tables(blocks)["s"].combine_chunks())
    bref = ray.put(bench_set)

    def flag(batch: pa.Table) -> pa.Table:
        bset = ray.get(bref)
        d, sh = _doc_shingles(batch, text_col, id_col, n)
        hit = pc.is_in(sh, value_set=bset).to_numpy(zero_copy_only=False)
        counts = np.bincount(d[hit], minlength=batch.num_rows).astype(np.int64)
        keep = np.flatnonzero(counts > 0)
        # a doc is one row, so each batch's per-doc count is already exact
        return pa.table({
            id_col: batch[id_col].combine_chunks().take(pa.array(keep)),
            "n_shared": pa.array(counts[keep]),
        })

    return train_ds.map_batches(flag, batch_format="pyarrow", **REMOTE_KWARGS)


def keyword_search(ds, terms, text_col: str = "text", id_col: str = "doc_id", *,
                   k: int = 10):
    """Top-k documents by total query-term token count (integer-exact
    relevance; ties break by ``id_col`` ascending).

    Scale shape: the term list broadcasts with the stage closure (bytes,
    not a shuffle); each batch computes scores with one split + ``is_in``
    + ``bincount`` and keeps only its LOCAL top-k, so the final
    distributed sort sees k x n_batches candidate rows, never the
    corpus."""
    from .._env import REMOTE_KWARGS

    term_set = pa.array(sorted(set(terms)), pa.string())

    def local_topk(batch: pa.Table) -> pa.Table:
        s = pc.fill_null(batch[text_col].combine_chunks(), "")
        toks = pc.split_pattern(s, " ")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        flat = pc.list_flatten(toks)
        hit = pc.is_in(flat, value_set=term_set).to_numpy(zero_copy_only=False)
        doc_idx = np.repeat(np.arange(len(s), dtype=np.int64), lens)
        score = np.bincount(doc_idx[hit], minlength=len(s)).astype(np.int64)
        keep = np.flatnonzero(score > 0)
        ids = batch[id_col].combine_chunks().take(pa.array(keep))
        sc = score[keep]
        order = np.lexsort((ids.to_numpy(zero_copy_only=False), -sc))[:k]
        return pa.table({id_col: ids.take(pa.array(order)),
                         "score": pa.array(sc[order])})

    cand = ds.map_batches(local_topk, batch_format="pyarrow", **REMOTE_KWARGS)
    return cand.sort(["score", id_col], descending=[True, False]).limit(k)


def tfidf_top_terms(ds, text_col: str = "text", id_col: str = "doc_id", *,
                    k: int = 3, min_df: int = 1):
    """Per-document top-k terms by tf-idf (idf = ln(n_docs / df)).

    Scale shape: ONE tokenize pass emits the (doc, term, tf) relation
    (materialized — consumed twice, each doc's rows contiguous within a
    block); df reduces that relation with per-batch (term, doc-count)
    partials into one vocabulary-sized groupby-sum (the token_top_k
    pattern); the df vocabulary (df >= min_df) is broadcast ONCE via
    ray.put and each tf block computes scores + an exact per-doc top-k
    locally with batch_size=None (block == tokenize-task output, so a
    doc's terms never split across the scoring batches).  Ties break by
    (score DESC, term ASC).  min_df > 1 bounds the broadcast at scale by
    dropping ultra-rare terms from ranking — a cap the caller opts into
    (min_df=1 drops nothing)."""
    import ray
    from ray.data.aggregate import Sum

    from .._env import REMOTE_KWARGS

    def tf_rows(batch: pa.Table) -> pa.Table:
        s = pc.utf8_lower(pc.fill_null(batch[text_col].combine_chunks(), ""))
        toks = pc.split_pattern_regex(s, r"\W+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False)
        flat = pc.list_flatten(toks)
        docpos = np.repeat(np.arange(len(s), dtype=np.int64), lens)
        keep = pc.greater(pc.utf8_length(flat), 0).to_numpy(zero_copy_only=False)
        g = (pd.DataFrame({"d": docpos[keep],
                           "term": flat.filter(pa.array(keep)).to_pandas()})
             .groupby(["d", "term"], sort=True).size().reset_index(name="tf"))
        ids = batch[id_col].combine_chunks().take(pa.array(g["d"].to_numpy()))
        return pa.table({
            id_col: ids,
            "term": pa.array(g["term"], pa.string()),
            "tf": pa.array(g["tf"].to_numpy().astype(np.int64)),
        })

    id_type = ds.schema().types[ds.schema().names.index(id_col)]
    tf_ds = ds.map_batches(tf_rows, batch_format="pyarrow", **REMOTE_KWARGS).materialize()
    n_docs = ds.count()

    def df_partials(t: pa.Table) -> pa.Table:
        vc = pc.value_counts(t["term"].combine_chunks())
        return pa.table({
            "term": vc.field("values"),
            "partial_df": pc.cast(vc.field("counts"), pa.int64()),
        })

    from .._env import collect_tables

    df_tbl = collect_tables(
        tf_ds.map_batches(df_partials, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("term").aggregate(Sum("partial_df", alias_name="df")),
        schema=pa.schema([("term", pa.string()), ("df", pa.int64())]))
    if min_df > 1:
        df_tbl = df_tbl.filter(pc.greater_equal(df_tbl["df"], min_df))
    vref = ray.put((df_tbl["term"].combine_chunks(),
                    df_tbl["df"].combine_chunks()))

    def score_topk(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({id_col: pa.array([], id_type),
                             "term": pa.array([], pa.string()),
                             "tfidf": pa.array([], pa.float64())})
        keys, dfs = ray.get(vref)
        idx = pc.index_in(t["term"].combine_chunks(), value_set=keys)
        dfv = pc.cast(dfs.take(idx), pa.float64()).to_numpy(zero_copy_only=False)
        tf = t["tf"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore"):
            score = tf * np.log(n_docs / dfv)  # nan for min_df-dropped terms
        pdf = pd.DataFrame({
            "i": np.arange(t.num_rows, dtype=np.int64),
            "s": score,
        }).dropna(subset=["s"])
        # per-doc exact top-k: rows of one doc are contiguous in the block
        did = t[id_col].combine_chunks().to_pandas()
        pdf["doc"] = did.iloc[pdf["i"]].to_numpy()
        pdf["term"] = t["term"].combine_chunks().to_pandas().iloc[pdf["i"]].to_numpy()
        pdf = pdf.sort_values(["doc", "s", "term"], ascending=[True, False, True],
                              kind="stable")
        top = pdf.groupby("doc", sort=False).head(k)
        take = pa.array(top["i"].to_numpy())
        return pa.table({
            id_col: t[id_col].combine_chunks().take(take),
            "term": t["term"].combine_chunks().take(take),
            "tfidf": pa.array(top["s"].to_numpy(), pa.float64()),
        })

    return tf_ds.map_batches(score_topk, batch_format="pyarrow",
                             batch_size=None, **REMOTE_KWARGS)


def chunk_documents(ds, text_col: str = "text", id_col: str = "doc_id", *,
                    size: int = 256, stride: int | None = None):
    """Split documents into overlapping token-window chunks — the training
    data prep step before packing/tokenization.  Chunk ``g`` of a doc covers
    whitespace tokens ``[g*stride, g*stride+size)``; chunks are emitted while
    ``g*stride < n_tokens`` (the final ragged window included), an empty or
    whitespace-only doc emits none.  Fully vectorized: a flat token gather
    (np.arange offset trick, overlap duplicated) feeds one ListArray +
    ``pc.binary_join`` — no Python loop over rows or chunks.  Streaming
    flat-map shape: output rows ≈ input x (n/stride), each batch
    independent, so 100 TB chunks the same way sf0.001 does."""
    if stride is None:
        stride = size
    assert size >= 1 and 1 <= stride <= size, "need 1 <= stride <= size"

    def chunks(batch: pa.Table) -> pa.Table:
        ids = batch[id_col].combine_chunks()
        s = pc.utf8_trim_whitespace(pc.fill_null(batch[text_col].combine_chunks(), ""))
        toks = pc.split_pattern_regex(s, r"\s+")
        lens = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
        empty = pc.equal(pc.utf8_length(s), 0).to_numpy(zero_copy_only=False)
        n_i = np.where(empty, 0, lens)
        c_i = np.where(n_i == 0, 0, (np.maximum(n_i, 1) - 1) // stride + 1)
        total_c = int(c_i.sum())
        if total_c == 0:
            return pa.table({id_col: pa.array([], ids.type),
                             "chunk_idx": pa.array([], pa.int64()),
                             "chunk_text": pa.array([], pa.string()),
                             "n_tokens": pa.array([], pa.int64())})
        doc_rep = np.repeat(np.arange(len(ids), dtype=np.int64), c_i)
        coff = np.concatenate([[0], np.cumsum(c_i)[:-1]])
        chunk_idx = np.arange(total_c, dtype=np.int64) - np.repeat(coff, c_i)
        tok_start = chunk_idx * stride
        tok_end = np.minimum(tok_start + size, n_i[doc_rep])
        out_lens = tok_end - tok_start
        flat = pc.list_flatten(toks)
        # flat token base offset of each doc within the batch
        base = np.concatenate([[0], np.cumsum(lens)[:-1]])
        ooff = np.concatenate([[0], np.cumsum(out_lens)[:-1]])
        idx = (np.arange(int(out_lens.sum()), dtype=np.int64)
               - np.repeat(ooff, out_lens)
               + np.repeat(base[doc_rep] + tok_start, out_lens))
        taken = flat.take(pa.array(idx))
        offsets = np.concatenate([[0], np.cumsum(out_lens)]).astype(np.int32)
        lst = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), taken)
        text_out = pc.binary_join(lst, " ")
        return pa.table({
            id_col: ids.take(pa.array(doc_rep)),
            "chunk_idx": pa.array(chunk_idx),
            "chunk_text": text_out,
            "n_tokens": pa.array(out_lens),
        })

    from .._env import REMOTE_KWARGS

    return ds.map_batches(chunks, batch_format="pyarrow", **REMOTE_KWARGS)
