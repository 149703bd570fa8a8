"""Text-analysis stages: language ID, quality scoring, token counting,
document fingerprinting.  All vectorized pandas/pyarrow kernels designed for
``map_batches``; the language profiles are compiled once per actor.
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


class LangIdStage:
    """n-gram/stopword-hit language scorer; profiles compiled in __init__."""

    def __init__(self, text_col: str = "text", out_col: str = "lang_pred"):
        import re

        self.text_col, self.out_col = text_col, out_col
        self.patterns = {
            lang: re.compile(r"\b(?:" + "|".join(ws) + r")\b", re.IGNORECASE)
            for lang, ws in STOPWORDS.items()
        }

    def __call__(self, batch: pa.Table) -> pa.Table:
        s = batch[self.text_col].combine_chunks().to_pandas().fillna("")
        n_words = s.str.count(r"\b\w+\b").clip(lower=1)
        scores = np.stack(
            [s.str.count(p).to_numpy(dtype=np.float64) / n_words.to_numpy() for p in self.patterns.values()]
        )
        langs = np.array(list(self.patterns.keys()))
        best = langs[scores.argmax(axis=0)]
        best = np.where(scores.max(axis=0) > 0.01, best, "und")
        return batch.append_column(self.out_col, pa.array(best.astype(object), type=pa.string()))


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality features + composite score: length, punct/digit/upper ratios,
    stopword ratio, mean word length — one vectorized pass."""
    s = batch[text_col].combine_chunks().to_pandas().fillna("")
    n_chars = s.str.len().to_numpy(dtype=np.float64)
    nz = np.maximum(n_chars, 1)
    n_words = s.str.count(r"\b\w+\b").to_numpy(dtype=np.float64)
    punct = s.str.count(r"[^\w\s]").to_numpy(dtype=np.float64) / nz
    digits = s.str.count(r"\d").to_numpy(dtype=np.float64) / nz
    upper = s.str.count(r"[A-Z]").to_numpy(dtype=np.float64) / nz
    stop_re = r"\b(?:" + "|".join(STOPWORDS["en"]) + r")\b"
    stop_ratio = s.str.count(stop_re).to_numpy(dtype=np.float64) / np.maximum(n_words, 1)
    mean_word_len = np.where(n_words > 0, s.str.count(r"\w").to_numpy(dtype=np.float64) / np.maximum(n_words, 1), 0.0)
    # composite: in-range word count, sane punctuation, some stopwords
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


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Whitespace token count + BPE-ish regex token count."""
    s = batch[text_col].combine_chunks().to_pandas().fillna("")
    ws = s.str.split().str.len().to_numpy(dtype=np.int64)
    bpe = s.str.count(TOKEN_REGEX).to_numpy(dtype=np.int64)
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
