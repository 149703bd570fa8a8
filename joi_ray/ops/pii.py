"""PII detection and redaction — the scrubbing stage of a training-data
pipeline (emails, IPv4 addresses, phone numbers).

All kernels run on Arrow's RE2 engine (`count_substring_regex` /
`replace_substring_regex`) so a 100-TB corpus never leaves vectorized C++,
and — because DuckDB's regexp functions are RE2 too — an oracle can
recompute every count and redaction with the *same pattern strings*
(leftmost, non-overlapping match semantics are identical engine-to-engine).

Scale shape: a stateless one-pass ``map_batches`` — no shuffle, no driver
state, no per-row Python.  Redaction is applied in a fixed category order
(email, ipv4, phone) so results are deterministic and the replacement
tokens (``[EMAIL]`` etc., letter-only) can never create a new match for a
later category.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# RE2-safe patterns (no lookaround) shared verbatim with the SQL oracle.
# Order matters: redaction applies top-to-bottom.
PII_PATTERNS: dict[str, tuple[str, str]] = {
    "email": (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    "ipv4": (r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "[IPV4]"),
    "phone": (r"\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b", "[PHONE]"),
}


def pii_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append per-category match counts (``n_email`` / ``n_ipv4`` /
    ``n_phone``, int64) — one RE2 pass per category."""
    s = pc.fill_null(batch[text_col].combine_chunks(), "")
    out = batch
    for name, (pat, _) in PII_PATTERNS.items():
        c = pc.count_substring_regex(s, pat)
        out = out.append_column(f"n_{name}", pc.cast(c, pa.int64()))
    return out


def pii_redact_batch(
    batch: pa.Table, text_col: str = "text", out_col: str = "text_redacted"
) -> pa.Table:
    """Append the scrubbed text (every category replaced, fixed order) and
    its length (``redacted_len``, int64)."""
    s = pc.fill_null(batch[text_col].combine_chunks(), "")
    for pat, repl in PII_PATTERNS.values():
        s = pc.replace_substring_regex(s, pat, repl)
    out = batch.append_column(out_col, s)
    return out.append_column("redacted_len", pc.cast(pc.utf8_length(s), pa.int64()))


def pii_scrub(ds, text_col: str = "text"):
    """Dataset form: counts + redacted text + lengths in one stateless map
    (the cleaning-mode stage — downstream writes ``text_redacted``)."""
    from .._env import REMOTE_KWARGS

    def stage(t: pa.Table) -> pa.Table:
        return pii_redact_batch(pii_batch(t, text_col), text_col)

    return ds.map_batches(stage, batch_format="pyarrow", **REMOTE_KWARGS)
