"""The flagship interleaved-document validation schema.

Encodes the per-row invariants of the north rule's input
(``BASELINE.json`` input_hint): span-sequence integrity (kind, text,
media_ref, order), id shape, and the kind/text/media_ref consistency rules —
expressed entirely in the joi-derived schema language (conditionals included)
so the whole thing compiles to one vectorized predicate chain.
"""

from __future__ import annotations

from .. import spec as jr

DOC_ID_PATTERN = r"^doc-[0-9a-f]{8}$"
MEDIA_REF_PATTERN = r"^asset://[0-9a-f]{16}$"
SPAN_KINDS = ["text", "image", "audio", "video"]


def document_schema() -> jr.Schema:
    """doc_id + spans schema.  Violation codes produced on the synthetic
    dirty table (sources/interleaved.py): any.required (null id),
    string.pattern.base (malformed id), array.min (empty spans), any.only
    (bogus kind), string.empty / any.required (empty/missing text),
    any.unknown (media_ref on text span / text on media span),
    string.pattern.base (bad ref), array.sort (non-monotonic offset)."""
    span = jr.object(
        {
            "kind": jr.string().required().valid(*SPAN_KINDS),
            "text": jr.string().when(
                "kind",
                is_="text",
                then=jr.string().required().min(1),
                otherwise=jr.string().forbidden(),
            ),
            "media_ref": jr.string().when(
                "kind",
                is_="text",
                then=jr.string().forbidden(),
                otherwise=jr.string().required().pattern(MEDIA_REF_PATTERN),
            ),
            "offset": jr.number().required().integer().min(0),
        }
    )
    return jr.object(
        {
            "doc_id": jr.string().required().pattern(DOC_ID_PATTERN),
            # convert=False pins CHECK mode (engine extension): span-offset
            # monotonicity is a first-class dataset violation here; joi's
            # default would silently re-sort under prefs.convert
            "spans": jr.array().required().min(1).items(span).sort(by="offset", convert=False),
        }
    )


DEFAULT_STATS = {
    "numeric": ["spans.len", "spans.offset"],
    "categorical": ["spans.kind"],
    "id": ["doc_id"],
}
