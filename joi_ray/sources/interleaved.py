"""Deterministic synthesis of the interleaved text+media documents table.

``BASELINE.json`` input_hint mandates the engine's primary input shape:

    doc_id: string
    spans:  list<struct<kind: string, text: string, media_ref: string, offset: int32>>

The sandbox testdata only has a *flat* documents table, so we derive the
interleaved table from it with a fully deterministic, per-row (hence
partition-parallel, seed-free) transform — every value is a pure function of
the flat row's integer ``doc_id`` and ``text``.  Dirt is injected at known
residues of the id (FIXTURES.md §1) so expectations are computable in SQL and
in tests.  At 100 TB the real input would be read directly
(``ray.data.read_lance`` / ``read_parquet``); this module then disappears
from the hot path.

Dirt rules (id m = doc_id % 1000):
    m == 7   -> doc_id null
    m == 13  -> malformed doc_id ("DOC_<n>")
    m == 21  -> duplicate doc_id (uses id-1's doc_id)
    id % 100 == 99 -> hot duplicate key "doc-00hotkey" (~1% of rows; exercises salting)
    m == 29  -> empty spans
    m == 35  -> first span kind = "bogus"
    m == 41  -> first text span has empty text
    m == 47  -> first media span ref outside the asset catalog
    m == 53  -> non-monotonic offset (second span offset = 0... swapped)
"""

from __future__ import annotations

from .._env import REMOTE_KWARGS
import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

SPAN_TYPE = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)
DOC_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", pa.list_(SPAN_TYPE))])

ASSET_POOL_SIZE = 4096
HOT_KEY = "doc-ffffffff"  # hex-valid (passes the id pattern) but outside any generated id range
MEDIA_KINDS = np.array(["image", "audio", "video"])


def _pool_refs() -> np.ndarray:
    """The closed asset-catalog ref pool: asset://<hex16>, deterministic."""
    j = np.arange(ASSET_POOL_SIZE, dtype=np.uint64)
    h = (j * np.uint64(0x9E3779B97F4A7C15)) ^ np.uint64(0xD1B54A32D192ED03)
    return np.array([f"asset://{int(x):016x}" for x in h])


_POOL = _pool_refs()
_POOL_ARR = pa.array(_POOL, type=pa.string())
_MEDIA_KINDS_ARR = pa.array(MEDIA_KINDS, type=pa.string())


def asset_catalog(missing_fraction: float = 0.0) -> pa.Table:
    """The referential-check small side (FIXTURES.md §2).  The catalog holds
    the full pool; dirty docs reference out-of-pool refs, which is what the
    referential stage flags."""
    n = ASSET_POOL_SIZE
    kinds = MEDIA_KINDS[np.arange(n) % 3]
    sizes = ((np.arange(n, dtype=np.int64) * 2654435761) % 10_000_000) + 1024
    return pa.table({"media_ref": _POOL, "kind": kinds, "size": sizes})


def interleave_batch(batch: pa.Table, repeat: int = 1) -> pa.Table:
    """Flat (doc_id:int64, text:string) -> interleaved (doc_id:string, spans).

    Fully vectorized: numpy index arithmetic builds the flat span arrays and
    a single ListArray.from_arrays assembles the column — no per-row Python.

    ``repeat`` expands each flat row into ``repeat`` documents with distinct
    ids (``id*repeat + r``) — the deterministic scale-up used by bench.py to
    simulate large corpora from the small fixture (dirt rules apply to the
    expanded id, so dirty fractions stay constant).
    """
    ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
    text = pc.fill_null(batch["text"].combine_chunks(), "")
    if repeat > 1:
        ids = (ids[:, None] * repeat + np.arange(repeat, dtype=np.int64)).reshape(-1)
        text = text.take(pa.array(np.repeat(np.arange(len(batch), dtype=np.int64), repeat)))
    n = len(ids)
    m = ids % 1000

    # span count per row: 2..6, deterministic; dirty m==29 -> 0 spans
    n_spans = (2 + (ids % 5)).astype(np.int64)
    n_spans[m == 29] = 0

    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(n_spans, out=offsets[1:])
    total = int(offsets[-1])

    rep_id = np.repeat(ids, n_spans)
    rep_m = rep_id % 1000
    pos = np.arange(total, dtype=np.int64) - np.repeat(offsets[:-1], n_spans)

    # interleave: even positions text, odd positions media (Arrow kernels)
    is_text = (pos % 2) == 0
    kind_arr = pc.if_else(
        pa.array(is_text),
        pa.scalar("text"),
        _MEDIA_KINDS_ARR.take(pa.array(((rep_id >> np.int64(2)) + pos) % 3)),
    )
    # dirt: bogus kind on first span
    kind_arr = pc.if_else(pa.array((rep_m == 35) & (pos == 0)), pa.scalar("bogus"), kind_arr)

    # text content: prefix of the source text + span ordinal — all Arrow C++
    # kernels (np.char.* are hidden Python loops; avoid in the hot path)
    prefix = pc.utf8_slice_codeunits(text, 0, 48)
    rep_prefix = prefix.take(pa.array(np.repeat(np.arange(len(prefix), dtype=np.int64), n_spans)))
    pos_str = pc.cast(pa.array(pos), pa.string())
    span_text_arr = pc.binary_join_element_wise(rep_prefix, pos_str, " #")
    # null out media positions; empty-text dirt on first span of m==41 rows
    empty_dirt = (rep_m == 41) & (pos == 0)
    span_text_arr = pc.if_else(pa.array(empty_dirt), pa.scalar(""), span_text_arr)
    span_text_arr = pc.if_else(pa.array(is_text | empty_dirt), span_text_arr, pa.nulls(total, pa.string()))

    # media refs from the closed pool (Arrow take on a prebuilt pool array)
    pool_idx = ((rep_id * 7 + pos * 13) % ASSET_POOL_SIZE).astype(np.int64)
    media_ref_arr = _POOL_ARR.take(pa.array(pool_idx))
    media_ref_arr = pc.if_else(pa.array(is_text), pa.nulls(total, pa.string()), media_ref_arr)
    # dirt: out-of-catalog ref on the first media span (pos==1)
    dangling = (rep_m == 47) & (pos == 1)
    if dangling.any():
        repl = pa.array([f"asset://dead{int(i):012x}" for i in rep_id[dangling]], type=pa.string())
        media_ref_arr = pc.replace_with_mask(media_ref_arr, pa.array(dangling), repl)

    # offsets: monotonically increasing within a row
    off = (pos * 17 + (rep_id % 7)).astype(np.int32)
    # dirt: non-monotonic — zero out the second span's offset
    off[(rep_m == 53) & (pos == 2)] = 0

    flat = pa.StructArray.from_arrays(
        [
            kind_arr.combine_chunks() if isinstance(kind_arr, pa.ChunkedArray) else kind_arr,
            span_text_arr.combine_chunks() if isinstance(span_text_arr, pa.ChunkedArray) else span_text_arr,
            media_ref_arr.combine_chunks() if isinstance(media_ref_arr, pa.ChunkedArray) else media_ref_arr,
            pa.array(off, type=pa.int32()),
        ],
        fields=list(SPAN_TYPE),
    )
    spans = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int64()).cast(pa.int32()), flat)

    # doc_id string + dirt
    doc_id = np.array([f"doc-{int(i):08x}" for i in ids], dtype=object)
    doc_id[m == 13] = np.array([f"DOC_{int(i)}" for i in ids[m == 13]], dtype=object)
    dup = m == 21
    doc_id[dup] = np.array([f"doc-{int(i - 1):08x}" for i in ids[dup]], dtype=object)
    doc_id[ids % 100 == 99] = HOT_KEY
    doc_id[m == 7] = None

    return pa.table({"doc_id": pa.array(doc_id, type=pa.string()), "spans": spans})


def read_interleaved(sf_dir: str, *, columns: list[str] | None = None, repeat: int = 1,
                     override_num_blocks: int | None = None, docs_per_batch: int = 8192):
    """Ray Dataset of interleaved documents derived from the flat testdata
    table.  ``columns`` prunes the *output* (doc_id-only reads skip span
    construction entirely — the analog of column pruning on a real table).

    IMPORTANT batching unit: map_batches counts *flat input* rows, and each
    flat row expands to ``repeat`` documents — so the map batch_size is
    ``docs_per_batch/repeat`` flat rows, or one task would bundle the whole
    table and serialize the pipeline."""
    import ray.data as rd

    src_cols = ["doc_id"] if columns == ["doc_id"] else ["doc_id", "text"]
    kw = {"override_num_blocks": override_num_blocks} if override_num_blocks else {}
    bs = max(16, docs_per_batch // max(repeat, 1))
    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=src_cols, **kw)
    if columns == ["doc_id"]:

        def ids_only(batch: pa.Table) -> pa.Table:
            ids = batch["doc_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
            if repeat > 1:
                ids = (ids[:, None] * repeat + np.arange(repeat, dtype=np.int64)).reshape(-1)
            m = ids % 1000
            doc_id = np.array([f"doc-{int(i):08x}" for i in ids], dtype=object)
            doc_id[m == 13] = np.array([f"DOC_{int(i)}" for i in ids[m == 13]], dtype=object)
            dup = m == 21
            doc_id[dup] = np.array([f"doc-{int(i - 1):08x}" for i in ids[dup]], dtype=object)
            doc_id[ids % 100 == 99] = HOT_KEY
            doc_id[m == 7] = None
            return pa.table({"doc_id": pa.array(doc_id, type=pa.string())})

        return ds.map_batches(ids_only, batch_format="pyarrow", batch_size=bs, **REMOTE_KWARGS)
    out = ds.map_batches(lambda b: interleave_batch(b, repeat), batch_format="pyarrow", batch_size=bs, **REMOTE_KWARGS)
    if columns:
        out = out.select_columns(columns)
    return out


def expected_dirty_counts(sf_dir: str, repeat: int = 1) -> dict:
    """Driver-side oracle: exact dirty-row counts by rule, computed from the
    flat id column only (cheap, duckdb-friendly)."""
    import pyarrow.parquet as pq

    ids = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"])["doc_id"].to_numpy()
    if repeat > 1:
        ids = (ids[:, None] * repeat + np.arange(repeat, dtype=np.int64)).reshape(-1)
    m = ids % 1000
    return {
        "null_doc_id": int((m == 7).sum()),
        "malformed_doc_id": int((m == 13).sum()),
        "duplicate_doc_id": int((m == 21).sum()),
        "hot_key_rows": int((ids % 100 == 99).sum()),
        "empty_spans": int((m == 29).sum()),
        "bogus_kind": int(((m == 35) & (m != 29)).sum()),
        "empty_text": int((m == 41).sum()),
        "dangling_ref": int((m == 47).sum()),
        "non_monotonic": int((m == 53).sum()),
        "rows": len(ids),
    }
