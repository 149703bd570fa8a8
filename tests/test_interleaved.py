"""Interleaved-document synthesis: determinism, dirt placement, and the
span-sequence equality invariant (kind, text, media_ref, order) under
different batch splits — the per-row invariant from BASELINE.json."""

import pyarrow as pa
import pyarrow.parquet as pq

from joi_ray.engine import CompiledSchema
from joi_ray.pipelines.docs import document_schema
from joi_ray.sources.interleaved import (
    HOT_KEY,
    asset_catalog,
    expected_dirty_counts,
    interleave_batch,
)

SF = "/root/testdata/sf0.001"


def _flat():
    return pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])


def test_deterministic_and_split_invariant():
    t = _flat()
    full = interleave_batch(t)
    again = interleave_batch(t)
    assert full.equals(again)
    # batch-split invariance: concat of per-slice outputs == whole-table output
    parts = [interleave_batch(t.slice(i, 100)) for i in range(0, t.num_rows, 100)]
    joined = pa.concat_tables(parts).combine_chunks()
    assert joined.equals(full.combine_chunks())


def test_span_sequence_equality_invariant():
    """kind/text/media_ref/order of every span is a pure function of the row."""
    t = _flat()
    full = interleave_batch(t)
    row = full.slice(3, 1)
    spans = row["spans"].to_pylist()[0]
    offsets = [s["offset"] for s in spans]
    assert offsets == sorted(offsets)
    for i, s in enumerate(spans):
        if s["kind"] == "text":
            assert s["media_ref"] is None and s["text"] is not None
        elif s["kind"] in ("image", "audio", "video"):
            assert s["text"] is None and s["media_ref"].startswith("asset://")


def test_dirty_counts_match_expectations():
    t = _flat()
    docs = interleave_batch(t)
    exp = expected_dirty_counts(SF)
    cs = CompiledSchema(document_schema().describe(), {"abort_early": False}, "doc_id")
    res = cs.validate_table(docs)
    codes = res.summary()["codes"]
    assert codes.get("any.required", 0) >= exp["null_doc_id"]       # null ids
    assert codes.get("string.pattern.base", 0) >= exp["malformed_doc_id"]
    assert codes.get("array.min", 0) == exp["empty_spans"]
    assert codes.get("array.sort", 0) == exp["non_monotonic"]
    assert codes.get("any.only", 0) == exp["bogus_kind"]
    # dangling refs are NOT schema violations (pattern-valid) — referential stage finds them
    ids = docs["doc_id"].to_pylist()
    assert ids.count(HOT_KEY) == exp["hot_key_rows"]


def test_catalog_closed_pool():
    cat = asset_catalog()
    refs = set(cat["media_ref"].to_pylist())
    docs = interleave_batch(_flat())
    import pyarrow.compute as pc

    flat = pc.list_flatten(docs["spans"].combine_chunks())
    media = [r for r in pc.struct_field(flat, "media_ref").to_pylist() if r is not None]
    dangling = [r for r in media if r not in refs]
    exp = expected_dirty_counts(SF)
    assert len(dangling) == exp["dangling_ref"]
    assert all(r.startswith("asset://dead") for r in dangling)


def test_ids_only_read_matches_full(ray_session):
    """The column-pruned doc_id-only path must produce exactly the full
    path's doc_id column (pruning is an optimization, not a semantic)."""
    from joi_ray.sources.interleaved import read_interleaved

    full = read_interleaved(SF, repeat=3).select_columns(["doc_id"]).take_all()
    pruned = read_interleaved(SF, columns=["doc_id"], repeat=3).take_all()
    assert [r["doc_id"] for r in full] == [r["doc_id"] for r in pruned]
