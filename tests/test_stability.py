"""Byte-stability of violation output across parallelism / batching
(FIXTURES.md determinism rules: results must be identical for the N vs 4N
runs and independent of batch boundaries)."""

import pyarrow as pa
import pyarrow.parquet as pq

from joi_ray.pipelines.docs import document_schema
from joi_ray.pipelines.validate import validate_ds
from joi_ray.sources.interleaved import asset_catalog, interleave_batch

SF = "/root/testdata/sf0.001"


def _violation_rows(ray_session, batch_size, concurrency):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        interleave_batch, batch_format="pyarrow"
    )
    viol = validate_ds(
        ds,
        document_schema(),
        catalog=asset_catalog(),
        ref_path="spans.media_ref",
        concurrency=concurrency,
        batch_size=batch_size,
    )
    rows = viol.take_all()
    key = lambda v: (
        v["doc_id"] or "",
        v["path"],
        v["code"],
        v["item_index"],
        v["severity"],
        v["message"],
    )
    return sorted(map(key, rows))


def test_violations_stable_across_batching(ray_session):
    a = _violation_rows(ray_session, batch_size=64, concurrency=1)
    b = _violation_rows(ray_session, batch_size=2048, concurrency=3)
    assert a == b and len(a) > 0


def test_engine_convert_sort_stable():
    """convert-mode sort output equals per-row python sort (order invariant)."""
    import joi_ray as jr

    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    docs = interleave_batch(t)
    schema = jr.object(
        {"doc_id": jr.string(), "spans": jr.array().sort(by="offset", convert=True).sparse()}
    )
    res = jr.compile_schema(schema, prefs={"allow_unknown": True}).validate_table(docs)
    out = res.value["spans"].to_pylist()
    for row in out[:50]:
        if row:
            offs = [s["offset"] for s in row]
            assert offs == sorted(offs)
