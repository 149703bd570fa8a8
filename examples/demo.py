"""End-to-end demo: infer → tighten → validate → inspect, standalone.

    python examples/demo.py [sf_dir] [out_dir]

Walks the full product loop on the interleaved documents table:
  1. synthesize the interleaved table from the flat fixture
  2. infer a starting schema from a clean sample and print it
  3. tighten it to the hand-written flagship schema
  4. run the full resumable pipeline (shards, uniqueness, sketches, drift)
  5. print the report and the first violations
"""

import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import ray

ray.init(address="local", num_cpus=8, include_dashboard=False,
         ignore_reinit_error=True, logging_level="ERROR")

import pyarrow.parquet as pq  # noqa: E402
import ray.data as rd  # noqa: E402

from joi_ray.infer import infer_schema  # noqa: E402
from joi_ray.pipelines.docs import DEFAULT_STATS, document_schema  # noqa: E402
from joi_ray.pipelines.validate import validate_dataset  # noqa: E402
from joi_ray.sources.interleaved import asset_catalog, interleave_batch  # noqa: E402

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/joi_ray_demo"
shutil.rmtree(out_dir, ignore_errors=True)

flat = pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
docs = interleave_batch(flat)
print(f"== interleaved table: {docs.num_rows} docs, schema:\n{docs.schema}\n")

print("== inferred schema (from data):")
inferred = infer_schema(docs.slice(0, 200))
print(json.dumps(inferred.describe(), indent=1, default=str)[:800], "...\n")

print("== validating with the flagship schema ...")
n = flat.num_rows


def shard(offset, length):
    def f():
        return rd.from_arrow(flat.slice(offset, length)).map_batches(
            interleave_batch, batch_format="pyarrow"
        )

    return f


def uniq():
    return rd.from_arrow(flat).map_batches(interleave_batch, batch_format="pyarrow").select_columns(["doc_id"])


report = validate_dataset(
    [shard(0, n // 2), shard(n // 2, n - n // 2)],
    schema=document_schema(),
    out_dir=out_dir,
    catalog=asset_catalog(),
    ref_path="spans.media_ref",
    stats_numeric=DEFAULT_STATS["numeric"],
    stats_categorical=DEFAULT_STATS["categorical"],
    stats_id=DEFAULT_STATS["id"],
    unique_ds_factory=uniq,
    batch_size=2048,
)
print(json.dumps(report.to_dict(), indent=1, sort_keys=True))

viol = pq.read_table(f"{out_dir}/shard=0000/violations.parquet")
print(f"\n== first violations (of {viol.num_rows} in shard 0):")
print(viol.slice(0, 6).to_pandas()[["doc_id", "path", "item_index", "code", "message"]].to_string(index=False))
print(f"\nartifacts under {out_dir}: shard dirs + _MANIFEST.json + snapshot.json + report.json")
ray.shutdown()
