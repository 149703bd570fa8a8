#!/usr/bin/env bash
# Cluster deployment path (north rule: "submitted via ray job submit on
# fixed multi-node clusters at N and 4N nodes").
#
# This sandbox has no multi-node cluster, so the script is the documented
# recipe rather than a CI-tested path; every flag maps 1:1 onto the CLI
# that IS tested single-node (joi_ray/__main__.py, tests/test_extend_modify
# CLI smoke).  The same job runs unchanged at either cluster size — the
# scaling evidence in BASELINE.md comes from the in-sandbox analog
# (`python bench.py --scaling`, fresh processes at 2 and 8 CPUs).
#
# Usage: RAY_ADDRESS=http://<head>:8265 ./examples/submit_job.sh \
#            s3://bucket/docs.lance s3://bucket/runs/2026-08-17
set -euo pipefail

INPUT=${1:?input table (parquet dir or .lance)}
OUT=${2:?output prefix for violations/stats/manifests}

ray job submit \
  --working-dir . \
  --no-wait \
  -- python -m joi_ray validate \
      --schema examples/flagship_schema.json \
      --input "$INPUT" \
      --out "$OUT" \
      --id-column doc_id \
      --ref-path spans.media_ref \
      --unique-key doc_id \
      --shards 256 \
      --resume
# --resume: a re-submitted job skips shards whose _MANIFEST.json is
# complete (joi_ray/state/checkpoint.py) — per-partition lineage +
# metrics land next to each shard's violations parquet.
