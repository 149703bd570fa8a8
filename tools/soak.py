"""Full-pipeline soak at 6M docs (~24M spans): schema + referential +
sketches + uniqueness + drift snapshot through ``validate_dataset`` with
checkpointed shards, then a resume no-op check.

Reuses bench.py's cached interleaved table (sf0.1 x repeat) so repeated
soaks measure the pipeline, not synthesis.  Prints ONE JSON line:

    {"metric": "soak_docs_per_sec", "rows": ..., "sec": ..., ...}

Usage:  python tools/soak.py            # 6M docs, 8 shards, 32 CPUs
        GRAFT_REPEAT=240 RAY_GRAFT_CPUS=16 python tools/soak.py
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    num_cpus = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
    sf_dir = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeat = int(os.environ.get("GRAFT_REPEAT", "1200"))  # 5k docs x 1200 = 6M
    shards = int(os.environ.get("GRAFT_SHARDS", "8"))

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)

    import pyarrow.parquet as pq
    import ray.data as rd

    from joi_ray.pipelines.docs import DEFAULT_STATS, document_schema
    from joi_ray.sources.interleaved import asset_catalog, read_interleaved
    from joi_ray.pipelines.validate import validate_dataset

    # same cache bench.py builds (marker-completed, resumable)
    cache_dir = f"/tmp/graft_interleaved/{os.path.basename(sf_dir.rstrip('/'))}_r{repeat}"
    marker = os.path.join(cache_dir, "_DONE")
    if not os.path.exists(marker):
        shutil.rmtree(cache_dir, ignore_errors=True)
        read_interleaved(sf_dir, repeat=repeat,
                         override_num_blocks=num_cpus * 4).write_parquet(cache_dir)
        open(marker, "w").write("ok")
    files = sorted(glob.glob(f"{cache_dir}/*.parquet"))
    n_docs = sum(pq.read_metadata(f).num_rows for f in files)
    groups = [files[i::shards] for i in range(shards)]
    groups = [g for g in groups if g]

    def factory(paths):
        def f():
            return rd.read_parquet(paths, columns=["doc_id", "spans"])

        f.inputs = paths
        return f

    def uniq():
        return rd.read_parquet(files, columns=["doc_id"])

    out_dir = "/tmp/joiray_soak_out"
    shutil.rmtree(out_dir, ignore_errors=True)

    t0 = time.time()
    rep = validate_dataset(
        [factory(g) for g in groups],
        schema=document_schema(),
        out_dir=out_dir,
        catalog=asset_catalog(),
        ref_path="spans.media_ref",
        stats_numeric=DEFAULT_STATS["numeric"],
        stats_categorical=DEFAULT_STATS["categorical"],
        stats_id=DEFAULT_STATS["id"],
        unique_ds_factory=uniq,
        resume=False,
    )
    sec = time.time() - t0

    # resume no-op: a second run over the completed manifest must skip all
    # shard work
    t1 = time.time()
    validate_dataset(
        [factory(g) for g in groups],
        schema=document_schema(),
        out_dir=out_dir,
        catalog=asset_catalog(),
        ref_path="spans.media_ref",
        stats_numeric=DEFAULT_STATS["numeric"],
        stats_categorical=DEFAULT_STATS["categorical"],
        stats_id=DEFAULT_STATS["id"],
        unique_ds_factory=None,  # shard-resume path is what's under test
        resume=True,
    )
    resume_sec = time.time() - t1

    print(json.dumps({
        "metric": "soak_docs_per_sec",
        "rows": n_docs,
        "shards": len(groups),
        "num_cpus": num_cpus,
        "sec": round(sec, 2),
        "docs_per_sec": round(n_docs / sec, 1),
        "resume_noop_sec": round(resume_sec, 2),
        "failed_rows": int(rep.failed),
        "duplicate_keys": int(rep.duplicates),
        "duplicate_rows_excess": int(rep.duplicate_rows_excess),
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
