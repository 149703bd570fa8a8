"""Per-partition checkpoint manifest for resumable validation runs.

The reference has no job-level persistence (SURVEY.md §4) — this is the
north rule's "resume from per-partition checkpoints with lineage + metrics
manifests".  Layout:

    out_dir/
      _MANIFEST.json            # completed shards + lineage + metrics
      shard=0000/violations.parquet
      shard=0000/summary.json   # rows/failed/per-code counts + sketch partials
      ...
      uniqueness/duplicates.parquet
      snapshot.json             # merged column-stats snapshot
      report.json               # final verdict incl. drift

A shard directory is written to ``<dir>.tmp`` and atomically renamed on
completion, so a killed run never leaves a half-shard marked done; resume
skips shards present in the manifest (or with a finalized directory).
"""

from __future__ import annotations

import json
import os
import shutil
import time


class RunManifest:
    def __init__(self, out_dir: str):
        self.out_dir = out_dir
        self.path = os.path.join(out_dir, "_MANIFEST.json")
        os.makedirs(out_dir, exist_ok=True)
        self.state = {"shards": {}, "stages": {}, "created_unix": None}
        if os.path.exists(self.path):
            with open(self.path) as f:
                self.state = json.load(f)

    def _save(self):
        tmp = self.path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(self.state, f, indent=1, sort_keys=True)
        os.replace(tmp, self.path)

    # -- shards -----------------------------------------------------------
    def shard_dir(self, shard_id: int) -> str:
        return os.path.join(self.out_dir, f"shard={shard_id:04d}")

    def shard_done(self, shard_id: int) -> bool:
        return str(shard_id) in self.state["shards"]

    def mark_shard(self, shard_id: int, *, inputs: list[str], metrics: dict):
        self.state["shards"][str(shard_id)] = {
            "inputs": inputs,
            "metrics": metrics,
            "wall_unix": time.time(),
        }
        self._save()

    def finalize_shard_dir(self, shard_id: int, tmp_dir: str):
        final = self.shard_dir(shard_id)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.replace(tmp_dir, final)

    # -- singleton stages (uniqueness, snapshot, drift) --------------------
    def stage_done(self, name: str) -> bool:
        return name in self.state["stages"]

    def mark_stage(self, name: str, metrics: dict):
        self.state["stages"][name] = {"metrics": metrics, "wall_unix": time.time()}
        self._save()

    def completed_shards(self) -> list[int]:
        return sorted(int(k) for k in self.state["shards"])

    def reset(self):
        self.state = {"shards": {}, "stages": {}, "created_unix": None}
        self._save()
