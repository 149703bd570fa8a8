"""Ray Data pipeline tests: streaming validation, uniqueness shuffle,
checkpoint/resume, drift — on sf0.001-derived interleaved docs."""

import json
import os
import shutil

import pyarrow.parquet as pq
import pytest

from joi_ray.pipelines.docs import DEFAULT_STATS, document_schema
from joi_ray.sources.interleaved import asset_catalog, expected_dirty_counts, interleave_batch

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def shard_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("shards")
    t = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    n = t.num_rows
    paths = []
    for i in range(2):
        p = str(d / f"part{i}.parquet")
        pq.write_table(t.slice(i * n // 2, n // 2 + (n % 2) * i), p)
        paths.append(p)
    return paths


def _mk(path):
    import ray.data as rd

    return lambda: rd.read_parquet(path).map_batches(interleave_batch, batch_format="pyarrow")


def _uniq(paths):
    import ray.data as rd

    def f():
        return (
            rd.read_parquet(paths)
            .map_batches(interleave_batch, batch_format="pyarrow")
            .select_columns(["doc_id"])
        )

    return f


def test_validate_ds_streaming(ray_session):
    import ray.data as rd

    from joi_ray.pipelines.validate import validate_ds

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        interleave_batch, batch_format="pyarrow"
    )
    viol = validate_ds(
        ds,
        document_schema(),
        catalog=asset_catalog(),
        ref_path="spans.media_ref",
        concurrency=2,
        batch_size=256,
    )
    rows = viol.take_all()
    exp = expected_dirty_counts(SF)
    from collections import Counter

    codes = Counter(r["code"] for r in rows)
    assert codes["array.min"] == exp["empty_spans"]
    assert codes["referential.missing"] == exp["dangling_ref"]
    assert codes["array.sort"] == exp["non_monotonic"]


def test_full_run_resume_and_drift(ray_session, shard_files, tmp_path):
    from joi_ray.pipelines.validate import validate_dataset

    out_dir = str(tmp_path / "run")
    kwargs = dict(
        schema=document_schema(),
        out_dir=out_dir,
        catalog=asset_catalog(),
        ref_path="spans.media_ref",
        stats_numeric=DEFAULT_STATS["numeric"],
        stats_categorical=DEFAULT_STATS["categorical"],
        stats_id=DEFAULT_STATS["id"],
        unique_ds_factory=_uniq(shard_files),
        batch_size=512,
        concurrency=2,
    )
    factories = [_mk(p) for p in shard_files]
    rep = validate_dataset(factories, **kwargs)
    exp = expected_dirty_counts(SF)
    assert rep.rows == exp["rows"]
    assert rep.codes["referential.missing"] == exp["dangling_ref"]
    assert rep.duplicates >= 1  # hot key + pair dup
    assert not rep.passed
    assert os.path.exists(f"{out_dir}/shard=0000/violations.parquet")
    assert os.path.exists(f"{out_dir}/snapshot.json")

    # resume: completed run re-invoked is a no-op (fast, same numbers)
    import time

    t0 = time.time()
    rep2 = validate_dataset(factories, **kwargs)
    assert time.time() - t0 < 5.0
    assert rep2.rows == rep.rows and rep2.codes == rep.codes

    # partial resume: drop shard 1 from the manifest, rerun -> only shard 1 recomputed
    man_path = f"{out_dir}/_MANIFEST.json"
    man = json.load(open(man_path))
    del man["shards"]["1"]
    json.dump(man, open(man_path, "w"))
    shutil.rmtree(f"{out_dir}/shard=0001")
    rep3 = validate_dataset(factories, **kwargs)
    assert rep3.rows == rep.rows and rep3.failed == rep.failed

    # drift: same distribution vs own snapshot -> below thresholds
    snap = json.load(open(f"{out_dir}/snapshot.json"))
    out2 = str(tmp_path / "run2")
    rep4 = validate_dataset(
        [factories[0]],
        **{**kwargs, "out_dir": out2, "unique_ds_factory": None, "baseline_snapshot": snap},
    )
    assert rep4.drift and all(d.get("ks", 0) < 0.1 and d.get("psi", 0) < 0.1 for d in rep4.drift.values())


def test_uniqueness_pass_hashed_matches_exact(ray_session):
    import ray.data as rd

    from joi_ray.pipelines.validate import uniqueness_pass, uniqueness_pass_hashed

    def factory():
        return (
            rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"])
            .map_batches(interleave_batch, batch_format="pyarrow")
            .select_columns(["doc_id"])
        )

    exact = {(d["doc_id"], d["n"]) for d in uniqueness_pass(factory()).take_all()}
    hashed_res = uniqueness_pass_hashed(factory)
    rows = hashed_res.take_all() if hasattr(hashed_res, "take_all") else hashed_res.to_pylist()
    hashed = {(d["doc_id"], d["n"]) for d in rows}
    assert exact == hashed and len(exact) >= 2

    # semi-join scale path (forced via broadcast_max=0): candidates flow as
    # a Dataset through an inner hash-join instead of a ray.put broadcast —
    # the 10^12-doc shape where a 1% dup rate is an 80 GB candidate array
    semi_res = uniqueness_pass_hashed(factory, broadcast_max=0)
    rows = semi_res.take_all() if hasattr(semi_res, "take_all") else semi_res.to_pylist()
    semi = {(d["doc_id"], d["n"]) for d in rows}
    assert exact == semi


def test_uniqueness_pass_exact(ray_session):
    import ray.data as rd

    from joi_ray.pipelines.validate import uniqueness_pass

    ds = rd.read_parquet(f"{SF}/documents.parquet", columns=["doc_id", "text"]).map_batches(
        interleave_batch, batch_format="pyarrow"
    )
    dups = uniqueness_pass(ds.select_columns(["doc_id"])).take_all()
    exp = expected_dirty_counts(SF)
    by_key = {d["doc_id"]: d["n"] for d in dups}
    from joi_ray.sources.interleaved import HOT_KEY

    assert by_key.get(HOT_KEY) == exp["hot_key_rows"]
    # each m==21 duplicate creates one extra key with count 2
    assert sum(1 for k, v in by_key.items() if v == 2) >= exp["duplicate_doc_id"]


def test_pipeline_warnings_channel(ray_session, shard_files, tmp_path):
    import joi_ray as jr
    from joi_ray.pipelines.validate import validate_dataset
    from joi_ray.sources.interleaved import interleave_batch

    schema = jr.object(
        {
            "doc_id": jr.string(),
            "spans": jr.array().min(3).warn(),  # warn-only rule
        }
    )
    rep = validate_dataset(
        [_mk(shard_files[0])],
        schema=schema,
        out_dir=str(tmp_path / "warnrun"),
        batch_size=512,
    )
    assert rep.warnings.get("array.min", 0) > 0
    assert "array.min" not in rep.codes  # warn-only never counts as failure
    assert rep.failed == 0
