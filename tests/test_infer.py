"""Schema inference: the inferred schema must validate its own sample
cleanly and round-trip through the manifest."""

import pyarrow as pa
import pyarrow.parquet as pq

import joi_ray as jr
from joi_ray.infer import infer_schema, infer_schema_ds
from joi_ray.sources.interleaved import interleave_batch

SF = "/root/testdata/sf0.01"


def test_infer_flat_documents():
    t = pq.read_table(f"{SF}/documents.parquet")
    s = infer_schema(t)
    d = s.describe()
    assert d["keys"]["lang"]["allow"] == ["de", "en", "es", "fr", "zh"]
    assert d["keys"]["doc_id"]["flags"]["presence"] == "required"
    assert "integer" in [r["name"] for r in d["keys"]["doc_id"].get("rules", [])]
    assert jr.build(d) == s
    res = jr.compile_schema(s, prefs={"abort_early": False}).validate_table(t)
    assert res.n_failed == 0, res.summary()


def test_infer_nested_interleaved_self_validates():
    docs = interleave_batch(pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"]))
    s = infer_schema(docs)
    d = s.describe()
    assert d["keys"]["spans"]["type"] == "array"
    assert d["keys"]["spans"]["items"][0]["type"] == "object"
    res = jr.compile_schema(s, prefs={"abort_early": False}).validate_table(docs)
    assert res.n_failed == 0, res.summary()


def test_infer_catches_new_dirt():
    t = pq.read_table(f"{SF}/documents.parquet")
    s = infer_schema(t)
    bad = pa.table(
        {
            "doc_id": pa.array([10**9], pa.int64()),       # beyond observed max
            "text": pa.array(["x"]),                        # below observed min length
            "lang": pa.array(["xx"]),                       # outside enum
            "source": pa.array(["srcX"]),
            "n_chars": pa.array([1], pa.int64()),
        }
    )
    res = jr.compile_schema(s, prefs={"abort_early": False}).validate_table(bad)
    codes = {v["code"] for v in res.violations.to_pylist()}
    assert {"number.max", "string.min", "any.only"} <= codes


def test_infer_from_dataset(ray_session):
    import ray.data as rd

    ds = rd.read_parquet(f"{SF}/documents.parquet")
    s = infer_schema_ds(ds)
    t = pq.read_table(f"{SF}/documents.parquet")
    res = jr.compile_schema(s, prefs={"abort_early": False}).validate_table(t)
    assert res.n_failed == 0
