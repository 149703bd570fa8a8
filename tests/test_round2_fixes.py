"""Round-2 regression tests for the ADVICE findings:

1. build() rebuilds schema-valued ``is`` in whens and switch entries, so
   conditions survive the spec_json -> CompiledSchema round trip every
   pipeline path takes (reference lib/manifest.js:217-366 rebuilds all of
   is/then/otherwise).
2. base64 regex fidelity to lib/types/string/index.js:14-24 — padding
   optional (not forbidden) when padding_required=False; '=' tail required
   for url_safe when padding_required=True.
3. when() with a ref condition and no is_/switch raises a clear error
   (reference asserts 'Missing "is" or "switch" option',
   lib/types/alternatives.js:181).
4. validator_fn's worker-side stage cache keys on the FULL configuration,
   not just (spec, prefs, ref_path).
"""

import json

import pyarrow as pa
import pytest

import joi_ray as jr
from helper import check
from joi_ray import compile_schema, object as obj
from joi_ray.spec import build, from_json


def _roundtrip(schema):
    return from_json(schema.to_json())


def test_build_rebuilds_schema_valued_is():
    root = obj(
        {
            "b": jr.number(),
            "a": jr.string().when(
                "b", is_=jr.number().min(5), then=jr.string().required()
            ),
        }
    )
    t = pa.table({"b": [10.0, 1.0], "a": pa.array([None, None], type=pa.string())})
    for s in (root, _roundtrip(root)):
        res = compile_schema(s, prefs={"abort_early": False}).validate_table(t)
        # b=10 matches is (>=5) -> a required -> row 0 fails; b=1 -> row 1 ok
        assert list(res.ok) == [False, True], res.violations.to_pylist()


def test_build_rebuilds_schema_valued_is_in_switch():
    root = obj(
        {
            "b": jr.number(),
            "a": jr.string().when(
                "b",
                switch=[
                    {"is": jr.number().min(5), "then": jr.string().required()},
                    {"is": jr.number().max(0), "then": jr.string().forbidden()},
                ],
            ),
        }
    )
    t = pa.table(
        {
            "b": [10.0, -1.0, 2.0],
            "a": pa.array([None, "x", None], type=pa.string()),
        }
    )
    for s in (root, _roundtrip(root)):
        res = compile_schema(s, prefs={"abort_early": False}).validate_table(t)
        assert list(res.ok) == [False, False, True], res.violations.to_pylist()


def test_build_literal_is_still_literal():
    root = obj(
        {
            "b": jr.string(),
            "a": jr.string().when("b", is_="on", then=jr.string().required()),
        }
    )
    t = pa.table(
        {"b": ["on", "off"], "a": pa.array([None, None], type=pa.string())}
    )
    for s in (root, _roundtrip(root)):
        res = compile_schema(s, prefs={"abort_early": False}).validate_table(t)
        assert list(res.ok) == [False, True]


def test_base64_padding_optional_accepts_padded():
    # padding_required=False means optional, not forbidden (reference
    # nopad regexes carry the (==)?/=? tails)
    check(
        jr.string().base64(padding_required=False),
        [("QQ==", True), ("QQE=", True), ("QQ", True), ("QQE", True), ("Q", False)],
    )
    check(
        jr.string().base64(url_safe=True, padding_required=False),
        [("-_==", True), ("-_", True), ("ab==", True), ("abc=", True), ("+/==", False)],
    )


def test_base64_urlsafe_padding_required_rejects_unpadded():
    check(
        jr.string().base64(url_safe=True),
        [("abcd", True), ("ab==", True), ("abc=", True), ("abc", False), ("ab", False)],
    )


def test_when_missing_is_raises():
    root = obj(
        {"b": jr.string(), "a": jr.string().when("b", then=jr.string().required())}
    )
    with pytest.raises(ValueError, match="is_"):
        compile_schema(root)


def test_stage_cache_key_covers_full_config():
    from joi_ray.pipelines.validate import _stage_key

    base = dict(
        spec_json="{}",
        prefs={"abort_early": True},
        id_column="doc_id",
        ref_path=None,
        catalog_ref=None,
        stats_numeric=["a"],
        stats_categorical=[],
        stats_id=["doc_id"],
    )
    k0 = _stage_key(base)
    assert _stage_key(dict(base, stats_numeric=["b"])) != k0
    assert _stage_key(dict(base, id_column="other")) != k0
    assert _stage_key(dict(base, stats_id=[])) != k0
    assert _stage_key(base) == k0
