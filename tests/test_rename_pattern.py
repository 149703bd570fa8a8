"""object.rename options (regex/multiple/alias/override/ignoreUndefined,
template targets) and object.pattern exclusive/matches conformance
(reference: /root/reference/lib/types/object.js:387-415,886-967 for rename;
:340-369,970-1041 for pattern)."""

import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj
from joi_ray.spec import from_json


def _run(root, tbl, prefs=None):
    return compile_schema(root, prefs={"abort_early": False, **(prefs or {})}).validate_table(tbl)


# ----------------------------------------------------------------- rename
def test_rename_plain_table_level():
    root = obj({"b": jr.number().required()}).rename("a", "b")
    res = _run(root, pa.table({"a": [1.0, 2.0]}))
    assert list(res.ok) == [True, True]
    assert res.value.column_names == ["b"]


def test_rename_alias_keeps_source():
    root = obj({"a": jr.number(), "b": jr.number().required()}).rename("a", "b", alias=True)
    res = _run(root, pa.table({"a": [1.0]}))
    assert list(res.ok) == [True]
    assert set(res.value.column_names) == {"a", "b"}


def test_rename_override_required():
    # target exists and override not set -> object.rename.override
    root = obj({"b": jr.number()}).rename("a", "b")
    res = _run(root, pa.table({"a": [1.0], "b": [9.0]}))
    assert list(res.ok) == [False]
    codes = [v["code"] for v in res.violations.to_pylist()]
    assert "object.rename.override" in codes

    root2 = obj({"b": jr.number()}).rename("a", "b", override=True)
    res2 = _run(root2, pa.table({"a": [1.0], "b": [9.0]}))
    assert list(res2.ok) == [True]
    # override: target takes the source value wholesale
    assert res2.value["b"].to_pylist() == [1.0]


def test_rename_multiple_required():
    root = obj({"c": jr.number()}).rename("a", "c", override=True).rename("b", "c", override=True)
    res = _run(root, pa.table({"a": [1.0], "b": [2.0]}))
    codes = [v["code"] for v in res.violations.to_pylist()]
    assert "object.rename.multiple" in codes

    root2 = (obj({"c": jr.number()})
             .rename("a", "c", override=True)
             .rename("b", "c", override=True, multiple=True))
    res2 = _run(root2, pa.table({"a": [1.0], "b": [2.0]}))
    assert list(res2.ok) == [True]
    assert res2.value["c"].to_pylist() == [2.0]  # last rename wins


def test_rename_ignore_undefined_rowwise():
    # rows with null source keep the existing target value
    root = obj({"b": jr.number()}).rename("a", "b", override=True, ignore_undefined=True)
    res = _run(root, pa.table({"a": [1.0, None], "b": [9.0, 9.0]}))
    assert list(res.ok) == [True, True]
    assert res.value["b"].to_pylist() == [1.0, 9.0]


def test_rename_regex_with_template_target():
    root = obj({"col_x": jr.number().required()}).rename(
        r"^legacy_(\w+)$", "col_{#1}", regex=True)
    res = _run(root, pa.table({"legacy_x": [1.0]}))
    assert list(res.ok) == [True]
    assert res.value.column_names == ["col_x"]


def test_rename_regex_template_roundtrips_json():
    root = obj({"col_x": jr.number().required()}).rename(
        r"^legacy_(\w+)$", "col_{#1}", regex=True)
    rt = from_json(root.to_json())
    res = _run(rt, pa.table({"legacy_x": [2.0]}))
    assert list(res.ok) == [True]
    assert res.value.column_names == ["col_x"]


def test_rename_struct_level():
    span = jr.object({"b": jr.number().required()}).rename("a", "b")
    root = obj({"s": span})
    t = pa.table({"s": pa.array([{"a": 5.0}], type=pa.struct([("a", pa.float64())]))})
    res = _run(root, t)
    assert list(res.ok) == [True]
    assert res.value["s"].type.field(0).name == "b"


def test_rename_struct_regex_template():
    span = jr.object({"kind": jr.string()}).rename(r"^old_(.*)$", "{#1}", regex=True)
    root = obj({"s": span})
    t = pa.table({"s": pa.array([{"old_kind": "x"}], type=pa.struct([("old_kind", pa.string())]))})
    res = _run(root, t)
    assert list(res.ok) == [True]
    assert res.value["s"].type.field(0).name == "kind"


# ----------------------------------------------------------------- pattern
def test_pattern_multiple_match_chain():
    # both patterns apply to the same key (no exclusive): both constraints hold
    root = (obj({"id": jr.number()})
            .pattern(r"^m_", jr.number().min(0))
            .pattern(r"_x$", jr.number().max(10)))
    res = _run(root, pa.table({"id": [1.0], "m_a_x": [5.0]}))
    assert list(res.ok) == [True]
    res2 = _run(root, pa.table({"id": [1.0], "m_a_x": [50.0]}))
    assert list(res2.ok) == [False]
    assert any(v["code"] == "number.max" for v in res2.violations.to_pylist())
    res3 = _run(root, pa.table({"id": [1.0], "m_a_x": [-5.0]}))
    assert any(v["code"] == "number.min" for v in res3.violations.to_pylist())


def test_pattern_exclusive_stops_chain():
    root = (obj({"id": jr.number()})
            .pattern(r"^m_", jr.number().min(0), exclusive=True)
            .pattern(r"_x$", jr.number().max(10)))
    # second pattern would reject 50, but exclusive first match short-circuits
    res = _run(root, pa.table({"id": [1.0], "m_a_x": [50.0]}))
    assert list(res.ok) == [True]


def test_pattern_matches_key_set_schema():
    # the ARRAY OF MATCHED KEYS must satisfy the matches schema
    root = obj({"id": jr.number()}).pattern(
        r"^p_", jr.number(), matches=jr.array().min(2))
    res = _run(root, pa.table({"id": [1.0], "p_a": [1.0]}))
    assert list(res.ok) == [False]
    assert any(v["code"] == "object.pattern.match" for v in res.violations.to_pylist())
    res2 = _run(root, pa.table({"id": [1.0], "p_a": [1.0], "p_b": [2.0]}))
    assert list(res2.ok) == [True]


def test_pattern_options_roundtrip_json():
    root = (obj({"id": jr.number()})
            .pattern(r"^p_", jr.number(), matches=jr.array().min(2), exclusive=True))
    rt = from_json(root.to_json())
    res = _run(rt, pa.table({"id": [1.0], "p_a": [1.0]}))
    assert any(v["code"] == "object.pattern.match" for v in res.violations.to_pylist())
