"""any-type base modifiers: presence, value sets, default/failover, empty,
strip/raw, warnings, custom messages
(reference: /root/reference/test/base.js, ~178 cases)."""

import pyarrow as pa

import joi_ray as jr
from helper import check
from joi_ray import compile_schema, object as obj


def test_presence():
    check(jr.string().required(), [("x", True), (None, False, "any.required")])
    check(jr.string().optional(), [(None, True), ("x", True)])
    check(jr.string().forbidden(), [(None, True), ("x", False, "any.unknown")])
    # aliases
    assert jr.string().exist().flags["presence"] == "required"


def test_allow_valid_invalid():
    check(jr.string().allow("z").min(5), [("z", True), ("abc", False, "string.min")])
    check(jr.string().valid("a", "b"), [("a", True), ("c", False, "any.only")])
    check(jr.string().invalid("bad"), [("bad", False, "any.invalid"), ("ok", True)])
    # allow(None) permits missing even under required
    check(jr.string().required().allow(None), [(None, True), ("x", True)])


def test_default_failover():
    res = check(jr.string().default("dflt"), [(None, True), ("x", True)])
    assert res.value["x"].to_pylist() == ["dflt", "x"]
    res = check(jr.number().min(10).failover(0), [(5.0, True), (11.0, True)])
    assert res.value["x"].to_pylist() == [0.0, 11.0]  # failed row replaced, error cleared


def test_empty():
    check(jr.string().empty("").required(), [("", False, "any.required"), ("x", True)])
    res = check(jr.string().empty("N/A").default("?"), [("N/A", True)])
    assert res.value["x"].to_pylist() == ["?"]


def test_empty_schema_matcher():
    s = jr.string().empty(jr.string().pattern(r"^\s*$")).default("D")
    res = check(s, [("   ", True), ("keep", True), ("", True)])
    assert res.value["x"].to_pylist() == ["D", "keep", "D"]
    from joi_ray import build

    assert build(s.describe()) == s


def test_strip_raw():
    schema = obj({"a": jr.string().strip(), "b": jr.string().lowercase().raw()})
    res = compile_schema(schema).validate_table(pa.table({"a": ["x"], "b": ["ABC"]}))
    assert res.value.column_names == ["b"]
    assert res.value["b"].to_pylist() == ["ABC"]  # raw: original, though validated lowercased


def test_warnings_channel():
    res = check(jr.string().min(3).warn(), [("ab", True)])  # warn -> row still ok
    v = res.violations.to_pylist()
    assert v and v[0]["severity"] == "warn" and v[0]["code"] == "string.min"
    res = check(jr.string().warning("custom.note"), [("x", True)])
    assert res.violations.to_pylist()[0]["code"] == "custom.note"


def test_custom_message_and_label():
    res = check(jr.string().min(5).message("too short!"), [("ab", False, "string.min")])
    assert res.violations.to_pylist()[0]["message"] == "too short!"
    res = check(jr.string().min(5).label("Name"), [("ab", False)])
    assert '"Name"' in res.violations.to_pylist()[0]["message"]


def test_concat_and_literal_sugar():
    a = jr.string().min(2)
    b = jr.string().max(4)
    check(a.concat(b), [("abc", True), ("a", False, "string.min"), ("abcde", False, "string.max")])
    lit = jr.compile_literal({"k": "fixed"})
    assert lit.type == "object"
    check(lit.terms["keys"]["k"], [("fixed", True), ("other", False, "any.only")])


def test_context_ref():
    check(
        jr.number().min(jr.ref("$floor")),
        [(5.0, True), (1.0, False, "number.min")],
        prefs={"context": {"floor": 3}},
    )


def test_strict_prefs_on_node():
    # schema-local prefs override call prefs (lib/validator.js:116-118)
    check(jr.number().strict(), [("5", False, "number.base")])


def test_cast():
    res = check(jr.number().cast("string"), [(5.0, True)])
    assert res.value["x"].to_pylist() == ["5"]
    res = check(jr.boolean().cast("number"), [("true", True), ("false", True)])
    assert res.value["x"].to_pylist() == [1, 0]


def test_abort_early_row_semantics():
    # abort_early=True (joi default): only the first error per row
    res = check(jr.string().min(5).pattern(r"^\d+$"), [("ab", False, "string.min")], abort_early=True)
    assert len(res.violations) == 1
    res2 = check(jr.string().min(5).pattern(r"^\d+$"), [("ab", False, "string.min")], abort_early=False)
    assert len(res2.violations) == 2


def test_root_shortcuts():
    """Root-level shortcuts (lib/index.js:54-59): jr.required() etc. are
    any() sugar; jr.is_schema mirrors Joi.isSchema (lib/index.js:162)."""
    import pyarrow as pa

    from joi_ray import compile_schema

    assert jr.is_schema(jr.string()) and not jr.is_schema({"type": "string"})
    root = jr.object({"a": jr.required(), "b": jr.valid(1, 2), "c": jr.forbidden()})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(
        pa.table({"a": pa.array([None, "x"]), "b": [1.0, 9.0],
                  "c": pa.array(["no", None])}))
    assert list(res.ok) == [False, False]
    codes = {(v["row"], v["code"]) for v in res.violations.to_pylist()}
    assert {(0, "any.required"), (1, "any.only"), (0, "any.unknown")} <= codes


def test_root_type_predicates_and_prefs_check():
    """Joi.isRef / Joi.isExpression / Joi.checkPreferences analogs
    (lib/index.js:113-117,160-162)."""
    import pytest

    assert jr.is_ref(jr.ref("peer")) and not jr.is_ref("peer")
    assert jr.is_expression(jr.x("{#a + 1}")) and not jr.is_expression("{#a}")
    jr.check_preferences({"convert": True, "abort_early": False})
    with pytest.raises(ValueError, match="abortEarly"):
        jr.check_preferences({"abortEarly": True})


def test_concat_single_rule_replacement_and_value_merge():
    """concat fidelity (lib/base.js:408-427): a source's single rules
    replace the target's (last min wins); source invalids leave the
    target's valid set."""
    import pyarrow as pa

    from joi_ray import compile_schema, object as obj

    # single-rule replacement: min(5).concat(min(2)) == min(2)
    s = jr.number().min(5).concat(jr.number().min(2))
    res = compile_schema(obj({"v": s}), prefs={"abort_early": False}).validate_table(
        pa.table({"v": [3.0, 1.0]}))
    assert list(res.ok) == [True, False]
    # multi rules accumulate: two patterns both apply
    p = jr.string().pattern(r"^a").concat(jr.string().pattern(r"b$"))
    res2 = compile_schema(obj({"v": p}), prefs={"abort_early": False}).validate_table(
        pa.table({"v": ["ab", "ax", "xb"]}))
    assert list(res2.ok) == [True, False, False]
    # valids/invalids cross-removal
    m = jr.string().valid("a", "b").concat(jr.string().invalid("b"))
    res3 = compile_schema(obj({"v": m}), prefs={"abort_early": False}).validate_table(
        pa.table({"v": ["a", "b"]}))
    assert list(res3.ok) == [True, False]


def test_concat_valid_invalid_swap_vectors():
    """test/base.js 'merges two schemas (valid/invalid)': concat of
    valid('a').invalid('b') with valid('b').invalid('a') accepts only 'b'."""
    import pyarrow as pa

    from joi_ray import compile_schema, object as obj

    a = jr.string().valid("a").invalid("b")
    b = jr.string().valid("b").invalid("a")
    merged = a.concat(b)
    res = compile_schema(obj({"v": merged}), prefs={"abort_early": False}).validate_table(
        pa.table({"v": ["a", "b"]}))
    assert list(res.ok) == [False, True]
