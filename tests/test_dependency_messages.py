"""Dependency error-message/context parity with the reference
(/root/reference/test/types/object.js and()/or()/oxor()/nand() describe
blocks; message catalog lib/types/object.js:629-648).  Messages must be
byte-identical, including label substitution (keysToLabels), deep-path
peer labels ('b.second'), joi's [a, b] array rendering, and the
first-offending-peer context of with()/without()."""

import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj


def _viol(schema, table, prefs=None):
    res = compile_schema(schema, prefs=prefs or {"abort_early": False}).validate_table(table)
    return res.violations.to_pylist()


def test_and_labels_message():  # object.js:801-822
    s = obj({"a": jr.number().label("first"), "b": jr.string().label("second")}).and_("a", "b")
    v = _viol(s, pa.table({"a": pa.array([1.0]), "b": pa.array([None], pa.string())}))
    assert v[0]["code"] == "object.and"
    assert v[0]["message"] == '"value" contains [first] without its required peers [second]'


def test_and_row_dependent_context():  # object.js:726-751 (per-value present/missing)
    s = obj({"a": jr.string(), "b": jr.string(), "c": jr.string()}).and_("a", "b", "c")
    t = pa.table({
        "a": pa.array(["x", None, "x"], pa.string()),
        "b": pa.array([None, "y", "y"], pa.string()),
        "c": pa.array([None, None, None], pa.string()),
    })
    v = _viol(s, t)
    import json

    by_row = {x["row"]: json.loads(x["context"]) for x in v if x["code"] == "object.and"}
    assert by_row[0]["present"] == ["a"] and by_row[0]["missing"] == ["b", "c"]
    assert by_row[1]["present"] == ["b"] and by_row[1]["missing"] == ["a", "c"]
    assert by_row[2]["present"] == ["a", "b"] and by_row[2]["missing"] == ["c"]


def test_or_deep_nested_unknown_peers():  # object.js:2224-2245
    s = obj({"a": obj({"b": obj().or_("x", "y")})})
    col = pa.array(
        [{"a": {"b": {"c": 1}}}],
        pa.struct([("a", pa.struct([("b", pa.struct([("c", pa.int64())]))]))]),
    )
    v = _viol(obj({"v": s}), pa.table({"v": col}), prefs={"allow_unknown": True})
    m = [x for x in v if x["code"] == "object.missing"][0]
    assert m["path"] == "v.a.b"
    assert m["message"] == '"v.a.b" must contain at least one of [x, y]'


def test_or_labels():  # object.js:2248-2266
    s = obj({"a": jr.number().label("first"), "b": jr.string().label("second")}).or_("a", "b")
    v = _viol(s, pa.table({"a": pa.array([None], pa.float64()), "b": pa.array([None], pa.string())}))
    assert v[0]["message"] == '"value" must contain at least one of [first, second]'


def test_or_nested_path_labels():  # object.js:2325-2352 -> 'b.second'
    s = obj({
        "a": jr.number().label("first"),
        "b": obj({"c": jr.string().label("second"), "d": jr.number()}),
    }).or_("a", "b.c")
    t = pa.table({
        "a": pa.array([None], pa.float64()),
        "b": pa.array([None], pa.struct([("c", pa.string()), ("d", pa.float64())])),
    })
    v = _viol(s, t)
    assert v[0]["message"] == '"value" must contain at least one of [first, b.second]'


def test_xor_zero_present_is_object_missing():  # object.js:866-868
    s = obj({"a": jr.string(), "b": jr.string()}).xor("a", "b")
    t = pa.table({
        "a": pa.array([None, "x", "x", None], pa.string()),
        "b": pa.array([None, None, "y", "y"], pa.string()),
    })
    v = _viol(s, t)
    codes = {x["row"]: x["code"] for x in v}
    assert codes == {0: "object.missing", 2: "object.xor"}
    xor_msg = [x for x in v if x["row"] == 2][0]["message"]
    assert xor_msg == '"value" contains a conflict between exclusive peers [a, b]'


def test_oxor_present_context():  # object.js:2354+ (oxor reports present list)
    import json

    s = obj({"a": jr.string(), "b": jr.string(), "c": jr.string()}).oxor("a", "b", "c")
    t = pa.table({
        "a": pa.array(["x"], pa.string()),
        "b": pa.array(["y"], pa.string()),
        "c": pa.array([None], pa.string()),
    })
    v = _viol(s, t)
    assert v[0]["code"] == "object.oxor"
    ctx = json.loads(v[0]["context"])
    assert ctx["present"] == ["a", "b"] and ctx["peers"] == ["a", "b", "c"]
    assert v[0]["message"] == (
        '"value" contains a conflict between optional exclusive peers [a, b, c]')


def test_nand_main_and_rest_message():  # object.js:753-777, message :638
    s = obj({"a": jr.string().label("first"), "b": jr.string().label("second")}).nand("a", "b")
    v = _viol(s, pa.table({"a": pa.array(["x"]), "b": pa.array(["y"])}))
    assert v[0]["code"] == "object.nand"
    assert v[0]["message"] == '"first" must not exist simultaneously with [second]'


def test_with_first_missing_peer_only():  # object.js:815-833 (early return)
    s = obj({"a": jr.string(), "b": jr.string(), "c": jr.string()}).with_("a", "b", "c")
    v = _viol(s, pa.table({
        "a": pa.array(["x"]),
        "b": pa.array([None], pa.string()),
        "c": pa.array([None], pa.string()),
    }))
    assert [x["message"] for x in v] == ['"a" missing required peer "b"']


def test_without_first_present_peer_only():  # object.js:835-850
    s = obj({"a": jr.string(), "b": jr.string(), "c": jr.string()}).without("a", "b", "c")
    v = _viol(s, pa.table({
        "a": pa.array(["x"]), "b": pa.array(["y"]), "c": pa.array(["z"]),
    }))
    assert [x["message"] for x in v] == ['"a" conflict with forbidden peer "b"']


def test_unknown_peer_still_counts_missing():  # and() with unresolvable peer
    s = obj({"a": jr.string()}).and_("a", "nope")
    v = _viol(s, pa.table({"a": pa.array(["x"])}), prefs={"abort_early": False, "allow_unknown": True})
    m = [x for x in v if x["code"] == "object.and"]
    assert m and m[0]["message"] == '"value" contains [a] without its required peers [nope]'


def test_array_excludes_forbidden_items():  # array.js:145-153, 206-218
    s = obj({"a": jr.array().items(jr.string().forbidden(), jr.number())})
    t = pa.table({"a": pa.array([["x"], ["1"]], pa.list_(pa.string()))})
    v = _viol(s, t)
    assert [x["code"] for x in v] == ["array.excludes", "array.excludes"]
    assert v[0]["message"] == '"a[0]" contains an excluded value'  # label includes index (verified vs reference)
    # exclusion-only items: non-matching values pass untouched
    s2 = obj({"a": jr.array().items(jr.string().valid("bad").forbidden())})
    t2 = pa.table({"a": pa.array([["ok"], ["bad"]], pa.list_(pa.string()))})
    res = compile_schema(s2, prefs={"abort_early": False}).validate_table(t2)
    assert list(res.ok) == [True, False]


def test_assert_message_parity():  # object.js:1018-1020 '"d.e" failed to equal to a.c'
    # node-verified forms: subjects must be nested (object.js:209 rejects
    # root-level refs — the old 'a' form threw in the reference too)
    T = pa.struct([("n", pa.struct([("a", pa.float64())])), ("b", pa.float64())])
    t = pa.table({"x": pa.array([{"n": {"a": 1.0}, "b": 3.0}], T)})
    s = obj({"x": jr.object({"n": jr.object({"a": jr.number()}), "b": jr.number()})
             .assert_("n.a", jr.number().min(jr.ref("b")), "be at least b")})
    v = compile_schema(s, prefs={"abort_early": False}).validate_table(t).violations.to_pylist()
    assert v[0]["message"] == '"x" is invalid because "n.a" failed to be at least b'
    # default message (object.js:1098: 'failed to pass the assertion test')
    s2 = obj({"x": jr.object({"n": jr.object({"a": jr.number()}), "b": jr.number()})
              .assert_("n.a", jr.number().min(jr.ref("b")))})
    v2 = compile_schema(s2, prefs={"abort_early": False}).validate_table(t).violations.to_pylist()
    assert v2[0]["message"] == '"x" is invalid because "n.a" failed to pass the assertion test'
