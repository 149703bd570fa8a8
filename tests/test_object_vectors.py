"""Reference object test vectors — keys-term semantics, unknown() locality,
stripUnknown interplay, key counts, nested traversal (reference:
/root/reference/test/types/object.js, lines cited per test).  JS object
literals become Arrow struct columns; a key absent in a row is a null
field (the repo's columnar missing convention)."""

import pyarrow as pa

import joi_ray as jr
from joi_ray import build, compile_schema, object as obj


def run(schema_root, tbl, prefs=None):
    cs = compile_schema(schema_root, prefs={"abort_early": False, **(prefs or {})})
    return cs.validate_table(tbl)


def codes(res, row=None):
    return [v["code"] for v in res.violations.to_pylist()
            if v["severity"] == "error" and (row is None or v["row"] == row)]


# ------------------------------------------------------- keys() term semantics
def test_keys_no_arg_allows_any_key():
    # object.js:1218-1232 — a.keys() resets to allow-all
    a = jr.object({"a": jr.number()})
    b = a.keys()
    t = pa.table({"x": pa.array([{"b": 3}], type=pa.struct({"a": pa.int64(), "b": pa.int64()}))})
    res_a = run(obj({"x": a}), t)
    assert codes(res_a) == ["object.unknown"]
    assert '"x.b" is not allowed' in res_a.violations.to_pylist()[0]["message"]
    res_b = run(obj({"x": b}), t)
    assert codes(res_b) == []


def test_object_plain_allows_forbids_all_with_empty_keys():
    # object.js:1234-1247 — object() allows any key; keys({}) forbids all
    a = jr.object()
    b = a.keys({})
    t = pa.table({"x": pa.array([{"b": 3}], type=pa.struct({"b": pa.int64()}))})
    assert codes(run(obj({"x": a}), t)) == []
    assert codes(run(obj({"x": b}), t)) == ["object.unknown"]


def test_object_empty_ctor_forbids_all():
    # object.js:258-270 args handler — Joi.object({}) === keys({})
    t = pa.table({"x": pa.array([{"b": 3}], type=pa.struct({"b": pa.int64()}))})
    assert codes(run(obj({"x": jr.object({})}), t)) == ["object.unknown"]


def test_keys_adds_to_existing():
    # object.js:1249-1263
    a = jr.object({"a": jr.number()})
    b = a.keys({"b": jr.number()})
    t = pa.table({"x": pa.array([{"a": 1, "b": 2}],
                                type=pa.struct({"a": pa.int64(), "b": pa.int64()}))})
    assert codes(run(obj({"x": a}), t)) == ["object.unknown"]
    assert codes(run(obj({"x": b}), t)) == []


def test_append_noop_on_empty():
    # object.js:191-202 / test :945-980 — append(None/{}) does not change schema
    s = jr.object({"a": jr.string()})
    assert s.append(None) is s
    assert s.append({}) is s
    s2 = s.append({"b": jr.string()})
    assert "b" in s2.describe()["keys"]


def test_keys_term_round_trips_manifest():
    # empty-vs-absent keys term must survive describe()/build()
    for s in (jr.object(), jr.object({}), jr.object({"a": jr.number()}).keys()):
        assert build(s.describe()) == s


# ------------------------------------------------------------------ unknown()
ST_AB_C = pa.struct({"a": pa.struct({"b": pa.int64(), "c": pa.string()}),
                     "c": pa.string()})


def test_local_unknown_without_applying_to_keys():
    # object.js:3167-3197 — unknown() on the outer object does not leak to
    # inner keys; row 4's inner 'c' errors, row 3's outer 'c' is allowed
    schema = jr.object({"a": jr.object({"b": jr.number()})}).unknown()
    t = pa.table({"x": pa.array([
        {"a": {"b": 5}},
        {"a": {"b": 5}, "c": "ignore"},
        {"a": {"b": 5, "c": "ignore"}},
    ], type=ST_AB_C)})
    res = run(obj({"x": schema}), t)
    assert codes(res, 0) == []
    assert codes(res, 1) == []
    vs = [v for v in res.violations.to_pylist() if v["row"] == 2]
    assert [v["code"] for v in vs] == ["object.unknown"]
    assert vs[0]["path"] == "x.a.c"
    assert '"x.a.c" is not allowed' in vs[0]["message"]


def test_forbid_local_unknown_inner_allowed():
    # object.js:3199-3229 — inner unknown() allows inner extras while the
    # outer (allowUnknown:false) still forbids outer extras
    schema = jr.object({"a": jr.object({"b": jr.number()}).unknown()})
    t = pa.table({"x": pa.array([
        {"a": {"b": 5}},
        {"a": {"b": 5}, "c": "ignore"},
        {"a": {"b": 5, "c": "ignore"}},
    ], type=ST_AB_C)})
    res = run(obj({"x": schema}), t, prefs={"allow_unknown": False})
    assert codes(res, 0) == []
    vs = [v for v in res.violations.to_pylist() if v["row"] == 1]
    assert [v["code"] for v in vs] == ["object.unknown"]
    assert vs[0]["path"] == "x.c"
    assert codes(res, 2) == []


def test_local_unknown_overrides_strip_unknown():
    # object.js:3231-3258 — stripUnknown strips outer extras but the inner
    # unknown() keeps inner extras in the output
    inner = jr.object({"b": jr.number(),
                       "c": jr.object({"d": jr.number()})}).unknown()
    schema = jr.object({"a": inner})
    st = pa.struct({"a": pa.struct({"b": pa.int64(), "d": pa.string(),
                                    "c": pa.struct({"e": pa.string()})}),
                    "d": pa.string()})
    t = pa.table({"x": pa.array([
        {"a": {"b": 5}},
        {"a": {"b": 5}, "d": "ignore"},
        {"a": {"b": 5, "d": "ignore"}},
        {"a": {"b": 5, "c": {"e": "ignore"}}},
    ], type=st)})
    res = run(obj({"x": schema}), t,
              prefs={"allow_unknown": False, "strip_unknown": True})
    assert list(res.ok) == [True, True, True, True], res.violations.to_pylist()
    out = res.value.column("x").combine_chunks()
    a_out = out.field("a") if hasattr(out, "field") else out.chunk(0).field("a")
    # inner 'd' survives (unknown() local override)...
    assert "d" in [f.name for f in a_out.type]
    assert a_out.field("d")[2].as_py() == "ignore"
    # ...and the inner 'c' object lost ITS unknown key 'e' (no local flag)
    c_names = [f.name for f in a_out.field("c").type]
    assert "e" not in c_names


def test_strip_unknown_arrays_only_does_not_strip_objects():
    # lib/types/object.js:1052 — stripUnknown: {arrays: true} leaves the
    # objects gate falsy, so unknown object keys still error
    schema = jr.object({"a": jr.object({"b": jr.number()})})
    st = pa.struct({"a": pa.struct({"b": pa.int64(), "c": pa.string()})})
    t = pa.table({"x": pa.array([{"a": {"b": 5, "c": "zz"}}], type=st)})
    res = run(obj({"x": schema}), t,
              prefs={"allow_unknown": False, "strip_unknown": {"arrays": True}})
    assert codes(res) == ["object.unknown"]
    res2 = run(obj({"x": schema}), t,
               prefs={"allow_unknown": False,
                      "strip_unknown": {"arrays": True, "objects": True}})
    assert codes(res2) == []


def test_unknown_false_local_still_stripped():
    # object.js:1049 `!schema._flags.unknown` — explicit unknown(false)
    # behaves like unset for stripping: key removed, no error
    schema = jr.object({"a": jr.object({"b": jr.number()}).unknown(False)})
    st = pa.struct({"a": pa.struct({"b": pa.int64(), "c": pa.string()})})
    t = pa.table({"x": pa.array([{"a": {"b": 5, "c": "zz"}}], type=st)})
    res = run(obj({"x": schema}), t, prefs={"strip_unknown": True})
    assert codes(res) == []
    out = res.value.column("x").combine_chunks()
    a_t = (out.field("a") if hasattr(out, "field") else out.chunk(0).field("a")).type
    assert "c" not in [f.name for f in a_t]


# ----------------------------------------------------------------- key counts
ST_ABC = pa.struct({"item": pa.string(), "item2": pa.string(), "item3": pa.string()})


def _count_tbl():
    return pa.table({"x": pa.array([
        {"item": "something"},
        {"item": "something", "item2": "something else"},
        {"item": "s", "item2": "s2", "item3": "s3"},
        {},
    ], type=ST_ABC)})


def test_min_key_count():
    # object.js:206-243
    res = run(obj({"x": jr.object().unknown().min(3)}), _count_tbl())
    assert [bool(b) for b in res.ok] == [False, False, True, False]
    assert codes(res, 0) == ["object.min"]
    assert '"x" must have at least 3 keys' in res.violations.to_pylist()[0]["message"]


def test_max_key_count():
    # object.js:245-274
    res = run(obj({"x": jr.object().unknown().max(2)}), _count_tbl())
    assert [bool(b) for b in res.ok] == [True, True, False, True]
    assert codes(res, 2) == ["object.max"]


def test_length_key_count():
    # object.js:326-363
    res = run(obj({"x": jr.object().unknown().length(2)}), _count_tbl())
    assert [bool(b) for b in res.ok] == [False, True, False, False]
    assert codes(res, 2) == ["object.length"]


def test_count_rule_arg_asserts():
    # object.js:2048-2079 — non-number limits throw at schema build
    import pytest
    for meth in ("min", "max", "length"):
        with pytest.raises((ValueError, TypeError, AssertionError)):
            getattr(jr.object(), meth)("q")


# ------------------------------------------------------------ nested traversal
def test_traverse_required_levels():
    # object.js:493-540 — required nested levels: missing deep key errors
    # with full path; missing optional mid-level passes
    schema = jr.object({
        "obj": jr.object({
            "obj2": jr.object({
                "obj3": jr.object({
                    "item": jr.string().required(),
                }).required(),
            }).required(),
        }),
    })
    st = pa.struct({"obj": pa.struct({"obj2": pa.struct({"obj3": pa.struct({"item": pa.string()})})})})
    t = pa.table({"x": pa.array([
        {},
        {"obj": {}},
        {"obj": {"obj2": {}}},
        {"obj": {"obj2": {"obj3": {}}}},
        {"obj": {"obj2": {"obj3": {"item": "something"}}}},
    ], type=st)})
    res = run(obj({"x": schema}), t)
    assert [bool(b) for b in res.ok] == [True, False, False, False, True]
    vs = res.violations.to_pylist()
    by_row = {v["row"]: v for v in vs}
    assert by_row[1]["path"] == "x.obj.obj2" and by_row[1]["code"] == "any.required"
    assert by_row[2]["path"] == "x.obj.obj2.obj3"
    assert by_row[3]["path"] == "x.obj.obj2.obj3.item"


def test_unknown_nested_path():
    # object.js:670-696 — unknown nested key errors carry the full path
    schema = jr.object({"a": jr.object({"b": jr.number()})})
    st = pa.struct({"a": pa.struct({"b": pa.int64(), "z": pa.int64()})})
    t = pa.table({"x": pa.array([{"a": {"b": 1, "z": 5}}], type=st)})
    vs = run(obj({"x": schema}), t).violations.to_pylist()
    assert [(v["code"], v["path"]) for v in vs] == [("object.unknown", "x.a.z")]


# ----------------------------------------------------------- JSON coercion
def test_json_string_to_object():
    # object.js:19-44 — convert parses JSON strings (incl. whitespace),
    # strict errors, non-object JSON errors
    schema = jr.object({"a": jr.number()})
    t = pa.table({"x": pa.array(['{"a": 1}', ' \n\r\t {"a": 1} \n\r\t ', "a string", '"a string"'])})
    res = run(obj({"x": schema}), t)
    assert [bool(b) for b in res.ok] == [True, True, False, False]
    assert codes(res, 2) == ["object.base"]
    res_strict = run(obj({"x": schema}), pa.table({"x": ['{"a": 1}']}),
                     prefs={"convert": False})
    assert codes(res_strict) == ["object.base"]


# -------------------------------------------------------- language preference
def test_messages_language_preference():
    # errors.js:173-211 — errors.language selects a sub-map; unknown/empty
    # languages and plain code keys fall through
    messages = {
        "english": {"number.min": "{#label} too small"},
        "latin": {"number.min": "{#label} angustus"},
        "empty": {},
    }
    t = pa.table({"n": [1.0]})
    root = obj({"n": jr.number().min(10)})

    def m(prefs):
        res = run(root, t, prefs=prefs)
        return res.violations.to_pylist()[0]["message"]

    assert m({"messages": messages, "errors": {"language": "english"}}) == "n too small"
    assert m({"messages": messages, "errors": {"language": "latin"}}) == "n angustus"
    assert '"n" must be larger than or equal to 10' == m({"messages": messages, "errors": {"language": "unknown"}})
    assert '"n" must be larger than or equal to 10' == m({"messages": messages, "errors": {"language": "empty"}})
    # fallthrough to root-level code entries (errors.js:195-211)
    flat = {"english": {"number.min": "{#label} too small"}, "number.min": "{#label} angustus"}
    assert m({"messages": flat, "errors": {"language": "english"}}) == "n too small"
    assert m({"messages": flat, "errors": {"language": "latin"}}) == "n angustus"
    # language as a context ref (errors.js:243-268)
    assert m({"messages": messages, "errors": {"language": jr.Ref("$lang")},
              "context": {"lang": "latin"}}) == "n angustus"


def test_messages_schema_local_prefs():
    # errors.js:195-211 — prefs({messages}) on the schema node itself
    s = jr.number().min(10).preferences(
        messages={"number.min": "{#label} angustus"})
    t = pa.table({"n": [1.0]})
    res = run(obj({"n": s}), t)
    assert res.violations.to_pylist()[0]["message"] == "n angustus"


def test_deep_defaults():
    # base.js:1064-1081 — default() no-arg creates the object from child
    # defaults; non-object schemas throw (:1082-1086)
    import pytest
    st = pa.struct({"a": pa.int64(), "b": pa.string()})
    t = pa.table({"x": pa.array([None, {"a": 7, "b": None}], type=st)})
    s = jr.object({"a": jr.number().default(42), "b": jr.string().default("d")}).default()
    res = run(obj({"x": s}), t)
    assert res.value["x"].to_pylist() == [{"a": 42, "b": "d"}, {"a": 7, "b": "d"}]
    # noDefaults skips deep defaults too
    res2 = run(obj({"x": s}), t, prefs={"no_defaults": True})
    assert res2.value["x"].to_pylist()[0] is None
    with pytest.raises(ValueError):
        jr.number().default()


def test_empty_reset():
    # base.js:1229-1271 — empty() no-arg resets; flag removed from describe
    s = jr.string().empty("").empty()
    assert "empty" not in s.describe().get("flags", {})
    t = pa.table({"x": [""]})
    res = run(obj({"x": s.min(1)}), t)
    assert [bool(b) for b in res.ok] == [False]


def test_literal_sugar_in_containers():
    # lib/compile.js:31-77 — dicts, lists, scalars, regexes compile to
    # schemas inside keys()/items()/try_() (test/index.js:178-481)
    import re
    s = jr.object({
        "a": {"b": jr.number()},          # dict -> object().keys
        "c": [1, 2],                      # list -> alternatives(valid(1), valid(2))
        "d": "x",                         # scalar -> string().valid('x')
        "rx": re.compile(r"^a+$"),        # regex -> string().pattern
    })
    t = pa.table({
        "a": pa.array([{"b": 5}, {"b": 5}], type=pa.struct({"b": pa.int64()})),
        "c": [1, 3], "d": ["x", "y"], "rx": ["aaa", "b"],
    })
    res = run(obj({"x": jr.any_()}).keys({"a": s}), pa.table(
        {"x": [None, None], "a": pa.array([None, None], type=pa.null())}))
    res = run(s, t)
    assert [bool(b) for b in res.ok] == [True, False]
    assert sorted(codes(res, 1)) == ["alternatives.match", "any.only", "string.pattern.base"]
    # array items literal
    arr = jr.array().items("keep")
    t2 = pa.table({"x": pa.array([["keep", "keep"], ["keep", "drop"]],
                                 type=pa.list_(pa.string()))})
    res2 = run(obj({"x": arr}), t2)
    assert [bool(b) for b in res2.ok] == [True, False]


def test_assert_nested_ref_subject():
    # object.js:984-1027 — assert subject path walks nested keys; refs in
    # the assert schema resolve against the object's own children
    st = pa.struct({"a": pa.struct({"b": pa.int64()}), "d": pa.int64()})
    t = pa.table({"x": pa.array(
        [{"a": {"b": 1}, "d": 1}, {"a": {"b": 1}, "d": 2}], type=st)})
    s = jr.object({"a": jr.object({"b": jr.number()}), "d": jr.number()}).assert_(
        jr.ref("a.b"), jr.number().valid(jr.ref("d")), "must equal d")
    res = run(obj({"x": s}), t)
    assert [bool(b) for b in res.ok] == [True, False]
    assert codes(res, 1) == ["object.assert"]
