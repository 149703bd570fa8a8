"""Array / object / alternatives / when conformance
(reference: /root/reference/test/types/{array,object,alternatives}.js)."""

import numpy as np
import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj

LIST_I64 = pa.list_(pa.int64())
LIST_STR = pa.list_(pa.string())


def vcheck(schema_root, tbl, expected_ok, prefs=None):
    cs = compile_schema(schema_root, prefs={"abort_early": False, **(prefs or {})})
    res = cs.validate_table(tbl)
    assert list(res.ok) == expected_ok, res.violations.to_pylist()
    return res


# ---------------------------------------------------------------- array
def test_array_length_rules():
    t = pa.table({"x": pa.array([[1, 2], [1], [], None, [1, 2, 3]], type=LIST_I64)})
    res = vcheck(obj({"x": jr.array().min(1).max(2)}), t, [True, True, False, True, False])
    codes = {(v["row"], v["code"]) for v in res.violations.to_pylist()}
    assert (2, "array.min") in codes and (4, "array.max") in codes


def test_array_items_scalar():
    t = pa.table({"x": pa.array([[1, 2], [1, -5], None], type=LIST_I64)})
    res = vcheck(obj({"x": jr.array().items(jr.number().min(0))}), t, [True, False, True])
    v = res.violations.to_pylist()[0]
    assert v["code"] == "number.min" and v["item_index"] == 1


def test_array_multi_items_first_match():
    # each item must match one of the schemas
    t = pa.table({"x": pa.array([["a", "1"], ["zzz"]], type=LIST_STR)})
    schema = jr.array().items(jr.string().max(1), jr.string().pattern(r"^\d+$"))
    res = vcheck(obj({"x": schema}), t, [True, False])
    assert res.violations.to_pylist()[0]["code"] == "array.includes"


def test_array_required_items():
    # a required item schema must match at least once (array.includesRequiredUnknowns)
    t = pa.table({"x": pa.array([["go", "stop"], ["x"]], type=LIST_STR)})
    schema = jr.array().items(jr.string().valid("go").required(), jr.string())
    vcheck(obj({"x": schema}), t, [True, False])


def test_array_unique_within_row():
    t = pa.table({"x": pa.array([[1, 2, 3], [1, 2, 1]], type=LIST_I64)})
    res = vcheck(obj({"x": jr.array().unique()}), t, [True, False])
    assert res.violations.to_pylist()[0]["code"] == "array.unique"


def test_array_sparse_and_sort():
    t = pa.table({"x": pa.array([[1, None, 2], [1, 2]], type=LIST_I64)})
    vcheck(obj({"x": jr.array()}), t, [False, True])          # sparse forbidden by default
    vcheck(obj({"x": jr.array().sparse()}), t, [True, True])  # allowed with flag
    t2 = pa.table({"x": pa.array([[1, 2, 3], [3, 1, 2]], type=LIST_I64)})
    # joi default: sort() CONVERTS under prefs.convert (coerce-stage sort,
    # node-verified); the check path needs convert:false prefs or the
    # engine's convert=False extension
    res = vcheck(obj({"x": jr.array().sort()}), t2, [True, True])
    assert res.value["x"].to_pylist() == [[1, 2, 3], [1, 2, 3]]
    res_d = vcheck(obj({"x": jr.array().sort(order="descending")}), t2, [True, True])
    assert res_d.value["x"].to_pylist() == [[3, 2, 1], [3, 2, 1]]
    res_c = vcheck(obj({"x": jr.array().sort(convert=False)}), t2, [True, False])
    assert res_c.violations.to_pylist()[0]["code"] == "array.sort"


def test_array_has_and_ordered():
    t = pa.table({"x": pa.array([["a", "GO"], ["a", "b"]], type=LIST_STR)})
    res = vcheck(obj({"x": jr.array().has(jr.string().valid("GO"))}), t, [True, False])
    assert res.violations.to_pylist()[0]["code"] == "array.hasUnknown"
    t2 = pa.table({"x": pa.array([["a", "1"], ["1", "a"]], type=LIST_STR)})
    schema = jr.array().ordered(jr.string().pattern(r"^[a-z]$"), jr.string().pattern(r"^\d$"))
    vcheck(obj({"x": schema}), t2, [True, False])
    # beyond ordered length without items -> error
    t3 = pa.table({"x": pa.array([["a", "1", "extra"]], type=LIST_STR)})
    res = vcheck(obj({"x": schema}), t3, [False])
    assert res.violations.to_pylist()[0]["code"] == "array.orderedLength"


def test_array_single_wrap():
    t = pa.table({"x": pa.array([1, 2, None], type=pa.int64())})
    res = vcheck(obj({"x": jr.array().single().items(jr.number().min(2))}), t, [False, True, True])
    assert res.value["x"].to_pylist() == [[1], [2], None]


# ---------------------------------------------------------------- object (struct)
STRUCT = pa.struct([("a", pa.string()), ("b", pa.int64())])


def test_struct_keys():
    t = pa.table({"x": pa.array([{"a": "hi", "b": 1}, {"a": None, "b": -1}, None], type=STRUCT)})
    schema = jr.object({"a": jr.string().required(), "b": jr.number().min(0)})
    res = vcheck(obj({"x": schema}), t, [True, False, True])
    codes = sorted(v["code"] for v in res.violations.to_pylist())
    assert codes == ["any.required", "number.min"]
    paths = sorted(v["path"] for v in res.violations.to_pylist())
    assert paths == ["x.a", "x.b"]


def test_struct_required_object_itself():
    t = pa.table({"x": pa.array([None, {"a": "v", "b": 0}], type=STRUCT)})
    vcheck(obj({"x": jr.object({"a": jr.string()}).required()}), t, [False, True], prefs={"allow_unknown": True})


def test_dependencies_top_level():
    t = pa.table({"a": ["x", None, "x", None], "b": ["y", "y", None, None]})
    vcheck(obj({"a": jr.string(), "b": jr.string()}).and_("a", "b"), t, [True, False, False, True])
    vcheck(obj({"a": jr.string(), "b": jr.string()}).or_("a", "b"), t, [True, True, True, False])
    vcheck(obj({"a": jr.string(), "b": jr.string()}).xor("a", "b"), t, [False, True, True, False])
    vcheck(obj({"a": jr.string(), "b": jr.string()}).oxor("a", "b"), t, [False, True, True, True])
    vcheck(obj({"a": jr.string(), "b": jr.string()}).nand("a", "b"), t, [False, True, True, True])
    vcheck(obj({"a": jr.string(), "b": jr.string()}).with_("a", "b"), t, [True, True, False, True])
    vcheck(obj({"a": jr.string(), "b": jr.string()}).without("a", "b"), t, [False, True, True, True])


def test_object_assert_and_counts():
    # root-level single-segment subjects are rejected at build time
    # (object.js:209 — node-verified: the reference throws the same)
    import pytest

    with pytest.raises(ValueError, match="root level references"):
        obj({"a": jr.number()}).assert_("a", jr.number().min(1))
    # legal form: nested path subject; n.a >= b (ref resolves inside the
    # asserted object's own value with siblings as ancestors)
    STRUCT_N = pa.struct([("n", pa.struct([("a", pa.float64())])), ("b", pa.float64())])
    t = pa.table({"x": pa.array(
        [{"n": {"a": 5.0}, "b": 3.0}, {"n": {"a": 1.0}, "b": 3.0}], STRUCT_N)})
    root = obj({"x": jr.object({"n": jr.object({"a": jr.number()}), "b": jr.number()})
                .assert_("n.a", jr.number().min(jr.ref("b")))})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False]
    # key-count rules on a struct column
    t2 = pa.table({"x": pa.array([{"a": "1", "b": 2}, {"a": None, "b": 2}], type=STRUCT)})
    vcheck(obj({"x": jr.object({"a": jr.string(), "b": jr.number()}).min(2)}), t2, [True, False])


def test_rename_and_unknown():
    t = pa.table({"old": ["v"], "keep": [1.0]})
    root = obj({"new": jr.string().required(), "keep": jr.number()}).rename("old", "new")
    res = compile_schema(root).validate_table(t)
    assert list(res.ok) == [True]
    assert "new" in res.value.column_names


# ---------------------------------------------------------------- alternatives / when
def test_alternatives_try():
    t = pa.table({"x": ["abc", "zz", "abcdef"]})
    root = obj({"x": jr.alternatives(jr.string().length(3), jr.string().min(5))})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False, True]
    # both branches fail with non-base codes -> alternatives.match
    # (error-union rules, alternatives.js:60-91)
    assert res.violations.to_pylist()[0]["code"] == "alternatives.match"


def test_when_switch():
    t = pa.table({"kind": ["a", "b", "c", "a"], "v": ["1", "xx", "anything", "nope"]})
    v_schema = jr.string().when(
        "kind",
        switch=[
            {"is": "a", "then": jr.string().pattern(r"^\d+$")},
            {"is": "b", "then": jr.string().length(2)},
        ],
    )
    root = obj({"kind": jr.string(), "v": v_schema})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, True, True, False]


def test_when_is_schema_condition():
    t = pa.table({"n": [5.0, 50.0], "v": [None, None]})
    v_schema = jr.string().when("n", is_=jr.number().min(10), then=jr.string().required())
    root = obj({"n": jr.number(), "v": v_schema})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False]


def test_nested_list_of_struct_with_sibling_when():
    span_t = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string())]))
    t = pa.table(
        {
            "spans": pa.array(
                [
                    [{"kind": "text", "text": "hi"}],
                    [{"kind": "text", "text": None}],
                    [{"kind": "image", "text": None}],
                    [{"kind": "image", "text": "bad"}],
                ],
                type=span_t,
            )
        }
    )
    span = jr.object(
        {
            "kind": jr.string().required(),
            "text": jr.string().when("kind", is_="text", then=jr.string().required(), otherwise=jr.string().forbidden()),
        }
    )
    res = compile_schema(obj({"spans": jr.array().items(span)}), prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False, True, False]


def test_deterministic_violations_across_row_order():
    rng = np.random.default_rng(7)
    n = 200
    vals = [f"v{i}" if i % 5 else "" for i in range(n)]
    ids = [f"id{i:04d}" for i in range(n)]
    t = pa.table({"id": ids, "x": vals})
    root = obj({"id": jr.string(), "x": jr.string().min(1)})
    cs = compile_schema(root, prefs={"abort_early": False}, id_column="id")
    base = cs.validate_table(t).violations.to_pylist()
    perm = rng.permutation(n)
    t2 = t.take(pa.array(perm))
    shuf = cs.validate_table(t2).violations.to_pylist()
    key = lambda v: (v["doc_id"], v["path"], v["code"], v["item_index"])
    assert sorted(map(key, base)) == sorted(map(key, shuf))


def test_array_item_strip():
    """Items matching a strip-marked schema are removed from the output
    (the reference's array strip handling)."""
    t = pa.table({"x": pa.array([["keep1", "-", "keep2"], ["-"]], type=LIST_STR)})
    schema = jr.array().items(jr.string().valid("-").strip(), jr.string().min(2))
    res = compile_schema(obj({"x": schema}), prefs={"abort_early": False}).validate_table(t)
    assert res.value["x"].to_pylist() == [["keep1", "keep2"], []]
    assert list(res.ok) == [True, True]


def test_alternatives_over_struct_shapes():
    """Either {a}-shaped or {b}-shaped struct content (xor via alternatives)."""
    st = pa.struct([("a", pa.string()), ("b", pa.int64())])
    t = pa.table(
        {"x": pa.array([{"a": "hi", "b": None}, {"a": None, "b": 5}, {"a": None, "b": None}], type=st)}
    )
    alt = jr.alternatives(
        jr.object({"a": jr.string().required(), "b": jr.number().forbidden()}),
        jr.object({"a": jr.string().forbidden(), "b": jr.number().required()}),
    )
    vcheck(obj({"x": alt}), t, [True, True, False])


def test_struct_in_struct_dependencies():
    inner = pa.struct([("p", pa.string()), ("q", pa.string())])
    outer = pa.struct([("o", inner)])
    t = pa.table({"x": pa.array([{"o": {"p": "1", "q": None}}, {"o": {"p": "1", "q": "2"}}], type=outer)})
    s = jr.object({"x": jr.object({"o": jr.object({"p": jr.string(), "q": jr.string()}).nand("p", "q")})})
    vcheck(s, t, [True, False])


def test_ordered_then_items_tail():
    """Items beyond the ordered prefix fall back to items() schemas."""
    schema = jr.array().ordered(
        jr.string().pattern(r"^[a-z]$"), jr.string().pattern(r"^\d$")
    ).items(jr.string().min(3))
    t = pa.table({"x": pa.array([["a", "1", "zzzz"]], type=LIST_STR)})
    vcheck(obj({"x": schema}), t, [True])
    t2 = pa.table({"x": pa.array([["a", "1", "no"]], type=LIST_STR)})
    vcheck(obj({"x": schema}), t2, [False])


def test_array_unique_options():
    # deep-equal fallback for struct items (array.js:497)
    t = pa.table({"x": pa.array(
        [[{"a": 1}, {"a": 1}], [{"a": 1}, {"a": 2}]],
        type=pa.list_(pa.struct([("a", pa.int64())])))})
    res = compile_schema(obj({"x": jr.array().unique()}), prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [False, True]

    # custom comparator (array.js:470): duplicates iff same parity
    t2 = pa.table({"x": pa.array([[1, 3], [1, 2]], type=LIST_I64)})
    sch = obj({"x": jr.array().unique(lambda a, b: a % 2 == b % 2)})
    res2 = compile_schema(sch, prefs={"abort_early": False}).validate_table(t2)
    assert list(res2.ok) == [False, True]

    # nulls duplicate by default; ignore_undefined skips them
    t3 = pa.table({"x": pa.array([[None, None, 1]], type=LIST_I64)})
    ok_default = compile_schema(
        obj({"x": jr.array().sparse().unique()}), prefs={"abort_early": False}
    ).validate_table(t3)
    assert list(ok_default.ok) == [False]
    ok_ignore = compile_schema(
        obj({"x": jr.array().sparse().unique(ignore_undefined=True)}),
        prefs={"abort_early": False},
    ).validate_table(t3)
    assert list(ok_ignore.ok) == [True]


def test_array_sort_null_placement():
    """joi sort: undefined sorts last regardless of order (array.js:796-801;
    Arrow null == undefined).  Vectors from test/types/array.js:1530-1545."""
    t = pa.table({"x": pa.array(
        [[1, 2], [1, 2, None], [1, 2, None, None], [None, 1, 2], [2, 1]],
        type=LIST_I64)})
    res = vcheck(
        obj({"x": jr.array().sparse().sort()}), t,
        [True, True, True, False, False], prefs={"convert": False})
    codes = {v["code"] for v in res.violations.to_pylist()}
    assert "array.sort" in codes


def test_array_sort_convert_strings_with_nulls():
    """convert-mode sort is type-agnostic and null-safe: strings sort by
    value and missing items land last regardless of order
    (array.js:796-801; convert vectors test/types/array.js:1757-1793)."""
    t = pa.table({"x": pa.array(
        [["b", None, "a"], ["z", "x", "y"], None], type=LIST_STR)})
    cs = compile_schema(
        obj({"x": jr.array().sparse().sort(convert=True)}),
        prefs={"abort_early": False})
    res = cs.validate_table(t)
    assert list(res.ok) == [True, True, True]
    assert res.value["x"].to_pylist() == [["a", "b", None], ["x", "y", "z"], None]


def test_array_sort_convert_descending_non_numeric():
    """descending convert sort orders keys per row (regression: the old
    path reversed the key vector globally, misaligning rows)."""
    t = pa.table({"x": pa.array([["a", "c", "b"], ["m", "z"]], type=LIST_STR)})
    cs = compile_schema(
        obj({"x": jr.array().sort(order="descending", convert=True)}),
        prefs={"abort_early": False})
    res = cs.validate_table(t)
    assert res.value["x"].to_pylist() == [["c", "b", "a"], ["z", "m"]]


def test_array_sort_check_strings_with_nulls():
    """convert=False order check on string lists with nulls must not crash;
    missing items are allowed anywhere a null sits last (array.js:796-801)."""
    t = pa.table({"x": pa.array(
        [["a", "b", None], ["b", "a"], ["a", None, "b"]], type=LIST_STR)})
    res = vcheck(
        obj({"x": jr.array().sparse().sort()}), t,
        [True, False, False], prefs={"convert": False})
    assert {v["code"] for v in res.violations.to_pylist()} == {"array.sort"}


def test_array_single_items_mutual_exclusion():
    """single() and array-typed items are mutually exclusive, both orders
    (test/types/array.js:1488-1501); alternatives branches are inspected."""
    import pytest
    with pytest.raises(ValueError):
        jr.array().single().items(jr.array())
    with pytest.raises(ValueError):
        jr.array().items(jr.array()).single()
    with pytest.raises(ValueError):
        jr.array().single().ordered(jr.alternatives(jr.array(), jr.number()))
    jr.array().single().items(jr.number())  # scalar items stay legal


def test_container_limit_arg_asserts():
    """array/object min/max/length reject negative or non-integer limits
    (Common.limit asserts; binary vectors test/types/binary.js:182-196)."""
    import pytest
    for s in (jr.array(), jr.object()):
        for m in ("min", "max", "length"):
            for bad in (-1, 1.5, "2", True):
                with pytest.raises(ValueError):
                    getattr(s, m)(bad)
    jr.array().min(jr.ref("n"))  # refs pass through


def test_when_forks_valid_sets():
    """when() concat semantics on valid sets (test/base.js:2765-2805:
    'forks type into alternatives'): branch valids merge with the base's."""
    root = obj({
        "a": jr.number(),
        "b": jr.string().valid("x").when(
            "a", is_=5, then=jr.string().valid("y"), otherwise=jr.string().valid("z")),
    })
    t = pa.table({
        "a": [5.0, 5.0, 5.0, 1.0, 1.0, 1.0],
        "b": ["x", "y", "z", "x", "z", "y"],
    })
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, True, False, True, True, False], res.violations.to_pylist()
    codes = {(v["row"], v["code"]) for v in res.violations.to_pylist()}
    assert (2, "any.only") in codes and (5, "any.only") in codes


def test_when_schema_condition_peek():
    """when(schema) — the reference's peek form (alternatives.js:192):
    the condition schema is evaluated against the node's OWN value."""
    root = obj({
        "v": jr.number().when(jr.number().max(5),
                              then=jr.number().min(0),
                              otherwise=jr.number().multiple(5)),
    })
    t = pa.table({"v": [3.0, -1.0, 10.0, 12.0]})
    from joi_ray.spec import from_json
    for sch in (root, from_json(root.to_json())):
        res = compile_schema(sch, prefs={"abort_early": False}).validate_table(t)
        assert list(res.ok) == [True, False, True, False]
        codes = [v["code"] for v in res.violations.to_pylist()]
        assert codes == ["number.min", "number.multiple"]
    # is_/switch rejected with a schema condition (alternatives.js:180-182)
    import pytest
    with pytest.raises(ValueError):
        jr.number().when(jr.number(), is_=5, then=jr.number())


def test_alternatives_error_union_rules():
    """Error-union fidelity (alternatives.js:60-91): single branch error
    passes through; all-base -> alternatives.types; mixed -> .match."""
    # single error: only one branch produces an error record family
    t = pa.table({"x": pa.array([1.0, 20.0], pa.float64())})
    root = obj({"x": jr.alternatives(jr.number().max(10))})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False]
    assert res.violations.to_pylist()[0]["code"] == "number.max"  # passthrough

    # all-base: string input against number branches -> alternatives.types
    t2 = pa.table({"x": pa.array(["nope"], pa.string())})
    root2 = obj({"x": jr.alternatives(jr.number(), jr.number().integer())})
    res2 = compile_schema(root2, prefs={"abort_early": False}).validate_table(t2)
    v2 = res2.violations.to_pylist()
    assert v2[0]["code"] == "alternatives.types"
    assert "number" in v2[0]["message"]


def test_deep_path_dependencies():
    """Deep-path dependency peers/keys (test/types/object.js:3323-3460):
    with('a', 'b.c') and with('a.b', 'b.c') resolve through nested structs;
    separator=False treats dotted names as literal keys (:3455-3460)."""
    import numpy as np

    schema = obj({
        "a": jr.string(),
        "b": jr.object({"c": jr.string(), "d": jr.number()}),
    }).with_("a", "b.c")
    t = pa.table({
        "a": pa.array(["test", "test", None], pa.string()),
        "b": pa.array([{"c": "test2", "d": None}, {"c": None, "d": 80.0}, None],
                      pa.struct([("c", pa.string()), ("d", pa.float64())])),
    })
    res = compile_schema(schema, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False, True]
    assert "object.with" in set(res.violations.to_pandas()["code"])

    schema2 = obj({
        "a": jr.object({"b": jr.string()}),
        "b": jr.object({"c": jr.string()}),
    }).with_("a.b", "b.c")
    t2 = pa.table({
        "a": pa.array([{"b": "test"}, {"b": "test"}, {"b": None}],
                      pa.struct([("b", pa.string())])),
        "b": pa.array([{"c": "test2"}, {"c": None}, {"c": None}],
                      pa.struct([("c", pa.string())])),
    })
    res2 = compile_schema(schema2, prefs={"abort_early": False}).validate_table(t2)
    # row 3: main 'a.b' absent -> no requirement
    assert list(res2.ok) == [True, False, True]


def test_dependency_separator_false_literal_keys():
    schema = obj({
        "x.from": jr.string(),
        "x.url": jr.string(),
    }).with_("x.from", "x.url", separator=False)
    t = pa.table({
        "x.from": pa.array(["a@b.co", None], pa.string()),
        "x.url": pa.array([None, None], pa.string()),
    })
    res = compile_schema(schema, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [False, True]


def test_deep_path_dependency_nested_level():
    """Deps declared on a NESTED object node with deep-path peers."""
    inner = jr.object({
        "a": jr.string(),
        "b": jr.object({"c": jr.string()}),
    }).with_("a", "b.c")
    schema = obj({"o": inner})
    t = pa.table({
        "o": pa.array(
            [{"a": "x", "b": {"c": "y"}}, {"a": "x", "b": {"c": None}}],
            pa.struct([("a", pa.string()),
                       ("b", pa.struct([("c", pa.string())]))])),
    })
    res = compile_schema(schema, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False]
