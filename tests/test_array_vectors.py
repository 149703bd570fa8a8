"""Reference array test vectors — items/ordered/required/stripUnknown
semantics (reference: /root/reference/test/types/array.js, lines cited
per test).  Mixed-type JS arrays that Arrow list columns cannot hold are
re-expressed over a single value type with the same matching structure.
"""

import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj

LIST_STR = pa.list_(pa.string())
LIST_I64 = pa.list_(pa.int64())
LIST_BOOL = pa.list_(pa.bool_())


def run(schema_root, tbl, prefs=None):
    cs = compile_schema(schema_root, prefs={"abort_early": False, **(prefs or {})})
    return cs.validate_table(tbl)


def codes(res, row=None):
    vs = res.violations.to_pylist()
    return [v["code"] for v in vs if row is None or v["row"] == row]


# ------------------------------------------------- required occurrences
def test_duplicate_required_schemas_fail():
    # array.js:581-593 — two required duplicates of the same schema need
    # two distinct matching items; one 'four' -> 1 unknown miss
    t = pa.table({"x": pa.array([["one", "two", "three", "four"]], type=LIST_STR)})
    schema = jr.array().items(
        jr.string().valid("four").required(),
        jr.string().valid("four").required(),
        jr.string(),
    )
    res = run(obj({"x": schema}), t)
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["array.includesRequiredUnknowns"]
    assert "does not contain 1 required value(s)" in vs[0]["message"]


def test_duplicate_required_schemas_pass():
    # array.js:595-602
    t = pa.table({"x": pa.array([["one", "two", "three", "four", "four"]], type=LIST_STR)})
    schema = jr.array().items(
        jr.string().valid("four").required(),
        jr.string().valid("four").required(),
        jr.string(),
    )
    res = run(obj({"x": schema}), t)
    assert list(res.ok) == [True], res.violations.to_pylist()


def test_required_label_known_misses():
    # array.js:611-624 — labeled required schema miss renders the label
    t = pa.table({"x": pa.array([[True, False]], type=LIST_BOOL)})
    schema = jr.array().items(
        jr.string().required().label("required string"), jr.boolean()
    )
    res = run(obj({"x": schema}), t)
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["array.includesRequiredKnowns"]
    assert "does not contain [required string]" in vs[0]["message"]


def test_required_label_mixed_known_unknown():
    # array.js:626-644 — one labeled + one unlabeled miss -> Both
    t = pa.table({"x": pa.array([[True, False]], type=LIST_BOOL)})
    schema = jr.array().items(
        jr.string().required().label("required string"),
        jr.string().required(),
        jr.boolean(),
    )
    res = run(obj({"x": schema}), t)
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["array.includesRequiredBoth"]
    assert (
        "does not contain [required string] and 1 other required value(s)"
        in vs[0]["message"]
    )


def test_single_required_inclusion_empty_array():
    # array.js:341 fillMissedErrors fires even on an empty input array
    t = pa.table({"x": pa.array([[], ["a"]], type=LIST_STR)})
    schema = jr.array().items(jr.string().required())
    res = run(obj({"x": schema}), t)
    assert list(res.ok) == [False, True]
    assert codes(res, 0) == ["array.includesRequiredUnknowns"]


# --------------------------------------------------------- ordered
def test_ordered_length_single_row_error():
    # array.js:1150-1162 — extra items yield ONE row-level orderedLength
    # (pos = first beyond index), not one error per extra item
    t = pa.table({"x": pa.array([["a", "b", "c", "d", "e"]], type=LIST_STR)})
    schema = jr.array().ordered(jr.string(), jr.string())
    res = run(obj({"x": schema}), t)
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["array.orderedLength"]
    assert "must contain at most 2 items" in vs[0]["message"]


def test_ordered_length_with_item_error_abort_early_false():
    # array.js:1164-1185 — item error AND the single orderedLength both
    # surface with abortEarly=false
    t = pa.table({"x": pa.array([[1, 2, 3, 4, 5]], type=LIST_I64)})
    schema = jr.array().ordered(jr.string(), jr.number())
    res = run(obj({"x": schema}), t)
    got = codes(res)
    assert sorted(got) == ["array.orderedLength", "string.base"], got


def test_ordered_missing_required_slots():
    # array.js:1187-1199 — required ordered slots beyond the input length
    # are misses (unknown: no label)
    t = pa.table({"x": pa.array([["a"]], type=LIST_STR)})
    schema = jr.array().ordered(
        jr.string().required(), jr.string().pattern(r"^\d$").required()
    )
    res = run(obj({"x": schema}), t)
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["array.includesRequiredUnknowns"]
    assert "does not contain 1 required value(s)" in vs[0]["message"]


def test_ordered_missing_required_slot_labeled():
    t = pa.table({"x": pa.array([["a"], ["a", "b"]], type=LIST_STR)})
    schema = jr.array().ordered(
        jr.string().required(), jr.string().required().label("second")
    )
    res = run(obj({"x": schema}), t)
    assert list(res.ok) == [False, True]
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["array.includesRequiredKnowns"]
    assert "does not contain [second]" in vs[0]["message"]


def test_ordered_tail_single_items_actual_errors():
    # array.js:1201-1213 — items beyond the ordered prefix with a single
    # items() schema surface the item's ACTUAL error, not array.includes
    t = pa.table({"x": pa.array([["s1", "2", "3", "4", "s5"]], type=LIST_STR)})
    schema = jr.array().ordered(
        jr.string().required(), jr.string().required()
    ).items(jr.string().pattern(r"^\d+$"))
    res = run(obj({"x": schema}), t)
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["string.pattern.base"]
    assert vs[0]["item_index"] == 4


def test_single_inclusion_actual_errors_not_includes():
    # array.js:304-315 (jl === 1) — one non-required inclusion: failures
    # report the item schema's own error
    t = pa.table({"x": pa.array([["ab", "x"]], type=LIST_STR)})
    schema = jr.array().items(jr.string().max(1))
    res = run(obj({"x": schema}), t)
    vs = res.violations.to_pylist()
    assert [v["code"] for v in vs] == ["string.max"]
    assert vs[0]["item_index"] == 0


# --------------------------------------------------------- stripUnknown
def test_strip_unknown_plain_true_still_errors():
    # array.js:436-457 — stripUnknown: true (boolean form) does NOT strip
    # array items; unmatched items still error array.includes
    t = pa.table({"x": pa.array([["a", "zzz", "1"]], type=LIST_STR)})
    schema = jr.array().items(jr.string().max(1), jr.string().pattern(r"^\d+$"))
    res = run(obj({"x": schema}), t, prefs={"strip_unknown": True})
    assert codes(res) == ["array.includes"]


def test_strip_unknown_arrays_object_form_strips():
    # array.js:459-467 — stripUnknown: {arrays: true} silently drops
    # unmatched items from the output
    t = pa.table({"x": pa.array([["a", "zzz", "1"], ["a", "1"]], type=LIST_STR)})
    schema = jr.array().items(jr.string().max(1), jr.string().pattern(r"^\d+$"))
    res = run(
        obj({"x": schema}), t,
        prefs={"strip_unknown": {"arrays": True, "objects": False}},
    )
    assert list(res.ok) == [True, True], res.violations.to_pylist()
    out = res.value.column("x").to_pylist()
    assert out == [["a", "1"], ["a", "1"]]


# ------------------------------------------------- single() + JSON coerce
def test_single_wraps_json_unparseable_string():
    # array.js:36-49 + :67-74 — with single(), a string that is not a JSON
    # array is wrapped as [value] instead of erroring array.base
    t = pa.table({"x": pa.array(['["a","b"]', "plain"], type=pa.string())})
    schema = jr.array().items(jr.string()).single()
    res = run(obj({"x": schema}), t)
    assert list(res.ok) == [True, True], res.violations.to_pylist()
    assert res.value.column("x").to_pylist() == [["a", "b"], ["plain"]]
