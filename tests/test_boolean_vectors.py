"""Reference boolean-type test vectors ported from
/root/reference/test/types/boolean.js (fixtures extracted verbatim into
tests/fixtures/boolean_vectors.json; schema per block transcribed from the
corresponding `it()` blocks, lines cited per test)."""

import json
import os

import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj

FIX = json.load(open(os.path.join(os.path.dirname(__file__), "fixtures", "boolean_vectors.json")))

# Arrow null == undefined in the columnar model (SURVEY.md §1.4): joi
# treats JS null as a VALUE failing boolean.base, but a null cell in an
# Arrow column is 'missing' and passes an optional (or allow(null)) schema.
# Same documented design difference as the number/string vector suites.
DEVIATIONS = {
    (b, "None"): "Arrow null == undefined (missing), not the JS null value"
    for b in (
        "bool_required", "bool_allow_false", "bool_invalid_false",
        "bool_invalid_true_allow_false", "bool_truthy_Y", "bool_truthy_Y_Si",
        "bool_falsy_N", "bool_falsy_N_Never",
    )
}


def run_block(schema, block_name, column_type=None):
    cases = FIX[block_name]
    vals = [c[0] for c in cases]
    if column_type is None:
        column_type = (
            pa.string() if any(isinstance(v, str) for v in vals)
            else (pa.bool_() if all(v is None or isinstance(v, bool) for v in vals)
                  else pa.float64())
        )
    if pa.types.is_string(column_type):
        vals = [
            None if v is None
            else (v if isinstance(v, str)
                  else ("true" if v is True else "false" if v is False else str(v)))
            for v in vals
        ]
    arr = pa.array(vals, type=column_type)
    res = compile_schema(obj({"v": schema}), prefs={"abort_early": False}).validate_table(
        pa.table({"v": arr}))
    mismatches = [
        (cases[i][0], cases[i][1], bool(res.ok[i]))
        for i in range(len(cases))
        if bool(res.ok[i]) != cases[i][1] and (block_name, repr(cases[i][0])) not in DEVIATIONS
    ]
    assert not mismatches, f"{block_name}: {mismatches[:10]}"


def test_converts_boolean_string():  # boolean.js:24
    run_block(jr.boolean(), "bool_convert")


def test_strict_mode_no_convert():  # boolean.js:34
    run_block(jr.boolean().strict(), "bool_strict")


def test_errors_on_number():  # boolean.js:76
    run_block(jr.boolean(), "bool_number", pa.float64())


def test_truthy_without_convert():  # boolean.js:109
    res = compile_schema(
        obj({"v": jr.boolean().truthy("y")}), prefs={"convert": False}
    ).validate_table(pa.table({"v": pa.array(["y"])}))
    assert not bool(res.ok[0])


def test_falsy_without_convert():  # boolean.js:115
    res = compile_schema(
        obj({"v": jr.boolean().falsy("n")}), prefs={"convert": False}
    ).validate_table(pa.table({"v": pa.array(["n"])}))
    assert not bool(res.ok[0])


def test_required():  # boolean.js:299
    run_block(jr.boolean().required(), "bool_required")


def test_allow_false():  # boolean.js:326
    run_block(jr.boolean().allow(False), "bool_allow_false")


def test_invalid_false():  # boolean.js:352
    run_block(jr.boolean().invalid(False), "bool_invalid_false")


def test_invalid_false_allow_null():  # boolean.js:387
    run_block(jr.boolean().invalid(False).allow(None), "bool_invalid_false_allow_null")


def test_invalid_true_allow_false():  # boolean.js:414
    run_block(jr.boolean().invalid(True).allow(False), "bool_invalid_true_allow_false")


def test_invalid_true_allow_false_null():  # boolean.js:449
    run_block(
        jr.boolean().invalid(True).allow(False).allow(None),
        "bool_invalid_true_allow_false_null",
    )


def test_truthy_single():  # boolean.js:476
    run_block(jr.boolean().truthy("Y"), "bool_truthy_Y")


def test_truthy_array():  # boolean.js:504
    run_block(jr.boolean().truthy("Y", "Si"), "bool_truthy_Y_Si")


def test_falsy_single():  # boolean.js:533
    run_block(jr.boolean().falsy("N"), "bool_falsy_N")


def test_falsy_array():  # boolean.js:561
    run_block(jr.boolean().falsy("N", "Never"), "bool_falsy_N_Never")


def test_truthy_falsy_mixed():  # boolean.js:590
    run_block(
        jr.boolean().truthy("Y", "Si", 1).falsy("N", "Never", 0).allow(None).required(),
        "bool_truthy_falsy_mixed",
    )


def test_insensitive_default_and_explicit():  # boolean.js:152,158
    for schema in (jr.boolean().truthy("Y"), jr.boolean().truthy("Y").insensitive()):
        res = compile_schema(obj({"v": schema})).validate_table(
            pa.table({"v": pa.array(["y"])}))
        assert bool(res.ok[0])


def test_insensitive_false_strict_comparison():  # boolean.js:164
    res = compile_schema(obj({"v": jr.boolean().truthy("Y").insensitive(False)})).validate_table(
        pa.table({"v": pa.array(["y", "Y"])}))
    assert list(res.ok) == [False, True]


def test_sensitive_boolean_string_convert():  # boolean.js:188
    run_block(jr.boolean().insensitive(False), "bool_sensitive_convert")


def test_cast_number_and_string():  # boolean.js:123,130
    r = compile_schema(obj({"v": jr.boolean().cast("number")})).validate_table(
        pa.table({"v": pa.array([True, False])}))
    assert r.value["v"].to_pylist() == [1, 0]
    r = compile_schema(obj({"v": jr.boolean().cast("string")})).validate_table(
        pa.table({"v": pa.array([True, False])}))
    assert r.value["v"].to_pylist() == ["true", "false"]


def test_convert_normalizes_case_variants():  # boolean.js:24 (4th tuple slot)
    r = compile_schema(obj({"v": jr.boolean()})).validate_table(
        pa.table({"v": pa.array(["TrUe", "FalSe"])}))
    assert r.value["v"].to_pylist() == [True, False]
