"""Reference number-type test vectors ported from
/root/reference/test/types/number.js (fixtures extracted verbatim into
tests/fixtures/number_vectors.json; schema per block transcribed from the
corresponding `it()` blocks)."""

import json
import math
import os

import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj

FIX = json.load(open(os.path.join(os.path.dirname(__file__), "fixtures", "number_vectors.json")))

# Arrow null == undefined in the columnar model (SURVEY.md §1.4): joi
# treats JS null as a VALUE failing number.base, but a null cell in an
# Arrow column is 'missing' and passes an optional schema.  Documented
# design difference, not a bug.
DEVIATIONS: dict[tuple, str] = {
    (b, "None"): "Arrow null == undefined (missing), not the JS null value"
    for b in ("num_integer", "num_min_max", "num_min_positive",
              "num_max_positive", "num_min_negative")
}


def _decode(v):
    if v == "___Inf":
        return math.inf
    if v == "___-Inf":
        return -math.inf
    return v


def run_block(schema, block_name, column_type=None):
    cases = [(_decode(v), e) for v, e in FIX[block_name]]
    vals = [c[0] for c in cases]
    if column_type is None:
        # mixed numeric/string inputs -> string column exercises the
        # coercion path; numeric-only -> float64
        column_type = pa.string() if any(isinstance(v, str) for v in vals) else pa.float64()
    if pa.types.is_string(column_type):
        vals = [None if v is None else (str(v) if not isinstance(v, str) else v) for v in vals]
    arr = pa.array(vals, type=column_type)
    res = compile_schema(obj({"v": schema}), prefs={"abort_early": False}).validate_table(
        pa.table({"v": arr}))
    mismatches = [
        (cases[i][0], cases[i][1], bool(res.ok[i]))
        for i in range(len(cases))
        if bool(res.ok[i]) != cases[i][1] and (block_name, repr(cases[i][0])) not in DEVIATIONS
    ]
    assert not mismatches, f"{block_name}: {mismatches[:10]}"


def test_multiple_int():
    run_block(jr.number().multiple(3), "num_multiple_int")


def test_multiple_float():
    run_block(jr.number().multiple(3.5), "num_multiple_float")


def test_integer():
    run_block(jr.number().integer(), "num_integer")


def test_infinity_rejected():
    run_block(jr.number(), "num_infinity")


def test_decimal():
    run_block(jr.number(), "num_decimal")


def test_string_numbers():
    run_block(jr.number(), "num_string_numbers", column_type=pa.string())


def test_min_max():
    run_block(jr.number().min(8).max(10), "num_min_max")


def test_min_positive():
    run_block(jr.number().min(-3).positive(), "num_min_positive")


def test_max_positive():
    run_block(jr.number().max(5).positive(), "num_max_positive")


def test_min_negative():
    run_block(jr.number().min(-3).negative(), "num_min_negative")


def test_precision_converts():
    # validity + converted values from test/types/number.js:1027-1040
    t = pa.table({"v": pa.array(["1.5", "0.12345", "123456", "123456.123456"], pa.string())})
    res = compile_schema(obj({"v": jr.number().precision(4)}), prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True] * 4
    assert res.value["v"].to_pylist() == [1.5, 0.1235, 123456.0, 123456.1235]
