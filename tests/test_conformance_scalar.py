"""Number / boolean / date / binary conformance
(reference: /root/reference/test/types/{number,boolean,date,binary}.js)."""

import pyarrow as pa

import joi_ray as jr
from helper import check


# ---------------------------------------------------------------- number
def test_number_compare():
    check(jr.number().min(3), [(3.0, True), (2.9, False, "number.min"), (None, True)])
    check(jr.number().max(3), [(3.0, True), (3.1, False, "number.max")])
    check(jr.number().greater(3), [(3.0, False, "number.greater"), (3.1, True)])
    check(jr.number().less(3), [(3.0, False, "number.less"), (2.9, True)])


def test_number_integer_multiple():
    check(jr.number().integer(), [(3.0, True), (3.5, False, "number.integer")])
    check(jr.number().multiple(3), [(9.0, True), (10.0, False, "number.multiple"), (0.0, True)])
    check(jr.number().multiple(0.5), [(2.5, True), (2.7, False)])


def test_number_port_sign_precision():
    check(jr.number().port(), [(80.0, True), (65536.0, False, "number.port"), (-1.0, False), (1.5, False)])
    check(jr.number().positive(), [(1.0, True), (0.0, False, "number.positive"), (-1.0, False)])
    check(jr.number().negative(), [(-1.0, True), (1.0, False, "number.negative")])
    res = check(jr.number().precision(2), [(1.234, True)])
    assert res.value["x"].to_pylist() == [1.23]  # convert-mode rounding
    check(jr.number().precision(2), [(1.234, False, "number.precision"), (1.23, True)], prefs={"convert": False})


def test_number_coerce_and_base():
    res = check(jr.number(), [("5", True), ("5.5", True), ("abc", False, "number.base"), (None, True)])
    assert res.value["x"].to_pylist() == [5.0, 5.5, None, None]
    check(jr.number(), [("5", False, "number.base")], prefs={"convert": False})
    check(jr.number(), [(float("nan"), False, "number.base"), (1.0, True)])
    check(jr.number(), [(float("inf"), False, "number.infinity")])
    check(jr.number(), [(2.0**53, False, "number.unsafe"), (2.0**53 - 1, True)])
    check(jr.number().unsafe(), [(2.0**53, True)])


def test_number_valid_invalid():
    check(jr.number().valid(1, 2), [(1.0, True), (3.0, False, "any.only")])
    check(jr.number().invalid(13), [(13.0, False, "any.invalid"), (14.0, True)])
    # allow short-circuits later rules
    check(jr.number().min(10).allow(0), [(0.0, True), (5.0, False, "number.min"), (10.0, True)])


# ---------------------------------------------------------------- boolean
def test_boolean_coerce():
    res = check(jr.boolean(), [("true", True), ("FALSE", True), ("yes", False, "boolean.base"), (None, True)])
    assert res.value["x"].to_pylist() == [True, False, None, None]
    check(jr.boolean().truthy("yes").falsy("no"), [("yes", True), ("no", True), ("maybe", False)])
    check(jr.boolean(), [("true", False, "boolean.base")], prefs={"convert": False})


def test_boolean_numeric_truthy():
    check(jr.boolean().truthy(1).falsy(0), [(1, True), (0, True), (2, False, "boolean.base")], column_type=pa.int64())


# ---------------------------------------------------------------- date
def test_date_coerce_string():
    res = check(jr.date(), [("2024-01-15", True), ("2024-01-15T10:30:00", True), ("nope", False, "date.base")])
    vals = res.value["x"].to_pylist()
    assert vals[0].year == 2024 and vals[2] is None


def test_date_epoch_and_compare():
    # epoch ms (javascript format, the default for numeric input)
    check(jr.date().timestamp(), [(1_700_000_000_000, True)], column_type=pa.int64())
    check(
        jr.date().min("2024-01-01"),
        [("2024-06-01", True), ("2023-06-01", False, "date.min")],
    )
    check(
        jr.date().max("2024-01-01").greater("2020-01-01"),
        [("2022-01-01", True), ("2024-06-01", False, "date.max"), ("2019-01-01", False, "date.greater")],
    )
    # 'now' bound at compile time via prefs
    check(
        jr.date().less("now"),
        [("2000-01-01", True), ("2090-01-01", False, "date.less")],
        prefs={"now_ms": 1_700_000_000_000},
    )


def test_date_timestamp_column():
    import datetime

    arr = pa.array([datetime.datetime(2024, 1, 1), datetime.datetime(2025, 1, 1)], type=pa.timestamp("us"))
    tbl = pa.table({"x": arr})
    cs = jr.compile_schema(jr.object({"x": jr.date().max("2024-06-01")}))
    res = cs.validate_table(tbl)
    assert list(res.ok) == [True, False]


# ---------------------------------------------------------------- binary
def test_binary_length():
    check(
        jr.binary().min(2).max(4),
        [(b"abc", True), (b"a", False, "binary.min"), (b"abcde", False, "binary.max")],
        column_type=pa.binary(),
    )
    check(jr.binary().length(3), [(b"abc", True), (b"ab", False, "binary.length")], column_type=pa.binary())


def test_binary_coerce_from_string():
    res = check(jr.binary(), [("hello", True)])
    assert res.value["x"].to_pylist() == [b"hello"]
    # Node Buffer.from is LENIENT (node-verified): invalid base64/hex
    # decode to whatever valid prefix/subset exists — never binary.base
    res = check(jr.binary().encoding("base64"), [("aGk=", True), ("!!!", True)])
    assert res.value["x"].to_pylist() == [b"hi", b""]
    res = check(jr.binary().encoding("hex"), [("6869", True), ("zz", True)])
    assert res.value["x"].to_pylist() == [b"hi", b""]


def test_date_ref_limit_cross_column():
    import datetime

    t = pa.table(
        {
            "start": pa.array([datetime.datetime(2024, 1, 1), datetime.datetime(2024, 6, 1)], pa.timestamp("ms")),
            "end": pa.array([datetime.datetime(2024, 2, 1), datetime.datetime(2024, 5, 1)], pa.timestamp("ms")),
        }
    )
    s = jr.object({"start": jr.date(), "end": jr.date().min(jr.ref("start"))})
    res = jr.compile_schema(s, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False]
    assert res.violations.to_pylist()[0]["code"] == "date.min"


def test_date_iso_rejects_numeric():
    check(jr.date().iso(), [("2024-01-01", True)])
    # format=iso failures carry date.isoDate (date.js:48)
    check(jr.date().iso(), [(1_700_000_000_000, False, "date.isoDate")], column_type=pa.int64())


def test_boolean_truthy_case_sensitivity():
    """Reference boolean truthy case handling (test/types/boolean.js:152-176):
    insensitive by default, strict with insensitive(False)."""
    check(jr.boolean().truthy("Y"), [("y", True), ("Y", True), ("TrUe", True)])
    check(jr.boolean().truthy("Y").insensitive(), [("y", True)])
    check(
        jr.boolean().truthy("Y").insensitive(False),
        [("y", False, "boolean.base"), ("Y", True), ("true", True), ("TRUE", False)],
    )


def test_binary_valid_buffer_content():
    """binary().valid(buffer) matches both coerced strings and buffers
    (test/types/binary.js:32-50)."""
    import pyarrow as pa

    from joi_ray import compile_schema, object as obj

    root = obj({"b": jr.binary().valid(b"hello")})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(
        pa.table({"b": pa.array(["hello", "goodbye"], pa.string())}))
    assert list(res.ok) == [True, False]
    assert res.violations.to_pylist()[0]["code"] == "any.only"
    res2 = compile_schema(root, prefs={"abort_early": False}).validate_table(
        pa.table({"b": pa.array([b"hello", b"nope"], pa.binary())}))
    assert list(res2.ok) == [True, False]


def test_date_numeric_strings_default_format():
    """Default (javascript) date format accepts numeric strings as
    ms-epochs (date.js:178-183); iso() still rejects them
    (test/types/date.js:200-252 'validates greater' vectors)."""
    import pyarrow as pa

    from joi_ray import compile_schema, object as obj

    root = obj({"d": jr.date().greater("2000-01-01T00:00:00Z")})
    t = pa.table({"d": pa.array(
        ["2001-01-01", "2000-01-01T00:00:00Z", "0", "-1", "1999-01-01", "978307200001"],
        pa.string())})
    res = compile_schema(root, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False, False, False, False, True]
    assert all(v["code"] == "date.greater" for v in res.violations.to_pylist())
    r2 = compile_schema(obj({"d": jr.date().iso()}), prefs={"abort_early": False}).validate_table(
        pa.table({"d": pa.array(["123456", "2024-01-01"], pa.string())}))
    assert list(r2.ok) == [False, True]
