"""FIXTURES.md §4: the reference's test semantics as *data* — a
``joi_conformance_cases`` table (case_id, suite, schema_json, input_json,
prefs_json, should_validate, expected_error_type) executed by one generic
runner, mirroring ``/root/reference/test/helper.js``'s quadruple format.
Cases are grouped by (schema, prefs) and validated as single Arrow columns.
"""

import json

import pyarrow as pa
import pytest

import joi_ray as jr
from joi_ray import compile_schema, from_json, object as jr_object

S = lambda s: s.to_json()  # noqa: E731

CASES = [
    # case_id, suite, schema_json, input(py), prefs, should_validate, expected_code
    ("any.required.0", "any", S(jr.string().required()), "x", {}, True, None),
    ("any.required.1", "any", S(jr.string().required()), None, {}, False, "any.required"),
    ("any.forbidden.0", "any", S(jr.string().forbidden()), "x", {}, False, "any.unknown"),
    ("any.valid.0", "any", S(jr.string().valid("a", "b")), "b", {}, True, None),
    ("any.valid.1", "any", S(jr.string().valid("a", "b")), "c", {}, False, "any.only"),
    ("any.invalid.0", "any", S(jr.string().invalid("x")), "x", {}, False, "any.invalid"),
    ("string.min.0", "string", S(jr.string().min(3)), "abc", {}, True, None),
    ("string.min.1", "string", S(jr.string().min(3)), "ab", {}, False, "string.min"),
    ("string.empty.0", "string", S(jr.string()), "", {}, False, "string.empty"),
    ("string.email.0", "string", S(jr.string().email()), "a@b.io", {}, True, None),
    ("string.email.1", "string", S(jr.string().email()), "nope", {}, False, "string.email"),
    ("string.uuid.0", "string", S(jr.string().guid()), "550e8400-e29b-41d4-a716-446655440000", {}, True, None),
    ("string.uuid.1", "string", S(jr.string().guid()), "not-a-uuid", {}, False, "string.guid"),
    ("string.ip.0", "string", S(jr.string().ip()), "127.0.0.1", {}, True, None),
    ("string.ip.1", "string", S(jr.string().ip()), "999.0.0.1", {}, False, "string.ip"),
    ("string.uri.0", "string", S(jr.string().uri()), "https://x.io/p", {}, True, None),
    ("string.pattern.0", "string", S(jr.string().pattern(r"^\d+$")), "123", {}, True, None),
    ("string.pattern.1", "string", S(jr.string().pattern(r"^\d+$")), "12a", {}, False, "string.pattern.base"),
    ("string.alphanum.0", "string", S(jr.string().alphanum()), "a1", {}, True, None),
    ("string.alphanum.1", "string", S(jr.string().alphanum()), "a 1", {}, False, "string.alphanum"),
    ("string.isoDate.0", "string", S(jr.string().iso_date()), "2024-06-01", {}, True, None),
    ("string.isoDate.1", "string", S(jr.string().iso_date()), "06/01/2024", {}, False, "string.isoDate"),
    ("number.base.0", "number", S(jr.number()), "12.5", {}, True, None),
    ("number.base.1", "number", S(jr.number()), "abc", {}, False, "number.base"),
    ("number.base.2", "number", S(jr.number()), "12.5", {"convert": False}, False, "number.base"),
    ("number.min.0", "number", S(jr.number().min(5)), 5, {}, True, None),
    ("number.min.1", "number", S(jr.number().min(5)), 4, {}, False, "number.min"),
    ("number.integer.0", "number", S(jr.number().integer()), 4.5, {}, False, "number.integer"),
    ("number.port.0", "number", S(jr.number().port()), 8080, {}, True, None),
    ("number.port.1", "number", S(jr.number().port()), 70000, {}, False, "number.port"),
    ("number.multiple.0", "number", S(jr.number().multiple(4)), 12, {}, True, None),
    ("number.multiple.1", "number", S(jr.number().multiple(4)), 13, {}, False, "number.multiple"),
    ("boolean.coerce.0", "boolean", S(jr.boolean()), "true", {}, True, None),
    ("boolean.coerce.1", "boolean", S(jr.boolean()), "banana", {}, False, "boolean.base"),
    ("boolean.truthy.0", "boolean", S(jr.boolean().truthy("Y")), "Y", {}, True, None),
    ("date.min.0", "date", S(jr.date().min("2020-01-01")), "2021-01-01", {}, True, None),
    ("date.min.1", "date", S(jr.date().min("2020-01-01")), "2019-01-01", {}, False, "date.min"),
    ("date.base.0", "date", S(jr.date()), "not a date", {}, False, "date.base"),
    # --- second tranche: strict modes, coercion rewrites, sets, shaping
    ("string.max.0", "string", S(jr.string().max(3)), "abcd", {}, False, "string.max"),
    ("string.length.0", "string", S(jr.string().length(3)), "abc", {}, True, None),
    ("string.length.1", "string", S(jr.string().length(3)), "ab", {}, False, "string.length"),
    ("string.token.0", "string", S(jr.string().token()), "ok_1", {}, True, None),
    ("string.token.1", "string", S(jr.string().token()), "no way", {}, False, "string.token"),
    ("string.hex.0", "string", S(jr.string().hex()), "0AfF", {}, True, None),
    ("string.hex.1", "string", S(jr.string().hex()), "0xg", {}, False, "string.hex"),
    ("string.hostname.0", "string", S(jr.string().hostname()), "srv-1.local", {}, True, None),
    ("string.hostname.1", "string", S(jr.string().hostname()), "-bad-", {}, False, "string.hostname"),
    ("string.domain.0", "string", S(jr.string().domain()), "sub.example.org", {}, True, None),
    ("string.domain.1", "string", S(jr.string().domain()), "localhost", {}, False, "string.domain"),
    ("string.b64.0", "string", S(jr.string().base64()), "YWJjZA==", {}, True, None),
    ("string.b64.1", "string", S(jr.string().base64()), "YWJjZA", {}, False, "string.base64"),
    ("string.duration.0", "string", S(jr.string().iso_duration()), "P3DT4H", {}, True, None),
    ("string.duration.1", "string", S(jr.string().iso_duration()), "3 days", {}, False, "string.isoDuration"),
    ("string.cc.0", "string", S(jr.string().credit_card()), "378282246310005", {}, True, None),
    ("string.cc.1", "string", S(jr.string().credit_card()), "378282246310006", {}, False, "string.creditCard"),
    ("string.trim.strict", "string", S(jr.string().trim()), " x ", {"convert": False}, False, "string.trim"),
    ("string.lower.strict", "string", S(jr.string().lowercase()), "ABC", {"convert": False}, False, "string.lowercase"),
    ("string.upper.strict", "string", S(jr.string().uppercase()), "abc", {"convert": False}, False, "string.uppercase"),
    ("string.datauri.0", "string", S(jr.string().data_uri()), "data:text/plain;base64,aGk=", {}, True, None),
    ("string.uri.rel", "string", S(jr.string().uri(relative_only=True)), "a/b", {}, True, None),
    ("string.uri.rel.1", "string", S(jr.string().uri(relative_only=True)), "http://x.io", {}, False, "string.uriRelativeOnly"),
    ("string.invalid.0", "string", S(jr.string().invalid("nope")), "nope", {}, False, "any.invalid"),
    ("string.insensitive", "string", S(jr.string().valid("YES").insensitive()), "yes", {}, True, None),
    ("number.greater.0", "number", S(jr.number().greater(0)), 0, {}, False, "number.greater"),
    ("number.less.0", "number", S(jr.number().less(10)), 10, {}, False, "number.less"),
    ("number.precision.strict", "number", S(jr.number().precision(1)), 1.25, {"convert": False}, False, "number.precision"),
    ("number.negative.0", "number", S(jr.number().negative()), -2, {}, True, None),
    ("number.negative.1", "number", S(jr.number().negative()), 2, {}, False, "number.negative"),
    ("number.unsafe.0", "number", S(jr.number()), float(2**54), {}, False, "number.unsafe"),
    ("number.unsafe.1", "number", S(jr.number().unsafe()), float(2**54), {}, True, None),
    ("number.nan", "number", S(jr.number()), float("nan"), {}, False, "number.base"),
    ("number.inf", "number", S(jr.number()), float("inf"), {}, False, "number.infinity"),
    ("number.allow0", "number", S(jr.number().min(1).allow(0)), 0, {}, True, None),
    ("boolean.strict", "boolean", S(jr.boolean()), "true", {"convert": False}, False, "boolean.base"),
    ("boolean.falsy", "boolean", S(jr.boolean().falsy("off")), "off", {}, True, None),
    ("date.greater.0", "date", S(jr.date().greater("2020-06-01")), "2020-06-01", {}, False, "date.greater"),
    ("date.less.0", "date", S(jr.date().less("2020-06-01")), "2020-05-31", {}, True, None),
    ("date.now", "date", S(jr.date().max("now")), "2090-01-01", {"now_ms": 1_700_000_000_000}, False, "date.max"),
    ("binary.coerce", "binary", S(jr.binary().min(3)), "hello", {}, True, None),
    ("binary.min", "binary", S(jr.binary().min(10)), "hi", {}, False, "binary.min"),
    ("any.default", "any", S(jr.string().default("d")), None, {}, True, None),
    ("any.empty", "any", S(jr.string().empty("-").required()), "-", {}, False, "any.required"),
    ("any.failover", "any", S(jr.number().min(10).failover(0)), 3, {}, True, None),
    ("any.forbidden.null", "any", S(jr.string().forbidden()), None, {}, True, None),
    ("any.ctx", "any", S(jr.number().max(jr.ref("$cap"))), 11, {"context": {"cap": 10}}, False, "number.max"),
    ("any.warn", "any", S(jr.string().min(9).warn()), "short", {}, True, None),
    # --- third tranche: interplay cases
    ("string.bytes.0", "string", S(jr.string().max(4, encoding="utf8")), "éé", {}, True, None),
    ("string.bytes.1", "string", S(jr.string().max(4, encoding="utf8")), "ééé", {}, False, "string.max"),
    ("string.trim.then.min", "string", S(jr.string().trim().min(3)), "  ab  ", {}, False, "string.min"),
    ("string.case.then.valid", "string", S(jr.string().lowercase().valid("abc")), "ABC", {}, True, None),
    ("string.invalid.insensitive", "string", S(jr.string().invalid("BAD").insensitive()), "bad", {}, False, "any.invalid"),
    ("string.replace.then.pattern", "string", S(jr.string().replace(r"-", "").pattern(r"^\d+$")), "1-2-3", {}, True, None),
    ("string.empty.allow", "string", S(jr.string().allow("")), "", {}, True, None),
    ("string.guid.brace.1", "string", S(jr.string().guid()), "{550e8400-e29b-41d4-a716-446655440000", {}, False, "string.guid"),
    ("number.port.string", "number", S(jr.number().port()), "8080", {}, True, None),
    # round-2 features
    ("r2.error.tmpl", "any", S(jr.number().min(5).error("need {#limit}, got less")), 1, {}, False, "number.min"),
    ("r2.guid.dashless", "string", S(jr.string().guid()), "550e8400e29b41d4a716446655440000", {}, True, None),
    ("r2.guid.colon", "string", S(jr.string().guid()), "550e8400:e29b:41d4:a716:446655440000", {}, True, None),
    ("r2.ip.vfuture", "string", S(jr.string().ip()), "v1.09azAZ-._~!$&'()*+,;=:", {}, True, None),
    ("r2.ip.cidr.range", "string", S(jr.string().ip()), "0.0.0.0/33", {}, False, "string.ip"),
    ("r2.uri.rfc.0", "string", S(jr.string().uri()), "http://a:b:c:d:e::1.2.3.4", {}, False, "string.uri"),
    ("r2.uri.rfc.1", "string", S(jr.string().uri()), "ldap://[2001:db8::7]/c=GB?objectClass?one", {}, True, None),
    ("r2.email.utf", "string", S(jr.string().email()), "\u00eajness@something.com", {}, True, None),
    ("r2.b64.nopad.padded", "string", S(jr.string().base64(padding_required=False)), "QQ==", {}, True, None),
    # week dates: regex-valid, so strict mode passes; convert mode runs the
    # JS-Date parse which yields Invalid Date -> error (string/index.js:103-115)
    ("r2.isodate.week", "string", S(jr.string().iso_date()), "2013-W23", {"convert": False}, True, None),
    ("r3.isodate.week.convert", "string", S(jr.string().iso_date()), "2013-W23", {}, False, "string.isoDate"),
    ("r3.isodate.ordinal.convert", "string", S(jr.string().iso_date()), "2013-184", {}, False, "string.isoDate"),
    ("r3.isodate.2400.convert", "string", S(jr.string().iso_date()), "2013-06-07T24:00", {}, True, None),
    ("r2.alt.types", "alternatives", S(jr.alternatives(jr.number(), jr.number().integer())), "zz", {}, False, "alternatives.types"),

    ("number.precision.convert", "number", S(jr.number().precision(1)), 2.25, {}, True, None),
    ("number.zero.multiple", "number", S(jr.number().multiple(5)), 0, {}, True, None),
    ("number.neg.integer", "number", S(jr.number().integer().negative()), -3, {}, True, None),
    ("date.unix.coerce", "date", S(jr.date().timestamp("unix").min("2000-01-01")), 1_700_000_000, {}, True, None),
    ("date.unix.coerce.1", "date", S(jr.date().timestamp("unix").min("2000-01-01")), 100, {}, False, "date.min"),
    ("boolean.int.no.truthy", "boolean", S(jr.boolean()), 1, {}, False, "boolean.base"),
    ("any.only.number.coerced", "number", S(jr.number().valid(5)), "5", {}, True, None),
    ("any.strip.still.validates", "any", S(jr.string().min(5).strip()), "ab", {}, False, "string.min"),
    ("any.raw.still.validates", "any", S(jr.string().lowercase().length(3).raw()), "ABC", {}, True, None),
]

CASES += [
    ("any.empty.schema", "any", S(jr.string().empty(jr.string().pattern(r"^\s*$"))), "   ", {}, True, None),
    ("string.replace.literal", "string", S(jr.string().replace("a.b", "Z").pattern(r"^Z$")), "a.b", {}, True, None),
    ("string.replace.literal.1", "string", S(jr.string().replace("a.b", "Z").pattern(r"^Z$")), "axb", {}, False, "string.pattern.base"),
]

NESTED_CASES = [
    # (case_id, schema, column(pyarrow), expected_ok_list, expected_codes)
    (
        "array.items",
        jr.array().items(jr.number().min(0)),
        pa.array([[1, 2], [-1]], type=pa.list_(pa.int64())),
        [True, False],
        {"number.min"},
    ),
    (
        "array.unique",
        jr.array().unique(),
        pa.array([[1, 2], [2, 2]], type=pa.list_(pa.int64())),
        [True, False],
        {"array.unique"},
    ),
    (
        "object.keys",
        jr.object({"a": jr.string().required()}),
        pa.array([{"a": "x"}, {"a": None}], type=pa.struct([("a", pa.string())])),
        [True, False],
        {"any.required"},
    ),
    (
        "alternatives.try",
        jr.alternatives(jr.string().length(1), jr.string().min(5)),
        pa.array(["a", "abc", "abcdef"]),
        [True, False, True],
        {"alternatives.match"},
    ),
    (
        "array.item.strip",
        jr.array().items(jr.string().valid("-").strip(), jr.string().min(2)),
        pa.array([["aa", "-"], ["x"]], type=pa.list_(pa.string())),
        [True, False],
        {"array.includes"},
    ),
]


def conformance_table() -> pa.Table:
    """The FIXTURES.md §4 table itself (available to external runners)."""
    return pa.table(
        {
            "case_id": pa.array([c[0] for c in CASES]),
            "suite": pa.array([c[1] for c in CASES]),
            "schema_json": pa.array([c[2] for c in CASES]),
            "input_json": pa.array([json.dumps(c[3]) for c in CASES]),
            "prefs_json": pa.array([json.dumps(c[4]) for c in CASES]),
            "should_validate": pa.array([c[5] for c in CASES]),
            "expected_error_type": pa.array([c[6] for c in CASES]),
        }
    )


@pytest.mark.parametrize("case", CASES, ids=[c[0] for c in CASES])
def test_conformance_case(case):
    case_id, suite, schema_json, input_val, prefs, should, code = case
    schema = from_json(schema_json)
    # manifest round-trip invariant on every case (test/helper.js:25-27)
    assert jr.build(schema.describe()) == schema
    tbl = pa.table({"x": pa.array([input_val])})
    cs = compile_schema(jr_object({"x": schema}), prefs={"abort_early": False, **prefs})
    res = cs.validate_table(tbl)
    assert bool(res.ok[0]) == should, res.violations.to_pylist()
    if not should and code:
        codes = [v["code"] for v in res.violations.to_pylist() if v["severity"] == "error"]
        assert code in codes, codes


@pytest.mark.parametrize("case", NESTED_CASES, ids=[c[0] for c in NESTED_CASES])
def test_nested_conformance_case(case):
    case_id, schema, col, expected_ok, expected_codes = case
    res = compile_schema(jr_object({"x": schema}), prefs={"abort_early": False}).validate_table(
        pa.table({"x": col})
    )
    assert list(res.ok) == expected_ok, res.violations.to_pylist()
    got = {v["code"] for v in res.violations.to_pylist()}
    assert expected_codes <= got


def test_fixture_table_shape():
    t = conformance_table()
    assert t.num_rows == len(CASES)
    assert set(t.column_names) == {
        "case_id", "suite", "schema_json", "input_json", "prefs_json",
        "should_validate", "expected_error_type",
    }
