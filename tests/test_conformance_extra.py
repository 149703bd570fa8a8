"""Additional conformance breadth: refs (sibling/ancestor/context), email
multiple, base64 variants, guid versions, ip cidr, concat interactions,
warnings+abort interplay, casts, deps on struct columns."""

import pyarrow as pa

import joi_ray as jr
from helper import check
from joi_ray import compile_schema, object as obj


def test_email_multiple():
    check(
        jr.string().email(multiple=True),
        [("a@b.com,c@d.org", True), ("a@b.com, bad", False, "string.email"), ("a@b.com", True)],
    )
    check(
        jr.string().email(multiple=True, separator=";"),
        [("a@b.com;c@d.org", True), ("a@b.com,c@d.org", False)],
    )


def test_base64_variants():
    check(jr.string().base64(url_safe=True, padding_required=False), [("aGVsbG8", True), ("-_", True)])
    check(jr.string().base64(), [("aGVsbG8==", False)])  # wrong padding count


def test_guid_brackets_and_versions():
    check(
        jr.string().guid(version=[1, 4]),
        [
            ("550e8400-e29b-11d4-a716-446655440000", True),   # v1
            ("550e8400-e29b-41d4-a716-446655440000", True),   # v4
            ("550e8400-e29b-21d4-a716-446655440000", False),  # v2
            ("[550e8400-e29b-41d4-a716-446655440000]", True),
        ],
    )


def test_ip_forms():
    check(jr.string().ip(version=["ipv6"]), [("::1", True), ("10.0.0.1", False, "string.ipVersion")])
    check(jr.string().ip(), [("::ffff:10.0.0.1", True)])


def test_sibling_ancestor_context_refs():
    # sibling within struct + ancestor from list items to row columns
    span_t = pa.list_(pa.struct([("lo", pa.int64()), ("hi", pa.int64())]))
    t = pa.table(
        {
            "cap": [10.0, 5.0],
            "ranges": pa.array([[{"lo": 1, "hi": 3}], [{"lo": 2, "hi": 9}]], type=span_t),
        }
    )
    # joi dot convention (ref.js:40-66): '..cap' == 'cap' (sibling);
    # '...cap' climbs one object level — here the table root
    span = jr.object({"lo": jr.number(), "hi": jr.number().min(jr.ref("lo")).max(jr.ref("...cap"))})
    res = compile_schema(obj({"cap": jr.number(), "ranges": jr.array().items(span)}),
                         prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False]
    assert res.violations.to_pylist()[0]["code"] == "number.max"

    # context ref in valid set
    check(
        jr.string().valid(jr.ref("$env")),
        [("prod", True), ("dev", False, "any.only")],
        prefs={"context": {"env": "prod"}},
    )


def test_ref_resolving_to_array_is_membership():
    # lib/values.js:127-136 - a ref that resolves to an array matches any item
    check(
        jr.string().valid(jr.ref("$allowed")),
        [("a", True), ("b", True), ("c", False, "any.only")],
        prefs={"context": {"allowed": ["a", "b"]}},
    )
    check(
        jr.number().invalid(jr.ref("$banned")),
        [(1, False, "any.invalid"), (3, True)],
        prefs={"context": {"banned": [1, 2]}},
    )


def test_concat_flags_and_valids():
    a = jr.string().valid("x")
    b = jr.string().valid("y")
    check(a.concat(b), [("x", True), ("y", True), ("z", False, "any.only")])
    req = jr.any_().required()
    s = jr.string().concat(req)
    check(s, [(None, False, "any.required")])


def test_warn_does_not_fail_but_reports():
    res = check(jr.string().min(5).warn().max(2), [("abc", False, "string.max")], abort_early=False)
    v = res.violations.to_pylist()
    sev = {(x["code"], x["severity"]) for x in v}
    assert ("string.min", "warn") in sev and ("string.max", "error") in sev


def test_casts_date_and_binary():
    import datetime

    res = check(jr.date().cast("number"), [("2024-01-01", True)])
    assert res.value["x"].to_pylist() == [int(datetime.datetime(2024, 1, 1).timestamp() * 1000)]
    res = check(jr.binary().cast("string"), [("hi", True)])
    assert res.value["x"].to_pylist() == ["hi"]


def test_deps_inside_struct_column():
    st = pa.struct([("a", pa.string()), ("b", pa.string())])
    t = pa.table({"o": pa.array([{"a": "1", "b": None}, {"a": None, "b": None}], type=st)})
    s = jr.object({"o": jr.object({"a": jr.string(), "b": jr.string()}).xor("a", "b")})
    res = compile_schema(s, prefs={"abort_early": False}).validate_table(t)
    assert list(res.ok) == [True, False]
    # neither peer present -> object.missing (reference object.js:866-868)
    assert res.violations.to_pylist()[0]["code"] == "object.missing"


def test_number_string_coerce_then_rules():
    res = check(jr.number().integer().min(3), [("4", True), ("2", False, "number.min"), ("4.5", False, "number.integer")])
    assert res.value["x"].to_pylist()[0] == 4.0


def test_empty_list_required_vs_min():
    t = pa.table({"x": pa.array([[], None], type=pa.list_(pa.int64()))})
    res = compile_schema(obj({"x": jr.array().required()})).validate_table(t)
    assert list(res.ok) == [True, False]  # [] is present; null is missing


def test_violation_message_rendering():
    res = check(jr.string().min(4), [("ab", False)])
    msg = res.violations.to_pylist()[0]["message"]
    assert msg == '"x" length must be at least 4 characters long'


def test_na_by_design():
    import pytest

    with pytest.raises(NotImplementedError):
        jr.symbol()
    with pytest.raises(NotImplementedError):
        jr.function_()
