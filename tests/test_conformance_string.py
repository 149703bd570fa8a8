"""String-type conformance (reference semantics: /root/reference/test/types/string.js,
~263 cases).  Each block mirrors a rule family's quadruple table."""

import joi_ray as jr
from helper import check


def test_base_and_empty():
    check(
        jr.string(),
        [
            ("hello", True),
            ("", False, "string.empty"),
            (None, True),  # optional by default
        ],
    )
    check(jr.string().allow(""), [("", True), ("x", True)])
    check(jr.string().required(), [(None, False, "any.required"), ("x", True)])


def test_min_max_length():
    check(
        jr.string().min(3),
        [("abc", True), ("ab", False, "string.min"), ("abcd", True)],
    )
    check(
        jr.string().max(3),
        [("abc", True), ("abcd", False, "string.max")],
    )
    check(
        jr.string().length(2),
        [("ab", True), ("a", False, "string.length"), ("abc", False, "string.length")],
    )


def test_pattern():
    check(
        jr.string().pattern(r"^[a-z]+$"),
        [("abc", True), ("aBc", False, "string.pattern.base"), ("123", False)],
    )
    check(
        jr.string().pattern(r"^[a-z]+$", invert=True),
        [("ABC", True), ("abc", False, "string.pattern.invert.base")],
    )
    check(
        jr.string().pattern(r"\d", name="digits"),
        [("a1", True), ("aa", False, "string.pattern.name")],
    )


def test_char_classes():
    check(jr.string().alphanum(), [("abc123", True), ("a b", False, "string.alphanum"), ("a-b", False)])
    check(jr.string().token(), [("a_b1", True), ("a-b", False, "string.token")])
    check(jr.string().hex(), [("deadBEEF", True), ("xyz", False, "string.hex")])


def test_base64():
    check(
        jr.string().base64(),
        [("aGVsbG8=", True), ("aGVsbG8", False, "string.base64"), ("!!!", False)],
    )
    check(jr.string().base64(padding_required=False), [("aGVsbG8", True)])
    check(jr.string().base64(url_safe=True), [("aGVsbG8=", True), ("-_12", True)])


def test_email():
    check(
        jr.string().email(),
        [
            ("joe@example.com", True),
            ("a.b+c@sub.domain.org", True),
            ("not-an-email", False, "string.email"),
            ("@missing.local", False),
            ("x@nodot", False),
        ],
    )
    check(
        jr.string().email(tlds=["com", "org"]),
        [("a@b.com", True), ("a@b.net", False, "string.email")],
    )


def test_guid():
    check(
        jr.string().guid(),
        [
            ("550e8400-e29b-41d4-a716-446655440000", True),
            ("{550e8400-e29b-41d4-a716-446655440000}", True),
            # dash-less 32-hex IS a valid guid (separator optional,
            # lib/types/string/index.js:346; test vector :10399)
            ("550e8400e29b41d4a716446655440000", True),
            ("zzze8400-e29b-41d4-a716-446655440000", False),
        ],
    )
    check(
        jr.string().guid(version=[4]),
        [
            ("550e8400-e29b-41d4-a716-446655440000", True),
            ("550e8400-e29b-31d4-a716-446655440000", False, "string.guid"),
        ],
    )


def test_ip():
    check(
        jr.string().ip(),
        [
            ("192.168.0.1", True),
            ("256.1.1.1", False, "string.ip"),
            ("2001:db8::8a2e:370:7334", True),
            ("10.0.0.0/8", True),
            ("banana", False),
        ],
    )
    check(
        jr.string().ip(version=["ipv4"], cidr="forbidden"),
        [("10.0.0.1", True), ("10.0.0.0/8", False, "string.ipVersion"), ("::1", False)],
    )
    check(jr.string().ip(cidr="required"), [("10.0.0.0/8", True), ("10.0.0.1", False)])


def test_uri():
    check(
        jr.string().uri(),
        [
            ("https://example.com/a?b=1", True),
            ("ftp://host/file", True),
            ("not a uri", False, "string.uri"),
            ("/relative/only", False),
        ],
    )
    check(jr.string().uri(scheme=["https"]), [("https://x.io", True), ("http://x.io", False, "string.uriCustomScheme")])
    check(jr.string().uri(allow_relative=True), [("/relative", True), ("https://x.io", True)])
    check(jr.string().uri(relative_only=True), [("/relative", True), ("https://x.io", False, "string.uriRelativeOnly")])


def test_hostname_domain():
    check(jr.string().hostname(), [("example.com", True), ("under_score", False, "string.hostname"), ("a-b.c", True)])
    check(jr.string().domain(), [("example.com", True), ("nodots", False, "string.domain")])


def test_iso_date_duration():
    check(
        jr.string().iso_date(),
        [
            ("2024-01-15", True),
            ("2024-01-15T10:30:00Z", True),
            ("2024-13-45", False, "string.isoDate"),
            ("15/01/2024", False),
        ],
    )
    check(
        jr.string().iso_duration(),
        [("P1Y2M3D", True), ("PT5M", True), ("P", False, "string.isoDuration"), ("P1DT", False), ("1Y", False)],
    )


def test_credit_card():
    check(
        jr.string().credit_card(),
        [
            ("4111111111111111", True),   # Visa test number (Luhn-valid)
            ("4111111111111112", False, "string.creditCard"),
            ("abcd", False),
        ],
    )


def test_case_trim_convert_and_strict():
    res = check(jr.string().lowercase(), [("ABC", True), ("abc", True)])
    assert res.value["x"].to_pylist() == ["abc", "abc"]
    check(jr.string().lowercase(), [("ABC", False, "string.lowercase"), ("abc", True)], prefs={"convert": False})
    res = check(jr.string().trim(), [("  x  ", True)])
    assert res.value["x"].to_pylist() == ["x"]
    check(jr.string().trim(), [(" x", False, "string.trim"), ("x", True)], prefs={"convert": False})
    res = check(jr.string().uppercase(), [("abc", True)])
    assert res.value["x"].to_pylist() == ["ABC"]


def test_replace_truncate():
    import re

    res = check(jr.string().replace(re.compile(r"\s+"), " "), [("a   b", True)])
    assert res.value["x"].to_pylist() == ["a b"]
    res = check(jr.string().replace("a.b", "X"), [("a.b c", True)])
    assert res.value["x"].to_pylist() == ["X c"]  # plain strings replace literally
    res = check(jr.string().max(3).truncate(), [("abcdef", True)])
    assert res.value["x"].to_pylist() == ["abc"]


def test_data_uri():
    check(
        jr.string().data_uri(),
        [("data:image/png;base64,iVBORw0K", True), ("plain", False, "string.dataUri")],
    )


def test_valid_insensitive():
    check(
        jr.string().valid("A", "B").insensitive(),
        [("a", True), ("B", True), ("c", False, "any.only")],
    )
    check(jr.string().valid("A"), [("a", False, "any.only"), ("A", True)])


def test_ref_limits():
    import pyarrow as pa
    from joi_ray import compile_schema, object as obj

    schema = obj({"lim": jr.number(), "x": jr.string().min(jr.ref("lim"))})
    tbl = pa.table({"lim": [2.0, 5.0], "x": ["abc", "abc"]})
    res = compile_schema(schema).validate_table(tbl)
    assert list(res.ok) == [True, False]
