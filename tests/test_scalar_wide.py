"""FIXTURES.md §5: the `scalar_wide` table — one flat table driving the
column-rule kernels directly, with expectations as (row_idx, column,
expected_error_type) triples."""

import datetime

import pyarrow as pa

import joi_ray as jr
from joi_ray import compile_schema, object as obj


def scalar_wide() -> pa.Table:
    return pa.table(
        {
            "s_plain": pa.array(["hello", "", "ok", None]),
            "s_email": pa.array(["a@b.io", "nope", "c@d.org", None]),
            "s_uuid": pa.array(
                ["550e8400-e29b-41d4-a716-446655440000", "bad", None, "550e8400-e29b-41d4-a716-446655440001"]
            ),
            "s_ip": pa.array(["10.0.0.1", "999.9.9.9", "::1", None]),
            "s_uri": pa.array(["https://x.io", "not a uri", None, "ftp://h/f"]),
            "s_hex": pa.array(["deadbeef", "xyz", None, "0F"]),
            "s_b64": pa.array(["aGVsbG8=", "!!!", None, "YQ=="]),
            "s_iso_date": pa.array(["2024-01-01", "13/13/2024", None, "2024-06-01T10:00:00Z"]),
            "n_f64": pa.array([1.5, -3.0, None, 10.0]),
            "n_i64": pa.array([3, 4, None, -7], pa.int64()),
            "n_port": pa.array([80, 70000, None, 443], pa.int64()),
            "b": pa.array([True, None, False, True]),
            "d_ms": pa.array(
                [datetime.datetime(2024, 1, 1), datetime.datetime(1990, 1, 1), None, datetime.datetime(2024, 6, 1)],
                pa.timestamp("ms"),
            ),
            "bin": pa.array([b"abc", b"x", None, b"abcdef"], pa.binary()),
            "peer_a": pa.array(["set", None, "set", None]),
            "peer_b": pa.array([None, "set", "set", None]),
            "lim": pa.array([1, -5, 0, 99], pa.int64()),
        }
    )


EXPECTED = {
    (1, "s_plain", "string.empty"),
    (1, "s_email", "string.email"),
    (1, "s_uuid", "string.guid"),
    (1, "s_ip", "string.ip"),
    (1, "s_uri", "string.uri"),
    (1, "s_hex", "string.hex"),
    (1, "s_b64", "string.base64"),
    (1, "s_iso_date", "string.isoDate"),
    (1, "n_port", "number.port"),
    (1, "d_ms", "date.min"),          # before 2000-01-01
    (1, "bin", "binary.min"),          # < 2 bytes
    (3, "n_i64", "number.min"),        # negative vs min(0)
    (3, "n_f64", "number.min"),        # 10.0 < lim=99 -> fails min(ref("lim"))
}


def test_scalar_wide_matrix():
    tbl = scalar_wide()
    schema = obj(
        {
            "s_plain": jr.string(),
            "s_email": jr.string().email(),
            "s_uuid": jr.string().guid(),
            "s_ip": jr.string().ip(),
            "s_uri": jr.string().uri(),
            "s_hex": jr.string().hex(),
            "s_b64": jr.string().base64(),
            "s_iso_date": jr.string().iso_date(),
            "n_f64": jr.number().min(jr.ref("lim")),
            "n_i64": jr.number().integer().min(0),
            "n_port": jr.number().port(),
            "b": jr.boolean(),
            "d_ms": jr.date().min("2000-01-01"),
            "bin": jr.binary().min(2),
            "peer_a": jr.string(),
            "peer_b": jr.string(),
            "lim": jr.number(),
        }
    ).xor("peer_a", "peer_b")
    res = compile_schema(schema, prefs={"abort_early": False}).validate_table(tbl)
    got = {
        (v["row"], v["path"], v["code"])
        for v in res.violations.to_pylist()
        if v["severity"] == "error" and v["path"] != ""
    }
    missing = EXPECTED - got
    assert not missing, f"expected violations not produced: {missing}"
    # xor dependency: row 2 has both peers (conflict -> object.xor), row 3
    # has neither (-> object.missing, reference object.js:866-868)
    dep = {(v["row"], v["code"]) for v in res.violations.to_pylist() if v["path"] == ""}
    assert (2, "object.xor") in dep and (3, "object.missing") in dep
    # clean cells produced no errors
    assert (0, "s_email", "string.email") not in got
    assert (0, "n_f64", "number.min") not in got  # 1.5 >= lim=1
