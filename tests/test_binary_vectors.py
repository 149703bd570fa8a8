"""Reference binary-type vectors, ported from
/root/reference/test/types/binary.js (all `Helper.validate` blocks plus the
constructor/arg asserts; lines cited per test).

Columnar mapping: JS Buffer == Arrow binary cell; JS string input == Arrow
string cell (coerced in convert mode, rejected in strict — binary.js:127-136).
"""

import base64

import pyarrow as pa
import pytest

import joi_ray as jr
from joi_ray import compile_schema
from joi_ray import object as obj


def run(schema, vals, typ, prefs=None):
    res = compile_schema(
        obj({"v": schema}), prefs={"abort_early": False, **(prefs or {})}
    ).validate_table(pa.table({"v": pa.array(vals, type=typ)}))
    errs = [x for x in res.violations.to_pylist() if x["severity"] == "error"]
    return list(res.ok), errs


def test_converts_string_to_buffer():  # binary.js:24-30
    out = jr.attempt(pa.table({"v": ["test"]}), obj({"v": jr.binary()}))
    assert out["v"].type == pa.binary()
    assert out["v"][0].as_py() == b"test"


def test_validates_allowed_buffer_content():  # binary.js:32-69
    schema = jr.binary().valid(b"hello")
    ok, errs = run(schema, ["hello", "goodbye"], pa.string())
    assert ok == [True, False]
    ok, errs = run(schema, [b"hello", b"goodbye", b"HELLO"], pa.binary())
    assert ok == [True, False, False]
    # message renders the buffer utf8, not a repr (binary.js:42)
    assert errs[0]["code"] == "any.only"
    assert errs[0]["message"] == '"v" must be one of [hello]'


def test_cast_to_string():  # binary.js:73-87
    out = jr.attempt(
        pa.table({"a": pa.array([b"test"], pa.binary())}),
        obj({"a": jr.binary().cast("string")}),
    )
    assert out["a"].type in (pa.string(), pa.large_string())
    assert out["a"][0].as_py() == "test"


def test_cast_ignores_null():  # binary.js:89-93
    out = jr.attempt(
        pa.table({"a": pa.array([None], pa.binary())}),
        obj({"a": jr.binary().allow(None).cast("string")}),
    )
    assert out["a"][0].as_py() is None


def test_cast_does_not_leak_to_any():  # binary.js:101-104
    with pytest.raises(Exception):
        compile_schema(obj({"a": jr.any_().cast("string")}))


def test_non_buffer_non_string_is_base_error():  # binary.js:109-119
    ok, errs = run(jr.binary(), [5], pa.int64())
    assert ok == [False]
    assert errs[0]["code"] == "binary.base"
    assert errs[0]["message"] == '"v" must be a buffer or a string'


def test_accepts_buffer_in_strict_mode():  # binary.js:127-131
    ok, _ = run(jr.binary().strict(), [b"hello world"], pa.binary())
    assert ok == [True]


def test_rejects_strings_in_strict_mode():  # binary.js:133-136
    ok, errs = run(jr.binary().strict(), ["hello world"], pa.string())
    assert ok == [False]
    assert errs[0]["code"] == "binary.base"


def test_encoding_applies():  # binary.js:141-146
    enc = base64.b64encode(b"abcdef").decode()
    out = jr.attempt(pa.table({"v": [enc]}), obj({"v": jr.binary().encoding("base64")}))
    assert out["v"][0].as_py() == b"abcdef"


@pytest.mark.parametrize(
    "enc,plain",
    [("hex", b"\x01\xab"), ("latin1", bytes(range(200, 210))), ("utf16le", b"h\x00i\x00")],
)
def test_encoding_variants(enc, plain):  # Buffer.isEncoding set
    text = {
        "hex": plain.hex(),
        "latin1": plain.decode("latin-1"),
        "utf16le": plain.decode("utf-16-le"),
    }[enc]
    out = jr.attempt(pa.table({"v": [text]}), obj({"v": jr.binary().encoding(enc)}))
    assert out["v"][0].as_py() == plain


def test_encoding_invalid_throws():  # binary.js:148-154
    with pytest.raises(ValueError, match="Invalid encoding: base6"):
        jr.binary().encoding("base6")


def test_min_vectors():  # binary.js:165-180
    ok, errs = run(jr.binary().min(5), [b"testing", b"test"], pa.binary())
    assert ok == [True, False]
    assert errs[0]["code"] == "binary.min"
    assert errs[0]["message"] == '"v" must be at least 5 bytes'


def test_max_vectors():  # binary.js:201-220
    ok, errs = run(jr.binary().max(5), [b"testing", b"test"], pa.binary())
    assert ok == [False, True]
    assert errs[0]["code"] == "binary.max"
    assert errs[0]["message"] == '"v" must be less than or equal to 5 bytes'


def test_length_vectors():  # binary.js:243-260
    ok, errs = run(jr.binary().length(4), [b"test", b"testing"], pa.binary())
    assert ok == [True, False]
    assert errs[0]["code"] == "binary.length"
    assert errs[0]["message"] == '"v" must be 4 bytes'


@pytest.mark.parametrize("bad", ["a", 1.2, -1, True])
def test_limit_asserts(bad):  # binary.js:182-196, 222-236, 262-276
    for meth in ("min", "max", "length"):
        with pytest.raises(ValueError, match="positive integer or reference"):
            getattr(jr.binary(), meth)(bad)


def test_limit_accepts_ref_and_integral_float():  # Number.isSafeInteger(2.0) is true in JS
    jr.binary().min(jr.ref("n"))
    jr.binary().max(2.0)
