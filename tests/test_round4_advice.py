"""Round-4 regression tests for the ADVICE findings — every expected string
below was verified against the actual reference under node this round:

1. Date limits outside Python's datetime range (but inside the JS Date
   ±8.64e15 range) compile and render their error context via the JS
   toISOString expanded form (reference date.js compare args normalize to
   Date; template renders toISOString).
2. concat valids/invalids cross-removal is SameValueZero-keyed: removing
   invalid(1) must not drop allow(True) (reference lib/values.js remove is
   deep-strict: true !== 1).
3. Compiled ``re.Pattern`` arguments keep their flags — joi's RegExp args
   carry flags (/abc/i), so re.compile('^abc$', re.I) must match 'ABC'.
4. cast('string') on dates == JS Date.prototype.toISOString: years <1000
   are zero-padded ('0123-...'), years outside 0-9999 use the expanded
   ±YYYYYY form; same for datetime rendering in error messages.
"""

import re

import pyarrow as pa
import pytest

import joi_ray as jr
from joi_ray import compile_schema


def _run(schema, value, ctype=None, prefs=None):
    tbl = pa.table({"x": pa.array([value], type=ctype)})
    cs = compile_schema(jr.object({"x": schema}), prefs=prefs or {})
    res = cs.validate_table(tbl)
    errs = [v for v in res.violations.to_pylist() if v["severity"] == "error"]
    return res, errs


def test_date_limit_beyond_datetime_range_compiles():
    # node: Joi.date().max(3e14).validate(new Date(1e14)) -> ok
    res, errs = _run(jr.date().max(3e14), 1e14)
    assert bool(res.ok[0]) and not errs


def test_date_limit_beyond_datetime_range_renders_expanded_iso():
    # node: '"value" must be less than or equal to
    #        "+011476-08-15T05:20:00.000Z"'
    res, errs = _run(jr.date().max(3e14), 4e14)
    assert not res.ok[0]
    assert errs[0]["message"] == (
        '"x" must be less than or equal to "+011476-08-15T05:20:00.000Z"'
    )


def test_date_string_limit_below_ns_range():
    # node: min('0500-01-01T00:00:00.000Z') on '0123-...' ->
    #       '"value" must be larger than or equal to "0500-01-01T00:00:00.000Z"'
    res, errs = _run(
        jr.date().min("0500-01-01T00:00:00.000Z"), "0123-05-06T00:00:00.000Z"
    )
    assert not res.ok[0]
    assert errs[0]["message"] == (
        '"x" must be larger than or equal to "0500-01-01T00:00:00.000Z"'
    )


def test_concat_cross_removal_is_samevaluezero():
    # node: Joi.any().allow(true).concat(Joi.any().invalid(1)).describe()
    #       -> {allow:[true], invalid:[1]}  (true !== 1)
    c = jr.any_().allow(True).concat(jr.any_().invalid(1))
    assert c.allow_vals == [True]
    assert c.invalid_vals == [1]
    # and the symmetric case: allow(1) survives invalid(True)
    c2 = jr.any_().allow(1).concat(jr.any_().invalid(True))
    assert c2.allow_vals == [1]
    assert c2.invalid_vals == [True]
    # genuine matches are still removed (0 vs -0, 10 vs 10.0 same number)
    c3 = jr.any_().allow(10).concat(jr.any_().invalid(10.0))
    assert c3.allow_vals == []


def test_compiled_pattern_keeps_ignorecase():
    # node: Joi.string().pattern(/^abc$/i).validate('ABC') -> ok
    s = jr.string().pattern(re.compile(r"^abc$", re.IGNORECASE))
    res, _ = _run(s, "ABC")
    assert bool(res.ok[0])
    res2, errs2 = _run(s, "abx")
    assert not res2.ok[0] and errs2[0]["code"] == "string.pattern.base"


def test_compiled_pattern_flags_on_object_pattern_and_rename():
    s = jr.object().pattern(re.compile("^A", re.I), jr.number().max(10))
    tbl = pa.table({"o": pa.array([{"abc": 5}, {"abc": 50}])})
    res = compile_schema(jr.object({"o": s})).validate_table(tbl)
    assert list(res.ok) == [True, False]

    s2 = jr.object().rename(re.compile("^OLD$", re.I), "new")
    tbl2 = pa.table({"o": pa.array([{"old": 1}])})
    res2 = compile_schema(jr.object({"o": s2})).validate_table(tbl2)
    assert list(res2.ok) == [True]
    assert res2.value.column("o").to_pylist() == [{"new": 1}]


def test_verbose_flag_raises():
    with pytest.raises(ValueError, match="VERBOSE"):
        jr.string().pattern(re.compile(r"a  b", re.X))


def test_cast_string_zero_pads_early_years():
    # node: Joi.date().cast('string').validate('0123-05-06T00:00:00.000Z')
    #       -> value '0123-05-06T00:00:00.000Z'
    res, errs = _run(jr.date().cast("string"), "0123-05-06T00:00:00.000Z")
    assert bool(res.ok[0]) and not errs
    assert res.value.column("x").to_pylist() == ["0123-05-06T00:00:00.000Z"]


def test_cast_string_expanded_years():
    # node: new Date(3e14).toISOString() === '+011476-08-15T05:20:00.000Z';
    # feed the date as a unix-ms timestamp so no datetime object is needed
    res, errs = _run(
        jr.date().timestamp("javascript").cast("string"), 3e14
    )
    assert bool(res.ok[0]) and not errs
    assert res.value.column("x").to_pylist() == ["+011476-08-15T05:20:00.000Z"]
