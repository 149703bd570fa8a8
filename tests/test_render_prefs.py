"""Error-render preference parity: ``errors.wrapArrays``,
``errors.escapeHtml`` and ``dateFormat`` thread into message rendering the
way the reference does (``lib/errors.js:76`` passes ``prefs.errors`` as the
template-render options; ``lib/template.js:185`` escapes non-raw parts,
``:331`` wraps arrays, ``:16-22,99-102`` formats dates per
``prefs.dateFormat``).  Expected strings are node-verified byte-for-byte
against /root/reference/lib (see the session transcript vectors)."""

from __future__ import annotations

import pyarrow as pa

import joi_ray as jr


def _msgs(schema, tbl, prefs):
    cs = jr.compile_schema(schema, prefs={"abort_early": False, **prefs})
    return cs.validate_table(tbl).violations["message"].to_pylist()


def test_wrap_arrays_false_unwraps_valids():
    s = jr.object({"x": jr.string().valid("a", "b")})
    t = pa.table({"x": ["c"]})
    assert _msgs(s, t, {}) == ['"x" must be one of [a, b]']
    assert _msgs(s, t, {"errors": {"wrapArrays": False}}) == ['"x" must be one of a, b']


def test_escape_html_escapes_label_and_values():
    s = jr.object({"x": jr.string().valid("a", "b").label("L<&>")})
    t = pa.table({"x": ["c"]})
    # node: '"L&lt;&amp;&gt;" must be one of [a, b]'
    assert _msgs(s, t, {"errors": {"escapeHtml": True}}) == [
        '"L&lt;&amp;&gt;" must be one of [a, b]'
    ]
    # default escapeHtml:false leaves the label verbatim
    assert _msgs(s, t, {}) == ['"L<&>" must be one of [a, b]']


def test_escape_html_does_not_touch_raw_value_token():
    # {[.]} is a single-brace RAW part in the reference catalog — never
    # escaped even under escapeHtml:true (string/index.js:760)
    s = jr.object({"x": jr.string().pattern(r"^[a-z]+$")})
    t = pa.table({"x": ["A<B"]})
    (m,) = _msgs(s, t, {"errors": {"escapeHtml": True}})
    assert 'with value "A<B"' in m


def test_date_format_variants_node_verified():
    s = jr.object({"d": jr.date().min("2019-06-01")})
    t = pa.table({"d": ["2019-01-01"]})
    expect = {
        "iso": '"d" must be larger than or equal to "2019-06-01T00:00:00.000Z"',
        "utc": '"d" must be larger than or equal to "Sat, 01 Jun 2019 00:00:00 GMT"',
        "date": '"d" must be larger than or equal to "Sat Jun 01 2019"',
        "string": (
            '"d" must be larger than or equal to '
            '"Sat Jun 01 2019 00:00:00 GMT+0000 (Coordinated Universal Time)"'
        ),
        "time": (
            '"d" must be larger than or equal to '
            '"00:00:00 GMT+0000 (Coordinated Universal Time)"'
        ),
    }
    for fmt, want in expect.items():
        assert _msgs(s, t, {"date_format": fmt}) == [want], fmt


def test_js_date_render_year_padding():
    # node: year 99 -> 'Thu Jan 01 0099' / 'Thu, 01 Jan 0099 00:00:00 GMT';
    # year -1 -> 'Fri Jan 01 -0001'; year 275760 unpadded
    from joi_ray.kernels.messages import _js_date_render

    ms_99 = -59042995200000  # 0099-01-01T00:00:00Z
    assert _js_date_render(ms_99, "date") == "Thu Jan 01 0099"
    assert _js_date_render(ms_99, "utc") == "Thu, 01 Jan 0099 00:00:00 GMT"
    assert _js_date_render(-62198755200000, "date") == "Fri Jan 01 -0001"
    assert _js_date_render(int(8.64e15), "date") == "Sat Sep 13 275760"
    assert _js_date_render(int(8.64e15), "utc") == "Sat, 13 Sep 275760 00:00:00 GMT"


def test_wrap_arrays_nested_propagates():
    # reference stringify recurses with the same options (template.js:327)
    from joi_ray.kernels.messages import _stringify

    assert _stringify([["a", "b"], "c"], True, "iso") == "[[a, b], c]"
    assert _stringify([["a", "b"], "c"], False, "iso") == "a, b, c"


def test_override_double_brace_substitutes():
    # node: 'oops x needs 5 got x' — {{..}} and {..} both substitute;
    # double forms first so the single replace can't eat inner braces
    s = jr.object({"x": jr.string().min(5).message("oops {{#label}} needs {{#limit}} got {#label}")})
    t = pa.table({"x": ["ab"]})
    assert _msgs(s, t, {}) == ["oops x needs 5 got x"]


def test_override_escape_raw_split():
    # node escapeHtml:true -> 'esc a&lt;b raw a<b' ({{..}} escaped, {..} raw)
    s = jr.object({"x": jr.string().label("a<b").min(5).message("esc {{#label}} raw {#label}")})
    t = pa.table({"x": ["ab"]})
    assert _msgs(s, t, {"errors": {"escapeHtml": True}}) == ["esc a&lt;b raw a<b"]
    assert _msgs(s, t, {}) == ["esc a<b raw a<b"]


def test_override_unresolved_refs_drop():
    # node: 'a  b  c x' — undefined refs render '' (errors.js render)
    s = jr.object({"x": jr.string().min(5).message("a {{#nope}} b {#missing} c {{#label}}")})
    t = pa.table({"x": ["ab"]})
    assert _msgs(s, t, {}) == ["a  b  c x"]


def test_override_value_token_any_rule():
    # node: 'val 7.5 end' — {[.]} works on any rule, rendered per row, raw
    s = jr.object({"y": jr.number().max(3).message("val {[.]} end")})
    t = pa.table({"y": [7.5, 9.0]})
    assert _msgs(s, t, {}) == ["val 7.5 end", "val 9 end"]


def test_ruleset_asserts_match_reference():
    import pytest

    # node-verified: message()/warn() raise on empty/closed rulesets;
    # flag-setters CLOSE, rule-adds REOPEN (lib/base.js:517,666,812)
    with pytest.raises(ValueError):
        jr.string().message("a")
    with pytest.raises(ValueError):
        jr.string().min(1).message("a").message("b")
    with pytest.raises(ValueError):
        jr.string().min(1).required().message("a")
    with pytest.raises(ValueError):
        jr.string().warn()
    with pytest.raises(ValueError):
        jr.string().ruleset.message("a")
    # legal chains
    jr.string().min(1).message("a").max(2).message("b")
    jr.string().min(2).allow("x").message("m")  # value pushes do NOT close
    s = jr.object({"x": jr.string().ruleset.min(2).max(3).message("boom")})
    t = pa.table({"x": ["a", "aaaa"]})
    assert _msgs(s, t, {}) == ["boom", "boom"]
