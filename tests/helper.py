"""Conformance-test helper — the analog of the reference's table-driven
``Helper.validate(schema, cases)`` (``/root/reference/test/helper.js:13-84``)
recast for columnar validation: each case row is
``(input, should_validate, expected_error_code)``; all inputs of a table
become one Arrow column validated in a single batch, and per-row validity +
first-error-code are asserted.  Every call also asserts the manifest
round-trip invariant ``build(describe(s)) == s`` (``test/helper.js:25-27``).
"""

from __future__ import annotations

import pyarrow as pa

from joi_ray import build, compile_schema, object as jr_object


def check(schema, cases, prefs=None, column_type=None, abort_early=True):
    """cases: list of (input, should_validate[, expected_code]).

    Inputs become column 'x' (type inferred unless ``column_type``)."""
    assert build(schema.describe()) == schema, "manifest round-trip failed"
    inputs = [c[0] for c in cases]
    arr = pa.array(inputs, type=column_type)
    tbl = pa.table({"x": arr})
    cs = compile_schema(
        jr_object({"x": schema}),
        prefs={"abort_early": abort_early, **(prefs or {})},
    )
    res = cs.validate_table(tbl)
    viol = res.violations.to_pylist()
    first_code = {}
    for v in viol:
        if v["severity"] != "error":
            continue
        first_code.setdefault(v["row"], v["code"])
    for i, case in enumerate(cases):
        expected_ok = case[1]
        assert bool(res.ok[i]) == expected_ok, (
            f"case {i} input={case[0]!r}: expected ok={expected_ok}, got "
            f"{bool(res.ok[i])} (errors: {[v for v in viol if v['row'] == i]})"
        )
        if not expected_ok and len(case) > 2 and case[2] is not None:
            assert first_code.get(i) == case[2], (
                f"case {i} input={case[0]!r}: expected code {case[2]}, got "
                f"{first_code.get(i)} (all: {[v['code'] for v in viol if v['row'] == i]})"
            )
    return res
