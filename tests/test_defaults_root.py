"""``defaults()`` root analog.

The pinned reference (v16.0.0-rc2) does not ship ``Joi.defaults`` — the
surface follows joi v16-final's public API (every type constructor built
from the returned root passes through the modifier; ``defaults`` composes;
non-schema modifier results throw).  Cases mirror joi's documented
behavior since there are no reference test vectors to port.
"""

import pyarrow as pa
import pytest

import joi_ray as jr
from joi_ray import compile_schema, defaults


def _ok(schema, value, ctype=None):
    tbl = pa.table({"x": pa.array([value], type=ctype)})
    res = compile_schema(jr.object({"x": schema})).validate_table(tbl)
    return bool(res.ok[0])


def test_defaults_applies_modifier_to_every_type():
    root = defaults(lambda s: s.required())
    assert root.string().flags.get("presence") == "required"
    assert root.number().flags.get("presence") == "required"
    assert root.date().flags.get("presence") == "required"
    # required fires: a null is rejected where the plain type accepts it
    assert not _ok(root.string(), None, pa.string())
    assert _ok(jr.string(), None, pa.string())


def test_defaults_composes():
    root = defaults(lambda s: s.required())
    sub = root.defaults(lambda s: s.description("defaulted"))
    s = sub.string()
    assert s.flags.get("presence") == "required"
    assert s.describe()["metas"]["description"] == "defaulted"


def test_defaults_constructor_args_pass_through():
    root = defaults(lambda s: s.required())
    o = root.object({"a": jr.number()})
    assert o.flags.get("presence") == "required"
    assert "a" in o.terms["keys"]


def test_defaults_rejects_non_schema_result():
    root = defaults(lambda s: None)
    with pytest.raises(ValueError, match="valid schema"):
        root.string()


def test_defaults_rejects_non_callable():
    with pytest.raises(ValueError, match="callable"):
        defaults("nope")


def test_defaults_types_map():
    root = defaults(lambda s: s.required())
    t = root.types()
    assert t["string"]().flags.get("presence") == "required"
    assert t["any"]().flags.get("presence") == "required"


def test_defaults_describe_roundtrip():
    root = defaults(lambda s: s.required().description("x"))
    s = root.string().min(3)
    assert jr.build(s.describe()) == s
