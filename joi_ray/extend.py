"""User-extension surface — the analog of ``Joi.extend``
(``/root/reference/lib/index.js:128-158``, machinery ``lib/extend.js:11-259``).

The reference's extension system registers custom types with coerce/validate
hooks and per-rule ``validate(value, helpers, args)`` callbacks.  Our batch
engine's plugin protocol (SURVEY.md §2.7) is: a *rule factory*
``factory(args) -> kernel(arr, env) -> RuleOut`` registered per (type, rule
name).  Compile-time work (regex build, model load) goes in the factory;
the kernel must be vectorized.

``external(fn)`` (``lib/base.js:152-157``) maps to a per-batch hook rule:
the user supplies an importable ``"module:callable"`` path (picklable across
workers) whose callable receives the Arrow array and returns an ok-mask, a
rewritten array, or both.
"""

from __future__ import annotations

import importlib
from typing import Callable

import numpy as np
import pyarrow as pa

from .kernels.util import Env, RuleOut

# (type, rule_name) -> (factory, code)
_CUSTOM_RULES: dict[tuple[str, str], tuple[Callable, str]] = {}


def register_rule(type_: str, name: str, factory: Callable, code: str | None = None):
    """Register a custom vectorized rule for a schema type.

    ``factory(args: dict) -> kernel(arr: pa.Array, env: Env) -> RuleOut``.
    After registration, ``schema.rule_(name, **args)`` attaches it."""
    _CUSTOM_RULES[(type_, name)] = (factory, code or f"{type_}.{name}")


def lookup_rule(type_: str, name: str):
    hit = _CUSTOM_RULES.get((type_, name)) or _CUSTOM_RULES.get(("any", name))
    return hit


def resolve_callable(path: str) -> Callable:
    mod, _, attr = path.partition(":")
    fn = importlib.import_module(mod)
    for part in attr.split("."):
        fn = getattr(fn, part)
    return fn


def make_external(args: dict):
    """Builtin factory for the ``external`` hook rule."""
    fn = resolve_callable(args["fn"])

    def kernel(arr: pa.Array, env: Env) -> RuleOut:
        if env.prefs.get("externals", True) is False:
            # prefs.externals=false skips external hooks entirely
            # (test/validator.js:288-303)
            return RuleOut(ok=np.ones(len(arr), dtype=bool), new_value=None,
                           context={"fn": args["fn"]})
        out = fn(arr)
        ok, new_value = np.ones(len(arr), dtype=bool), None
        if isinstance(out, tuple):
            ok, new_value = out
        elif isinstance(out, (pa.Array, pa.ChunkedArray)):
            new_value = out
        elif out is not None:
            ok = np.asarray(out, dtype=bool)
        return RuleOut(ok=ok, new_value=new_value, context={"fn": args["fn"]})

    return kernel


register_rule("any", "external", make_external, "any.external")
