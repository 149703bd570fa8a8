"""The batch validation engine: Schema -> CompiledSchema -> per-batch eval.

This is the Ray-Data-native replacement for the reference's per-value
recursive-descent interpreter (``/root/reference/lib/validator.js:112-257``).
The same stage order is preserved per column — coerce → empty → presence →
valids/invalids → base type → rules loop → finalize — but every stage is a
vectorized mask/kernel over an Arrow column instead of a per-value branch.

Compilation happens once (driver, or per validator actor in ``__init__``);
``validate_table`` then runs per batch with no Python-per-row work.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .spec import Ref, Schema, build, compile_literal
from .kernels import lists as k_lists
from .kernels import numbers as k_numbers
from .kernels import scalars as k_scalars
from .kernels import strings as k_strings
from .kernels import structs as k_structs
from .kernels import messages as k_messages
from .kernels.messages import render
from .kernels.util import AltView, Env, ErrRec, as_bool_np, combine, null_mask

DEFAULT_PREFS = {
    "convert": True,          # lib/common.js:25
    "abort_early": True,      # joi default abortEarly=true
    "allow_unknown": False,
    "strip_unknown": False,
    "context": {},
    "now_ms": 1_700_000_000_000,  # 'now' bound at compile time for determinism
}

def _item_label_path(p: str, it: int, ipos: "Optional[int]") -> str:
    """joi label path for an item error: index at the array boundary
    ('a[0].x') when the error is below the array level (errors.js:87-107);
    appended ('a[0]') when the path IS the array path."""
    if it < 0:
        return p
    if ipos is None or ipos >= len(p):
        return f"{p}[{it}]"
    return f"{p[:ipos]}[{it}]{p[ipos:]}"


VIOLATION_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("row", pa.int64()),
        ("path", pa.string()),
        ("item_index", pa.int32()),
        ("code", pa.string()),
        ("message", pa.string()),
        ("context", pa.string()),
        ("severity", pa.string()),
    ]
)


@dataclass
class CompiledRule:
    name: str
    fn: Any                   # kernel(arr, env) -> RuleOut
    code: str
    seq: int
    warn: bool = False
    message: Optional[str] = None
    convert_phase: bool = False


@dataclass
class NodeResult:
    value: pa.Array
    errors: list[ErrRec] = field(default_factory=list)
    missing: Optional[np.ndarray] = None
    failed: Optional[np.ndarray] = None
    strip: bool = False
    #: per-ROW strip (a strip flag set by a MATCHED when/switch branch
    #: applies only where the branch matched — joi resolves the schema per
    #: value, so object.js's strip delete is row-dependent; fuzz seed 98)
    strip_rows: Optional[np.ndarray] = None
    raw_value: Optional[pa.Array] = None
    #: CONVERTED values of a raw()-flagged node: joi shadows them
    #: (validator.js:414-417) so sibling refs resolve the converted value
    #: even though the output keeps the original — and the shadow is set
    #: in finalize, i.e. even for rows that ERRORED
    shadow_value: Optional[pa.Array] = None
    shadow_mask: Optional[np.ndarray] = None  # rows holding a shadow entry
    #: CROSS-TYPE shadow entries (alternatives branches shadowing different
    #: runtime types): disjoint (row-mask, column) pairs consumed by the
    #: sibling-ref post-processing as AltView branches
    shadow_pairs: Optional[list] = None
    #: rows whose value was SET by this node's finalize (default/failover
    #: adoption) — joi's `value !== undefined` afterwards, so a whens
    #: WRAPPER default must not re-fill them (validator.js:383; the
    #: missing mask intentionally stays true for required+default rows)
    fin_filled: Optional[np.ndarray] = None


_RULE_FACTORIES = {
    "string": k_strings.FACTORIES,
    "number": k_numbers.FACTORIES,
    "date": k_scalars.DATE_FACTORIES,
    "binary": k_scalars.BINARY_FACTORIES,
    "array": k_lists.FACTORIES,
}
_RULE_CODES = {
    "string": k_strings.CODES,
    "number": k_numbers.CODES,
}
# array rules handled structurally by the engine, not leaf kernels
_STRUCTURAL_RULES = {
    "array": {"has"},
    "object": {"assert", "min", "max", "length"},
    "any": set(),
}
#: rules applied in the coerce stage and skipped in the rules loop under
#: convert; isoDate joins normalize/case/trim (its coerce conversion +
#: error live in eval_node's string pipeline)
_STRING_CONVERT_RULES = set(k_strings.CONVERT_ORDER) | {"isoDate"}

# rules that never rewrite the column: safe to evaluate on the active-row
# subset only (branch scopes from when() often cover ~half the rows; regex
# and compare kernels then touch half the bytes)
_PURE_CHECK_RULES = {
    "min", "max", "length", "greater", "less", "pattern", "alphanum", "token",
    "hex", "base64", "dataUri", "email", "domain", "hostname", "guid", "ip",
    "uri", "isoDuration", "creditCard", "integer", "multiple",
    "port", "sign", "unique", "sort",
}  # isoDate excluded: it rewrites to canonical ISO in convert mode


# physical-type families whose rule kernels can run on the column; a
# mismatch (string rules on int64, etc.) means every present row already
# failed the base type check and the loop is skipped
_RULE_TYPE_GUARDS = {
    "string": lambda t: pa.types.is_string(t) or pa.types.is_large_string(t),
    "number": lambda t: (pa.types.is_floating(t) or pa.types.is_integer(t)
                         or pa.types.is_decimal(t)),
    "boolean": pa.types.is_boolean,
    "date": lambda t: pa.types.is_timestamp(t) or pa.types.is_date(t),
    "binary": lambda t: pa.types.is_binary(t) or pa.types.is_large_binary(t),
    "array": lambda t: pa.types.is_list(t) or pa.types.is_large_list(t),
    "object": pa.types.is_struct,
}


def _rule_type_ok(node_type: str, arrow_type: pa.DataType) -> bool:
    guard = _RULE_TYPE_GUARDS.get(node_type)
    return guard is None or bool(guard(arrow_type))


class CNode:
    """One compiled schema node: kernels constructed, children compiled,
    value sets prebuilt, conditionals desugared via concat."""

    def __init__(self, schema: Schema, prefs: dict):
        self.schema = schema
        self.type = schema.type
        self.flags = dict(schema.flags)
        self.prefs = {**prefs, **schema.prefs}
        def _resolvable(v):
            # joi's Common.isResolvable: Refs AND Templates (Joi.x) resolve
            # per row inside the valids/invalids sets
            return isinstance(v, Ref) or hasattr(v, "resolve_value")

        self.allow_static = [v for v in schema.allow_vals if not _resolvable(v)]
        self.allow_refs = [v for v in schema.allow_vals if _resolvable(v)]
        self.invalid_static = [v for v in schema.invalid_vals if not _resolvable(v)]
        self.invalid_refs = [v for v in schema.invalid_vals if _resolvable(v)]
        self.allow_missing = any(v is None for v in self.allow_static)
        self.allow_static = [v for v in self.allow_static if v is not None]
        self.invalid_missing = any(v is None for v in self.invalid_static)
        self.invalid_static = [v for v in self.invalid_static if v is not None]

        # --- leaf rule kernels
        self.rules: list[CompiledRule] = []
        structural = _STRUCTURAL_RULES.get(self.type, set())
        factories = _RULE_FACTORIES.get(self.type, {})
        for seq, r in enumerate(schema.rules):
            name, args = r["name"], r.get("args", {})
            if name == "warning":
                code = args.get("code", "any.warning")
                self.rules.append(
                    CompiledRule(name, None, code, seq, warn=True, message=r.get("message"))
                )
                continue
            if name in structural:
                self.rules.append(CompiledRule(name, ("structural", args), f"{self.type}.{name}", seq, warn=r.get("warn", False), message=r.get("message")))
                continue
            if name not in factories:
                from .extend import lookup_rule

                hit = lookup_rule(self.type, name)
                if hit is None:
                    raise ValueError(f"unknown rule {self.type}.{name}")
                custom_factory, code = hit
                self.rules.append(
                    CompiledRule(name, custom_factory(args), code, seq,
                                 warn=r.get("warn", False), message=r.get("message"))
                )
                continue
            fn = factories[name](args)
            code_fn = _RULE_CODES.get(self.type, {}).get(name)
            code = code_fn(args) if code_fn else f"{self.type}.{name}"
            self.rules.append(
                CompiledRule(
                    name,
                    fn,
                    code,
                    seq,
                    warn=r.get("warn", False),
                    message=r.get("message"),
                    convert_phase=(self.type == "string" and name in _STRING_CONVERT_RULES),
                )
            )
        # convert-phase rules get a dedicated normalize->case->trim ordered
        # VIEW for the coerce-time pass; the main list keeps REGISTRATION
        # order — under convert:false they validate in the rules loop and
        # abortEarly's first-error depends on that order
        self.convert_rules: list = []
        if self.type == "string":
            order = {n: i for i, n in enumerate(k_strings.CONVERT_ORDER)}
            self.convert_rules = sorted(
                (r for r in self.rules if r.convert_phase and r.name in order),
                key=lambda r: order[r.name]
            )

        # --- children
        t = schema.terms
        self.keys: dict[str, CNode] = {k: CNode(v, prefs) for k, v in t.get("keys", {}).items()}
        # term PRESENCE is semantic: object() (no term) allows any key,
        # object({}) / keys({}) (empty term) forbids all (object.js:258-270,
        # unknown-key gate :1043-1046)
        self.keys_term: bool = "keys" in t
        self.items: list[CNode] = [CNode(v, prefs) for v in t.get("items", [])]
        self.ordered: list[CNode] = [CNode(v, prefs) for v in t.get("ordered", [])]
        # matches: plain try-branches ({"schema": CNode}) or conditional
        # entries from alternatives.when (lib/types/alternatives.js:36-57)
        self.matches: list[dict] = []
        for v in t.get("matches", []):
            if isinstance(v, Schema) or (isinstance(v, dict) and "type" in v):
                self.matches.append(
                    {"schema": CNode(v if isinstance(v, Schema) else build(v), prefs)})
                continue
            e = {
                "then": CNode(v["then"], prefs) if v.get("then") is not None else None,
                "otherwise": CNode(v["otherwise"], prefs) if v.get("otherwise") is not None else None,
            }
            if v.get("peek") is not None:
                pk = v["peek"]
                e["peek"] = CNode(pk if isinstance(pk, Schema) else build(pk), prefs)
            else:
                r = v["ref"]
                e["ref"] = r if isinstance(r, Ref) else Ref(r)
                e["is"] = self._compile_is(v.get("is"), prefs)
            self.matches.append(e)
        self.dependencies = list(t.get("dependencies", []))
        self.renames = list(t.get("renames", []))
        self.replacements = list(t.get("replacements", []))
        import re as _re

        self.patterns = [
            {
                "rx": _re.compile(p["regex"]),
                "node": CNode(p["schema"], prefs),
                "exclusive": bool(p.get("exclusive")),
                "matches": CNode(p["matches"], prefs) if p.get("matches") is not None else None,
            }
            for p in t.get("patterns", [])
        ]
        # empty(schema) support: schema-valued entries precompiled; string
        # matchers implicitly allow "" (an empty string should be matchable
        # as "empty" — the base string.empty check must not veto it)
        raw_empty = self.flags.get("empty") or []
        self.empty_schemas = [
            CNode(v.allow("") if v.type == "string" and "" not in v.allow_vals else v, prefs)
            for v in raw_empty
            if isinstance(v, Schema)
        ]
        self.empty_values = [v for v in raw_empty if not isinstance(v, Schema)]
        self.terms = t

        # --- whens desugared at compile time via concat (lib/base.js:364:
        # when() lifts into alternatives; we keep base+branch merged chains).
        # Multiple when()s apply successively: each branch keeps the
        # remaining whens, which recurse at CNode construction (2^K combos
        # worst case, K is small in practice).
        self.whens = []
        self.wrapper_fins: dict | None = None  # post-when default/failover
        self.wrapper_allow: list | None = None  # post-when valid() values
        self.wrapper_invalid: list | None = None
        self.wrapper_only = False
        all_whens = t.get("whens", [])
        for w in all_whens[:1]:
            rest = all_whens[1:]
            base = schema._clone()
            base.terms = {k: v for k, v in base.terms.items() if k != "whens"}
            if rest:
                base.terms["whens"] = rest
            bf = w.get("base_flags")
            if bf is not None:
                # the BRANCHES carry the PRE-when default/failover/only
                # snapshot (joi: branch = base-at-when-time concat then/
                # otherwise, base.js:330-343); flags (re)set after the when
                # belong to the wrapper and apply over the merged result
                # instead (fuzz seeds 957 / 1028, node-verified)
                base.flags = {k: v for k, v in base.flags.items()
                              if k not in ("default", "failover", "only")}
                base.flags.update(bf)
                fins = {}
                for k in ("default", "failover"):
                    if k not in self.flags:
                        continue
                    if k in bf and self.flags[k] is bf[k]:
                        continue  # unchanged since the when: branch-level only
                    try:
                        if k in bf and bool(self.flags[k] == bf[k]):
                            continue  # manifest round-trip broke identity
                    except Exception:  # noqa: BLE001 — exotic __eq__
                        pass
                    fins[k] = self.flags[k]
                self.wrapper_fins = fins
            ba = w.get("base_allow")
            if ba is not None:
                from .spec import _value_key as _vk

                bi = w.get("base_invalid") or []
                # branches get the PRE-when sets; values added after the
                # when live on the fresh WRAPPER (base.js:364), whose own
                # valids stage runs BEFORE branch dispatch (fuzz seed
                # 54000083, node-verified: wrapper any.only precedes the
                # branch's; a wrapper-valid match returns VERBATIM)
                base.allow_vals = list(ba)
                base.invalid_vals = list(bi)

                def _delta(cur, snap):
                    keys = set()
                    for v in snap:
                        try:
                            keys.add(_vk(v))
                        except TypeError:
                            pass
                    out = []
                    for v in cur:
                        try:
                            if _vk(v) in keys:
                                continue
                        except TypeError:
                            pass
                        out.append(v)
                    return out

                self.wrapper_allow = [
                    v for v in _delta(schema.allow_vals, ba)
                    if v is not None and not _resolvable(v)]
                self.wrapper_invalid = [
                    v for v in _delta(schema.invalid_vals, bi)
                    if v is not None and not _resolvable(v)]
                # post-when valid() sets only on the WRAPPER itself —
                # independent of the branches' own (pre-when) only flag
                self.wrapper_only = bool(self.wrapper_allow)
            if "peek" in w:
                # schema condition (the reference's peek form,
                # lib/types/alternatives.js:192): evaluated against the
                # node's OWN value, not a ref
                pk = w["peek"]
                entry = {"peek": CNode(pk if isinstance(pk, Schema) else build(pk), prefs)}
                entry["then"] = CNode(base.concat(w["then"]), prefs) if w.get("then") else CNode(base, prefs)
                entry["otherwise"] = (
                    CNode(base.concat(w["otherwise"]), prefs) if w.get("otherwise") else CNode(base, prefs)
                )
                self.whens.append(entry)
                continue
            entry = {"ref": w["ref"]}
            if "switch" in w:
                cases = []
                for sw in w["switch"]:
                    is_c = self._compile_is(sw["is"], prefs)
                    then_c = CNode(base.concat(sw["then"]), prefs) if sw.get("then") else CNode(base, prefs)
                    cases.append((is_c, then_c))
                    if "otherwise" in sw:
                        entry["otherwise"] = CNode(base.concat(sw["otherwise"]), prefs)
                entry["switch"] = cases
                # a top-level otherwise (when(ref, switch=[...], otherwise=X))
                # is joi's alt.otherwise (base.js:345-353); the last case's
                # otherwise wins only when no top-level one exists
                if w.get("otherwise") is not None:
                    entry["otherwise"] = CNode(base.concat(w["otherwise"]), prefs)
                entry.setdefault("otherwise", CNode(base, prefs))
            else:
                entry["is"] = self._compile_is(w.get("is"), prefs)
                entry["then"] = CNode(base.concat(w["then"]), prefs) if w.get("then") else CNode(base, prefs)
                entry["otherwise"] = (
                    CNode(base.concat(w["otherwise"]), prefs) if w.get("otherwise") else CNode(base, prefs)
                )
            self.whens.append(entry)

    @staticmethod
    def _compile_is(is_val, prefs) -> "CNode":
        if is_val is None:
            # reference asserts 'Missing "is" or "switch" option' for a ref
            # condition without is (lib/types/alternatives.js:181)
            raise ValueError(
                'when() with a ref condition requires the "is_" option '
                "(or use switch=); reference lib/types/alternatives.js:181"
            )
        s = compile_literal(is_val) if not isinstance(is_val, Schema) else is_val
        if "presence" not in s.flags:
            s = s.required()  # joi: `is` defaults to required
        return CNode(s, prefs)


# ==========================================================================
# evaluation


class _TakeEnv(Env):
    """Env view over a row subset: sibling/ancestor refs are taken with the
    same index array so column-vs-column compares stay aligned."""

    def __init__(self, base: Env, idx_arr):
        super().__init__(base.prefs, base._resolve_sibling, base.ancestors)
        self._idx = idx_arr

    def resolve_ref(self, r, n, mode: str = "strict"):
        if getattr(r, "kind", None) in ("context", "local"):
            # global/local refs are row-independent: bound -> python
            # scalar, unbound -> nulls already sized to THIS scope —
            # re-taking self._idx would double-scope (parent-sized indices)
            return super().resolve_ref(r, len(self._idx), mode=mode)
        v = super().resolve_ref(r, len(self._idx), mode=mode)
        if isinstance(v, tuple) and len(v) == 3:
            val, orig, f = v
            if isinstance(val, AltView):
                val = val.take(self._idx)
            elif isinstance(val, (pa.Array, pa.ChunkedArray)):
                val = combine(val).take(self._idx)
            if isinstance(orig, (pa.Array, pa.ChunkedArray)):
                orig = combine(orig).take(self._idx)
            if f is not None:
                f = f[np.asarray(self._idx)]
            return (val, orig, f)
        if isinstance(v, (pa.Array, pa.ChunkedArray)):
            return combine(v).take(self._idx)
        return v


def _type_family(t: pa.DataType) -> str:
    if pa.types.is_boolean(t):
        return "bool"
    if pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t):
        return "num"
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        return "str"
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return "bin"
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return "ts"
    return str(t)


def _value_family(v) -> str:
    import datetime as _dt

    if isinstance(v, bool):  # before int — bool is an int subclass
        return "bool"
    if isinstance(v, (int, float)):
        return "num"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bin"
    if isinstance(v, (_dt.datetime, _dt.date)):
        return "ts"
    return type(v).__name__


def _set_membership(arr: pa.Array, values: list, refs: list[Ref], insensitive: bool, env: Env) -> np.ndarray:
    n = len(arr)
    m = np.zeros(n, dtype=bool)
    if values:
        probe = arr
        # joi's valids compare with DEEP-STRICT equality (values.js via
        # hoek deepEqual): 0 !== false, "1" !== 1 — so a cross-family cast
        # (float 0.0 -> bool false) must never create a match.  Keep only
        # same-family values (None always compares — valid(null)).
        fam = _type_family(arr.type)
        values = [v for v in values if v is None or isinstance(v, Ref) or _value_family(v) == fam]
        if not values:
            return _set_membership_refs(arr, refs, env, m, n)
        vals = values
        if pa.types.is_floating(arr.type):
            # JS ===: -0 equals 0, but Arrow's is_in hashes the bit pattern
            # and treats them as distinct — normalize both sides (+0.0)
            probe = pc.add(probe, pa.scalar(0.0, type=arr.type))
            vals = [v + 0.0 if isinstance(v, float) and v == 0 else v for v in values]
        if insensitive and pa.types.is_string(arr.type):
            probe = pc.utf8_lower(arr)
            vals = [v.lower() if isinstance(v, str) else v for v in values]
        try:
            vs = pa.array(vals).cast(probe.type) if not pa.types.is_null(probe.type) else pa.array(vals)
            m |= as_bool_np(pc.is_in(probe, value_set=vs), n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            for v in vals:
                try:
                    m |= as_bool_np(pc.equal(probe, pa.scalar(v, type=probe.type)), n)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    continue
    return _set_membership_refs(arr, refs, env, m, n)


def _set_membership_refs(arr: pa.Array, refs: list[Ref], env: Env, m: np.ndarray, n: int) -> np.ndarray:
    for r in refs:
        if hasattr(r, "resolve_value"):  # Template (Joi.x) in the value set
            from .kernels.util import resolve_template_column

            col = resolve_template_column(r, env, n)
        else:
            col = env.resolve_ref(r, n)
        try:
            if isinstance(col, (pa.Array, pa.ChunkedArray)):
                m |= as_bool_np(pc.equal(arr, combine(col)), n)
            elif isinstance(col, (list, tuple, set, frozenset)):
                # ref resolved to an array -> membership over its items
                # (lib/values.js:127-136: Array.isArray(item) -> findIndex)
                vs = pa.array(list(col))
                if not pa.types.is_null(vs.type):
                    m |= as_bool_np(pc.is_in(arr, value_set=vs.cast(arr.type)), n)
            else:
                m |= as_bool_np(pc.equal(arr, pa.scalar(col)), n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            continue
    return m


def _fn_default_values(fn, fired, env):
    """Run a FUNCTION default/failover per missing/failed row exactly like
    ``internals.default`` (validator.js:451-475): an arg-taking fn receives
    ``(parent row dict, prefs)`` (joi passes ``Hoek.clone(state.ancestors
    [0]), prefs`` when ``fn.length > 0``), a zero-arg fn calls bare —
    FRESH per row, so generator defaults differ row to row.  A throw maps
    to ``any.default`` / ``any.failover`` at the caller.  Returns
    ``(values, threw mask over fired, first exception)``."""
    import inspect

    try:
        sig = inspect.signature(fn)
        nreq = sum(
            1 for p in sig.parameters.values()
            if p.kind in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
            and p.default is p.empty
        )
    except (TypeError, ValueError):
        nreq = 0
    getter = getattr(env, "row_getter", None)
    vals: list = []
    threw = np.zeros(len(fired), dtype=bool)
    first_err: Exception | None = None
    for j, i in enumerate(fired):
        try:
            if nreq:
                parent = getter(int(i)) if getter is not None else None
                vals.append(fn(parent, env.prefs))
            else:
                vals.append(fn())
        except Exception as e:  # noqa: BLE001 — joi catches everything too
            vals.append(None)
            threw[j] = True
            if first_err is None:
                first_err = e
    return vals, threw, first_err


def _rt_eq(v, got) -> bool:
    """True when an adopted cell round-trips the intended python value —
    the guard against pyarrow's silent cross-type conversions (int 7 into
    a timestamp column becomes epoch+7 units, 1 into bool becomes True);
    joi adopts default/failover values VERBATIM, so a lossy conversion
    must count as blocked, not adopted (fuzz seed 18001374)."""
    if v is None or got is None:
        return v is None and got is None
    if isinstance(v, bool) or isinstance(got, bool):
        return isinstance(v, bool) and isinstance(got, bool) and v == got
    if isinstance(v, (int, float)) and isinstance(got, (int, float)):
        return v == got or (v != v and got != got)  # NaN round-trips
    if isinstance(v, str) and isinstance(got, str):
        return v == got
    if type(v) is type(got):
        try:
            return bool(v == got)
        except Exception:  # noqa: BLE001 — exotic __eq__
            return False
    import datetime as _dt

    if isinstance(v, (_dt.datetime, _dt.date)) and isinstance(got, (_dt.datetime, _dt.date)):
        return v == got
    return False


def _adopt_fn_values(arr, fired, vals, n: int):
    """Adopt per-row function default/failover results into the column,
    verifying every adopted cell round-trips (see ``_rt_eq``).  Tries the
    column's own type first (type-stable), then a whole-column rebuild in
    the values' type (joi's heterogeneous object — only when the CLEAN
    rows round-trip too).  Returns the new array, or ``None`` when the
    values cannot be represented — the one-type-per-column ceiling; the
    caller exposes an AltView so sibling refs still see the typed values
    joi would (fuzz seed 18001890: an object failover 7 feeding a sibling
    date ref)."""
    lst = arr.to_pylist() if not pa.types.is_null(arr.type) else [None] * n
    for i, v in zip(fired, vals):
        lst[int(i)] = v
    tries = (None,) if pa.types.is_null(arr.type) else (arr.type, None)
    for ty in tries:
        try:
            cand = pa.array(lst) if ty is None else pa.array(lst, type=ty)
        except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
            continue
        if all(_rt_eq(v, cand[int(i)].as_py()) for i, v in zip(fired, vals)) and (
            ty is not None
            or pa.types.is_null(arr.type)
            or all(_rt_eq(v, cand[i].as_py()) for i, v in enumerate(lst))
        ):
            return cand
    return None


def _dflt_pair(n: int, fired, vals, threw=None):
    """(mask, full-length typed array) AltView pair for a BLOCKED
    default/failover adoption, or ``None`` when even a values-only array
    cannot be built (mixed-type fn results — stays a tracked ceiling)."""
    mask = np.zeros(n, dtype=bool)
    lst = [None] * n
    for j, (i, v) in enumerate(zip(fired, vals)):
        if threw is not None and threw[j]:
            continue
        mask[int(i)] = True
        lst[int(i)] = v
    if not mask.any():
        return None
    try:
        return (mask, pa.array(lst))
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        return None


def _scalar_for(value, arr_type):
    try:
        return pa.scalar(value, type=arr_type)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return None


def _coerce(node: CNode, arr: pa.Array, env: Env):
    """Type coercion phase -> (new_arr, base_fail_mask).  Number coercion
    may also emit coerce-stage errors (number.unsafe round-trip check);
    those go through ``_coerce3`` which every caller of the number path
    uses."""
    arr2, fail, _ = _coerce3(node, arr, env)
    return arr2, fail


def _coerce3(node: CNode, arr: pa.Array, env: Env):
    """-> (new_arr, base_fail_mask, coerce_errs) where coerce_errs is a
    list of (code, mask) that joi reports INSTEAD of continuing — a coerce
    error always aborts early (validator.js:150-156)."""
    if node.type == "number":
        return k_numbers.coerce(arr, env, node.flags)
    arr2, fail = _coerce2(node, arr, env)
    return arr2, fail, []


def _coerce2(node: CNode, arr: pa.Array, env: Env):
    n = len(arr)
    t = node.type
    zeros = np.zeros(n, dtype=bool)
    if t == "boolean":
        return k_scalars.coerce_boolean(arr, env, node.terms, node.flags)
    if t == "date":
        return k_scalars.coerce_date(arr, env, node.flags)
    if t == "binary":
        return k_scalars.coerce_binary(arr, env, node.flags)
    if t == "string":
        if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type) or pa.types.is_null(arr.type):
            # replace/truncate moved to eval_node's string coerce pipeline
            # (joi's fixed stage order puts them AFTER normalize/case/trim)
            return arr, zeros
        return arr, ~null_mask(arr)
    if t == "array":
        if pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type) or pa.types.is_null(arr.type):
            return arr, zeros
        if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)) and env.convert:
            if not node.flags.get("single"):
                return _json_parse_column(arr, want="array")
            # single: a string that fails the JSON-array parse is not an
            # error — base validate wraps any non-array as [value]
            # (array.js:36-49 coerce returns early, :67-74 single wrap)
            parsed, fail = _json_parse_column(arr, want="array")
            if not fail.any():
                return parsed, fail
            if pa.types.is_list(parsed.type) or pa.types.is_large_list(parsed.type):
                wrapped = _wrap_single(arr, n)
                try:
                    out = pc.if_else(pa.array(fail), wrapped.cast(parsed.type), parsed)
                    return out, zeros
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
            return _wrap_single(arr, n), zeros
        if node.flags.get("single") and not pa.types.is_list(arr.type):
            return _wrap_single(arr, n), zeros
        return arr, ~null_mask(arr)
    if t == "object":
        if pa.types.is_struct(arr.type) or pa.types.is_null(arr.type):
            return arr, zeros
        if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)) and env.convert:
            return _json_parse_column(arr, want="object")
        return arr, ~null_mask(arr)
    return arr, zeros


def _wrap_single(arr: pa.Array, n: int) -> pa.ListArray:
    """Wrap scalars into 1-item lists, preserving null rows as null lists
    (array.js:66-74 ``single`` base-validate wrap)."""
    nulls = null_mask(arr)
    lengths = np.where(nulls, 0, 1).astype(np.int32)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    values = arr.filter(pc.is_valid(arr))
    off_list = offsets[:-1].tolist()
    off_py = [None if nulls[i] else int(off_list[i]) for i in range(n)] + [int(offsets[-1])]
    return pa.ListArray.from_arrays(pa.array(off_py, type=pa.int32()), values)


def _json_parse_column(arr: pa.Array, want: str):
    """JSON-string coercion for object/array columns (the reference's
    @hapi/bourne parse, ``lib/types/object.js:49-64`` / ``array.js:31-61``).
    Per-cell Python by necessity (Arrow has no try-parse-JSON kernel) — the
    documented [A] fallback in SURVEY.md §2.1; keep such columns rare/small
    or pre-parse upstream."""
    n = len(arr)
    fail = np.zeros(n, dtype=bool)
    vals = []
    opener = "{" if want == "object" else "["
    for i, s in enumerate(arr.to_pylist()):
        if s is None:
            vals.append(None)
            continue
        st = s.lstrip()
        if not st.startswith(opener):
            vals.append(None)
            fail[i] = True
            continue
        try:
            vals.append(json.loads(st))
        except (ValueError, TypeError):
            vals.append(None)
            fail[i] = True
    try:
        out = pa.array(vals)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        return arr, ~null_mask(arr)
    return out, fail


_LOCAL_ABORT_GID = [0]


def eval_node(
    node: CNode,
    arr,
    env: Env,
    path: str,
    scope: Optional[np.ndarray] = None,
) -> NodeResult:
    """Validate one column/array against one compiled node (thin wrapper
    over the implementation).  When the node's schema-LOCAL prefs turn
    abortEarly ON under a non-aborting caller (validator.js merges prefs
    per node, :116-118), joi returns at that node's first error per row —
    the subtree's error recs get a local-abort group id so
    ``_assemble_violations`` applies the abort-early filter SCOPED to this
    node's emissions (fuzz seed 15100028: ordered-array slot any.only must
    suppress the later array.sparse/orderedLength under local abort).
    Outer tags overwrite inner ones — the outer abort subsumes."""
    res = _eval_node_impl(node, arr, env, path, scope=scope)
    if (node.schema.prefs and node.schema.prefs.get("abort_early")
            and not env.prefs.get("abort_early", True)):
        _LOCAL_ABORT_GID[0] += 1
        gid = _LOCAL_ABORT_GID[0]
        for rec in res.errors:
            rec.local_abort = gid
    return res


def _eval_node_impl(
    node: CNode,
    arr,
    env: Env,
    path: str,
    scope: Optional[np.ndarray] = None,
) -> NodeResult:
    """Validate one column/array against one compiled node.  ``scope`` masks
    which rows this evaluation applies to (used for struct children of null
    parents and conditional branches); errors outside scope are suppressed."""
    arr = combine(arr)
    if pa.types.is_dictionary(arr.type):
        arr = arr.dictionary_decode()  # kernels operate on plain arrays
    n = len(arr)
    if scope is None:
        scope = np.ones(n, dtype=bool)

    # schema-local prefs override call prefs (lib/validator.js:116-118,433-448)
    if node.schema.prefs:
        _e2 = Env({**env.prefs, **node.schema.prefs}, env._resolve_sibling, env.ancestors)
        # keep the parent-row accessor for arg-taking fn defaults/failovers
        # (fuzz seed 48003724: schema-local prefs dropped it, feeding the
        # failover fn a None parent)
        _e2.row_getter = env.row_getter
        env = _e2

    # ---- conditionals: branch per row, each branch = base.concat(branch)
    if node.whens:
        w = node.whens[0]
        scope, _wpre_errs, _wpre_failed = _wrapper_valids_stage(
            node, arr, env, path, scope, n)
        if "peek" in w:
            cond = node_validity(w["peek"], arr, env, scope)
            sel_then = scope & cond
            sel_other = scope & ~cond
            merged = NodeResult(value=arr, missing=np.zeros(n, bool), failed=np.zeros(n, bool))
            _merge_into(merged, eval_node(w["then"], arr, env, path, scope=sel_then), sel_then)
            _merge_into(merged, eval_node(w["otherwise"], arr, env, path, scope=sel_other), sel_other)
            merged.errors[:0] = _wpre_errs
            merged.failed |= _wpre_failed
            return _finish_whens(
                node, merged,
                [(w["then"], sel_then), (w["otherwise"], sel_other)],
                env, path, scope)
        ref_resolved = _resolve_when_ref(w["ref"], arr, env, n)
        if "switch" in w:
            remaining = scope.copy()
            merged = NodeResult(value=arr, missing=np.zeros(n, bool), failed=np.zeros(n, bool))
            parts = []
            for is_c, then_c in w["switch"]:
                cond = _when_condition(is_c, ref_resolved, env, remaining, n)
                sel = remaining & cond
                remaining = remaining & ~cond
                sub = eval_node(then_c, arr, env, path, scope=sel)
                _merge_into(merged, sub, sel)
                parts.append((then_c, sel))
            sub = eval_node(w["otherwise"], arr, env, path, scope=remaining)
            _merge_into(merged, sub, remaining)
            parts.append((w["otherwise"], remaining))
            merged.errors[:0] = _wpre_errs
            merged.failed |= _wpre_failed
            return _finish_whens(node, merged, parts, env, path, scope)
        cond = _when_condition(w["is"], ref_resolved, env, scope, n)
        sel_then = scope & cond
        sel_other = scope & ~cond
        merged = NodeResult(value=arr, missing=np.zeros(n, bool), failed=np.zeros(n, bool))
        _merge_into(merged, eval_node(w["then"], arr, env, path, scope=sel_then), sel_then)
        _merge_into(merged, eval_node(w["otherwise"], arr, env, path, scope=sel_other), sel_other)
        merged.errors[:0] = _wpre_errs
        merged.failed |= _wpre_failed
        return _finish_whens(
            node, merged,
            [(w["then"], sel_then), (w["otherwise"], sel_other)],
            env, path, scope)

    errors: list[ErrRec] = []
    original = arr

    # ---- alternatives: first-match-wins over matches
    if node.type == "alternatives":
        return _eval_alternatives(node, arr, env, path, scope, errors)

    # ---- coerce
    arr, base_fail, coerce_errs = _coerce3(node, arr, env)

    # string coerce pipeline in joi's FIXED stage order (string/index.js
    # :68-135): normalize -> case -> trim -> replace -> hex pad -> isoDate
    # -> truncate, all BEFORE valids/empty; the convert-phase rules are
    # then skipped in the rules loop (lib/validator.js:269-273)
    if node.type == "string" and env.convert and (
        pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)
    ):
        for cr in node.convert_rules:  # normalize -> case -> trim
            out = cr.fn(arr, env)
            if out.new_value is not None:
                arr = out.new_value
        # replacements run AFTER trim (string/index.js:89-95) — fuzz seed
        # 5000021: lowercase must land before the replace pattern matches
        if node.replacements:
            arr = k_strings.apply_replacements(arr, node.replacements)
        # hex byteAligned odd-length zero-pad (string/index.js:97-103)
        _hexr = next((r for r in node.schema.rules if r["name"] == "hex"
                      and (r.get("args") or {}).get("options", {}).get("byteAligned")),
                     None)
        if _hexr is not None:
            odd = pc.equal(pc.bit_wise_and(pc.utf8_length(arr), 1), 1)
            padded = pc.binary_join_element_wise(pa.nulls(n, pa.string()).fill_null("0"), arr, "")
            arr = pc.if_else(odd, padded, arr)
        # isoDate converts via toISOString at coerce; failure is a COERCE
        # error that aborts the row — no valids/rules run (string/index.js
        # :105-117 returns {value, errors}; fuzz seed 5000076)
        _isocr = next((cr for cr in node.rules if cr.name == "isoDate"), None)
        if _isocr is not None and _isocr.fn is not None:
            out = _isocr.fn(arr, env)
            if out.new_value is not None:
                arr = out.new_value
            _iso_bad = ~out.ok & ~null_mask(arr)
            if _iso_bad.any():
                coerce_errs = list(coerce_errs) + [("string.isoDate", _iso_bad)]
        # truncate slices to the max() limit LAST (string/index.js:119-133),
        # with per-row ref-resolved limits; a non-positive-integer resolved
        # limit is an any.ref coerce error
        if node.flags.get("truncate"):
            _maxr = next((r for r in node.schema.rules if r["name"] == "max"), None)
            if _maxr is not None:
                _lim = _maxr["args"]["limit"]
                if isinstance(_lim, Ref):
                    rv = env.resolve_ref(_lim, n)
                    if isinstance(rv, (pa.Array, pa.ChunkedArray)):
                        lv = combine(rv).to_pylist()
                    else:
                        lv = [rv] * n
                    bad_lim = np.array(
                        [not (isinstance(v, (int, float)) and not isinstance(v, bool)
                              and v >= 0 and float(v).is_integer()) for v in lv],
                        dtype=bool) & ~null_mask(arr)
                    if bad_lim.any():
                        coerce_errs = list(coerce_errs) + [("any.ref", bad_lim)]
                    good = ~bad_lim & ~null_mask(arr)
                    if good.any():
                        out_l = combine(arr).to_pylist()
                        for i in np.nonzero(good)[0]:
                            out_l[int(i)] = out_l[int(i)][: int(lv[int(i)])]
                        arr = pa.array(out_l, type=pa.string())
                elif not hasattr(_lim, "kind"):
                    arr = k_strings.truncate_to(arr, int(_lim))

    # array sort() runs at COERCE time under convert — BEFORE the items
    # loop, so sparse/item errors report post-sort indexes (array.js
    # coerce:44-48 -> internals.sort; fuzz seed 10100012: [undef,5,5,0.5]
    # descending sparse-errors at index 3, not 0).  convert=True forces
    # the sort regardless of prefs (engine extension); convert=False
    # never sorts here (check-only, validated in the rules loop)
    if node.type == "array" and (
        pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)
    ):
        _srt = next((r for r in node.schema.rules if r["name"] == "sort"), None)
        if _srt is not None:
            _sc = _srt["args"].get("convert")
            if _sc is True or (_sc is None and env.convert):
                arr, _serrs = k_lists.coerce_sort(arr, _srt["args"])
                coerce_errs = list(coerce_errs) + _serrs

    # rows with a coerce-stage error return IMMEDIATELY in joi
    # (validator.js:150-156 finalize) — the empty stage, presence and
    # defaults never see them (fuzz seed 5102192: '' failing isoDate at
    # coerce reports ONLY string.isoDate, never the empty-converted
    # any.required)
    coerce_bad = np.zeros(n, dtype=bool)
    for _cc, _cm in coerce_errs:
        coerce_bad |= _cm

    # ---- empty: values (or matching schemas) treated as missing
    # (lib/validator.js:162-165; empty(schema) per lib/base.js:124-134)
    if node.empty_values or node.empty_schemas:
        # the empty check probes the TRIMMED value when a trim() rule is
        # enabled, and matches under DEFAULT prefs (convert on) regardless
        # of the caller's convert setting (validator.js:162-163 passes
        # internals.trim(value, schema) and Common.defaults)
        probe = arr
        if (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)) and any(
            r.get("name") == "trim" and r.get("args", {}).get("enabled", True)
            for r in node.schema.rules
        ):
            probe = pc.utf8_trim_whitespace(arr)
        em = (
            _set_membership(probe, node.empty_values, [], node.flags.get("insensitive", False), env)
            if node.empty_values
            else np.zeros(n, dtype=bool)
        )
        if node.empty_schemas:
            eenv = Env({"convert": True}, getattr(env, "_resolve_sibling", None), env.ancestors)
            for es in node.empty_schemas:
                em |= node_validity(es, probe, eenv, scope) & ~null_mask(probe)
        em = em & ~coerce_bad
        if em.any():
            arr = pc.if_else(pa.array(em), pa.nulls(n, arr.type), arr)

    missing = null_mask(arr) & ~base_fail
    present = ~missing & ~base_fail

    failed = np.zeros(n, dtype=bool)
    resolved = np.zeros(n, dtype=bool)

    def add_err(code, mask, ctx=None, seq=10_000, warn=False, message=None, item_rows=None, item_index=None, path_override=None, values=None, group=None, soft=False, path_ipos=None, no_label=False):
        mask = mask & scope
        p = path_override if path_override is not None else path
        if "label" in node.flags and path_override is None and not no_label:
            ctx = {**(ctx or {}), "label": node.flags["label"]}
        # node-level error() override (lib/base.js:136-142, applied at
        # finalize lib/validator.js:368-380 — replaces every error of the
        # node, so it beats per-rule message()); a callable is asked once
        # per error family
        node_err = node.flags.get("error")
        if node_err is not None:
            message = node_err
        else:
            fn = getattr(node.schema, "metas", {}).get("error_fn")
            if fn is not None:
                m = fn(code, p, dict(ctx or {}))
                if isinstance(m, str):
                    message = m
        if message is None:
            # prefs-level messages map incl. errors.language sub-maps
            # (schema-local prefs are merged into env by eval_node)
            message = k_messages.lookup_override(code, env.prefs)
        if isinstance(message, str) and "{[.]}" in message:
            # joi's per-row value token in custom templates works on ANY
            # rule (node-verified) — normalize to the engine's {value}
            # channel, substituted per fired row at render time
            message = message.replace("{[.]}", "{value}")
        if (isinstance(message, str) and "{value}" in message
                and code == "any.ref" and values is None):
            # the ARG-assert any.ref report value is the RESOLVED arg
            # (validator.js:289); when the producer didn't capture it the
            # resolution was undefined — renders '' (node-verified)
            message = message.replace("{value}", "")
        if item_rows is not None:
            keep = scope[item_rows]
            item_rows, item_index = item_rows[keep], item_index[keep]
            if len(item_rows) == 0:
                return
            rec = ErrRec(code, mask, p, ctx or {}, seq, warn, message)
            rec.rows = item_rows
            rec.item_index = item_index
            # FIRE-time item order: strip-splice bookkeeping re-points
            # item_index post-hoc for display, but abortEarly ordering must
            # follow joi's walk at emission time (fuzz seed 16300451: a
            # stripped slot-0 warn precedes the slot-1 sparse even though
            # both DISPLAY as index 0 post-splice)
            rec.fire_items = np.asarray(item_index).copy()
            rec.ipos = path_ipos
            if values is not None:
                rec.values = [v for v, k in zip(values, keep) if k]
            rec.order, rec.soft = group, soft
            errors.append(rec)
            if not warn:
                failed[item_rows] = True
            return rec
        if not mask.any():
            return None
        if (values is None and isinstance(message, str) and "{value}" in message
                and arr is not None):
            # a custom template asked for the offending value ({[.]}) on a
            # rule that doesn't natively carry one: extract the CURRENT
            # node value for the fired rows only (joi renders the value at
            # error-creation time)
            try:
                fired = np.nonzero(mask)[0]
                col = combine(arr)
                values = [col[int(i)].as_py() for i in fired]
            except Exception:
                values = None
        rec = ErrRec(code, mask, p, ctx or {}, seq, warn, message)
        rec.rows = None
        rec.values = values
        rec.order, rec.soft = group, soft
        errors.append(rec)
        if not warn:
            np.logical_or(failed, mask, out=failed)
        return rec

    # ---- coerce-stage errors always abort early (validator.js:150-156):
    # the row gets ONLY this error — no presence/valids/base/rules
    for _code, _cmask in coerce_errs:
        add_err(_code, _cmask & scope, seq=-4)
        resolved |= _cmask

    # ---- presence (lib/validator.js:168-190): the explicit flag wins,
    # else prefs.presence supplies the default for every node
    presence = node.flags.get("presence") or env.prefs.get("presence", "optional")
    if node.allow_missing:
        resolved |= missing
    elif presence == "required":
        add_err("any.required", missing, seq=-3)
    elif presence == "forbidden":
        # joi returns immediately on a present forbidden value
        # (validator.js:188-190) — any.unknown is the ONLY error; no
        # valids/base/rules run for those rows.  "Present" here includes
        # uncoercible values (joi's coerce emits no error for them; the
        # base check they would have hit never runs)
        add_err("any.unknown", ~missing & scope & ~resolved & ~coerce_bad, seq=-3)
        resolved |= True  # everything settled at this stage
        base_fail = np.zeros(n, dtype=bool)
    else:
        resolved |= missing

    # ---- valids / invalids (lib/validator.js:194-227)
    insensitive = node.flags.get("insensitive", False)
    active = scope & ~missing & ~resolved & ~failed
    if node.allow_static or node.allow_refs:
        in_allow = _set_membership(arr, node.allow_static, node.allow_refs, insensitive, env)
        # a valids MATCH replaces the value with the stored valid in convert
        # mode (validator.js:197-201) — visible for insensitive string
        # matches: 'ABC' with valid('abc').insensitive() converts to 'abc'
        if (
            insensitive
            and env.convert
            and in_allow.any()
            and (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type))
        ):
            lowered = pc.utf8_lower(arr)
            # joi's Values.get checks EXACT membership first (values.js:74)
            # — only insensitive-rescued rows take the stored spelling
            str_valids = [v for v in node.allow_static if isinstance(v, str)]
            replaced = (
                as_bool_np(pc.is_in(arr, value_set=pa.array(str_valids, type=arr.type)), n)
                if str_valids
                else np.zeros(n, dtype=bool)
            )
            for v in str_valids:
                hit = in_allow & ~replaced & as_bool_np(pc.equal(lowered, v.lower()), n)
                if hit.any():
                    arr = pc.if_else(pa.array(hit), pa.scalar(v, type=arr.type), arr)
                    replaced |= hit
        in_allow_orig = in_allow
        if base_fail.any():
            in_allow_orig = in_allow | _set_membership(original, node.allow_static, node.allow_refs, insensitive, env)
        if node.flags.get("only"):
            # joi raises any.only even for rows that will also fail the
            # base type check (valids stage precedes base validate and
            # only abortEarly suppresses the second error)
            miss_set = active & ~in_allow_orig
            add_err("any.only", miss_set, {"valids": node.allow_static}, seq=-2)
            resolved |= in_allow_orig
        else:
            resolved |= in_allow_orig
        base_fail = base_fail & ~in_allow_orig
    elif node.flags.get("only"):
        pass  # only with no allow values: everything fails? joi treats as no-op
    # under the node-EFFECTIVE abortEarly (env carries schema-local prefs)
    # joi returns at the first stage error per row (validator.js:194-247):
    # a valids any.only suppresses the invalids check and the base-stage
    # errors for that row.  With the outer abortEarly the table-level
    # filter already picks the first emission, so this gate only changes
    # observable output when a node-local prefs({abortEarly:true}) rides
    # under an outer abortEarly:false (fuzz seed 16000129)
    _ae_gate = (lambda m: m & ~failed) if env.abort_early else (lambda m: m)
    if node.invalid_static or node.invalid_refs:
        in_invalid = _set_membership(arr, node.invalid_static, node.invalid_refs, insensitive, env)
        add_err("any.invalid", _ae_gate(in_invalid & active & ~resolved), {"invalids": node.invalid_static}, seq=-2)
    if node.invalid_missing:
        pass  # null in invalid(): joi invalid(null) -> missing is an error only if present-as-null; N/A in Arrow

    # ---- base type errors from coercion; date picks a format-specific
    # code (date.js:39-49: strict -> date.strict, iso -> date.isoDate,
    # timestamp -> date.timestamp.{javascript|unix})
    base_code = f"{node.type}.base"
    if node.type == "date":
        if not env.convert:
            base_code = "date.strict"
        else:
            fmt = node.flags.get("format")
            if fmt == "iso":
                base_code = "date.isoDate"
            elif fmt == "ms":
                base_code = "date.timestamp.javascript"
            elif fmt == "s":
                base_code = "date.timestamp.unix"
    # rows with base-stage errors skip the rules loop entirely (joi's
    # "Base error always aborts early", validator.js:236-247) — track them
    base_errored = base_fail & ~resolved
    add_err(base_code, _ae_gate(base_fail & ~resolved), seq=-1)

    # ---- number base checks: NaN / Infinity / unsafe magnitude
    if node.type == "number" and (pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type)):
        arr, base_errs = k_numbers.base_check(arr, env, node.flags)
        for code, mask, ctx in base_errs:
            m = mask & ~missing & ~resolved
            base_errored |= m
            add_err(code, _ae_gate(m), ctx, seq=-1)

    # ---- string base: empty string is an error (string/index.js:139-148)
    if node.type == "string" and (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)):
        allow_empty = any(v == "" for v in node.allow_static)
        if not allow_empty:
            empty_mask = as_bool_np(pc.equal(pc.utf8_length(arr), 0), n)
            m = empty_mask & scope & ~missing & ~resolved
            base_errored |= m
            add_err("string.empty", _ae_gate(m), seq=-1)

    # ---- structural recursion
    _list_alt_pair = None
    if node.type == "array" and (pa.types.is_list(arr.type) or pa.types.is_large_list(arr.type)):
        # array ITEMS are rules in joi (array.js items/ordered are rule
        # entries), so item errors do NOT suppress length/unique rules
        if presence == "forbidden":
            # joi returns at the presence stage for forbidden values
            # (validator.js:188-190): any.unknown is the only error — item
            # schemas never run (node-verified, fuzz seed 14000246 family)
            _list_alt_pair = None
        else:
            arr, _list_alt_pair = _eval_array(node, arr, env, path, scope, resolved, failed, add_err)
    elif node.type == "object" and pa.types.is_struct(arr.type) and presence == "forbidden":
        # same presence-stage return for objects: children are not validated
        pass
    elif node.type == "object" and pa.types.is_struct(arr.type):
        # object keys+dependencies live in def.validate (object.js:68) —
        # a child error suppresses the object's OWN rules for that row
        failed_before_children = failed.copy()
        arr = _eval_object(node, arr, env, path, scope, resolved, failed, errors, add_err)
        base_errored |= failed & ~failed_before_children
    resolved |= base_errored

    # ---- rules loop (lib/validator.js:260-320)
    # Per-value joi returns before the rules loop when the base type check
    # failed; the columnar equivalent: Arrow columns are homogeneous, so a
    # family-incompatible physical type means EVERY present row already
    # carries {type}.base — running typed kernels would crash on the raw
    # array (e.g. a regex over int64), so skip the loop wholesale.
    rules = node.rules if _rule_type_ok(node.type, arr.type) else ()
    for cr in rules:
        if cr.convert_phase and env.convert:
            continue  # already applied in the coerce phase
        if cr.fn is None:  # warning rule: always fires on present rows
            active = scope & ~missing & ~resolved
            add_err(cr.code, active, {"code": cr.code}, seq=cr.seq, warn=True, message=cr.message)
            continue
        if isinstance(cr.fn, tuple) and cr.fn[0] == "structural":
            _eval_structural_rule(node, cr, arr, env, path, scope, missing, resolved, failed, add_err)
            continue
        active = scope & ~missing & ~resolved
        if env.abort_early:
            active = active & ~failed
        if not active.any() and cr.convert_phase is False:
            continue
        n_active = int(active.sum())
        if (
            cr.name in _PURE_CHECK_RULES
            and env.prefs.get("scoped_eval", True)
            and 0 < n_active < int(0.7 * n)
            and node.type != "array"  # list kernels need full offsets
        ):
            idx = np.nonzero(active)[0]
            idx_arr = pa.array(idx)
            sub_env = _TakeEnv(env, idx_arr)
            sub_arr = arr.take(idx_arr)
            out = cr.fn(sub_arr, sub_env)
            not_ok = ~out.ok
            ref_err = out.context.pop("__ref_err__", None) if out.context else None
            if ref_err is not None:
                # ref-resolved arg failed the rule's assert: any.ref fires
                # INSTEAD of the rule error (lib/validator.js:281-293);
                # the report's value is the RESOLVED arg (for {[.]})
                rsub, rctx, rvals = (*ref_err, None)[:3]
                rmask = np.zeros(n, dtype=bool)
                rmask[idx[rsub]] = True
                add_err("any.ref", rmask, rctx, seq=cr.seq, warn=cr.warn,
                        message=cr.message, values=rvals)
                not_ok = not_ok & ~rsub
            bad = np.zeros(n, dtype=bool)
            bad[idx[not_ok]] = True
            vals = None
            if cr.code in k_messages.VALUE_CODES and not_ok.any():
                vals = sub_arr.filter(pa.array(not_ok)).to_pylist()
            add_err(cr.code, bad, out.context, seq=cr.seq, warn=cr.warn, message=cr.message, values=vals)
            continue
        out = cr.fn(arr, env)
        if out.new_value is not None:
            arr = out.new_value
        bad = active & ~out.ok
        alt_err = out.context.pop("__alt_err__", None) if out.context else None
        if alt_err is not None:
            # a kernel raising a DIFFERENT code for some rows (joi's
            # comparator-thrown array.sort.mismatching replaces the rule's
            # own error there)
            amask, acode, actx = alt_err
            add_err(acode, amask & active, actx, seq=cr.seq, warn=cr.warn)
        ref_err = out.context.pop("__ref_err__", None) if out.context else None
        if ref_err is not None:
            rmask, rctx, rvals = (*ref_err, None)[:3]
            fired0 = rmask.copy()
            rmask = rmask & active
            if rvals is not None and not np.array_equal(fired0, rmask):
                # values were aligned with the producer's fired set —
                # refilter to the active subset
                keepm = rmask[np.nonzero(fired0)[0]]
                rvals = [v for v, k in zip(rvals, keepm) if k]
            add_err("any.ref", rmask, rctx, seq=cr.seq, warn=cr.warn,
                    message=cr.message, values=rvals)
            bad = bad & ~rmask
        if out.item_rows is not None:
            keep = active[out.item_rows]
            add_err(cr.code, bad, out.context, seq=cr.seq, warn=cr.warn,
                    message=cr.message, item_rows=out.item_rows[keep],
                    item_index=out.item_index[keep])
            continue
        vals = None
        if cr.code in k_messages.VALUE_CODES and bad.any():
            vals = arr.take(pa.array(np.nonzero(bad)[0])).to_pylist()
        add_err(cr.code, bad, out.context, seq=cr.seq, warn=cr.warn, message=cr.message, values=vals)

    # ---- finalize (lib/validator.js:351-430); noDefaults pref skips
    # default/failover substitution (test/base.js:1104-1155)
    no_defaults = env.prefs.get("no_defaults", False)
    # joi's finalize substitutes the default whenever the value is undefined
    # regardless of presence (validator.js:383-386): required-missing rows
    # carry any.required AND the default in the output value
    dflt_pairs: list = []  # blocked default/failover adoptions -> AltView
    # rows whose value finalize SET (joi: no longer undefined) — consumed
    # by a whens wrapper's own default step (_finish_whens)
    _fin_filled = np.zeros(n, dtype=bool)
    # finalize order is FAILOVER first, then default (validator.js:353-385:
    # failover consumes the rule errors and clears them; the Default step
    # runs after, on values still undefined — so a failover never swallows
    # a default-throw's any.default, fuzz seed 18000796)
    if "failover" in node.flags and not no_defaults:
        fv = node.flags["failover"]
        fo_mask = failed & scope
        if fo_mask.any() and callable(fv):
            # function failovers run per failed row like function defaults
            # (validator.js:359-364 -> internals.default): a throw appends
            # any.failover and the row KEEPS its original errors; success
            # rows adopt the value and clear errors below
            fired = np.nonzero(fo_mask)[0]
            vals, threw, ferr = _fn_default_values(fv, fired, env)
            if threw.any():
                tmask = np.zeros(n, dtype=bool)
                tmask[fired[threw]] = True
                _frec = add_err(
                    "any.failover", tmask, {"error": repr(ferr)}, seq=10_001,
                    # a pre-when label belongs to joi's branches; the
                    # finalize error fires on the unlabeled wrapper
                    no_label=bool(getattr(node.schema, "metas", {}).get("_label_pre_when")))
                if _frec is not None:
                    # finalize pushes AFTER the abort point
                    # (validator.js:359-364) — rides along under abortEarly
                    _frec.post_abort = True
                fo_mask = fo_mask & ~tmask  # thrown rows stay failed
            f_ok = fired[~threw]
            v_ok = [v for v, t in zip(vals, threw) if not t]
            if len(f_ok):
                adopted = _adopt_fn_values(arr, f_ok, v_ok, n)
                if adopted is not None:
                    arr = adopted
                else:
                    # one-type-per-column ceiling: typed values reach
                    # sibling refs via the AltView (fuzz seed 18001890)
                    p = _dflt_pair(n, f_ok, v_ok)
                    if p is not None:
                        dflt_pairs.append(p)
                # a failover fn returning undefined leaves the row undefined
                _fin_filled[f_ok[[v is not None for v in v_ok]]] = True
        if fo_mask.any():
            if not callable(fv):
                _fin_filled |= fo_mask
                s = _scalar_for(fv, arr.type)
                if s is not None and _rt_eq(fv, s.as_py()):
                    arr = pc.if_else(pa.array(fo_mask), s, arr)
                elif not (~missing & ~failed & scope).any():
                    # cross-type failover over a column with no clean kept
                    # value (number failover on an all-failing string column
                    # under convert:false) rebuilds in the failover's type,
                    # like the default path above (fuzz seed 5000296)
                    try:
                        arr = pa.array([fv if m else None for m in fo_mask])
                    except (pa.ArrowInvalid, pa.ArrowTypeError):
                        pass
                else:
                    fo_rows = np.nonzero(fo_mask)[0]
                    p = _dflt_pair(n, fo_rows, [fv] * len(fo_rows))
                    if p is not None:
                        dflt_pairs.append(p)
            if env.abort_early:
                # joi had already RETURNED at the row's first hard error
                # (array.js:213-216 etc.) — warns that would have fired
                # AFTER that point were never emitted, and the failover's
                # error-clear must not resurrect them (fuzz seeds
                # 29003478 / 49000734, node-verified)
                _drop_post_abort_warns(errors, fo_mask, n)
            for rec in errors:
                if rec.warn:
                    # failover clears ERRORS only (validator.js:359-364
                    # `errors = []`); warns emitted BEFORE the abort point
                    # persist (fuzz seed 44: the alphanum warn outlives
                    # the failover)
                    continue
                if rec.rows is None:
                    rec.mask = rec.mask & ~fo_mask
                else:
                    keep = ~fo_mask[rec.rows]
                    rec.rows, rec.item_index = rec.rows[keep], rec.item_index[keep]
            errors[:] = [r for r in errors if r.warn or (r.rows is not None and len(r.rows)) or (r.rows is None and r.mask.any())]
            failed = failed & ~fo_mask
    if ("default" in node.flags
            and not no_defaults and node.flags["default"] != Schema._DEEP_DEFAULT):
        dv = node.flags["default"]
        # the default fires on values still UNDEFINED after the failover
        # step (validator.js:383) — a required-missing row the failover
        # just filled is defined now (node: failover(-1)+default(10) on a
        # missing required value yields -1; fuzz seed 19000479)
        fill_mask = missing & scope & ~_fin_filled
        from .kernels.template import Template as _Tmpl

        if fill_mask.any():
            if isinstance(dv, _Tmpl):
                # expression-valued default (Joi.x / Joi.expression —
                # template.js:150-159 resolve): a single-expression
                # template yields the evaluated VALUE ('{a + 1}' -> 5),
                # multi-part renders text; refs resolve per fill row.
                # Per-row by nature (bounded by the MISSING rows only).
                from .kernels.util import resolve_template_column

                rows_fill = np.nonzero(fill_mask)[0]
                tcol = resolve_template_column(dv, env, n)
                vals = [tcol[int(i)].as_py() for i in rows_fill]
                _fin_filled[rows_fill[[v is not None for v in vals]]] = True
                filled = [None] * n
                for i, val in zip(rows_fill, vals):
                    filled[int(i)] = val
                if pa.types.is_null(arr.type):
                    arr = pa.array(filled)
                else:
                    try:
                        fill_arr = pa.array(filled, type=arr.type)
                        arr = pc.if_else(pa.array(fill_mask), fill_arr, arr)
                    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
                        out = combine(arr).to_pylist()
                        for i, val in zip(rows_fill, vals):
                            out[int(i)] = val
                        arr = pa.array(out)
            elif isinstance(dv, Ref):
                # ref-valued default resolves per row (test/ref.js:993-1034)
                rv = env.resolve_ref(dv, n)
                if isinstance(rv, (pa.Array, pa.ChunkedArray)):
                    rv = combine(rv)
                    # a ref resolving undefined leaves the row undefined
                    _fin_filled |= fill_mask & ~null_mask(rv)
                    fill = pa.array(fill_mask)
                    try:
                        if pa.types.is_null(arr.type):
                            arr = pc.if_else(fill, rv, pa.nulls(n, rv.type))
                        else:
                            if rv.type != arr.type:
                                rv = rv.cast(arr.type)
                            arr = pc.if_else(fill, rv, arr)
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                        pass
                elif pa.types.is_null(arr.type):
                    if rv is not None:
                        _fin_filled |= fill_mask
                    arr = pa.array([rv if m else None for m in fill_mask])
                else:
                    if rv is not None:
                        _fin_filled |= fill_mask
                    s = _scalar_for(rv, arr.type)
                    if s is not None:
                        arr = pc.if_else(pa.array(fill_mask), s, arr)
            elif callable(dv):
                # function defaults run PER missing value (validator.js:
                # 451-475): zero-arg fns call fresh per row, arg-taking
                # fns get (parent row dict, prefs); a throw records
                # any.default and the row keeps undefined
                fired = np.nonzero(fill_mask)[0]
                vals, threw, ferr = _fn_default_values(dv, fired, env)
                if threw.any():
                    tmask = np.zeros(n, dtype=bool)
                    tmask[fired[threw]] = True
                    _frec = add_err(
                        "any.default", tmask, {"error": repr(ferr)}, seq=10_001,
                        # pre-when label = branch label, wrapper unlabeled
                        no_label=bool(getattr(node.schema, "metas", {}).get("_label_pre_when")))
                    if _frec is not None:
                        # finalize pushes AFTER the abort point
                        # (validator.js:385) — rides along under abortEarly
                        _frec.post_abort = True
                f_ok = fired[~threw]
                v_ok = [v for v, t in zip(vals, threw) if not t]
                if len(f_ok):
                    adopted = _adopt_fn_values(arr, f_ok, v_ok, n)
                    if adopted is not None:
                        arr = adopted
                    else:
                        # one-type-per-column ceiling: expose the typed
                        # values to sibling refs (joi's object holds them)
                        p = _dflt_pair(n, f_ok, v_ok)
                        if p is not None:
                            dflt_pairs.append(p)
                    # a default fn returning undefined leaves undefined
                    _fin_filled[f_ok[[v is not None for v in v_ok]]] = True
            else:
                _fin_filled |= fill_mask
                if pa.types.is_null(arr.type):
                    arr = pa.array([dv if m else None for m in fill_mask])
                else:
                    s = _scalar_for(dv, arr.type)
                    if s is not None and _rt_eq(dv, s.as_py()):
                        arr = pc.if_else(pa.array(fill_mask), s, arr)
                    elif not (~missing & ~failed & scope).any():
                        # the default's type can't live in the input column
                        # (e.g. number default over an all-failing string
                        # column under convert:false) and NO clean kept
                        # value needs the old type — rebuild in the
                        # default's type so the fill still lands (joi's
                        # heterogeneous object would hold the raw number)
                        try:
                            arr = pa.array([dv if m else None for m in fill_mask])
                        except (pa.ArrowInvalid, pa.ArrowTypeError):
                            pass
                    else:
                        # blocked cross-type scalar default (the _rt_eq
                        # guard also rejects pyarrow's silent conversions,
                        # e.g. int into a timestamp column): refs still
                        # see the typed value via the AltView
                        fill_rows = np.nonzero(fill_mask)[0]
                        p = _dflt_pair(n, fill_rows, [dv] * len(fill_rows))
                        if p is not None:
                            dflt_pairs.append(p)
    cast_to = node.flags.get("cast")
    if cast_to:
        arr = _apply_cast(arr, cast_to, env.prefs)
        if dflt_pairs:
            # a blocked cross-type default/failover adoption may FIT the
            # cast output type: joi's cast is gated by a `from` predicate
            # (validator.js:390-394), so the adopted raw scalar passes
            # through uncast — number cast('string') with failover 'q7'
            # outputs 'q7', not the cast of the stale original (fuzz seed
            # 20004648, node-verified)
            still = []
            for m, col in dflt_pairs:
                try:
                    if col.type == arr.type:
                        arr = pc.if_else(pa.array(m), col, arr)
                    else:
                        still.append((m, col))
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    still.append((m, col))
            dflt_pairs = still

    out_value = original if node.flags.get("raw") else arr
    nr = NodeResult(
        value=out_value,
        errors=errors,
        missing=missing,
        failed=failed,
        strip=bool(node.flags.get("strip")),
        raw_value=original,
        # joi shadows the CONVERTED value for ANY result-flagged schema —
        # raw() AND strip() — unconditionally, even when the node errored
        # (validator.js:413-417: `if (schema._flags.result)` precedes any
        # error check), so sibling refs to a strip key resolve the
        # converted value (fuzz seed 4000168: a failed alternatives branch
        # with strip still plants its coerced number for a date ref)
        shadow_value=arr if (node.flags.get("raw") or node.flags.get("strip")) else None,
        # joi's shadow records the value as finalize saw it — for a row
        # whose COERCION failed that is still the original ('1' stays a
        # string when boolean coercion missed), which our converted column
        # holds as null; those rows fall back to the raw-original path
        shadow_mask=(
            scope & ~(null_mask(arr) & ~null_mask(original))
            if (node.flags.get("raw") or node.flags.get("strip"))
            else None
        ),
        # a result flag REVERTS the finalize fill in the output slot
        # (validator.js:413-421 runs after the default step: raw returns
        # the ORIGINAL — undefined for missing input — and strip returns
        # undefined), so a wrapper's own default still sees those rows as
        # undefined (fuzz seed 40000303, node-verified: raw otherwise-
        # branch + post-when default(thrower) errors any.default)
        fin_filled=(_fin_filled if _fin_filled.any()
                    and not (node.flags.get("raw") or node.flags.get("strip"))
                    else None),
    )
    pairs = ([_list_alt_pair] if _list_alt_pair is not None else []) + dflt_pairs
    if pairs:
        # blocked cross-type item promotion / default / failover: ref
        # consumers see the per-row typed value joi's assignment implies
        # (engine value keeps originals — the Arrow one-type-per-column
        # repr limit)
        nr.alt_view = AltView(out_value, pairs)
    return nr


def _apply_cast(arr: pa.Array, to: str, prefs: dict | None = None) -> pa.Array:
    """joi's cast defs are gated by a `from` predicate (validator.js:390-
    394 `if (caster.from(value))`): a value that never coerced (e.g. a
    string under convert:false) passes through UNCAST."""
    if to == "string":
        if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type):
            # number cast: JS Number.prototype.toString (number.js:272-279)
            # — 5.0 renders '5', 1e10 '10000000000', not Arrow's '1e+10'
            return pa.array(
                [None if v is None else k_numbers.js_number_to_string(float(v)) for v in arr.to_pylist()],
                type=pa.string(),
            )
        if pa.types.is_timestamp(arr.type) or pa.types.is_date(arr.type):
            # date cast: Template.date(value, prefs) — the OUTPUT string
            # follows prefs.dateFormat, not just message rendering
            # (date.js:145-151 -> template.js:99-102; fuzz seed 16068).
            # Format from epoch-ms via the JS-exact formatter: strftime %Y
            # drops zero-padding for years <1000 and can't render the
            # expanded ±YYYYYY forms
            from .kernels.messages import _js_date_render

            fmt = (prefs or {}).get("date_format", "iso")
            ints = pc.cast(pc.cast(arr, pa.timestamp("ms")), pa.int64())
            return pa.array(
                [None if v is None else _js_date_render(v, fmt) for v in ints.to_pylist()],
                type=pa.string(),
            )
        if pa.types.is_binary(arr.type) or pa.types.is_large_binary(arr.type):
            # binary cast: buffer.toString() — a UTF-8 decode with
            # REPLACEMENT chars.  The safe cast validates utf-8, keeping
            # the common case zero-copy-ish; only columns carrying invalid
            # bytes (lenient base64 decodes; seed-133443 family) take the
            # per-row replacement path
            try:
                return pc.cast(arr, pa.string())
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                return pa.array(
                    [None if b is None else b.decode("utf-8", "replace")
                     for b in combine(arr).to_pylist()],
                    type=pa.string(),
                )
        if pa.types.is_boolean(arr.type):
            # boolean cast: value.toString() -> 'true'/'false'
            return pc.if_else(arr, pa.scalar("true"), pa.scalar("false"))
        return arr  # from-gate: value never coerced (e.g. convert:false)
    if to == "number":
        if pa.types.is_timestamp(arr.type):
            return pc.cast(pc.cast(arr, pa.timestamp("ms")), pa.int64())
        if pa.types.is_date(arr.type):
            return pc.cast(pc.cast(arr, pa.timestamp("ms")), pa.int64())
        if pa.types.is_boolean(arr.type):
            return pc.cast(arr, pa.int8())
        if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type):
            return arr  # already a number
        return arr  # from-gate: not a Date/boolean
    if to in ("set", "map"):
        return arr  # JS Set/Map casts are N/A-by-design in Arrow (SURVEY §2.3)
    try:
        return pc.cast(arr, to)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        return arr


def _wrapper_valids_stage(node: CNode, arr, env: Env, path, scope, n):
    """joi's when() wrapper runs ITS OWN valids stage before the branch
    dispatch (validator.js:194-227 precedes the type validate): values
    added by valid()/invalid() AFTER the when live on the fresh wrapper
    (base.js:364 starts empty).  A wrapper-valid match returns the value
    VERBATIM — the branch (and its coercion) never runs; a no-match under
    the wrapper's only flag pushes any.only (wrapper label) and CONTINUES
    into the branches, so the branch's own any.only can follow (fuzz seed
    54000083, node-verified — fires on missing rows too).  Returns
    (reduced scope, pre-errors, pre-failed)."""
    pre_errs: list[ErrRec] = []
    pre_failed = np.zeros(n, dtype=bool)
    wa = getattr(node, "wrapper_allow", None)
    wi = getattr(node, "wrapper_invalid", None)
    if not wa and not wi:
        return scope, pre_errs, pre_failed
    _wlbl = ({"label": node.flags["label"]}
             if "label" in node.flags
             and not getattr(node.schema, "metas", {}).get("_label_pre_when")
             else {})
    insensitive = node.flags.get("insensitive", False)
    if wa:
        hit = _set_membership(arr, wa, [], insensitive, env) & scope
        miss = scope & ~hit
        scope = miss
        if getattr(node, "wrapper_only", False) and miss.any():
            rec = ErrRec("any.only", miss, path, {"valids": wa, **_wlbl}, -2)
            rec.rows = None
            pre_errs.append(rec)
            pre_failed |= miss
    if wi:
        inv = _set_membership(arr, wi, [], insensitive, env) & scope
        if inv.any():
            rec = ErrRec("any.invalid", inv, path, {"invalids": wi, **_wlbl}, -2)
            rec.rows = None
            pre_errs.append(rec)
            pre_failed |= inv
    return scope, pre_errs, pre_failed


class _WrapperShim:
    """Minimal flag-bearer standing in for joi's unlabeled alternatives
    wrapper in _apply_default_failover_alt."""

    def __init__(self, flags):
        self.flags = flags


def _finish_whens(node: CNode, merged: NodeResult, parts, env: Env, path, scope) -> NodeResult:
    """Wrapper finalize after a whens branch merge — joi's when() wraps the
    base in a FRESH alternatives (base.js:364), so chain calls AFTER the
    when apply in the WRAPPER's finalize over the merged branch result:

    - a post-when .failover() fires only on rows the branches left errored
      (a pre-when failover already cleared its rows inside the branch —
      fuzz seed 1028: failover('ab') before the when, failover(thrower)
      after, both active at different levels);
    - a post-when .default() fires on rows whose branch result value is
      UNDEFINED: missing rows AND every row of a strip-flagged branch
      (validator.js:413-421 returns undefined for strip even on errors —
      fuzz seed 957: strip + when + default(thrower) errors any.default
      on every row);
    - rows that adopt a wrapper value are no longer strip-deleted (the
      wrapper has no result flag, so the parent writes the value)."""
    wf = getattr(node, "wrapper_fins", None)
    if not wf or env.prefs.get("no_defaults", False):
        return _whens_alt(merged)
    n = len(merged.missing)
    undef = merged.missing.copy()
    if merged.fin_filled is not None:
        # a branch default/failover already set the value (joi: no longer
        # undefined) — the wrapper default must not re-fill (node: default(9)
        # before the when beats default(11) after it on missing rows)
        undef &= ~merged.fin_filled
    if merged.strip_rows is not None:
        undef |= merged.strip_rows
    for cn, sel in parts:
        if cn.flags.get("strip"):
            undef |= sel  # strip branches return undefined even on error
    lbl = {}
    if "label" in node.flags and not getattr(node.schema, "metas", {}).get("_label_pre_when"):
        lbl = {"label": node.flags["label"]}
    value, failed, pairs, filled = _apply_default_failover_alt(
        _WrapperShim(wf), combine(merged.value), merged.missing, merged.failed,
        scope, merged.errors, env, path, lbl, undef=undef)
    merged.value, merged.failed = value, failed
    if filled.any():
        # visible to an enclosing wrapper's own default step
        merged.fin_filled = (
            filled if merged.fin_filled is None else merged.fin_filled | filled)
        if merged.strip_rows is not None:
            keep = merged.strip_rows & ~filled
            merged.strip_rows = keep if keep.any() else None
    nr = _whens_alt(merged)
    if pairs:
        prev = ([(m, a) for m, a in nr.alt_view.pairs]
                if isinstance(getattr(nr, "alt_view", None), AltView) else [])
        nr.alt_view = AltView(nr.value, prev + pairs)
    return nr


def _whens_alt(merged: NodeResult) -> NodeResult:
    """After a whens branch merge: when branches emitted DIFFERENT output
    types (the column was promoted), expose each branch's typed value to
    ref consumers per row — joi's heterogeneous object holds 42 (number)
    next to '42' (string); the single Arrow column cannot, so rule-arg
    asserts and when-conditions read through this view (fuzz seed 9641)."""
    if getattr(merged, "_mixed_types", False) and getattr(merged, "_branch_pairs", None):
        merged.alt_view = AltView(merged.value, merged._branch_pairs)
    return merged


def _merge_into(merged: NodeResult, sub: NodeResult, sel: np.ndarray):
    merged.errors.extend(sub.errors)
    if sub.missing is not None:
        merged.missing = merged.missing | (sub.missing & sel)
    if sub.failed is not None:
        merged.failed = merged.failed | (sub.failed & sel)
    if sub.fin_filled is not None:
        ff = sub.fin_filled & sel
        if ff.any():
            merged.fin_filled = (
                ff if merged.fin_filled is None else merged.fin_filled | ff)
    if len(sel) and sel.any() and sub.value is not None:
        sel_arr = pa.array(sel)
        sub_val = combine(sub.value) if isinstance(sub.value, pa.ChunkedArray) else sub.value
        # per-branch typed values: collected so that a cross-type merge can
        # expose the per-row view joi's heterogeneous object would hold —
        # a then-branch number must reach sibling refs as a NUMBER even
        # when an otherwise-branch cast('string') promoted the column
        if not hasattr(merged, "_branch_pairs"):
            merged._branch_pairs = []
        merged._branch_pairs.append((sel.copy(), sub_val))
        try:
            merged.value = pc.if_else(sel_arr, sub_val, merged.value)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            # a branch whose key strip NARROWED the struct: widen the
            # subset side back (deleted key ≙ null) instead of casting the
            # full struct down — that would drop the key for EVERY row
            # (fuzz seed 24001572, node-verified: then keeps p, otherwise
            # strips it; the then-rows must keep their p)
            widened = False
            mv = combine(merged.value)
            if pa.types.is_struct(mv.type) and pa.types.is_struct(sub_val.type):
                sv2 = _expand_struct_to(sub_val, mv.type)
                if sv2.type == mv.type:
                    try:
                        merged.value = pc.if_else(sel_arr, sv2, mv)
                        widened = True
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                        pass
                if not widened:
                    mv2 = _expand_struct_to(mv, sub_val.type)
                    if mv2.type == sub_val.type:
                        try:
                            merged.value = pc.if_else(sel_arr, sub_val, mv2)
                            widened = True
                        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                            pass
            if not widened:
                # cross-type branch output (a cast('string') branch over a
                # float column): promote the merged column to the branch type
                merged._mixed_types = True
                try:
                    base = pc.cast(merged.value, sub_val.type, safe=False)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    base = pa.nulls(len(sel), sub_val.type)
                try:
                    merged.value = pc.if_else(sel_arr, sub_val, base)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
    # shadow entries (raw-flagged branches) survive the merge per row
    if sub.shadow_value is not None and len(sel) and sel.any():
        sm = sub.shadow_mask if sub.shadow_mask is not None else np.ones(len(sel), bool)
        eff = sel & sm
        if eff.any():
            sv = combine(sub.shadow_value) if isinstance(sub.shadow_value, pa.ChunkedArray) else sub.shadow_value
            if merged.shadow_value is None and not getattr(merged, "shadow_pairs", None):
                merged.shadow_value = sv
                merged.shadow_mask = eff.copy()
            elif merged.shadow_value is not None and sv.type == merged.shadow_value.type:
                try:
                    merged.shadow_value = pc.if_else(pa.array(eff), sv, merged.shadow_value)
                    merged.shadow_mask = merged.shadow_mask | eff
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
            else:
                # CROSS-TYPE branch shadows (a cast('string') otherwise
                # branch next to a numeric then branch): keep per-row typed
                # pairs instead of dropping the entry (fuzz seed 63506)
                if merged.shadow_pairs is None:
                    merged.shadow_pairs = []
                    if merged.shadow_value is not None:
                        merged.shadow_pairs.append(
                            (merged.shadow_mask.copy(), merged.shadow_value))
                        merged.shadow_value = merged.shadow_mask = None
                merged.shadow_pairs.append((eff.copy(), sv))
    # strip from a branch applies per ROW — only where the branch matched
    # (joi resolves whens per value, so object.js's strip delete is
    # row-dependent; fuzz seed 98: an unmatched switch case's strip must
    # not drop the key for other rows)
    if sub.strip or sub.strip_rows is not None:
        rows = sel & (np.ones(len(sel), bool) if sub.strip else sub.strip_rows)
        if sub.failed is not None:
            # joi deletes only on SUCCESS (object.js:126-137: result.errors
            # short-circuits the strip delete, the key keeps its original)
            rows = rows & ~sub.failed
        if rows.any():
            merged.strip_rows = rows if merged.strip_rows is None else merged.strip_rows | rows


def node_validity(node: CNode, arr, env: Env, scope: np.ndarray) -> np.ndarray:
    """Row mask: does this value satisfy the node? (Used for `is` conditions,
    alternatives matching, array item matching, has().)"""
    arr = combine(arr)
    res = eval_node(node, arr, env, "", scope=scope)
    ok = ~res.failed
    # a required node does not match missing rows
    if node.flags.get("presence") == "required" or node.whens:
        pass  # required-missing already recorded as failure
    return ok


def _strip_survivors(res: NodeResult, orig, n: int):
    """Per-row value of a strip-flagged key: joi deletes the key only on
    CLEAN rows — ``result.errors`` short-circuits BOTH the adoption and
    the strip delete (object.js:125-139), so an errored key keeps its
    ORIGINAL value in the output object.  Returns None when every row
    strips (drop the column wholesale), else an array with the original
    on errored rows and null (deleted) elsewhere.  Observable through
    deep-compare rules: fuzz seed 116307 — ``unique()`` over object items
    whose strip-flagged key errored must compare the surviving originals,
    not treat the key as gone (node-verified)."""
    f = res.failed
    if f is None or not f.any():
        return None
    orig = combine(orig) if orig is not None else pa.nulls(n)
    # take with null indices nulls the clean (deleted) rows for ANY type
    return orig.take(pa.array(np.arange(n), mask=~f))


def _failed_overlay(res: NodeResult, orig, n: int, mode: str):
    """joi writes result.value into the object ONLY when the child
    validated cleanly (object.js:125-140): an errored key keeps its
    ORIGINAL value, so later sibling refs see the raw input (e.g. a
    required-missing key with a default resolves undefined, raising
    any.ref on ref-limit rules).  Cross-type originals (string input to a
    number key) can't share the Arrow column: "strict" consumers (rule
    args) get undefined — asserts fail either way -> any.ref; "loose"
    consumers (when-conditions, whose schema re-coerces the raw value)
    get the converted value."""
    val = combine(res.value) if isinstance(res.value, pa.ChunkedArray) else res.value
    f = res.failed
    # a raw()-flagged key outputs the ORIGINAL, but joi shadows the
    # converted value in finalize — EVEN for errored rows — and refs hit
    # the shadow first (validator.js:414-417, ref.js _resolve).  Shadowed
    # rows therefore resolve the converted value and stop counting as
    # failed for the raw-original overlay below.
    sh = getattr(res, "shadow_value", None)
    alt = getattr(res, "alt_view", None)
    if sh is not None:
        sh = combine(sh) if isinstance(sh, pa.ChunkedArray) else sh
        shm = getattr(res, "shadow_mask", None)
        shm = shm if shm is not None else np.ones(n, dtype=bool)
        try:
            if sh.type == val.type:
                val = pc.if_else(pa.array(shm), sh, val)
                if isinstance(alt, AltView):
                    # the shadow wins over branch-value pairs per row
                    # (ref.js _resolve checks the shadow FIRST) — a
                    # cast-branch's typed pair must not override the
                    # folded shadow for shadowed rows (fuzz seed
                    # 27000130, node-verified: a failed strip-branch's
                    # numeric shadow feeds min(ref), not the matched
                    # cast('string') branch's '42')
                    pairs = [(m & ~shm, a) for m, a in alt.pairs]
                    pairs = [(m, a) for m, a in pairs if m.any()]
                    alt = AltView(val, pairs) if pairs else None
            else:
                # cross-type shadow (cast branch): per-row typed view
                pairs = ([(m, a) for m, a in alt.pairs] if isinstance(alt, AltView) else [])
                alt = AltView(val, pairs + [(shm, sh)])
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            pass
        if f is not None:
            f = f & ~shm
    sps = getattr(res, "shadow_pairs", None)
    if sh is None and sps:
        # cross-type branch shadows (alternatives): the shadow WINS over
        # the branch value per row (ref.js _resolve checks shadow first),
        # so shadow pairs append AFTER any branch-value AltView pairs —
        # _ref_arg_check applies pairs in order, last match winning.
        # Same-type entries fold into the column only when no earlier
        # pairs could override them.
        pairs0 = [(m, a) for m, a in alt.pairs] if isinstance(alt, AltView) else []
        extra = []
        for m, a in sps:
            if not pairs0 and a.type == val.type:
                try:
                    val = pc.if_else(pa.array(m), a, val)
                    continue
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
            extra.append((m, a))
        if extra:
            alt = AltView(val, pairs0 + extra)
        if f is not None:
            shm_all = np.zeros(n, dtype=bool)
            for m, _ in sps:
                shm_all |= m
            f = f & ~shm_all
    if f is None or not f.any() or orig is None:
        if mode == "dual":
            return (alt if alt is not None else val, None, None)
        return val
    orig = combine(orig) if isinstance(orig, pa.ChunkedArray) else orig
    if mode == "dual":
        # consumer resolves per row itself: converted for clean rows, the
        # RAW original (through its own type's semantics) for errored rows
        return (alt if alt is not None else val, orig, f)
    try:
        fm = pa.array(f)
        if orig.type == val.type:
            return pc.if_else(fm, orig, val)
        if mode == "strict":
            return pc.if_else(fm, pa.nulls(n, val.type), val)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
        pass
    return val


def _resolve_when_ref(r, arr, env: Env, n: int):
    """Resolve a when-condition ref; a self ref ('.a', ancestor level 0 —
    lib/ref.js:40-49, test/ref.js:40-61) reaches into the node's OWN value
    via struct-field walk instead of the sibling scope.  Sibling refs
    resolve DUAL (converted, original, failed-mask) so the condition can
    probe the RAW value of an errored key exactly like joi."""
    if getattr(r, "level", None) == 0:
        from .kernels.util import _walk_ref_path

        return env._ref_post(r, _walk_ref_path(arr, r.parts, n))
    return env.resolve_ref(r, n, mode="dual")


def _when_condition(is_node: CNode, resolved, env: Env, scope: np.ndarray, n: int) -> np.ndarray:
    """Evaluate an is-condition against a (possibly dual-resolved) ref:
    rows whose sibling ERRORED match against the raw original (joi's
    value[key] keeps it, object.js:125-140), the rest against the
    converted value — each re-coerced by the condition schema itself."""
    if isinstance(resolved, tuple) and len(resolved) == 3:
        val, orig, f = resolved
        if isinstance(val, AltView):
            c1 = node_validity(is_node, combine(val.base), env, scope)
            for m, a in val.pairs:
                if m.any():
                    c1 = np.where(m, node_validity(is_node, combine(a), env, scope), c1)
        else:
            val = combine(val) if isinstance(val, pa.ChunkedArray) else val
            c1 = node_validity(is_node, val, env, scope)
        if f is None or orig is None:
            return c1
        orig = combine(orig) if isinstance(orig, pa.ChunkedArray) else orig
        c2 = node_validity(is_node, orig, env, scope)
        return np.where(f, c2, c1)
    if not isinstance(resolved, (pa.Array, pa.ChunkedArray)):
        resolved = pa.array([resolved] * n)
    return node_validity(is_node, combine(resolved), env, scope)


def _finalize_branch_values(arr, branch_values, n: int):
    """Adopt matching branches' CONVERTED values (joi returns the branch
    result verbatim — alternatives.js:37-40, so a number branch coerces
    '0' -> 0).  Arrow limitation: rows matched by branches with DIFFERENT
    output types (number vs boolean vs string) cannot share one column —
    in that case keep the ORIGINAL values everywhere (value-equivalent,
    tracked as a representational deviation) rather than corrupt any row
    through lossy casts."""
    pairs = [
        (m, combine(v) if isinstance(v, pa.ChunkedArray) else v)
        for m, v in branch_values
        if v is not None
    ]
    if not pairs:
        return arr, None
    out_types = {v.type for _, v in pairs}
    if len(out_types) > 1 and not all(t == arr.type for t in out_types):
        # mixed branch output types: adopt what shares the input type
        # (trim/case rewrites, empty-conversions); the cross-type rows keep
        # their original value in the COLUMN (the documented repr limit)
        # and expose the typed per-row values via an AltView for refs
        value = arr
        for m, v in pairs:
            if v.type == arr.type:
                try:
                    value = pc.if_else(pa.array(m), v, value)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
            elif (pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type)) and (
                pa.types.is_floating(v.type) or pa.types.is_integer(v.type)
                or pa.types.is_boolean(v.type)
            ):
                # numeric/boolean branch values land as their STRING
                # rendering ('true'/'12') — value-equivalent to joi's
                # typed result (the tracked value_repr form) instead of a
                # stale original that a failover/truthy conversion
                # replaced (fuzz seed 5003214: '' -> failover true)
                try:
                    value = pc.if_else(pa.array(m), pc.cast(v, arr.type), value)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
            elif (
                pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type)
                or pa.types.is_boolean(arr.type)
            ) and (pa.types.is_string(v.type) or pa.types.is_large_string(v.type)):
                # the MIRRORED form (fuzz seed 15300258): a cast('string')
                # or string-failover branch matching into a numeric/boolean
                # column lands as its numeric PARSE when the rendering
                # round-trips — value-equivalent to joi's string result
                # (tracked value_repr) instead of the stale original the
                # branch's failover replaced; non-matched rows are nulled
                # first so only matched-row strings must parse
                try:
                    mm = pa.array(m)
                    casted = pc.cast(pc.if_else(mm, v, pa.nulls(n, v.type)), arr.type)
                    value = pc.if_else(mm, casted, value)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
        return value, AltView(value, pairs)
    target = next(iter(out_types))
    if target == arr.type:
        value = arr
    elif (
        pa.types.is_struct(target)
        and pa.types.is_struct(arr.type)
        and all(arr.type.get_field_index(f.name) >= 0 for f in target)
    ):
        # a stripping object branch narrows the struct: project the base
        # onto the branch's field subset (joi's value drops stripped keys)
        value = pa.StructArray.from_arrays(
            [combine(pc.struct_field(arr, f.name)) for f in target],
            names=[f.name for f in target],
            mask=pa.array(null_mask(arr)),
        )
        if value.type != target:
            try:
                value = pc.cast(value, target, safe=False)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                value = pa.nulls(n, target)
    else:
        try:
            value = pc.cast(arr, target, safe=False)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            value = pa.nulls(n, target)
    for m, v in pairs:
        try:
            value = pc.if_else(pa.array(m), v, value)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
            pass
    return value, None


def _apply_default_failover_alt(node, value, missing, failed, scope, errors, env, path, lbl,
                                undef=None):
    """Finalize default/failover for ALTERNATIVES nodes — joi's finalize
    (validator.js:330-400) runs for every type, so a node-level
    .default()/.failover() on an alternatives applies after the branch
    union (fuzz seed 17100100: no-branch-match + failover replaces the
    value and clears the errors).  Scalar, Ref and FUNCTION forms (the
    last per row via _fn_default_values; throws record any.default /
    any.failover).

    Order follows joi: FAILOVER consumes errored rows first (clearing
    their errors); the DEFAULT step then fires on rows whose value is
    still *undefined* — which for alternatives includes no-branch-match
    failures (``value = base.value`` leaves value undefined,
    validator.js:234) — WITHOUT clearing the errors (fuzz seed 18001299:
    joi returns both alternatives.match and the thrower's any.default).
    ``undef`` is that undefined-rows mask (missing | branch-no-match);
    defaults to ``missing``.  Returns (value, failed, blocked-adoption
    AltView pairs, filled-rows mask) — ``filled`` covers every row that
    adopted a default/failover value (joi's value is set even when the
    Arrow column could not hold it)."""
    n = len(missing)
    pairs: list = []
    filled = np.zeros(n, dtype=bool)
    if undef is None:
        undef = missing
    if env.prefs.get("no_defaults", False):
        return value, failed, pairs, filled

    def _fill(mask, src, code):
        nonlocal value, failed
        fired = np.nonzero(mask)[0]
        if not len(fired):
            return mask
        arr_v = combine(value) if isinstance(value, pa.ChunkedArray) else value
        if isinstance(src, Ref):
            rv = env.resolve_ref(src, n)
            if isinstance(rv, (pa.Array, pa.ChunkedArray)):
                rv = combine(rv)
                vals = [rv[int(i)].as_py() for i in fired]
            else:
                vals = [rv] * len(fired)
        elif callable(src):
            vals, threw, ferr = _fn_default_values(src, fired, env)
            if threw.any():
                tmask = np.zeros(n, dtype=bool)
                tmask[fired[threw]] = True
                rec = ErrRec(code, tmask, path, {"error": repr(ferr), **lbl}, 10_001)
                rec.rows = None
                rec.post_abort = True  # finalize push — rides under abortEarly
                errors.append(rec)
                failed = failed | tmask
                mask = mask & ~tmask
                fired = fired[~threw]
                vals = [v for v, t in zip(vals, threw) if not t]
        else:
            vals = [src] * len(fired)
        if len(fired):
            adopted = _adopt_fn_values(arr_v, fired, vals, n)
            if adopted is not None:
                value = adopted
            else:
                # heterogeneous column — the tracked repr ceiling; refs
                # still see the typed values via the AltView pair
                p = _dflt_pair(n, fired, vals)
                if p is not None:
                    pairs.append(p)
        return mask

    if "failover" in node.flags:
        fm = failed & scope
        if fm.any():
            fm = _fill(fm, node.flags["failover"], "any.failover")
            filled |= fm
            if fm.any():
                if env.prefs.get("abort_early", True):
                    # joi returned at the row's first hard error — warns
                    # after that point never fired; the failover's clear
                    # must not resurrect them (fuzz seed 30500135: a
                    # required-missing p aborts before q's pattern warn)
                    _drop_post_abort_warns(errors, fm, n)
                # failover clears ERRORS only; pre-abort warnings persist
                for rec in errors:
                    if rec.warn:
                        continue
                    if getattr(rec, "rows", None) is None:
                        rec.mask = rec.mask & ~fm
                    else:
                        keep = ~fm[rec.rows]
                        rec.rows = rec.rows[keep]
                        if rec.item_index is not None:
                            rec.item_index = rec.item_index[keep]
                errors[:] = [r for r in errors
                             if r.warn
                             or (getattr(r, "rows", None) is not None and len(r.rows))
                             or (getattr(r, "rows", None) is None and r.mask.any())]
                failed = failed & ~fm
                undef = undef & ~fm  # failover-adopted rows are defined now
    if "default" in node.flags:
        dm = undef & scope
        if dm.any():
            # fills the value only — errors (any.required, the branch
            # union's alternatives.*) persist alongside (validator.js:385)
            dm = _fill(dm, node.flags["default"], "any.default")
            filled |= dm
    return value, failed, pairs, filled


def _eval_alternatives(node: CNode, arr, env: Env, path, scope, errors) -> NodeResult:
    n = len(arr)
    missing = null_mask(arr)
    failed = np.zeros(n, dtype=bool)
    # node-level errors render the label flag (add_err does this for other
    # types; alternatives builds ErrRecs directly)
    _lbl = ({"label": node.flags["label"]} if "label" in node.flags else {})
    _err_start = len(errors)
    # prefs.presence supplies the default here exactly as for scalar nodes
    # (validator.js:168-190 runs before the type dispatch) — EXCEPT on an
    # ended-switch alternatives: a match entry carrying BOTH then and
    # otherwise makes the presence default 'ignore' (validator.js:170
    # `_endedSwitch ? 'ignore' : prefs.presence`), so an undefined value
    # flows INTO the matched branch — its own presence/defaults govern
    # (fuzz seed 35000022, node-verified: the otherwise branch's
    # optional() beats prefs presence:'required'; a branch default even
    # fills the undefined value under default prefs)
    ended = any(
        isinstance(m, dict) and "schema" not in m
        and m.get("then") is not None and m.get("otherwise") is not None
        for m in node.matches)
    presence = node.flags.get("presence") or (
        "ignore" if ended else env.prefs.get("presence", "optional"))
    resolved = np.zeros(n, dtype=bool)
    if presence == "required":
        req = missing & scope
        if req.any():
            rec = ErrRec("any.required", req, path, {**_lbl}, -3)
            rec.rows = None
            errors.append(rec)
            failed |= req
    elif presence == "forbidden":
        # same presence-stage return as scalars (validator.js:183-190):
        # provided values error any.unknown and NOTHING else runs — the
        # forbidden default can arrive via schema-LOCAL prefs on the
        # alternatives node itself (fuzz seed 16100190)
        bad = ~missing & scope
        if bad.any():
            rec = ErrRec("any.unknown", bad, path, {**_lbl}, -3)
            rec.rows = None
            errors.append(rec)
        # joi's presence return STILL runs finalize (validator.js:172-186
        # `return internals.finalize(...)`) — a node failover consumes the
        # any.unknown and a default fills undefined rows (fuzz seed
        # 48004116: forbidden + default(thrower) errors any.default on
        # the MISSING rows too)
        fb_value, fb_failed = arr, bad
        if ("default" in node.flags or "failover" in node.flags):
            fb_value, fb_failed, fb_pairs, fb_filled = _apply_default_failover_alt(
                node, fb_value, missing, fb_failed, scope, errors, env, path, _lbl,
                undef=missing)
            nr0 = NodeResult(value=fb_value, errors=errors, missing=missing, failed=fb_failed)
            if fb_filled is not None and fb_filled.any():
                nr0.fin_filled = fb_filled
            if fb_pairs:
                nr0.alt_view = AltView(fb_value, fb_pairs)
            return nr0
        return NodeResult(value=fb_value, errors=errors, missing=missing, failed=fb_failed)
    elif presence == "ignore":
        pass  # undefined rows flow into the match loop (validator.js:170)
    else:
        resolved |= missing
    active = (scope & ~failed) if presence == "ignore" else (scope & ~missing & ~failed)
    defined_failed = np.zeros(n, dtype=bool)  # failed rows whose value joi KEEPS
    # allow/invalid sets apply to the alternatives node itself too — and
    # the valids stage is UNIVERSAL (validator.js:194-227 runs before the
    # type dispatch): under the only flag a non-match pushes any.only and
    # CONTINUES into the matches, so the branch union's alternatives.base
    # follows it (fuzz seed 56000275, node-verified)
    if node.allow_static or node.allow_refs:
        hit = _set_membership(arr, node.allow_static, node.allow_refs, node.flags.get("insensitive", False), env)
        resolved |= hit
        active &= ~hit
        if node.flags.get("only"):
            miss_only = active.copy()
            if miss_only.any():
                rec = ErrRec("any.only", miss_only, path,
                             {"valids": node.allow_static, **_lbl}, -2)
                rec.rows = None
                errors.append(rec)
                failed |= miss_only
                defined_failed |= miss_only  # value kept
    if node.invalid_static or node.invalid_refs:
        inv = _set_membership(arr, node.invalid_static, node.invalid_refs, node.flags.get("insensitive", False), env) & active
        if inv.any():
            rec = ErrRec("any.invalid", inv, path, {"invalids": node.invalid_static, **_lbl}, -2)
            rec.rows = None
            errors.append(rec)
            failed |= inv
            defined_failed |= inv  # invalids fail BEFORE base — value stays
            active &= ~inv
    matched = np.zeros(n, dtype=bool)
    decided = np.zeros(n, dtype=bool)  # conditional-branch rows: result final
    # rows whose MATCHED branch is strip-flagged: the branch finalize
    # returns undefined (validator.js:413-421), so the parent deletes the
    # key AND the alternatives' own default sees the row as undefined
    # (fuzz seed 20003109, node-verified: strip branch + default(thrower)
    # errors any.default on a PRESENT value)
    strip_hit = np.zeros(n, dtype=bool)
    # rows whose matched branch RETURNED undefined (empty('') coercion):
    # the node default sees them as undefined too
    undef_hit = np.zeros(n, dtype=bool)
    # rows a BRANCH default/failover filled (presence-ignore lets missing
    # rows through): defined now — the node default must skip them
    branch_filled = np.zeros(n, dtype=bool)
    value = arr
    branch_values: list[tuple[np.ndarray, object]] = []  # (rows, converted)
    branch_outcomes: list[tuple[str, list]] = []
    # raw() shadows persist from every ATTEMPTED branch, failed ones
    # included — joi's finalize writes the shadow per branch try
    # (validator.js:414-417), so a failed trim().raw() branch still feeds
    # the trimmed value to later refs (fuzz seed 38925, node-verified)
    shadow_pairs: list[tuple[np.ndarray, object]] = []

    def _collect_shadow(sub, tried: np.ndarray):
        if sub.shadow_value is not None:
            sm = sub.shadow_mask if sub.shadow_mask is not None else np.ones(n, bool)
            eff = tried & sm
            if eff.any():
                shadow_pairs.append((eff, sub.shadow_value))
            # rows whose COERCION failed inside a raw() branch: joi's
            # shadow holds the value finalize saw — the ORIGINAL ('true'
            # stays a string when number coercion missed; fuzz seed 59592).
            # EMPTIED rows are different: finalize saw UNDEFINED (the
            # empty() conversion), so they shadow nothing — a later
            # is:'' condition must NOT resolve the raw '' (fuzz seed
            # 35000213, node-verified)
            if sub.raw_value is not None:
                rest = tried & ~sm
                if sub.missing is not None:
                    rest &= ~sub.missing
                if rest.any():
                    shadow_pairs.append((rest, sub.raw_value))

    for m in node.matches:
        still = active & ~matched & ~decided
        if not still.any():
            break
        if "schema" in m:
            # one evaluation per branch: validity mask and coerced value both
            # come from the same NodeResult
            sub = eval_node(m["schema"], arr, env, path, scope=still)
            _collect_shadow(sub, still)
            hit = still & ~sub.failed
            matched |= hit
            if sub.strip:
                strip_hit |= hit
            elif sub.strip_rows is not None:
                strip_hit |= hit & sub.strip_rows
            if sub.missing is not None:
                # a matched branch can RETURN undefined for a present value
                # (empty('') coercion) — the node default then fires
                # (fuzz seed 23600100, node-verified)
                ff = sub.fin_filled if sub.fin_filled is not None else np.zeros(n, bool)
                undef_hit |= hit & sub.missing & ~ff
                branch_filled |= hit & ff
            branch_outcomes.append((m["schema"].type, sub.errors))
            # warn-rule reports push to the MAIN state immediately in joi
            # (validator.js:303-306), so every ATTEMPTED branch leaks its
            # warnings — matched, failed, and no-match rows alike
            # (node-verified; fuzz seed 1400069 family)
            errors.extend(r for r in sub.errors if r.warn)
            if hit.any():
                branch_values.append((hit, sub.value))
            continue
        # conditional entry (alternatives.when): the selected branch's
        # result is returned AS-IS — pass or fail, later matches are not
        # tried for that row (lib/types/alternatives.js:47-57)
        if "peek" in m:
            cond = node_validity(m["peek"], arr, env, still)
        else:
            cond = _when_condition(m["is"], _resolve_when_ref(m["ref"], arr, env, n), env, still, n)
        for branch, sel in (("then", still & cond), ("otherwise", still & ~cond)):
            bn = m.get(branch)
            if bn is None or not sel.any():
                continue
            sub = eval_node(bn, arr, env, path, scope=sel)
            _collect_shadow(sub, sel)
            decided |= sel
            ok_rows = sel & ~sub.failed
            matched |= ok_rows
            if sub.strip:
                strip_hit |= ok_rows
            elif sub.strip_rows is not None:
                strip_hit |= ok_rows & sub.strip_rows
            if sub.missing is not None:
                ff = sub.fin_filled if sub.fin_filled is not None else np.zeros(n, bool)
                undef_hit |= ok_rows & sub.missing & ~ff
                branch_filled |= ok_rows & ff
            errors.extend(sub.errors)
            failed |= sel & sub.failed
            # a DECIDED branch failure keeps its processed value (joi
            # returns the branch result as-is) — only try-style no-match
            # leaves value undefined (validator.js:234), so the node
            # default must not fire here (fuzz seed 35000189,
            # node-verified) unless the input itself was undefined
            defined_failed |= sel & sub.failed & ~(
                sub.missing if sub.missing is not None else np.zeros(n, bool))
            if ok_rows.any():
                branch_values.append((ok_rows, sub.value))
    value, alt_view = _finalize_branch_values(arr, branch_values, n)
    nomatch = active & ~matched & ~decided
    if nomatch.any():
        # error union per row (alternatives.js:60-91): no branch errors ->
        # alternatives.base; exactly one -> the child's error passes
        # through; several all-*.base -> alternatives.types; mixed ->
        # alternatives.match.  (Per-row error count is per error FAMILY —
        # joi counts per-item reports; divergence only for multi-item rows.)
        count = np.zeros(n, dtype=np.int32)
        nonbase = np.zeros(n, dtype=bool)
        per_rec: list[tuple] = []
        for _btype, errs in branch_outcomes:
            for rec in errs:
                if rec.warn:
                    continue
                rmask = np.zeros(n, dtype=bool)
                rows = getattr(rec, "rows", None)
                if rows is not None:
                    rmask[rows] = True
                else:
                    rmask |= rec.mask
                rmask &= nomatch
                if not rmask.any():
                    continue
                per_rec.append((rec, rmask))
                count += rmask
                # joi destructures [type, code] = report.code.split('.') —
                # so 'string.pattern.base' has code 'pattern', NOT base
                # (alternatives.js:79-86)
                parts = rec.code.split(".")
                if len(parts) != 2 or parts[1] != "base":
                    nonbase |= rmask
        single = nomatch & (count == 1)
        for rec, rmask in per_rec:
            pm = rmask & single
            if pm.any():
                nr = ErrRec(rec.code, pm, rec.path, rec.context, rec.seq, rec.warn, rec.message)
                nr.rows = None
                errors.append(nr)
        none_mask = nomatch & (count == 0)
        if none_mask.any():
            rec = ErrRec("alternatives.base", none_mask, path, {**_lbl}, 0)
            rec.rows = None
            errors.append(rec)
        types_mask = nomatch & (count > 1) & ~nonbase
        if types_mask.any():
            # joi pushes one type per branch ERROR in order, duplicates
            # included (alternatives.js:73-87) — rows may differ, so split
            # recs by per-row type signature
            rows_t = np.nonzero(types_mask)[0]
            per_row: dict[int, list] = {int(r): [] for r in rows_t}
            for rec, rmask in per_rec:
                t = rec.code.split(".")[0]
                for r in rows_t[rmask[rows_t]]:
                    per_row[int(r)].append(t)
            sigs: dict[tuple, np.ndarray] = {}
            for r, ts in per_row.items():
                m = sigs.setdefault(tuple(ts), np.zeros(n, dtype=bool))
                m[r] = True
            for ts, m in sigs.items():
                rec = ErrRec("alternatives.types", m, path, {"types": list(ts), **_lbl}, 0)
                rec.rows = None
                errors.append(rec)
        match_mask = nomatch & (count > 1) & nonbase
        if match_mask.any():
            rec = ErrRec("alternatives.match", match_mask, path, {**_lbl}, 0)
            rec.rows = None
            errors.append(rec)
        failed |= nomatch
    # error() override replaces EVERY error emitted by this node, branch
    # pass-throughs included (lib/base.js:136-142 via validator finalize;
    # test/types/alternatives.js:350-361)
    node_err = node.flags.get("error")
    err_fn = getattr(node.schema, "metas", {}).get("error_fn") if node_err is None else None
    if node_err is not None or err_fn is not None:
        for rec in errors[_err_start:]:
            if node_err is not None:
                rec.message = node_err
            else:
                m = err_fn(rec.code, rec.path, dict(rec.context or {}))
                if isinstance(m, str):
                    rec.message = m
    alt_fin_filled = None
    if ("default" in node.flags or "failover" in node.flags):
        value, failed, dflt_pairs, alt_fin_filled = _apply_default_failover_alt(
            node, value, missing, failed, scope, errors, env, path, _lbl,
            # undefined at finalize = missing + no-branch-match failures
            # (value = base.value leaves undefined, validator.js:234) +
            # strip-branch matches (branch finalize returned undefined);
            # invalids fail with the value KEPT, so they're excluded;
            # branch default/failover fills are DEFINED now
            undef=(missing & ~branch_filled) | (failed & ~defined_failed)
                  | strip_hit | undef_hit)
        if dflt_pairs:
            # blocked cross-type default/failover values: merge into the
            # typed-view pairs so refs resolve them (later pairs win)
            prev = ([(m, a) for m, a in alt_view.pairs]
                    if isinstance(alt_view, AltView) else [])
            alt_view = AltView(value, prev + dflt_pairs)
    nr = NodeResult(value=value, errors=errors, missing=missing, failed=failed)
    if alt_fin_filled is not None and alt_fin_filled.any():
        nr.fin_filled = alt_fin_filled
    if strip_hit.any():
        # rows whose value the finalize SET (default/failover) or that
        # errored there (the thrower) are no longer strip-deleted — joi's
        # parent keeps the value on errors (object.js:126-139) and writes
        # an adopted one
        sh = strip_hit & ~failed
        if alt_fin_filled is not None:
            sh &= ~alt_fin_filled
        if sh.any():
            nr.strip_rows = sh
    if alt_view is not None:
        # ref consumers (rule args, when-conditions) need the per-row
        # TYPED values the single column couldn't hold
        nr.alt_view = alt_view
    if shadow_pairs:
        # normalize to DISJOINT masks, later branch tries taking precedence
        seen = np.zeros(n, dtype=bool)
        norm: list = []
        for eff, sv in reversed(shadow_pairs):
            m = eff & ~seen
            if m.any():
                norm.append((m, combine(sv) if isinstance(sv, pa.ChunkedArray) else sv))
                seen |= m
        norm.reverse()
        types = {v.type for _, v in norm}
        if len(types) == 1:
            sh_val, sh_mask = None, np.zeros(n, dtype=bool)
            for eff, sv in norm:
                if sh_val is None:
                    sh_val, sh_mask = sv, eff.copy()
                else:
                    try:
                        sh_val = pc.if_else(pa.array(eff), sv, sh_val)
                        sh_mask = sh_mask | eff
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                        pass
            nr.shadow_value, nr.shadow_mask = sh_val, sh_mask
        else:
            # cross-type branch shadows (a number branch next to a failed
            # string attempt): per-row typed pairs for the ref consumers
            nr.shadow_pairs = norm
    return nr


def _adopt_items(adopt: np.ndarray, sub_value, base, n_items: int, failed=None):
    """Single-schema convenience wrapper over _adopt_items_multi."""
    return _adopt_items_multi([(adopt, sub_value)], base, failed, n_items)


def _expand_struct_to(v: pa.Array, bt: pa.DataType) -> pa.Array:
    """Widen a struct whose fields are a SUBSET of ``bt``'s (a strip()
    key dropped the column) back to ``bt``, filling the missing fields
    with null (joi's deleted key ≙ undefined ≙ our null).  Returns ``v``
    unchanged when not applicable."""
    if not (pa.types.is_struct(v.type) and pa.types.is_struct(bt)):
        return v
    base_fields = {f.name: f.type for f in bt}
    v_names = {f.name for f in v.type}
    if not v_names <= set(base_fields) or v_names == set(base_fields):
        return v
    cols = []
    for f in bt:
        if f.name not in v_names:
            cols.append(pa.nulls(len(v), f.type))
            continue
        c = pc.struct_field(v, f.name)
        if c.type != f.type:
            # a cast('string') key changed the field's type — land it in
            # the base field type when the cast round-trips (fuzz seed
            # 13000587: adopted {x:'3'} widens back over {x:float64, y}
            # so failed items keep their ORIGINAL y for unique())
            try:
                c = pc.cast(c, f.type)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                return v
        cols.append(c)
    return pa.StructArray.from_arrays(
        cols, fields=list(bt), mask=pa.array(as_bool_np(pc.is_null(v), len(v))))


def _adopt_items_multi(pairs, base, failed_any, n_items: int):
    """Merge converted item values into the flat array (array.js:209/297
    value[i] = res.value), all adopting schemas at once so earlier slots
    can't be clobbered by a later slot's type promotion.  Cross-type
    conversions (number items over a string list) promote the base when
    every CLEAN kept item survives the promoted type; FAILED kept items
    may fall to null (joi keeps their raw value, never value-compared).
    Mixed adopted types: only same-as-base adoptions land (repr limit).

    Returns ``(merged_or_None, alt_flat, alt_ok)``: when the promotion is
    BLOCKED by heterogeneous clean rows, ``alt_flat`` is the promoted-type
    flat with the cross adoptions applied and ``alt_ok`` marks the items
    whose alt value matches what joi's value[i] would hold (adopted or
    null) — the array node turns this into a per-row typed view for ref
    consumers (a date ref to an ordered list whose number slot converted
    must see [3], not ["3.0"])."""
    pairs = [
        (m, combine(v) if isinstance(v, pa.ChunkedArray) else v)
        for m, v in pairs
        if v is not None and m.any()
    ]
    if not pairs:
        return None, None, None
    base = combine(base) if isinstance(base, pa.ChunkedArray) else base
    # a strip-narrowed object item (sub struct missing a field the base
    # has) expands back to the base type with the stripped field null —
    # adoption stays same-type so FAILED items keep their originals, which
    # unique() value-compares (fuzz seed 4000881, node-verified: an item
    # failing object.and keeps its strip-deleted key's original)
    pairs = [
        (m, _expand_struct_to(v, base.type) if v.type != base.type else v)
        for m, v in pairs
    ]
    out, changed = base, False
    # stage 1: same-type adoptions land directly
    for m, v in pairs:
        if v.type == base.type:
            try:
                out = pc.if_else(pa.array(m), v, out)
                changed = True
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                pass
    # stage 2: cross-type adoptions promote the column IF all clean kept
    # items survive the promoted type (string-slot values are equivalent
    # through the cast; truly heterogeneous CLEAN rows stay original —
    # the repr limit)
    cross = [(m, v) for m, v in pairs if v.type != base.type]
    if cross and len({v.type for _, v in cross}) == 1:
        T = cross[0][1].type
        adopt_all = np.zeros(n_items, dtype=bool)
        for m, _ in cross:
            adopt_all |= m
        base2 = None
        if pa.types.is_floating(T) and (
            pa.types.is_string(base.type) or pa.types.is_large_string(base.type)
        ):
            import pandas as pd

            base2 = pa.Array.from_pandas(pd.to_numeric(out.to_pandas(), errors="coerce"), type=T)
        else:
            try:
                base2 = pc.cast(out, T, safe=False)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                base2 = None
        if base2 is not None:
            lost = null_mask(base2) & ~null_mask(out) & ~adopt_all
            if failed_any is not None:
                lost = lost & ~failed_any
            out2, ok2 = base2, False
            for m, v in cross:
                try:
                    out2 = pc.if_else(pa.array(m), v, out2)
                    ok2 = True
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    pass
            if not lost.any():
                if ok2:
                    return out2, None, None
            elif ok2:
                # promotion blocked — graft UNRELATED adopted values (a
                # failover whose original doesn't round-trip to the
                # adopted type) into the base as their string rendering:
                # value-equivalent to joi's typed item (tracked
                # value_repr), not a stale original (fuzz seed 5001791:
                # 'ABC' -> failover 10 must not stay 'ABC')
                graft = adopt_all & ~null_mask(out)
                if graft.any() and (
                    pa.types.is_string(base.type) or pa.types.is_large_string(base.type)
                ) and (pa.types.is_floating(T) or pa.types.is_integer(T)
                       or pa.types.is_boolean(T)):
                    try:
                        # graft only where the adopted value DIFFERS from
                        # the original's round-trip (failover 3 -> 10, not
                        # the pure '25' -> 25 conversion whose original is
                        # already value-equivalent; fuzz seed 5101332)
                        neq = as_bool_np(
                            pc.fill_null(pc.not_equal(base2, out2), True), n_items)
                        graft = graft & neq
                        if graft.any():
                            out = pc.if_else(pa.array(graft), pc.cast(out2, base.type), out)
                            changed = True
                    except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                        pass
                # expose the typed view: an item's alt value is faithful
                # iff it was ADOPTED (joi converted it) or is null; merely
                # cast-survivable strings keep their original rendering in
                # joi ("5.0" stays "5.0") and must exclude the row
                return (out if changed else None), out2, adopt_all | null_mask(out)
    return (out if changed else None), None, None


def _converted_sparse_items(node, add_err, sub, live, nulls_flat, parents, positions, n, grp,
                            soft=True, shift_recs=None):
    """An item that validated CLEANLY but whose converted value is
    undefined (empty('') conversion) errors array.sparse in a non-sparse
    array.  joi's INCLUSIONS loop records it WITHOUT aborting early
    (array.js:286-292, soft=True); the ordered loop DOES abort
    (array.js:201-207, soft=False).  ``shift_recs`` collects the created
    rec for the stripUnknown.arrays post-splice index adjustment."""
    if node.flags.get("sparse") or sub.value is None or not len(nulls_flat):
        return None
    out_null = as_bool_np(pc.is_null(sub.value), len(nulls_flat))
    failed_items = sub.failed if sub.failed is not None else np.zeros(len(nulls_flat), bool)
    became = live & ~nulls_flat & out_null & ~failed_items
    if became.any():
        rec = add_err(
            "array.sparse",
            np.zeros(n, bool),
            item_rows=parents[became],
            item_index=positions[became].astype(np.int32),
            seq=-1,
            group=grp,
            soft=soft,
        )
        if shift_recs is not None and rec is not None:
            shift_recs.append((rec, np.nonzero(became)[0]))
        return became
    return None


def _required_strip_claims(ic, hit, parents, positions, n_items, n, node, add_err,
                           items_grp, shift_recs):
    """First clean match PER ROW of a required+strip inclusion is consumed
    by joi's REQUIREDS loop, which has NO strip check (array.js:237-255):
    ``value[i] = res.value`` where a strip schema's $_validate returns
    undefined (validator.js:414-415) — so the item becomes undefined
    WITHOUT a splice, and a non-sparse array records array.sparse at the
    current index (aborting under abortEarly).  Only LATER matches of the
    same schema reach the inclusions loop's strip fastSplice
    (array.js:278-283).  Fuzz seed 4000136, node-verified.  Returns
    (claim_mask | None, splice_mask)."""
    if ic.flags.get("presence") != "required" or not hit.any():
        return None, hit
    idxs = np.nonzero(hit)[0]
    _, first = np.unique(parents[idxs], return_index=True)
    claim = np.zeros(n_items, dtype=bool)
    claim[idxs[first]] = True
    if not node.flags.get("sparse"):
        rec = add_err(
            "array.sparse", np.zeros(n, bool),
            item_rows=parents[claim], item_index=positions[claim].astype(np.int32),
            seq=-1, group=items_grp, soft=False)
        if shift_recs is not None and rec is not None:
            shift_recs.append((rec, np.nonzero(claim)[0]))
    return claim, hit & ~claim


def _drop_post_abort_warns(errors: list, fm: np.ndarray, n: int):
    """Under abortEarly joi RETURNED at the row's first hard error — warns
    that would have fired after it were never emitted, and a failover's
    error-clear must not resurrect them (fuzz seeds 29003478/30500135).
    Ordering follows joi's walk like _abort_early_filter: (ordering-group
    first emission index, FIRE-time item index, emission index) — an
    item-0 warn precedes an item-1 hard error from an EARLIER rec
    (fuzz seed 49000734, node-verified)."""
    group_first: dict[int, int] = {}
    eff = []
    for pos, rec in enumerate(errors):
        g = getattr(rec, "order", None)
        eff.append(pos if g is None else group_first.setdefault(id(g), pos))

    def _key(pos, rec, rows):
        items = getattr(rec, "fire_items", None)
        if items is None and getattr(rec, "item_index", None) is not None:
            items = rec.item_index
        it = (np.asarray(items, dtype=np.int64) if items is not None
              else np.full(len(rows), -1, dtype=np.int64))
        return (np.int64(eff[pos]) << 42) | ((it + 1) << 21) | np.int64(pos)

    INF = np.iinfo(np.int64).max
    first_key = np.full(n, INF, dtype=np.int64)
    for pos, rec in enumerate(errors):
        if rec.warn:
            continue
        rows = rec.rows if getattr(rec, "rows", None) is not None else np.nonzero(rec.mask)[0]
        if not len(rows):
            continue
        np.minimum.at(first_key, rows, _key(pos, rec, rows))
    for pos, rec in enumerate(errors):
        if not rec.warn:
            continue
        rows = rec.rows if getattr(rec, "rows", None) is not None else None
        if rows is None:
            wrows = np.nonzero(rec.mask)[0]
            if not len(wrows):
                continue
            drop = fm[wrows] & (_key(pos, rec, wrows) > first_key[wrows])
            if drop.any():
                m2 = rec.mask.copy()
                m2[wrows[drop]] = False
                rec.mask = m2
            continue
        if not len(rows):
            continue
        drop = fm[rows] & (_key(pos, rec, rows) > first_key[rows])
        if drop.any():
            keep = ~drop
            rec.rows = rows[keep]
            if getattr(rec, "item_index", None) is not None:
                rec.item_index = rec.item_index[keep]
            if getattr(rec, "fire_items", None) is not None:
                rec.fire_items = rec.fire_items[keep]
            if getattr(rec, "values", None) is not None:
                rec.values = [v for v, k in zip(rec.values, keep) if k]


def _parent_row_getter(columns: dict, results: dict):
    """Per-row PARENT dict for arg-taking function defaults/failovers
    (validator.js:465 passes Hoek.clone(state.ancestors[0])): joi's value
    object MUTATES as keys validate in topo order, so already-validated
    keys expose their PROCESSED value (converted/defaulted), errored keys
    keep the original (object.js:125-140), and strip keys read as deleted
    (fuzz seed 48002125, node-verified: a forbidden key's failover
    fn reads the sibling's default-filled value, not the raw null).
    ``results`` is the live per-key dict the key loop fills — keys not
    yet validated fall back to the raw column like joi's untouched
    value[key]."""
    def get(i):
        i = int(i)
        out = {}
        for k2, c2 in columns.items():
            res2 = results.get(k2)
            if res2 is None:
                out[k2] = c2[i].as_py()
                continue
            f2 = res2.failed
            if f2 is not None and bool(f2[i]):
                out[k2] = c2[i].as_py()
            elif res2.strip or (res2.strip_rows is not None
                                and bool(res2.strip_rows[i])):
                out[k2] = None
            else:
                v2 = res2.value
                out[k2] = combine(v2)[i].as_py() if v2 is not None else None
        return out
    return get


def _eval_array(node: CNode, arr: pa.Array, env: Env, path, scope, resolved, failed, add_err) -> pa.Array:
    n = len(arr)
    flat, parents, positions = k_lists.flatten_with_parents(arr)
    # joi's items loop is ITEM-outer (array.js:140+): all errors of the
    # items stage interleave by position, so they share one ordering group
    items_grp = object()
    _sparse_info = None  # (rec, flat mask) for strip-arrays index shifts

    # sparse: null items forbidden unless flag (array.js:454-466).
    # Item masks are ROW-scoped up front: under a whens branch, add_err
    # drops out-of-scope rows from the rec, so any bookkeeping mask paired
    # with a rec (strip-splice index shifts, shift_recs) must agree with
    # the rec's rows or the violations assembly misaligns (fuzz seed
    # 43005514: a branch-scoped sparse rec kept 5 rows against an
    # 8-row mask)
    item_in_scope = scope[parents] if len(parents) else np.zeros(0, dtype=bool)
    if not node.flags.get("sparse") and len(parents):
        nulls = as_bool_np(pc.is_null(flat), len(flat))
        if (nulls & item_in_scope).any():
            sparse_mask = nulls
            if node.ordered and not node.items:
                # joi BREAKs the items loop at the first beyond-slots
                # NON-undefined item (array.js:222-231) — sparse checks
                # after that position never run
                L = len(node.ordered)
                beyond_live = (positions >= L) & ~nulls
                if beyond_live.any():
                    cutoff = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
                    np.minimum.at(cutoff, parents[beyond_live], positions[beyond_live])
                    sparse_mask = nulls & (positions < cutoff[parents])
            sparse_mask = sparse_mask & item_in_scope
            if sparse_mask.any():
                _sparse_rec = add_err(
                    "array.sparse",
                    np.zeros(n, bool),
                    item_rows=parents[sparse_mask],
                    item_index=positions[sparse_mask].astype(np.int32),
                    seq=-1,
                    group=items_grp,
                )
                if _sparse_rec is not None:  # all rows outside a branch scope
                    _sparse_info = (_sparse_rec, sparse_mask)

    if not len(parents):
        # ALL-EMPTY batch fast path: joi's required-items bookkeeping still
        # errors empty arrays (array.js:341 + fillMissedErrors:674-699 —
        # Knowns/Unknowns/Both by label presence; fuzz seed 99175)
        def _fill_missed(reqs):
            present = ~null_mask(arr) & scope
            if not (reqs and present.any()):
                return
            known = [ic.flags.get("label") for ic in reqs if ic.flags.get("label")]
            unknown = len(reqs) - len(known)
            if known and unknown:
                add_err("array.includesRequiredBoth", present,
                        {"knownMisses": known, "unknownMisses": unknown},
                        group=items_grp)
            elif known:
                add_err("array.includesRequiredKnowns", present,
                        {"knownMisses": known}, group=items_grp)
            else:
                add_err("array.includesRequiredUnknowns", present,
                        {"unknownMisses": unknown}, group=items_grp)

        _fill_missed([ic for ic in node.items if ic.flags.get("presence") == "required"])
        # unconsumed required ORDERED slots miss too, as a SEPARATE record
        # (array.js:345-347 fillOrderedErrors -> fillMissedErrors after the
        # items fillMissedErrors; fuzz seed 4100375)
        _fill_missed([oc for oc in node.ordered
                      if oc.flags.get("presence") == "required"])
        return arr, None

    # ancestor resolver: parent-row columns broadcast to item rows
    parent_idx = pa.array(parents)

    def make_child_env():
        def resolve_ancestor(name: str):
            col = env.resolve_ref(Ref(name), n)
            if isinstance(col, (pa.Array, pa.ChunkedArray)):
                return combine(col).take(parent_idx)
            return col

        child = Env(env.prefs, None, env.ancestors + [resolve_ancestor])
        return child

    def lift_item_errors(sub: NodeResult, sub_path_prefix: str):
        # returns [(created rec, fired FLAT indices)] so the strip-splice
        # index shift below can re-point item_index post-hoc
        made: list = []
        for rec in sub.errors:
            if getattr(rec, "rows", None) is not None:
                fired = rec.rows
            else:
                fired = np.nonzero(rec.mask)[0]
            rows = parents[fired]
            # pre-filter by the branch scope so ``fired`` stays aligned
            # with the rec's post-filter rows (add_err drops out-of-scope
            # rows itself; a whens-branch scope can drop some or all)
            sel = scope[rows]
            vals = getattr(rec, "values", None)
            if not sel.all():
                fired, rows = fired[sel], rows[sel]
                if vals is not None:
                    vals = [v for v, k in zip(vals, sel) if k]
            idx = positions[fired].astype(np.int32)
            if len(rows) == 0:
                continue
            # joi renders the item label with the index AT the array
            # boundary ('a[0].x' for sub-errors below the array level,
            # errors.js:87-107); sub-errors at the array path itself keep
            # the append form ('a[0]').  Inner-array indices of doubly
            # nested arrays are not preserved (documented limitation: one
            # item_index per violation row).
            ipos = len(path) if len(rec.path) > len(path) else None
            nr = add_err(rec.code, np.zeros(n, bool), rec.context, seq=rec.seq, warn=rec.warn,
                         message=rec.message, item_rows=rows, item_index=idx, path_override=rec.path,
                         values=vals, group=items_grp, path_ipos=ipos)
            if nr is not None:
                made.append((nr, fired))
        return made

    def lift_probe_warns(sub: NodeResult, forced_abort: bool = False,
                         exclude: Optional[np.ndarray] = None):
        """A probe (exclusion / inclusion-match / has) is a real validate
        call in joi, so its warn-rule reports leak to the main state as
        they fire (validator.js:303-306).  $_match probes (exclusions,
        has, assert) FORCE abortEarly=true internally (base.js:719-726),
        so only warns emitted before the probe's first hard error per item
        leak; $_validate attempts (inclusions, ordered) follow the outer
        prefs (fuzz seeds 63909, 66988, 1800014)."""
        if not any(r.warn for r in sub.errors):
            return []
        m = len(flat)
        abort = forced_abort or env.prefs.get("abort_early", True)
        aborted = np.zeros(m, bool)
        kept: list = []
        for rec in sub.errors:  # emission order == joi's walk
            rows0 = rec.rows if getattr(rec, "rows", None) is not None else np.nonzero(rec.mask)[0]
            if rec.warn:
                keepv = ~aborted[rows0] if abort else np.ones(len(rows0), bool)
                if exclude is not None:
                    # items already attempted (and leaked) in the requireds
                    # pre-loop: joi reuses that result in the inclusions
                    # stage (array.js:274-278 previousCheck), no re-leak
                    keepv &= ~exclude[rows0]
                if not keepv.any():
                    continue
                nr2 = ErrRec(rec.code, np.zeros(m, bool), rec.path, rec.context,
                             rec.seq, rec.warn, rec.message)
                nr2.rows = rows0[keepv]
                nr2.item_index = (rec.item_index[keepv]
                                  if getattr(rec, "item_index", None) is not None else None)
                if getattr(rec, "values", None) is not None:
                    nr2.values = [v for v, k in zip(rec.values, keepv) if k]
                kept.append(nr2)
            elif abort:
                aborted[rows0] = True
        if kept:
            return lift_item_errors(NodeResult(value=None, errors=kept), path)
        return []

    def exclusion_node(ic):
        # forbidden item schemas are EXCLUSIONS (array.js:145-153): a value
        # matching the schema sans its forbidden flag errors array.excludes.
        cached = getattr(ic, "_exclusion_node", None)
        if cached is None:
            cached = CNode(ic.schema.optional(), env.prefs)
            ic._exclusion_node = cached
        return cached

    inclusions = [ic for ic in node.items if ic.flags.get("presence") != "forbidden"]
    exclusions = [ic for ic in node.items if ic.flags.get("presence") == "forbidden"]

    # stripUnknown strips unmatched array items ONLY in object form with
    # arrays:true (array.js:266 — plain `stripUnknown: true` still errors,
    # see test/types/array.js:436-467)
    _su = env.prefs.get("strip_unknown", False)
    strip_arrays = bool(isinstance(_su, dict) and _su.get("arrays"))

    new_flat = None
    alt_flat = alt_ok = None  # blocked cross-type promotion: typed ref view
    arr_in = arr  # pre-strip shape for the alt list rebuild
    n_items = len(flat)
    # items that ADOPTED a converted value (vs kept their original): when
    # a type promotion rewrites the whole column, joi's typeof-sensitive
    # unique() still distinguishes kept number 1 from adopted cast "1" —
    # the tag array carries that lost type bit (fuzz seed 5300531)
    adopted_any = np.zeros(n_items, dtype=bool)
    env._item_type_tags = None  # reset any sibling array's stale tags
    env._item_type_tag_fields = None
    # joi's items loop SKIPS undefined entries in non-sparse arrays — the
    # sparse check already errored them and `continue`s (array.js:154-164);
    # with sparse() they flow through item validation like any value
    nulls_flat = as_bool_np(pc.is_null(flat), n_items) if n_items else np.zeros(0, bool)
    item_live = np.ones(n_items, dtype=bool) if node.flags.get("sparse") else ~nulls_flat
    # row scope applies to EVERY item-level mask, keeping rec bookkeeping
    # aligned with add_err's own scope filter (seed 43005514)
    if len(parents):
        item_live &= item_in_scope
    if (len(inclusions) == 1 and not exclusions and not node.ordered and not strip_arrays
            and not inclusions[0].flags.get("strip")):
        # single inclusion: the item's ACTUAL errors surface, not
        # array.includes (array.js:304-315 `jl === 1`).  A strip-flagged
        # inclusion splices its matches (array.js:278-283), so it takes
        # the generic path below, which owns the splice bookkeeping
        child_env = make_child_env()
        ic = node.items[0]
        sub = eval_node(ic, flat, child_env, path, scope=item_live)
        lift_item_errors(sub, path)
        # joi adopts ONLY on success — when no item is clean, the flat
        # stays the ORIGINALS (fuzz seed 4000881: all items failing
        # object.and keep their strip-deleted key's original for unique())
        new_flat = None
        became = _converted_sparse_items(node, add_err, sub, item_live, nulls_flat,
                                         parents, positions, n, items_grp)
        # joi assigns value[i] = res.value only on SUCCESS (array.js:286-297):
        # sparse-converted items AND errored items keep the original value,
        # keeping later rules (unique) off synthetic undefineds/defaults.
        # Build from the ORIGINALS and adopt only the clean conversions —
        # a failed type-clash restore must never leak converted values.
        restore = became if became is not None else np.zeros(len(nulls_flat), bool)
        if sub.failed is not None:
            restore = restore | (item_live & sub.failed)
        adopt = item_live & ~restore
        if sub.value is not None and adopt.any():
            new_flat, alt_flat, alt_ok = _adopt_items(adopt, sub.value, flat, n_items, failed=sub.failed)
            adopted_any |= adopt
        else:
            new_flat = None
        if ic.flags.get("presence") == "required":
            # the lone required schema must still claim >=1 item per row;
            # misses error even on empty arrays (array.js:341 + :674-699)
            rows_with = np.zeros(n, dtype=bool)
            if sub.failed is not None and n_items:
                ok_items = ~sub.failed & item_live
                rows_with[np.unique(parents[ok_items])] = True
            miss = ~null_mask(arr) & ~rows_with & scope
            if miss.any():
                label = ic.flags.get("label")
                if label:
                    add_err("array.includesRequiredKnowns", miss, {"knownMisses": [label]})
                else:
                    add_err("array.includesRequiredUnknowns", miss, {"unknownMisses": 1})
    elif node.items or node.ordered:
        child_env = make_child_env()
        item_scope_all = item_live.copy()
        matched_any = np.zeros(n_items, dtype=bool)
        # splice bookkeeping shared by the ordered and items loops: every
        # report the loop emits uses joi's CURRENT index — post-splice when
        # a strip-flagged slot/schema or stripUnknown.arrays removed an
        # earlier item (array.js:148 path=[...state.path,i] with fastSplice
        # i--; fuzz seeds 109406/110082, node-verified)
        strip_items = np.zeros(n_items, dtype=bool)
        # required+strip claims: item becomes undefined with NO splice
        # (_required_strip_claims)
        undef_items = np.zeros(n_items, dtype=bool)
        shift_recs: list = []
        if node.ordered:
            slot_pairs: list = []
            slot_failed = np.zeros(n_items, dtype=bool)
            for i, oc in enumerate(node.ordered):
                pos_mask = (positions == i) & item_live
                if not pos_mask.any():
                    continue
                sub = eval_node(oc, flat, child_env, path, scope=pos_mask)
                shift_recs += lift_item_errors(sub, path)
                clean = pos_mask & ~(sub.failed if sub.failed is not None
                                     else np.zeros(n_items, bool))
                if oc.flags.get("strip"):
                    # a clean strip-flagged slot match is spliced out
                    # (array.js:195-200) — no adoption, no sparse check
                    strip_items |= clean
                    if sub.failed is not None:
                        slot_failed |= pos_mask & sub.failed
                    matched_any |= pos_mask
                    continue
                became_o = _converted_sparse_items(node, add_err, sub, pos_mask, nulls_flat,
                                                   parents, positions, n, items_grp, soft=False,
                                                   shift_recs=shift_recs)
                # matched slots adopt converted values (array.js:209
                # value[i] = res.value); merged in ONE pass after the loop
                # so a later slot's type promotion can't clobber an earlier
                # slot's adopted values
                if sub.value is not None:
                    adopt = clean
                    if became_o is not None:
                        adopt = adopt & ~became_o
                    if adopt.any():
                        slot_pairs.append((adopt, sub.value))
                if sub.failed is not None:
                    slot_failed |= pos_mask & sub.failed
                matched_any |= pos_mask
            if slot_pairs:
                # beyond-slot items are tolerable for the type promotion:
                # their rows carry array.orderedLength (or array.includes
                # failures downstream), so their values are never compared
                for _am, _av in slot_pairs:
                    adopted_any |= _am
                merged, alt_flat, alt_ok = _adopt_items_multi(
                    slot_pairs, new_flat if new_flat is not None else flat,
                    slot_failed | ~item_live | (positions >= len(node.ordered)), n_items,
                )
                new_flat = merged or new_flat
            beyond = positions >= len(node.ordered)
            if beyond.any() and not node.items:
                # ONE row-level error at the first beyond NON-UNDEFINED
                # item (an undefined one sparse-errors and `continue`s —
                # array.js:154-164 precedes :222-231), then joi BREAKs
                L = len(node.ordered)
                beyond_live = beyond & item_live
                by_pos: dict[int, list] = {}
                seen_rows: set = set()
                order_idx = np.lexsort((positions[beyond_live], parents[beyond_live]))
                bl_parents = parents[beyond_live][order_idx]
                bl_pos = positions[beyond_live][order_idx]
                # strip-flagged slot splices shift the reported pos: every
                # ordered strip sits at a slot position < L <= ppos, so the
                # first beyond item's CURRENT index is ppos minus the row's
                # strip count (array.js:222-231 uses the loop i)
                row_strips = np.bincount(parents[strip_items], minlength=n) \
                    if strip_items.any() else np.zeros(n, np.int64)
                for rrow, ppos in zip(bl_parents, bl_pos):
                    if int(rrow) in seen_rows:
                        continue
                    seen_rows.add(int(rrow))
                    by_pos.setdefault(int(ppos) - int(row_strips[int(rrow)]), []).append(int(rrow))
                for ppos, rws in by_pos.items():
                    rows_over = np.zeros(n, dtype=bool)
                    rows_over[rws] = True
                    add_err("array.orderedLength", rows_over & scope, {"pos": ppos, "limit": L})
                matched_any |= beyond
            # required ordered slots beyond the input length are misses
            # (array.js:348-350 fillOrderedErrors -> fillMissedErrors;
            # vector :1187-1199)
            req_ord = [
                (i, oc) for i, oc in enumerate(node.ordered)
                if oc.flags.get("presence") == "required"
            ]
            if req_ord:
                lengths_np = pc.list_value_length(arr).fill_null(0).to_numpy(
                    zero_copy_only=False).astype(np.int64)
                present_rows = ~null_mask(arr) & scope
                ord_bits = np.zeros(n, dtype=np.int64)
                for b, (i, oc) in enumerate(req_ord):
                    ord_bits |= (present_rows & (lengths_np <= i)).astype(np.int64) << b
                for bits in np.unique(ord_bits[ord_bits != 0]):
                    labels = [
                        req_ord[b][1].flags.get("label")
                        for b in range(len(req_ord))
                        if (int(bits) >> b) & 1
                    ]
                    known = [l for l in labels if l]
                    unknown = len(labels) - len(known)
                    if known and unknown:
                        code, ctx = "array.includesRequiredBoth", {
                            "knownMisses": known, "unknownMisses": unknown}
                    elif known:
                        code, ctx = "array.includesRequiredKnowns", {"knownMisses": known}
                    else:
                        code, ctx = "array.includesRequiredUnknowns", {"unknownMisses": unknown}
                    add_err(code, ord_bits == bits, ctx)
        if node.items:
            remaining = item_scope_all & ~matched_any
            # exclusions first (array.js:206-218): a match errors and claims
            # the item before any inclusion can — an exclusion-errored item
            # also never reaches the requireds loop (`errored -> continue`),
            # so it cannot CLAIM a required schema (fuzz seed 43005251,
            # node-verified: all-excluded items still miss the required)
            excl_hit = np.zeros(n_items, dtype=bool)
            for ic in exclusions:
                if not remaining.any():
                    break
                xsub = eval_node(exclusion_node(ic), flat, child_env.match_env(), path, scope=remaining)
                bad = remaining & ~(xsub.failed if xsub.failed is not None
                                    else np.zeros(len(flat), bool))
                shift_recs += lift_probe_warns(xsub, forced_abort=True)  # $_match probe
                if bad.any():
                    rec_x = add_err(
                        "array.excludes",
                        np.zeros(n, bool),
                        {},
                        item_rows=parents[bad],
                        item_index=positions[bad].astype(np.int32),
                        group=items_grp,
                    )
                    if rec_x is not None:  # branch scope can drop every row
                        shift_recs.append((rec_x, np.nonzero(bad)[0]))
                matched_any |= bad
                excl_hit |= bad
                remaining = remaining & ~bad
            if len(inclusions) == 1 and not strip_arrays and remaining.any():
                # single inclusion: unmatched items surface the item's
                # ACTUAL errors, not array.includes (array.js:304-315
                # `jl === 1`; ordered+items vector :1201-1213)
                ic = inclusions[0]
                sub = eval_node(ic, flat, child_env, path, scope=remaining)
                shift_recs += lift_item_errors(sub, path)
                # a strip-flagged inclusion splices BEFORE the undefined
                # check (array.js:280-286), so an empty('')-converted clean
                # item strips silently instead of sparse-erroring (fuzz
                # seed 4001409, node-verified)
                became2 = None if ic.flags.get("strip") else _converted_sparse_items(
                    node, add_err, sub, remaining, nulls_flat,
                    parents, positions, n, items_grp, shift_recs=shift_recs)
                ok = ~sub.failed if sub.failed is not None else np.ones(n_items, bool)
                # matched items adopt the schema's converted value
                # (array.js:297 value[i] = res.value); failed / sparse-
                # converted / out-of-scope items keep the original
                if sub.value is not None:
                    keep_orig = ~(remaining & ok)
                    if became2 is not None:
                        keep_orig = keep_orig | became2
                    base = new_flat if new_flat is not None else flat
                    new_flat = _adopt_items(~keep_orig, sub.value, base, n_items, failed=sub.failed)[0] or new_flat
                    adopted_any |= ~keep_orig
                hit = remaining & ok
                if ic.flags.get("strip"):
                    claim, splice = _required_strip_claims(
                        ic, hit, parents, positions, n_items, n, node,
                        add_err, items_grp, shift_recs)
                    strip_items |= splice
                    if claim is not None:
                        undef_items |= claim
                matched_any |= hit
                remaining = remaining & ~hit
                # items were either matched or actual-errored; skip includes
                matched_any |= remaining & ~as_bool_np(pc.is_null(flat), n_items)
                remaining &= as_bool_np(pc.is_null(flat), n_items)
            else:
                incl_pairs: list = []
                # joi's per-item loop runs the REQUIREDS pre-loop first
                # (array.js:233-258): each item tries the still-unclaimed
                # requireds in order via full $_validate — the first match
                # CLAIMS the schema, adopts ITS conversion, and skips the
                # inclusions stage; warns leak from every attempt (items up
                # to and including the claim point).  Model that before the
                # inclusions sweep (fuzz seed 25000108, node-verified: a
                # claimant matching a non-required too still adopts the
                # required's value and leaks its warn).
                _reqs = [ic for ic in inclusions if ic.flags.get("presence") == "required"]
                _req_attempts: dict[int, np.ndarray] = {}
                if _reqs:
                    claim_of_item = np.full(n_items, -1, dtype=np.int64)
                    claim_sets: list[np.ndarray] = []
                    pre_claimed = np.zeros(n_items, dtype=bool)
                    for j, ric in enumerate(_reqs):
                        okj = (node_validity(ric, flat, child_env, remaining & ~pre_claimed)
                               & remaining & ~pre_claimed)
                        clj = np.zeros(n_items, dtype=bool)
                        idxs = np.nonzero(okj)[0]
                        if len(idxs):
                            rows_j, first = np.unique(parents[idxs], return_index=True)
                            clj[idxs[first]] = True
                            pre_claimed |= clj
                            claim_of_item[clj] = j
                        claim_sets.append(clj)
                    for j, ric in enumerate(_reqs):
                        clj = claim_sets[j]
                        # attempts = items up to the row's claim point that
                        # didn't already claim an EARLIER required (a claim
                        # breaks the item's requireds walk)
                        claim_pos = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
                        if clj.any():
                            claim_pos[parents[clj]] = positions[clj]
                        att = remaining & (positions <= claim_pos[parents])
                        att &= ~((claim_of_item >= 0) & (claim_of_item < j))
                        _req_attempts[id(ric)] = att
                        if not att.any():
                            continue
                        sub_r = eval_node(ric, flat, child_env, path, scope=att)
                        shift_recs += lift_probe_warns(sub_r)
                        if clj.any():
                            if ric.flags.get("strip"):
                                # required+strip claim: value[i] = undefined
                                # (validator.js:414), sparse error, NO splice
                                claim_u, _sp = _required_strip_claims(
                                    ric, clj, parents, positions, n_items, n,
                                    node, add_err, items_grp, shift_recs)
                                if claim_u is not None:
                                    undef_items |= claim_u
                            else:
                                became_r = _converted_sparse_items(
                                    node, add_err, sub_r, clj, nulls_flat, parents,
                                    positions, n, items_grp, shift_recs=shift_recs)
                                adopt_r = clj if became_r is None else clj & ~became_r
                                if sub_r.value is not None and adopt_r.any():
                                    incl_pairs.append((adopt_r, sub_r.value))
                    matched_any |= pre_claimed
                    remaining = remaining & ~pre_claimed
                # joi tries NON-REQUIRED inclusions first, requireds last
                # (array.js:137 `[...inclusions, ...requireds]`); required
                # schemas skip warn re-leaks for items their pre-loop
                # attempt already covered (previousCheck reuse)
                _incl_order = ([ic for ic in inclusions if ic.flags.get("presence") != "required"]
                               + _reqs)
                for ic in _incl_order:
                    if not remaining.any():
                        break
                    isub = eval_node(ic, flat, child_env, path, scope=remaining)
                    shift_recs += lift_probe_warns(isub, exclude=_req_attempts.get(id(ic)))
                    ok = ~(isub.failed if isub.failed is not None
                           else np.zeros(len(flat), bool))
                    hit = remaining & ok
                    if ic.flags.get("strip"):
                        if id(ic) in _req_attempts:
                            # the requireds PRE-LOOP already holds this
                            # schema's claim — inclusion-stage matches of
                            # an already-claimed required splice like
                            # plain inclusions (array.js:280-283; fuzz
                            # seed 38000247, node-verified)
                            strip_items |= hit
                        else:
                            # items matching a strip-marked schema are
                            # removed from the output array; a required
                            # schema's first claim stays as undefined
                            claim, splice = _required_strip_claims(
                                ic, hit, parents, positions, n_items, n, node,
                                add_err, items_grp, shift_recs)
                            strip_items |= splice
                            if claim is not None:
                                undef_items |= claim
                    else:
                        # a matched item whose CONVERTED value is undefined
                        # (empty('') conversion) sparse-errors and keeps
                        # the original — no adoption (array.js:286-292;
                        # fuzz seed 3000556)
                        became_g = _converted_sparse_items(
                            node, add_err, isub, hit, nulls_flat, parents,
                            positions, n, items_grp, shift_recs=shift_recs)
                        adopt_g = hit if became_g is None else hit & ~became_g
                        if isub.value is not None and adopt_g.any():
                            # matched items adopt the inclusion's CONVERTED
                            # value (array.js:297 value[i] = res.value —
                            # first matching schema claims the item; fuzz
                            # seed 2200074: trim/uppercase must land under
                            # stripUnknown.arrays)
                            incl_pairs.append((adopt_g, isub.value))
                    matched_any |= hit
                    remaining = remaining & ~hit
                if incl_pairs:
                    for _am, _av in incl_pairs:
                        adopted_any |= _am
                    base = new_flat if new_flat is not None else flat
                    merged_i, alt_f2, alt_o2 = _adopt_items_multi(
                        incl_pairs, base, ~matched_any | ~item_live, n_items)
                    if merged_i is not None:
                        new_flat = merged_i
                    if alt_f2 is not None and alt_flat is None:
                        alt_flat, alt_ok = alt_f2, alt_o2
            # item_scope_all already excludes non-sparse undefineds (they
            # sparse-error and `continue`); under sparse() an undefined
            # item flows through the loop like any value — a required-only
            # inclusion set REJECTS it, so it strips under
            # stripUnknown.arrays / errors array.includes (fuzz seed
            # 3000260: [5, undefined, 5].unique() -> joi splices the
            # undefined, the dup reports post-splice index 1)
            nomatch = item_scope_all & ~matched_any
            # with no inclusion schemas, unmatched values pass (array.js:
            # only exclusion/required bookkeeping applies)
            if nomatch.any() and inclusions:
                if strip_arrays:
                    # stripUnknown.arrays drops unmatched items silently
                    # (array.js:327-331)
                    strip_items |= nomatch
                elif len(inclusions) == 1:
                    # jl === 1 surfaces the item's ACTUAL errors instead of
                    # array.includes (array.js:302-315) — a sparse-flowing
                    # undefined that failed the lone inclusion already
                    # lifted its real error (any.required) above; no
                    # array.includes on top (fuzz seed 4101290)
                    pass
                else:
                    add_err(
                        "array.includes",
                        np.zeros(n, bool),
                        {},
                        item_rows=parents[nomatch],
                        item_index=positions[nomatch].astype(np.int32),
                        group=items_grp,
                    )
            # required item schemas: each OCCURRENCE must claim a DISTINCT
            # item (array.js:235-243 — a matched required is spliced out, so
            # duplicates of the same schema need as many matching items,
            # test/types/array.js:581-602).  The reference iterates
            # item-outer; this schema-outer greedy (first unclaimed valid
            # item per row, in schema order) is equivalent on its vectors.
            requireds = [ic for ic in node.items if ic.flags.get("presence") == "required"]
            if requireds:
                claimed = np.zeros(n_items, dtype=bool)
                miss_bits = np.zeros(n, dtype=np.int64)
                present_rows = ~null_mask(arr) & scope
                for j, ic in enumerate(requireds):
                    # mask to in-scope items: non-sparse undefineds sparse-
                    # error and `continue` in joi, so they can never CLAIM
                    # a required occurrence (fuzz seed 3000341: [undefined]
                    # still misses the required item) — node_validity
                    # defaults to "valid" outside its scope
                    ok = (node_validity(ic, flat, child_env, item_scope_all)
                          & ~claimed & item_scope_all & ~excl_hit)
                    matched_j = np.zeros(n, dtype=bool)
                    idxs = np.nonzero(ok)[0]
                    if len(idxs):
                        rows_j, first = np.unique(parents[idxs], return_index=True)
                        claimed[idxs[first]] = True
                        matched_j[rows_j] = True
                    miss_bits |= (present_rows & ~matched_j).astype(np.int64) << j
                # one aggregated error per row, split labeled/unlabeled
                # misses (array.js:341 fillMissedErrors :674-699 — fires
                # even on empty arrays)
                for bits in np.unique(miss_bits[miss_bits != 0]):
                    labels = [
                        requireds[j].flags.get("label")
                        for j in range(len(requireds))
                        if (int(bits) >> j) & 1
                    ]
                    known = [l for l in labels if l]
                    unknown = len(labels) - len(known)
                    if known and unknown:
                        code, ctx = "array.includesRequiredBoth", {
                            "knownMisses": known, "unknownMisses": unknown}
                    elif known:
                        code, ctx = "array.includesRequiredKnowns", {"knownMisses": known}
                    else:
                        code, ctx = "array.includesRequiredUnknowns", {"unknownMisses": unknown}
                    add_err(code, miss_bits == bits, ctx)
        if strip_items.any():
            # joi splices stripped items DURING the loop (i--), so any
            # later item-stage report carries its POST-SPLICE index:
            # sparse errors ([10, undefined] with 10 stripped ->
            # array.sparse at 0; fuzz seed 2200454), array.excludes,
            # lifted sub-errors, and probe warn leaks (fuzz seeds
            # 109406/110082 — a kept item's string.min warn reports
            # index minus the strips before it; all node-verified)
            cs = np.concatenate(([0], np.cumsum(strip_items)[:-1]))
            rows_u, first_idx = np.unique(parents, return_index=True)
            row_cs0 = np.zeros(n, dtype=np.int64)
            row_cs0[rows_u] = cs[first_idx]
            adj = positions - (cs - row_cs0[parents])
            if _sparse_info is not None:
                rec_s, smask = _sparse_info
                rec_s.item_index = adj[smask].astype(np.int32)
            for rec_t, fidx in shift_recs:
                if len(fidx):
                    rec_t.item_index = adj[fidx].astype(np.int32)
        if undef_items.any():
            # required+strip claim: value[i] = undefined (validator.js:414)
            # — null the item in place, no splice
            src = combine(new_flat) if new_flat is not None else flat
            new_flat = src.take(pa.array(np.arange(n_items), mask=undef_items))
        if strip_items.any():
            keep = ~strip_items
            # strip from the ADOPTED flat (converted item values must
            # survive the splice — fuzz seed 2200074); new_flat is
            # consumed here so the post-strip rebuild below can't
            # re-expand the shorter lists from full-length items
            src_flat = combine(new_flat) if new_flat is not None else flat
            kept_flat = src_flat.filter(pa.array(keep))
            adopted_any = adopted_any[keep]
            new_flat = None
            kept_counts = np.bincount(parents[keep], minlength=n) if keep.any() else np.zeros(n, np.int64)
            null_rows = null_mask(arr)
            offsets = np.zeros(n + 1, dtype=np.int64)
            np.cumsum(kept_counts, out=offsets[1:])
            rebuilt = pa.ListArray.from_arrays(
                pa.array(offsets, type=pa.int64()).cast(pa.int32()), kept_flat
            )
            if null_rows.any():
                rebuilt = pc.if_else(pa.array(null_rows), pa.nulls(n, rebuilt.type), rebuilt)
            arr = rebuilt

    if new_flat is not None and new_flat is not flat:
        arr = _rebuild_list(arr, new_flat)
    alt_pair = None
    if alt_flat is not None:
        # per-row typed view for ref consumers: include a row only when
        # EVERY live item's alt value is faithful to joi's value[i]
        bad = item_live & ~alt_ok
        rows_bad = np.zeros(n, dtype=bool)
        if bad.any():
            rows_bad[parents[bad]] = True
        rows_ok = ~null_mask(arr_in) & ~rows_bad
        if rows_ok.any():
            try:
                alt_pair = (rows_ok, _rebuild_list(arr_in, alt_flat))
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
                alt_pair = None
    # typeof side-channel for unique(): when a promotion rewrote the
    # column type, kept-original items and adopted-converted items carry
    # different joi typeofs even though the Arrow column is now uniform
    # (fuzz seed 5300531: kept number 1 never dups adopted cast "1");
    # consumed by make_unique via env (set fresh per array node)
    if adopted_any.any():
        try:
            _ff = k_lists.flatten_with_parents(combine(arr))[0]
            if _ff.type != flat.type and len(_ff) == len(adopted_any):
                env._item_type_tags = adopted_any
                # which struct FIELDS the promotion retyped — sort(by=...)
                # only sees a typeof split when its by-field is one of
                # them (fuzz seed 26000610: cast x, sort by y — no
                # mismatch in joi's by-resolved comparator)
                if pa.types.is_struct(_ff.type) and pa.types.is_struct(flat.type):
                    old_f = {f.name: f.type for f in flat.type}
                    env._item_type_tag_fields = {
                        f.name for f in _ff.type if old_f.get(f.name) != f.type}
                else:
                    env._item_type_tag_fields = None  # whole-value promotion
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            pass
    return arr, alt_pair


def _rebuild_list(arr: pa.Array, new_flat: pa.Array) -> pa.Array:
    lengths = pc.list_value_length(arr).fill_null(0).to_numpy(zero_copy_only=False)
    offsets = np.zeros(len(arr) + 1, dtype=np.int64)
    np.cumsum(lengths, out=offsets[1:])
    nulls = null_mask(arr)
    off = pa.array(offsets.astype(np.int32), type=pa.int32())
    out = pa.ListArray.from_arrays(off, new_flat)
    if nulls.any():
        out = pc.if_else(pa.array(nulls), pa.nulls(len(arr), out.type), out)
    return out


def _plan_renames(names: list[str], renames: list[dict], prefs: dict):
    """Resolve rename entries against a concrete key/column-name set —
    the batch analog of ``lib/types/object.js:886-967``.  Returns
    ``(ops, errs)``: ops are ``(from, to, alias, ignore_undefined)`` in
    application order; errs are ``(code, context)`` for multiple/override
    violations (joi records the error and still performs the rename)."""
    import re as _re

    from .kernels.template import compile_template

    ops: list[tuple] = []
    errs: list[tuple] = []
    renamed: set[str] = set()
    current = set(names)
    for rn in renames:
        opts = rn.get("options", {})
        is_pattern = bool(rn.get("regex"))
        matches: list[tuple] = []
        if not is_pattern:
            if rn["from"] in current:
                matches.append((rn["from"], rn["to"], None))
        else:
            rx = _re.compile(rn["from"])
            for f in names:
                if f not in current or f == rn["to"]:
                    continue
                m = rx.search(f)
                if m:
                    matches.append((f, rn["to"], m))
        for frm, to, m in matches:
            if isinstance(to, str) and "{" in to:
                # template target rendered with the regex match as local
                # context ({#0} whole match, {#1}.. groups — object.js:924)
                def resolve(name, _m=m):
                    key = name.lstrip("#$")
                    if name.startswith("$"):
                        ctx = prefs.get("context", {})
                        if key in ctx:
                            return ctx[key]
                        raise KeyError(name)
                    if _m is not None and key.isdigit():
                        gi = int(key)
                        if gi == 0 or gi <= (_m.lastindex or 0):
                            return _m.group(gi)
                    raise KeyError(name)

                to = compile_template(to).render(resolve)
            if frm == to:
                continue
            if not opts.get("multiple") and to in renamed:
                errs.append(("object.rename.multiple",
                             {"from": frm, "to": to, "pattern": is_pattern}))
            if to in current and not opts.get("override") and to not in renamed:
                errs.append(("object.rename.override",
                             {"from": frm, "to": to, "pattern": is_pattern}))
            ops.append((frm, to, bool(opts.get("alias")), bool(opts.get("ignoreUndefined"))))
            renamed.add(to)
            current.add(to)
            if not opts.get("alias"):
                current.discard(frm)
    return ops, errs


def _apply_rename_ops(cols: dict, ops: list[tuple]) -> dict:
    """Apply planned renames to an ordered name->array mapping.  Without
    ignore_undefined the target becomes the source column wholesale (joi
    per-row: ``value[to] = value[from]``, deleting on undefined); with it,
    rows whose source is null keep the existing target value."""
    for frm, to, alias, ign in ops:
        src = cols.get(frm)
        if src is None:
            continue
        if ign and to in cols:
            cols[to] = pc.if_else(pc.is_valid(combine(src)), src, cols[to])
        else:
            cols[to] = src
        if not alias:
            cols.pop(frm, None)
    return cols


def _eval_patterns(node: CNode, unknown: list[str], get_child, set_result, env: Env,
                   path: str, kscope, add_err_fn):
    """Pattern-key validation (``object.js:970-1041``): every unknown key is
    checked against each pattern in order (chaining coerced values), a
    matching ``exclusive`` pattern stops the chain, and each pattern's
    ``matches`` schema validates the array of matched key names once per
    batch (``object.pattern.match``)."""
    still: list[str] = []
    pmatched: list[list[str]] = [[] for _ in node.patterns]
    for f in unknown:
        hit = False
        for i, p in enumerate(node.patterns):
            if not p["rx"].search(f):
                continue
            hit = True
            pmatched[i].append(f)
            child_path = f"{path}.{f}" if path else f
            child = get_child(f)
            # joi only walks keys PRESENT in the object (object.js:112
            # unprocessed = Object.keys(value)): a null/absent cell never
            # reaches the pattern schema, so presence prefs don't apply
            sub = eval_node(p["node"], child, env, child_path,
                            scope=kscope & ~null_mask(combine(child)))
            set_result(f, sub)
            if p["exclusive"]:
                break
        if not hit:
            still.append(f)
    for i, p in enumerate(node.patterns):
        if p["matches"] is None:
            continue
        keys_arr = pa.array([pmatched[i]], type=pa.list_(pa.string()))
        ok = node_validity(p["matches"], keys_arr, Env(env.prefs), np.ones(1, dtype=bool))
        if not bool(ok[0]):
            add_err_fn("object.pattern.match", {"matches": pmatched[i]})
    return still


def _eval_object(node: CNode, arr: pa.Array, env: Env, path, scope, resolved, failed, errors, add_err) -> pa.Array:
    n = len(arr)
    parent_present = ~null_mask(arr)
    # deep default (default() no-arg, test/base.js:1064-1081): a missing
    # object is treated as present-empty so child defaults fill it; the
    # struct rebuild below then clears the null mask for those rows
    if (node.flags.get("default") == Schema._DEEP_DEFAULT
            and not env.prefs.get("no_defaults", False)
            and node.flags.get("presence") != "forbidden"):
        parent_present = parent_present | scope
    field_names = [f.name for f in arr.type]

    # renames (object.js:387-415,886-967): struct-field rename at batch
    # level, incl. regex sources, template targets and
    # multiple/override/alias/ignoreUndefined options
    children: dict[str, pa.Array] = {
        f: pc.struct_field(arr, i) for i, f in enumerate(field_names)
    }
    if node.renames:
        ops, rerrs = _plan_renames(field_names, node.renames, env.prefs)
        children = _apply_rename_ops(children, ops)
        field_names = list(children)
        for code, ctx in rerrs:
            add_err(code, scope & parent_present, ctx, seq=-2)
    results: dict[str, NodeResult] = {}

    def resolve_sibling(name: str, mode: str = "strict"):
        if name in results:
            return _failed_overlay(results[name], children.get(name), n, mode)
        if name in children:
            return children[name]
        return pa.nulls(n)  # refs to absent keys resolve undefined (lib/ref.js)

    child_env = env.child(resolve_sibling)
    # parent rows for arg-taking function defaults (validator.js:465)
    child_env.row_getter = _parent_row_getter(children, results)
    kscope = scope & parent_present

    for key in _topo_keys(node.keys):
        cnode = node.keys[key]
        child_arr = children.get(key)
        if child_arr is None:
            child_arr = pa.nulls(n)
        sub = eval_node(cnode, child_arr, child_env, f"{path}.{key}" if path else key, scope=kscope)
        results[key] = sub
        errors.extend(sub.errors)
        if sub.failed is not None:
            np.logical_or(failed, sub.failed, out=failed)

    # unknown fields (pattern-matched fields validate with the pattern schema)
    unknown = [f for f in field_names if f not in node.keys]
    if node.patterns:
        def _get_child(f):
            return results[f].value if f in results else children[f]

        def _set_result(f, sub):
            results[f] = sub
            errors.extend(sub.errors)
            if sub.failed is not None:
                np.logical_or(failed, sub.failed, out=failed)

        unknown = _eval_patterns(
            node, unknown, _get_child, _set_result, child_env, path, kscope,
            lambda code, ctx: add_err(code, kscope.copy(), ctx, seq=-1))
    # unknown-key finalizer (object.js:1043-1076): no keys/patterns terms
    # -> unknown allowed; stripUnknown(.objects) strips UNLESS a local
    # unknown() flag is set; the forbid gate is flags.unknown ?? allowUnknown
    # and fires per-row only where the key is actually present (non-null)
    has_terms = node.keys_term or bool(node.patterns)
    _su = env.prefs.get("strip_unknown", False)
    su_objects = _su is True or (isinstance(_su, dict) and bool(_su.get("objects")))
    strip_unk = su_objects and not node.flags.get("unknown", False) and has_terms
    allow_unknown = node.flags.get("unknown", env.prefs.get("allow_unknown", False))
    if unknown and has_terms and not allow_unknown and not strip_unk:
        for f in unknown:
            # error localizes at the unknown key itself (object.js:1068)
            add_err("object.unknown", kscope & ~null_mask(children[f]),
                    {"child": f}, seq=-1,
                    path_override=f"{path}.{f}" if path else f)

    # dependencies over presence masks (object.js:722-873); dep names may
    # be dotted deep paths ('b.c') — resolved by struct-field traversal,
    # with a per-dependency separator option
    for d in node.dependencies:
        sep = d.get("separator", ".")
        names = list(d["peers"]) + ([d["key"]] if d.get("key") else [])
        pm = {}
        for f in names:
            m = _dep_presence(f, results, children, parent_present, n, sep)
            # unknown names are simply never present (reference: an
            # unresolvable peer still counts as missing and stays in the
            # reported peer list)
            pm[f] = m if m is not None else np.zeros(n, dtype=bool)
        labels = {f: _dep_label(node, f, sep) for f in names}
        for viol, code, ctx in k_structs.dependency_violations(
                d["rel"], pm, d["peers"], d.get("key"), labels):
            add_err(code, viol & kscope, ctx)

    # rebuild struct with coerced / stripped children; a per-row strip
    # (whens branch) nulls the field only where the branch matched, and a
    # plain strip with FAILED rows keeps those rows' originals
    # (_strip_survivors — the errors short-circuit joi's delete)
    keep = []
    for f in field_names:
        if strip_unk and f in unknown:
            continue
        if f in results and results[f].strip:
            surv = _strip_survivors(results[f], children.get(f), n)
            if surv is None:
                continue
            results[f].value = surv
            results[f].strip = False
        keep.append(f)
    for f in keep:
        if f in results and results[f].strip_rows is not None:
            v = combine(results[f].value)
            results[f].value = pc.if_else(
                pa.array(results[f].strip_rows), pa.nulls(len(v), v.type), v)
    arrays = [results[f].value if f in results else children[f] for f in keep]
    orig_names = [f.name for f in arr.type]
    if keep != orig_names or any(results[f].value is not children.get(f) for f in results if f in keep):
        arr = pa.StructArray.from_arrays([combine(a) for a in arrays], names=keep, mask=pa.array(~parent_present))
    return arr


def _dep_label(node, name, separator="."):
    """Display label for a dependency name — each path segment mapped
    through its schema's ``label`` flag (reference ``keysToLabels`` /
    ``$_mapLabels``, object.js:878-886: ``and('a','b.c')`` with labels
    first/second renders ``first`` and ``b.second``)."""
    parts = name.split(separator) if separator else [name]
    out, cur = [], node
    for seg in parts:
        child = cur.keys.get(seg) if cur is not None else None
        out.append(child.flags.get("label", seg) if child is not None else seg)
        cur = child
    return (separator or ".").join(out)


def _dep_presence(name, results, children, parent_present, n, separator="."):
    """Presence mask for a dependency name, supporting dotted deep paths
    ('b.c' — reference object.js dependency separators): present iff every
    path level is non-null.  ``separator=False`` treats the name as one
    literal key (reference options.separator).  Returns None when the
    TOP-level field doesn't exist in the schema/value (reference: unknown
    top key is simply never present), an all-False mask when a deeper
    level is missing."""
    parts = name.split(separator) if separator else [name]
    top = parts[0]
    if top in results:
        cur = results[top].value
        present = ~null_mask(cur)
        # joi only writes result.value back into the object when the child
        # validated cleanly (object.js:125-140): an ERRORED key keeps its
        # ORIGINAL input value, so dependencies see the raw presence there
        # (e.g. q='' with empty('')+required: errored, still "present")
        res_failed = getattr(results[top], "failed", None)
        if res_failed is not None and res_failed.any() and top in children:
            orig_present = ~null_mask(children[top])
            present = np.where(res_failed, orig_present, present)
        # joi deletes strip-flagged keys in the keys loop, BEFORE
        # dependencies run (object.js:117-141 precedes :158-166) — but
        # only on CLEAN rows: result.errors short-circuits the delete, so
        # an errored key stays present with its original (fuzz seed 109:
        # xor('p','q') with p=number().strip() sees only q)
        if results[top].strip:
            clean = ~res_failed if res_failed is not None else np.ones(n, dtype=bool)
            present = present & ~clean
        elif results[top].strip_rows is not None:
            present = present & ~results[top].strip_rows
    elif top in children:
        cur = children[top]
        present = ~null_mask(cur)
    else:
        return None
    mask = present & parent_present
    for p in parts[1:]:
        if not pa.types.is_struct(cur.type) or cur.type.get_field_index(p) < 0:
            return np.zeros(n, dtype=bool)
        cur = pc.struct_field(cur, p)
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        mask = mask & ~null_mask(cur)
    return mask


def _eval_structural_rule(node, cr, arr, env, path, scope, missing, resolved, failed, add_err):
    name, args = cr.name, cr.fn[1]
    n = len(arr)
    active = scope & ~missing & ~resolved
    if node.type == "array" and name == "has":
        schema = args["schema"]
        cnode = CNode(schema if isinstance(schema, Schema) else build(schema), env.prefs)
        flat, parents, positions = k_lists.flatten_with_parents(arr)
        ok_rows = np.zeros(n, dtype=bool)
        if len(parents):
            sub = eval_node(cnode, flat, Env(env.prefs).match_env(), path, scope=np.ones(len(flat), dtype=bool))
            okm = ~(sub.failed if sub.failed is not None else np.zeros(len(flat), bool))
            ok_rows[np.unique(parents[okm])] = True
            # joi probes items IN ORDER until the first match (array.js:
            # 99-107 returns on $_match), and each probe is a real validate
            # call whose warn reports leak (validator.js:303-306) — under
            # abortEarly only warns emitted before the probe's first hard
            # error per item (node-verified)
            first = np.full(n, np.iinfo(np.int64).max, dtype=np.int64)
            if okm.any():
                np.minimum.at(first, parents[okm], positions[okm])
            probed = positions <= first[parents]
            abort = True  # $_match probe forces abortEarly (base.js:721)
            aborted = np.zeros(len(flat), dtype=bool)
            for rec in sub.errors:
                rows0 = (rec.rows if getattr(rec, "rows", None) is not None
                         else np.nonzero(rec.mask)[0])
                if rec.warn:
                    keepv = probed[rows0]
                    if abort:
                        keepv = keepv & ~aborted[rows0]
                    if not keepv.any():
                        continue
                    kr = rows0[keepv]
                    vals = None
                    if getattr(rec, "values", None) is not None:
                        vals = [v for v, k in zip(rec.values, keepv) if k]
                    add_err(rec.code, np.zeros(n, bool), rec.context, seq=rec.seq,
                            warn=True, message=rec.message, item_rows=parents[kr],
                            item_index=positions[kr].astype(np.int32),
                            path_override=rec.path, values=vals,
                            path_ipos=len(path) if len(rec.path) > len(path) else None)
                elif abort:
                    aborted[rows0] = True
        # a LABELED has-schema errors array.hasKnown with the patternLabel
        # (array.js:109-114)
        plabel = cnode.flags.get("label")
        if plabel:
            add_err("array.hasKnown", active & ~ok_rows, {"patternLabel": plabel},
                    seq=cr.seq, warn=cr.warn, message=cr.message)
        else:
            add_err("array.hasUnknown", active & ~ok_rows, {}, seq=cr.seq, warn=cr.warn, message=cr.message)
        return
    if node.type == "object":
        if name in ("min", "max", "length"):
            field_names = [f.name for f in arr.type] if pa.types.is_struct(arr.type) else []
            presence = {f: ~null_mask(pc.struct_field(arr, f)) for f in field_names}
            counts = k_structs.key_count(presence, n)
            limit = args["limit"]
            opmap = {"min": counts >= limit, "max": counts <= limit, "length": counts == limit}
            add_err(f"object.{name}", active & ~opmap[name], {"limit": limit}, seq=cr.seq, warn=cr.warn, message=cr.message)
            return
        if name == "assert":
            r = args["ref"]
            schema = args["schema"]
            cnode = CNode(schema if isinstance(schema, Schema) else build(schema), env.prefs)
            if pa.types.is_struct(arr.type):
                # refs inside the assert schema resolve with the object
                # prepended to the ancestor chain (object.js:221-224 —
                # ancestors: [value, ...state.ancestors])
                def _own_child(seg, _arr=arr, _n=n):
                    t = _arr.type
                    if t.get_field_index(seg) >= 0:
                        return pc.struct_field(_arr, seg)
                    return pa.nulls(_n)

                env = env.child(_own_child)
            if r.kind == "ancestor" and pa.types.is_struct(arr.type):
                # subject path resolves within the object's own value,
                # dotted segments walking struct fields
                from .kernels.util import _walk_ref_path

                subject = combine(_walk_ref_path(arr, r.parts, n))
            else:
                # global ($context) subjects resolve via prefs.context.
                # NOTE the reference CRASHES here (object.js:223 calls
                # ref.resolve with no prefs, so ref.js:114 reads
                # undefined.context) — we implement the documented intent;
                # the fuzzer tracks the crash as assert_context_crash.
                subject = env.resolve_ref(r, n)
            if not isinstance(subject, (pa.Array, pa.ChunkedArray)):
                subject = pa.array([subject] * n)
            asub = eval_node(cnode, combine(subject), env.match_env(), "", scope=active)
            ok = ~(asub.failed if asub.failed is not None else np.zeros(n, bool))
            # the assert sub-$_match is a real validate call: its warn
            # reports leak to the main state with joi's root-ish path
            # ('"value" must be...', path []) — $_match FORCES abortEarly
            # internally (base.js:721; node-verified: hard-first suppresses
            # the warn even under outer abortEarly:false)
            abort = True
            aborted = np.zeros(n, dtype=bool)
            for rec in asub.errors:
                rows0 = (rec.rows if getattr(rec, "rows", None) is not None
                         else np.nonzero(rec.mask)[0])
                if rec.warn:
                    keepv = ~aborted[rows0] if abort else np.ones(len(rows0), bool)
                    if not keepv.any():
                        continue
                    wmask = np.zeros(n, dtype=bool)
                    wmask[rows0[keepv]] = True
                    vals = None
                    if getattr(rec, "values", None) is not None:
                        vals = [v for v, k in zip(rec.values, keepv) if k]
                    add_err(rec.code, wmask, rec.context, seq=rec.seq, warn=True,
                            message=rec.message, path_override=rec.path, values=vals)
                elif abort:
                    aborted[rows0] = True
            add_err("object.assert", active & ~ok,
                    {"ref": r.path, "message": args.get("message") or "pass the assertion test"},
                    seq=cr.seq, warn=cr.warn, message=cr.message)
            return
    raise ValueError(f"unhandled structural rule {node.type}.{name}")


def _topo_keys(keys: dict[str, CNode]) -> list[str]:
    """Topologically order sibling keys so referenced columns evaluate first
    (shadow semantics — the analog of ``object.js:598-609``)."""
    deps: dict[str, set[str]] = {k: set() for k in keys}

    def collect(s: Schema, out: set):
        for r in s.rules:
            for v in r.get("args", {}).values():
                if isinstance(v, Ref) and getattr(v, "level", None) == 1:
                    out.add(v.parts[0] if v.parts else v.path)
        for v in s.allow_vals + s.invalid_vals:
            if isinstance(v, Ref) and getattr(v, "level", None) == 1:
                out.add(v.parts[0] if v.parts else v.path)
        dv = s.flags.get("default")
        if isinstance(dv, Ref) and getattr(dv, "level", None) == 1:
            out.add(dv.parts[0] if dv.parts else dv.path)
        elif hasattr(dv, "ref_names"):
            # expression-valued default: joi registers the template's refs
            # on the schema, so its sibling names order the topo too
            for nm in dv.ref_names():
                if nm and nm[0] not in "#$":
                    out.add(nm.split(".")[0])
        # NOTE deliberately NOT when-condition refs: the reference's
        # alternatives type never registers them (lib/types/alternatives.js
        # has no _refs.register), so they don't feed the key topo sort —
        # a when() sees the RAW sibling unless something else orders it.
        # Branch SCHEMAS however are registered sub-schemas
        # ($_mutateRegister propagates their refs), so their own rule refs
        # do count.
        for w in s.terms.get("whens", []):
            for br in ("then", "otherwise"):
                if isinstance(w.get(br), Schema):
                    collect(w[br], out)
            for sw in w.get("switch", []) or []:
                if isinstance(sw.get("then"), Schema):
                    collect(sw["then"], out)
                if isinstance(sw.get("otherwise"), Schema):
                    collect(sw["otherwise"], out)

    for k, cn in keys.items():
        collect(cn.schema, deps[k])
        deps[k] &= set(keys)
    # @hapi/topo keeps INSERTION order and only defers a dependent past its
    # targets ({b,c,a-after-c,d} -> [b, c, a, d], not [c, a, b, d]) — the
    # evaluation (and with abortEarly, the first-error) order depends on it.
    # Kahn's algorithm picking the earliest-inserted ready node mirrors that.
    order = {k: i for i, k in enumerate(keys)}
    out, done = [], set()
    remaining = list(keys)
    while remaining:
        ready = [k for k in remaining if deps[k] <= done]
        if not ready:
            # the reference REFUSES cyclic key dependencies at build time
            # (@hapi/topo: 'item added into group <k> created a
            # dependencies error' via object.js:601-606)
            raise ValueError(
                f"cyclic key dependencies among {sorted(remaining)} "
                "(reference @hapi/topo raises at schema build)"
            )
        nxt = min(ready, key=lambda k: order[k])
        out.append(nxt)
        done.add(nxt)
        remaining.remove(nxt)
    return out


# ==========================================================================
# table-level API


@dataclass
class BatchResult:
    value: pa.Table
    violations: pa.Table
    ok: np.ndarray

    @property
    def n_rows(self) -> int:
        return len(self.ok)

    @property
    def n_failed(self) -> int:
        return int((~self.ok).sum())

    def summary(self) -> dict:
        codes: dict[str, int] = {}
        warnings: dict[str, int] = {}
        if self.violations.num_rows:
            vc = self.violations.group_by(["code", "severity"]).aggregate([("code", "count")])
            for code, sev, cnt in zip(
                vc["code"].to_pylist(), vc["severity"].to_pylist(), vc["code_count"].to_pylist()
            ):
                bucket = warnings if sev == "warn" else codes
                bucket[code] = bucket.get(code, 0) + cnt
        out = {"rows": self.n_rows, "failed": self.n_failed, "codes": codes}
        if warnings:
            out["warnings"] = warnings
        return out


class CompiledSchema:
    """Driver-side compiled validation program for a fixed-schema table.

    ``schema`` must be (or describe) an object schema whose keys are the
    table's columns; ``id_column`` names the column carried into violation
    rows (the north rule's ``doc_id``).
    """

    def __init__(self, schema: Schema | dict, prefs: dict | None = None, id_column: str | None = None):
        if isinstance(schema, dict) and "type" not in schema:
            schema = Schema.__new__(Schema)  # pragma: no cover - guarded below
        if isinstance(schema, dict):
            schema = build(schema)
        if schema.type != "object":
            raise ValueError("table schema root must be an object() with keys")
        self.schema = schema
        self.prefs = {**DEFAULT_PREFS, **(prefs or {}), **schema.prefs}
        self.id_column = id_column
        self.root = CNode(schema, self.prefs)
        self.key_order = _topo_keys(self.root.keys)

    def validate_table(self, tbl: pa.Table) -> BatchResult:
        tbl = tbl.combine_chunks()
        n = tbl.num_rows
        env = Env(self.prefs)
        columns: dict[str, pa.Array] = {c: combine(tbl[c]) for c in tbl.column_names}
        results: dict[str, NodeResult] = {}
        errors: list[ErrRec] = []
        failed = np.zeros(n, dtype=bool)

        # ---- root presence stage (validator.js:168-190): the ROOT node
        # itself takes the explicit flag or the prefs.presence default.
        # Every table row IS a provided root value, so an effective
        # presence:'forbidden' errors any.unknown at the root path
        # ('"value" is not allowed') and RETURNS — keys, renames and
        # unknowns never run, the value keeps the originals
        # (node-verified: prefs {presence:'forbidden'} fails {} and
        # {a:5} alike at path []; an explicit root required() lets keys
        # evaluate with the forbidden default applied per key)
        root_presence = self.root.flags.get("presence") or self.prefs.get("presence", "optional")
        if root_presence == "forbidden":
            rec = ErrRec("any.unknown", np.ones(n, dtype=bool), "", {}, -3)
            rec.rows = None
            violations = self._assemble_violations([rec], columns, n)
            return BatchResult(value=tbl, violations=violations, ok=np.zeros(n, dtype=bool))

        # table-level renames (object.js:387-415,886-967): regex sources,
        # template targets, multiple/override/alias/ignoreUndefined
        if self.root.renames:
            ops, rerrs = _plan_renames(list(columns), self.root.renames, self.prefs)
            columns = _apply_rename_ops(columns, ops)
            for code, ctx in rerrs:
                rec = ErrRec(code, np.ones(n, dtype=bool), "", ctx, -2)
                rec.rows = None
                errors.append(rec)
                failed[:] = True

        def resolve_sibling(name: str, mode: str = "strict"):
            if name in results:
                return _failed_overlay(results[name], columns.get(name), n, mode)
            if name in columns:
                return columns[name]
            return pa.nulls(n)  # refs to absent columns resolve undefined

        env = Env(self.prefs, resolve_sibling)
        # parent rows for arg-taking function defaults (validator.js:465)
        env.row_getter = _parent_row_getter(columns, results)
        scope = np.ones(n, dtype=bool)

        for key in self.key_order:
            cnode = self.root.keys[key]
            arr = columns.get(key, pa.nulls(n))
            res = eval_node(cnode, arr, env, key, scope=scope)
            results[key] = res
            errors.extend(res.errors)
            if res.failed is not None:
                np.logical_or(failed, res.failed, out=failed)

        # unknown columns: pattern-matched ones validate with the pattern
        # schema (object.js:340-369); the rest error / strip / pass through
        unknown = [c for c in columns if c not in self.root.keys]
        if self.root.patterns:
            def _get_col(c):
                return results[c].value if c in results else columns[c]

            def _set_res(c, sub):
                results[c] = sub
                errors.extend(sub.errors)
                if sub.failed is not None:
                    np.logical_or(failed, sub.failed, out=failed)

            def _pat_err(code, ctx):
                rec = ErrRec(code, scope.copy(), "", ctx, -1)
                rec.rows = None
                errors.append(rec)
                failed[scope] = True

            unknown = _eval_patterns(
                self.root, unknown, _get_col, _set_res, env, "", scope, _pat_err)
        # same finalizer as the nested path (object.js:1043-1076): term
        # presence gates, local unknown() exempts from stripUnknown, error
        # fires only on rows where the column is present (non-null)
        has_terms = self.root.keys_term or bool(self.root.patterns)
        _su = self.prefs.get("strip_unknown", False)
        su_objects = _su is True or (isinstance(_su, dict) and bool(_su.get("objects")))
        strip_unknown = su_objects and not self.root.flags.get("unknown", False) and has_terms
        allow_unknown = self.root.flags.get("unknown", self.prefs.get("allow_unknown", False))
        if unknown and has_terms and not allow_unknown and not strip_unknown:
            for c in unknown:
                present_c = scope & ~null_mask(combine(columns[c]))
                rec = ErrRec("object.unknown", present_c, c, {"child": c}, -1)
                rec.rows = None
                errors.append(rec)
                failed |= present_c

        # dependencies across top-level columns (dotted deep paths resolve
        # into struct columns; an unknown top-level name is never present)
        all_ones = np.ones(n, dtype=bool)
        for d in self.root.dependencies:
            sep = d.get("separator", ".")
            names = list(d["peers"]) + ([d["key"]] if d.get("key") else [])
            pm = {}
            for k in names:
                m = _dep_presence(k, results, columns, all_ones, n, sep)
                pm[k] = m if m is not None else np.zeros(n, bool)
            labels = {k: _dep_label(self.root, k, sep) for k in names}
            for viol, code, ctx in k_structs.dependency_violations(
                    d["rel"], pm, d["peers"], d.get("key"), labels):
                if viol.any():
                    rec = ErrRec(code, viol & scope, "", ctx, 9000)
                    rec.rows = None
                    errors.append(rec)
                    failed |= viol & scope
        for cr in self.root.rules:
            if isinstance(cr.fn, tuple) and cr.fn[0] == "structural" and cr.name == "assert":
                args = cr.fn[1]
                cnode = CNode(args["schema"] if isinstance(args["schema"], Schema) else build(args["schema"]), self.prefs)
                subject = combine(env.resolve_ref(args["ref"], n))
                asub = eval_node(cnode, subject, env.match_env(), "", scope=scope)
                ok = ~(asub.failed if asub.failed is not None else np.zeros(n, bool))
                bad = scope & ~ok
                # assert sub-$_match warn reports leak (root-ish path,
                # FORCED abortEarly — see _eval_structural_rule)
                abort = True
                aborted = np.zeros(n, dtype=bool)
                for arec in asub.errors:
                    rows0 = (arec.rows if getattr(arec, "rows", None) is not None
                             else np.nonzero(arec.mask)[0])
                    if arec.warn:
                        keepv = ~aborted[rows0] if abort else np.ones(len(rows0), bool)
                        if keepv.any():
                            nr2 = ErrRec(arec.code, np.zeros(n, bool), arec.path,
                                         arec.context, arec.seq, True, arec.message)
                            wmask = np.zeros(n, dtype=bool)
                            wmask[rows0[keepv]] = True
                            nr2.mask = wmask
                            nr2.rows = None
                            if getattr(arec, "values", None) is not None:
                                nr2.values = [v for v, k in zip(arec.values, keepv) if k]
                            errors.append(nr2)
                    elif abort:
                        aborted[rows0] = True
                if bad.any():
                    # error attaches to the object itself (object.js:227 uses
                    # the object's state -> root label "value"); {ref} carries
                    # the subject path
                    rec = ErrRec("object.assert", bad, "",
                                 {"ref": args["ref"].path,
                                  "message": args.get("message") or "pass the assertion test"},
                                 cr.seq)
                    rec.rows = None
                    errors.append(rec)
                    failed |= bad

        # assemble normalized output; a per-row strip (whens branch) nulls
        # the column only where the branch matched (fuzz seed 98)
        def _strip_masked(res: NodeResult):
            if res.strip_rows is None:
                return res.value
            v = combine(res.value)
            return pc.if_else(pa.array(res.strip_rows), pa.nulls(len(v), v.type), v)

        def _emit(name, res):
            if res.strip:
                # errored rows survive the strip delete with their ORIGINAL
                # value (_strip_survivors); all-clean -> column dropped
                surv = _strip_survivors(res, columns.get(name), n)
                if surv is not None:
                    out_names.append(name)
                    out_cols.append(surv)
                return
            out_names.append(name)
            out_cols.append(_strip_masked(res))

        out_cols, out_names = [], []
        for key in self.root.keys:
            if key in results:
                _emit(key, results[key])
        for c in results:  # pattern-matched columns
            if c not in self.root.keys:
                _emit(c, results[c])
        for c in unknown:
            if not strip_unknown:
                out_names.append(c)
                out_cols.append(columns[c])
        value = pa.table(dict(zip(out_names, out_cols))) if out_names else tbl

        warn_failed = np.zeros(n, dtype=bool)
        for rec in errors:
            if not rec.warn:
                continue
        ok_mask = ~failed
        violations = self._assemble_violations(errors, columns, n)
        return BatchResult(value=value, violations=violations, ok=ok_mask)

    def _assemble_violations(self, errors: list[ErrRec], columns: dict, n: int) -> pa.Table:
        ids = None
        if self.id_column and self.id_column in columns:
            idc = columns[self.id_column]
            if not pa.types.is_string(idc.type):
                idc = pc.cast(idc, pa.string())
            ids = idc
        # per-REC scalar columns (one entry per rec, repeated into row
        # position at the end via a single np.repeat index — the per-rec
        # `list.extend([x] * k)` pattern was ~40% of validate wall-time on
        # warn-heavy batches, ~0.4 µs/violation of pure Python)
        rows_l, item_l = [], []
        counts: list[int] = []
        path_r, code_r, ctx_r, warn_r, seq_r = [], [], [], [], []
        rec_r: list = []  # emission order (joi's traversal order)
        sub_r: list = []  # true emission index (group-internal tiebreak)
        soft_r: list = []  # non-aborting errors (see ErrRec.soft)
        labort_r: list = []  # schema-local abortEarly group ids (0 = none)
        fitem_l: list = []  # FIRE-time item indexes (pre-splice walk order)
        fin_r: list = []  # finalize pushes (any.default/failover throws)
        msg_r: list = []  # str (constant per rec) or list (per row)
        group_first: dict[int, int] = {}  # ordering-group -> first emission index
        for rec_idx, rec in enumerate(errors):
            if getattr(rec, "rows", None) is not None:
                rows = rec.rows
                items = rec.item_index if rec.item_index is not None else np.full(len(rows), -1, np.int32)
            else:
                rows = np.nonzero(rec.mask)[0]
                items = np.full(len(rows), -1, dtype=np.int32)
            if len(rows) == 0:
                continue
            k = len(rows)
            rows_l.append(rows.astype(np.int64))
            item_l.append(items.astype(np.int32))
            ctx_json = json.dumps(rec.context, default=str, sort_keys=True) if rec.context else "{}"
            # message priority: per-rule override > prefs.messages map > catalog
            override = rec.message or k_messages.lookup_override(rec.code, self.prefs)
            # joi renders the label from the FULL state path including the
            # item index ("b[0]", errors.js:87-107) unless a label flag
            # overrides it; item errors therefore need one render per
            # distinct index (bounded by max list length, not row count).
            if getattr(rec, "values", None) is not None:
                # the message embeds the offending value ({[.]},
                # string/index.js:760-763): render the TEMPLATE once per
                # distinct item label (leaving {value} in place), then one
                # str.replace per fired row — bounded by the violation
                # count and free of the template machinery per row
                base_cache: dict[int, str] = {}

                def _base_for(it: int) -> str:
                    b = base_cache.get(it)
                    if b is None:
                        b = render(
                            rec.code,
                            _item_label_path(rec.path, it, getattr(rec, "ipos", None)),
                            rec.context,
                            override,
                            prefs=self.prefs,
                        )
                        base_cache[it] = b
                    return b

                msg_r.append([
                    # a None value is JS undefined (e.g. an unbound ref
                    # resolution): the {[.]} part DROPS, not 'null'
                    _base_for(int(it)).replace(
                        "{value}", "" if v is None else k_messages.stringify(v, self.prefs))
                    for it, v in zip(items, rec.values)
                ])
            elif "label" not in (rec.context or {}) and (items >= 0).any():
                by_item = {
                    int(it): render(
                        rec.code,
                        _item_label_path(rec.path, int(it), getattr(rec, "ipos", None)),
                        rec.context,
                        override,
                        prefs=self.prefs,
                    )
                    for it in np.unique(items)
                }
                msg_r.append([by_item[int(it)] for it in items])
            else:
                msg_r.append(render(rec.code, rec.path, rec.context, override, prefs=self.prefs))
            counts.append(k)
            path_r.append(rec.path)
            code_r.append(rec.code)
            ctx_r.append(ctx_json)
            warn_r.append(bool(rec.warn))
            seq_r.append(rec.seq)
            # recs sharing an ordering group collapse to the group's first
            # emission index so their errors interleave by item position
            # (joi's item-outer array loop)
            g = getattr(rec, "order", None)
            rec_r.append(rec_idx if g is None else group_first.setdefault(id(g), rec_idx))
            # true emission index: within one ordering group and item, joi
            # walks the item object's KEYS in topo order — the lift
            # preserves it as rec emission order (x's warn precedes y's
            # aborting error; fuzz seed 59130)
            sub_r.append(rec_idx)
            soft_r.append(bool(getattr(rec, "soft", False)))
            labort_r.append(int(getattr(rec, "local_abort", 0)))
            fin_r.append(bool(getattr(rec, "post_abort", False)))
            fi = getattr(rec, "fire_items", None)
            fitem_l.append(fi.astype(np.int64) if fi is not None else items.astype(np.int64))
        if not rows_l:
            empty = {name: pa.array([], type=t) for name, t in zip(VIOLATION_SCHEMA.names, VIOLATION_SCHEMA.types)}
            return pa.table(empty)
        rows_all = np.concatenate(rows_l)
        items_all = np.concatenate(item_l)
        id_arr = (
            ids.take(pa.array(rows_all)) if ids is not None else pa.nulls(len(rows_all), pa.string())
        )
        # expand the per-rec scalars into row position with ONE repeat
        # index per dtype family (Arrow take for strings, np.repeat for
        # numerics) — no per-rec Python list building
        reps = np.asarray(counts, dtype=np.int64)
        ridx = pa.array(np.repeat(np.arange(len(counts), dtype=np.int64), reps))
        total = int(reps.sum())
        msgs = np.empty(total, dtype=object)
        pos = 0
        for k, m in zip(counts, msg_r):
            if isinstance(m, str):
                msgs[pos:pos + k] = m
            else:
                msgs[pos:pos + k] = m
            pos += k
        sev_pair = pa.array(["error", "warn"])
        t = pa.table(
            {
                "doc_id": id_arr,
                "row": pa.array(rows_all, type=pa.int64()),
                "path": pa.array(path_r, type=pa.string()).take(ridx),
                "item_index": pa.array(items_all, type=pa.int32()),
                "code": pa.array(code_r, type=pa.string()).take(ridx),
                "message": pa.array(msgs, type=pa.string()),
                "context": pa.array(ctx_r, type=pa.string()).take(ridx),
                "severity": sev_pair.take(pa.array(np.repeat(
                    np.asarray(warn_r, dtype=np.int64), reps))),
                "_seq": pa.array(np.repeat(np.asarray(seq_r, dtype=np.int32), reps)),
                "_rec": pa.array(np.repeat(np.asarray(rec_r, dtype=np.int32), reps)),
                "_sub": pa.array(np.repeat(np.asarray(sub_r, dtype=np.int32), reps)),
                "_soft": pa.array(np.repeat(np.asarray(soft_r, dtype=bool), reps)),
                "_labort": pa.array(np.repeat(np.asarray(labort_r, dtype=np.int32), reps)),
                "_fitem": pa.array(np.concatenate(fitem_l) if fitem_l else [], type=pa.int64()),
                "_fin": pa.array(np.repeat(np.asarray(fin_r, dtype=bool), reps)),
            }
        )
        if self.prefs.get("abort_early", True):
            # joi returns at the FIRST aborting error of the whole
            # validate() call — per table row that is the earliest non-soft
            # error by (emission order, item index); soft errors and
            # warnings emitted BEFORE it ride along (array.js:286-292)
            t = _abort_early_filter(t)
        else:
            # schema-local abortEarly subtrees under a non-aborting call:
            # apply the same first-error-per-row filter SCOPED to each
            # tagged node's emissions (validator.js merges prefs per node)
            la = t["_labort"].to_numpy()
            gids = np.unique(la[la > 0])
            if len(gids):
                base_part = t.filter(pa.array(la == 0))
                parts = [base_part]
                for g in gids:
                    parts.append(_abort_early_filter(t.filter(pa.array(la == g))))
                t = pa.concat_tables(parts)
        # deterministic order (FIXTURES.md determinism rules): (row, path, seq, item)
        t = t.sort_by([("row", "ascending"), ("path", "ascending"), ("_seq", "ascending"), ("item_index", "ascending")])
        return t.drop_columns(["_seq", "_rec", "_sub", "_soft", "_labort", "_fitem", "_fin"])


def _abort_early_filter(t: pa.Table) -> pa.Table:
    """abortEarly keeps, per row, exactly what joi accumulates before it
    returns, walking errors in evaluation order (emission index, then item
    index):

    - a NON-SOFT error aborts immediately (kept, everything after drops);
    - a SOFT error (the inclusions-loop converted-sparse) does NOT abort
      its own node — later errors from the SAME ordering group ride along
      — but once the node returns, the PARENT key loop sees result.errors
      and aborts (object.js:125-128), so the first error from a DIFFERENT
      group after a soft one is never reached;
    - warnings ride along until the abort point."""
    if t.num_rows == 0:
        return t
    is_err_col = as_bool_np(pc.equal(t["severity"], "error"), t.num_rows)
    rows = t["row"].to_numpy()
    recs = t["_rec"].to_numpy().astype(np.int64)
    subs = t["_sub"].to_numpy().astype(np.int64)
    # ordering follows joi's walk at FIRE time (pre-splice indexes) when
    # the strip-splice bookkeeping re-pointed item_index for display
    items = (t["_fitem"].to_numpy().astype(np.int64)
             if "_fitem" in t.column_names
             else t["item_index"].to_numpy().astype(np.int64))
    soft = t["_soft"].to_numpy(zero_copy_only=False).astype(bool)
    # finalize pushes (any.default/any.failover throws) are part of their
    # key's error bundle (validator.js:359-364,:385 push into the node's
    # errors before it returns): they ABORT later keys like any error
    # (object.js:125-128 breaks on the bundle), and when the bundle's
    # FIRST error is a rule/base error the fin still rides along (same
    # node's finalize ran after it) — fuzz seeds 17100263 / 18000711
    fin = (t["_fin"].to_numpy(zero_copy_only=False).astype(bool)
           if "_fin" in t.column_names else np.zeros(t.num_rows, dtype=bool))
    is_err = is_err_col
    if not soft.any():
        # fast path (no converted-sparse in the batch — the common case):
        # vectorized first-error-per-row + preceding warnings
        hard_idx = np.nonzero(is_err)[0]
        if len(hard_idx) == 0:
            return t
        order = np.lexsort((subs[hard_idx], items[hard_idx], recs[hard_idx], rows[hard_idx]))
        sorted_rows = rows[hard_idx][order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = sorted_rows[1:] != sorted_rows[:-1]
        keep_err = hard_idx[order[first]]
        keep = np.zeros(t.num_rows, dtype=bool)
        keep[keep_err] = True
        warn_idx = np.nonzero(~is_err)[0]
        if len(warn_idx):
            first_rec = np.full(int(rows.max()) + 1, np.iinfo(np.int64).max, dtype=np.int64)
            first_item = np.full(int(rows.max()) + 1, np.iinfo(np.int64).max, dtype=np.int64)
            first_sub = np.full(int(rows.max()) + 1, np.iinfo(np.int64).max, dtype=np.int64)
            first_rec[rows[keep_err]] = recs[keep_err]
            first_item[rows[keep_err]] = items[keep_err]
            first_sub[rows[keep_err]] = subs[keep_err]
            w_rows = rows[warn_idx]
            before = (recs[warn_idx] < first_rec[w_rows]) | (
                (recs[warn_idx] == first_rec[w_rows]) & (
                    (items[warn_idx] < first_item[w_rows])
                    | ((items[warn_idx] == first_item[w_rows])
                       & (subs[warn_idx] < first_sub[w_rows]))
                )
            )
            keep[warn_idx[before]] = True
        if fin.any():
            # an unselected fin rides along iff its NODE ran: it survives
            # when the row's aborting error came from the fin's own
            # subtree (same path or deeper — the node's rules errored,
            # then ITS finalize pushed); an abort at a different key
            # means the fin's node never validated.  A root-level fin
            # (path "") always rides: the root's finalize runs after the
            # keys loop returns its bundle.
            paths_all = np.asarray(t["path"].to_pylist(), dtype=object)
            first_rec_i = np.full(int(rows.max()) + 1, -1, dtype=np.int64)
            first_rec_i[rows[keep_err]] = keep_err
            for i in np.nonzero(fin)[0]:
                if keep[i]:
                    continue  # selected as the row's first error
                j = int(first_rec_i[int(rows[i])])
                if j < 0:
                    keep[i] = True
                    continue
                kp, fp = str(paths_all[j]), str(paths_all[i])
                if kp == fp or kp.startswith(fp + ".") or fp == "":
                    keep[i] = True
        return t.filter(pa.array(keep))
    order = np.lexsort((subs, items, recs, rows))
    paths_all = np.asarray(t["path"].to_pylist(), dtype=object)
    keep = np.zeros(t.num_rows, dtype=bool)
    cur_row = None
    soft_group = None  # rec index of the group holding a pending abort
    soft_idx = None  # emission idx of the pending soft error
    aborted = False
    abort_at: dict[int, int] = {}  # row -> idx of the aborting emission
    for i in order:
        r = int(rows[i])
        if r != cur_row:
            cur_row, soft_group, soft_idx, aborted = r, None, None, False
        if aborted:
            continue  # unselected fins get the path-scoped pass below
        if not is_err[i]:  # warning
            keep[i] = True
            continue
        if fin[i]:
            # a fin reached before any abort: with a pending soft error it
            # rides iff it came from the soft error's own subtree (that
            # node's finalize); either way the bundle aborts later keys
            if soft_group is not None:
                sp, fp = str(paths_all[soft_idx]), str(paths_all[i])
                if sp == fp or sp.startswith(fp + ".") or fp == "":
                    keep[i] = True
                aborted = True
                abort_at.setdefault(r, int(soft_idx))
            else:
                keep[i] = True
                aborted = True
                abort_at.setdefault(r, int(i))
            continue
        if soft_group is not None and int(recs[i]) != soft_group:
            # the soft error's node returned; parent aborts — the abort
            # anchor is the SOFT error's node (its finalize ran), so fins
            # from that subtree still ride in the path-scoped pass
            aborted = True
            abort_at.setdefault(r, int(soft_idx))
            continue
        keep[i] = True
        if soft[i]:
            soft_group, soft_idx = int(recs[i]), int(i)
        else:
            aborted = True
            abort_at.setdefault(r, int(i))
    if fin.any():
        # same path-scoped ride-along as the fast path
        for i in np.nonzero(fin)[0]:
            if keep[i]:
                continue
            j = abort_at.get(int(rows[i]))
            if j is None:
                keep[i] = True
                continue
            kp, fp = str(paths_all[j]), str(paths_all[i])
            if kp == fp or kp.startswith(fp + ".") or fp == "":
                keep[i] = True
    return t.filter(pa.array(keep))


def compile_schema(schema: Schema | dict, prefs: dict | None = None, id_column: str | None = None) -> CompiledSchema:
    return CompiledSchema(schema, prefs, id_column)


class ValidationFailure(ValueError):
    def __init__(self, violations: pa.Table, message: str | None = None):
        self.violations = violations
        first = violations.to_pylist()[:3]
        prefix = f"{message} " if message else ""
        super().__init__(f"{prefix}{violations.num_rows} violation(s); first: {first}")


def assert_(tbl: pa.Table, schema: "Schema | dict", prefs: dict | None = None, id_column: str | None = None,
            message: str | None = None) -> None:
    """Validate-or-raise without returning the normalized table (the
    ``Joi.assert`` analog; ``message`` prefixes the raised error —
    lib/index.js:83-103)."""
    attempt(tbl, schema, prefs, id_column, message)


def attempt(tbl: pa.Table, schema: Schema | dict, prefs: dict | None = None, id_column: str | None = None,
            message: str | None = None) -> pa.Table:
    """Validate-or-raise convenience (the ``Joi.attempt`` analog,
    ``/root/reference/lib/index.js:54-59``): returns the normalized table or
    raises ``ValidationFailure`` carrying the violation rows."""
    res = compile_schema(schema, prefs, id_column).validate_table(tbl)
    errors = res.violations.filter(pc.equal(res.violations["severity"], "error"))
    if errors.num_rows:
        raise ValidationFailure(errors, message)
    return res.value
