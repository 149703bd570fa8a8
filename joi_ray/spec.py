"""Schema IR and fluent builder.

The IR is a plain-JSON "description" isomorphic to the reference's manifest
format (``/root/reference/lib/manifest.js:16-154`` — ``describe()`` emits
``{type, flags, rules[{name,args}], allow, invalid, keys, items, matches,
...}`` and ``Joi.build(desc)`` reconstructs the schema).  Our builder mirrors
joi's fluent immutable API (``/root/reference/lib/base.js:380-384`` — every
fluent call clones) but compiles to vectorized Arrow predicates instead of a
per-value recursive-descent interpreter.

Nothing in this module touches Ray; it is pure metadata manipulation and is
safe to pickle into map_batches closures / actor constructors.
"""

from __future__ import annotations

import copy
import json
from typing import Any


class Ref:
    """Cross-field reference (reference: ``/root/reference/lib/ref.js:16-72``).

    Joi's dot convention: ``"a"`` == ``"..a"`` resolves a sibling (ancestor
    1); ``".a"`` reaches the node's OWN child (ancestor 0, used in
    ``when('.a', ...)``); each extra leading dot climbs one more object
    level (``"...a"`` = grandparent).  Arrays are transparent scopes in this
    columnar model (an item's parent object is the nearest object level).
    ``Ref("$name")`` resolves ``prefs.context[name]``; ``Ref("/name")`` the
    table root.  Options (ref.js:80-105): ``ancestor=`` (int, exclusive
    with a dot prefix), ``separator=`` (single char, ``False`` = literal
    key), ``map=`` (list of [from, to] pairs applied to the resolved
    value), ``adjust=`` (callable; rides the in-memory describe() manifest
    like the reference's ref.js:195-199 — to_json drops it the way
    JSON.stringify drops function values).
    """

    __slots__ = ("path", "kind", "level", "separator", "map", "adjust")

    def __init__(self, path: str, *, ancestor: int | None = None,
                 separator=".", map=None, adjust=None):
        if map is not None and adjust is not None:
            raise ValueError("Cannot set both map and adjust options (ref.js:94)")
        self.separator = separator
        self.map = [list(p) for p in map] if map is not None else None
        self.adjust = adjust
        sep = separator if isinstance(separator, str) and separator else "."
        if path.startswith("$"):
            self.kind = "context"
            self.level = None
            self.path = path[1:]
            return
        if path.startswith("#"):
            # local refs resolve the error-render local bindings; in RULE
            # ARG position joi resolves undefined -> per-row any.ref with
            # display 'ref:local:key' (ref.js:74-78, node-verified)
            self.kind = "local"
            self.level = None
            self.path = path[1:]
            return
        if path.startswith("/"):
            if ancestor is not None:
                raise ValueError("Cannot combine prefix with ancestor option (ref.js:53)")
            self.kind = "root"
            self.level = None
            self.path = path[1:]
            return
        self.kind = "ancestor"
        k = 0
        while k < len(path) and path[k] == sep:
            k += 1
        if ancestor is not None:
            if k:
                raise ValueError("Cannot combine prefix with ancestor option (ref.js:53)")
            self.level = int(ancestor)
        else:
            self.level = (k - 1) if k else 1
        self.path = path[k:]

    @property
    def parts(self) -> list[str]:
        if self.separator is False or self.separator == "" or not self.path:
            return [self.path] if self.path else []
        return self.path.split(self.separator)

    @property
    def display(self) -> str:
        """joi's ref display string (ref.js:204-233 updateDisplay) — the
        form any.ref messages embed ('ref:global:lim', 'ref:..x')."""
        sep = self.separator if isinstance(self.separator, str) and self.separator else None
        if self.kind == "context":
            return f"ref:global:{self.path}"
        if self.kind == "local":
            return f"ref:local:{self.path}"
        if self.kind == "root":
            return f"ref:root:{self.path}"
        if sep is None:
            return f"ref:{self.path}"
        if self.level == 0:
            return f"ref:{sep}{self.path}"
        if self.level == 1:
            return f"ref:{self.path}"
        return f"ref:{sep * (self.level + 1)}{self.path or ''}"

    def describe(self) -> dict:
        sep = self.separator if isinstance(self.separator, str) and self.separator else "."
        if self.kind == "context":
            r = "$" + self.path
        elif self.kind == "local":
            r = "#" + self.path
        elif self.kind == "root":
            r = "/" + self.path
        elif self.level == 1:
            r = self.path
        else:
            r = sep * (self.level + 1) + self.path
        d: dict = {"ref": r}
        if self.separator != ".":
            d["separator"] = self.separator
        if self.map is not None:
            d["map"] = [list(p) for p in self.map]
        if self.adjust is not None:
            # live callable in the in-memory manifest, like ref.js:195-199
            # (to_json drops it the way JSON.stringify drops functions)
            d["adjust"] = self.adjust
        return d

    def __repr__(self):  # pragma: no cover
        return f"Ref({self.describe()['ref']!r})"

    def __eq__(self, other):
        return (isinstance(other, Ref) and other.kind == self.kind
                and other.path == self.path and other.level == self.level
                and other.separator == self.separator and other.map == self.map
                and other.adjust == self.adjust)

    def __hash__(self):
        return hash((self.kind, self.path, self.level))


def ref(path: str, **opts) -> Ref:
    return Ref(path, **opts)


def _drop_callables(o: Any) -> Any:
    """JSON.stringify parity for manifests: function-valued dict entries
    vanish (used by ``to_json`` on alteration adjusters)."""
    if isinstance(o, dict):
        return {k: _drop_callables(v) for k, v in o.items() if not callable(v)}
    if isinstance(o, list):
        return [_drop_callables(v) for v in o]
    return o


def _encode(v: Any) -> Any:
    """JSON-encode rule args: Refs and bytes get marker wrappers."""
    if isinstance(v, Ref):
        return v.describe()
    from .kernels.template import Template as _Template

    if isinstance(v, _Template):
        # joi's template describe form (template.js:104-112)
        return {"template": v.source}
    if isinstance(v, bytes):
        import base64

        return {"__bytes__": base64.b64encode(v).decode()}
    if isinstance(v, Schema):
        return {"__schema__": v.describe()}
    if isinstance(v, dict):
        return {k: _encode(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)):
        return [_encode(x) for x in v]
    return v


def _decode(v: Any) -> Any:
    if isinstance(v, dict):
        if "ref" in v and set(v) <= {"ref", "separator", "map", "adjust"}:
            return Ref(v["ref"], separator=v.get("separator", "."),
                       map=v.get("map"), adjust=v.get("adjust"))
        if set(v) == {"__bytes__"}:
            import base64

            return base64.b64decode(v["__bytes__"])
        if set(v) == {"__schema__"}:
            return build(v["__schema__"])
        if set(v) <= {"template", "options"} and "template" in v:
            from .kernels.template import compile_template

            return compile_template(v["template"])
        return {k: _decode(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_decode(x) for x in v]
    return v


def _value_key(v):
    """SameValueZero identity key for joi's Values container.  JS has ONE
    number type: 10 and 10.0 are the same valid — but true must stay distinct
    from 1 (Python's True == 1 would collapse them)."""
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, (int, float)):
        return ("num", float(v))
    return (type(v).__name__, v)


def _regex_source(regex):
    """Accept a compiled ``re.Pattern`` the way joi accepts a RegExp object,
    PRESERVING its flags: re.compile('abc', re.I) must behave like /abc/i,
    not like a case-sensitive /abc/.  Flags translate to an inline group
    (``(?i)abc``) understood by both Python ``re`` and Arrow's RE2.
    Unsupported-by-RE2 flags (re.VERBOSE) raise instead of silently
    changing semantics."""
    import re as _re

    if not isinstance(regex, _re.Pattern):
        return regex
    if regex.flags & _re.VERBOSE:
        raise ValueError("re.VERBOSE patterns are not supported; inline the whitespace")
    inline = "".join(
        ch
        for flag, ch in ((_re.IGNORECASE, "i"), (_re.MULTILINE, "m"), (_re.DOTALL, "s"))
        if regex.flags & flag
    )
    # re.UNICODE is implied for str patterns in Python 3 — not a JS flag
    return f"(?{inline}){regex.pattern}" if inline else regex.pattern


def _dedup_values(existing: list, new_values) -> list:
    """joi's Values container is a SET (lib/values.js add skips an already-
    present entry): re-adding a value is a no-op, so valid(-1, -1) keeps one
    -1.  JS SameValueZero typing: true !== 1, so bools never collapse into
    numbers (Python's True == 1 would)."""

    key = _value_key

    seen = set()
    for v in existing:
        try:
            seen.add(key(v))
        except TypeError:
            pass  # unhashable (dict/list/schema): always appended
    out = []
    for v in new_values:
        try:
            k = key(v)
        except TypeError:
            out.append(v)
            continue
        if k not in seen:
            seen.add(k)
            out.append(v)
    return out


class Schema:
    """Immutable schema node.  Every fluent method returns a clone.

    Internal shape mirrors joi's Base (``/root/reference/lib/base.js:21-51``):
    ``type``, ``flags`` (presence/default/label/only/...), ``rules`` (ordered
    list of {name, args, keep, message, warn}), ``allow``/``invalid`` value
    sets, and per-type ``terms`` (object keys, array items, alternatives
    matches, boolean truthy/falsy, ...).
    """

    def __init__(self, type_: str):
        self.type = type_
        self.flags: dict[str, Any] = {}
        self.rules: list[dict] = []
        self.allow_vals: list[Any] = []
        self.invalid_vals: list[Any] = []
        self.terms: dict[str, Any] = {}
        self.prefs: dict[str, Any] = {}
        self.metas: dict[str, Any] = {}

    # -- cloning ----------------------------------------------------------
    def _clone(self) -> "Schema":
        s = self.__class__.__new__(self.__class__)
        s.type = self.type
        s.flags = dict(self.flags)
        s.rules = [dict(r) for r in self.rules]
        s.allow_vals = list(self.allow_vals)
        s.invalid_vals = list(self.invalid_vals)
        s.terms = copy.deepcopy(self.terms)
        s.prefs = dict(self.prefs)
        s.metas = dict(self.metas)
        return s

    def _flag(self, name: str, value: Any) -> "Schema":
        s = self._clone()
        if value is None:
            s.flags.pop(name, None)
        else:
            s.flags[name] = value
        # $_setFlag CLOSES any ruleset (lib/base.js:812): a rule()/message()
        # after a flag-setter must raise 'Cannot apply rules to empty
        # ruleset' (node-verified: string().min(1).required().message(..))
        s.metas["_ruleset_start"] = False
        return s

    def _rule(self, name: str, args: dict | None = None, *, single: bool = False) -> "Schema":
        if self.terms.get("whens"):
            # joi's when() returns a fresh ALTERNATIVES wrapper
            # (base.js:364) — type-specific rule methods don't exist on it
            # (`...when(...).min(2)` is a TypeError in the reference), so a
            # post-when rule call is a build error, never branch semantics
            raise TypeError(
                f"{self.type}(...).when(...).{name} is not a function — "
                "when() returns an alternatives wrapper (lib/base.js:364); "
                "set rules BEFORE the when() or inside its branches")
        s = self._clone()
        if single:
            # a duplicate single rule with DEEP-EQUAL options is a NO-OP —
            # the original keeps its chain position (base.js:617-621
            # returns `this`; fuzz seed 46000268: min(2)...min(2) under
            # abortEarly errors number.min first, not a later rule)
            prev = next((r for r in s.rules if r["name"] == name), None)
            if prev is not None:
                # v16 artifact: the FIRST call's stored options lose their
                # undefined args (base.js:630-634 `delete args[key]`
                # mutates the stored object) while the re-add's options
                # still carry them, so rules with an undefined optional
                # arg (string min/max/length's `encoding`) NEVER compare
                # deep-equal and always remove+re-push (node-verified:
                # string min(2)...min(2) moves last; number min(2) stays)
                try:
                    if (prev.get("args", {}) == (args or {})
                            and not any(v is None for v in (args or {}).values())):
                        return self
                except Exception:  # noqa: BLE001 — exotic arg __eq__
                    pass
                # different options: remove + re-push at the end
                # (base.js:661-663 _ruleRemove then push)
                s.rules = [r for r in s.rules if r["name"] != name]
        s.rules.append({"name": name, "args": args or {}})
        # adding a rule RE-OPENS last-rule mode after a closed ruleset
        # (lib/base.js:666-667): min(1).message('a').max(2).message('b') ok
        if s.metas.get("_ruleset_start") is False:
            s.metas.pop("_ruleset_start")
        return s

    # -- any: presence & value sets ---------------------------------------
    def required(self) -> "Schema":
        return self._flag("presence", "required")

    def optional(self) -> "Schema":
        return self._flag("presence", "optional")

    def forbidden(self) -> "Schema":
        return self._flag("presence", "forbidden")

    def presence(self, mode: str) -> "Schema":
        assert mode in ("required", "optional", "forbidden")
        return self._flag("presence", mode)

    exist = required

    @staticmethod
    def _values_remove(kept: list, value) -> list:
        """SameValueZero removal of one value (reference Values.remove)."""
        try:
            k = _value_key(value)
        except TypeError:
            return kept  # unhashable: identity-keyed, clones never match
        out = []
        for v in kept:
            try:
                if _value_key(v) == k:
                    continue
            except TypeError:
                pass
            out.append(v)
        return out

    def allow(self, *values) -> "Schema":
        s = self._clone()
        # an allowed value LEAVES the invalids set at registration time
        # (base.js:73-80): invalid('x').valid('x') accepts 'x'
        for v in values:
            if s.invalid_vals:
                s.invalid_vals = self._values_remove(s.invalid_vals, v)
        s.allow_vals.extend(_dedup_values(s.allow_vals, values))
        return s

    def valid(self, *values) -> "Schema":
        s = self.allow(*values)
        s.flags["only"] = True
        return s

    equal = valid

    def invalid(self, *values) -> "Schema":
        s = self._clone()
        # an invalid value LEAVES the valids set (base.js:188-196) — and
        # emptying a previous valid() set under only REJECTS EVERYTHING,
        # which the reference asserts at build time (fuzz seed 15100014
        # via the post-when valids dimension)
        for v in values:
            if s.allow_vals:
                s.allow_vals = self._values_remove(s.allow_vals, v)
                if not s.allow_vals and s.flags.get("only"):
                    raise ValueError(
                        f"Setting invalid value {v!r} leaves schema rejecting "
                        "all values due to previous valid rule "
                        "(lib/base.js:194)")
        s.invalid_vals.extend(_dedup_values(s.invalid_vals, values))
        return s

    disallow = invalid
    deny = invalid
    not_ = invalid

    def only(self, enabled: bool = True) -> "Schema":
        return self._flag("only", True if enabled else None)

    def insensitive(self, enabled: bool = True) -> "Schema":
        """Case-insensitive valids/truthy/falsy matching.  Booleans default
        to insensitive; ``insensitive(False)`` forces strict comparison
        (``lib/types/boolean.js:65-97``)."""
        return self._flag("insensitive", enabled)

    # -- any: value shaping ------------------------------------------------
    _DEEP_DEFAULT = "__deep_default__"

    def default(self, value=...) -> "Schema":
        if value is ...:
            # default() with no value = deep default: a missing object is
            # created empty and child defaults fill it (lib/validator.js
            # deepDefault; test/base.js:1064-1086 — non-object throws)
            if self.type != "object":
                raise ValueError(
                    "deep default() requires an object schema (test/base.js:1082-1086)")
            return self._flag("default", Schema._DEEP_DEFAULT)
        return self._flag("default", value)

    def failover(self, value) -> "Schema":
        return self._flag("failover", value)

    def empty(self, *values) -> "Schema":
        # empty() with no args RESETS the flag (test/base.js:1229-1271)
        s = self._clone()
        if not values:
            s.flags.pop("empty", None)
        else:
            s.flags["empty"] = list(values)
        return s

    def strip(self, enabled: bool = True) -> "Schema":
        # strip/raw share joi's single _flags.result slot (base.js:292-295,
        # :760-763: $_setFlag('result', 'strip'|'raw'|undefined)) — setting
        # one clears the other; disabling clears the slot entirely
        s = self._flag("raw", None)
        return s._flag("strip", True if enabled else None)

    def raw(self, enabled: bool = True) -> "Schema":
        s = self._flag("strip", None)
        return s._flag("raw", True if enabled else None)

    # per-type cast targets (lib/types/*.js `cast:` blocks; lib/base.js:107
    # asserts 'Type <t> does not support casting to <to>')
    _CAST_TARGETS = {
        "array": {"set"},
        "binary": {"string"},
        "boolean": {"number", "string"},
        "date": {"number", "string"},
        "number": {"string"},
        "object": {"map"},
    }

    def cast(self, to) -> "Schema":
        if to is False:
            return self._flag("cast", None)
        # a when-bearing schema IS an alternatives wrapper, which has no
        # cast defs — the reference asserts 'Type alternatives does not
        # support casting' (base.js:104-108, node-verified)
        eff_type = "alternatives" if self.terms.get("whens") else self.type
        if to not in self._CAST_TARGETS.get(eff_type, ()):
            raise ValueError(f"Type {eff_type} does not support casting to {to}")
        return self._flag("cast", to)

    def label(self, name: str) -> "Schema":
        s = self._flag("label", name)
        # a label set AFTER when() lands on joi's alternatives WRAPPER
        # (base.js:364) and renders in its finalize errors again
        s.metas.pop("_label_pre_when", None)
        # alternatives' label() override pushes the name into EVERY match
        # branch, replacing their own labels (alternatives.js:121-142) —
        # and a when-bearing schema IS that wrapper, so its whens branches
        # relabel the same way (fuzz seed 23000401, node-verified: a
        # post-when label wins over the then-branch's own label)
        def _lab(v):
            return v.label(name) if isinstance(v, Schema) else v

        if s.terms.get("matches"):
            new = []
            for m in s.terms["matches"]:
                if isinstance(m, Schema):
                    new.append(m.label(name))
                elif isinstance(m, dict):
                    m = dict(m)
                    for k in ("schema", "then", "otherwise"):
                        if m.get(k) is not None:
                            m[k] = _lab(m[k])
                    new.append(m)
                else:
                    new.append(m)
            s.terms["matches"] = new
        if s.terms.get("whens"):
            new = []
            for w in s.terms["whens"]:
                w = dict(w)
                for k in ("then", "otherwise"):
                    if w.get(k) is not None:
                        w[k] = _lab(w[k])
                if "switch" in w:
                    w["switch"] = [
                        {**c, **{k: _lab(c[k]) for k in ("then", "otherwise")
                                 if c.get(k) is not None}}
                        for c in w["switch"]
                    ]
                new.append(w)
            s.terms["whens"] = new
        return s

    def strict(self, enabled: bool = True) -> "Schema":
        s = self._clone()
        s.prefs["convert"] = not enabled
        return s

    def preferences(self, **opts) -> "Schema":
        """Schema-local prefs, merged over the call prefs at eval
        (``lib/base.js:246-256``).  context/externals/warnings cannot be
        set per schema — the reference asserts the same."""
        for k in ("context", "externals", "warnings"):
            if k in opts:
                raise ValueError(f"Cannot override {k} (lib/base.js:248-250)")
        s = self._clone()
        s.prefs.update(opts)
        return s

    prefs_ = preferences
    options = preferences

    def description(self, text: str) -> "Schema":
        s = self._clone()
        s.metas["description"] = text
        return s

    def meta(self, **kv) -> "Schema":
        s = self._clone()
        s.metas.update(kv)
        return s

    # metadata-only modifiers (lib/base.js:117-232) — carried in metas,
    # no runtime effect, preserved through describe()/build()
    def example(self, value) -> "Schema":
        s = self._clone()
        s.metas.setdefault("examples", []).append(value)
        return s

    def note(self, *texts: str) -> "Schema":
        s = self._clone()
        s.metas.setdefault("notes", []).extend(texts)
        return s

    def tag(self, *tags: str) -> "Schema":
        s = self._clone()
        s.metas.setdefault("tags", []).extend(tags)
        return s

    def unit(self, name: str) -> "Schema":
        s = self._clone()
        s.metas["unit"] = name
        return s

    def result(self, mode: str) -> "Schema":
        """'raw' | 'strip' — alias for raw()/strip() (lib/base.js:292-295)."""
        if mode == "raw":
            return self.raw()
        if mode == "strip":
            return self.strip()
        raise ValueError("result mode must be 'raw' or 'strip'")

    def cache(self, _cache=None) -> "Schema":
        """No-op by design: the reference's per-value LRU (lib/cache.js) is
        replaced by vectorization (SURVEY.md §2.1 cache row); kept for API
        parity."""
        return self._clone()

    # -- rule tail modifiers (lib/base.js:513-549) -------------------------
    def message(self, template: str) -> "Schema":
        """Custom message for the current ruleset (``lib/base.js:508-511``:
        ``message(m)`` IS ``rule({message})`` — same empty-ruleset assert,
        same multi-rule application inside an open ``$`` group)."""
        return self.rule(message=template)

    def error(self, err) -> "Schema":
        """Node-level error override (``/root/reference/lib/base.js:136-142``,
        applied ``lib/validator.js:368-380``).

        - string: a message template rendered for every violation this node
          emits (full ``kernels.template`` expression syntax — ``{#label}``,
          ``{#limit + 1}``, ``if(...)``); serializes through describe/build.
        - callable ``fn(code, path, context) -> str | None``: the vectorized
          re-expression of joi's ``error(fn)`` — invoked once per error
          family (not per row), returning a replacement message or ``None``
          to keep the default.  In-memory only: callables cannot ship
          through the JSON spec (the reference manifest cannot express them
          either), so describe() drops them.
        """
        s = self._clone()
        if callable(err):
            s.metas["error_fn"] = err
        elif isinstance(err, str):
            s.flags["error"] = err
        else:
            raise TypeError("error() takes a message template string or a callable")
        return s

    def warn(self) -> "Schema":
        """Route the current ruleset's failures to warnings, not errors
        (``/root/reference/lib/base.js:583-586``: ``warn()`` IS
        ``rule({warn:true})`` — bare/doubled calls raise the empty-ruleset
        assert; ``lib/validator.js:303-306`` routes them)."""
        return self.rule(warn=True)

    # ruleset / $ / rule() group tagging (lib/base.js:513-549): mark a start
    # point, then apply options to every rule added since
    @property
    def ruleset(self) -> "Schema":
        rs = self.metas.get("_ruleset_start")
        if rs is not False and isinstance(rs, int):
            raise ValueError("Cannot start a new ruleset without closing the previous one")
        s = self._clone()
        s.metas["_ruleset_start"] = len(s.rules)
        return s

    dollar = ruleset

    def rule(self, *, message: str | None = None, warn: bool = False, keep: bool = False) -> "Schema":
        # _ruleset_start tri-state mirrors lib/base.js:41 _ruleset —
        # missing: apply to the last rule; False: CLOSED (a prior
        # rule()/message()/warn() or flag-setter consumed it — raise);
        # int: open $ group start
        rs = self.metas.get("_ruleset_start")
        if rs is False:
            raise ValueError("Cannot apply rules to empty ruleset")
        start = rs if isinstance(rs, int) else len(self.rules) - 1
        if not (0 <= start < len(self.rules)):
            raise ValueError("Cannot apply rules to empty ruleset")
        s = self._clone()
        s.metas["_ruleset_start"] = False
        for r in s.rules[start:]:
            if message is not None:
                r["message"] = message
            if warn:
                r["warn"] = True
            if keep:
                r["keep"] = True
        return s

    def warning(self, code: str, context: dict | None = None) -> "Schema":
        """Unconditional warning rule (``/root/reference/lib/types/any.js:17-32``)."""
        return self._rule("warning", {"code": code, "context": context or {}})

    def external(self, fn_path: str) -> "Schema":
        """Per-batch user hook (the ``validateAsync`` external analog,
        ``/root/reference/lib/base.js:152-157``): ``fn_path`` is an
        importable "module:callable" applied to the coerced column."""
        return self._rule("external", {"fn": fn_path})

    def rule_(self, name: str, **args) -> "Schema":
        """Attach a custom rule registered via ``joi_ray.extend.register_rule``."""
        return self._rule(name, args)

    # -- conditionals ------------------------------------------------------
    def when(self, condition, *, is_=None, then=None, otherwise=None, switch=None) -> "Schema":
        """Conditional schema (``/root/reference/lib/base.js:319-365``).

        ``condition`` is a Ref/column name — per row, if ``is_`` matches the
        referenced value then ``then`` applies, else ``otherwise`` — or a
        SCHEMA, evaluated against this node's own value (the reference's
        ``peek`` form, ``lib/types/alternatives.js:192``; ``is_``/``switch``
        are not allowed with a schema condition).
        ``switch`` is a list of {"is": ..., "then": ...} entries.
        """
        s = self._clone()
        # v16: when() on a non-alternatives base rewrites into alternatives
        # and fills the missing branch with the base (base.js:356-363), so
        # the match has BOTH then and otherwise -> _endedSwitch -> a second
        # when() throws 'Unreachable condition' (alternatives.js:174).
        # Multi-when schemas therefore only arise via concat (see concat's
        # dead-matches note below) or manifest build.
        prior = s.terms.get("whens")
        if prior and self._when_ended(prior[-1]):
            raise ValueError(
                "Unreachable condition (lib/types/alternatives.js:174 — the "
                "previous when() already covers every value)")
        _b = lambda v: v if v is None or isinstance(v, Schema) else compile_literal(v)
        then, otherwise = _b(then), _b(otherwise)
        if isinstance(condition, Schema):
            if is_ is not None or switch is not None:
                raise ValueError('"is_"/"switch" cannot be used with a schema condition'
                                 " (lib/types/alternatives.js:180-182)")
            entry: dict[str, Any] = {"peek": condition}
            if then is not None:
                entry["then"] = then
            if otherwise is not None:
                entry["otherwise"] = otherwise
            s.terms.setdefault("whens", []).append(entry)
            if "label" in s.flags:
                # joi's when() on a non-alternatives base returns a FRESH
                # unlabeled alternatives wrapper (base.js:364) — the
                # pre-when label lives in the BRANCHES, so the wrapper's
                # own finalize errors (any.default/any.failover) render
                # the key name (fuzz seed 277, node-verified)
                s.metas["_label_pre_when"] = True
            # pre-when default/failover snapshot: these flags belong to the
            # BRANCHES (base.concat); anything (re)set AFTER the when lands
            # on the wrapper and applies in ITS finalize over the merged
            # branch result (fuzz seed 1028, node-verified)
            entry["base_flags"] = {
                k: self.flags[k] for k in ("default", "failover", "only") if k in self.flags
            }
            # pre-when valids/invalids snapshot: joi's fresh wrapper starts
            # with EMPTY sets (base.js:364) — values added after the when
            # live on the WRAPPER, whose own valids stage runs BEFORE the
            # branch dispatch (fuzz seed 54000083, node-verified)
            entry["base_allow"] = list(self.allow_vals)
            entry["base_invalid"] = list(self.invalid_vals)
            return s
        cond = condition if isinstance(condition, Ref) else Ref(condition)
        entry = {"ref": cond}
        if switch is not None:
            entry["switch"] = [
                {"is": c["is"], "then": _b(c["then"]),
                 **({"otherwise": _b(c["otherwise"])} if "otherwise" in c else {})}
                for c in switch
            ]
            if otherwise is not None:
                # top-level otherwise with switch = joi's alt.otherwise
                # (base.js:345-353; asserts it's not ALSO inside the
                # last case — alternatives.js:238-240)
                if "otherwise" in entry["switch"][-1]:
                    raise ValueError(
                        'Cannot specify "otherwise" inside and outside a '
                        '"switch" (lib/types/alternatives.js:238)'
                    )
                entry["otherwise"] = otherwise
        else:
            entry["is"] = is_
            if then is not None:
                entry["then"] = then
            if otherwise is not None:
                entry["otherwise"] = otherwise
        s.terms.setdefault("whens", []).append(entry)
        if "label" in s.flags:
            # see the peek-form note above: the wrapper is unlabeled
            s.metas["_label_pre_when"] = True
        # see the peek-form note: pre-when default/failover are branch-level
        entry["base_flags"] = {
            k: self.flags[k] for k in ("default", "failover", "only") if k in self.flags
        }
        # see the peek-form note: pre-when valids/invalids are branch-level
        entry["base_allow"] = list(self.allow_vals)
        entry["base_invalid"] = list(self.invalid_vals)
        return s

    def _when_ended(self, entry: dict) -> bool:
        """Does this when entry resolve every value (joi's _endedSwitch)?
        A base-level when always does — base.js fills the missing branch
        (incl. a switch's last otherwise) with the base schema itself."""
        if self.type != "alternatives":
            return True
        if "switch" in entry:
            return "otherwise" in entry or "otherwise" in entry["switch"][-1]
        return entry.get("then") is not None and entry.get("otherwise") is not None

    # -- concat (lib/base.js:386-481) --------------------------------------
    def concat(self, other: "Schema") -> "Schema":
        if other.type not in ("any", self.type) and self.type != "any":
            raise ValueError(f"cannot concat {other.type} onto {self.type}")
        # v16: a when()-bearing schema IS an alternatives under the hood
        # (base.js:319-366 rewrite), so concat's same-type assert sees
        # 'alternatives' — concat between a when-bearing and a plain schema
        # of the nominal type throws in the reference
        # (base.js:389 'Cannot merge type alternatives with another type').
        self_whens = bool(self.terms.get("whens"))
        other_whens = bool(other.terms.get("whens"))
        if self_whens != other_whens and "any" not in (self.type, other.type):
            have, lack = ("alternatives", other.type) if self_whens else (self.type, "alternatives")
            raise ValueError(
                f"Cannot merge type {have} with another type: {lack} "
                "(a when()-bearing schema is an alternatives — lib/base.js:364)")
        if self_whens and other_whens:
            # alternatives.concat(alternatives): the source's matches append
            # AFTER the target's — but the target's first match embeds the
            # base in BOTH branches (base.js:356-363), so it resolves every
            # value and the appended matches are UNREACHABLE
            # (alternatives.js:47-57 returns at the first resolving entry;
            # node-verified, fuzz seed 14000003: the concat'd when's valid()
            # never fires in the reference).  The source's rules/valids live
            # inside its dead branches, so the merge contributes nothing
            # observable — return the target unchanged.
            return self._clone()
        s = self._clone()
        if s.type == "any":
            s.type = other.type
        # strip/raw are ONE joi flag slot (_flags.result): a source setting
        # either replaces the target's — a when-branch raw() overrides the
        # base's strip() (fuzz seed 4100748, node-verified)
        if "strip" in other.flags or "raw" in other.flags:
            s.flags.pop("strip", None)
            s.flags.pop("raw", None)
        s.flags.update(other.flags)
        # single (non-multi) rules from the source REPLACE the target's
        # (lib/base.js:415-421: concat removes unique rules present in the
        # source); multi rules accumulate
        _MULTI_RULES = {"pattern", "replace", "multiple", "warning", "assert", "has", "external"}
        incoming = copy.deepcopy(other.rules)
        incoming_singles = {r["name"] for r in incoming if r["name"] not in _MULTI_RULES}
        s.rules = [r for r in s.rules if r["name"] not in incoming_singles]
        s.rules.extend(incoming)
        # valids/invalids merge with cross-removal (lib/base.js:410-411 via
        # Values.merge: source invalids leave the valid set and vice versa).
        # Removal is SameValueZero-keyed like _dedup_values — Values.remove
        # is deep-strict (true !== 1), so plain Python `in` (True == 1)
        # would wrongly drop True when removing 1.
        def _keyed_remove(kept: list, removals: list) -> list:
            rm = set()
            for v in removals:
                try:
                    rm.add(_value_key(v))
                except TypeError:
                    pass  # unhashable removals never match (parity: reference
                    # Values.remove uses identity for objects)
            out = []
            for v in kept:
                try:
                    if _value_key(v) in rm:
                        continue
                except TypeError:
                    pass
                out.append(v)
            return out

        kept_allow = _keyed_remove(s.allow_vals, other.invalid_vals)
        s.allow_vals = kept_allow + _dedup_values(kept_allow, other.allow_vals)
        kept_invalid = _keyed_remove(s.invalid_vals, other.allow_vals)
        s.invalid_vals = kept_invalid + _dedup_values(kept_invalid, other.invalid_vals)
        s.prefs.update(other.prefs)
        for k, v in other.terms.items():
            if k == "keys" and "keys" in s.terms:
                # same-named keys CONCAT (object.js:1110-1133 Keys.concat:
                # result[pos].schema.concat(item.schema), target position
                # kept); new keys append — a plain dict update would DROP
                # the target key's rules (fuzz seed 21100015, node-verified:
                # {q: length(2)}.concat({q: raw()}) keeps the length rule)
                for kk, vv in v.items():
                    cur = s.terms["keys"].get(kk)
                    if cur is not None:
                        s.terms["keys"][kk] = cur.concat(vv)
                    else:
                        s.terms["keys"][kk] = copy.deepcopy(vv)
            elif isinstance(v, list) and isinstance(s.terms.get(k), list):
                s.terms[k] = s.terms[k] + copy.deepcopy(v)
            else:
                s.terms[k] = copy.deepcopy(v)
        return s

    # -- modify API (lib/modify.js:12-142) --------------------------------
    def id_(self, name: str) -> "Schema":
        return self._flag("id", name)

    def id(self, name: str) -> "Schema":
        """Set the schema's modify id (``lib/modify.js`` Ids; overriding an
        existing id or a non-string throws — test/modify.js:576-592)."""
        if not name or not isinstance(name, str):
            raise ValueError("id must be a non-empty string")
        if "id" in self.flags:
            raise ValueError(f"Cannot override schema id {self.flags['id']}")
        return self._flag("id", name)

    def _resolve_child(self, seg: str):
        """Find a direct child by modify id: object keys match their key
        name or an explicit id flag; array items/ordered and alternatives
        branches match by explicit id only (lib/modify.js Ids.Store)."""
        for k, v in self.terms.get("keys", {}).items():
            if v.flags.get("id", k) == seg:
                return ("keys", k, v)
        for term in ("items", "ordered", "matches"):
            for i, v in enumerate(self.terms.get(term, [])):
                if isinstance(v, Schema):
                    if v.flags.get("id") == seg:
                        return (term, i, v)
                elif isinstance(v, dict):  # conditional alternatives entry
                    for branch in ("then", "otherwise", "peek"):
                        b = v.get(branch)
                        if isinstance(b, Schema) and b.flags.get("id") == seg:
                            return (term, (i, branch), b)
        return None

    def extract(self, path: str) -> "Schema":
        """Reach a subschema by dotted id path (``lib/base.js:488-506``;
        ids default to object key names, arrays/alternatives need explicit
        ``id()`` — test/modify.js:19-101)."""
        node = self
        for part in path.split("."):
            hit = node._resolve_child(part)
            if hit is None:
                raise KeyError(f"no subschema at {path!r} (missing {part!r})")
            node = hit[2]
        return node

    def fork(self, paths, adjuster) -> "Schema":
        """Return a clone with the subschemas at ``paths`` rewritten by
        ``adjuster(schema) -> schema`` (``lib/modify.js:12-142``); paths
        traverse object keys, array items/ordered and alternatives branches
        via the same id resolution as ``extract``."""
        if isinstance(paths, str):
            paths = [paths]
        s = self._clone()
        for path in paths:
            parts = path.split(".")

            def rewrite(node: "Schema", parts: list[str]) -> "Schema":
                if not parts:
                    return adjuster(node)
                hit = node._resolve_child(parts[0])
                if hit is None:
                    raise KeyError(f"no subschema at {path!r}")
                term, where, child = hit
                n = node._clone()
                if term == "keys":
                    keys = dict(n.terms.get("keys", {}))
                    newv = rewrite(keys[where], parts[1:])
                    if len(parts) == 1:
                        # joi re-appends the adjusted key via keys()
                        # (modify.js -> object.js keys clone), moving it to
                        # the END of key order — observable through
                        # abortEarly's first error and error ordering
                        # (node-verified, fuzz seed 14000059); intermediate
                        # path keys keep their position
                        keys.pop(where)
                    keys[where] = newv
                    n.terms["keys"] = keys
                else:
                    entries = list(n.terms.get(term, []))
                    if isinstance(where, tuple):
                        i, branch = where
                        entry = dict(entries[i])
                        entry[branch] = rewrite(entry[branch], parts[1:])
                        entries[i] = entry
                    else:
                        entries[where] = rewrite(entries[where], parts[1:])
                    n.terms[term] = entries
                return n

            s = rewrite(s, parts)
        return s

    def alter(self, targets: dict) -> "Schema":
        """Register named variants (``lib/base.js:88-103``): ``targets`` maps
        name -> adjuster fn, applied on demand by ``tailor``.  Entries append
        in registration order — duplicate targets are allowed and tailor
        applies every match sequentially (base.js:94-98 pushes
        ``{target, adjuster}`` per entry)."""
        if not isinstance(targets, dict):
            raise ValueError("Invalid targets argument (lib/base.js:90)")
        s = self._clone()
        entries = list(s.metas.get("alterations", []))
        for target, adjuster in targets.items():
            if not callable(adjuster):
                raise ValueError(
                    f"Alteration adjuster for {target} must be a function (lib/base.js:97)")
            entries.append({"target": target, "adjuster": adjuster})
        s.metas["alterations"] = entries
        return s

    def tailor(self, targets) -> "Schema":
        """Apply the named alteration(s) (``lib/base.js:551-571``): accepts a
        single target name or a list; the node's own matching adjusters run
        in registration order, then recursion mirrors the reference's
        per-type overrides — object keys / patterns / assert-rule schemas
        (``object.js:478-509``) and alternatives matches' schema/peek/is/
        then/otherwise (``alternatives.js:145-163``).  Array items are NOT
        recursed (the reference has no array tailor override)."""
        tgts = [targets] if isinstance(targets, str) else list(targets)
        s = self
        for ent in s.metas.get("alterations", []):
            if ent["target"] in tgts:
                s = ent["adjuster"](s)
                if not isinstance(s, Schema):
                    raise ValueError(
                        f"Alteration adjuster for {ent['target']} failed to "
                        "return a schema object (lib/base.js:566)")
        if "keys" in s.terms:
            s = s._clone()
            s.terms["keys"] = {k: v.tailor(targets) for k, v in s.terms["keys"].items()}
        if "patterns" in s.terms:
            s = s._clone()
            s.terms["patterns"] = [
                {**e, **{k: e[k].tailor(targets) for k in ("schema", "matches")
                         if isinstance(e.get(k), Schema)}}
                for e in s.terms["patterns"]
            ]
        if any(r["name"] == "assert" and isinstance(r["args"].get("schema"), Schema)
               for r in s.rules):
            s = s._clone()
            s.rules = [
                {**r, "args": {**r["args"], "schema": r["args"]["schema"].tailor(targets)}}
                if r["name"] == "assert" and isinstance(r["args"].get("schema"), Schema)
                else r
                for r in s.rules
            ]
        if "matches" in s.terms:
            s = s._clone()
            new = []
            for m in s.terms["matches"]:
                if isinstance(m, Schema):
                    new.append(m.tailor(targets))
                elif isinstance(m, dict):
                    m = dict(m)
                    for k in ("schema", "peek", "is", "then", "otherwise"):
                        if isinstance(m.get(k), Schema):
                            m[k] = m[k].tailor(targets)
                    new.append(m)
                else:
                    new.append(m)
            s.terms["matches"] = new
        return s

    # -- describe / serialize ---------------------------------------------
    def describe(self) -> dict:
        """Plain-JSON manifest (isomorphic to ``lib/manifest.js:16-154``)."""
        d: dict[str, Any] = {"type": self.type}
        if self.flags:
            flags = dict(self.flags)
            # strip/raw serialize as joi's single result slot
            # (manifest.js flags: {result: 'strip'|'raw'})
            if flags.pop("strip", None):
                flags["result"] = "strip"
            elif flags.pop("raw", None):
                flags["result"] = "raw"
            d["flags"] = _encode(flags)
        if self.rules:
            d["rules"] = [
                {k: (_encode(v) if k == "args" else v) for k, v in r.items()} for r in self.rules
            ]
        if self.allow_vals:
            d["allow"] = _encode(self.allow_vals)
        if self.invalid_vals:
            d["invalid"] = _encode(self.invalid_vals)
        if self.prefs:
            d["preferences"] = dict(self.prefs)
        if self.metas:
            # _ruleset_start is a builder-internal marker and error_fn a
            # live callable: neither belongs in the portable IR
            serializable = {
                k: v for k, v in self.metas.items() if k not in ("alterations", "_ruleset_start", "error_fn")
            }
            if serializable:
                d["metas"] = serializable
            # alterations ride the IN-MEMORY manifest with live adjuster
            # callables, exactly like the reference (manifest.js describe
            # emits [{target, adjuster}] and build():339-346 re-alters);
            # to_json drops the adjuster key the way JSON.stringify drops
            # function-valued properties
            if self.metas.get("alterations"):
                d["alterations"] = [dict(e) for e in self.metas["alterations"]]
        for name, term in self.terms.items():
            if name == "keys":
                d["keys"] = {k: v.describe() for k, v in term.items()}
            elif name in ("items", "ordered", "matches"):
                # matches entries may be conditional dicts (alternatives
                # when, lib/types/alternatives.js:176-218)
                d[name] = [
                    v.describe() if isinstance(v, Schema) else {
                        k: (v2.describe() if isinstance(v2, (Schema, Ref)) else _encode(v2))
                        for k, v2 in v.items() if v2 is not None
                    }
                    for v in term
                ]
            elif name == "whens":
                d["whens"] = [
                    {
                        k: (
                            v.describe()
                            if isinstance(v, (Schema, Ref))
                            else (
                                [
                                    {
                                        kk: (vv.describe() if isinstance(vv, (Schema, Ref)) else _encode(vv))
                                        for kk, vv in sw.items()
                                    }
                                    for sw in v
                                ]
                                if k == "switch"
                                else _encode(v)
                            )
                        )
                        for k, v in w.items()
                    }
                    for w in term
                ]
            elif name == "dependencies":
                d["dependencies"] = _encode(term)
            else:
                d[name] = _encode(term)
        return d

    def to_json(self) -> str:
        # JSON.stringify parity: function-valued dict entries (alteration
        # adjusters) are silently dropped — a JSON manifest carries
        # alterations as [{target}] and build() of that form raises, like
        # the reference's alter() adjuster assert on a stringified manifest
        return json.dumps(_drop_callables(self.describe()), sort_keys=True)

    def __repr__(self):  # pragma: no cover
        return f"Schema<{self.type}>({json.dumps(self.describe(), default=str)[:120]})"

    def __eq__(self, other):
        return isinstance(other, Schema) and self.describe() == other.describe()


# ---------------------------------------------------------------------------
# typed builders


def _assert_limit(limit) -> None:
    """Reference rule-arg assert (Common.limit via ``assert``s exercised in
    test/types/binary.js:182-196, string/array equivalents): plain limits
    must be non-negative safe integers; Ref / Template pass through."""
    if isinstance(limit, Ref) or type(limit).__name__ == "Template":
        return
    ok = (
        not isinstance(limit, bool)
        and isinstance(limit, (int, float))
        and float(limit).is_integer()
        and limit >= 0
    )
    if not ok:
        raise ValueError("limit must be a positive integer or reference")


class StringSchema(Schema):
    def __init__(self):
        super().__init__("string")

    def min(self, limit, encoding: str | None = None) -> "StringSchema":
        _assert_limit(limit)
        return self._rule("min", {"limit": limit, "encoding": encoding}, single=True)

    def max(self, limit, encoding: str | None = None) -> "StringSchema":
        _assert_limit(limit)
        return self._rule("max", {"limit": limit, "encoding": encoding}, single=True)

    def length(self, limit, encoding: str | None = None) -> "StringSchema":
        _assert_limit(limit)
        return self._rule("length", {"limit": limit, "encoding": encoding}, single=True)

    def pattern(self, regex: str, *, invert: bool = False, name: str | None = None) -> "StringSchema":
        regex = _regex_source(regex)  # joi takes a RegExp object, flags kept
        return self._rule("pattern", {"regex": regex, "invert": invert, "name": name})

    regex = pattern

    def alphanum(self) -> "StringSchema":
        return self._rule("alphanum", single=True)

    def token(self) -> "StringSchema":
        return self._rule("token", single=True)

    def hex(self) -> "StringSchema":
        return self._rule("hex", single=True)

    def base64(self, *, padding_required: bool = True, url_safe: bool = False) -> "StringSchema":
        return self._rule(
            "base64", {"paddingRequired": padding_required, "urlSafe": url_safe}, single=True
        )

    def data_uri(self, *, padding_required: bool = True) -> "StringSchema":
        return self._rule("dataUri", {"paddingRequired": padding_required}, single=True)

    def email(self, *, tlds: list[str] | dict | None = None, multiple: bool = False,
              separator: str = ",", min_domain_segments: int = 2) -> "StringSchema":
        return self._rule(
            "email",
            {"tlds": tlds, "multiple": multiple, "separator": separator,
             "minDomainSegments": min_domain_segments},
            single=True,
        )

    def domain(self, *, min_domain_segments: int = 2,
               tlds: list[str] | dict | bool | None = None,
               allow_unicode: bool = True) -> "StringSchema":
        """@hapi/address v2 options (string/index.js:270-287):
        minDomainSegments, tlds allow/deny, allowUnicode."""
        return self._rule(
            "domain",
            {"options": {"minDomainSegments": min_domain_segments,
                         "tlds": tlds, "allowUnicode": allow_unicode}},
            single=True,
        )

    def hostname(self) -> "StringSchema":
        return self._rule("hostname", single=True)

    def guid(self, *, version: list[int] | None = None) -> "StringSchema":
        return self._rule("guid", {"version": version}, single=True)

    uuid = guid

    def ip(self, *, version: list[str] | None = None, cidr: str = "optional") -> "StringSchema":
        return self._rule("ip", {"version": version, "cidr": cidr}, single=True)

    def uri(
        self,
        *,
        scheme: list[str] | None = None,
        allow_relative: bool = False,
        relative_only: bool = False,
        allow_query_square_brackets: bool = False,
        domain=None,
    ) -> "StringSchema":
        """``domain=True`` (or ``{"minDomainSegments": N}``) additionally
        requires the authority host to be a valid domain name
        (``lib/types/string/index.js:702-707``)."""
        return self._rule(
            "uri",
            {"scheme": scheme, "allowRelative": allow_relative, "relativeOnly": relative_only,
             "allowQuerySquareBrackets": allow_query_square_brackets, "domain": domain},
            single=True,
        )

    def iso_date(self) -> "StringSchema":
        return self._rule("isoDate", single=True)

    def iso_duration(self) -> "StringSchema":
        return self._rule("isoDuration", single=True)

    def credit_card(self) -> "StringSchema":
        return self._rule("creditCard", single=True)

    def lowercase(self) -> "StringSchema":
        return self._rule("case", {"direction": "lower"}, single=True)

    def uppercase(self) -> "StringSchema":
        return self._rule("case", {"direction": "upper"}, single=True)

    def case(self, direction: str) -> "StringSchema":
        return self._rule("case", {"direction": direction}, single=True)

    def trim(self, enabled: bool = True) -> "StringSchema":
        return self._rule("trim", {"enabled": enabled}, single=True)

    def normalize(self, form: str = "NFC") -> "StringSchema":
        return self._rule("normalize", {"form": form}, single=True)

    def truncate(self, enabled: bool = True) -> "StringSchema":
        return self._flag("truncate", True if enabled else None)

    def replace(self, pattern, replacement: str) -> "StringSchema":
        """Coerce-time replace.  A compiled ``re.Pattern`` or plain string
        with ``literal=False`` semantics: joi treats plain strings as
        literals (``lib/types/string/index.js:606-625``) — pass a compiled
        pattern for regex replacement; plain strings replace literally."""
        import re as _re

        s = self._clone()
        if isinstance(pattern, _re.Pattern):
            entry = {"pattern": _regex_source(pattern), "replacement": replacement, "literal": False}
        else:
            entry = {"pattern": pattern, "replacement": replacement, "literal": True}
        s.terms.setdefault("replacements", []).append(entry)
        return s


class NumberSchema(Schema):
    def __init__(self):
        super().__init__("number")

    def min(self, limit) -> "NumberSchema":
        return self._rule("min", {"limit": limit}, single=True)

    def max(self, limit) -> "NumberSchema":
        return self._rule("max", {"limit": limit}, single=True)

    def greater(self, limit) -> "NumberSchema":
        return self._rule("greater", {"limit": limit}, single=True)

    def less(self, limit) -> "NumberSchema":
        return self._rule("less", {"limit": limit}, single=True)

    def integer(self) -> "NumberSchema":
        return self._rule("integer", single=True)

    def multiple(self, base) -> "NumberSchema":
        return self._rule("multiple", {"base": base})  # multi rule (lib/types/number.js:165-187)

    def port(self) -> "NumberSchema":
        return self._rule("port", single=True)

    def positive(self) -> "NumberSchema":
        return self._rule("sign", {"sign": "positive"}, single=True)

    def negative(self) -> "NumberSchema":
        return self._rule("sign", {"sign": "negative"}, single=True)

    def precision(self, limit: int) -> "NumberSchema":
        return self._rule("precision", {"limit": limit}, single=True)

    def unsafe(self, enabled: bool = True) -> "NumberSchema":
        return self._flag("unsafe", True if enabled else None)


class BooleanSchema(Schema):
    def __init__(self):
        super().__init__("boolean")

    def truthy(self, *values) -> "BooleanSchema":
        s = self._clone()
        s.terms.setdefault("truthy", []).extend(values)
        return s

    def falsy(self, *values) -> "BooleanSchema":
        s = self._clone()
        s.terms.setdefault("falsy", []).extend(values)
        return s


class DateSchema(Schema):
    def __init__(self):
        super().__init__("date")

    def min(self, limit) -> "DateSchema":
        return self._rule("min", {"limit": limit}, single=True)

    def max(self, limit) -> "DateSchema":
        return self._rule("max", {"limit": limit}, single=True)

    def greater(self, limit) -> "DateSchema":
        return self._rule("greater", {"limit": limit}, single=True)

    def less(self, limit) -> "DateSchema":
        return self._rule("less", {"limit": limit}, single=True)

    def iso(self) -> "DateSchema":
        return self._flag("format", "iso")

    def timestamp(self, unit: str = "javascript") -> "DateSchema":
        if unit not in ("javascript", "unix"):
            raise ValueError('"type" must be one of [javascript, unix] (date.js:120-126)')
        return self._flag("format", {"javascript": "ms", "unix": "s"}[unit])


class BinarySchema(Schema):
    def __init__(self):
        super().__init__("binary")

    def min(self, limit) -> "BinarySchema":
        _assert_limit(limit)
        return self._rule("min", {"limit": limit}, single=True)

    def max(self, limit) -> "BinarySchema":
        _assert_limit(limit)
        return self._rule("max", {"limit": limit}, single=True)

    def length(self, limit) -> "BinarySchema":
        _assert_limit(limit)
        return self._rule("length", {"limit": limit}, single=True)

    # Node Buffer.isEncoding set (test/types/binary.js:148-154 throws on others)
    _ENCODINGS = frozenset(
        {"ascii", "utf8", "utf-8", "utf16le", "ucs2", "ucs-2", "base64", "latin1", "binary", "hex"}
    )

    def encoding(self, enc: str) -> "BinarySchema":
        if enc not in self._ENCODINGS:
            raise ValueError(f"Invalid encoding: {enc}")
        return self._flag("encoding", enc)


def _has_array_item(schemas) -> bool:
    """True when any schema (or alternatives branch) is array-typed —
    the single()/items() mutual exclusion (test/types/array.js:1488-1501)."""
    for sc in schemas:
        if getattr(sc, "type", None) == "array":
            return True
        if getattr(sc, "type", None) == "alternatives" and _has_array_item(
            sc.terms.get("matches", [])
        ):
            return True
    return False


class ArraySchema(Schema):
    def __init__(self):
        super().__init__("array")

    def items(self, *schemas) -> "ArraySchema":
        schemas = [compile_literal(v) for v in schemas]
        if self.flags.get("single") and _has_array_item(schemas):
            raise ValueError("Cannot specify array item with single rule enabled")
        s = self._clone()
        s.terms.setdefault("items", []).extend(schemas)
        return s

    def ordered(self, *schemas) -> "ArraySchema":
        schemas = [compile_literal(v) for v in schemas]
        if self.flags.get("single") and _has_array_item(schemas):
            raise ValueError("Cannot specify array item with single rule enabled")
        s = self._clone()
        s.terms.setdefault("ordered", []).extend(schemas)
        return s

    def min(self, limit) -> "ArraySchema":
        _assert_limit(limit)
        return self._rule("min", {"limit": limit}, single=True)

    def max(self, limit) -> "ArraySchema":
        _assert_limit(limit)
        return self._rule("max", {"limit": limit}, single=True)

    def length(self, limit) -> "ArraySchema":
        _assert_limit(limit)
        return self._rule("length", {"limit": limit}, single=True)

    def unique(self, by=None, *, ignore_undefined: bool = False) -> "ArraySchema":
        """Within-row uniqueness of list items (``lib/types/array.js:468-558``).

        ``by`` is a struct-field path for list<struct> columns, or a callable
        comparator ``(a, b) -> bool`` returning True when two items count as
        duplicates (the reference's custom-comparator form; in-memory only —
        callables cannot ship through the JSON spec).  Nested item types
        without ``by`` fall back to canonical-JSON deep equality (the analog
        of the reference's deepEqual path, array.js:497).  By default null
        items participate in the comparison (two nulls duplicate);
        ``ignore_undefined`` skips them (array.js:476).  Dataset-level
        uniqueness is a pipeline stage, not a schema rule."""
        args: dict[str, Any] = {"ignoreUndefined": ignore_undefined}
        if callable(by):
            args["comparator"] = by
        else:
            args["by"] = by
        return self._rule("unique", args, single=True)

    def sparse(self, enabled: bool = True) -> "ArraySchema":
        return self._flag("sparse", True if enabled else None)

    def single(self, enabled: bool = True) -> "ArraySchema":
        if enabled and _has_array_item(
            list(self.terms.get("items", [])) + list(self.terms.get("ordered", []))
        ):
            raise ValueError("Cannot specify single rule when array has array items")
        return self._flag("single", True if enabled else None)

    def has(self, schema: Schema) -> "ArraySchema":
        return self._rule("has", {"schema": schema})

    def sort(self, *, order: str = "ascending", by: str | None = None,
             convert: bool | None = None) -> "ArraySchema":
        """joi semantics by default (``convert=None``): under
        ``prefs.convert`` the COERCE stage rewrites each row's list in
        sorted order BEFORE the items loop (array.js coerce:44-48 →
        internals.sort:740-788); under ``convert:false`` the rule checks
        order and errors ``array.sort``.  Engine extensions: ``convert=
        False`` always checks (order violations as a first-class dataset
        check, e.g. the flagship span-offset monotonicity), ``convert=
        True`` always sorts."""
        return self._rule("sort", {"order": order, "by": by, "convert": convert}, single=True)


class ObjectSchema(Schema):
    def __init__(self, keys: dict[str, Schema] | None = None):
        super().__init__("object")
        # keys-term presence is semantic (object.js:258-270): absent term
        # (object()) allows any key; empty term (object({}) / keys({}))
        # forbids all keys
        if keys is not None:
            self.terms["keys"] = {k: compile_literal(v) for k, v in keys.items()}

    def keys(self, keys: dict[str, Schema] | None = None) -> "ObjectSchema":
        s = self._clone()
        if keys is None:  # keys() -> allow all (object.js:261-263)
            s.terms.pop("keys", None)
        elif not keys:  # keys({}) -> allow none (object.js:264-266)
            s.terms["keys"] = {}
        else:
            s.terms.setdefault("keys", {}).update(
                {k: compile_literal(v) for k, v in keys.items()})
        return s

    def append(self, keys: dict[str, Schema] | None = None) -> "ObjectSchema":
        # append(null/undefined/{}) is a no-op (object.js:191-202)
        if not keys:
            return self
        return self.keys(keys)

    def _dep(self, rel: str, peers, *, separator=".", **opts) -> "ObjectSchema":
        s = self._clone()
        flat = []
        for p in peers:
            flat.extend(p) if isinstance(p, (list, tuple)) else flat.append(p)
        d = {"rel": rel, "peers": flat, **opts}
        if separator != ".":
            # reference options.separator ('.'/custom/False — False means
            # keys containing literal dots, object.js:748); only stored
            # when non-default so describe() stays stable
            d["separator"] = separator
        s.terms.setdefault("dependencies", []).append(d)
        return s

    # dependency rules (lib/types/object.js:722-873); peers may be dotted
    # deep paths resolved by the engine (separator=False -> literal keys)
    def and_(self, *peers, separator=".") -> "ObjectSchema":
        return self._dep("and", peers, separator=separator)

    def nand(self, *peers, separator=".") -> "ObjectSchema":
        return self._dep("nand", peers, separator=separator)

    def or_(self, *peers, separator=".") -> "ObjectSchema":
        return self._dep("or", peers, separator=separator)

    def xor(self, *peers, separator=".") -> "ObjectSchema":
        return self._dep("xor", peers, separator=separator)

    def oxor(self, *peers, separator=".") -> "ObjectSchema":
        return self._dep("oxor", peers, separator=separator)

    def with_(self, key: str, *peers, separator=".") -> "ObjectSchema":
        return self._dep("with", peers, key=key, separator=separator)

    def without(self, key: str, *peers, separator=".") -> "ObjectSchema":
        return self._dep("without", peers, key=key, separator=separator)

    def assert_(self, subject, schema: Schema, message: str | None = None) -> "ObjectSchema":
        r = subject if isinstance(subject, Ref) else Ref(subject)
        # object.js:209: only global ($context) refs or nested paths are
        # allowed as assertion subjects
        if r.kind == "ancestor" and len(r.parts) < 2:
            raise ValueError(
                "Cannot use assertions for root level references - use direct"
                " key rules instead (lib/types/object.js:209)")
        return self._rule("assert", {"ref": r, "schema": schema, "message": message})

    def min(self, limit: int) -> "ObjectSchema":
        _assert_limit(limit)
        return self._rule("min", {"limit": limit}, single=True)

    def max(self, limit: int) -> "ObjectSchema":
        _assert_limit(limit)
        return self._rule("max", {"limit": limit}, single=True)

    def length(self, limit: int) -> "ObjectSchema":
        _assert_limit(limit)
        return self._rule("length", {"limit": limit}, single=True)

    def rename(self, from_: str, to: str, *, regex: bool = False, multiple: bool = False,
               alias: bool = False, override: bool = False,
               ignore_undefined: bool = False) -> "ObjectSchema":
        """Key rename (``/root/reference/lib/types/object.js:387-415,886-967``).

        ``regex=True`` treats ``from_`` as a pattern matched against key /
        column names; ``to`` may then be a template using ``{#0}`` (whole
        match), ``{#1}``... (capture groups) and ``{$name}`` context refs.
        Options mirror joi: ``multiple`` allows several sources renaming to
        one target (else ``object.rename.multiple``), ``override`` allows an
        existing target (else ``object.rename.override``), ``alias`` keeps
        the source, ``ignore_undefined`` skips the rename per row when the
        source value is null."""
        s = self._clone()
        import re as _re

        if isinstance(from_, _re.Pattern):  # joi accepts a RegExp source
            from_, regex = _regex_source(from_), True
        entry: dict[str, Any] = {"from": from_, "to": to}
        if regex:
            entry["regex"] = True
        opts = {
            k: True
            for k, v in (("multiple", multiple), ("alias", alias), ("override", override),
                         ("ignoreUndefined", ignore_undefined))
            if v
        }
        if opts:
            entry["options"] = opts
        s.terms.setdefault("renames", []).append(entry)
        return s

    def pattern(self, regex: str, schema: Schema, *, exclusive: bool = False,
                matches: Schema | None = None) -> "ObjectSchema":
        """Unknown keys matching ``regex`` validate against ``schema``
        (``/root/reference/lib/types/object.js:340-369``).  In columnar form
        this is a compile-time concern: struct fields / columns not in
        ``keys`` but matching the pattern get the pattern schema instead of
        an object.unknown error.  A key matching several patterns validates
        against each in order unless an earlier pattern set ``exclusive``;
        ``matches`` is a schema the ARRAY OF MATCHED KEY NAMES must satisfy
        (``object.pattern.match`` on failure, object.js:970-1041)."""
        s = self._clone()
        import re as _re

        regex = _regex_source(regex)  # joi accepts a RegExp directly, flags kept
        entry: dict[str, Any] = {"regex": regex, "schema": compile_literal(schema)}
        if exclusive:
            entry["exclusive"] = True
        if matches is not None:
            entry["matches"] = matches
        s.terms.setdefault("patterns", []).append(entry)
        return s

    def unknown(self, allow: bool = True) -> "ObjectSchema":
        return self._flag("unknown", allow)


class AlternativesSchema(Schema):
    def __init__(self):
        super().__init__("alternatives")

    def try_(self, *schemas) -> "AlternativesSchema":
        # joi's try() takes a single schema OR an array of schemas
        # (alternatives.js try rule: schemas = [].concat(schemas)); accept
        # the array form too so joi programs port verbatim
        if len(schemas) == 1 and isinstance(schemas[0], (list, tuple)):
            schemas = tuple(schemas[0])
        s = self._clone()
        s.terms.setdefault("matches", []).extend(compile_literal(v) for v in schemas)
        return s

    def when(self, condition, *, is_=None, then=None, otherwise=None, switch=None) -> "AlternativesSchema":
        """Alternatives-specific when (``lib/types/alternatives.js:176-218``):
        the conditional becomes a MATCH entry, not a base-schema merge — per
        row the selected branch's result is returned as-is (no fall-through
        to later matches, ``lib/types/alternatives.js:47-57``)."""
        s = self._clone()
        matches = s.terms.setdefault("matches", [])

        def _branch(v):
            return v if v is None or isinstance(v, Schema) else compile_literal(v)

        if isinstance(condition, Schema):
            if is_ is not None or switch is not None:
                raise ValueError('"is_"/"switch" cannot be used with a schema condition'
                                 " (lib/types/alternatives.js:180-182)")
            matches.append({"peek": condition, "then": _branch(then),
                            "otherwise": _branch(otherwise)})
            return s
        cond = condition if isinstance(condition, Ref) else Ref(condition)
        if switch is not None:
            # switch expands to successive conditional entries: a non-matching
            # `is` falls to the next entry, mirroring case order
            for i, c in enumerate(switch):
                last = i == len(switch) - 1
                matches.append({
                    "ref": cond, "is": c["is"], "then": _branch(c.get("then")),
                    "otherwise": _branch(c.get("otherwise")) if last else None,
                })
            return s
        matches.append({"ref": cond, "is": is_, "then": _branch(then),
                        "otherwise": _branch(otherwise)})
        return s

    def conditional(self, condition, *, is_=None, then=None, otherwise=None, switch=None) -> "AlternativesSchema":
        return self.when(condition, is_=is_, then=then, otherwise=otherwise, switch=switch)

    def label(self, name: str) -> "AlternativesSchema":
        # label maps into EXISTING matches at call time, overriding branch
        # labels (lib/types/alternatives.js:121-143 label override)
        s = super().label(name)
        ms = s.terms.get("matches")
        if ms:
            s.terms["matches"] = [
                m.label(name) if isinstance(m, Schema) else {
                    **m,
                    "then": m["then"].label(name) if m.get("then") else m.get("then"),
                    "otherwise": m["otherwise"].label(name) if m.get("otherwise") else m.get("otherwise"),
                }
                for m in ms
            ]
        return s


class AnySchema(Schema):
    def __init__(self):
        super().__init__("any")


# ---------------------------------------------------------------------------
# module-level constructors (the `jr.string()` surface)


def any_() -> AnySchema:
    return AnySchema()


def string() -> StringSchema:
    return StringSchema()


def number() -> NumberSchema:
    return NumberSchema()


def boolean() -> BooleanSchema:
    return BooleanSchema()


def date() -> DateSchema:
    return DateSchema()


def binary() -> BinarySchema:
    return BinarySchema()


def array() -> ArraySchema:
    return ArraySchema()


def object(keys: dict[str, Schema] | None = None) -> ObjectSchema:
    return ObjectSchema(keys)


def alternatives(*schemas: Schema) -> AlternativesSchema:
    s = AlternativesSchema()
    if schemas:
        s = s.try_(*schemas)
    return s


def link(_path: str = "..."):
    """Recursive schema references (``/root/reference/lib/types/link.js``):
    N/A-by-design — Arrow tables are fixed-depth, so recursive structures
    are expanded to their concrete depth at schema-build time instead
    (SURVEY.md §2.3 link row)."""
    raise NotImplementedError(
        "link() requires unbounded recursive values; columnar tables are fixed-depth —"
        " expand the schema to the concrete depth instead (SURVEY.md §2.3)"
    )


def symbol():
    """JS-runtime-only type (``/root/reference/lib/types/symbol.js``):
    no Arrow equivalent — N/A-by-design per SURVEY.md §2.3."""
    raise NotImplementedError(
        "symbol() is JS-runtime-specific (N/A-by-design for columnar data; SURVEY.md §2.3)"
    )


def function_():
    """JS-runtime-only type (``/root/reference/lib/types/function.js``):
    no Arrow equivalent — N/A-by-design per SURVEY.md §2.3."""
    raise NotImplementedError(
        "function() is JS-runtime-specific (N/A-by-design for columnar data; SURVEY.md §2.3)"
    )


_BUILDERS = {
    "any": AnySchema,
    "string": StringSchema,
    "number": NumberSchema,
    "boolean": BooleanSchema,
    "date": DateSchema,
    "binary": BinarySchema,
    "array": ArraySchema,
    "object": ObjectSchema,
    "alternatives": AlternativesSchema,
}


def compile_literal(value) -> Schema:
    """Literal sugar (``/root/reference/lib/compile.js:31-77``): a plain dict
    becomes object().keys, a list of schemas alternatives().try, a compiled
    regex string().pattern, a scalar a typed valid(x), a Ref any().valid(ref),
    None any().valid(None)."""
    import re as _re

    if isinstance(value, Schema):
        return value
    if value is None:
        return any_().valid(None)
    if isinstance(value, Ref):
        return any_().valid(value)
    if isinstance(value, _re.Pattern):
        return string().pattern(value)
    if isinstance(value, dict):
        return ObjectSchema({k: compile_literal(v) for k, v in value.items()})
    if isinstance(value, (list, tuple)):
        return alternatives(*[compile_literal(v) for v in value])
    if isinstance(value, str):
        return string().valid(value)
    if isinstance(value, bool):
        return boolean().valid(value)
    if isinstance(value, (int, float)):
        return number().valid(value)
    raise TypeError(f"cannot compile literal of type {type(value)}")


def build(desc: dict) -> Schema:
    """Reconstruct a Schema from its description — the ``Joi.build`` analog
    (``/root/reference/lib/manifest.js:217-366``).  Round-trip invariant
    ``build(s.describe()) == s`` is asserted throughout the test suite,
    mirroring ``/root/reference/test/helper.js:25-27``."""
    cls = _BUILDERS.get(desc["type"])
    if cls is None:
        raise ValueError(f"unknown type {desc['type']!r}")
    s = cls() if cls is not ObjectSchema else ObjectSchema()
    s.flags = _decode(desc.get("flags", {}))
    # joi's single result slot (manifest flags {result: 'strip'|'raw'})
    # maps back to the internal strip/raw flags; legacy split form passes
    # through _decode untouched
    _res = s.flags.pop("result", None)
    if _res in ("strip", "raw"):
        s.flags[_res] = True
    s.rules = [
        {**r, "args": _decode(r.get("args", {}))} for r in desc.get("rules", [])
    ]
    s.allow_vals = _decode(desc.get("allow", []))
    s.invalid_vals = _decode(desc.get("invalid", []))
    s.prefs = dict(desc.get("preferences", {}))
    s.metas = dict(desc.get("metas", {}))
    if "alterations" in desc:
        # manifest.js:339-346 funnels the entries through an object keyed by
        # target (so duplicate targets collapse to the LAST adjuster at the
        # FIRST position) before one .alter() call — reproduce that quirk;
        # a JSON-serialized manifest arrives without adjusters and raises,
        # matching the reference's alter() function assert
        alter_map: dict[str, Any] = {}
        for ent in desc["alterations"]:
            alter_map[ent["target"]] = ent.get("adjuster")
        s = s.alter(alter_map)
    for name in ("items", "ordered", "matches"):
        if name in desc:
            s.terms[name] = [
                build(d)
                if "type" in d
                else {  # conditional alternatives match entry
                    k: (
                        _decode(v) if k == "ref"
                        else build(v)
                        if k in ("then", "otherwise", "peek")
                        or (k == "is" and isinstance(v, dict) and "type" in v)
                        else _decode(v)
                    )
                    for k, v in d.items()
                }
                for d in desc[name]
            ]
    if "keys" in desc:
        s.terms["keys"] = {k: build(v) for k, v in desc["keys"].items()}
    if "whens" in desc:
        s.terms["whens"] = [
            {
                k: (
                    _decode(v)
                    if k == "ref"
                    else (
                        # schema-valued is/then/otherwise must round-trip as
                        # schemas (lib/manifest.js:217-366 rebuilds all three);
                        # a literal `is` stays a literal
                        build(v)
                        if k in ("is", "then", "otherwise", "peek") and isinstance(v, dict) and "type" in v
                        else (
                            [
                                {
                                    kk: (
                                        build(vv)
                                        if kk in ("then", "otherwise")
                                        or (kk == "is" and isinstance(vv, dict) and "type" in vv)
                                        else _decode(vv)
                                    )
                                    for kk, vv in sw.items()
                                }
                                for sw in v
                            ]
                            if k == "switch"
                            else _decode(v)
                        )
                    )
                )
                for k, v in w.items()
            }
            for w in desc["whens"]
        ]
    for name in ("dependencies", "renames", "replacements", "truthy", "falsy", "patterns"):
        if name in desc:
            s.terms[name] = _decode(desc[name])
    return s


def from_json(text: str) -> Schema:
    """joi_ray's wire format (reference has no JSON-rebuild path): a
    stringified manifest cannot carry adjuster callables, and alterations
    are inert during validation, so they are dropped here — build() of a
    hand-parsed JSON manifest still raises like the reference's alter()
    function assert."""
    def strip_alts(o):
        if isinstance(o, dict):
            # only schema-manifest dicts (str-valued "type") carry
            # alterations — a user object KEY named "alterations" lives in
            # a keys mapping, whose dict has no str "type" entry
            is_manifest = isinstance(o.get("type"), str)
            return {k: strip_alts(v) for k, v in o.items()
                    if not (is_manifest and k == "alterations")}
        if isinstance(o, list):
            return [strip_alts(v) for v in o]
        return o

    return build(strip_alts(json.loads(text)))
