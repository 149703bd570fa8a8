"""Shared kernel plumbing: masks, rule outcomes, evaluation environment.

Conventions
-----------
- All row masks are dense ``numpy.bool_`` arrays of batch length.
- A rule kernel has signature ``fn(arr, args, env) -> RuleOut`` and must be
  fully vectorized (pyarrow.compute / numpy / pandas) — never a Python loop
  over rows in the hot path.
- Kernels return ``ok=True`` for cells they don't apply to (nulls are skipped
  by the engine's active mask anyway).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ..spec import Ref


def as_bool_np(mask, n: int, fill: bool = False) -> np.ndarray:
    """Arrow boolean array (possibly with nulls) -> dense numpy bool."""
    if isinstance(mask, np.ndarray):
        return mask.astype(bool, copy=False)
    if isinstance(mask, pa.ChunkedArray):
        mask = mask.combine_chunks()
    if mask.null_count:
        mask = mask.fill_null(fill)
    out = mask.to_numpy(zero_copy_only=False)
    return out.astype(bool, copy=False)


def null_mask(arr: pa.Array) -> np.ndarray:
    return as_bool_np(pc.is_null(arr), len(arr), fill=False)


def combine(arr) -> pa.Array:
    if isinstance(arr, pa.ChunkedArray):
        return arr.combine_chunks()
    return arr


@dataclass
class RuleOut:
    ok: np.ndarray                    # True = pass (or not applicable)
    context: dict = field(default_factory=dict)
    new_value: Optional[pa.Array] = None   # convert rules rewrite the column
    # span-level failures: parallel arrays of (row, item position) so the
    # error renders at the offending list element ("b[2]", errors.js:87-107)
    item_rows: Optional[np.ndarray] = None
    item_index: Optional[np.ndarray] = None


@dataclass
class ErrRec:
    """One error family over a batch: a code plus the row mask where it fired.

    Maps to joi's ``Report`` / ``details[]`` entries
    (``/root/reference/lib/errors.js:171-215``): ``code`` is the joi error
    type (e.g. ``string.min``), ``path`` the column path, ``context`` the
    static rule context (limit, name, ...).  ``item_index`` carries the
    offending list position for span-level errors (int32 per fired row, -1 =
    row-level).
    """

    code: str
    mask: np.ndarray
    path: str
    context: dict = field(default_factory=dict)
    seq: int = 0                      # rule registration order, for abortEarly parity
    warn: bool = False
    message: Optional[str] = None     # custom message override
    item_index: Optional[np.ndarray] = None  # aligned with mask.nonzero()
    #: per-fired-row values, aligned with rows/mask.nonzero() order, for the
    #: few messages that embed the offending value ({[.]} in joi templates,
    #: e.g. string.pattern.* — string/index.js:760-763)
    values: Optional[list] = None
    #: abortEarly ordering group (opaque identity): recs sharing a group
    #: take the group's FIRST emission index and interleave by item index —
    #: joi's item-outer array loop
    order: Optional[object] = None
    #: non-aborting error: joi records it WITHOUT returning under abortEarly
    #: (the inclusions-loop converted-to-undefined sparse, array.js:286-292)
    soft: bool = False
    #: character offset in ``path`` where the item index renders: joi builds
    #: the label from the FULL state path with the index AT the array
    #: boundary ('a[0].x', errors.js:87-107), not appended — set by the
    #: array items lift for sub-errors below the array level; None = append
    #: (plain item errors, where path IS the array path)
    ipos: Optional[int] = None


class AltView:
    """Per-row TYPED view of an alternatives column whose branches
    converted to different types (number vs boolean vs string): the value
    COLUMN had to keep originals (one Arrow type), but ref consumers need
    the per-row converted value joi would see (value.b === true).  ``base``
    is the column as stored; ``pairs`` are (row-mask, converted-array) per
    matching branch."""

    def __init__(self, base, pairs):
        self.base = base
        self.pairs = pairs

    def take(self, idx):
        return AltView(
            combine(self.base).take(idx),
            [(m[np.asarray(idx)], combine(a).take(idx)) for m, a in self.pairs],
        )


class Env:
    """Per-batch evaluation environment.

    ``resolve_ref`` gives rule kernels access to sibling columns (same-row
    cross-field references, ``/root/reference/lib/ref.js:111-161``) with
    shadow semantics: siblings are resolved against *post-coercion* values,
    which the engine guarantees by evaluating columns in topological order
    (the analog of ``/root/reference/lib/types/object.js:598-609``).
    """

    def __init__(
        self,
        prefs: dict,
        resolve_sibling: Callable[[str], Any] | None = None,
        ancestors: list | None = None,
    ):
        self.prefs = prefs
        self._resolve_sibling = resolve_sibling
        self.ancestors = ancestors or []
        # optional per-row PARENT dict accessor (the containing object's
        # value), used by arg-taking function defaults/failovers
        # (validator.js:465 passes Hoek.clone(state.ancestors[0]), prefs);
        # set by the object/root eval that owns the sibling columns
        self.row_getter = None

    @property
    def convert(self) -> bool:
        return self.prefs.get("convert", True)

    @property
    def abort_early(self) -> bool:
        return self.prefs.get("abort_early", True)

    def resolve_ref(self, r: Ref, n: int, mode: str = "strict"):
        """Resolve a Ref to an Arrow array (length n) or a Python scalar.

        Dotted paths traverse struct fields; the virtual ``length`` segment
        resolves list/string lengths (lib/ref.js resolve walks JS
        properties, so ``a.length`` reaches the array length — ref.js
        test:618-673).  ``map``/``adjust`` options post-process the
        resolved value (lib/ref.js:145-151).

        ``mode`` controls how rows whose sibling FAILED validation resolve
        when its original input type clashes with the converted column
        (joi keeps the raw JS value there — object.js:125-140):
        "strict" (rule args) -> undefined, so arg asserts raise any.ref
        like the raw value would; "loose" (when-conditions) -> the
        converted value, which the condition schema's own coercion would
        have produced from the raw input anyway."""
        parts = r.parts
        if r.kind == "local":
            # local bindings exist only during error rendering; in rule-arg
            # position joi resolves undefined -> the arg assert fires
            # per-row any.ref (ref.js:74-78)
            return self._ref_post(r, pa.nulls(n))
        if r.kind == "context":
            ctx = self.prefs.get("context", {})
            cur: Any = ctx
            for p in parts:
                if isinstance(cur, dict) and p in cur:
                    cur = cur[p]
                else:
                    # joi resolves an unbound global ref to undefined; the
                    # rule's ARG ASSERT then fires per-row any.ref
                    # ('limit references "ref:global:lim" which must be a
                    # number') instead of refusing the batch
                    return self._ref_post(r, pa.nulls(n))
            return self._ref_post(r, cur)
        if r.kind == "root":
            # /path: outermost (table-level) scope (lib/ref.js root prefix)
            if self.ancestors:
                base = self.ancestors[0](parts[0])
            elif self._resolve_sibling is not None:
                base = self._resolve_sibling(parts[0])
            else:
                raise KeyError(f"root ref /{r.path} outside any scope")
            return self._ref_post(r, _walk_ref_path(base, parts[1:], n))
        # ancestor level: 1 = sibling scope, k>=2 climbs k-1 object levels
        # (joi: 'a' == '..a'; '...a' = grandparent — lib/ref.js:40-66);
        # level 0 (own child, '.a') is resolved by the caller that holds the
        # node's own value (eval_node when-conditions)
        level = r.level if r.level is not None else 1
        if level == 0:
            raise KeyError(
                f"self ref .{r.path} requires the node's own value "
                "(supported in when() conditions)")
        if level == 1:
            if self._resolve_sibling is None:
                raise KeyError(f"sibling ref {r.path} outside an object scope")
            try:
                base = self._resolve_sibling(parts[0], mode=mode)
            except TypeError:
                base = self._resolve_sibling(parts[0])
            if isinstance(base, tuple) and len(base) == 3:
                val, orig, f = base
                if parts[1:]:
                    # dotted path: degrade to the converted column
                    base_v = val.base if isinstance(val, AltView) else val
                    return self._ref_post(r, _walk_ref_path(base_v, parts[1:], n))
                if f is None and not isinstance(val, AltView):
                    return self._ref_post(r, val)
                post_val = val if isinstance(val, AltView) else self._ref_post(r, val)
                post_orig = self._ref_post(r, orig) if orig is not None else None
                return (post_val, post_orig, f)
        else:
            idx = level - 1
            if idx > len(self.ancestors):
                raise KeyError(f"ancestor ref {r.path} reaches beyond the schema root")
            base = self.ancestors[-idx](parts[0])
        return self._ref_post(r, _walk_ref_path(base, parts[1:], n))

    def _ref_post(self, r: Ref, value):
        """Apply a Ref's map/adjust options to the resolved value."""
        if r.map:
            if isinstance(value, (pa.Array, pa.ChunkedArray)):
                if isinstance(value, pa.ChunkedArray):
                    value = value.combine_chunks()
                # map targets may differ in type from the source column
                # (e.g. 'x' -> 1): index_in + take builds the target-typed
                # column; unmatched rows keep the original value
                try:
                    idx = pc.index_in(value, value_set=pa.array([p[0] for p in r.map]))
                    tgt = pa.array([p[1] for p in r.map]).take(idx)
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    return value
                if idx.null_count == 0:
                    return tgt
                try:
                    return pc.if_else(pc.is_valid(idx), tgt, value.cast(tgt.type))
                except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                    # unmatched originals of an incompatible type resolve
                    # undefined for those rows (documented deviation)
                    return tgt
            m = {tuple(p)[0]: tuple(p)[1] for p in r.map}
            return m.get(value, value)
        if r.adjust is not None:
            if isinstance(value, (pa.Array, pa.ChunkedArray)):
                # scalar callable applied per distinct-efficient pandas map —
                # adjust refs are rare and not on the hot path
                import pandas as pd

                s = value.to_pandas()
                return pa.array(s.map(lambda v: r.adjust(v) if v is not None else None))
            return r.adjust(value)
        return value

    def child(self, resolve_sibling) -> "Env":
        e = Env(self.prefs, resolve_sibling, self.ancestors + ([self._resolve_sibling] if self._resolve_sibling else []))
        return e

    def match_env(self) -> "Env":
        """$_match prefs override (base.js:719-726): shallow-cloned prefs
        with abortEarly FORCED true and externals disabled.  Probe sub-evals
        (assert / has / array exclusions) must run under this env so warn
        reports are never created on rows a hard error already aborted —
        a failover in the probed schema later CLEARS those hard errors,
        erasing the evidence the warn-leak filters rely on (fuzz seed
        15500173: valids-failure abort precedes hex().warn(), failover
        then matches the row)."""
        e = Env({**self.prefs, "abort_early": True, "externals": False},
                self._resolve_sibling, self.ancestors)
        e.row_getter = self.row_getter  # same scope, same parent rows
        return e


def _walk_ref_path(base, parts: list[str], n: int):
    """Walk remaining ref path segments into struct fields.  ``length`` is a
    virtual segment on list/string values (JS property access semantics,
    ref.js test:618-673); unknown segments resolve undefined (all-null)."""
    cur = base
    for p in parts:
        if isinstance(cur, pa.ChunkedArray):
            cur = cur.combine_chunks()
        if isinstance(cur, (pa.Array, pa.ChunkedArray)):
            t = cur.type
            if pa.types.is_struct(t) and t.get_field_index(p) >= 0:
                cur = pc.struct_field(cur, p)
                continue
            if p == "length":
                if pa.types.is_list(t) or pa.types.is_large_list(t):
                    cur = pc.list_value_length(cur).cast(pa.int64())
                    continue
                if pa.types.is_string(t) or pa.types.is_large_string(t):
                    cur = pc.utf8_length(cur).cast(pa.int64())
                    continue
            return pa.nulls(n)
        if isinstance(cur, dict) and p in cur:
            cur = cur[p]
            continue
        if p == "length" and isinstance(cur, (str, list, tuple)):
            cur = len(cur)
            continue
        return pa.nulls(n)
    return cur


def resolve_limit(limit, env: Env, n: int, mode: str = "strict"):
    """A rule limit may be a literal, a Ref, or a Template (Joi.x) ->
    (value_or_array, ctx_repr).  Template limits resolve per row (joi's
    Common.isResolvable rule args — validator.js:281-293); the context
    limit renders the template SOURCE like joi's any.ref display."""
    if isinstance(limit, Ref):
        v = env.resolve_ref(limit, n, mode=mode)
        return v, {"limit": limit.display}
    if hasattr(limit, "resolve_value"):  # kernels.template.Template
        vals = resolve_template_column(limit, env, n, mixed="altview")
        # 3-tuple dual shape routes through the same arg-assert path as
        # refs (cmp_mask) — orig/f absent, so only the resolved side checks
        return (vals, None, None), {"limit": limit.display}
    return limit, {"limit": limit}


def resolve_template_column(tmpl, env: Env, n: int, mixed: str = "text"):
    """Per-row evaluation of a template against sibling refs — inherently
    row-wise (rare feature; bounded by the batch).

    Refs resolve DUAL like rule args (errored siblings keep their raw
    original — a cast('string') key that failed its rules feeds the raw
    number into '{b * 2}', node-verified via fuzz seed 34467); a missing
    sibling is JS undefined inside the formula (NaN under arithmetic), and
    a NaN result maps to null so the arg assert fires any.ref exactly like
    joi's Common.isNumber gate."""
    from .template import _UNDEFINED

    cache: dict = {}

    def col(name):
        if name not in cache:
            cache[name] = env.resolve_ref(Ref(name), n, mode="dual")
        return cache[name]

    def cell(v, i):
        if isinstance(v, AltView):
            # per-row typed view: LAST matching pair wins (shadow pairs
            # append after branch-value pairs — ref.js shadow-first)
            for m, a in reversed(v.pairs):
                if m[i]:
                    return combine(a)[i].as_py()
            v = v.base
        return combine(v)[i].as_py() if isinstance(v, (pa.Array, pa.ChunkedArray)) else v

    vals = []
    for i in range(n):
        def resolve(name, _i=i):
            v = col(name)
            if isinstance(v, tuple) and len(v) == 3:
                val, orig, f = v
                x = (cell(orig, _i) if (f is not None and orig is not None and f[_i])
                     else cell(val, _i))
            else:
                x = cell(v, _i)
            return _UNDEFINED if x is None else x

        try:
            x = tmpl.resolve_value(resolve)
        except Exception:
            x = None
        if x is _UNDEFINED:
            x = None  # undefined results fail joi's arg asserts
        elif isinstance(x, float) and x != x:
            # NaN also fails the asserts (np.isnan gate in _ref_arg_check)
            # but stays NaN so joi's any.ref report renders it as the
            # RESOLVED value ('v=NaN on c' — fuzz seed 10004430); text
            # consumers still get the null mapping below
            if mixed != "altview":
                x = None
        vals.append(x)
    try:
        return pa.array(vals)
    except (pa.ArrowInvalid, pa.ArrowTypeError):
        if mixed == "altview":
            # per-row heterogeneous results (a clean cast('string') sibling
            # concatenates, an errored one feeds its raw number): keep each
            # row's own TYPE through the AltView so the arg assert judges
            # per row — strings fail Common.isNumber, numbers compare
            # (fuzz seed 32696, node-verified)
            base = pa.array([x if isinstance(x, str) else None for x in vals], pa.string())
            pairs = []
            num_m = np.array([isinstance(x, (int, float)) and not isinstance(x, bool)
                              for x in vals])
            if num_m.any():
                pairs.append((num_m, pa.array(
                    [float(x) if m else None for x, m in zip(vals, num_m)], pa.float64())))
            bool_m = np.array([isinstance(x, bool) for x in vals])
            if bool_m.any():
                pairs.append((bool_m, pa.array(
                    [x if m else None for x, m in zip(vals, bool_m)], pa.bool_())))
            import datetime as _dt

            dt_m = np.array([isinstance(x, _dt.datetime) for x in vals])
            if dt_m.any():
                pairs.append((dt_m, pa.array(
                    [x if m else None for x, m in zip(vals, dt_m)], pa.timestamp("ms"))))
            return AltView(base, pairs)
        return pa.array([None if x is None else str(x) for x in vals])


#: per-arg-kind (assert, reason) mirroring the reference rule definitions:
#: number compare Common.isNumber (number.js:116), length limits
#: Common.limit (common.js:134, string/array/binary), date compare
#: normalize+assert (date.js:71-77)
_ARG_REASONS = {
    "number": "must be a number",
    "limit": "must be a positive integer",
    "date": "must have a valid date format",
}


def _resolved_cells(val, orig, f, fired: np.ndarray) -> list:
    """Per-fired-row RESOLVED arg values (pre-normalize, dual raw/converted)
    for joi's any.ref report value — {[.]} in custom messages renders it."""
    def cell(col, i):
        if isinstance(col, AltView):
            for m, a in col.pairs:
                if m[i]:
                    return combine(a)[i].as_py()
            col = col.base
        if isinstance(col, (pa.Array, pa.ChunkedArray)):
            return combine(col)[i].as_py()
        return col

    out = []
    for i in np.nonzero(fired)[0]:
        i = int(i)
        src = orig if (f is not None and orig is not None and f[i]) else val
        try:
            out.append(cell(src, i))
        except Exception:
            out.append(None)
    return out


def _ref_arg_check(lim, arg: str, n: int) -> tuple[pa.Array, np.ndarray]:
    """Validate a ref-resolved limit column against the rule's arg assert
    (lib/validator.js:281-293) -> (normalized_lim, bad_mask)."""
    if isinstance(lim, AltView):
        # mixed-type alternatives: check each branch's converted rows with
        # its own type's model, the uncovered rest with the base column
        lim_v, bad_v = _ref_arg_check(lim.base, arg, n)
        for m, a in lim.pairs:
            if not m.any():
                continue
            lim_i, bad_i = _ref_arg_check(a, arg, n)
            if pa.types.is_null(lim_v.type) and not pa.types.is_null(lim_i.type):
                lim_v = pa.nulls(n, lim_i.type)
            try:
                lim_v = pc.if_else(pa.array(m), lim_i, lim_v)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                pass
            bad_v = np.where(m, bad_i, bad_v)
        return lim_v, bad_v
    t = lim.type
    is_num = pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)
    if arg == "date":
        if pa.types.is_timestamp(t) or pa.types.is_date(t):
            return lim, as_bool_np(pc.is_null(lim), n)
        if is_num or pa.types.is_boolean(t):
            # epoch ms -> Date (date.js:172-226 internals.parse falls
            # through to new Date(value), and JS coerces booleans to 0/1 —
            # new Date(true) === epoch-1ms, a VALID date)
            lim = pc.cast(pc.cast(lim, pa.int64(), safe=False), pa.timestamp("ms"), safe=False)
            return lim, as_bool_np(pc.is_null(lim), n)
        if pa.types.is_string(t) or pa.types.is_large_string(t):
            # date.js normalize goes through internals.parse == the full
            # JS Date(string) model: numeric strings are ms-epoch, ISO
            # rolls the day over, then the legacy grammar
            from .scalars import js_parse_date_strings

            parsed = js_parse_date_strings(lim.to_pandas())
            lim = pa.Array.from_pandas(parsed.astype("datetime64[ms]"), type=pa.timestamp("ms"))
            return lim, as_bool_np(pc.is_null(lim), n)
        if pa.types.is_list(t) or pa.types.is_large_list(t):
            # joi's gate runs isNaN(value) FIRST for non-strings
            # (date.js:178-182): Number([5]) === 5 passes, Number([1,2])
            # is NaN -> null -> any.ref.  Survivors go through new
            # Date(array) == the legacy STRING grammar of the ','-join
            # ([5] -> '5' -> May 2001; [] -> '' -> Invalid).
            import pandas as pd
            import re as _re

            from .numbers import js_number_to_string
            from .scalars import js_parse_date_strings

            def el(x):
                if x is None:
                    return ""
                if isinstance(x, bool):
                    return "true" if x else "false"
                if isinstance(x, (int, float)):
                    return js_number_to_string(float(x))
                return str(x)

            num_gate = _re.compile(r"\s*[+-]?(\d+(\.\d+)?|\.\d+)?([eE][+-]?\d+)?\s*")
            joined, gate_ok = [], []
            for v in lim.to_pylist():
                if v is None:
                    joined.append(None)
                    gate_ok.append(False)
                    continue
                j = ",".join(el(x) for x in v)
                joined.append(j)
                gate_ok.append(num_gate.fullmatch(j) is not None)
            parsed = js_parse_date_strings(pd.Series(joined, dtype="object"), numeric="legacy")
            parsed = parsed.where(pd.Series(gate_ok))
            lim = pa.Array.from_pandas(parsed.astype("datetime64[ms]"), type=pa.timestamp("ms"))
            return lim, as_bool_np(pc.is_null(lim), n)
        if pa.types.is_binary(t) or pa.types.is_large_binary(t):
            # a Buffer skips joi's typeof-string numeric shortcut: isNaN
            # coerces it via toString (Number(Buffer('123')) === 123 so the
            # gate passes), then new Date(buffer) ALSO stringifies — V8's
            # legacy grammar, where '123' is the YEAR 123
            import pandas as pd

            from .scalars import js_parse_date_strings

            # Buffer.toString() is a UTF-8 decode WITH replacement chars
            # (b'm\\xa7' -> 'm\\ufffd') — never an invalid-utf8 crash
            # (fuzz seed 133443: lenient base64 decodes feed date refs)
            txt = pd.Series(
                [None if b is None else b.decode("utf-8", "replace")
                 for b in lim.to_pylist()], dtype="object")
            parsed = js_parse_date_strings(txt, numeric="legacy")
            lim = pa.Array.from_pandas(parsed.astype("datetime64[ms]"), type=pa.timestamp("ms"))
            return lim, as_bool_np(pc.is_null(lim), n)
        return pa.nulls(n), np.ones(n, dtype=bool)
    if not is_num or pa.types.is_boolean(t):
        # family mismatch: every row fails the assert; null the column so
        # the compare cast below can't crash on (e.g.) string -> float
        return pa.nulls(n), np.ones(n, dtype=bool)
    bad = as_bool_np(pc.is_null(lim), n)
    if pa.types.is_floating(t):
        fl = lim.to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            bad |= np.isnan(fl)
            if arg == "limit":
                bad |= ~((np.floor(fl) == fl) & (fl >= 0) & (fl <= 2**53 - 1))
    elif arg == "limit":
        iv = lim.to_numpy(zero_copy_only=False)
        bad |= ~((iv >= 0) & (iv <= 2**53 - 1))
    return lim, bad


def _scalar_ref_arg_ok(v, arg: str) -> bool:
    import datetime as _dt
    import math as _math

    if v is None:
        return False
    if arg == "date":
        if isinstance(v, (_dt.datetime, _dt.date)):
            return True
        if isinstance(v, (int, float)) and not isinstance(v, bool):
            return not (isinstance(v, float) and _math.isnan(v))
        if isinstance(v, str):
            import pandas as pd

            return not pd.isna(pd.to_datetime(v, errors="coerce", utc=True))
        return False
    if isinstance(v, bool) or not isinstance(v, (int, float)):
        return False
    if isinstance(v, float) and (_math.isnan(v) or _math.isinf(v)):
        return False
    if arg == "limit":
        return float(v).is_integer() and 0 <= v <= 2**53 - 1
    return True


def _align_compare_types(arr, lim):
    """Bring a value column and a ref-resolved limit column to a common
    comparable type.  Numeric pairs widen to float64 — joi compares JS
    numbers, and downcasting a 1e10 limit into an int32 length column
    would wrap and flip the comparison."""
    if lim.type == arr.type:
        return arr, lim

    def _num(t):
        return pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)

    if _num(arr.type) and _num(lim.type):
        f64 = pa.float64()
        return (
            arr if arr.type == f64 else pc.cast(arr, f64, safe=False),
            lim if lim.type == f64 else pc.cast(lim, f64, safe=False),
        )
    try:
        return arr, pc.cast(lim, arr.type)
    except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
        return arr, pc.cast(lim, arr.type, safe=False)


def cmp_mask(arr, op: str, limit, env: Env, arg: str = "number") -> tuple[np.ndarray, dict]:
    """Shared compare kernel (the analog of ``lib/types/number.js:102-120``
    and ``lib/types/date.js:56-79``): vectorized column-vs-scalar or
    column-vs-column comparison; Ref limits become sibling columns.

    When the limit is a Ref, joi validates the per-row resolved value
    against the rule's arg assert and raises ``any.ref`` instead of the
    rule error (lib/validator.js:281-293); the offending mask travels back
    in ``ctx["__ref_err__"]`` for the rules loop to emit."""
    n = len(arr)
    # rule args resolve DUAL: joi validates the per-row value (converted
    # for clean siblings, the RAW original for errored ones —
    # object.js:125-140) against the arg assert, and the TYPE of each side
    # picks its own semantics (a cast('string') key fails Common.limit on
    # clean rows while its raw float passes on failed rows; a Buffer '123'
    # legacy-parses to year 123 while the string '123' is epoch 123)
    lim, ctx = resolve_limit(limit, env, n, mode="dual")
    if isinstance(lim, tuple) and len(lim) == 3:
        val, orig, f = lim
        val = combine(val) if isinstance(val, pa.ChunkedArray) else val
        lim_v, bad_v = _ref_arg_check(val, arg, n)
        if f is None or orig is None:
            lim, refbad = lim_v, bad_v
        else:
            orig = combine(orig) if isinstance(orig, pa.ChunkedArray) else orig
            lim_o, bad_o = _ref_arg_check(orig, arg, n)
            try:
                lim = pc.if_else(pa.array(f), lim_o, lim_v)
            except (pa.ArrowInvalid, pa.ArrowNotImplementedError, pa.ArrowTypeError):
                lim = lim_v
            refbad = np.where(f, bad_o, bad_v)
        if refbad.any():
            ctx["__ref_err__"] = (
                refbad,
                {
                    "arg": "date" if arg == "date" else "limit",
                    "ref": limit.display,
                    "reason": _ARG_REASONS[arg],
                },
                # joi's any.ref report VALUE is the RESOLVED (pre-normalize)
                # arg (validator.js:289 $_createError('any.ref', resolved,
                # ...)) — custom {[.]} messages render it per row
                _resolved_cells(val, orig, f, refbad),
            )
        arr2, lim = _align_compare_types(arr, lim)
        fn = {"ge": pc.greater_equal, "le": pc.less_equal, "gt": pc.greater, "lt": pc.less, "eq": pc.equal}[op]
        ok = as_bool_np(fn(arr2, lim), n, fill=True)
        return ok, ctx
    if isinstance(lim, (pa.Array, pa.ChunkedArray)):
        lim = combine(lim)
        refbad = None
        if isinstance(limit, Ref):
            lim0 = lim
            lim, refbad = _ref_arg_check(lim, arg, n)
            if refbad.any():
                ctx["__ref_err__"] = (
                    refbad,
                    {
                        "arg": "date" if arg == "date" else "limit",
                        "ref": limit.display,
                        "reason": _ARG_REASONS[arg],
                    },
                    _resolved_cells(lim0, None, None, refbad),
                )
        arr, lim = _align_compare_types(arr, lim)
    elif isinstance(limit, Ref):
        # scalar resolution (context refs): same assert, whole batch
        if not _scalar_ref_arg_ok(lim, arg):
            ctx["__ref_err__"] = (
                np.ones(n, dtype=bool),
                {
                    "arg": "date" if arg == "date" else "limit",
                    "ref": limit.display,
                    "reason": _ARG_REASONS[arg],
                },
                [lim] * int(n),
            )
            lim = None
    fn = {"ge": pc.greater_equal, "le": pc.less_equal, "gt": pc.greater, "lt": pc.less, "eq": pc.equal}[op]
    ok = as_bool_np(fn(arr, lim), n, fill=True)  # null limit/val -> pass (skipped by active)
    return ok, ctx
