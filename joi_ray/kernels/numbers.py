"""Vectorized number rule kernels (reference: ``/root/reference/lib/types/
number.js``, 330 LoC).  The shared compare kernel (``number.js:102-120``)
is ``util.cmp_mask`` — it powers min/max/greater/less with literal or
Ref-valued limits (column-vs-column compare)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import Env, RuleOut, as_bool_np, cmp_mask

MAX_SAFE = 2**53 - 1

# joi's string->number gate (number.js:10): anything else — 'Infinity',
# 'NaN', hex, empty/blank — is NOT coerced and fails the base type check
NUMBER_RX = r"^\s*[+-]?(?:(?:\d+(?:\.\d*)?)|(?:\.\d+))(?:[eE][+-]?\d+)?\s*$"


def js_number_to_string(v: float) -> str:
    """ECMA-262 Number::toString(10): shortest round-trip digits, fixed
    notation for 1e-6 <= |v| < 1e21, exponent notation outside."""
    import math
    from decimal import Decimal

    if math.isnan(v):
        return "NaN"
    if math.isinf(v):
        return "Infinity" if v > 0 else "-Infinity"
    if v == 0:
        return "0"
    sign = "-" if v < 0 else ""
    d = Decimal(repr(abs(v)))
    _, digits, exp = d.as_tuple()
    s = "".join(map(str, digits)).rstrip("0") or "0"
    # value = 0.s * 10^npos  (npos = decimal point position)
    npos = len(digits) + exp
    k = len(s)
    if k <= npos <= 21:
        body = s + "0" * (npos - k)
    elif 0 < npos <= 21:
        body = s[:npos] + "." + s[npos:]
    elif -6 < npos <= 0:
        body = "0." + "0" * (-npos) + s
    elif k == 1:
        body = s + "e" + ("+" if npos - 1 >= 0 else "-") + str(abs(npos - 1))
    else:
        body = s[0] + "." + s[1:] + "e" + ("+" if npos - 1 >= 0 else "-") + str(abs(npos - 1))
    return sign + body


def _normalize_exponent(s: "object"):
    """Vectorized port of number.js:302-310 over a pandas str Series."""
    return (
        s.str.replace(r"\.(\d*[1-9])?0+e", r".\1e", regex=True, n=1)
        .str.replace(r"\.e", "e", regex=True, n=1)
        .str.replace(r"e\+", "e", regex=True, n=1)
        .str.replace(r"^\+", "", regex=True, n=1)
        .str.replace(r"^(-?)0+([1-9])", r"\1\2", regex=True, n=1)
    )


def _normalize_decimal(s):
    """Vectorized port of number.js:313-329."""
    s = (
        s.str.replace(r"^\+", "", regex=True, n=1)
        .str.replace(r"\.0+$", "", regex=True, n=1)
        .str.replace(r"^(-?)\.([^\.]*)$", r"\g<1>0.\2", regex=True, n=1)
        .str.replace(r"^(-?)0+([1-9])", r"\1\2", regex=True, n=1)
    )
    trailing = s.str.contains(".", regex=False) & s.str.endswith("0")
    if trailing.any():
        s = s.where(~trailing, s.str.replace(r"0+$", "", regex=True, n=1))
    return s


def coerce(arr: pa.Array, env: Env, flags: dict):
    """string -> number parse mirroring joi's coerce (number.js:28-63):
    the numberRx gate, parseFloat, and — unless the unsafe flag — the
    round-trip fidelity check that flags silent precision loss as
    number.unsafe AT COERCE TIME (which aborts before rules).
    Returns (new_arr, base_fail_mask, coerce_errs)."""
    import pandas as pd

    n = len(arr)
    zeros = np.zeros(n, dtype=bool)
    if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type) or pa.types.is_decimal(arr.type):
        return arr, zeros, []
    if pa.types.is_boolean(arr.type) or not env.convert:
        return arr, ~as_bool_np(pc.is_null(arr), n), []
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        s = arr.to_pandas()
        was_null = as_bool_np(pc.is_null(arr), n)
        matched = s.str.match(NUMBER_RX, na=False)
        trimmed = s.str.strip()
        parsed = pd.to_numeric(trimmed.where(matched), errors="coerce")
        out = pa.Array.from_pandas(parsed, type=pa.float64())
        fail = (~matched.to_numpy(dtype=bool, na_value=False)) & ~was_null
        coerce_errs = []
        if not flags.get("unsafe"):
            unsafe = _roundtrip_unsafe(trimmed, parsed, matched)
            if unsafe.any():
                coerce_errs.append(("number.unsafe", unsafe))
        return out, fail, coerce_errs
    return arr, ~as_bool_np(pc.is_null(arr), n), []


def _roundtrip_unsafe(trimmed, parsed, matched) -> np.ndarray:
    """number.js:40-58: a matched numeric string is unsafe when the parsed
    double does not reproduce the written digits (normalized)."""
    import pandas as pd

    cand = matched & parsed.notna()
    n = len(trimmed)
    unsafe = np.zeros(n, dtype=bool)
    if not cand.any():
        return unsafe
    sub = trimmed[cand]
    val = parsed[cand]
    has_e = sub.str.contains("e", case=False, regex=False)
    # exponent form: rebuild `${value / 10^exp}e${exp}` and compare
    if has_e.any():
        es = sub[has_e]
        ev = val[has_e]
        exps = es.str.extract(r"[eE]([+-]?\d+)", expand=False)
        rebuilt = []
        for raw, v, ex in zip(es, ev, exps):
            p = np.power(np.float64(10.0), np.float64(int(ex)))
            with np.errstate(divide="ignore", invalid="ignore", over="ignore"):
                mant = np.float64(v) / p
            rebuilt.append(f"{js_number_to_string(float(mant))}e{ex}")
        bad = _normalize_exponent(pd.Series(rebuilt, index=es.index)) != _normalize_exponent(es)
        unsafe[es.index[bad]] = True
    plain = ~has_e
    if plain.any():
        ps = sub[plain]
        pv = val[plain]
        jsstr = pd.Series([js_number_to_string(float(v)) for v in pv], index=ps.index)
        # toString in exponent form (>=1e21 / <1e-6) skips the check
        # (number.js:49-51)
        chk = ~jsstr.str.contains("e", regex=False)
        bad = chk & (jsstr != _normalize_decimal(ps))
        unsafe[ps.index[bad]] = True
    return unsafe


def base_check(arr: pa.Array, env: Env, flags: dict):
    """Reject NaN / ±Infinity, unsafe magnitude (``number.js:67-96``),
    and apply precision rounding in convert mode."""
    n = len(arr)
    errs = []
    if pa.types.is_floating(arr.type):
        nan = as_bool_np(pc.is_nan(arr), n)
        inf = as_bool_np(pc.is_inf(arr), n)
        if nan.any():
            errs.append(("number.base", nan, {}))
        if inf.any():
            errs.append(("number.infinity", inf, {}))
        if not flags.get("unsafe"):
            finite = ~(nan | inf)
            absv = pc.abs(arr)
            unsafe = as_bool_np(pc.greater(absv, MAX_SAFE), n) & finite
            if unsafe.any():
                errs.append(("number.unsafe", unsafe, {}))
    return arr, errs


def make_compare(op: str):
    def factory(args):
        limit = args["limit"]

        def kernel(arr, env: Env) -> RuleOut:
            ok, ctx = cmp_mask(arr, op, limit, env)
            return RuleOut(ok=ok, context=ctx)

        return kernel

    return factory


def make_integer(args):
    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        if pa.types.is_integer(arr.type):
            return RuleOut(ok=np.ones(n, dtype=bool))
        ok = as_bool_np(pc.equal(arr, pc.floor(arr)), n, fill=True)
        return RuleOut(ok=ok)

    return kernel


def make_multiple(args):
    base = args["base"]

    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        # strict resolution is exact for multiple's assert (finite>0): the
        # same-type raw overlay covers errored rows, and cross-type raws
        # (strings/buffers) fail typeof===number exactly like undefined
        b, ctx = (env.resolve_ref(base, n), {"multiple": base.display}) if hasattr(base, "kind") else (base, {"multiple": base})
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        if isinstance(b, (pa.Array, pa.ChunkedArray)):
            from .util import combine as _combine

            ba = _combine(b) if isinstance(b, pa.ChunkedArray) else b
            t = ba.type
            is_num = pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_decimal(t)
            if is_num and not pa.types.is_boolean(t):
                b = np.asarray(ba.cast(pa.float64(), safe=False).to_numpy(zero_copy_only=False), dtype=np.float64)
                b = np.where(as_bool_np(pc.is_null(ba), n), np.nan, b)
                with np.errstate(invalid="ignore"):
                    refbad = ~(np.isfinite(b) & (b > 0))
            else:
                b = np.full(n, np.nan)
                refbad = np.ones(n, dtype=bool)
            if refbad.any():
                # ref arg assert (number.js:178-184): finite positive number,
                # else any.ref fires instead (validator.js:281-293)
                ctx["__ref_err__"] = (
                    refbad,
                    {"arg": "base", "ref": base.display, "reason": "must be a positive number"},
                )
        elif hasattr(base, "kind"):  # scalar resolution (context refs)
            okb = isinstance(b, (int, float)) and not isinstance(b, bool) and np.isfinite(b) and b > 0
            if not okb:
                ctx["__ref_err__"] = (
                    np.ones(n, dtype=bool),
                    {"arg": "base", "ref": base.display, "reason": "must be a positive number"},
                )
                b = np.nan
        with np.errstate(invalid="ignore", divide="ignore"):
            rem = np.mod(v, b)
            ok = np.isclose(rem, 0) | np.isclose(rem, b) | np.isnan(v)
        return RuleOut(ok=ok, context=ctx)

    return kernel


def make_port(args):
    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        ge = as_bool_np(pc.greater_equal(arr, 0), n, fill=True)
        le = as_bool_np(pc.less_equal(arr, 65535), n, fill=True)
        if pa.types.is_integer(arr.type):
            integral = np.ones(n, dtype=bool)
        else:
            integral = as_bool_np(pc.equal(arr, pc.floor(arr)), n, fill=True)
        return RuleOut(ok=ge & le & integral)

    return kernel


def make_sign(args):
    sign = args["sign"]

    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        if sign == "positive":
            ok = as_bool_np(pc.greater(arr, 0), n, fill=True)
        else:
            ok = as_bool_np(pc.less(arr, 0), n, fill=True)
        return RuleOut(ok=ok)

    return kernel


def sign_code(args) -> str:
    return "number.positive" if args["sign"] == "positive" else "number.negative"


def make_precision(args):
    limit = int(args["limit"])

    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        if pa.types.is_integer(arr.type):
            return RuleOut(ok=np.ones(n, dtype=bool), context={"limit": limit})
        # bit-exact with the reference's Math.round(v * 10^p) / 10^p
        # (number.js:84-85): float64 scaling first (0.12345 * 1e4 ->
        # 1234.5000000000002 -> 1235), JS half-up via floor(x + 0.5)
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        scale = float(10 ** limit)
        with np.errstate(invalid="ignore"):
            rounded_np = np.floor(v * scale + 0.5) / scale
        rounded = pa.array(rounded_np, type=pa.float64(), from_pandas=True)
        if env.convert:
            # convert mode rewrites (number.js:78-85)
            return RuleOut(ok=np.ones(n, dtype=bool), new_value=rounded, context={"limit": limit})
        ok = as_bool_np(pc.equal(arr, rounded), n, fill=True)
        return RuleOut(ok=ok, context={"limit": limit})

    return kernel


FACTORIES = {
    "min": make_compare("ge"),
    "max": make_compare("le"),
    "greater": make_compare("gt"),
    "less": make_compare("lt"),
    "integer": make_integer,
    "multiple": make_multiple,
    "port": make_port,
    "sign": make_sign,
    "precision": make_precision,
}

CODES = {"sign": sign_code}
