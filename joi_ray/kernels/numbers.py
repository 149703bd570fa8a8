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


def coerce(arr: pa.Array, env: Env, flags: dict):
    """string -> number parse with safe-range verification
    (``number.js:28-63``); returns (new_arr, base_fail_mask)."""
    import pandas as pd

    n = len(arr)
    if pa.types.is_floating(arr.type) or pa.types.is_integer(arr.type) or pa.types.is_decimal(arr.type):
        return arr, np.zeros(n, dtype=bool)
    if pa.types.is_boolean(arr.type) or not env.convert:
        return arr, ~as_bool_np(pc.is_null(arr), n)
    if pa.types.is_string(arr.type) or pa.types.is_large_string(arr.type):
        was_null = as_bool_np(pc.is_null(arr), n)
        parsed = pd.to_numeric(arr.to_pandas(), errors="coerce")
        out = pa.Array.from_pandas(parsed, type=pa.float64())
        fail = as_bool_np(pc.is_null(out), n) & ~was_null
        return out, fail
    return arr, ~as_bool_np(pc.is_null(arr), n)


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
        b, ctx = (env.resolve_ref(base, n), {"multiple": f"ref:{base.path}"}) if hasattr(base, "kind") else (base, {"multiple": base})
        v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
        if isinstance(b, (pa.Array, pa.ChunkedArray)):
            b = np.asarray(b.to_numpy(zero_copy_only=False), dtype=np.float64)
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
