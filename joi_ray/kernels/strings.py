"""Vectorized string rule kernels.

Re-expresses the reference's string type (``/root/reference/lib/types/string/
index.js``, 821 LoC) as Arrow compute kernels.  Every kernel is a *factory*:
compile-time work (regex construction, value-set building) happens once when
the schema is compiled — the analog of joi precompiling regexes at
schema-build time (``lib/types/string/index.js:298-300,346,691-692``) — and
the returned closure runs per batch.  Factories are held in actor state by
the pipeline's validator pool, so this cost is paid once per actor.
"""

from __future__ import annotations

import functools
import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .util import Env, RuleOut, as_bool_np, cmp_mask, combine


@functools.lru_cache(maxsize=512)
def _py_regex(pattern: str) -> "re.Pattern":
    return re.compile(pattern)


def regex_mask(arr: pa.Array, pattern: str) -> np.ndarray:
    """Regex match -> bool mask.  Arrow's RE2 engine first (C++-vectorized);
    Python ``re`` via pandas as fallback for RE2-unsupported syntax
    (lookaround, backreferences)."""
    n = len(arr)
    try:
        return as_bool_np(pc.match_substring_regex(arr, pattern), n)
    except pa.ArrowInvalid:
        pat = _py_regex(pattern)
        s = arr.to_pandas()
        return s.str.match(pat).fillna(False).to_numpy(dtype=bool)


def _lengths(arr: pa.Array) -> pa.Array:
    return pc.utf8_length(arr)


# --------------------------------------------------------------------------
# factories: name -> factory(args) -> kernel(arr, env) -> RuleOut

_ALPHANUM = r"^[a-zA-Z0-9]+$"
_TOKEN = r"^\w+$"
_HEX = r"^[0-9a-fA-F]+$"

# base64 variants — the reference's four regexes verbatim
# (lib/types/string/index.js:14-24): paddingRequired forms require the
# '='/'==' tail; the non-required forms make padding OPTIONAL, not forbidden.
_B64_STD_PAD = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
_B64_STD_NOPAD = r"^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}(?:==)?|[A-Za-z0-9+/]{3}=?)?$"
_B64_URL_PAD = r"^(?:[A-Za-z0-9\-_]{4})*(?:[A-Za-z0-9\-_]{2}==|[A-Za-z0-9\-_]{3}=)?$"
_B64_URL_NOPAD = r"^(?:[A-Za-z0-9\-_]{4})*(?:[A-Za-z0-9\-_]{2}(?:==)?|[A-Za-z0-9\-_]{3}=?)?$"

_EMAIL = r"^[A-Za-z0-9!#$%&'*+/=?^_`{|}~.\-]+@[A-Za-z0-9](?:[A-Za-z0-9\-]{0,61}[A-Za-z0-9])?(?:\.[A-Za-z0-9](?:[A-Za-z0-9\-]{0,61}[A-Za-z0-9])?)+$"
_HOST_LABEL = r"[a-zA-Z0-9](?:[a-zA-Z0-9\-]{0,61}[a-zA-Z0-9])?"
_HOSTNAME = rf"^{_HOST_LABEL}(?:\.{_HOST_LABEL})*$"
_DOMAIN = rf"^{_HOST_LABEL}(?:\.{_HOST_LABEL})+$"

_UUID_HEX = "[0-9a-fA-F]"
# joi guid: optional matching {} or [] wrapping (lib/types/string/index.js:320-365);
# RE2 has no backreferences, so enumerate the three wrapped forms.


def _guid_pattern(versions: list[int] | None) -> str:
    v = f"[{''.join(str(x) for x in versions)}]" if versions else _UUID_HEX
    core = f"{_UUID_HEX}{{8}}-{_UUID_HEX}{{4}}-{v}{_UUID_HEX}{{3}}-[89abAB]{_UUID_HEX}{{3}}-{_UUID_HEX}{{12}}"
    if not versions:
        core = f"{_UUID_HEX}{{8}}-{_UUID_HEX}{{4}}-{_UUID_HEX}{{4}}-{_UUID_HEX}{{4}}-{_UUID_HEX}{{12}}"
    return rf"^(?:{core}|\{{{core}\}}|\[{core}\])$"


_IPV4 = r"(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)(?:\.(?:25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)){3}"
# RE2-safe IPv6 (full + :: compressed forms, pragmatic)
_H16 = r"[0-9a-fA-F]{1,4}"
_IPV6 = (
    rf"(?:(?:{_H16}:){{7}}{_H16}"
    rf"|(?:{_H16}:){{1,7}}:"
    rf"|(?:{_H16}:){{1,6}}:{_H16}"
    rf"|(?:{_H16}:){{1,5}}(?::{_H16}){{1,2}}"
    rf"|(?:{_H16}:){{1,4}}(?::{_H16}){{1,3}}"
    rf"|(?:{_H16}:){{1,3}}(?::{_H16}){{1,4}}"
    rf"|(?:{_H16}:){{1,2}}(?::{_H16}){{1,5}}"
    rf"|{_H16}:(?::{_H16}){{1,6}}"
    rf"|:(?:(?::{_H16}){{1,7}}|:)"
    rf"|::(?:[fF]{{4}}:)?{_IPV4})"
)

_ISO_DATE = (
    r"^\d{4}-\d{2}-\d{2}"
    r"(?:[T ]\d{2}:\d{2}(?::\d{2}(?:\.\d{1,6})?)?(?:Z|[+\-]\d{2}:?\d{2})?)?$"
)

_ISO_DURATION_SHAPE = r"^P(?:\d+Y)?(?:\d+M)?(?:\d+W)?(?:\d+D)?(?:T(?:\d+H)?(?:\d+M)?(?:\d+(?:\.\d+)?S)?)?$"

_URI_ABS = r"^[a-zA-Z][a-zA-Z0-9+.\-]*:[^\s]*$"
_URI_REL = r"^[^\s:]*$"

_DATA_URI = r"^data:[\w+.\-]+/[\w+.\-]+(?:;[\w.\-]+=[^;,]+)*(?:;base64)?,[A-Za-z0-9+/=%.\-~!$&'()*,;:@?_ ]*$"


def _regex_rule(pattern: str, code: str, ctx: dict | None = None):
    def factory(args: dict):
        def kernel(arr, env: Env) -> RuleOut:
            return RuleOut(ok=regex_mask(arr, pattern), context=ctx or {})

        return kernel

    return factory


def _measure(arr: pa.Array, encoding: str | None):
    """Char length by default; byte length when encoding='utf8'
    (the reference's Buffer.byteLength path, string/index.js:510-556)."""
    if encoding in ("utf8", "utf-8"):
        return pc.binary_length(pc.cast(arr, pa.binary()))
    return _lengths(arr)


def _len_rule(op: str):
    def factory(args):
        enc = args.get("encoding")

        def kernel(arr, env: Env) -> RuleOut:
            ok, ctx = cmp_mask(_measure(arr, enc), op, args["limit"], env)
            return RuleOut(ok=ok, context=ctx)

        return kernel

    return factory


make_min = _len_rule("ge")
make_max = _len_rule("le")
make_length = _len_rule("eq")


def make_pattern(args):
    pattern = args["regex"]
    invert = bool(args.get("invert"))
    name = args.get("name")

    def kernel(arr, env: Env) -> RuleOut:
        m = regex_mask(arr, pattern)
        ok = ~m if invert else m
        return RuleOut(ok=ok, context={"name": name, "regex": pattern})

    return kernel


def pattern_code(args) -> str:
    invert = bool(args.get("invert"))
    name = args.get("name")
    return "string.pattern." + (("invert." if invert else "") + ("name" if name else "base"))


def make_base64(args):
    pad = args.get("paddingRequired", True)
    url = args.get("urlSafe", False)
    pattern = (_B64_URL_PAD if pad else _B64_URL_NOPAD) if url else (_B64_STD_PAD if pad else _B64_STD_NOPAD)

    def kernel(arr, env: Env) -> RuleOut:
        ok = regex_mask(arr, pattern) & (as_bool_np(pc.greater(_lengths(arr), 0), len(arr)))
        return RuleOut(ok=ok)

    return kernel


def make_email(args):
    tlds = args.get("tlds")
    multiple = args.get("multiple", False)
    sep = args.get("separator", ",") or ","
    tld_set = {t.lower() for t in tlds} if tlds else None

    def check_one(arr, n):
        ok = regex_mask(arr, _EMAIL)
        if tld_set:
            # extract the final label and require set membership
            tld = pc.extract_regex(arr, r"\.(?P<tld>[A-Za-z0-9\-]+)$")
            tl = pc.struct_field(tld, "tld")
            in_set = as_bool_np(
                pc.is_in(pc.utf8_lower(tl), value_set=pa.array(sorted(tld_set))), n
            )
            ok &= in_set
        return ok

    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        if not multiple:
            return RuleOut(ok=check_one(arr, n))
        # multiple addresses separated by `sep`: explode and re-and per row
        s = arr.to_pandas().str.split(sep)
        ok = np.ones(n, dtype=bool)
        flat, parent = [], []
        for i, parts in enumerate(s):
            if isinstance(parts, list):
                for p in parts:
                    flat.append(p.strip())
                    parent.append(i)
        if flat:
            fm = check_one(pa.array(flat, type=pa.string()), len(flat))
            bad = np.asarray(parent)[~fm]
            ok[bad] = False
        return RuleOut(ok=ok)

    return kernel


def make_guid(args):
    versions = args.get("version")
    pattern = _guid_pattern(versions)

    def kernel(arr, env: Env) -> RuleOut:
        return RuleOut(ok=regex_mask(arr, pattern), context={"version": versions})

    return kernel


def make_ip(args):
    versions = args.get("version") or ["ipv4", "ipv6"]
    cidr = args.get("cidr", "optional")
    parts = []
    if "ipv4" in versions:
        parts.append(_IPV4)
    if "ipv6" in versions:
        parts.append(_IPV6)
    addr = "(?:" + "|".join(parts) + ")"
    suffix = {"optional": r"(?:/\d{1,3})?", "required": r"/\d{1,3}", "forbidden": ""}[cidr]
    pattern = rf"^{addr}{suffix}$"

    def kernel(arr, env: Env) -> RuleOut:
        return RuleOut(ok=regex_mask(arr, pattern), context={"cidr": cidr, "version": versions})

    return kernel


def ip_code(args) -> str:
    return "string.ipVersion" if args.get("version") else "string.ip"


def make_uri(args):
    schemes = args.get("scheme")
    allow_rel = args.get("allowRelative", False)
    rel_only = args.get("relativeOnly", False)
    if schemes:
        scheme_re = "|".join(re.escape(s) if not s.endswith("*") else re.escape(s[:-1]) + r"[a-zA-Z0-9+.\-]*" for s in schemes)
        pattern = rf"^(?:{scheme_re}):[^\s]*$"
    elif rel_only:
        pattern = _URI_REL
    elif allow_rel:
        pattern = rf"(?:{_URI_ABS[1:-1]})|(?:{_URI_REL[1:-1]})"
        pattern = rf"^(?:[a-zA-Z][a-zA-Z0-9+.\-]*:[^\s]*|[^\s:]*)$"
    else:
        pattern = _URI_ABS

    def kernel(arr, env: Env) -> RuleOut:
        ok = regex_mask(arr, pattern) & as_bool_np(pc.greater(_lengths(arr), 0), len(arr))
        return RuleOut(ok=ok, context={"scheme": schemes})

    return kernel


def uri_code(args) -> str:
    if args.get("scheme"):
        return "string.uriCustomScheme"
    if args.get("relativeOnly"):
        return "string.uriRelativeOnly"
    return "string.uri"


def make_iso_date(args):
    def kernel(arr, env: Env) -> RuleOut:
        import pandas as pd

        shape_ok = regex_mask(arr, _ISO_DATE)
        parsed = pd.to_datetime(arr.to_pandas(), errors="coerce", utc=True, format="ISO8601")
        valid = parsed.notna().to_numpy()
        ok = shape_ok & valid
        if env.convert and ok.any():
            # convert mode normalizes to canonical ISO 8601
            # (string/index.js:479-493 coerce step)
            iso = parsed.dt.strftime("%Y-%m-%dT%H:%M:%S.%f").str.slice(0, 23) + "Z"
            out = pd.Series(arr.to_pylist())
            out[ok] = iso[ok]
            return RuleOut(ok=ok, new_value=pa.array(out, type=pa.string()))
        return RuleOut(ok=ok)

    return kernel


def make_iso_duration(args):
    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        shape = regex_mask(arr, _ISO_DURATION_SHAPE)
        # RE2 has no lookahead: additionally require at least one component
        # and no dangling 'T' (joi: /^P(?!$)...(?!$)/, lib string index:495-508)
        nonempty = ~regex_mask(arr, r"^P$") & ~regex_mask(arr, r"T$")
        return RuleOut(ok=shape & nonempty)

    return kernel


def make_credit_card(args):
    def kernel(arr, env: Env) -> RuleOut:
        n = len(arr)
        shape = regex_mask(arr, r"^\d{8,19}$")
        ok = shape.copy()
        idx = np.nonzero(shape)[0]
        if len(idx):
            s = arr.take(pa.array(idx)).to_pandas().str.zfill(19)
            # vectorized Luhn: leading zeros don't change the checksum
            buf = "".join(s.tolist()).encode()
            digits = np.frombuffer(buf, dtype=np.uint8).reshape(len(idx), 19) - 48
            # double every second digit from the right (indices 17,15,...)
            doubled = digits.copy()
            cols = np.arange(19)
            dbl_cols = (18 - cols) % 2 == 1
            d2 = digits[:, dbl_cols] * 2
            d2 = np.where(d2 > 9, d2 - 9, d2)
            doubled[:, dbl_cols] = d2
            luhn_ok = doubled.sum(axis=1) % 10 == 0
            ok[idx[~luhn_ok]] = False
        return RuleOut(ok=ok)

    return kernel


def make_case(args):
    direction = args["direction"]
    fn = pc.utf8_lower if direction == "lower" else pc.utf8_upper

    def kernel(arr, env: Env) -> RuleOut:
        if env.convert:
            return RuleOut(ok=np.ones(len(arr), dtype=bool), new_value=fn(arr))
        ok = as_bool_np(pc.equal(arr, fn(arr)), len(arr))
        return RuleOut(ok=ok, context={"direction": direction})

    return kernel


def case_code(args) -> str:
    return "string.lowercase" if args["direction"] == "lower" else "string.uppercase"


def make_trim(args):
    enabled = args.get("enabled", True)

    def kernel(arr, env: Env) -> RuleOut:
        if not enabled:
            return RuleOut(ok=np.ones(len(arr), dtype=bool))
        trimmed = pc.utf8_trim_whitespace(arr)
        if env.convert:
            return RuleOut(ok=np.ones(len(arr), dtype=bool), new_value=trimmed)
        return RuleOut(ok=as_bool_np(pc.equal(arr, trimmed), len(arr)))

    return kernel


def make_normalize(args):
    form = args.get("form", "NFC")

    def kernel(arr, env: Env) -> RuleOut:
        s = arr.to_pandas()
        normed = s.str.normalize(form)
        if env.convert:
            return RuleOut(
                ok=np.ones(len(arr), dtype=bool),
                new_value=pa.Array.from_pandas(normed, type=arr.type),
            )
        ok = (s == normed) | s.isna()
        return RuleOut(ok=ok.to_numpy(dtype=bool), context={"form": form})

    return kernel


def apply_replacements(arr: pa.Array, replacements: list[dict]) -> pa.Array:
    """Coerce-time replace list (``lib/types/string/index.js:606-625``):
    literal substring replace for plain patterns (joi string semantics),
    regex replace for compiled patterns."""
    for r in replacements:
        if r.get("literal"):
            arr = pc.replace_substring(arr, r["pattern"], r["replacement"])
        else:
            arr = pc.replace_substring_regex(arr, r["pattern"], r["replacement"])
    return arr


def truncate_to(arr: pa.Array, limit: int) -> pa.Array:
    return pc.utf8_slice_codeunits(arr, 0, limit)


FACTORIES = {
    "min": make_min,
    "max": make_max,
    "length": make_length,
    "pattern": make_pattern,
    "alphanum": _regex_rule(_ALPHANUM, "string.alphanum"),
    "token": _regex_rule(_TOKEN, "string.token"),
    "hex": _regex_rule(_HEX, "string.hex"),
    "base64": make_base64,
    "dataUri": _regex_rule(_DATA_URI, "string.dataUri"),
    "email": make_email,
    "domain": _regex_rule(_DOMAIN, "string.domain"),
    "hostname": _regex_rule(_HOSTNAME, "string.hostname"),
    "guid": make_guid,
    "ip": make_ip,
    "uri": make_uri,
    "isoDate": make_iso_date,
    "isoDuration": make_iso_duration,
    "creditCard": make_credit_card,
    "case": make_case,
    "trim": make_trim,
    "normalize": make_normalize,
}

# error code per rule (default: "string.<name>")
CODES = {
    "pattern": pattern_code,
    "ip": ip_code,
    "uri": uri_code,
    "case": case_code,
    "guid": lambda a: "string.guid",
}

# rules that rewrite the value in convert mode and therefore run in the
# coerce phase in canonical order (lib/types/string/index.js:68-135)
CONVERT_ORDER = ["normalize", "case", "trim"]
