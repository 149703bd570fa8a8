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

    @property
    def convert(self) -> bool:
        return self.prefs.get("convert", True)

    @property
    def abort_early(self) -> bool:
        return self.prefs.get("abort_early", True)

    def resolve_ref(self, r: Ref, n: int):
        """Resolve a Ref to an Arrow array (length n) or a Python scalar."""
        if r.kind == "context":
            ctx = self.prefs.get("context", {})
            if r.path not in ctx:
                raise KeyError(f"context ref ${r.path} not bound in prefs.context")
            return ctx[r.path]
        if r.kind == "ancestor":
            if not self.ancestors:
                raise KeyError(f"ancestor ref ..{r.path} with no ancestor scope")
            resolver = self.ancestors[-1]
            return resolver(r.path)
        if r.kind == "root":
            # /path: outermost (table-level) scope (lib/ref.js root prefix)
            if self.ancestors:
                return self.ancestors[0](r.path)
            if self._resolve_sibling is not None:
                return self._resolve_sibling(r.path)
            raise KeyError(f"root ref /{r.path} outside any scope")
        if self._resolve_sibling is None:
            raise KeyError(f"sibling ref {r.path} outside an object scope")
        return self._resolve_sibling(r.path)

    def child(self, resolve_sibling) -> "Env":
        e = Env(self.prefs, resolve_sibling, self.ancestors + ([self._resolve_sibling] if self._resolve_sibling else []))
        return e


def resolve_limit(limit, env: Env, n: int):
    """A rule limit may be a literal or a Ref -> (value_or_array, ctx_repr)."""
    if isinstance(limit, Ref):
        v = env.resolve_ref(limit, n)
        return v, {"limit": f"ref:{limit.path}"}
    return limit, {"limit": limit}


def cmp_mask(arr, op: str, limit, env: Env) -> tuple[np.ndarray, dict]:
    """Shared compare kernel (the analog of ``lib/types/number.js:102-120``
    and ``lib/types/date.js:56-79``): vectorized column-vs-scalar or
    column-vs-column comparison; Ref limits become sibling columns."""
    n = len(arr)
    lim, ctx = resolve_limit(limit, env, n)
    if isinstance(lim, (pa.Array, pa.ChunkedArray)):
        lim = combine(lim)
        if lim.type != arr.type:
            try:
                lim = pc.cast(lim, arr.type)
            except pa.ArrowInvalid:
                lim = pc.cast(lim, arr.type, safe=False)
    fn = {"ge": pc.greater_equal, "le": pc.less_equal, "gt": pc.greater, "lt": pc.less, "eq": pc.equal}[op]
    ok = as_bool_np(fn(arr, lim), n, fill=True)  # null limit/val -> pass (skipped by active)
    return ok, ctx
