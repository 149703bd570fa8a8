"""Non-equi joins Ray Data lacks natively.

``range_join_broadcast``: left rows matched to every interval
[lo, hi] of a dimension-sized right side (intervals may overlap — a row
can match several).  The right side is broadcast ONCE via ``ray.put``
(sorted by lo) and each batch probes it vectorized: candidate windows
come from two ``np.searchsorted`` passes against the interval starts,
then an exact mask selects matches inside the window.  No shuffle at all
— the stream stays on the left side's partitioning.

Partitioning assumptions (custom-operator rule): the right side fits the
object store comfortably (dimension-sized — band tables, SLA tiers,
bucket boundaries); per-value overlap is bounded (output is
left_rows x avg_overlap).  A large-x-large range join needs the co-sort
+ boundary-healing strategy of ``ops/asof.py`` instead — same contract,
different constant; intentionally not implemented until a use case sets
its shape.

As-of joins live in ``ops/asof.py``; both document the one all-to-all
they need (none here, one sort there).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._env import REMOTE_KWARGS


def range_join_broadcast(
    left,
    value_col: str,
    ranges: pa.Table,
    *,
    lo_col: str,
    hi_col: str,
    range_keys: Sequence[str],
    left_keep: Sequence[str] | None = None,
):
    """Inner range join: one output row per (left row, interval) with
    lo <= value <= hi.  Returns left_keep columns + range_keys columns.
    """
    import ray

    order = pc.sort_indices(ranges, sort_keys=[(lo_col, "ascending"), (hi_col, "ascending")])
    r = ranges.take(order)
    lo = r[lo_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
    hi = r[hi_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
    # max_hi_prefix[i] = max(hi[0..i]): with it, every interval that can
    # contain v lies in [first index with max_hi_prefix >= v, last index
    # with lo <= v] — two binary searches bound the probe window even when
    # intervals overlap irregularly
    max_hi_prefix = np.maximum.accumulate(hi)
    rkeys = {k: r[k].combine_chunks() for k in range_keys}
    ref = ray.put((lo, hi, max_hi_prefix, rkeys))
    keep = list(left_keep) if left_keep is not None else None

    def probe(t: pa.Table) -> pa.Table:
        lo_, hi_, maxhi, rk = ray.get(ref)
        v = t[value_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        n = len(v)
        cols = keep if keep is not None else [c for c in t.column_names]
        start = np.searchsorted(maxhi, v, side="left")
        stop = np.searchsorted(lo_, v, side="right")
        counts = np.maximum(stop - start, 0)
        total = int(counts.sum())
        if total == 0:
            out = {c: t[c].combine_chunks().take(pa.array([], pa.int64())) for c in cols}
            out.update({k: rk[k].take(pa.array([], pa.int64())) for k in rk})
            return pa.table(out)
        row_idx = np.repeat(np.arange(n), counts)
        # per-row consecutive interval indices start[i]..stop[i]-1
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        rng_idx = np.arange(total) - np.repeat(offs, counts) + np.repeat(start, counts)
        ok = (lo_[rng_idx] <= v[row_idx]) & (v[row_idx] <= hi_[rng_idx])
        row_idx, rng_idx = row_idx[ok], rng_idx[ok]
        out = {c: t[c].combine_chunks().take(pa.array(row_idx)) for c in cols}
        out.update({k: rk[k].take(pa.array(rng_idx)) for k in rk})
        return pa.table(out)

    return left.map_batches(probe, batch_format="pyarrow", **REMOTE_KWARGS)
