"""Distributed as-of join (backward, inclusive): each left row matched to
the latest right row with the same ``by`` key and ``on``-key <= the left
row's.

Scale design (NO analog in the reference — @hapi/joi has no cross-record
operators, SURVEY.md §2.6; this exists for the north rule's pipeline
surface): neither side is ever driver-materialized.  Both sides are tagged
(``side`` 0 = right, 1 = left — right sorts first at equal keys, giving
backward-inclusive semantics), unioned, and globally sorted ONCE by
``(by, on, side, tiebreak)``.  Pass A emits one descriptor row per BLOCK
(first-row key for global order reconstruction + the last right values of
the block's last ``by`` group); the driver walks descriptors in order
accumulating a carry — only a block's FIRST ``by`` group can continue from
earlier blocks under the sort, so driver state is ∝ block count, never row
count (the events_running carry pattern).  Pass B re-scans the same
materialized blocks (``batch_size=None`` -> batch == block, deterministic
across passes), runs a vectorized per-group last-value forward fill
(``pandas`` C-level groupby-ffill), applies the broadcast carry to the
first group's unmatched prefix, and emits left rows only.

Partitioning assumptions (documented per the repo's custom-operator rule):
- ``(by, on, side, tiebreak)`` uniquely orders rows; callers pass a
  per-side ``tiebreak`` column (e.g. an id) to break ``on`` ties so block
  descriptors address blocks unambiguously.
- The global sort is the one all-to-all exchange; everything after is
  per-block + a blocks-sized driver walk + one small broadcast.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from .._env import REMOTE_KWARGS


def _as_sort_key(col: pa.ChunkedArray) -> pa.ChunkedArray:
    """Normalize temporal/date columns to int64 so both sides compare on
    one scale; numeric columns cast to int64 unchanged."""
    t = col.type
    if pa.types.is_timestamp(t):
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    if pa.types.is_date(t):
        return pc.cast(pc.cast(col, pa.timestamp("us")), pa.int64())
    return pc.cast(col, pa.int64())


def asof_join(
    left,
    right,
    *,
    left_by: str,
    right_by: str,
    left_on: str,
    right_on: str,
    left_tiebreak: str,
    right_tiebreak: str,
    right_values: Sequence[str],
    left_keep: Sequence[str] | None = None,
    min_blocks: int = 0,
):
    """Backward-inclusive as-of join of two Datasets.

    Returns a Dataset of ``left_keep`` (default: all left columns passed
    in) plus one column per ``right_values`` entry holding the matched
    right value (null when the ``by`` group has no earlier right row).
    ``min_blocks`` > 0 forces a repartition at fixture scale so the
    carry-healing path is exercised in tests; at scale the sort already
    yields many blocks and this should stay 0.
    """
    import ray
    import ray.data as rd

    left_keep = list(left_keep) if left_keep is not None else None
    rvals = list(right_values)

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "_by": t[left_by],
            "_on": _as_sort_key(t[left_on].combine_chunks()),
            "_side": pa.array(np.ones(n, np.int8)),
            "_tb": pc.cast(t[left_tiebreak].combine_chunks(), pa.int64()),
        }
        for c in lkeep:
            cols[f"l_{c}"] = t[c]
        for v in rvals:
            cols[f"r_{v}"] = pa.nulls(n, pa.float64())
        return pa.table(cols)

    # left payload columns ride as nulls on right rows (schemas must match
    # for the union); capture names+types driver-side — a Dataset must
    # never leak into a UDF closure
    lschema = left.schema()
    lkeep = left_keep if left_keep is not None else list(lschema.names)
    ltypes = {c: lschema.types[lschema.names.index(c)] for c in lkeep}

    def tag_right_full(t: pa.Table) -> pa.Table:
        n = t.num_rows
        cols = {
            "_by": t[right_by],
            "_on": _as_sort_key(t[right_on].combine_chunks()),
            "_side": pa.array(np.zeros(n, np.int8)),
            "_tb": pc.cast(t[right_tiebreak].combine_chunks(), pa.int64()),
        }
        for c in lkeep:
            cols[f"l_{c}"] = pa.nulls(n, ltypes[c])
        for v in rvals:
            cols[f"r_{v}"] = pc.cast(t[v].combine_chunks(), pa.float64())
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow", **REMOTE_KWARGS)
    rt = right.map_batches(tag_right_full, batch_format="pyarrow", **REMOTE_KWARGS)
    ds = lt.union(rt).sort(["_by", "_on", "_side", "_tb"]).materialize()
    if min_blocks and ds.num_blocks() < min_blocks:
        ds = ds.repartition(min_blocks).materialize()

    nv = len(rvals)

    by_type = lschema.types[lschema.names.index(left_by)]

    def pass_a(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "bk_by": pa.array([], by_type), "bk_on": pa.array([], pa.int64()),
                "bk_side": pa.array([], pa.int8()), "bk_tb": pa.array([], pa.int64()),
                "first_by": pa.array([], by_type), "last_by": pa.array([], by_type),
                "has_right_last": pa.array([], pa.bool_()),
                **{f"lastval_{i}": pa.array([], pa.float64()) for i in range(nv)},
            })
        by = t["_by"].combine_chunks()
        side = t["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        last_by_scalar = by[len(by) - 1]
        is_last = pc.equal(by, last_by_scalar).to_numpy(zero_copy_only=False)
        mask = is_last & (side == 0)
        has_right_last = bool(mask.any())
        lastvals = []
        if has_right_last:
            idx = int(np.nonzero(mask)[0][-1])
            for v in rvals:
                lastvals.append(t[f"r_{v}"][idx].as_py())
        else:
            lastvals = [None] * nv
        return pa.table({
            "bk_by": by.slice(0, 1),
            "bk_on": t["_on"].slice(0, 1),
            "bk_side": t["_side"].slice(0, 1),
            "bk_tb": t["_tb"].slice(0, 1),
            "first_by": by.slice(0, 1),
            "last_by": by.slice(len(by) - 1, 1),
            "has_right_last": pa.array([has_right_last]),
            **{f"lastval_{i}": pa.array([lastvals[i]], pa.float64()) for i in range(nv)},
        })

    desc_tbls = [t for t in ray.get(
        ds.map_batches(pass_a, batch_format="pyarrow", batch_size=None,
                       **REMOTE_KWARGS).to_arrow_refs())
        if t.num_rows > 0]  # empty blocks yield schema-less empty tables
    descs = (pa.concat_tables(desc_tbls)
             .to_pandas().sort_values(["bk_by", "bk_on", "bk_side", "bk_tb"])
             .reset_index(drop=True)) if desc_tbls else pd.DataFrame()

    # driver walk: carry = (by value, last right values seen for it); only
    # the next block's FIRST group can consume it.  State ∝ block count.
    offsets: dict[tuple, tuple] = {}
    carry_by, carry_vals = None, None
    for r in descs.itertuples(index=False):
        incoming = carry_vals if (carry_by == r.first_by and carry_vals is not None) else None
        if incoming is not None:
            offsets[(r.bk_by, int(r.bk_on), int(r.bk_side), int(r.bk_tb))] = incoming
        if r.has_right_last:
            carry_vals = tuple(getattr(r, f"lastval_{i}") for i in range(nv))
        elif r.last_by == r.first_by:
            carry_vals = incoming
        else:
            carry_vals = None
        carry_by = r.last_by
    oref = ray.put(offsets)

    def pass_b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                **{c: pa.array([], ltypes[c]) for c in lkeep},
                **{v: pa.array([], pa.float64()) for v in rvals},
            })
        offs = ray.get(oref)
        by_arr = t["_by"].combine_chunks()
        by = by_arr.to_pandas()
        side = t["_side"].combine_chunks().to_numpy(zero_copy_only=False)
        df = pd.DataFrame({"_by": by})
        for v in rvals:
            vals = t[f"r_{v}"].combine_chunks().to_pandas()
            vals[side != 0] = np.nan
            df[v] = vals
        filled = df.groupby("_by", sort=False).ffill()
        key = (by_arr[0].as_py(), int(t["_on"][0].as_py()),
               int(t["_side"][0].as_py()), int(t["_tb"][0].as_py()))
        carry = offs.get(key)
        if carry is not None:
            first_grp = (by == by.iloc[0]).to_numpy()
            for i, v in enumerate(rvals):
                col = filled[v].to_numpy()
                fill_mask = first_grp & np.isnan(col)
                if fill_mask.any() and carry[i] is not None:
                    col[fill_mask] = carry[i]
                    filled[v] = col
        is_left = side == 1
        keep_idx = pa.array(np.nonzero(is_left)[0])
        out_cols = {}
        for c in lkeep:
            out_cols[c] = t[f"l_{c}"].combine_chunks().take(keep_idx)
        for v in rvals:
            out_cols[v] = pa.array(filled[v].to_numpy()[is_left], pa.float64())
        return pa.table(out_cols)

    return ds.map_batches(pass_b, batch_format="pyarrow", batch_size=None, **REMOTE_KWARGS)
