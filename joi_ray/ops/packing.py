"""Deterministic sequence packing for pretraining-data preparation.

``pack_sequences`` assigns every document to a fixed-token-budget
sequence bin: documents are taken in ``id_col`` order and a doc joins
bin ``cumulative_tokens_before_it // budget`` (assignment by starting
offset — the streaming concatenate-and-split layout).  The mapping is a
pure function of (ids, token counts, budget): independent of sharding,
batch sizes, or execution order, so a resumed run packs identically.

Scale shape (the events_running carry pattern, global variant): ONE
distributed sort by id, pass A emits a single (first_id, block_total)
descriptor row per BLOCK, the driver prefix-sums descriptors (state ∝
block count, never rows), and pass B re-scans the same materialized
blocks adding the broadcast per-block offset to an in-block vectorized
cumsum.  No corpus-sized driver state, no per-group shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def token_counts(batch: pa.Table, text_col: str = "text",
                 out_col: str = "n_tok") -> pa.Table:
    """Whitespace token count per row (split keeps empties — mirrors SQL
    ``len(string_split(text, ' '))``)."""
    s = pc.fill_null(batch[text_col].combine_chunks(), "")
    n = pc.list_value_length(pc.split_pattern(s, " "))
    return batch.append_column(out_col, pc.cast(n, pa.int64()))


def pack_sequences(ds, budget: int, *, id_col: str = "doc_id",
                   count_col: str = "n_tok", min_blocks: int = 12):
    """Append ``seq_id`` = (tokens before this doc in id order) // budget.

    ``ds`` must already carry ``count_col`` (see ``token_counts``) and
    have unique ``id_col`` values (the sort key that makes the running
    sum well-defined).  Returns the sorted dataset with ``seq_id`` and
    ``seq_offset`` (the doc's starting token offset within its bin).
    """
    import ray

    from .._env import REMOTE_KWARGS

    sorted_ds = ds.sort(id_col).materialize()
    # fixture scale: split small outputs so the carry path is exercised;
    # at scale the sort already yields many blocks and this is a no-op
    if sorted_ds.num_blocks() < min_blocks:
        sorted_ds = sorted_ds.repartition(min_blocks).materialize()

    def pass_a(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        c = t[count_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        fid = t[id_col].combine_chunks()[0].as_py()
        return pa.table({"first_id": pa.array([fid]),
                         "total": pa.array([int(c.sum())], pa.int64())})

    descs = [t for t in ray.get(
        sorted_ds.map_batches(pass_a, batch_format="pyarrow", batch_size=None,
                              **REMOTE_KWARGS).to_arrow_refs()) if t.num_rows]
    dd = pa.concat_tables(descs).to_pandas().sort_values("first_id")
    starts = np.concatenate([[0], np.cumsum(dd["total"].to_numpy())[:-1]])
    offsets = dict(zip(dd["first_id"].tolist(), starts.tolist()))
    oref = ray.put(offsets)

    def pass_b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return (t.append_column("seq_id", pa.array([], pa.int64()))
                     .append_column("seq_offset", pa.array([], pa.int64())))
        offs = ray.get(oref)
        c = t[count_col].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        before = offs[t[id_col].combine_chunks()[0].as_py()] + np.concatenate(
            [[0], np.cumsum(c)[:-1]])
        return (t.append_column("seq_id", pa.array(before // budget))
                 .append_column("seq_offset", pa.array(before % budget)))

    return sorted_ds.map_batches(pass_b, batch_format="pyarrow", batch_size=None,
                                 **REMOTE_KWARGS)
