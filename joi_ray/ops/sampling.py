"""Deterministic sampling / split assignment for training-data curation.

``hash_split`` assigns every row to a named split (train/val/test by
default) from a multiplicative hash of its id — stable across runs,
machines, and partitionings (no RNG state, no ordering dependence), so a
resumed or re-sharded 100-TB run reproduces byte-identical splits.  The
hash is plain 64-bit integer arithmetic (Fibonacci-multiplier mix, the
same family as ``ops.multimodal.synth_media_payload``) so an oracle can
recompute assignments in SQL.

Scale shape: a stateless one-column ``map_batches`` — no shuffle, no
driver state; downstream consumers filter or partition on the ``split``
column (e.g. ``write_parquet(partition_cols=["split"])``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# splitmix64 (Steele et al., public domain) — a full avalanche mix, so
# sequential ids land binomially in the buckets (a single multiplicative
# round left 3%-level discrepancy on id ranges).  SQL-mirrorable: each
# 64x64 multiply mod 2^64 decomposes into HUGEINT-safe 32-bit halves (see
# the hash_split_counts oracle in __ray_entry__).
_INC = np.uint64(0x9E3779B97F4A7C15)
_M1 = np.uint64(0xBF58476D1CE4E5B9)
_M2 = np.uint64(0x94D049BB133111EB)
_BUCKETS = 10_000

DEFAULT_SPLITS = {"train": 0.98, "val": 0.01, "test": 0.01}


def split_buckets(ids: np.ndarray) -> np.ndarray:
    """id -> bucket in [0, 10000) via splitmix64(id) % 10000."""
    with np.errstate(over="ignore"):
        z = ids.astype(np.uint64) + _INC
        z = (z ^ (z >> np.uint64(30))) * _M1
        z = (z ^ (z >> np.uint64(27))) * _M2
        z = z ^ (z >> np.uint64(31))
    return (z % np.uint64(_BUCKETS)).astype(np.int64)


def hash_split_batch(
    batch: pa.Table,
    id_col: str = "doc_id",
    *,
    splits: dict[str, float] | None = None,
    out_col: str = "split",
) -> pa.Table:
    """Append a ``split`` column.  ``splits`` maps name -> fraction (must sum
    to <= 1; any remainder falls into the last split).  Assignment is by
    cumulative bucket thresholds in dict order."""
    splits = splits or DEFAULT_SPLITS
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    b = split_buckets(np.asarray(ids))
    names = list(splits)
    edges = np.cumsum([splits[n] for n in names]) * _BUCKETS
    idx = np.searchsorted(edges, b, side="right")
    idx = np.minimum(idx, len(names) - 1)
    labels = pa.array(np.array(names, dtype=object)[idx].tolist(), pa.string())
    return batch.append_column(out_col, labels)


def hash_split(ds, id_col: str = "doc_id", *, splits: dict[str, float] | None = None,
               out_col: str = "split"):
    """Dataset form: append deterministic split labels (stateless map)."""
    from .._env import REMOTE_KWARGS

    return ds.map_batches(
        lambda t: hash_split_batch(t, id_col, splits=splits, out_col=out_col),
        batch_format="pyarrow",
        **REMOTE_KWARGS,
    )


def stratified_sample_batch(
    batch: pa.Table,
    strata_col: str = "lang",
    *,
    rates: dict[str, float],
    default_rate: float = 1.0,
    id_col: str = "doc_id",
    salt: int = 0x5A17,
) -> pa.Table:
    """Filter the batch to a deterministic per-stratum sample: keep a row
    iff ``splitmix64(id XOR salt) % 10000 < rate[stratum] * 10000``.

    The salt decorrelates sampling from ``hash_split`` (same id, different
    hash input), so downsampling a language never skews the train/val/test
    ratio within it.  Like ``hash_split`` this is stable under resharding
    and resume, and the XOR+splitmix pipeline stays SQL-mirrorable."""
    ids = batch[id_col].combine_chunks().to_numpy(zero_copy_only=False)
    b = split_buckets(np.asarray(ids, np.int64) ^ np.int64(salt))
    strata = batch[strata_col].combine_chunks()
    names = list(rates)
    idx = pc.index_in(strata, value_set=pa.array(names, strata.type))
    thr = np.array([rates[n] for n in names] + [default_rate]) * _BUCKETS
    pos = idx.to_numpy(zero_copy_only=False)
    pos = np.where(np.isnan(pos) if pos.dtype.kind == "f" else pos < 0, len(names), pos)
    keep = b < thr[pos.astype(np.int64)]
    return batch.filter(pa.array(keep))


def stratified_sample(ds, strata_col: str = "lang", *, rates: dict[str, float],
                      default_rate: float = 1.0, id_col: str = "doc_id",
                      salt: int = 0x5A17):
    """Dataset form: deterministic per-stratum downsampling (language
    rebalancing) — a stateless filter map, no shuffle, no RNG state."""
    from .._env import REMOTE_KWARGS

    return ds.map_batches(
        lambda t: stratified_sample_batch(
            t, strata_col, rates=rates, default_rate=default_rate,
            id_col=id_col, salt=salt),
        batch_format="pyarrow",
        **REMOTE_KWARGS,
    )
