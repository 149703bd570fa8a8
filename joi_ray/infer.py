"""Schema inference: generate a validation Schema from observed data.

``infer_schema(table)`` proposes a schema that the observed sample
satisfies: Arrow types map to schema types, null-free columns become
``required()``, low-cardinality strings become ``valid(...)`` sets, numeric
and length ranges become min/max bounds (with configurable slack), list
columns recurse into items, struct columns into keys.  The result is a
starting point a human tightens — the inverse direction of the engine.

Distributed profiling uses the same per-batch-partial + merge pattern as the
stats sketches; ``infer_schema_ds`` works on a Ray Dataset without
materializing it.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from . import spec as jr


@dataclass
class _ColProfile:
    count: int = 0
    nulls: int = 0
    num_min: float = float("inf")
    num_max: float = float("-inf")
    len_min: int = 1 << 62
    len_max: int = 0
    distinct: set = field(default_factory=set)
    distinct_overflow: bool = False

    def merge(self, other: "_ColProfile") -> "_ColProfile":
        self.count += other.count
        self.nulls += other.nulls
        self.num_min = min(self.num_min, other.num_min)
        self.num_max = max(self.num_max, other.num_max)
        self.len_min = min(self.len_min, other.len_min)
        self.len_max = max(self.len_max, other.len_max)
        if not self.distinct_overflow:
            self.distinct |= other.distinct
            if len(self.distinct) > 64 or other.distinct_overflow:
                self.distinct_overflow = True
                self.distinct = set()
        return self


def _profile_column(arr: pa.Array, max_distinct: int = 64) -> _ColProfile:
    p = _ColProfile()
    p.count = len(arr)
    p.nulls = arr.null_count
    t = arr.type
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        if p.count > p.nulls:
            p.num_min = float(pc.min(arr).as_py())
            p.num_max = float(pc.max(arr).as_py())
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        lens = pc.utf8_length(arr)
        if p.count > p.nulls:
            p.len_min = int(pc.min(lens).as_py())
            p.len_max = int(pc.max(lens).as_py())
        u = pc.unique(arr.drop_null())
        if len(u) <= max_distinct:
            p.distinct = set(u.to_pylist())
        else:
            p.distinct_overflow = True
    return p


def _schema_for(arr: pa.Array, profile: _ColProfile, *, slack: float = 0.0, enum_threshold: int = 16,
                as_item: bool = False):
    t = arr.type
    # Array item schemas stay presence-neutral: in joi, items(X.required())
    # asserts >=1 occurrence of X in every array (array.includesRequiredUnknowns
    # on empty arrays, lib/types/array.js) — not the inferred intent.
    required = profile.nulls == 0 and profile.count > 0 and not as_item

    def presence(s):
        return s.required() if required else s

    if pa.types.is_boolean(t):
        return presence(jr.boolean())
    if pa.types.is_integer(t) or pa.types.is_floating(t):
        s = jr.number()
        if pa.types.is_integer(t):
            s = s.integer()
        if profile.num_min <= profile.num_max:
            span = max(profile.num_max - profile.num_min, 1.0)
            s = s.min(profile.num_min - slack * span).max(profile.num_max + slack * span)
        return presence(s)
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return presence(jr.date())
    if pa.types.is_binary(t) or pa.types.is_large_binary(t):
        return presence(jr.binary())
    if pa.types.is_string(t) or pa.types.is_large_string(t):
        if not profile.distinct_overflow and 0 < len(profile.distinct) <= enum_threshold:
            return presence(jr.string().valid(*sorted(profile.distinct)))
        s = jr.string()
        if profile.len_min <= profile.len_max and profile.len_max > 0:
            s = s.min(max(profile.len_min, 1)).max(profile.len_max)
            if profile.len_min == 0:
                s = s.allow("")  # sample contains empty strings
        return presence(s)
    if pa.types.is_list(t) or pa.types.is_large_list(t):
        flat = pc.list_flatten(arr)
        item_schema = _schema_for(flat, _profile_column(flat), slack=slack, enum_threshold=enum_threshold,
                                  as_item=True)
        s = jr.array().items(item_schema)
        if flat.null_count:
            s = s.sparse()
        return presence(s)
    if pa.types.is_struct(t):
        keys = {}
        for f in t:
            child = pc.struct_field(arr, f.name)
            keys[f.name] = _schema_for(child, _profile_column(child), slack=slack, enum_threshold=enum_threshold)
        return presence(jr.object(keys))
    return presence(jr.any_())


def infer_schema(tbl: pa.Table, *, slack: float = 0.0, enum_threshold: int = 16) -> jr.Schema:
    """Infer an object schema from an Arrow table sample."""
    keys = {}
    for name in tbl.column_names:
        arr = tbl[name].combine_chunks()
        keys[name] = _schema_for(arr, _profile_column(arr), slack=slack, enum_threshold=enum_threshold)
    return jr.object(keys)


def infer_schema_ds(ds, *, slack: float = 0.0, enum_threshold: int = 16, sample_blocks: int = 16) -> jr.Schema:
    """Infer from a Ray Dataset via streamed per-batch profiles (numeric /
    length / distinct merging); nested structure inferred from one sample
    batch (structure is schema-level, not data-level)."""
    profiles: dict[str, _ColProfile] = {}
    sample_batch = None
    for i, batch in enumerate(ds.iter_batches(batch_size=8192, batch_format="pyarrow")):
        if sample_batch is None:
            sample_batch = batch
        for name in batch.column_names:
            p = _profile_column(batch[name].combine_chunks())
            profiles[name] = profiles[name].merge(p) if name in profiles else p
        if i + 1 >= sample_blocks:
            break
    keys = {}
    for name, prof in profiles.items():
        arr = sample_batch[name].combine_chunks()
        keys[name] = _schema_for(arr, prof, slack=slack, enum_threshold=enum_threshold)
    return jr.object(keys)
