"""Worker-environment defaults for Ray stages.

Ray workers inherit the raylet's cwd (set at ``ray.init``), and ``joi_ray``
resolves via that cwd when the driver runs from the repo root.  When the
driver's cwd is elsewhere, stage callables defined in ``joi_ray`` fail to
unpickle in workers (ModuleNotFoundError) and actor pools retry forever.

``ensure_importable()`` detects that case and fills ``REMOTE_KWARGS`` with a
``runtime_env`` that prepends the repo to PYTHONPATH; every joi_ray
``map_batches`` call site spreads ``**REMOTE_KWARGS``.  From the repo root
this is a no-op (empty dict, no runtime-env agent involvement).
"""

from __future__ import annotations

import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

REMOTE_KWARGS: dict = {}


def ensure_importable() -> None:
    """Call once per driver (idempotent) before building pipelines.

    Mutates REMOTE_KWARGS in place — call sites hold direct references."""
    try:
        same = os.path.samefile(os.getcwd(), _REPO)
    except OSError:
        same = False
    if same:
        # cwd matches the repo NOW, but if Ray is already initialized the
        # workers inherited the raylet's cwd at ray.init time — which may
        # differ (init from /tmp, chdir to repo, import).  Probe ONCE with
        # a real task: blanket-adding a runtime_env here would force every
        # joi_ray task onto segregated runtime-env workers (measured 2-3x
        # on shuffle-heavy stages), so only pay it when the probe fails.
        import sys

        ray_mod = sys.modules.get("ray")
        if ray_mod is not None and getattr(ray_mod, "is_initialized", lambda: False)():
            same = _workers_can_import(ray_mod)
    REMOTE_KWARGS.clear()
    if not same:
        path = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")
        REMOTE_KWARGS["runtime_env"] = {"env_vars": {"PYTHONPATH": path}}


def _workers_can_import(ray_mod) -> bool:
    """One tiny remote task checking that workers resolve ``joi_ray``
    (they inherit the raylet's cwd, not the driver's current one)."""
    try:
        @ray_mod.remote(num_cpus=0)
        def _probe() -> bool:  # pragma: no cover - runs in a worker
            try:
                import importlib

                importlib.import_module("joi_ray")
                return True
            except Exception:
                return False

        return bool(ray_mod.get(_probe.remote(), timeout=15))
    except Exception:
        return False


def join_num_partitions() -> int:
    """Partition count for ``Dataset.join``.  Hard constraint: must stay
    below cluster CPUs or the join's aggregator actors deadlock (Ray
    2.49).  Single-node tuning: past ~16 partitions the 0.5-CPU aggregator
    pool competes with map tasks for one memory bus, so cap there; on a
    multi-node cluster (CPU > 32) scale with the cluster instead — a flat
    16 would serialize the shuffle."""
    import ray

    cpu = int(ray.cluster_resources().get("CPU", 8))
    if cpu <= 32:
        return max(2, min(cpu - 1, 16))
    return cpu // 2


def sort_num_blocks(est_bytes: int, *, target_block_bytes: int = 128 << 20) -> int:
    """Input block count for a dataset that is about to be globally sorted.

    Ray's sort pays per-input-block costs (one sample task + an
    all-to-all exchange entry per block): 6M rows split across 370
    row-group-sized blocks sorted in ~11-15 s where the same data in 64
    blocks sorts in ~2-3 s (measured, 32 CPUs).  Pick blocks proportional
    to cluster CPUs for parallelism, but never smaller than
    ``target_block_bytes`` per block — at 100-TB inputs the byte bound
    dominates and keeps per-block memory flat."""
    import ray

    cpu = int(ray.cluster_resources().get("CPU", 8))
    by_bytes = -(-max(est_bytes, 1) // target_block_bytes)  # ceil
    return max(2 * cpu, by_bytes)


def quiet_ray_data_logs() -> bool:
    """Silence Ray Data's per-task schema-hash warning in THIS process.

    pyarrow Schemas carrying file metadata (pandas/parquet) are unhashable,
    so Ray's schema-dedup fast path logs 'Failed to hash the schemas' for
    every metadata-bearing input.  Must run after Ray's worker logging
    dictConfig, hence called from stage bodies on every invocation (a
    getLogger+setLevel pair is nanoseconds)."""
    import logging

    logging.getLogger("ray.data._internal.arrow_ops.transform_pyarrow").setLevel(logging.ERROR)
    return True


def normalize_empty_blocks(ds, schema):
    """Ray Data's groupby/aggregate paths can emit zero-row ZERO-COLUMN
    blocks under some partition splits; those poison a downstream
    ``Dataset.join`` (acero: "No match or multiple matches for key field
    reference").  Rewrite each block through a tiny remote task that
    replaces schema-less blocks with a typed empty table and prunes the
    rest to ``schema``'s columns.  Driver work is one ObjectRef per block
    (metadata only) — block data never lands on the driver."""
    import pyarrow as pa
    import ray
    import ray.data as rd

    names = [f.name for f in schema]

    @ray.remote(num_cpus=0)
    def _norm(t):
        if t.num_columns == 0:
            return pa.table({f.name: pa.array([], f.type) for f in schema})
        return t.select(names)

    return rd.from_arrow_refs([_norm.remote(r) for r in ds.to_arrow_refs()])


def join_pad_hashes(num_partitions: int, base: int) -> list[int]:
    """Sentinel int64 hash values covering every join partition.

    Ray 2.49's ``Dataset.join`` crashes when a hash partition receives zero
    rows from one side (the aggregator builds a schema-less empty table and
    acero rejects the key FieldRef).  Dense sides never hit this; a sparse
    side (e.g. a small candidate set in a semi-join) does.  The workaround:
    union one sentinel row per partition onto each side before the join.
    Sentinels use reserved values far from real key hashes; even on an
    astronomically-unlikely collision the inner join only ADDS rows, which
    downstream exact-count filters (n>1) drop — never wrong output, only a
    no-op row.

    Partition assignment replicates Ray's partitioner
    (``transform_pyarrow.hash_partition``: ``hash(tuple(scalars)) %
    num_partitions``); Python's int/tuple hash is not seed-randomized, so
    the driver-side computation matches every worker."""
    import pyarrow as pa

    out: list[int] = []
    need = set(range(num_partitions))
    v = base
    while need:
        p = hash((pa.scalar(v, pa.int64()),)) % num_partitions
        if p in need:
            need.discard(p)
            out.append(v)
        v += 1
    return out


def collect_tables(ds, schema=None):
    """Materialize a Dataset's blocks into ONE Arrow table, tolerating the
    zero-row EMPTY-SCHEMA blocks Ray Data's groupby/join paths can emit
    under some block splits (concat_tables raises on those).  ``schema``
    supplies the result schema when every block is empty.  Result-bounded:
    only call on aggregate-sized outputs, never a corpus."""
    import pyarrow as pa
    import ray

    blocks = ray.get(ds.to_arrow_refs())
    tbls = [t for t in blocks if t.num_rows > 0 and t.num_columns > 0]
    if not tbls:
        typed = [t for t in blocks if t.num_columns > 0]
        if typed:
            return typed[0]  # empty but carries the schema
        if schema is not None:
            return pa.table({f.name: pa.array([], f.type) for f in schema})
        return pa.table({})
    names = tbls[0].column_names
    return pa.concat_tables([t.select(names) for t in tbls])
