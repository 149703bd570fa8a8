"""Distributed connected components over a duplicate-pair edge list — the
link between pair mining (``minhash_duplicate_pairs`` / ``simhash`` /
``embedding_duplicate_pairs``) and canonical collapse: near-duplicate
similarity is not transitive, so keep-one-per-PAIR under-collapses chains
(A~B, B~C, A!~C must still collapse to one survivor).  Components assign
every node the minimum doc id reachable from it, which downstream stages
use as the canonical key (keep ``node == label``, drop the rest).

Reference: @hapi/joi has no cross-record operators (SURVEY.md §2.6); this
exists for the north rule's dedup pipeline.

Scale shape — two paths chosen by edge count (the broadcast-vs-distributed
discipline of ops/dedup.py):

* ``<= single_task_limit`` edges: ONE Ray task runs a vectorized
  min-label fixpoint (numpy ``minimum.at`` edge relaxation + pointer
  jumping, O(log n) passes).  The edge set is duplicate-rate-bounded —
  orders of magnitude below corpus size — so this path covers most real
  runs without a single shuffle; the result (node, label) never touches
  the driver.
* larger: iterative DATASET label propagation — per round, one
  hash-join of edges against current labels (both directions emitted from
  the same join) + a pointer-jump self-join, then groupby-min.  Labels
  only ever decrease, so ``sum(label)`` is a strictly-decreasing fixpoint
  witness: one tiny aggregate per round detects convergence without a
  full old-vs-new anti-join.  Pointer jumping keeps rounds O(log
  diameter); each round shuffles only the edge-bounded label table.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .._env import REMOTE_KWARGS, join_num_partitions


def _labels_fixpoint(ia: np.ndarray, ib: np.ndarray, n: int) -> np.ndarray:
    """Min-label fixpoint over edges (ia, ib) on nodes [0, n): returns the
    dense label array (index of the component's minimum node)."""
    label = np.arange(n, dtype=np.int64)
    while True:
        before = label.sum(dtype=np.int64)
        m = np.minimum(label[ia], label[ib])
        np.minimum.at(label, ia, m)
        np.minimum.at(label, ib, m)
        label = label[label[label]]  # pointer jump x2: halves chain depth
        if label.sum(dtype=np.int64) == before:
            return label


def _components_single_task(t: pa.Table, id_a: str, id_b: str) -> pa.Table:
    a = pc.cast(t[id_a].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)
    b = pc.cast(t[id_b].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)
    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    label = _labels_fixpoint(inv[: len(a)], inv[len(a) :], len(nodes))
    return pa.table({"node": pa.array(nodes), "label": pa.array(nodes[label])})


def connected_components(
    pairs,
    id_a: str = "id_a",
    id_b: str = "id_b",
    *,
    single_task_limit: int = 5_000_000,
    max_iters: int = 64,
):
    """(id_a, id_b) pair Dataset -> (node, label) Dataset, label = min doc
    id in the node's component.  Nodes are the edge endpoints (rows with
    no duplicate pair are their own trivial component and never enter)."""
    import ray.data as rd

    edges = pairs.select_columns([id_a, id_b]).map_batches(
        lambda t: pa.table(
            {
                "a": pc.cast(t[id_a].combine_chunks(), pa.int64()),
                "b": pc.cast(t[id_b].combine_chunks(), pa.int64()),
            }
        ),
        batch_format="pyarrow",
        **REMOTE_KWARGS,
    ).materialize()  # consumed once per round below (or once, small path)

    n_edges = edges.count()
    if n_edges == 0:
        return rd.from_arrow(
            pa.table({"node": pa.array([], pa.int64()), "label": pa.array([], pa.int64())})
        )
    if n_edges <= single_task_limit:
        return edges.repartition(1).map_batches(
            lambda t: _components_single_task(t, "a", "b"),
            batch_format="pyarrow",
            **REMOTE_KWARGS,
        )

    njoin = join_num_partitions()

    # symmetrize once: a single labels-join on "a" then propagates BOTH
    # directions every round (two joins per round otherwise)
    edges = edges.map_batches(
        lambda t: pa.table(
            {
                "a": pa.concat_arrays(
                    [t["a"].combine_chunks(), t["b"].combine_chunks()]
                ),
                "b": pa.concat_arrays(
                    [t["b"].combine_chunks(), t["a"].combine_chunks()]
                ),
            }
        ),
        batch_format="pyarrow",
        **REMOTE_KWARGS,
    ).materialize()

    def seed(t: pa.Table) -> pa.Table:
        a, b = t["a"].combine_chunks(), t["b"].combine_chunks()
        m = pc.min_element_wise(a, b)
        return pa.table(
            {"node": pa.concat_arrays([a, b]), "label": pa.concat_arrays([m, m])}
        )

    labels = (
        edges.map_batches(seed, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("node")
        .min("label")
        .map_batches(
            lambda t: t.rename_columns(["node", "label"]) if t.num_columns else t,
            batch_format="pyarrow",
            **REMOTE_KWARGS,
        )
        .materialize()
    )
    prev_sum = None
    for _ in range(max_iters):
        cur = labels.sum("label")
        if prev_sum is not None and cur == prev_sum:
            break
        prev_sum = cur
        # driver-side type capture for typed-empty guards (never call
        # Dataset.schema() inside a worker UDF)
        _ls = labels.schema()
        _nt, _lt = _ls.types[0], _ls.types[1]
        # edge relaxation: ship each edge's endpoint labels both ways
        ea = edges.join(
            labels.map_batches(
                lambda t: t.rename_columns(["a", "la"]) if t.num_columns else t,
                batch_format="pyarrow",
                **REMOTE_KWARGS,
            ),
            join_type="inner",
            num_partitions=njoin,
            on=("a",),
            aggregator_ray_remote_args={"num_cpus": 0.5},
        )

        def relax(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table({"node": pa.array([], _nt),
                                 "label": pa.array([], _lt)})
            la = t["la"].combine_chunks()
            return pa.table(
                {
                    "node": pa.concat_arrays(
                        [t["a"].combine_chunks(), t["b"].combine_chunks()]
                    ),
                    "label": pa.concat_arrays([la, la]),
                }
            )

        prop = ea.map_batches(relax, batch_format="pyarrow", **REMOTE_KWARGS)
        # materialize: the pointer-jump SELF-join below consumes `merged`
        # twice, and a second join operator inside the same streaming DAG
        # as the edge join above deadlocks the aggregator pool (Ray 2.49)
        merged = (
            labels.union(prop)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]) if t.num_columns else t,
                batch_format="pyarrow",
                **REMOTE_KWARGS,
            )
            .materialize()
        )
        # pointer jump: node -> label -> label(label)
        jump = merged.join(
            merged.map_batches(
                lambda t: t.rename_columns(["label", "label2"]) if t.num_columns else t,
                batch_format="pyarrow",
                **REMOTE_KWARGS,
            ),
            join_type="left_outer",
            num_partitions=njoin,
            on=("label",),
            aggregator_ray_remote_args={"num_cpus": 0.5},
        )

        def pick(t: pa.Table) -> pa.Table:
            if t.num_columns == 0 or t.num_rows == 0:
                return pa.table({"node": pa.array([], _nt),
                                 "label": pa.array([], _lt)})
            lbl = pc.min_element_wise(
                t["label"], pc.coalesce(t["label2"], t["label"])
            )
            return pa.table({"node": t["node"], "label": lbl})

        labels = (
            jump.map_batches(pick, batch_format="pyarrow", **REMOTE_KWARGS)
            .groupby("node")
            .min("label")
            .map_batches(
                lambda t: t.rename_columns(["node", "label"]) if t.num_columns else t,
                batch_format="pyarrow",
                **REMOTE_KWARGS,
            )
            .materialize()
        )
    return labels


def component_stats(components):
    """(node, label) -> one row per component size: (size, n_components,
    sum_min_label).  Tiny by construction (sizes collapse first)."""
    from ray.data.aggregate import Count, Sum

    sizes = (
        components.groupby("label")
        .count()
        .map_batches(
            lambda t: pa.table(
                {
                    "label": t["label"],
                    "size": pc.cast(t["count()"], pa.int64()),
                }
            ),
            batch_format="pyarrow",
            **REMOTE_KWARGS,
        )
    )
    out = sizes.groupby("size").aggregate(
        Count(alias_name="n_components"), Sum("label", alias_name="sum_min_label")
    )
    return out.map_batches(
        lambda t: pa.table(
            {
                "size": pc.cast(t["size"], pa.int64()),
                "n_components": pc.cast(t["n_components"], pa.int64()),
                "sum_min_label": pc.cast(t["sum_min_label"], pa.int64()),
            }
        ),
        batch_format="pyarrow",
        **REMOTE_KWARGS,
    )
