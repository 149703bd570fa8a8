"""Driver contract for the joi_ray validation engine.

``entry()`` runs the flagship interleaved-document validation on sf0.001.
``queries()`` exposes one entry per operator family from SURVEY.md §2 plus
the training-data ops; ``oracle_sql()`` gives the DuckDB-equivalent SQL for
every SQL-expressible query (same column names, rounded floats).  Ray is
initialised by the driver — nothing here calls ray.init/shutdown.
"""

from __future__ import annotations

import json
import os
import sys
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

# Ray workers resolve joi_ray via the raylet's cwd; when the driver runs
# from elsewhere, stage callables would fail to unpickle in workers.  This
# fills joi_ray._env.REMOTE_KWARGS with a PYTHONPATH runtime_env that every
# joi_ray map_batches call site spreads (no-op from the repo root).
from joi_ray._env import REMOTE_KWARGS, ensure_importable, join_num_partitions

ensure_importable()


# --------------------------------------------------------------------------
# helpers


def _py_round(tbl: pa.Table, cols: dict[str, int]) -> pa.Table:
    """Exact decimal rounding via Python round() on small final tables —
    pc.round/np.round produce different nearest-doubles than DuckDB's ROUND,
    which breaks the driver's value-hash compare."""
    out = {}
    for name in tbl.column_names:
        if name in cols:
            out[name] = pa.array(
                [None if v is None else round(v, cols[name]) for v in tbl[name].to_pylist()],
                pa.float64(),
            )
        else:
            out[name] = tbl[name]
    return pa.table(out)


def _docs_ds(sf_dir: str, repeat: int = 1):
    from joi_ray.sources.interleaved import read_interleaved

    return read_interleaved(sf_dir, repeat=repeat)


def _violations(sf_dir: str):
    from joi_ray.pipelines.docs import document_schema
    from joi_ray.pipelines.validate import validate_ds
    from joi_ray.sources.interleaved import asset_catalog

    return validate_ds(
        _docs_ds(sf_dir),
        document_schema(),
        catalog=asset_catalog(),
        ref_path="spans.media_ref",
        concurrency=2,
        batch_size=4096,
    )


def entry() -> Any:
    """Flagship: full schema + referential validation of the interleaved
    documents derived from sf0.001; returns the violations Dataset."""
    return _violations("/root/testdata/sf0.001")


# --------------------------------------------------------------------------
# queries


def _q_pricing_summary(sf_dir: str):
    """TPC-H-Q1-style grouped aggregate: per-batch partials -> small groupby
    (SURVEY.md §2.6 aggregation mapping)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partials(t: pa.Table) -> pa.Table:
        disc = pc.multiply(t["l_extendedprice"], pc.subtract(pa.scalar(1.0), t["l_discount"]))
        t = t.append_column("disc_price", disc)
        g = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("l_quantity", "sum"), ("l_extendedprice", "sum"), ("disc_price", "sum"), ("l_quantity", "count")]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "p_qty", "p_base", "p_disc", "p_n"]
        )

    agg = (
        ds.map_batches(partials, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("p_qty", alias_name="s_qty"),
            Sum("p_base", alias_name="s_base"),
            Sum("p_disc", alias_name="s_disc"),
            Sum("p_n", alias_name="n"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "sum_qty": t["s_qty"],
                "sum_base_price": t["s_base"],
                "sum_disc_price": t["s_disc"],
                "count_order": pc.cast(t["n"], pa.int64()),
            }
        )
        return _py_round(out, {"sum_qty": 2, "sum_base_price": 2, "sum_disc_price": 2})

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _val_counts(sf_dir: str, table: str, schema, columns: list[str]):
    """Validate a testdata table against a column schema -> (path, code, n)."""
    import ray.data as rd

    from joi_ray.pipelines.validate import validate_ds

    ds = rd.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)
    viol = validate_ds(ds, schema, id_column=None, concurrency=2)
    df = viol.to_pandas()
    df = df[df["severity"] == "error"]
    out = df.groupby(["path", "code"], as_index=False).size().rename(columns={"size": "n"})
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out[["path", "code", "n"]], preserve_index=False)


def _q_val_lineitem(sf_dir: str):
    import joi_ray as jr

    schema = jr.object(
        {
            "l_quantity": jr.number().required().min(2).max(49),
            "l_discount": jr.number().required().min(0).max(0.08),
            "l_shipdate": jr.date().required().max("1998-12-31"),
        }
    )
    return _val_counts(sf_dir, "lineitem", schema, ["l_quantity", "l_discount", "l_shipdate"])


def _q_val_documents(sf_dir: str):
    import joi_ray as jr

    schema = jr.object(
        {
            "doc_id": jr.number().required(),
            "text": jr.string().required().min(50).max(520),
            "lang": jr.string().required().valid("en", "zh", "es", "de", "fr"),
            "source": jr.string().required().pattern(r"^src\d+$"),
        }
    )
    return _val_counts(sf_dir, "documents", schema, ["doc_id", "text", "lang", "source"])


def _q_rename_regex(sf_dir: str):
    """Regex rename with template targets on a real table: '^l_(.*)$' ->
    '{#1}' strips the TPC-H prefix inside the validation pipeline
    (object.rename, lib/types/object.js:387-415,886-967); the aggregate
    runs over the RENAMED columns so the oracle proves the rename applied."""
    import ray.data as rd

    import joi_ray as jr
    from joi_ray.pipelines.validate import filter_valid

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_discount"])
    schema = jr.object(
        {
            "quantity": jr.number().required(),
            "discount": jr.number().required(),
        }
    ).rename(r"^l_(.*)$", "{#1}", regex=True)
    clean = filter_valid(ds, schema, normalize=True)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "p_n": pa.array([t.num_rows], pa.int64()),
                "p_q": pa.array([pc.sum(t["quantity"]).as_py()], pa.float64()),
                "p_d": pa.array([pc.sum(t["discount"]).as_py()], pa.float64()),
            }
        )

    parts = clean.map_batches(partial, batch_format="pyarrow", batch_size=None,
                              **REMOTE_KWARGS).take_all()
    return pa.table(
        {
            "n": pa.array([sum(p["p_n"] for p in parts)], pa.int64()),
            "sum_quantity": pa.array([round(sum(p["p_q"] for p in parts), 2)], pa.float64()),
            "sum_discount": pa.array([round(sum(p["p_d"] for p in parts), 2)], pa.float64()),
        }
    )


def _q_uniqueness(sf_dir: str):
    from joi_ray.pipelines.validate import uniqueness_pass

    dups = uniqueness_pass(_docs_ds(sf_dir).select_columns(["doc_id"]))
    return dups


def _q_violation_counts(sf_dir: str):
    df = _violations(sf_dir).to_pandas()
    df = df[df["severity"] == "error"]
    out = df.groupby("code", as_index=False).size().rename(columns={"size": "n"})
    out["n"] = out["n"].astype("int64")
    return pa.Table.from_pandas(out[["code", "n"]], preserve_index=False)


def _q_span_stats(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = _docs_ds(sf_dir)

    def partials(t: pa.Table) -> pa.Table:
        lens = pc.list_value_length(t["spans"].combine_chunks())
        return pa.table(
            {
                "p_total": pa.array([pc.sum(lens).as_py() or 0], type=pa.int64()),
                "p_rows": pa.array([t.num_rows], type=pa.int64()),
            }
        )

    agg = ds.map_batches(partials, batch_format="pyarrow", **REMOTE_KWARGS).aggregate(
        Sum("p_total", alias_name="total"), Sum("p_rows", alias_name="rows")
    )
    total, rows = int(agg["total"]), int(agg["rows"])
    return pa.table(
        {
            "total_spans": pa.array([total], pa.int64()),
            "n_docs": pa.array([rows], pa.int64()),
            "avg_spans": pa.array([round(total / rows, 4)], pa.float64()),
        }
    )


def _q_referential(sf_dir: str):
    """Broadcast anti-join counts: orders.o_custkey vs customer,
    lineitem.l_partkey vs part."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey"])["c_custkey"]
    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])["p_partkey"]
    cust_ref, part_ref = ray.put(cust.combine_chunks()), ray.put(part.combine_chunks())

    def miss_counts(t: pa.Table, ref, col) -> int:
        keys = ray.get(ref)
        known = pc.is_in(t[col].combine_chunks(), value_set=keys)
        return int(pc.sum(pc.invert(known)).as_py() or 0)

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey"])
    li = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_partkey"])
    mo = orders.map_batches(
        lambda t: pa.table({"m": pa.array([miss_counts(t, cust_ref, "o_custkey")], pa.int64())}),
        batch_format="pyarrow", **REMOTE_KWARGS).aggregate(Sum("m", alias_name="s"))
    mp = li.map_batches(
        lambda t: pa.table({"m": pa.array([miss_counts(t, part_ref, "l_partkey")], pa.int64())}),
        batch_format="pyarrow", **REMOTE_KWARGS).aggregate(Sum("m", alias_name="s"))
    return pa.table(
        {
            "missing_customers": pa.array([int(mo["s"])], pa.int64()),
            "missing_parts": pa.array([int(mp["s"])], pa.int64()),
        }
    )


def _q_events_window(sf_dir: str):
    """Tumbling 1-day windows per event_type (streaming-shaped workload)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"])

    def window_key(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t["ts"].combine_chunks(), unit="day"), format="%Y-%m-%d")
        return pa.table({"event_type": t["event_type"], "day": day, "value": t["value"]})

    agg = (
        ds.map_batches(window_key, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("value", alias_name="sv"))
    )

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "event_type": t["event_type"],
                "day": t["day"],
                "n": pc.cast(t["n"], pa.int64()),
                "sum_value": t["sv"],
            }
        )
        return _py_round(out, {"sum_value": 2})

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_clean_documents(sf_dir: str):
    """Data-cleaning mode: filter_valid keeps only schema+referential-clean
    docs; returns (n_clean, total_spans) — SQL-derivable from the dirt
    residues, so the cleaning path is exactly oracled."""
    from ray.data.aggregate import Sum

    from joi_ray.pipelines.docs import document_schema
    from joi_ray.pipelines.validate import filter_valid
    from joi_ray.sources.interleaved import asset_catalog

    clean = filter_valid(
        _docs_ds(sf_dir), document_schema(), catalog=asset_catalog(), ref_path="spans.media_ref"
    )

    def partials(t: pa.Table) -> pa.Table:
        lens = pc.list_value_length(t["spans"].combine_chunks())
        return pa.table(
            {
                "p_n": pa.array([t.num_rows], pa.int64()),
                "p_spans": pa.array([pc.sum(lens).as_py() or 0], pa.int64()),
            }
        )

    agg = clean.map_batches(partials, batch_format="pyarrow", **REMOTE_KWARGS).aggregate(
        Sum("p_n", alias_name="n"), Sum("p_spans", alias_name="s")
    )
    return pa.table(
        {
            "n_clean": pa.array([int(agg["n"])], pa.int64()),
            "total_spans": pa.array([int(agg["s"])], pa.int64()),
        }
    )


def _q_top3_orders_per_segment(sf_dir: str):
    """Ranked window: top-3 orders by price within each market segment
    (broadcast segment lookup + per-group sort/head)."""
    import ray
    import ray.data as rd

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ref = ray.put(cust)

    class Tag:
        def __init__(self):
            c = ray.get(ref)
            # Arrow-native broadcast lookup: key array + aligned value array,
            # probed per batch with pc.index_in + take (no per-row dict gets)
            self.keys = c["c_custkey"].combine_chunks()
            self.vals = c["c_mktsegment"].combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["o_custkey"].combine_chunks(), value_set=self.keys)
            return t.append_column("c_mktsegment", self.vals.take(idx))

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_totalprice"])

    def top3(g: pd.DataFrame) -> pd.DataFrame:
        return g.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, False]).head(3)

    def local_top3(t: pa.Table) -> pa.Table:
        # per-batch per-segment top-3 partial: the final map_groups then
        # sorts <= 3 x n_batches rows per segment, never a whole segment
        # (a full-segment sort is ~n/5 rows on one worker at scale)
        df = t.to_pandas()
        df = (df.sort_values(["o_totalprice", "o_orderkey"], ascending=[False, False])
                .groupby("c_mktsegment", sort=False).head(3))
        return pa.Table.from_pandas(df, preserve_index=False)

    ranked = (
        orders.map_batches(Tag, batch_format="pyarrow", concurrency=2, **REMOTE_KWARGS)
        .map_batches(local_top3, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("c_mktsegment")
        .map_groups(top3, batch_format="pandas")
    )

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
                "o_totalprice": t["o_totalprice"],
            }
        )
        return _py_round(out, {"o_totalprice": 2})

    return ranked.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_dangling_refs(sf_dir: str):
    """Row-level anti-join output: the exact (doc_id, media_ref) pairs whose
    asset is missing from the catalog — derived from the referential stage's
    violation rows and hash-matched against the residue-derived SQL."""
    df = _violations(sf_dir).to_pandas()
    df = df[df["code"] == "referential.missing"].copy()
    df["media_ref"] = df["context"].map(lambda c: json.loads(c).get("value"))
    out = df[["doc_id", "media_ref"]].sort_values(["doc_id", "media_ref"]).reset_index(drop=True)
    return pa.Table.from_pandas(out, preserve_index=False)


def _q_histogram_quantity(sf_dir: str):
    """Fixed-width histogram: bin in map_batches, count in one groupby."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def binned(t: pa.Table) -> pa.Table:
        b = pc.cast(pc.floor(pc.divide(t["l_quantity"].combine_chunks(), 5.0)), pa.int64())
        return pa.table({"bin": b})

    agg = ds.map_batches(binned, batch_format="pyarrow", **REMOTE_KWARGS).groupby("bin").aggregate(
        Count(alias_name="n")
    )
    return agg.map_batches(
        lambda t: pa.table({"bin": t["bin"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow", **REMOTE_KWARGS)


def _q_stats_corr(sf_dir: str):
    """Algebraic statistical aggregates from per-batch moment partials:
    sample stddev of quantity and Pearson corr(quantity, price)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity", "l_extendedprice"])

    def partials(t: pa.Table) -> pa.Table:
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.float64)
        y = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "n": pa.array([float(len(x))]),
                "sx": pa.array([x.sum()]),
                "sy": pa.array([y.sum()]),
                "sxx": pa.array([(x * x).sum()]),
                "syy": pa.array([(y * y).sum()]),
                "sxy": pa.array([(x * y).sum()]),
            }
        )

    agg = ds.map_batches(partials, batch_format="pyarrow", **REMOTE_KWARGS).aggregate(
        Sum("n", alias_name="n"), Sum("sx", alias_name="sx"), Sum("sy", alias_name="sy"),
        Sum("sxx", alias_name="sxx"), Sum("syy", alias_name="syy"), Sum("sxy", alias_name="sxy"),
    )
    n, sx, sy, sxx, syy, sxy = (agg[k] for k in ("n", "sx", "sy", "sxx", "syy", "sxy"))
    var_x = (sxx - sx * sx / n) / (n - 1)
    var_y = (syy - sy * sy / n) / (n - 1)
    cov = (sxy - sx * sy / n) / (n - 1)
    corr = cov / (var_x**0.5 * var_y**0.5)
    return pa.table(
        {
            "n": pa.array([int(n)], pa.int64()),
            "std_qty": pa.array([round(var_x**0.5, 4)], pa.float64()),
            "corr_qty_price": pa.array([round(corr, 4)], pa.float64()),
        }
    )


def _q_quantiles_price(sf_dir: str):
    """Exact distributed quantiles via Ray's Quantile aggregate (matches
    DuckDB quantile_cont interpolation)."""
    import ray.data as rd
    from ray.data.aggregate import Quantile

    # quantiles over the integer-valued column: midpoint interpolation of
    # integers is exact in binary floating point, so Ray's and DuckDB's
    # interpolation agree bit-for-bit (2-decimal prices hit ULP
    # half-boundaries at rounding time — measured at sf0.001)
    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])
    out = ds.aggregate(
        Quantile("l_quantity", q=0.5, alias_name="p50"),
        Quantile("l_quantity", q=0.9, alias_name="p90"),
        Quantile("l_quantity", q=0.99, alias_name="p99"),
    )
    return pa.table({k: pa.array([float(v)], pa.float64()) for k, v in out.items()})


def _q_events_pivot(sf_dir: str):
    """Pivot: per-day event counts spread into one column per event type."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def day_key(t: pa.Table) -> pa.Table:
        day = pc.strftime(pc.floor_temporal(t["ts"].combine_chunks(), unit="day"), format="%Y-%m-%d")
        return pa.table({"day": day, "event_type": t["event_type"]})

    agg = ds.map_batches(day_key, batch_format="pyarrow", **REMOTE_KWARGS).groupby(
        ["day", "event_type"]
    ).aggregate(Count(alias_name="n"))
    df = agg.to_pandas()  # tiny (days x 5 types); pivot on the driver
    wide = df.pivot_table(index="day", columns="event_type", values="n", fill_value=0).reset_index()
    wide.columns.name = None
    for c in ("click", "error", "purchase", "signup", "view"):
        if c not in wide.columns:
            wide[c] = 0
        wide[c] = wide[c].astype("int64")
    return pa.Table.from_pandas(wide[["day", "click", "error", "purchase", "signup", "view"]], preserve_index=False)


def _q_asof_last_order(sf_dir: str):
    """As-of join, scale-shaped: ``joi_ray.ops.asof.asof_join`` — each
    event matched to the user's latest order at event time.  Both sides
    stay Datasets end-to-end: the right side is deduped to
    max(o_orderkey) per (custkey, orderdate) with a distributed groupby
    (never driver-materialized), then both sides co-sort once and a
    per-block forward fill with blocks-bounded carry healing produces the
    matches (see ops/asof.py for the partitioning contract)."""
    import ray.data as rd
    from ray.data.aggregate import Max

    from joi_ray.ops.asof import asof_join

    orders = (
        rd.read_parquet(f"{sf_dir}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_orderkey"])
        .groupby(["o_custkey", "o_orderdate"])
        .aggregate(Max("o_orderkey", alias_name="o_orderkey"))
    )
    events = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "ts"])
    j = asof_join(
        events, orders,
        left_by="user_id", right_by="o_custkey",
        left_on="ts", right_on="o_orderdate",
        left_tiebreak="event_id", right_tiebreak="o_orderkey",
        right_values=["o_orderkey"], left_keep=["event_id"],
        min_blocks=12,  # fixture scale: force user-straddling block edges
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": pc.cast(t["event_id"], pa.int64()),
            "o_orderkey": pc.cast(t["o_orderkey"], pa.int64()),
        })

    return j.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_events_running(sf_dir: str):
    """Running per-user cumulative sum, fully sort-based — no per-user
    map_groups.  ONE global sort by (user_id, ts, event_id); pass A emits a
    single carry-descriptor row per BLOCK (first/last user, tail sums); the
    driver walks blocks in order (first-row keys are non-decreasing under
    the sort) accumulating a carry, producing one offset per block — only a
    block's FIRST user can continue from earlier blocks, so driver state is
    ∝ block count; pass B re-scans the same materialized blocks
    (batch_size=None -> batch == block, deterministic across passes),
    computes the in-block per-user cumsum vectorized, and adds the
    broadcast offset to the first user's rows."""
    import ray
    import ray.data as rd

    from joi_ray._env import sort_num_blocks

    cols = ["event_id", "user_id", "ts", "value"]
    # bound the block count BEFORE the sort: Ray's sort pays per-block
    # sample + exchange costs that dominated at the default row-group
    # granularity (370 blocks -> 11-15 s for a 195 MB sort; 64 blocks ->
    # ~2.5 s, measured round 4)
    est = rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols).size_bytes()
    ds = (rd.read_parquet(f"{sf_dir}/events.parquet", columns=cols,
                          override_num_blocks=sort_num_blocks(est))
          .sort(["user_id", "ts", "event_id"]).materialize())
    # fixture-scale only: split small outputs so the carry path is
    # exercised (many blocks -> user-straddling edges); at scale the sort
    # already yields many blocks and this is a no-op
    if ds.num_blocks() < 12:
        ds = ds.repartition(12).materialize()

    _DESC_SCHEMA = pa.schema([
        ("bk_u", pa.int64()), ("bk_t", pa.int64()), ("bk_e", pa.int64()),
        ("first_user", pa.int64()), ("last_user", pa.int64()),
        ("head_sum", pa.float64()), ("tail_sum", pa.float64()),
    ])

    def pass_a(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:  # range partitioning can leave empty blocks
            return _DESC_SCHEMA.empty_table()
        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        e = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ts = pc.cast(t["ts"].combine_chunks(), pa.timestamp("us")).cast(pa.int64()).to_numpy(zero_copy_only=False)
        first_u, last_u = int(u[0]), int(u[-1])
        tail_sum = float(v[u == last_u].sum())
        head_sum = float(v[u == first_u].sum())
        return pa.table({
            "bk_u": pa.array([first_u]), "bk_t": pa.array([int(ts[0])]),
            "bk_e": pa.array([int(e[0])]),
            "first_user": pa.array([first_u]), "last_user": pa.array([last_u]),
            "head_sum": pa.array([head_sum]), "tail_sum": pa.array([tail_sum]),
        })

    from joi_ray._env import collect_tables

    descs = (collect_tables(
        ds.map_batches(pass_a, batch_format="pyarrow", batch_size=None,
                       **REMOTE_KWARGS))
        .to_pandas().sort_values(["bk_u", "bk_t", "bk_e"]).reset_index(drop=True))
    offsets: dict[tuple, float] = {}
    carry_user, carry_sum = None, 0.0
    for r in descs.itertuples(index=False):
        off = carry_sum if carry_user == int(r.first_user) else 0.0
        if off:
            offsets[(int(r.bk_u), int(r.bk_e))] = off
        if int(r.first_user) == int(r.last_user):
            carry_sum = off + float(r.tail_sum)
        else:
            carry_sum = float(r.tail_sum)
        carry_user = int(r.last_user)
    oref = ray.put(offsets)

    def pass_b(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.schema([
                ("event_id", pa.int64()), ("user_id", pa.int64()),
                ("running_value", pa.float64()),
            ]).empty_table()
        offs = ray.get(oref)
        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        v = t["value"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.float64)
        e = t["event_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        run = pd.Series(v).groupby(pd.Series(u), sort=False).cumsum().to_numpy()
        off = offs.get((int(u[0]), int(e[0])), 0.0)
        if off:
            run = run + np.where(u == u[0], off, 0.0)
        return pa.table({
            "event_id": pa.array(e),
            "user_id": pa.array(u),
            "running_value": pa.array(np.round(run, 4)),
        })

    return ds.map_batches(pass_b, batch_format="pyarrow", batch_size=None, **REMOTE_KWARGS)


def _q_val_props_json(sf_dir: str):
    """JSON-string coercion path: events.props ('{"k": n}') parsed and
    validated as a nested object schema (the @hapi/bourne coercion analog)."""
    import joi_ray as jr

    schema = jr.object({"props": jr.object({"k": jr.number().required().min(50)})})
    return _val_counts(sf_dir, "events", schema, ["props"])


def _q_events_sessions(sf_dir: str):
    """Gap-based sessionization, scale-shaped: ONE global sort by
    (user_id, ts), then fully vectorized per-batch partials — per-user
    event counts and close-pair (gap <= 30min) counts — reduced with a
    native groupby-sum.  Batch boundaries that split a user are healed with
    a driver-side correction bounded by 2 rows PER BATCH (per user spanning
    k batches: pair the sorted batch-last timestamps with the next batch's
    firsts).  No per-user map_groups: sessions(user) =
    events(user) - close_pairs(user)."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["user_id", "ts"]).sort(
        ["user_id", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        u = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (pc.cast(t["ts"].combine_chunks(), pa.timestamp("us"))
              .to_numpy(zero_copy_only=False).astype(np.int64) / 1e6)
        n = len(u)
        same = u[1:] == u[:-1]
        close = same & ((ts[1:] - ts[:-1]) <= 1800.0)
        df = pd.DataFrame({"u": u, "c": np.r_[False, close]})
        g = df.groupby("u", sort=False).agg(p_events=("u", "size"), p_close=("c", "sum"))
        out = pa.table({
            "user_id": pa.array(g.index.to_numpy().astype(np.int64)),
            "p_events": pa.array(g["p_events"].to_numpy().astype(np.int64)),
            "p_close": pa.array(g["p_close"].to_numpy().astype(np.int64)),
            "kind": pa.array(np.zeros(len(g), np.int8)),
            "b_ts": pa.array(np.zeros(len(g), np.float64)),
        })
        # one batch descriptor row (kind 1): first/last row keys — enough to
        # reconstruct the global batch order driver-side (first keys are
        # non-decreasing under the global sort)
        edge = pa.table({
            "user_id": pa.array(np.array([u[0]], np.int64)),
            "p_events": pa.array(np.array([u[-1]], np.int64)),   # last_user
            "p_close": pa.array(np.zeros(1, np.int64)),
            "kind": pa.array(np.array([1], np.int8)),
            "b_ts": pa.array(np.array([ts[0]], np.float64)),     # first_ts
            "b_ts2": pa.array(np.array([ts[-1]], np.float64)),   # last_ts
        })
        out = out.append_column("b_ts2", pa.array(np.zeros(len(out), np.float64)))
        return pa.concat_tables([out, edge]) if n else out

    # boundary descriptors are 1 row per BATCH, so batch granularity sets
    # the driver-side healing state: block-sized batches at scale
    # (descriptors ∝ blocks), small batches only at fixture scale to keep
    # the healing path exercised
    n_events = pq.read_metadata(f"{sf_dir}/events.parquet").num_rows
    bs = 256 if n_events < 1_000_000 else None
    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=bs,
                           **REMOTE_KWARGS).materialize()
    agg = (
        parts.map_batches(lambda t: t.filter(pc.equal(t["kind"], 0)), batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("user_id")
        .aggregate(Sum("p_events", alias_name="n_events"), Sum("p_close", alias_name="n_close"))
    )

    # boundary healing: ∝ number of batches, not events.  Reconstruct the
    # global batch order by sorting descriptors on the first-row key (first
    # keys are non-decreasing across batches of a sorted dataset), then
    # check each consecutive batch pair for a same-user close adjacency.
    from joi_ray._env import collect_tables

    edges = collect_tables(
        parts.map_batches(lambda t: t.filter(pc.greater(t["kind"], 0)) if t.num_columns else t,
                          batch_format="pyarrow", **REMOTE_KWARGS)).to_pandas()
    edges = edges.rename(columns={"user_id": "first_user", "p_events": "last_user",
                                  "b_ts": "first_ts", "b_ts2": "last_ts"})
    edges = edges.sort_values(["first_user", "first_ts", "last_user", "last_ts"]).reset_index(drop=True)
    corr: dict[int, int] = {}
    for i in range(1, len(edges)):
        prev, cur = edges.iloc[i - 1], edges.iloc[i]
        if int(prev["last_user"]) == int(cur["first_user"]) and (
            cur["first_ts"] - prev["last_ts"] <= 1800.0
        ):
            uid = int(cur["first_user"])
            corr[uid] = corr.get(uid, 0) + 1
    cref = ray.put(corr)

    def finish(t: pa.Table) -> pa.Table:
        c = ray.get(cref)
        uids = t["user_id"].combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        extra = np.array([c.get(int(x), 0) for x in uids], dtype=np.int64)
        ev = pc.cast(t["n_events"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        cl = pc.cast(t["n_close"], pa.int64()).combine_chunks().to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "user_id": pa.array(uids),
                "n_events": pa.array(ev),
                "n_sessions": pa.array(ev - cl - extra),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_events_sliding(sf_dir: str):
    """Sliding windows (1h window, 30min hop): each event lands in the two
    hops covering it — emitted per batch, then one grouped aggregate."""
    import ray.data as rd
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["ts", "event_type"])

    def hops(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks()
        hop0 = pc.floor_temporal(ts, multiple=30, unit="minute")
        hop1 = pc.subtract(hop0, pa.scalar(1_800_000_000, type=pa.duration("us")))
        et = t["event_type"].combine_chunks()
        return pa.table(
            {
                "event_type": pa.concat_arrays([et, et]),
                "window_start": pa.concat_arrays(
                    [pc.strftime(hop0, format="%Y-%m-%d %H:%M"), pc.strftime(hop1, format="%Y-%m-%d %H:%M")]
                ),
            }
        )

    agg = ds.map_batches(hops, batch_format="pyarrow", **REMOTE_KWARGS).groupby(["event_type", "window_start"]).aggregate(
        Count(alias_name="n")
    )
    return agg.map_batches(
        lambda t: pa.table(
            {"event_type": t["event_type"], "window_start": t["window_start"], "n": pc.cast(t["n"], pa.int64())}
        ),
        batch_format="pyarrow", **REMOTE_KWARGS)


def _q_join_region(sf_dir: str):
    """Three-hop broadcast join: orders -> customer -> nation -> region,
    revenue per region.  All dimension tables ship once via ray.put."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"])
    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey", "n_regionkey"])
    region = pq.read_table(f"{sf_dir}/region.parquet", columns=["r_regionkey", "r_name"])
    ref = ray.put((cust, nation, region))

    class RegionJoin:
        def __init__(self):
            c, na, re_ = ray.get(ref)
            # chase cust -> nation -> region ONCE with index_in/take, leaving
            # an aligned (c_custkey -> r_name) pair of Arrow arrays
            nk_idx = pc.index_in(c["c_nationkey"].combine_chunks(),
                                 value_set=na["n_nationkey"].combine_chunks())
            rk = na["n_regionkey"].combine_chunks().take(nk_idx)
            rk_idx = pc.index_in(rk, value_set=re_["r_regionkey"].combine_chunks())
            self.keys = c["c_custkey"].combine_chunks()
            self.vals = re_["r_name"].combine_chunks().take(rk_idx)

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["o_custkey"].combine_chunks(), value_set=self.keys)
            names = self.vals.take(idx)
            g = (
                t.append_column("r_name", names)
                .group_by("r_name")
                .aggregate([("o_totalprice", "sum"), ("o_orderkey", "count")])
            )
            return g.rename_columns(["r_name", "p_rev", "p_n"])

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice", "o_orderkey"])
    agg = (
        orders.map_batches(RegionJoin, batch_format="pyarrow", concurrency=2, **REMOTE_KWARGS)
        .groupby("r_name")
        .aggregate(Sum("p_rev", alias_name="s_rev"), Sum("p_n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "r_name": t["r_name"],
                "revenue": t["s_rev"],
                "n_orders": pc.cast(t["n"], pa.int64()),
            }
        )
        return _py_round(out, {"revenue": 2})

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_join_mktsegment(sf_dir: str):
    """Broadcast hash join (small side shipped once) + grouped aggregate."""
    import ray
    import ray.data as rd
    from ray.data.aggregate import Sum

    cust = pq.read_table(f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
    ref = ray.put(cust)

    class JoinStage:
        def __init__(self):
            c = ray.get(ref)
            self.keys = c["c_custkey"].combine_chunks()
            self.vals = c["c_mktsegment"].combine_chunks()

        def __call__(self, t: pa.Table) -> pa.Table:
            idx = pc.index_in(t["o_custkey"].combine_chunks(), value_set=self.keys)
            seg = self.vals.take(idx)
            g = (
                t.append_column("c_mktsegment", seg)
                .group_by("c_mktsegment")
                .aggregate([("o_totalprice", "sum"), ("o_orderkey", "count")])
            )
            return g.rename_columns(["c_mktsegment", "p_rev", "p_n"])

    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice", "o_orderkey"])
    agg = (
        orders.map_batches(JoinStage, batch_format="pyarrow", concurrency=2, **REMOTE_KWARGS)
        .groupby("c_mktsegment")
        .aggregate(Sum("p_rev", alias_name="s_rev"), Sum("p_n", alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "c_mktsegment": t["c_mktsegment"],
                "revenue": t["s_rev"],
                "n_orders": pc.cast(t["n"], pa.int64()),
            }
        )
        return _py_round(out, {"revenue": 2})

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_union_distinct(sf_dir: str):
    """Set ops: union of two projections + distinct (groupby-based)."""
    import ray.data as rd
    from ray.data.aggregate import Count

    a = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_returnflag"]).map_batches(
        lambda t: pa.table({"v": t["l_returnflag"]}), batch_format="pyarrow", **REMOTE_KWARGS)
    b = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_linestatus"]).map_batches(
        lambda t: pa.table({"v": t["l_linestatus"]}), batch_format="pyarrow", **REMOTE_KWARGS)

    def partial_distinct(t: pa.Table) -> pa.Table:
        return pa.table({"v": pc.unique(t["v"].combine_chunks())})

    u = a.union(b).map_batches(partial_distinct, batch_format="pyarrow", **REMOTE_KWARGS)
    agg = u.groupby("v").aggregate(Count(alias_name="_n"))
    return agg.map_batches(lambda t: pa.table({"v": t["v"]}), batch_format="pyarrow", **REMOTE_KWARGS)


def _q_systematic_sample(sf_dir: str):
    """Deterministic systematic sample (doc_id % 7 == 3): count + sums —
    the resumable-sampling pattern (same rows every run, SQL-checkable)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])
    def pick(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].combine_chunks()
        mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7))  # int64 x % 7
        return t.filter(pc.equal(mod, 3))

    picked = ds.map_batches(pick, batch_format="pyarrow", **REMOTE_KWARGS)
    agg = picked.aggregate(Count(alias_name="n"), Sum("n_chars", alias_name="sum_chars"))
    return pa.table(
        {
            "n": pa.array([int(agg["n"])], pa.int64()),
            "sum_chars": pa.array([int(agg["sum_chars"])], pa.int64()),
        }
    )


def _q_hash_split(sf_dir: str):
    """Deterministic hash-based train/val/test assignment (ops/sampling.py):
    stable under re-sharding and resume, mirrored bucket-for-bucket in SQL
    (multiplicative mix -> high-16-bit bucket -> cumulative thresholds)."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.sampling import hash_split

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"])
    labeled = hash_split(ds, "doc_id")
    agg = labeled.groupby(["split", "lang"]).aggregate(
        Count(alias_name="n"), Sum("n_chars", alias_name="sum_chars")
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "split": t["split"],
                "lang": t["lang"],
                "n": pc.cast(t["n"], pa.int64()),
                "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_top_orders(sf_dir: str):
    """Global top-k through Ray's distributed sort + limit."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_totalprice"])
    top = ds.sort(["o_totalprice", "o_orderkey"], descending=[True, True]).limit(10)
    t = pa.Table.from_pandas(top.to_pandas(), preserve_index=False)
    return _py_round(
        pa.table({"o_orderkey": t["o_orderkey"], "o_totalprice": t["o_totalprice"]}),
        {"o_totalprice": 2},
    )


def _q_token_counts(sf_dir: str):
    import ray.data as rd

    from joi_ray.ops.text import token_count_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    out = ds.map_batches(token_count_batch, batch_format="pyarrow", **REMOTE_KWARGS)
    return out.select_columns(["doc_id", "ws_tokens"])


def _q_chunking(sf_dir: str):
    """Overlapping token-window chunking (size=6, stride=4): the training
    data prep step before packing/tokenization.  Vectorized flat-map
    (joi_ray/ops/text.py chunk_documents); the oracle recomputes chunks via
    generate_series + array slicing over the same whitespace tokens."""
    import ray.data as rd

    from joi_ray.ops.text import chunk_documents

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return chunk_documents(ds, size=6, stride=4)


def _q_ann_top5(sf_dir: str):
    import ray.data as rd

    from joi_ray.ops.similarity import ann_topk

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    by_id = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    qids = [0, 5]
    queries = np.stack([np.asarray(emb["embedding"][by_id[q]].as_py(), dtype=np.float64) for q in qids])
    ds = rd.from_arrow(emb)
    top = ann_topk(ds, queries, k=5, concurrency=2).to_pandas()
    top["query_id"] = top["query_id"].map(lambda i: qids[i]).astype("int64")
    top["score"] = top["score"].round(4)
    top = top.sort_values(["query_id", "score", "vec_id"], ascending=[True, False, True])
    return pa.Table.from_pandas(top[["query_id", "vec_id", "score"]], preserve_index=False)


def _q_ann_top5_ivf(sf_dir: str):
    """IVF ANN with nprobe == n_centroids: every cell probed, so recall is
    exact and the result id-set hash-matches the brute-force SQL oracle —
    verifying the centroid train / assign / probe machinery end-to-end.
    Scores are float32 internally, so the oracle compares ids only."""
    import ray.data as rd

    from joi_ray.ops.similarity import ann_topk_ivf

    emb = pq.read_table(f"{sf_dir}/embeddings.parquet")
    by_id = {v: i for i, v in enumerate(emb["vec_id"].to_pylist())}
    qids = [0, 5]
    queries = np.stack([np.asarray(emb["embedding"][by_id[q]].as_py(), dtype=np.float64) for q in qids])
    ds = rd.from_arrow(emb)
    top = ann_topk_ivf(ds, queries, k=5, n_centroids=8, nprobe=8, concurrency=2).to_pandas()
    top["query_id"] = top["query_id"].map(lambda i: qids[i]).astype("int64")
    top = top.sort_values(["query_id", "vec_id"])
    return pa.Table.from_pandas(top[["query_id", "vec_id"]], preserve_index=False)


def _q_embedding_norms(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["embedding", "label"])

    def norms(t: pa.Table) -> pa.Table:
        v = np.stack(t["embedding"].combine_chunks().to_numpy(zero_copy_only=False)).astype(np.float64)
        return pa.table({"label": t["label"], "nrm": pa.array(np.linalg.norm(v, axis=1))})

    agg = (
        ds.map_batches(norms, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("label")
        .aggregate(Sum("nrm", alias_name="s"), Count(alias_name="n"))
    )

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table(
            {
                "label": pc.cast(t["label"], pa.int64()),
                "avg_norm": pc.divide(t["s"], pc.cast(t["n"], pa.float64())),
                "n": pc.cast(t["n"], pa.int64()),
            }
        )
        return _py_round(out, {"avg_norm": 4})

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_dedup_exact(sf_dir: str):
    import ray.data as rd

    from joi_ray.ops.dedup import exact_duplicate_groups

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    groups = exact_duplicate_groups(ds, "text", "doc_id")
    t = pa.Table.from_pandas(groups.to_pandas(), preserve_index=False)
    if t.num_rows == 0:
        return pa.table({"keep_id": pa.array([], pa.int64()), "n": pa.array([], pa.int64())})
    return pa.table({"keep_id": pc.cast(t["keep_id"], pa.int64()), "n": pc.cast(t["n"], pa.int64())})


def _q_dedup_exact_keep(sf_dir: str):
    """End-to-end keep-first exact dedup (broadcast-winner streaming filter,
    ops/dedup.py dedup_exact): profile of the kept corpus so the oracle
    verifies both the winner selection and the filter."""
    import ray.data as rd

    from joi_ray.ops.dedup import dedup_exact

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    # dedup on a 16-char prefix so the fixture actually has duplicate
    # groups to collapse (full texts are unique at these scales)
    ds = ds.map_batches(
        lambda t: t.append_column("key", pc.utf8_slice_codeunits(t["text"], 0, 16)),
        batch_format="pyarrow", **REMOTE_KWARGS)
    kept = dedup_exact(ds, "key", "doc_id")

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "p_n": pa.array([t.num_rows], pa.int64()),
            "p_sum": pa.array([pc.sum(t["doc_id"]).as_py() or 0], pa.int64()),
        })

    parts = kept.map_batches(partial, batch_format="pyarrow", batch_size=None,
                             **REMOTE_KWARGS).take_all()
    return pa.table({
        "n_kept": pa.array([sum(p["p_n"] for p in parts)], pa.int64()),
        "sum_kept_ids": pa.array([sum(p["p_sum"] for p in parts)], pa.int64()),
    })


_NDV_EXACT_CAP = 4096  # per-batch distinct cap for the exact-NDV path


def _q_stats_quantity(sf_dir: str):
    """Column profile with NDV.  Exact NDV only while every per-batch
    distinct set stays under ``_NDV_EXACT_CAP`` (l_quantity has ~50 values);
    a high-cardinality column flips to the mergeable HLL sketch from
    joi_ray.sketches, so driver memory stays bounded either way."""
    import ray.data as rd

    from joi_ray.sketches import HLL

    ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet", columns=["l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        col = t["l_quantity"].combine_chunks()
        u = pc.unique(col)
        exact = len(u) <= _NDV_EXACT_CAP
        hll = HLL()
        if not exact:
            h = pd.util.hash_pandas_object(col.to_pandas(), index=False).to_numpy(np.uint64)
            hll.add_hashes(h)
        return pa.table(
            {
                "p_n": pa.array([len(col)], pa.int64()),
                "p_nulls": pa.array([col.null_count], pa.int64()),
                "p_min": pa.array([pc.min(col).as_py()], pa.float64()),
                "p_max": pa.array([pc.max(col).as_py()], pa.float64()),
                "p_sum": pa.array([pc.sum(col).as_py()], pa.float64()),
                "p_uniq": pa.array([json.dumps(sorted(u.to_pylist())) if exact else None], pa.string()),
                "p_hll": pa.array([None if exact else hll.to_bytes()], pa.binary()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                           **REMOTE_KWARGS).take_all()
    if all(p["p_uniq"] is not None for p in parts):
        uniq: set = set()
        for p in parts:
            uniq.update(json.loads(p["p_uniq"]))
        ndv = len(uniq)
    else:
        # sketch path: merge per-batch HLLs (batches that stayed exact
        # contribute their value sets through a fresh HLL)
        acc = HLL()
        for p in parts:
            if p["p_hll"] is not None:
                acc.merge(HLL.from_bytes(p["p_hll"]))
            else:
                vals = pd.Series(json.loads(p["p_uniq"]))
                acc.add_hashes(pd.util.hash_pandas_object(vals, index=False).to_numpy(np.uint64))
        ndv = int(round(acc.estimate()))
    n = sum(p["p_n"] for p in parts)
    s = sum(p["p_sum"] for p in parts)
    return pa.table(
        {
            "n": pa.array([n], pa.int64()),
            "nulls": pa.array([sum(p["p_nulls"] for p in parts)], pa.int64()),
            "min_q": pa.array([min(p["p_min"] for p in parts)], pa.float64()),
            "max_q": pa.array([max(p["p_max"] for p in parts)], pa.float64()),
            "sum_q": pa.array([round(s, 2)], pa.float64()),
            "ndv_q": pa.array([ndv], pa.int64()),
        }
    )


def _q_quality_by_lang(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.text import quality_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    scored = ds.map_batches(quality_batch, batch_format="pyarrow", **REMOTE_KWARGS)
    agg = scored.groupby("lang").aggregate(Sum("n_words", alias_name="sw"), Count(alias_name="n"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "n": pc.cast(t["n"], pa.int64()),
                "sum_words": pc.cast(t["sw"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_pack_sequences(sf_dir: str):
    """Deterministic sequence packing (ops/packing.py): docs in id order
    binned by cumulative-token starting offset into 2048-token sequences;
    roll-up per sequence (doc count + token sum) — integer exact."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.packing import pack_sequences, token_counts

    ds = (rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
          .map_batches(token_counts, batch_format="pyarrow", **REMOTE_KWARGS))
    packed = pack_sequences(ds, 2048)
    agg = packed.groupby("seq_id").aggregate(
        Count(alias_name="n_docs"), Sum("n_tok", alias_name="sum_tok"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table({
            "seq_id": pc.cast(t["seq_id"], pa.int64()),
            "n_docs": pc.cast(t["n_docs"], pa.int64()),
            "sum_tok": pc.cast(t["sum_tok"], pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_contamination(sf_dir: str):
    """Benchmark decontamination (ops/text.ngram_contamination): bench =
    every 97th doc (doc_id % 97 == 13), train = the rest; per train doc
    the count of distinct 4-gram shingles shared with any bench doc.
    Survivors are true contamination events (near/exact bench copies)."""
    import ray.data as rd

    from joi_ray.ops.text import ngram_contamination

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def is_bench(t: pa.Table, want: bool) -> pa.Table:
        ids = t["doc_id"].combine_chunks()
        mod = pc.subtract(ids, pc.multiply(pc.divide(ids, 97), 97))
        m = pc.equal(mod, 13)
        return t.filter(m if want else pc.invert(m))

    bench = ds.map_batches(lambda t: is_bench(t, True), batch_format="pyarrow", **REMOTE_KWARGS)
    train = ds.map_batches(lambda t: is_bench(t, False), batch_format="pyarrow", **REMOTE_KWARGS)
    return ngram_contamination(train, bench, n=4)


_SEARCH_TERMS = ["merge", "spark", "window"]


def _q_keyword_search(sf_dir: str):
    """Top-10 docs by total query-term token count (ops/text.keyword_search):
    per-batch local top-k partials, final k x n_batches distributed sort —
    integer-exact scores, ties by doc_id."""
    import ray.data as rd

    from joi_ray.ops.text import keyword_search

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    top = keyword_search(ds, _SEARCH_TERMS, k=10)
    return top.map_batches(
        lambda t: pa.table({"doc_id": t["doc_id"], "score": pc.cast(t["score"], pa.int64())}),
        batch_format="pyarrow", **REMOTE_KWARGS)


def _q_gopher_repetition(sf_dir: str):
    """Gopher-style repetition filters (dup-word / dup-bigram / top-token
    fractions) rolled up per language.  All signals and flag thresholds are
    exact integer arithmetic ((n_tok - nd_tok) * 10 > n_tok * 7 is
    dup_word_frac > 0.7) so the oracle hash is float-free."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.text import repetition_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    rep = ds.map_batches(repetition_batch, batch_format="pyarrow", **REMOTE_KWARGS)

    def flags(t: pa.Table) -> pa.Table:
        nt = t["n_tok"].to_numpy()
        nd = t["n_distinct_tok"].to_numpy()
        top = t["top_tok_n"].to_numpy()
        nb = t["n_bigram"].to_numpy()
        ndb = t["n_distinct_bigram"].to_numpy()
        return pa.table(
            {
                "lang": t["lang"],
                "n_tok": t["n_tok"],
                "n_distinct_tok": t["n_distinct_tok"],
                "top_tok_n": t["top_tok_n"],
                "n_bigram": t["n_bigram"],
                "n_distinct_bigram": t["n_distinct_bigram"],
                "f_dup_word": pa.array(((nt - nd) * 10 > nt * 7).astype(np.int64)),
                "f_dup_bigram": pa.array(((nb - ndb) * 10 > nb * 2).astype(np.int64)),
                "f_top_tok": pa.array((top * 10 > nt).astype(np.int64)),
            }
        )

    agg = (
        rep.map_batches(flags, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("n_tok", alias_name="sum_tok"),
            Sum("n_distinct_tok", alias_name="sum_distinct_tok"),
            Sum("top_tok_n", alias_name="sum_top_tok"),
            Sum("n_bigram", alias_name="sum_bigram"),
            Sum("n_distinct_bigram", alias_name="sum_distinct_bigram"),
            Sum("f_dup_word", alias_name="n_flag_dup_word"),
            Sum("f_dup_bigram", alias_name="n_flag_dup_bigram"),
            Sum("f_top_tok", alias_name="n_flag_top_tok"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {"lang": t["lang"]}
        for c in t.column_names:
            if c != "lang":
                cols[c] = pc.cast(t[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_pii_scrub(sf_dir: str):
    """PII scrub stats (ops/pii): deterministic PII injection (the corpus is
    synthetic clean tokens, so the oracle-able expansion plants emails /
    IPv4s / phone numbers from doc_id arithmetic — the near-dup oracle
    pattern), then RE2 detect + redact, rolled up per language.  Every
    output is an exact integer; the SQL oracle re-runs the *same* RE2
    patterns via DuckDB's regexp functions."""
    import ray.data as rd

    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.pii import pii_batch, pii_redact_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "text"])

    def inject(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"].combine_chunks(), pa.int64())
        idn = ids.to_numpy(zero_copy_only=False)
        base = pc.fill_null(t["text"].combine_chunks(), "").to_pandas().to_numpy(dtype=object)
        em = idn % 7 == 3
        ip = idn % 11 == 5
        ph = idn % 13 == 2
        add = np.where(
            em, np.array([f" contact u{i}@ex{i % 5}.com now" for i in idn], object), ""
        )
        add = add + np.where(
            ip, np.array([f" from 10.{i % 256}.0.{i % 100} seen" for i in idn], object), ""
        )
        add = add + np.where(
            ph, np.array([f" call 555-{100 + i % 10}-4567 ok" for i in idn], object), ""
        )
        return pa.table({
            "doc_id": ids, "lang": t["lang"],
            "text": pa.array((base + add).tolist(), pa.string()),
        })

    marked = ds.map_batches(inject, batch_format="pyarrow", **REMOTE_KWARGS)
    scrubbed = marked.map_batches(
        lambda t: pii_redact_batch(pii_batch(t)), batch_format="pyarrow", **REMOTE_KWARGS)

    def per_doc(t: pa.Table) -> pa.Table:
        ne = t["n_email"].to_numpy()
        ni = t["n_ipv4"].to_numpy()
        np_ = t["n_phone"].to_numpy()
        orig = pc.utf8_length(t["text"].combine_chunks()).to_numpy(zero_copy_only=False)
        red = t["redacted_len"].to_numpy()
        return pa.table({
            "lang": t["lang"],
            "n_email": t["n_email"], "n_ipv4": t["n_ipv4"], "n_phone": t["n_phone"],
            "has_pii": pa.array(((ne + ni + np_) > 0).astype(np.int64)),
            "len_delta": pa.array((orig - red).astype(np.int64)),
        })

    agg = (
        scrubbed.map_batches(per_doc, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("lang")
        .aggregate(
            Count(alias_name="n_docs"),
            Sum("has_pii", alias_name="n_docs_with_pii"),
            Sum("n_email", alias_name="sum_email"),
            Sum("n_ipv4", alias_name="sum_ipv4"),
            Sum("n_phone", alias_name="sum_phone"),
            Sum("len_delta", alias_name="sum_len_delta"),
        )
    )

    def finish(t: pa.Table) -> pa.Table:
        cols = {"lang": t["lang"]}
        for c in t.column_names:
            if c != "lang":
                cols[c] = pc.cast(t[c], pa.int64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_clean_funnel(sf_dir: str):
    """Cleaning-funnel report: the composed filter pipeline every curation
    run publishes — each doc attributed to the FIRST rule that drops it
    (too_short -> dup_word -> top_tok -> kept), rolled up per (lang,
    outcome).  Signals come from ops/text.repetition_batch and every
    threshold is integer arithmetic ((nt-nd)*10 > nt*3 is dup-word frac
    > 0.3), so the oracle hash is float-free."""
    import ray.data as rd

    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.text import repetition_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["lang", "text"])
    rep = ds.map_batches(repetition_batch, batch_format="pyarrow", **REMOTE_KWARGS)

    def attribute(t: pa.Table) -> pa.Table:
        nt = t["n_tok"].to_numpy()
        nd = t["n_distinct_tok"].to_numpy()
        top = t["top_tok_n"].to_numpy()
        outcome = np.select(
            [nt < 20, (nt - nd) * 10 > nt * 3, top * 8 > nt],
            ["drop_short", "drop_dup_word", "drop_top_tok"],
            default="kept",
        )
        return pa.table(
            {
                "lang": t["lang"],
                "outcome": pa.array(outcome.astype(object), pa.string()),
                "n_tok": t["n_tok"],
            }
        )

    agg = (
        rep.map_batches(attribute, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby(["lang", "outcome"])
        .aggregate(Count(alias_name="n_docs"), Sum("n_tok", alias_name="sum_tok"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "outcome": t["outcome"],
                "n_docs": pc.cast(t["n_docs"], pa.int64()),
                "sum_tok": pc.cast(t["sum_tok"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified downsampling (ops/sampling
    .stratified_sample): language rebalancing keeps en at 25%, zh at 50%,
    everything else whole — assignment via splitmix64(doc_id XOR salt) so
    it is stable under resharding AND independent of hash_split's buckets.
    The oracle replays the salted splitmix pipeline in HUGEINT-safe 32-bit
    multiplies (the hash_split_counts mirror) and the same thresholds."""
    import ray.data as rd

    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.sampling import stratified_sample

    ds = rd.read_parquet(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "lang", "n_chars"]
    )
    kept = stratified_sample(ds, "lang", rates={"en": 0.25, "zh": 0.5})
    agg = kept.groupby("lang").aggregate(
        Count(alias_name="n_kept"),
        Sum("doc_id", alias_name="sum_doc_id"),
        Sum("n_chars", alias_name="sum_chars"),
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "lang": t["lang"],
                "n_kept": pc.cast(t["n_kept"], pa.int64()),
                "sum_doc_id": pc.cast(t["sum_doc_id"], pa.int64()),
                "sum_chars": pc.cast(t["sum_chars"], pa.int64()),
            }
        )

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_dedup_components(sf_dir: str):
    """Connected components over a duplicate-pair edge list
    (ops/components): near-dup similarity is not transitive, so canonical
    collapse needs the component (A~B, B~C => {A,B,C} one survivor) — the
    stage between pair mining and keep-first.  The edge list here is a
    deterministic arithmetic graph over doc_ids (chains of varying length
    inside each 8-block + occasional cross-block merges), chosen because
    it forces MULTI-HOP closure (diameter ~10) — exactly what a pairwise
    oracle can't check — while staying exactly SQL-mirrorable; the oracle
    recomputes the closure with a recursive CTE.  Output: one row per
    component size (size, n_components, sum_min_label)."""
    import ray.data as rd

    from joi_ray.ops.components import component_stats, connected_components

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])

    def edges(t: pa.Table) -> pa.Table:
        ids = pc.cast(t["doc_id"].combine_chunks(), pa.int64()).to_numpy(
            zero_copy_only=False
        )
        chain = ids[(ids % 8) < ((ids // 8) % 8)]
        merge = ids[ids % 64 == 0]
        return pa.table(
            {
                "id_a": np.concatenate([chain, merge]),
                "id_b": np.concatenate([chain + 1, merge + 8]),
            }
        )

    e = ds.map_batches(edges, batch_format="pyarrow", **REMOTE_KWARGS)
    return component_stats(connected_components(e))


def _q_dedup_ngram(sf_dir: str):
    """Exact n-gram-Jaccard near-dup pairs: MinHash-LSH generates candidates
    (32 bands x 2 rows -> recall ~1 at J>=0.4), each candidate verified with
    the exact 7-gram Jaccard.  The oracle computes the same set exhaustively
    in SQL, so this checks both candidate recall and the verifier.

    Scale note: 2-row bands are chosen for near-perfect recall at the LOW
    J>=0.4 threshold the oracle demands; random-pair collision probability
    is J_bg^2 per band, so the candidate set grows ~quadratically with
    corpus size at this setting.  A production 100-TB near-dup pass runs at
    higher thresholds with 4+ rows per band (see minhash_canonical /
    minhash_duplicate_pairs defaults), where candidates stay
    duplicate-rate-bounded; the driver-side np.unique here is sized to the
    fixture-scale candidate set that the exhaustive SQL oracle can verify."""
    import ray.data as rd

    from joi_ray.ops.dedup import MinHashStage, ngram_jaccard

    import ray
    from ray.data.aggregate import Count

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    banded = ds.map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(
            text_col="text", id_col="doc_id", num_perm=64, bands=32, k=7, emit_sig=False
        ),
        batch_format="pyarrow",
        concurrency=2, **REMOTE_KWARGS).materialize()  # skinny (24B/row); consumed twice

    # candidates: distributed band-bucket self-join + native distinct —
    # nothing corpus-sized touches the driver
    left = banded.map_batches(
        lambda t: t.rename_columns(["id_a", "band", "band_hash"]), batch_format="pyarrow", **REMOTE_KWARGS)
    right = banded.map_batches(
        lambda t: t.rename_columns(["id_b", "band", "band_hash"]), batch_format="pyarrow", **REMOTE_KWARGS)
    njoin = join_num_partitions()
    j = left.join(right, join_type="inner", num_partitions=njoin, on=("band", "band_hash"),
                  aggregator_ray_remote_args={"num_cpus": 0.5})
    def half_pairs(t: pa.Table) -> pa.Table:
        if t.num_columns == 0 or t.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64())})
        f = t.filter(pc.less(t["id_a"], t["id_b"])).select(["id_a", "id_b"])
        # per-batch pre-dedup: same-bucket pairs repeat across bands
        g = f.group_by(["id_a", "id_b"]).aggregate([([], "count_all")])
        return g.select(["id_a", "id_b"])

    pairs = j.map_batches(half_pairs, batch_format="pyarrow", **REMOTE_KWARGS)
    # global distinct on the driver: the pair set is ∝ candidates (not
    # corpus) and a Ray groupby over millions of singleton groups pays
    # ~30us/group — np.unique on the collected pairs is ~100x cheaper
    from joi_ray._env import collect_tables

    raw = collect_tables(
        pairs, schema=pa.schema([("id_a", pa.int64()), ("id_b", pa.int64())]))
    pair_mat = np.stack(
        [pc.cast(raw["id_a"].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False),
         pc.cast(raw["id_b"].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)],
        axis=1)
    uniq_pairs = np.unique(pair_mat, axis=0) if len(pair_mat) else pair_mat
    cand_t = pa.table({"id_a": uniq_pairs[:, 0] if len(uniq_pairs) else pa.array([], pa.int64()),
                       "id_b": uniq_pairs[:, 1] if len(uniq_pairs) else pa.array([], pa.int64())})

    # texts for candidate ids only: broadcast semi-join, bounded by the
    # candidate set — the corpus-sized doc_id->text dict is gone
    cand_ids = pc.unique(pa.concat_arrays(
        [cand_t["id_a"].combine_chunks().cast(pa.int64()),
         cand_t["id_b"].combine_chunks().cast(pa.int64())]))
    idref = ray.put(cand_ids)
    ctext = ds.map_batches(
        lambda t: t.filter(pc.is_in(pc.cast(t["doc_id"].combine_chunks(), pa.int64()),
                                    value_set=ray.get(idref))),
        batch_format="pyarrow", **REMOTE_KWARGS)
    tref = ray.put(collect_tables(ctext))

    def verify(t: pa.Table) -> pa.Table:
        from joi_ray.ops.dedup import minhash_signatures

        tt = ray.get(tref)
        keys = pc.cast(tt["doc_id"].combine_chunks(), pa.int64())
        texts = tt["text"].combine_chunks()
        ids_a = pc.cast(t["id_a"].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)
        ids_b = pc.cast(t["id_b"].combine_chunks(), pa.int64()).to_numpy(zero_copy_only=False)
        # signature pre-filter: one vectorized minhash pass over the batch's
        # unique docs estimates Jaccard per pair; random band collisions
        # (est << threshold) are dropped before the exact per-pair verify.
        # 0.25 cut at threshold 0.4 with 64 perms keeps recall ~1 (2.5 sigma)
        uniq, inv = np.unique(np.concatenate([ids_a, ids_b]), return_inverse=True)
        utexts = texts.take(pc.index_in(pa.array(uniq), value_set=keys)).to_pylist()
        sig = minhash_signatures([x or "" for x in utexts], num_perm=64, k=7)
        inv_a, inv_b = inv[: len(ids_a)], inv[len(ids_a):]
        est = (sig[inv_a] == sig[inv_b]).mean(axis=1)
        keep = np.nonzero(est >= 0.25)[0]
        tmap = dict(zip(uniq.tolist(), utexts))
        out_a, out_b, out_j = [], [], []
        for i in keep:
            a, b = int(ids_a[i]), int(ids_b[i])
            j = ngram_jaccard(tmap[a] or "", tmap[b] or "", k=7)
            if j >= 0.4:
                out_a.append(a)
                out_b.append(b)
                out_j.append(round(j, 4))
        return pa.table(
            {
                "id_a": pa.array(out_a, pa.int64()),
                "id_b": pa.array(out_b, pa.int64()),
                "jaccard": pa.array(out_j, pa.float64()),
            }
        )

    if cand_t.num_rows == 0:
        return pa.table({"id_a": pa.array([], pa.int64()), "id_b": pa.array([], pa.int64()),
                         "jaccard": pa.array([], pa.float64())})
    nparts = max(4, int(ray.cluster_resources().get("CPU", 8)))
    return (rd.from_arrow(cand_t)
            .repartition(nparts)
            .map_batches(verify, batch_format="pyarrow", **REMOTE_KWARGS))


# ---- rows-only (non-SQL-expressible) queries


def _q_flagship(sf_dir: str):
    return _violations(sf_dir)


def _q_minhash_pairs(sf_dir: str):
    """MinHash-LSH near-dup mining, ORACLED end-to-end: a deterministic x2
    tail-variant expansion of the doc_id%4==0 subset; 32x2-band LSH
    candidates (miss probability (1-J^2)^32 ~ 1e-4 at the J=0.5 boundary,
    ~0 for the J~0.9 family pairs the expansion creates), signature
    pre-filter at est>=0.25 (4 sigma below the target with 64 perms), then
    EXACT 7-gram Jaccard >= 0.5 per candidate.  The oracle computes the
    same pair set exhaustively in SQL, checking banding recall AND the
    verifier.  The expanded-subset text broadcast is subset-bounded
    (|docs|/4 x 2 rows) — the fixture-oracle analog of the candidate-only
    semi-join in _q_dedup_ngram."""
    import ray
    import ray.data as rd

    from joi_ray.ops.dedup import minhash_duplicate_pairs, ngram_jaccard

    base = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def subset_expand(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(pc.bit_wise_and(t["doc_id"].combine_chunks(), 3), 0))
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = [x or "" for x in t["text"].to_pylist()]
        out_i = np.repeat(ids * 2, 2) + np.tile(np.array([0, 1], np.int64), len(ids))
        out_t = [f"{txt} tail variant {r}" for txt in texts for r in (0, 1)]
        return pa.table({"doc_id": pa.array(out_i), "text": pa.array(out_t, pa.string())})

    exp = base.map_batches(subset_expand, batch_format="pyarrow", **REMOTE_KWARGS).materialize()
    cands = minhash_duplicate_pairs(exp, "text", "doc_id", threshold=0.25,
                                    num_perm=64, bands=32, k=7, concurrency=2)
    from joi_ray._env import collect_tables as _ct

    texts_t = _ct(exp)
    tref = ray.put(texts_t)

    def verify(t: pa.Table) -> pa.Table:
        tt = ray.get(tref)
        keys = tt["doc_id"].combine_chunks()
        texts = tt["text"].combine_chunks()
        ta = texts.take(pc.index_in(t["id_a"].combine_chunks(), value_set=keys)).to_pylist()
        tb = texts.take(pc.index_in(t["id_b"].combine_chunks(), value_set=keys)).to_pylist()
        jac = np.array([ngram_jaccard(x or "", y or "", k=7) for x, y in zip(ta, tb)])
        keep = jac >= 0.5
        return pa.table({
            "id_a": t["id_a"].combine_chunks().filter(pa.array(keep)),
            "id_b": t["id_b"].combine_chunks().filter(pa.array(keep)),
            "jaccard": pa.array(np.round(jac[keep], 4), pa.float64()),
        })

    return cands.map_batches(verify, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_simhash_pairs(sf_dir: str):
    """SimHash banding, ORACLED: x2 identical expansion; candidates from
    ONE 16-bit simhash band (token-multiset-equal texts have identical
    64-bit simhash, hence identical every band — recall exactly 1 for the
    hamming-0 class this query targets), then EXACT sorted-token-multiset
    equality verified on the canonical strings carried through the join.
    Single-band join => each id appears once per side => every pair is
    emitted exactly once, no distinct needed.  Oracle: canonical-token-
    string equality self-join (an equality join, not O(n^2)).  The general
    hamming<=3 op (simhash_duplicate_pairs) stays covered by unit tests —
    hamming-distance thresholds have no SQL analog."""
    import ray
    import ray.data as rd

    from joi_ray.ops.dedup import simhash_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def expand_sig(t: pa.Table) -> pa.Table:
        ids = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        texts = t["text"].combine_chunks().to_pandas().fillna("")
        ids2 = np.repeat(ids * 2, 2) + np.tile(np.array([0, 1], np.int64), len(ids))
        texts2 = texts.iloc[np.repeat(np.arange(len(texts)), 2)].reset_index(drop=True)
        h = simhash_batch(texts2)
        canon = (texts2.str.lower().str.findall(r"\w+")
                 .map(lambda xs: " ".join(sorted(xs))))
        return pa.table({
            "doc_id": pa.array(ids2),
            "band0": pa.array((h & np.uint64(0xFFFF)).astype(np.int64)),
            "canon": pa.array(canon, pa.string()),
        })

    sigs = ds.map_batches(expand_sig, batch_format="pyarrow", **REMOTE_KWARGS).materialize()
    left = sigs.map_batches(
        lambda t: t.rename_columns(["id_a", "band0", "canon_a"]), batch_format="pyarrow", **REMOTE_KWARGS)
    right = sigs.map_batches(
        lambda t: t.rename_columns(["id_b", "band0", "canon_b"]), batch_format="pyarrow", **REMOTE_KWARGS)
    njoin = join_num_partitions()
    j = left.join(right, join_type="inner", num_partitions=njoin, on=("band0",),
                  aggregator_ray_remote_args={"num_cpus": 0.5})

    def verify(t: pa.Table) -> pa.Table:
        t = t.filter(pc.and_(pc.less(t["id_a"], t["id_b"]),
                             pc.equal(t["canon_a"], t["canon_b"])))
        return t.select(["id_a", "id_b"])

    return j.map_batches(verify, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_tfidf_top3(sf_dir: str):
    """Per-document tf-idf top-3 terms (joi_ray.ops.text.tfidf_top_terms):
    one tokenize pass -> materialized (doc, term, tf) relation; df via
    two-phase vocabulary count; broadcast df + per-block exact top-k.
    Ranked on the raw double score with (term ASC) tie-break — identical
    (tf, df) pairs produce bit-equal doubles on both engines, so ranking
    agrees; output rounded through _py_round for the value hash."""
    import ray.data as rd

    from joi_ray.ops.text import tfidf_top_terms

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    top = tfidf_top_terms(ds, "text", "doc_id", k=3)

    def finish(t: pa.Table) -> pa.Table:
        return _py_round(pa.table({
            "doc_id": pc.cast(t["doc_id"], pa.int64()),
            "term": t["term"],
            "tfidf": t["tfidf"],
        }), {"tfidf": 4})

    return top.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_range_join_bands(sf_dir: str):
    """Range join (joi_ray.ops.joins.range_join_broadcast): orders priced
    into OVERLAPPING nation-derived bands [n*12000, n*12000+19999] — a
    row can match two bands, which an equi-join can't express.  The band
    table is broadcast once; each batch probes it with two searchsorted
    passes; no shuffle until the 25-group count/sum."""
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.joins import range_join_broadcast

    nation = pq.read_table(f"{sf_dir}/nation.parquet", columns=["n_nationkey"])
    nk = pc.cast(nation["n_nationkey"], pa.float64())
    bands = pa.table({
        "band": pc.cast(nation["n_nationkey"], pa.int64()),
        "lo": pc.multiply(nk, 12000.0),
        "hi": pc.add(pc.multiply(nk, 12000.0), 19999.0),
    })
    orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_totalprice"])
    joined = range_join_broadcast(
        orders, "o_totalprice", bands, lo_col="lo", hi_col="hi",
        range_keys=["band"], left_keep=["o_totalprice"])
    agg = joined.groupby("band").aggregate(
        Count(alias_name="n"), Sum("o_totalprice", alias_name="sum_price"))

    def finish(t: pa.Table) -> pa.Table:
        out = pa.table({
            "band": pc.cast(t["band"], pa.int64()),
            "n": pc.cast(t["n"], pa.int64()),
            "sum_price": t["sum_price"],
        })
        return _py_round(out, {"sum_price": 2})

    return agg.map_batches(finish, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_token_top20(sf_dir: str):
    """Corpus vocabulary sweep: top-20 token frequencies (two-phase count,
    vocabulary-sized shuffle — ops/text.py token_top_k)."""
    import ray.data as rd

    from joi_ray.ops.text import token_top_k

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    return token_top_k(ds, "text", k=20)


def _q_lang_distribution(sf_dir: str):
    import ray.data as rd
    from ray.data.aggregate import Count

    from joi_ray.ops.text import lang_id_batch

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["text"])
    pred = ds.map_batches(lang_id_batch, batch_format="pyarrow", **REMOTE_KWARGS)
    agg = pred.groupby("lang_pred").aggregate(Count(alias_name="n"))
    return agg.map_batches(
        lambda t: pa.table({"lang_pred": t["lang_pred"], "n": pc.cast(t["n"], pa.int64())}),
        batch_format="pyarrow", **REMOTE_KWARGS)


_DRIFT_BINS = 32


def _q_drift(sf_dir: str):
    """Drift between the even- and odd-doc_id halves of the corpus over
    n_chars: fixed 32-bin histograms are the sketch (per-batch partial
    bincounts merge associatively — the scale-safe path; only 32-row
    partials ever reach the driver), KS = max CDF gap over bin edges, PSI
    with +0.5 count smoothing.  The bin rule
    ``clip(floor((x - mn) / (mx - mn) * 32), 0, 31)`` is mirrored exactly
    in the DuckDB oracle, so this query is hash-verified."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "n_chars"])

    def clean(t: pa.Table) -> pa.Table:
        m = pc.and_(pc.is_valid(t["doc_id"]), pc.is_valid(t["n_chars"]))
        return t.filter(m)

    ds = ds.map_batches(clean, batch_format="pyarrow", **REMOTE_KWARGS)
    mm = ds.aggregate(Min("n_chars"), Max("n_chars"))
    mn, mx = float(mm["min(n_chars)"]), float(mm["max(n_chars)"])

    def partial(t: pa.Table) -> pa.Table:
        x = t["n_chars"].to_numpy(zero_copy_only=False).astype(np.float64)
        even = t["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64) % 2 == 0
        if mx > mn:
            b = np.clip(np.floor((x - mn) / (mx - mn) * _DRIFT_BINS).astype(np.int64), 0, _DRIFT_BINS - 1)
        else:
            b = np.zeros(len(x), dtype=np.int64)
        ca = np.bincount(b[even], minlength=_DRIFT_BINS)
        cb = np.bincount(b[~even], minlength=_DRIFT_BINS)
        return pa.table(
            {
                "bin": pa.array(np.arange(_DRIFT_BINS, dtype=np.int64)),
                "p_a": pa.array(ca.astype(np.int64)),
                "p_b": pa.array(cb.astype(np.int64)),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", batch_size=None,
                           **REMOTE_KWARGS).take_all()
    ca = np.zeros(_DRIFT_BINS, dtype=np.float64)
    cb = np.zeros(_DRIFT_BINS, dtype=np.float64)
    for p in parts:
        ca[p["bin"]] += p["p_a"]
        cb[p["bin"]] += p["p_b"]
    ta, tb = ca.sum(), cb.sum()
    ks = float(np.max(np.abs(np.cumsum(ca) / ta - np.cumsum(cb) / tb)))
    pa_ = (ca + 0.5) / (ta + 0.5 * _DRIFT_BINS)
    pb_ = (cb + 0.5) / (tb + 0.5 * _DRIFT_BINS)
    psi = float(np.sum((pa_ - pb_) * np.log(pa_ / pb_)))
    return pa.table(
        {
            "col": pa.array(["n_chars"], pa.string()),
            "ks": pa.array([round(ks, 4)], pa.float64()),
            "psi": pa.array([round(psi, 4)], pa.float64()),
        }
    )


def _q_media_features(sf_dir: str):
    """Media pipeline decode-roundtrip, ORACLED: payload parameters derive
    from the ref's embedded hex16, so DuckDB can recompute what each
    synthesized container *should* decode to (kind from magic bytes, PNG
    IHDR width/height, GIF screen size + frame-block count, WAV
    data_size/block_align) without decoding anything — any header-build or
    decode bug breaks the hash.  The feature stage rides the same pass:
    every fixture payload decodes, so the non-zero-feature count per kind
    must equal the row count."""
    from ray.data.aggregate import Count, Sum

    from joi_ray.ops.multimodal import media_pipeline

    media = media_pipeline(_docs_ds(sf_dir), concurrency=2, batch_size=512)

    def meta_rows(t: pa.Table) -> pa.Table:
        meta = t["media_meta"].combine_chunks()
        feats = t["media_features"].combine_chunks()
        fm = np.asarray(feats.values, dtype=np.float32).reshape(len(t), -1)
        return pa.table(
            {
                "kind": pc.struct_field(meta, "kind"),
                "w": pc.fill_null(pc.cast(pc.struct_field(meta, "width"), pa.int64()), 0),
                "h": pc.fill_null(pc.cast(pc.struct_field(meta, "height"), pa.int64()), 0),
                "f": pc.cast(pc.struct_field(meta, "n_frames"), pa.int64()),
                "nz": pa.array((np.abs(fm).sum(axis=1) > 0).astype(np.int64)),
            }
        )

    agg = (
        media.map_batches(meta_rows, batch_format="pyarrow", **REMOTE_KWARGS)
        .groupby("kind")
        .aggregate(Count(), Sum("w"), Sum("h"), Sum("f"), Sum("nz"))
    )

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["kind", "n", "sum_width", "sum_height", "sum_frames", "n_feat_nonzero"])

    return agg.map_batches(rename, batch_format="pyarrow", **REMOTE_KWARGS)


def _q_pipeline_report(sf_dir: str):
    """Full resumable pipeline through the driver contract: two shards,
    checkpoint manifest, uniqueness, snapshot — returns the report row.
    Exercises validate_dataset exactly as a production run would."""
    import shutil
    import tempfile

    import ray.data as rd

    from joi_ray.pipelines.docs import DEFAULT_STATS, document_schema
    from joi_ray.pipelines.validate import validate_dataset
    from joi_ray.sources.interleaved import asset_catalog, interleave_batch

    out_dir = tempfile.mkdtemp(prefix="joiray_report_")
    try:
        src = f"{sf_dir}/documents.parquet"
        n = pq.read_metadata(src).num_rows

        def shard(offset, length):
            def f():
                t = pq.read_table(src, columns=["doc_id", "text"]).slice(offset, length)
                return rd.from_arrow(t).map_batches(interleave_batch, batch_format="pyarrow", **REMOTE_KWARGS)

            return f

        def uniq():
            return (
                rd.read_parquet(src, columns=["doc_id", "text"])
                .map_batches(interleave_batch, batch_format="pyarrow", **REMOTE_KWARGS)
                .select_columns(["doc_id"])
            )

        rep = validate_dataset(
            [shard(0, n // 2), shard(n // 2, n - n // 2)],
            schema=document_schema(),
            out_dir=out_dir,
            catalog=asset_catalog(),
            ref_path="spans.media_ref",
            stats_numeric=DEFAULT_STATS["numeric"],
            stats_categorical=DEFAULT_STATS["categorical"],
            stats_id=DEFAULT_STATS["id"],
            unique_ds_factory=uniq,
            batch_size=2048,
            resume=False,
        )
        return pa.table(
            {
                "rows": pa.array([rep.rows], pa.int64()),
                "failed": pa.array([rep.failed], pa.int64()),
                "shards": pa.array([rep.shards], pa.int64()),
                "duplicates": pa.array([rep.duplicates], pa.int64()),
                "duplicate_rows_excess": pa.array([rep.duplicate_rows_excess], pa.int64()),
                "passed": pa.array([rep.passed], pa.bool_()),
            }
        )
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def _q_embedding_dups(sf_dir: str):
    """Embedding cosine near-dup, ORACLED: x2 identical-clone expansion of
    every vector; LSH bucket self-join + row-wise cosine >= 0.95.
    Identical vectors hash to the SAME hyperplane bucket, so recall for
    the clone pairs is exactly 1 (not probabilistic); the fixture's random
    base vectors top out near cosine 0.51, so no cross pair qualifies —
    the oracle verifies BOTH (exhaustive cosine in SQL over the same
    expansion): any LSH false positive or dropped clone pair breaks the
    hash.  General perturbed-pair recall stays covered by unit tests
    (probabilistic recall has no SQL analog)."""
    import ray.data as rd

    from joi_ray.ops.dedup import embedding_duplicate_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def clone2(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), 2)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)[idx] * 2 + (
            np.arange(2 * n, dtype=np.int64) % 2)
        out = t.take(pa.array(idx)).replace_schema_metadata(None)
        return out.set_column(0, "vec_id", pa.array(ids))

    pairs = embedding_duplicate_pairs(
        ds.map_batches(clone2, batch_format="pyarrow", **REMOTE_KWARGS),
        "embedding", "vec_id", threshold=0.95, concurrency=2)
    return pairs.map_batches(lambda t: t.select(["id_a", "id_b"]),
                             batch_format="pyarrow", **REMOTE_KWARGS)


def _q_embedding_dups_r2(sf_dir: str):
    """Multi-rotation variant of ``embedding_near_dups`` (n_rotations=2):
    the same exhaustive SQL mirror must match EXACTLY — clones share a
    bucket in every rotation, so the rotation-distinct groupby must
    collapse the doubled candidates without dropping or duplicating any
    pair (the recall-vs-exhaustive measurement at perturbed pairs lives in
    tests/test_ops.py::test_embedding_dedup_multi_rotation_recall)."""
    import ray.data as rd

    from joi_ray.ops.dedup import embedding_duplicate_pairs

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])

    def clone2(t: pa.Table) -> pa.Table:
        n = t.num_rows
        idx = np.repeat(np.arange(n, dtype=np.int64), 2)
        ids = t["vec_id"].to_numpy(zero_copy_only=False)[idx] * 2 + (
            np.arange(2 * n, dtype=np.int64) % 2)
        out = t.take(pa.array(idx)).replace_schema_metadata(None)
        return out.set_column(0, "vec_id", pa.array(ids))

    pairs = embedding_duplicate_pairs(
        ds.map_batches(clone2, batch_format="pyarrow", **REMOTE_KWARGS),
        "embedding", "vec_id", threshold=0.95, n_rotations=2, concurrency=2)
    return pairs.map_batches(lambda t: t.select(["id_a", "id_b"]),
                             batch_format="pyarrow", **REMOTE_KWARGS)


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "pricing_summary": _q_pricing_summary,
        "val_lineitem_rules": _q_val_lineitem,
        "val_document_rules": _q_val_documents,
        "rename_regex": _q_rename_regex,
        "uniqueness_doc_id": _q_uniqueness,
        "violation_counts": _q_violation_counts,
        "span_stats": _q_span_stats,
        "referential_keys": _q_referential,
        "events_window": _q_events_window,
        "events_sessions": _q_events_sessions,
        "val_props_json": _q_val_props_json,
        "events_running": _q_events_running,
        "clean_documents": _q_clean_documents,
        "asof_last_order": _q_asof_last_order,
        "quantiles_price": _q_quantiles_price,
        "stats_corr": _q_stats_corr,
        "histogram_quantity": _q_histogram_quantity,
        "dangling_refs": _q_dangling_refs,
        "top3_per_segment": _q_top3_orders_per_segment,
        "events_pivot": _q_events_pivot,
        "join_mktsegment": _q_join_mktsegment,
        "join_region_revenue": _q_join_region,
        "events_sliding": _q_events_sliding,
        "token_counts": _q_token_counts,
        "chunking": _q_chunking,
        "union_distinct": _q_union_distinct,
        "systematic_sample": _q_systematic_sample,
        "hash_split_counts": _q_hash_split,
        "top_orders": _q_top_orders,
        "ann_top5": _q_ann_top5,
        "ann_top5_ivf": _q_ann_top5_ivf,
        "embedding_norms": _q_embedding_norms,
        "dedup_exact": _q_dedup_exact,
        "dedup_exact_keep": _q_dedup_exact_keep,
        "dedup_ngram_jaccard": _q_dedup_ngram,
        "stats_quantity": _q_stats_quantity,
        "quality_by_lang": _q_quality_by_lang,
        "gopher_repetition": _q_gopher_repetition,
        "pii_scrub_stats": _q_pii_scrub,
        "dedup_components": _q_dedup_components,
        "stratified_sample_counts": _q_stratified_sample,
        "clean_funnel": _q_clean_funnel,
        "keyword_search_top10": _q_keyword_search,
        "contamination_4gram": _q_contamination,
        "pack_sequences_2048": _q_pack_sequences,
        "flagship_validation": _q_flagship,
        "minhash_near_dups": _q_minhash_pairs,
        "simhash_near_dups": _q_simhash_pairs,
        "lang_id_distribution": _q_lang_distribution,
        "token_top20": _q_token_top20,
        "tfidf_top3": _q_tfidf_top3,
        "range_join_bands": _q_range_join_bands,
        "drift_halves": _q_drift,
        "media_features": _q_media_features,
        "embedding_near_dups": _q_embedding_dups,
        "embedding_near_dups_r2": _q_embedding_dups_r2,
        "pipeline_report": _q_pipeline_report,
    }


_DOC_ID_SQL = """
  CASE
    WHEN doc_id % 1000 = 7 THEN NULL
    WHEN doc_id % 1000 = 13 THEN 'DOC_' || CAST(doc_id AS VARCHAR)
    WHEN doc_id % 100 = 99 THEN 'doc-ffffffff'
    WHEN doc_id % 1000 = 21 THEN 'doc-' || lpad(lower(to_hex(doc_id - 1)), 8, '0')
    ELSE 'doc-' || lpad(lower(to_hex(doc_id)), 8, '0')
  END
"""

_N_SPANS_SQL = "CASE WHEN doc_id % 1000 = 29 THEN 0 ELSE 2 + (doc_id % 5) END"


def oracle_sql() -> dict[str, str]:
    return {
        # the flagship violation sample IS SQL-expressible: every dirt rule
        # is a pure function of the flat integer id (sources/interleaved.py
        # module docstring), so the expected violation rows — doc_id, row,
        # path, item_index, code, rendered message, context JSON — can be
        # reconstructed exactly (closes round-3's only no_oracle row)
        "flagship_validation": """
            WITH d AS (
              SELECT doc_id AS id, row_number() OVER () - 1 AS row,
                     doc_id % 1000 AS m
              FROM documents
            )
            SELECT * FROM (
              SELECT CAST(NULL AS VARCHAR) AS doc_id, row, 'doc_id' AS path,
                     CAST(-1 AS INTEGER) AS item_index, 'any.required' AS code,
                     '"doc_id" is required' AS message,
                     '{}' AS context, 'error' AS severity
              FROM d WHERE m = 7
              UNION ALL
              SELECT 'DOC_' || CAST(id AS VARCHAR), row, 'doc_id', CAST(-1 AS INTEGER),
                     'string.pattern.base',
                     '"doc_id" with value "DOC_' || CAST(id AS VARCHAR)
                       || '" fails to match the required pattern: /^doc-[0-9a-f]{8}$/',
                     '{"name": null, "regex": "^doc-[0-9a-f]{8}$"}', 'error'
              FROM d WHERE m = 13
              UNION ALL
              SELECT printf('doc-%08x', id), row, 'spans', CAST(-1 AS INTEGER), 'array.min',
                     '"spans" must contain at least 1 items', '{"limit": 1}', 'error'
              FROM d WHERE m = 29
              UNION ALL
              SELECT printf('doc-%08x', id), row, 'spans.kind', CAST(0 AS INTEGER), 'any.only',
                     '"spans[0].kind" must be one of [text, image, audio, video]',
                     '{"valids": ["text", "image", "audio", "video"]}', 'error'
              FROM d WHERE m = 35
              UNION ALL
              SELECT printf('doc-%08x', id), row, 'spans.media_ref', CAST(0 AS INTEGER),
                     'any.required', '"spans[0].media_ref" is required', '{}', 'error'
              FROM d WHERE m = 35
              UNION ALL
              SELECT printf('doc-%08x', id), row, 'spans.text', CAST(0 AS INTEGER),
                     'any.unknown', '"spans[0].text" is not allowed', '{}', 'error'
              FROM d WHERE m = 35
              UNION ALL
              SELECT printf('doc-%08x', id), row, 'spans.text', CAST(0 AS INTEGER),
                     'string.empty', '"spans[0].text" is not allowed to be empty', '{}', 'error'
              FROM d WHERE m = 41
              UNION ALL
              SELECT printf('doc-%08x', id), row, 'spans.media_ref', CAST(1 AS INTEGER),
                     'referential.missing',
                     '"spans.media_ref" references an asset missing from the catalog',
                     '{"value": "asset://dead' || printf('%012x', id) || '"}', 'error'
              FROM d WHERE m = 47
              UNION ALL
              SELECT printf('doc-%08x', id), row, 'spans', CAST(-1 AS INTEGER), 'array.sort',
                     '"spans" must be sorted in ascending order by offset',
                     '{"by": "offset", "order": "ascending"}', 'error'
              FROM d WHERE m = 53
            ) ORDER BY row, path
        """,
        "pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   round(sum(l_quantity), 2) AS sum_qty,
                   round(sum(l_extendedprice), 2) AS sum_base_price,
                   round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
                   count(*) AS count_order
            FROM lineitem GROUP BY l_returnflag, l_linestatus
        """,
        "val_lineitem_rules": """
            SELECT * FROM (
              SELECT 'l_quantity' AS path, 'number.min' AS code, count(*) AS n FROM lineitem WHERE l_quantity < 2
              UNION ALL SELECT 'l_quantity', 'number.max', count(*) FROM lineitem WHERE l_quantity > 49
              UNION ALL SELECT 'l_discount', 'number.min', count(*) FROM lineitem WHERE l_discount < 0
              UNION ALL SELECT 'l_discount', 'number.max', count(*) FROM lineitem WHERE l_discount > 0.08
              UNION ALL SELECT 'l_shipdate', 'date.max', count(*) FROM lineitem WHERE l_shipdate > TIMESTAMP '1998-12-31'
            ) WHERE n > 0
        """,
        "rename_regex": """
            SELECT count(*) AS n,
                   round(sum(l_quantity), 2) AS sum_quantity,
                   round(sum(l_discount), 2) AS sum_discount
            FROM lineitem
        """,
        "val_document_rules": """
            SELECT * FROM (
              SELECT 'text' AS path, 'string.min' AS code, count(*) AS n FROM documents WHERE length(text) < 50
              UNION ALL SELECT 'text', 'string.max', count(*) FROM documents WHERE length(text) > 520
              UNION ALL SELECT 'lang', 'any.only', count(*) FROM documents WHERE lang NOT IN ('en','zh','es','de','fr')
              UNION ALL SELECT 'source', 'string.pattern.base', count(*) FROM documents WHERE NOT regexp_matches(source, '^src[0-9]+$')
            ) WHERE n > 0
        """,
        "uniqueness_doc_id": f"""
            WITH did AS (SELECT {_DOC_ID_SQL} AS doc_id FROM documents)
            SELECT doc_id, count(*) AS n FROM did WHERE doc_id IS NOT NULL
            GROUP BY doc_id HAVING count(*) > 1
        """,
        "violation_counts": """
            WITH m AS (SELECT doc_id % 1000 AS r FROM documents)
            SELECT code, n FROM (
              SELECT 'any.required' AS code,
                     (SELECT count(*) FROM m WHERE r = 7) + (SELECT count(*) FROM m WHERE r = 35) AS n
              UNION ALL SELECT 'string.pattern.base', (SELECT count(*) FROM m WHERE r = 13)
              UNION ALL SELECT 'array.min', (SELECT count(*) FROM m WHERE r = 29)
              UNION ALL SELECT 'any.only', (SELECT count(*) FROM m WHERE r = 35)
              UNION ALL SELECT 'any.unknown', (SELECT count(*) FROM m WHERE r = 35)
              UNION ALL SELECT 'string.empty', (SELECT count(*) FROM m WHERE r = 41)
              -- (r=41 seeds '' under a min rule: joi emits ONLY
              -- string.empty — a base error aborts before rules,
              -- validator.js:236-247 — so no string.min bucket)
              UNION ALL SELECT 'array.sort', (SELECT count(*) FROM m WHERE r = 53)
              UNION ALL SELECT 'referential.missing', (SELECT count(*) FROM m WHERE r = 47)
            ) WHERE n > 0
        """,
        "span_stats": f"""
            SELECT sum(ns)::BIGINT AS total_spans, count(*)::BIGINT AS n_docs,
                   round(sum(ns) / count(*), 4) AS avg_spans
            FROM (SELECT {_N_SPANS_SQL} AS ns FROM documents)
        """,
        "referential_keys": """
            SELECT
              (SELECT count(*) FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
                WHERE c.c_custkey IS NULL)::BIGINT AS missing_customers,
              (SELECT count(*) FROM lineitem l LEFT JOIN part p ON l.l_partkey = p.p_partkey
                WHERE p.p_partkey IS NULL)::BIGINT AS missing_parts
        """,
        "events_window": """
            SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   count(*) AS n, round(sum(value), 2) AS sum_value
            FROM events GROUP BY event_type, day
        """,
        "top3_per_segment": """
            SELECT c_mktsegment, o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders JOIN customer ON o_custkey = c_custkey
            QUALIFY row_number() OVER (
              PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey DESC
            ) <= 3
        """,
        "dangling_refs": """
            SELECT 'doc-' || lpad(lower(to_hex(doc_id)), 8, '0') AS doc_id,
                   'asset://dead' || lpad(lower(to_hex(doc_id)), 12, '0') AS media_ref
            FROM documents WHERE doc_id % 1000 = 47
        """,
        "histogram_quantity": """
            SELECT floor(l_quantity / 5)::BIGINT AS bin, count(*) AS n
            FROM lineitem GROUP BY bin
        """,
        "stats_corr": """
            SELECT count(*)::BIGINT AS n,
                   round(stddev_samp(l_quantity), 4) AS std_qty,
                   round(corr(l_quantity, l_extendedprice), 4) AS corr_qty_price
            FROM lineitem
        """,
        "quantiles_price": """
            SELECT quantile_cont(l_quantity, 0.5) AS p50,
                   quantile_cont(l_quantity, 0.9) AS p90,
                   quantile_cont(l_quantity, 0.99) AS p99
            FROM lineitem
        """,
        "events_pivot": """
            SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
                   sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)::BIGINT AS click,
                   sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)::BIGINT AS error,
                   sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)::BIGINT AS purchase,
                   sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)::BIGINT AS signup,
                   sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)::BIGINT AS view
            FROM events GROUP BY day
        """,
        "asof_last_order": """
            WITH o AS (
              SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
              FROM orders GROUP BY o_custkey, o_orderdate
            )
            SELECT event_id, o.o_orderkey
            FROM events ASOF LEFT JOIN o
              ON events.user_id = o.o_custkey AND events.ts >= o.o_orderdate
        """,
        "clean_documents": """
            WITH m AS (SELECT doc_id, doc_id % 1000 AS r FROM documents),
            clean AS (SELECT doc_id FROM m WHERE r NOT IN (7,13,29,35,41,47,53))
            SELECT count(*)::BIGINT AS n_clean,
                   coalesce(sum(2 + (doc_id % 5)), 0)::BIGINT AS total_spans
            FROM clean
        """,
        "events_running": """
            SELECT event_id, user_id,
                   round(sum(value) OVER (PARTITION BY user_id ORDER BY ts, event_id), 4) AS running_value
            FROM events
        """,
        "val_props_json": """
            SELECT 'props.k' AS path, 'number.min' AS code, count(*) AS n
            FROM events
            WHERE CAST(json_extract_string(props, '$.k') AS DOUBLE) < 50
        """,
        "events_sessions": """
            WITH marked AS (
              SELECT user_id, ts,
                     CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                               > INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_session
              FROM events
            )
            SELECT user_id, count(*) AS n_events,
                   (sum(new_session) + 1)::BIGINT AS n_sessions
            FROM marked GROUP BY user_id
        """,
        "join_mktsegment": """
            SELECT c_mktsegment, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders JOIN customer ON o_custkey = c_custkey
            GROUP BY c_mktsegment
        """,
        "join_region_revenue": """
            SELECT r_name, round(sum(o_totalprice), 2) AS revenue, count(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name
        """,
        "events_sliding": """
            WITH hops AS (
              SELECT event_type,
                     unnest([
                       strftime(to_timestamp(floor(epoch(ts) / 1800) * 1800), '%Y-%m-%d %H:%M'),
                       strftime(to_timestamp(floor(epoch(ts) / 1800) * 1800 - 1800), '%Y-%m-%d %H:%M')
                     ]) AS window_start
              FROM events
            )
            SELECT event_type, window_start, count(*) AS n
            FROM hops GROUP BY event_type, window_start
        """,
        "union_distinct": """
            SELECT DISTINCT v FROM (
              SELECT l_returnflag AS v FROM lineitem
              UNION ALL SELECT l_linestatus FROM lineitem
            )
        """,
        "systematic_sample": """
            SELECT count(*) AS n, sum(n_chars)::BIGINT AS sum_chars
            FROM documents WHERE doc_id % 7 = 3
        """,
        # hash_split mirror: splitmix64(doc_id) % 10000 exactly as
        # ops/sampling.split_buckets; each 64x64 multiply mod 2^64 is split
        # into HUGEINT-safe 32-bit halves (b = hi*2^32 + lo =>
        # a*b mod 2^64 = ((a_lo*b_hi + a_hi*b_lo) mod 2^32)*2^32 + a_lo*b_lo).
        # Thresholds: train < 9800, val < 9900, else test.
        "hash_split_counts": """
            WITH s0 AS (
              SELECT lang, n_chars,
                     CAST((CAST(doc_id AS HUGEINT) + 11400714819323198485)
                          % 18446744073709551616 AS UBIGINT) AS z0
              FROM documents
            ), m1 AS (
              SELECT lang, n_chars, xor(z0, z0 >> 30) AS x1 FROM s0
            ), s1 AS (
              SELECT lang, n_chars,
                     CAST(((((CAST(x1 % 4294967296 AS HUGEINT) * 3210233709
                              + CAST(x1 // 4294967296 AS HUGEINT) * 484763065)
                             % 4294967296) * 4294967296
                            + CAST(x1 % 4294967296 AS HUGEINT) * 484763065)
                           % 18446744073709551616) AS UBIGINT) AS z1
              FROM m1
            ), m2 AS (
              SELECT lang, n_chars, xor(z1, z1 >> 27) AS x2 FROM s1
            ), s2 AS (
              SELECT lang, n_chars,
                     CAST(((((CAST(x2 % 4294967296 AS HUGEINT) * 2496678331
                              + CAST(x2 // 4294967296 AS HUGEINT) * 321982955)
                             % 4294967296) * 4294967296
                            + CAST(x2 % 4294967296 AS HUGEINT) * 321982955)
                           % 18446744073709551616) AS UBIGINT) AS z2
              FROM m2
            ), b AS (
              SELECT lang, n_chars, xor(z2, z2 >> 31) % 10000 AS bucket FROM s2
            )
            SELECT CASE WHEN bucket < 9800 THEN 'train'
                        WHEN bucket < 9900 THEN 'val'
                        ELSE 'test' END AS split,
                   lang, count(*) AS n, sum(n_chars)::BIGINT AS sum_chars
            FROM b GROUP BY 1, 2
        """,
        "top_orders": """
            SELECT o_orderkey, round(o_totalprice, 2) AS o_totalprice
            FROM orders ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 10
        """,
        "token_counts": """
            SELECT doc_id,
                   CASE WHEN trim(text) = '' THEN 0
                        ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS ws_tokens
            FROM documents
        """,
        "chunking": """
            WITH toks AS (
              SELECT doc_id,
                     regexp_split_to_array(trim(text), '\\s+') AS t,
                     CASE WHEN trim(text) = '' THEN 0
                          ELSE len(regexp_split_to_array(trim(text), '\\s+')) END AS n
              FROM documents
            )
            SELECT doc_id, gs.g AS chunk_idx,
                   array_to_string(t[(gs.g*4)+1 : (gs.g*4)+6], ' ') AS chunk_text,
                   least(gs.g*4 + 6, n) - gs.g*4 AS n_tokens
            FROM toks, LATERAL (
              SELECT unnest(generate_series(0, CAST(ceil(n/4.0) AS BIGINT))) AS g) gs
            WHERE n > 0 AND gs.g*4 < n
        """,
        "ann_top5": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 5))
            SELECT query_id, e.vec_id,
                   round(CAST(list_cosine_similarity(qe, e.embedding) AS DOUBLE), 4) AS score
            FROM q CROSS JOIN embeddings e
            QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) <= 5
        """,
        "ann_top5_ivf": """
            WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id IN (0, 5))
            SELECT query_id, e.vec_id
            FROM q CROSS JOIN embeddings e
            QUALIFY row_number() OVER (PARTITION BY query_id ORDER BY list_cosine_similarity(qe, e.embedding) DESC, e.vec_id) <= 5
            ORDER BY query_id, e.vec_id
        """,
        "embedding_norms": """
            SELECT label::BIGINT AS label,
                   round(avg(sqrt(list_aggregate(list_transform(embedding, x -> x * x), 'sum'))), 4) AS avg_norm,
                   count(*) AS n
            FROM embeddings GROUP BY label
        """,
        "dedup_exact": """
            SELECT min(doc_id) AS keep_id, count(*) AS n
            FROM documents GROUP BY text HAVING count(*) > 1
        """,
        "dedup_exact_keep": """
            WITH w AS (
              SELECT doc_id,
                     min(doc_id) OVER (PARTITION BY substring(text, 1, 16)) AS keeper
              FROM documents
            )
            SELECT count(*) AS n_kept, sum(doc_id)::BIGINT AS sum_kept_ids
            FROM w WHERE doc_id = keeper
        """,
        # Cleaning funnel: same token/bigram CTE machinery as
        # gopher_repetition; first-failing-rule attribution via CASE in
        # the same order as _q_clean_funnel.attribute (np.select).
        "clean_funnel": """
            WITH t AS (
              SELECT doc_id, lang, string_split(text, ' ') AS toks
              FROM documents
            ), tok AS (
              SELECT doc_id, lang, unnest(toks) AS tok FROM t
            ), wc AS (
              SELECT doc_id, lang, tok, count(*) AS c
              FROM tok GROUP BY 1, 2, 3
            ), per_doc AS (
              SELECT doc_id, lang, sum(c) AS nt, count(*) AS nd,
                     max(c) AS top FROM wc GROUP BY 1, 2
            ), attributed AS (
              SELECT lang, nt,
                     CASE WHEN nt < 20 THEN 'drop_short'
                          WHEN (nt - nd) * 10 > nt * 3 THEN 'drop_dup_word'
                          WHEN top * 8 > nt THEN 'drop_top_tok'
                          ELSE 'kept' END AS outcome
              FROM per_doc
            )
            SELECT lang, outcome, count(*) AS n_docs,
                   sum(nt)::BIGINT AS sum_tok
            FROM attributed GROUP BY 1, 2
        """,
        # Stratified sample: splitmix64 over xor(doc_id, salt) — same
        # HUGEINT-safe 32-bit-split multiplies as hash_split_counts —
        # then per-lang keep thresholds (en 25%, zh 50%, rest 100%).
        "stratified_sample_counts": """
            WITH s0 AS (
              SELECT lang, n_chars, doc_id,
                     CAST((CAST(xor(doc_id, 23063) AS HUGEINT)
                           + 11400714819323198485)
                          % 18446744073709551616 AS UBIGINT) AS z0
              FROM documents
            ), m1 AS (
              SELECT lang, n_chars, doc_id, xor(z0, z0 >> 30) AS x1 FROM s0
            ), s1 AS (
              SELECT lang, n_chars, doc_id,
                     CAST(((((CAST(x1 % 4294967296 AS HUGEINT) * 3210233709
                              + CAST(x1 // 4294967296 AS HUGEINT) * 484763065)
                             % 4294967296) * 4294967296
                            + CAST(x1 % 4294967296 AS HUGEINT) * 484763065)
                           % 18446744073709551616) AS UBIGINT) AS z1
              FROM m1
            ), m2 AS (
              SELECT lang, n_chars, doc_id, xor(z1, z1 >> 27) AS x2 FROM s1
            ), s2 AS (
              SELECT lang, n_chars, doc_id,
                     CAST(((((CAST(x2 % 4294967296 AS HUGEINT) * 2496678331
                              + CAST(x2 // 4294967296 AS HUGEINT) * 321982955)
                             % 4294967296) * 4294967296
                            + CAST(x2 % 4294967296 AS HUGEINT) * 321982955)
                           % 18446744073709551616) AS UBIGINT) AS z2
              FROM m2
            ), b AS (
              SELECT lang, n_chars, doc_id,
                     xor(z2, z2 >> 31) % 10000 AS bucket FROM s2
            )
            SELECT lang, count(*) AS n_kept,
                   sum(doc_id)::BIGINT AS sum_doc_id,
                   sum(n_chars)::BIGINT AS sum_chars
            FROM b
            WHERE bucket < CASE lang WHEN 'en' THEN 2500
                                     WHEN 'zh' THEN 5000
                                     ELSE 10000 END
            GROUP BY lang
        """,
        # Connected components: the recursive CTE computes the same
        # multi-hop min-label closure over the same arithmetic edge list
        # as _q_dedup_components.edges (chains + cross-block merges).
        "dedup_components": """
            WITH RECURSIVE
            e1 AS (
              SELECT doc_id AS a, doc_id + 1 AS b FROM documents
              WHERE doc_id % 8 < (doc_id // 8) % 8
            ),
            e2 AS (
              SELECT doc_id AS a, doc_id + 8 AS b FROM documents
              WHERE doc_id % 64 = 0
            ),
            edges AS (SELECT a, b FROM e1 UNION ALL SELECT a, b FROM e2),
            sym AS (SELECT a, b FROM edges UNION SELECT b, a FROM edges),
            nodes AS (SELECT DISTINCT a AS n FROM sym),
            reach AS (
              SELECT n AS node, n AS label FROM nodes
              UNION
              SELECT s.b AS node, r.label
              FROM reach r JOIN sym s ON s.a = r.node
            ),
            comp AS (SELECT node, min(label) AS label FROM reach GROUP BY node),
            sizes AS (SELECT label, count(*) AS size FROM comp GROUP BY label)
            SELECT CAST(size AS BIGINT) AS size,
                   CAST(count(*) AS BIGINT) AS n_components,
                   CAST(sum(label) AS BIGINT) AS sum_min_label
            FROM sizes GROUP BY size
        """,
        "dedup_ngram_jaccard": """
            WITH gs AS (SELECT unnest(generate_series(1, 4096)) AS i),
            sh AS (
              SELECT DISTINCT doc_id, substring(text, gs.i, 7) AS g
              FROM documents CROSS JOIN gs
              WHERE gs.i <= greatest(length(text) - 6, 1)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS m
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   round(m / (sa.n + sb.n - m), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE m / (sa.n + sb.n - m) >= 0.4
        """,
        "minhash_near_dups": """
            WITH base AS (
              SELECT doc_id, coalesce(text, '') AS text
              FROM documents WHERE doc_id % 4 = 0
            ),
            exp AS (
              SELECT base.doc_id * 2 + r.r AS doc_id,
                     base.text || ' tail variant ' || r.r AS text
              FROM base CROSS JOIN (SELECT unnest([0, 1]) AS r) r
            ),
            gs AS (SELECT unnest(generate_series(1, 4096)) AS i),
            sh AS (
              SELECT DISTINCT doc_id, substring(text, gs.i, 7) AS g
              FROM exp CROSS JOIN gs
              WHERE gs.i <= greatest(length(text) - 6, 1)
            ),
            sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
            inter AS (
              SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS m
              FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
              GROUP BY a.doc_id, b.doc_id
            )
            SELECT id_a, id_b,
                   round(m / (sa.n + sb.n - m), 4) AS jaccard
            FROM inter
            JOIN sizes sa ON sa.doc_id = id_a
            JOIN sizes sb ON sb.doc_id = id_b
            WHERE m / (sa.n + sb.n - m) >= 0.5
        """,
        "simhash_near_dups": """
            WITH exp AS (
              SELECT doc_id * 2 + r.r AS id,
                     lower(coalesce(text, '')) AS t
              FROM documents CROSS JOIN (SELECT unnest([0, 1]) AS r) r
            ),
            canon AS (
              SELECT id,
                     array_to_string(list_sort(regexp_extract_all(t, '\\w+')), ' ') AS c
              FROM exp
            )
            SELECT a.id AS id_a, b.id AS id_b
            FROM canon a JOIN canon b ON a.c = b.c AND a.id < b.id
        """,
        "embedding_near_dups": """
            WITH exp AS (
              SELECT vec_id * 2 + r.r AS id, embedding
              FROM embeddings CROSS JOIN (SELECT unnest([0, 1]) AS r) r
            ),
            dims AS (SELECT unnest(generate_series(1, 256)) AS i),
            flat AS (
              SELECT id, list_extract(embedding, dims.i)::DOUBLE AS val, dims.i AS ord
              FROM exp CROSS JOIN dims
              WHERE dims.i <= len(embedding)
            ),
            norms AS (SELECT id, sqrt(sum(val * val)) AS n FROM flat GROUP BY id),
            dots AS (
              SELECT a.id AS id_a, b.id AS id_b, sum(a.val * b.val) AS d
              FROM flat a JOIN flat b ON a.ord = b.ord AND a.id < b.id
              GROUP BY a.id, b.id
            )
            SELECT id_a, id_b
            FROM dots
            JOIN norms na ON na.id = id_a
            JOIN norms nb ON nb.id = id_b
            WHERE d / (na.n * nb.n) >= 0.95
        """,
        "embedding_near_dups_r2": """
            WITH exp AS (
              SELECT vec_id * 2 + r.r AS id, embedding
              FROM embeddings CROSS JOIN (SELECT unnest([0, 1]) AS r) r
            ),
            dims AS (SELECT unnest(generate_series(1, 256)) AS i),
            flat AS (
              SELECT id, list_extract(embedding, dims.i)::DOUBLE AS val, dims.i AS ord
              FROM exp CROSS JOIN dims
              WHERE dims.i <= len(embedding)
            ),
            norms AS (SELECT id, sqrt(sum(val * val)) AS n FROM flat GROUP BY id),
            dots AS (
              SELECT a.id AS id_a, b.id AS id_b, sum(a.val * b.val) AS d
              FROM flat a JOIN flat b ON a.ord = b.ord AND a.id < b.id
              GROUP BY a.id, b.id
            )
            SELECT id_a, id_b
            FROM dots
            JOIN norms na ON na.id = id_a
            JOIN norms nb ON nb.id = id_b
            WHERE d / (na.n * nb.n) >= 0.95
        """,
        "range_join_bands": """
            WITH bands AS (
              SELECT n_nationkey AS band,
                     n_nationkey * 12000.0 AS lo,
                     n_nationkey * 12000.0 + 19999.0 AS hi
              FROM nation
            )
            SELECT band, count(*) AS n,
                   round(sum(o_totalprice), 2) AS sum_price
            FROM orders JOIN bands ON o_totalprice BETWEEN lo AND hi
            GROUP BY band
        """,
        "tfidf_top3": """
            WITH tf AS (
              SELECT doc_id, tok.t AS term, count(*) AS tf
              FROM (
                SELECT doc_id,
                       unnest(regexp_extract_all(lower(coalesce(text, '')), '\\w+')) AS t
                FROM documents
              ) tok
              GROUP BY doc_id, tok.t
            ),
            dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
            nd AS (SELECT count(*) AS n FROM documents),
            ranked AS (
              SELECT tf.doc_id, tf.term,
                     tf.tf * ln(nd.n / dfreq.df) AS s,
                     row_number() OVER (
                       PARTITION BY tf.doc_id
                       ORDER BY tf.tf * ln(nd.n / dfreq.df) DESC, tf.term
                     ) AS rn
              FROM tf JOIN dfreq USING (term) CROSS JOIN nd
            )
            SELECT doc_id, term, round(s, 4) AS tfidf
            FROM ranked WHERE rn <= 3
        """,
        "token_top20": """
            WITH toks AS (
              SELECT unnest(regexp_extract_all(lower(coalesce(text, '')), '\\w+')) AS token
              FROM documents
            )
            SELECT token, count(*) AS n FROM toks
            GROUP BY token ORDER BY n DESC, token LIMIT 20
        """,
        "lang_id_distribution": """
            WITH scored AS (
              SELECT greatest(len(regexp_extract_all(coalesce(text, ''), '\\b\\w+\\b')), 1)::DOUBLE AS nw,
                     len(regexp_extract_all(coalesce(text, ''), '(?i)\\b(?:the|and|of|to|in|is|that|it|for|with)\\b'))::DOUBLE AS c_en,
                     len(regexp_extract_all(coalesce(text, ''), '(?i)\\b(?:le|la|les|de|et|un|une|est|que|pour)\\b'))::DOUBLE AS c_fr,
                     len(regexp_extract_all(coalesce(text, ''), '(?i)\\b(?:der|die|das|und|ist|nicht|ein|eine|mit|für)\\b'))::DOUBLE AS c_de,
                     len(regexp_extract_all(coalesce(text, ''), '(?i)\\b(?:el|la|los|de|y|un|una|es|que|para)\\b'))::DOUBLE AS c_es,
                     len(regexp_extract_all(coalesce(text, ''), '(?i)\\b(?:il|la|di|e|un|una|che|per|non|con)\\b'))::DOUBLE AS c_it
              FROM documents
            ), s2 AS (
              SELECT c_en/nw AS s_en, c_fr/nw AS s_fr, c_de/nw AS s_de,
                     c_es/nw AS s_es, c_it/nw AS s_it
              FROM scored
            ), pick AS (
              SELECT CASE
                WHEN greatest(s_en, s_fr, s_de, s_es, s_it) <= 0.01 THEN 'und'
                WHEN s_en >= s_fr AND s_en >= s_de AND s_en >= s_es AND s_en >= s_it THEN 'en'
                WHEN s_fr >= s_de AND s_fr >= s_es AND s_fr >= s_it THEN 'fr'
                WHEN s_de >= s_es AND s_de >= s_it THEN 'de'
                WHEN s_es >= s_it THEN 'es'
                ELSE 'it' END AS lang_pred
              FROM s2
            )
            SELECT lang_pred, count(*) AS n FROM pick GROUP BY lang_pred
        """,
        # media decode-roundtrip: recompute what each synthesized container
        # SHOULD decode to, straight from the span/ref formulas (FIXTURES.md
        # §1 + ops/multimodal.synth_media_payload) — hv is the ref's hex16:
        # pool refs hv = (j*0x9E3779B97F4A7C15 mod 2^64) XOR 0xD1B54A32D192ED03
        # with j=(id*7+pos*13)%4096; dangling refs (id%1000==47, pos==1) are
        # "dead"+id hex -> hv = 0xdead<<48 | id.  kind=hv%3 (0 png / 1 wav /
        # 2 gif); w=16+hv%240, h=16+(hv>>8)%240, frames=1+(hv>>16)%8; WAV
        # decodes to frames*16 samples and has no width/height.
        "media_features": """
            WITH spans AS (
              SELECT d.doc_id AS id, p.pos AS pos
              FROM documents d
              CROSS JOIN (SELECT unnest(generate_series(0, 5)) AS pos) p
              WHERE p.pos % 2 = 1
                AND p.pos < CASE WHEN d.doc_id % 1000 = 29 THEN 0
                                 ELSE 2 + (d.doc_id % 5) END
            ), hv AS (
              SELECT CASE WHEN id % 1000 = 47 AND pos = 1
                          THEN CAST(16045481047390945280 AS UBIGINT) + CAST(id AS UBIGINT)
                          ELSE xor(CAST((CAST((id * 7 + pos * 13) % 4096 AS HUGEINT)
                                         * 11400714819323198485)
                                        % 18446744073709551616 AS UBIGINT),
                                   CAST(15111065706836454659 AS UBIGINT))
                     END AS hv
              FROM spans
            ), meta AS (
              SELECT CASE hv % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind,
                     CASE WHEN hv % 3 = 1 THEN 0 ELSE 16 + CAST(hv % 240 AS BIGINT) END AS w,
                     CASE WHEN hv % 3 = 1 THEN 0 ELSE 16 + CAST((hv // 256) % 240 AS BIGINT) END AS h,
                     CASE WHEN hv % 3 = 0 THEN 1
                          WHEN hv % 3 = 1 THEN 16 * (1 + CAST((hv // 65536) % 8 AS BIGINT))
                          ELSE 1 + CAST((hv // 65536) % 8 AS BIGINT) END AS f
              FROM hv
            )
            SELECT kind, count(*) AS n,
                   CAST(sum(w) AS BIGINT) AS sum_width,
                   CAST(sum(h) AS BIGINT) AS sum_height,
                   CAST(sum(f) AS BIGINT) AS sum_frames,
                   count(*) AS n_feat_nonzero
            FROM meta GROUP BY kind
        """,
        "drift_halves": """
            WITH src AS (
              SELECT doc_id, n_chars FROM documents
              WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
            ), mm AS (
              SELECT min(n_chars)::DOUBLE AS mn, max(n_chars)::DOUBLE AS mx FROM src
            ), b AS (
              SELECT CASE WHEN mx > mn
                          THEN least(greatest(CAST(floor((n_chars::DOUBLE - mn) / (mx - mn) * 32) AS BIGINT), 0), 31)
                          ELSE 0 END AS bin,
                     (doc_id % 2 = 0) AS par
              FROM src, mm
            ), h AS (
              SELECT g.bin,
                     coalesce(sum(CASE WHEN par THEN 1 ELSE 0 END), 0)::DOUBLE AS ca,
                     coalesce(sum(CASE WHEN NOT par THEN 1 ELSE 0 END), 0)::DOUBLE AS cb
              FROM (SELECT unnest(range(32)) AS bin) g LEFT JOIN b ON b.bin = g.bin
              GROUP BY g.bin
            ), t AS (
              SELECT sum(ca) AS ta, sum(cb) AS tb FROM h
            ), c AS (
              SELECT bin,
                     sum(ca) OVER (ORDER BY bin) / ta AS cdfa,
                     sum(cb) OVER (ORDER BY bin) / tb AS cdfb,
                     (ca + 0.5) / (ta + 16.0) AS pa,
                     (cb + 0.5) / (tb + 16.0) AS pb
              FROM h, t
            )
            SELECT 'n_chars' AS col,
                   round(max(abs(cdfa - cdfb)), 4) AS ks,
                   round(sum((pa - pb) * ln(pa / pb)), 4) AS psi
            FROM c
        """,
        "stats_quantity": """
            SELECT count(*) AS n,
                   (count(*) - count(l_quantity))::BIGINT AS nulls,
                   min(l_quantity) AS min_q, max(l_quantity) AS max_q,
                   round(sum(l_quantity), 2) AS sum_q,
                   count(DISTINCT l_quantity) AS ndv_q
            FROM lineitem
        """,
        "pipeline_report": """
            WITH m AS (SELECT doc_id % 1000 AS r, doc_id % 100 AS h FROM documents)
            SELECT
              (SELECT count(*) FROM m)::BIGINT AS rows,
              (SELECT count(*) FROM m WHERE r IN (7,13,29,35,41,47,53))::BIGINT AS failed,
              2::BIGINT AS shards,
              ((SELECT count(*) FROM m WHERE r = 21)
                + CASE WHEN (SELECT count(*) FROM m WHERE h = 99) >= 2 THEN 1 ELSE 0 END)::BIGINT AS duplicates,
              ((SELECT count(*) FROM m WHERE r = 21)
                + greatest((SELECT count(*) FROM m WHERE h = 99) - 1, 0))::BIGINT AS duplicate_rows_excess,
              ((SELECT count(*) FROM m WHERE r IN (7,13,29,35,41,47,53)) = 0
                AND (SELECT count(*) FROM m WHERE r = 21) = 0
                AND (SELECT count(*) FROM m WHERE h = 99) < 2) AS passed
        """,
        "quality_by_lang": """
            SELECT lang, count(*) AS n,
                   sum(len(regexp_extract_all(text, '\\w+')))::BIGINT AS sum_words
            FROM documents GROUP BY lang
        """,
        # packing mirror: doc joins bin (tokens before it in id order)//2048
        "pack_sequences_2048": """
            WITH c AS (
              SELECT doc_id, len(string_split(text, ' ')) AS ntok FROM documents
            ), cum AS (
              SELECT doc_id, ntok,
                     coalesce(sum(ntok) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS tok_before
              FROM c
            )
            SELECT CAST(tok_before // 2048 AS BIGINT) AS seq_id,
                   count(*) AS n_docs, sum(ntok)::BIGINT AS sum_tok
            FROM cum GROUP BY 1
        """,
        # decontamination mirror: shingles via 3 leads over token position,
        # bench = doc_id % 97 = 13, distinct-per-doc semantics on both sides
        "contamination_4gram": """
            WITH t AS (
              SELECT doc_id, string_split(text, ' ') AS toks FROM documents
            ), tok AS (
              SELECT doc_id, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) AS pos FROM t
            ), sh AS (
              SELECT doc_id,
                     tok || ' ' || lead(tok, 1) OVER w || ' ' ||
                     lead(tok, 2) OVER w || ' ' || lead(tok, 3) OVER w AS s
              FROM tok WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
              QUALIFY lead(tok, 3) OVER w IS NOT NULL
            ), bench AS (
              SELECT DISTINCT s FROM sh WHERE doc_id % 97 = 13
            ), tr AS (
              SELECT DISTINCT doc_id, s FROM sh WHERE doc_id % 97 <> 13
            )
            SELECT tr.doc_id, count(*)::BIGINT AS n_shared
            FROM tr JOIN bench USING (s) GROUP BY 1
        """,
        "keyword_search_top10": """
            WITH tok AS (
              SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
            )
            SELECT doc_id, count(*)::BIGINT AS score
            FROM tok WHERE tok IN ('merge', 'spark', 'window')
            GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT 10
        """,
        # PII scrub: the injection arithmetic mirrors _q_pii_scrub.inject
        # verbatim; detection/redaction re-runs the SAME RE2 patterns
        # (joi_ray/ops/pii.PII_PATTERNS) through DuckDB's RE2 regexp
        # functions, so counts and redacted lengths are engine-identical.
        "pii_scrub_stats": r"""
            WITH inj AS (
              SELECT lang,
                     text
                     || CASE WHEN doc_id % 7 = 3
                        THEN ' contact u' || doc_id || '@ex' || (doc_id % 5)
                             || '.com now' ELSE '' END
                     || CASE WHEN doc_id % 11 = 5
                        THEN ' from 10.' || (doc_id % 256) || '.0.'
                             || (doc_id % 100) || ' seen' ELSE '' END
                     || CASE WHEN doc_id % 13 = 2
                        THEN ' call 555-' || (100 + doc_id % 10)
                             || '-4567 ok' ELSE '' END AS t2
              FROM documents
            ), det AS (
              SELECT lang, t2,
                     len(regexp_extract_all(t2,
                         '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS ne,
                     len(regexp_extract_all(t2,
                         '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS ni,
                     len(regexp_extract_all(t2,
                         '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b')) AS nph,
                     length(
                       regexp_replace(
                         regexp_replace(
                           regexp_replace(t2,
                             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
                             '[EMAIL]', 'g'),
                           '\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b', '[IPV4]', 'g'),
                         '\b[0-9]{3}-[0-9]{3}-[0-9]{4}\b', '[PHONE]', 'g')
                     ) AS rlen
              FROM inj
            )
            SELECT lang, count(*) AS n_docs,
                   CAST(sum(CASE WHEN ne + ni + nph > 0 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n_docs_with_pii,
                   CAST(sum(ne) AS BIGINT) AS sum_email,
                   CAST(sum(ni) AS BIGINT) AS sum_ipv4,
                   CAST(sum(nph) AS BIGINT) AS sum_phone,
                   CAST(sum(length(t2) - rlen) AS BIGINT) AS sum_len_delta
            FROM det GROUP BY 1
        """,
        # Gopher repetition roll-up: tokens via string_split (empties kept on
        # both sides), bigrams via lead() over token position — flag rules in
        # exact integer arithmetic mirroring _q_gopher_repetition.
        "gopher_repetition": """
            WITH t AS (
              SELECT doc_id, lang, string_split(text, ' ') AS toks FROM documents
            ), tok AS (
              SELECT doc_id, lang, unnest(toks) AS tok,
                     generate_subscripts(toks, 1) AS pos FROM t
            ), wc AS (
              SELECT doc_id, lang, tok, count(*) AS c FROM tok GROUP BY 1, 2, 3
            ), per_doc AS (
              SELECT doc_id, lang, sum(c) AS n_tok, count(*) AS nd_tok,
                     max(c) AS top_tok FROM wc GROUP BY 1, 2
            ), big AS (
              SELECT doc_id,
                     tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bg
              FROM tok QUALIFY bg IS NOT NULL
            ), bd AS (
              SELECT doc_id, count(*) AS n_bg, count(DISTINCT bg) AS nd_bg
              FROM big GROUP BY 1
            )
            SELECT p.lang, count(*) AS n_docs,
                   CAST(sum(p.n_tok) AS BIGINT) AS sum_tok,
                   CAST(sum(p.nd_tok) AS BIGINT) AS sum_distinct_tok,
                   CAST(sum(p.top_tok) AS BIGINT) AS sum_top_tok,
                   CAST(sum(coalesce(b.n_bg, 0)) AS BIGINT) AS sum_bigram,
                   CAST(sum(coalesce(b.nd_bg, 0)) AS BIGINT) AS sum_distinct_bigram,
                   CAST(sum(CASE WHEN (p.n_tok - p.nd_tok) * 10 > p.n_tok * 7
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup_word,
                   CAST(sum(CASE WHEN (coalesce(b.n_bg, 0) - coalesce(b.nd_bg, 0)) * 10
                                      > coalesce(b.n_bg, 0) * 2
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_dup_bigram,
                   CAST(sum(CASE WHEN p.top_tok * 10 > p.n_tok
                            THEN 1 ELSE 0 END) AS BIGINT) AS n_flag_top_tok
            FROM per_doc p LEFT JOIN bd b USING (doc_id)
            GROUP BY 1
        """,
    }
