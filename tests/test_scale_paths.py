"""Scale-path behaviors: sessionization boundary healing against a pandas
reference on randomized inputs, and hot-key uniqueness through the
partial-count (salting-equivalent) pipeline."""

import numpy as np
import pandas as pd
import pyarrow as pa


def test_sessions_boundary_healing_randomized(ray_session):
    """events_sessions (sort + per-batch partials + batch-order healing)
    must match a direct pandas sessionization for random event streams,
    with batches forced small so many users straddle batch edges."""
    import importlib
    import sys

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    rng = np.random.default_rng(7)
    n_users, n_events = 40, 4000
    users = rng.integers(0, n_users, n_events)
    base = np.datetime64("2024-01-01T00:00:00", "us")
    offsets = rng.integers(0, 6 * 3600, n_events).astype("timedelta64[s]")
    ts = base + offsets
    df = pd.DataFrame({"user_id": users.astype(np.int64), "ts": ts.astype("datetime64[us]"),
                       "event_id": np.arange(n_events, dtype=np.int64),
                       "value": rng.random(n_events)})
    import tempfile, os
    d = tempfile.mkdtemp(prefix="sess_rand_")
    # the query reads {sf_dir}/events.parquet
    pa_tbl = pa.Table.from_pandas(df, preserve_index=False)
    import pyarrow.parquet as pq
    pq.write_table(pa_tbl, os.path.join(d, "events.parquet"))

    got = entry._q_events_sessions(d)
    got_df = (got.to_pandas() if hasattr(got, "to_pandas") else got).sort_values("user_id").reset_index(drop=True)

    ref = []
    for uid, g in df.sort_values(["user_id", "ts"]).groupby("user_id"):
        gaps = g["ts"].diff().dt.total_seconds() > 1800
        ref.append({"user_id": int(uid), "n_events": len(g), "n_sessions": int(gaps.sum()) + 1})
    ref_df = pd.DataFrame(ref).sort_values("user_id").reset_index(drop=True)
    pd.testing.assert_frame_equal(
        got_df.astype({"user_id": "int64", "n_events": "int64", "n_sessions": "int64"}),
        ref_df.astype({"user_id": "int64", "n_events": "int64", "n_sessions": "int64"}))


def test_uniqueness_hot_key(ray_session):
    """A pathological hot key (one id repeated across every batch) flows
    through the two-phase hashed uniqueness with per-batch partial counts —
    the salting equivalent: each batch contributes at most one row per key
    to the shuffle, so reducer input is bounded by batch count."""
    import ray.data as rd

    from joi_ray.pipelines.validate import uniqueness_pass_hashed

    hot = pa.table({
        "doc_id": pa.array(
            ["hot"] * 50_000 + [f"u{i}" for i in range(20_000)] + ["warm"] * 3,
            pa.string())})

    def factory():
        return rd.from_arrow(hot).map_batches(lambda t: t, batch_format="pyarrow", batch_size=4096)

    dups = uniqueness_pass_hashed(factory)
    rows = {r["doc_id"]: r["n"] for r in dups.take_all()}
    assert rows == {"hot": 50_000, "warm": 3}


def test_running_carry_randomized(ray_session):
    """events_running (sort + block carry offsets) must match a direct
    pandas per-user cumsum for random inputs; the query repartitions into
    12 blocks so users straddle block edges."""
    import os
    import sys
    import tempfile

    import pyarrow.parquet as pq

    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as entry

    rng = np.random.default_rng(11)
    n_users, n_events = 12, 1500
    df = pd.DataFrame({
        "event_id": np.arange(n_events, dtype=np.int64),
        "user_id": rng.integers(0, n_users, n_events).astype(np.int64),
        "ts": (np.datetime64("2024-01-01", "us")
               + rng.integers(0, 3600_000, n_events).astype("timedelta64[ms]")),
        "value": rng.random(n_events),
    })
    d = tempfile.mkdtemp(prefix="run_rand_")
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False), os.path.join(d, "events.parquet"))

    got = entry._q_events_running(d).to_pandas().sort_values("event_id").reset_index(drop=True)
    ref = df.sort_values(["user_id", "ts", "event_id"]).copy()
    ref["running_value"] = ref.groupby("user_id")["value"].cumsum().round(4)
    ref = ref.sort_values("event_id").reset_index(drop=True)
    assert np.allclose(got["running_value"], ref["running_value"], atol=1e-9)
    assert (got["user_id"].to_numpy() == ref["user_id"].to_numpy()).all()


def test_rebalance_if_skewed(ray_session):
    """Metadata-only skew detection + even rebalance; balanced inputs pass
    through untouched."""
    import ray.data as rd

    from joi_ray.pipelines.validate import rebalance_if_skewed

    skewed = (rd.from_arrow(pa.table({"x": list(range(100_000))}))
              .union(rd.from_arrow(pa.table({"x": [1, 2, 3]}))).materialize())
    fixed = rebalance_if_skewed(skewed)
    rows = sorted(m.num_rows for b in fixed.iter_internal_ref_bundles() for _, m in b.blocks)
    assert max(rows) / max(min(rows), 1) < 4 and sum(rows) == 100_003

    balanced = rd.from_arrow(pa.table({"x": list(range(1000))})).repartition(4).materialize()
    same = rebalance_if_skewed(balanced)
    assert sum(m.num_rows for b in same.iter_internal_ref_bundles() for _, m in b.blocks) == 1000
