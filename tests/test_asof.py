"""Distributed as-of join vs pandas merge_asof (the single-node oracle)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _run_case(n_left, n_right, n_users, seed, min_blocks):
    import ray.data as rd

    from joi_ray.ops.asof import asof_join

    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "lid": np.arange(n_left, dtype=np.int64),
        "user": rng.integers(0, n_users, n_left).astype(np.int64),
        "t": rng.integers(0, 10_000, n_left).astype(np.int64),
    })
    right = pd.DataFrame({
        "rid": np.arange(n_right, dtype=np.int64) + 1_000_000,
        "user": rng.integers(0, n_users, n_right).astype(np.int64),
        "t": rng.integers(0, 10_000, n_right).astype(np.int64),
        "val": rng.integers(0, 1_000, n_right).astype(np.int64),
    })
    # dedup right on (user, t): keep max rid (deterministic tie rule)
    right = right.sort_values(["user", "t", "rid"]).groupby(
        ["user", "t"], as_index=False).last()

    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_by="user", right_by="user",
        left_on="t", right_on="t",
        left_tiebreak="lid", right_tiebreak="rid",
        right_values=["val"], left_keep=["lid"],
        min_blocks=min_blocks,
    ).to_pandas().sort_values("lid").reset_index(drop=True)

    exp = pd.merge_asof(
        left.sort_values("t", kind="stable"),
        right.sort_values("t", kind="stable"),
        on="t", by="user", direction="backward",
    ).sort_values("lid").reset_index(drop=True)

    assert len(got) == n_left
    g = got["val"].to_numpy(dtype=np.float64)
    e = exp["val"].to_numpy(dtype=np.float64)
    both_nan = np.isnan(g) & np.isnan(e)
    assert (both_nan | (g == e)).all(), (
        f"mismatch rows: {np.nonzero(~(both_nan | (g == e)))[0][:10]}")


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_asof_join_randomized_vs_pandas(ray_session, seed):
    # many blocks force user groups to straddle block edges -> exercises
    # the descriptor walk + carry fill
    _run_case(n_left=3000, n_right=800, n_users=40, seed=seed, min_blocks=16)


def test_asof_join_no_match_is_null(ray_session):
    import ray.data as rd

    from joi_ray.ops.asof import asof_join

    left = pd.DataFrame({"lid": [0, 1], "user": [1, 2], "t": [5, 5]})
    right = pd.DataFrame({"rid": [10], "user": [1], "t": [7], "val": [99]})
    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_by="user", right_by="user", left_on="t", right_on="t",
        left_tiebreak="lid", right_tiebreak="rid",
        right_values=["val"], left_keep=["lid"],
    ).to_pandas().sort_values("lid")
    assert got["val"].isna().all()  # right row is later; no user-2 rows


def test_asof_join_inclusive_tie(ray_session):
    import ray.data as rd

    from joi_ray.ops.asof import asof_join

    left = pd.DataFrame({"lid": [0], "user": [1], "t": [5]})
    right = pd.DataFrame({"rid": [10], "user": [1], "t": [5], "val": [7]})
    got = asof_join(
        rd.from_pandas(left), rd.from_pandas(right),
        left_by="user", right_by="user", left_on="t", right_on="t",
        left_tiebreak="lid", right_tiebreak="rid",
        right_values=["val"], left_keep=["lid"],
    ).to_pandas()
    assert got["val"].tolist() == [7.0]  # backward-INCLUSIVE
