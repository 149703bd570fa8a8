"""Sketch accuracy, merge associativity, serialization, drift measures."""

import numpy as np

from joi_ray.sketches import HLL, ColumnStats, TDigest, categorical_psi, hash64, ks_statistic, psi


def test_hll_accuracy_and_merge():
    h = HLL()
    h.add_hashes(hash64([f"v{i}" for i in range(50_000)]))
    assert abs(h.estimate() - 50_000) / 50_000 < 0.05
    parts = [HLL() for _ in range(4)]
    for i, p in enumerate(parts):
        p.add_hashes(hash64([f"v{j}" for j in range(i * 10_000, (i + 1) * 10_000 + 5000)]))
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert abs(merged.estimate() - 45_000) / 45_000 < 0.05
    rt = HLL.from_bytes(merged.to_bytes())
    assert rt.estimate() == merged.estimate()


def test_tdigest_quantiles_and_merge_associativity():
    rng = np.random.default_rng(42)
    data = rng.normal(10, 2, 40_000)
    td_all = TDigest().add(data)
    chunks = np.array_split(data, 8)
    td_merged = TDigest()
    for c in chunks:
        td_merged.merge(TDigest().add(c))
    for q in (0.1, 0.5, 0.9):
        true_q = np.quantile(data, q)
        assert abs(td_all.quantile(q) - true_q) < 0.1
        assert abs(td_merged.quantile(q) - true_q) < 0.1
    rt = TDigest.from_bytes(td_merged.to_bytes())
    assert rt.quantile(0.5) == td_merged.quantile(0.5)


def test_drift_measures():
    rng = np.random.default_rng(1)
    a = TDigest().add(rng.normal(0, 1, 30_000))
    b = TDigest().add(rng.normal(0.5, 1, 30_000))
    c = TDigest().add(rng.normal(0, 1, 30_000))
    assert ks_statistic(a, b) > 0.15
    assert ks_statistic(a, c) < 0.03
    assert psi(a, b) > 0.2
    assert psi(a, c) < 0.02
    assert categorical_psi({"x": 90, "y": 10}, {"x": 50, "y": 50}) > 0.5
    assert categorical_psi({"x": 90, "y": 10}, {"x": 89, "y": 11}) < 0.01


def test_column_stats_roundtrip_and_merge():
    a = ColumnStats().update(["a", "b", None, "c"], numeric_values=np.array([1.0, 2.0, np.nan, 3.0]))
    b = ColumnStats().update(["c", "d"], numeric_values=np.array([4.0, 5.0]))
    merged = ColumnStats.from_bytes(a.to_bytes()).merge(ColumnStats.from_bytes(b.to_bytes()))
    d = merged.to_dict()
    assert d["count"] == 6 and d["nulls"] == 1
    assert d["min"] == 1.0 and d["max"] == 5.0
    assert abs(d["mean"] - 3.0) < 1e-9
