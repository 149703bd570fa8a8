"""Mergeable column-stat sketches: HyperLogLog, t-digest, moments.

These power the north rule's column stats (count, null-rate, cardinality,
quantiles) and distribution-drift tests (KS from t-digest CDFs, PSI over
baseline-decile bins).  The reference has no analog (SURVEY.md §2.6) — the
design requirement is Ray-Data-shaped: one partial sketch per batch emitted
from ``map_batches``, merged associatively (driver or a tiny second stage),
never shipping raw values.  All sketches serialize to bytes and are
deterministic (no RNG, no wall clock).
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np


def hash64(values) -> np.ndarray:
    """Deterministic 64-bit hashes of an array-like (strings or numerics)."""
    import pandas as pd

    arr = pd.Series(values) if not isinstance(values, pd.Series) else values
    return pd.util.hash_pandas_object(arr, index=False).to_numpy(dtype=np.uint64)


# --------------------------------------------------------------------------
# HyperLogLog (dense, p=12 -> 4096 registers, ~0.8% relative error)


class HLL:
    P = 12
    M = 1 << P

    def __init__(self, registers: np.ndarray | None = None):
        self.reg = registers if registers is not None else np.zeros(self.M, dtype=np.uint8)

    def add_hashes(self, h: np.ndarray) -> "HLL":
        if len(h) == 0:
            return self
        idx = (h >> np.uint64(64 - self.P)).astype(np.int64)
        rest = (h << np.uint64(self.P)) | np.uint64(1 << (self.P - 1))
        # rank = leading zeros of rest + 1, vectorized via bit length
        lz = np.zeros(len(h), dtype=np.uint8)
        v = rest.copy()
        # count leading zeros of a uint64 via float64 exponent trick is lossy;
        # use 4-step binary search on bit masks instead (vectorized)
        shift = np.uint64(32)
        acc = np.zeros(len(h), dtype=np.uint64)
        for s in (32, 16, 8, 4, 2, 1):
            mask = v < (np.uint64(1) << np.uint64(64 - s))
            acc = acc + np.where(mask, np.uint64(s), np.uint64(0))
            v = np.where(mask, v << np.uint64(s), v)
        rank = (acc + 1).astype(np.uint8)
        np.maximum.at(self.reg, idx, rank)
        return self

    def merge(self, other: "HLL") -> "HLL":
        np.maximum(self.reg, other.reg, out=self.reg)
        return self

    def estimate(self) -> float:
        m = float(self.M)
        alpha = 0.7213 / (1 + 1.079 / m)
        est = alpha * m * m / np.sum(np.exp2(-self.reg.astype(np.float64)))
        zeros = int((self.reg == 0).sum())
        if est <= 2.5 * m and zeros:
            est = m * np.log(m / zeros)  # small-range correction
        return float(est)

    def to_bytes(self) -> bytes:
        return self.reg.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "HLL":
        return cls(np.frombuffer(b, dtype=np.uint8).copy())


# --------------------------------------------------------------------------
# t-digest (merging variant, scale function k1; delta=100)


class TDigest:
    DELTA = 100
    BUFFER = 65536

    def __init__(self, means: np.ndarray | None = None, weights: np.ndarray | None = None):
        self.means = means if means is not None else np.empty(0, dtype=np.float64)
        self.weights = weights if weights is not None else np.empty(0, dtype=np.float64)

    @property
    def total(self) -> float:
        return float(self.weights.sum())

    def add(self, values: np.ndarray) -> "TDigest":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if len(v) == 0:
            return self
        self.means = np.concatenate([self.means, v])
        self.weights = np.concatenate([self.weights, np.ones(len(v))])
        if len(self.means) > self.BUFFER:
            self._compress()
        return self

    def merge(self, other: "TDigest") -> "TDigest":
        self.means = np.concatenate([self.means, other.means])
        self.weights = np.concatenate([self.weights, other.weights])
        self._compress()
        return self

    def _compress(self):
        """Vectorized k1-scale compression: sort, map each point's quantile
        through k(q) = δ/(2π)·asin(2q−1), bucket by floor(k), and reduce each
        bucket to one centroid with reduceat — no Python loop."""
        if len(self.means) <= 1:
            return
        order = np.argsort(self.means, kind="stable")
        m, w = self.means[order], self.weights[order]
        total = w.sum()
        cum = np.cumsum(w)
        q_mid = (cum - w / 2) / total
        k = self.DELTA / (2 * np.pi) * np.arcsin(np.clip(2 * q_mid - 1, -1, 1))
        cid = np.floor(k).astype(np.int64)
        starts = np.r_[0, np.nonzero(np.diff(cid))[0] + 1]
        new_w = np.add.reduceat(w, starts)
        new_m = np.add.reduceat(m * w, starts) / new_w
        self.means = new_m
        self.weights = new_w

    def cdf(self, x: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        total = self.total
        cum = np.concatenate([[0.0], np.cumsum(self.weights)])
        mids = cum[:-1] + self.weights / 2
        return float(np.interp(x, self.means, mids / total, left=0.0, right=1.0))

    def quantile(self, q: float) -> float:
        self._compress()
        if len(self.means) == 0:
            return float("nan")
        total = self.total
        cum = np.concatenate([[0.0], np.cumsum(self.weights)])
        mids = (cum[:-1] + self.weights / 2) / total
        return float(np.interp(q, mids, self.means))

    def to_bytes(self) -> bytes:
        self._compress()
        n = len(self.means)
        return struct.pack("<I", n) + self.means.tobytes() + self.weights.tobytes()

    @classmethod
    def from_bytes(cls, b: bytes) -> "TDigest":
        (n,) = struct.unpack_from("<I", b, 0)
        means = np.frombuffer(b, dtype=np.float64, count=n, offset=4).copy()
        weights = np.frombuffer(b, dtype=np.float64, count=n, offset=4 + 8 * n).copy()
        return cls(means, weights)


# --------------------------------------------------------------------------
# per-column stats partial (count / nulls / moments / min / max / HLL / tdigest)


@dataclass
class ColumnStats:
    count: int = 0
    nulls: int = 0
    sum: float = 0.0
    sumsq: float = 0.0
    min: float = float("inf")
    max: float = float("-inf")
    hll: HLL = field(default_factory=HLL)
    tdigest: TDigest = field(default_factory=TDigest)
    numeric: bool = False

    def update(self, values, numeric_values: np.ndarray | None = None, hashes: np.ndarray | None = None):
        import pandas as pd

        n = len(values)
        self.count += n
        s = pd.Series(values) if not isinstance(values, pd.Series) else values
        nn = s.notna()
        self.nulls += int((~nn).sum())
        if hashes is None:
            # hash numerics directly (no per-value str conversion)
            sub = s[nn]
            if nn.any():
                hashes = pd.util.hash_pandas_object(sub, index=False).to_numpy(dtype=np.uint64)
            else:
                hashes = np.empty(0, np.uint64)
        self.hll.add_hashes(hashes)
        if numeric_values is not None:
            v = np.asarray(numeric_values, dtype=np.float64)
            v = v[~np.isnan(v)]
            if len(v):
                self.numeric = True
                self.sum += float(v.sum())
                self.sumsq += float((v * v).sum())
                self.min = min(self.min, float(v.min()))
                self.max = max(self.max, float(v.max()))
                self.tdigest.add(v)
        return self

    def merge(self, other: "ColumnStats") -> "ColumnStats":
        self.count += other.count
        self.nulls += other.nulls
        self.sum += other.sum
        self.sumsq += other.sumsq
        self.min = min(self.min, other.min)
        self.max = max(self.max, other.max)
        self.hll.merge(other.hll)
        self.tdigest.merge(other.tdigest)
        self.numeric = self.numeric or other.numeric
        return self

    def to_dict(self) -> dict:
        import base64

        nonnull = self.count - self.nulls
        mean = self.sum / nonnull if nonnull else None
        var = self.sumsq / nonnull - mean * mean if nonnull and self.numeric else None
        return {
            "count": self.count,
            "nulls": self.nulls,
            "null_rate": self.nulls / self.count if self.count else 0.0,
            "cardinality": round(self.hll.estimate(), 1),
            "numeric": self.numeric,
            "min": self.min if self.numeric else None,
            "max": self.max if self.numeric else None,
            "mean": mean if self.numeric else None,
            "std": (max(var, 0.0) ** 0.5) if var is not None else None,
            "quantiles": {str(q): self.tdigest.quantile(q) for q in (0.01, 0.25, 0.5, 0.75, 0.99)}
            if self.numeric and self.tdigest.total
            else None,
            "hll_b64": base64.b64encode(self.hll.to_bytes()).decode(),
            "tdigest_b64": base64.b64encode(self.tdigest.to_bytes()).decode(),
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ColumnStats":
        import base64

        cs = cls(
            count=d["count"],
            nulls=d["nulls"],
            numeric=d.get("numeric", False),
            min=d.get("min") if d.get("min") is not None else float("inf"),
            max=d.get("max") if d.get("max") is not None else float("-inf"),
        )
        mean = d.get("mean")
        nonnull = cs.count - cs.nulls
        if mean is not None and nonnull:
            cs.sum = mean * nonnull
            std = d.get("std") or 0.0
            cs.sumsq = (std * std + mean * mean) * nonnull
        cs.hll = HLL.from_bytes(base64.b64decode(d["hll_b64"]))
        cs.tdigest = TDigest.from_bytes(base64.b64decode(d["tdigest_b64"]))
        return cs

    def to_bytes(self) -> bytes:
        import json

        return json.dumps(self.to_dict()).encode()

    @classmethod
    def from_bytes(cls, b: bytes) -> "ColumnStats":
        import json

        return cls.from_dict(json.loads(b.decode()))


# --------------------------------------------------------------------------
# drift measures


def ks_statistic(a: TDigest, b: TDigest, grid_points: int = 101) -> float:
    """Two-sample KS statistic approximated on a merged quantile grid."""
    if not a.total or not b.total:
        return float("nan")
    qs = np.linspace(0.005, 0.995, grid_points)
    xs = np.unique(np.concatenate([[a.quantile(q) for q in qs], [b.quantile(q) for q in qs]]))
    d = max(abs(a.cdf(float(x)) - b.cdf(float(x))) for x in xs)
    return float(d)


def psi(baseline: TDigest, current: TDigest, bins: int = 10, eps: float = 1e-4) -> float:
    """Population Stability Index over baseline-decile bins."""
    if not baseline.total or not current.total:
        return float("nan")
    edges = [baseline.quantile(i / bins) for i in range(bins + 1)]
    edges[0], edges[-1] = -np.inf, np.inf
    out = 0.0
    for i in range(bins):
        lo, hi = edges[i], edges[i + 1]
        pb = max((baseline.cdf(hi) if np.isfinite(hi) else 1.0) - (baseline.cdf(lo) if np.isfinite(lo) else 0.0), eps)
        pcur = max((current.cdf(hi) if np.isfinite(hi) else 1.0) - (current.cdf(lo) if np.isfinite(lo) else 0.0), eps)
        out += (pcur - pb) * np.log(pcur / pb)
    return float(out)


def categorical_psi(base_counts: dict, cur_counts: dict, eps: float = 1e-4) -> float:
    cats = set(base_counts) | set(cur_counts)
    tb = sum(base_counts.values()) or 1
    tc = sum(cur_counts.values()) or 1
    out = 0.0
    for c in cats:
        pb = max(base_counts.get(c, 0) / tb, eps)
        pc_ = max(cur_counts.get(c, 0) / tc, eps)
        out += (pc_ - pb) * np.log(pc_ / pb)
    return float(out)
