"""t-digest quantile sketch (Dunning & Ertl 2019, public algorithm),
merging-digest variant with a vectorized batch merge.

Centroids (mean, weight) kept sorted by mean.  A batch update concatenates
the sorted batch with the existing centroids and re-clusters in one
vectorized pass: each point's quantile position q is mapped through the k1
scale function  k(q) = (delta / (2*pi)) * asin(2q - 1)  and points falling in
the same unit k-interval collapse into one centroid (weighted mean via
``np.add.reduceat``).  This preserves the t-digest size bound (~delta
centroids, finer near the tails) without the sequential greedy loop.

Merge = concatenate centroids + re-cluster; commutative/associative up to the
accuracy bound (tolerance-tested, not bit-identical).  Handles real-valued /
unbounded domains — the reference Q-Digest needs a power-of-two integer
universe (src/qcore.c:300-303); t-digest is its float-domain counterpart in
this library (SURVEY.md §2.3).
"""

from __future__ import annotations

import struct

import numpy as np

from q_digest_ray.sketches.base import Sketch, register


class TDigest(Sketch):
    kind = "tdigest"

    __slots__ = ("delta", "_means", "_weights", "_n", "_min", "_max")

    def __init__(self, delta: int = 200):
        self.delta = int(delta)
        self._means = np.empty(0, dtype=np.float64)
        self._weights = np.empty(0, dtype=np.float64)
        self._n = 0
        self._min = np.inf
        self._max = -np.inf

    @property
    def n(self) -> int:
        return self._n

    @property
    def num_centroids(self) -> int:
        return len(self._means)

    def _recluster(self, means: np.ndarray, weights: np.ndarray) -> None:
        order = np.argsort(means, kind="stable")
        means = means[order]
        weights = weights[order]
        total = weights.sum()
        if total <= 0:
            self._means = np.empty(0, dtype=np.float64)
            self._weights = np.empty(0, dtype=np.float64)
            return
        # midpoint quantile of each point
        q = (np.cumsum(weights) - 0.5 * weights) / total
        q = np.clip(q, 0.0, 1.0)
        kq = (self.delta / np.pi) * np.arcsin(2.0 * q - 1.0)  # ~delta unit bins
        bins = np.floor(kq).astype(np.int64)
        new_start = np.empty(len(bins), dtype=bool)
        new_start[0] = True
        np.not_equal(bins[1:], bins[:-1], out=new_start[1:])
        starts = np.flatnonzero(new_start)
        w = np.add.reduceat(weights, starts)
        m = np.add.reduceat(means * weights, starts) / w
        self._means = m
        self._weights = w

    def update_batch(self, values, weights=None) -> None:
        vals = np.asarray(values, dtype=np.float64)
        if vals.size == 0:
            return
        if np.isnan(vals).any():
            keep = ~np.isnan(vals)
            vals = vals[keep]
            if weights is not None:
                weights = np.asarray(weights, dtype=np.float64)[keep]
            if vals.size == 0:
                return
        w = (
            np.ones(vals.size, dtype=np.float64)
            if weights is None
            else np.asarray(weights, dtype=np.float64)
        )
        if weights is not None:
            if w.min() < 0:
                raise ValueError("weights must be non-negative")
            keep = w > 0  # zero-weight rows would create NaN centroids
            if not keep.all():
                vals = vals[keep]
                w = w[keep]
                if vals.size == 0:
                    return
        self._min = min(self._min, float(vals.min()))
        self._max = max(self._max, float(vals.max()))
        self._recluster(
            np.concatenate([self._means, vals]),
            np.concatenate([self._weights, w]),
        )
        self._n += int(w.sum())

    def merge(self, other: "TDigest") -> "TDigest":
        self.delta = max(self.delta, other.delta)
        if other._n == 0:
            return self
        self._min = min(self._min, other._min)
        self._max = max(self._max, other._max)
        self._recluster(
            np.concatenate([self._means, other._means]),
            np.concatenate([self._weights, other._weights]),
        )
        self._n += other._n
        return self

    def quantile(self, p: float) -> float:
        if self._n == 0 or len(self._means) == 0:
            return float("nan")
        if len(self._means) == 1:
            return float(self._means[0])
        total = self._weights.sum()
        c = np.cumsum(self._weights) - 0.5 * self._weights
        t = p * total
        if t <= c[0]:
            # interpolate between true min and first centroid
            frac = t / c[0] if c[0] > 0 else 0.0
            return float(self._min + frac * (self._means[0] - self._min))
        if t >= c[-1]:
            span = total - c[-1]
            frac = (t - c[-1]) / span if span > 0 else 0.0
            return float(self._means[-1] + frac * (self._max - self._means[-1]))
        return float(np.interp(t, c, self._means))

    def quantiles(self, ps) -> list[float]:
        return [self.quantile(p) for p in ps]

    def to_bytes(self) -> bytes:
        m = np.ascontiguousarray(self._means)
        w = np.ascontiguousarray(self._weights)
        return (
            struct.pack("<BIQddQ", 1, self.delta, self._n, self._min, self._max, len(m))
            + m.tobytes()
            + w.tobytes()
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "TDigest":
        ver, delta, n, mn, mx, k = struct.unpack_from("<BIQddQ", buf, 0)
        t = cls(delta=delta)
        t._n = n
        t._min = mn
        t._max = mx
        off = struct.calcsize("<BIQddQ")
        t._means = np.frombuffer(buf, dtype=np.float64, count=k, offset=off).copy()
        t._weights = np.frombuffer(buf, dtype=np.float64, count=k, offset=off + 8 * k).copy()
        return t

    def __repr__(self) -> str:
        return f"TDigest(delta={self.delta}, n={self._n}, centroids={len(self._means)})"


register(TDigest)
