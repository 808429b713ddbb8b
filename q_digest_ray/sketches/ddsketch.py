"""DDSketch — relative-error quantile sketch (Masson, Rim & Lee, VLDB 2019).

Log-spaced buckets: a positive value x lands in bucket ``ceil(log_gamma(x))``
with gamma = (1+alpha)/(1-alpha); the bucket midpoint 2*gamma^i/(gamma+1) is
within relative error alpha of every value in the bucket, so any quantile
estimate is alpha-relatively-accurate (the complement of the rank-error
guarantee the Q-Digest family gives — DDSketch bounds *value* error).

Mergeable: bucket-wise count addition — exact, commutative, associative
(collapsing, below, is the one deliberately lossy part).  Bounded memory via
the paper's collapsing store: when a store exceeds ``max_buckets`` the
lowest-value buckets fold into the lowest kept bucket, voiding the guarantee
only for values below that bucket (tracked via ``collapsed``).

Same UDAF lifecycle as the reference Q-Digest (SURVEY.md §2.1: init/update/
merge/finalize/serde), tenth family through the shared protocol.  Stores are
sorted (key, count) numpy pairs; batch updates are one ``np.log`` + unique-
reduce per batch — no per-row Python.
"""

from __future__ import annotations

import struct

import numpy as np

from q_digest_ray.sketches.base import Sketch, pack_arrays, register, unpack_arrays

_MIN_INDEXABLE = 1e-9  # |x| below this counts as zero (paper's key-space floor)


def _store_add(keys: np.ndarray, counts: np.ndarray, new_keys: np.ndarray, new_counts: np.ndarray):
    """Union-add two sorted (key, count) stores; returns sorted arrays."""
    if len(new_keys) == 0:
        return keys, counts
    if len(keys) == 0:
        return new_keys, new_counts
    allk = np.concatenate([keys, new_keys])
    allc = np.concatenate([counts, new_counts])
    order = np.argsort(allk, kind="stable")
    allk, allc = allk[order], allc[order]
    starts = np.flatnonzero(np.r_[True, allk[1:] != allk[:-1]])
    summed = np.add.reduceat(allc, starts)
    return allk[starts], summed


class DDSketch(Sketch):
    kind = "dds"

    __slots__ = (
        "alpha",
        "max_buckets",
        "_gamma",
        "_inv_log_gamma",
        "_pos_keys",
        "_pos_counts",
        "_neg_keys",
        "_neg_counts",
        "_zero",
        "_n",
        "collapsed",
    )

    def __init__(self, alpha: float = 0.01, max_buckets: int = 2048):
        if not (0.0 < alpha < 1.0):
            raise ValueError("alpha must be in (0, 1)")
        if max_buckets < 16:
            raise ValueError("max_buckets must be >= 16")
        self.alpha = float(alpha)
        self.max_buckets = int(max_buckets)
        self._gamma = (1.0 + self.alpha) / (1.0 - self.alpha)
        self._inv_log_gamma = 1.0 / np.log(self._gamma)
        self._pos_keys = np.empty(0, dtype=np.int64)
        self._pos_counts = np.empty(0, dtype=np.int64)
        self._neg_keys = np.empty(0, dtype=np.int64)
        self._neg_counts = np.empty(0, dtype=np.int64)
        self._zero = 0
        self._n = 0
        self.collapsed = False

    @property
    def n(self) -> int:
        return self._n

    @property
    def num_buckets(self) -> int:
        return len(self._pos_keys) + len(self._neg_keys) + (1 if self._zero else 0)

    def _bucket_keys(self, vals: np.ndarray) -> np.ndarray:
        # ceil(log_gamma(x)); float rounding at exact bucket boundaries moves
        # a value one bucket over, which stays within the alpha guarantee
        return np.ceil(np.log(vals) * self._inv_log_gamma).astype(np.int64)

    def update_batch(self, values, weights=None) -> None:
        vals = np.asarray(values, dtype=np.float64)
        if vals.size == 0:
            return
        if weights is None:
            w = None
            keep = ~np.isnan(vals)
            if not keep.all():
                vals = vals[keep]
        else:
            w = np.asarray(weights, dtype=np.int64)
            if w.shape != vals.shape:
                raise ValueError("weights must align with values")
            if w.size and w.min() < 0:
                raise ValueError("weights must be non-negative")
            keep = ~np.isnan(vals) & (w > 0)
            vals, w = vals[keep], w[keep]
        if vals.size == 0:
            return
        zero_mask = np.abs(vals) < _MIN_INDEXABLE
        pos_mask = vals >= _MIN_INDEXABLE
        neg_mask = vals <= -_MIN_INDEXABLE
        if w is None:
            self._zero += int(np.count_nonzero(zero_mask))
            self._n += int(vals.size)
        else:
            self._zero += int(w[zero_mask].sum())
            self._n += int(w.sum())
        for mask, mag_sign, store in ((pos_mask, 1.0, "pos"), (neg_mask, -1.0, "neg")):
            if not mask.any():
                continue
            idx = self._bucket_keys(mag_sign * vals[mask])
            if w is None:
                uk, uc = np.unique(idx, return_counts=True)
                uc = uc.astype(np.int64)
            else:
                order = np.argsort(idx, kind="stable")
                sk_, sw = idx[order], w[mask][order]
                starts = np.flatnonzero(np.r_[True, sk_[1:] != sk_[:-1]])
                uk = sk_[starts]
                uc = np.add.reduceat(sw, starts)
            if store == "pos":
                self._pos_keys, self._pos_counts = _store_add(
                    self._pos_keys, self._pos_counts, uk, uc
                )
            else:
                self._neg_keys, self._neg_counts = _store_add(
                    self._neg_keys, self._neg_counts, uk, uc
                )
        self._collapse()

    def _collapse(self) -> None:
        # Collapsing store (paper §2.2): fold lowest-VALUE buckets into the
        # lowest kept one.  Lowest values are the most-negative (= highest
        # keys of the negative store), then the lowest keys of the positive
        # store; each store is capped independently at max_buckets so the
        # whole sketch holds <= 2*max_buckets+1 buckets.
        if len(self._pos_keys) > self.max_buckets:
            cut = len(self._pos_keys) - self.max_buckets
            folded = int(self._pos_counts[: cut + 1].sum())
            self._pos_keys = self._pos_keys[cut:]
            self._pos_counts = self._pos_counts[cut:].copy()
            self._pos_counts[0] = folded
            self.collapsed = True
        if len(self._neg_keys) > self.max_buckets:
            cut = len(self._neg_keys) - self.max_buckets
            folded = int(self._neg_counts[-cut - 1 :].sum())
            self._neg_keys = self._neg_keys[: self.max_buckets]
            self._neg_counts = self._neg_counts[: self.max_buckets].copy()
            self._neg_counts[-1] = folded
            self.collapsed = True

    def merge(self, other: "DDSketch") -> "DDSketch":
        if abs(other.alpha - self.alpha) > 1e-12:
            raise ValueError("cannot merge DDSketches with different alpha")
        self._pos_keys, self._pos_counts = _store_add(
            self._pos_keys, self._pos_counts, other._pos_keys, other._pos_counts
        )
        self._neg_keys, self._neg_counts = _store_add(
            self._neg_keys, self._neg_counts, other._neg_keys, other._neg_counts
        )
        self._zero += other._zero
        self._n += other._n
        self.collapsed = self.collapsed or other.collapsed
        self.max_buckets = max(self.max_buckets, other.max_buckets)
        self._collapse()
        return self

    def _ordered(self) -> tuple[np.ndarray, np.ndarray]:
        """Bucket midpoint values ascending + aligned counts."""
        vals = []
        cnts = []
        if len(self._neg_keys):
            # negative store: key k holds values in [-gamma^k, -gamma^(k-1)];
            # ascending VALUE order = descending key order
            mid = -2.0 * np.power(self._gamma, self._neg_keys[::-1].astype(np.float64)) / (
                self._gamma + 1.0
            )
            vals.append(mid)
            cnts.append(self._neg_counts[::-1])
        if self._zero:
            vals.append(np.zeros(1))
            cnts.append(np.array([self._zero], dtype=np.int64))
        if len(self._pos_keys):
            mid = 2.0 * np.power(self._gamma, self._pos_keys.astype(np.float64)) / (
                self._gamma + 1.0
            )
            vals.append(mid)
            cnts.append(self._pos_counts)
        if not vals:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        return np.concatenate(vals), np.concatenate(cnts)

    def quantile(self, p: float) -> float:
        v, c = self._ordered()
        if len(v) == 0:
            return float("nan")
        csum = np.cumsum(c)
        idx = int(np.searchsorted(csum, p * csum[-1], side="left"))
        return float(v[min(idx, len(v) - 1)])

    def quantiles(self, ps) -> list[float]:
        return [self.quantile(p) for p in ps]

    def to_bytes(self) -> bytes:
        header = struct.pack(
            "<BdIQQB",
            1,
            self.alpha,
            self.max_buckets,
            self._n,
            self._zero,
            1 if self.collapsed else 0,
        )
        return pack_arrays(
            header, self._pos_keys, self._pos_counts, self._neg_keys, self._neg_counts
        )

    @classmethod
    def from_bytes(cls, buf: bytes) -> "DDSketch":
        header, arrays = unpack_arrays(buf)
        ver, alpha, max_buckets, n, zero, collapsed = struct.unpack("<BdIQQB", header)
        s = cls(alpha=alpha, max_buckets=max_buckets)
        s._pos_keys, s._pos_counts, s._neg_keys, s._neg_counts = arrays
        s._n = int(n)
        s._zero = int(zero)
        s.collapsed = bool(collapsed)
        return s

    def __repr__(self) -> str:
        return (
            f"DDSketch(alpha={self.alpha}, n={self._n}, buckets={self.num_buckets}"
            f"{', collapsed' if self.collapsed else ''})"
        )


register(DDSketch)
