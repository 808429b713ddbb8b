"""Deterministic mergeable uniform sample of DISTINCT values.

KMV's bottom-k-by-hash idea (Bar-Yossef et al. 2002), but carrying the
VALUES alongside their hash priorities: the k distinct values whose
64-bit hashes are smallest form a uniform sample of the distinct-value
set (each distinct value's hash is a fixed pseudo-random priority, so
membership is layout/partition/merge-order INVARIANT and the merge is
exactly associative — unlike classic reservoir sampling, whose per-row
randomness is not reproducible across block layouts).

Dual use: the hash set doubles as a KMV estimator, so ``estimate()``
gives the distinct count while ``sample()`` yields the sampled values —
the "show me representative values + how many there are" primitive a
curation pipeline wants (sample distinct user ids, hosts, doc lengths).

Reference analog: none (the reference has a single quantile sketch);
mergeability contract mirrors qcore.c:390-417 merge semantics.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from q_digest_ray.functions.hashing import hash64
from q_digest_ray.sketches.kmv import bottomk_estimate, bottomk_theta
from q_digest_ray.sketches.base import Sketch, pack_arrays, register, unpack_arrays

@register
class SampleSketch(Sketch):
    kind = "sample"

    __slots__ = ("k", "_hashes", "_values", "_n")

    def __init__(self, k: int = 256):
        if k < 4:
            raise ValueError("k must be >= 4")
        self.k = int(k)
        self._hashes = np.empty(0, dtype=np.uint64)  # sorted asc, unique
        self._values = np.empty(0, dtype=np.int64)  # aligned with _hashes
        self._n = 0

    @property
    def n(self) -> int:
        return self._n

    def _trim(self, h: np.ndarray, v: np.ndarray) -> None:
        ch = np.concatenate([self._hashes, h])
        cv = np.concatenate([self._values, v])
        order = np.argsort(ch, kind="stable")
        ch, cv = ch[order], cv[order]
        keep = np.ones(len(ch), dtype=bool)
        keep[1:] = ch[1:] != ch[:-1]
        self._hashes = ch[keep][: self.k]
        self._values = cv[keep][: self.k]

    def update_batch(self, values, weights=None) -> None:
        """Sample domain is the INT64 representation of the values: inputs
        are normalized to int64 BEFORE hashing on every path, so Arrow and
        numpy, grouped and ungrouped builds agree (hashing the original
        float bit patterns while storing truncated ints would put
        duplicate values in a 'distinct-value' sample — r3 review
        finding).  Nulls/NaNs carry no value to sample and are dropped."""
        if weights is not None:
            raise ValueError("SampleSketch is weight-free (distinct-value sample)")
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        if isinstance(values, pa.Array):
            import pyarrow.compute as pc

            if values.null_count:
                values = pc.drop_null(values)
            v = values.to_numpy(zero_copy_only=False)
        else:
            v = np.asarray(values)
        if v.dtype.kind == "f":
            v = v[~np.isnan(v)]
        v = v.astype(np.int64)
        if v.size == 0:
            return
        h = hash64(v)
        self._trim(h, v)
        self._n += int(h.size)

    def merge(self, other: "SampleSketch") -> "SampleSketch":
        # the SMALLER k (coarser threshold) governs, as in KMV union;
        # _trim already slices to the updated k
        self.k = min(self.k, other.k)
        self._trim(other._hashes, other._values)
        self._n += other._n
        return self

    def sample(self) -> np.ndarray:
        """The sampled distinct values, in hash-priority order."""
        return self._values.copy()

    @property
    def theta(self) -> float:
        return bottomk_theta(self._hashes, self.k)

    def estimate(self) -> float:
        """KMV distinct estimate (free by-product of the hash set;
        estimator shared with sketches/kmv.py)."""
        return bottomk_estimate(self._hashes, self.k)

    def to_bytes(self) -> bytes:
        header = struct.pack("<BIQ", 1, self.k, self._n)
        return pack_arrays(header, self._hashes, self._values)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "SampleSketch":
        header, arrays = unpack_arrays(buf)
        ver, k, n = struct.unpack("<BIQ", header)
        if ver != 1:
            raise ValueError(f"unsupported SampleSketch version {ver}")
        sk = cls(k=k)
        sk._hashes = arrays[0].astype(np.uint64)
        sk._values = arrays[1].astype(np.int64)
        sk._n = int(n)
        return sk

    def __repr__(self) -> str:  # pragma: no cover
        return f"SampleSketch(k={self.k}, held={len(self._hashes)}, n={self._n})"
