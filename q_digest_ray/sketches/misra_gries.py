"""Misra-Gries heavy-hitters summary (Misra & Gries 1982; merge rule per
Agarwal et al., "Mergeable Summaries", PODS 2012 — public algorithms; also
the subject of the retrieved PODS 2023 paper in PAPERS.md).

Keeps at most k (key, count) pairs.  Guarantees after any stream / merges:
    true_count - n/(k+1)  <=  estimate  <=  true_count
so every key with frequency > n/(k+1) is guaranteed present — unlike CMS,
the summary ENUMERATES its heavy hitters and never overcounts.

Merge: add counters, then subtract the (k+1)-largest combined count from
every counter and drop non-positives (the mergeable-summaries offset rule);
commutative/associative within the deterministic bound.

Keys are stored as strings (web-scale group keys: langs, hosts); batch
updates pre-aggregate with Arrow value_counts so the per-batch cost is one
dict merge over distincts, not rows.
"""

from __future__ import annotations

import struct

import numpy as np
import pyarrow as pa

from q_digest_ray.sketches.base import Sketch, register


class MisraGries(Sketch):
    kind = "mg"

    __slots__ = ("k", "counters", "_n")

    def __init__(self, k: int = 64):
        if k < 1:
            raise ValueError("k must be >= 1")
        self.k = int(k)
        self.counters: dict[str, int] = {}
        self._n = 0

    @property
    def n(self) -> int:
        return self._n

    @property
    def error_bound(self) -> float:
        """Max undercount of any estimate: n / (k+1)."""
        return self._n / (self.k + 1)

    def _shrink(self) -> None:
        if len(self.counters) <= self.k:
            return
        # subtract the (k+1)-largest count from everyone, drop <= 0
        counts = np.sort(np.fromiter(self.counters.values(), dtype=np.int64))
        offset = int(counts[-(self.k + 1)])
        self.counters = {
            key: c - offset for key, c in self.counters.items() if c - offset > 0
        }

    def update_batch(self, values, weights=None) -> None:
        """``weights`` (non-negative ints) replicate each value — the
        reference's weighted insert(key, count); per-key weights are summed
        vectorized before the dict merge."""
        if weights is not None:
            w = np.asarray(weights, dtype=np.int64)
            if len(w) != len(values):
                raise ValueError("weights must align with values")
            if w.size and w.min() < 0:
                raise ValueError("weights must be non-negative")
            if isinstance(values, pa.ChunkedArray):
                values = values.combine_chunks()
            if isinstance(values, pa.Array):
                if values.null_count:
                    raise ValueError("null keys unsupported with weights")
                enc = values.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False)
                keys = enc.dictionary.to_pylist()
            else:
                uk, codes = np.unique(np.asarray(values), return_inverse=True)
                keys = uk.tolist()
            # int64 accumulation — bincount's float64 weights path loses
            # integer precision past 2^53 per key; sort+reduceat keeps the
            # sum exact AND vectorized (np.add.at is an unbuffered loop)
            counts = np.zeros(len(keys), dtype=np.int64)
            if len(w):
                order = np.argsort(codes, kind="stable")
                sc = np.asarray(codes)[order]
                sw = w[order]
                starts = np.flatnonzero(np.r_[True, sc[1:] != sc[:-1]])
                counts[sc[starts]] = np.add.reduceat(sw, starts)
        else:
            if isinstance(values, pa.ChunkedArray):
                values = values.combine_chunks()
            if isinstance(values, pa.Array):
                vc = values.value_counts()
                keys = vc.field("values").to_pylist()
                counts = vc.field("counts").to_numpy(zero_copy_only=False)
            else:
                arr = np.asarray(values)
                uk, counts = np.unique(arr, return_counts=True)
                keys = uk.tolist()
        total = 0
        for key, c in zip(keys, counts):
            if c <= 0:
                continue
            key = str(key)
            self.counters[key] = self.counters.get(key, 0) + int(c)
            total += int(c)  # Python-int total: immune to int64 wrap
        self._n += total
        self._shrink()

    def merge(self, other: "MisraGries") -> "MisraGries":
        self.k = min(self.k, other.k)
        for key, c in other.counters.items():
            self.counters[key] = self.counters.get(key, 0) + int(c)
        self._n += other._n
        self._shrink()
        return self

    def heavy_hitters(self, min_fraction: float = 0.0) -> list[tuple[str, int]]:
        """(key, estimate) sorted by estimate desc, key asc.

        Guarantee: every key with true frequency > n*max(min_fraction, 1/(k+1))
        is listed.  Estimates undercount by up to n/(k+1), so the filter
        threshold is ``min_fraction*n - error_bound`` — keys whose TRUE count
        clears the fraction always survive, at the cost of possibly listing
        keys up to one error bound below it (no false negatives, some false
        positives — the standard MG trade)."""
        thresh = min_fraction * self._n - self.error_bound if min_fraction > 0 else 0.0
        out = [(k, c) for k, c in self.counters.items() if c >= thresh]
        return sorted(out, key=lambda kv: (-kv[1], kv[0]))

    def estimate(self, key: str) -> int:
        return self.counters.get(str(key), 0)

    def to_bytes(self) -> bytes:
        items = sorted(self.counters.items())
        blob = b"".join(
            struct.pack("<I", len(k.encode())) + k.encode() + struct.pack("<q", c)
            for k, c in items
        )
        return struct.pack("<BIQI", 1, self.k, self._n, len(items)) + blob

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MisraGries":
        ver, k, n, m = struct.unpack_from("<BIQI", buf, 0)
        s = cls(k=k)
        s._n = n
        off = struct.calcsize("<BIQI")
        for _ in range(m):
            (klen,) = struct.unpack_from("<I", buf, off)
            off += 4
            key = buf[off : off + klen].decode()
            off += klen
            (c,) = struct.unpack_from("<q", buf, off)
            off += 8
            s.counters[key] = c
        return s

    def __repr__(self) -> str:
        return f"MisraGries(k={self.k}, n={self._n}, keys={len(self.counters)})"


register(MisraGries)
