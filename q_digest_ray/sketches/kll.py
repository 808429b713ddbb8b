"""KLL quantile sketch (Karnin, Lang, Liberty 2016, public algorithm).

Geometric compactor hierarchy: items at level h carry weight 2**h; level
capacities shrink by c = 2/3 toward the bottom.  Compaction sorts a full
level and promotes every other item (random parity from a per-sketch
deterministic RNG stream) to the level above.  Formal (eps, delta) rank
guarantee; merge = level-wise concatenation + compaction.

Vectorized: batch appends and compactions are numpy sort/slice operations;
rank queries are one weighted sort over <= O(k log(n/k)) retained items.
"""

from __future__ import annotations

import struct

import numpy as np

from q_digest_ray.sketches.base import Sketch, register

_C = 2.0 / 3.0


class KLL(Sketch):
    kind = "kll"

    __slots__ = ("k", "_levels", "_n", "_rng", "_seed")

    def __init__(self, k: int = 200, seed: int = 7):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self._levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self._n = 0
        self._seed = int(seed)
        self._rng = np.random.Generator(np.random.PCG64(self._seed))

    @property
    def n(self) -> int:
        return self._n

    @property
    def num_retained(self) -> int:
        return sum(len(lv) for lv in self._levels)

    def _capacity(self, level: int) -> int:
        depth = len(self._levels)
        return max(2, int(np.ceil(self.k * (_C ** (depth - 1 - level)))))

    def _total_capacity(self) -> int:
        return sum(self._capacity(h) for h in range(len(self._levels)))

    def _compact(self) -> None:
        while self.num_retained > self._total_capacity():
            for h in range(len(self._levels)):
                if len(self._levels[h]) > self._capacity(h):
                    buf = np.sort(self._levels[h], kind="stable")
                    start = int(self._rng.integers(0, 2))
                    promoted = buf[start::2]
                    self._levels[h] = np.empty(0, dtype=np.float64)
                    if h + 1 == len(self._levels):
                        self._levels.append(np.empty(0, dtype=np.float64))
                    self._levels[h + 1] = np.concatenate([self._levels[h + 1], promoted])
                    break
            else:
                break

    def update_batch(self, values, weights=None) -> None:
        """Append a batch; ``weights`` (non-negative ints) replicate each
        value, matching the reference's weighted insert(key, count)
        (src/qcore.c:201).  A weight w is decomposed into its binary digits
        and the value inserted once at each set-bit level h — items at level
        h carry weight 2**h, so total weight is exact and the cost per row
        is O(log w) appends instead of w."""
        vals = np.asarray(values, dtype=np.float64)
        if vals.size == 0:
            return
        if weights is None:
            if np.isnan(vals).any():
                vals = vals[~np.isnan(vals)]
                if vals.size == 0:
                    return
            self._levels[0] = np.concatenate([self._levels[0], vals])
            self._n += int(vals.size)
            self._compact()
            return
        w = np.asarray(weights, dtype=np.int64)
        if w.shape != vals.shape:
            raise ValueError("weights must align with values")
        if w.size and w.min() < 0:
            raise ValueError("weights must be non-negative")
        keep = ~np.isnan(vals) & (w > 0)
        vals, w = vals[keep], w[keep]
        if vals.size == 0:
            return
        for h in range(int(w.max()).bit_length()):
            sel = vals[((w >> np.int64(h)) & np.int64(1)) == 1]
            if sel.size:
                while len(self._levels) <= h:
                    self._levels.append(np.empty(0, dtype=np.float64))
                self._levels[h] = np.concatenate([self._levels[h], sel])
        self._n += int(w.sum())
        self._compact()

    def merge(self, other: "KLL") -> "KLL":
        self.k = max(self.k, other.k)
        while len(self._levels) < len(other._levels):
            self._levels.append(np.empty(0, dtype=np.float64))
        for h, lv in enumerate(other._levels):
            if len(lv):
                self._levels[h] = np.concatenate([self._levels[h], lv])
        self._n += other._n
        self._compact()
        return self

    def _weighted_items(self) -> tuple[np.ndarray, np.ndarray]:
        vals = []
        wts = []
        for h, lv in enumerate(self._levels):
            if len(lv):
                vals.append(lv)
                wts.append(np.full(len(lv), 1 << h, dtype=np.int64))
        if not vals:
            return np.empty(0, np.float64), np.empty(0, np.int64)
        v = np.concatenate(vals)
        w = np.concatenate(wts)
        order = np.argsort(v, kind="stable")
        return v[order], w[order]

    def quantile(self, p: float) -> float:
        v, w = self._weighted_items()
        if len(v) == 0:
            return float("nan")
        csum = np.cumsum(w)
        target = p * csum[-1]
        idx = int(np.searchsorted(csum, target, side="left"))
        if idx >= len(v):
            idx = len(v) - 1
        return float(v[idx])

    def quantiles(self, ps) -> list[float]:
        v, w = self._weighted_items()
        if len(v) == 0:
            return [float("nan")] * len(list(ps))
        csum = np.cumsum(w)
        out = []
        for p in ps:
            idx = int(np.searchsorted(csum, p * csum[-1], side="left"))
            out.append(float(v[min(idx, len(v) - 1)]))
        return out

    def rank(self, x: float) -> float:
        """Estimated fraction of items <= x."""
        v, w = self._weighted_items()
        if len(v) == 0:
            return 0.0
        idx = int(np.searchsorted(v, x, side="right"))
        return float(np.sum(w[:idx]) / np.sum(w))

    def to_bytes(self) -> bytes:
        header = struct.pack("<BIQQI", 1, self.k, self._n, self._seed, len(self._levels))
        parts = [header]
        for lv in self._levels:
            parts.append(struct.pack("<Q", len(lv)))
            parts.append(np.ascontiguousarray(lv).tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        ver, k, n, seed, depth = struct.unpack_from("<BIQQI", buf, 0)
        s = cls(k=k, seed=seed)
        s._n = n
        off = struct.calcsize("<BIQQI")
        s._levels = []
        for _ in range(depth):
            (m,) = struct.unpack_from("<Q", buf, off)
            off += 8
            s._levels.append(np.frombuffer(buf, dtype=np.float64, count=m, offset=off).copy())
            off += 8 * m
        if not s._levels:
            s._levels = [np.empty(0, dtype=np.float64)]
        return s

    def __repr__(self) -> str:
        return f"KLL(k={self.k}, n={self._n}, retained={self.num_retained})"


register(KLL)
