"""Accuracy-bound + merge-property + serde tests for the five flanking
sketches (SURVEY.md §2.3): each sketch within its published guarantee, merge
commutative/associative, serialization round-trips."""

import numpy as np
import pytest

from q_digest_ray.sketches import (
    BloomFilter,
    CountMinSketch,
    HyperLogLog,
    KLL,
    TDigest,
)


def _partitioned(cls_factory, vals, parts=8):
    sketches = []
    for chunk in np.array_split(vals, parts):
        s = cls_factory()
        s.update_batch(chunk)
        sketches.append(s)
    return sketches


def _merge_all(sketches, order=None):
    idx = order if order is not None else range(len(sketches))
    idx = list(idx)
    acc = type(sketches[idx[0]]).from_bytes(sketches[idx[0]].to_bytes())
    for i in idx[1:]:
        acc.merge(type(sketches[i]).from_bytes(sketches[i].to_bytes()))
    return acc


# ---------------------------------------------------------------------------
# HLL
# ---------------------------------------------------------------------------


def test_hll_accuracy_bound():
    rng = np.random.default_rng(377)
    vals = rng.integers(0, 80_000, 400_000)
    true = len(np.unique(vals))
    h = HyperLogLog(p=12)
    for chunk in np.array_split(vals, 16):
        h.update_batch(chunk)
    est = h.estimate()
    # 3-sigma of the published 1.04/sqrt(m) relative std error
    assert abs(est - true) / true <= 3 * h.relative_error


def test_hll_merge_is_exactly_order_invariant():
    rng = np.random.default_rng(1)
    vals = rng.integers(0, 10_000, 100_000)
    sketches = _partitioned(lambda: HyperLogLog(p=10), vals)
    a = _merge_all(sketches)
    b = _merge_all(sketches, order=reversed(range(len(sketches))))
    # register-max merge is exactly associative/commutative
    assert a.estimate() == b.estimate()
    assert np.array_equal(a.registers, b.registers)


def test_hll_strings_and_serde():
    import pyarrow as pa

    h = HyperLogLog(p=10)
    h.update_batch(pa.array([f"https://host{i % 500}.com/p/{i % 700}" for i in range(5000)]))
    true = len({(i % 500, i % 700) for i in range(5000)})
    h2 = HyperLogLog.from_bytes(h.to_bytes())
    assert h2.estimate() == h.estimate()
    assert abs(h.estimate() - true) / true <= 3 * h.relative_error


# ---------------------------------------------------------------------------
# Count-Min
# ---------------------------------------------------------------------------


def test_cms_overcount_bound():
    rng = np.random.default_rng(2)
    keys = rng.zipf(1.3, 200_000).astype(np.int64)
    c = CountMinSketch(depth=5, width=2048)
    for chunk in np.array_split(keys, 8):
        c.update_batch(chunk)
    uniq, true_counts = np.unique(keys, return_counts=True)
    probe = uniq[:2000]
    est = c.query(probe)
    true = true_counts[:2000]
    # never undercounts
    assert (est >= true).all()
    # overcount <= eps*n for the overwhelming majority (prob 1-delta each)
    frac_bad = np.mean(est - true > c.eps * c.n)
    assert frac_bad <= 0.01


def test_cms_merge_exact_and_weighted():
    a = CountMinSketch(depth=4, width=512)
    b = CountMinSketch(depth=4, width=512)
    a.update_batch(np.array([1, 1, 2]), weights=np.array([5, 5, 3]))
    b.update_batch(np.array([1, 3]))
    a.merge(b)
    assert a.n == 15
    assert a.query(np.array([1]))[0] >= 11
    c = CountMinSketch.from_bytes(a.to_bytes())
    assert np.array_equal(c.table, a.table)


# ---------------------------------------------------------------------------
# Bloom
# ---------------------------------------------------------------------------


def test_bloom_no_false_negatives_and_fp_rate():
    members = np.arange(20_000, dtype=np.int64)
    b = BloomFilter.from_capacity(20_000, fp_rate=0.01)
    for chunk in np.array_split(members, 4):
        b.update_batch(chunk)
    assert b.contains(members).all()  # zero FN by construction
    non_members = np.arange(100_000, 200_000, dtype=np.int64)
    fp = b.contains(non_members).mean()
    assert fp <= 0.02  # 2x slack on the configured 1% target


def test_bloom_merge_or_semantics():
    a = BloomFilter(num_bits=1 << 14, num_hashes=5)
    b = BloomFilter(num_bits=1 << 14, num_hashes=5)
    a.update_batch(np.array([1, 2, 3]))
    b.update_batch(np.array([4, 5]))
    a.merge(b)
    assert a.contains(np.array([1, 2, 3, 4, 5])).all()
    a2 = BloomFilter.from_bytes(a.to_bytes())
    assert np.array_equal(a2.bits, a.bits)


# ---------------------------------------------------------------------------
# t-digest
# ---------------------------------------------------------------------------


def test_tdigest_accuracy_lognormal():
    rng = np.random.default_rng(377)
    vals = rng.lognormal(6.2, 1.1, 200_000)
    sv = np.sort(vals)
    t = TDigest(delta=200)
    for chunk in np.array_split(vals, 16):
        t.update_batch(chunk)
    assert t.n == len(vals)
    assert t.num_centroids <= 2 * t.delta
    for p in (0.01, 0.25, 0.5, 0.9, 0.99):
        est = t.quantile(p)
        r = np.searchsorted(sv, est) / len(sv)
        assert abs(r - p) <= 0.005, (p, est, r)


def test_tdigest_merge_order_within_tolerance():
    rng = np.random.default_rng(5)
    vals = rng.normal(100, 15, 100_000)
    sv = np.sort(vals)
    sketches = _partitioned(lambda: TDigest(delta=200), vals, parts=16)
    for order in (range(16), reversed(range(16))):
        acc = _merge_all(sketches, order=order)
        assert acc.n == len(vals)
        for p in (0.05, 0.5, 0.95):
            r = np.searchsorted(sv, acc.quantile(p)) / len(sv)
            assert abs(r - p) <= 0.01


def test_tdigest_serde_and_edges():
    t = TDigest(delta=100)
    t.update_batch(np.array([1.0, 2.0, 3.0]))
    t2 = TDigest.from_bytes(t.to_bytes())
    assert t2.quantile(0.0) == t.quantile(0.0)
    assert t2.quantile(1.0) == 3.0
    empty = TDigest()
    assert np.isnan(empty.quantile(0.5))


# ---------------------------------------------------------------------------
# KLL
# ---------------------------------------------------------------------------


def test_kll_rank_bound():
    rng = np.random.default_rng(377)
    vals = rng.integers(0, 1 << 20, 300_000).astype(np.float64)
    sv = np.sort(vals)
    s = KLL(k=200)
    for chunk in np.array_split(vals, 16):
        s.update_batch(chunk)
    assert s.n == len(vals)
    # KLL with k=200: eps ~ 1.7/k ≈ 0.85%; allow 2%
    for p in (0.01, 0.25, 0.5, 0.75, 0.99):
        est = s.quantile(p)
        r = np.searchsorted(sv, est) / len(sv)
        assert abs(r - p) <= 0.02, (p, r)


def test_kll_merge_and_serde():
    rng = np.random.default_rng(8)
    vals = rng.normal(0, 1, 80_000)
    sv = np.sort(vals)
    sketches = _partitioned(lambda: KLL(k=200), vals, parts=16)
    acc = _merge_all(sketches)
    assert acc.n == len(vals)
    for p in (0.1, 0.5, 0.9):
        r = np.searchsorted(sv, acc.quantile(p)) / len(sv)
        assert abs(r - p) <= 0.03
    acc2 = KLL.from_bytes(acc.to_bytes())
    assert acc2.quantile(0.5) == acc.quantile(0.5)
    assert acc2.num_retained == acc.num_retained


def test_kll_memory_sublinear():
    s = KLL(k=128)
    rng = np.random.default_rng(3)
    for _ in range(20):
        s.update_batch(rng.normal(0, 1, 50_000))
    # 1M points retained in O(k log(n/k)) items
    assert s.num_retained < 5_000
