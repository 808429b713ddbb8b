"""KMV (bottom-k / theta-style) sketch: accuracy, set ops, merge props."""

import numpy as np
import pytest

from q_digest_ray.sketches.kmv import KMV


def test_exact_below_k():
    s = KMV(k=256)
    s.update_batch(np.arange(100))
    assert s.estimate() == 100.0  # exact while under k distincts
    s.update_batch(np.arange(100))  # repeats don't change distincts
    assert s.estimate() == 100.0


def test_estimate_bound():
    rng = np.random.default_rng(11)
    vals = rng.integers(0, 300_000, 1_000_000)
    true = len(np.unique(vals))
    s = KMV(k=2048)
    for c in np.array_split(vals, 8):
        s.update_batch(c)
    # rel std err ~ 1/sqrt(k-2) ≈ 2.2%; assert 3 sigma
    assert abs(s.estimate() - true) / true <= 3 / np.sqrt(s.k - 2)


def test_union_intersection_jaccard():
    a, b = KMV(2048), KMV(2048)
    a.update_batch(np.arange(0, 60_000))
    b.update_batch(np.arange(40_000, 100_000))
    u = KMV.from_bytes(a.to_bytes())
    u.merge(b)
    assert abs(u.estimate() - 100_000) / 100_000 < 0.1
    assert abs(a.intersection_estimate(b) - 20_000) / 20_000 < 0.15
    assert abs(a.jaccard_estimate(b) - 0.2) < 0.05


def test_merge_order_invariant_exact():
    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50_000, 200_000)
    parts = np.array_split(vals, 8)
    sketches = []
    for p in parts:
        s = KMV(1024)
        s.update_batch(p)
        sketches.append(s)
    fwd = KMV.from_bytes(sketches[0].to_bytes())
    for s in sketches[1:]:
        fwd.merge(s)
    rev = KMV.from_bytes(sketches[-1].to_bytes())
    for s in reversed(sketches[:-1]):
        rev.merge(s)
    # bottom-k union is exactly order-invariant
    assert np.array_equal(fwd._hashes, rev._hashes)
    assert fwd.estimate() == rev.estimate()


def test_serde_and_min_k_merge():
    a, b = KMV(256), KMV(1024)
    a.update_batch(np.arange(5000))
    b.update_batch(np.arange(5000, 9000))
    a.merge(b)
    assert a.k == 256  # union keeps the smaller k
    a2 = KMV.from_bytes(a.to_bytes())
    assert a2.estimate() == a.estimate()
    with pytest.raises(ValueError):
        KMV(k=4)
