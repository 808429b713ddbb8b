"""Misra-Gries heavy hitters: deterministic bounds, enumeration guarantee,
merge properties, exactness below k distincts."""

import numpy as np
import pyarrow as pa
import pytest

from q_digest_ray.sketches.misra_gries import MisraGries


def test_exact_below_k():
    s = MisraGries(k=64)
    s.update_batch(pa.array(["a"] * 10 + ["b"] * 5 + ["c"] * 1))
    assert s.estimate("a") == 10
    assert s.estimate("b") == 5
    assert s.heavy_hitters() == [("a", 10), ("b", 5), ("c", 1)]
    assert s.error_bound == 16 / 65


def test_never_overcounts_and_bounded_undercount():
    rng = np.random.default_rng(2)
    keys = rng.zipf(1.3, 100_000)
    keys = keys[keys < 10_000].astype(np.int64)
    s = MisraGries(k=32)
    for c in np.array_split(keys, 8):
        s.update_batch(c)
    uniq, true = np.unique(keys, return_counts=True)
    truth = dict(zip(uniq.astype(str), true))
    for key, est in s.counters.items():
        t = truth[key]
        assert est <= t  # never overcounts
        assert t - est <= s.error_bound + 1  # undercount bounded by n/(k+1)
    # every key above the guarantee threshold is present
    for key, t in truth.items():
        if t > len(keys) / (s.k + 1):
            assert key in s.counters, key


def test_merge_within_bound_and_enumeration():
    rng = np.random.default_rng(5)
    keys = rng.zipf(1.5, 60_000).astype(np.int64)
    parts = np.array_split(keys, 16)
    sketches = []
    for p in parts:
        s = MisraGries(k=32)
        s.update_batch(p)
        sketches.append(s)
    acc = MisraGries.from_bytes(sketches[0].to_bytes())
    for s in sketches[1:]:
        acc.merge(MisraGries.from_bytes(s.to_bytes()))
    assert acc.n == len(keys)
    uniq, true = np.unique(keys, return_counts=True)
    truth = dict(zip(uniq.astype(str), true))
    for key, est in acc.counters.items():
        assert est <= truth[key]
        assert truth[key] - est <= acc.error_bound + 1
    for key, t in truth.items():
        if t > len(keys) / (acc.k + 1):
            assert key in acc.counters


def test_serde_roundtrip():
    s = MisraGries(k=8)
    s.update_batch(pa.array(["x", "y", "x", "z"]))
    s2 = MisraGries.from_bytes(s.to_bytes())
    assert s2.counters == s.counters
    assert s2.n == s.n
    # weighted inserts supported since round 2 (reference insert(key, count))
    s.update_batch(pa.array(["x"]), weights=np.array([2]))
    assert s.estimate("x") == 4
