"""DDSketch (tenth family, r5): alpha-relative value-error guarantee,
exact-mergeable stores, serde, weighted parity, collapsing bound.

No Ray needed for the core tests — SketchBuilder is called directly as a
plain function on an Arrow table for the integration check.
"""

import math

import numpy as np
import pyarrow as pa
import pytest

from q_digest_ray.sketches.ddsketch import DDSketch

PS = (0.01, 0.05, 0.25, 0.5, 0.75, 0.9, 0.95, 0.99)


def _exact_at_same_rank(sorted_vals: np.ndarray, p: float) -> float:
    # the sketch returns the bucket holding the item of 1-indexed rank
    # ceil(p*n) (searchsorted-left on cumulative counts with target p*n)
    n = len(sorted_vals)
    r = max(1, math.ceil(p * n))
    return float(sorted_vals[r - 1])


@pytest.mark.parametrize(
    "gen",
    [
        lambda rng: rng.lognormal(5.0, 2.0, 200_000),
        lambda rng: rng.uniform(1.0, 1e6, 200_000),
        lambda rng: rng.pareto(1.5, 200_000) + 1.0,
    ],
    ids=["lognormal", "uniform", "pareto"],
)
def test_relative_error_bound(gen):
    rng = np.random.Generator(np.random.PCG64(377))
    data = gen(rng)
    sk = DDSketch(alpha=0.01)
    sk.update_batch(data)
    assert not sk.collapsed
    s = np.sort(data)
    for p in PS:
        est = sk.quantile(p)
        exact = _exact_at_same_rank(s, p)
        assert abs(est - exact) <= sk.alpha * exact * (1 + 1e-9), (p, est, exact)


def test_merge_exactness_and_order_invariance():
    rng = np.random.Generator(np.random.PCG64(7))
    data = rng.lognormal(3.0, 1.5, 50_000)
    whole = DDSketch(alpha=0.02)
    whole.update_batch(data)

    parts = np.array_split(data, 16)
    for perm_seed in (0, 1, 2):
        order = np.random.Generator(np.random.PCG64(perm_seed)).permutation(16)
        acc = DDSketch(alpha=0.02)
        for i in order:
            part = DDSketch(alpha=0.02)
            part.update_batch(parts[i])
            acc.merge(part)
        # bucket-count addition is exact: identical store state, not just
        # estimates within a bound
        assert np.array_equal(acc._pos_keys, whole._pos_keys)
        assert np.array_equal(acc._pos_counts, whole._pos_counts)
        assert acc.n == whole.n
        for p in PS:
            assert acc.quantile(p) == whole.quantile(p)


def test_weighted_equals_replicated():
    vals = np.array([3.0, 17.5, 200.0, 3.0, 9999.0])
    w = np.array([4, 1, 3, 2, 5])
    a = DDSketch(alpha=0.01)
    a.update_batch(vals, weights=w)
    b = DDSketch(alpha=0.01)
    b.update_batch(np.repeat(vals, w))
    assert a.n == b.n == int(w.sum())
    assert np.array_equal(a._pos_keys, b._pos_keys)
    assert np.array_equal(a._pos_counts, b._pos_counts)


def test_zero_negative_and_nan_handling():
    sk = DDSketch(alpha=0.01)
    sk.update_batch(np.array([-100.0, -1.0, 0.0, 0.0, 1.0, 100.0, np.nan]))
    assert sk.n == 6  # NaN dropped
    assert sk._zero == 2
    assert sk.quantile(0.0) < -99.0  # lowest bucket ~ -100 within alpha
    mid = sk.quantile(0.5)
    assert mid == 0.0 or abs(mid) <= 1.02
    hi = sk.quantile(1.0)
    assert abs(hi - 100.0) <= 0.01 * 100.0 * (1 + 1e-9)


def test_serde_round_trip():
    rng = np.random.Generator(np.random.PCG64(11))
    sk = DDSketch(alpha=0.015, max_buckets=512)
    sk.update_batch(rng.lognormal(2.0, 3.0, 10_000))
    sk.update_batch(-rng.lognormal(1.0, 1.0, 1_000))
    sk.update_batch(np.zeros(5))
    back = DDSketch.from_bytes(sk.to_bytes())
    assert back.alpha == sk.alpha
    assert back.max_buckets == sk.max_buckets
    assert back.n == sk.n
    assert back._zero == sk._zero
    assert np.array_equal(back._pos_keys, sk._pos_keys)
    assert np.array_equal(back._pos_counts, sk._pos_counts)
    assert np.array_equal(back._neg_keys, sk._neg_keys)
    assert np.array_equal(back._neg_counts, sk._neg_counts)
    for p in PS:
        assert back.quantile(p) == sk.quantile(p)


def test_collapse_bounds_memory_and_keeps_upper_tail():
    rng = np.random.Generator(np.random.PCG64(13))
    # span many decades so bucket count would exceed the cap
    data = np.exp(rng.uniform(-18.0, 18.0, 100_000))
    sk = DDSketch(alpha=0.01, max_buckets=256)
    sk.update_batch(data)
    assert sk.collapsed
    assert len(sk._pos_keys) <= 256
    # collapsing folds LOWEST buckets: upper quantiles keep the guarantee
    s = np.sort(data)
    for p in (0.9, 0.99):
        est = sk.quantile(p)
        exact = _exact_at_same_rank(s, p)
        assert abs(est - exact) <= sk.alpha * exact * (1 + 1e-9)


def test_merge_alpha_mismatch_raises():
    a = DDSketch(alpha=0.01)
    b = DDSketch(alpha=0.02)
    with pytest.raises(ValueError):
        a.merge(b)


def test_builder_integration_plain_function():
    from q_digest_ray.stages.build import SketchBuilder, SketchSpec
    from q_digest_ray.sketches.base import sketch_from_bytes

    t = pa.table(
        {
            "n_chars": pa.array([10, 1000, 50, 77, 123456], pa.int64()),
            "lang": pa.array(["en", "en", "de", "de", "fr"]),
        }
    )
    rows = SketchBuilder(
        [
            SketchSpec("nc_dds", "n_chars", "dds", {"alpha": 0.01}),
            SketchSpec("nc_dds_by_lang", "n_chars", "dds", {"alpha": 0.01}, group_by="lang"),
        ]
    )(t)
    assert rows.num_rows == 1 + 3
    global_row = rows.filter(pa.compute.equal(rows["metric"], "nc_dds"))
    sk = sketch_from_bytes("dds", global_row["payload"][0].as_py())
    assert sk.n == 5
    assert abs(sk.quantile(1.0) - 123456) <= 0.01 * 123456 * (1 + 1e-9)


def test_distributed_build_meets_alpha_bound(ray_session):
    """Full Ray path (read → SketchBuilder pool → grouped merge) on sf0.001
    documents: every reported quantile is within alpha of the exact value at
    the same rank."""
    import pyarrow.parquet as pq

    from q_digest_ray.pipelines.queries import sk_ddsketch_nchars

    df = sk_ddsketch_nchars("/root/testdata/sf0.001")
    exact = np.sort(
        pq.read_table("/root/testdata/sf0.001/documents.parquet", columns=["n_chars"])
        .column("n_chars")
        .to_numpy()
    )
    for p in (0.5, 0.9, 0.99):
        est = df[(df["stat"] == f"p{int(p * 100)}")]["value"].iloc[0]
        ex = _exact_at_same_rank(exact, p)
        assert abs(est - ex) <= 0.01 * ex * (1 + 1e-9), (p, est, ex)
