"""B-invariance of the coarse hash-bucket groupby pattern (the file
q_digest_ray/stages/partitioning.py cites as its property-test home).

Every bucketed exchange (exact dedup, distinct count, sessionize, as-of
join, bucketed fact-fact join) must produce IDENTICAL results for any
bucket count B — each bucket is an independent exact sub-problem, so B is
purely a memory/parallelism knob (derive_buckets sizes it ~1 GiB of input
per bucket at scale).
"""

import pandas as pd
import pytest

from q_digest_ray.stages.partitioning import derive_buckets


def test_derive_buckets_scales_with_size():
    assert derive_buckets(size_bytes=0) == 8
    assert derive_buckets(size_bytes=10 << 30) == 16
    assert derive_buckets(size_bytes=100 << 40) == 1 << 17  # clamped at max
    b = derive_buckets(size_bytes=37 << 30)
    assert b & (b - 1) == 0  # power of two


@pytest.mark.parametrize("B", [8, 32, 128])
def test_bucketed_queries_b_invariant(ray_session, sf_dir, B):
    from q_digest_ray.pipelines.queries import (
        asof_join_orders,
        dedup_exact,
        distinct_text_count,
        sessionize,
    )

    base = {
        "dedup": dedup_exact(sf_dir, num_buckets=32),
        "distinct": distinct_text_count(sf_dir, num_buckets=32),
        "sessionize": sessionize(sf_dir, num_buckets=32),
        "asof": asof_join_orders(sf_dir, num_buckets=32),
    }
    got = {
        "dedup": dedup_exact(sf_dir, num_buckets=B),
        "distinct": distinct_text_count(sf_dir, num_buckets=B),
        "sessionize": sessionize(sf_dir, num_buckets=B),
        "asof": asof_join_orders(sf_dir, num_buckets=B),
    }
    for name in base:
        pd.testing.assert_frame_equal(
            base[name].reset_index(drop=True), got[name].reset_index(drop=True)
        )


def test_customer_nation_revenue_b_invariant(ray_session, sf_dir):
    from q_digest_ray.pipelines.queries import customer_nation_revenue

    a = customer_nation_revenue(sf_dir, num_buckets=8)
    b = customer_nation_revenue(sf_dir, num_buckets=64)
    pd.testing.assert_frame_equal(a, b)


def test_round3_queries_b_invariant(ray_session, sf_dir):
    from q_digest_ray.pipelines.queries import (
        distinct_users_by_type,
        orders_without_lineitems,
    )

    pd.testing.assert_frame_equal(
        orders_without_lineitems(sf_dir, num_buckets=8),
        orders_without_lineitems(sf_dir, num_buckets=64),
    )
    pd.testing.assert_frame_equal(
        distinct_users_by_type(sf_dir, num_buckets=8),
        distinct_users_by_type(sf_dir, num_buckets=64),
    )
