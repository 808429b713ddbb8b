"""Large-large join: bucketed pattern vs native Dataset.join equivalence,
outer-join behavior, and overlap guard."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from q_digest_ray.stages.join import bucketed_join, native_join


@pytest.fixture()
def sides(ray_session):
    import ray.data

    rng = np.random.default_rng(4)
    left = pa.table(
        {
            "k": pa.array(rng.integers(0, 500, 3000)),
            "lv": pa.array(rng.normal(size=3000)),
        }
    )
    right = pa.table(
        {
            "rk": pa.array(np.arange(400)),  # keys 400..499 unmatched on left side
            "rv": pa.array(np.arange(400) * 2),
        }
    )
    return (
        ray.data.from_arrow(left).repartition(4),
        ray.data.from_arrow(right).repartition(2),
        left,
        right,
    )


def _expected(left, right, how="inner"):
    return (
        left.to_pandas()
        .merge(right.to_pandas(), left_on="k", right_on="rk", how=how)
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )


def test_bucketed_inner_matches_pandas(sides):
    lds, rds, left, right = sides
    got = (
        bucketed_join(lds, rds, on="k", right_on="rk", num_buckets=8)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    exp = _expected(left, right)
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], exp[sorted(exp.columns)], check_dtype=False
    )


def test_bucketed_matches_native(sides):
    lds, rds, left, right = sides
    a = (
        bucketed_join(lds, rds, on="k", right_on="rk", num_buckets=8)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    import ray.data

    lds2 = ray.data.from_arrow(left).repartition(4)
    rds2 = ray.data.from_arrow(right).repartition(2)
    b = (
        native_join(lds2, rds2, on="k", right_on="rk", num_partitions=4)
        .to_pandas()
        .sort_values(["k", "lv"])
        .reset_index(drop=True)
    )
    assert len(a) == len(b)
    # native join collapses the equal key columns into one; ours keeps both
    assert (a["k"] == a["rk"]).all()
    a2 = a.drop(columns=[c for c in a.columns if c not in b.columns])
    pd.testing.assert_frame_equal(
        a2[sorted(a2.columns)], b[sorted(b.columns)], check_dtype=False
    )


def test_bucketed_left_join(sides):
    lds, rds, left, right = sides
    got = bucketed_join(lds, rds, on="k", right_on="rk", num_buckets=8, how="left").to_pandas()
    exp = _expected(left, right, how="left")
    assert len(got) == len(exp)
    assert got["rv"].isna().sum() == exp["rv"].isna().sum()


def test_overlapping_columns_rejected(sides):
    lds, rds, *_ = sides
    import ray.data

    dup = ray.data.from_arrow(pa.table({"k": [1], "lv": [0.5]}))
    with pytest.raises(ValueError, match="overlapping"):
        bucketed_join(lds, dup, on="k")
