"""In-suite slice of the DuckDB oracle gate (sf0.001, a handful of cheap
queries) so plain pytest also exercises Ray-vs-SQL parity; the driver and
tools/check_oracles.py run the full catalog at sf0.01."""

import duckdb
import pandas as pd
import pytest

import __ray_entry__ as entrymod

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()
NAMES = [
    "pricing_summary",
    "lang_counts",
    "top_users",
    "exact_quantiles_nchars",
    "revenue_by_priority",
    "orders_without_lineitems",
    "distinct_users_by_type",
    "nchars_quantiles_by_lang",
    "top_docs_per_lang",
    "top_terms_per_lang",
    "docs_vs_lang_median",
    "cross_source_contamination",
    "corr_quantity_price",
    "cust_order_count_dist",
    "shipping_priority",
    "lang_source_matrix",
    "source_lang_entropy",
    "inter_event_gaps",
    "users_all_types",
    "mode_priority_by_status",
    "event_pair_counts",
    "zscore_outliers",
    "mad_nchars_by_lang",
    "user_first_last",
    "funnel_conversion",
    "embedding_centroid_norms",
    "table_profile",
    "conversion_latency",
    "decayed_counts",
    "clickers_never_purchased",
    "price_histogram",
    # round-4 third slate
    "dup_spans",
    "sequence_pack_stats",
    "gopher_quality_flags",
    "mixture_weights",
    "padding_waste_stats",
    "curation_v2_stats",
    "train_val_test_split",
]


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("int64")
        elif df[c].dtype.kind == "f":
            df[c] = df[c].astype("float64").round(6)
        elif df[c].dtype.kind in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


@pytest.fixture(scope="module")
def duck(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", NAMES)
def test_query_matches_oracle(ray_session, sf_dir, duck, name):
    res = entrymod.queries()[name](sf_dir)
    if hasattr(res, "to_pandas"):
        res = res.to_pandas()
    exp = duck.sql(entrymod.oracle_sql()[name]).df()
    a, b = _normalize(pd.DataFrame(res)), _normalize(exp)
    assert list(a.columns) == list(b.columns)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_qdigest_rejects_oversized_universe():
    import numpy as np

    from q_digest_ray.sketches.qdigest import QDigest

    q = QDigest(k=8, universe_bits=8)
    with pytest.raises(ValueError, match="2\\*\\*48"):
        q.update_batch(np.array([1 << 50]))


def test_every_oracle_sql_binds():
    """EXPLAIN-plan every EXACT_QUERIES oracle against sf0.001 views —
    catches SQL typos/bad identifiers in seconds without executing the
    full catalog (the live gate is tools/check_oracles.py)."""
    duck = duckdb.connect()
    for t in TABLES:
        duck.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'/root/testdata/sf0.001/{t}.parquet'"
        )
    sqls = entrymod.oracle_sql()
    assert len(sqls) >= 86
    for name, sql in sqls.items():
        try:
            duck.sql("EXPLAIN " + sql)
        except Exception as exc:  # pragma: no cover
            raise AssertionError(f"oracle SQL for {name!r} fails to bind: {exc}")
