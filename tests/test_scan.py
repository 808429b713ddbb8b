"""Distributed ordered prefix scans (stages/scan.py, r5): running totals
and the watermark late-data census — DuckDB window-function differentials,
bucket-count invariance, and hand-built late-row semantics."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import ray

from q_digest_ray.stages.scan import late_event_census, running_total

SF = "/root/testdata/sf0.001"


def _events_ds():
    from q_digest_ray.sources.tables import read_table

    return read_table(SF, "events", columns=["event_id", "ts", "value", "event_type"])


def test_running_total_matches_duckdb(ray_session):
    got = running_total(_events_ds()).to_pandas().sort_values("event_id").reset_index(drop=True)
    con = duckdb.connect()
    want = con.sql(
        f"""
        SELECT event_id,
               CAST(sum(CAST(value AS DECIMAL(18,2)))
                      OVER (ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 AS running_sum
        FROM read_parquet('{SF}/events.parquet') ORDER BY event_id
        """
    ).df()
    assert got["event_id"].tolist() == want["event_id"].tolist()
    assert np.allclose(got["running_sum"], want["running_sum"], rtol=0, atol=0)


def test_running_total_bucket_invariance(ray_session):
    a = running_total(_events_ds(), num_buckets=2).to_pandas().sort_values("event_id")
    b = running_total(_events_ds(), num_buckets=16).to_pandas().sort_values("event_id")
    assert np.array_equal(a["running_sum"].to_numpy(), b["running_sum"].to_numpy())


def test_late_census_matches_duckdb(ray_session):
    got = late_event_census(_events_ds(), lateness_seconds=300)
    con = duckdb.connect()
    want = con.sql(
        f"""
        WITH w AS (
          SELECT event_type, ts,
                 max(ts) OVER (ORDER BY event_id
                               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS wm
          FROM read_parquet('{SF}/events.parquet')
        )
        SELECT event_type, count(*) AS n_events,
               CAST(coalesce(sum(CASE WHEN ts < wm - INTERVAL 300 SECOND
                                      THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_late
        FROM w GROUP BY event_type ORDER BY event_type
        """
    ).df()
    assert got["event_type"].tolist() == want["event_type"].tolist()
    assert got["n_events"].tolist() == want["n_events"].astype("int64").tolist()
    assert got["n_late"].tolist() == want["n_late"].astype("int64").tolist()


def test_late_census_bucket_invariance(ray_session):
    a = late_event_census(_events_ds(), lateness_seconds=60, target_buckets=4)
    b = late_event_census(_events_ds(), lateness_seconds=60, target_buckets=256)
    pd.testing.assert_frame_equal(a, b)


def test_late_semantics_hand_built(ray_session):
    # arrival order = event_id; ts in seconds-as-us; lateness 10 s
    base = np.datetime64("2026-01-01T00:00:00", "us")
    sec = np.timedelta64(1_000_000, "us")
    rows = [
        {"event_id": 0, "ts": base + 0 * sec, "event_type": "a"},   # first: never late
        {"event_id": 1, "ts": base + 100 * sec, "event_type": "a"}, # advances watermark
        {"event_id": 2, "ts": base + 85 * sec, "event_type": "b"},  # 85 < 100-10 → late
        {"event_id": 3, "ts": base + 95 * sec, "event_type": "b"},  # 95 >= 90 → on time
        {"event_id": 4, "ts": base + 50 * sec, "event_type": "a"},  # late
    ]
    ds = ray.data.from_pandas(pd.DataFrame(rows))
    out = late_event_census(ds, lateness_seconds=10, target_buckets=2)
    got = {r.event_type: (r.n_events, r.n_late) for r in out.itertuples()}
    assert got == {"a": (3, 1), "b": (2, 1)}
