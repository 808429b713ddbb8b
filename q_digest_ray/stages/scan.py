"""Distributed ordered prefix scans (running aggregates over a TOTAL order).

Window functions like ``SUM(...) OVER (ORDER BY ts)`` or the streaming
watermark ``MAX(ts) OVER (ORDER BY arrival)`` look inherently sequential;
the scale shape is the classic two-phase scan:

  1. map-only pass: per ORDERED-BUCKET partials (hour of ts, or a fixed
     arrival-id range) — a tiny table, one row per (block, bucket);
  2. driver: sort the buckets and take the EXCLUSIVE prefix combine over
     them (thousands of entries even at 10^12 rows — hours in a decade,
     or ~4k id ranges), broadcast via ray.put;
  3. one bucketed exchange co-locating each ordered bucket, then a
     vectorized within-bucket scan seeded by the bucket's prefix offset.

Partitioning assumption: one ordered bucket's rows fit a task (hour
granularity / the id-range quantum is derived 8x finer than the 1 GiB
bucket rule).  Bucket-count invariance is the correctness property —
the scan result never depends on B (tested, and both ops carry DuckDB
window-function oracles).

Broadcast offsets are fetched with ``ray.get(ref)`` inside plain map
functions (zero-copy local get) — never actor pools (BASELINE.md §4).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray

from q_digest_ray.functions.fixedpoint import scaled_int64
from q_digest_ray.stages.partitioning import derive_buckets

_US_PER_HOUR = 3_600_000_000
_NEG_INF_US = np.int64(-(1 << 62))


def _ts_us(col) -> np.ndarray:
    a = np.asarray(col)
    if a.dtype.kind == "M":
        return a.astype("datetime64[us]").astype(np.int64)
    return a.astype(np.int64)


def running_total(ds, value_col: str = "value", decimals: int = 2, num_buckets: int | None = None):
    """Exact running sum of a money column over the total order
    (ts, event_id) — SUM(...) OVER (ORDER BY ts, event_id ROWS UNBOUNDED
    PRECEDING), distributed.  Ordered bucket = epoch hour of ts.

    Returns a Dataset-shaped pandas frame (event_id, running_sum) with the
    sum exact to ``decimals`` places (int-cents arithmetic on both phases).
    """

    def hour_partials(batch: pa.Table) -> pa.Table:
        hours = _ts_us(batch["ts"].to_numpy(zero_copy_only=False)) // _US_PER_HOUR
        cents = scaled_int64(batch[value_col].to_numpy(zero_copy_only=False), decimals)
        order = np.argsort(hours, kind="stable")
        sh, sc = hours[order], cents[order]
        starts = np.flatnonzero(np.r_[True, sh[1:] != sh[:-1]])
        return pa.table(
            {
                "hour": pa.array(sh[starts], pa.int64()),
                "cents": pa.array(np.add.reduceat(sc, starts), pa.int64()),
            }
        )

    partials = ds.map_batches(hour_partials, batch_format="pyarrow").take_all()
    sums: dict[int, int] = {}
    for row in partials:  # tiny: blocks x distinct-hours-per-block
        sums[row["hour"]] = sums.get(row["hour"], 0) + int(row["cents"])
    hours_sorted = np.array(sorted(sums), dtype=np.int64)
    # exclusive prefix in Python ints (overflow-safe re-sum), then int64
    run, offsets = 0, []
    for h in hours_sorted:
        offsets.append(run)
        run += sums[int(h)]
    offsets_ref = ray.put((hours_sorted, np.array(offsets, dtype=np.int64)))

    B = num_buckets or derive_buckets(ds)

    def add_bucket(batch: pa.Table) -> pa.Table:
        hours = _ts_us(batch["ts"].to_numpy(zero_copy_only=False)) // _US_PER_HOUR
        cents = scaled_int64(batch[value_col].to_numpy(zero_copy_only=False), decimals)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "ts_us": pa.array(_ts_us(batch["ts"].to_numpy(zero_copy_only=False))),
                "hour": pa.array(hours),
                "bucket": pa.array((hours % B).astype(np.int32)),
                "cents": pa.array(cents),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        hours_arr, offs = ray.get(offsets_ref)
        g = g.sort_values(["ts_us", "event_id"])
        hour = g["hour"].to_numpy()
        csum = np.cumsum(g["cents"].to_numpy())
        # subtract each hour-segment's preceding in-bucket mass, seed with
        # the global exclusive prefix of that hour
        starts = np.flatnonzero(np.r_[True, hour[1:] != hour[:-1]])
        seg_id = np.cumsum(np.r_[0, (hour[1:] != hour[:-1]).astype(np.int64)])
        seg_base = np.r_[0, csum[starts[1:] - 1]] if len(starts) > 1 else np.zeros(1, np.int64)
        glob = offs[np.searchsorted(hours_arr, hour[starts])]
        total = csum - seg_base[seg_id] + glob[seg_id]
        return pd.DataFrame(
            {"event_id": g["event_id"].to_numpy(), "running_sum": total / (10.0**decimals)}
        )

    return (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
    )


def late_event_census(ds, lateness_seconds: int = 300, target_buckets: int | None = None):
    """Streaming watermark / late-data census, batch-replayed exactly.

    Arrival order := event_id (the monotone ingestion id).  The watermark at
    a row is max(ts) over all STRICTLY PRECEDING arrivals minus the allowed
    lateness; a row is late iff its ts < watermark.  Three column-pruned
    scans: id-extent, per-id-range max-ts partials, then the tagged census —
    per event_type (n_events, n_late).
    """
    L_us = np.int64(int(lateness_seconds) * 1_000_000)

    def extent(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({"mn": [int(ids.min())], "mx": [int(ids.max())]})

    ext = ds.map_batches(extent, batch_format="pyarrow").take_all()
    lo = min(r["mn"] for r in ext)
    hi = max(r["mx"] for r in ext)
    nb = target_buckets or max(64, derive_buckets(ds) * 8)
    Q = max(1, (hi - lo + 1 + nb - 1) // nb)

    def bucket_of(ids: np.ndarray) -> np.ndarray:
        return (ids - lo) // Q

    def maxts_partials(batch: pa.Table) -> pa.Table:
        b = bucket_of(batch["event_id"].to_numpy(zero_copy_only=False))
        ts = _ts_us(batch["ts"].to_numpy(zero_copy_only=False))
        order = np.argsort(b, kind="stable")
        sb, st = b[order], ts[order]
        starts = np.flatnonzero(np.r_[True, sb[1:] != sb[:-1]])
        return pa.table(
            {
                "bucket": pa.array(sb[starts], pa.int64()),
                "max_ts": pa.array(np.maximum.reduceat(st, starts), pa.int64()),
            }
        )

    partials = ds.map_batches(maxts_partials, batch_format="pyarrow").take_all()
    mx: dict[int, int] = {}
    for row in partials:
        mx[row["bucket"]] = max(mx.get(row["bucket"], -(1 << 62)), int(row["max_ts"]))
    buckets_sorted = np.array(sorted(mx), dtype=np.int64)
    run = _NEG_INF_US
    prefix = []
    for b in buckets_sorted:
        prefix.append(run)
        run = max(run, mx[int(b)])
    prefix_ref = ray.put((buckets_sorted, np.array(prefix, dtype=np.int64)))

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "event_id": batch["event_id"],
                "event_type": batch["event_type"],
                "ts_us": pa.array(_ts_us(batch["ts"].to_numpy(zero_copy_only=False))),
                "bucket": pa.array(bucket_of(ids)),
            }
        )

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        buckets_arr, pref = ray.get(prefix_ref)
        g = g.sort_values("event_id")
        ts = g["ts_us"].to_numpy()
        seed = pref[np.searchsorted(buckets_arr, int(g["bucket"].iloc[0]))]
        # exclusive running max seeded by the prior buckets' prefix max
        excl = np.maximum.accumulate(np.r_[np.int64(seed), ts])[:-1]
        late = ts < excl - L_us
        out = pd.DataFrame({"event_type": g["event_type"].to_numpy(), "late": late})
        agg = out.groupby("event_type", sort=False).agg(
            n_events=("late", "size"), n_late=("late", "sum")
        )
        return agg.reset_index()

    rows = (
        ds.map_batches(add_bucket, batch_format="pyarrow")
        .groupby("bucket")
        .map_groups(per_bucket, batch_format="pandas")
        .to_pandas()
    )
    final = rows.groupby("event_type", sort=True).agg(
        n_events=("n_events", "sum"), n_late=("n_late", "sum")
    )
    final = final.reset_index()
    final["n_events"] = final["n_events"].astype("int64")
    final["n_late"] = final["n_late"].astype("int64")
    return final
