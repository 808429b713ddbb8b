"""Corpus export pipeline: score → filter → partitioned Parquet sink.

The sink shape for training-data curation: quality-scored documents written
as lang-partitioned Parquet (one directory per lang → a downstream run can
read or resume a single partition).  Demonstrates the engine's sinks; the
shard-level resumable sink lives in pipelines/checkpoint.py.
"""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def quality_scored(ds):
    """documents-shaped Dataset → + n_tokens + quality_score columns."""

    def score(batch: pa.Table) -> pa.Table:
        from q_digest_ray.functions.text import quality_features, quality_score

        feats = quality_features(batch["text"])
        return batch.append_column(
            "n_tokens", pa.array(feats["n_tokens"].to_numpy())
        ).append_column("quality_score", pa.array(quality_score(feats)))

    return ds.map_batches(score, batch_format="pyarrow")


def export_curated(
    ds, out_dir: str, min_quality: float = 0.3, partition_col: str = "lang"
) -> str:
    """Filter by quality and write lang-partitioned Parquet."""
    import pyarrow.compute as pc

    import os
    import shutil

    # write_parquet appends uniquely-named files; clear previous output so
    # a re-run can't double-count (same hazard checkpoint.py guards)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    scored = quality_scored(ds)
    kept = scored.map_batches(
        lambda t: t.filter(pc.greater_equal(t["quality_score"], pa.scalar(min_quality))),
        batch_format="pyarrow",
    )
    kept.write_parquet(out_dir, partition_cols=[partition_col])
    return out_dir


def dedup_keep_first(ds, id_col: str, text_col: str, num_buckets: int | None = None):
    """Dedup as a row filter: keep the min-``id_col`` row per distinct
    ``text_col``, returning the surviving FULL rows as a Dataset.

    One-pass shape: every row moves once into a coarse hash bucket
    (128-bit content key, B size-derived) and each bucket keeps its
    per-text minimum — this is the one genuinely input-sized shuffle in a
    curation pipeline (SCALE.md), unavoidable because surviving rows must
    be materialized downstream; the alternative (survivor-id semi-join)
    needs a corpus-sized broadcast."""
    from q_digest_ray.functions.hashing import content_key128
    from q_digest_ray.stages.partitioning import derive_buckets

    B = num_buckets or derive_buckets(ds)

    def add_key(batch: pa.Table) -> pa.Table:
        h1, h2, bucket = content_key128(batch[text_col], B)
        return (
            batch.append_column("__h1", pa.array(h1))
            .append_column("__h2", pa.array(h2))
            .append_column("__bucket", pa.array(bucket))
        )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby(["__h1", "__h2"], sort=False)[id_col].idxmin()
        return g.loc[idx].drop(columns=["__h1", "__h2", "__bucket"])

    return (
        ds.map_batches(add_key, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(keep_min, batch_format="pandas")
    )


def curate_corpus(
    ds,
    out_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    min_quality: float = 0.3,
    partition_col: str = "lang",
    num_buckets: int | None = None,
) -> dict:
    """The canonical training-data curation pipeline, end to end:

        documents → exact dedup (keep first) → quality score → filter →
        lang-partitioned Parquet export

    Returns funnel counts {n_in, n_after_dedup, n_exported}.  The dedup
    graph executes twice (once for the count, once feeding the export) —
    a diagnostic convenience; callers that only want the sink should call
    ``export_curated(dedup_keep_first(ds, ...), ...)`` directly."""
    n_in = ds.count()
    deduped = dedup_keep_first(ds, id_col, text_col, num_buckets=num_buckets)
    n_after_dedup = deduped.count()
    # consuming the same Dataset again re-executes its lineage — no need
    # to build a second identical graph
    export_curated(deduped, out_dir, min_quality=min_quality, partition_col=partition_col)
    import ray.data

    n_exported = ray.data.read_parquet(out_dir).count()
    return {"n_in": n_in, "n_after_dedup": n_after_dedup, "n_exported": n_exported}
