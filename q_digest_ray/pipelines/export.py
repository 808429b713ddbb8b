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
