"""Testdata table readers — always column-pruned at the read."""

from __future__ import annotations

import os

import ray.data


def read_table(
    sf_dir: str,
    name: str,
    columns: list[str] | None = None,
    override_num_blocks: int | None = None,
) -> "ray.data.Dataset":
    """read_parquet with column pruning (only requested columns leave storage).

    Block count defaults to ~1 block per 8 MB of file, clamped to [1, 64]:
    Ray's dynamic SplitBlocks path re-serializes blocks and explodes tiny
    tables into hundreds of micro-blocks (measured 5-10x slowdowns); with
    many production-sized files the count naturally equals the file count.
    """
    path = os.path.join(sf_dir, f"{name}.parquet")
    if override_num_blocks is None:
        size = os.path.getsize(path)
        override_num_blocks = max(1, min(64, size // (8 << 20)))
    return ray.data.read_parquet(
        path, columns=columns, override_num_blocks=override_num_blocks
    )


def read_table_arrow(
    sf_dir: str, name: str, columns: list[str] | None = None, filters=None
):
    """Small-side table as a pyarrow Table (for broadcast joins).

    ``filters`` (DNF, e.g. ``[("vec_id", "==", 0)]``) push row-group /
    dictionary pruning into the parquet read — REQUIRED when fetching a few
    rows from a fact-sized table (a filterless driver read of a big table
    is a scale bug)."""
    import pyarrow.parquet as pq

    return pq.read_table(
        os.path.join(sf_dir, f"{name}.parquet"), columns=columns, filters=filters
    )
