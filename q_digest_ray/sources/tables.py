"""Testdata table readers — always column-pruned at the read."""

from __future__ import annotations

import os

import ray.data


def read_table(sf_dir: str, name: str, columns: list[str] | None = None) -> "ray.data.Dataset":
    """read_parquet with column pruning (only requested columns leave storage)."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    return ray.data.read_parquet(path, columns=columns)


def read_table_arrow(sf_dir: str, name: str, columns: list[str] | None = None):
    """Small-side table as a pyarrow Table (for broadcast joins)."""
    import pyarrow.parquet as pq

    return pq.read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)
