"""State management: per-partition checkpoint/lineage (re-exported from
pipelines.checkpoint, where the runnable pipeline wiring lives)."""

from q_digest_ray.pipelines.checkpoint import (
    process_shards,
    read_manifest,
    resumable_sketch_build,
    shard_done,
)

__all__ = ["process_shards", "read_manifest", "resumable_sketch_build", "shard_done"]
