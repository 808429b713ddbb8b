"""Reproduce the flagship ds.stats() audit quoted in BASELINE.md §4.

Runs the flagship sketch-build pipeline once warm, once timed, and prints
the per-operator Ray Data stats — the evidence that wall-time is
dominated by useful sketch compute (UDF time), not (de)serialization or
shuffle overhead.  Usage: python tools/stats_audit.py [cc_dir] [rows]
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)
os.environ["PYTHONPATH"] = _REPO + os.pathsep + os.environ.get("PYTHONPATH", "")

import ray


def main():
    cc_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/qdr_cc_pages_bench"
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 500_000
    ray.init(
        address="local",
        num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from q_digest_ray.pipelines.flagship import cc_pages_specs
    from q_digest_ray.sources.cc_pages import read_cc_pages, synthesize
    from q_digest_ray.stages.build import build_sketches
    from q_digest_ray.stages.extract import extract_and_project
    from q_digest_ray.stages.merge import merge_grouped

    synthesize(cc_dir, total_rows=rows, shards=32, seed=42)

    def pipeline():
        ds = read_cc_pages(cc_dir, columns=["url", "html", "lang"])
        ds = ds.map_batches(
            extract_and_project,
            batch_format="pyarrow",
            batch_size=None,
            zero_copy_batch=True,
        )
        return merge_grouped(build_sketches(ds, cc_pages_specs(), batch_size=None))

    pipeline().materialize()  # warm (page cache + worker arenas)
    t0 = time.perf_counter()
    merged = pipeline().materialize()
    wall = time.perf_counter() - t0
    print(f"wall: {wall:.2f}s = {rows / wall:,.0f} docs/s\n")
    print(merged.stats())
    ray.shutdown()


if __name__ == "__main__":
    main()
