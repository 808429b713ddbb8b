"""Checkpoint/resume: kill-and-resume produces identical output; finished
shards are skipped; input changes invalidate their shard only."""

import json
import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from q_digest_ray.pipelines.checkpoint import (
    process_shards,
    read_manifest,
    resumable_sketch_build,
    shard_done,
)
from q_digest_ray.sources.cc_pages import synthesize


@pytest.fixture(scope="module")
def cc_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cc"))
    synthesize(d, total_rows=1200, shards=6, seed=42)
    return d


def _shard_paths(cc_dir):
    return sorted(
        os.path.join(cc_dir, f) for f in os.listdir(cc_dir) if f.endswith(".parquet")
    )


def make_double_fn():
    # nested def → cloudpickle serializes by VALUE, so Ray workers don't
    # need the test module importable
    def double_fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return pa.table(
            {"url": t["url"], "n2": pc.multiply(pc.binary_length(t["html"]), 2)}
        )

    return double_fn


double_fn = make_double_fn()


def test_clean_run_writes_manifest(ray_session, cc_dir, tmp_path):
    out = str(tmp_path / "out")
    stats = process_shards(_shard_paths(cc_dir), out, double_fn, columns=["url", "html"])
    assert stats == {"processed": 6, "skipped": 0, "total": 6}
    m = read_manifest(out)
    assert len(m) == 6
    assert all(e["rows_in"] == e["rows_out"] == 200 for e in m)
    assert all(e["output_sha256"] for e in m)
    # rerun: everything skipped, outputs untouched
    mtimes = {f: os.path.getmtime(os.path.join(out, f)) for f in os.listdir(out) if f.endswith(".parquet")}
    stats2 = process_shards(_shard_paths(cc_dir), out, double_fn, columns=["url", "html"])
    assert stats2 == {"processed": 0, "skipped": 6, "total": 6}
    for f, t in mtimes.items():
        assert os.path.getmtime(os.path.join(out, f)) == t


def test_kill_and_resume_identical(ray_session, cc_dir, tmp_path):
    paths = _shard_paths(cc_dir)
    clean_dir = str(tmp_path / "clean")
    process_shards(paths, clean_dir, double_fn, columns=["url", "html"])

    crash_dir = str(tmp_path / "crash")
    poison_url = pq.read_table(paths[3], columns=["url"])["url"][0].as_py()
    inner = make_double_fn()

    def crashing_fn(t: pa.Table) -> pa.Table:
        # deterministic failure on one shard, identified by its first url
        if t["url"][0].as_py() == poison_url:
            raise RuntimeError("injected crash")
        return inner(t)

    with pytest.raises(Exception):
        process_shards(paths, crash_dir, crashing_fn, columns=["url", "html"])
    done_before = [i for i in range(6) if shard_done(crash_dir, i, paths[i])]
    assert 0 < len(done_before) < 6  # partial progress survived the crash

    # resume with the healthy fn: only unfinished shards run
    stats = process_shards(paths, crash_dir, double_fn, columns=["url", "html"])
    assert stats["skipped"] == len(done_before)
    assert stats["processed"] == 6 - len(done_before)

    # final outputs byte-identical to the clean run
    for i in range(6):
        a = pq.read_table(os.path.join(clean_dir, f"part-{i:05d}.parquet"))
        b = pq.read_table(os.path.join(crash_dir, f"part-{i:05d}.parquet"))
        assert a.equals(b), i


def test_input_change_invalidates_shard(ray_session, cc_dir, tmp_path):
    paths = _shard_paths(cc_dir)
    out = str(tmp_path / "out")
    process_shards(paths, out, double_fn, columns=["url", "html"])
    # touch one input → only that shard reprocesses
    os.utime(paths[2])
    stats = process_shards(paths, out, double_fn, columns=["url", "html"])
    assert stats == {"processed": 1, "skipped": 5, "total": 6}


def test_resumable_flagship(ray_session, cc_dir, tmp_path):
    out = str(tmp_path / "sk")
    result, stats = resumable_sketch_build(cc_dir, out)
    assert stats["processed"] == 6
    n = result.query("metric == 'text_len_qdigest' and stat == 'n'")["value"].iloc[0]
    assert int(n) == 1200
    # resume path: no shard re-runs, same result
    result2, stats2 = resumable_sketch_build(cc_dir, out)
    assert stats2 == {"processed": 0, "skipped": 6, "total": 6}
    assert result.equals(result2)
