"""Source/sink breadth: partitioned parquet export, JSON/CSV roundtrips."""

import os

import pyarrow.parquet as pq
import pytest


def test_partitioned_export(ray_session, sf_dir, tmp_path):
    import ray.data

    from q_digest_ray.pipelines.export import export_curated

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet")
    out = str(tmp_path / "curated")
    export_curated(ds, out, min_quality=0.0)
    # one directory per lang (hive partitioning)
    parts = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert len(parts) >= 3
    back = ray.data.read_parquet(out)
    assert back.count() == ds.count()
    schema_names = back.schema().names
    assert "quality_score" in schema_names and "n_tokens" in schema_names
    # single-partition read works (resume-by-partition story)
    one = ray.data.read_parquet(os.path.join(out, parts[0]))
    assert 0 < one.count() < back.count()


def test_json_csv_roundtrip(ray_session, sf_dir, tmp_path):
    import ray.data

    ds = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    n = ds.count()
    jdir = str(tmp_path / "j")
    cdir = str(tmp_path / "c")
    ds.write_json(jdir)
    ds.write_csv(cdir)
    jds = ray.data.read_json(jdir)
    cds = ray.data.read_csv(cdir)
    assert jds.count() == n
    assert cds.count() == n
    assert sorted(jds.schema().names) == ["event_id", "user_id", "value"]
    # values survive the roundtrip
    a = jds.to_pandas().sort_values("event_id").reset_index(drop=True)
    b = ds.to_pandas().sort_values("event_id").reset_index(drop=True)
    assert a["user_id"].equals(b["user_id"])


def test_pruned_jsonl_csv_readers(ray_session, sf_dir, tmp_path):
    """sources.read_jsonl / read_csv: column pruning at (or right after)
    the read, values identical to the parquet source."""
    import ray.data

    from q_digest_ray.sources.tables import read_csv, read_jsonl

    src = ray.data.read_parquet(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id", "value"]
    )
    jdir, cdir = str(tmp_path / "j"), str(tmp_path / "c")
    src.write_json(jdir)
    src.write_csv(cdir)

    jds = read_jsonl(jdir, columns=["event_id", "value"])
    cds = read_csv(cdir, columns=["event_id", "value"])
    assert sorted(jds.schema().names) == ["event_id", "value"]
    assert sorted(cds.schema().names) == ["event_id", "value"]
    ref = src.to_pandas().sort_values("event_id").reset_index(drop=True)
    for got in (jds, cds):
        df = got.to_pandas().sort_values("event_id").reset_index(drop=True)
        assert len(df) == len(ref)
        assert (df["value"].round(6) == ref["value"].round(6)).all()
