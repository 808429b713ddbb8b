"""cc_pages synthesis determinism + the extraction byte-identity invariant
(BASELINE.json input_hint: extract(html) == text byte-identical per url)."""

import json

import pyarrow as pa
import pyarrow.compute as pc

from q_digest_ray.sources.cc_pages import LANGS, generate_shard, synthesize
from q_digest_ray.stages.extract import extract_and_project, extract_text, url_host


def test_schema_and_determinism():
    t1 = generate_shard(0, 500, seed=42)
    t2 = generate_shard(0, 500, seed=42)
    assert t1.schema.names == ["url", "warc_ts", "html", "text", "lang"]
    assert t1.equals(t2)  # fully deterministic
    t3 = generate_shard(1, 500, seed=42)
    assert not t1["url"].equals(t3["url"])  # shards differ


def test_extraction_byte_identity():
    t = generate_shard(0, 1000, seed=42)
    extracted = extract_text(t["html"])
    # byte-identical per row (and hence per url)
    assert pc.all(pc.equal(extracted, t["text"].combine_chunks())).as_py()
    # and as raw bytes, not just string equality
    assert extracted.cast(pa.binary()).equals(
        t["text"].combine_chunks().cast(pa.binary())
    )


def test_duplicates_and_skew_present():
    t = generate_shard(0, 5000, seed=42)
    urls = t["url"].to_pylist()
    assert len(set(urls)) < len(urls)  # ~2% dup rows exist
    langs = t["lang"].to_pylist()
    assert langs.count("en") / len(langs) > 0.3  # skewed langs
    hosts = url_host(t["url"]).to_pylist()
    top_host = max(set(hosts), key=hosts.count)
    assert hosts.count(top_host) / len(hosts) > 0.02  # Zipf-hot host


def test_dup_rows_keep_invariant():
    # duplicated urls must still satisfy extract(html) == text per url
    t = generate_shard(0, 3000, seed=42)
    df = t.select(["url", "text"]).to_pandas()
    per_url = df.groupby("url")["text"].nunique()
    assert (per_url == 1).all()


def test_extract_and_project_stage():
    t = generate_shard(0, 200, seed=42)
    out = extract_and_project(t)
    assert "html" not in out.column_names  # heavy column projected away
    assert out["text_len"].to_pylist() == [len(x) for x in t["text"].to_pylist()]
    assert out["html_size"].to_pylist() == [len(x) for x in t["html"].to_pylist()]
    assert all(h.endswith(".example.com") for h in out["url_host"].to_pylist())
    assert set(out["lang"].to_pylist()) <= set(LANGS)


def test_synthesize_cached(tmp_path):
    d = str(tmp_path / "cc")
    synthesize(d, total_rows=400, shards=2, seed=42)
    with open(f"{d}/manifest.json") as f:
        m1 = json.load(f)
    synthesize(d, total_rows=400, shards=2, seed=42)  # cache hit, no rewrite
    with open(f"{d}/manifest.json") as f:
        m2 = json.load(f)
    assert m1 == m2
    assert len(m1["shard_digests"]) == 2
