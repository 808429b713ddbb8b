"""Round-4 regression tests: string SampleSketch, vectorized simhash /
contamination pair emission, pipeline-ized media_features, tokenizer parity."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from q_digest_ray.sketches.sample import SampleSketch


# ---------------------------------------------------------------------------
# SampleSketch string domain (r3 ADVICE item 2)
# ---------------------------------------------------------------------------


def test_sample_sketch_strings_merge_invariance():
    hosts = ["host%d.example.com" % (i % 97) for i in range(2000)]
    whole = SampleSketch(k=32)
    whole.update_batch(pa.array(hosts))
    parts = []
    for lo in range(0, 2000, 311):
        sk = SampleSketch(k=32)
        sk.update_batch(pa.array(hosts[lo : lo + 311]))
        parts.append(sk)
    merged = parts[0]
    for p in parts[1:]:
        merged.merge(p)
    assert list(merged.sample()) == list(whole.sample())
    assert merged.n == whole.n == 2000
    # all sampled values are real inputs
    assert set(whole.sample()) <= set(hosts)
    # KMV estimate in a sane band for 97 distinct at k=32 (~18% rel err 1σ)
    assert 40 < whole.estimate() < 250


def test_sample_sketch_string_serde_roundtrip():
    sk = SampleSketch(k=16)
    sk.update_batch(pa.array(["a", "bb", "", "ccc", None, "dd"]))
    rt = SampleSketch.from_bytes(sk.to_bytes())
    assert list(rt.sample()) == list(sk.sample())
    assert rt.n == sk.n == 5  # null dropped, empty string kept
    assert rt.estimate() == sk.estimate()


def test_sample_sketch_int_wire_unchanged():
    sk = SampleSketch(k=16)
    sk.update_batch(np.arange(100))
    rt = SampleSketch.from_bytes(sk.to_bytes())
    assert (rt.sample() == sk.sample()).all() and rt.sample().dtype == np.int64


def test_sample_sketch_mode_mismatch_raises():
    si = SampleSketch(k=8)
    si.update_batch(np.arange(10))
    ss = SampleSketch(k=8)
    ss.update_batch(pa.array(["x", "y"]))
    with pytest.raises(TypeError):
        si.update_batch(pa.array(["z"]))
    with pytest.raises(TypeError):
        si.merge(ss)
    # empty sketch adopts the other side's domain on merge
    fresh = SampleSketch(k=8)
    fresh.merge(ss)
    assert list(fresh.sample()) == list(ss.sample())


# ---------------------------------------------------------------------------
# vectorized simhash verify (r3 VERDICT item 3): parity vs brute force
# ---------------------------------------------------------------------------


def test_simhash_pairs_match_bruteforce(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.stages.dedup import hamming64, simhash64, simhash_dup_pairs

    rng = np.random.default_rng(11)
    base = ["the quick brown fox jumps over the lazy dog %d" % i for i in range(40)]
    texts = []
    for t in base:
        texts.append(t)
        if rng.random() < 0.5:  # near-dup: one token changed
            toks = t.split()
            toks[rng.integers(len(toks))] = "w%d" % rng.integers(5)
            texts.append(" ".join(toks))
    ids = np.arange(len(texts), dtype=np.int64)
    ds = ray.data.from_arrow(
        pa.table({"doc_id": pa.array(ids), "text": pa.array(texts)})
    )
    got = simhash_dup_pairs(ds, "doc_id", "text", max_hamming=3)

    # brute force: all pairs with hamming <= 3 that share >= 1 16-bit chunk
    sig = simhash64(pa.array(texts))
    expect = set()
    for i in range(len(ids)):
        d = hamming64(np.full(len(ids) - i - 1, sig[i], np.uint64), sig[i + 1 :])
        for j_off in np.flatnonzero(d <= 3):
            expect.add((int(ids[i]), int(ids[i + 1 + j_off])))
    got_pairs = set(zip(got["doc_id_a"], got["doc_id_b"]))
    # pigeonhole: hamming<=3 over 4 chunks guarantees a shared chunk → exact
    assert got_pairs == expect
    assert len(expect) > 0


# ---------------------------------------------------------------------------
# vectorized contamination pair emission (r3 ADVICE item 1)
# ---------------------------------------------------------------------------


def test_contamination_multi_source_keys(ray_session, tmp_path):
    from q_digest_ray.pipelines.queries import cross_source_contamination

    # text shared by 3 sources → 3 pairs; by 2 → 1 pair; unique → none;
    # a second doc repeating (text, source) must not double-count
    rows = [
        ("t-shared3", "s1"),
        ("t-shared3", "s2"),
        ("t-shared3", "s3"),
        ("t-shared3", "s1"),  # duplicate (text, source) — ignored
        ("t-shared2", "s2"),
        ("t-shared2", "s3"),
        ("t-only", "s1"),
    ] + [("filler %d" % i, "s%d" % (i % 3 + 1)) for i in range(50)]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(rows), dtype=np.int64)),
            "text": pa.array([r[0] for r in rows]),
            "source": pa.array([r[1] for r in rows]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    out = cross_source_contamination(str(d), num_buckets=4)
    expect = pd.DataFrame(
        {
            "source_a": ["s1", "s1", "s2"],
            "source_b": ["s2", "s3", "s3"],
            "n_shared": np.array([1, 1, 2], dtype=np.int64),
        }
    )
    pd.testing.assert_frame_equal(out, expect)


# ---------------------------------------------------------------------------
# media_features: fully in-pipeline + layout invariant (r3 VERDICT item 2)
# ---------------------------------------------------------------------------


def test_synth_media_batch_layout_invariant():
    from q_digest_ray.stages.multimodal import synth_media_batch

    whole = synth_media_batch(pa.table({"id": pa.array(np.arange(64))}), seed=7)
    halves = pa.concat_tables(
        [
            synth_media_batch(pa.table({"id": pa.array(np.arange(0, 40))}), seed=7),
            synth_media_batch(pa.table({"id": pa.array(np.arange(40, 64))}), seed=7),
        ]
    )
    assert whole.equals(halves)
    kinds = set(whole["media_type"].to_pylist())
    assert kinds <= {"image", "audio", "video"}


def test_media_features_small_and_deterministic(ray_session):
    from q_digest_ray.pipelines.queries import media_features

    a = media_features("/root/testdata/sf0.001", n_media=120)
    b = media_features("/root/testdata/sf0.001", n_media=120)
    pd.testing.assert_frame_equal(a, b)
    assert list(a["media_type"]) == ["image", "audio"]
    assert list(a["feature_dim"]) == [192, 16]
    assert (a["n"] > 0).all()
    # audio features are the REAL WAV DSP path: a pure sine's norm is
    # dominated by the spectral centroid ~ its frequency band (>> fake's
    # unit-cube features, whose 16-dim norm is < 4)
    assert float(a.loc[a["media_type"] == "audio", "mean_norm"].iloc[0]) > 50


# ---------------------------------------------------------------------------
# tokenizer parity: Ray side and DuckDB oracle share RE2 '\s+' semantics
# ---------------------------------------------------------------------------


def test_top_terms_unicode_whitespace_parity(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import TOP_TERMS_PER_LANG_SQL, top_terms_per_lang

    # U+00A0-joined tokens must be ONE token on both sides
    texts = ["alpha beta gamma", "alpha beta delta", "gamma gamma"]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(3, dtype=np.int64)),
            "lang": pa.array(["en"] * 3),
            "text": pa.array(texts),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = top_terms_per_lang(str(d), k=5)
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(TOP_TERMS_PER_LANG_SQL).df()
    exp["rn"] = exp["rn"].astype("int64")
    exp["cnt"] = exp["cnt"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    assert "alpha beta" in set(got["token"])


# ---------------------------------------------------------------------------
# resumable curate_corpus (r3 VERDICT item 1)
# ---------------------------------------------------------------------------

GOOD_TEXT = (
    "The quick brown fox jumps over the lazy dog while the patient cat "
    "watches from a warm stone wall in the afternoon sun and the words "
    "keep flowing in a perfectly ordinary way for this plain test."
)


def _curation_input(tmp_path, n=60):
    rng = np.random.default_rng(3)
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(n, dtype="int64"),
            "text": [GOOD_TEXT + f" Variant {i % (n - 10)}." for i in range(n)],
            "lang": rng.choice(["en", "de", "fr"], n),
        }
    )
    p = tmp_path / "input.parquet"
    pq.write_table(pa.Table.from_pandas(docs, preserve_index=False), str(p))
    return str(p)


def _tree_files(root):
    import glob
    import os

    return sorted(
        os.path.relpath(f, root)
        for f in glob.glob(os.path.join(root, "*", "*.parquet"))
    )


def test_curate_corpus_kill_and_resume(ray_session, tmp_path):
    import os

    import ray.data

    from q_digest_ray.pipelines.export import curate_corpus

    inp = _curation_input(tmp_path)
    full_dir = str(tmp_path / "full")
    funnel_full = curate_corpus(
        ray.data.read_parquet(inp), full_dir, num_buckets=8
    )
    assert funnel_full["n_buckets_skipped"] == 0

    # "kill": run fully, then erase half the buckets' commits (manifest +
    # partition files) as if those tasks never finished
    res_dir = str(tmp_path / "resumed")
    curate_corpus(ray.data.read_parquet(inp), res_dir, num_buckets=8)
    import glob as g

    manifests = sorted(g.glob(os.path.join(res_dir, "_manifest", "bucket-*.json")))
    assert len(manifests) >= 2
    killed = manifests[:: 2]  # every other bucket "in flight" at the kill
    import json

    n_killed = 0
    for mp in killed:
        entry = json.load(open(mp))
        b = int(entry["bucket"])
        for k in entry["partitions"]:
            fp = os.path.join(res_dir, f"lang={k}", f"bucket-{b:05d}.parquet")
            if os.path.exists(fp):
                os.remove(fp)
        os.remove(mp)
        n_killed += 1

    funnel_res = curate_corpus(
        ray.data.read_parquet(inp), res_dir, num_buckets=8, resume=True
    )
    assert funnel_res["n_buckets_processed"] == n_killed
    assert funnel_res["n_buckets_skipped"] == len(manifests) - n_killed
    for k in ("n_in", "n_after_dedup", "n_exported", "per_partition"):
        assert funnel_res[k] == funnel_full[k], k

    # identical partition trees, byte-identical files
    assert _tree_files(res_dir) == _tree_files(full_dir)
    for rel in _tree_files(full_dir):
        a = open(os.path.join(full_dir, rel), "rb").read()
        b = open(os.path.join(res_dir, rel), "rb").read()
        assert a == b, f"{rel} differs after resume"

    # a second resume has nothing to do and returns the same funnel
    funnel_noop = curate_corpus(
        ray.data.read_parquet(inp), res_dir, num_buckets=8, resume=True
    )
    assert funnel_noop["n_buckets_processed"] == 0
    assert funnel_noop["n_exported"] == funnel_full["n_exported"]
    assert funnel_noop["per_partition"] == funnel_full["per_partition"]


def test_curate_corpus_resume_rejects_changed_input(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.pipelines.export import curate_corpus

    inp = _curation_input(tmp_path)
    out = str(tmp_path / "out")
    curate_corpus(ray.data.read_parquet(inp), out, num_buckets=8)
    # rewrite the input (different bytes/mtime) → resume must refuse
    t = pq.read_table(inp)
    pq.write_table(t.slice(0, 40), inp)
    with pytest.raises(ValueError, match="refusing to resume"):
        curate_corpus(ray.data.read_parquet(inp), out, num_buckets=8, resume=True)
    # ...and changed params must refuse too (restore input first)
    with pytest.raises(ValueError, match="refusing to resume"):
        curate_corpus(
            ray.data.read_parquet(inp), out, num_buckets=16, resume=True
        )


def test_export_dirs_refuse_foreign_content(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.pipelines.export import curate_corpus, export_curated

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype="int64"),
            "text": [GOOD_TEXT + f" V{i}." for i in range(5)],
            "lang": ["en"] * 5,
        }
    )
    foreign = tmp_path / "precious"
    foreign.mkdir()
    (foreign / "keep-me.txt").write_text("do not delete")
    with pytest.raises(ValueError, match="refusing to overwrite"):
        curate_corpus(ray.data.from_pandas(docs), str(foreign))
    with pytest.raises(ValueError, match="refusing to overwrite"):
        export_curated(ray.data.from_pandas(docs), str(foreign))
    assert (foreign / "keep-me.txt").read_text() == "do not delete"

    # but a re-run over this pipeline's OWN output is allowed (marker)
    own = str(tmp_path / "own")
    curate_corpus(ray.data.from_pandas(docs), own)
    funnel = curate_corpus(ray.data.from_pandas(docs), own)  # no raise
    assert funnel["n_exported"] == 5
    own2 = str(tmp_path / "own2")
    export_curated(ray.data.from_pandas(docs), own2, min_quality=0.0)
    export_curated(ray.data.from_pandas(docs), own2, min_quality=0.0)  # no raise


# ---------------------------------------------------------------------------
# streaming minhash group API (r3 VERDICT item 5): parity + sink + empty
# ---------------------------------------------------------------------------


def _near_dup_corpus(seed=5, n_base=50):
    rng = np.random.default_rng(seed)
    texts, ids = [], []
    k = 0
    for i in range(n_base):
        t = (
            "sentence %d about the weather in town %d with many common tokens here"
            % (i, i)
        )
        texts.append(t)
        ids.append(k)
        k += 1
        for r in range(rng.integers(0, 3)):
            toks = t.split()
            toks[rng.integers(len(toks))] = "x%d" % r
            texts.append(" ".join(toks))
            ids.append(k)
            k += 1
    return pa.table(
        {"doc_id": pa.array(np.array(ids, np.int64)), "text": pa.array(texts)}
    )


def test_minhash_streaming_matches_collecting(ray_session):
    import ray.data

    from q_digest_ray.stages.dedup import minhash_dup_groups, minhash_dup_groups_ds

    ds = ray.data.from_arrow(_near_dup_corpus())
    col = (
        minhash_dup_groups(ds, "doc_id", "text", threshold=0.5)
        .sort_values(["group_id", "doc_id"])
        .reset_index(drop=True)
    )
    st = minhash_dup_groups_ds(ds, "doc_id", "text", threshold=0.5).to_pandas()
    st = (
        st.astype({"doc_id": "int64", "group_id": "int64"})
        .sort_values(["group_id", "doc_id"])
        .reset_index(drop=True)
    )
    assert len(col) > 0
    pd.testing.assert_frame_equal(col, st[col.columns.tolist()])


def test_minhash_streaming_parquet_sink(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.stages.dedup import minhash_dup_groups_ds

    ds = ray.data.from_arrow(_near_dup_corpus(seed=9, n_base=30))
    out = str(tmp_path / "groups")
    ret = minhash_dup_groups_ds(ds, "doc_id", "text", threshold=0.5, out_path=out)
    assert ret == out
    back = ray.data.read_parquet(out).to_pandas()
    direct = minhash_dup_groups_ds(ds, "doc_id", "text", threshold=0.5).to_pandas()
    a = back.sort_values(["group_id", "doc_id"]).reset_index(drop=True)
    b = direct.sort_values(["group_id", "doc_id"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b[a.columns.tolist()])


def test_minhash_streaming_no_dups(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.stages.dedup import minhash_dup_groups_ds

    t = pa.table(
        {
            "doc_id": pa.array(np.arange(20, dtype=np.int64)),
            "text": pa.array(
                ["utterly unique document %d %d" % (i, i * 7919) for i in range(20)]
            ),
        }
    )
    out = minhash_dup_groups_ds(
        ray.data.from_arrow(t), "doc_id", "text", threshold=0.9
    ).to_pandas()
    assert len(out) == 0
    # the parquet sink keeps the declared schema even for dup-free input
    # (Ray itself drops empty-block schemas, so the Dataset return can't)
    sink = str(tmp_path / "empty_groups")
    minhash_dup_groups_ds(
        ray.data.from_arrow(t), "doc_id", "text", threshold=0.9, out_path=sink
    )
    back = pq.read_table(sink + "/part-00000.parquet")
    assert back.num_rows == 0
    assert back.schema.names == ["doc_id", "group_id", "jaccard_to_root"]


# ---------------------------------------------------------------------------
# flagship exercises all eleven sketch families (r3 VERDICT missing item 3;
# DDSketch + Count-Sketch added in r5)
# ---------------------------------------------------------------------------


def test_flagship_covers_all_eleven_families(ray_session):
    from q_digest_ray.pipelines.flagship import (
        cc_pages_specs,
        documents_specs,
        run_documents_flagship,
    )

    for specs in (documents_specs(), cc_pages_specs()):
        kinds = {s.kind for s in specs}
        assert kinds == {
            "qdigest",
            "tdigest",
            "kll",
            "dds",
            "hll",
            "cms",
            "csk",
            "bloom",
            "kmv",
            "mg",
            "sample",
        }
    df = run_documents_flagship("/root/testdata/sf0.001")
    by_metric = dict(df.groupby("metric")["stat"].apply(list))
    assert "distinct_estimate" in by_metric["distinct_text_kmv"]
    assert "top_count" in by_metric["lang_mg"]
    assert "sample_held" in by_metric["doc_sample"]
    n = df[(df["metric"] == "doc_sample") & (df["stat"] == "n")]["value"].iloc[0]
    assert n == 500  # sf0.001 documents row count


# ---------------------------------------------------------------------------
# new r4 sketch queries: rank-error harness + grouped-KMV vocab overlap
# ---------------------------------------------------------------------------


def test_sk_rank_error_within_bound(ray_session):
    from q_digest_ray.pipelines.queries import (
        nchars_quantiles_by_lang,
        sk_rank_error_by_lang,
    )

    sf = "/root/testdata/sf0.001"
    harness = sk_rank_error_by_lang(sf)
    assert len(harness) > 0
    # the Q-Digest guarantee: rank error <= log2(universe)/k = 16/256
    assert (harness["rank_err"] <= 16 / 256).all()
    # the harness's own exact column must agree with the oracle-backed
    # exact-quantile query
    exact = nchars_quantiles_by_lang(sf).set_index("lang")
    for (lang, p), g in harness.groupby(["lang", "p"]):
        col = {0.5: "p50", 0.9: "p90", 0.99: "p99"}[p]
        assert int(g["exact"].iloc[0]) == int(exact.loc[lang, col])


def test_sk_vocab_overlap_planted(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.stages.build import SketchSpec, build_sketches
    from q_digest_ray.stages.merge import collect_sketches, merge_grouped

    # vocab A = w0..w99; vocab B = w50..w149 → true Jaccard = 50/150
    docs = []
    for i in range(100):
        docs.append(("A", "w%d" % i))
        docs.append(("B", "w%d" % (i + 50)))
    t = pa.table(
        {
            "source": pa.array([d[0] for d in docs]),
            "token": pa.array([d[1] for d in docs]),
        }
    )
    rows = build_sketches(
        ray.data.from_arrow(t),
        [SketchSpec("vocab", "token", "kmv", {"k": 512}, group_by="source")],
    )
    sks = collect_sketches(merge_grouped(rows))
    ja = sks[("vocab", "A")].jaccard_estimate(sks[("vocab", "B")])
    # k=512 >= distinct(150): the KMV holds every hash → estimate is exact
    assert abs(ja - 50 / 150) < 1e-9


def test_sk_vocab_overlap_query_runs(ray_session):
    from q_digest_ray.pipelines.queries import sk_source_vocab_overlap

    out = sk_source_vocab_overlap("/root/testdata/sf0.001")
    n_src = len(set(out["source_a"]) | set(out["source_b"]))
    assert len(out) == n_src * (n_src - 1) // 2
    assert ((out["jaccard_est"] >= 0) & (out["jaccard_est"] <= 1)).all()


# ---------------------------------------------------------------------------
# paragraph-level dedup (RefinedWeb-style curation op, new in r4)
# ---------------------------------------------------------------------------


PARA_DOCS = [
    "para A\n\npara B\n\npara C",
    "para B\n\npara D",          # B dups doc0 → only D survives
    "para A\n\npara A",          # both paragraphs dup → doc drops out
    "para E",
    "para C\n\npara E\n\npara F",  # C, E dup → keeps F
    None,                          # null text excluded
]


def _para_oracle(docs: pd.DataFrame) -> pd.DataFrame:
    import duckdb

    from q_digest_ray.pipelines.queries import PARAGRAPH_DEDUP_SQL

    con = duckdb.connect()
    con.register("documents", docs)
    exp = con.sql(PARAGRAPH_DEDUP_SQL).df()
    for c in ("doc_id", "n_paras_in", "n_paras_kept"):
        exp[c] = exp[c].astype("int64")
    return exp.reset_index(drop=True)


@pytest.mark.parametrize("num_buckets", [2, 8])
def test_paragraph_dedup_matches_duckdb(ray_session, num_buckets):
    import ray.data

    from q_digest_ray.stages.dedup import paragraph_dedup

    docs = pd.DataFrame(
        {"doc_id": np.arange(len(PARA_DOCS), dtype="int64"), "text": PARA_DOCS}
    )
    got = (
        paragraph_dedup(
            ray.data.from_pandas(docs), "doc_id", "text", num_buckets=num_buckets
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_paras_in", "n_paras_kept"):
        got[c] = got[c].astype("int64")
    exp = _para_oracle(docs)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)
    # doc 2 (all paragraphs duplicated) must vanish entirely
    assert 2 not in set(got["doc_id"])


def test_paragraph_dedup_larger_random_corpus(ray_session):
    import ray.data

    from q_digest_ray.stages.dedup import paragraph_dedup

    rng = np.random.default_rng(13)
    pool = ["the cat sat", "a dog ran", "rain fell hard", "sun rose early",
            "wind blew cold", "birds sang loud", "waves hit rocks",
            "stars shone bright"]
    texts = [
        "\n\n".join(rng.choice(pool, size=rng.integers(1, 5)))
        for _ in range(80)
    ]
    docs = pd.DataFrame(
        {"doc_id": np.arange(80, dtype="int64"), "text": texts}
    )
    got = (
        paragraph_dedup(ray.data.from_pandas(docs), "doc_id", "text", num_buckets=4)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    for c in ("doc_id", "n_paras_in", "n_paras_kept"):
        got[c] = got[c].astype("int64")
    exp = _para_oracle(docs)
    pd.testing.assert_frame_equal(got[exp.columns.tolist()], exp)
    # every distinct paragraph survives exactly once across the corpus
    kept = "\n\n".join(got["text"]).split("\n\n")
    assert sorted(set(kept)) == sorted(kept)
    assert set(kept) == set(p for t in texts for p in t.split("\n\n"))


# ---------------------------------------------------------------------------
# embedding cluster assignment (SemDeDup-style cluster-curation shape)
# ---------------------------------------------------------------------------


def test_embedding_cluster_sizes(ray_session):
    import pyarrow.parquet as pq2

    from q_digest_ray.pipelines.queries import embedding_cluster_sizes

    sf = "/root/testdata/sf0.001"
    a = embedding_cluster_sizes(sf, num_centroids=8)
    b = embedding_cluster_sizes(sf, num_centroids=8)
    pd.testing.assert_frame_equal(a, b)  # deterministic
    n_rows = pq2.read_metadata(sf + "/embeddings.parquet").num_rows
    assert int(a["n"].sum()) == n_rows  # every vector assigned exactly once
    assert ((a["mean_cos_to_centroid"] > -1) & (a["mean_cos_to_centroid"] <= 1)).all()
    assert a["cluster"].is_unique


# ---------------------------------------------------------------------------
# r4 batch 2: conditional aggregate (q14 shape), repetition signal,
# ordered window cumulative sum
# ---------------------------------------------------------------------------


def test_repetition_stats_crafted_corpus(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import REPETITION_STATS_SQL, repetition_stats

    texts = [
        "a a a b",            # 4 tokens, 2 distinct
        "x y z",              # 3 tokens, 3 distinct
        "w w w",         # U+00A0 is NOT a separator: 2 tokens, 2 distinct
        None,                 # drops out on both sides
        "",                   # empty-token-only doc drops out on both sides
        "Q q",                # case-folds to one distinct
    ]
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(len(texts), dtype=np.int64)),
            "lang": pa.array(["en", "en", "de", "en", "de", "en"]),
            "text": pa.array(texts),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "documents.parquet"))
    got = repetition_stats(str(d))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(REPETITION_STATS_SQL).df()
    for c in ("total_tokens", "distinct_tokens", "n_docs"):
        exp[c] = exp[c].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    en = got[got["lang"] == "en"].iloc[0]
    assert en["total_tokens"] == 9 and en["distinct_tokens"] == 6  # a,b + x,y,z + q
    assert en["n_docs"] == 3


def test_cumulative_spend_window_semantics(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import CUMULATIVE_SPEND_SQL, cumulative_spend

    # two customers; same-date ties broken by o_orderkey; exact cents
    t = pa.table(
        {
            "o_orderkey": pa.array([5, 1, 3, 2, 4], type=pa.int64()),
            "o_custkey": pa.array([7, 7, 7, 9, 9], type=pa.int64()),
            "o_orderstatus": pa.array(["O"] * 5),
            "o_totalprice": pa.array([10.05, 1.10, 2.20, 100.00, 0.01]),
            "o_orderdate": pa.array(
                pd.to_datetime(
                    ["2001-01-02", "2001-01-02", "2001-01-01", "2000-06-01", "2000-06-02"]
                )
            ),
            "o_orderpriority": pa.array(["1-URGENT"] * 5),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(t, str(d / "orders.parquet"))
    got = cumulative_spend(str(d), num_buckets=4)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    exp = con.sql(CUMULATIVE_SPEND_SQL).df()
    exp["o_orderkey"] = exp["o_orderkey"].astype("int64")
    exp["o_custkey"] = exp["o_custkey"].astype("int64")
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    # customer 7: date 01-01 first, then the 01-02 tie resolved key 1 < 5
    c7 = got[got["o_custkey"] == 7]
    assert list(c7["o_orderkey"]) == [3, 1, 5]
    assert list(c7["cum_spend"]) == [2.20, 3.30, 13.35]
    # bucket-count invariance
    got2 = cumulative_spend(str(d), num_buckets=2)
    pd.testing.assert_frame_equal(got, got2)


def test_promo_revenue_inner_join_guard(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import PROMO_REVENUE_SQL, promo_revenue_by_month

    part = pa.table(
        {
            "p_partkey": pa.array([1, 2], type=pa.int64()),
            "p_name": pa.array(["n1", "n2"]),
            "p_brand": pa.array(["B1", "B2"]),
            "p_type": pa.array(["PROMO", "STANDARD"]),
            "p_size": pa.array([1, 2], type=pa.int64()),
            "p_retailprice": pa.array([1.0, 2.0]),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),
            "l_partkey": pa.array([1, 2, 99, 1], type=pa.int64()),  # 99 absent
            "l_extendedprice": pa.array([100.00, 50.00, 10.00, 20.00]),
            "l_discount": pa.array([0.10, 0.00, 0.00, 0.05]),
            "l_shipdate": pa.array(
                pd.to_datetime(["2000-01-05", "2000-01-20", "2000-01-21", "2000-02-01"])
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(part, str(d / "part.parquet"))
    pq.write_table(li, str(d / "lineitem.parquet"))
    got = promo_revenue_by_month(str(d))
    con = duckdb.connect()
    for name in ("part", "lineitem"):
        con.sql(
            f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{d}/{name}.parquet')"
        )
    exp = con.sql(PROMO_REVENUE_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True)
    )
    # partkey 99 contributed nothing; Jan promo share = 90/140
    jan = got[got["ship_month"] == "2000-01"].iloc[0]
    assert jan["total_revenue"] == 140.0 and jan["promo_revenue"] == 90.0


# ---------------------------------------------------------------------------
# JSON extraction / normalization dedup / bigrams / stratified sample
# ---------------------------------------------------------------------------


def test_props_value_by_type_missing_keys(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import (
        PROPS_VALUE_BY_TYPE_SQL,
        props_value_by_type,
    )

    ev = pa.table(
        {
            "event_type": pa.array(["a", "a", "a", "b", "b", "c"]),
            "props": pa.array(
                [
                    '{"k": 5}',
                    '{"k": 10}',
                    '{"other": 1}',  # no k -> excluded from sum/avg
                    '{"k":7}',  # no space after colon still matches \s*
                    None,  # NULL props
                    '{"x": 2}',  # type with zero k values -> avg NULL
                ]
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, str(d / "events.parquet"))
    got = props_value_by_type(str(d))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    exp = con.sql(PROPS_VALUE_BY_TYPE_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    a = got[got["event_type"] == "a"].iloc[0]
    assert a["n_events"] == 3 and a["n_with_k"] == 2 and a["sum_k"] == 15
    assert got[got["event_type"] == "c"]["avg_k"].isna().all()


def test_normalized_dedup_collapses_case_and_whitespace(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import (
        NORMALIZED_DEDUP_SQL,
        normalized_dedup_by_source,
    )

    docs = pa.table(
        {
            "source": pa.array(["s1"] * 4 + ["s2"] * 3),
            "text": pa.array(
                [
                    "Hello  World",
                    "hello world",  # dup of above after normalize
                    "hello\tworld",  # tab run also collapses -> dup
                    "distinct one",
                    "Foo",
                    None,  # excluded on both sides
                    "foo",  # dup of "Foo"
                ]
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = normalized_dedup_by_source(str(d))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(NORMALIZED_DEDUP_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    s1 = got[got["source"] == "s1"].iloc[0]
    assert s1["n_docs"] == 4 and s1["n_distinct_norm"] == 2
    s2 = got[got["source"] == "s2"].iloc[0]
    assert s2["n_docs"] == 2 and s2["n_distinct_norm"] == 1
    # bucket-count invariance
    pd.testing.assert_frame_equal(got, normalized_dedup_by_source(str(d), num_buckets=2))


def test_top_bigrams_doc_boundaries_and_trim(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import TOP_BIGRAMS_SQL, top_bigrams

    docs = pa.table(
        {
            "text": pa.array(
                [
                    "  the cat sat  ",  # edge whitespace must not make '' tokens
                    "the cat ran",
                    "cat THE cat",  # lowercased: contributes 'cat the', 'the cat'
                    "solo",  # single token -> no pairs
                    "",  # empty doc -> no pairs
                    None,  # null doc
                ]
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = top_bigrams(str(d))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(TOP_BIGRAMS_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # 'the cat' appears 3x; crucially "sat" (doc 1 end) + "the" (doc 2 start)
    # must NOT form a cross-document bigram
    assert got.iloc[0]["bigram"] == "the cat" and got.iloc[0]["cnt"] == 3
    assert "sat the" not in set(got["bigram"])
    # bucket-count invariance
    pd.testing.assert_frame_equal(got, top_bigrams(str(d), num_buckets=2))


def test_stratified_sample_deterministic_and_partition_invariant(
    ray_session, tmp_path
):
    import duckdb

    from q_digest_ray.pipelines.queries import STRATIFIED_SAMPLE_SQL, stratified_sample

    rng = np.random.default_rng(7)
    n = 500
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "lang": pa.array([f"l{i}" for i in rng.integers(0, 3, n)]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = stratified_sample(str(d))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(STRATIFIED_SAMPLE_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    assert (got.groupby("lang").size() == 10).all()
    # rewriting the table as many small row groups (different block layout)
    # must yield the identical sample: the key is a pure function of doc_id
    d2 = tmp_path / "sf2"
    d2.mkdir()
    pq.write_table(docs, str(d2 / "documents.parquet"), row_group_size=37)
    pd.testing.assert_frame_equal(got, stratified_sample(str(d2)))


def test_band_count_join_boundaries_and_replication(ray_session):
    import ray as _ray

    from q_digest_ray.stages.join import band_count_join

    # coarse=2, band=10 -> bucket width 20; keys straddle bucket boundaries
    left = _ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array([1, 2, 3, 4], pa.int64()),
                "k": pa.array([0, 19, 40, 100], pa.int64()),
            }
        )
    )
    right = _ray.data.from_arrow(
        pa.table(
            {
                # 10: exactly +band of id1 (inclusive); 29: exactly +10 of
                # 19, in bucket 1 while id2 is in bucket 0 (replication
                # down); 9,9: duplicate keys, both within 10 of ids 1 and 2;
                # 30: +11 from 19 -> excluded; 50: exactly +10 of 40
                "k": pa.array([10, 29, 9, 9, 30, 50], pa.int64()),
            }
        )
    )
    out = (
        band_count_join(left, right, on="k", band=10, id_col="id", coarse=2)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    # brute force
    lk = {1: 0, 2: 19, 3: 40, 4: 100}
    rk = [10, 29, 9, 9, 30, 50]
    expect = {i: sum(abs(v - k) <= 10 for v in rk) for i, k in lk.items()}
    assert dict(zip(out["id"], out["n_matches"])) == expect
    assert expect[4] == 0  # zero-match left rows still appear
    # coarse is a partitioning knob, not a semantic one
    out64 = (
        band_count_join(left, right, on="k", band=10, id_col="id", coarse=64)
        .to_pandas()
        .sort_values("id")
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(out, out64)


def test_band_count_join_randomized_vs_bruteforce(ray_session):
    import ray as _ray

    from q_digest_ray.stages.join import band_count_join

    rng = np.random.default_rng(11)
    lk = rng.integers(-500, 500, 300)
    rk = rng.integers(-500, 500, 400)
    left = _ray.data.from_arrow(
        pa.table(
            {
                "id": pa.array(np.arange(300, dtype=np.int64)),
                "k": pa.array(lk.astype(np.int64)),
            }
        )
    )
    right = _ray.data.from_arrow(pa.table({"k": pa.array(rk.astype(np.int64))}))
    for band, coarse in ((7, 3), (25, 64)):
        out = (
            band_count_join(left, right, on="k", band=band, id_col="id", coarse=coarse)
            .to_pandas()
            .sort_values("id")
            .reset_index(drop=True)
        )
        brute = (np.abs(rk[None, :] - lk[:, None]) <= band).sum(axis=1)
        assert out["n_matches"].to_numpy().tolist() == brute.tolist()


def test_value_band_join_matches_duckdb(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import VALUE_BAND_JOIN_SQL, value_band_join

    rng = np.random.default_rng(3)
    n = 600
    ev = pa.table(
        {
            "event_id": pa.array(np.arange(n, dtype=np.int64)),
            "event_type": pa.array(
                [["purchase", "view", "click"][i] for i in rng.integers(0, 3, n)]
            ),
            "value": pa.array(np.round(rng.uniform(0, 30, n), 2)),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, str(d / "events.parquet"))
    got = value_band_join(str(d))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS SELECT * FROM read_parquet('{d}/events.parquet')")
    exp = con.sql(VALUE_BAND_JOIN_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    assert got["n_close_views"].sum() > 0


def test_tfidf_top_terms_known_corpus(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import TFIDF_TOP_TERMS_SQL, tfidf_top_terms

    docs = pa.table(
        {
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "text": pa.array(
                [
                    "apple apple banana common",
                    "banana common common",
                    "cherry common",
                    None,  # null doc still counts toward N, scores nothing
                ]
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = tfidf_top_terms(str(d))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(TFIDF_TOP_TERMS_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # doc 1: 'apple' df=1 tf=2 -> 2*ln(4) dominates; 'common' df=3 scores least
    d1 = got[got["doc_id"] == 1]
    assert list(d1["token"]) == ["apple", "banana", "common"]
    assert abs(d1.iloc[0]["score"] - 2 * np.log(4.0)) < 1e-6
    # doc 3: 'cherry' df=1 beats 'common'
    assert got[got["doc_id"] == 3].iloc[0]["token"] == "cherry"
    assert 4 not in set(got["doc_id"])
    # bucket invariance (df and per-doc top-k both survive re-bucketing)
    pd.testing.assert_frame_equal(got, tfidf_top_terms(str(d), num_buckets=2))


def test_scrub_stats_known_corpus(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import SCRUB_STATS_SQL, scrub_stats

    docs = pa.table(
        {
            "lang": pa.array(["en", "en", "fr", None, "fr"]),
            "text": pa.array(
                [
                    "a the cat a",  # 3 matches (a, the, a)
                    "theatre and data",  # 0: 'the' embedded, \b guards
                    "the a",  # 2
                    "a the",  # excluded: null lang
                    None,  # excluded: null text
                ]
            ),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = scrub_stats(str(d))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(SCRUB_STATS_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    en = got[got["lang"] == "en"].iloc[0]
    assert en["n_docs"] == 2 and en["n_docs_scrubbed"] == 1
    assert en["n_redactions"] == 3
    # 'a the cat a' (11 chars) -> '<SCRUB> <SCRUB> cat <SCRUB>' (27)
    assert en["chars_before"] == 11 + 16 and en["chars_after"] == 27 + 16
    fr = got[got["lang"] == "fr"].iloc[0]
    assert fr["n_docs"] == 1 and fr["n_redactions"] == 2


def test_rollup_revenue_known_orders(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import ROLLUP_REVENUE_SQL, rollup_revenue

    orders = pa.table(
        {
            "o_orderpriority": pa.array(["1-URGENT", "1-URGENT", "2-HIGH", "2-HIGH"]),
            "o_orderdate": pa.array(
                pd.to_datetime(
                    ["2023-01-05", "2024-06-01", "2023-03-02", "2023-07-09"]
                )
            ),
            # 2-decimal money per the fixedpoint contract (orders data is
            # cents-exact; .005 ties are DECIMAL-vs-rint divergent by design)
            "o_totalprice": pa.array([10.25, 20.50, 5.12, 4.88], pa.float64()),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(orders, str(d / "orders.parquet"))
    got = rollup_revenue(str(d))
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS SELECT * FROM read_parquet('{d}/orders.parquet')")
    exp = con.sql(ROLLUP_REVENUE_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # level structure: 3 fine cells + 2 priority subtotals + 1 grand total
    assert list(got["grouping_id"].value_counts().sort_index().items()) == [
        (0, 3),
        (1, 2),
        (3, 1),
    ]
    total = got[got["grouping_id"] == 3].iloc[0]
    assert total["n_orders"] == 4 and total["priority"] is None
    assert total["revenue"] == pytest.approx(40.75)
    # each priority subtotal equals the sum of its fine cells
    for pr, g in got[got["grouping_id"] == 0].groupby("priority"):
        sub = got[(got["grouping_id"] == 1) & (got["priority"] == pr)].iloc[0]
        assert sub["n_orders"] == g["n_orders"].sum()
        assert sub["revenue"] == pytest.approx(g["revenue"].sum())


def test_sk_window_rollup_levels_reconcile(ray_session, tmp_path):
    from q_digest_ray.pipelines.queries import sk_window_rollup

    rng = np.random.default_rng(377)
    n = 6000
    ts = pd.to_datetime("2024-05-01") + pd.to_timedelta(
        rng.integers(0, 72 * 3600, n), unit="s"
    )  # 3 days x 24 hours
    vals = np.round(rng.gamma(4.0, 25.0, n), 2)
    ev = pa.table({"ts": pa.array(ts), "value": pa.array(vals, pa.float64())})
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, str(d / "events.parquet"))
    got = sk_window_rollup(str(d))
    hours = got[got["level"] == "hour"]
    days = got[got["level"] == "day"]
    tot = got[got["level"] == "all"].iloc[0]
    assert len(days) == 3 and len(hours) == 72
    # counts are exact through every merge: hour -> day -> all reconcile
    for day, g in hours.groupby(hours["window"].str[:10]):
        assert days[days["window"] == day]["n"].iloc[0] == g["n"].sum()
    assert tot["n"] == days["n"].sum() == n
    # rolled-up quantiles stay within the q-digest rank bound vs exact
    cents = np.rint(vals * 100).astype(np.int64)
    for p, est in ((0.5, tot["p50_cents"]), (0.9, tot["p90_cents"])):
        rank = np.searchsorted(np.sort(cents), est, side="right")
        assert abs(rank / n - p) < 0.05, (p, est, rank / n)


def test_global_sort_ranks_known_and_partition_invariant(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import (
        GLOBAL_SORT_RANKS_SQL,
        global_sort_ranks,
    )

    rng = np.random.default_rng(11)
    n = 500
    # heavy ties so partition boundaries fall ON duplicated keys
    nchars = rng.integers(10, 40, n).astype(np.int64)
    docs = pa.table(
        {
            "doc_id": pa.array(np.arange(n, dtype=np.int64)),
            "n_chars": pa.array(nchars),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(docs, str(d / "documents.parquet"))
    got = global_sort_ranks(str(d))
    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{d}/documents.parquet')"
    )
    exp = con.sql(GLOBAL_SORT_RANKS_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    assert list(got["global_rank"]) == list(range(1, n + 1))
    # cut count must not affect the result (only partition sizes)
    for p in (3, 64):
        pd.testing.assert_frame_equal(got, global_sort_ranks(str(d), num_partitions=p))


def test_bloom_prune_join_exact_vs_oracle(ray_session, tmp_path):
    import duckdb

    from q_digest_ray.pipelines.queries import BLOOM_PRUNE_JOIN_SQL, bloom_prune_join

    orders = pa.table(
        {
            "o_orderkey": pa.array([1, 2, 3, 4], pa.int64()),
            "o_totalprice": pa.array([500000.0, 100.0, 400000.0, 399999.99]),
        }
    )
    li = pa.table(
        {
            "l_orderkey": pa.array([1, 1, 2, 3, 4, 9], pa.int64()),
            "l_returnflag": pa.array(["A", "R", "A", "N", "A", "A"]),
            "l_extendedprice": pa.array([100.0, 200.0, 50.0, 10.0, 5.0, 7.0]),
            "l_discount": pa.array([0.10, 0.00, 0.05, 0.25, 0.0, 0.0]),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(orders, str(d / "orders.parquet"))
    pq.write_table(li, str(d / "lineitem.parquet"))
    got = bloom_prune_join(str(d))
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{d}/{t}.parquet')")
    exp = con.sql(BLOOM_PRUNE_JOIN_SQL).df()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True), exp.reset_index(drop=True), check_dtype=False
    )
    # orders 1 (500k) and 3 (400k, >= boundary) qualify; 4 misses by 1 cent;
    # lineitem key 9 has no order at all — Bloom may pass it, the exact
    # semi join must drop it
    assert set(got["l_returnflag"]) == {"A", "N", "R"}
    a = got[got["l_returnflag"] == "A"].iloc[0]
    assert a["n_items"] == 1 and a["revenue"] == pytest.approx(90.0)


def test_sk_incremental_build_reconciles(ray_session, tmp_path):
    from q_digest_ray.pipelines.queries import sk_incremental_build

    rng = np.random.default_rng(42)
    n = 8000
    ts = pd.to_datetime("2024-03-01") + pd.to_timedelta(
        rng.integers(0, 30 * 24 * 3600 - 1, n), unit="s"
    )
    ev = pa.table(
        {
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, 300, n).astype(np.int64)),
            "value": pa.array(np.round(rng.gamma(3.0, 20.0, n), 2)),
        }
    )
    d = tmp_path / "sf"
    d.mkdir()
    pq.write_table(ev, str(d / "events.parquet"))
    got = sk_incremental_build(str(d))
    inc = got[got["method"] == "incremental"].iloc[0]
    full = got[got["method"] == "full"].iloc[0]
    # counts are exact through serialize -> restore -> delta merge
    assert inc["n"] == full["n"] == n
    # HLL register merge is order-independent: estimates agree exactly
    assert inc["distinct_users_est"] == full["distinct_users_est"]
    exact_users = ev["user_id"].to_pandas().nunique()
    assert abs(inc["distinct_users_est"] - exact_users) / exact_users < 0.10
    # both paths' quantiles stay within the q-digest rank bound vs exact
    cents = np.rint(ev["value"].to_numpy() * 100).astype(np.int64)
    s = np.sort(cents)
    for r in (inc, full):
        for p, est in ((0.5, r["p50_cents"]), (0.9, r["p90_cents"])):
            rank = np.searchsorted(s, est, side="right")
            assert abs(rank / n - p) < 0.06, (r["method"], p, est, rank / n)
