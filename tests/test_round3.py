"""Round-3 regression tests: r2 VERDICT items (distributed Bloom probe,
embedding-LSH degenerate-bucket cap, vectorized winnowing, distributed
dup-group assembly, single-pass curation funnel, gated real audio/video
kernels, public-API block counts) and r2 ADVICE fixes (Int64 join keys,
IVF/LSH tie-breaks, MG weight validation)."""

import glob
import io
import json
import os
import wave

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


# ---------------------------------------------------------------------------
# distributed connected components (VERDICT item 4)
# ---------------------------------------------------------------------------


def test_connected_components_matches_union_find(ray_session):
    import ray.data

    from q_digest_ray.stages.concomp import connected_components
    from q_digest_ray.stages.dedup import _union_groups

    rng = np.random.default_rng(11)
    for n_nodes, n_edges in [(50, 40), (200, 150), (500, 800)]:
        a = rng.integers(0, n_nodes, n_edges)
        b = rng.integers(0, n_nodes, n_edges)
        keep = a != b
        a, b = a[keep], b[keep]
        pairs = pd.DataFrame({"a": a.astype("int64"), "b": b.astype("int64")})
        exp = _union_groups([(int(x), int(y)) for x, y in zip(a, b)])
        got = connected_components(
            ray.data.from_pandas(pairs).repartition(4), num_buckets=8
        ).to_pandas()
        gotd = dict(zip(got["node"], got["label"]))
        assert gotd == exp


def test_connected_components_chain_converges(ray_session):
    # a path graph is the worst case for naive neighbor propagation —
    # the star alternation must converge in O(log^2 n) rounds, not O(n)
    import ray.data

    from q_digest_ray.stages.concomp import connected_components

    n = 400
    pairs = pd.DataFrame(
        {"a": np.arange(1, n, dtype="int64"), "b": np.arange(0, n - 1, dtype="int64")}
    )
    got = connected_components(
        ray.data.from_pandas(pairs), num_buckets=8, max_rounds=24
    ).to_pandas()
    assert len(got) == n and (got["label"] == 0).all()


def test_connected_components_giant_component(ray_session):
    # one 30k-member component (hub + chain segments + random cross links)
    # plus scattered small ones — exercises the hot-center path where the
    # component min accumulates nearly all edges in one bucket segment
    import ray.data

    from q_digest_ray.stages.concomp import connected_components

    rng = np.random.default_rng(5)
    n = 12_000  # big enough to exercise the hot-center path, small enough
    # to keep the suite fast under host load
    a = [np.zeros(n // 2, np.int64), np.arange(1, n, dtype=np.int64)]
    b = [
        rng.integers(1, n, n // 2).astype(np.int64),  # hub spokes
        np.arange(0, n - 1, dtype=np.int64),  # full chain: guarantees connectivity
    ]
    # small separate components in an id range the giant one can't touch
    a.append(np.arange(n + 1, n + 1001, dtype=np.int64))
    b.append(np.arange(n + 1, n + 1001, dtype=np.int64) + 1000)
    pairs = pd.DataFrame({"a": np.concatenate(a), "b": np.concatenate(b)})
    got = connected_components(
        ray.data.from_pandas(pairs).repartition(8), num_buckets=16
    ).to_pandas()
    giant = got[got["node"] <= n]
    assert (giant["label"] == 0).all()
    small = got[got["node"] > n]
    assert len(small) == 2000 and (small["label"] > n).all()
    assert small.groupby("label").size().eq(2).all()


def test_minhash_assembly_driver_vs_distributed(ray_session):
    import ray.data

    from q_digest_ray.stages.dedup import minhash_dup_groups

    rng = np.random.default_rng(3)
    words = [f"w{i}" for i in range(50)]
    texts, ids = [], []
    did = 0
    for i in range(30):
        d = " ".join(rng.choice(words, 40))
        texts.append(d)
        ids.append(did)
        did += 1
        if i < 3:  # three clusters of four near-identical copies
            for _ in range(3):
                toks = d.split()
                toks[rng.integers(0, len(toks))] = "zz"
                texts.append(" ".join(toks))
                ids.append(did)
                did += 1
    ds = ray.data.from_pandas(
        pd.DataFrame({"doc_id": np.array(ids, "int64"), "text": texts})
    ).repartition(4)
    drv = minhash_dup_groups(ds, "doc_id", "text", assembly="driver")
    dist = minhash_dup_groups(ds, "doc_id", "text", assembly="distributed")
    pd.testing.assert_frame_equal(
        drv.reset_index(drop=True), dist.reset_index(drop=True)
    )
    assert len(drv) >= 12  # the three planted clusters survive


# ---------------------------------------------------------------------------
# embedding-LSH degenerate-bucket cap (VERDICT item 2)
# ---------------------------------------------------------------------------


def test_embedding_degenerate_bucket_bounded(ray_session):
    import ray.data

    from q_digest_ray.stages.dedup import embedding_dup_pairs

    # 5k IDENTICAL vectors all land in one bucket per table; the capped
    # chain must finish without O(m^2) pair emission and keep the
    # exact-dup class connected (chain links at cosine 1.0)
    n = 5000
    vec = [1.0, 0.0, 0.5, 0.25]
    df = pd.DataFrame(
        {"id": np.arange(n, dtype="int64"), "vec": [vec] * n}
    )
    out = embedding_dup_pairs(
        ray.data.from_pandas(df).repartition(4),
        "id",
        "vec",
        threshold=0.95,
        num_tables=1,
        max_bucket=256,
    )
    # chain over m identical vectors = m-1 links (per table, deduped)
    assert len(out) == n - 1
    assert (out["cos_sim"] == 1.0).all()
    # links connect the whole class: union of endpoints covers all ids
    assert len(set(out["id_a"]).union(out["id_b"])) == n


# ---------------------------------------------------------------------------
# winnowing vectorization parity (VERDICT item 3)
# ---------------------------------------------------------------------------


def _winnow_reference(texts, k, window):
    """Definitional per-doc implementation (the r2 code, kept as oracle)."""
    import pyarrow.compute as pc

    from q_digest_ray.functions.hashing import hash64, splitmix64

    toks = pc.utf8_split_whitespace(pc.utf8_lower(texts))
    flat_h = hash64(toks.flatten())
    offs = toks.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    offs = offs - offs[0]
    out = []
    for d in range(len(texts)):
        h = flat_h[offs[d] : offs[d + 1]]
        if len(h) < k:
            out.append(np.unique(splitmix64(h)) if len(h) else np.empty(0, np.uint64))
            continue
        m = np.lib.stride_tricks.sliding_window_view(h, k)
        acc = np.zeros(len(m), dtype=np.uint64)
        for j in range(k):
            acc = splitmix64(acc * np.uint64(0x100000001B3) + m[:, j])
        if len(acc) <= window:
            out.append(np.unique(acc))
        else:
            w = np.lib.stride_tricks.sliding_window_view(acc, window)
            out.append(np.unique(w.min(axis=1)))
    return out


@pytest.mark.parametrize("k,window", [(5, 4), (3, 2), (2, 5), (1, 1)])
def test_winnow_vectorized_matches_definition(k, window):
    from q_digest_ray.functions.text import winnow_fingerprints

    rng = np.random.default_rng(7)
    words = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
    texts = [
        " ".join(rng.choice(words, int(L))) if L else ""
        for L in rng.integers(0, 30, 300)
    ]
    texts += ["", "one", "one two three four five six seven eight nine"]
    arr = pa.array(texts, pa.string())
    got = winnow_fingerprints(arr, k=k, window=window)
    exp = _winnow_reference(arr, k=k, window=window)
    assert len(got) == len(exp)
    for x, y in zip(got, exp):
        assert x.dtype == np.uint64
        assert np.array_equal(x, y)


# ---------------------------------------------------------------------------
# jaccard_verify exact integer keys above 2^53 (ADVICE item 1)
# ---------------------------------------------------------------------------


def test_jaccard_verify_ids_above_2_53(ray_session):
    import ray.data

    from q_digest_ray.stages.dedup import jaccard_verify

    # adjacent huge ids are equal as float64 — a float-key merge would
    # attach the wrong text to one of them
    base = 1 << 53
    corpus = pd.DataFrame(
        {
            "doc_id": np.array([base + 1, base + 2, base + 3], "int64"),
            "text": [
                "aa bb cc dd ee ff",
                "zz yy xx ww vv uu",
                "aa bb cc dd ee ff",
            ],
        }
    )
    pairs = pd.DataFrame(
        {
            "a": np.array([base + 1, base + 1], "int64"),
            "b": np.array([base + 2, base + 3], "int64"),
        }
    )
    out = (
        jaccard_verify(
            ray.data.from_pandas(pairs),
            ray.data.from_pandas(corpus),
            "doc_id",
            "text",
            num_buckets=8,
        )
        .to_pandas()
        .sort_values("b")
        .reset_index(drop=True)
    )
    assert len(out) == 2
    assert out.loc[0, "jaccard"] == 0.0  # disjoint texts
    assert out.loc[1, "jaccard"] == 1.0  # identical texts


# ---------------------------------------------------------------------------
# single-pass curation with per-bucket manifests (VERDICT item 5)
# ---------------------------------------------------------------------------


def test_curate_corpus_manifests_match_counts(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.pipelines.export import curate_corpus

    good = (
        "The quick brown fox jumps over the lazy dog while the patient cat "
        "watches from a warm stone wall in the afternoon sun and the words "
        "keep flowing in a perfectly ordinary way for this plain test."
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(25, dtype="int64"),
            "text": [good + f" Variant {i}." for i in range(15)]
            + [good + " Variant 0."] * 5
            + ["!!!"] * 5,
            "lang": ["en"] * 13 + ["de"] * 12,
        }
    )
    out_dir = str(tmp_path / "curated")
    funnel = curate_corpus(ray.data.from_pandas(docs), out_dir, min_quality=0.3)
    assert funnel["n_in"] == 25
    assert funnel["n_after_dedup"] == 16  # 15 variants + 1 junk text
    assert funnel["n_exported"] == 15
    # the per-bucket manifests are the pass's own lineage: sums must equal
    # the returned counts AND the files actually on disk
    manifests = [
        json.load(open(p))
        for p in sorted(glob.glob(os.path.join(out_dir, "_manifest", "bucket-*.json")))
    ]
    assert sum(m["rows_after_dedup"] for m in manifests) == funnel["n_after_dedup"]
    assert sum(m["rows_exported"] for m in manifests) == funnel["n_exported"]
    back = ray.data.read_parquet(
        sorted(glob.glob(os.path.join(out_dir, "lang=*", "*.parquet")))
    ).to_pandas()
    assert len(back) == funnel["n_exported"]
    per_part = {}
    for m in manifests:
        for k, v in m["partitions"].items():
            per_part[k] = per_part.get(k, 0) + v
    assert per_part == funnel["per_partition"]


# ---------------------------------------------------------------------------
# gated real audio / video kernels (VERDICT item 6)
# ---------------------------------------------------------------------------


def _sine_wav(rate=16000, freq=440.0, dur=0.5, amp=0.5) -> bytes:
    ts = np.arange(int(rate * dur)) / rate
    x = (amp * np.sin(2 * np.pi * freq * ts) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(x.tobytes())
    return buf.getvalue()


def test_audio_stage_real_wav_kernel():
    from q_digest_ray.stages.multimodal import AudioFeatureStage

    rate, freq = 16000, 440.0
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media": pa.array([_sine_wav(rate, freq), b"\x00garbage"], pa.binary()),
            "media_type": pa.array(["audio", "audio"]),
        }
    )
    out = AudioFeatureStage()(batch)
    f = np.array(out["features"][0].as_py())
    assert len(f) == AudioFeatureStage.FEATURE_DIM
    assert abs(f[0] - 0.5 / np.sqrt(2)) < 0.01  # rms of a 0.5-amp sine
    assert abs(f[1] - 2 * freq / rate) < 0.005  # zero-crossing rate
    assert abs(f[2] - freq) < 10  # spectral centroid at the tone
    assert len(out["features"][1].as_py()) == AudioFeatureStage.FEATURE_DIM  # fake


def test_audio_stage_strict_raises_on_undecodable():
    from q_digest_ray.stages.multimodal import AudioFeatureStage

    batch = pa.table(
        {
            "media_id": pa.array([7], pa.int64()),
            "media": pa.array([b"not a wav"], pa.binary()),
            "media_type": pa.array(["audio"]),
        }
    )
    with pytest.raises(ValueError, match="undecodable audio"):
        AudioFeatureStage(strict=True)(batch)


def test_audio_stage_stereo_and_8bit():
    from q_digest_ray.stages.multimodal import AudioFeatureStage

    # stereo 16-bit: identical channels → same features as mono
    rate = 8000
    ts = np.arange(rate) / rate
    x = (0.4 * np.sin(2 * np.pi * 200 * ts) * 32767).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(2)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(np.repeat(x, 2).tobytes())
    stereo = buf.getvalue()
    x8 = ((0.4 * np.sin(2 * np.pi * 200 * ts)) * 127 + 128).astype(np.uint8)
    buf8 = io.BytesIO()
    with wave.open(buf8, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(1)
        w.setframerate(rate)
        w.writeframes(x8.tobytes())
    batch = pa.table(
        {
            "media_id": pa.array([1, 2], pa.int64()),
            "media": pa.array([stereo, buf8.getvalue()], pa.binary()),
            "media_type": pa.array(["audio", "audio"]),
        }
    )
    out = AudioFeatureStage(strict=True)(batch)  # both must decode for real
    f1 = np.array(out["features"][0].as_py())
    f2 = np.array(out["features"][1].as_py())
    assert abs(f1[2] - 200) < 10 and abs(f2[2] - 200) < 10


def test_frame_stage_gates():
    from q_digest_ray.stages.multimodal import HAS_PIL, FrameSampleStage

    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media": pa.array([b"\x01" * 64], pa.binary()),
            "media_type": pa.array(["video"]),
        }
    )
    if not HAS_PIL:
        with pytest.raises(NotImplementedError):
            FrameSampleStage(use_real=True)
        with pytest.raises(NotImplementedError):
            FrameSampleStage(strict=True)(batch)
    out = FrameSampleStage(num_frames=3)(batch)  # fake path always works
    assert len(out["frames"][0].as_py()) == 3


@pytest.mark.skipif(
    not __import__(
        "q_digest_ray.stages.multimodal", fromlist=["HAS_PIL"]
    ).HAS_PIL,
    reason="PIL not importable in this container",
)
def test_frame_stage_real_gif_when_pil_present():  # pragma: no cover
    from PIL import Image

    from q_digest_ray.stages.multimodal import FrameSampleStage

    frames = []
    for i in range(6):
        im = Image.new("RGB", (4, 4), (40 * i, 10, 255 - 40 * i))
        frames.append(im)
    buf = io.BytesIO()
    frames[0].save(buf, format="GIF", save_all=True, append_images=frames[1:])
    batch = pa.table(
        {
            "media_id": pa.array([1], pa.int64()),
            "media": pa.array([buf.getvalue()], pa.binary()),
            "media_type": pa.array(["video"]),
        }
    )
    out = FrameSampleStage(num_frames=3, strict=True)(batch)
    fr = out["frames"][0].as_py()
    assert len(fr) == 3 and all(len(f) == 12 for f in fr)
    # frames sampled across the animation differ (color ramp)
    assert fr[0] != fr[-1]


# ---------------------------------------------------------------------------
# IVF/LSH per-batch tie-break (ADVICE item 2) + public block counts
# ---------------------------------------------------------------------------


def test_ivf_topk_tie_break_deterministic(ray_session):
    import ray.data

    from q_digest_ray.stages.ann import ivf_topk

    # 40 identical vectors: every cosine ties at 1.0; top-k must be the
    # k smallest ids (the final sort's tie-break), whatever the batching
    v = [1.0, 0.0, 0.0]
    df = pd.DataFrame({"id": np.arange(40, dtype="int64"), "vec": [v] * 40})
    out = ivf_topk(
        ray.data.from_pandas(df).repartition(8),
        "id",
        "vec",
        np.array(v),
        k=5,
        num_centroids=2,
        nprobe=2,
    )
    assert out["id"].tolist() == [0, 1, 2, 3, 4]


def test_concomp_signature_partitioning_invariant(ray_session):
    # regression (round-3 review): the per-block checksum row was built
    # from a Python int whose pandas dtype depended on magnitude; mixed
    # block dtypes promoted to float64, quantizing low bits, so the SAME
    # edge set produced different signatures under different partitionings
    import ray.data

    from q_digest_ray.stages.concomp import _signature

    rng = np.random.default_rng(1)
    pairs = pd.DataFrame(
        {
            "a": rng.integers(1, 1 << 40, 20000).astype("int64"),
            "b": rng.integers(1, 1 << 40, 20000).astype("int64"),
        }
    )
    sigs = {
        _signature(ray.data.from_pandas(pairs).repartition(p)) for p in (2, 3, 5, 8)
    }
    assert len(sigs) == 1


def test_curate_corpus_null_and_empty_partition_values(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.pipelines.export import curate_corpus

    good = (
        "The quick brown fox jumps over the lazy dog while the patient cat "
        "watches from a warm stone wall in the afternoon sun and the words "
        "keep flowing in a perfectly ordinary way for this plain test."
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(9, dtype="int64"),
            "text": [good + f" Variant {i}." for i in range(9)],
            "lang": ["en", "en", "de", None, None, "", "en", "de", ""],
        }
    )
    out_dir = str(tmp_path / "curated_null")
    funnel = curate_corpus(ray.data.from_pandas(docs), out_dir, min_quality=0.3)
    assert funnel["n_after_dedup"] == 9
    assert funnel["n_exported"] == 9  # null/empty lang rows still export
    assert funnel["per_partition"] == {
        "en": 3,
        "de": 2,
        "": 2,
        "__HIVE_DEFAULT_PARTITION__": 2,
    }
    import os

    assert os.path.isdir(os.path.join(out_dir, "lang=__HIVE_DEFAULT_PARTITION__"))


def test_curation_funnel_zero_export(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.pipelines.export import curate_corpus

    docs = pd.DataFrame(
        {
            "doc_id": np.arange(5, dtype="int64"),
            "text": ["!!!"] * 5,  # junk: nothing passes the quality filter
            "lang": ["en"] * 5,
        }
    )
    out_dir = str(tmp_path / "curated_empty")
    funnel = curate_corpus(ray.data.from_pandas(docs), out_dir, min_quality=0.3)
    assert funnel["n_exported"] == 0 and funnel["per_partition"] == {}


def test_bucketed_join_anti_semi(ray_session):
    import ray.data

    from q_digest_ray.stages.join import bucketed_join

    # keys above 2^53 verify the Arrow-native exactness of the new paths
    base = 1 << 53
    left = pd.DataFrame(
        {"k": np.array([base + 1, base + 2, base + 3, base + 4], "int64"),
         "v": [10, 20, 30, 40]}
    )
    right = pd.DataFrame(
        {"rk": np.array([base + 2, base + 2, base + 4], "int64"), "w": [1, 2, 3]}
    )
    lds = ray.data.from_pandas(left).repartition(2)
    rds = ray.data.from_pandas(right).repartition(2)
    anti = (
        bucketed_join(lds, rds, on="k", right_on="rk", num_buckets=4, how="anti")
        .to_pandas()
        .sort_values("k")
    )
    assert anti["k"].tolist() == [base + 1, base + 3]
    assert list(anti.columns) == ["k", "v"]  # left columns only
    semi = (
        bucketed_join(lds, rds, on="k", right_on="rk", num_buckets=4, how="semi")
        .to_pandas()
        .sort_values("k")
    )
    # semi: left rows with a match, NOT multiplied by right duplicates
    assert semi["k"].tolist() == [base + 2, base + 4]
    assert semi["v"].tolist() == [20, 40]


def test_media_features_query_deterministic(ray_session):
    from q_digest_ray.pipelines.queries import media_features

    a = media_features("/root/testdata/sf0.001")
    b = media_features("/root/testdata/sf0.001")
    pd.testing.assert_frame_equal(a, b)
    assert set(a["media_type"]) == {"image", "audio"}
    assert (a["n"] > 0).all()


def test_estimate_num_blocks_public_api(ray_session):
    import ray.data

    from q_digest_ray.stages.partitioning import estimate_num_blocks

    ds = ray.data.range(100).materialize()
    assert estimate_num_blocks(ds) == ds.num_blocks()
    lazy = ray.data.read_parquet("/root/testdata/sf0.001/nation.parquet")
    assert estimate_num_blocks(lazy) >= 1  # input-file fallback, no execution


def test_salted_catalog_query_matches_unsalted(ray_session, sf_dir):
    from q_digest_ray.pipelines.queries import (
        sk_qdigest_by_lang_salted,
        sk_qdigest_nchars_by_lang,
    )

    pd.testing.assert_frame_equal(
        sk_qdigest_by_lang_salted(sf_dir).reset_index(drop=True),
        sk_qdigest_nchars_by_lang(sf_dir).reset_index(drop=True),
    )


# ---------------------------------------------------------------------------
# SampleSketch (deterministic mergeable distinct-value sample)
# ---------------------------------------------------------------------------


def test_sample_sketch_layout_and_merge_invariant():
    from q_digest_ray.sketches.sample import SampleSketch

    vals = np.arange(100_000, dtype=np.int64)
    whole = SampleSketch(k=512)
    whole.update_batch(vals)
    # split into uneven batches, merge in shuffled order → identical sample
    rng = np.random.default_rng(9)
    perm = rng.permutation(vals)
    cuts = np.sort(rng.choice(len(vals) - 2, 7, replace=False) + 1)
    parts = np.split(perm, cuts)
    rng.shuffle(parts)
    acc = SampleSketch(k=512)
    for p in parts:
        piece = SampleSketch(k=512)
        piece.update_batch(p)
        acc.merge(piece)
    assert np.array_equal(acc.sample(), whole.sample())
    assert acc.n == whole.n == len(vals)
    # uniformity: sample mean of uniform 0..99999 within a loose band
    m = acc.sample().mean()
    assert 40_000 < m < 60_000
    # serde roundtrip
    back = SampleSketch.from_bytes(acc.to_bytes())
    assert np.array_equal(back.sample(), acc.sample()) and back.n == acc.n
    # KMV by-product: distinct estimate within 15%
    assert abs(acc.estimate() - 100_000) / 100_000 < 0.15


def test_sample_sketch_rejects_weights():
    from q_digest_ray.sketches.sample import SampleSketch

    with pytest.raises(ValueError, match="weight-free"):
        SampleSketch(k=8).update_batch(np.arange(10), weights=np.ones(10))


def test_sk_sample_users_deterministic(ray_session, sf_dir):
    from q_digest_ray.pipelines.queries import sk_sample_users

    a = sk_sample_users(sf_dir)
    b = sk_sample_users(sf_dir)
    pd.testing.assert_frame_equal(a, b)
    # sf0.001 has fewer than 64 distinct users — the sketch holds them all
    assert 1 <= len(a) <= 64 and a["user_id"].is_unique


def test_sample_sketch_float_and_null_normalization():
    # r3 review: int64 normalization must happen BEFORE hashing on every
    # path, and nulls/NaNs are dropped, so Arrow and numpy inputs agree
    from q_digest_ray.sketches.sample import SampleSketch

    a = SampleSketch(k=16)
    a.update_batch(pa.array([2.5, 2.7, None, 4.0]))
    b = SampleSketch(k=16)
    b.update_batch(np.array([2.5, 2.7, np.nan, 4.0]))
    assert np.array_equal(np.sort(a.sample()), np.sort(b.sample()))
    assert set(a.sample()) == {2, 4}  # 2.5 and 2.7 are ONE int64 value
    c = SampleSketch(k=16)
    c.update_batch(pa.array([1, 2, None, 4], pa.int64()))
    assert set(c.sample()) == {1, 2, 4}  # no INT64_MIN garbage from nulls


def test_top_terms_null_text_rows(ray_session):
    import ray.data

    from q_digest_ray.pipelines.queries import top_terms_per_lang

    # run the partial path on a frame with null text/lang via a temp dir
    import os
    import tempfile

    import pyarrow.parquet as pq

    d = tempfile.mkdtemp(prefix="qdr_nulltext_")
    t = pa.table(
        {
            "lang": ["en", "en", None, "de"],
            "text": ["a b a", None, "x y", "a a"],
            "doc_id": np.arange(4, dtype="int64"),
            "n_chars": np.array([5, 0, 3, 3], "int64"),
        }
    )
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = top_terms_per_lang(d)
    # null text contributes nothing; null-lang row excluded (documented)
    assert set(out["lang"]) == {"en", "de"}
    en = out[out["lang"] == "en"].set_index("token")["cnt"]
    assert en["a"] == 2 and en["b"] == 1


def test_minhash_dedup_distributed_catalog_parity(ray_session, sf_dir):
    from q_digest_ray.pipelines.queries import (
        minhash_dedup,
        minhash_dedup_distributed,
    )

    pd.testing.assert_frame_equal(
        minhash_dedup(sf_dir).reset_index(drop=True),
        minhash_dedup_distributed(sf_dir).reset_index(drop=True),
    )


def test_sk_decile_binning_mass_within_bound(ray_session, sf_dir):
    from q_digest_ray.pipelines.queries import sk_decile_binning

    out = sk_decile_binning(sf_dir)
    assert len(out) == 10
    n = out["cnt"].sum()
    # each decile holds ~n/10 docs within the KLL rank-error allowance
    # (k=200 → ~2% rank error; discrete n_chars ties add slack)
    frac = out["cnt"].to_numpy() / n
    assert (np.abs(frac - 0.1) < 0.06).all(), frac
    assert (np.diff(out["upper_cut"].to_numpy()[:-1]) >= 0).all()


def test_export_curated_shuffle_modes(ray_session, tmp_path):
    import ray.data

    from q_digest_ray.pipelines.export import export_curated

    good = (
        "The quick brown fox jumps over the lazy dog while the patient cat "
        "watches from a warm stone wall in the afternoon sun and the words "
        "keep flowing in a perfectly ordinary way for this plain test."
    )
    docs = pd.DataFrame(
        {
            "doc_id": np.arange(40, dtype="int64"),
            "text": [good + f" Variant {i}." for i in range(40)],
            "lang": ["en"] * 40,
        }
    )
    ds = ray.data.from_pandas(docs).repartition(8)
    outs = {}
    for mode in (None, "blocks", "rows"):
        d = str(tmp_path / f"curated_{mode}")
        export_curated(ds, d, min_quality=0.3, shuffle=mode)
        outs[mode] = ray.data.read_parquet(d).to_pandas()
    # same ROWS whatever the shuffle — only order/layout may differ
    for mode in ("blocks", "rows"):
        assert set(outs[mode]["doc_id"]) == set(outs[None]["doc_id"])
    with pytest.raises(ValueError, match="shuffle"):
        export_curated(ds, str(tmp_path / "bad"), shuffle="bogus")


def test_cross_source_contamination_planted(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from q_digest_ray.pipelines.queries import cross_source_contamination

    shared1, shared2 = "alpha beta gamma delta", "omega psi chi phi"
    t = pa.table(
        {
            "text": [shared1, shared1, shared2, shared2, shared2, "solo one", "solo two"],
            "source": ["a", "b", "a", "b", "c", "a", "c"],
            "doc_id": np.arange(7, dtype="int64"),
        }
    )
    d = str(tmp_path / "contam")
    import os

    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = cross_source_contamination(d, num_buckets=8)
    got = {(a, b): int(n) for a, b, n in out.itertuples(index=False)}
    # shared1 in {a,b}; shared2 in {a,b,c} -> all three pairs
    assert got == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_sk_unigram_surprisal_matches_exact_on_small_vocab(ray_session, tmp_path):
    import pyarrow.parquet as pq

    from q_digest_ray.pipelines.queries import sk_unigram_logprob_quality

    # small vocab + wide CMS => zero collisions, so the sketch scores must
    # equal the exact-count surprisal computation
    texts = ["a a b", "b c", "a c c c"]
    t = pa.table(
        {
            "lang": ["en", "en", "de"],
            "text": texts,
            "doc_id": np.arange(3, dtype="int64"),
        }
    )
    d = str(tmp_path / "surp")
    os.makedirs(d)
    pq.write_table(t, os.path.join(d, "documents.parquet"))
    out = sk_unigram_logprob_quality(d).set_index("lang")

    from collections import Counter

    freq = Counter(" ".join(texts).split())
    total = sum(freq.values())

    def doc_score(s):
        toks = s.split()
        return float(np.mean([-np.log2(freq[w] / total) for w in toks]))

    exp_en = round((doc_score(texts[0]) + doc_score(texts[1])) / 2, 4)
    exp_de = round(doc_score(texts[2]), 4)
    assert out.loc["en", "mean_surprisal_bits"] == pytest.approx(exp_en, abs=1e-3)
    assert out.loc["de", "mean_surprisal_bits"] == pytest.approx(exp_de, abs=1e-3)
    assert out.loc["en", "n_docs"] == 2 and out.loc["de", "n_docs"] == 1
