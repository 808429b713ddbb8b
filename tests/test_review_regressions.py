"""Regression tests for the round-1 code-review findings: batch-layout
independence of hashes/signatures, float bit-pattern hashing, null group
keys, zero weights, ghost checkpoint shards."""

import numpy as np
import pyarrow as pa
import pytest

from q_digest_ray.functions.hashing import hash64
from q_digest_ray.stages.dedup import minhash_signatures, simhash64


def test_hash_independent_of_trailing_empty_rows():
    base = hash64(pa.array(["ab"]))[0]
    assert hash64(pa.array(["ab", ""]))[0] == base
    assert hash64(pa.array(["ab", "", ""]))[0] == base
    assert hash64(pa.array(["x", "ab", ""]))[1] == base
    # and empty rows themselves hash consistently
    e1 = hash64(pa.array([""]))[0]
    assert hash64(pa.array(["ab", ""]))[1] == e1


def test_float_hash_uses_bit_pattern_and_matches_arrow():
    vals = np.array([1.5, 1.9, 1.0])
    h_np = hash64(vals)
    assert len(set(h_np.tolist())) == 3  # distinct floats → distinct hashes
    h_pa = hash64(pa.array(vals))
    assert np.array_equal(h_np, h_pa)  # numpy and Arrow paths agree


def test_minhash_signature_independent_of_batch_layout():
    doc = "the quick brown fox jumps over the lazy dog again today"
    alone = minhash_signatures(pa.array([doc]))
    with_empty = minhash_signatures(pa.array([doc, ""]))
    assert np.array_equal(alone[0], with_empty[0])
    mid = minhash_signatures(pa.array(["", doc, "  "]))
    assert np.array_equal(alone[0], mid[1])


def test_simhash_independent_of_batch_layout():
    doc = "some document text with several meaningful tokens in it"
    alone = simhash64(pa.array([doc]))[0]
    assert simhash64(pa.array([doc, ""]))[0] == alone
    assert simhash64(pa.array(["", doc]))[1] == alone


def test_grouped_build_skips_null_keys():
    from q_digest_ray.stages.build import SketchBuilder, SketchSpec

    batch = pa.table({"v": [1, 2, 3, 4], "g": ["en", None, "de", "en"]})
    out = SketchBuilder(
        [SketchSpec("q", "v", "qdigest", {"k": 8, "universe_bits": 4}, group_by="g")]
    )(batch)
    rows = {r["group_key"]: r["n"] for r in out.to_pylist()}
    assert rows == {"en": 2, "de": 1}  # null-key row excluded, others exact
    # hashing sketch path with nulls too
    out2 = SketchBuilder(
        [SketchSpec("h", "v", "hll", {"p": 8}, group_by="g")]
    )(batch)
    rows2 = {r["group_key"]: r["n"] for r in out2.to_pylist()}
    assert rows2 == {"en": 2, "de": 1}


def test_tdigest_zero_weights_no_nan():
    from q_digest_ray.sketches.tdigest import TDigest

    t = TDigest(delta=50)
    t.update_batch(np.array([1.0, 2.0, 3.0]), weights=np.array([1.0, 0.0, 1.0]))
    assert not np.isnan(t.quantile(0.5))
    assert t.n == 2
    with pytest.raises(ValueError):
        t.update_batch(np.array([1.0]), weights=np.array([-1.0]))


def test_resumable_build_ignores_ghost_shards(ray_session, tmp_path):
    from q_digest_ray.pipelines.checkpoint import resumable_sketch_build
    from q_digest_ray.sources.cc_pages import synthesize

    big = str(tmp_path / "big")
    synthesize(big, total_rows=800, shards=4, seed=42)
    out = str(tmp_path / "out")
    r1, _ = resumable_sketch_build(big, out)
    # shrink the input: only the first 2 shards remain
    import os

    small = str(tmp_path / "small")
    os.makedirs(small)
    for f in sorted(os.listdir(big))[:3]:  # 2 parquet shards + manifest order varies
        if f.endswith(".parquet"):
            os.link(os.path.join(big, f), os.path.join(small, f))
    r2, _ = resumable_sketch_build(small, out)
    n1 = r1.query("metric == 'text_len_qdigest' and stat == 'n'")["value"].iloc[0]
    n2 = r2.query("metric == 'text_len_qdigest' and stat == 'n'")["value"].iloc[0]
    assert int(n1) == 800
    assert int(n2) < 800  # ghost part files from the first run NOT merged
