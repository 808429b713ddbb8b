"""Dedup operators: MinHash-LSH, SimHash, Jaccard verifier, embedding
near-dup — against a crafted corpus with known duplicate structure."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from q_digest_ray.stages.dedup import (
    band_hashes,
    embedding_dup_pairs,
    hamming64,
    jaccard_pairs,
    minhash_dup_groups,
    minhash_signatures,
    shingle_hashes,
    simhash64,
    simhash_dup_pairs,
)


def _corpus():
    rng = np.random.default_rng(11)
    vocab = [f"tok{i}" for i in range(500)]

    def doc(n, seed):
        r = np.random.default_rng(seed)
        return " ".join(r.choice(vocab, n))

    base = [doc(120, s) for s in range(8)]
    texts, ids = [], []
    for i, b in enumerate(base):
        ids.append(i * 10)
        texts.append(b)
    # near-dup of doc 0: change 3 of 120 tokens
    words = base[0].split()
    words[5], words[50], words[100] = "xx", "yy", "zz"
    ids.append(1000)
    texts.append(" ".join(words))
    # exact dup of doc 1
    ids.append(1001)
    texts.append(base[1])
    return ids, texts


def test_shingles_deterministic_and_order_sensitive():
    a, oa = shingle_hashes(pa.array(["the quick brown fox jumps"]))
    b, ob = shingle_hashes(pa.array(["the quick brown fox jumps"]))
    assert np.array_equal(a, b)
    c, _ = shingle_hashes(pa.array(["quick the brown fox jumps"]))
    assert not np.array_equal(a, c)
    # 5 tokens, w=3 → 3 shingles
    assert oa[1] - oa[0] == 3


def test_jaccard_verifier():
    j = jaccard_pairs(["a b c d e f"], ["a b c d e f"])[0]
    assert j == 1.0
    j2 = jaccard_pairs(["a b c d e f"], ["x y z q r s"])[0]
    assert j2 == 0.0


def test_minhash_estimates_jaccard():
    ids, texts = _corpus()
    sig = minhash_signatures(pa.array(texts), num_perm=128)
    est_dup = (sig[0] == sig[8]).mean()  # doc0 vs its near-dup
    true_j = jaccard_pairs([texts[0]], [texts[8]])[0]
    assert abs(est_dup - true_j) < 0.15
    est_far = (sig[0] == sig[2]).mean()
    assert est_far < 0.2
    # exact dup → identical signature and identical bands
    assert np.array_equal(sig[1], sig[9])
    bh = band_hashes(sig)
    assert np.array_equal(bh[1], bh[9])


def test_minhash_dup_groups_pipeline(ray_session):
    import ray.data

    ids, texts = _corpus()
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts})).repartition(3)
    groups = minhash_dup_groups(ds, "doc_id", "text", threshold=0.7)
    got = {tuple(sorted(g["doc_id"])) for _, g in groups.groupby("group_id")}
    assert (0, 1000) in got  # near-dup pair found
    assert (10, 1001) in got  # exact dup pair found
    assert len(groups) == 4  # nothing else grouped


def test_simhash_properties():
    ids, texts = _corpus()
    sig = simhash64(pa.array(texts))
    d_dup = hamming64(sig[0:1], sig[8:9])[0]
    d_far = hamming64(sig[0:1], sig[2:3])[0]
    assert d_dup <= 3
    assert d_far > 10
    assert sig[1] == sig[9]  # exact dup identical


def test_simhash_pipeline(ray_session):
    import ray.data

    ids, texts = _corpus()
    ds = ray.data.from_arrow(pa.table({"doc_id": ids, "text": texts})).repartition(2)
    pairs = simhash_dup_pairs(ds, "doc_id", "text", max_hamming=3)
    keys = {(r.doc_id_a, r.doc_id_b) for r in pairs.itertuples()}
    assert (0, 1000) in keys
    assert (10, 1001) in keys


def test_embedding_dup_pairs(ray_session):
    import ray.data

    rng = np.random.default_rng(3)
    base = rng.normal(size=(20, 32)).astype(np.float32)
    vecs = list(base)
    ids = list(range(20))
    # near-dup of vec 4
    vecs.append(base[4] + rng.normal(scale=0.01, size=32).astype(np.float32))
    ids.append(99)
    t = pa.table({"vec_id": ids, "embedding": [list(map(float, v)) for v in vecs]})
    ds = ray.data.from_arrow(t).repartition(2)
    pairs = embedding_dup_pairs(ds, "vec_id", "embedding", threshold=0.95)
    assert {(4, 99)} == {(r.id_a, r.id_b) for r in pairs.itertuples()}
