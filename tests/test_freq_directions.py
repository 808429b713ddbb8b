"""Frequent Directions matrix sketch (r5): spectral-error guarantee with a
carried exact certificate (shed), merge within bound, serde, weighted
updates, and the distributed build over the embeddings table."""

import numpy as np
import pyarrow as pa
import pytest

from q_digest_ray.sketches.freq_directions import FrequentDirections


def _spec_err(A: np.ndarray, sk: FrequentDirections) -> float:
    diff = A.T @ A - sk.cov_estimate()
    return float(np.linalg.norm(diff, 2))


def _gen(n=3000, d=32, rank=6, seed=5):
    rng = np.random.default_rng(seed)
    low = rng.normal(size=(n, rank)) @ rng.normal(size=(rank, d)) * 3.0
    return low + rng.normal(size=(n, d)) * 0.3


def test_spectral_bound_and_certificate():
    A = _gen()
    sk = FrequentDirections(ell=16)
    for chunk in np.array_split(A, 7):
        sk.update_batch(chunk)
    assert sk.n == len(A)
    err = _spec_err(A, sk)
    frob2 = float((A * A).sum())
    # certified per-instance bound, then the paper bound over it
    assert err <= sk.error_bound() * (1 + 1e-9)
    assert sk.error_bound() <= frob2 / sk.ell * (1 + 1e-9)
    # the low-rank signal survives: top singular values close to exact
    exact = np.linalg.svd(A, compute_uv=False)[:4]
    got = sk.singular_values()[:4]
    assert np.all(np.abs(exact**2 - got**2) <= sk.error_bound() * (1 + 1e-9))


def test_merge_within_bound_and_counts():
    A = _gen(seed=11)
    parts = np.array_split(A, 5)
    whole = FrequentDirections(ell=16)
    whole.update_batch(A)
    acc = FrequentDirections(ell=16)
    for order in ([0, 1, 2, 3, 4], [4, 2, 0, 3, 1]):
        acc = FrequentDirections(ell=16)
        for i in order:
            part = FrequentDirections(ell=16)
            part.update_batch(parts[i])
            acc.merge(part)
        assert acc.n == len(A)
        frob2 = float((A * A).sum())
        assert _spec_err(A, acc) <= acc.error_bound() * (1 + 1e-9)
        assert acc.error_bound() <= frob2 / acc.ell * (1 + 1e-9)


def test_weighted_rows_scale_covariance():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(15, 8))
    w = rng.integers(1, 5, size=15)  # <= 60 repeated rows: below ell, no shrink
    a = FrequentDirections(ell=64)  # no shrink at this size: exact
    a.update_batch(A, weights=w)
    b = FrequentDirections(ell=64)
    b.update_batch(np.repeat(A, w, axis=0))
    assert np.allclose(a.cov_estimate(), b.cov_estimate())


def test_serde_round_trip():
    sk = FrequentDirections(ell=8)
    sk.update_batch(_gen(n=500, d=16, seed=7))
    back = FrequentDirections.from_bytes(sk.to_bytes())
    assert back.ell == sk.ell and back.d == sk.d and back.n == sk.n
    assert back.error_bound() == sk.error_bound()
    assert np.allclose(back.cov_estimate(), sk.cov_estimate())


def test_dimension_and_ell_mismatches_raise():
    a = FrequentDirections(ell=8)
    a.update_batch(np.ones((4, 8)))
    with pytest.raises(ValueError):
        a.update_batch(np.ones((4, 9)))
    with pytest.raises(ValueError):
        a.merge(FrequentDirections(ell=16))
    with pytest.raises(ValueError):
        a.update_batch(np.ones(8))  # 1-D rejected


def test_builder_list_column_plain_function():
    from q_digest_ray.sketches.base import sketch_from_bytes
    from q_digest_ray.stages.build import SketchBuilder, SketchSpec

    vecs = _gen(n=200, d=8, seed=9)
    t = pa.table(
        {
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array([i % 2 for i in range(200)], pa.int32()),
        }
    )
    rows = SketchBuilder(
        [
            SketchSpec("emb_fd", "embedding", "fd", {"ell": 16}),
            SketchSpec("emb_fd_by_label", "embedding", "fd", {"ell": 16}, group_by="label"),
        ]
    )(t)
    assert rows.num_rows == 1 + 2
    glob = rows.filter(pa.compute.equal(rows["metric"], "emb_fd"))
    sk = sketch_from_bytes("fd", glob["payload"][0].as_py())
    assert sk.n == 200 and sk.d == 8
    A32 = vecs.astype(np.float32).astype(np.float64)  # builder sees float32 values
    assert _spec_err(A32, sk) <= sk.error_bound() * (1 + 1e-9)


def test_distributed_build_over_embeddings(ray_session):
    import pyarrow.parquet as pq

    from q_digest_ray.pipelines.queries import sk_fd_spectrum

    df = sk_fd_spectrum("/root/testdata/sf0.001")
    tbl = pq.read_table("/root/testdata/sf0.001/embeddings.parquet", columns=["embedding"])
    col = tbl.column("embedding").combine_chunks()
    A = (
        col.flatten().to_numpy(zero_copy_only=False).astype(np.float64).reshape(len(col), -1)
    )
    exact = np.linalg.svd(A, compute_uv=False)
    bound = float(df[df["stat"] == "error_bound"]["value"].iloc[0])
    assert bound <= float((A * A).sum()) / 64 * (1 + 1e-9)
    for i in range(4):
        got = float(df[df["stat"] == f"sv{i}"]["value"].iloc[0])
        assert abs(exact[i] ** 2 - got**2) <= bound * (1 + 1e-9)
    assert float(df[df["stat"] == "n"]["value"].iloc[0]) == len(A)
