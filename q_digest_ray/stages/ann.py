"""Approximate nearest neighbor over an embedding column (list<float>).

- brute-force cosine top-k: baseline — broadcast the (normalized) query
  matrix once via ray.put, one numpy matmul per batch, per-batch top-k
  prune, global sort+limit (pipelines/queries.ann_topk uses this shape).
- LSH-bucketed (random hyperplane): the scale path — each vector lands in
  a 2**planes bucket; a query probes only buckets within ``probe_hamming``
  signature distance, cutting the scanned fraction to ~sum_{d<=p} C(planes,d)
  / 2**planes while keeping high recall (tested vs brute force).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

import ray


def _matrix(col) -> np.ndarray:
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    flat = col.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(col)
    return flat.reshape(n, -1) if n else np.zeros((0, 0))


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(norms == 0, 1.0, norms)


def brute_force_topk(ds, id_col: str, vec_col: str, query: np.ndarray, k: int = 10) -> pd.DataFrame:
    """Exact cosine top-k (the oracle for the LSH variant)."""
    q = query.astype(np.float64)
    q = q / np.linalg.norm(q)
    qref = ray.put(q)

    # plain function, NOT an actor pool: the only per-task state is a
    # broadcast ObjectRef and ray.get of a local object is zero-copy, so a
    # pool's ~1 s spin-up would buy nothing (BASELINE.md §4 rule)
    def score(batch: pa.Table) -> pa.Table:
        qv = ray.get(qref)
        m = _normalize(_matrix(batch[vec_col]))
        cos = m @ qv
        t = pa.table({id_col: batch[id_col], "cos_sim": pa.array(cos)})
        if t.num_rows > k:
            import pyarrow.compute as pc

            # id tie-break must match the final sort (and the SQL
            # oracle's ORDER BY cos DESC, id ASC) — without it the
            # correct row can be discarded in the batch prune
            idx = pc.select_k_unstable(
                t, k=k, sort_keys=[("cos_sim", "descending"), (id_col, "ascending")]
            )
            t = t.take(idx)
        return t

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .sort(["cos_sim", id_col], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    out["cos_sim"] = out["cos_sim"].round(6)
    return out.reset_index(drop=True)


def _signatures(m: np.ndarray, planes: np.ndarray) -> np.ndarray:
    signs = (m @ planes) > 0
    return (signs.astype(np.uint64) << np.arange(planes.shape[1], dtype=np.uint64)[None, :]).sum(axis=1)


def lsh_topk(
    ds,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    num_planes: int = 8,
    probe_hamming: int = 2,
    seed: int = 17,
) -> pd.DataFrame:
    """LSH-bucketed approximate top-k: score only vectors whose signature is
    within ``probe_hamming`` bits of the query's (multi-probe).  Hyperplanes
    are broadcast once; bucket filtering happens inside each batch so no
    shuffle is added."""
    dim = len(query)
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(dim, num_planes))
    q = query.astype(np.float64)
    q = q / np.linalg.norm(q)
    qsig = int(_signatures(q[None, :], planes)[0])
    # popcount table for signature distance
    pop = np.array([bin(i).count("1") for i in range(1 << num_planes)], dtype=np.int64)
    ref = ray.put((q, planes, qsig, pop))

    # plain broadcast-lookup function (no actor pool — BASELINE.md §4 rule)
    def score(batch: pa.Table) -> pa.Table:
        qv, planes_, qsig_, pop_ = ray.get(ref)
        m = _normalize(_matrix(batch[vec_col]))
        sig = _signatures(m, planes_)
        dist = pop_[(sig ^ np.uint64(qsig_)).astype(np.int64)]
        keep = dist <= probe_hamming
        scanned = int(keep.sum())
        if scanned == 0:
            return pa.table(
                {id_col: pa.array([], batch[id_col].type), "cos_sim": pa.array([], pa.float64()),
                 "scanned": pa.array([], pa.int64())}
            )
        cos = m[keep] @ qv
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        # id-ascending tie-break matches the final sort (cos desc, id
        # asc) — a bare argsort could drop the row the final sort would
        # keep on a cosine tie at the k boundary (brute_force_topk rule)
        order = np.lexsort((ids, -cos))[:k]
        # scanned emitted ONCE per batch (first row) so the sum is the
        # true candidate count, not k x it
        scanned_col = np.zeros(len(order), dtype=np.int64)
        if len(order):
            scanned_col[0] = scanned
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "cos_sim": pa.array(cos[order]),
                "scanned": pa.array(scanned_col),
            }
        )

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    scanned = int(df["scanned"].sum()) if len(df) else 0
    out = (
        df.sort_values(["cos_sim", id_col], ascending=[False, True])
        .head(k)[[id_col, "cos_sim"]]
        .reset_index(drop=True)
    )
    out["cos_sim"] = out["cos_sim"].round(6)
    out.attrs["scanned"] = scanned
    return out


# ---------------------------------------------------------------------------
# IVF (inverted-file) — the partition-pruned scale path
# ---------------------------------------------------------------------------


def train_centroids(
    ds,
    vec_col: str,
    num_centroids: int = 64,
    sample_size: int = 10000,
    iters: int = 10,
    seed: int = 23,
) -> np.ndarray:
    """Coarse k-means centroids from a bounded sample.

    Sampling takes a capped slice from EVERY block (spreading the sample
    across the corpus) and stops at ``sample_size`` via streaming
    ``limit`` — no corpus-sized ``count()`` pass (an r2 self-review
    finding: the old fraction computation cost a full extra scan).  Driver
    memory is bounded by the sample; Lloyd iterations run on the driver —
    standard IVF training.  Centroids are L2-normalized so the assignment
    argmax is cosine."""
    # size the per-block cap from the plan's block count so per_block x
    # num_blocks ~= sample_size: the streaming limit() then has to consume
    # (nearly) every block, and every block contributes ~equally — a fixed
    # cap would let limit() stop after the head-of-corpus blocks and bias
    # the centroids to early clusters
    from q_digest_ray.stages.partitioning import estimate_num_blocks

    nb = estimate_num_blocks(ds) or 64  # 0 = unknown → spread as if 64 blocks
    per_block = max(8, sample_size // nb)

    def strided(batch: pa.Table) -> pa.Table:
        # evenly-strided rows per block, not the head — ordered data (e.g.
        # cluster-sorted) would otherwise bias the sample within a block
        n = batch.num_rows
        if n <= per_block:
            return batch
        idx = np.linspace(0, n - 1, per_block).astype(np.int64)
        return batch.take(pa.array(idx))

    sample_df = (
        ds.map_batches(strided, batch_format="pyarrow", batch_size=None)
        .limit(sample_size)
        .to_pandas()
    )
    if len(sample_df) == 0 or vec_col not in sample_df.columns:
        return np.zeros((0, 0))
    sample = _normalize(_matrix(pa.array(list(sample_df[vec_col]))))
    if len(sample) == 0:
        return np.zeros((0, 0))
    rng = np.random.default_rng(seed)
    k = min(num_centroids, len(sample))
    cents = sample[rng.choice(len(sample), k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(sample @ cents.T, axis=1)
        for c in range(k):
            members = sample[assign == c]
            if len(members):
                v = members.mean(axis=0)
                n = np.linalg.norm(v)
                if n > 0:
                    cents[c] = v / n
    return cents


def ivf_topk(
    ds,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    num_centroids: int = 64,
    nprobe: int = 8,
    seed: int = 23,
    centroids: np.ndarray | None = None,
) -> pd.DataFrame:
    """IVF approximate top-k: score only vectors assigned to the ``nprobe``
    centroids nearest the query.  Centroids + query broadcast once via
    ray.put; assignment and filtering happen inside each batch (no added
    shuffle); expected scanned fraction ~= nprobe / num_centroids."""
    cents = (
        centroids
        if centroids is not None
        else train_centroids(ds, vec_col, num_centroids, seed=seed)
    )
    if cents.size == 0:  # empty corpus: nothing to probe
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    q = query.astype(np.float64)
    q = q / np.linalg.norm(q)
    probes = np.argsort(-(cents @ q))[:nprobe]
    probe_mask = np.zeros(len(cents), dtype=bool)
    probe_mask[probes] = True
    ref = ray.put((q, cents, probe_mask))

    # plain broadcast-lookup function (no actor pool — BASELINE.md §4 rule)
    def score(batch: pa.Table) -> pa.Table:
        qv, cents_, probe_mask_ = ray.get(ref)
        m = _normalize(_matrix(batch[vec_col]))
        assign = np.argmax(m @ cents_.T, axis=1) if len(m) else np.zeros(0, int)
        keep = probe_mask_[assign]
        scanned = int(keep.sum())
        if scanned == 0:
            return pa.table(
                {
                    id_col: pa.array([], batch[id_col].type),
                    "cos_sim": pa.array([], pa.float64()),
                    "scanned": pa.array([], pa.int64()),
                }
            )
        cos = m[keep] @ qv
        ids = batch[id_col].to_numpy(zero_copy_only=False)[keep]
        # id-ascending tie-break matches the final sort (cos desc, id
        # asc) — a bare argsort could drop the row the final sort would
        # keep on a cosine tie at the k boundary (brute_force_topk rule)
        order = np.lexsort((ids, -cos))[:k]
        scanned_col = np.zeros(len(order), dtype=np.int64)
        scanned_col[0] = scanned
        return pa.table(
            {
                id_col: pa.array(ids[order]),
                "cos_sim": pa.array(cos[order]),
                "scanned": pa.array(scanned_col),
            }
        )

    df = ds.map_batches(score, batch_format="pyarrow").to_pandas()
    if df.empty:
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    scanned = int(df["scanned"].sum())
    out = (
        df.sort_values(["cos_sim", id_col], ascending=[False, True])
        .head(k)[[id_col, "cos_sim"]]
        .reset_index(drop=True)
    )
    out["cos_sim"] = out["cos_sim"].round(6)
    out.attrs["scanned"] = scanned
    return out


def build_ivf_index(
    ds,
    id_col: str,
    vec_col: str,
    out_dir: str,
    num_centroids: int = 64,
    seed: int = 23,
) -> np.ndarray:
    """Materialize a centroid-partitioned IVF index: vectors written as
    parquet partitioned by their assigned centroid (one directory per
    centroid), centroids saved alongside.  A query then reads ONLY its
    nprobe partition directories — pruning at the read, the property that
    makes IVF the 100-TB path (and the layout is resumable: each partition
    directory is an independent unit)."""
    import os
    import shutil

    # write_parquet appends uniquely-named files: clear any previous index
    # so a rebuild can't mix stale and new vectors (same hazard
    # export_curated guards)
    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    cents = train_centroids(ds, vec_col, num_centroids, seed=seed)
    cref = ray.put(cents)

    # plain broadcast-lookup function (no actor pool — BASELINE.md §4 rule)
    def assign_centroid(batch: pa.Table) -> pa.Table:
        cents_ = ray.get(cref)
        m = _normalize(_matrix(batch[vec_col]))
        assign = (
            np.argmax(m @ cents_.T, axis=1).astype(np.int32)
            if len(m)
            else np.zeros(0, np.int32)
        )
        return batch.append_column("centroid", pa.array(assign))

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    ds.map_batches(assign_centroid, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "vectors"), partition_cols=["centroid"]
    )
    return cents


def ivf_index_topk(
    index_dir: str,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
) -> pd.DataFrame:
    """Query a materialized IVF index: only the ``nprobe`` probed partition
    directories are read (partition pruning by path), then exact cosine
    within them."""
    import os

    import ray.data

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    if cents.size == 0:  # index built from an empty corpus
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    q = query.astype(np.float64)
    q = q / np.linalg.norm(q)
    probes = np.argsort(-(cents @ q))[:nprobe]
    import glob

    paths = []
    for c in probes:
        d = os.path.join(index_dir, "vectors", f"centroid={c}")
        if os.path.isdir(d):
            paths.extend(sorted(glob.glob(os.path.join(d, "*.parquet"))))
    if not paths:
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    ds = ray.data.read_parquet(paths, columns=[id_col, vec_col])
    return brute_force_topk(ds, id_col, vec_col, query, k=k)


def _train_pq_books(
    sample: np.ndarray, m: int, num_codes: int, iters: int, seed: int
) -> list[np.ndarray]:
    """Per-subspace k-means codebooks (shared by pq_topk and the IVF-PQ
    composite index).  L2 assignment via the dot-minus-half-norm identity."""
    D = sample.shape[1]
    assert D % m == 0, f"dim {D} not divisible by m={m}"
    sub = D // m
    rng = np.random.default_rng(seed)
    books: list[np.ndarray] = []
    for j in range(m):
        X = sample[:, j * sub : (j + 1) * sub]
        ks = min(num_codes, len(X))
        C = X[rng.choice(len(X), ks, replace=False)].copy()
        for _ in range(iters):
            a = (X @ C.T - 0.5 * (C * C).sum(axis=1)).argmax(axis=1)
            for c in range(ks):
                mem = X[a == c]
                if len(mem):
                    C[c] = mem.mean(axis=0)
        books.append(C)
    return books


def _pq_encode(M: np.ndarray, books: list[np.ndarray]) -> np.ndarray:
    """(n, m) uint8 codes for normalized vectors M."""
    m = len(books)
    sub = M.shape[1] // m
    codes = np.empty((M.shape[0], m), dtype=np.uint8)
    for j in range(m):
        X = M[:, j * sub : (j + 1) * sub]
        C = books[j]
        codes[:, j] = (X @ C.T - 0.5 * (C * C).sum(axis=1)).argmax(axis=1)
    return codes


def pq_topk(
    ds,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    m: int = 8,
    num_codes: int = 64,
    sample_size: int = 2000,
    iters: int = 8,
    seed: int = 31,
    rerank: int = 4,
) -> pd.DataFrame:
    """Product-quantization ANN (Jegou et al. 2011, ADC form): per-subspace
    k-means codebooks trained on a bounded strided sample (driver work is
    sample-sized); scoring is ONE streaming pass where each subspace
    assignment is a small matmul and the ADC score is a lookup-table
    gather; the top ``rerank*k`` ADC candidates per batch are exact-cosine
    reranked in-batch, so the final combine sorts true cosines.

    At 100 TB the m-byte codes (vs 4*D-byte floats) would live in a
    materialized compressed index (the build_ivf_index pattern); here
    encoding fuses into the scan since the corpus is read once anyway —
    the memory story (LUT + codebooks broadcast once, ~m*codes*sub floats)
    is the same either way."""
    q = query.astype(np.float64)
    q = q / np.linalg.norm(q)

    from q_digest_ray.stages.partitioning import estimate_num_blocks

    nb = estimate_num_blocks(ds) or 64
    per_block = max(8, sample_size // nb)

    def strided(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n <= per_block:
            return batch
        idx = np.linspace(0, n - 1, per_block).astype(np.int64)
        return batch.take(pa.array(idx))

    sample_df = (
        ds.map_batches(strided, batch_format="pyarrow", batch_size=None)
        .limit(sample_size)
        .to_pandas()
    )
    if len(sample_df) == 0:
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    sample = _normalize(_matrix(pa.array(list(sample_df[vec_col]))))
    books = _train_pq_books(sample, m, num_codes, iters, seed)
    sub = sample.shape[1] // m
    luts = [q[j * sub : (j + 1) * sub] @ books[j].T for j in range(m)]
    half_norms = [0.5 * (C * C).sum(axis=1) for C in books]
    state = ray.put((books, luts, half_norms, q))
    cand = rerank * k

    def score(batch: pa.Table) -> pd.DataFrame:
        bks, lts, hns, qv = ray.get(state)
        M = _normalize(_matrix(batch[vec_col]))
        if M.shape[0] == 0:
            return pd.DataFrame({id_col: [], "cos_sim": []})
        s = np.zeros(M.shape[0], dtype=np.float64)
        for j in range(m):
            X = M[:, j * sub : (j + 1) * sub]
            a = (X @ bks[j].T - hns[j]).argmax(axis=1)
            s += lts[j][a]
        take = min(cand, len(s))
        top = np.argpartition(-s, take - 1)[:take]
        ids = batch[id_col].to_numpy(zero_copy_only=False)[top]
        cos = M[top] @ qv  # exact rerank on ADC candidates only
        return pd.DataFrame({id_col: ids, "cos_sim": cos})

    out = (
        ds.map_batches(score, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["cos_sim", id_col], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    out["cos_sim"] = out["cos_sim"].round(6)
    return out


# ---------------------------------------------------------------------------
# IVF-PQ composite index: PQ codes stored per IVF list (VERDICT r4 item 5)
# ---------------------------------------------------------------------------


def build_ivfpq_index(
    ds,
    id_col: str,
    vec_col: str,
    out_dir: str,
    num_centroids: int = 64,
    m: int = 8,
    num_codes: int = 64,
    sample_size: int = 2000,
    iters: int = 8,
    seed: int = 23,
    by_residual: bool = False,
) -> np.ndarray:
    """Materialize the standard IVF-PQ composite (Jegou et al. 2011 IVFADC,
    by_residual=False variant): vectors parquet-partitioned by their coarse
    centroid, each row carrying its m-byte PQ code (fixed-size binary) next
    to the full vector.  A query then (1) PRUNES PARTITIONS to nprobe
    centroid directories, (2) column-prunes the ADC scan to (id, code) —
    m bytes/vector instead of 4*D — and (3) exact-reranks only the top ADC
    candidates by re-reading their full vectors.  Layout is resumable: each
    partition directory is an independent unit (build_ivf_index pattern).

    ``by_residual=True`` is the Faiss-default IVFADC refinement: codebooks
    are trained on and codes encode the RESIDUAL v - centroid(v), which
    quantizes much finer than raw vectors once the coarse assignment has
    removed the cluster mean; the query side adds the exact q.centroid
    term per probed list, so ADC scores stay comparable across lists with
    the same single set of LUTs."""
    import json
    import os
    import shutil

    if os.path.isdir(out_dir):
        shutil.rmtree(out_dir)
    cents = train_centroids(ds, vec_col, num_centroids, sample_size=max(sample_size, 2000), seed=seed)
    if cents.size == 0:
        os.makedirs(out_dir, exist_ok=True)
        np.save(os.path.join(out_dir, "centroids.npy"), cents)
        np.save(os.path.join(out_dir, "books.npy"), np.zeros((0, 0, 0)))
        with open(os.path.join(out_dir, "meta.json"), "w") as f:
            json.dump({"m": m, "num_codes": num_codes, "empty": True,
                       "by_residual": by_residual}, f)
        return cents

    # PQ codebooks from one strided bounded sample (same sampling shape as
    # pq_topk — driver work is sample-sized)
    from q_digest_ray.stages.partitioning import estimate_num_blocks

    nb = estimate_num_blocks(ds) or 64
    per_block = max(8, sample_size // nb)

    def strided(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n <= per_block:
            return batch
        idx = np.linspace(0, n - 1, per_block).astype(np.int64)
        return batch.take(pa.array(idx))

    sample_df = (
        ds.map_batches(strided, batch_format="pyarrow", batch_size=None)
        .limit(sample_size)
        .to_pandas()
    )
    sample = _normalize(_matrix(pa.array(list(sample_df[vec_col]))))
    if by_residual:
        sassign = np.argmax(sample @ cents.T, axis=1)
        books = _train_pq_books(sample - cents[sassign], m, num_codes, iters, seed)
    else:
        books = _train_pq_books(sample, m, num_codes, iters, seed)

    os.makedirs(out_dir, exist_ok=True)
    np.save(os.path.join(out_dir, "centroids.npy"), cents)
    np.save(os.path.join(out_dir, "books.npy"), np.stack(books))
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump({"m": m, "num_codes": num_codes, "dim": int(sample.shape[1]),
                   "by_residual": by_residual}, f)

    cref = ray.put((cents, books))

    # plain broadcast-lookup function (no actor pool — BASELINE.md §4 rule)
    def assign_and_encode(batch: pa.Table) -> pa.Table:
        cents_, books_ = ray.get(cref)
        M = _normalize(_matrix(batch[vec_col]))
        if len(M) == 0:
            assign = np.zeros(0, np.int32)
            codes = np.zeros((0, m), np.uint8)
        else:
            assign = np.argmax(M @ cents_.T, axis=1).astype(np.int32)
            codes = _pq_encode(M - cents_[assign] if by_residual else M, books_)
        batch = batch.append_column(
            "pq_code", pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(m), len(codes), [None, pa.py_buffer(codes.tobytes())]
            )
        )
        return batch.append_column("centroid", pa.array(assign))

    ds.map_batches(assign_and_encode, batch_format="pyarrow").write_parquet(
        os.path.join(out_dir, "vectors"), partition_cols=["centroid"]
    )
    return cents


def _probe_groups(index_dir: str, query: np.ndarray, nprobe: int):
    """(normalized query, centroids, [(centroid_id, [shard paths])]) for
    the nprobe probed lists."""
    import glob
    import os

    cents = np.load(os.path.join(index_dir, "centroids.npy"))
    if cents.size == 0:
        return None, cents, []
    q = query.astype(np.float64)
    q = q / np.linalg.norm(q)
    probes = np.argsort(-(cents @ q))[:nprobe]
    groups = []
    for c in probes:
        d = os.path.join(index_dir, "vectors", f"centroid={c}")
        if os.path.isdir(d):
            ps = sorted(glob.glob(os.path.join(d, "*.parquet")))
            if ps:
                groups.append((int(c), ps))
    return q, cents, groups


def ivfpq_probe_paths(index_dir: str, query: np.ndarray, nprobe: int):
    """(normalized query, probed-partition parquet paths) — exposed so
    callers/tests can assert the partition pruning."""
    q, _cents, groups = _probe_groups(index_dir, query, nprobe)
    return q, [p for _c, ps in groups for p in ps]


def ivfpq_index_topk(
    index_dir: str,
    id_col: str,
    vec_col: str,
    query: np.ndarray,
    k: int = 10,
    nprobe: int = 8,
    rerank: int = 4,
) -> pd.DataFrame:
    """Query the IVF-PQ index: pruned ADC scan over (id, code) columns of
    the nprobe probed partitions only, then exact cosine rerank of the top
    ``rerank*k`` ADC candidates (their full vectors re-read with an id
    filter pushed into the parquet scan).  Residual indexes add the exact
    q.centroid term per probed list (constant per partition, attached at
    its read), keeping ADC scores comparable across lists."""
    import json
    import os

    import pyarrow.parquet as pq_mod
    import ray.data

    q, cents, groups = _probe_groups(index_dir, query, nprobe)
    paths = [p for _c, ps in groups for p in ps]
    if not paths:
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    with open(os.path.join(index_dir, "meta.json")) as f:
        meta = json.load(f)
    m = meta["m"]
    by_residual = bool(meta.get("by_residual", False))
    books = [b for b in np.load(os.path.join(index_dir, "books.npy"))]
    sub = books[0].shape[1]
    luts = np.stack([q[j * sub : (j + 1) * sub] @ books[j].T for j in range(m)])
    lref = ray.put(luts)
    cand = rerank * k

    # ADC scan: column-pruned to (id, m-byte code); plain broadcast-lookup fn
    def adc(batch: pa.Table) -> pd.DataFrame:
        luts_ = ray.get(lref)
        col = batch["pq_code"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        n = len(col)
        if n == 0:
            return pd.DataFrame({id_col: [], "adc": []})
        # count= caps the view at exactly (offset+n)*m bytes: Arrow pads
        # buffers to 64-byte multiples, and the padding is only divisible
        # by m when m is a power of two — a bare reshape(-1, m) would
        # raise for other m
        codes = np.frombuffer(
            col.buffers()[1], dtype=np.uint8, count=(col.offset + n) * m
        ).reshape(-1, m)[col.offset :]
        s = np.zeros(n, dtype=np.float64)
        for j in range(m):
            s += luts_[j][codes[:, j]]
        if "cdot" in batch.schema.names:
            s += batch["cdot"].to_numpy(zero_copy_only=False)
        take = min(cand, n)
        top = np.argpartition(-s, take - 1)[:take]
        return pd.DataFrame(
            {
                id_col: batch[id_col].to_numpy(zero_copy_only=False)[top],
                "adc": s[top],
            }
        )

    # one pruned read per probed list; residual indexes attach the list's
    # exact q.centroid dot as a constant column so cross-list ADC ranks hold
    def _list_ds(c: int, ps: list) -> "ray.data.Dataset":
        d = ray.data.read_parquet(ps, columns=[id_col, "pq_code"])
        if not by_residual:
            return d
        base = float(cents[c] @ q)

        def add_cdot(batch: pa.Table, base=base) -> pa.Table:
            return batch.append_column(
                "cdot", pa.array(np.full(batch.num_rows, base))
            )

        return d.map_batches(add_cdot, batch_format="pyarrow")

    dsets = [_list_ds(c, ps) for c, ps in groups]
    scan = dsets[0] if len(dsets) == 1 else dsets[0].union(*dsets[1:])
    adc_df = (
        scan.map_batches(adc, batch_format="pyarrow")
        .to_pandas()
        .sort_values(["adc", id_col], ascending=[False, True])
        .head(cand)
    )
    if adc_df.empty:
        return pd.DataFrame(columns=[id_col, "cos_sim"])
    cand_ids = adc_df[id_col].tolist()
    # exact rerank: re-read ONLY the candidates' full vectors (id filter
    # pushed to the probed partitions' row groups) — tiny driver-side table
    tbl = pq_mod.read_table(
        paths, columns=[id_col, vec_col], filters=[(id_col, "in", cand_ids)]
    )
    M = _normalize(_matrix(tbl[vec_col]))
    cos = M @ q
    ids = tbl[id_col].to_numpy(zero_copy_only=False)
    order = np.lexsort((ids, -cos))[:k]
    out = pd.DataFrame({id_col: ids[order], "cos_sim": np.round(cos[order], 6)})
    return out.reset_index(drop=True)
