"""Large-large joins.

Two implementations with identical semantics:

- ``native_join`` — thin wrapper over ``Dataset.join`` (Ray >= 2.46 hash
  join: both sides hash-partitioned on the key across ``num_partitions``
  aggregator actors).
- ``bucketed_join`` — the explicit portable pattern (per the engine's
  design notes): add ``bucket = hash(key) % B`` to both sides, union the
  two sides into one aligned schema with a ``__side`` tag, group by the
  coarse bucket and pandas-merge within each group.  B is the skew /
  memory knob: each bucket's two sides must fit one task; salt hot keys by
  raising B.

``band_count_join`` adds the non-equi RANGE join (|l.key - r.key| <= band)
via contiguous value-range buckets with boundary replication.

Broadcast (small-side) and as-of joins live in pipelines/queries.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from q_digest_ray.functions.hashing import hash64


def native_join(left, right, on: str, right_on: str | None = None, num_partitions: int = 16, join_type: str = "inner"):
    return left.join(
        right,
        join_type=join_type,
        num_partitions=num_partitions,
        on=(on,),
        right_on=(right_on or on,),
    )


def bucketed_join(
    left,
    right,
    on: str,
    right_on: str | None = None,
    num_buckets: int = 32,
    how: str = "inner",
):
    """Explicit partitioned hash join returning a Dataset of joined rows."""
    right_on = right_on or on
    lcols = left.schema().names
    rcols = right.schema().names
    shared = (set(lcols) & set(rcols)) - {on}
    if shared:
        raise ValueError(f"overlapping non-key columns: {shared}")

    # public Schema.names/.types (pyarrow DataTypes even for pandas-backed
    # datasets, where base_schema is a PandasBlockSchema, not pa.Schema)
    ls, rs = left.schema(), right.schema()
    ltypes = dict(zip(ls.names, ls.types))
    rtypes = dict(zip(rs.names, rs.types))

    def tag(side: str, key: str):
        # union needs ONE aligned schema: each side fills the other side's
        # columns with typed nulls
        def fn(batch: pa.Table) -> pa.Table:
            h = hash64(batch[key]).view(np.int64)
            b = (h % num_buckets + num_buckets) % num_buckets
            n = batch.num_rows
            out = {
                "__bucket": pa.array(b),
                "__side": pa.array([side] * n, pa.string()),
            }
            for name in lcols:
                out[f"l:{name}"] = (
                    batch[name] if side == "l" else pa.nulls(n, ltypes[name])
                )
            for name in rcols:
                out[f"r:{name}"] = (
                    batch[name] if side == "r" else pa.nulls(n, rtypes[name])
                )
            return pa.table(out)

        return fn

    lt = left.map_batches(tag("l", on), batch_format="pyarrow")
    rt = right.map_batches(tag("r", right_on), batch_format="pyarrow")
    both = lt.union(rt)

    pa_how = {
        "inner": "inner",
        "left": "left outer",
        "right": "right outer",
        "outer": "full outer",
        "semi": "left semi",
        "anti": "left anti",
    }[how]

    def join_bucket(g: pa.Table) -> pa.Table:
        # Arrow-native per-bucket join: a pandas merge would upcast
        # null-padded int64 columns (including the KEYS) to float64, which
        # silently corrupts keys above 2^53 and can produce spurious
        # matches; pyarrow's hash join keeps exact int64 end to end
        import pyarrow.compute as pc

        lmask = pc.equal(g["__side"], pa.scalar("l"))
        lf = g.filter(lmask).select([f"l:{c}" for c in lcols]).rename_columns(lcols)
        rf = (
            g.filter(pc.invert(lmask))
            .select([f"r:{c}" for c in rcols])
            .rename_columns(rcols)
        )
        if pa_how in ("left semi", "left anti"):
            # existence joins return LEFT columns only — probe just the key
            return lf.join(
                rf.select([right_on]).group_by(right_on).aggregate([]),
                keys=[on],
                right_keys=[right_on],
                join_type=pa_how,
            )
        if right_on != on:
            # pyarrow drops the right key column; keep the historical
            # contract of retaining both by carrying a copy through
            rf = rf.append_column("__rk_copy", rf[right_on])
        joined = lf.join(rf, keys=[on], right_keys=[right_on], join_type=pa_how)
        if right_on != on:
            names = [right_on if c == "__rk_copy" else c for c in joined.schema.names]
            joined = joined.rename_columns(names)
        return joined

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pyarrow")


def band_count_join(
    left,
    right,
    on: str,
    band: int,
    id_col: str,
    coarse: int = 64,
    count_col: str = "n_matches",
):
    """RANGE (band) join, counting form: for each left row, how many right
    rows have an integer ``on`` key within ±``band`` (inclusive) — the
    ``|l.key - r.key| <= delta`` non-equi join the Dataset API cannot
    express.  ``left`` needs columns [``id_col``, ``on``]; ``right`` needs
    [``on``]; returns a Dataset of (id_col, count_col).

    Contiguous value-range buckets of width ``coarse * band`` co-locate
    candidates: a left row lands only in its own bucket; a right row
    additionally replicates into a neighbor bucket when it lies within
    ``band`` of that boundary (at most 2/coarse of right rows), so every
    in-band pair meets in EXACTLY one bucket and each match counts once.
    Per bucket the answer is one sort + two searchsorted calls over the
    bucket's right keys — candidate pairs never materialize anywhere.

    Partitioning assumption: row mass is roughly balanced across key
    ranges of width coarse*band.  A single-value pileup concentrates in
    one bucket (the usual range-partitioner caveat); raise ``coarse`` or
    pre-aggregate duplicate keys if a bucket outgrows one task.
    """
    if band < 1:
        raise ValueError("band must be a positive integer")
    if coarse < 2:
        raise ValueError("coarse must be >= 2 (bucket width must exceed band)")
    W = coarse * band
    ls = left.schema()
    id_type = dict(zip(ls.names, ls.types))[id_col]

    def tag_left(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "__bucket": pa.array(k // W),
                "__side": pa.array(np.zeros(len(k), np.int8)),
                "__id": batch[id_col],
                "__k": pa.array(k),
            }
        )

    def tag_right(batch: pa.Table) -> pa.Table:
        k = batch[on].to_numpy(zero_copy_only=False).astype(np.int64)
        b = k // W
        down = k < b * W + band  # within band of the lower boundary
        up = k >= (b + 1) * W - band  # within band of the upper boundary
        bb = np.concatenate([b, b[down] - 1, b[up] + 1])
        kk = np.concatenate([k, k[down], k[up]])
        n = len(kk)
        return pa.table(
            {
                "__bucket": pa.array(bb),
                "__side": pa.array(np.ones(n, np.int8)),
                "__id": pa.nulls(n, id_type),
                "__k": pa.array(kk),
            }
        )

    lt = left.map_batches(tag_left, batch_format="pyarrow")
    rt = right.map_batches(tag_right, batch_format="pyarrow")

    def count_bucket(g: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        lmask = pc.equal(g["__side"], pa.scalar(0, pa.int8()))
        lf = g.filter(lmask)
        lk = lf["__k"].to_numpy(zero_copy_only=False)
        rk = np.sort(
            g.filter(pc.invert(lmask))["__k"].to_numpy(zero_copy_only=False)
        )
        hi = np.searchsorted(rk, lk + band, side="right")
        lo = np.searchsorted(rk, lk - band, side="left")
        return pa.table(
            {
                id_col: lf["__id"],
                count_col: pa.array((hi - lo).astype(np.int64)),
            }
        )

    return (
        lt.union(rt).groupby("__bucket").map_groups(count_bucket, batch_format="pyarrow")
    )
