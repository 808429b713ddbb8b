"""Native Ray Data UDAF surface for the sketch family.

``sketch_aggregate(spec)`` wraps any SketchSpec as a
``ray.data.aggregate.AggregateFn`` so sketches compose with the stock
Dataset aggregation API:

    ds.aggregate(sketch_aggregate(spec))                     # global
    ds.groupby("lang").aggregate(sketch_aggregate(spec))     # grouped

This is the literal "commutative/associative per-partition UDAF" shape the
north rule names (init = create_tmp_q, accumulate = insert, merge = merge,
finalize = percentile — /root/reference/src/qcore.c:64,201,390,379): Ray
calls ``init`` once per (group) accumulator, ``accumulate_block`` once per
block, tree-``merge``s partials across the exchange, then ``finalize``.

Performance note: ``Dataset.groupby().aggregate`` pays Ray's fixed
sort-based exchange (~seconds at small scale, an all-to-all at cluster
scale) even though sketch partials are tiny.  The repo's two-phase
build/merge path (stages/build.py + stages/merge.py) produces the same
estimates while moving only pre-combined sketch rows, and stays the
recommended path for hot pipelines (BASELINE.md §4); this wrapper is the
API-compatibility surface for code written against stock Ray Data.
"""

from __future__ import annotations

from typing import Any, Callable

import pyarrow as pa

from ray.data.aggregate import AggregateFn

from q_digest_ray.stages.build import SketchBuilder, SketchSpec, _column_values


def _update_from_block(sk, spec: SketchSpec, block) -> Any:
    """Accumulate one Ray block (Arrow or pandas) into a sketch — the same
    value-prep rules as SketchBuilder (hashed columns for distinctness/
    frequency sketches, numpy for numeric ones, optional weight column)."""
    if not isinstance(block, pa.Table):
        block = pa.Table.from_pandas(block, preserve_index=False)
    if block.num_rows == 0:
        return sk
    col = block[spec.column]
    w = None
    if spec.weight_column is not None:
        w = block[spec.weight_column].to_numpy(zero_copy_only=False)
    if spec.kind in SketchBuilder._HASHING_KINDS:
        from q_digest_ray.functions.hashing import hash64

        hashed = hash64(col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col)
        if w is not None:
            sk.update_hashed(hashed, weights=w)
        else:
            sk.update_hashed(hashed)
    elif w is not None:
        sk.update_batch(_column_values(col, spec.kind), weights=w)
    else:
        sk.update_batch(_column_values(col, spec.kind))
    return sk


def sketch_aggregate(
    spec: SketchSpec,
    finalize: Callable[[Any], Any] | None = None,
    name: str | None = None,
) -> AggregateFn:
    """SketchSpec → ray.data.aggregate.AggregateFn.

    ``finalize`` maps the merged sketch to the result cell (e.g.
    ``lambda sk: sk.quantile(0.99)``); default is the serialized sketch
    bytes, decodable with ``sketches.base.sketch_from_bytes(spec.kind, b)``.
    ``spec.group_by``/``spec.salt`` are ignored here — grouping belongs to
    ``ds.groupby(...)`` on this surface.
    """
    fin = finalize if finalize is not None else (lambda sk: sk.to_bytes())
    return AggregateFn(
        init=lambda _k: spec.make(),
        accumulate_block=lambda acc, block: _update_from_block(acc, spec, block),
        merge=lambda a, b: a.merge(b),
        finalize=fin,
        name=name or spec.metric,
    )


def quantile_aggregate(spec: SketchSpec, p: float, name: str | None = None) -> AggregateFn:
    """Convenience: a quantile sketch spec finalized straight to q(p)."""
    return sketch_aggregate(
        spec,
        finalize=lambda sk: float(sk.quantile(p)),
        name=name or f"{spec.metric}_p{int(round(p * 100))}",
    )


def distinct_aggregate(spec: SketchSpec, name: str | None = None) -> AggregateFn:
    """Convenience: a distinctness sketch spec finalized to its estimate."""
    return sketch_aggregate(
        spec,
        finalize=lambda sk: float(sk.estimate()),
        name=name or f"{spec.metric}_distinct",
    )
