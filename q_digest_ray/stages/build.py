"""Per-block sketch build stage (the UDAF *update* leg, SURVEY.md §3.4).

``SketchBuilder`` is a callable class → Ray Data runs it as an actor pool
(``map_batches(SketchBuilder(specs)..., concurrency=N)``); spec parsing and
constructor plumbing happen once per actor, each batch produces one tiny
"sketch row" per (spec × group) — the mergeable-summary IR:

    metric: string, sketch: string, group_key: string, payload: binary, n: int64

State is shipped onward as data (sketches ARE mergeable state), so the build
stage is embarrassingly parallel and the only wide operation in the whole
pipeline is the tiny grouped merge of these rows (stages/merge.py) — the
reference's "ship the sketch, not the data" strategy
(/root/reference/mpi-implementation/README.md:29-35) in Ray Data form.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from q_digest_ray.sketches.base import sketch_from_bytes
from q_digest_ray.sketches.bloom import BloomFilter
from q_digest_ray.sketches.cms import CountMinSketch
from q_digest_ray.sketches.hll import HyperLogLog
from q_digest_ray.sketches.kll import KLL
from q_digest_ray.sketches.qdigest import QDigest
from q_digest_ray.sketches.tdigest import TDigest

_KINDS = {
    "qdigest": QDigest,
    "hll": HyperLogLog,
    "cms": CountMinSketch,
    "bloom": BloomFilter,
    "tdigest": TDigest,
    "kll": KLL,
}

GLOBAL_KEY = ""

SKETCH_ROW_SCHEMA = pa.schema(
    [
        ("metric", pa.string()),
        ("sketch", pa.string()),
        ("group_key", pa.string()),
        ("payload", pa.binary()),
        ("n", pa.int64()),
    ]
)


@dataclass(frozen=True)
class SketchSpec:
    """One sketch to maintain over one column, optionally grouped."""

    metric: str  # output name, unique per spec
    column: str  # input column
    kind: str  # one of _KINDS
    params: dict = field(default_factory=dict)
    group_by: str | None = None  # group column (small cardinality) or None

    def make(self):
        return _KINDS[self.kind](**self.params)


def _column_values(col: pa.ChunkedArray, kind: str):
    """Numeric sketches take numpy; hashing sketches take the Arrow array."""
    if kind in ("hll", "cms", "bloom"):
        return col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return col.to_numpy(zero_copy_only=False)


class SketchBuilder:
    """map_batches callable: Arrow batch in → sketch rows out."""

    def __init__(self, specs: list[SketchSpec]):
        self.specs = list(specs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        metrics: list[str] = []
        kinds: list[str] = []
        keys: list[str] = []
        payloads: list[bytes] = []
        ns: list[int] = []
        for spec in self.specs:
            col = batch[spec.column]
            if spec.group_by is None:
                sk = spec.make()
                sk.update_batch(_column_values(col, spec.kind))
                metrics.append(spec.metric)
                kinds.append(spec.kind)
                keys.append(GLOBAL_KEY)
                payloads.append(sk.to_bytes())
                ns.append(sk.n)
            else:
                gcol = batch[spec.group_by]
                if isinstance(gcol, pa.ChunkedArray):
                    gcol = gcol.combine_chunks()
                enc = gcol.dictionary_encode()
                codes = enc.indices.to_numpy(zero_copy_only=False)
                labels = enc.dictionary.to_pylist()
                flat = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
                order = np.argsort(codes, kind="stable")
                sorted_codes = codes[order]
                starts = np.flatnonzero(
                    np.r_[True, sorted_codes[1:] != sorted_codes[:-1]]
                )
                bounds = np.r_[starts, len(sorted_codes)]
                for gi in range(len(starts)):
                    sel = order[bounds[gi] : bounds[gi + 1]]
                    g = sorted_codes[starts[gi]]
                    sub = flat.take(pa.array(sel))
                    sk = spec.make()
                    sk.update_batch(_column_values(sub, spec.kind))
                    metrics.append(spec.metric)
                    kinds.append(spec.kind)
                    keys.append(str(labels[g]))
                    payloads.append(sk.to_bytes())
                    ns.append(sk.n)
        return pa.table(
            {
                "metric": pa.array(metrics, pa.string()),
                "sketch": pa.array(kinds, pa.string()),
                "group_key": pa.array(keys, pa.string()),
                "payload": pa.array(payloads, pa.binary()),
                "n": pa.array(ns, pa.int64()),
            }
        )


def build_sketches(
    ds,
    specs: list[SketchSpec],
    batch_size: int = 65536,
    concurrency=None,
):
    """Dataset of input rows → Dataset of sketch rows (one per spec×group×block)."""
    return ds.map_batches(
        SketchBuilder(specs),
        batch_format="pyarrow",
        batch_size=batch_size,
        zero_copy_batch=True,
        concurrency=concurrency,
    )


def rehydrate(row_kind: str, payload: bytes):
    return sketch_from_bytes(row_kind, payload)
