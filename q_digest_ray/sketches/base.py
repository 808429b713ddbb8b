"""The one sketch protocol shared by all six sketch families.

Lifecycle mirrors the reference UDAF decomposition (SURVEY.md §2.1:
init = qcore.c:64-72 create_tmp_q, update = qcore.c:201-248 insert,
merge = qcore.c:390-417 merge, serialize = qcore.c:434-501) but batch-first:
``update_batch`` takes a whole column slice (numpy / Arrow), never one value.

Every sketch is a pure-Python + numpy object — no Ray imports here.  Sketch
instances are carried through Ray Data pipelines as serialized ``bytes`` in an
Arrow binary column (the "sketch row" IR: metric, group_key, sketch, payload,
n), which is what makes the merge stage a plain groupby over tiny payloads.
"""

from __future__ import annotations

import struct
from typing import Any, ClassVar

import numpy as np


class Sketch:
    """Protocol base.  Subclasses implement the five lifecycle methods."""

    #: short wire tag, unique per sketch family
    kind: ClassVar[str] = "?"

    @property
    def n(self) -> int:
        """Total inserted weight (the reference's ``QDigest.N``)."""
        raise NotImplementedError

    def update_batch(self, values, weights=None) -> None:
        raise NotImplementedError

    def merge(self, other: "Sketch") -> "Sketch":
        """In-place merge of ``other`` into ``self`` (other unchanged).

        Must be commutative and associative up to estimate bounds
        (property-tested in tests/test_merge_properties.py).
        """
        raise NotImplementedError

    def to_bytes(self) -> bytes:
        raise NotImplementedError

    @classmethod
    def from_bytes(cls, buf: bytes) -> "Sketch":
        raise NotImplementedError


# ---------------------------------------------------------------------------
# serde helpers: length-prefixed numpy arrays (the reference's fixed 128-byte
# buffers are exactly what we must NOT do — SURVEY.md §2.4.4)
# ---------------------------------------------------------------------------

def pack_arrays(header: bytes, *arrays: np.ndarray) -> bytes:
    parts = [struct.pack("<I", len(header)), header, struct.pack("<B", len(arrays))]
    for a in arrays:
        a = np.ascontiguousarray(a)
        dt = a.dtype.str.encode()
        parts.append(struct.pack("<B", len(dt)))
        parts.append(dt)
        parts.append(struct.pack("<Q", a.nbytes))
        parts.append(a.tobytes())
    return b"".join(parts)


def unpack_arrays(buf: bytes) -> tuple[bytes, list[np.ndarray]]:
    (hlen,) = struct.unpack_from("<I", buf, 0)
    off = 4
    header = buf[off : off + hlen]
    off += hlen
    (n_arr,) = struct.unpack_from("<B", buf, off)
    off += 1
    arrays = []
    for _ in range(n_arr):
        (dlen,) = struct.unpack_from("<B", buf, off)
        off += 1
        dt = np.dtype(buf[off : off + dlen].decode())
        off += dlen
        (nbytes,) = struct.unpack_from("<Q", buf, off)
        off += 8
        arrays.append(np.frombuffer(buf, dtype=dt, count=nbytes // dt.itemsize, offset=off).copy())
        off += nbytes
    return header, arrays


_REGISTRY: dict[str, type] = {}


def register(cls: type) -> type:
    _REGISTRY[cls.kind] = cls
    return cls


def sketch_from_bytes(kind: str, buf: bytes) -> Any:
    return _REGISTRY[kind].from_bytes(buf)
