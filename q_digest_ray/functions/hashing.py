"""Vectorized deterministic 64-bit hashing over Arrow / numpy columns.

Every sketch that needs hashing (HLL, Bloom, Count-Min, MinHash, SimHash,
exact dedup, fingerprinting) shares this module so hashes are consistent
across the engine and across processes (no PYTHONHASHSEED dependence).

Strings/binary are hashed with a vectorized polynomial rolling hash computed
directly on the Arrow value buffer (no per-row Python), then finalized with a
splitmix64-style avalanche.  Integers are mixed with splitmix64.

All arithmetic is modulo 2**64 via numpy uint64 wrap-around.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

# odd multiplier for the polynomial hash (invertible mod 2**64)
_POLY_R = np.uint64(0x9E3779B97F4A7C15)
# modular inverse of _POLY_R mod 2**64
_POLY_R_INV = np.uint64(pow(0x9E3779B97F4A7C15, -1, 1 << 64))

_SM_C1 = np.uint64(0xBF58476D1CE4E5B9)
_SM_C2 = np.uint64(0x94D049BB133111EB)
_SM_GAMMA = np.uint64(0x9E3779B97F4A7C15)


def splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 finalizer (public domain algorithm, Steele et al.)."""
    z = x.astype(np.uint64, copy=True)
    z += _SM_GAMMA
    z ^= z >> np.uint64(30)
    z *= _SM_C1
    z ^= z >> np.uint64(27)
    z *= _SM_C2
    z ^= z >> np.uint64(31)
    return z


def _seed_multiplier(seed64: np.uint64) -> tuple[np.uint64, np.uint64]:
    """Seed-derived odd polynomial multiplier + its modular inverse.

    A seed must change the hash FAMILY, not just post-mix the digest: any
    post-mix h2 = f(h1) preserves every h1 collision, so a '128-bit'
    (h1, h2) key would still collide at the 64-bit birthday rate.  Using a
    different odd multiplier makes the two polynomials structurally
    independent — two distinct strings colliding under R almost surely
    differ under R' (found by round-2 self-review)."""
    m = int(splitmix64(np.array([seed64], dtype=np.uint64))[0]) | 1
    return np.uint64(m), np.uint64(pow(m, -1, 1 << 64))


def _hash_var_width(
    data: np.ndarray,
    offsets: np.ndarray,
    mult: np.uint64 = _POLY_R,
    mult_inv: np.uint64 = _POLY_R_INV,
    seed64: np.uint64 = np.uint64(0),
) -> np.ndarray:
    """Polynomial hash of variable-width byte slices, fully vectorized.

    ``data`` is the concatenated byte buffer (uint8), ``offsets`` the int64
    row boundaries (len = n_rows + 1).  For row r with bytes b_0..b_{m-1} the
    raw hash is  sum_i b_i * R**(i)  (mod 2**64) computed relative to the row
    start, plus the row length mixed in, then avalanched.  ``mult`` selects
    the hash family (seeded callers pass a seed-derived odd multiplier).

    Trick: compute global weights R**g for global byte position g once via a
    wrapping cumprod, take the weighted prefix-sum segment per row with
    ``np.add.reduceat``, and rebase each row by multiplying with R**(-start)
    (modular inverse powers) so the weights become position-in-row relative.
    """
    n_rows = len(offsets) - 1
    total = int(offsets[-1] - offsets[0])
    base = int(offsets[0])
    if total == 0:
        return splitmix64(np.full(n_rows, seed64, dtype=np.uint64))
    d = data[base : base + total].astype(np.uint64)
    # weights[g] = R**g (mod 2**64)
    weights = np.empty(total, dtype=np.uint64)
    weights[0] = np.uint64(1)
    if total > 1:
        np.multiply.accumulate(
            np.full(total - 1, mult, dtype=np.uint64), out=weights[1:]
        )
    terms = (d + np.uint64(1)) * weights  # +1 so trailing zero bytes matter
    starts = (offsets[:-1] - base).astype(np.int64)
    lengths = (offsets[1:] - offsets[:-1]).astype(np.uint64)
    # append a zero sentinel so a trailing empty row's start == total is a
    # VALID reduceat index; clamping instead would truncate the preceding
    # row's segment (same-string-different-batch hashes)
    terms_ext = np.append(terms, np.uint64(0))
    sums = np.add.reduceat(terms_ext, starts)
    # rows whose start == next start are empty → reduceat returned a single
    # element there; zero them explicitly
    empty = lengths == 0
    sums[empty] = np.uint64(0)
    # rebase: multiply by R**(-start)
    inv_weights = np.empty(total + 1, dtype=np.uint64)
    inv_weights[0] = np.uint64(1)
    np.multiply.accumulate(
        np.full(total, mult_inv, dtype=np.uint64), out=inv_weights[1:]
    )
    sums *= inv_weights[starts]
    sums[empty] = np.uint64(0)
    return splitmix64(sums ^ (lengths * _SM_C1) ^ seed64)


def _hash_words_dual(
    data: np.ndarray,
    offsets: np.ndarray,
    m2: np.uint64,
    m2_inv: np.uint64,
    seed2: np.uint64,
) -> tuple[np.ndarray, np.ndarray]:
    """Both content-key polynomial families over 8-byte WORDS instead of
    bytes: each row's bytes are scattered once into a zero-padded
    word-aligned buffer (two byte-level passes), then every per-family
    pass (weight cumprod, term multiply, reduceat, rebase) runs over 8x
    fewer elements — ~6x less memory traffic than the byte-wise kernel,
    which is what the text-heavy dedup/curation stages are bound by.

    Same guarantees as the byte kernel: equal byte strings get equal
    (h1, h2) (same words, same byte-length mix); distinct strings of equal
    length differ in some word, and the byte length is mixed into the
    avalanche so zero-padding cannot alias across lengths.  NOT
    bit-compatible with ``_hash_var_width`` — only ``content_key128``
    uses it, and content keys are never compared across hash versions.
    Assumes a little-endian platform (as does hash64's uint64-view path)."""
    n_rows = len(offsets) - 1
    base = int(offsets[0])
    lengths = (offsets[1:] - offsets[:-1]).astype(np.int64)
    words_per_row = (lengths + 7) // 8
    woff = np.zeros(n_rows + 1, dtype=np.int64)
    np.cumsum(words_per_row, out=woff[1:])
    W = int(woff[-1])
    if W == 0:
        z = np.full(n_rows, np.uint64(0), dtype=np.uint64)
        return splitmix64(z), splitmix64(np.full(n_rows, seed2, dtype=np.uint64))
    total = int(offsets[-1] - base)
    padded = np.zeros(W * 8, dtype=np.uint8)
    row_of_byte = np.repeat(np.arange(n_rows, dtype=np.int64), lengths)
    starts_b = (offsets[:-1] - base).astype(np.int64)
    g = np.arange(total, dtype=np.int64)
    padded[woff[:-1][row_of_byte] * 8 + (g - starts_b[row_of_byte])] = data[
        base : base + total
    ]
    words = padded.view(np.uint64) + np.uint64(1)  # +1: trailing zero words count
    starts_w = woff[:-1]
    empty = words_per_row == 0
    blen = lengths.astype(np.uint64)
    out = []
    for mult, mult_inv, seed64 in (
        (_POLY_R, _POLY_R_INV, np.uint64(0)),
        (m2, m2_inv, seed2),
    ):
        weights = np.empty(W, dtype=np.uint64)
        weights[0] = np.uint64(1)
        if W > 1:
            np.multiply.accumulate(
                np.full(W - 1, mult, dtype=np.uint64), out=weights[1:]
            )
        # sentinel zero term: a trailing empty row's start == W must be a
        # VALID reduceat index (clamping would truncate the previous row's
        # segment — same pitfall the byte kernel documents)
        terms_ext = np.append(words * weights, np.uint64(0))
        sums = np.add.reduceat(terms_ext, starts_w)
        inv_weights = np.empty(W + 1, dtype=np.uint64)
        inv_weights[0] = np.uint64(1)
        np.multiply.accumulate(
            np.full(W, mult_inv, dtype=np.uint64), out=inv_weights[1:]
        )
        sums *= inv_weights[starts_w]
        sums[empty] = np.uint64(0)
        out.append(splitmix64(sums ^ (blen * _SM_C1) ^ seed64))
    return out[0], out[1]


def _string_buffers(arr: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    """Extract (data uint8, offsets int64) from a string/binary Arrow array."""
    t = arr.type
    if pa.types.is_large_string(t) or pa.types.is_large_binary(t):
        off_dtype = np.int64
    else:
        off_dtype = np.int32
    bufs = arr.buffers()
    offsets = np.frombuffer(bufs[1], dtype=off_dtype)[
        arr.offset : arr.offset + len(arr) + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8) if bufs[2] is not None else np.zeros(0, np.uint8)
    return data, offsets


def hash64(values: "pa.Array | pa.ChunkedArray | np.ndarray", seed: int = 0) -> np.ndarray:
    """Deterministic 64-bit hash of a column. Returns np.uint64 array.

    Supports Arrow string/large_string/binary/large_binary and any integer /
    float / timestamp type (hashed by 64-bit bit pattern).  Nulls hash to a
    fixed sentinel.
    """
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    seed64 = np.uint64(seed & 0xFFFFFFFFFFFFFFFF)
    if isinstance(values, pa.Array):
        t = values.type
        if (
            pa.types.is_string(t)
            or pa.types.is_large_string(t)
            or pa.types.is_binary(t)
            or pa.types.is_large_binary(t)
        ):
            data, offsets = _string_buffers(values)
            if seed:
                m, minv = _seed_multiplier(seed64)
                h = _hash_var_width(data, offsets, m, minv, seed64)
            else:
                h = _hash_var_width(data, offsets)
        else:
            # Normalize to a null-free 8-byte Arrow array FIRST, so the numpy
            # conversion never falls back to float64-with-NaN (which would make
            # a non-null value hash differently in a batch that contains nulls)
            # and float32 is hashed by its float64 bit pattern, not a value
            # truncation — both match the plain-numpy path below.
            if pa.types.is_timestamp(t) or pa.types.is_date(t) or pa.types.is_time(t):
                vals = values.cast(pa.int64())
            elif pa.types.is_floating(t):
                vals = values if t == pa.float64() else values.cast(pa.float64())
            elif pa.types.is_boolean(t):
                vals = values.cast(pa.int64())
            elif pa.types.is_integer(t) and t.bit_width != 64:
                # sign-extends to 64 bits, same as the numpy small-int path
                vals = values.cast(pa.int64())
            else:
                vals = values  # int64 / uint64
            if vals.null_count:
                # slot value is irrelevant — overwritten by the sentinel below
                vals = vals.fill_null(0)
            np_vals = vals.to_numpy(zero_copy_only=False)
            if np_vals.dtype.kind == "f":
                a64 = np_vals.astype(np.float64, copy=False).view(np.uint64)
            else:
                a64 = np_vals.view(np.uint64)
            h = splitmix64(np.ascontiguousarray(a64))
        if values.null_count:
            mask = values.is_null().to_numpy(zero_copy_only=False)
            h = h.copy()
            h[mask] = np.uint64(0x6E756C6C6E756C6C)  # "nullnull"
        if seed:
            h = splitmix64(h ^ seed64)
        return h
    # plain numpy — hash by 64-bit BIT PATTERN, matching the Arrow path
    arr = np.asarray(values)
    if arr.dtype.kind in "iufM":
        if arr.dtype.kind == "f":
            a64 = arr.astype(np.float64, copy=False).view(np.uint64)
        elif arr.dtype.itemsize == 8:
            a64 = arr.view(np.uint64) if arr.dtype.kind != "M" else arr.view(np.int64).view(np.uint64)
        else:
            a64 = arr.astype(np.uint64)  # small ints sign-extend like int64 view
        h = splitmix64(np.ascontiguousarray(a64))
    elif arr.dtype.kind in "SU" or arr.dtype == object:
        return hash64(pa.array(arr.astype(str)), seed=seed)
    else:
        raise TypeError(f"unhashable dtype {arr.dtype}")
    if seed:
        h = splitmix64(h ^ seed64)
    return h


_CONTENT_KEY_SEED = 0x5EED


def content_key128(
    values, num_buckets: int
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(h1, h2, bucket) int64/int32 content key shared by every exact-dedup
    style operator (dedup_exact, distinct_text_count, dedup_keep_first).

    h1 and h2 come from structurally independent polynomial families
    (seed-derived multiplier, see ``_seed_multiplier``), so a silent merge
    of two distinct texts needs a genuine 128-bit collision; the bucket is
    derived from h1 so equal texts always co-locate.

    For string/binary columns both families run FUSED over 8-byte words
    (``_hash_words_dual``) — ~6x less memory traffic than two byte-wise
    hash64 calls, which is what text-heavy dedup/curation passes are bound
    by.  Content keys therefore do NOT equal ``hash64(text)``; they never
    did form an external contract — only equal-text => equal-key and
    family independence matter, both property-tested (null/empty/unicode/
    sliced-array cases, cross-batch stability)."""
    if isinstance(values, pa.ChunkedArray):
        values = values.combine_chunks()
    B = np.int64(num_buckets)
    seed64 = np.uint64(_CONTENT_KEY_SEED)
    if isinstance(values, pa.Array) and (
        pa.types.is_string(values.type)
        or pa.types.is_large_string(values.type)
        or pa.types.is_binary(values.type)
        or pa.types.is_large_binary(values.type)
    ):
        data, offsets = _string_buffers(values)
        m, minv = _seed_multiplier(seed64)
        h1, h2 = _hash_words_dual(data, offsets, m, minv, seed64)
        if values.null_count:
            mask = values.is_null().to_numpy(zero_copy_only=False)
            h1 = h1.copy()
            h2 = h2.copy()
            h1[mask] = np.uint64(0x6E756C6C6E756C6C)
            h2[mask] = np.uint64(0x6E756C6C6E756C6C)
        h2 = splitmix64(h2 ^ seed64)
        h1 = h1.view(np.int64)
        h2 = h2.view(np.int64)
    else:
        h1 = hash64(values).view(np.int64)
        h2 = hash64(values, seed=_CONTENT_KEY_SEED).view(np.int64)
    bucket = ((h1 % B + B) % B).astype(np.int32)
    return h1, h2, bucket


def hash_columns(batch: pa.Table, columns: list[str], seed: int = 0) -> np.ndarray:
    """Combined 64-bit hash over several columns (order-sensitive)."""
    h = np.full(batch.num_rows, np.uint64(seed or 1), dtype=np.uint64)
    for i, col in enumerate(columns):
        hc = hash64(batch[col], seed=seed + i + 1)
        h = splitmix64(h * _POLY_R + hc)
    return h
