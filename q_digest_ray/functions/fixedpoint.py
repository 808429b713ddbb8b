"""Exact fixed-point money arithmetic, bit-identical with a DuckDB oracle.

Float sums are order-dependent: at some scale factor a 2-decimal money sum
lands exactly on a .xx5 rounding tie and the engine and the SQL oracle
round to different cents (observed: pricing_summary sum_disc_price =
30158055.965 exactly at sf0.001).  The deterministic fix is exactness on
BOTH sides:

- SQL side: CAST money columns to DECIMAL so sums are exact decimals and
  DuckDB's round() is half-away-from-zero on the exact value.
- Engine side: scale to int64 per batch (2-decimal money -> cents), sum as
  Python ints in the final combine (arbitrary precision — per-batch int64
  partials can overflow int64 when re-summed over ~10^6 blocks), then
  reproduce DuckDB's rounding exactly with integer arithmetic.

For averages the oracle divides the exact decimal sum by a BIGINT count,
which DuckDB evaluates as IEEE double division of the correctly-rounded
double of the exact sum; ``duckdb_round_double`` then reproduces DuckDB's
round(DOUBLE, n) = trunc(x * 10^n +- 0.5) / 10^n (verified against DuckDB
1.0: the multiply is IEEE, so 2.675 -> 267.5 exactly -> 2.68).
"""

from __future__ import annotations

import math

import numpy as np


def scaled_int64(col: np.ndarray, decimals: int) -> np.ndarray:
    """Float column holding <=``decimals``-decimal values -> exact scaled
    int64 (np.rint recovers the exact decimal from its double
    approximation as long as |value| < 2^52 / 10^decimals)."""
    return np.rint(np.asarray(col, dtype=np.float64) * (10.0**decimals)).astype(
        np.int64
    )


def round_scaled_half_up(total: int, scale: int, dec: int) -> float:
    """Exact decimal ``total/scale`` rounded half-away-from-zero to ``dec``
    places, returned as the correctly-rounded double of that decimal —
    identical to DuckDB round(DECIMAL, dec) followed by its double
    conversion."""
    q = 10**dec
    num = int(total) * q
    d, r = divmod(abs(num), scale)
    if 2 * r >= scale:
        d += 1
    if num < 0:
        d = -d
    return d / q


def duckdb_round_double(x: float, n: int) -> float:
    """DuckDB round(DOUBLE, n): IEEE-multiply by 10^n, round half away from
    zero, divide back."""
    p = 10.0**n
    y = x * p
    return math.trunc(y + (0.5 if y >= 0 else -0.5)) / p


def duckdb_round_double_vec(x, n: int):
    """Vectorized ``duckdb_round_double`` over a numpy array (np.trunc is
    bit-identical to math.trunc for doubles) — for per-row rounding in
    batch stages, where a Python loop per row would be the hot path."""
    import numpy as np

    p = 10.0**n
    y = np.asarray(x, dtype=np.float64) * p
    return np.trunc(y + np.where(y >= 0, 0.5, -0.5)) / p


def exact_sum(series) -> int:
    """Arbitrary-precision sum of an integer pandas Series (int64 partials
    re-summed over many blocks can exceed int64)."""
    return int(sum(int(v) for v in series))
