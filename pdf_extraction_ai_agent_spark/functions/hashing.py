"""Portable deterministic hashing used by dedup / similarity / fingerprint
operators.

Engine-portable contract (identical values in Spark, DuckDB and Python):

    h(s) = int(md5(s)[:15], 16)          -- 60-bit, non-negative

Spark:  conv(substring(md5(s),1,15),16,10)::long
DuckDB: CAST('0x' || substring(md5(s),1,15) AS BIGINT)

MinHash permutations are affine maps over the Mersenne prime p = 2^31-1:
    perm_i(x) = (a_i * (x mod p) + b_i) mod p
(a_i < p, x mod p < p ⇒ product < 2^62: no int64 overflow.)
Constants are generated from a FIXED seed so the Spark plan, the DuckDB
oracle SQL and tests all share them.
"""

from __future__ import annotations

import random

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_P = 2_147_483_647  # 2^31 - 1
NUM_PERMS = 16
# 8 bands of 2: candidate probability 1-(1-j²)^8 — j=0.8 near-dups are
# caught with p≈0.9996 while j=0.2 pairs stay below 0.28 (cheap to verify).
LSH_BAND_SIZE = 2

_rng = random.Random(7)
MINHASH_AB: list[tuple[int, int]] = [
    (_rng.randrange(1, MERSENNE_P), _rng.randrange(0, MERSENNE_P)) for _ in range(NUM_PERMS)
]


def md5_long_col(col: Column) -> Column:
    """Spark side of the portable 60-bit hash."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def md5_long_sql(expr: str) -> str:
    """DuckDB side of the portable 60-bit hash."""
    return f"CAST(('0x' || substring(md5({expr}), 1, 15)) AS BIGINT)"


def minhash_col(hash_col: Column, i: int) -> Column:
    """perm_i over a 60-bit hash column (Spark)."""
    a, b = MINHASH_AB[i]
    return (F.lit(a) * (hash_col % MERSENNE_P) + F.lit(b)) % MERSENNE_P


def minhash_sql(hash_expr: str, i: int) -> str:
    a, b = MINHASH_AB[i]
    return f"(({a} * (({hash_expr}) % {MERSENNE_P}) + {b}) % {MERSENNE_P})"


def solve_lsh_bands(threshold: float, n_perms: int = NUM_PERMS) -> tuple[int, int]:
    """(n_bands, band_size) whose S-curve midpoint (1/b)^(1/r) sits closest
    to the target jaccard threshold, over the divisors of n_perms — the
    calibration the fixed 8×2 default was eyeballed from (threshold≈0.35).
    For a 0.8-threshold near-dup pass with 128 perms this picks ~16×8."""
    best: tuple[float, int, int] | None = None
    for r in range(1, n_perms + 1):
        if n_perms % r:
            continue
        b = n_perms // r
        mid = (1.0 / b) ** (1.0 / r)
        score = abs(mid - threshold)
        if best is None or score < best[0]:
            best = (score, b, r)
    assert best is not None
    return best[1], best[2]


def md5_long_py(s: str) -> int:
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)
