"""Deterministic cross-engine hashing primitives.

Dedup/similarity operators need hashes that a DuckDB oracle can reproduce
exactly. Spark's ``hash``/``xxhash64`` are engine-specific, so we derive a
60-bit integer from md5 (identical bytes in every engine):

    Spark:  conv(substr(md5(s), 1, 15), 16, 10) :: bigint
    DuckDB: CAST(CONCAT('0x', substr(md5(s), 1, 15)) AS BIGINT)

15 hex chars = 60 bits, always positive, no overflow on cast.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["md5_int", "md5_int_sql", "seeded_hash", "seeded_hash_sql"]


def md5_int(c: Column) -> Column:
    """60-bit deterministic hash of a string column (cross-engine stable)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("bigint")


def md5_int_sql(expr: str) -> str:
    """DuckDB SQL equivalent of :func:`md5_int`."""
    return f"CAST(CONCAT('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def seeded_hash(c: Column, seed: int) -> Column:
    """Family of independent hash functions h_seed(x) = md5_int(seed||':'||x)."""
    return md5_int(F.concat(F.lit(str(seed)), F.lit(":"), c))


def seeded_hash_sql(expr: str, seed: int) -> str:
    """DuckDB SQL equivalent of :func:`seeded_hash`."""
    return md5_int_sql(f"CONCAT('{seed}', ':', {expr})")


# --- universal-hash family for MinHash -------------------------------------
#
# One md5 per input + k cheap affine maps beats k md5s per input by ~k×.
# Base hash is 32-bit (8 hex chars) so a_i * h + b_i stays < 2^63 — exact
# in engines that trap on bigint overflow (DuckDB) as well as ones that
# wrap (JVM).

MERSENNE31 = 2147483647  # 2^31 - 1


def md5_int32(c: Column) -> Column:
    """32-bit deterministic hash of a string column."""
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("bigint")


def md5_int32_sql(expr: str) -> str:
    return f"CAST(CONCAT('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"


def minhash_coeffs(k: int) -> list[tuple[int, int]]:
    """Deterministic (a_i, b_i) pairs for h_i(x) = (a_i*x + b_i) mod 2^31-1.

    Same generator feeds the Spark expressions and the SQL oracle, so both
    engines evaluate the identical hash family.
    """
    out = []
    for i in range(k):
        a = (i * 2654435761 + 1) % (MERSENNE31 - 1) + 1
        b = (i * 40503 + 7) % MERSENNE31
        out.append((a, b))
    return out
