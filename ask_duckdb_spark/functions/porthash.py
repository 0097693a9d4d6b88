"""Engine-portable hashing: identical values on Spark and DuckDB.

The minhash/simhash families were rows-only because their signatures
rode on ``xxhash64`` (Spark-only) and Java wraparound arithmetic
(DuckDB raises on BIGINT overflow instead of wrapping). This module
rebuilds the whole sketch-hash layer on two primitives BOTH engines
compute bit-identically, extending x58's portable-integer-arithmetic
discipline (similarity.py) from projection matrices to string hashing:

1. **md5** — standardized, available and identical in both engines.
   A token hash is the first 15 hex chars of ``md5(token)`` parsed as
   an integer: a uniform 60-bit value, always < 2^60.
2. **mod-p folds** — every derived hash (shingle folds, permutations,
   band buckets) is ``(acc * B + x) % P`` / ``(A*h + B') % P`` with
   P = 2^31 - 1, so every intermediate product stays under 2^62:
   no overflow on DuckDB, no wraparound dependence on Spark, same
   value everywhere.

Each Spark expression here has a ``*_SQL`` twin that interpolates THE
SAME constants into a DuckDB fragment — generated, never hand-copied,
so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Fold modulus (Mersenne prime 2^31 - 1). Every reduced value is < P,
#: so products with multipliers < 2^31 stay far below 2^63 on both
#: engines.
PH_P = 2147483647

#: Polynomial-fold base (prime, same constant CPython uses for tuple
#: hashing).
PH_B = 1000003

#: Knuth multiplicative constant (2^32 / golden ratio) — seed material
#: for derived per-permutation multipliers.
PH_KNUTH = 2654435761


def token_hash60(col) -> Column:
    """Portable 60-bit token hash: first 15 hex chars of md5, as long.

    JVM-side end to end (md5 + substring + base-16 conv); the DuckDB
    twin is :func:`token_hash60_sql`.
    """
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def token_hash60_sparksql(expr: str) -> str:
    """Spark-SQL-text twin of :func:`token_hash60` (same value).

    Hot plan builds interpolate this into one ``selectExpr`` string so
    the whole expression tree parses JVM-side in a single call —
    composing the same tree through the Column API costs seconds of
    driver-side Py4J round-trips per query build (measured: the 60-term
    simhash tree alone was 1.9 s/build at r4; the parsed plan and
    generated code are identical).
    """
    return f"CAST(conv(substr(md5({expr}), 1, 15), 16, 10) AS BIGINT)"


def token_hash60_sql(expr: str) -> str:
    """DuckDB twin of :func:`token_hash60` over SQL fragment ``expr``."""
    return (
        "list_reduce(list_transform("
        f"string_split(substr(md5({expr}), 1, 15), ''), "
        "c -> CAST(strpos('0123456789abcdef', c) - 1 AS BIGINT)), "
        "(a, b) -> a * 16 + b)"
    )


def perm_constants(n: int) -> list[tuple[int, int]]:
    """(multiplier, offset) pairs for ``n`` minhash permutations.

    Derived from PH_KNUTH so both engines interpolate the same
    literals; multipliers are odd-seeded and reduced mod P (never 0).
    """
    out = []
    for i in range(n):
        a = ((2 * i + 1) * PH_KNUTH) % PH_P
        b = (i * 7046029254386353) % PH_P
        out.append((a, b))
    return out
