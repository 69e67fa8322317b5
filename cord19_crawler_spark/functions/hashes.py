"""Hash helpers shared by dedup / similarity / frontier operators.

``md5_long56`` is the cross-engine base hash: Spark and DuckDB produce the
identical value (md5 hex → first 14 nibbles → 56-bit int), which lets every
hash-based operator be validated against a DuckDB oracle. xxhash64 (faster,
JVM-native) is used where no oracle comparison is needed (frontier url_id).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^31-1: with h reduced mod P first, a*h < 2^62 stays inside
# signed-64 arithmetic in BOTH Spark and DuckDB (exact, overflow-free, no UDF).
MINHASH_PRIME = (1 << 31) - 1


def md5_long56(col: Column) -> Column:
    """First 56 bits of md5 as a non-negative bigint.

    DuckDB equivalent (exact same values):
      CAST(('0x' || substr(md5(x), 1, 14)) AS BIGINT)
    """
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def md5_long56_sql(expr: str) -> str:
    """DuckDB SQL text computing the same value as :func:`md5_long56`."""
    return f"CAST(('0x' || substr(md5({expr}), 1, 14)) AS BIGINT)"


def minhash_params(num_perm: int, seed: int = 42) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for num_perm minhash permutations.

    Derived from a fixed LCG so Spark and any oracle reimplementation agree
    without needing a shared RNG library.
    """
    params = []
    state = seed
    for _ in range(num_perm):
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        a = (state % (MINHASH_PRIME - 1)) + 1
        state = (state * 6364136223846793005 + 1442695040888963407) % (1 << 63)
        b = state % MINHASH_PRIME
        params.append((a, b))
    return params


def minhash_expr(hash_col: Column, a: int, b: int) -> Column:
    """(a*(h mod P) + b) mod P for one permutation, JVM-side codegen'd.

    DuckDB equivalent: ``(a * (h % P) + b) % P`` — identical values.
    """
    h = hash_col % F.lit(MINHASH_PRIME)
    return (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)


def minhash_expr_sql(hash_expr: str, a: int, b: int) -> str:
    """DuckDB SQL text matching :func:`minhash_expr`."""
    return f"(({a} * ({hash_expr} % {MINHASH_PRIME}) + {b}) % {MINHASH_PRIME})"
