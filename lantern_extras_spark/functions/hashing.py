"""Engine-portable deterministic hashing.

`hash32(expr)` = first 8 hex digits of md5, as an unsigned 32-bit integer. It is
exactly reproducible in any engine with md5 (DuckDB oracle:
``CAST('0x' || substr(md5(x), 1, 8) AS BIGINT)``), unlike Spark's xxhash64/murmur
whose seeds/variants are engine-specific. Used for minhash permutations, simhash,
deterministic fake embeddings, and bucketing — anywhere the correctness oracle
must recompute the same value.

md5 is a JVM-side codegen expression in Spark, so this stays off the Python path.
For pure-Spark jobs where cross-engine parity is not needed, prefer
``F.xxhash64`` (cheaper); these helpers are the *portable* variant.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH32_SPACE = float(2**32)


def hash32(c: Column | str, seed: int | str | None = None) -> Column:
    """Unsigned 32-bit hash of the string column (optionally seeded)."""
    col = F.col(c) if isinstance(c, str) else c
    if seed is not None:
        col = F.concat_ws(":", F.lit(str(seed)), col)
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("bigint")


def hash60(c: Column | str, seed: int | str | None = None) -> Column:
    """Unsigned 60-bit hash (first 15 md5 hex digits). 60 rather than 64 so
    the value is always positive in a signed BIGINT in every engine (16 hex
    digits can overflow the cast). The wide variant for signature work where
    32 bits of key space is the bottleneck — e.g. simhash banding, where
    band-key cardinality bounds candidate-join bucket density.
    DuckDB replay: CAST(concat('0x', substr(md5(x), 1, 15)) AS BIGINT)."""
    col = F.col(c) if isinstance(c, str) else c
    if seed is not None:
        col = F.concat_ws(":", F.lit(str(seed)), col)
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def hash_unit(c: Column | str, seed: int | str | None = None) -> Column:
    """Hash mapped into [0, 1) as a double."""
    return hash32(c, seed) / F.lit(HASH32_SPACE)


def hash32_sql(expr: str, seed: int | str | None = None) -> str:
    """The DuckDB-SQL text equivalent of :func:`hash32` — used to build oracle SQL."""
    if seed is not None:
        expr = f"concat('{seed}', ':', {expr})"
    return f"CAST(concat('0x', substr(md5({expr}), 1, 8)) AS BIGINT)"
