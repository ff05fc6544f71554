"""Bloom-prefiltered joins: membership pruning BEFORE the shuffle.

The scale problem: `big.join(keys, semi)` shuffles every row of the big side,
even though almost none of them match when `keys` is selective. The classic
fix — which Spark's own runtime row-filter optimization applies only in
narrow cases — is to build a Bloom filter over the key side, broadcast it,
and drop non-members during the big-side SCAN, so the shuffle carries only
plausible matches plus a bounded false-positive residue. With `exact=True`
an ordinary semi/anti join over the surviving sliver removes the false
positives, so the result is EXACTLY the plain join's (the DuckDB oracle for
`bloom_semi_join` is a plain EXISTS).

Portable by construction: positions come from `hash32` (md5) with integer
seeds, so the filter content is deterministic across engines and runs — a
rebuilt filter on another cluster admits the identical row set.

Two membership paths:
- literal (small filters): the word array rides in the plan as a literal and
  the test is pure Column arithmetic (shiftright/getbit) — whole-stage
  codegen, zero Python.
- broadcast (big filters): the word array ships as a Spark broadcast and an
  Arrow-batched pandas UDF tests membership (hashlib.md5 — same positions).

At 10 bits/key the false-positive rate is ~1%; the filter for 100M keys is
~125 MB — broadcastable where the raw 100M keys are not.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lantern_extras_spark.functions.hashing import hash32

LITERAL_MAX_WORDS = 8192  # above this (512 KiB of plan literal) use broadcast


class BloomFilter:
    """Immutable built filter: 64-bit words + geometry. `m` is a power of two
    so position = hash & (m-1) (no modulo)."""

    def __init__(self, words: list[int], m: int, k: int, n: int):
        self.words = words
        self.m = m
        self.k = k
        self.n = n

    def contains_py(self, key: str) -> bool:
        """Driver-side membership (same md5 positions as the engine path)."""
        for i in range(self.k):
            h = int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:8], 16) & (self.m - 1)
            if not (self.words[h >> 6] >> (h & 63)) & 1:
                return False
        return True

    @property
    def fp_rate_estimate(self) -> float:
        """Theoretical false-positive rate (1 − e^{−kn/m})^k."""
        return (1.0 - math.exp(-self.k * self.n / self.m)) ** self.k


def bloom_build(
    keys: DataFrame,
    key_col: str,
    bits_per_key: int = 10,
    k_hashes: int = 5,
    m_bits: int | None = None,
) -> BloomFilter:
    """Build a Bloom filter over a key column, distributed: k md5 positions
    per key explode into (word, bit) pairs, one partial-aggregated
    groupBy(word) bit_ors them, and only the m/64-word bitmap is collected
    (16 MiB at m=2^30 — the driver never sees the keys).

    Keys are hashed as strings (`CAST(key AS STRING)`) so the same filter
    admits the same values regardless of the column's physical type."""
    n = keys.count()
    if n == 0:
        return BloomFilter([0], 64, k_hashes, 0)
    if m_bits is None:
        m_bits = max(1024, 1 << math.ceil(math.log2(max(1, n * bits_per_key))))
    if m_bits & (m_bits - 1):
        raise ValueError("bloom_build: m_bits must be a power of two")
    key = F.col(key_col).cast("string")
    positions = F.array(
        *[hash32(key, seed=i).bitwiseAND(F.lit(m_bits - 1)) for i in range(k_hashes)]
    )
    rows = (
        keys.select(F.explode(positions).alias("__pos"))
        .select(
            F.shiftright(F.col("__pos"), 6).alias("__w"),
            (F.col("__pos").bitwiseAND(F.lit(63))).alias("__b"),
        )
        # 2^bit as a bigint via bit-position arithmetic: getbit-free build —
        # shiftleft's amount must be a literal, so fold the bit into the word
        # id and OR powers of two computed from a 64-entry literal table
        .select("__w", F.element_at(F.lit([1 << b for b in range(63)] + [-(1 << 63)]).cast("array<bigint>"), (F.col("__b") + 1).cast("int")).alias("__m"))
        .groupBy("__w")
        .agg(F.bit_or("__m").alias("__word"))
        .collect()
    )
    words = [0] * (m_bits // 64)
    for r in rows:
        words[r["__w"]] = int(r["__word"])
    return BloomFilter(words, m_bits, k_hashes, n)


def bloom_might_contain(
    bf: BloomFilter,
    key: Column | str,
    mode: str = "auto",
    spark=None,
) -> Column:
    """Boolean membership Column for `key` against a built filter.

    mode='literal': the word array is a plan literal; the test is
    shiftright + getbit Column arithmetic (codegen, no Python).
    mode='broadcast': the word array ships as a Spark broadcast; an
    Arrow-batched pandas UDF computes the same md5 positions with hashlib.
    mode='auto': literal when the filter fits LITERAL_MAX_WORDS."""
    col = (F.col(key) if isinstance(key, str) else key).cast("string")
    if mode == "auto":
        mode = "literal" if len(bf.words) <= LITERAL_MAX_WORDS else "broadcast"
    if mode == "literal":
        words_lit = F.lit(bf.words).cast("array<bigint>")
        cond = F.lit(True)
        for i in range(bf.k):
            h = hash32(col, seed=i).bitwiseAND(F.lit(bf.m - 1))
            word = F.element_at(words_lit, (F.shiftright(h, 6) + 1).cast("int"))
            cond = cond & (F.getbit(word, h.bitwiseAND(F.lit(63))) == 1)
        return cond
    if mode == "broadcast":
        import numpy as np
        from pyspark.sql import SparkSession

        sess = spark or SparkSession.getActiveSession()
        bc = sess.sparkContext.broadcast(
            (np.array(bf.words, dtype=np.int64).astype(np.uint64), bf.m, bf.k)
        )

        @F.pandas_udf("boolean")
        def _member(s: pd.Series) -> pd.Series:
            words, m, k = bc.value
            out = []
            for v in s:
                ok = True
                for i in range(k):
                    h = int(hashlib.md5(f"{i}:{v}".encode()).hexdigest()[:8], 16) & (m - 1)
                    if not (int(words[h >> 6]) >> (h & 63)) & 1:
                        ok = False
                        break
                out.append(ok)
            return pd.Series(out)

        return _member(col)
    raise ValueError(f"bloom_might_contain: unknown mode {mode!r}")


def bloom_semi_join(
    big: DataFrame,
    keys: DataFrame,
    big_col: str,
    key_col: str | None = None,
    bf: BloomFilter | None = None,
    exact: bool = True,
    mode: str = "auto",
    bits_per_key: int = 10,
) -> DataFrame:
    """Semi join with a Bloom prefilter: the big side is pruned during its
    scan (narrow, codegen) and only plausible matches reach the exact
    left_semi join that removes false positives. With exact=False the
    (bounded-FP) prefilter output is returned directly — the streaming-
    friendly form when a ~1% admission error is acceptable and the join
    shuffle is not.

    Pass a prebuilt `bf` to amortize the filter across several joins."""
    key_col = key_col or big_col
    if bf is None:
        bf = bloom_build(keys.select(key_col).distinct(), key_col, bits_per_key)
    pre = big.where(bloom_might_contain(bf, big_col, mode=mode, spark=big.sparkSession))
    if not exact:
        return pre
    kk = keys.select(F.col(key_col).alias(big_col)).distinct()
    return pre.join(kk, on=big_col, how="left_semi")


def bloom_anti_join(
    big: DataFrame,
    keys: DataFrame,
    big_col: str,
    key_col: str | None = None,
    bf: BloomFilter | None = None,
    mode: str = "auto",
    bits_per_key: int = 10,
) -> DataFrame:
    """Anti join with a Bloom prefilter. Bloom filters have no false
    negatives, so rows FAILING the membership test are definite non-members
    and bypass the join entirely; only the plausible sliver pays the exact
    left_anti join. The union reads the big side twice — at scale prefer
    caching the scan or accept it: both branches are narrow.

    Always exact (the anti join removes the false-positive admissions)."""
    key_col = key_col or big_col
    if bf is None:
        bf = bloom_build(keys.select(key_col).distinct(), key_col, bits_per_key)
    might = bloom_might_contain(bf, big_col, mode=mode, spark=big.sparkSession)
    definite_out = big.where(~might)
    kk = keys.select(F.col(key_col).alias(big_col)).distinct()
    confirmed_out = big.where(might).join(kk, on=big_col, how="left_anti")
    return definite_out.unionByName(confirmed_out)
