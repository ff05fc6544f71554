"""Count-Min sketch: fixed-size frequency summaries with one-sided error.

Reference parity: the reference keeps no CMS, but its daemon/usage layer
tracks per-key counters in bounded state (`lantern_cli/src/daemon` row-count
accounting); this module is the engine's bounded-memory generalization for
corpus-scale frequency questions — the training-pipeline companion to the
exact `textstats.heavy_hitters` (which answers "the top K exactly") for the
cases where the *keys arrive later* or sketches from disjoint corpus shards /
streaming micro-batches must be merged by addition.

Why a sketch in a batch engine at all: a groupBy(token) over a 100 TB corpus
shuffles the full vocabulary (billions of keys for URLs/ids). `cms_build`
shuffles at most depth*width cells per map task regardless of key
cardinality — the map-side combine collapses every partition to the sketch
size, so the reduce stage is O(depth*width*partitions) no matter the data.
Estimates are deterministic (portable md5 hashing) and one-sided:
est >= true count always; est <= true + eps*N with prob 1-delta for
width = ceil(e/eps), depth = ceil(ln(1/delta)) (Cormode & Muthukrishnan 2005).

All expressions are engine-portable (md5 bucket hashing) so the DuckDB
oracle replays the sketch bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lantern_extras_spark.functions.hashing import hash32

__all__ = ["cms_build", "cms_estimate", "cms_merge"]


def _cells(key: Column, depth: int, width: int) -> Column:
    """Array of (row, bucket) cells for one key — row r uses md5 seeded
    'cms{r}', bucket = hash % width (hash32 is unsigned, so % is safe)."""
    return F.array(
        *[
            F.struct(
                F.lit(r).alias("r"),
                (hash32(key, seed=f"cms{r}") % width).alias("b"),
            )
            for r in range(depth)
        ]
    )


def cms_build(
    df: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    weight_col: str | None = None,
) -> DataFrame:
    """Build a Count-Min sketch over a key column → (r, b, c) cell rows.

    One narrow pass: each input row contributes `depth` (row, bucket)
    increments; the partial aggregation collapses every map task to at most
    depth*width cells before the (only) shuffle, so the exchange carries
    O(depth*width*tasks) rows however large the corpus or vocabulary is.

    `weight_col` counts that column's sum instead of row occurrences
    (e.g. pre-aggregated (token, n) inputs — equivalent by CMS linearity).
    """
    if depth < 1 or width < 1:
        raise ValueError(f"depth/width must be >= 1, got {depth}/{width}")
    cell = F.explode(_cells(F.col(key_col), depth, width)).alias("cell")
    w = F.col(weight_col).cast("bigint") if weight_col else F.lit(1).cast("bigint")
    return (
        df.select(cell, w.alias("__w"))
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))
        .agg(F.sum("__w").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width) by cell-wise
    addition — the property that lets disjoint corpus shards (or streaming
    micro-batches) sketch independently and combine afterwards."""
    if not sketches:
        raise ValueError("cms_merge needs at least one sketch")
    u = sketches[0]
    for s in sketches[1:]:
        u = u.unionByName(s)
    return u.groupBy("r", "b").agg(F.sum("c").alias("c"))


def cms_estimate(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
    est_col: str = "cms_est",
) -> DataFrame:
    """Point-query the sketch for each key: min over the key's depth cells
    (absent cell = 0). The sketch is depth*width rows by construction, so it
    is always broadcast — estimating any number of keys is one narrow pass
    over the key frame plus a broadcast hash join.
    """
    e = (
        keys.select(key_col, F.explode(_cells(F.col(key_col), depth, width)).alias("cell"))
        .select(key_col, F.col("cell.r").alias("r"), F.col("cell.b").alias("b"))
    )
    j = e.join(F.broadcast(sketch), ["r", "b"], "left")
    return (
        j.withColumn("c", F.coalesce(F.col("c"), F.lit(0).cast("bigint")))
        .groupBy(key_col)
        .agg(F.min("c").alias(est_col))
    )
