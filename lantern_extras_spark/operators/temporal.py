"""Temporal joins Spark lacks as built-ins: as-of join and range join.

These are composition operators (brief: "implement as a composition of existing
DataFrame ops if semantics allow") — no UDFs, no driver loops:

- **as-of join** (backward/forward, optional tolerance): union-and-window
  formulation. Tag both inputs, union, window per key ordered by (ts, tag) and
  carry the last-seen right payload onto each left row. ONE shuffle on the key
  — no range cross-product, no per-row probing; at 100 TB this is the join
  plan you want (both sides co-partitioned by key once).
- **range join** (left.point ∈ [right.lo, right.hi]): two strategies —
  "broadcast" nested-loop for a small right side (Catalyst turns the
  inequality into a BroadcastNestedLoopJoin), and "bin" bucketing for two big
  sides: overlap-join via an explode of each right interval onto fixed-width
  bins and an equi-join on bin id, turning O(n·m) into O(matching bins).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str = "ts",
    by: list[str] | None = None,
    direction: str = "backward",
    tolerance_us: int | None = None,
    right_prefix: str = "r_",
) -> DataFrame:
    """For each left row, attach the most recent right row with right.on ≤
    left.on (backward; ties match) within the same `by` keys — pandas
    merge_asof / DuckDB ASOF JOIN semantics, as a single-shuffle window plan.

    direction="forward" matches the nearest right.on ≥ left.on instead.
    `tolerance_us` (microseconds) voids matches farther than the bound.
    Right payload columns arrive prefixed; unmatched left rows keep nulls
    (LEFT-join semantics).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    by = by or []
    rcols = [c for c in right.columns if c != on and c not in by]

    # Tag order decides tie behavior at equal timestamps: the right row must be
    # visible to a same-ts left row, so right sorts first (backward) / last
    # reversed (forward handled by inverting the timestamp).
    sign = 1 if direction == "backward" else -1
    # cast("timestamp") is a no-op for TIMESTAMP inputs and makes TIMESTAMP_NTZ
    # parquet columns acceptable to unix_micros (value-preserving under UTC tz).
    _us = lambda c: F.unix_micros(F.col(c).cast("timestamp"))  # noqa: E731
    ts_key = (_us(on) * sign).alias("__ts_key")

    l_tagged = left.select(
        *[F.col(c) for c in left.columns],
        ts_key,
        F.lit(1).alias("__src"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in rcols],
        F.lit(None).cast("long").alias("__r_ts"),
    )
    r_tagged = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left.columns if c not in by and c != on],
        *[F.col(c) for c in by],
        F.col(on),
        ts_key,
        F.lit(0).alias("__src"),
        *[F.col(c).alias(f"__r_{c}") for c in rcols],
        _us(on).alias("__r_ts"),
    ).select(*[F.col(c) for c in l_tagged.columns])  # align column order

    unioned = l_tagged.unionByName(r_tagged)
    w = (
        Window.partitionBy(*by)
        .orderBy(F.col("__ts_key").asc(), F.col("__src").asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    filled = unioned.select(
        *[F.col(c) for c in left.columns],
        F.col("__src"),
        _us(on).alias("__l_ts"),
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in rcols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"),
    ).where(F.col("__src") == 1)

    within = F.lit(True)
    if tolerance_us is not None:
        delta = (F.col("__l_ts") - F.col("__m_ts")) * (1 if direction == "backward" else -1)
        within = F.col("__m_ts").isNotNull() & (delta <= tolerance_us)

    out = filled.select(
        *[F.col(c) for c in left.columns],
        *[
            F.when(within, F.col(f"__m_{c}")).alias(f"{right_prefix}{c}")
            for c in rcols
        ],
        F.when(within, F.col("__m_ts")).alias(f"{right_prefix}{on}_us"),
    )
    return out


def range_join(
    left: DataFrame,
    right: DataFrame,
    point: str,
    lo: str,
    hi: str,
    extra_on: Column | None = None,
    strategy: str = "broadcast",
    bin_width: int | None = None,
    how: str = "inner",
) -> DataFrame:
    """Join left rows whose `point` falls in right's [lo, hi] interval
    (inclusive). Columns lo/hi/point must be numeric (cast timestamps to
    epoch first).

    - strategy="broadcast": right is small → broadcast nested-loop with the
      range predicate (plus optional `extra_on` equi/θ condition).
    - strategy="bin": both sides large → pick `bin_width` (≈ median interval
      width), explode each interval over the bins it covers, equi-join on bin,
      re-check the exact range. Shuffles on bin id only.
    """
    cond = (F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi))
    if extra_on is not None:
        cond = cond & extra_on
    if strategy == "broadcast":
        return left.join(F.broadcast(right), cond, how)
    if strategy != "bin":
        raise ValueError(f"unknown strategy {strategy!r}")
    if not bin_width or bin_width <= 0:
        raise ValueError("bin strategy requires a positive bin_width")

    lb = left.withColumn("__bin", (F.col(point) / bin_width).cast("long"))
    rb = right.withColumn(
        "__bin",
        F.explode(
            F.sequence((F.col(lo) / bin_width).cast("long"), (F.col(hi) / bin_width).cast("long"))
        ),
    )
    joined = lb.join(rb, "__bin").where(cond).drop("__bin")
    return joined


def funnel(
    df: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered k-step funnel over an event stream: one summary row with
    n_users plus, per stage, the count of users whose FIRST occurrence of
    that stage happened strictly AFTER their first occurrence of the
    previous reached stage — the sequencing constraint that separates a
    funnel from plain per-type counts (a purchase before any view is not a
    converted view).

    Scale shape: ONE conditional-min aggregation per stage over ONE scan of
    the events (no self-joins, no window over the raw stream, no per-stage
    passes); the per-user frame is k integers wide; the final reduce is a
    single-row agg. At 100 TB that is a map-side-combining groupBy on
    user_id and nothing else.

    Column names: n_users, then n_<stage1>, n_<stage2>_after, ... (first
    stage needs no predecessor). The engine-portable declarative form is
    replayed by the DuckDB oracle (`q_event_funnel` uses the 3-stage
    view→click→purchase instance)."""
    if len(stages) < 2:
        raise ValueError("funnel needs at least 2 stages")
    t = F.unix_micros(F.col(ts_col))
    firsts = df.groupBy(user_col).agg(
        *[
            F.min(F.when(F.col(type_col) == s, t)).alias(f"__t{i}")
            for i, s in enumerate(stages)
        ]
    )
    reached_prev = F.col("__t0").isNotNull()
    flags = [reached_prev.alias(f"__r0")]
    for i in range(1, len(stages)):
        reached_prev = (
            reached_prev
            & F.col(f"__t{i}").isNotNull()
            & (F.col(f"__t{i}") > F.col(f"__t{i-1}"))
        )
        flags.append(reached_prev.alias(f"__r{i}"))
    staged = firsts.select(F.col(user_col), *flags)
    aggs = [F.count("*").cast("bigint").alias("n_users")]
    aggs.append(F.sum(F.col("__r0").cast("bigint")).alias(f"n_{stages[0]}"))
    for i in range(1, len(stages)):
        aggs.append(
            F.sum(F.col(f"__r{i}").cast("bigint")).alias(f"n_{stages[i]}_after")
        )
    return staged.agg(*aggs)
