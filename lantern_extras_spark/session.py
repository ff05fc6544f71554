"""SparkSession factory with scale-appropriate defaults.

Local testing runs on local[N]; the same config block is what we would ship for a
multi-executor cluster — AQE handles runtime re-planning (skew joins, coalescing
shuffle partitions), Arrow makes the pandas-UDF hot paths cheap, and UTC keeps
timestamp semantics identical to the DuckDB correctness oracle.
"""

from __future__ import annotations

import os
import tempfile
import zipfile

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _ship_package(spark: SparkSession) -> None:
    """Make this package importable on executors regardless of driver cwd.

    Zips `lantern_extras_spark/` once per session and `addPyFile`s it — the
    standard deployment path for python deps on a real cluster; required so
    cloudpickled mapInPandas/pandas_udf closures can resolve module references
    in worker processes."""
    if getattr(spark, "_lantern_pkg_shipped", False):
        return
    pkg_dir = os.path.dirname(os.path.abspath(__file__))
    zpath = os.path.join(tempfile.gettempdir(), "lantern_extras_spark_pkg.zip")
    with zipfile.ZipFile(zpath, "w") as zf:
        for root, _dirs, files in os.walk(pkg_dir):
            if "__pycache__" in root:
                continue
            for f in files:
                # .txt rides along for data files the package loads at runtime
                # (e.g. functions/bpe_vocab.txt — executors resolve it relative
                # to the module path inside the shipped zip)
                if f.endswith((".py", ".txt")):
                    full = os.path.join(root, f)
                    rel = os.path.join("lantern_extras_spark", os.path.relpath(full, pkg_dir))
                    zf.write(full, rel)
    spark.sparkContext.addPyFile(zpath)
    spark._lantern_pkg_shipped = True


def get_spark(app_name: str = "lantern-extras-spark", shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or fetch) a SparkSession tuned for this engine.

    Settings that matter at 100 TB just as much as on local[32]:
    - AQE on: runtime shuffle-partition coalescing + skew-join splitting.
    - Arrow on: every pandas UDF / toPandas crosses the JVM/Python boundary in
      columnar batches instead of pickled rows.
    - session timezone UTC: deterministic timestamp arithmetic (matches oracle).
    - parquet filter pushdown + vectorized reader stay on (defaults, made explicit).
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.parquet.filterPushdown", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # r13 (guide §3.1, measured): a GLOBAL preferSortMergeJoin=false was
        # tried and REVERTED — paired in-session A/B over the SMJ-carrying
        # bench queries was neutral-to-noisy (0.82-1.17x medians, mins ~1.0)
        # while the one real winner (salted_join, 0.39x isolated) gets an
        # explicit SHUFFLE_HASH hint at its call site instead: the join whose
        # build side is bounded BY CONSTRUCTION is hinted; everything else
        # keeps the planner default. Env hatch kept for future A/B.
        .config(
            "spark.sql.join.preferSortMergeJoin",
            os.environ.get("SPARK_GRAFT_PREFER_SMJ", "true"),
        )
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    spark = builder.getOrCreate()
    _ship_package(spark)
    return spark


def load_tables(spark: SparkSession, sf_dir: str, names: tuple[str, ...] | None = None) -> dict:
    """Load the standard parquet tables of a test scale-factor directory.

    `events` carries TIMESTAMP(NANOS), which Spark's parquet reader rejects —
    it is read as long nanos and truncated to a microsecond timestamp
    (identical to DuckDB's ns→us cast)."""
    from pyspark.sql import functions as F

    names = names or (
        "region",
        "nation",
        "customer",
        "supplier",
        "part",
        "orders",
        "lineitem",
        "events",
        "documents",
        "embeddings",
    )
    out = {}
    for n in names:
        if n == "events":
            # TIMESTAMP(NANOS) generations need the nanos→long→micros bridge;
            # plain-micros generations read as timestamp directly.
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
            ev = spark.read.parquet(f"{sf_dir}/events.parquet")
            if dict(ev.dtypes)["ts"] in ("bigint", "long"):
                ev = ev.withColumn("ts", F.expr("timestamp_micros(ts div 1000)"))
            else:
                # plain-micros parquet reads as TIMESTAMP_NTZ; consumers call
                # unix_micros (TIMESTAMP only). Session tz is UTC → cast is
                # value-preserving.
                ev = ev.withColumn("ts", F.col("ts").cast("timestamp"))
            out[n] = ev
        else:
            out[n] = spark.read.parquet(f"{sf_dir}/{n}.parquet")
    return out
