"""Live-Postgres round-trip validation of the S9/J1 write-back mapping.

SCALE.md ("Postgres write-back mapping") pins the reference's COPY-temp +
UPDATE-join flow (lantern_cli/src/embeddings/mod.rs:209-384) step-for-step;
`merge_embeddings` is the DataFrame truth the live path must reproduce. No
PG exists in the build sandbox, so this script is the validation HOOK
(r7 verdict item 8): point it at a real database and it

 1. seeds a destination table (pk, content, embedding NULL) over JDBC,
 2. writes the embedded delta to a temp table (mapping step 2 — Spark's
    batched JDBC insert standing in for COPY FROM STDIN),
 3. issues the reference's UPDATE-join through a driver-side JDBC statement
    (mapping step 3 — Spark JDBC has no MERGE pushdown),
 4. reads the table back and asserts row-count + value-hash parity with
    `merge_embeddings(dest, delta)` computed purely DataFrame-side.

Usage:
    LANTERN_SPARK_DB_URL='jdbc:postgresql://host:5432/db' \
    LANTERN_SPARK_DB_USER=... LANTERN_SPARK_DB_PASSWORD=... \
    python tools/jdbc_roundtrip.py

Requires the PostgreSQL JDBC driver on the Spark classpath
(spark.jars.packages=org.postgresql:postgresql:42.7.x or a local jar).
Exit 0 = parity holds; the same check is exposed as the env-gated pytest
`tests/test_jdbc_roundtrip.py` (skipped when the URL is unset).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEST = "lantern_spark_rt_dest"
TMP = "lantern_spark_rt_tmp"


def _jdbc_props(spark):
    url = os.environ["LANTERN_SPARK_DB_URL"]
    props = spark._jvm.java.util.Properties()
    user = os.environ.get("LANTERN_SPARK_DB_USER")
    pw = os.environ.get("LANTERN_SPARK_DB_PASSWORD")
    if user:
        props.setProperty("user", user)
    if pw:
        props.setProperty("password", pw)
    return url, props


def _exec_sql(spark, sql: str) -> None:
    """Driver-side statement over the same JDBC driver Spark uses (the
    UPDATE-join of mapping step 3; also DDL/cleanup)."""
    url, props = _jdbc_props(spark)
    conn = spark._jvm.java.sql.DriverManager.getConnection(url, props)
    try:
        st = conn.createStatement()
        try:
            st.execute(sql)
        finally:
            st.close()
    finally:
        conn.close()


def _reader(spark, table: str):
    r = (spark.read.format("jdbc")
         .option("url", os.environ["LANTERN_SPARK_DB_URL"])
         .option("dbtable", table))
    if os.environ.get("LANTERN_SPARK_DB_USER"):
        r = r.option("user", os.environ["LANTERN_SPARK_DB_USER"])
    if os.environ.get("LANTERN_SPARK_DB_PASSWORD"):
        r = r.option("password", os.environ["LANTERN_SPARK_DB_PASSWORD"])
    return r


def _writer(df, table: str, mode: str = "overwrite"):
    w = (df.write.format("jdbc")
         .option("url", os.environ["LANTERN_SPARK_DB_URL"])
         .option("dbtable", table)
         # COPY-class throughput: large insert batches (mapping step 2 note)
         .option("batchsize", 10_000)
         .mode(mode))
    if os.environ.get("LANTERN_SPARK_DB_USER"):
        w = w.option("user", os.environ["LANTERN_SPARK_DB_USER"])
    if os.environ.get("LANTERN_SPARK_DB_PASSWORD"):
        w = w.option("password", os.environ["LANTERN_SPARK_DB_PASSWORD"])
    return w


def run_roundtrip(spark) -> dict:
    """Returns {'rows_match': bool, 'hash_match': bool, ...}; raises on any
    JDBC failure (a broken connection must not report success)."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.embeddings.pipeline import embed_column, merge_embeddings
    from tests.oracle_check import frame_fingerprint

    rows = [(i, f"document number {i} about spark and vectors") for i in range(64)]
    dest = spark.createDataFrame(rows, "pk int, content string")
    # embed the even half only — the merge must touch those rows and leave
    # the odd half's NULL embedding intact (null-preserving left join)
    delta = embed_column(
        dest.where(F.col("pk") % 2 == 0), "content", "embedding",
        model="hash/test-model",
    )
    expected = merge_embeddings(
        dest.withColumn("embedding", F.lit(None).cast("array<float>")),
        delta.select("pk", "embedding"), "pk", "embedding",
    )

    # live path: seed dest (embedding NULL), COPY-analog the delta, UPDATE-join
    _exec_sql(spark, f"DROP TABLE IF EXISTS {DEST}")
    _exec_sql(spark, f"DROP TABLE IF EXISTS {TMP}")
    _exec_sql(spark, f"CREATE TABLE {DEST} (pk INT PRIMARY KEY, content TEXT, "
                     f"embedding REAL[])")
    _writer(dest, DEST, mode="append").save()
    _writer(delta.select("pk", "embedding"), TMP).save()
    _exec_sql(spark, f"UPDATE {DEST} d SET embedding = t.embedding "
                     f"FROM {TMP} t WHERE d.pk = t.pk")

    got = _reader(spark, DEST).load().select("pk", "content", "embedding")
    g = frame_fingerprint(got.toPandas())
    e = frame_fingerprint(expected.select("pk", "content", "embedding").toPandas())
    _exec_sql(spark, f"DROP TABLE IF EXISTS {DEST}")
    _exec_sql(spark, f"DROP TABLE IF EXISTS {TMP}")
    return {
        "rows_match": g[0] == e[0],
        "hash_match": g[2] == e[2],
        "live": g,
        "dataframe": e,
    }


def main() -> int:
    if not os.environ.get("LANTERN_SPARK_DB_URL"):
        print("LANTERN_SPARK_DB_URL unset — nothing to validate (this hook "
              "runs the day an environment provides PostgreSQL + JDBC jar)")
        return 0
    from lantern_extras_spark import get_spark

    spark = get_spark("jdbc-roundtrip")
    try:
        res = run_roundtrip(spark)
    finally:
        spark.stop()
    print(res)
    return 0 if res["rows_match"] and res["hash_match"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
