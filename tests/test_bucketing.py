"""Bucketed co-located joins: pre-bucketing fact tables on the join key removes
the shuffle from every subsequent join on that key — the storage-layout lever
for repeated 100 TB joins (complements AQE, which can only optimize the
shuffle it's already doing)."""

import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.plans import plan_summary


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    warehouse = spark.conf.get("spark.sql.warehouse.dir", "")
    orders = spark.range(0, 10000).select(
        F.col("id").alias("o_orderkey"), (F.col("id") % 100).alias("o_custkey")
    )
    lineitem = spark.range(0, 30000).select(
        (F.col("id") % 10000).alias("l_orderkey"), (F.rand(1) * 100).alias("l_price")
    )
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").saveAsTable("b_orders")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").saveAsTable("b_lineitem")

    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bl.join(bo, bl.l_orderkey == bo.o_orderkey).groupBy("o_custkey").agg(
        F.sum("l_price").alias("revenue")
    )
    s = plan_summary(joined)
    # bucketed sides co-located on the join key: the join itself needs no
    # exchange; only the final groupBy aggregation may shuffle
    assert s.n_shuffles <= 1, s.text
    assert joined.count() == 100
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
