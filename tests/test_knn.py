"""kNN operators: strategy equivalence, ground truth, recall semantics."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.operators import knn as K


@pytest.mark.parametrize("metric", ["l2sq", "cos", "dot"])
def test_partial_equals_crossjoin(spark, emb, metric):
    q = emb.where("vec_id < 4").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    data = emb.where("vec_id >= 4")
    a = K.knn_join(data, q, k=7, metric=metric, strategy="partial", dist_scale=6)
    b = K.knn_join(data, q, k=7, metric=metric, strategy="crossjoin", dist_scale=6)
    ra = [(r["query_id"], r["rank"], r["vec_id"]) for r in a.orderBy("query_id", "rank").collect()]
    rb = [(r["query_id"], r["rank"], r["vec_id"]) for r in b.orderBy("query_id", "rank").collect()]
    assert ra == rb and len(ra) == 4 * 7


def test_knn_matches_numpy_bruteforce(spark, emb):
    rows = emb.orderBy("vec_id").collect()
    X = np.array([r["embedding"] for r in rows], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in rows])
    q = emb.where("vec_id = 0").select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec")
    )
    got = [
        r["vec_id"]
        for r in K.knn_join(emb, q, k=5, metric="l2sq").orderBy("rank").collect()
    ]
    d = ((X - X[0]) ** 2).sum(axis=1)
    expect = ids[np.lexsort((ids, d))][:5].tolist()
    assert got == expect


def test_topk_single_query(emb):
    first = emb.where("vec_id = 0").first()["embedding"]
    out = K.topk(emb, list(first), k=3, metric="l2sq", vec_col="embedding").collect()
    assert out[0]["vec_id"] == 0 and out[0]["distance"] == pytest.approx(0.0, abs=1e-9)
    assert len(out) == 3


def test_ground_truth_and_recall(spark, emb):
    gt = K.ground_truth(emb, n_queries=5, k=4, metric="l2sq", seed=3)
    rows = gt.collect()
    assert len(rows) == 5
    # nearest neighbor of a vector is itself (distance 0)
    assert all(r["neighbors"][0] == r["id"] for r in rows)
    truth = gt.select("id", "neighbors")
    assert K.recall(truth, truth, 4) == 100.0
    # drop one neighbor from each -> recall 75, exactly, truncated not rounded
    broken = gt.select("id", F.slice("neighbors", 1, 3).alias("neighbors"))
    assert K.recall(truth, broken, 4) == 75.0


def test_recall_truncates_two_dp(spark):
    # 2/3 recall over k=3 = 66.666..% -> truncation gives 66.66 (reference
    # index_autotune/mod.rs:249-252 truncates, not rounds)
    t = spark.createDataFrame([(1, [1, 2, 3])], "id long, neighbors array<long>")
    r = spark.createDataFrame([(1, [1, 2, 9])], "id long, neighbors array<long>")
    assert K.recall(t, r, 3) == 66.66


def test_bad_metric_raises_eagerly(emb):
    q = emb.limit(1).select(F.col("vec_id").alias("query_id"), F.col("embedding").alias("query_vec"))
    with pytest.raises(ValueError, match="unknown metric"):
        K.knn_join(emb, q, metric="euclid")
