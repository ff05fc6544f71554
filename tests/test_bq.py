"""Unit tests for operators/bq.py: packing parity (packed popcount == unpacked
bit-difference count), Python/engine encoder parity, exactness at full
oversample, multi-query/single-query agreement, and guards."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.operators import bq as BQ

DIM = 48  # deliberately not a multiple of 32: exercises the short final word


@pytest.fixture(scope="module")
def emb_df(spark):
    rng = np.random.RandomState(3)
    rows = [(i, [float(x) for x in rng.randn(DIM)]) for i in range(120)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>").cache()


def test_packed_hamming_equals_bit_count(spark, emb_df):
    mids = BQ.bq_train(emb_df)
    coded = BQ.bq_encode(emb_df, mids, out_col="bq")
    qv = [float(x) for x in np.random.RandomState(9).randn(DIM)]
    qwords = BQ.bq_encode_py(qv, mids)
    got = {
        r["vec_id"]: r["h"]
        for r in coded.select(
            "vec_id", BQ.bq_hamming_col("bq", qwords).alias("h")
        ).collect()
    }
    qbits = np.array([1 if v > m else 0 for v, m in zip(qv, mids)])
    for r in emb_df.collect():
        bits = np.array([1 if v > m else 0 for v, m in zip(r["embedding"], mids)])
        assert got[r["vec_id"]] == int((bits != qbits).sum())


def test_python_encoder_matches_engine(spark, emb_df):
    mids = BQ.bq_train(emb_df)
    coded = {r["vec_id"]: r["bq"] for r in BQ.bq_encode(emb_df, mids, out_col="bq").collect()}
    for r in emb_df.collect():
        assert list(coded[r["vec_id"]]) == BQ.bq_encode_py(r["embedding"], mids), r["vec_id"]


def test_full_oversample_is_exact(spark, emb_df):
    """When k·oversample covers the whole corpus the two-stage search must
    equal exact l2sq top-k (the Hamming prune drops nothing)."""
    from lantern_extras_spark.functions.vector import l2sq_dist

    qv = [float(x) for x in np.random.RandomState(5).randn(DIM)]
    got = BQ.bq_search(emb_df, qv, k=10, oversample=12, dist_scale=None).collect()
    qcol = F.lit(qv).cast("array<double>")
    exact = (
        emb_df.select("vec_id", l2sq_dist(F.col("embedding"), qcol).alias("d"))
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    )
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]
    for g, e in zip(got, exact):
        assert g["l2sq_distance"] == pytest.approx(e["d"], rel=1e-12)


def test_knn_join_matches_single_query(spark, emb_df):
    mids = BQ.bq_train(emb_df)
    qv = [float(x) for x in np.random.RandomState(5).randn(DIM)]
    single = BQ.bq_search(emb_df, qv, mids=mids, k=5, oversample=4).collect()
    coded = BQ.bq_encode(emb_df, mids, out_col="bq")
    queries = spark.createDataFrame([(0, qv)], "query_id long, query_vec array<double>")
    multi = BQ.bq_knn_join(coded, queries, mids, k=5, oversample=4).collect()
    assert [(r["vec_id"], r["hamming"], r["l2sq_distance"]) for r in single] == [
        (r["vec_id"], r["hamming"], r["l2sq_distance"]) for r in multi
    ]


def test_recall_reasonable_and_exact_at_full_oversample(spark, emb_df):
    rec = BQ.bq_recall_vs_exact(emb_df, n_queries=5, k=5, oversample=24)
    assert rec == 100.0  # oversample covers the corpus -> exact (percent)
    rec4 = BQ.bq_recall_vs_exact(emb_df, n_queries=5, k=5, oversample=4)
    assert 0.0 <= rec4 <= 100.0


def test_guards(spark, emb_df):
    with pytest.raises(ValueError, match="query dim"):
        BQ.bq_search(emb_df, [0.0] * (DIM + 1), mids=[0.0] * DIM)
    empty = emb_df.where("vec_id < 0")
    with pytest.raises(ValueError, match="empty input"):
        BQ.bq_train(empty)
    ragged = spark.createDataFrame(
        [(0, [0.0, 1.0]), (1, [0.0, 1.0, 2.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        BQ.bq_train(ragged)


# --- MRL (operators/mrl.py) — shares the fixture and invariants shape ------

def test_mrl_full_prefix_is_exact(spark, emb_df):
    """d_prefix = dim makes stage one the exact distance, so the two-stage
    result must equal exact top-k regardless of oversample."""
    from lantern_extras_spark.functions.vector import l2sq_dist
    from lantern_extras_spark.operators import mrl as MRL

    qv = [float(x) for x in np.random.RandomState(5).randn(DIM)]
    got = MRL.mrl_search(emb_df, qv, d_prefix=DIM, k=10, oversample=1,
                         dist_scale=None).collect()
    qcol = F.lit(qv).cast("array<double>")
    exact = (
        emb_df.select("vec_id", l2sq_dist(F.col("embedding"), qcol).alias("d"))
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    )
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_mrl_full_oversample_is_exact(spark, emb_df):
    """Even a 1-dim prefix is exact when k*oversample covers the corpus."""
    from lantern_extras_spark.functions.vector import l2sq_dist
    from lantern_extras_spark.operators import mrl as MRL

    qv = [float(x) for x in np.random.RandomState(6).randn(DIM)]
    got = MRL.mrl_search(emb_df, qv, d_prefix=1, k=10, oversample=12,
                         dist_scale=None).collect()
    qcol = F.lit(qv).cast("array<double>")
    exact = (
        emb_df.select("vec_id", l2sq_dist(F.col("embedding"), qcol).alias("d"))
        .orderBy(F.col("d").asc(), F.col("vec_id").asc())
        .limit(10)
        .collect()
    )
    assert [r["vec_id"] for r in got] == [r["vec_id"] for r in exact]


def test_mrl_join_matches_single_and_recall(spark, emb_df):
    from lantern_extras_spark.operators import mrl as MRL

    qv = [float(x) for x in np.random.RandomState(5).randn(DIM)]
    single = MRL.mrl_search(emb_df, qv, d_prefix=12, k=5, oversample=4).collect()
    queries = spark.createDataFrame([(0, qv)], "query_id long, query_vec array<double>")
    multi = MRL.mrl_knn_join(emb_df, queries, d_prefix=12, k=5, oversample=4).collect()
    assert [(r["vec_id"], r["prefix_distance"], r["l2sq_distance"]) for r in single] == [
        (r["vec_id"], r["prefix_distance"], r["l2sq_distance"]) for r in multi
    ]
    rec = MRL.mrl_recall_vs_exact(emb_df, d_prefix=DIM, n_queries=4, k=5, oversample=1)
    assert rec == 100.0  # full prefix -> exact


def test_mrl_guard(spark, emb_df):
    from lantern_extras_spark.operators import mrl as MRL

    with pytest.raises(ValueError, match="d_prefix"):
        MRL.mrl_search(emb_df, [0.0] * DIM, d_prefix=0)
    with pytest.raises(ValueError, match="d_prefix"):
        MRL.mrl_search(emb_df, [0.0] * DIM, d_prefix=DIM + 1)
