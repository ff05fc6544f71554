"""SQ8 scalar quantization: bounds, encode error bound, clamping, recall
against exact kNN, and the TakeOrderedAndProject top-k plan."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.operators import sq as SQ


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def test_sq8_train_exact_bounds(spark, emb):
    mins, maxs = SQ.sq8_train(emb)
    X = np.array([r["embedding"] for r in emb.collect()], dtype=np.float64)
    assert np.allclose(mins, X.min(axis=0))
    assert np.allclose(maxs, X.max(axis=0))


def test_sq8_encode_error_bound_and_clamp(spark, emb):
    """Dequantization error is <= step/2 per dimension on in-range values;
    out-of-range values (new data under old bounds) clamp to code 0/255."""
    mins, maxs = SQ.sq8_train(emb)
    coded = SQ.sq8_encode(emb, mins, maxs, drop_vec=False)
    for r in coded.limit(100).collect():
        for i, (c, v) in enumerate(zip(r["sq8"], r["embedding"])):
            assert 0 <= c <= 255
            step = (maxs[i] - mins[i]) / 255.0
            dq = mins[i] + c * step
            assert abs(dq - float(v)) <= step / 2 + 1e-9, (i, c, v)
    wild = spark.createDataFrame(
        [(0, [1e6] * len(mins)), (1, [-1e6] * len(mins))],
        "vec_id long, embedding array<double>",
    )
    out = {r["vec_id"]: r["sq8"] for r in SQ.sq8_encode(wild, mins, maxs).collect()}
    assert all(c == 255 for c in out[0]) and all(c == 0 for c in out[1])


def test_sq8_constant_dim_roundtrip(spark):
    """max == min dims code to 0 and dequantize back exactly (no div-zero)."""
    df = spark.createDataFrame(
        [(i, [7.5, float(i)]) for i in range(10)], "vec_id long, embedding array<double>"
    )
    mins, maxs = SQ.sq8_train(df)
    assert mins[0] == maxs[0] == 7.5
    codes = {r["vec_id"]: r["sq8"] for r in SQ.sq8_encode(df, mins, maxs).collect()}
    assert all(c[0] == 0 for c in codes.values())
    top = SQ.sq8_topk(SQ.sq8_encode(df, mins, maxs), mins, maxs, [7.5, 0.0], k=1).first()
    assert top["vec_id"] == 0 and abs(top["distance"]) < 1e-9


def test_sq8_train_rejects_ragged(spark):
    df = spark.createDataFrame(
        [(0, [1.0, 2.0]), (1, [1.0, 2.0, 3.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="ragged"):
        SQ.sq8_train(df)


def test_sq8_recall_and_topk_consistency(spark, emb):
    """SQ8 recall vs exact float kNN stays high on real embeddings, and the
    single-query topk agrees with the joined path for the same query."""
    rec = SQ.sq8_recall_vs_exact(emb, n_queries=8, k=10)
    assert rec >= 95.0, rec
    mins, maxs = SQ.sq8_train(emb)
    coded = SQ.sq8_encode(emb, mins, maxs)
    q = [float(x) for x in emb.orderBy("vec_id").first()["embedding"]]
    single = [(r["vec_id"], round(r["distance"], 9)) for r in
              SQ.sq8_topk(coded, mins, maxs, q, k=5).collect()]
    queries = spark.createDataFrame([(0, q)], "query_id long, query_vec array<double>")
    joined = [(r["vec_id"], round(r["distance"], 9)) for r in
              SQ.sq8_knn_join(coded, queries, mins, maxs, k=5)
              .orderBy("rank").collect()]
    assert single == joined


def test_sq8_topk_plan_is_partial_topk(spark, emb):
    """orderBy(limit) must plan TakeOrderedAndProject — per-partition partial
    top-k, never a global sort of the scored corpus."""
    from lantern_extras_spark.plans import plan_summary

    mins, maxs = SQ.sq8_train(emb)
    coded = SQ.sq8_encode(emb, mins, maxs)
    s = plan_summary(SQ.sq8_topk(coded, mins, maxs, [0.0] * len(mins)))
    assert "TakeOrderedAndProject" in s.text, s.text


def test_sq8_pack_parquet_roundtrip(spark, emb, tmp_path):
    """Byte storage form round-trips through parquet exactly: pack (−128
    shift, tinyint), write, read, unpack — identical codes and identical
    top-k results."""
    mins, maxs = SQ.sq8_train(emb)
    coded = SQ.sq8_encode(emb, mins, maxs)
    p = str(tmp_path / "sq8.parquet")
    SQ.sq8_pack(coded).write.parquet(p)
    back = spark.read.parquet(p)
    assert dict(back.schema["sq8"].dataType.jsonValue(),)["elementType"] == "byte"
    restored = SQ.sq8_unpack(back)
    a = {r["vec_id"]: list(r["sq8"]) for r in coded.collect()}
    b = {r["vec_id"]: list(r["sq8"]) for r in restored.collect()}
    assert a == b
    q = [0.0] * len(mins)
    t1 = [(r["vec_id"], round(r["distance"], 9)) for r in SQ.sq8_topk(coded, mins, maxs, q, k=5).collect()]
    t2 = [(r["vec_id"], round(r["distance"], 9)) for r in SQ.sq8_topk(restored, mins, maxs, q, k=5).collect()]
    assert t1 == t2
