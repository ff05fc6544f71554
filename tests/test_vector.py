"""Vector distance functions vs numpy ground truth + edge semantics."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.functions import vector as V


@pytest.fixture(scope="module")
def pairs(spark):
    rng = np.random.RandomState(7)
    rows = [
        (i, rng.randn(16).astype("float32").tolist(), rng.randn(16).astype("float32").tolist())
        for i in range(20)
    ]
    rows.append((99, [0.0] * 16, rng.randn(16).astype("float32").tolist()))  # zero vector
    return spark.createDataFrame(rows, "id long, a array<float>, b array<float>"), rows


def test_distances_match_numpy(pairs):
    df, rows = pairs
    got = {
        r["id"]: r
        for r in df.select(
            "id",
            V.l2sq_dist("a", "b").alias("l2sq"),
            V.cos_sim("a", "b").alias("cos"),
            V.inner_product("a", "b").alias("dot"),
            V.l2_dist("a", "b").alias("l2"),
            V.vector_norm("a").alias("norm"),
        ).collect()
    }
    for i, a, b in rows:
        a, b = np.asarray(a, dtype=np.float64), np.asarray(b, dtype=np.float64)
        r = got[i]
        assert r["l2sq"] == pytest.approx(((a - b) ** 2).sum(), rel=1e-12)
        assert r["dot"] == pytest.approx(float(a @ b), rel=1e-12, abs=1e-12)
        assert r["l2"] == pytest.approx(float(np.linalg.norm(a - b)), rel=1e-12)
        assert r["norm"] == pytest.approx(float(np.linalg.norm(a)), rel=1e-12)
        denom = np.linalg.norm(a) * np.linalg.norm(b)
        expect_cos = 0.0 if denom == 0 else float(a @ b / denom)
        assert r["cos"] == pytest.approx(expect_cos, rel=1e-12, abs=1e-12)


def test_zero_vector_cosine_is_zero_not_nan(pairs):
    df, _ = pairs
    r = df.where("id = 99").select(V.cos_sim("a", "b").alias("c"), V.cos_dist("a", "b").alias("d")).first()
    assert r["c"] == 0.0 and r["d"] == 1.0


def test_hamming(spark):
    df = spark.createDataFrame([(1, [0, 1, 1, 0], [1, 1, 0, 0])], "id long, a array<int>, b array<int>")
    assert df.select(V.hamming_dist("a", "b").alias("h")).first()["h"] == 2
