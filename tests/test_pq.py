"""Product quantization: the reference test fixture invariants
(lantern_cli/tests/pq_test_with_db.rs via FIXTURES.md §4): 1000×128-dim,
10 clusters × 32 splits ⇒ codebook 320 rows of dim 4, every code vector has
exactly 32 codes, all codes < 10."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.operators import pq as PQ


@pytest.fixture(scope="module")
def vecs(spark):
    rng = np.random.RandomState(42)
    rows = [(i, rng.rand(128).astype("float32").tolist()) for i in range(1000)]
    return spark.createDataFrame(rows, "id long, v array<float>")


@pytest.fixture(scope="module")
def codebook(vecs):
    return PQ.build_codebook(vecs, vec_col="v", splits=32, k=10, max_train_rows=1000).cache()


def test_codebook_shape(codebook):
    rows = codebook.collect()
    assert len(rows) == 320  # 10 clusters × 32 splits
    assert all(len(r["c"]) == 4 for r in rows)  # 128/32
    subs = {r["subvector_id"] for r in rows}
    assert subs == set(range(32))
    cents = {r["centroid_id"] for r in rows}
    assert cents == set(range(10))


def test_quantize_codes(vecs, codebook):
    coded = PQ.quantize(vecs, codebook, vec_col="v")
    rows = coded.select("pqvec").collect()
    assert all(len(r["pqvec"]) == 32 for r in rows)
    assert all(0 <= c < 10 for r in rows for c in r["pqvec"])


def test_quantize_binary_mode(vecs, codebook):
    coded = PQ.quantize(vecs.limit(10), codebook, vec_col="v", as_binary=True)
    rows = coded.select("pqvec").collect()
    assert all(isinstance(r["pqvec"], (bytes, bytearray)) and len(r["pqvec"]) == 32 for r in rows)


def test_quantize_deterministic(vecs, codebook):
    a = {r["id"]: r["pqvec"] for r in PQ.quantize(vecs, codebook, vec_col="v").collect()}
    b = {r["id"]: r["pqvec"] for r in PQ.quantize(vecs, codebook, vec_col="v").collect()}
    assert a == b


def test_quantize_direct_formulation_matches_gemm(vecs, codebook):
    """The parity path (sequential Σ(x−c)², oracle association order) and the
    scale path (GEMM expansion) must agree away from exact near-ties — this
    fixture's k-means centroids are well-separated."""
    g = {r["id"]: r["pqvec"] for r in PQ.quantize(vecs, codebook, vec_col="v").collect()}
    d = {
        r["id"]: r["pqvec"]
        for r in PQ.quantize(vecs, codebook, vec_col="v", formulation="direct").collect()
    }
    assert g == d
    with pytest.raises(ValueError, match="formulation"):
        PQ.quantize(vecs, codebook, vec_col="v", formulation="nope")


def test_quantize_direct_is_sequential_sum():
    """The direct kernel's accumulation order is left-to-right (cumsum), i.e.
    bit-identical to a python running sum — the property the DuckDB list_sum
    oracle relies on for tie-impossibility."""
    rng = np.random.RandomState(7)
    X = rng.rand(5, 16)
    C = rng.rand(3, 16)
    for x in X:
        for c in C:
            seq = 0.0
            for xi, ci in zip(x, c):
                seq += (xi - ci) * (xi - ci)
            sq = x - c
            sq = sq * sq
            assert np.cumsum(sq)[-1] == seq


def test_decode_dimensions(vecs, codebook):
    coded = PQ.quantize(vecs.limit(5), codebook, vec_col="v")
    dec = PQ.decode(coded, codebook).collect()
    assert all(len(r["decoded"]) == 128 for r in dec)


def test_decode_reduces_error_vs_random(vecs, codebook):
    """Reconstruction from codes must beat a random codebook assignment."""
    coded = PQ.quantize(vecs.limit(100), codebook, vec_col="v")
    dec = PQ.decode(coded, codebook)
    from lantern_extras_spark.functions.vector import l2sq_dist

    err = dec.select(F.avg(l2sq_dist("v", "decoded")).alias("e")).first()["e"]
    # random uniform in [0,1): per-dim variance 1/12 → random-pair expected
    # l2sq ≈ 128·(2/12) ≈ 21; kmeans reconstruction must be far below that
    assert err < 10.0


def test_adc_topk_exact_centroid(vecs, codebook):
    """A query equal to a stored vector must rank that vector first by ADC."""
    target = vecs.where("id = 7").first()["v"]
    coded = PQ.quantize(vecs, codebook, vec_col="v")
    top = PQ.adc_topk(coded, codebook, list(map(float, target)), k=5, id_col="id").collect()
    assert top[0]["id"] == 7


def test_split_bounds_remainder():
    # last split takes the remainder (reference pq/codebook.rs:128-133)
    assert PQ.split_bounds(10, 3) == [(0, 3), (3, 6), (6, 10)]


def test_codebook_deterministic(vecs):
    a = PQ.build_codebook(vecs, vec_col="v", splits=4, k=5, max_train_rows=500).collect()
    b = PQ.build_codebook(vecs, vec_col="v", splits=4, k=5, max_train_rows=500).collect()
    assert sorted(map(str, a)) == sorted(map(str, b))


def test_adc_topk_batch_matches_single(spark):
    import numpy as np

    rng = np.random.RandomState(7)
    rows = [(i, rng.randn(16).astype("float32").tolist()) for i in range(120)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = PQ.build_codebook(df, vec_col="embedding", splits=4, k=16, max_train_rows=120)
    coded = PQ.quantize(df, cb, vec_col="embedding").cache()
    queries = [(int(r[0]), [float(x) for x in r[1]]) for r in rows[:5]]
    batch = PQ.adc_topk_batch(coded, cb, queries, k=8)
    got = {
        (r["query_id"], r["rank"]): r["vec_id"] for r in batch.collect()
    }
    for qid, qv in queries:
        single = [r["vec_id"] for r in PQ.adc_topk(coded, cb, qv, k=8).collect()]
        assert [got[(qid, rk)] for rk in range(1, 9)] == single, qid
    coded.unpersist()


def test_codebook_save_load_roundtrip(spark, tmp_path):
    import numpy as np

    rng = np.random.RandomState(3)
    rows = [(i, rng.randn(16).astype("float32").tolist()) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    cb = PQ.build_codebook(df, vec_col="embedding", splits=4, k=8, max_train_rows=100)
    path = str(tmp_path / "cb")
    PQ.save_codebook(cb, path)
    cb2 = PQ.load_codebook(spark, path)
    a = {r["vec_id"]: list(r["pqvec"]) for r in PQ.quantize(df, cb, dim=16).collect()}
    b = {r["vec_id"]: list(r["pqvec"]) for r in PQ.quantize(df, cb2, dim=16).collect()}
    assert a == b
