"""Embedding pipeline: filter semantics (F1/F2), native/python parity, API
runtime batching + retry, usage accounting."""

import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.embeddings import pipeline as P
from lantern_extras_spark.embeddings import runtimes as R
from lantern_extras_spark.embeddings.registry import default_batch_size, get_available_models


@pytest.fixture(scope="module")
def edge_df(spark):
    rows = [
        (1, "hello world"),
        (2, None),
        (3, ""),
        (4, "Error: Summary failed (llm)"),
        (5, "normal text"),
    ]
    return spark.createDataFrame(rows, "id long, t string")


def test_ignore_filter_semantics(edge_df):
    out, usage = P.create_embeddings(edge_df, "t", "e")
    got = {r["id"]: r["e"] is not None for r in out.collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: True}
    assert usage.rows == 2
    assert usage.tokens == 4  # "hello world" + "normal text"


def test_missing_filter(spark, edge_df):
    withdst = edge_df.withColumn("e", F.when(F.col("id") == 1, F.array(F.lit(0.0))))
    remaining = withdst.where(P.missing_filter("t", "e")).collect()
    assert {r["id"] for r in remaining} == {5}


def test_native_hash_matches_python_runtime(edge_df):
    native = {
        r["id"]: r["e"]
        for r in P.embed_column(edge_df, "t", "e", runtime="hash").collect()
        if r["e"] is not None
    }
    rt = R.HashRuntime("hash/test-model")
    for i, t in [(1, "hello world"), (5, "normal text")]:
        expect = rt.process([t]).embeddings[0]
        assert native[i] == pytest.approx(expect, abs=1e-6)


def test_pandas_udf_runtime_path(edge_df):
    """Non-hash runtimes run through the Arrow pandas UDF in worker processes;
    verify row alignment and null masking via the built-in echo transport."""
    out = P.embed_column(
        edge_df, "t", "e",
        model="openai/text-embedding-3-small", runtime="openai",
        runtime_params={"transport": "echo", "dimensions": 2},
    ).collect()
    got = {r["id"]: r["e"] for r in out}
    assert got[2] is None and got[3] is None and got[4] is None
    assert got[1] == [11.0, 2.0] and got[5] == [11.0, 2.0]


def test_openai_token_packing():
    rt = R.OpenAIRuntime("openai/text-embedding-3-small", transport=lambda m, t, p: [[0.0]] * len(t))
    texts = ["word " * 5000, "a b c", "d e f"]
    batches = rt.pack_batches(texts)
    assert len(batches[0]) >= 1
    assert sum(len(b) for b in batches) == 3
    # a single text over the budget still goes out (capped), alone or leading
    assert "word " * 5000 in batches[0]


def test_openai_dimensions_only_v3():
    captured = {}

    def transport(model, texts, params):
        captured.update(params)
        return [[0.0]] * len(texts)

    rt = R.OpenAIRuntime("openai/text-embedding-ada-002", {"dimensions": 256}, transport=transport)
    rt.process(["x"])
    assert "dimensions" not in captured  # quirk preserved: non-v3 drops dimensions
    captured.clear()
    rt3 = R.OpenAIRuntime("openai/text-embedding-3-small", {"dimensions": 256}, transport=transport)
    rt3.process(["x"])
    assert captured.get("dimensions") == 256


def test_cohere_batch_cap():
    sizes = []

    def transport(model, texts, params):
        sizes.append(len(texts))
        return [[0.0]] * len(texts)

    rt = R.CohereRuntime("cohere/embed-english-v3.0", transport=transport)
    rt.process(["t"] * 200)
    assert sizes == [96, 96, 8]  # reference: 96 inputs/request
    assert rt.params["input_type"] == "search_query"


def test_retry_gives_up_after_five():
    R._SLEEP_SCALE[0] = 0.0
    attempts = [0]

    def transport(model, texts, params):
        attempts[0] += 1
        raise IOError("boom")

    rt = R.OpenAIRuntime("openai/text-embedding-3-small", transport=transport)
    with pytest.raises(RuntimeError, match="failed after 5 retries"):
        rt.process(["x"])
    assert attempts[0] == 5
    R._SLEEP_SCALE[0] = 1.0


def test_registry():
    assert default_batch_size("BAAI/bge-small-en") == 300
    assert default_batch_size("nonexistent") == 100
    assert "BAAI/bge-small-en" in get_available_models("ort")


def test_ort_stub_raises_clearly():
    rt = R.OrtRuntime("BAAI/bge-small-en")
    with pytest.raises(NotImplementedError):
        rt.process(["hello"])


def test_merge_embeddings(spark, edge_df):
    out, _ = P.create_embeddings(edge_df, "t", "e")
    delta = out.where("e is not null").select("id", "e")
    merged = P.merge_embeddings(edge_df, delta, "id", "e")
    got = {r["id"]: r["e"] is not None for r in merged.collect()}
    assert got == {1: True, 2: False, 3: False, 4: False, 5: True}
