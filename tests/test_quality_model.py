"""Trainable quality classifier (operators/quality_model.py): separable-corpus
convergence, held-out accuracy, save/load round-trip, scoring determinism."""

import pytest

from lantern_extras_spark.operators.quality_model import (
    fit_quality_classifier,
    score_quality,
)

GOOD = [
    "the committee published its findings after reviewing the evidence carefully",
    "researchers measured how rainfall patterns shifted across the river basin",
    "a clear explanation of the algorithm appears in the second chapter",
    "the museum restored the painting using techniques from the original period",
    "farmers rotated their crops to keep the soil healthy over many seasons",
    "the orchestra rehearsed the symphony before the opening night performance",
    "engineers tested the bridge design under several simulated load conditions",
    "the novel follows three generations of a family through changing times",
]
BAD = [
    "buy now buy now buy now buy now buy now buy now buy now buy now",
    "$$$ win win win $$$ click click click $$$ free free free $$$",
    "aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb aaaa bbbb",
    "!!! ??? !!! ??? !!! ??? !!! ??? !!! ??? !!! ??? !!! ???",
    "cheap cheap cheap pills pills pills here here here now now now",
    "xxx xxx xxx xxx yyy yyy yyy yyy xxx xxx xxx xxx yyy yyy yyy yyy",
    "zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz zzz",
    "%%% ### %%% ### %%% ### %%% ### %%% ### %%% ### %%% ###",
]


@pytest.fixture(scope="module")
def model_and_data(spark):
    rows = [(i, t, 1.0) for i, t in enumerate(GOOD[:6])]
    rows += [(100 + i, t, 0.0) for i, t in enumerate(BAD[:6])]
    train = spark.createDataFrame(rows, "doc_id long, text string, label double")
    model = fit_quality_classifier(train, num_hash_features=1 << 12, max_iter=30)
    return model, train


def test_quality_classifier_separates_heldout(spark, model_and_data):
    model, _ = model_and_data
    held = spark.createDataFrame(
        [(1, GOOD[6]), (2, GOOD[7]), (3, BAD[6]), (4, BAD[7])],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["quality_prob"] for r in score_quality(held, model).collect()}
    assert out[1] > 0.5 and out[2] > 0.5, out
    assert out[3] < 0.5 and out[4] < 0.5, out
    # output keeps the input columns + the score, nothing else
    cols = score_quality(held, model).columns
    assert cols == ["doc_id", "text", "quality_prob"]


def test_quality_classifier_save_load_roundtrip(spark, model_and_data, tmp_path):
    from pyspark.ml import PipelineModel

    model, train = model_and_data
    p = str(tmp_path / "qmodel")
    model.write().overwrite().save(p)
    loaded = PipelineModel.load(p)
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(train, model).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(train, loaded).collect()}
    assert a == b


def test_quality_scoring_deterministic(spark, model_and_data):
    model, train = model_and_data
    a = {r["doc_id"]: r["quality_prob"] for r in score_quality(train, model).collect()}
    b = {r["doc_id"]: r["quality_prob"] for r in score_quality(train, model).collect()}
    assert a == b
