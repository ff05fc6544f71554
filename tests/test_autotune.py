"""Autotune sweep semantics: eval loop, early stop, best-variant selection
(W2), result caching (N6); plus the model speed harness (N7)."""

import numpy as np
import pytest

from lantern_extras_spark.operators import autotune as AT


@pytest.fixture(scope="module")
def clustered(spark):
    """Well-clustered vectors so small PQ codebooks reach high recall."""
    rng = np.random.RandomState(0)
    centers = rng.randn(5, 32) * 10
    rows = [
        (i, (centers[i % 5] + rng.randn(32) * 0.05).astype("float32").tolist())
        for i in range(300)
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>")


def test_sweep_and_early_stop(spark, clustered, tmp_path):
    store = AT.AutotuneResults(spark, str(tmp_path / "at"))
    best, results = AT.autotune_pq(
        clustered, k=5, n_queries=4, target_recall=50.0,
        variants=((4, 8), (8, 16), (16, 64)),
        results=store, max_train_rows=300,
    )
    assert best is not None
    assert results  # at least one variant evaluated
    # early stop: once a variant met 50%, later variants are skipped
    met = [i for i, r in enumerate(results) if r.recall >= 50.0]
    if met:
        assert len(results) == met[0] + 1

    # N6: a second call with same (k, n) is served from cache — no new rows
    n_rows = store.load().count()
    best2, results2 = AT.autotune_pq(
        clustered, k=5, n_queries=4, target_recall=50.0,
        variants=((4, 8),), results=store, max_train_rows=300,
    )
    assert store.load().count() == n_rows
    assert best2 is not None


def test_select_best_prefers_cheapest_meeting_target():
    rs = [
        AT.VariantResult(4, 16, 99.9, latency=1.0, build_time=5.0),
        AT.VariantResult(8, 32, 99.95, latency=2.0, build_time=9.0),
        AT.VariantResult(16, 64, 40.0, latency=0.1, build_time=0.1),
    ]
    best = AT.select_best(rs, 99.9)
    assert (best.splits, best.clusters) == (4, 16)  # cheapest among qualifying


def test_select_best_falls_back_to_max_recall():
    rs = [
        AT.VariantResult(4, 16, 70.0, 1.0, 1.0),
        AT.VariantResult(8, 32, 90.0, 2.0, 2.0),
    ]
    assert AT.select_best(rs, 99.9).recall == 90.0
    assert AT.select_best([], 99.9) is None


def test_measure_model_speed(spark):
    from lantern_extras_spark.embeddings.speed import measure_model_speed

    rep = measure_model_speed(spark, max_tokens=50)
    assert rep.emb_per_sec_max > 0 and rep.emb_per_sec_min > 0
    assert rep.emb_per_sec_avg == pytest.approx(
        (rep.emb_per_sec_max + rep.emb_per_sec_min) / 2, rel=0.01
    )


def test_autotune_ivf_sweep(spark, clustered, tmp_path):
    store = AT.AutotuneResults(spark, str(tmp_path / "ivf_at"))
    best, results = AT.autotune_ivf(
        clustered, k=5, n_queries=3, target_recall=90.0,
        variants=((5, 5), (5, 1)), results=store, max_train_rows=300,
    )
    assert best is not None
    # full probe of all 5 cells is exact -> early stop on the first variant
    assert results[0].recall == 100.0 and len(results) == 1
    # cache round trip
    best2, _ = AT.autotune_ivf(clustered, k=5, n_queries=3, target_recall=90.0,
                               variants=((5, 5),), results=store, max_train_rows=300)
    assert best2.recall == 100.0
