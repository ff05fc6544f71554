"""Job lifecycle semantics — the reference's status CASE and cancel/resume
(lantern_extras/src/daemon.rs:197-282) plus backfill + usage ledger."""

import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.jobs import JobStore, run_backfill


@pytest.fixture()
def store(spark, tmp_path):
    return JobStore(spark, str(tmp_path / "ctl"))


@pytest.fixture(scope="module")
def source(spark):
    rows = [(i, f"text number {i}") for i in range(20)] + [(20, None), (21, "")]
    return spark.createDataFrame(rows, "id long, title string")


def test_status_lifecycle(store, source):
    jid = store.add_embedding_job("t", "title", "title_emb")
    assert store.get_embedding_job_status(jid)["status"] == "queued"
    store.mark_started(jid)
    assert store.get_embedding_job_status(jid)["status"] == "in_progress"
    store.mark_finished(jid)
    st = store.get_embedding_job_status(jid)
    assert st["status"] == "enabled" and st["progress"] == 100


def test_failed_beats_everything(store):
    jid = store.add_embedding_job("t", "a", "b")
    store.mark_started(jid)
    store.mark_finished(jid)
    store.mark_failed(jid, "boom")
    st = store.get_embedding_job_status(jid)
    assert st["status"] == "failed" and st["error"] == "boom"


def test_cancel_resume(store):
    jid = store.add_embedding_job("t", "a", "b")
    store.cancel_embedding_job(jid)
    assert store.get_embedding_job_status(jid)["status"] == "canceled"
    store.resume_embedding_job(jid)
    assert store.get_embedding_job_status(jid)["status"] == "queued"


def test_backfill_and_usage(store, source):
    jid = store.add_embedding_job("t", "title", "title_emb", pk="id")
    merged = run_backfill(store, jid, source)
    assert merged.where("title_emb is not null").count() == 20
    assert merged.count() == 22  # filtered rows keep NULL, never dropped
    st = store.get_embedding_job_status(jid)
    assert st["status"] == "enabled" and st["progress"] == 100
    u = store.usage().first()
    assert u["job_id"] == jid and u["rows"] == 20 and u["tokens"] == 60


def test_backfill_canceled_job_noop(store, source):
    jid = store.add_embedding_job("t", "title", "title_emb", pk="id")
    store.cancel_embedding_job(jid)
    assert run_backfill(store, jid, source) is None


def test_backfill_only_missing(store, source, spark):
    """F2 semantics: rows already embedded are not re-embedded."""
    pre = source.withColumn(
        "title_emb", F.when(F.col("id") < 5, F.array(F.lit(9.0))).otherwise(F.lit(None))
    )
    jid = store.add_embedding_job("t", "title", "title_emb", pk="id")
    merged = run_backfill(store, jid, pre)
    rows = {r["id"]: r["title_emb"] for r in merged.collect()}
    assert rows[0] == [9.0]  # untouched
    assert rows[10] is not None and len(rows[10]) == 16
    assert store.usage().first()["rows"] == 15


def test_multiple_jobs_listed(store):
    a = store.add_embedding_job("t1", "a", "b")
    b = store.add_embedding_job("t2", "a", "b", label="gpu")
    jobs = store.get_embedding_jobs().collect()
    assert {r["id"] for r in jobs} == {a, b}
    assert store.jobs().where(F.col("label") == "gpu").first()["id"] == b
