"""Incremental embedding via Structured Streaming: backfill (availableNow,
reference D4) then incremental pickup of new files (D2/D3) with checkpoint
resume (D11)."""

import os
import time

import pytest


@pytest.fixture()
def dirs(tmp_path):
    return {
        "src": str(tmp_path / "src"),
        "out": str(tmp_path / "out"),
        "ckpt": str(tmp_path / "ckpt"),
    }


def _run_available_now(spark, dirs, schema):
    from lantern_extras_spark.streaming import start_incremental_embedding

    q = start_incremental_embedding(
        spark, dirs["src"], schema, dirs["out"], dirs["ckpt"],
        "title", "title_emb", available_now=True,
    )
    q.awaitTermination(120)
    return q


def test_backfill_then_incremental(spark, dirs):
    src_df = spark.createDataFrame(
        [(i, f"document {i}") for i in range(10)], "id long, title string"
    )
    src_df.write.mode("overwrite").parquet(dirs["src"])
    _run_available_now(spark, dirs, src_df.schema)
    out = spark.read.parquet(dirs["out"])
    assert out.count() == 10
    assert out.where("title_emb is not null").count() == 10

    # new data arrives; a second availableNow run (checkpoint resume) must
    # process ONLY the new file — exactly-once via checkpoint (D11)
    more = spark.createDataFrame([(100, "late arrival"), (101, None)], "id long, title string")
    more.coalesce(1).write.mode("append").parquet(dirs["src"])
    _run_available_now(spark, dirs, src_df.schema)
    out2 = spark.read.parquet(dirs["out"])
    assert out2.count() == 12
    got = {r["id"]: r["title_emb"] is not None for r in out2.where("id >= 100").collect()}
    assert got == {100: True, 101: False}  # F1 filter holds in streaming too


def test_windowed_event_counts_batch_parity(spark):
    """The streaming windowed agg expressed on a bounded stream must equal the
    batch groupBy on the same data."""
    from lantern_extras_spark.streaming.incremental import windowed_event_counts
    from pyspark.sql import functions as F

    ev = spark.createDataFrame(
        [(1, "2024-01-01 00:10:00", "click", 1.0),
         (2, "2024-01-01 00:50:00", "click", 2.0),
         (3, "2024-01-01 01:10:00", "view", 3.0)],
        "event_id long, ts string, event_type string, value double",
    ).withColumn("ts", F.to_timestamp("ts"))
    out = windowed_event_counts(ev).collect()  # batch DataFrame path works too
    got = {(str(r["window_start"]), r["event_type"]): (r["n"], r["total_value"]) for r in out}
    assert got[("2024-01-01 00:00:00", "click")] == (2, 3.0)
    assert got[("2024-01-01 01:00:00", "view")] == (1, 3.0)


def test_streaming_embed_then_quantize(spark, tmp_path):
    """Q5 trigger parity: PQ codes stay fresh compute-on-write — the streaming
    micro-batch embeds new rows AND quantizes them in the same foreachBatch."""
    import numpy as np
    from pyspark.sql import functions as F

    from lantern_extras_spark.embeddings.pipeline import embed_column
    from lantern_extras_spark.operators import pq as PQ

    src = str(tmp_path / "src"); out = str(tmp_path / "out"); ckpt = str(tmp_path / "ckpt")
    docs = spark.createDataFrame([(i, f"doc body {i}") for i in range(20)], "id long, title string")
    docs.coalesce(1).write.mode("overwrite").parquet(src)

    # codebook fit offline on an embedded snapshot (16-dim hash embeddings)
    snap = embed_column(docs, "title", "emb")
    cb = PQ.build_codebook(snap.where("emb is not null"), vec_col="emb", splits=4, k=8,
                           max_train_rows=100)

    def handle_batch(batch_df, batch_id):
        embedded = embed_column(batch_df, "title", "emb")
        coded = PQ.quantize(embedded.where("emb is not null"), cb, vec_col="emb")
        coded.write.mode("append").parquet(out)

    q = (
        spark.readStream.schema(docs.schema).parquet(src)
        .writeStream.foreachBatch(handle_batch)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    res = spark.read.parquet(out)
    assert res.count() == 20
    rows = res.select("pqvec").collect()
    assert all(len(r["pqvec"]) == 4 for r in rows)
    assert all(0 <= c < 8 for r in rows for c in r["pqvec"])


def test_multi_catalog_daemon_fanout(spark, tmp_path):
    """D10: one daemon process fanning out over two catalogs (reference spawns
    one job loop per target DB, daemon/mod.rs:225-353). Jobs in both catalogs
    reach 'enabled'; label routing stays per-catalog."""
    from lantern_extras_spark.jobs.spec import JobStore
    from lantern_extras_spark.streaming.daemon import EmbeddingDaemon, MultiCatalogDaemon

    store_a = JobStore(spark, str(tmp_path / "cat_a"))
    store_b = JobStore(spark, str(tmp_path / "cat_b"))
    src_a = spark.createDataFrame([(i, f"alpha doc {i}") for i in range(5)], "id long, t string")
    src_b = spark.createDataFrame([(i, f"beta doc {i}") for i in range(7)], "id long, t string")

    ja = store_a.add_embedding_job("ta", "t", "e")
    jb = store_b.add_embedding_job("tb", "t", "e")
    jb_gpu = store_b.add_embedding_job("tb", "t", "e2", label="gpu")

    daemon = MultiCatalogDaemon({
        "a": EmbeddingDaemon(store_a, {"ta": src_a}, label=None),
        "b": EmbeddingDaemon(store_b, {"tb": src_b}, label=None),
    })
    reports = daemon.run_once()
    assert reports["a"].ran == [ja]
    assert reports["b"].ran == [jb]
    assert reports["b"].skipped_label == [jb_gpu]  # gpu job waits for a gpu daemon

    assert store_a.get_embedding_job_status(ja)["status"] == "enabled"
    assert store_b.get_embedding_job_status(jb)["status"] == "enabled"
    assert daemon.catalogs["a"].results[ja].where("e is not null").count() == 5
    assert daemon.catalogs["b"].results[jb].where("e is not null").count() == 7

    # a gpu-labeled daemon on catalog b picks up the routed job; catalog a
    # has nothing left to do
    daemon_gpu = MultiCatalogDaemon({
        "a": EmbeddingDaemon(store_a, {"ta": src_a}, label="gpu"),
        "b": EmbeddingDaemon(store_b, {"tb": src_b}, label="gpu"),
    })
    reports2 = daemon_gpu.run_once()
    assert reports2["b"].ran == [jb_gpu]
    assert store_b.get_embedding_job_status(jb_gpu)["status"] == "enabled"
