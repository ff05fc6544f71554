"""Backfill runner — the batch half of the reference daemon's job lifecycle
(D4/D11 init-job semantics, daemon/embedding_jobs.rs:279-371).

The reference snapshots missing pks into an unlogged work table and drains it in
locked chunks; under Spark a single lazy plan covers the same contract:

    src.where(missing_filter) → embed → merge-back → progress/usage updates

Chunking, locking (D5) and re-queues disappear — partitioning and task retry
are the scheduler's job. Cancellation is honored between stages (D7).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lantern_extras_spark.embeddings.pipeline import (
    create_embeddings,
    merge_embeddings,
    missing_filter,
)
from lantern_extras_spark.jobs.spec import JobStore


def run_backfill(store: JobStore, job_id: int, source: DataFrame) -> DataFrame | None:
    """Execute one embedding job's init/backfill; returns the merged DataFrame
    (caller persists it), or None if the job was canceled before start."""
    import json

    job = store.jobs().where(F.col("id") == job_id).first()
    if job is None:
        raise ValueError(f"no such job {job_id}")
    if job["canceled_at"] is not None:
        return None

    store.mark_started(job_id)
    try:
        src, dst, pk = job["src_column"], job["dst_column"], job["pk"]
        work = source
        if dst in source.columns:
            work = source.where(missing_filter(src, dst)).drop(dst)
        params = json.loads(job["runtime_params"] or "{}")
        embedded, usage = create_embeddings(
            work, src, dst,
            model=job["embedding_model"], runtime=job["runtime"], runtime_params=params,
        )
        delta = embedded.where(F.col(dst).isNotNull()).select(pk, dst)
        merged = merge_embeddings(source, delta, pk, dst)
        store.record_usage(job_id, usage.rows, usage.tokens)
        store.mark_finished(job_id)
        return merged
    except Exception as e:
        store.mark_failed(job_id, str(e)[:500])
        raise
