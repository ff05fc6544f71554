"""Incremental embedding via Structured Streaming — the daemon replacement.

The reference daemon (SURVEY.md §2.11) is LISTEN/NOTIFY change-capture plus
10-second micro-batch drains (D2/D3), init backfill (D4), cancel/resume (D7),
and a usage ledger. Structured Streaming replaces that machinery wholesale:

- client-table CDC (D2)  → file/Delta-CDF stream over the source table
- 10 s drain cadence (D3) → `trigger(processingTime="10 seconds")`
- per-model batch cap (D3) → `maxFilesPerTrigger` / Arrow batch size
- init backfill (D4/D11)  → `trigger(availableNow=True)` run, then the stream
- row locks / dedupe (D5) → unnecessary: exactly-once sink via checkpointing
- retry/backoff (D6)      → Spark task retry + query restart policy
- cancel/resume (D7)      → `query.stop()` / restart (checkpoint resumes)

Late data cannot exist in this model (the source table is the truth), matching
the reference's no-watermark design; watermarking is still exposed for
event-stream sources.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming import StreamingQuery
from pyspark.sql.types import StructType

from lantern_extras_spark.embeddings.pipeline import embed_column


def start_incremental_embedding(
    spark: SparkSession,
    source_dir: str,
    source_schema: StructType | str,
    output_dir: str,
    checkpoint_dir: str,
    src_col: str,
    dst_col: str,
    model: str = "hash/test-model",
    runtime: str = "hash",
    runtime_params: dict | None = None,
    trigger_seconds: int = 10,
    available_now: bool = False,
    max_files_per_trigger: int | None = None,
) -> StreamingQuery:
    """Start the incremental embedding stream over a growing parquet directory.

    `available_now=True` runs an init/backfill pass over everything currently in
    the source and stops (reference D4); otherwise the query micro-batches new
    files every `trigger_seconds` (reference D3 cadence: 10 s). Stop with
    `query.stop()` (cancel, D7); restarting with the same checkpoint resumes
    exactly where it left off (D11 startup reconciliation for free).
    """
    reader = spark.readStream.schema(source_schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(source_dir)

    embedded = embed_column(stream, src_col, dst_col, model, runtime, runtime_params)

    writer = (
        embedded.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()


def windowed_event_counts(
    events_stream,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    watermark: str = "2 hours",
):
    """Event-time windowed aggregation with late-data watermark — beyond the
    reference's surface (it has no event-time semantics) but required for a
    stream table like `events` at scale."""
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(F.window(F.col(ts_col), window).alias("w"), F.col(key_col))
        .agg(F.count("*").alias("n"), F.sum("value").alias("total_value"))
        .select(F.col("w.start").alias("window_start"), key_col, "n", "total_value")
    )
