"""Custom stateful streaming operators via applyInPandasWithState.

The flagship one is **streaming exact dedup**: drop any document whose content
hash was already seen in ANY earlier micro-batch. Classic training-data
ingestion guard — the batch dedup operators (operators/dedup.py) handle the
historical corpus; this handles the live feed with exactly-once state in the
checkpoint.

State design for scale: the state key IS the content hash, so state is
per-group a single boolean — Spark shards it by key hash across executors and
persists it in the checkpoint (RocksDB state store on a real cluster). Memory
per executor is O(distinct hashes / executors · ~bytes), the minimum any
exact-streaming-dedup can hold.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import StructType


def dedup_stream(
    stream: DataFrame,
    text_col: str = "text",
    hash_col: str = "__content_hash",
) -> DataFrame:
    """Attach a content hash and drop duplicates across the stream's lifetime.

    Within a batch: keeps the first row per hash. Across batches: state in the
    checkpoint remembers every seen hash, so restarts don't re-admit dupes.
    Returns a streaming DataFrame with the original columns.
    """
    hashed = stream.withColumn(hash_col, F.md5(F.col(text_col)))
    out_schema = StructType(hashed.schema.fields)
    state_schema = StructType.fromDDL("seen boolean")
    cols = [f.name for f in hashed.schema.fields]

    def dedup_fn(
        key: Tuple[Any, ...],
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return
        state.update((True,))
        for pdf in pdfs:
            if len(pdf) > 0:
                yield pdf.iloc[:1][cols]
                return

    deduped = (
        hashed.groupBy(hash_col)
        .applyInPandasWithState(
            dedup_fn,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    return deduped.drop(hash_col) if hash_col.startswith("__") else deduped


def start_dedup_stream(
    spark,
    source_dir: str,
    source_schema,
    output_dir: str,
    checkpoint_dir: str,
    text_col: str = "text",
    available_now: bool = True,
    trigger_seconds: int = 10,
):
    """Wire dedup_stream between a parquet directory source and sink."""
    stream = spark.readStream.schema(source_schema).parquet(source_dir)
    deduped = dedup_stream(stream, text_col)
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    return writer.start()
