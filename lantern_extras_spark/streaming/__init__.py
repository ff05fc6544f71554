from lantern_extras_spark.streaming.incremental import start_incremental_embedding  # noqa: F401
from lantern_extras_spark.streaming.stateful import (  # noqa: F401
    collapse_band_flags,
    dedup_stream,
    near_dedup_band_flags,
    start_dedup_stream,
    start_ingest_dedup_stream,
    start_near_dedup_stream,
)
