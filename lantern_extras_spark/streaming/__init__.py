from lantern_extras_spark.streaming.incremental import start_incremental_embedding  # noqa: F401
