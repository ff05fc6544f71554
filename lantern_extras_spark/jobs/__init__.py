from lantern_extras_spark.jobs.spec import JobStore, JOB_SCHEMA  # noqa: F401
from lantern_extras_spark.jobs.runner import run_backfill  # noqa: F401
