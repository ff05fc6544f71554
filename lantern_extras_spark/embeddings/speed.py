"""Model speed measurement — the reference's `measure-model-speed` methodology
(lantern_cli/src/embeddings/measure_speed.rs:18-171, BASELINE.md):

- two synthetic tables of 5001 rows: short text ('My small title text!') and a
  lorem text repeated to `max_tokens` words;
- a warm-up run is discarded; the timed window must be ≥1500 ms, doubling the
  row limit until it is;
- reports emb/s as max (short text), min (max-token text), avg.
"""

from __future__ import annotations

import time
from dataclasses import dataclass

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from lantern_extras_spark.embeddings.pipeline import embed_column

SHORT_TEXT = "My small title text!"
LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod tempor "
    "incididunt ut labore et dolore magna aliqua"
)
ROWS = 5001
MIN_WINDOW_S = 1.5


@dataclass
class SpeedReport:
    model: str
    runtime: str
    emb_per_sec_max: float  # short-text table
    emb_per_sec_min: float  # max-token table
    emb_per_sec_avg: float


def _make_table(spark: SparkSession, text: str):
    return spark.range(ROWS).select(
        F.col("id"), F.lit(text).alias("title")
    )


def _measure(
    spark: SparkSession, text: str, model: str, runtime: str, params: dict | None,
    n_runs: int = 3,
) -> float:
    df = _make_table(spark, text)
    limit = 512
    # warm-up (discarded — model load, JIT)
    embed_column(df.limit(64), "title", "emb", model, runtime, params).foreach(lambda r: None)

    def one_run(work, n: int) -> float:
        t0 = time.monotonic()
        embed_column(work, "title", "emb", model, runtime, params).foreach(lambda r: None)
        elapsed = time.monotonic() - t0
        return n / elapsed

    while True:
        work = df.limit(min(limit, ROWS))
        n = work.count()
        t0 = time.monotonic()
        embed_column(work, "title", "emb", model, runtime, params).foreach(lambda r: None)
        elapsed = time.monotonic() - t0
        if elapsed >= MIN_WINDOW_S or n >= ROWS:
            # median-of-N at the established window size: a single run inherits
            # whatever GC / page-cache state the session is in (the r02→r03
            # 11.1k→6.0k swing was measurement, not code)
            rates = sorted([n / elapsed] + [one_run(work, n) for _ in range(max(0, n_runs - 1))])
            return rates[len(rates) // 2]
        limit *= 2  # doubling until the window is ≥1.5 s (measure_speed.rs:140-166)


def measure_model_speed(
    spark: SparkSession,
    model: str = "hash/test-model",
    runtime: str = "hash",
    runtime_params: dict | None = None,
    max_tokens: int = 1000,
    n_runs: int = 3,
) -> SpeedReport:
    words = LOREM.split()
    long_text = " ".join(words[i % len(words)] for i in range(max_tokens))
    fast = _measure(spark, SHORT_TEXT, model, runtime, runtime_params, n_runs=n_runs)
    slow = _measure(spark, long_text, model, runtime, runtime_params, n_runs=n_runs)
    return SpeedReport(
        model=model,
        runtime=runtime,
        emb_per_sec_max=round(fast, 2),
        emb_per_sec_min=round(slow, 2),
        emb_per_sec_avg=round((fast + slow) / 2, 2),
    )
