"""Paired A/B timer: runs each named query N times alternating a toggle
(callable before each run) within ONE session, so host drift and GC state
cancel out. Used by the r13 optimization round to isolate per-change deltas.

Usage:
    python tools/ab_bench.py <env_var> <query> [query ...]
Runs each query 2x3 times alternating env_var=1/0 (set before construction).
"""

from __future__ import annotations

import os
import statistics
import sys
import time

os.environ.setdefault("SPARK_GRAFT_CPUS", "32")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lantern_extras_spark import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
N_PAIRS = int(os.environ.get("AB_PAIRS", "4"))


def main() -> None:
    import __spark_entry__ as E

    var = sys.argv[1]
    names = sys.argv[2:]
    spark = get_spark("lantern-ab")
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    spark.read.parquet(f"{SF_DIR}/documents.parquet").foreach(lambda r: None)
    spark.read.parquet(f"{SF_DIR}/embeddings.parquet").foreach(lambda r: None)
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").foreach(lambda r: None)

    for name in names:
        on, off = [], []
        for _ in range(N_PAIRS):
            for val, bucket in (("1", on), ("0", off)):
                os.environ[var] = val
                # match bench.py's r14 cold-per-iteration contract: operator
                # caches from the previous run must not serve this one
                if os.environ.get("SPARK_GRAFT_BENCH_CLEARCACHE", "1") != "0":
                    spark.catalog.clearCache()
                t0 = time.monotonic()
                qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
                bucket.append(time.monotonic() - t0)
        os.environ.pop(var, None)
        m_on, m_off = statistics.median(on), statistics.median(off)
        print(f"{name:26s} {var}=1 {m_on:6.3f}s (min {min(on):6.3f})  "
              f"{var}=0 {m_off:6.3f}s (min {min(off):6.3f})  ratio {m_on/m_off:5.2f}",
              flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
