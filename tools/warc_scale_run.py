"""Measured scale run for the streaming WARC ingestion path (r10 verdict #5).

Generates a synthetic crawl N× the unit-test fixture size (default: 16
archives × 2,000 records × ~16 KB bodies ≈ 0.5 GB decompressed), then runs
the REAL `read_warc` → `http_body_text` → quality/dedup slice and records:

  - bytes in (compressed on disk) / bytes out (decompressed record bodies)
  - wall-clock and per-stage timings
  - PEAK TASK MEMORY, measured two ways per archive inside the workers:
    tracemalloc peak around the actual `iter_warc_records` loop (Python
    allocations: the parser's true footprint) and ru_maxrss of the worker
    process (the OS view, includes interpreter + Arrow buffers)

The point being proven: a whole archive NEVER exists in memory — peak task
memory stays at one-record/one-batch scale while total decompressed volume
is ~30× larger. An HTTP phase (r12) replays the contracts over the
pluggable opener seam: streaming-GET indexing + Range-request selective
fetch against a local Range-honoring server, recording bytes-served vs
selection size. Writes WARC_SCALE_r12.json next to this script's repo root.

Run: python tools/warc_scale_run.py [n_archives records_per_archive]
"""

from __future__ import annotations

import json
import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lantern_extras_spark import get_spark  # noqa: E402


def make_crawl(crawl_dir: str, n_archives: int, recs_per_archive: int) -> int:
    """Write a synthetic member-gzipped crawl; returns decompressed bytes."""
    import gzip

    rng = random.Random(42)
    words = [
        "spark", "shuffle", "broadcast", "parquet", "columnar", "vector",
        "quantize", "minhash", "window", "partition", "codegen", "arrow",
    ]
    total = 0
    for a in range(n_archives):
        path = os.path.join(crawl_dir, f"crawl-{a:03d}.warc.gz")
        with open(path, "wb") as f:
            for r in range(recs_per_archive):
                # semi-compressible text: a random 64-word paragraph ×16
                para = " ".join(rng.choice(words) for _ in range(64))
                body = (f"<html><p>doc {a}-{r} " + para + "</p></html>") * 16
                payload = (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
                    + body.encode()
                )
                head = (
                    b"WARC/1.0\r\nWARC-Type: response\r\n"
                    + b"WARC-Target-URI: https://example.com/%d/%d\r\n" % (a, r)
                    + b"WARC-Date: 2026-01-01T00:00:00Z\r\n"
                    + b"Content-Length: %d\r\n\r\n" % len(payload)
                )
                member = head + payload + b"\r\n\r\n"
                total += len(member)
                f.write(gzip.compress(member, compresslevel=1))
    return total


def main() -> None:
    import tempfile

    n_archives = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    recs = int(sys.argv[2]) if len(sys.argv) > 2 else 2000

    spark = get_spark("warc-scale-run")
    spark.sparkContext.setLogLevel("ERROR")

    crawl_dir = tempfile.mkdtemp(prefix="warc_scale_")
    t0 = time.monotonic()
    decompressed = make_crawl(crawl_dir, n_archives, recs)
    gen_sec = time.monotonic() - t0
    compressed = sum(
        os.path.getsize(os.path.join(crawl_dir, p)) for p in os.listdir(crawl_dir)
    )

    # --- per-task memory probe: the REAL parse kernel under tracemalloc ----
    from pyspark.sql import functions as F

    def probe(batches):
        import resource
        import tracemalloc

        import pandas as pd

        from lantern_extras_spark.sources.warc import _file_chunks, _local_fs_path, iter_warc_records

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                fs = _local_fs_path(p)
                tracemalloc.start()
                n = body_bytes = 0
                for rec in iter_warc_records(_file_chunks(fs)):
                    n += 1
                    body_bytes += len(rec["body"])
                _, peak = tracemalloc.get_traced_memory()
                tracemalloc.stop()
                rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss * 1024
                rows.append(
                    {"path": p, "records": n, "body_bytes": body_bytes,
                     "tracemalloc_peak": peak, "worker_maxrss": rss}
                )
            yield pd.DataFrame(rows)

    files = spark.read.format("binaryFile").load(os.path.join(crawl_dir, "*.warc.gz")).select("path")
    t0 = time.monotonic()
    prof = files.mapInPandas(
        probe,
        "path string, records long, body_bytes long, tracemalloc_peak long, worker_maxrss long",
    ).toPandas()
    parse_probe_sec = time.monotonic() - t0

    # --- the real pipeline slice: read_warc -> text -> quality -> dedup ----
    from lantern_extras_spark.operators import dedup as D
    from lantern_extras_spark.operators.textstats import quality_metrics
    from lantern_extras_spark.sources.warc import http_body_text, read_warc

    t0 = time.monotonic()
    docs = (
        read_warc(spark, os.path.join(crawl_dir, "*.warc.gz"))
        .where(F.col("http_status") == 200)
        .select(
            F.xxhash64("target_uri").alias("doc_id"),
            http_body_text().alias("text"),
        )
    )
    n_docs = docs.count()
    ingest_sec = time.monotonic() - t0

    t0 = time.monotonic()
    q = quality_metrics(docs)
    survivors = D.exact_dedup(q.select("doc_id", "text"))
    n_survivors = survivors.count()
    pipeline_sec = time.monotonic() - t0

    # --- the same contracts over HTTP (r12: the pluggable opener seam) ----
    # A Range-honoring server over the same archives; workers (separate
    # processes on this host) stream GET bodies for indexing and issue
    # coalesced Range requests for the selective fetch. Proves the network
    # path keeps the one-record memory contract AND that archive bytes
    # moved are proportional to the SELECTION, not the crawl.
    from tools.rangeserver import serve_directory

    _rs_cm = serve_directory(crawl_dir)
    srv = _rs_cm.__enter__()
    base = srv.base_url
    urls = [f"{base}/{p}" for p in sorted(os.listdir(crawl_dir))]

    def http_probe(batches):
        import tracemalloc

        import pandas as pd

        from lantern_extras_spark.sources.warc import _opener_for, iter_warc_records

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                tracemalloc.start()
                n = 0
                for _rec in iter_warc_records(_opener_for(p).chunks()):
                    n += 1
                _, peak = tracemalloc.get_traced_memory()
                tracemalloc.stop()
                rows.append({"path": p, "records": n, "tracemalloc_peak": peak})
            yield pd.DataFrame(rows)

    t0 = time.monotonic()
    hprof = (
        spark.createDataFrame([(u,) for u in urls], "path string")
        .repartition(len(urls))
        .mapInPandas(http_probe, "path string, records long, tracemalloc_peak long")
        .toPandas()
    )
    http_probe_sec = time.monotonic() - t0

    from lantern_extras_spark.sources.warc import index_warc, read_warc_ranges

    t0 = time.monotonic()
    idx = index_warc(spark, urls)
    idx_rows = idx.where("warc_type = 'response'").collect()
    http_index_sec = time.monotonic() - t0
    # two index-side selection shapes, ~10% of records each:
    #  - uniform: digest-style screen, survivors scattered one-by-one (the
    #    WORST case for request coalescing — gaps between survivors are ~9
    #    records, so fetch-through trades bytes for requests 1:~10)
    #  - clustered-sparse: status/mime/language screens keep same-host RUNS
    #    with small in-run holes (the realistic CDX-filter shape) — here
    #    gap-tolerant coalescing wins both axes at once
    import zlib as _zlib

    def _rec_no(uri: str) -> int:
        return int(uri.rsplit("/", 1)[1])

    uniform_rows = [
        r for r in idx_rows
        if _zlib.crc32(r["target_uri"].encode()) % 10 == 0
    ]
    clustered_rows = [
        r for r in idx_rows
        if (_rec_no(r["target_uri"]) // 100) % 10 == 0
        and _rec_no(r["target_uri"]) % 2 == 0
    ]
    fetch_points = {}
    for label, gap, rows_sel in [
        ("uniform10_maxgap0", 0, uniform_rows),
        ("uniform10_default_gap", 256 << 10, uniform_rows),
        ("clustered_sparse_maxgap0", 0, clustered_rows),
        ("clustered_sparse_default_gap", 256 << 10, clustered_rows),
    ]:
        keep = spark.createDataFrame(rows_sel, idx.schema)
        rb, rq = srv.ranged_bytes, srv.ranged_requests
        t0 = time.monotonic()
        n_fetched = read_warc_ranges(spark, keep, max_gap=gap).count()
        sel_bytes = int(sum(r["warc_length"] for r in rows_sel))
        served = srv.ranged_bytes - rb
        fetch_points[label] = {
            "max_gap": gap,
            "selected_records": len(rows_sel),
            "fetched_records": n_fetched,
            "selected_bytes": sel_bytes,
            "range_requests": srv.ranged_requests - rq,
            "ranged_bytes_served": served,
            "byte_amplification": round(served / max(1, sel_bytes), 2),
            "fetch_sec": round(time.monotonic() - t0, 2),
        }
    _rs_cm.__exit__(None, None, None)

    # --- the object-store opener (r13): same streaming contract through
    # Arrow's filesystem layer — file:// drives the identical
    # open_input_stream/read_at code path s3a:/gs: take on a real cluster
    def arrow_probe(batches):
        import pathlib
        import tracemalloc

        import pandas as pd

        from lantern_extras_spark.sources.warc import (
            _ArrowFsOpener,
            iter_warc_records,
        )

        for pdf in batches:
            rows = []
            for p in pdf["path"]:
                uri = pathlib.Path(p).as_uri()
                tracemalloc.start()
                n = 0
                opener = _ArrowFsOpener(uri)
                for _rec in iter_warc_records(opener.chunks()):
                    n += 1
                _, peak = tracemalloc.get_traced_memory()
                tracemalloc.stop()
                rows.append({"path": p, "records": n, "tracemalloc_peak": peak})
            yield pd.DataFrame(rows)

    local_paths = sorted(os.path.join(crawl_dir, p) for p in os.listdir(crawl_dir))
    t0 = time.monotonic()
    aprof = (
        spark.createDataFrame([(p,) for p in local_paths], "path string")
        .repartition(len(local_paths))
        .mapInPandas(arrow_probe, "path string, records long, tracemalloc_peak long")
        .toPandas()
    )
    arrow_probe_sec = time.monotonic() - t0

    result = {
        "n_archives": n_archives,
        "records_per_archive": recs,
        "bytes_compressed_in": compressed,
        "bytes_decompressed": decompressed,
        "body_bytes_out": int(prof["body_bytes"].sum()),
        "records_parsed": int(prof["records"].sum()),
        "docs_ingested": n_docs,
        "dedup_survivors": n_survivors,
        "per_archive_decompressed_avg": decompressed // n_archives,
        "task_tracemalloc_peak_max": int(prof["tracemalloc_peak"].max()),
        "task_tracemalloc_peak_avg": int(prof["tracemalloc_peak"].mean()),
        "worker_maxrss_max": int(prof["worker_maxrss"].max()),
        "gen_sec": round(gen_sec, 2),
        "parse_probe_sec": round(parse_probe_sec, 2),
        "ingest_count_sec": round(ingest_sec, 2),
        "quality_dedup_sec": round(pipeline_sec, 2),
        "ingest_mb_per_sec_decompressed": round(
            decompressed / 1e6 / ingest_sec, 1
        ),
        "streaming_proof": (
            "task_tracemalloc_peak_max << per_archive_decompressed_avg "
            "means no task ever held an archive"
        ),
        "http": {
            "probe_sec": round(http_probe_sec, 2),
            "records_parsed": int(hprof["records"].sum()),
            "task_tracemalloc_peak_max": int(hprof["tracemalloc_peak"].max()),
            "index_sec": round(http_index_sec, 2),
            "index_rows": len(idx_rows),
            "compressed_crawl_bytes": compressed,
            "selective_fetch": fetch_points,
            "selective_fetch_proof": (
                "per selection shape: exact coalescing (max_gap=0) keeps "
                "ranged_bytes_served == selected_bytes at one request per "
                "scattered member; the default 256 KB gap tolerance trades "
                "filler bytes for an order-of-magnitude request cut — on "
                "clustered-sparse selections (the realistic CDX-filter "
                "shape) it wins both axes at once"
            ),
        },
        "arrow_fs": {
            "probe_sec": round(arrow_probe_sec, 2),
            "records_parsed": int(aprof["records"].sum()),
            "task_tracemalloc_peak_max": int(aprof["tracemalloc_peak"].max()),
            "streaming_proof": (
                "the Arrow-FS opener (the s3a:/gs: code path, driven via "
                "file://) keeps the same one-chunk+one-record task peak as "
                "the local and HTTP openers"
            ),
        },
    }
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, "WARC_SCALE_r13.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))

    import shutil

    shutil.rmtree(crawl_dir, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
