"""`python -m lantern_extras_spark` — the reference's `lantern-cli` surface
(lantern_cli/src/cli.rs:10-32, dispatch main.rs:19-94) mapped onto this
engine's library calls, with parquet paths where the reference takes Postgres
URIs:

    create-index            external_index::create_usearch_index  → hnsw.create_external_index
    create-embeddings       embeddings::create_embeddings_from_db → pipeline.create_embeddings
    show-runtimes           embeddings::show_available_runtimes   → registry.get_available_runtimes
    show-models             embeddings::show_available_models     → registry.get_available_models
    measure-model-speed     measure_speed::start_speed_test       → speed.measure_model_speed
    autotune-index          index_autotune::autotune_index        → autotune.autotune_*
    pq-table                pq::quantize_table                    → pq.build_codebook + quantize
    start-daemon            daemon::start                         → streaming.daemon.EmbeddingDaemon
    start-server            http_server::start                    → serving.http_api.CollectionServer
    start-indexing-server   external_index::server                → serving.index_server.IndexServer

Every subcommand prints one JSON line per result so scripts can parse output;
servers print a `{"listening": ..., "port": ...}` line once bound (port 0
binds an ephemeral port — the line is how callers learn it).
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys


def _json(obj) -> None:
    print(json.dumps(obj, default=str), flush=True)


def _spark(app: str):
    from lantern_extras_spark import get_spark

    spark = get_spark(f"lantern-cli-{app}")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def cmd_show_runtimes(args) -> int:
    from lantern_extras_spark.embeddings.registry import get_available_runtimes

    _json(get_available_runtimes())
    return 0


def cmd_show_models(args) -> int:
    from lantern_extras_spark.embeddings.registry import get_available_models

    _json(get_available_models(args.runtime))
    return 0


def cmd_measure_model_speed(args) -> int:
    from lantern_extras_spark.embeddings.speed import measure_model_speed

    spark = _spark("speed")
    rep = measure_model_speed(
        spark, model=args.model, runtime=args.runtime, max_tokens=args.max_tokens
    )
    _json(dataclasses.asdict(rep))
    spark.stop()
    return 0


def cmd_create_embeddings(args) -> int:
    from lantern_extras_spark.embeddings.pipeline import create_embeddings

    spark = _spark("embeddings")
    df = spark.read.parquet(args.input)
    out, usage = create_embeddings(
        df, args.column, args.out_column, model=args.model, runtime=args.runtime,
        filter_expr=args.filter, limit=args.limit, batch_size=args.batch_size,
    )
    out.write.mode("overwrite").parquet(args.output)
    _json({"output": args.output, "rows": usage.rows, "tokens": usage.tokens})
    spark.stop()
    return 0


def cmd_create_index(args) -> int:
    from lantern_extras_spark.operators.hnsw import create_external_index

    spark = _spark("index")
    df = spark.read.parquet(args.input)
    path = create_external_index(
        df, column=args.column, table=args.input, metric_kind=args.metric_kind,
        m=args.m, ef_construction=args.efc, ef=args.ef, pq=args.pq,
        index_name=args.index_name or "", root=args.root, id_col=args.id_col,
        n_shards=args.n_shards,
    )
    _json({"index": path})
    spark.stop()
    return 0


def cmd_autotune_index(args) -> int:
    from lantern_extras_spark.operators import autotune as AT

    spark = _spark("autotune")
    df = spark.read.parquet(args.input)
    results = AT.AutotuneResults(spark, args.results_dir) if args.results_dir else None
    kw = dict(vec_col=args.column, id_col=args.id_col, k=args.k,
              n_queries=args.n_queries, target_recall=args.target_recall,
              results=results)
    fn = {"hnsw": AT.autotune_hnsw, "pq": AT.autotune_pq,
          "ivf": AT.autotune_ivf, "ivfpq": AT.autotune_ivf_pq,
          "bq": AT.autotune_bq}[args.index_kind]
    best, variants = fn(df, **kw)
    _json({
        "best": dataclasses.asdict(best) if best else None,
        "variants": [dataclasses.asdict(v) for v in variants],
    })
    spark.stop()
    return 0


def cmd_plan(args) -> int:
    """Lint a query's physical plan for the known scale antipatterns
    (single-reducer windows, cartesians, single-partition exchanges,
    unlimited global sorts, unpushed scan filters) and print the summary —
    the ops-side form of tests/test_plans.py's pinned guardrails."""
    from lantern_extras_spark.plans.inspect import lint_plan, plan_summary

    spark = _spark("plan")
    if args.sql:
        for spec in args.table or []:
            name, _, path = spec.partition("=")
            if not path:
                raise SystemExit(f"--table expects name=parquet_path, got {spec!r}")
            spark.read.parquet(path).createOrReplaceTempView(name)
        df = spark.sql(args.sql)
        label = "sql"
    else:
        sys.path.insert(0, os.getcwd())
        try:
            import __spark_entry__ as E
        except ImportError as exc:
            raise SystemExit(
                f"--name needs the driver registry (__spark_entry__.py) on "
                f"the working directory: {exc}"
            )
        qs = E.queries()
        if args.name not in qs:
            raise SystemExit(
                f"unknown query {args.name!r}; registry has {len(qs)} entries"
            )
        df = qs[args.name](spark, args.sf_dir)
        label = args.name
    s = plan_summary(df)
    findings = lint_plan(df)
    _json({
        "query": label,
        "n_shuffles": s.n_shuffles,
        "n_broadcasts": s.n_broadcasts,
        "pushed_filters": s.pushed_filters[:10],
        "findings": findings,
        "clean": not any(f["severity"] == "warn" for f in findings),
    })
    if args.show_plan:
        print(s.text)
    spark.stop()
    return 0


def cmd_compare_compressed(args) -> int:
    from lantern_extras_spark.operators.autotune import compare_compressed

    spark = _spark("compare-compressed")
    df = spark.read.parquet(args.input)
    rep = compare_compressed(
        df, vec_col=args.column, id_col=args.id_col, k=args.k,
        n_queries=args.n_queries, bq_oversample=args.bq_oversample,
    )
    _json({"report": [r.asDict() for r in rep.collect()]})
    spark.stop()
    return 0


def cmd_search(args) -> int:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from lantern_extras_spark.embeddings.pipeline import hash_embedding, ignore_filter
    from lantern_extras_spark.functions.vector import cos_sim
    from lantern_extras_spark.functions.portable import pround
    from lantern_extras_spark.operators import retrieval as RET

    spark = _spark("search")
    docs = spark.read.parquet(args.input)
    terms = args.query.split()
    if args.mode == "bm25":
        out = RET.bm25_topk(docs, terms, k=args.k,
                            text_col=args.text_col, id_col=args.id_col)
    else:  # hybrid: BM25 pool + hash-embedding cosine pool fused with RRF
        bm = RET.bm25_topk(docs, terms, k=args.pool,
                           text_col=args.text_col, id_col=args.id_col)
        corpus = docs.where(ignore_filter(args.text_col)).select(
            args.id_col, hash_embedding(args.text_col).alias("emb")
        )
        qcol = hash_embedding(F.lit(args.query))
        scored = corpus.select(
            args.id_col, pround(cos_sim(F.col("emb"), qcol), 6).alias("cosine")
        )
        vtop = scored.orderBy(
            F.col("cosine").desc(), F.col(args.id_col).asc()
        ).limit(args.pool)
        w = Window.orderBy(F.col("cosine").desc(), F.col(args.id_col).asc())
        vec = vtop.withColumn("rnk", F.row_number().over(w).cast("bigint"))
        out = RET.rrf_fuse(
            [bm.select(args.id_col, "rnk"), vec.select(args.id_col, "rnk")],
            id_col=args.id_col, k=args.k,
        )
    _json({"results": [r.asDict() for r in out.collect()]})
    spark.stop()
    return 0


def cmd_corpus_health(args) -> int:
    """One-shot corpus health report: Zipf rank-frequency slope (templated
    corpora flatten), per-language tokenizer fertility (sequence-length
    budgeting), and — given a baseline snapshot — the top lexical drifts."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.operators import textstats as TS

    spark = _spark("corpus-health")
    docs = spark.read.parquet(args.input)
    rep: dict = {}
    z = TS.zipf_fit(docs, top_k=args.top_k, text_col=args.text_col).collect()[0]
    rep["zipf"] = z.asDict()
    rep["fertility"] = [
        r.asDict()
        for r in TS.tokenizer_fertility(
            docs, group_col=args.group_col, text_col=args.text_col
        ).orderBy(args.group_col).collect()
    ]
    if args.baseline:
        from lantern_extras_spark.operators.versioning import vocab_drift

        old = spark.read.parquet(args.baseline)
        drift = vocab_drift(old, docs, phi=args.phi, text_col=args.text_col)
        rep["top_drifts"] = [
            r.asDict()
            for r in drift.orderBy(
                F.abs(F.col("log_ratio")).desc(), F.col("token").asc()
            ).limit(args.top_k).collect()
        ]
    _json(rep)
    spark.stop()
    return 0


def cmd_select_data(args) -> int:
    """DSIR target-distribution selection: importance-weight `--input` docs
    against a `--target` seed corpus over hashed n-gram buckets and write the
    Gumbel-top-n resample (Xie et al. 2023). The 'get me more data that looks
    like my seed corpus' pipeline step, as one command."""
    from lantern_extras_spark.operators import selection as SEL

    spark = _spark("select-data")
    docs = spark.read.parquet(args.input)
    target = spark.read.parquet(args.target)
    picked = SEL.dsir_select(
        docs, target, n=args.n, text_col=args.text_col, id_col=args.id_col,
        buckets=args.buckets,
    )
    picked.write.mode("overwrite").parquet(args.output)
    div = SEL.corpus_divergence(
        target, docs, text_col=args.text_col, buckets=args.buckets
    ).collect()[0]
    _json({"output": args.output, "n_selected": args.n,
           "target_vs_raw_js_div": div["js_div"], "kl_target_raw": div["kl_ab"]})
    spark.stop()
    return 0


def cmd_sketch_stats(args) -> int:
    """Bounded-state corpus dashboard: HLL distinct-token estimate, CMS
    frequencies of the exact heavy hitters, and bottom-k sample quantiles of
    document token counts — every number from a sketch a streaming ingest
    could maintain, none requiring a vocabulary or corpus-wide shuffle."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.functions.text import token_count, tokens
    from lantern_extras_spark.operators import sketches as SK
    from lantern_extras_spark.operators import textstats as TS

    spark = _spark("sketch-stats")
    docs = spark.read.parquet(args.input)
    toks = docs.select(F.explode(tokens(F.col(args.text_col))).alias("token"))
    rep: dict = {}
    hll = SK.hll_estimate(SK.hll_build(toks, "token", m=args.m), m=args.m).collect()[0]
    rep["distinct_tokens"] = hll.asDict()
    hh = TS.heavy_hitters(docs, phi=args.phi, text_col=args.text_col,
                          out_order=False).select("token", "n")
    sk = SK.cms_build(toks, "token", depth=4, width=args.width)
    est = SK.cms_estimate(sk, hh, "token", depth=4, width=args.width)
    rep["heavy_hitters"] = [
        r.asDict()
        for r in hh.join(est, "token").orderBy(F.col("n").desc(), "token")
        .limit(args.top_k).collect()
    ]
    sample = SK.bottomk_sample(
        docs.withColumn("__nt", token_count(args.text_col)), k=args.k,
        id_col=args.id_col,
    )
    rep["doc_token_quantiles"] = [
        r.asDict()
        for r in SK.bottomk_percentiles(sample, "__nt", (0.5, 0.9, 0.99),
                                        id_col=args.id_col).collect()
    ]
    _json(rep)
    spark.stop()
    return 0


def cmd_release_gate(args) -> int:
    """Corpus release gate, as one command: everything a dataset release
    should check between the previous snapshot and this one — (1) what
    changed (corpus_diff summary), (2) lexical drift (which words moved),
    (3) distributional drift (JS/KL scalar), (4) optional benchmark
    decontamination count, (5) optional split-leakage audit. One JSON line;
    a CI gate greps it."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.operators import dedup as D
    from lantern_extras_spark.operators import selection as SEL
    from lantern_extras_spark.operators.versioning import (
        corpus_diff,
        diff_summary,
        vocab_drift,
    )

    spark = _spark("release-gate")
    new = spark.read.parquet(args.input)
    rep: dict = {}
    if args.baseline:
        old = spark.read.parquet(args.baseline)
        rep["diff"] = {
            r["status"]: r["n_docs"]
            for r in diff_summary(
                corpus_diff(old, new, text_col=args.text_col)
            ).collect()
        }
        rep["top_drifts"] = [
            r.asDict()
            for r in vocab_drift(old, new, phi=args.phi, text_col=args.text_col)
            .orderBy(F.abs(F.col("log_ratio")).desc(), F.col("token").asc())
            .limit(args.top_k)
            .collect()
        ]
        div = SEL.corpus_divergence(
            old, new, text_col=args.text_col, buckets=args.buckets
        ).collect()[0]
        rep["divergence"] = {
            "js_div": div["js_div"], "kl_old_new": div["kl_ab"],
            "kl_new_old": div["kl_ba"], "tv_dist": div["tv_dist"],
        }
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        flagged = D.decontaminate(
            new, bench, threshold=args.contamination_threshold,
            text_col=args.text_col, mode="flag",
        )
        # flag mode returns (doc_id, bench_id, containment) pairs >= threshold
        rep["contaminated_docs"] = flagged.select("doc_id").distinct().count()
    if args.split_col:
        if args.split_col not in new.columns:
            # a typo'd --split-col must NOT silently skip a CI gate's audit
            rep["gate_ok"] = False
            rep["split_col_missing"] = args.split_col
            _json(rep)
            spark.stop()
            return 2
        pairs = D.minhash_dedup(new, text_col=args.text_col)
        from lantern_extras_spark.operators.sampling import split_contamination_report

        leak_rows = split_contamination_report(
            new, pairs, split_col=args.split_col, summary=True
        ).collect()
        rep["split_leaks"] = [r.asDict() for r in leak_rows]
        rep["split_leak_pairs"] = int(sum(r["n_pairs"] for r in leak_rows))
    rep["n_docs"] = new.count()
    rep["gate_ok"] = (
        rep.get("contaminated_docs", 0) == 0
        and rep.get("split_leak_pairs", 0) == 0
    )
    _json(rep)
    spark.stop()
    return 0


def cmd_crawl_ingest(args) -> int:
    """The public-crawl loop (r12) as one command, mirroring how the
    reference ships its pipelines as subcommands (lantern_cli/src/cli.rs:
    11-32): path manifest → index shards → index-side filter/dedup →
    selective ranged fetch → parquet. Archive IO stays proportional to the
    SURVIVING index rows, never the crawl. `--kind warc` skips the index
    and bulk-streams whole archives instead (backfills, unindexed
    crawls)."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.sources.warc import (
        read_cdx,
        read_cdx_ranges,
        read_paths_manifest,
        read_warc,
    )

    spark = _spark("crawl-ingest")
    urls = read_paths_manifest(args.manifest, args.base_url)
    if args.max_shards:
        urls = urls[: args.max_shards]
    rep: dict = {"kind": args.kind, "manifest_entries": len(urls)}
    if args.kind == "cdx":
        idx = read_cdx(spark, urls)
        if args.filter:
            idx = idx.where(args.filter)
        if args.dedup_digest:
            from pyspark.sql.window import Window

            # null digests carry no content identity: dedup only the rows
            # that HAVE one (a null partition would collapse every
            # undigested record into a single survivor)
            w = Window.partitionBy("digest").orderBy(
                "warc_filename", "warc_offset"
            )
            digested = (
                idx.where(F.col("digest").isNotNull())
                .withColumn("__rn", F.row_number().over(w))
                .where(F.col("__rn") == 1)
                .drop("__rn")
            )
            idx = digested.unionByName(idx.where(F.col("digest").isNull()))
        # one pass: the index is small (~1% of crawl bytes) — cache while
        # both the count and the fetch read it
        idx = idx.cache()
        rep["selected_index_rows"] = idx.count()
        recs = read_cdx_ranges(spark, idx, args.base_url, max_gap=args.max_gap)
    else:
        types = tuple(t for t in args.types.split(",") if t) or None
        recs = read_warc(spark, urls, types=types)
        if args.filter:
            recs = recs.where(args.filter)
    recs.write.mode("overwrite").parquet(args.output)
    rep["output"] = args.output
    rep["n_records"] = spark.read.parquet(args.output).count()
    _json(rep)
    spark.stop()
    return 0


def cmd_pq_table(args) -> int:
    from lantern_extras_spark.operators import pq as PQ

    spark = _spark("pq")
    df = spark.read.parquet(args.input)
    cb = PQ.build_codebook(df, vec_col=args.column, splits=args.splits,
                           k=args.clusters, max_train_rows=args.limit or 100_000)
    coded = PQ.quantize(df, cb, vec_col=args.column, out_col=f"{args.column}_pq")
    coded.write.mode("overwrite").parquet(args.output)
    if args.codebook:
        PQ.save_codebook(cb, args.codebook)
    _json({"output": args.output, "codes_column": f"{args.column}_pq",
           "splits": args.splits, "clusters": args.clusters,
           "codebook": args.codebook})
    spark.stop()
    return 0


def cmd_start_daemon(args) -> int:
    from lantern_extras_spark.jobs.spec import JobStore
    from lantern_extras_spark.streaming.daemon import EmbeddingDaemon

    spark = _spark("daemon")
    store = JobStore(spark, args.store)
    sources = {}
    for spec in args.table or []:
        name, _, path = spec.partition("=")
        if not path:
            raise SystemExit(f"--table expects name=parquet_path, got {spec!r}")
        sources[name] = spark.read.parquet(path)
    daemon = EmbeddingDaemon(store, sources, label=args.label)
    _json({"daemon": "started", "store": args.store, "tables": sorted(sources),
           "label": args.label})
    daemon.run_forever(poll_seconds=args.poll_seconds, max_cycles=args.max_cycles)
    _json({"daemon": "stopped", "ran": sorted(daemon.results)})
    spark.stop()
    return 0


def cmd_start_server(args) -> int:
    from lantern_extras_spark.serving.http_api import CollectionServer

    spark = _spark("http")
    auth = (args.username, args.password) if args.username and args.password else None
    with CollectionServer(spark, args.root, host=args.host, port=args.port,
                          auth=auth) as srv:
        _json({"listening": args.host, "port": srv.port, "root": args.root,
               "auth": bool(auth)})
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            pass
    spark.stop()
    return 0


def cmd_start_indexing_server(args) -> int:
    import ssl

    from lantern_extras_spark.serving.index_server import IndexServer

    ctx = None
    if args.cert and args.key:
        ctx = ssl.SSLContext(ssl.PROTOCOL_TLS_SERVER)
        ctx.load_cert_chain(args.cert, args.key)
    with IndexServer(host=args.host, port=args.port, ssl_context=ctx) as srv:
        _json({"listening": args.host, "port": srv.port, "tls": ctx is not None})
        try:
            srv._thread.join()
        except KeyboardInterrupt:
            pass
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m lantern_extras_spark",
        description="lantern-extras analytics engine on PySpark",
    )
    sub = p.add_subparsers(dest="command", required=True)

    ci = sub.add_parser("create-index", help="build a sharded HNSW index artifact")
    ci.add_argument("--input", required=True, help="source parquet path")
    ci.add_argument("--column", default="embedding")
    ci.add_argument("--id-col", default="vec_id")
    ci.add_argument("--metric-kind", default="l2sq",
                    choices=["l2sq", "cos", "hamming", "dot"])
    ci.add_argument("-m", type=int, default=16)
    ci.add_argument("--efc", type=int, default=16, help="ef_construction")
    ci.add_argument("--ef", type=int, default=16)
    ci.add_argument("--pq", action="store_true")
    ci.add_argument("--index-name", default=None)
    ci.add_argument("--root", default=".")
    ci.add_argument("--n-shards", type=int, default=4)
    ci.set_defaults(fn=cmd_create_index)

    ce = sub.add_parser("create-embeddings", help="embed a parquet column")
    ce.add_argument("--input", required=True)
    ce.add_argument("--column", required=True, help="source text column")
    ce.add_argument("--out-column", default="embedding")
    ce.add_argument("--output", required=True, help="destination parquet path")
    ce.add_argument("--model", default="hash/test-model")
    ce.add_argument("--runtime", default="hash")
    ce.add_argument("--filter", default=None, help="SQL filter expression")
    ce.add_argument("--limit", type=int, default=None)
    ce.add_argument("--batch-size", type=int, default=None)
    ce.set_defaults(fn=cmd_create_embeddings)

    sub.add_parser("show-runtimes", help="list embedding runtimes") \
        .set_defaults(fn=cmd_show_runtimes)

    sm = sub.add_parser("show-models", help="list models for a runtime")
    sm.add_argument("--runtime", default="ort")
    sm.set_defaults(fn=cmd_show_models)

    ms = sub.add_parser("measure-model-speed", help="embedding throughput probe")
    ms.add_argument("--model", default="hash/test-model")
    ms.add_argument("--runtime", default="hash")
    ms.add_argument("--max-tokens", type=int, default=1000)
    ms.set_defaults(fn=cmd_measure_model_speed)

    at = sub.add_parser("autotune-index", help="sweep index variants to a recall target")
    at.add_argument("--input", required=True)
    at.add_argument("--column", default="embedding")
    at.add_argument("--id-col", default="vec_id")
    at.add_argument("--index-kind", default="hnsw",
                    choices=["hnsw", "pq", "ivf", "ivfpq", "bq"])
    at.add_argument("--k", type=int, default=10)
    at.add_argument("--n-queries", type=int, default=10)
    at.add_argument("--target-recall", type=float, default=99.9)
    at.add_argument("--results-dir", default=None, help="N6 results cache dir")
    at.set_defaults(fn=cmd_autotune_index)

    pl = sub.add_parser("plan",
                        help="lint a query's physical plan for scale "
                             "antipatterns (windows w/o partition, cartesian, "
                             "single-partition exchange, unlimited global "
                             "sort, unpushed scan filters)")
    g = pl.add_mutually_exclusive_group(required=True)
    g.add_argument("--name", help="registry query name (__spark_entry__)")
    g.add_argument("--sql", help="ad-hoc SQL to lint")
    pl.add_argument("--table", action="append",
                    help="name=parquet_path view binding for --sql (repeatable)")
    pl.add_argument("--sf-dir", default="/root/testdata/sf0.001",
                    help="sf dir handed to a registry query")
    pl.add_argument("--show-plan", action="store_true")
    pl.set_defaults(fn=cmd_plan)

    cc = sub.add_parser("compare-compressed",
                        help="recall/latency/bytes report across float32, SQ8, BQ, PQ")
    cc.add_argument("--input", required=True)
    cc.add_argument("--column", default="embedding")
    cc.add_argument("--id-col", default="vec_id")
    cc.add_argument("--k", type=int, default=10)
    cc.add_argument("--n-queries", type=int, default=10)
    cc.add_argument("--bq-oversample", type=int, default=8)
    cc.set_defaults(fn=cmd_compare_compressed)

    se = sub.add_parser("search",
                        help="text search over a documents parquet (bm25 or hybrid RRF; "
                             "hybrid's vector side uses the deterministic hash runtime)")
    se.add_argument("--input", required=True)
    se.add_argument("--query", required=True)
    se.add_argument("--mode", default="bm25", choices=["bm25", "hybrid"])
    se.add_argument("--text-col", default="text")
    se.add_argument("--id-col", default="doc_id")
    se.add_argument("--k", type=int, default=10)
    se.add_argument("--pool", type=int, default=30, help="per-system pool before fusion")
    se.set_defaults(fn=cmd_search)

    ch = sub.add_parser("corpus-health",
                        help="Zipf slope + per-language tokenizer fertility "
                             "(+ lexical drift vs a baseline snapshot)")
    ch.add_argument("--input", required=True)
    ch.add_argument("--baseline", default=None,
                    help="older snapshot parquet for vocab drift")
    ch.add_argument("--text-col", default="text")
    ch.add_argument("--group-col", default="lang")
    ch.add_argument("--top-k", type=int, default=20)
    ch.add_argument("--phi", type=float, default=0.001)
    ch.set_defaults(fn=cmd_corpus_health)

    rg = sub.add_parser("release-gate",
                        help="one-shot dataset release audit (diff/drift/leakage)")
    rg.add_argument("--input", required=True)
    rg.add_argument("--baseline", default=None, help="previous snapshot parquet")
    rg.add_argument("--benchmark", default=None, help="eval-set parquet to decontaminate against")
    rg.add_argument("--text-col", default="text")
    rg.add_argument("--split-col", default=None, help="audit this split column for near-dup leakage")
    rg.add_argument("--contamination-threshold", type=float, default=0.5)
    rg.add_argument("--phi", type=float, default=0.002)
    rg.add_argument("--buckets", type=int, default=4096)
    rg.add_argument("--top-k", type=int, default=10)
    rg.set_defaults(fn=cmd_release_gate)

    sd2 = sub.add_parser("select-data",
                         help="DSIR: resample docs toward a target seed corpus")
    sd2.add_argument("--input", required=True)
    sd2.add_argument("--target", required=True, help="seed-corpus parquet path")
    sd2.add_argument("--output", required=True)
    sd2.add_argument("--n", type=int, required=True)
    sd2.add_argument("--text-col", default="text")
    sd2.add_argument("--id-col", default="doc_id")
    sd2.add_argument("--buckets", type=int, default=8192)
    sd2.set_defaults(fn=cmd_select_data)

    sk = sub.add_parser("sketch-stats",
                        help="bounded-state corpus dashboard (HLL/CMS/bottom-k)")
    sk.add_argument("--input", required=True)
    sk.add_argument("--text-col", default="text")
    sk.add_argument("--id-col", default="doc_id")
    sk.add_argument("--m", type=int, default=512, help="HLL registers")
    sk.add_argument("--width", type=int, default=2048, help="CMS width")
    sk.add_argument("--k", type=int, default=1024, help="bottom-k sample size")
    sk.add_argument("--phi", type=float, default=0.002)
    sk.add_argument("--top-k", type=int, default=10)
    sk.set_defaults(fn=cmd_sketch_stats)

    cr = sub.add_parser(
        "crawl-ingest",
        help="public-crawl loop: manifest -> CDX index -> filter/dedup -> "
             "ranged member fetch -> parquet (or --kind warc bulk streaming)",
    )
    cr.add_argument("--manifest", required=True,
                    help="cdx.paths / warc.paths manifest (local or http(s), "
                         "optionally .gz)")
    cr.add_argument("--base-url", required=True,
                    help="crawl data root the manifest lines are relative to")
    cr.add_argument("--output", required=True, help="destination parquet path")
    cr.add_argument("--kind", default="cdx", choices=["cdx", "warc"],
                    help="cdx: index-driven selective fetch; warc: bulk-stream "
                         "whole archives")
    cr.add_argument("--filter", default=None,
                    help="SQL filter over index columns (cdx: url/mime/status/"
                         "digest/...) or record columns (warc)")
    cr.add_argument("--dedup-digest", action="store_true",
                    help="keep one index row per content digest (index-side "
                         "dedup before any archive IO)")
    cr.add_argument("--max-shards", type=int, default=None,
                    help="cap manifest entries (sampling runs)")
    cr.add_argument("--max-gap", type=int, default=256 << 10,
                    help="range-coalescing gap tolerance in bytes (0 = exact)")
    cr.add_argument("--types", default="response",
                    help="comma-separated WARC record types for --kind warc")
    cr.set_defaults(fn=cmd_crawl_ingest)

    pq = sub.add_parser("pq-table", help="product-quantize a vector column")
    pq.add_argument("--input", required=True)
    pq.add_argument("--column", default="embedding")
    pq.add_argument("--output", required=True)
    pq.add_argument("--splits", type=int, default=8)
    pq.add_argument("--clusters", type=int, default=256)
    pq.add_argument("--limit", type=int, default=None, help="PQ training subset")
    pq.add_argument("--codebook", default=None, help="also save the codebook here")
    pq.set_defaults(fn=cmd_pq_table)

    sd = sub.add_parser("start-daemon", help="poll a job store and run embedding jobs")
    sd.add_argument("--store", required=True, help="JobStore root dir")
    sd.add_argument("--table", action="append",
                    help="name=parquet_path source mapping (repeatable)")
    sd.add_argument("--label", default=None)
    sd.add_argument("--poll-seconds", type=int, default=10)
    sd.add_argument("--max-cycles", type=int, default=None,
                    help="exit after N cycles (default: run forever)")
    sd.set_defaults(fn=cmd_start_daemon)

    ss = sub.add_parser("start-server", help="HTTP collections API")
    ss.add_argument("--root", required=True, help="collections root dir")
    ss.add_argument("--host", default="127.0.0.1")
    ss.add_argument("--port", type=int, default=8080)
    ss.add_argument("--username", default=None)
    ss.add_argument("--password", default=None)
    ss.set_defaults(fn=cmd_start_server)

    si = sub.add_parser("start-indexing-server", help="TCP index-build server")
    si.add_argument("--host", default="127.0.0.1")
    si.add_argument("--port", type=int, default=8998)
    si.add_argument("--cert", default=None)
    si.add_argument("--key", default=None)
    si.set_defaults(fn=cmd_start_indexing_server)

    return p


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)
    try:
        return args.fn(args)
    except (ValueError, FileNotFoundError) as e:
        _json({"error": str(e)})
        return 1


if __name__ == "__main__":
    sys.exit(main())
