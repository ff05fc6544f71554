"""End-to-end training-data pipeline — raw scraped docs to packed sequences.

The stages a 100 TB pre-training corpus actually goes through, each one an
operator of this engine (all deterministic, all tested against the DuckDB
oracle via __spark_entry__):

  0. URL-level dedup           canonicalize_url (cheapest dedup a crawl has)
  1. boilerplate removal       strip_boilerplate_lines (per-source lines)
  2. paragraph-level dedup     dedup_paragraphs (corpus-GLOBAL: the license
                               paragraph pasted on two different sites)
  3. scrape cleanup            clean_text (tags, entities, whitespace),
                               redact_pii (emails/IPs/phones -> placeholders)
  4. quality + language        quality_metrics, language_id, gopher_filter
  5. exact + near dedup        exact_dedup / minhash_dedup -> dedup_clusters
                               (banding picked by lsh_tune)
  6. benchmark decontamination decontaminate (drop eval-set leakage)
  7. mixture + quota reports   mixture_weights / resample_mixture,
                               quota_sample, vocab_coverage
  8. split + sequence packing  hash_split, pack_sequences(_concat)
  9. shard export              write_corpus_shards (token-balanced files)
 10. release gate             corpus_diff/diff_summary (what this run did)

r8 additions woven in where a production pipeline runs them:
  3b. takedown blocklist       bloom_anti_join (definite non-matches bypass
                               the join entirely; exact by construction)
  4.  survivor policy          dedup_keep_best (keep each cluster's highest
                               quality_score doc, not an arbitrary one)
  7b. corpus-health gauge      zipf_fit (templated/boilerplate corpora
                               flatten the rank-frequency slope)
  7c. temperature mixture      temperature_weights (XLM-R alpha-sampling)
  7d. target selection         dsir_select (DSIR: more data like my seed)
  7e. drift scalar             corpus_divergence (KL/JS release gauge)
 11. search spot-check        bm25_topk + search_snippets over the final
                               corpus (the eyeball-the-data step, as code)
 11b. sketch dashboard        hll_estimate + bottomk_percentiles +
                               weighted_reservoir (bounded-state corpus view)

Run: python examples/training_data_pipeline.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lantern_extras_spark import get_spark
from lantern_extras_spark.functions.text import tokens as T_tokens
from lantern_extras_spark.embeddings.pipeline import hash_embedding
from lantern_extras_spark.functions.text import clean_text, redact_pii
from lantern_extras_spark.functions.url import canonicalize_url
from lantern_extras_spark.operators import dedup as D
from lantern_extras_spark.operators import sampling as SMP
from lantern_extras_spark.operators.textstats import (
    gopher_filter,
    language_id,
    quality_metrics,
    strip_boilerplate_lines,
    vocab_coverage,
)

BOILER_HDR = "SUBSCRIBE TO OUR NEWSLETTER"
BOILER_FTR = "(c) 2026 Example Corp"
# pasted on two DIFFERENT sites — per-source boilerplate removal cannot see
# it, corpus-global paragraph dedup keeps only the first occurrence
LICENSE_PAR = "Licensed under the Creative Commons Attribution 4.0 International License"

RAW_DOCS = [
    # (id, source, raw html-ish text) — doc 3 duplicates doc 1 (and its URL is
    # a trivial variant of doc 6's below); doc 4 embeds the eval item; every
    # doc carries the same source boilerplate lines
    (1, "siteA", f"{BOILER_HDR}\n<p>The <b>quick</b> brown fox jumps over the lazy dog</p>\n{BOILER_FTR}"),
    (2, "siteA", f"{BOILER_HDR}\n<p>Spark shuffles data between stages &amp; caches hot sets</p>\n{LICENSE_PAR}\n{BOILER_FTR}"),
    (3, "siteA", f"{BOILER_HDR}\n<p>The quick  brown fox jumps over the lazy dog</p>\n{BOILER_FTR}"),
    (4, "siteA", f"{BOILER_HDR}\n<p>intro words what is the capital of france answer paris more filler text</p>\n{BOILER_FTR}"),
    (5, "siteA", f"{BOILER_HDR}\n<p>Product quantization compresses vectors into byte codes</p>\n{BOILER_FTR}"),
    (6, "siteA", f"{BOILER_HDR}\n<p>A completely distinct document about window functions</p>\n{BOILER_FTR}"),
    # doc 7: a re-crawl of doc 1's page under a trivially-different URL —
    # caught by URL-level dedup before any text processing runs
    (7, "siteA", f"{BOILER_HDR}\n<p>The <b>quick</b> brown fox jumps over the lazy dog</p>\n{BOILER_FTR}"),
    # siteB: doc 8 pastes the same license paragraph doc 2 carries — a
    # cross-site repeat per-source boilerplate removal can never catch
    (8, "siteB", f"<p>Columnar formats amortize IO across row groups</p>\n{LICENSE_PAR}"),
    (9, "siteB", "<p>Broadcast joins avoid shuffling the large fact side</p>"),
]

# crawl metadata: doc 7's URL is a variant (case/www/trailing-slash/fragment)
# of doc 1's
URLS = [(i, f"https://WWW.{src}.example/page{i}#frag") for i, src, _ in RAW_DOCS if i != 7]
URLS.append((7, "https://sitea.example/page1/"))

EVAL_SET = [(100, "what is the capital of france answer paris")]


def main() -> dict:
    spark = get_spark("training-data-pipeline")
    spark.sparkContext.setLogLevel("ERROR")
    out: dict = {}

    # -1. CRAWL INGESTION: the corpus enters as WARC archives (the wire
    #     format a fetcher actually lands), read back distributed — one task
    #     per archive — with charset-aware body decoding. doc_id/source ride
    #     WARC-Target-URI. (html markup is NOT stripped here on purpose:
    #     stage 1 keys on line structure and stage 3's clean_text handles
    #     tags — for script/style-bearing real pages use html_to_text.)
    import tempfile

    from lantern_extras_spark.sources.warc import http_body_text, read_warc, write_warc

    crawl_dir = tempfile.mkdtemp(prefix="crawl_")
    for shard in range(3):  # several archives -> several ingest tasks
        recs = [
            {
                "warc_type": "response",
                "target_uri": f"https://{src}.example/ingest/{i}",
                "payload": (
                    b"HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
                    + text.encode("utf-8")
                ),
            }
            for i, src, text in RAW_DOCS[shard::3]
        ]
        write_warc(os.path.join(crawl_dir, f"crawl-{shard:02d}.warc.gz"), recs)
    docs = (
        read_warc(spark, os.path.join(crawl_dir, "*.warc.gz"))
        .where(F.col("http_status") == 200)
        .select(
            F.regexp_extract("target_uri", r"/ingest/(\d+)$", 1).cast("long").alias("doc_id"),
            F.regexp_extract("target_uri", r"https://([a-zA-Z0-9]+)\.example", 1).alias("source"),
            http_body_text().alias("text"),
        )
    )
    out["ingested"] = docs.count()

    # -0.5. INDEX-DRIVEN ACCESS (the 100 TB pattern): build a CDX-style
    #       index over the same archives (sha1 digests + member ranges),
    #       filter/dedup ON THE INDEX, then fetch only surviving ranges —
    #       archive IO proportional to the selection, not the crawl. Here
    #       here the digest screen catches doc 7 (a byte-identical re-crawl
    #       of doc 1) before a single archive byte is fetched — the
    #       cheapest dedup in the whole pipeline; at scale this replaces
    #       the full `read_warc` scan above for every re-query.
    from pyspark.sql.window import Window as _Wnd

    from lantern_extras_spark.sources.warc import index_warc, read_warc_ranges

    idx = index_warc(spark, os.path.join(crawl_dir, "*.warc.gz"))
    keep = (
        idx.where((F.col("warc_type") == "response") & (F.col("http_status") == 200))
        .withColumn(
            "rk",
            F.row_number().over(_Wnd.partitionBy("digest").orderBy("path", "warc_offset")),
        )
        .where("rk = 1")
    )
    out["index_fetched"] = read_warc_ranges(spark, keep).count()

    # -0.4. THE SAME PATTERN OVER HTTP — how public crawl buckets are
    #       actually reached: index from streaming GETs (one per archive
    #       URL, the warc.paths manifest pattern), then fetch survivors via
    #       coalesced `Range:` requests. Served here by a stdlib Range-
    #       honoring server over the same archives; byte-for-byte the same
    #       selection as the local-path run above.
    from tools.rangeserver import serve_directory

    with serve_directory(crawl_dir) as _rs:
        base = _rs.base_url
        urls = [f"{base}/crawl-{s:02d}.warc.gz" for s in range(3)]
        hidx = index_warc(spark, urls)
        hkeep = (
            hidx.where((F.col("warc_type") == "response") & (F.col("http_status") == 200))
            .withColumn(
                "rk",
                F.row_number().over(
                    _Wnd.partitionBy("digest").orderBy("path", "warc_offset")
                ),
            )
            .where("rk = 1")
        )
        out["index_fetched_http"] = read_warc_ranges(spark, hkeep).count()
        assert out["index_fetched_http"] == out["index_fetched"]

    # 0. URL-level dedup: canonical key collapses trivial crawl variants;
    #    keep the smallest doc_id per canonical URL (doc 7 re-crawls doc 1)
    u = spark.createDataFrame(URLS, "doc_id long, url string")
    docs = docs.join(u, "doc_id").withColumn("canonical_url", canonicalize_url("url"))
    w_min = F.min("doc_id").over(Window.partitionBy("canonical_url"))
    docs = docs.withColumn("__keep", F.col("doc_id") == w_min).where("__keep").drop("__keep", "url")
    out["after_url_dedup"] = sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    # 1. per-source boilerplate lines (header/footer every siteA page shares)
    docs = strip_boilerplate_lines(docs, min_docs=2, max_doc_frac=0.5)

    # 2. corpus-GLOBAL paragraph dedup — the license paragraph doc 8 pasted
    #    from doc 2's site survives only in its first corpus occurrence.
    #    Runs BEFORE clean_text (which collapses the newlines it keys on).
    docs = D.dedup_paragraphs(docs, text_col="text_clean", min_chars=30)
    out["license_kept_in"] = sorted(
        r["doc_id"]
        for r in docs.where(F.col("text_dedup").contains(LICENSE_PAR)).collect()
    )

    # 3. cleanup: tags/entities/whitespace, then PII scrubbing
    #    (emails/IPs/phones -> typed placeholders)
    docs = docs.withColumn("text", redact_pii(clean_text("text_dedup"))).drop(
        "text_clean", "text_dedup", "n_paras_dropped"
    )
    out["cleaned_sample"] = docs.where("doc_id = 1").first()["text"]

    # 3. quality + language annotations (kept as columns for downstream
    #    filters) + the Gopher screen as an auditable keep flag (thresholds
    #    relaxed for this tiny demo corpus — real corpora use the defaults)
    docs = language_id(quality_metrics(docs))
    docs = gopher_filter(docs, min_tokens=3, min_stopword_hits=0).where("gopher_keep")
    out["gopher_kept"] = sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    # 4. dedup: near-dup pairs -> connected components -> survivor policy.
    #    `dedup_keep_best` keeps each cluster's BEST doc (highest
    #    quality_score from stage 3) instead of an arbitrary first-seen one —
    #    the keep-the-canonical-copy policy a release pipeline wants when a
    #    re-crawl is cleaner than the original. Singletons keep themselves.
    from lantern_extras_spark.operators.dedup import dedup_keep_best

    pairs = D.minhash_dedup(docs, n_hashes=32, bands=8, threshold=0.8)
    kb = dedup_keep_best(docs, pairs, score_col="quality_score")
    docs = kb.where("is_kept").drop("cluster_id", "cluster_size", "is_kept")
    out["after_dedup"] = sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    # 5. benchmark decontamination against the eval set — shingle level first
    #    (verbatim/near-verbatim leakage), then embedding level (paraphrased
    #    leakage shingles miss: vectors of a reworded eval item still land
    #    near the original)
    bench = spark.createDataFrame(EVAL_SET, "doc_id long, text string")
    docs = D.decontaminate(docs, bench, threshold=0.5, mode="drop")
    out["after_decontaminate"] = sorted(r["doc_id"] for r in docs.select("doc_id").collect())

    doc_vecs = docs.select("doc_id", hash_embedding("text").alias("embedding"))
    bench_vecs = bench.select("doc_id", hash_embedding("text").alias("embedding"))
    clean_ids = D.decontaminate_embeddings(
        doc_vecs, bench_vecs, max_distance=0.2, metric="cos",
        nlist=2, nprobe=2, id_col="doc_id", bench_id_col="doc_id",
        mode="drop",
    ).select("doc_id")
    docs = docs.join(clean_ids, "doc_id", "left_semi")
    out["after_embedding_decontaminate"] = sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )

    # 6b. semantic dedup (SemDeDup): paraphrased near-copies that shingle
    #     dedup missed — cluster the embedding space, prune within cells
    doc_vecs = docs.select("doc_id", hash_embedding("text").alias("embedding"))
    sem_dupes = D.semantic_dedup(
        doc_vecs, threshold=0.95, nlist=2, id_col="doc_id", mode="flag"
    )
    docs = docs.join(sem_dupes.select(F.col("dup_id").alias("doc_id")),
                     "doc_id", "left_anti")
    out["after_semantic_dedup"] = sorted(
        r["doc_id"] for r in docs.select("doc_id").collect()
    )

    # Materialize the survivor set before the reporting/packing stages.
    # Six dedup/filter stages deep, the analyzed plan is large enough that
    # every further action pays Catalyst re-analysis of the whole lineage —
    # and the search spot-check below re-joins this frame against itself,
    # which squares the tree. On a 100 TB run this is the point where the
    # cleaned corpus is written back to storage anyway; locally a
    # localCheckpoint is the same cut.
    docs = docs.localCheckpoint()

    # 7. corpus-shaping reports: the source mixture (and what resampling to a
    #    50/50 token split would emit), a per-source token quota, and the
    #    vocabulary coverage curve
    target = {"siteA": 0.5, "siteB": 0.5}
    out["mixture"] = {
        r["source"]: (r["n_tokens"], r["actual_share"], r["weight"])
        for r in SMP.mixture_weights(docs, target).collect()
    }
    resampled = SMP.resample_mixture(docs, target)
    out["resampled_rows"] = {
        s: n for s, n in resampled.groupBy("source").count().collect()
    }
    out["quota_kept"] = sorted(
        r["doc_id"] for r in SMP.quota_sample(docs, token_budget=25).collect()
    )
    out["vocab_top3"] = [
        (r["token"], r["n"]) for r in vocab_coverage(docs, top_k=3).collect()
    ]

    # 7c. temperature smoothing (XLM-R alpha-sampling): the hands-off
    #     alternative to the static target dict above — low-resource sources
    #     up-weight smoothly, q ∝ p^alpha
    out["temperature"] = {
        r["source"]: (r["temp_share"], r["weight"])
        for r in SMP.temperature_weights(docs, alpha=0.5, group_col="source").collect()
    }

    # 7d. target-distribution selection (DSIR): importance-weight every doc
    #     against the siteA style and Gumbel-sample the 3 most target-like —
    #     the "get me more data that looks like my seed corpus" primitive
    from lantern_extras_spark.operators.selection import (
        corpus_divergence,
        dsir_select,
    )

    seed_corpus = docs.where(F.col("source") == "siteA")
    picked = dsir_select(docs, seed_corpus, n=3, buckets=512)
    out["dsir_picked"] = sorted(r["doc_id"] for r in picked.collect())

    # 7e. ... and the scalar version of the same question: how far apart are
    #     the two sources as distributions? (release-gate drift metric)
    div = corpus_divergence(
        docs.where(F.col("source") == "siteA"),
        docs.where(F.col("source") == "siteB"),
        buckets=512,
    ).collect()[0]
    out["divergence_js"] = div["js_div"]

    # 8. deterministic split + sequence packing for the train shard
    docs = SMP.hash_split(docs)
    train = docs.where(F.col("split") == "train")
    packed = SMP.pack_sequences(train, max_tokens=16, n_buckets=1)
    out["packed"] = [
        (r["doc_id"], r["bucket"], r["bin"], r["pos"]) for r in packed.collect()
    ]

    # 9. materialize the packed sequences as data — one ready-to-tokenize
    #    training row per (bucket, bin), texts concatenated in pack order
    seqs = SMP.pack_sequences_concat(train, max_tokens=16, n_buckets=1)
    out["sequences"] = [
        (r["bucket"], r["bin"], r["doc_ids"], r["n_tokens"], r["text"])
        for r in sorted(seqs.collect(), key=lambda r: (r["bucket"], r["bin"]))
    ]

    # 10. export the train shard as token-balanced files (the layout a
    #     tokenizer job wants: ~equal tokens per file, not ~equal rows)
    import tempfile

    from lantern_extras_spark.sources.sinks import write_corpus_shards

    with tempfile.TemporaryDirectory() as td:
        out["n_shards"] = write_corpus_shards(
            train, os.path.join(td, "shards"), tokens_per_shard=16
        )

    # 7b. corpus-health gauge: natural text sits near slope −1; a flat or
    #     cliff-shaped rank-frequency curve flags templated/boilerplate
    #     domination BEFORE tokens are spent on it
    from lantern_extras_spark.operators.textstats import zipf_fit

    zr = zipf_fit(docs, top_k=30, round_dp=4).collect()[0]
    out["zipf"] = (zr["n_terms"], zr["slope"])

    # 3b (shown late so the frame is small): takedown/opt-out blocklist as a
    #    bloom-prefiltered ANTI join — at crawl scale the blocklist check
    #    runs during the scan; only plausible matches pay the exact join
    from lantern_extras_spark.operators.bloom import bloom_anti_join

    blocklist = spark.createDataFrame([(5,), (999,)], "doc_id long")
    out["after_blocklist"] = bloom_anti_join(docs, blocklist, "doc_id").count()

    # 11. search spot-check: the "eyeball the data" step as code — BM25
    #     top-2 with best-window snippets over the final corpus
    from lantern_extras_spark.operators.retrieval import bm25_topk, search_snippets

    qterms = ["quick", "shuffles"]
    ranked = bm25_topk(docs, qterms, k=2).select("doc_id", "rnk")
    out["spot_check"] = [
        (r["doc_id"], r["n_hits"], r["snippet"])
        for r in sorted(
            search_snippets(ranked, docs, qterms, window=6).collect(),
            key=lambda r: r["rnk"],
        )
    ]

    # 11b. live corpus dashboard, sketch edition: bounded-state answers to
    #      "how many distinct tokens", "what does a doc look like", and a
    #      token-weighted eyeball sample — each mergeable across shards /
    #      streaming epochs (CMS=how often, HLL=how many, bottom-k=what)
    from lantern_extras_spark.functions.text import token_count
    from lantern_extras_spark.operators.sampling import weighted_reservoir
    from lantern_extras_spark.operators.sketches import (
        bottomk_percentiles,
        bottomk_sample,
        hll_build,
        hll_estimate,
    )

    toks = docs.select(F.explode(T_tokens(F.col("text"))).alias("token"))
    hll = hll_estimate(hll_build(toks, "token", m=64), m=64).collect()[0]
    bk = bottomk_sample(docs.withColumn("n_tokens2", token_count("text")), k=4)
    p50 = bottomk_percentiles(bk, "n_tokens2", (0.5,)).collect()[0]
    res = weighted_reservoir(
        docs.withColumn("n_tokens2", token_count("text")), 2, "n_tokens2"
    )
    out["sketches"] = {
        "hll_est": hll["hll_est"],
        "sample_p50_tokens": p50["estimate"],
        "reservoir_ids": sorted(r["doc_id"] for r in res.collect()),
    }

    # 12. release gate: what did this pipeline run actually do to the corpus?
    #     corpus_diff(raw, final) gives the per-doc provenance a dataset
    #     release ships with (here: everything surviving was edited in place
    #     by the cleanup stages; the rest was removed by a dedup/filter)
    from lantern_extras_spark.operators.versioning import corpus_diff, diff_summary

    raw0 = spark.createDataFrame(RAW_DOCS, "doc_id long, source string, text string")
    summ = diff_summary(corpus_diff(raw0, docs)).collect()
    out["release_diff"] = {r["status"]: r["n_docs"] for r in summ}

    # ... and the lexical view of the same gate: which WORDS the pipeline
    # removed or amplified (the boilerplate header should show the largest
    # negative drift — it was stripped from every page)
    from lantern_extras_spark.operators.versioning import vocab_drift

    out["vocab_drift"] = {
        r["token"]: r["log_ratio"]
        for r in vocab_drift(raw0, docs, phi=0.02).collect()
    }
    return out


if __name__ == "__main__":
    for k, v in main().items():
        print(f"{k}: {v}")
