"""sf10 spot-sweep of the pair-graph dedup family (r9 verdict #5).

The sf0.1→sf1 decade left four queries in the 0.3-0.47 exponent band —
`dedup_clusters` 0.311, `dedup_keep_best` 0.306, `decontaminate` 0.319,
`simhash_pairs` 0.467 — where one decade cannot separate TRUE-PAIR OUTPUT
growth (inherent: the synthetic corpus adds duplicates linearly by
construction) from SHUFFLE growth (a plan pathology). This tool adds the
second decade: build a 100× documents table the same way bench_sf1 builds
the 10× one (per-copy vocabulary remap so cross-copy shingle overlap is
exactly zero and the duplicate RATE stays constant), time each query at
sf0.1 / sf1 / sf10, and record the ATTRIBUTION volumes alongside the
seconds — candidate pairs, verified pairs/flags, output rows — so
"output-bound vs shuffle-bound" is a measurement, not an argument.

Run: python tools/bench_sf10.py  → one JSON line + SCALE_SF10.json sidecar.
Env: SPARK_GRAFT_SF10_DIR (default /tmp/lantern_sf10), SPARK_GRAFT_SF10_ITERS
(default 2; timing = min over iters), SPARK_GRAFT_SF10_ONLY (subset, merges).
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# local[32] is ONE JVM: spark.driver.memory is the whole heap. The default
# 8g that fits sf0.1/sf1 is undersized for sf10's shingle volume (the r10
# first run died building a tiny broadcast while 32 shingle-explode tasks
# held the heap) — a cluster would bring executor memory with the data;
# here the single JVM must.
os.environ.setdefault("SPARK_DRIVER_MEMORY", "32g")

from pyspark.sql import functions as F

from lantern_extras_spark import get_spark

SF01 = "/root/testdata/sf0.1"
SF1_DIR = os.environ.get("SPARK_GRAFT_SF1_DIR", "/tmp/lantern_sf1")
SF10_DIR = os.environ.get("SPARK_GRAFT_SF10_DIR", "/tmp/lantern_sf10")
N_COPIES = 100
ID_SHIFT = 10_000_000


def build_sf10_documents(spark) -> None:
    """100 copies of sf0.1 documents with doc_id shift + per-copy vocabulary
    remap (same construction as bench_sf1.build_sf1, one more decade)."""
    os.makedirs(SF10_DIR, exist_ok=True)
    if os.path.exists(os.path.join(SF10_DIR, "documents.parquet", "_SUCCESS")):
        return
    docs = spark.read.parquet(f"{SF01}/documents.parquet")
    out = None
    for c in range(N_COPIES):
        if c == 0:
            part = docs
        else:
            remapped = F.concat_ws(
                " ",
                F.transform(
                    F.split(F.col("text"), " "),
                    lambda w: F.concat(w, F.lit(f"_c{c}")),
                ),
            )
            part = docs.select(
                (F.col("doc_id") + c * ID_SHIFT).alias("doc_id"),
                remapped.alias("text"),
                "lang",
                "source",
                F.length(remapped).cast("long").alias("n_chars"),
            )
        out = part if out is None else out.unionByName(part)
    out.repartition(32).write.mode("overwrite").parquet(
        f"{SF10_DIR}/documents.parquet"
    )


def main() -> None:
    from lantern_extras_spark.functions import text as T
    from lantern_extras_spark.operators import dedup as D

    spark = get_spark("bench-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    n_iter = int(os.environ.get("SPARK_GRAFT_SF10_ITERS", "2"))

    t0 = time.monotonic()
    # sf1 documents must exist too (bench_sf1 builds them)
    if not os.path.exists(os.path.join(SF1_DIR, "documents.parquet", "_SUCCESS")):
        from tools.bench_sf1 import build_sf1

        build_sf1(spark)
    build_sf10_documents(spark)
    build_s = round(time.monotonic() - t0, 1)

    scales = (
        ("sf0.1", SF01),
        ("sf1", SF1_DIR),
        ("sf10", SF10_DIR),
    )
    for _, d in scales:
        spark.read.parquet(f"{d}/documents.parquet").foreach(lambda r: None)
    spark.range(32).repartition(32).mapInPandas(lambda it: it, "id long").foreach(
        lambda r: None
    )

    def docs_at(d):
        return spark.read.parquet(f"{d}/documents.parquet")

    # each entry: (timed plan builder, {volume_name: count builder})
    def clusters_plan(docs):
        pairs = D.minhash_dedup(docs, n_hashes=32, bands=8, threshold=0.2)
        return D.dedup_clusters(pairs)

    def clusters_star_plan(docs):
        pairs = D.minhash_dedup(docs, n_hashes=32, bands=8, threshold=0.2)
        return D.dedup_clusters(pairs, strategy="star")

    def keep_best_plan(docs):
        pairs = D.minhash_dedup(docs, n_hashes=32, bands=8, threshold=0.2)
        scored = docs.withColumn("n_tokens", T.token_count("text"))
        return D.dedup_keep_best(scored, pairs, "n_tokens")

    def decont_plan(docs):
        bench = docs.where(F.col("doc_id") < 10)
        train = docs.where(F.col("doc_id") >= 10)
        return D.decontaminate(train, bench, threshold=0.3)

    def decont_bloom_plan(docs):
        bench = docs.where(F.col("doc_id") < 10)
        train = docs.where(F.col("doc_id") >= 10)
        return D.decontaminate(train, bench, threshold=0.3, bloom_prefilter=True)

    def simhash_plan(docs):
        return D.simhash_pairs(D.simhash(docs))

    def simhash_scaled_plan(docs):
        sims = D.simhash(docs, bits=60)
        return D.simhash_pairs(sims, bits=60, band_bits=15, max_hamming=6)

    QUERIES = {
        "dedup_clusters": {
            "plan": clusters_plan,
            "volumes": {
                "lsh_pairs": lambda docs: D.minhash_dedup(
                    docs, n_hashes=32, bands=8, threshold=0.2
                ).count(),
                "output_rows": lambda docs: clusters_plan(docs).count(),
            },
        },
        "dedup_clusters_star": {
            "plan": clusters_star_plan,
            "volumes": {
                "output_rows": lambda docs: clusters_star_plan(docs).count(),
            },
        },
        "dedup_keep_best": {
            "plan": keep_best_plan,
            "volumes": {
                "lsh_pairs": lambda docs: D.minhash_dedup(
                    docs, n_hashes=32, bands=8, threshold=0.2
                ).count(),
                "output_rows": lambda docs: keep_best_plan(docs).count(),
            },
        },
        "decontaminate": {
            "plan": decont_plan,
            "volumes": {
                "flagged": lambda docs: decont_plan(docs).count(),
                # the join-side volume that actually scales: corpus shingles
                "train_shingles": lambda docs: docs.where(F.col("doc_id") >= 10)
                .select(
                    F.explode(
                        T.word_ngrams(T.normalize_for_matching(F.col("text")), 3)
                    )
                )
                .count(),
            },
        },
        "decontaminate_bloom": {
            "plan": decont_bloom_plan,
            "volumes": {
                "flagged": lambda docs: decont_bloom_plan(docs).count(),
            },
        },
        "simhash_pairs": {
            "plan": simhash_plan,
            "volumes": {
                "verified_pairs": lambda docs: simhash_plan(docs).count(),
                # banded candidate volume: Σ per-bucket C(n,2) over 4 bands
                "candidate_pairs": lambda docs: _simhash_candidates(D, docs, 32, 8),
            },
        },
        "simhash_pairs_scaled": {
            "plan": simhash_scaled_plan,
            "volumes": {
                "verified_pairs": lambda docs: simhash_scaled_plan(docs).count(),
                "candidate_pairs": lambda docs: _simhash_candidates(D, docs, 60, 15),
            },
        },
    }

    only = os.environ.get("SPARK_GRAFT_SF10_ONLY")
    names = [n.strip() for n in only.split(",")] if only else list(QUERIES)

    results: dict[str, dict] = {}
    for name in names:
        spec = QUERIES[name]
        entry: dict = {}
        for label, d in scales:
            docs = docs_at(d)
            runs = []
            for _ in range(n_iter):
                t1 = time.monotonic()
                spec["plan"](docs).foreach(lambda r: None)
                runs.append(time.monotonic() - t1)
            entry[label] = round(min(runs), 3)
            vols = {k: int(fn(docs)) for k, fn in spec["volumes"].items()}
            entry[f"{label}_volumes"] = vols
        entry["exponent_01_to_1"] = round(
            math.log10(max(entry["sf1"], 1e-9) / max(entry["sf0.1"], 1e-9)), 3
        )
        entry["exponent_1_to_10"] = round(
            math.log10(max(entry["sf10"], 1e-9) / max(entry["sf1"], 1e-9)), 3
        )
        results[name] = entry
        print(json.dumps({name: entry}), flush=True)

    out = {
        "metric": "sf10_pair_graph_sweep",
        "n_copies": N_COPIES,
        "iters_min_of": n_iter,
        "build_sec": build_s,
        "queries": results,
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "SCALE_SF10.json")
    if only and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        out["queries"] = {**prev.get("queries", {}), **results}
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


def _simhash_candidates(D, docs, bits: int, band_bits: int) -> int:
    """Banded candidate-pair volume Σ_buckets C(n,2) over buckets that pass
    the operator's max_bucket=2000 skew guard — the shuffle-side load the
    verify stage actually pays, computed from bucket sizes without
    materializing the pairs."""
    sims = D.simhash(docs, bits=bits)
    n_bands = bits // band_bits
    total = 0
    for b in range(n_bands):
        key = F.col("simhash").bitwiseAND(
            F.lit(((1 << band_bits) - 1) << (b * band_bits))
        )
        sizes = sims.groupBy(key.alias("k")).count().where(F.col("count") <= 2000)
        row = sizes.agg(
            F.sum(F.col("count") * (F.col("count") - 1) / 2).alias("c")
        ).first()
        total += int(row["c"] or 0)
    return total


if __name__ == "__main__":
    main()
