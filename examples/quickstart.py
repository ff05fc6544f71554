"""End-to-end quickstart — the reference's user workflow, on this engine.

Mirrors what a lantern_extras user does today (README of the reference):
  1. create a collection and insert documents            (H2/H3)
  2. register an embedding job and run the backfill       (X11, daemon init)
  3. semantic search with the same model                  (H5 / W1)
  4. incremental embedding of newly arriving rows         (daemon D2-D4)
  5. dedup the corpus before training                     (beyond-reference ops)
  6. quantize vectors + autotune the ANN structure        (PQ Q1-Q3, N5)
  7. build an HNSW index and search through it            (H6 / X9 / N1)

Run: python examples/quickstart.py  (local[*]; uses the deterministic hash
model — swap runtime="ort"/"openai" + runtime_params on a cluster with model
weights or API credentials).
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lantern_extras_spark import CollectionStore, get_spark
from lantern_extras_spark.jobs import JobStore, run_backfill
from lantern_extras_spark.operators import autotune as AT
from lantern_extras_spark.operators import dedup as D
from lantern_extras_spark.operators import pq as PQ

DOCS = [
    "Weather is nice today",
    "The car is red",
    "Spark shuffles data between stages",
    "Weather is nice today",  # exact duplicate -> dedup removes it
    "Product quantization compresses vectors",
    "The daemon watches for new rows",
]


def main(base_dir: str | None = None) -> dict:
    spark = get_spark("quickstart")
    spark.sparkContext.setLogLevel("ERROR")
    base = base_dir or tempfile.mkdtemp(prefix="lantern_quickstart_")
    out: dict = {}

    # 1. collection + insert -------------------------------------------------
    store = CollectionStore(spark, os.path.join(base, "collections"))
    store.create_collection("articles", schema="id bigint, vector array<float>, data string, metadata string")
    store.insert("articles", [{"data": t, "metadata": {"i": i}} for i, t in enumerate(DOCS)])
    out["inserted"] = store.get_collection("articles")["rows"]

    # 2. embedding job + backfill -------------------------------------------
    jobs = JobStore(spark, os.path.join(base, "jobs"))
    jid = jobs.add_embedding_job("articles", src_column="data", dst_column="vector",
                                 embedding_model="hash/test-model", runtime="hash", pk="id")
    articles = store.read("articles")
    embedded = run_backfill(jobs, jid, articles)
    out["job_status"] = jobs.get_embedding_job_status(jid)["status"]
    out["embedded"] = embedded.where("vector is not null").count()

    # 3. semantic search (same model embeds the query) ----------------------
    # persist the embedded collection back, then search
    emb_path = os.path.join(base, "articles_embedded")
    embedded.write.mode("overwrite").parquet(emb_path)
    searchable = spark.read.parquet(emb_path)
    from lantern_extras_spark.embeddings import embed_column
    from lantern_extras_spark.operators.knn import distance_col

    # the deterministic hash model has no semantics; an exact-text query shows
    # the search path end-to-end (identical text -> cosine distance 0 -> rank 1).
    # With a real model (runtime="ort"/"openai") a paraphrase ranks first instead.
    qrow = embed_column(
        spark.createDataFrame([("Weather is nice today",)], "q string"), "q", "emb"
    ).first()
    top = (
        searchable.withColumn(
            "distance", distance_col("cos", F.col("vector"), F.lit([float(x) for x in qrow["emb"]]).cast("array<double>"))
        )
        .orderBy("distance").limit(1).first()
    )
    out["search_top"] = top["data"]

    # 4. incremental: new rows arrive, only they get embedded ----------------
    store.insert("articles", [{"data": "A brand new late-arriving document"}])
    merged = run_backfill(jobs, jobs.add_embedding_job(
        "articles", src_column="data", dst_column="vector",
        embedding_model="hash/test-model", runtime="hash", pk="id"), store.read("articles"))
    out["after_incremental"] = merged.where("vector is not null").count()

    # 5. dedup before training ----------------------------------------------
    docs_df = store.read("articles").select(F.col("id").alias("doc_id"), F.col("data").alias("text"))
    pairs = D.minhash_dedup(docs_df, n_hashes=32, bands=8, threshold=0.9)
    deduped = D.drop_duplicates_keep_first(docs_df, pairs)
    out["after_dedup"] = deduped.count()

    # 6. quantize + autotune -------------------------------------------------
    vecs = merged.where("vector is not null").select(F.col("id").alias("vec_id"), F.col("vector"))
    cb = PQ.build_codebook(vecs, vec_col="vector", splits=4, k=4, max_train_rows=100)
    coded = PQ.quantize(vecs, cb, vec_col="vector")
    out["pq_codes"] = coded.select("pqvec").first()["pqvec"]
    best, _ = AT.autotune_pq(vecs, vec_col="vector", id_col="vec_id", k=2, n_queries=2,
                             target_recall=50.0, variants=((4, 4),), max_train_rows=100)
    out["autotune_recall"] = best.recall if best else None

    # 7. HNSW index over the embedded collection + index-backed search -------
    # (a collection is a parquet dir; persist the embedded rows as one, then
    # create_index -> search(use_index=True) is the reference's index workflow)
    merged.select("id", "vector", "data", "metadata").write.parquet(
        os.path.join(base, "collections", "articles_embedded")
    )
    store.create_index("articles_embedded", column="vector", metric="l2sq", m=8)
    hit = store.search(
        "articles_embedded", query_vec=[float(x) for x in qrow["emb"]],
        k=1, metric="l2sq", use_index=True,
    ).first()
    out["index_search_top"] = hit["data"]
    return out


if __name__ == "__main__":
    for k, v in main().items():
        print(f"{k}: {v}")
