"""Sinks — the reference's export surfaces re-expressed as Spark writers.

- S11 CSV sink: `(pk, "{v1,…,vn}")` rows — the exact brace-array text format of
  the reference's csv_exporter_worker (lantern_cli/src/embeddings/mod.rs:386-415),
  so files round-trip with Postgres `REAL[]` ingestion.
- S9's COPY-temp + UPDATE-join write-back lives in embeddings/pipeline.py
  (`merge_embeddings`); S12 bulk insert is `spark.createDataFrame(...).write`.
- A6 json packing: `to_json(collect_list(struct(...)))` helpers mirroring the
  reference's `json_agg(q.*)` result packaging (http_server/search.rs:93-117).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def vector_to_pg_text(vec: Column | str) -> Column:
    """Format array<float> as the Postgres array literal `{v1,...,vn}`."""
    c = F.col(vec) if isinstance(vec, str) else vec
    return F.concat(F.lit("{"), F.array_join(c.cast("array<string>"), ","), F.lit("}"))


def export_embeddings_csv(
    df: DataFrame,
    path: str,
    pk: str = "id",
    vec_col: str = "emb",
    header: bool = False,
    single_file: bool = False,
) -> None:
    """S11: write (pk, brace-formatted vector) CSV. `single_file` coalesces to
    one part for small exports; at scale leave it off and let each task write
    its own part (the only scalable shape)."""
    out = df.select(F.col(pk), vector_to_pg_text(vec_col).alias(vec_col))
    if single_file:
        out = out.coalesce(1)
    out.write.mode("overwrite").option("header", str(header).lower()).csv(path)


def json_agg(df: DataFrame, group_cols: list[str] | None = None, out_col: str = "rows") -> DataFrame:
    """A6: pack rows into a JSON array per group (reference `json_agg(q.*)`).
    With no group columns, one row holding the whole result set."""
    struct_cols = [c for c in df.columns if not group_cols or c not in group_cols]
    packed = F.to_json(F.collect_list(F.struct(*[F.col(c) for c in struct_cols])))
    if group_cols:
        return df.groupBy(*group_cols).agg(packed.alias(out_col))
    return df.agg(packed.alias(out_col))


def json_object_agg(df: DataFrame, key_col: str, val_col: str, out_col: str = "obj") -> DataFrame:
    """A6: `json_object_agg(k, v)` — one JSON object from two columns
    (reference packs schemas this way, http_server/collection.rs:73)."""
    return df.agg(
        F.to_json(
            F.map_from_entries(F.collect_list(F.struct(F.col(key_col), F.col(val_col))))
        ).alias(out_col)
    )


def write_corpus_shards(
    df: DataFrame,
    path: str,
    tokens_per_shard: int = 10_000_000,
    text_col: str = "text",
    id_col: str = "doc_id",
    fmt: str = "parquet",
    salt: str = "shard",
    mode: str = "overwrite",
) -> int:
    """Export the final corpus as token-balanced shards — the file layout a
    tokenizer/training job actually wants: every output file holds
    ~`tokens_per_shard` whitespace tokens, so downstream workers get even
    work regardless of document-length skew (naive `repartition(n)` balances
    ROWS; one shard full of books and one of tweets differ 100× in tokens).

    Shard assignment reuses `pack_sequences`' deterministic contiguous-prefix
    binning with ONE hash bucket (shard = global token-prefix // budget, doc
    order seeded by hash — reproducible across runs), then writes one file
    per shard: rows are repartitioned on `shard` before the
    partitionBy("shard") write, so each shard's rows land in exactly one
    task and therefore one file per shard directory. Returns the shard
    count, computed from the cached assignment frame BEFORE the write (the
    packing window runs once, not re-executed for the count).

    Scale shape: one window cumsum for the assignment and one
    shuffle-on-shard write; n_buckets=1 serializes the cumsum window, so for
    100 TB exports raise `n_buckets` in a direct `pack_sequences` call and
    treat (bucket, bin) as the shard key — this convenience wrapper keeps the
    single-sequence layout small exports want.
    """
    if fmt not in ("parquet", "json", "text"):
        raise ValueError(f"unknown fmt {fmt!r} (parquet/json/text)")
    from lantern_extras_spark.operators.sampling import pack_sequences

    asg = pack_sequences(
        df, text_col=text_col, id_col=id_col,
        max_tokens=tokens_per_shard, n_buckets=1, salt=salt,
    ).select(F.col(id_col), F.col("bin").alias("shard")).cache()
    n_shards = asg.agg(F.countDistinct("shard")).first()[0]
    out = df.join(asg, id_col).repartition("shard")
    if fmt == "text":
        # .text() takes exactly one value column; shard stays as the
        # partition directory
        out.select(F.col(text_col).alias("value"), "shard").write.mode(
            mode
        ).partitionBy("shard").text(path)
    elif fmt == "json":
        out.write.mode(mode).partitionBy("shard").json(path)
    else:
        out.write.mode(mode).partitionBy("shard").parquet(path)
    asg.unpersist()
    return n_shards
