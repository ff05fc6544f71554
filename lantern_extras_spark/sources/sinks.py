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
