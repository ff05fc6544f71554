"""Batch embedding pipeline — the Spark re-expression of the reference's
`create-embeddings` flow (SURVEY.md §3.2) and its filter semantics (§2.2).

The reference runs a 3-stage channel pipeline (producer → embed worker →
COPY/UPDATE exporter). Here it is a single lazy plan:

    read → where(ignore_filter) → withColumn(dst, embed) → merge-back

so Catalyst pushes the filters into the scan, prunes columns, and the write-back
join broadcasts the (small) embedded delta when backfilling a subset.

Filter semantics preserved exactly (reference lantern_cli/src/utils/mod.rs:37-39,
daemon/helpers.rs:375-381):
- F1 ignore-filter: src IS NOT NULL AND src != '' AND src != ERROR_SENTINEL
- F2 missing-rows: F1 AND dst IS NULL  (backfill)
- F3 user filter / limit; F4 id-set filter

Rows failing the filter keep a NULL dst (never dropped from the output table).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, FloatType

from lantern_extras_spark.embeddings.registry import default_batch_size, model_dim
from lantern_extras_spark.embeddings.runtimes import get_runtime
from lantern_extras_spark.functions.hashing import hash32
from lantern_extras_spark.functions.text import token_count

# Reference error sentinel skipped by the ignore-filter (utils/mod.rs:39)
ERROR_SENTINEL = "Error: Summary failed (llm)"


def ignore_filter(src: Column | str) -> Column:
    """F1 — rows that should never be embedded are filtered out."""
    c = F.col(src) if isinstance(src, str) else src
    return c.isNotNull() & (c != "") & (c != ERROR_SENTINEL)


def missing_filter(src: Column | str, dst: Column | str) -> Column:
    """F2 — backfill filter: embeddable and not yet embedded."""
    d = F.col(dst) if isinstance(dst, str) else dst
    return ignore_filter(src) & d.isNull()


def hash_embedding(src: Column | str, model: str = "hash/test-model", dim: int | None = None) -> Column:
    """Native-expression deterministic embedding (JVM-side, no Python):
    element i = hash32(f"{model}:{i}:{text}") / 2^32 · 2 − 1 ∈ [−1, 1).

    Bit-identical to HashRuntime and to the DuckDB oracle — used for end-to-end
    pipeline verification, and as the fast path for the 'hash' runtime.
    """
    d = dim or model_dim(model)
    if isinstance(src, str) and "`" not in src and "'" not in model:
        # r13 construction fast path: building d elements through the Column
        # API costs ~7 py4j round-trips per element (~450 for dim=64, a
        # measurable driver-side cost PER QUERY CONSTRUCTION). One F.expr
        # hands the whole expression to the SQL parser in a single call; the
        # parsed tree is the same expression (verified value-identical
        # against the Column form in tests).
        elem = (
            "(cast(conv(substring(md5(concat_ws(':','{m}','{i}',`{c}`)),1,8),16,10) as bigint)"
            " / 4294967296.0D) * 2.0D - 1.0D"
        )
        arr = ",".join(elem.format(m=model, i=i, c=src) for i in range(d))
        return F.expr(f"cast(array({arr}) as array<float>)")
    c = F.col(src) if isinstance(src, str) else src
    elems = [
        (hash32(F.concat_ws(":", F.lit(model), F.lit(str(i)), c)) / F.lit(4294967296.0)) * 2.0 - 1.0
        for i in range(d)
    ]
    return F.array(*elems).cast("array<float>")


def embed_column(
    df: DataFrame,
    src_col: str,
    dst_col: str,
    model: str = "hash/test-model",
    runtime: str = "hash",
    runtime_params: dict | None = None,
    batch_size: int | None = None,
    apply_filter: bool = True,
) -> DataFrame:
    """Attach `dst_col` = embedding of `src_col`; filtered rows keep NULL.

    runtime='hash' compiles to a pure Column expression (whole-stage codegen).
    Other runtimes run as an Arrow-batched pandas UDF whose worker-side runtime
    object is a process singleton (model loaded once per executor python worker),
    batch size capped at the model's default (reference U8 table).
    Row↔vector order alignment is positional within each batch — identical to
    the reference's pairwise zip (embeddings/mod.rs:140-187).
    """
    cond = ignore_filter(src_col) if apply_filter else F.lit(True)

    if runtime == "hash":
        emb = hash_embedding(src_col, model)
        return df.withColumn(dst_col, F.when(cond, emb))

    bs = min(batch_size or default_batch_size(model), default_batch_size(model))
    params = runtime_params or {}

    @F.pandas_udf(ArrayType(FloatType()))
    def embed_udf(it: Iterator[pd.Series]) -> Iterator[pd.Series]:
        rt = get_runtime(runtime, model, params)
        for s in it:
            out: list[list[float] | None] = [None] * len(s)
            texts, idx = [], []
            for i, v in enumerate(s):
                if v is not None:
                    texts.append(v)
                    idx.append(i)
            for start in range(0, len(texts), bs):
                chunk = texts[start : start + bs]
                res = rt.process(chunk)
                for j, vec in enumerate(res.embeddings):
                    out[idx[start + j]] = [float(x) for x in vec]
            yield pd.Series(out)

    masked = F.when(cond, F.col(src_col))
    return df.withColumn(dst_col, embed_udf(masked))


@dataclass
class UsageReport:
    """Usage ledger row shape (reference embedding_usage_info,
    daemon/embedding_jobs.rs:49-58): rows embedded, tokens processed, failures."""

    rows: int
    tokens: int
    failed: int = 0


def create_embeddings(
    df: DataFrame,
    src_col: str,
    dst_col: str,
    model: str = "hash/test-model",
    runtime: str = "hash",
    runtime_params: dict | None = None,
    filter_expr: str | None = None,
    limit: int | None = None,
    batch_size: int | None = None,
) -> tuple[DataFrame, UsageReport]:
    """Full batch pipeline (§3.2): optional user filter/limit (F3), ignore
    filter (F1), embed, and usage accounting (A5). Returns (result, usage)."""
    work = df
    if filter_expr:
        work = work.where(F.expr(filter_expr))
    if limit is not None:
        work = work.limit(limit)
    out = embed_column(work, src_col, dst_col, model, runtime, runtime_params, batch_size)
    stats = (
        out.where(F.col(dst_col).isNotNull())
        .agg(
            F.count("*").alias("rows"),
            F.coalesce(F.sum(token_count(src_col)), F.lit(0)).alias("tokens"),
        )
        .first()
    )
    return out, UsageReport(rows=int(stats["rows"]), tokens=int(stats["tokens"]))


def merge_embeddings(
    dest: DataFrame,
    delta: DataFrame,
    pk: str,
    dst_col: str,
) -> DataFrame:
    """Write-back join — the Spark analog of the reference's COPY-temp +
    single UPDATE-join (S9/J1, embeddings/mod.rs:250-272): left-join the
    embedded delta on the pk and coalesce into the destination column.
    On a lakehouse table this is `MERGE INTO dest USING delta ON pk WHEN
    MATCHED UPDATE`; expressed here engine-agnostically. The delta side is
    typically small (backfill batch) → Catalyst broadcasts it."""
    d = delta.select(F.col(pk), F.col(dst_col).alias("__new_emb"))
    existing = dest.withColumn("__old_emb", F.col(dst_col)).drop(dst_col) if dst_col in dest.columns else dest.withColumn("__old_emb", F.lit(None).cast("array<float>"))
    return (
        existing.join(d, pk, "left")
        .withColumn(dst_col, F.coalesce(F.col("__new_emb"), F.col("__old_emb")))
        .drop("__new_emb", "__old_emb")
    )
