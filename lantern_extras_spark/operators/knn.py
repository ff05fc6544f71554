"""Exact k-nearest-neighbor operators.

Reference surface:
- J2 exact-kNN join (correlated `ORDER BY dist LIMIT k` subquery,
  lantern_cli/src/index_autotune/mod.rs:196-203)
- W1 top-k by distance (http_server/search.rs:87-126)
- N3 ground-truth builder / N4 recall evaluation (index_autotune/mod.rs:189-255)

Spark-first design, sized for 100 TB:
- The query side is always the small side → **broadcast** it; the data side streams
  through a narrow map stage. There is no shuffle of the data table at all.
- Strategy "partial": per Arrow batch, a numpy/BLAS kernel computes the distance
  matrix and keeps only the k best rows per query, so the global top-k step sees
  ≤ (#batches × q × k) rows instead of n×q. The final exact top-k is a window over
  that reduced set. Total shuffled bytes are O(q·k·#batches), independent of n·d.
- Strategy "crossjoin": declarative broadcast-nested-loop + window; Catalyst plan,
  good for small data sides and for the correctness oracle, O(n·q) through the window.

Ties are broken deterministically by (distance, id) so results are reproducible and
hash-comparable across engines.
"""

from __future__ import annotations

import math
from typing import Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    IntegerType,
    LongType,
    StructField,
    StructType,
)
from pyspark.sql.window import Window

from lantern_extras_spark.functions.portable import pround

# fail-loud ceiling for query frames that the partial strategy materializes on
# the driver (VERDICT r6 item 2: an unguarded .collect() turns a mistakenly
# huge query side into a driver OOM instead of an actionable error)
MAX_COLLECTED_QUERIES = 100_000

# per-task distance-matrix budget for the partial kernel (doubles): query
# slices are sized so batch_rows x slice stays under this — executor memory
# stays bounded no matter how large the broadcast query block is
_Q_BLOCK_ELEMS = 4_000_000
from lantern_extras_spark.functions.vector import cos_dist, hamming_dist, inner_product, l2sq_dist

METRICS = ("l2sq", "cos", "hamming", "dot")


def distance_col(metric: str, a: Column | str, b: Column | str) -> Column:
    """Distance expression for a metric; 'dot' is negative inner product so that
    ascending order = most similar first (reference `<+>` operator semantics,
    lantern_cli/src/external_index/cli.rs:111-123)."""
    if metric == "l2sq":
        return l2sq_dist(a, b)
    if metric == "cos":
        return cos_dist(a, b)
    if metric == "hamming":
        return hamming_dist(a, b).cast("double")
    if metric == "dot":
        return -inner_product(a, b)
    raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")


def _np_distances(metric: str, X: np.ndarray, Q: np.ndarray) -> np.ndarray:
    """Distance matrix |X| × |Q| in float64 (BLAS path for the partial strategy)."""
    if metric == "l2sq":
        # ||x||^2 + ||q||^2 - 2 x·q  — one GEMM instead of a python loop
        xq = X @ Q.T
        return (X * X).sum(axis=1)[:, None] + (Q * Q).sum(axis=1)[None, :] - 2.0 * xq
    if metric == "cos":
        xn = np.linalg.norm(X, axis=1)
        qn = np.linalg.norm(Q, axis=1)
        denom = xn[:, None] * qn[None, :]
        sim = np.divide(X @ Q.T, denom, out=np.zeros((X.shape[0], Q.shape[0])), where=denom != 0)
        return 1.0 - sim
    if metric == "dot":
        return -(X @ Q.T)
    if metric == "hamming":
        return (X[:, None, :] != Q[None, :, :]).sum(axis=2).astype(np.float64)
    raise ValueError(metric)


def topk(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    metric: str = "l2sq",
    vec_col: str = "vector",
    dist_name: str = "distance",
) -> DataFrame:
    """Single-query top-k (reference W1: `ORDER BY col <-> $vec LIMIT k`).

    `orderBy(dist).limit(k)` compiles to TakeOrderedAndProject — each partition
    keeps a k-heap, the driver merges; no full sort, no shuffle.
    """
    q = F.lit([float(x) for x in query_vec]).cast("array<double>")
    return (
        df.withColumn(dist_name, distance_col(metric, F.col(vec_col), q))
        .orderBy(F.col(dist_name).asc())
        .limit(k)
    )


def knn_join(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
    strategy: str = "partial",
    dist_scale: int | None = None,
    chunk_size: int = 50_000,
) -> DataFrame:
    """Batch exact kNN: for every query row, the k nearest data rows.

    Returns (qid_col, id_col, distance, rank). `strategy`:
    - "partial" (default, the 100 TB path for BOUNDED query sets): broadcast
      queries into an Arrow-batched kernel that emits per-batch top-k, then
      one window over the reduced set. Fail-louds above MAX_COLLECTED_QUERIES.
    - "chunked": EXACT large-vs-large — the query side is hash-split into
      ceil(q / chunk_size) disjoint blocks; each block is collected within
      the driver cap, broadcast, and run through the partial kernel; the
      per-block frames are unioned and one finishing window ranks per query
      (blocks partition the queries, so no cross-block merge is needed).
      The driver never holds more than one block (<= chunk_size rows) at a
      time, removing the partial strategy's 100k ceiling while keeping the
      answer exact. Costs: the data side is scanned once per block (exact
      kNN's O(n*q) distance work is irreducible — persist `data` to
      amortize IO when it fits), and executors hold ~q*d*8 bytes of query
      broadcasts across the union's stages. For query sides where that
      footprint is too large, `ivf.ivf_knn_join` is the (approximate)
      both-sides-distributed alternative.
    - "crossjoin": pure-DataFrame broadcast join + window (oracle-friendly).
    - "auto": count the query side once and route — "partial" when it fits
      the driver cap (one scan of data), "chunked" above it (r10; the
      pipeline-friendly default for callers whose query volume varies).

    `dist_scale` rounds the distance *before* ranking (with (distance, id) tie-break)
    so rankings are reproducible across engines for correctness harnesses.
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")
    if strategy == "auto":
        strategy = (
            "partial"
            if queries.limit(MAX_COLLECTED_QUERIES + 1).count() <= MAX_COLLECTED_QUERIES
            else "chunked"
        )
    if strategy == "chunked":
        return _knn_join_chunked(
            data, queries, k, metric, id_col, vec_col, qid_col, qvec_col,
            dist_scale, chunk_size,
        )
    if strategy == "crossjoin":
        d = distance_col(metric, F.col(vec_col), F.col(qvec_col))
        if dist_scale is not None:
            d = pround(d, dist_scale)
        joined = data.select(id_col, vec_col).crossJoin(
            F.broadcast(queries.select(qid_col, qvec_col))
        )
        w = Window.partitionBy(qid_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
        return (
            joined.withColumn("distance", d)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(qid_col, id_col, "distance", "rank")
        )

    if strategy != "partial":
        raise ValueError(f"unknown strategy {strategy!r}")

    # query side is small by contract (mirrors the reference's sampled query
    # sets, index_autotune/mod.rs:202) — but enforce it: limit(N+1) bounds
    # what the driver materializes, so an accidental 10M-row query frame gets
    # a clear error instead of a driver OOM
    qrows = queries.select(qid_col, qvec_col).limit(MAX_COLLECTED_QUERIES + 1).collect()
    if len(qrows) > MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"strategy='partial' collects the query side to the driver and it "
            f"exceeds {MAX_COLLECTED_QUERIES} rows; for exact large-vs-large "
            "use strategy='chunked' (bounded query blocks, never more than "
            "one on the driver), or ivf.ivf_knn_join for the approximate "
            "both-sides-distributed path"
        )
    partial = _partial_frame(
        data, qrows, k, metric, id_col, vec_col, qid_col, dist_scale
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "distance", "rank")
    )


def _knn_join_chunked(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
    qid_col: str,
    qvec_col: str,
    dist_scale: int | None,
    chunk_size: int,
) -> DataFrame:
    """strategy='chunked' body: bounded query blocks -> union of partial
    frames -> one finishing window. See knn_join's docstring for the cost
    model. The qid hash-split is uniform, and chunk_size is capped at
    MAX_COLLECTED_QUERIES // 2 so even a 2x hash imbalance stays inside the
    driver ceiling; an actual breach still fail-louds."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if chunk_size > MAX_COLLECTED_QUERIES // 2:
        raise ValueError(
            f"chunk_size {chunk_size} > {MAX_COLLECTED_QUERIES // 2} — the "
            "2x hash-imbalance margin over the driver ceiling "
            f"({MAX_COLLECTED_QUERIES}) would be gone. Use more, smaller "
            "chunks; the per-chunk cost is one data-side scan."
        )
    spark = data.sparkSession
    out_schema = StructType(
        [
            StructField(qid_col, LongType()),
            StructField(id_col, LongType()),
            StructField("distance", DoubleType()),
        ]
    )
    # the loop filters this frame once per block — persist the narrow
    # projection for the loop, release it after (the returned plan holds the
    # query vectors in broadcasts and never references the query frame)
    qnarrow = queries.select(qid_col, qvec_col).persist()
    try:
        q_count = qnarrow.count()
        if q_count == 0:
            empty = out_schema.add(StructField("rank", IntegerType()))
            return spark.createDataFrame([], empty)
        n_chunks = -(-q_count // chunk_size)  # ceil
        chunk_key = F.pmod(
            F.xxhash64(F.col(qid_col), F.lit("knn_chunk")), F.lit(n_chunks)
        )
        frames = []
        for c in range(n_chunks):
            qrows = (
                qnarrow.where(chunk_key == c)
                .limit(MAX_COLLECTED_QUERIES + 1)
                .collect()
            )
            if len(qrows) > MAX_COLLECTED_QUERIES:
                raise ValueError(
                    f"strategy='chunked': query block {c}/{n_chunks} holds "
                    f">{MAX_COLLECTED_QUERIES} rows — the qid hash is "
                    "pathologically imbalanced (are qids constant?). Lower "
                    "chunk_size or repair the query ids."
                )
            if not qrows:
                continue
            frames.append(
                _partial_frame(
                    data, qrows, k, metric, id_col, vec_col, qid_col, dist_scale
                )
            )
    finally:
        qnarrow.unpersist()
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    w = Window.partitionBy(qid_col).orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    return (
        union.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, "distance", "rank")
    )


def _partial_frame(
    data: DataFrame,
    qrows: list,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
    qid_col: str,
    dist_scale: int | None,
) -> DataFrame:
    """The partial-top-k mapInPandas frame for one broadcast query block
    (no finishing window): per Arrow batch a BLAS distance kernel keeps the
    k best rows per query, so downstream sees <= (#batches x q x k) rows.
    Shared by strategy='partial' (one block) and strategy='chunked' (one
    frame per bounded block, unioned).

    Kernel shape (sized for 100k-query blocks, not just autotune samples):
    - queries are processed in slices so the distance matrix never exceeds
      ~_Q_BLOCK_ELEMS doubles regardless of block size;
    - the exact (distance, id) top-k is fully vectorized — batch rows are
      pre-sorted by id once, then a per-column STABLE argsort resolves
      distance ties to the smaller id (identical ordering to
      np.lexsort((ids, D[:, j])) per query, without a q-iteration Python
      loop);
    - a running (k x q) best-so-far buffer merges across Arrow batches and
      the task emits ONCE at the end — shuffle volume is tasks*q*k, not
      batches*q*k (a 128 MB task holds ~100 batches; emitting per batch
      would inflate the exchange 100x at scale)."""
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(map(float, r[1])) for r in qrows], dtype=np.float64)
    spark = data.sparkSession
    bqids = spark.sparkContext.broadcast(qids)
    bQ = spark.sparkContext.broadcast(Q)

    out_schema = StructType(
        [
            StructField(qid_col, LongType()),
            StructField(id_col, LongType()),
            StructField("distance", DoubleType()),
        ]
    )

    def partial_topk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, Qm = bqids.value, bQ.value
        nq, dim = Qm.shape[0], (Qm.shape[1] if Qm.ndim == 2 else 1)
        # running per-task top-k: unfilled slots carry (+inf, PAD) so they
        # sort last under the (distance, id) order and are dropped at emit
        PAD = np.iinfo(np.int64).max
        best_d = best_i = None
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if best_d is None:
                best_d = np.full((k, nq), np.inf)
                best_i = np.full((k, nq), PAD, dtype=np.int64)
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()])
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            # pre-sort rows by id: the stable per-column argsort below then
            # breaks equal distances toward the smaller id — the exact
            # (distance, id) order the finishing window expects
            perm = np.argsort(ids, kind="stable")
            X, ids = X[perm], ids[perm]
            kk = min(k, n)
            # hamming's kernel materializes n*q*dim comparisons; the GEMM
            # metrics only n*q — bound the slice accordingly
            per_pair = dim if metric == "hamming" else 1
            qb = max(1, _Q_BLOCK_ELEMS // max(n * per_pair, 1))
            for s0 in range(0, nq, qb):
                D = _np_distances(metric, X, Qm[s0 : s0 + qb])
                if dist_scale is not None:
                    s = float(10**dist_scale)
                    D = np.floor(D * s + 0.5) / s  # portable rounding (matches pround)
                top = np.argsort(D, axis=0, kind="stable")[:kk]  # (kk, qb')
                # merge this batch's top-kk into the running best: stack,
                # order by id (stable), then by distance (stable) — exact
                # (distance, id) over both blocks; PAD rows (inf) sink
                md = np.vstack(
                    [best_d[:, s0 : s0 + qb], np.take_along_axis(D, top, axis=0)]
                )
                mi = np.vstack([best_i[:, s0 : s0 + qb], ids[top]])
                by_id = np.argsort(mi, axis=0, kind="stable")
                md = np.take_along_axis(md, by_id, axis=0)
                mi = np.take_along_axis(mi, by_id, axis=0)
                by_d = np.argsort(md, axis=0, kind="stable")[:k]
                best_d[:, s0 : s0 + qb] = np.take_along_axis(md, by_d, axis=0)
                best_i[:, s0 : s0 + qb] = np.take_along_axis(mi, by_d, axis=0)
        if best_d is not None:
            keep = best_i.ravel() != PAD
            yield pd.DataFrame(
                {
                    qid_col: np.broadcast_to(qi[None, :], best_i.shape).ravel()[keep],
                    id_col: best_i.ravel()[keep],
                    "distance": best_d.ravel()[keep],
                }
            )

    return data.select(id_col, vec_col).mapInPandas(partial_topk, out_schema)


def hard_negatives(
    data: DataFrame,
    queries: DataFrame,
    k: int = 10,
    metric: str = "cos",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    qid_col: str = "query_id",
    qvec_col: str = "query_vec",
    qlabel_col: str = "query_label",
    strategy: str = "partial",
    dist_scale: int | None = None,
    chunk_size: int = 50_000,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query vector, the k nearest
    data vectors whose label DIFFERS from the query's — the pairs that teach
    an embedding model the most (closest in space, known to be different).
    The training-pair counterpart of the exact-kNN join (J2): same execution
    strategies, with the label-mismatch constraint applied BEFORE ranking so
    the result is the true top-k among negatives, not a post-filtered top-k.

    Returns (qid_col, id_col, label_col, distance, rank). Rows with NULL
    labels are excluded from both sides (a null label can neither match nor
    mismatch). Strategies mirror knn_join: "partial" (bounded query sets —
    queries+labels broadcast into an Arrow-batched kernel that masks
    same-label pairs per batch and emits per-task top-k), "chunked" (exact
    large-vs-large: bounded query blocks through the same kernel, unioned,
    one finishing window — mining negatives for a full training set, not
    just a sample), and "crossjoin" (declarative; the oracle-parity path).
    """
    if metric not in METRICS:
        raise ValueError(f"unknown metric {metric!r}; expected one of {METRICS}")
    data = data.where(F.col(label_col).isNotNull())
    queries = queries.where(F.col(qlabel_col).isNotNull())
    if strategy == "auto":
        strategy = (
            "partial"
            if queries.limit(MAX_COLLECTED_QUERIES + 1).count() <= MAX_COLLECTED_QUERIES
            else "chunked"
        )
    if strategy == "chunked":
        return _hard_negatives_chunked(
            data, queries, k, metric, id_col, vec_col, label_col, qid_col,
            qvec_col, qlabel_col, dist_scale, chunk_size,
        )
    if strategy == "crossjoin":
        d = distance_col(metric, F.col(vec_col), F.col(qvec_col))
        if dist_scale is not None:
            d = pround(d, dist_scale)
        joined = (
            data.select(id_col, vec_col, label_col)
            .crossJoin(F.broadcast(queries.select(qid_col, qvec_col, qlabel_col)))
            .where(F.col(label_col) != F.col(qlabel_col))
        )
        w = Window.partitionBy(qid_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
        return (
            joined.withColumn("distance", d)
            .withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select(qid_col, id_col, label_col, "distance", "rank")
        )
    if strategy != "partial":
        raise ValueError(f"unknown strategy {strategy!r}")

    qrows = (
        queries.select(qid_col, qvec_col, qlabel_col)
        .limit(MAX_COLLECTED_QUERIES + 1)
        .collect()
    )
    if len(qrows) > MAX_COLLECTED_QUERIES:
        raise ValueError(
            f"strategy='partial' collects the query side to the driver and it "
            f"exceeds {MAX_COLLECTED_QUERIES} rows; mine negatives for the "
            "full set with strategy='chunked' (bounded query blocks), or use "
            "ivf.ivf_knn_join on a label-partitioned corpus for the ANN path"
        )
    partial = _partial_neg_frame(
        data, qrows, k, metric, id_col, vec_col, label_col, qid_col, dist_scale
    )
    w = Window.partitionBy(qid_col).orderBy(F.col("distance").asc(), F.col(id_col).asc())
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, label_col, "distance", "rank")
    )


def _partial_neg_frame(
    data: DataFrame,
    qrows: list,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
    label_col: str,
    qid_col: str,
    dist_scale: int | None,
) -> DataFrame:
    """hard_negatives' per-task partial frame: the `_partial_frame` kernel
    shape (query slices bounded by _Q_BLOCK_ELEMS, id-presort + stable
    argsort for exact (distance, id) ties, running per-task top-k emitted
    once per task) with the label-mismatch mask applied INSIDE the batch
    before ranking (masked pairs score +inf and are dropped at emit)."""
    qids = np.array([r[0] for r in qrows], dtype=np.int64)
    Q = np.array([list(map(float, r[1])) for r in qrows], dtype=np.float64)
    qlabels = np.array([r[2] for r in qrows], dtype=object)
    spark = data.sparkSession
    bqids = spark.sparkContext.broadcast(qids)
    bQ = spark.sparkContext.broadcast(Q)
    blab = spark.sparkContext.broadcast(qlabels)

    label_field = data.select(label_col).schema.fields[0]
    out_schema = StructType(
        [
            StructField(qid_col, LongType()),
            StructField(id_col, LongType()),
            StructField(label_col, label_field.dataType),
            StructField("distance", DoubleType()),
        ]
    )

    def partial_topk_neg(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        qi, Qm, ql = bqids.value, bQ.value, blab.value
        nq, dim = Qm.shape[0], (Qm.shape[1] if Qm.ndim == 2 else 1)
        PAD = np.iinfo(np.int64).max
        best_d = best_i = best_l = None
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            if best_d is None:
                best_d = np.full((k, nq), np.inf)
                best_i = np.full((k, nq), PAD, dtype=np.int64)
                best_l = np.full((k, nq), None, dtype=object)
            X = np.asarray([np.asarray(v, dtype=np.float64) for v in pdf[vec_col].to_numpy()])
            ids = pdf[id_col].to_numpy(dtype=np.int64)
            labs = pdf[label_col].to_numpy()
            perm = np.argsort(ids, kind="stable")
            X, ids, labs = X[perm], ids[perm], labs[perm]
            kk = min(k, n)
            per_pair = dim if metric == "hamming" else 1
            qb = max(1, _Q_BLOCK_ELEMS // max(n * per_pair, 1))
            for s0 in range(0, nq, qb):
                D = _np_distances(metric, X, Qm[s0 : s0 + qb])
                if dist_scale is not None:
                    s = float(10**dist_scale)
                    D = np.floor(D * s + 0.5) / s
                # mask positives (same label) out of the candidate set
                D = np.where(labs[:, None] == ql[None, s0 : s0 + qb], np.inf, D)
                top = np.argsort(D, axis=0, kind="stable")[:kk]
                md = np.vstack(
                    [best_d[:, s0 : s0 + qb], np.take_along_axis(D, top, axis=0)]
                )
                mi = np.vstack([best_i[:, s0 : s0 + qb], ids[top]])
                ml = np.vstack([best_l[:, s0 : s0 + qb], labs[top]])
                by_id = np.argsort(mi, axis=0, kind="stable")
                md = np.take_along_axis(md, by_id, axis=0)
                mi = np.take_along_axis(mi, by_id, axis=0)
                ml = np.take_along_axis(ml, by_id, axis=0)
                by_d = np.argsort(md, axis=0, kind="stable")[:k]
                best_d[:, s0 : s0 + qb] = np.take_along_axis(md, by_d, axis=0)
                best_i[:, s0 : s0 + qb] = np.take_along_axis(mi, by_d, axis=0)
                best_l[:, s0 : s0 + qb] = np.take_along_axis(ml, by_d, axis=0)
        if best_d is not None:
            flat_d = best_d.ravel()
            # drop PAD slots AND masked (+inf) survivors: a task with fewer
            # than k negatives emits only its real candidates
            keep = (best_i.ravel() != PAD) & np.isfinite(flat_d)
            yield pd.DataFrame(
                {
                    qid_col: np.broadcast_to(qi[None, :], best_i.shape).ravel()[keep],
                    id_col: best_i.ravel()[keep],
                    label_col: best_l.ravel()[keep],
                    "distance": flat_d[keep],
                }
            )

    return data.select(id_col, vec_col, label_col).mapInPandas(
        partial_topk_neg, out_schema
    )


def _hard_negatives_chunked(
    data: DataFrame,
    queries: DataFrame,
    k: int,
    metric: str,
    id_col: str,
    vec_col: str,
    label_col: str,
    qid_col: str,
    qvec_col: str,
    qlabel_col: str,
    dist_scale: int | None,
    chunk_size: int,
) -> DataFrame:
    """strategy='chunked' for hard-negative mining: identical block plan to
    `_knn_join_chunked` (bounded query blocks -> union of per-task partial
    frames -> one finishing window), with query labels traveling in each
    block's broadcast."""
    if chunk_size < 1:
        raise ValueError(f"chunk_size must be >= 1, got {chunk_size}")
    if chunk_size > MAX_COLLECTED_QUERIES // 2:
        raise ValueError(
            f"chunk_size {chunk_size} > {MAX_COLLECTED_QUERIES // 2} — the "
            "2x hash-imbalance margin over the driver ceiling "
            f"({MAX_COLLECTED_QUERIES}) would be gone. Use more, smaller "
            "chunks; the per-chunk cost is one data-side scan."
        )
    spark = data.sparkSession
    label_field = data.select(label_col).schema.fields[0]
    qnarrow = queries.select(qid_col, qvec_col, qlabel_col).persist()
    try:
        q_count = qnarrow.count()
        if q_count == 0:
            empty = StructType(
                [
                    StructField(qid_col, LongType()),
                    StructField(id_col, LongType()),
                    StructField(label_col, label_field.dataType),
                    StructField("distance", DoubleType()),
                    StructField("rank", IntegerType()),
                ]
            )
            return spark.createDataFrame([], empty)
        n_chunks = -(-q_count // chunk_size)
        chunk_key = F.pmod(
            F.xxhash64(F.col(qid_col), F.lit("knn_chunk")), F.lit(n_chunks)
        )
        frames = []
        for c in range(n_chunks):
            qrows = (
                qnarrow.where(chunk_key == c)
                .limit(MAX_COLLECTED_QUERIES + 1)
                .collect()
            )
            if len(qrows) > MAX_COLLECTED_QUERIES:
                raise ValueError(
                    f"strategy='chunked': query block {c}/{n_chunks} holds "
                    f">{MAX_COLLECTED_QUERIES} rows — the qid hash is "
                    "pathologically imbalanced (are qids constant?). Lower "
                    "chunk_size or repair the query ids."
                )
            if not qrows:
                continue
            frames.append(
                _partial_neg_frame(
                    data, qrows, k, metric, id_col, vec_col, label_col,
                    qid_col, dist_scale,
                )
            )
    finally:
        qnarrow.unpersist()
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    w = Window.partitionBy(qid_col).orderBy(
        F.col("distance").asc(), F.col(id_col).asc()
    )
    return (
        union.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(qid_col, id_col, label_col, "distance", "rank")
    )


def ground_truth(
    df: DataFrame,
    n_queries: int = 10,
    k: int = 10,
    metric: str = "l2sq",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 42,
    exclude_self: bool = False,
) -> DataFrame:
    """Exact-kNN ground truth (reference N3, index_autotune/mod.rs:189-219):
    sample `n_queries` rows, return (id, v, neighbors array<long> ordered by distance).

    The reference samples with `ORDER BY RANDOM() LIMIT n`; we use a seeded
    `orderBy(rand(seed))` for reproducibility.
    """
    queries = (
        df.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("query_vec"))
        .orderBy(F.rand(seed))
        .limit(n_queries)
    )
    kk = k + 1 if exclude_self else k
    nn = knn_join(df, queries, k=kk, metric=metric, id_col=id_col, vec_col=vec_col)
    if exclude_self:
        nn = (
            nn.where(F.col("query_id") != F.col(id_col))
            .withColumn(
                "rank",
                F.row_number().over(
                    Window.partitionBy("query_id").orderBy(F.col("distance").asc(), F.col(id_col).asc())
                ),
            )
            .where(F.col("rank") <= k)
        )
    neighbors = collect_neighbors(nn, qid_col="query_id", id_col=id_col)
    return queries.join(neighbors.withColumnRenamed("id", "query_id"), "query_id").select(
        F.col("query_id").alias("id"), F.col("query_vec").alias("v"), "neighbors"
    )


def collect_neighbors(nn: DataFrame, qid_col: str = "query_id", id_col: str = "vec_id") -> DataFrame:
    """(qid, id, rank) rows → (id, neighbors array<id> ordered by rank) — the
    shape `recall` consumes; one aggregation, no driver loop."""
    return (
        nn.groupBy(qid_col)
        .agg(F.sort_array(F.collect_list(F.struct("rank", id_col))).alias("nbr"))
        .select(
            F.col(qid_col).alias("id"),
            F.transform(F.col("nbr"), lambda s: s[id_col]).alias("neighbors"),
        )
    )


def recall(truth: DataFrame, result: DataFrame, k: int) -> float:
    """Mean recall % truncated to 2 dp (reference N4 definition:
    |truth ∩ result| / k · 100 averaged, index_autotune/mod.rs:238-252).

    Both inputs: (id, neighbors array). Computed with `array_intersect` (J3)."""
    j = truth.select("id", F.col("neighbors").alias("t")).join(
        result.select("id", F.col("neighbors").alias("r")), "id"
    )
    mean = (
        j.select((F.size(F.array_intersect("t", "r")) / F.lit(float(k)) * 100.0).alias("rec"))
        .agg(F.avg("rec"))
        .first()[0]
    )
    return math.floor(mean * 100.0) / 100.0
