"""Trainable document-quality classifier — the learned complement to the
heuristic screens (Gopher rules, `quality_metrics`' composite score).

Real pipelines grade unlabeled web text with a lightweight fastText-style
linear model trained on a small labeled set ("looks like curated text" vs
"looks like spam/boilerplate"); the heuristics gate the obvious garbage, the
classifier ranks the middle. This is that model, Spark-native:

- features = hashed token unigrams (HashingTF — the hashing trick keeps the
  vocabulary out of the driver; 2^18 buckets by default) concatenated with
  the engine's numeric quality signals (`quality_metrics` +
  `repetition_stats` columns), so the model sees both content and shape;
- estimator = MLlib LogisticRegression (distributed L-BFGS — one Spark job
  per iteration, no data leaves the cluster);
- scoring = `PipelineModel.transform`: a narrow projection with the model
  broadcast to executors — no shuffle, linear scan at any scale.

Not oracle-checked (iterative distributed optimization is not
SQL-replayable); pinned by tests: separable corpus convergence, held-out
accuracy, save/load round-trip, scoring determinism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lantern_extras_spark.functions.text import tokens
from lantern_extras_spark.operators.textstats import quality_metrics, repetition_stats

# the numeric shape signals fed beside the hashed tokens
NUMERIC_FEATURES = (
    "n_tokens",
    "mean_token_len",
    "punct_ratio",
    "uniq_ratio",
    "dup_line_frac",
    "dup_line_char_frac",
    "top_ngram_char_frac",
    "dup_ngram_char_frac",
)


def _featurized(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    out = repetition_stats(quality_metrics(df, text_col), text_col, id_col)
    return out.withColumn("__qc_toks", tokens(F.col(text_col))).withColumn(
        # Vector assembly rejects nulls/NaNs; empty docs carry zeros
        "__qc_numeric_ok", F.lit(True)
    )


def fit_quality_classifier(
    labeled: DataFrame,
    text_col: str = "text",
    label_col: str = "label",
    id_col: str = "doc_id",
    num_hash_features: int = 1 << 18,
    reg_param: float = 1e-3,
    max_iter: int = 50,
):
    """Fit the quality model on (text, label∈{0,1}) rows; returns a
    PipelineModel (save with `.write().overwrite().save(path)`, reload with
    `PipelineModel.load`)."""
    from pyspark.ml import Pipeline
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, VectorAssembler

    tf = HashingTF(inputCol="__qc_toks", outputCol="__qc_tf",
                   numFeatures=num_hash_features)
    asm = VectorAssembler(
        inputCols=["__qc_tf", *NUMERIC_FEATURES], outputCol="features",
        handleInvalid="keep",
    )
    lr = LogisticRegression(
        featuresCol="features", labelCol=label_col,
        regParam=reg_param, maxIter=max_iter, family="binomial",
    )
    pipe = Pipeline(stages=[tf, asm, lr])
    return pipe.fit(_featurized(labeled, text_col, id_col))


def score_quality(
    df: DataFrame,
    model,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "quality_prob",
) -> DataFrame:
    """Attach P(label=1) per document. Keeps the input columns + `out_col`;
    the feature/vector scaffolding is dropped."""
    from pyspark.ml.functions import vector_to_array

    scored = model.transform(_featurized(df, text_col, id_col))
    return scored.withColumn(
        out_col, vector_to_array(F.col("probability")).getItem(1)
    ).select(*df.columns, out_col)
