"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (portable to the oracle).

These are the training-data-pipeline companions to the reference's embedding
pipeline: at 100 TB they run as a single narrow projection over the document
scan — no shuffle, full whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lantern_extras_spark.functions.portable import pround

from lantern_extras_spark.functions.hashing import hash32
from lantern_extras_spark.functions.text import (
    bpe_ish_token_count,
    char_ngrams,
    punct_ratio,
    token_count,
    tokens,
    uniq_token_ratio,
)

# Tiny per-language stopword profiles — a deterministic n-gram/stopword heuristic
# (not a model). Order matters: ties break toward the earlier language.
STOPWORD_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "auf"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"),
    "es": ("el", "la", "los", "las", "y", "es", "un", "una", "que", "por"),
    "zh": ("de", "shi", "le", "zai", "he", "wo", "you", "ni", "ta", "men"),
}


def lang_scores(c: Column | str, profiles: dict[str, tuple[str, ...]] | None = None) -> dict[str, Column]:
    """Stopword-hit count per language for a text column."""
    profiles = profiles or STOPWORD_PROFILES
    t = tokens(c)

    def hit(sw: tuple[str, ...]):
        words = list(sw)
        return lambda x: x.isin(words)

    return {lang: F.size(F.filter(t, hit(sw))) for lang, sw in profiles.items()}


def language_id(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "lang_pred",
    profiles: dict[str, tuple[str, ...]] | None = None,
    default: str = "und",
) -> DataFrame:
    """Predict language by stopword-profile argmax (deterministic tie-break =
    profile declaration order; no hits at all → `default`)."""
    profiles = profiles or STOPWORD_PROFILES
    scores = lang_scores(F.col(text_col), profiles)
    langs = list(profiles)
    expr = F.lit(default)
    for lang in reversed(langs):
        cond = scores[lang] > 0
        for other in langs[:langs.index(lang)]:
            cond = cond & (scores[lang] > scores[other])
        for other in langs[langs.index(lang) + 1:]:
            cond = cond & (scores[lang] >= scores[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return df.withColumn(out_col, expr)


def quality_metrics(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach per-document quality features:
    n_tokens, n_bpe_tokens, n_chars, mean_token_len, punct_ratio, uniq_ratio,
    and a composite quality_score in [0,1] (heuristic, deterministic)."""
    t = F.col(text_col)
    toks = tokens(t)
    n_tok = token_count(t)
    mean_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.aggregate(toks, F.lit(0), lambda a, x: a + F.length(x)) / n_tok.cast("double")
    )
    uniq = uniq_token_ratio(t)
    pr = punct_ratio(t)
    length_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = pround(
        (0.4 * uniq + 0.3 * length_ok + 0.3 * (1.0 - F.least(pr * 5.0, F.lit(1.0)))), 6
    )
    return (
        df.withColumn("n_tokens", n_tok)
        .withColumn("n_bpe_tokens", bpe_ish_token_count(t))
        .withColumn("n_chars_m", F.length(t))
        .withColumn("mean_token_len", pround(mean_len, 6))
        .withColumn("punct_ratio", pround(pr, 6))
        .withColumn("uniq_ratio", pround(uniq, 6))
        .withColumn("quality_score", score)
    )


def fingerprint(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 5,
    sketch_k: int = 8,
) -> DataFrame:
    """Bottom-k document fingerprint: the `sketch_k` smallest portable hashes of
    the document's char n-grams (a winnowing-style content sketch; equal sketches
    ⇒ near-identical content). Returns (id, fingerprint array<bigint>, fp_key)."""
    grams = F.array_distinct(char_ngrams(F.col(text_col), ngram))
    hs = F.transform(grams, lambda g: hash32(g))
    sketch = F.slice(F.array_sort(hs), 1, sketch_k)
    return df.select(
        F.col(id_col),
        sketch.alias("fingerprint"),
        # empty documents have no fingerprint (NULL, matching SQL semantics
        # where array_to_string of an empty list is NULL)
        F.when(
            F.size(sketch) > 0, F.md5(F.concat_ws(",", sketch.cast("array<string>")))
        ).alias("fp_key"),
    )


def compression_ratio(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "compression_ratio",
    level: int = 6,
) -> DataFrame:
    """zlib compression ratio (compressed/raw bytes) per document — the
    classic cheap boilerplate/repetition detector (highly repetitive text
    compresses far below ~0.4; high-entropy junk sits near 1.0). Deterministic
    for a fixed zlib level, but NOT SQL-replayable (no zlib in the oracle), so
    this ships with pytest goldens instead of a driver oracle entry.

    Arrow-batched kernel: one C-speed compress per doc, no shuffle — a pure
    projection at any scale. Null/empty text → null ratio."""
    import zlib
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.types import DoubleType, StructField, StructType

    out_schema = StructType(df.schema.fields + [StructField(out_col, DoubleType())])
    cols = [f.name for f in df.schema.fields]

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ratios = []
            for t in pdf[text_col]:
                if t is None or len(t) == 0:
                    ratios.append(None)
                    continue
                raw = t.encode("utf-8")
                ratios.append(len(zlib.compress(raw, level)) / len(raw))
            pdf[out_col] = ratios
            yield pdf[cols + [out_col]]

    return df.mapInPandas(kernel, out_schema)


def tfidf_top_terms(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 3,
    n_docs: int | None = None,
    round_dp: int | None = None,
) -> DataFrame:
    """Per-document top-k TF-IDF terms: tf = term occurrences in the doc,
    idf = ln(N / df_term), deterministic (score desc, term asc) ranking.
    The corpus-characterization primitive of a training-data pipeline (which
    terms dominate a source / a cluster of near-dups).

    Scale shape: one shuffle on (doc, term) for tf, one on term for document
    frequency, then a join back — the df side is vocabulary-sized, so Spark
    broadcasts it when small and sort-merges at web scale. No driver loops.

    Pass `n_docs` to skip the count job; `round_dp` rounds the score with the
    portable floor-form BEFORE ranking so rankings are reproducible across
    engines (cross-engine ln() differs in ulps)."""
    toks = df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_t"))
    n = n_docs if n_docs is not None else df.count()
    score = F.col("tf") * F.log(F.lit(float(n)) / F.col("df_t"))
    if round_dp is not None:
        score = pround(score, round_dp)
    from pyspark.sql.window import Window

    w = Window.partitionBy(id_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        tf.join(dfreq, "term")
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(id_col, "term", "tf", "df_t", "score", "rank")
    )


def strip_boilerplate_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
    min_docs: int = 2,
    max_doc_frac: float = 0.5,
    line_sep: str = "\n",
    out_col: str = "text_clean",
) -> DataFrame:
    """CCNet-style line-level boilerplate removal: a line is boilerplate when
    its trimmed form appears in ≥ `min_docs` documents AND in ≥ `max_doc_frac`
    of the documents of its `group_cols` group (e.g. per source — cookie
    banners, nav menus, subscribe prompts repeat within a site, not across
    the web). Boilerplate lines are removed; remaining lines are rejoined in
    their original order (blank lines count like any other line but are never
    treated as boilerplate). Adds `out_col`; all other columns pass through.

    Scale shape: one explode over lines, a (group, line) count aggregation
    whose result is boilerplate-sized (broadcast join back), and one
    (id, pos)-ordered reassembly groupBy — no self-joins, no driver loops.
    """
    if not (0.0 < max_doc_frac <= 1.0):
        raise ValueError("max_doc_frac must be in (0, 1]")
    gcols = [F.col(c) for c in group_cols]

    # F.split takes a Java regex but concat_ws re-joins with the literal
    # separator — escape so a regex-special line_sep ('|', '.') round-trips
    # instead of splitting per character
    import re as _re

    lines = df.select(
        F.col(id_col), *gcols,
        F.posexplode(F.split(F.col(text_col), _re.escape(line_sep))).alias("__pos", "__line"),
    ).withColumn("__norm", F.trim(F.col("__line")))

    group_sizes = df.groupBy(*gcols).agg(F.countDistinct(id_col).alias("__g_docs"))
    line_docs = (
        lines.where(F.col("__norm") != "")
        .select(*gcols, "__norm", F.col(id_col))
        .distinct()
        .groupBy(*gcols, "__norm")
        .agg(F.count("*").alias("__l_docs"))
    )
    boiler = (
        line_docs.join(group_sizes, list(group_cols))
        .where(
            (F.col("__l_docs") >= min_docs)
            & (F.col("__l_docs") / F.col("__g_docs") >= max_doc_frac)
        )
        .select(*gcols, "__norm")
    )

    kept = lines.join(F.broadcast(boiler), [*group_cols, "__norm"], "left_anti")
    rebuilt = (
        kept.groupBy(id_col)
        .agg(
            F.concat_ws(
                line_sep,
                F.transform(
                    F.array_sort(F.collect_list(F.struct("__pos", "__line"))),
                    lambda s: s["__line"],
                ),
            ).alias(out_col)
        )
    )
    return df.join(rebuilt, id_col, "left").withColumn(
        out_col, F.coalesce(F.col(out_col), F.lit(""))
    )
