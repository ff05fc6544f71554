"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting. All pure Column expressions (portable to the oracle).

These are the training-data-pipeline companions to the reference's embedding
pipeline: at 100 TB they run as a single narrow projection over the document
scan — no shuffle, full whole-stage codegen.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from lantern_extras_spark.functions.portable import pround

from lantern_extras_spark.functions.hashing import hash32
from lantern_extras_spark.functions.text import (
    bpe_ish_token_count,
    char_ngrams,
    nonws_char_count,
    punct_ratio,
    token_count,
    tokens,
    uniq_token_ratio,
    uniq_token_ratio_of,
    word_ngrams_of,
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
    # stage tokens once (multi-use alias survives CollapseProject) — n_tokens
    # and uniq_ratio both read them; inlining tokens() would re-split per use
    staged = df.withColumn("__qm_toks", tokens(t))
    toks = F.col("__qm_toks")
    n_tok = F.size(toks)
    # mean token length = (summed token lengths) / n_tok, and the summed token
    # lengths of a whitespace split ARE the non-ws char count — one regex scan
    # instead of a per-element fold over the token array
    mean_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        nonws_char_count(t) / n_tok.cast("double")
    )
    uniq = uniq_token_ratio_of(toks)
    pr = punct_ratio(t)
    length_ok = F.when((n_tok >= 5) & (n_tok <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = pround(
        (0.4 * uniq + 0.3 * length_ok + 0.3 * (1.0 - F.least(pr * 5.0, F.lit(1.0)))), 6
    )
    return (
        staged.withColumn("n_tokens", n_tok)
        .withColumn("n_bpe_tokens", bpe_ish_token_count(t))
        .withColumn("n_chars_m", F.length(t))
        .withColumn("mean_token_len", pround(mean_len, 6))
        .withColumn("punct_ratio", pround(pr, 6))
        .withColumn("uniq_ratio", pround(uniq, 6))
        .withColumn("quality_score", score)
        .drop("__qm_toks")
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


def kmv_distinct(
    df: DataFrame,
    value_col: Column | str,
    group_cols: tuple[str, ...] = (),
    k: int = 256,
    out_col: str = "distinct_est",
) -> DataFrame:
    """Deterministic distinct-count sketch: K-Minimum-Values (Bar-Yossef et
    al. 2002) over the engine-portable `hash32`. If the k-th smallest of n
    distinct uniform hashes in [0, 2³²) is h_k, the density estimate gives
    n ≈ (k−1)·2³²/h_k — standard error ~1/√(k−2) (≈6% at k=256).

    Why not HLL (`approx_count_distinct`)? Spark's and DuckDB's HLL
    implementations hash differently, so HLL estimates can never
    hash-compare across engines. KMV over md5-based hash32 is EXACTLY
    reproducible anywhere: same data → same k-th minimum → same estimate,
    bit for bit — the sketch stays inside the engine's cross-engine
    determinism contract while costing one narrow projection + a per-group
    top-k (no exact-distinct shuffle of the full value set).

    Returns one row per group: (group_cols…, n_rows, `out_col`). Groups with
    fewer than k distinct hashes report the EXACT distinct count (every
    value's hash is present — no estimation needed or valid there).

    Scale shape — two-phase k-min, NO global ranking window: a ranking
    window over an empty partition spec would move EVERY distinct hash
    (billions of rows for a URL/id-like column at 100 TB) through one
    reducer; ranking windows do not map-side-combine. Instead:

    1. one shuffle for `distinct()` (hash-partitioned, map-side combined),
    2. per-PARTITION bounded k-min state inside `mapInPandas` — memory
       O(groups·k) per worker, emitting ≤ groups·k survivor rows per
       partition, never a sort of the partition,
    3. final per-group k smallest of the ≤ k·P survivors via
       slice(array_sort(collect_list)) — the collect_list input is bounded
       by k·P rows per group by construction.

    Any hash in the global k minimum of its group is in the k minimum of
    its own partition (partials are disjoint subsets of the distinct set),
    so phase 3 sees every global winner — answers are IDENTICAL to a full
    rank, and the estimate stays O(groups·k) driver-free arithmetic.
    """
    if k < 3:
        raise ValueError("k must be >= 3 (variance is undefined below)")
    v = F.col(value_col) if isinstance(value_col, str) else value_col
    h = hash32(v.cast("string"))
    # null values contribute nothing (COUNT(DISTINCT) semantics — also keeps
    # the pandas k-min free of NaN ordering divergence: Spark sorts nulls
    # first ASC, pandas/DuckDB last)
    hashed = df.select(*group_cols, h.alias("__h")).where(F.col("__h").isNotNull())
    gb = list(group_cols)
    distinct_h = hashed.distinct()

    import pandas as pd

    def kmin_partial(batches):
        # bounded running state: the k smallest distinct hashes per group
        # seen so far in THIS partition (≤ groups·k rows at all times)
        state: "pd.DataFrame | None" = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            both = pd.concat([state, pdf], ignore_index=True) if state is not None else pdf
            if gb:
                state = (
                    both.sort_values("__h", kind="mergesort")
                    .groupby(gb, dropna=False, sort=False)
                    .head(k)
                )
            else:
                state = both.nsmallest(k, "__h")
        if state is not None and len(state):
            yield state

    survivors = distinct_h.mapInPandas(kmin_partial, distinct_h.schema)
    mins = F.slice(F.array_sort(F.collect_list("__h")), 1, k)
    est = (
        survivors.groupBy(*gb)
        .agg(mins.alias("__mins"))
        .withColumn("__nk", F.size("__mins"))
        .where(F.col("__nk") > 0)
        .withColumn(
            out_col,
            F.when(
                F.col("__nk") < k, F.col("__nk").cast("double")  # exact below k
            ).otherwise(
                (F.lit(float(k - 1)) * F.lit(4294967296.0))
                / F.element_at(F.col("__mins"), F.col("__nk")).cast("double")
            ),
        )
        .select(*gb, F.col("__nk").alias("n_kept_hashes"), out_col)
    )
    n_rows = df.groupBy(*gb).agg(F.count("*").alias("n_rows")) if gb else (
        df.agg(F.count("*").alias("n_rows"))
    )
    if gb:
        return n_rows.join(est, gb)
    return n_rows.crossJoin(est)


def _mg_prune(state: dict, cap: int) -> dict:
    """One Misra-Gries reduction step: keep <= cap counters by subtracting
    the (cap+1)-th largest count and dropping the non-positive remainder."""
    if len(state) <= cap:
        return state
    cut = sorted(state.values(), reverse=True)[cap]
    return {t: c - cut for t, c in state.items() if c > cut}


def _mg_group_candidates(toks: DataFrame, m: int) -> DataFrame:
    """Per-group Misra-Gries candidate tokens over a (__g, __toks) frame —
    one independent capacity-m summary per group within each partition, so
    the per-group no-false-negative guarantee holds (averaging argument,
    group-wise). Shared by `heavy_hitters(group_col=...)` and
    `versioning.vocab_drift`'s single-pass two-snapshot pipeline (r13)."""
    from typing import Iterator

    import pandas as pd

    def mg_by_group(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        states: dict[str, dict[str, int]] = {}
        for pdf in batches:
            if len(pdf) == 0:
                continue
            ex = pdf[["__g", "__toks"]].explode("__toks").dropna()
            if len(ex) == 0:
                continue
            for (g, tok), c in ex.groupby(["__g", "__toks"]).size().items():
                st = states.setdefault(g, {})
                st[tok] = st.get(tok, 0) + int(c)
            states = {g: _mg_prune(st, m) for g, st in states.items()}
        yield pd.DataFrame(
            {"__g": [g for g, st in states.items() for _ in st],
             "token": [t for st in states.values() for t in st]}
        )

    return toks.mapInPandas(mg_by_group, "__g string, token string").distinct()


def heavy_hitters(
    df: DataFrame,
    phi: float = 0.001,
    text_col: str = "text",
    m: int | None = None,
    out_order: bool = True,
    group_col: str | None = None,
) -> DataFrame:
    """Exact φ-heavy-hitter tokens via a two-pass Misra-Gries design: every
    token whose global count exceeds φ·N (N = total token count), with EXACT
    counts — the standard sketch shape for corpus-frequency questions at
    100 TB, where a full `groupBy(token)` shuffles the entire vocabulary
    (Zipf tail: mostly singletons) to answer a question about its head.

    Pass 1 (candidates): one Misra-Gries summary of capacity `m` (default
    ceil(1/φ)) per partition, built batch-wise — pandas `value_counts` per
    Arrow batch (C speed), MG-merged into the running summary (add counters,
    then subtract the (m+1)-th largest and drop ≤0 — the mergeable-summaries
    reduction of Agarwal et al. 2013). Each partition emits ≤ m candidate
    tokens, no shuffle. Guarantee: a token with global count > N/(m+1) must
    exceed n_p/(m+1) in at least one partition (averaging argument), so with
    m ≥ 1/φ the candidate set contains every φ-heavy token — no false
    negatives, only false positives.

    Pass 2 (exact): re-count ONLY candidate tokens — explode → broadcast
    semi-join against the candidate set (≤ m·partitions rows, tiny) →
    groupBy. The shuffle carries heavy-token occurrences only; the Zipf tail
    never leaves the map side. N itself is a narrow sum of `size(tokens)`.

    Output: (token, n, share) for n > φ·N, ordered n desc / token asc when
    `out_order` (deterministic; exact counts make the output
    engine-replayable by a plain GROUP BY + HAVING — the sketch changes the
    execution shape, never the answer).

    `group_col` (e.g. "lang"): φ-heavy hitters PER GROUP against that
    group's own token total — per-language stopword discovery, per-source
    boilerplate heads. Pass 1 keeps one independent MG summary per group
    within each partition (per-group capacity, per-group guarantee — the
    averaging argument applies group-wise since totals are group-wise);
    output gains the group column, ordered (group, n desc, token).
    """
    if not (0.0 < phi < 1.0):
        raise ValueError(f"phi must be in (0, 1), got {phi}")
    if m is None:
        m = math.ceil(1.0 / phi)
    if m < 1:
        raise ValueError(f"m must be >= 1, got {m}")

    from typing import Iterator

    import pandas as pd

    def prune(state: dict, cap: int) -> dict:
        if len(state) <= cap:
            return state
        cut = sorted(state.values(), reverse=True)[cap]
        return {t: c - cut for t, c in state.items() if c > cut}

    if group_col is None:
        # tokenize ONCE: candidates (pass 1), the exact recount explode and
        # the token total (pass 2) all read this cached projection — one
        # tokenize + one source scan instead of three (r7 verdict, minor)
        # r14: scoped — the next heavy_hitters call releases this call's
        # blocks (r13 verdict item 3)
        from lantern_extras_spark.operators._cachescope import scoped_persist

        (toks,) = scoped_persist(
            "heavy_hitters_toks", df.select(tokens(text_col).alias("__toks"))
        )

        def mg_candidates(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            state: dict[str, int] = {}
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                counts = pdf["__toks"].explode().dropna().value_counts()
                for tok, c in counts.items():
                    state[tok] = state.get(tok, 0) + int(c)
                state = prune(state, m)
            yield pd.DataFrame({"token": list(state.keys())})

        candidates = toks.mapInPandas(mg_candidates, "token string").distinct()
        exploded = toks.select(F.explode("__toks").alias("token"))
        total = toks.agg(F.sum(F.size("__toks")).alias("__N"))
        counted = (
            exploded.join(F.broadcast(candidates), "token", "left_semi")
            .groupBy("token")
            .agg(F.count("*").alias("n"))
            .crossJoin(F.broadcast(total))
            .where(F.col("n") > F.lit(phi) * F.col("__N"))
            .select(
                "token", "n",
                pround(F.col("n") / F.col("__N"), 6).alias("share"),
            )
        )
        if out_order:
            counted = counted.orderBy(F.col("n").desc(), F.col("token").asc())
        return counted

    # grouped variant: same single-scan shape — one cached (group, tokens)
    # projection feeds candidates, the exact recount and per-group totals
    from lantern_extras_spark.operators._cachescope import scoped_persist

    (toks,) = scoped_persist(
        "heavy_hitters_toks_grouped",
        df.select(
            F.col(group_col).cast("string").alias("__g"),
            tokens(text_col).alias("__toks"),
        ),
    )
    candidates = _mg_group_candidates(toks, m)
    exploded = toks.select("__g", F.explode("__toks").alias("token"))
    totals = toks.groupBy("__g").agg(F.sum(F.size("__toks")).alias("__N"))
    counted = (
        exploded.join(F.broadcast(candidates), ["__g", "token"], "left_semi")
        .groupBy("__g", "token")
        .agg(F.count("*").alias("n"))
        .join(F.broadcast(totals), "__g")
        .where(F.col("n") > F.lit(phi) * F.col("__N"))
        .select(
            F.col("__g").alias(group_col), "token", "n",
            pround(F.col("n") / F.col("__N"), 6).alias("share"),
        )
    )
    if out_order:
        counted = counted.orderBy(
            F.col(group_col).asc(), F.col("n").desc(), F.col("token").asc()
        )
    return counted


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


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ngram_n: int = 2,
    dup_ngram_n: int = 5,
    line_sep: str = "\n",
) -> DataFrame:
    """Gopher/MassiveText-style within-document repetition signals — the
    quality filters that catch boilerplate-looping and keyword-stuffed docs
    which length/punctuation ratios miss (Rae et al. 2021 §A1.1 thresholds:
    e.g. drop if dup_line_frac > 0.30 or top_2gram_char_frac > 0.20).

    Adds four columns (all in [0, 1], empty docs score 0):
    - `dup_line_frac`: occurrences of repeated non-empty lines / total
      non-empty lines (every occurrence of a line that appears ≥ 2× counts);
    - `dup_line_char_frac`: characters in those occurrences / characters in
      all non-empty lines;
    - `top_ngram_char_frac`: (occurrences × char length) of the most frequent
      word `top_ngram_n`-gram / doc char length (ties break to the
      lexicographically smallest gram); 0.0 unless that gram occurs ≥ 2× — a
      once-occurring gram is not repetition, and without the floor every
      short doc scores high on pure length noise;
    - `dup_ngram_char_frac`: summed char length over all occurrences of word
      `dup_ngram_n`-grams appearing ≥ 2×, / doc char length, capped at 1.0
      (overlapping occurrences double-count, the standard approximation).

    Scale shape: pure per-row Column expressions — each doc's lines/grams are
    array-sorted and scanned via index transforms (duplicates are adjacent
    after the sort), so the whole operator is one narrow projection with NO
    shuffle and no Python workers; O(L log L) per doc. The sorted arrays are
    projected into real (multi-use) columns BEFORE the indexed scans — Spark
    re-evaluates a higher-order lambda's inner expression tree per element,
    so an inlined array_sort would re-sort per element_at, turning the scan
    O(L² log L) (measured 82 s → 0.7 s at sf0.1; the word_ngrams trap again).
    The DuckDB oracle replays the semantics with unnest + GROUP BY
    (`q_repetition_stats`)."""
    from lantern_extras_spark.functions.text import word_ngrams_of

    t = F.col(text_col)
    # NOT `F.transform(..., F.trim)`: trim's optional 2nd param makes
    # transform pass the element INDEX as the trim-character set, silently
    # leaving whitespace intact (caught by the adversarial parity gate)
    lines = F.filter(
        F.transform(F.split(t, re.escape(line_sep)), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    toks = tokens(t)
    # stage sorted arrays as bound multi-use columns (survive CollapseProject)
    staged = (
        df.withColumn("__rep_toks", toks)
        .withColumn("__rep_sl", F.array_sort(lines))
        .withColumn("__rep_tg", F.array_sort(word_ngrams_of(F.col("__rep_toks"), top_ngram_n)))
        .withColumn("__rep_dg", F.array_sort(word_ngrams_of(F.col("__rep_toks"), dup_ngram_n)))
    )

    def _sorted_scan(s: Column, chars_of) -> tuple[Column, Column, Column]:
        """(n, dup_count, dup_chars) over a SORTED bound column's adjacency
        runs. `s` must be a column reference, never an inline expression."""
        n = F.size(s)
        idx = F.sequence(F.lit(1), n)  # guarded by callers: only used when n > 0

        def is_dup(i):
            # neighbors via when-guarded element_at: ANSI mode throws on
            # out-of-range indexes, and when() branches evaluate lazily;
            # x == NULL is NULL, which `when` treats as false — correct here
            x = F.element_at(s, i)
            prev = F.when(i > 1, F.element_at(s, i - 1))
            nxt = F.when(i < n, F.element_at(s, i + 1))
            return (x == prev) | (x == nxt)

        dup_count = F.aggregate(
            idx, F.lit(0),
            lambda acc, i: acc + F.when(is_dup(i), 1).otherwise(0),
        )
        dup_chars = F.aggregate(
            idx, F.lit(0),
            lambda acc, i: acc + F.when(is_dup(i), chars_of(F.element_at(s, i))).otherwise(0),
        )
        return n, dup_count, dup_chars

    sl = F.col("__rep_sl")
    ln, l_dup, l_dup_chars = _sorted_scan(sl, F.length)
    total_line_chars = F.aggregate(sl, F.lit(0), lambda a, x: a + F.length(x))
    dup_line_frac = F.when(ln == 0, F.lit(0.0)).otherwise(
        l_dup.cast("double") / ln.cast("double")
    )
    dup_line_char_frac = F.when((ln == 0) | (total_line_chars == 0), F.lit(0.0)).otherwise(
        l_dup_chars.cast("double") / total_line_chars.cast("double")
    )

    n_chars = F.length(t)

    # most-frequent top_ngram_n-gram: after array_sort equal grams are one
    # contiguous run — a single indexed scan tracks (run, best, best_chars);
    # ties keep the first (lexicographically smallest) gram
    tg = F.col("__rep_tg")
    tn = F.size(tg)
    state0 = F.struct(
        F.lit(0).alias("run"), F.lit(0).alias("best"), F.lit(0).alias("best_chars"),
    )
    idx_t = F.sequence(F.lit(1), tn)

    def step(st, i):
        x = F.element_at(tg, i)
        prev = F.when(i > 1, F.element_at(tg, i - 1))  # NULL at i=1 (ANSI-safe)
        run = F.when(x == prev, st["run"] + 1).otherwise(F.lit(1))
        return F.struct(
            run.alias("run"),
            F.greatest(st["best"], run).alias("best"),
            F.when(run > st["best"], run * F.length(x)).otherwise(st["best_chars"]).alias("best_chars"),
        )

    top_chars = F.aggregate(
        idx_t, state0, step,
        lambda st: F.when(st["best"] >= 2, st["best_chars"]).otherwise(F.lit(0)),
    )
    top_frac = F.when((tn == 0) | (n_chars == 0), F.lit(0.0)).otherwise(
        F.least(top_chars.cast("double") / n_chars.cast("double"), F.lit(1.0))
    )

    dn, _d_cnt, d_chars = _sorted_scan(F.col("__rep_dg"), F.length)
    dup_ngram_frac = F.when((dn == 0) | (n_chars == 0), F.lit(0.0)).otherwise(
        F.least(d_chars.cast("double") / n_chars.cast("double"), F.lit(1.0))
    )

    return (
        staged.withColumn("dup_line_frac", pround(dup_line_frac, 6))
        .withColumn("dup_line_char_frac", pround(dup_line_char_frac, 6))
        .withColumn("top_ngram_char_frac", pround(top_frac, 6))
        .withColumn("dup_ngram_char_frac", pround(dup_ngram_frac, 6))
        .drop("__rep_toks", "__rep_sl", "__rep_tg", "__rep_dg")
    )


GOPHER_DEFAULTS = {
    "min_tokens": 50,
    "max_tokens": 100_000,
    "min_mean_token_len": 3.0,
    "max_mean_token_len": 10.0,
    "max_symbol_ratio": 0.1,
    "min_stopword_hits": 2,
    "max_dup_line_frac": 0.30,
    "max_dup_line_char_frac": 0.20,
    "max_top_ngram_char_frac": 0.20,
    "max_dup_ngram_char_frac": 0.15,
}


def gopher_filter(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    stopwords: tuple[str, ...] | None = None,
    **thresholds,
) -> DataFrame:
    """The Gopher quality screen as one composable operator (Rae et al. 2021
    §A1.1, the rule set most open-data pipelines start from): length bounds,
    mean-token-length window, symbol ratio, minimum stopword hits, and the
    four `repetition_stats` caps. Adds the repetition columns plus
    `gopher_drop_reasons` (array of rule names that fired, deterministic
    order) and `gopher_keep` — keep the audit trail, filter with
    `.where("gopher_keep")`.

    Every signal is an exact integer quotient (count/count, sum/count), so
    threshold comparisons are bit-identical across engines — the DuckDB
    oracle replays the full rule set (`q_gopher_filter`). Thresholds are
    overridable per call (`gopher_filter(df, min_tokens=100)`); unknown
    names raise. Scale shape: `repetition_stats`' narrow projection plus a
    handful of token aggregates — still zero shuffles, zero Python workers."""
    bad = set(thresholds) - set(GOPHER_DEFAULTS)
    if bad:
        raise ValueError(f"unknown thresholds {sorted(bad)}; valid: {sorted(GOPHER_DEFAULTS)}")
    th = {**GOPHER_DEFAULTS, **thresholds}
    sw = [s.lower() for s in (stopwords or STOPWORD_PROFILES["en"])]

    # stage tokens once (multi-use alias survives CollapseProject) — three
    # signals read them, and an inlined tokens() would re-split per signal
    rep = repetition_stats(df, text_col, id_col).withColumn(
        "__gq_toks", tokens(F.col(text_col))
    )
    t = F.col(text_col)
    toks = F.col("__gq_toks")
    n_tok = F.size(toks)
    # summed token lengths of a ws-split == non-ws char count: one regex scan,
    # no per-element fold
    mean_len = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        nonws_char_count(t) / n_tok.cast("double")
    )
    pr = punct_ratio(t)
    sw_lit = F.array(*[F.lit(s) for s in sw])
    hits = F.size(F.filter(toks, lambda x: F.array_contains(sw_lit, F.lower(x))))

    checks = [
        ("too_short", n_tok < th["min_tokens"]),
        ("too_long", n_tok > th["max_tokens"]),
        ("mean_token_len", (mean_len < th["min_mean_token_len"])
                           | (mean_len > th["max_mean_token_len"])),
        ("symbol_ratio", pr > th["max_symbol_ratio"]),
        ("too_few_stopwords", hits < th["min_stopword_hits"]),
        ("dup_line_frac", F.col("dup_line_frac") > th["max_dup_line_frac"]),
        ("dup_line_char_frac", F.col("dup_line_char_frac") > th["max_dup_line_char_frac"]),
        ("top_ngram_char_frac", F.col("top_ngram_char_frac") > th["max_top_ngram_char_frac"]),
        ("dup_ngram_char_frac", F.col("dup_ngram_char_frac") > th["max_dup_ngram_char_frac"]),
    ]
    reasons = F.array_compact(
        F.array(*[F.when(cond, F.lit(name)) for name, cond in checks])
    )
    return (
        rep.withColumn("gopher_drop_reasons", reasons)
        .withColumn("gopher_keep", F.size(F.col("gopher_drop_reasons")) == 0)
        .drop("__gq_toks")
    )


def unigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref: DataFrame | None = None,
    alpha: float = 1.0,
    out_col: str = "lm_logprob",
) -> DataFrame:
    """CCNet-style language-model quality score without the language model:
    per-doc mean log-probability of its (lowercased, whitespace) tokens under
    an add-alpha-smoothed unigram LM trained on `ref` (default: the corpus
    itself). CCNet ranks web text by wiki-KenLM perplexity and keeps the
    low-perplexity head; this is the deterministic, engine-portable unigram
    analog — gibberish, keyword-stuffing, and rare-token soup score far below
    prose, and `exp(-lm_logprob)` is the usual perplexity reading.

    logp(w) = ln((count(w) + alpha) / (N + alpha·(V + 1))) — unseen tokens
    (scoring against an external `ref`) get the +alpha mass. Adds `out_col`
    (0.0 for token-less docs; join is id-preserving).

    Scale shape: vocab = one token-keyed count aggregation (map-side partial
    combine absorbs the Zipf head), totals ride along as a broadcast 1-row
    cross join (no driver collect), scoring = explode → vocab join → per-doc
    mean. The token join is Zipf-skewed by nature — AQE skew-join splitting
    (on by default) is the intended mitigation at 100 TB; pass a trimmed
    external `ref` (e.g. top-1M tokens of a reference corpus) to make the
    vocab broadcast-able, which is how CCNet deploys it."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0 (zero breaks unseen-token mass)")
    ref = df if ref is None else ref
    ref_toks = ref.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"))
    vocab = ref_toks.groupBy("__tok").agg(F.count("*").alias("__c"))
    tot = vocab.agg(
        F.sum("__c").alias("__n"), F.count("*").alias("__v")
    )
    doc_toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok")
    )
    logp = F.log(
        (F.coalesce(F.col("__c"), F.lit(0)).cast("double") + F.lit(float(alpha)))
        / (F.col("__n").cast("double") + F.lit(float(alpha)) * (F.col("__v").cast("double") + 1.0))
    )
    per_doc = (
        doc_toks.join(vocab, "__tok", "left")
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.avg(logp).alias(out_col))
    )
    return df.join(per_doc, id_col, "left").withColumn(
        out_col, pround(F.coalesce(F.col(out_col), F.lit(0.0)), 6)
    )


def oov_rate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_v: int = 1000,
    ref: DataFrame | None = None,
    out_col: str = "oov_rate",
) -> DataFrame:
    """Per-document out-of-vocabulary rate: the fraction of a doc's
    (lowercased, whitespace) tokens that fall OUTSIDE the top-`top_v`
    token vocabulary of `ref` (default: the corpus itself) — the robust
    counting cousin of `unigram_logprob_score` (gibberish, boilerplate
    keyboard-mash, and wrong-language docs are mostly tail tokens; a mean
    log-prob can be dragged by a few extreme tokens, a rate cannot).
    Token-less docs report 0.0 (nothing out of vocabulary).

    Deterministic vocab: top-`top_v` by (count desc, token asc) — the same
    total order every engine replays. Returns df + out_col (id-preserving).

    Scale shape: the vocab is one token-count aggregation finished by a
    bounded top-k (`orderBy().limit()` → TakeOrderedAndProject, never a
    global sort kept around); membership is a BROADCAST left-semi-style
    join of the exploded doc tokens against ≤ top_v rows; the per-doc rate
    is one groupBy(id) mean. The Zipf tail never shuffles anywhere."""
    if top_v < 1:
        raise ValueError(f"top_v must be >= 1, got {top_v}")
    ref = df if ref is None else ref
    vocab = (
        ref.select(F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok"))
        .groupBy("__tok")
        .agg(F.count("*").alias("__c"))
        .orderBy(F.col("__c").desc(), F.col("__tok").asc())
        .limit(top_v)
        .select("__tok", F.lit(True).alias("__in_v"))
    )
    doc_toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("__tok")
    )
    per_doc = (
        doc_toks.join(F.broadcast(vocab), "__tok", "left")
        .groupBy(id_col)
        .agg(F.avg(F.when(F.col("__in_v").isNull(), 1.0).otherwise(0.0)).alias(out_col))
    )
    return df.join(per_doc, id_col, "left").withColumn(
        out_col, pround(F.coalesce(F.col(out_col), F.lit(0.0)), 6)
    )


def perplexity_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str | None = None,
    probs: tuple[float, ...] = (1.0 / 3, 2.0 / 3),
    labels: tuple[str, ...] = ("tail", "middle", "head"),
    ref: DataFrame | None = None,
    alpha: float = 1.0,
    k: int = 4096,
    salt: str = "ppl",
    score_col: str = "lm_logprob",
    out_col: str = "ppl_bucket",
    n_rows: int | None = None,
) -> DataFrame:
    """CCNet-style perplexity bucketing (Wenzek et al. 2020,
    arXiv:1911.00359): split the corpus into head/middle/tail by
    language-model quality — the canonical pre-training data triage (CCNet
    keeps the low-perplexity "head" per language; the buckets are also the
    standard sampling strata for mixing web data). Score = per-doc mean
    unigram log-probability (`unigram_logprob_score`, exp(-score) is
    perplexity — so the HIGHEST scores are the lowest-perplexity head), and
    bucket cutoffs are per-`group_col` (CCNet: per language) quantiles of
    that score.

    Deterministic end to end, same contract as `sampled_percentiles`:
    cutoffs come from the keyed hash sample (hash32(salt:id) < (k/n)·2³²),
    ranked (score, id) inside each group — same data ⇒ same cutoffs on any
    engine/partitioning/rerun, so DuckDB replays the whole operator. Each
    group's cutoff_j is the sample value at rank max(1, ceil(prob_j·m_g));
    a doc's bucket index is the number of cutoffs its score strictly
    exceeds — labels[0] (default "tail") for score ≤ first cutoff,
    labels[-1] ("head") above the last. Comparisons use the 6-dp-rounded
    score the scorer emits, so cross-engine ulp noise in ln/avg cannot flip
    a boundary doc. Groups too small to land any sample rows get NULL
    buckets (no estimate — honest, and impossible for real language-sized
    groups).

    Returns df + score_col + out_col (id-preserving join).

    Scale shape: scoring is `unigram_logprob_score`'s (vocab agg + explode
    join + per-doc mean); the sample is ONE narrow hash filter; the ranking
    window runs over the ≤~k sample only (per-group partitions); cutoffs
    (groups × probs rows) broadcast back onto the scored frame. No
    full-corpus sort anywhere — the difference between this and a naive
    per-language ntile() window, which would shuffle-sort the entire corpus.
    """
    if len(labels) != len(probs) + 1:
        raise ValueError(
            f"need len(probs)+1 labels, got {len(labels)} labels for {len(probs)} cutpoints"
        )
    ps = list(probs)
    if ps != sorted(ps) or len(set(ps)) != len(ps) or any(not (0.0 < p < 1.0) for p in ps):
        raise ValueError(f"probs must be strictly increasing in (0, 1): {probs}")
    if k < 8:
        raise ValueError(f"k must be >= 8, got {k}")

    scored = unigram_logprob_score(df, text_col, id_col, ref=ref, alpha=alpha,
                                   out_col=score_col)
    gb = [group_col] if group_col else []
    n = n_rows if n_rows is not None else df.count()
    thresh = min(1.0, float(k) / max(n, 1)) * 4294967296.0
    h = hash32(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string")))
    sample = scored.where(h.cast("double") < F.lit(thresh)).select(
        *gb, F.col(score_col).alias("__v"), F.col(id_col).alias("__id")
    )
    w = Window.partitionBy(*gb).orderBy(F.col("__v").asc(), F.col("__id").asc())
    ranked = sample.withColumn("__rn", F.row_number().over(w))
    m = sample.groupBy(*gb).agg(F.count("*").alias("__m")) if gb else (
        sample.agg(F.count("*").alias("__m"))
    )
    qdf = df.sparkSession.createDataFrame([(float(p),) for p in ps], "prob double")
    joined = ranked.join(F.broadcast(m), gb) if gb else ranked.crossJoin(F.broadcast(m))
    cutoffs = joined.join(
        F.broadcast(qdf),
        F.col("__rn") == F.greatest(F.lit(1), F.ceil(F.col("prob") * F.col("__m"))),
    )
    cuts = cutoffs.groupBy(*gb).agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct(F.col("prob"), F.col("__v")))),
            lambda s: s["__v"],
        ).alias("__cuts")
    )
    if not gb:
        # constant-key LEFT join (not a crossJoin: an empty-sample cuts frame
        # must yield NULL buckets, never an empty result)
        scored = scored.withColumn("__g1", F.lit(1))
        cuts = cuts.withColumn("__g1", F.lit(1))
        gb = ["__g1"]
        with_cuts = scored.join(F.broadcast(cuts), gb, "left").drop("__g1")
    else:
        with_cuts = scored.join(F.broadcast(cuts), gb, "left")
    idx = F.size(F.filter(F.col("__cuts"), lambda c: F.col(score_col) > c))
    label_arr = F.array(*[F.lit(l) for l in labels])
    # a full cutoff set is required (the ungrouped global agg emits one row
    # with an EMPTY array when the sample is empty — that must be NULL
    # buckets, not everything-in-labels[0])
    return with_cuts.withColumn(
        out_col,
        F.when(F.size(F.col("__cuts")) == len(ps), F.element_at(label_arr, idx + 1)),
    ).drop("__cuts")


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
    lines = df.select(
        F.col(id_col), *gcols,
        F.posexplode(F.split(F.col(text_col), re.escape(line_sep))).alias("__pos", "__line"),
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


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 1000,
    lowercase: bool = True,
    ngram: int = 1,
) -> DataFrame:
    """Tokenizer-design vocabulary report: the `top_k` most frequent
    whitespace tokens (or space-joined word `ngram`s) with rank, count,
    corpus frequency, and CUMULATIVE token coverage — read off "what vocab
    size covers 95% of the corpus" directly. Ties break lexicographically
    (deterministic across engines). Returns `(rank, token, n, freq,
    coverage)` with rank 1 = most frequent. `ngram` > 1 counts sliding
    windows (a doc with fewer than `ngram` tokens contributes nothing) —
    the merge-candidate / common-phrase statistic of tokenizer design.

    Scale shape: token counts partial-aggregate map-side (the shuffle carries
    one row per distinct token per partition, never per occurrence); the
    global sort + running sum happen AFTER `limit(top_k)`, so the
    single-partition window only ever sees `top_k` rows regardless of corpus
    size; the corpus-total token count rides in as a broadcast scalar
    (cross-join of a 1-row aggregate). No driver-side collect.
    """
    if top_k < 1:
        raise ValueError("top_k must be >= 1")
    if ngram < 1:
        raise ValueError("ngram must be >= 1")
    t = F.col(text_col)
    toks = tokens(F.lower(t) if lowercase else t)
    if ngram == 1:
        units = toks
    else:
        staged = F.col("__vc_toks")
        units = F.when(
            F.size(staged) >= ngram,
            F.transform(
                F.sequence(F.lit(1), F.size(staged) - (ngram - 1)),
                lambda i: F.concat_ws(" ", F.slice(staged, i, ngram)),
            ),
        ).otherwise(F.array().cast("array<string>"))
    if ngram == 1:
        exploded = df.select(F.explode(units).alias("token"))
    else:
        exploded = df.withColumn("__vc_toks", toks).select(
            F.explode(units).alias("token")
        )
    counts = exploded.groupBy("token").agg(F.count("*").alias("n"))
    total = counts.agg(F.sum("n").alias("__total"))
    top = counts.orderBy(F.col("n").desc(), F.col("token").asc()).limit(top_k)
    w = Window.orderBy(F.col("n").desc(), F.col("token").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .withColumn("rank", F.row_number().over(w))
        .withColumn("freq", pround(F.col("n") / F.col("__total"), 8))
        .withColumn(
            "coverage",
            pround(F.sum("n").over(w.rowsBetween(Window.unboundedPreceding, 0)) / F.col("__total"), 8),
        )
        .select("rank", "token", F.col("n").cast("bigint").alias("n"), "freq", "coverage")
    )


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    window: int = 256,
    overlap: int = 32,
) -> DataFrame:
    """Split long documents into whitespace-token windows of `window` tokens
    with `overlap` tokens of context carried between consecutive chunks — the
    long-document stage ahead of embedding generation or context-window
    training (the reference's ORT runtime chunks oversized inputs the same
    way before pooling, lantern_cli/src/embeddings/core/ort_runtime.rs:
    chunk-and-mean; this is that stage as a standalone, engine-level op).

    Emits one row per chunk: (id_col, chunk_idx 1-based, n_chunk_tokens,
    chunk_text). The final chunk may be shorter; a start whose window would
    add no new tokens (everything already covered by the previous chunk) is
    skipped, so no chunk is pure overlap. Zero-token docs emit nothing.

    Pure Column plan: stage tokens once, build the filtered start array,
    posexplode, slice — a narrow projection with no shuffle at any scale.
    """
    if window < 1:
        raise ValueError("window must be >= 1")
    if not 0 <= overlap < window:
        raise ValueError("overlap must satisfy 0 <= overlap < window")
    stride = window - overlap
    staged = df.select(
        F.col(id_col), tokens(F.col(text_col)).alias("__toks")
    ).withColumn("__n", F.size("__toks"))
    n = F.col("__n")
    starts = F.filter(
        F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(stride)),
        lambda s: (s <= n) & ((s == 1) | (s - stride + window - 1 < n)),
    )
    return (
        staged.select(
            F.col(id_col), "__toks", "__n",
            F.posexplode(starts).alias("__pos", "__start"),
        )
        .select(
            F.col(id_col),
            (F.col("__pos") + 1).alias("chunk_idx"),
            F.least(F.lit(window), n - F.col("__start") + 1).alias("n_chunk_tokens"),
            F.concat_ws(" ", F.slice("__toks", F.col("__start"), window)).alias("chunk_text"),
        )
    )


def corpus_report(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_cols: tuple[str, ...] = ("source",),
) -> DataFrame:
    """One-call corpus health summary per group — the first thing a data
    engineer runs on a new snapshot: volume (docs/tokens), token-length
    distribution (exact interpolated p50/p90), exact-dup rate (md5), blank
    fraction, and mean composite quality. One narrow scan + one aggregation
    shuffle of group-count rows; the md5 distinct-count shuffles 32-char
    digests, never text — the whole report is a single job at any corpus
    size.
    """
    qm = quality_metrics(df, text_col)
    return qm.groupBy(*group_cols).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        pround(F.percentile(F.col("n_tokens"), F.lit(0.5)), 4).alias("p50_tokens"),
        pround(F.percentile(F.col("n_tokens"), F.lit(0.9)), 4).alias("p90_tokens"),
        pround(
            1 - F.countDistinct(F.md5(F.col(text_col))) / F.count("*").cast("double"), 6
        ).alias("dup_rate"),
        pround(
            F.avg(F.when(F.trim(F.col(text_col)) == "", 1.0).otherwise(0.0)), 6
        ).alias("blank_frac"),
        pround(F.avg("quality_score"), 6).alias("avg_quality"),
    )


def bigram_logprob_score(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ref: DataFrame | None = None,
    alpha: float = 1.0,
    lam: float = 0.7,
    out_col: str = "lm2_logprob",
) -> DataFrame:
    """Interpolated-bigram LM quality score — the step up from
    `unigram_logprob_score` toward CCNet's KenLM ranking: per-doc mean of
    ln(λ·P_bi(wᵢ|wᵢ₋₁) + (1−λ)·P_uni(wᵢ)) over positions 2..n, where
    P_bi = c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) (MLE, 0 when the previous token is unseen) and
    P_uni is the add-alpha unigram of the same `ref` (default: the corpus
    itself). Word-salad with plausible unigrams but impossible transitions —
    the classic spam/seo signature a unigram score misses — drops hard.
    Docs with < 2 tokens get 0.0; `exp(-score)` reads as perplexity.

    Scale shape: two count aggregations (unigram + bigram, both map-side
    combining over the Zipf head), totals as a broadcast 1-row cross join,
    scoring = one explode + three token-keyed joins + per-doc mean. Same
    AQE-skew-join posture as the unigram operator; pass a trimmed external
    `ref` to make both vocab sides broadcast-able in deployment.
    """
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    if not 0.0 <= lam <= 1.0:
        raise ValueError("lam must be in [0, 1]")
    ref = df if ref is None else ref

    def doc_tokens(frame):
        return frame.select(
            *( [F.col(id_col)] if id_col in frame.columns else [] ),
            tokens(F.lower(F.col(text_col))).alias("__toks"),
        )

    def bigram_structs(toks):
        n = F.size(toks)
        return F.when(
            n >= 2,
            F.transform(
                F.sequence(F.lit(1), n - 1),
                lambda i: F.struct(
                    F.element_at(toks, i).alias("prev"),
                    F.element_at(toks, i + 1).alias("cur"),
                    F.concat_ws(" ", F.element_at(toks, i), F.element_at(toks, i + 1)).alias("bi"),
                ),
            ),
        ).otherwise(F.array().cast("array<struct<prev:string,cur:string,bi:string>>"))

    ref_toks = doc_tokens(ref)
    uni = (
        ref_toks.select(F.explode("__toks").alias("__tok"))
        .groupBy("__tok").agg(F.count("*").alias("__c"))
    )
    bi = (
        ref_toks.select(F.explode(bigram_structs(F.col("__toks"))).alias("__b"))
        .select(F.col("__b.bi").alias("__bi"))
        .groupBy("__bi").agg(F.count("*").alias("__cb"))
    )
    tot = uni.agg(F.sum("__c").alias("__n"), F.count("*").alias("__v"))

    d = doc_tokens(df).select(
        F.col(id_col), F.explode(bigram_structs(F.col("__toks"))).alias("__b")
    ).select(
        F.col(id_col),
        F.col("__b.prev").alias("__prev"),
        F.col("__b.cur").alias("__cur"),
        F.col("__b.bi").alias("__bi"),
    )
    joined = (
        d.join(bi, "__bi", "left")
        .join(uni.select(F.col("__tok").alias("__prev"), F.col("__c").alias("__cp")), "__prev", "left")
        .join(uni.select(F.col("__tok").alias("__cur"), F.col("__c").alias("__cc")), "__cur", "left")
        .crossJoin(F.broadcast(tot))
    )
    p_bi = F.when(
        F.coalesce(F.col("__cp"), F.lit(0)) > 0,
        F.coalesce(F.col("__cb"), F.lit(0)).cast("double") / F.col("__cp").cast("double"),
    ).otherwise(F.lit(0.0))
    p_uni = (
        F.coalesce(F.col("__cc"), F.lit(0)).cast("double") + F.lit(float(alpha))
    ) / (F.col("__n").cast("double") + F.lit(float(alpha)) * (F.col("__v").cast("double") + 1.0))
    logp = F.log(F.lit(float(lam)) * p_bi + F.lit(1.0 - float(lam)) * p_uni)
    per_doc = joined.groupBy(id_col).agg(F.avg(logp).alias(out_col))
    return df.join(per_doc, id_col, "left").withColumn(
        out_col, pround(F.coalesce(F.col(out_col), F.lit(0.0)), 6)
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    top_k: int = 100,
    round_dp: int | None = 6,
) -> DataFrame:
    """Zipf power-law fit over the token rank-frequency curve: least-squares
    slope and intercept of ln(count) vs ln(rank) for the `top_k` most
    frequent tokens. Healthy natural-language corpora sit near slope −1;
    a flat slope flags synthetic/templated text, a cliff flags boilerplate
    domination — a one-row corpus-health gauge for a training-data pipeline.

    Determinism: counts are exact integers; ranks tie-break lexicographically;
    ALL floating-point sums run as sequential folds over the rank-ordered
    array (array_sort + F.aggregate here, list(... ORDER BY) + list_sum in
    the oracle), so both engines add in the same order and the fitted
    coefficients agree bit-for-bit before rounding.

    Scale shape: one map-side-combined token-count shuffle, top-k via
    orderBy().limit() → TakeOrderedAndProject, then every remaining op runs
    over ≤ top_k rows collapsed to a single array row. Returns
    (n_terms, slope, intercept).
    """
    if top_k < 2:
        raise ValueError("top_k must be >= 2 (a line needs two points)")
    toks = df.select(F.explode(tokens(F.col(text_col))).alias("t"))
    counts = toks.groupBy("t").agg(F.count("*").alias("c"))
    top = counts.orderBy(F.col("c").desc(), F.col("t").asc()).limit(top_k)
    w = Window.orderBy(F.col("c").desc(), F.col("t").asc())
    ranked = top.withColumn("r", F.row_number().over(w))
    arr = ranked.agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("r"),
                    F.log(F.col("r").cast("double")).alias("x"),
                    F.log(F.col("c").cast("double")).alias("y"),
                )
            )
        ).alias("a"),
        F.count("*").cast("bigint").alias("n_terms"),
    )

    def _fold(expr):
        return F.aggregate(F.col("a"), F.lit(0.0), lambda acc, e: acc + expr(e))

    staged = arr.select(
        "n_terms",
        _fold(lambda e: e["x"]).alias("sx"),
        _fold(lambda e: e["y"]).alias("sy"),
        _fold(lambda e: e["x"] * e["y"]).alias("sxy"),
        _fold(lambda e: e["x"] * e["x"]).alias("sxx"),
    )
    n = F.col("n_terms").cast("double")
    slope = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        n * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    intercept = (F.col("sy") - slope * F.col("sx")) / n
    if round_dp is not None:
        slope = pround(slope, round_dp)
        intercept = pround(intercept, round_dp)
    return staged.select(
        "n_terms", slope.alias("slope"), intercept.alias("intercept")
    )


def ngram_novelty(
    df: DataFrame,
    reference: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    round_dp: int | None = 6,
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: the share of
    the document's DISTINCT word n-grams that the reference has never seen.
    The crawl-valuation gauge of a training pipeline — "how much genuinely
    new text does this batch add on top of what we already hold?" — and the
    corpus-level dual of `decontaminate` (which asks the same question about
    a benchmark, doc by doc, with a threshold).

    Reference parity: generalizes the reference's shingle-overlap machinery
    (lantern_cli daemon dedup posture) from pairwise overlap to
    batch-vs-corpus coverage.

    Scale shape: distinct reference shingles once (groupBy on the shingle —
    map-side combine collapses repeats before the shuffle), then ONE string
    equi-join between exploded target shingles and the reference set, then a
    per-doc aggregation. Both joins/aggs shuffle on their natural keys; no
    driver state, no broadcast requirement (Spark broadcasts the reference
    side automatically when it is small). Docs with zero tokens produce zero
    shingles and are absent from the output (nothing to measure).

    Output: (id_col, n_ngrams, n_matched, novelty) with
    novelty = 1 - matched/total over the doc's distinct shingles.
    """
    from lantern_extras_spark.functions.text import tokens, word_ngrams_of

    sh = lambda frame: frame.select(
        F.col(id_col),
        F.explode(
            F.array_distinct(word_ngrams_of(tokens(F.col(text_col)), n))
        ).alias("__g"),
    )
    ref = sh(reference).select("__g").distinct()
    tgt = sh(df)
    novelty = 1.0 - F.col("n_matched") / F.col("n_ngrams").cast("double")
    if round_dp is not None:
        novelty = pround(novelty, round_dp)
    return (
        tgt.join(ref.withColumn("__hit", F.lit(1)), "__g", "left")
        .groupBy(id_col)
        .agg(
            F.count("*").alias("n_ngrams"),
            F.count("__hit").alias("n_matched"),
        )
        .withColumn("novelty", novelty)
    )


def domain_keywords(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    k: int = 5,
    round_dp: int | None = 6,
) -> DataFrame:
    """Class-based TF-IDF (c-TF-IDF) keywords: collapse every group (source
    domain, language, near-dup cluster id, topic cell) into one virtual
    document and rank its most characteristic terms —
    score = (tf_g / tokens_g) * ln(n_groups / groups_containing_term).
    The corpus-characterization step of a training pipeline: what a domain
    actually contains before deciding its mixture weight, and the standard
    cluster-labeling trick (BERTopic-style) for topic cells.

    Differs from `tfidf_top_terms` (per-document) in the aggregation unit:
    tf is the GROUP's term count normalized by the group's token total, and
    rarity is measured across groups, not documents.

    Scale shape: one (group, term) aggregation shuffle, one term-level
    shuffle for cross-group frequency, one broadcast scalar (n_groups), then
    a per-group window over terms. All counts exact; `round_dp` rounds the
    score with the portable floor-form BEFORE ranking so cross-engine ln()
    ulps can't flip ranks (ties break on term asc).

    Output: (group_col, term, tf, grp_tokens, df_g, score, rank<=k).
    """
    toks = df.select(F.col(group_col), F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy(group_col, "term").agg(F.count("*").alias("tf"))
    grp_tot = tf.groupBy(group_col).agg(F.sum("tf").alias("grp_tokens"))
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df_g"))
    ngr = tf.agg(F.countDistinct(group_col).alias("__ng"))
    score = (F.col("tf") / F.col("grp_tokens")) * F.log(
        F.col("__ng") / F.col("df_g")
    )
    if round_dp is not None:
        score = pround(score, round_dp)
    w = Window.partitionBy(group_col).orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        tf.join(grp_tot, group_col)
        .join(dfreq, "term")
        .crossJoin(F.broadcast(ngr))
        .withColumn("score", score)
        .withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select(group_col, "term", "tf", "grp_tokens", "df_g", "score", "rank")
    )


def tokenizer_fertility(
    df: DataFrame,
    group_col: str = "lang",
    text_col: str = "text",
    round_dp: int | None = 6,
) -> DataFrame:
    """Per-group tokenizer efficiency: fertility (BPE-ish pre-tokens per
    whitespace word) and compression (non-whitespace chars per pre-token).
    The budgeting gauge for multilingual mixtures — a language whose
    fertility is 2x pays 2x the sequence length for the same words, so token
    budgets and mixture shares must be set in tokens, not documents
    (reference posture: exact-token accounting, text_embedding batching).

    One narrow projection (three regex counters per row, no token arrays
    materialized) + one aggregation shuffle to group-count-sized rows.

    Output: (group_col, n_docs, total_words, total_bpe_tokens, total_chars,
    fertility, chars_per_token); zero-word/zero-token groups report 0.0
    rather than dividing by zero.
    """
    t = F.col(text_col)
    agg = df.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum(token_count(t)).cast("bigint").alias("total_words"),
        F.sum(bpe_ish_token_count(t)).cast("bigint").alias("total_bpe_tokens"),
        F.sum(nonws_char_count(t)).cast("bigint").alias("total_chars"),
    )
    fert = F.when(F.col("total_words") == 0, F.lit(0.0)).otherwise(
        F.col("total_bpe_tokens") / F.col("total_words").cast("double")
    )
    cpt = F.when(F.col("total_bpe_tokens") == 0, F.lit(0.0)).otherwise(
        F.col("total_chars") / F.col("total_bpe_tokens").cast("double")
    )
    if round_dp is not None:
        fert, cpt = pround(fert, round_dp), pround(cpt, round_dp)
    return agg.select(
        group_col,
        "n_docs",
        "total_words",
        "total_bpe_tokens",
        "total_chars",
        fert.alias("fertility"),
        cpt.alias("chars_per_token"),
    )


def label_by_keywords(
    df: DataFrame,
    labels: dict[str, tuple[str, ...]],
    text_col: str = "text",
    id_col: str = "doc_id",
    default_label: str = "other",
    round_dp: int = 6,
) -> DataFrame:
    """Keyword-seeded topic labeling (dataless classification — the weak-
    supervision primitive for tagging a crawl by domain before mixture
    decisions): per document, score every label by the idf-weighted count of
    its seed keywords, take the argmax. idf = ln(N / (1 + df_kw)) over THIS
    corpus, so discriminative seeds dominate stopword-ish ones without any
    hand weighting. Tokens are lowercased for matching; keywords should be
    single lowercase tokens.

    Appends (label, label_score): argmax score, ties broken by the
    lexicographically smallest label; documents hitting no keyword get
    (`default_label`, 0.0).

    Scale shape: the keyword table is dict-sized and broadcast; scoring is
    one token explode -> broadcast equi-join -> (doc,label) partial-sum ->
    doc-keyed struct-MIN argmax (map-side combining aggregations keyed on
    unique doc ids — no windows, no skew). The df_kw pass is one bounded
    aggregation over the same broadcast join.
    """
    if not labels or any(not kws for kws in labels.values()):
        raise ValueError("labels must be a non-empty {label: (keyword, ...)} dict")
    spark = df.sparkSession
    kw_rows = [
        (lab, kw.lower()) for lab, kws in sorted(labels.items()) for kw in kws
    ]

    # r14 literal fast path (guide §1.2 distributed algorithm / §2.4 remove
    # shuffles): seed-keyword dictionaries are DRIVER-SIZED by nature, so for
    # small dictionaries (<= _KWLBL_LIT_MAX_KW keywords) the whole pipeline
    # collapses to TWO shuffle-free passes over the text:
    #   1. ONE single-row aggregation computing n_docs AND every keyword's
    #      document frequency (exists() over the token array) — collected,
    #      so idf becomes a per-keyword double literal;
    #   2. ONE projection computing per-label scores as
    #      sum_kw count_kw(doc) * max(idf_kw, 0) with the argmax as a
    #      least()-of-structs — no explode, no joins, no (doc,label) or
    #      doc-keyed aggregations, no window.
    # The explode -> broadcast-join -> two-aggregation shape (below) remains
    # for larger dictionaries, where a #keywords-wide expression would bloat
    # codegen. Outputs are identical: same df_kw (exists == countDistinct over
    # hits), same idf literals, same per-(doc,label) rounded score (verified
    # exactly against the join path by test + oracle hash), same
    # smallest-label tie-break, same default for hitless docs.
    # Hatch: SPARK_GRAFT_KWLBL_LIT=0.
    import os as _os

    lit_max = int(_os.environ.get("SPARK_GRAFT_KWLBL_LIT_MAX_KW", "64"))
    if (
        len(kw_rows) <= lit_max
        and _os.environ.get("SPARK_GRAFT_KWLBL_LIT", "1") != "0"
    ):
        return _label_by_keywords_literal(
            df, labels, text_col, id_col, default_label, round_dp
        )

    kws = spark.createDataFrame(kw_rows, "label string, kw string")
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("kw")
    )
    hits = toks.join(F.broadcast(kws), "kw")
    n_docs = df.count()
    docfreq = (
        hits.groupBy("kw")
        .agg(F.countDistinct(id_col).alias("__df"))
        .withColumn(
            "__idf", F.log(F.lit(float(n_docs)) / (F.col("__df").cast("double") + 1.0))
        )
    )
    scored = (
        hits.join(F.broadcast(docfreq), "kw")
        .groupBy(id_col, "label")
        .agg(pround(F.sum(F.greatest(F.col("__idf"), F.lit(0.0))), round_dp).alias("__s"))
    )
    best = (
        scored.groupBy(id_col)
        .agg(F.min(F.struct((-F.col("__s")).alias("ns"), F.col("label").alias("l"))).alias("__b"))
        .select(
            F.col(id_col),
            F.col("__b.l").alias("label"),
            pround(-F.col("__b.ns"), round_dp).alias("label_score"),
        )
    )
    return (
        df.join(best, id_col, "left")
        .withColumn("label", F.coalesce(F.col("label"), F.lit(default_label)))
        .withColumn("label_score", F.coalesce(F.col("label_score"), F.lit(0.0)))
    )


def _label_by_keywords_literal(
    df: DataFrame,
    labels: dict[str, tuple[str, ...]],
    text_col: str,
    id_col: str,
    default_label: str,
    round_dp: int,
) -> DataFrame:
    """Literal-dictionary body of `label_by_keywords` (see the fast-path
    comment there). Two passes, zero shuffles:

    1. one single-row aggregation collects n_docs and per-keyword document
       frequency (`exists` over the token array == countDistinct over hits);
    2. one projection scores every label as
       Σ_kw count_kw(doc) · greatest(idf_kw, 0) and argmaxes via a
       least()-of-structs with the (miss, -score, label) ordering — hitless
       docs (miss on every label) fall to the default, matching the join
       path's left-join/coalesce semantics.

    idf is evaluated ENGINE-side from the exact integer counts
    (log(lit(n)/lit(df+1)) constant-folds through the same JVM Math.log the
    join path executes), so the only float difference vs the join path is
    count·idf multiplication in place of idf repeated addition — absorbed by
    the shared pround; exact equality of the rounded outputs is pinned by
    test_textstats and the oracle hash."""
    toks_col = "__kwl_toks"
    toks_expr = tokens(F.lower(F.col(text_col))).alias(toks_col)
    uniq_kws = sorted({kw.lower() for kws in labels.values() for kw in kws})

    # native collection functions, NOT higher-order lambdas: filter()/exists()
    # lambdas are interpreted per element (8 kw x tokens-per-doc lambda calls
    # per row measured ~3x slower); array_contains and the array_remove
    # size-difference count run inside whole-stage codegen
    stats_row = (
        df.select(toks_expr)
        .agg(
            F.count(F.lit(1)).alias("__n"),
            *[
                F.sum(
                    F.when(
                        F.array_contains(F.col(toks_col), kw), F.lit(1)
                    ).otherwise(F.lit(0))
                ).alias(f"__df_{i}")
                for i, kw in enumerate(uniq_kws)
            ],
        )
        .collect()[0]
    )
    n_docs = int(stats_row["__n"])
    dfreq = {
        kw: int(stats_row[f"__df_{i}"] or 0) for i, kw in enumerate(uniq_kws)
    }
    idf_col = {
        kw: F.greatest(
            F.log(F.lit(float(n_docs)) / F.lit(float(dfreq[kw]) + 1.0)),
            F.lit(0.0),
        )
        for kw in uniq_kws
    }
    cnt_col = {
        kw: F.coalesce(
            F.size(F.col(toks_col))
            - F.size(F.array_remove(F.col(toks_col), kw)),
            F.lit(0),
        )
        for kw in uniq_kws
    }

    structs = []
    for lab in sorted(labels):
        kws_l = [kw.lower() for kw in labels[lab]]
        s = None
        tot = None
        for kw in kws_l:  # tuple order, duplicates included — join-path parity
            term = cnt_col[kw].cast("double") * idf_col[kw]
            s = term if s is None else s + term
            tot = cnt_col[kw] if tot is None else tot + cnt_col[kw]
        s = pround(s, round_dp)
        structs.append(
            F.struct(
                F.when(tot > 0, F.lit(0)).otherwise(F.lit(1)).alias("miss"),
                (-s).alias("ns"),
                F.lit(lab).alias("l"),
            )
        )
    best = structs[0] if len(structs) == 1 else F.least(*structs)
    out_label = (
        F.when(best["miss"] == 1, F.lit(default_label)).otherwise(best["l"])
    )
    out_score = (
        F.when(best["miss"] == 1, F.lit(0.0))
        .otherwise(pround(-best["ns"], round_dp))
    )
    base = df.select(*df.columns, toks_expr)
    return base.select(
        F.col(id_col),
        *[F.col(c) for c in df.columns if c != id_col],
        out_label.alias("label"),
        out_score.alias("label_score"),
    )


def distinct_ngram_ratio(
    df: DataFrame,
    ns: tuple[int, ...] = (1, 2, 3),
    text_col: str = "text",
    group_col: str | None = None,
    round_dp: int = 6,
) -> DataFrame:
    """Corpus diversity: distinct-n (Li et al. 2016) — the share of n-gram
    occurrences that are unique, per n (and per group). Templated / highly
    duplicated corpora crater distinct-2/3 long before dedup pair counts
    surface it; generation-quality literature uses the same gauge. Returns
    (group?, n, total_ngrams, distinct_ngrams, distinct_ratio) ordered by
    (group?, n).

    Scale shape: one explode per n over the staged token array; the distinct
    count is an exact two-level aggregation (first GROUP BY the n-gram —
    map-side combining, the Zipf head collapses early — then a count per
    group). For approximate-but-flat at extreme cardinalities, feed the same
    stream to `kmv_distinct` / `hll_build` instead.
    """
    if not ns or any(n < 1 for n in ns):
        raise ValueError(f"ns must be >= 1: {ns}")
    gb = [group_col] if group_col else []
    staged = df.select(*gb, tokens(F.col(text_col)).alias("__toks"))
    parts = []
    for n in sorted(set(ns)):
        grams = (
            staged.select(*gb, F.explode(word_ngrams_of(F.col("__toks"), n=n)).alias("__g"))
            if n > 1
            else staged.select(*gb, F.explode(F.col("__toks")).alias("__g"))
        )
        counted = grams.groupBy(*gb, "__g").agg(F.count("*").alias("__c"))
        agg = counted.groupBy(*gb).agg(
            F.sum("__c").cast("bigint").alias("total_ngrams"),
            F.count("*").cast("bigint").alias("distinct_ngrams"),
        )
        parts.append(agg.withColumn("n", F.lit(n)))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    out = out.withColumn(
        "distinct_ratio",
        pround(
            F.when(F.col("total_ngrams") > 0,
                   F.col("distinct_ngrams").cast("double") / F.col("total_ngrams"))
            .otherwise(F.lit(0.0)),
            round_dp,
        ),
    ).select(*gb, "n", "total_ngrams", "distinct_ngrams", "distinct_ratio")
    return out.orderBy(*gb, "n")


def pii_stats(
    df: DataFrame,
    text_col: str = "text",
    kinds: tuple[str, ...] = ("email", "ip", "phone"),
) -> DataFrame:
    """Per-document PII span counts — the audit companion to
    `functions.text.redact_pii` (which replaces): release gates want the
    COUNT ("how much PII would this shard leak") before deciding to scrub or
    drop, and per-source aggregates of these columns locate the offending
    crawler. Appends `n_<kind>` per requested kind plus `pii_total`.

    Same deterministic RE2-and-Java-safe patterns as redact_pii, counted
    native-side with `regexp_count` (whole-stage codegen, zero shuffle, no
    Python workers)."""
    from lantern_extras_spark.functions.text import PII_PATTERNS

    pats = dict(PII_PATTERNS)
    unknown = [k for k in kinds if k not in pats]
    if unknown:
        raise ValueError(f"unknown PII kinds {unknown}; valid: {list(pats)}")
    out = df
    total = F.lit(0).cast("bigint")
    for kind, pat in PII_PATTERNS:
        if kind not in kinds:
            continue
        c = F.regexp_count(F.col(text_col), F.lit(pat)).cast("bigint")
        out = out.withColumn(f"n_{kind}", c)
        total = total + F.col(f"n_{kind}")
    return out.withColumn("pii_total", total)


def code_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The Stack / StarCoder-style code-file quality features as native
    expressions (Kocetkov et al. 2022 §3; the published filter most open
    code corpora start from): per document —

    - n_lines, avg_line_len, max_line_len
    - alnum_frac: alphanumeric characters / all characters
    - alpha_frac: alphabetic characters / all characters
    - hex_frac: share of characters inside hex-like tokens (0x... / long
      [0-9a-f]+ runs) — data blobs masquerading as code
    - starcoder_keep: the published screen (avg_line_len <= 100 AND
      max_line_len <= 1000 AND alnum_frac > 0.25)

    Pure Column expressions (one split + regexp scans inside whole-stage
    codegen, no Python workers, no shuffle) and engine-portable — the DuckDB
    oracle replays the chain (`q_code_stats`)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    # stage the split as a real column: an inlined split re-evaluates PER
    # LINE inside the transform lambda (O(lines²) splitting — the same trap
    # word_ngrams documents); a multi-use alias survives CollapseProject
    df = df.withColumn("__cs_lines", F.split(t, "\n"))
    lines = F.col("__cs_lines")
    n_lines = F.size(lines)
    n_chars = F.length(t)
    # line lengths: total non-newline chars / n_lines; max via array transform
    newlines = n_lines - 1
    avg_line = F.when(n_lines == 0, F.lit(0.0)).otherwise(
        (n_chars - newlines).cast("double") / n_lines.cast("double")
    )
    max_line = F.coalesce(
        F.array_max(F.transform(lines, lambda ln: F.length(ln))), F.lit(0)
    )
    alnum = F.length(F.regexp_replace(t, r"[^A-Za-z0-9]", ""))
    alpha = F.length(F.regexp_replace(t, r"[^A-Za-z]", ""))
    # hex-like runs: 0x-prefixed or bare >=8-char hex tokens
    hex_chars = F.length(t) - F.length(
        F.regexp_replace(t, r"0[xX][0-9A-Fa-f]+|\b[0-9a-fA-F]{8,}\b", "")
    )
    safe = F.when(n_chars == 0, F.lit(0.0))
    alnum_frac = safe.otherwise(alnum.cast("double") / n_chars.cast("double"))
    alpha_frac = safe.otherwise(alpha.cast("double") / n_chars.cast("double"))
    hex_frac = safe.otherwise(hex_chars.cast("double") / n_chars.cast("double"))
    keep = (avg_line <= 100.0) & (max_line <= 1000) & (alnum_frac > 0.25)
    return df.select(
        F.col(id_col),
        n_lines.alias("n_lines"),
        pround(avg_line, 6).alias("avg_line_len"),
        max_line.alias("max_line_len"),
        pround(alnum_frac, 6).alias("alnum_frac"),
        pround(alpha_frac, 6).alias("alpha_frac"),
        pround(hex_frac, 6).alias("hex_frac"),
        keep.alias("starcoder_keep"),
    )
