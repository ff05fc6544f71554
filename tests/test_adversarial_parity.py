"""Adversarial oracle parity: the same Spark-vs-DuckDB hash gate, but over a
synthetic scale-factor directory stuffed with edge cases the generated test
data doesn't contain — empty/whitespace/unicode/sentinel texts, zero vectors,
exact-duplicate vectors (distance ties), so regex/trim/tie-break divergence
between engines shows up here first."""

import os
import shutil

import numpy as np
import pandas as pd
import pytest

from oracle_check import run_all

REAL_SF = "/root/testdata/sf0.001"

NASTY_TEXTS = [
    "",                                   # empty -> ignore filter
    "   ",                                # whitespace only
    "\tleading tab and\ttabs inside",
    "newline\nseparated\nlines here",
    "Error: Summary failed (llm)",        # sentinel -> ignore filter
    "unicode nbsp token and café words",
    "ALL CAPS SHOUTY DOCUMENT TEXT",
    "a",                                  # single char
    "the the the the the the",            # degenerate repetition
    "mixed 123 numbers-and-punct!!! ???",
    "x " * 500,                           # long repetitive
    "word",                               # single token
    "nbsp\u00a0inside\u00a0token here",   # U+00A0 is NOT \s in either engine
    "y" * 2000,                           # one enormous token
    "🙂🙃🙂 emoji run 🙂 with ünïcödé mixed in",
    "\tleading tab", "trailing tab\t",    # phantom-empty-token split edges
] + [f"normal document number {i} with some shared words" for i in range(20)]


@pytest.fixture(scope="module")
def nasty_sf(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("nasty_sf")
    # copy the real small tables, then overwrite documents + embeddings
    for t in "region nation customer supplier part orders lineitem events".split():
        shutil.copy(f"{REAL_SF}/{t}.parquet", d / f"{t}.parquet")

    docs = pd.DataFrame(
        {
            "doc_id": range(len(NASTY_TEXTS)),
            "text": NASTY_TEXTS,
            "lang": ["en", "de", "fr", "es", "zh"] * (len(NASTY_TEXTS) // 5) + ["en"] * (len(NASTY_TEXTS) % 5),
            "source": [f"src{i % 3}" for i in range(len(NASTY_TEXTS))],
            "n_chars": [len(t) for t in NASTY_TEXTS],
        }
    )
    docs.to_parquet(d / "documents.parquet", index=False)

    rng = np.random.RandomState(11)
    vecs = [rng.randn(8).astype("float32") for _ in range(26)]
    vecs[3] = np.zeros(8, dtype="float32")          # zero vector (cos guard)
    vecs[7] = vecs[6].copy()                        # exact duplicate -> distance tie
    vecs[12] = vecs[6].copy()                       # triple tie
    emb = pd.DataFrame(
        {
            "vec_id": range(26),
            "embedding": [v.tolist() for v in vecs],
            "label": [i % 3 for i in range(26)],
        }
    )
    emb.to_parquet(d / "embeddings.parquet", index=False)
    return str(d)


TEXT_AND_VECTOR_QUERIES = [
    "embed_documents",
    "doc_search",
    "token_stats",
    "language_id",
    "quality_by_lang",
    "dedup_exact",
    "minhash_signatures",
    "simhash",
    "ngram_jaccard",
    "fingerprints",
    "vector_distances",
    "knn_cos",
    "knn_l2",
    "label_vector_stats",
    "pq_assign",
    "ivf_search",
    # round-6 text-quality operators: regex/trim/array-sort/ln parity over
    # the same empty/whitespace/unicode/repetition edge cases
    "clean_text",
    "redact_pii",
    "repetition_stats",
    "unigram_logprob",
    "decontaminate",
    "pack_sequences",
    "pack_sequences_text",
    "url_canonical",
    "gopher_filter",
    "dedup_paragraphs",
    "vocab_coverage",
    "quota_sample",
    "resample_mixture",
    "chunk_documents",
    "minhash_incremental",
    "dedup_spans",
    "corpus_report",
    "bigram_logprob",
    "bigram_coverage",
    # round-7: cross-corpus ANN join — the zero vector and the exact-duplicate
    # triple force distance ties through assign/probe/rank on BOTH engines
    "ivf_knn_join",
    # round-7 second batch: the radius join hits the zero-vector cos guard
    # (distance exactly 1.0 by convention on both engines); the split and the
    # sketch chew the empty/whitespace/emoji docs
    "embedding_decontaminate",
    "leakage_safe_split",
    "kmv_distinct",
    # round-7 third batch: cell-confined cosine prune — the zero vector pins
    # the cos=0.0 convention and the exact-duplicate triple the min-id winner
    "semantic_dedup",
    # tokenizer edge cases (empty/whitespace/nbsp/emoji) through the
    # MG-candidate + exact-recount path vs the plain GROUP BY oracle
    "heavy_hitters",
    # snapshot diff: empty/whitespace/unicode texts through md5 equality,
    # the content-hash move map, and edited-shingle containment
    "corpus_diff",
    # re-id+edit recovery: empty/short docs produce whole-text shingles and
    # the cross-corpus jaccard + winner pick must agree on them
    "near_moves",
    # per-doc repeated-shingle fraction over the same edge-case texts
    "duplication_share",
    # remaining fourth-batch queries: the zero vector and duplicate triple
    # push cos=0.0 and rank/id tie-breaks through the incremental winner and
    # the recall audit (corpus side is EMPTY here — vec_id>=100 doesn't
    # exist in this fixture, pinning the empty-store edge); the sketches and
    # the drift/mixture projections chew the same nasty tables
    "semantic_incremental",
    "semantic_recall",
    "sampled_percentiles",
    "mixture_order",
    "embedding_drift",
    "heavy_hitters_by_lang",
    # round-8: the ungrouped two-phase k-min over a high-cardinality column
    # (every doc_id distinct, n < k here so the EXACT-count branch is pinned)
    "kmv_distinct_ids",
    # round-8: CCNet bucketing — empty/whitespace docs score exactly 0.0
    # (ties through sample ranking AND cutoff comparison on both engines)
    "perplexity_buckets",
    # round-8: split-leakage audit — the empty/whitespace/near-identical
    # fixture docs exercise pair-finding + split hashing + crossing filter
    "split_contamination",
    # round-8: SQ8 compressed kNN — the zero vector and the exact-duplicate
    # triple push clamp/dequant arithmetic and distance ties through both
    # engines' bounds -> codes -> rank pipeline
    "sq8_search",
    # round-8: per-doc OOV rate — empty docs pin the 0.0 convention and the
    # tie-broken top-V vocab boundary must agree across engines
    "oov_rate",
    # round-8 retrieval batch: BM25's idf/tf arithmetic over empty and
    # degenerate-repetition docs (df_t = 0 terms pin the ln(1 + (N+0.5)/0.5)
    # branch), RRF's missing-rank coalesce and massive score ties through
    # id tie-break, maxsim's empty-chunk exclusion, and MMR's greedy argmax
    # over near-identical candidates (exact-duplicate texts -> sim ties)
    "bm25_search",
    "hybrid_rrf",
    "maxsim_search",
    "mmr_rerank",
    # round-8: BQ two-stage search — the zero vector and the exact-duplicate
    # triple force Hamming ties (identical codes) and rerank distance ties
    # through id tie-break on both engines; dim-8 pins the short-word packing
    "bq_search",
    # round-8: Zipf fit — empty/whitespace/emoji docs through tokenize,
    # exact counts, lexicographic rank ties, and rank-ordered float folds
    "zipf_slope",
    # round-8: MRL truncated-prefix search — dim-8 pins d_prefix=2; the zero
    # vector and duplicate triple force prefix AND rerank distance ties
    "mrl_search",
    # round-8: PRF two-pass BM25 — expansion selection over degenerate docs
    # ("the the the..." floods term counts; ties break lexically on both
    # engines) and the term-sorted per-doc folds; snippets chew the
    # single-token / enormous-token / emoji docs through window arithmetic
    "bm25_prf",
    "search_snippets",
    # round-10: WARC-grade HTML extraction — empty/whitespace/emoji/huge-token
    # docs wrapped in the full page template push script-drop, block-newline
    # and entity stages through both engines' regex dialects
    "html_text_extract",
    # round-10: code-file screen — empty/whitespace/huge-one-line/emoji docs
    # through line-shape math and char-class fractions in both dialects
    "code_stats",
    # round-10: hygiene counters + invisible-strip over the nasty docs (the
    # NBSP-in-token fixture exercises the exotic-space class directly)
    "text_hygiene",
    # round-10: star-contraction connected components vs the recursive-CTE
    # fixpoint over the nasty pair graph (exact-duplicate texts -> dense
    # minhash buckets; empty docs -> no shingles)
    "dedup_clusters_star",
]


def test_adversarial_oracle_parity(spark, nasty_sf):
    res = run_all(spark, nasty_sf, only=TEXT_AND_VECTOR_QUERIES)
    errs = {k: v.get("error") for k, v in res.items() if "error" in v}
    assert not errs, errs
    bad = {
        k: (v["spark"][:2], v["oracle"][:2])
        for k, v in res.items()
        if "hash_match" in v and not (v["rows_match"] and v["cols_match"] and v["hash_match"])
    }
    assert not bad, bad
    assert len(res) == len(TEXT_AND_VECTOR_QUERIES)
