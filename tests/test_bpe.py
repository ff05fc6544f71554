"""Vendored BPE tokenizer: exact-count goldens, roundtrip, runtime wiring.

The reference asserts exact tokenizer counts (text_embedding_test.rs:88) and
packs OpenAI requests by exact cl100k counts (openai_runtime.rs:50-66); these
tests pin the same contract against the committed mini-vocab.
"""

import pytest

from lantern_extras_spark.functions import bpe as B
from lantern_extras_spark.embeddings import runtimes as R

# Exact golden counts under the committed bpe_vocab.txt. If the vocab file is
# retrained these change — that is the point: counts are a fixed contract.
GOLDENS = {
    "the quick brown fox": 10,
    "hello world": 7,
    "it's the user's job": 7,
    "embedding vectors are arrays": 12,
    "doc_id 12345 [IGNORE]": 19,
    "": 0,
    "   ": 3,
    "naïve café — ünïcode": 22,
}


def test_exact_golden_counts():
    for text, n in GOLDENS.items():
        assert B.bpe_token_count(text) == n, text


def test_encode_decode_roundtrip():
    enc = B.default_bpe()
    for text in [*GOLDENS, "tabs\tand\nnewlines", "mixed 12.5 punct!?;:"]:
        assert enc.decode(enc.encode(text)) == text


def test_vocab_reload_is_deterministic():
    fresh = B.Bpe(B.load_merges())
    for text in GOLDENS:
        assert fresh.count(text) == B.bpe_token_count(text)


def test_merges_compress_below_bytes():
    enc = B.default_bpe()
    text = "the training corpus for a language model is deduplicated"
    assert len(enc.encode(text)) < len(text.encode())


def test_train_bpe_deterministic_and_ranked():
    corpus = ["aa ab aa ab aa", "aa ab aa"]
    m1 = B.train_bpe(corpus, 8)
    m2 = B.train_bpe(corpus, 8)
    assert m1 == m2
    # most frequent pair (' ','a' — pretokens keep their leading space) first
    assert m1[0] == (ord(" "), ord("a"))


def test_openai_usage_ledger_counts_bpe_tokens():
    rt = R.OpenAIRuntime(
        "openai/text-embedding-3-small", transport=lambda m, t, p: [[0.0]] * len(t)
    )
    texts = ["hello world", "the quick brown fox"]
    res = rt.process(texts)
    assert res.processed_tokens == sum(B.bpe_token_count(t) for t in texts)


def test_openai_token_method_whitespace_override():
    rt = R.OpenAIRuntime(
        "openai/text-embedding-3-small",
        {"token_method": "whitespace"},
        transport=lambda m, t, p: [[0.0]] * len(t),
    )
    assert rt.process(["hello world"]).processed_tokens == 2


def test_packing_respects_bpe_budget():
    rt = R.OpenAIRuntime(
        "openai/text-embedding-3-small", transport=lambda m, t, p: [[0.0]] * len(t)
    )
    one = "embedding vectors are arrays "  # > 1 token each
    per = B.bpe_token_count(one)
    n_fit = R.OPENAI_MAX_TOKENS_PER_REQUEST // per
    texts = [one] * (n_fit + 2)
    batches = rt.pack_batches(texts)
    assert len(batches) == 2
    assert len(batches[0]) == n_fit
    assert sum(len(b) for b in batches) == len(texts)


def test_token_count_col_matches_python(spark):
    texts = list(GOLDENS)
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    got = {r["id"]: r["n"] for r in df.select("id", B.bpe_token_count_col("t").alias("n")).collect()}
    assert got == {i: B.bpe_token_count(t) for i, t in enumerate(texts)}


def test_train_bpe_on_corpus_deterministic_and_effective(spark):
    """Sampled corpus training: identical merges across runs AND across
    partitionings (the keyed-sample + order-insensitive-training contract);
    the learned tokenizer compresses the corpus it was trained on."""
    from lantern_extras_spark.functions.bpe import Bpe, train_bpe_on_corpus

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m1 = train_bpe_on_corpus(docs, n_merges=64, sample_docs=200)
    m2 = train_bpe_on_corpus(docs.repartition(13), n_merges=64, sample_docs=200)
    assert m1 == m2 and len(m1) == 64
    enc = Bpe(m1)
    sample = [r[0] for r in docs.select("text").limit(20).collect()]
    n_bpe = sum(enc.count(t) for t in sample)
    n_bytes = sum(len(t.encode()) for t in sample)
    assert n_bpe < 0.7 * n_bytes  # merges actually compress

    import pytest as _pt
    with _pt.raises(ValueError, match="n_merges"):
        train_bpe_on_corpus(docs, n_merges=0)
    with _pt.raises(ValueError, match="sample_docs"):
        train_bpe_on_corpus(docs, sample_docs=0)
