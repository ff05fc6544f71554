"""Property-based checks for the r8 retrieval/bloom kernels that don't need a
SparkSession: the BM25 oracle-SQL builder against an independent Python
reference over generated corpora (DuckDB executes the SQL), and Bloom-filter
membership invariants over generated key sets (pure Python replication of the
md5 double-hash build)."""

import hashlib
import math

import duckdb
import pytest
from hypothesis import assume, given, settings, strategies as st

from lantern_extras_spark.operators.retrieval import bm25_sql

WORD = st.sampled_from(["spark", "merge", "join", "alpha", "beta", "gamma", "x9"])
DOC = st.lists(WORD, min_size=0, max_size=12).map(" ".join)


def _bm25_ref(texts, terms, k1=1.2, b=0.75):
    toks = [t.split() if t.strip() else [] for t in texts]
    n = len(toks)
    avgdl = sum(len(x) for x in toks) / n
    out = []
    dfs = {t: sum(1 for x in toks if t in x) for t in terms}
    for x in toks:
        s = 0.0
        for t in terms:
            tf = float(x.count(t))
            df = float(dfs[t])
            idf = math.log(1.0 + (n - df + 0.5) / (df + 0.5))
            s += idf * (tf * (k1 + 1.0)) / (tf + k1 * (1.0 - b + b * len(x) / avgdl))
        out.append(s)
    return out


@given(st.lists(DOC, min_size=1, max_size=15))
@settings(max_examples=60, deadline=None)
def test_bm25_sql_matches_python_reference(texts):
    # an ALL-empty corpus has avgdl 0 -> scores are NaN in both engines (the
    # 0/0 convention); the comparison needs at least one token somewhere
    assume(any(t.split() for t in texts))
    terms = ["spark", "merge", "join"]
    con = duckdb.connect()
    con.sql("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    for i, t in enumerate(texts):
        con.sql(f"INSERT INTO documents VALUES ({i}, '{t}')")
    got = dict(con.sql(bm25_sql(terms)).fetchall())
    want = _bm25_ref(texts, terms)
    for i, w in enumerate(want):
        assert got[i] == pytest.approx(w, abs=1e-12), (i, texts[i])


def _bloom_words_py(keys, m, k):
    """Pure-Python replica of bloom_build's md5 double-hash positions."""
    words = [0] * (m // 64)
    for key in keys:
        h1 = int(hashlib.md5(f"0:{key}".encode()).hexdigest()[:8], 16)
        h2 = int(hashlib.md5(f"1:{key}".encode()).hexdigest()[:8], 16) | 1
        for i in range(k):
            h = (h1 + i * h2) & (m - 1)
            words[h >> 6] |= 1 << (h & 63)
    return words


@given(st.sets(st.integers(min_value=0, max_value=10**9), min_size=1, max_size=200))
@settings(max_examples=40, deadline=None)
def test_bloom_no_false_negatives_and_bounded_fp(keys):
    from lantern_extras_spark.operators.bloom import BloomFilter

    m, k = 1 << 14, 5
    bf = BloomFilter(_bloom_words_py([str(x) for x in keys], m, k), m, k,
                     len(keys), hash_kind="md5")
    # no false negatives, ever
    for x in keys:
        assert bf.contains_py(str(x))
    # false-positive rate on disjoint probes stays near theory (loose 10x cap
    # absorbs small-sample noise; theory at 200 keys / 2^14 bits is ~3e-5)
    probes = [str(10**9 + 7 + i) for i in range(500)]
    fp = sum(bf.contains_py(p) for p in probes if int(p) not in keys)
    assert fp / 500 <= max(0.02, 10 * bf.fp_rate_estimate)


@given(st.sets(st.integers(min_value=0, max_value=10**6), min_size=1, max_size=50))
@settings(max_examples=40, deadline=None)
def test_bloom_monotone_under_union(keys):
    """Adding keys can only ADD admitted probes (bit_or monotonicity)."""
    from lantern_extras_spark.operators.bloom import BloomFilter

    m, k = 1 << 12, 4
    half = sorted(keys)[: len(keys) // 2 + 1]
    bf_half = BloomFilter(_bloom_words_py([str(x) for x in half], m, k), m, k,
                          len(half), hash_kind="md5")
    bf_full = BloomFilter(_bloom_words_py([str(x) for x in keys], m, k), m, k,
                          len(keys), hash_kind="md5")
    for p in list(keys)[:20] + [999999999, 888888888]:
        if bf_half.contains_py(str(p)):
            assert bf_full.contains_py(str(p)), p
