"""Property-based parity for the portable text/hash primitives — the same
three-way contract as test_portable_round.py: the Python reference, DuckDB,
and Spark must agree on every generated input, including whitespace edges,
unicode, and digit/symbol runs the curated fixtures might miss."""

import hashlib
import re as pyre

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from lantern_extras_spark.functions.hashing import hash32_sql

# whitespace-heavy, unicode-heavy alphabet: the failure modes live at the
# edges (leading tabs, lone separators, digit/letter boundaries, emoji)
TEXT = st.text(
    alphabet=st.sampled_from(list("abcXYZ019 \t\n!?.,-_#@áßç€🙂")),
    max_size=60,
)


def py_hash32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def py_hash60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def py_tokens(s: str) -> list[str]:
    t = s.strip(" ")  # Spark trim() strips spaces; \s+ split keeps edge empties
    if t == "":
        return []
    return pyre.split(r"\s+", t)


BPE_ISH = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


@given(st.lists(TEXT, min_size=1, max_size=30))
@settings(max_examples=150, deadline=None)
def test_hash32_hash60_python_duckdb_parity(texts):
    con = duckdb.connect()
    for s in texts:
        if "\x00" in s:
            continue  # NUL is not representable in a SQL literal
        lit = "'" + s.replace("'", "''") + "'"
        h32 = con.sql(f"SELECT {hash32_sql(lit)}").fetchone()[0]
        h60 = con.sql(
            f"SELECT CAST(concat('0x', substr(md5({lit}), 1, 15)) AS BIGINT)"
        ).fetchone()[0]
        assert h32 == py_hash32(s)
        assert h60 == py_hash60(s)
        assert 0 <= h60 < 2**60


@given(st.lists(TEXT, min_size=1, max_size=12))
@settings(max_examples=20, deadline=None)
def test_token_bpe_punct_counts_spark_vs_python(spark, texts):
    """One Spark job per example: token / BPE / punct / non-ws counts over a
    generated batch must equal the Python regex reference exactly (the Java
    lookbehind rewrites and split semantics included)."""
    from pyspark.sql import functions as F
    from lantern_extras_spark.functions import text as T

    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "id long, t string"
    )
    rows = df.select(
        "id",
        T.token_count("t").alias("tc"),
        T.bpe_ish_token_count("t").alias("bpe"),
        T.nonws_char_count("t").alias("nonws"),
        T.punct_ratio("t").alias("pr"),
    ).collect()
    for r in rows:
        s = texts[r["id"]]
        toks = py_tokens(s)
        assert r["tc"] == len(toks), (s, toks)
        assert r["bpe"] == len(pyre.findall(BPE_ISH, s)), s
        assert r["nonws"] == len(pyre.sub(r"\s", "", s)), s
        n_punct = len(pyre.findall(r"[^A-Za-z0-9\s]", s))
        want_pr = 0.0 if len(s) == 0 else n_punct / len(s)
        assert r["pr"] == pytest.approx(want_pr), s
