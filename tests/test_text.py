"""Text primitives + textstats operators, edge cases included."""

import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.functions import text as T
from lantern_extras_spark.operators import textstats as TS


@pytest.fixture(scope="module")
def tdf(spark):
    rows = [
        (1, "the quick brown fox"),
        (2, ""),
        (3, "   "),
        (4, "one"),
        (5, "a b"),
        (6, "hello, world! x2 #tags"),
    ]
    return spark.createDataFrame(rows, "id long, t string")


def test_token_counts(tdf):
    got = {r["id"]: r["n"] for r in tdf.select("id", T.token_count("t").alias("n")).collect()}
    assert got == {1: 4, 2: 0, 3: 0, 4: 1, 5: 2, 6: 4}


def test_bpe_ish_counts(tdf):
    got = {r["id"]: r["n"] for r in tdf.select("id", T.bpe_ish_token_count("t").alias("n")).collect()}
    # "hello, world! x2 #tags" -> hello , world ! x 2 # tags = 8
    assert got[6] == 8 and got[2] == 0


def test_word_ngrams_short_docs(tdf):
    got = {r["id"]: r["sh"] for r in tdf.select("id", T.word_ngrams("t", 3).alias("sh")).collect()}
    assert got[1] == ["the quick brown", "quick brown fox"]
    assert got[2] == []
    assert got[4] == ["one"]  # shorter than n -> whole text shingle
    assert got[5] == ["a b"]


def test_char_ngrams(spark):
    df = spark.createDataFrame([(1, "abcdef")], "id long, t string")
    got = df.select(T.char_ngrams("t", 5).alias("g")).first()["g"]
    assert got == ["abcde", "bcdef"]


def test_ratios(tdf):
    r = {
        row["id"]: row
        for row in tdf.select(
            "id",
            T.punct_ratio("t").alias("p"),
            T.uniq_token_ratio("t").alias("u"),
        ).collect()
    }
    assert r[2]["p"] == 0.0 and r[2]["u"] == 0.0
    assert r[1]["u"] == 1.0
    assert r[6]["p"] > 0


def test_language_id(spark):
    rows = [
        (1, "the cat and the dog in a house", "en"),
        (2, "der hund und die katze ist nicht da", "de"),
        (3, "le chat est dans la maison pour un moment", "fr"),
        (4, "el perro y la casa es un lugar por que", "es"),
        (5, "xyzzy qwerty zzz", None),  # no stopword hits -> und
    ]
    df = spark.createDataFrame(rows, "id long, text string, expect string")
    out = {r["id"]: r["lang_pred"] for r in TS.language_id(df).collect()}
    assert out[1] == "en" and out[2] == "de" and out[3] == "fr" and out[4] == "es"
    assert out[5] == "und"


def test_quality_metrics(spark):
    df = spark.createDataFrame(
        [(1, "good solid readable document with many distinct meaningful words here"),
         (2, "spam spam spam spam spam spam spam spam"),
         (3, "")],
        "id long, text string",
    )
    qm = {r["id"]: r for r in TS.quality_metrics(df).collect()}
    assert qm[1]["quality_score"] > qm[2]["quality_score"]
    assert qm[3]["n_tokens"] == 0 and qm[3]["quality_score"] == pytest.approx(0.3)


def test_fingerprint_identity(spark):
    df = spark.createDataFrame(
        [(1, "identical content body"), (2, "identical content body"), (3, "something else")],
        "doc_id long, text string",
    )
    fp = {r["doc_id"]: r["fp_key"] for r in TS.fingerprint(df).collect()}
    assert fp[1] == fp[2] != fp[3]


def test_compression_ratio_detects_repetition(spark):
    from lantern_extras_spark.operators.textstats import compression_ratio

    rows = [
        (1, "the same phrase " * 50),               # highly repetitive
        (2, "k9#xQ!vR2@mZ8$wL5%nJ3^bT7&cY1*fH6(d"), # high entropy
        (3, None),
        (4, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(df).collect()}
    assert got[1] < 0.1 < got[2]
    assert got[3] is None and got[4] is None
    # deterministic across runs
    again = {r["doc_id"]: r["compression_ratio"] for r in compression_ratio(df).collect()}
    assert again == got


def test_clean_text(spark):
    from lantern_extras_spark.functions.text import clean_text
    from pyspark.sql import functions as F

    rows = [
        (1, '<div class="a">Hello <b>world</b></div>'),
        (2, "a&lt;b &amp;&amp; c&gt;d &quot;q&quot; &#39;s&#39;"),
        (3, "&amp;amp; one-level decode"),
        (4, "spaces \t and\n\nnewlines   collapse"),
        (5, "a<br>b"),          # tag becomes a word boundary, not a join
        (6, ""),
        (7, None),
    ]
    df = spark.createDataFrame(rows, "id long, t string")
    got = {r["id"]: r["c"] for r in df.select("id", clean_text("t").alias("c")).collect()}
    assert got[1] == "Hello world"
    assert got[2] == 'a<b && c>d "q" \'s\''
    assert got[3] == "&amp; one-level decode"
    assert got[4] == "spaces and newlines collapse"
    assert got[5] == "a b"
    assert got[6] == ""
    assert got[7] is None


def test_strip_boilerplate_lines(spark):
    from lantern_extras_spark.operators.textstats import strip_boilerplate_lines

    hdr, ftr = "COOKIE BANNER", "ALL RIGHTS RESERVED"
    rows = [
        (1, "s1", f"{hdr}\nunique body one\n{ftr}"),
        (2, "s1", f"{hdr}\nanother body\n\nwith a blank line\n{ftr}"),
        (3, "s1", f"{hdr}\n{ftr}"),                      # only boilerplate
        (4, "s2", f"{hdr}\nother-source body\n{ftr}"),   # s2 has ONE doc -> min_docs keeps all
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text_clean"]
           for r in strip_boilerplate_lines(df, min_docs=2, max_doc_frac=0.5).collect()}
    assert out[1] == "unique body one"
    assert out[2] == "another body\n\nwith a blank line"  # blanks survive, order kept
    assert out[3] == ""                                   # fully-boilerplate doc
    assert out[4] == f"{hdr}\nother-source body\n{ftr}"   # per-source grouping
    with pytest.raises(ValueError, match="max_doc_frac"):
        strip_boilerplate_lines(df, max_doc_frac=0.0)


def test_strip_boilerplate_regex_special_separator(spark):
    """A regex-special line_sep ('|') must round-trip: split literally (not
    per-character) and re-join with the same separator."""
    from lantern_extras_spark.operators.textstats import strip_boilerplate_lines

    rows = [
        (1, "s1", "AD HERE|real content one|(c) corp."),
        (2, "s1", "AD HERE|real content two|(c) corp."),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["doc_id"]: r["text_clean"]
           for r in strip_boilerplate_lines(df, min_docs=2, max_doc_frac=0.5,
                                            line_sep="|").collect()}
    assert out == {1: "real content one", 2: "real content two"}
