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


def test_redact_pii(spark):
    from lantern_extras_spark.functions.text import redact_pii

    rows = [
        (1, "contact john.doe+spam@example.co.uk or call +1 (555) 123-4567 now"),
        (2, "server at 192.168.0.1 responded; also 555.867.5309 and x@y.io"),
        (3, "no pii here, just the number 1234567890123 as an id"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["clean"]
           for r in df.select("doc_id", redact_pii("text").alias("clean")).collect()}
    assert out[1] == "contact <EMAIL> or call <PHONE> now"
    assert out[2] == "server at <IP> responded; also <PHONE> and <EMAIL>"
    assert out[3] == rows[2][1]  # bare digit runs are NOT phones
    # kind selection + validation
    only_email = df.select(redact_pii("text", kinds=("email",)).alias("c")).collect()
    assert "192.168.0.1" in only_email[1]["c"]
    with pytest.raises(ValueError, match="unknown PII kinds"):
        df.select(redact_pii("text", kinds=("ssn",)))


def test_repetition_stats(spark):
    from lantern_extras_spark.operators.textstats import repetition_stats

    rows = [
        # 4 non-empty lines, "spam line" twice (2/4 dup; 18 of 38 line chars)
        (1, "spam line\nunique alpha text\nspam line\nbeta gamma"),
        (2, "one tidy line\nanother neat row"),
        (3, ""),  # empty doc -> all zeros
        # "buy now" 2-gram repeated 4x in 8 tokens
        (4, "buy now buy now buy now buy now"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["dup_line_frac"] == pytest.approx(0.5)
    total_chars = len("spam line") * 2 + len("unique alpha text") + len("beta gamma")
    assert out[1]["dup_line_char_frac"] == pytest.approx(18 / total_chars, abs=1e-6)
    assert out[2]["dup_line_frac"] == 0.0
    assert out[2]["top_ngram_char_frac"] == 0.0  # no gram occurs twice
    assert out[3]["dup_line_frac"] == 0.0 and out[3]["dup_ngram_char_frac"] == 0.0
    # doc 4: top 2-gram "buy now" occurs 4x, 7 chars, text is 31 chars
    assert out[4]["top_ngram_char_frac"] == pytest.approx(min(4 * 7 / 31, 1.0), abs=1e-6)
    assert out[4]["dup_line_frac"] == 0.0  # single line
    # the Gopher-style screen separates the looping docs from clean prose
    assert out[4]["top_ngram_char_frac"] > 0.2 > out[2]["top_ngram_char_frac"]


def test_unigram_logprob_score(spark):
    import math

    from lantern_extras_spark.operators.textstats import unigram_logprob_score

    rows = [
        (1, "the cat sat on the mat"),
        (2, "the the the the"),          # most common token only -> highest score
        (3, "zyxwvut qponmlk jihgfed"),  # hapax soup -> lowest score
        (4, ""),                          # token-less -> 0.0
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r["lm_logprob"] for r in unigram_logprob_score(df).collect()}
    assert out[2] > out[1] > out[3]
    assert out[4] == 0.0
    # hand-check doc 2: N=13 tokens, V=8 distinct, count(the)=6;
    # p(the) = (6+1)/(13 + 1*(8+1)) = 7/22
    assert out[2] == pytest.approx(round(math.log(7 / 22), 6), abs=1e-6)
    with pytest.raises(ValueError, match="alpha"):
        unigram_logprob_score(df, alpha=0.0)
    # scoring against an external reference: unseen tokens take the +alpha mass
    ref = spark.createDataFrame([(10, "the cat")], "doc_id long, text string")
    ext = {r["doc_id"]: r["lm_logprob"]
           for r in unigram_logprob_score(df, ref=ref).collect()}
    assert ext[3] == pytest.approx(round(math.log(1 / (2 + 3)), 6), abs=1e-6)


def test_gopher_filter(spark):
    from lantern_extras_spark.operators.textstats import gopher_filter

    prose = ("the cat sat on a mat and it was that kind of day for a walk in "
             "the park where a dog ran to the tree and the birds sang songs "
             "over the quiet pond while a child played near the old bench "
             "in the warm sun of an autumn afternoon with leaves falling")
    rows = [
        (1, prose),                                   # clean -> keep
        (2, "short doc"),                             # too_short (+ stopwords)
        (3, "buy now " * 80),                         # repetition screens fire
        (4, prose + ("\nSPAM LINE" * 1) + "\nSPAM LINE"),  # dup lines
        (5, "@@@@ #### $$$$ %%%% " * 20),             # symbols + no stopwords
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in gopher_filter(df).collect()}
    assert out[1]["gopher_keep"] and out[1]["gopher_drop_reasons"] == []
    assert not out[2]["gopher_keep"] and "too_short" in out[2]["gopher_drop_reasons"]
    r3 = out[3]["gopher_drop_reasons"]
    assert "top_ngram_char_frac" in r3 and "dup_ngram_char_frac" in r3
    assert "dup_line_frac" in out[4]["gopher_drop_reasons"]
    r5 = out[5]["gopher_drop_reasons"]
    assert "symbol_ratio" in r5 and "too_few_stopwords" in r5
    # threshold override + validation
    strict = {r["doc_id"]: r["gopher_keep"]
              for r in gopher_filter(df, min_tokens=1000).collect()}
    assert not strict[1]
    with pytest.raises(ValueError, match="unknown thresholds"):
        gopher_filter(df, max_lines=3)


def test_count_kernels_match_array_forms(spark):
    """The run-collapsing regexp_replace counters must equal the original
    array-materializing forms on every edge case (the optimization is
    count-only, never semantic)."""
    texts = [
        "", "   ", "a", "ab12cd", "12ab34", "héllo wörld", "a-b_c.d",
        "x " * 200, "tabs\tand\nnewlines mixed", "ALL CAPS 999 !!!",
        "mixed 123 numbers-and-punct!!! ???", "ünï©ödé — emoji 🙂 test",
        # phantom-empty-token edges: split() on the space-trimmed string emits
        # "" when it still starts/ends with non-space whitespace
        "\tleading tab", "trailing tab\t", "\t", " \t ", "\n\nx\n", "  x  ",
    ]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, t string")
    chk = df.select(
        "id",
        T.token_count("t").alias("tc_fast"),
        F.size(T.tokens("t")).alias("tc_ref"),
        T.bpe_ish_token_count("t").alias("bpe_fast"),
        F.size(F.regexp_extract_all(F.col("t"), F.lit(T.BPE_ISH), 0)).alias("bpe_ref"),
        T.nonws_char_count("t").alias("nonws"),
        F.aggregate(T.tokens("t"), F.lit(0), lambda a, x: a + F.length(x)).alias("sumlen"),
    ).collect()
    for r in chk:
        assert r["tc_fast"] == r["tc_ref"], r
        assert r["bpe_fast"] == r["bpe_ref"], r
        assert r["nonws"] == r["sumlen"], r


def test_vocab_coverage(spark):
    df = spark.createDataFrame(
        [(1, "a a a B b c"), (2, "a b"), (3, ""), (4, "   ")],
        "id long, text string",
    )
    # lowercased counts: a=4, b=3, c=1; total=8
    out = TS.vocab_coverage(df, top_k=2).collect()
    assert [(r["rank"], r["token"], r["n"]) for r in out] == [(1, "a", 4), (2, "b", 3)]
    assert out[0]["freq"] == pytest.approx(0.5)
    assert out[0]["coverage"] == pytest.approx(0.5)
    assert out[1]["coverage"] == pytest.approx(7 / 8)
    # case-sensitive mode separates B from b; ties break lexicographically
    cs = TS.vocab_coverage(df, top_k=4, lowercase=False).collect()
    assert [r["token"] for r in cs] == ["a", "b", "B", "c"]
    with pytest.raises(ValueError, match="top_k"):
        TS.vocab_coverage(df, top_k=0)


def test_chunk_documents(spark):
    df = spark.createDataFrame(
        [
            (1, " ".join(f"t{i}" for i in range(1, 11))),   # 10 tokens
            (2, "only three tokens"),
            (3, ""),                                        # no chunks
        ],
        "doc_id long, text string",
    )
    out = TS.chunk_documents(df, window=8, overlap=4)
    rows = sorted(
        ((r["doc_id"], r["chunk_idx"], r["n_chunk_tokens"], r["chunk_text"]) for r in out.collect())
    )
    # doc 1: starts 1, 5 (stride 4); start 9 skipped — chunk at 5 already
    # reached token 10, a third chunk would be pure overlap
    assert rows == [
        (1, 1, 8, "t1 t2 t3 t4 t5 t6 t7 t8"),
        (1, 2, 6, "t5 t6 t7 t8 t9 t10"),
        (2, 1, 3, "only three tokens"),
    ]
    # zero overlap tiles exactly
    flat = TS.chunk_documents(df.where("doc_id = 1"), window=5, overlap=0).collect()
    assert [r["chunk_text"] for r in sorted(flat, key=lambda r: r["chunk_idx"])] == [
        "t1 t2 t3 t4 t5", "t6 t7 t8 t9 t10"
    ]
    with pytest.raises(ValueError, match="overlap"):
        TS.chunk_documents(df, window=8, overlap=8)
    with pytest.raises(ValueError, match="window"):
        TS.chunk_documents(df, window=0)


def test_corpus_report(spark):
    df = spark.createDataFrame(
        [
            (1, "s0", "good readable document with several distinct words"),
            (2, "s0", "good readable document with several distinct words"),  # exact dup
            (3, "s0", ""),                                                    # blank
            (4, "s1", "one two three four five six"),
        ],
        "doc_id long, source string, text string",
    )
    rep = {r["source"]: r for r in TS.corpus_report(df).collect()}
    assert rep["s0"]["n_docs"] == 3 and rep["s1"]["n_docs"] == 1
    assert rep["s0"]["dup_rate"] == pytest.approx(1 - 2 / 3, abs=1e-6)
    assert rep["s0"]["blank_frac"] == pytest.approx(1 / 3, abs=1e-6)
    assert rep["s1"]["total_tokens"] == 6 and rep["s1"]["dup_rate"] == 0.0
    assert 0.0 <= rep["s0"]["avg_quality"] <= 1.0


def test_bigram_logprob_score(spark):
    ref = spark.createDataFrame(
        [
            (100, "the cat sat on the mat while the dog sat on the rug"),
            (101, "a cat and a dog sat on the mat in the sun"),
            (102, "the dog and the cat sat on the rug all day"),
        ],
        "doc_id long, text string",
    )
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat and the dog sat on the rug"),
            (2, "cat the on sat mat the dog and rug the on sat"),  # shuffled salad
            (3, "single"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["lm2_logprob"]
           for r in TS.bigram_logprob_score(docs, ref=ref).collect()}
    # coherent transitions beat same-unigram word salad by a wide margin
    assert out[1] > out[2] + 1.0
    # < 2 tokens -> no transitions -> 0.0
    assert out[3] == 0.0 and out[4] == 0.0
    # lam=0 degenerates to the pure unigram interpolation term
    uni_only = {r["doc_id"]: r["lm2_logprob"]
                for r in TS.bigram_logprob_score(docs, ref=ref, lam=0.0).collect()}
    assert uni_only[1] < 0.0
    with pytest.raises(ValueError, match="lam"):
        TS.bigram_logprob_score(docs, lam=1.5)
    with pytest.raises(ValueError, match="alpha"):
        TS.bigram_logprob_score(docs, alpha=0.0)


def test_vocab_coverage_ngram(spark):
    df = spark.createDataFrame(
        [(1, "a b a b a"), (2, "a"), (3, "")], "id long, text string"
    )
    # bigrams: "a b" x2, "b a" x2 (doc 2 and 3 contribute nothing)
    out = TS.vocab_coverage(df, top_k=5, ngram=2).collect()
    assert [(r["token"], r["n"]) for r in out] == [("a b", 2), ("b a", 2)]
    assert out[-1]["coverage"] == pytest.approx(1.0)
    with pytest.raises(ValueError, match="ngram"):
        TS.vocab_coverage(df, ngram=0)


def test_html_to_text_expr(spark):
    from lantern_extras_spark.functions.text import html_to_text

    page = (
        '<html><head><style>p{color:red}</style>'
        '<script>var s = "<b>not content</b>";</script></head>'
        "<body><!-- hidden comment --><h1>Title</h1>"
        "<p>First &amp; second</p><ul><li>one</li><li>two</li></ul>"
        "<div>tail   spaced</div></body></html>"
    )
    df = spark.createDataFrame([(1, page), (2, None), (3, "plain, no markup")],
                               "id long, t string")
    got = {r["id"]: r["x"] for r in df.select("id", html_to_text("t").alias("x")).collect()}
    # </ul> after </li> leaves a paragraph-style blank line — by design
    assert got[1] == "Title\nFirst & second\none\ntwo\n\ntail spaced"
    assert got[2] is None
    assert got[3] == "plain, no markup"
    # script/style/comment content must be GONE, not just de-tagged
    assert "not content" not in got[1] and "color" not in got[1] and "hidden" not in got[1]


def test_html_to_text_udf_agrees_on_content(spark):
    """Parser twin: same content words as the expression version (whitespace
    conventions differ by design), plus numeric charrefs only the parser
    handles."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.functions.text import html_to_text, html_to_text_udf

    pages = [
        "<p>alpha</p><script>drop()</script><div>beta &amp; gamma</div>",
        "<ul><li>x1</li><li>x2</li></ul><style>.a{}</style>done",
    ]
    df = spark.createDataFrame([(i, p) for i, p in enumerate(pages)], "id long, t string")
    rows = df.select(
        "id",
        html_to_text("t").alias("expr"),
        html_to_text_udf()(F.col("t")).alias("parsed"),
    ).collect()
    for r in rows:
        assert r["expr"].split() == r["parsed"].split(), r
    # numeric charref: parser decodes it; the expression version passes it through
    one = spark.createDataFrame([(1, "<p>it&#8217;s here</p>")], "id long, t string")
    r = one.select(html_to_text_udf()(F.col("t")).alias("p")).first()
    assert r["p"] == "it’s here"


def test_html_to_text_feeds_line_based_ops(spark):
    """Block boundaries become real lines so strip_boilerplate_lines can see
    the shared nav menu as a line in every doc of the source."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.functions.text import html_to_text
    from lantern_extras_spark.operators.textstats import strip_boilerplate_lines

    pages = [
        (i, f"<div>MENU HOME ABOUT</div><p>unique body text number {i} is long enough</p>")
        for i in range(4)
    ]
    df = spark.createDataFrame(pages, "doc_id long, raw string").select(
        "doc_id", F.lit("web").alias("source"), html_to_text("raw").alias("text")
    )
    out = strip_boilerplate_lines(df).collect()
    for r in out:
        assert "MENU HOME ABOUT" not in r["text_clean"]
        assert f"number {r['doc_id']}" in r["text_clean"]


def test_warc_html_to_corpus_integration(spark, tmp_path):
    """The full crawl seam: WARC response bytes -> charset decode ->
    html_to_text -> line-structured corpus text."""
    from pyspark.sql import functions as F

    from lantern_extras_spark.functions.text import html_to_text
    from lantern_extras_spark.sources import warc as W

    html = "<html><body><h1>Doc</h1><p>crawled &amp; extracted</p></body></html>"
    http = (
        "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n\r\n"
    ).encode() + html.encode()
    W.write_warc(
        str(tmp_path / "c.warc.gz"),
        [{"warc_type": "response", "target_uri": "https://x/d", "payload": http}],
    )
    docs = (
        W.read_warc(spark, str(tmp_path / "c.warc.gz"))
        .where(F.col("http_status") == 200)
        .select(
            "target_uri",
            html_to_text(F.decode(F.col("body"), "UTF-8")).alias("text"),
        )
    )
    r = docs.first()
    assert r["text"] == "Doc\ncrawled & extracted"


def test_strip_invisible_and_hygiene_stats(spark):
    from pyspark.sql import functions as F

    from lantern_extras_spark.functions.text import hygiene_stats, strip_invisible

    poisoned = "zero​width nb sp bidi‪X soft­hyphen bad� ctl\x07 thin sp"
    df = spark.createDataFrame([(1, poisoned), (2, "clean text"), (3, None)],
                               "id long, t string")
    stats = hygiene_stats(F.col("t"))
    out = df.select(
        "id", strip_invisible("t").alias("c"),
        *[expr.alias(k) for k, expr in stats.items()],
    )
    got = {r["id"]: r for r in out.collect()}
    r = got[1]
    assert r["c"] == "zerowidth nb sp bidiX softhyphen bad� ctl\x07 thin sp"
    assert r["n_invisible"] == 3 and r["n_exotic_space"] == 2
    assert r["n_replacement"] == 1 and r["n_control"] == 1
    assert got[2]["c"] == "clean text" and got[2]["n_invisible"] == 0
    assert got[3]["c"] is None


def test_fix_mojibake(spark):
    from pyspark.sql import functions as F

    from lantern_extras_spark.functions.text import fix_mojibake, fix_mojibake_py

    broken = "café".encode("utf-8").decode("latin-1")       # 'cafÃ©'
    double = broken.encode("utf-8").decode("latin-1")       # doubly mangled
    curly = "it’s".encode("utf-8").decode("cp1252")         # cp1252 mojibake
    assert fix_mojibake_py(broken) == "café"
    assert fix_mojibake_py(double) == "café"
    assert fix_mojibake_py(curly) == "it’s"
    # healthy text untouched, including text that LOOKS non-ascii but is fine
    for ok in ("plain ascii", "café déjà vu", "日本語のテキスト", ""):
        assert fix_mojibake_py(ok) == ok
    df = spark.createDataFrame([(1, broken), (2, "café"), (3, None)], "id long, t string")
    got = {r["id"]: r["f"] for r in df.select("id", fix_mojibake("t").alias("f")).collect()}
    assert got == {1: "café", 2: "café", 3: None}
