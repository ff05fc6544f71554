"""URL canonicalization primitives (functions/url.py)."""

import pytest

from lantern_extras_spark.functions.url import canonicalize_url, url_domain, url_host


CASES = [
    ("https://WWW.Example.COM:443/Path/?x=1#frag", "https://example.com/Path/?x=1"),
    ("http://example.com:80/", "http://example.com"),
    ("http://example.com:8080/a", "http://example.com:8080/a"),  # real port kept
    ("https://example.com/a/b///", "https://example.com/a/b"),
    ("  https://example.com/a  ", "https://example.com/a"),
    ("HTTPS://API.Example.com/V1/Items?Q=Abc", "https://api.example.com/V1/Items?Q=Abc"),
    ("ftp://Files.example.org/pub/", "ftp://files.example.org/pub"),
    ("no-scheme/path/#frag", "no-scheme/path"),  # passthrough: trim/fragment/slash only
    ("", ""),
]


def test_canonicalize_url(spark):
    df = spark.createDataFrame([(i, u) for i, (u, _) in enumerate(CASES)], "i long, u string")
    got = [r["c"] for r in df.select("i", canonicalize_url("u").alias("c")).orderBy("i").collect()]
    assert got == [want for _, want in CASES]


def test_url_host_and_domain(spark):
    rows = [
        (1, "https://WWW.Example.COM:8443/x"),
        (2, "http://sub.site.org/y"),
        (3, "not a url"),
    ]
    df = spark.createDataFrame(rows, "i long, u string")
    out = {r["i"]: (r["h"], r["d"]) for r in df.select(
        "i", url_host("u").alias("h"), url_domain("u").alias("d")).collect()}
    assert out[1] == ("www.example.com:8443", "example.com")
    assert out[2] == ("sub.site.org", "sub.site.org")
    assert out[3] == ("", "")


def test_canonical_dedup_groups(spark):
    """The whole point: trivially-different crawls of one page share a key."""
    variants = [
        "https://www.example.com/article/",
        "https://example.com/article",
        "HTTPS://EXAMPLE.COM/article#comments",
        "https://example.com:443/article",
    ]
    df = spark.createDataFrame([(i, u) for i, u in enumerate(variants)], "i long, u string")
    keys = {r["c"] for r in df.select(canonicalize_url("u").alias("c")).collect()}
    assert keys == {"https://example.com/article"}
