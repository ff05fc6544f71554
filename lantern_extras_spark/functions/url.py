"""URL primitives for web-corpus pipelines — native Column expressions only.

Web-scale training corpora dedup and filter BY URL before touching document
bytes (the cheapest dedup there is: CommonCrawl re-crawls the same page under
trivially-different URLs constantly). These helpers provide the deterministic,
engine-portable canonical form that makes `groupBy(canonical_url)` meaningful.

All regexes stay in the Java-regex ∩ RE2 subset so the DuckDB oracle replays
the identical chain (`q_url_canonical`). Registrable-domain (eTLD+1)
extraction needs the public-suffix list and is deliberately out of scope —
`url_domain` returns the full lowercased host.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.\-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://([^/?#]*)"


def _c(c: Column | str) -> Column:
    return F.col(c) if isinstance(c, str) else c


def url_host(c: Column | str) -> Column:
    """Lowercased host (authority) of an absolute URL; '' when no scheme."""
    return F.lower(F.regexp_extract(_c(c), _HOST_RE, 1))


def url_domain(c: Column | str) -> Column:
    """`url_host` minus a leading `www.` and any `:port` — the grouping key
    for per-site operations (boilerplate removal, crawl budgets, blocklists).
    """
    h = url_host(c)
    h = F.regexp_replace(h, r"^www\.", "")
    return F.regexp_replace(h, r":[0-9]+$", "")


def canonicalize_url(c: Column | str) -> Column:
    """Deterministic canonical form for URL-level dedup:

    1. trim surrounding whitespace,
    2. drop the fragment (`#…` never reaches the server),
    3. lowercase the scheme and host (path/query stay case-sensitive per
       RFC 3986),
    4. strip a leading `www.` and a default port (`:80` http, `:443` https),
    5. strip trailing slashes (also applies to a rare `?q=v/` query tail —
       documented trade-off for keeping the chain one native expression).

    `https://WWW.Example.COM:443/Path/?x=1#frag` →
    `https://example.com/Path/?x=1` → … → `https://example.com/Path/?x=1`.
    Inputs without a scheme pass through steps 1/2/5 unchanged (no guessing).
    """
    u = F.trim(_c(c))
    u = F.regexp_replace(u, r"#.*", "")          # 2: fragment
    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    host = url_host(u)
    host = F.regexp_replace(host, r"^www\.", "")
    # default ports only; a real :8080 survives
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(
        F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)
    )
    # everything after the authority (path + query), untouched case
    tail = F.regexp_replace(u, r"^[A-Za-z][A-Za-z0-9+.\-]*://[^/?#]*", "")
    rebuilt = F.when(scheme == "", u).otherwise(F.concat(scheme, F.lit("://"), host, tail))
    return F.regexp_replace(rebuilt, r"/+$", "")  # 5: trailing slashes
