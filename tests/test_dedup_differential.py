"""Randomized differential tests: dedup_paragraphs and dedup_spans vs
independent brute-force Python references on generated corpora. The Spark
implementations are window/groupBy/HOF expression pipelines with subtle
semantics (first-occurrence tie-break, interval merge, eligibility rules) —
a second implementation from the spec is the strongest guard against
expression-level bugs the curated fixtures miss."""

import hashlib
import re as pyre

import pytest
from hypothesis import given, settings, strategies as st

from lantern_extras_spark.operators import dedup as D

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "x1", "y2"]

PARA = st.lists(st.sampled_from(WORDS), min_size=0, max_size=6).map(" ".join)
DOC = st.lists(PARA, min_size=1, max_size=5).map("\n".join)


def ref_dedup_paragraphs(texts, min_chars):
    """Spec: corpus-global; a trimmed unit >= min_chars keeps only its first
    (doc_order, pos) occurrence; shorter/blank units always survive."""
    seen = set()
    out = []
    for text in texts:
        kept, dropped = [], 0
        for u in text.split("\n"):
            norm = u.strip()
            if len(norm) >= min_chars:
                if norm in seen:
                    dropped += 1
                    continue
                seen.add(norm)
            kept.append(u)
        out.append(("\n".join(kept), dropped))
    return out


def ref_dedup_spans(texts, span):
    """Spec: token windows of `span`; non-first occurrences flag [p, p+span);
    flagged token positions removed; docs shorter than span untouched."""
    def toks(s):
        t = s.strip()
        return [] if t == "" else pyre.split(r"\s+", t)

    seen = {}
    flagged = []  # per doc: set of flagged starts (0-based)
    all_toks = [toks(t) for t in texts]
    for d, tk in enumerate(all_toks):
        f = set()
        for p in range(0, max(len(tk) - span + 1, 0)):
            w = " ".join(tk[p:p + span])
            h = hashlib.md5(w.encode()).hexdigest()[:15]
            if h in seen and seen[h] != (d, p):
                f.add(p)
            else:
                seen.setdefault(h, (d, p))
        flagged.append(f)
    out = []
    for d, tk in enumerate(all_toks):
        removed = set()
        for p in flagged[d]:
            removed.update(range(p, p + span))
        kept = [t for i, t in enumerate(tk) if i not in removed]
        out.append((" ".join(kept), len(tk) - len(kept)))
    return out


@given(st.lists(DOC, min_size=1, max_size=6))
@settings(max_examples=12, deadline=None)
def test_dedup_paragraphs_matches_reference(spark, docs_texts):
    min_chars = 8
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_paras_dropped"])
        for r in D.dedup_paragraphs(df, min_chars=min_chars).collect()
    }
    want = ref_dedup_paragraphs(docs_texts, min_chars)
    for i, w in enumerate(want):
        assert got[i] == w, (i, docs_texts[i], got[i], w)


@given(st.lists(st.lists(st.sampled_from(WORDS), min_size=0, max_size=14).map(" ".join),
                min_size=1, max_size=5))
@settings(max_examples=12, deadline=None)
def test_dedup_spans_matches_reference(spark, docs_texts):
    span = 4
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_texts)], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: (r["text_dedup"], r["n_tokens_removed"])
        for r in D.dedup_spans(df, span=span).collect()
    }
    want = ref_dedup_spans(docs_texts, span)
    for i, w in enumerate(want):
        assert got[i] == w, (i, docs_texts[i], got[i], w)
