"""Deterministic split/sampling: stability, fraction accuracy, disjointness."""

import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.operators import sampling as SMP


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(i, f"doc {i}", ["en", "de"][i % 2]) for i in range(2000)],
        "doc_id long, text string, lang string",
    )


def test_hash_split_fractions_and_stability(docs):
    out = SMP.hash_split(docs).cache()
    counts = {r["split"]: r["n"] for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == {"train", "eval", "test"}
    assert counts["train"] / 2000 == pytest.approx(0.9, abs=0.03)
    assert counts["eval"] / 2000 == pytest.approx(0.05, abs=0.02)
    # every row labeled exactly once; re-run identical (no RNG anywhere)
    assert out.count() == 2000
    again = {r["doc_id"]: r["split"] for r in SMP.hash_split(docs).collect()}
    first = {r["doc_id"]: r["split"] for r in out.collect()}
    assert again == first
    out.unpersist()


def test_hash_split_salt_decorrelates(docs):
    a = {r["doc_id"]: r["split"] for r in SMP.hash_split(docs, salt="exp1").collect()}
    b = {r["doc_id"]: r["split"] for r in SMP.hash_split(docs, salt="exp2").collect()}
    assert a != b  # different experiment, different (uncorrelated) split
    # but each is internally consistent in fractions
    assert sum(v == "train" for v in b.values()) / 2000 == pytest.approx(0.9, abs=0.03)


def test_hash_split_validates_fractions(docs):
    with pytest.raises(ValueError):
        SMP.hash_split(docs, splits={"a": 0.9, "b": 0.2})


def test_stratified_take_exact_group_sizes(docs):
    out = SMP.stratified_take(docs, ("lang",), 5).collect()
    by_lang: dict[str, list] = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["doc_id"])
    assert {k: len(v) for k, v in by_lang.items()} == {"en": 5, "de": 5}
    # deterministic: same ids every run
    again = sorted(r["doc_id"] for r in SMP.stratified_take(docs, ("lang",), 5).collect())
    assert again == sorted(r["doc_id"] for r in out)


def test_pack_sequences_invariants(spark):
    from lantern_extras_spark.operators.sampling import pack_sequences

    rows = [(i, "tok " * (5 + (i * 7) % 40)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = pack_sequences(df, max_tokens=50, n_buckets=1).collect()
    assert len(out) == 60 and len({r["doc_id"] for r in out}) == 60
    # replaying the (bin, pos) order must reproduce every bin boundary:
    # bin == floor(exclusive-prefix / max_tokens) at each step
    running = 0
    for r in sorted(out, key=lambda r: (r["bin"], r["pos"])):
        assert r["bin"] == running // 50, (r, running)
        running += r["n_tokens"]
    # deterministic across calls
    again = pack_sequences(df, max_tokens=50, n_buckets=1).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, out))
    # bucketed variant covers every doc exactly once too
    b = pack_sequences(df, max_tokens=50, n_buckets=4).collect()
    assert len({r["doc_id"] for r in b}) == 60
    assert {r["bucket"] for r in b} <= set(range(4))
    import pytest as _pt
    with _pt.raises(ValueError, match="max_tokens"):
        pack_sequences(df, max_tokens=0)


def test_pack_sequences_concat_materializes_sequences(spark):
    """pack_sequences_concat = pack_sequences assignments joined back to text:
    membership, pack order, token totals, and the concatenated string must all
    agree with a driver-side replay of the assignment table."""
    from lantern_extras_spark.operators.sampling import pack_sequences, pack_sequences_concat

    rows = [(i, f"d{i} " + "tok " * (5 + (i * 7) % 40)) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    asg = pack_sequences(df, max_tokens=50, n_buckets=4).collect()
    packed = pack_sequences_concat(df, max_tokens=50, n_buckets=4).collect()
    text_of = dict(rows)
    expect: dict[tuple, list] = {}
    for r in sorted(asg, key=lambda r: (r["bucket"], r["bin"], r["pos"])):
        expect.setdefault((r["bucket"], r["bin"]), []).append(r)
    assert len(packed) == len(expect)
    for p in packed:
        members = expect[(p["bucket"], p["bin"])]
        assert p["doc_ids"] == [m["doc_id"] for m in members]
        assert p["n_docs"] == len(members)
        assert p["n_tokens"] == sum(m["n_tokens"] for m in members)
        assert p["text"] == " ".join(text_of[m["doc_id"]] for m in members)
    # every doc appears in exactly one sequence
    all_ids = [i for p in packed for i in p["doc_ids"]]
    assert sorted(all_ids) == list(range(60))
