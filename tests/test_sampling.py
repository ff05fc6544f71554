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


def test_quota_sample_budget_semantics(spark):
    df = spark.createDataFrame(
        [(i, "w " * 10, "s0") for i in range(20)] + [(100, "single doc", "s1")],
        "doc_id long, text string, source string",
    )
    # each s0 doc has 10 tokens; budget 35 -> kept while prefix < 35: 4 docs
    # (prefixes 0,10,20,30), the 4th crosses the line and is the last kept
    kept = SMP.quota_sample(df, token_budget=35).collect()
    s0 = [r for r in kept if r["source"] == "s0"]
    assert len(s0) == 4
    assert max(r["cum_tokens"] for r in s0) == 40          # overshoot < one doc
    assert sorted(r["quota_rank"] for r in s0) == [1, 2, 3, 4]
    # a non-empty group always keeps >= 1 doc, even when one doc > budget
    s1 = [r for r in kept if r["source"] == "s1"]
    assert len(s1) == 1
    # deterministic: same seed, same kept set
    again = {r["doc_id"] for r in SMP.quota_sample(df, token_budget=35).collect()}
    assert {r["doc_id"] for r in kept} == again
    with pytest.raises(ValueError, match="token_budget"):
        SMP.quota_sample(df, token_budget=0)


def test_mixture_weights_and_resample(spark):
    # s0: 4 docs x 5 tokens = 20; s1: 2 docs x 10 tokens = 20; total 40
    df = spark.createDataFrame(
        [(i, "a b c d e", "s0") for i in range(4)]
        + [(10 + i, "a b c d e f g h i j", "s1") for i in range(2)]
        + [(20, "dropped entirely", "s2")],
        "doc_id long, text string, source string",
    )
    w = {r["source"]: r for r in SMP.mixture_weights(df, {"s0": 0.75, "s1": 0.25}).collect()}
    assert w["s0"]["n_tokens"] == 20 and w["s1"]["n_tokens"] == 20
    total = 20 + 20 + 2  # s2 has 2 tokens
    assert w["s0"]["weight"] == pytest.approx(0.75 * total / 20, abs=1e-6)
    assert w["s2"]["target_share"] == 0.0 and w["s2"]["weight"] == 0.0
    out = SMP.resample_mixture(df, {"s0": 0.75, "s1": 0.25})
    rows = out.collect()
    # s2 (weight 0) vanishes; every emitted row carries a 1-based copy index
    assert {r["source"] for r in rows} == {"s0", "s1"}
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["copy"])
    for doc, copies in per_doc.items():
        assert sorted(copies) == list(range(1, len(copies) + 1))
    # integer part of the weight is a guaranteed floor on copies per doc
    import math
    w0 = w["s0"]["weight"]
    for doc in (0, 1, 2, 3):
        assert len(per_doc.get(doc, [])) >= math.floor(w0)
    # deterministic across runs
    again = sorted((r["doc_id"], r["copy"]) for r in SMP.resample_mixture(df, {"s0": 0.75, "s1": 0.25}).collect())
    assert sorted((r["doc_id"], r["copy"]) for r in rows) == again
    with pytest.raises(ValueError, match="non-empty"):
        SMP.mixture_weights(df, {})


def test_pack_sequences_bpe_counter(spark):
    df = spark.createDataFrame(
        [(1, "plain words here"), (2, "a-b.c=d!e,f")],   # 3 ws tokens vs 11 bpe
        "doc_id long, text string",
    )
    ws = {r["doc_id"]: r["n_tokens"] for r in SMP.pack_sequences(df, n_buckets=1).collect()}
    bpe = {r["doc_id"]: r["n_tokens"]
           for r in SMP.pack_sequences(df, n_buckets=1, counter="bpe").collect()}
    assert ws[1] == 3 and ws[2] == 1
    assert bpe[1] == 3 and bpe[2] == 11
    with pytest.raises(ValueError, match="counter"):
        SMP.pack_sequences(df, counter="chars")


def test_leakage_safe_split_clusters_never_straddle(spark):
    """The invariant the operator exists for: every near-dup pair lands in ONE
    split, while singletons still follow the hash fractions."""
    from lantern_extras_spark.operators import dedup as D
    from lantern_extras_spark.operators.sampling import hash_split, leakage_safe_split

    base = "the quick brown fox jumps over the lazy dog tonight again"
    rows = []
    for i in range(0, 200, 2):          # 100 near-dup pairs (i, i+1)
        rows.append((i, base + f" variant {i}"))
        rows.append((i + 1, base + f" variant {i}"))
    rows += [(1000 + i, f"unique document number {i} about topic {i*7}") for i in range(50)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = D.minhash_dedup(docs, n_hashes=32, bands=8, threshold=0.8)
    assert pairs.count() >= 100          # the constructed dups are found

    out = leakage_safe_split(docs, pairs, splits={"train": 0.5, "test": 0.5})
    sp = {r["doc_id"]: (r["split"], r["split_key"]) for r in out.collect()}
    for r in pairs.collect():
        assert sp[r["id_a"]] == sp[r["id_b"]], (r["id_a"], r["id_b"])
    # contrast: the naive per-doc split DOES straddle some pair (p=0.5 each)
    naive = {r["doc_id"]: r["split"] for r in
             hash_split(docs, splits={"train": 0.5, "test": 0.5}).collect()}
    assert any(naive[r["id_a"]] != naive[r["id_b"]] for r in pairs.collect())
    # singletons keep their own id as key and spread across both splits
    single = {k: v for k, v in sp.items() if k >= 1000}
    assert {v[0] for v in single.values()} == {"train", "test"}
    assert all(v[1] == str(k) for k, v in single.items())


def test_sampled_percentiles_exact_below_k(spark):
    """n <= k: the sample IS the corpus, so estimates equal exact discrete
    quantiles (value at rank ceil(q*n) of the sorted values)."""
    import math

    vals = [(i, float((i * 37) % 100)) for i in range(200)]
    df = spark.createDataFrame(vals, "doc_id long, v double")
    out = {r["prob"]: r for r in
           SMP.sampled_percentiles(df, "v", probs=(0.25, 0.5, 0.99),
                                   id_col="doc_id", k=4096).collect()}
    s = sorted(v for _, v in vals)
    for q in (0.25, 0.5, 0.99):
        assert out[q]["estimate"] == s[max(1, math.ceil(q * len(s))) - 1]
        assert out[q]["n_sample"] == 200 and out[q]["n_rows"] == 200


def test_sampled_percentiles_accuracy_and_determinism(spark):
    """Past the budget: rank error of the estimate stays within ~4 sigma of
    sqrt(q(1-q)/m); two runs return identical rows (hash sample, no RNG)."""
    import bisect
    import math

    n, k = 20000, 512
    vals = [(i, float((i * 2654435761) % 1000003)) for i in range(n)]
    df = spark.createDataFrame(vals, "doc_id long, v double").repartition(8)
    rows = SMP.sampled_percentiles(df, "v", probs=(0.5, 0.9), id_col="doc_id",
                                   k=k).collect()
    s = sorted(v for _, v in vals)
    out = {r["prob"]: r for r in rows}
    m = out[0.5]["n_sample"]
    assert 0.5 * k < m < 2 * k          # sample size near budget
    for q in (0.5, 0.9):
        rank = bisect.bisect_right(s, out[q]["estimate"]) / n
        assert abs(rank - q) < 4 * math.sqrt(q * (1 - q) / m), (q, rank, m)
    again = SMP.sampled_percentiles(df, "v", probs=(0.5, 0.9),
                                    id_col="doc_id", k=k).collect()
    assert sorted(map(tuple, again)) == sorted(map(tuple, rows))

    with pytest.raises(ValueError, match="probs"):
        SMP.sampled_percentiles(df, "v", probs=(0.0,))
    with pytest.raises(ValueError, match="k must be"):
        SMP.sampled_percentiles(df, "v", k=4)


def test_mixture_order_prefix_proportions(spark):
    """Sorting by order_key interleaves sources: every reasonably sized
    prefix of the stream carries sources near n_s*w_s proportions (the
    property a per-source shuffle + concat fails catastrophically)."""
    rows = [(i, "a" if i % 2 == 0 else "b") for i in range(4000)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    out = SMP.mixture_order(df, {"a": 3.0, "b": 1.0}, id_col="doc_id")
    ordered = [r["source"] for r in out.orderBy("order_key").collect()]
    # expected share of 'a' among emitted rows: 3/(3+1) while 'a' lasts
    for frac in (0.1, 0.25, 0.5):
        k = int(len(ordered) * frac)
        share_a = ordered[:k].count("a") / k
        assert abs(share_a - 0.75) < 0.07, (frac, share_a)
    # determinism + zero-weight drop
    again = [r["source"] for r in out.orderBy("order_key").collect()]
    assert again == ordered
    only_a = SMP.mixture_order(df, {"a": 1.0}, id_col="doc_id")
    assert only_a.where("source = 'b'").count() == 0
    with pytest.raises(ValueError, match="weights"):
        SMP.mixture_order(df, {})
    with pytest.raises(ValueError, match="weights"):
        SMP.mixture_order(df, {"a": -1.0})


def test_pack_sequences_exact_bpe_counts(spark):
    """counter="exact" budgets by TRUE byte-level BPE counts under a
    TRAINED vocab (r7 verdict item 7): every doc's n_tokens equals
    Bpe(merges).count(text) exactly, and bin assignment replays the
    contiguous-prefix rule over those exact counts."""
    from lantern_extras_spark.functions.bpe import Bpe, train_bpe_on_corpus

    rows = [(i, ("the quick brown fox " * (1 + i % 5)).strip()) for i in range(60)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    merges = train_bpe_on_corpus(df, n_merges=40, sample_docs=60)
    enc = Bpe(merges)
    texts = dict(rows)

    out = SMP.pack_sequences(df, max_tokens=32, n_buckets=4,
                             counter="exact", merges=merges).collect()
    assert len(out) == 60
    for r in out:
        assert r["n_tokens"] == enc.count(texts[r["doc_id"]]), r["doc_id"]

    # replay the packing: within each bucket, order by (hash, id); bin =
    # floor(exclusive prefix / max_tokens)
    from lantern_extras_spark.operators.sampling import hash32  # noqa: F401
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r)
    got_pairs = {(r["doc_id"]): (r["bucket"], r["bin"], r["pos"]) for r in out}
    for b, rs in by_bucket.items():
        # pos is 1-based within (bucket, bin) and dense
        bins = {}
        for r in rs:
            bins.setdefault(r["bin"], []).append(r["pos"])
        for _, poss in bins.items():
            assert sorted(poss) == list(range(1, len(poss) + 1))
    # a packed sequence's total exact tokens stays near the budget: every
    # bin except possibly the last of its bucket must be non-empty and the
    # concat totals must equal the sum of member counts (exactness pins the
    # budget arithmetic end to end)
    seqs = SMP.pack_sequences_concat(df, max_tokens=32, n_buckets=4,
                                     counter="exact", merges=merges).collect()
    for s in seqs:
        member_total = sum(enc.count(texts[i]) for i in s["doc_ids"])
        assert s["n_tokens"] == member_total


def test_split_contamination_report_gates_leakage(spark):
    """The audit's contract: a naive per-doc hash_split leaks planted
    near-dup pairs across the boundary (report non-empty); the
    leakage-safe cluster-keyed split yields a ZERO-row report — the
    checkable release gate."""
    from lantern_extras_spark.operators.dedup import minhash_dedup

    base = ("the quick brown fox jumps over the lazy dog while rain falls "
            "on the quiet grey town and the trains hum through the night")
    rows = []
    for i in range(40):
        # pairs (2i, 2i+1): near-duplicates with a one-word edit + unique tail
        a = base + f" unique tail marker number {i}"
        b = base.replace("quick", "swift") + f" unique tail marker number {i}"
        rows.append((2 * i, a))
        rows.append((2 * i + 1, b))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = minhash_dedup(docs, threshold=0.5)
    assert pairs.count() >= 20  # the planted pairs are found

    naive = SMP.hash_split(docs, splits={"train": 0.5, "test": 0.5})
    leaky = SMP.split_contamination_report(naive, pairs)
    assert leaky.count() > 0  # ~half the pairs straddle a 50/50 id-hash split

    safe = SMP.leakage_safe_split(docs, pairs, splits={"train": 0.5, "test": 0.5})
    clean = SMP.split_contamination_report(safe, pairs)
    assert clean.count() == 0
    # summary mode aggregates crossings per (split_a, split_b)
    summ = SMP.split_contamination_report(naive, pairs, summary=True).collect()
    assert sum(r["n_pairs"] for r in summ) == leaky.count()
    assert all(r["max_jaccard"] >= 0.5 for r in summ)


def test_mixture_plan_binding_and_caps(spark):
    from lantern_extras_spark.operators.sampling import mixture_plan

    # a: 100 tokens, b: 50 tokens, c: not in target
    rows = (
        [(i, "a", "tok " * 10) for i in range(10)]
        + [(100 + i, "b", "tok " * 10) for i in range(5)]
        + [(200, "c", "tok tok")]
    )
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    out = {r["source"]: r for r in mixture_plan(df, {"a": 0.5, "b": 0.5}, max_epochs=2.0).collect()}
    # T = min(100*2/0.5, 50*2/0.5) = 200 -> a: 100 planned (1 epoch),
    # b: 100 planned (2 epochs, the binding constraint)
    assert out["a"]["planned_tokens"] == 100 and abs(out["a"]["epochs"] - 1.0) < 1e-9
    assert out["b"]["planned_tokens"] == 100 and abs(out["b"]["epochs"] - 2.0) < 1e-9
    assert out["b"]["binding"] and not out["a"]["binding"]
    # non-target group: zeroed, never binding
    assert out["c"]["target_share"] == 0.0 and out["c"]["planned_tokens"] == 0
    assert not out["c"]["binding"]
    # the cap is a cap
    assert all(r["epochs"] <= 2.0 + 1e-9 for r in out.values())


def test_mixture_plan_validation(spark):
    from lantern_extras_spark.operators.sampling import mixture_plan

    df = spark.createDataFrame([(1, "a", "x")], "doc_id long, source string, text string")
    import pytest as _pt

    with _pt.raises(ValueError):
        mixture_plan(df, {})
    with _pt.raises(ValueError):
        mixture_plan(df, {"a": -0.1})
    with _pt.raises(ValueError):
        mixture_plan(df, {"a": 1.0}, max_epochs=0)


def test_soft_dedup_weights_sum_to_one_per_cluster(spark):
    from lantern_extras_spark.operators.sampling import soft_dedup_weights

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(1, 8)], "doc_id long, text string"
    )
    # one 3-chain (1-2-3 via transitive pairs), one 2-cluster (5,6)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (5, 6)], "id_a long, id_b long"
    )
    out = {r["doc_id"]: r for r in soft_dedup_weights(docs, pairs).collect()}
    assert len(out) == 7  # row-preserving
    # transitive chain -> one cluster of 3, min-id label
    assert [out[i]["cluster_id"] for i in (1, 2, 3)] == [1, 1, 1]
    assert all(abs(out[i]["sample_weight"] - 1 / 3) < 1e-6 for i in (1, 2, 3))
    assert out[5]["cluster_id"] == 5 and out[6]["cluster_id"] == 5
    assert all(abs(out[i]["sample_weight"] - 0.5) < 1e-6 for i in (5, 6))
    # singletons: own id, full weight
    assert out[4]["cluster_id"] == 4 and out[4]["sample_weight"] == 1.0
    assert out[7]["cluster_size"] == 1
    # every cluster's weights sum to 1 (the mass-conservation contract)
    from collections import defaultdict

    mass = defaultdict(float)
    for r in out.values():
        mass[r["cluster_id"]] += r["sample_weight"]
    assert all(abs(m - 1.0) < 1e-5 for m in mass.values())


def test_weighted_reservoir_exact_n_and_deterministic(spark, docs):
    from lantern_extras_spark.functions.text import token_count
    from lantern_extras_spark.operators.sampling import weighted_reservoir

    d = docs.withColumn("n_tokens", token_count("text"))
    s1 = weighted_reservoir(d, 15, "n_tokens")
    s2 = weighted_reservoir(d, 15, "n_tokens")
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert len(ids1) == 15
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())
    # a different seed draws a different sample
    s3 = weighted_reservoir(d, 15, "n_tokens", seed="other")
    assert ids1 != sorted(r["doc_id"] for r in s3.collect())


def test_weighted_reservoir_excludes_nonpositive_weights(spark):
    from lantern_extras_spark.operators.sampling import weighted_reservoir

    df = spark.createDataFrame(
        [(1, 1.0), (2, 0.0), (3, -5.0), (4, None), (5, 2.0)],
        "doc_id bigint, w double",
    )
    got = sorted(r["doc_id"] for r in weighted_reservoir(df, 10, "w").collect())
    assert got == [1, 5]


def test_weighted_reservoir_is_weight_proportional(spark):
    """A-ES correctness: one heavy item (w=200) among 100 light ones (w=1)
    should be drawn in nearly every seed; statistically, P(miss) per draw of
    n=20 is tiny. Run 25 seeds and require >= 24 hits."""
    from lantern_extras_spark.operators.sampling import weighted_reservoir

    rows = [(0, 200.0)] + [(i, 1.0) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id bigint, w double").coalesce(2)
    hits = 0
    for s in range(25):
        ids = {r["doc_id"] for r in weighted_reservoir(df, 20, "w", seed=f"s{s}").collect()}
        assert len(ids) == 20
        hits += 0 in ids
    assert hits >= 24


def test_weighted_reservoir_per_group_cap(spark, docs):
    from lantern_extras_spark.functions.text import token_count
    from lantern_extras_spark.operators.sampling import weighted_reservoir
    from pyspark.sql import functions as F

    d = docs.withColumn("n_tokens", token_count("text"))
    out = weighted_reservoir(d, 5, "n_tokens", group_col="lang")
    per = out.groupBy("lang").count().collect()
    assert all(r["count"] <= 5 for r in per)
    assert out.count() == sum(min(5, c) for c in
                              (r["count"] for r in d.where("n_tokens > 0").groupBy("lang").count().collect()))


def test_weighted_reservoir_validates_n(spark, docs):
    from lantern_extras_spark.operators.sampling import weighted_reservoir

    import pytest as _pytest
    with _pytest.raises(ValueError):
        weighted_reservoir(docs, 0, "n_chars")


def test_temperature_weights_alpha_one_is_natural_mixture(spark, docs):
    from lantern_extras_spark.operators.sampling import temperature_weights

    out = temperature_weights(docs, alpha=1.0).collect()
    for r in out:
        assert r["weight"] == pytest.approx(1.0, abs=1e-6)
        assert r["temp_share"] == pytest.approx(r["actual_share"], abs=1e-6)


def test_temperature_weights_alpha_zero_is_uniform(spark, docs):
    from lantern_extras_spark.operators.sampling import temperature_weights

    out = temperature_weights(docs, alpha=0.0).collect()
    n_groups = len(out)
    for r in out:
        assert r["temp_share"] == pytest.approx(1.0 / n_groups, abs=1e-6)


def test_temperature_weights_upsamples_low_resource(spark):
    from lantern_extras_spark.operators.sampling import temperature_weights

    rows = [(i, "many tokens " * 20, "en") for i in range(90)]
    rows += [(1000 + i, "few words", "mi") for i in range(10)]
    skewed = spark.createDataFrame(rows, "doc_id long, text string, lang string")
    out = temperature_weights(skewed, alpha=0.5).collect()
    assert sum(r["temp_share"] for r in out) == pytest.approx(1.0, abs=1e-6)
    smallest = min(out, key=lambda r: r["n_tokens"])
    largest = max(out, key=lambda r: r["n_tokens"])
    assert smallest["lang"] == "mi" and largest["lang"] == "en"
    assert smallest["weight"] > 1.0 > largest["weight"]
    # the smoothing narrows the gap but preserves the order
    assert smallest["temp_share"] < largest["temp_share"]
    assert smallest["temp_share"] > smallest["actual_share"]


def test_temperature_weights_validates_alpha(spark, docs):
    from lantern_extras_spark.operators.sampling import temperature_weights

    with pytest.raises(ValueError):
        temperature_weights(docs, alpha=1.5)
