"""Unit + property tests for operators/sketches.py (Count-Min sketch):
one-sided error (est >= exact, always), mergeability (shard sketches add to
the whole-corpus sketch cell-for-cell), weighted-build linearity, bounded
cell count, and engine/pure-Python hash parity. The hypothesis test runs the
CMS guarantee over a pure-Python replica of the md5 cell hashing (the same
replica strategy as the bloom property tests) so random multisets don't pay
a Spark job per example."""

import hashlib
from collections import Counter

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from lantern_extras_spark.operators import sketches as SK

DEPTH, WIDTH = 4, 64


def py_bucket(key: str, r: int, width: int) -> int:
    """Pure-Python replica of hash32(key, seed=f'cms{r}') % width."""
    return int(hashlib.md5(f"cms{r}:{key}".encode()).hexdigest()[:8], 16) % width


def py_sketch(keys: list[str], depth: int, width: int) -> Counter:
    cells: Counter = Counter()
    for k in keys:
        for r in range(depth):
            cells[(r, py_bucket(k, r, width))] += 1
    return cells


def py_estimate(cells: Counter, key: str, depth: int, width: int) -> int:
    return min(cells.get((r, py_bucket(key, r, width)), 0) for r in range(depth))


@pytest.fixture(scope="module")
def words(spark):
    # skewed multiset: word i appears i times (w1 x1 ... w20 x20)
    rows = [(f"w{i}",) for i in range(1, 21) for _ in range(i)]
    df = spark.createDataFrame(rows, "token string").cache()
    df.count()
    return df


def test_sketch_matches_python_replica(spark, words):
    cells = {
        (r["r"], r["b"]): r["c"]
        for r in SK.cms_build(words, "token", DEPTH, WIDTH).collect()
    }
    keys = [r["token"] for r in words.distinct().collect()]
    want = py_sketch([r["token"] for r in words.collect()], DEPTH, WIDTH)
    assert cells == dict(want)
    assert len(cells) <= DEPTH * WIDTH


def test_estimate_one_sided_and_exact_when_unaliased(spark, words):
    sk = SK.cms_build(words, "token", DEPTH, WIDTH)
    keys = words.distinct()
    est = {
        r["token"]: r["cms_est"]
        for r in SK.cms_estimate(sk, keys, "token", DEPTH, WIDTH).collect()
    }
    exact = {f"w{i}": i for i in range(1, 21)}
    for k, n in exact.items():
        assert est[k] >= n, k  # CMS never undercounts


def test_absent_key_estimates_from_zero_floor(spark, words):
    sk = SK.cms_build(words, "token", DEPTH, WIDTH)
    keys = spark.createDataFrame([("never-seen-key-xyz",)], "token string")
    [row] = SK.cms_estimate(sk, keys, "token", DEPTH, WIDTH).collect()
    # may collide into occupied cells, but is bounded by the heaviest cell
    # and can reach the 0 floor via the left join's coalesce
    assert 0 <= row["cms_est"] <= sum(range(1, 21))


def test_merge_equals_whole(spark, words):
    a = words.where(F.col("token") <= "w2")  # lexicographic split
    b = words.where(F.col("token") > "w2")
    merged = SK.cms_merge(
        SK.cms_build(a, "token", DEPTH, WIDTH),
        SK.cms_build(b, "token", DEPTH, WIDTH),
    )
    whole = SK.cms_build(words, "token", DEPTH, WIDTH)
    as_map = lambda df: {(r["r"], r["b"]): r["c"] for r in df.collect()}
    assert as_map(merged) == as_map(whole)


def test_weighted_build_linearity(spark, words):
    pre = words.groupBy("token").agg(F.count("*").alias("n"))
    weighted = SK.cms_build(pre, "token", DEPTH, WIDTH, weight_col="n")
    plain = SK.cms_build(words, "token", DEPTH, WIDTH)
    as_map = lambda df: {(r["r"], r["b"]): r["c"] for r in df.collect()}
    assert as_map(weighted) == as_map(plain)


def test_rejects_degenerate_shape(spark, words):
    with pytest.raises(ValueError):
        SK.cms_build(words, "token", depth=0, width=16)
    with pytest.raises(ValueError):
        SK.cms_build(words, "token", depth=2, width=0)


@settings(max_examples=60, deadline=None)
@given(
    keys=st.lists(st.text(alphabet="abcdef", min_size=1, max_size=4), min_size=1, max_size=120),
    width=st.integers(min_value=4, max_value=128),
)
def test_property_cms_never_undercounts(keys, width):
    depth = 3
    cells = py_sketch(keys, depth, width)
    exact = Counter(keys)
    for k, n in exact.items():
        est = py_estimate(cells, k, depth, width)
        assert est >= n
        # and never exceeds the total mass (trivial upper bound)
        assert est <= len(keys)


# ---------------------------------------------------------------------------
# HLL-style distinct sketch
# ---------------------------------------------------------------------------


def _py_rho(h: int) -> int:
    """Python replica of hll_rho: 1-based lowest-set-bit position, 33 for 0."""
    if h == 0:
        return 33
    r = 1
    while h % 2 == 0:
        h //= 2
        r += 1
    return r


def _py_hash32(s: str, seed: str) -> int:
    return int(hashlib.md5(f"{seed}:{s}".encode()).hexdigest()[:8], 16)


def test_hll_rho_matches_python_replica(spark):
    vals = [0, 1, 2, 3, 4, 6, 8, 12, 2**31, 2**32 - 1, 2**32 - 2]
    df = spark.createDataFrame([(v,) for v in vals], "h bigint")
    got = {r["h"]: r["rho"] for r in df.select("h", SK.hll_rho(F.col("h")).alias("rho")).collect()}
    for v in vals:
        assert got[v] == _py_rho(v), v


def test_hll_registers_match_python_replica(spark):
    keys = [f"key{i}" for i in range(300)]
    df = spark.createDataFrame([(k,) for k in keys], "k string")
    sk = {r["b"]: r["r"] for r in SK.hll_build(df, "k", m=64).collect()}
    expect = {}
    for k in keys:
        b = _py_hash32(k, "hllb") % 64
        rho = _py_rho(_py_hash32(k, "hllr"))
        expect[b] = max(expect.get(b, 0), rho)
    assert sk == expect


def test_hll_estimate_within_error_bound(spark):
    n = 2000
    df = spark.createDataFrame([(f"u{i}",) for i in range(n)], "k string")
    m = 256
    est = SK.hll_estimate(SK.hll_build(df, "k", m=m), m=m).collect()[0]
    # 3 standard errors of the 1.04/sqrt(m) bound
    assert abs(est["hll_est"] - n) / n < 3 * 1.04 / (m**0.5)


def test_hll_merge_equals_whole_and_is_idempotent(spark):
    df = spark.createDataFrame([(f"u{i}",) for i in range(500)], "k string")
    a = SK.hll_build(df.where("k like 'u1%'"), "k", m=64)
    b = SK.hll_build(df.where("k not like 'u1%'"), "k", m=64)
    whole = SK.hll_build(df, "k", m=64)
    as_map = lambda d: {r["b"]: r["r"] for r in d.collect()}
    assert as_map(SK.hll_merge(a, b)) == as_map(whole)
    # idempotent: merging a sketch with itself changes nothing
    assert as_map(SK.hll_merge(whole, whole, a)) == as_map(whole)


def test_hll_duplicates_do_not_move_estimate(spark):
    df = spark.createDataFrame([(f"u{i % 50}",) for i in range(5000)], "k string")
    uniq = spark.createDataFrame([(f"u{i}",) for i in range(50)], "k string")
    as_map = lambda d: {r["b"]: r["r"] for r in d.collect()}
    assert as_map(SK.hll_build(df, "k", m=64)) == as_map(SK.hll_build(uniq, "k", m=64))


def test_hll_validation(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        SK.hll_build(df, "k", m=100)  # not a power of two
    with pytest.raises(ValueError):
        SK.hll_build(df, "k", m=8)  # too small
    with pytest.raises(ValueError):
        SK.hll_merge()
    with pytest.raises(ValueError):
        SK.hll_estimate(SK.hll_build(df, "k", m=16), m=24)


def test_streaming_hll_ingest_and_merge(spark, tmp_path):
    """foreachBatch HLL ingest: per-epoch register partitions, MAX-merged on
    read; the merged store equals the single batch-built sketch, and a
    re-ingested epoch is a no-op (max is idempotent)."""
    from lantern_extras_spark.streaming.stateful import (
        ingest_hll_batch,
        read_hll_store,
        start_hll_ingest_stream,
    )

    src = str(tmp_path / "src")
    ckpt, store = str(tmp_path / "ckpt"), str(tmp_path / "store")
    b1 = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "beta gamma")], "doc_id long, text string"
    )
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    q = start_hll_ingest_stream(spark, src, b1.schema, ckpt, store, m=64)
    q.awaitTermination(120)

    b2 = spark.createDataFrame([(3, "alpha delta")], "doc_id long, text string")
    b2.coalesce(1).write.mode("append").parquet(src)
    q2 = start_hll_ingest_stream(spark, src, b1.schema, ckpt, store, m=64)
    q2.awaitTermination(120)

    from lantern_extras_spark.functions.text import tokens

    whole = SK.hll_build(
        b1.unionByName(b2).select(F.explode(tokens(F.col("text"))).alias("__key")),
        "__key",
        m=64,
    )
    as_map = lambda d: {r["b"]: r["r"] for r in d.collect()}
    assert as_map(read_hll_store(spark, store)) == as_map(whole)

    # retry idempotency: re-running an epoch leaves the store unchanged
    ingest_hll_batch(b2, 1, store, m=64)
    assert as_map(read_hll_store(spark, store)) == as_map(whole)


# ---------------------------------------------------------------------------
# Bottom-k sample sketch
# ---------------------------------------------------------------------------


def test_bottomk_exact_k_and_deterministic(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(500)], "doc_id bigint, v double")
    s1 = SK.bottomk_sample(df, 50)
    s2 = SK.bottomk_sample(df, 50)
    ids1 = sorted(r["doc_id"] for r in s1.collect())
    assert len(ids1) == 50
    assert ids1 == sorted(r["doc_id"] for r in s2.collect())
    # the kept rows really are the k smallest hashes
    all_h = {r["doc_id"]: _py_hash32(f"{r['doc_id']}", "bks") for r in df.collect()}
    expect = sorted(all_h, key=lambda i: (all_h[i], i))[:50]
    assert ids1 == sorted(expect)


def test_bottomk_merge_equals_whole(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(400)], "doc_id bigint, v double")
    a = SK.bottomk_sample(df.where("doc_id < 150"), 40)
    b = SK.bottomk_sample(df.where("doc_id >= 150"), 40)
    whole = SK.bottomk_sample(df, 40)
    merged = SK.bottomk_merge(40, a, b)
    key = lambda d: sorted(r["doc_id"] for r in d.collect())
    assert key(merged) == key(whole)
    # overlapping shards dedupe: merging the whole with a shard is a no-op
    again = SK.bottomk_merge(40, whole, a)
    assert key(again) == key(whole)


def test_bottomk_sample_mean_tracks_population(spark):
    import math
    df = spark.createDataFrame([(i, float(i % 100)) for i in range(5000)], "doc_id bigint, v double")
    s = SK.bottomk_sample(df, 500)
    mean = s.agg(F.avg("v")).collect()[0][0]
    # population mean 49.5, sample sd ~ 28.9/sqrt(500) ~ 1.3; allow 4 sd
    assert math.isfinite(mean) and abs(mean - 49.5) < 5.2


def test_bottomk_percentiles_exact_on_small_sample(spark):
    df = spark.createDataFrame([(i, float(i)) for i in range(1, 11)], "doc_id bigint, v double")
    s = SK.bottomk_sample(df, 10)  # the sample IS the data
    got = {r["prob"]: r["estimate"] for r in SK.bottomk_percentiles(s, "v", (0.5, 1.0)).collect()}
    # discrete lower quantile at rank ceil(q*10): p50 -> rank 5 -> 5.0, p100 -> 10.0
    assert got[0.5] == 5.0 and got[1.0] == 10.0


def test_bottomk_validation(spark):
    df = spark.createDataFrame([(1, 1.0)], "doc_id bigint, v double")
    with pytest.raises(ValueError):
        SK.bottomk_sample(df, 0)
    with pytest.raises(ValueError):
        SK.bottomk_merge(5)
    with pytest.raises(ValueError):
        SK.bottomk_percentiles(df, "v", probs=(0.0,))


def test_streaming_bottomk_ingest_and_merge(spark, tmp_path):
    """foreachBatch bottom-k ingest: per-epoch sample partitions merge to
    exactly the sample a single batch job would draw; re-ingesting an epoch
    is a no-op."""
    from lantern_extras_spark.streaming.stateful import (
        ingest_bottomk_batch,
        read_bottomk_store,
        start_bottomk_ingest_stream,
    )

    src = str(tmp_path / "src")
    ckpt, store = str(tmp_path / "ckpt"), str(tmp_path / "store")
    b1 = spark.createDataFrame([(i, float(i)) for i in range(60)], "doc_id long, v double")
    b1.coalesce(1).write.mode("overwrite").parquet(src)
    q = start_bottomk_ingest_stream(spark, src, b1.schema, ckpt, store, k=20)
    q.awaitTermination(120)

    b2 = spark.createDataFrame([(i, float(i)) for i in range(60, 120)], "doc_id long, v double")
    b2.coalesce(1).write.mode("append").parquet(src)
    q2 = start_bottomk_ingest_stream(spark, src, b1.schema, ckpt, store, k=20)
    q2.awaitTermination(120)

    whole = SK.bottomk_sample(b1.unionByName(b2), 20)
    key = lambda d: sorted(r["doc_id"] for r in d.collect())
    assert key(read_bottomk_store(spark, store, k=20)) == key(whole)

    ingest_bottomk_batch(b2, 1, store, k=20)
    assert key(read_bottomk_store(spark, store, k=20)) == key(whole)


def test_hll_grouped_matches_per_group_ungrouped(spark):
    """A grouped register table must equal running hll_build per group."""
    rows = [(f"u{i}", "a" if i % 3 else "b") for i in range(200)]
    df = spark.createDataFrame(rows, "k string, g string")
    grouped = SK.hll_build(df, "k", m=32, group_cols=("g",))
    as_map = lambda d, g: {r["b"]: r["r"] for r in d.collect() if r.asDict().get("g", g) == g}
    for g in ("a", "b"):
        solo = SK.hll_build(df.where(F.col("g") == g), "k", m=32)
        assert as_map(grouped, g) == {r["b"]: r["r"] for r in solo.collect()}
    est = SK.hll_estimate(grouped, m=32, group_cols=("g",))
    got = {r["g"]: r["hll_est"] for r in est.collect()}
    assert set(got) == {"a", "b"} and all(v > 0 for v in got.values())
    # grouped merge keeps group keys separate
    merged = SK.hll_merge(grouped, grouped, group_cols=("g",))
    assert sorted(map(tuple, merged.collect())) == sorted(map(tuple, grouped.collect()))


def test_hll_empty_input_estimates_zero(spark):
    empty = spark.createDataFrame([], "k string")
    est = SK.hll_estimate(SK.hll_build(empty, "k", m=64), m=64).collect()[0]
    assert est["hll_est"] == 0.0 and est["n_zero_registers"] == 64
