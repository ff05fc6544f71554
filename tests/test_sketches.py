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
