"""Skew diagnostics + salted join (operators/skew.py)."""

import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.operators import skew as SK


def _skewed(spark, n=400):
    # ~75% of rows share key 1 (the hot key), the rest spread over 2..20
    rows = [(i, 1 if i % 4 != 0 else (i % 19) + 2, f"p{i}") for i in range(n)]
    return spark.createDataFrame(rows, "row_id long, k long, payload string")


def test_skew_report_exact_counts_and_salt_factor(spark):
    df = _skewed(spark)
    rep = {r["k"]: r for r in SK.skew_report(df, "k", top_k=3,
                                             target_rows_per_task=50).collect()}
    assert set(rep) == {1, 2, 3} or 1 in rep  # hot key always present
    hot = rep[1]
    assert hot["n"] == 300
    assert hot["share"] == pytest.approx(300 / 400)
    assert hot["salt_factor"] == 6  # ceil(300/50)
    # a cold key fits one task
    cold = [r for k, r in rep.items() if k != 1][0]
    assert cold["salt_factor"] == 1
    with pytest.raises(ValueError, match="top_k"):
        SK.skew_report(df, "k", top_k=0)
    with pytest.raises(ValueError, match="target_rows_per_task"):
        SK.skew_report(df, "k", target_rows_per_task=0)


def test_skew_report_profiles_null_keys(spark):
    df = spark.createDataFrame(
        [(1, None), (2, None), (3, 7)], "row_id long, k long"
    )
    rep = {r["k"]: r["n"] for r in SK.skew_report(df, "k", top_k=5).collect()}
    assert rep[None] == 2 and rep[7] == 1


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("salt", [1, 8])
def test_salted_join_equals_plain_join(spark, how, salt):
    left = _skewed(spark)
    # dim covers only some keys so 'left' has real null-extensions
    right = spark.createDataFrame(
        [(k, f"dim{k}") for k in (1, 2, 3, 4, 5)], "k long, dim string"
    )
    plain = left.join(right, on="k", how=how)
    salted = SK.salted_join(left, right, on="k", salt=salt, how=how)
    key = lambda df: sorted(
        (r["row_id"], r["k"], r["payload"], r["dim"]) for r in df.collect()
    )
    assert key(salted) == key(plain)


def test_salted_join_null_keys_never_match(spark):
    left = spark.createDataFrame([(1, None), (2, 5)], "row_id long, k long")
    right = spark.createDataFrame([(None, "x"), (5, "y")], "k long, dim string")
    out = sorted((r["row_id"], r["dim"])
                 for r in SK.salted_join(left, right, "k", salt=4,
                                         how="left").collect())
    assert out == [(1, None), (2, "y")]


def test_salted_join_rejects_right_outer(spark):
    df = _skewed(spark, 8)
    with pytest.raises(ValueError, match="salt the other side"):
        SK.salted_join(df, df, "k", how="full")
    with pytest.raises(ValueError, match="salt must be"):
        SK.salted_join(df, df, "k", salt=0)
    clash = df.withColumn("__salt", F.lit(1))
    with pytest.raises(ValueError, match="__salt column already exists"):
        SK.salted_join(clash, df, "k")


def test_salted_join_spreads_hot_key(spark):
    """The hot key's rows must land on multiple salt values — the whole
    point. (Any assignment is CORRECT; this asserts the balance holds for
    the assignment salted_join actually uses.)"""
    left = _skewed(spark)
    salted = left.withColumn("__salt", SK._left_salt_expr(left, 8, "salt"))
    n_salts = (
        salted.where(F.col("k") == 1).select("__salt").distinct().count()
    )
    assert n_salts >= 6  # 300 rows over 8 buckets: all 8 expected, 6 is safe


def test_salted_join_spreads_duplicate_rows(spark):
    """Fully DUPLICATE rows (repeated identical events — a common hot-key
    shape) must still spread: a whole-row hash alone would send them all to
    one salt value. The per-row disambiguator fixes that."""
    left = spark.createDataFrame(
        [(1, "same-event")] * 400, "k long, payload string"
    ).repartition(8)
    salted = left.withColumn("__salt", SK._left_salt_expr(left, 8, "salt"))
    n_salts = salted.select("__salt").distinct().count()
    assert n_salts >= 6
    # and the join output is still exactly the plain join's
    right = spark.createDataFrame([(1, "dim1")], "k long, dim string")
    out = SK.salted_join(left, right, on="k", salt=8)
    assert out.count() == 400
    assert out.select("dim").distinct().collect()[0]["dim"] == "dim1"
