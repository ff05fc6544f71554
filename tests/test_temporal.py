"""As-of join vs pandas.merge_asof ground truth; range join strategies."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from lantern_extras_spark.operators.temporal import asof_join, range_join


@pytest.fixture(scope="module")
def trades_quotes(spark):
    rng = np.random.RandomState(5)
    base = pd.Timestamp("2024-01-01")
    trades = pd.DataFrame({
        "sym": ["A", "B"] * 25,
        "ts": [base + pd.Timedelta(seconds=int(s)) for s in sorted(rng.randint(0, 3600, 50))],
        "qty": rng.randint(1, 100, 50),
    })
    quotes = pd.DataFrame({
        "sym": ["A", "B"] * 15,
        "ts": [base + pd.Timedelta(seconds=int(s)) for s in sorted(rng.randint(0, 3600, 30))],
        "px": np.round(rng.rand(30) * 100, 2),
    })
    return (
        spark.createDataFrame(trades),
        spark.createDataFrame(quotes),
        trades,
        quotes,
    )


def test_asof_backward_matches_pandas(trades_quotes):
    lt, rt, pt, pq_ = trades_quotes
    out = asof_join(lt, rt, on="ts", by=["sym"]).toPandas()
    expect = pd.merge_asof(
        pt.sort_values("ts"), pq_.sort_values("ts"), on="ts", by="sym", direction="backward"
    )
    got = out.sort_values(["ts", "sym"]).reset_index(drop=True)
    exp = expect.sort_values(["ts", "sym"]).reset_index(drop=True)
    assert list(got["r_px"].fillna(-1)) == list(exp["px"].fillna(-1))


def test_asof_forward_matches_pandas(trades_quotes):
    lt, rt, pt, pq_ = trades_quotes
    out = asof_join(lt, rt, on="ts", by=["sym"], direction="forward").toPandas()
    expect = pd.merge_asof(
        pt.sort_values("ts"), pq_.sort_values("ts"), on="ts", by="sym", direction="forward"
    )
    got = out.sort_values(["ts", "sym"]).reset_index(drop=True)
    exp = expect.sort_values(["ts", "sym"]).reset_index(drop=True)
    assert list(got["r_px"].fillna(-1)) == list(exp["px"].fillna(-1))


def test_asof_tolerance(spark):
    l = spark.createDataFrame([(1, "2024-01-01 00:10:00")], "id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    r = spark.createDataFrame([("2024-01-01 00:00:00", 5.0)], "ts string, v double") \
        .withColumn("ts", F.to_timestamp("ts"))
    near = asof_join(l, r, tolerance_us=15 * 60 * 1_000_000).first()
    far = asof_join(l, r, tolerance_us=5 * 60 * 1_000_000).first()
    assert near["r_v"] == 5.0
    assert far["r_v"] is None  # match beyond tolerance voided


def test_asof_equal_ts_matches(spark):
    l = spark.createDataFrame([(1, "2024-01-01 00:10:00")], "id long, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    r = spark.createDataFrame([("2024-01-01 00:10:00", 7.0)], "ts string, v double") \
        .withColumn("ts", F.to_timestamp("ts"))
    assert asof_join(l, r).first()["r_v"] == 7.0  # inclusive ties


def test_range_join_strategies_agree(spark):
    rng = np.random.RandomState(9)
    pts = spark.createDataFrame(
        [(i, int(v)) for i, v in enumerate(rng.randint(0, 1000, 200))], "pid long, x long"
    )
    intervals = spark.createDataFrame(
        [(j, int(lo), int(lo + w)) for j, (lo, w) in enumerate(zip(rng.randint(0, 950, 30), rng.randint(5, 80, 30)))],
        "iid long, lo long, hi long",
    )
    a = range_join(pts, intervals, "x", "lo", "hi", strategy="broadcast")
    b = range_join(pts, intervals, "x", "lo", "hi", strategy="bin", bin_width=64)
    sa = sorted((r["pid"], r["iid"]) for r in a.collect())
    sb = sorted((r["pid"], r["iid"]) for r in b.collect())
    assert sa == sb and len(sa) > 0


def test_range_join_requires_bin_width(spark):
    df = spark.createDataFrame([(1, 1)], "a long, x long")
    with pytest.raises(ValueError, match="bin_width"):
        range_join(df, df, "x", "a", "x", strategy="bin")
