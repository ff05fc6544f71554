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


def test_funnel_sequencing(spark):
    """Out-of-order stages do NOT convert; deeper stages require the chain."""
    from lantern_extras_spark.operators.temporal import funnel

    rows = [
        # u1: full ordered funnel
        (1, "view", 1), (1, "click", 2), (1, "purchase", 3),
        # u2: clicked BEFORE viewing -> view counted, click not
        (2, "click", 1), (2, "view", 2), (2, "purchase", 3),
        # u3: view+click ordered, purchase before click -> no purchase credit
        (3, "view", 1), (3, "purchase", 2), (3, "click", 4),
        # u4: never viewed
        (4, "click", 1), (4, "purchase", 2),
        # u5: repeated events; FIRST occurrences drive the chain
        (5, "view", 10), (5, "view", 1), (5, "click", 5), (5, "purchase", 6),
    ]
    df = spark.createDataFrame(
        [(u, t, __import__("datetime").datetime(2024, 1, 1, 0, 0, s)) for u, t, s in rows],
        "user_id long, event_type string, ts timestamp",
    )
    r = funnel(df, ["view", "click", "purchase"]).first()
    assert r["n_users"] == 5
    assert r["n_view"] == 4            # u1, u2, u3, u5
    assert r["n_click_after"] == 3     # u1, u3, u5 (u2 clicked first)
    assert r["n_purchase_after"] == 2  # u1, u5 (u3 purchased before click)
    import pytest as _pt

    with _pt.raises(ValueError, match="at least 2"):
        funnel(df, ["view"])
