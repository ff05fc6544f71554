

def test_kmv_distinct_estimate_accuracy(spark):
    """KMV sketch: exact below k, within ~4 standard errors above k, and
    deterministic (same data -> same estimate, the cross-engine contract)."""
    from lantern_extras_spark.operators.textstats import kmv_distinct

    rows = [(f"v{i % 7}", "small") for i in range(100)]              # 7 distinct
    rows += [(f"w{i}", "big") for i in range(5000)]                  # 5000 distinct
    df = spark.createDataFrame(rows, "val string, grp string")
    out = {r["grp"]: r for r in
           kmv_distinct(df, "val", group_cols=("grp",), k=256).collect()}
    assert out["small"]["distinct_est"] == 7.0                       # exact path
    assert out["small"]["n_rows"] == 100
    est = out["big"]["distinct_est"]
    assert abs(est - 5000) / 5000 < 4.0 / (254 ** 0.5), est          # ~4 sigma
    again = {r["grp"]: r["distinct_est"] for r in
             kmv_distinct(df, "val", group_cols=("grp",), k=256).collect()}
    assert again == {g: r["distinct_est"] for g, r in out.items()}   # deterministic
    # ungrouped variant
    one = kmv_distinct(df, "val", k=256).first()
    assert one["n_rows"] == 5100 and one["distinct_est"] > 4000
    import pytest as _pt
    with _pt.raises(ValueError, match="k must be"):
        kmv_distinct(df, "val", k=2)
