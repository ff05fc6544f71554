"""Property-based parity for the portable rounding primitive: Python, DuckDB,
and Spark must agree bit-for-bit on floor(x·10ⁿ + 0.5)/10ⁿ — including exact
decimal halves where engine-native round() provably diverges."""

import math

import duckdb
import pytest
from hypothesis import given, settings, strategies as st

from lantern_extras_spark.functions.portable import portable_round_sql, pround, sql_pround


def py_pround(x: float, n: int) -> float:
    s = float(10**n)
    return math.floor(x * s + 0.5) / s


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    ),
    st.integers(min_value=0, max_value=6),
)
@settings(max_examples=200, deadline=None)
def test_python_duckdb_parity(xs, n):
    con = duckdb.connect()
    expr = sql_pround("x", n)
    got = [
        con.sql(f"SELECT {expr} FROM (SELECT CAST({x!r} AS DOUBLE) AS x)").fetchone()[0]
        for x in xs
    ]
    expect = [py_pround(x, n) for x in xs]
    assert got == expect


def test_spark_matches_python_on_half_boundaries(spark):
    # exact decimal halves — where F.round and DuckDB round() disagree
    vals = [4.021875, 123.455, -2.5, 0.5, 1.005, 2.675, -0.4375, 7.125]
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    for n in (0, 2, 5):
        got = [r[0] for r in df.select(pround("x", n)).collect()]
        assert got == [py_pround(v, n) for v in vals], f"scale {n}"


def test_round_rewriter_handles_nesting():
    sql = "SELECT round(sum(a * round(b, 2)), 4) AS x, round(c) AS y FROM t"
    out = portable_round_sql(sql)
    assert "round(c)" in out  # integral round untouched
    assert out.count("floor(") == 2
    assert "round(b" not in out  # nested round rewritten too
