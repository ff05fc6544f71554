"""Env-gated live-Postgres round-trip of the S9/J1 write-back mapping
(tools/jdbc_roundtrip.py): skipped unless LANTERN_SPARK_DB_URL points at a
real database with the PG JDBC driver on the classpath — the sandbox has
neither, but the hook runs unchanged the day a deployment provides them
(SCALE.md "Postgres write-back mapping")."""

import os

import pytest


@pytest.mark.skipif(
    not os.environ.get("LANTERN_SPARK_DB_URL"),
    reason="no live database: set LANTERN_SPARK_DB_URL (jdbc:postgresql://...) "
           "and provide the PostgreSQL JDBC jar to run the S9/J1 round-trip",
)
def test_merge_embeddings_jdbc_roundtrip(spark):
    from tools.jdbc_roundtrip import run_roundtrip

    res = run_roundtrip(spark)
    assert res["rows_match"], res
    assert res["hash_match"], res
