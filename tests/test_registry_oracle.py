"""Every registered query must match its DuckDB oracle (the same check
the driver runs at sf0.01); oracle-less queries must at least run and
return a stable schema."""

from __future__ import annotations

import pytest

from rippled_historical_database_spark.plans.registry import all_queries

QUERIES = all_queries()


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck, sf_dir, monkeypatch):
    # Dual-form queries must serve their exact (oracle-pinned) form
    # here; crossing a size-dispatch threshold raises loudly
    # (functions/dispatch.py) instead of silently mismatching.
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_VERIFY", "1")
    q = QUERIES[name]
    df = q.spark(spark, sf_dir)
    if q.oracle is None:
        rows = df.limit(10001).collect()
        assert df.schema is not None
        assert rows is not None
        return
    errors = __import__("tests.oracle", fromlist=["compare"]).compare(
        df, duck, q.oracle
    )
    assert not errors, f"{name}: " + "; ".join(errors)
