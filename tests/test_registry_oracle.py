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


def test_fround_literals_are_consistent():
    """Structural lint for the fixed-point FLOOR rounding literals the
    round-12 tie-portability rewrite inlined into oracle SQL (and that
    sql_fround generates): in `FLOOR(x * Me0 + 0.5) / Ne0`, M must
    equal N and be a power of ten -- a mistyped zero in any one copy
    would silently re-scale one engine's output."""
    import re

    pat = re.compile(r"\*\s*(\d+)e0\s*\+\s*0\.5\)\s*/\s*(\d+)e0")
    checked = 0
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        for mult, div in pat.findall(q.oracle):
            checked += 1
            assert mult == div, (name, mult, div)
            assert set(mult[1:]) <= {"0"} and mult[0] == "1", (name, mult)
    assert checked > 50  # the family is large; a refactor that drops
    #                      the pattern wholesale should fail this too
