"""No oracle may produce a TIMESTAMP WITH TIME ZONE column.

The driver's correctness gate hashes DuckDB values as returned: a
tz-aware datetime never hash-matches Spark's naive TIMESTAMP even when
the instants are identical (round-8 red row ``golden_open_offers_asof``
-- the oracle read a Spark-written parquet timestamp back without the
house ``CAST(... AS TIMESTAMP)``).  The in-repo harness used to strip
tzinfo before comparing and therefore could not see this bug class;
``tests.oracle.compare`` now flags it, and this test pins the WHOLE
registry by planning every oracle with DESCRIBE (no execution) and
asserting zero tz-typed result columns.
"""

from __future__ import annotations

import pytest

from rippled_historical_database_spark.plans.registry import all_queries
from tests.oracle import oracle_tz_columns

QUERIES = all_queries()


@pytest.fixture(scope="module")
def warehouse(spark):
    # Golden oracles read the real-data warehouse parquet; make sure it
    # exists before DESCRIBE tries to bind the read_parquet() scans.
    from rippled_historical_database_spark.operators.golden import (
        warehouse_artifact,
    )

    return warehouse_artifact(spark)


def test_no_oracle_returns_tz_aware_timestamps(duck, warehouse):
    offenders = {}
    unplannable = {}
    for name in sorted(QUERIES):
        q = QUERIES[name]
        if q.oracle is None:
            continue
        try:
            # strict: a DESCRIBE failure means the oracle can't be
            # planned -- surface it rather than exempting it from the
            # tz gate (it would silently pass while the driver's
            # executor might still accept the statement).
            cols = oracle_tz_columns(duck, q.oracle, strict=True)
        except Exception as exc:  # noqa: BLE001 -- collected + asserted
            unplannable[name] = str(exc).splitlines()[0]
            continue
        if cols:
            offenders[name] = cols
    assert not unplannable, (
        f"oracles DESCRIBE cannot plan (fix the SQL so the tz gate can "
        f"see its result types): {unplannable}"
    )
    assert not offenders, (
        "oracles returning TIMESTAMP WITH TIME ZONE (wrap the column in "
        f"CAST(... AS TIMESTAMP)): {offenders}"
    )
