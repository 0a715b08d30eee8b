"""Structural lints that mirror the DRIVER's comparison strictness.

The driver hashes pandas frames, so it distinguishes int64 from float64
even when every value is numerically identical.  The local comparator
(tests/oracle.py) is value-tolerant, which let a DuckDB
``SUM(CASE ...)`` -> HUGEINT -> float64 oracle pass locally while the
driver flagged it red twice (rounds 3 and 4, q12 being the last).

Two lints make that class impossible to re-introduce:

1. **Dtype parity** -- for every registered oracle, fetch the oracle's
   pandas dtypes via a ``LIMIT 0`` wrap (DuckDB assigns dtypes from the
   relation type, so this is free -- no rows scanned) and compare the
   numeric *kind* (integral vs fractional) against the Spark plan's
   analyzed schema.  A Spark bigint column whose oracle comes back
   float64 (the HUGEINT trap) fails here before it ever reaches the
   driver.

2. **No ArrayType in driver-facing schemas** -- the driver's pandas
   canonicalization of array cells bit us in round 3; the fix was to
   canonicalize arrays to strings inside the query.  This asserts the
   contract structurally: no registered query returns an ArrayType (or
   MapType) column.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import types as T

from rippled_historical_database_spark.plans.registry import all_queries

QUERIES = all_queries()

# Streaming queries execute on construction (processAllAvailable); the
# schemas come from the session-scoped shared build cache (conftest
# `query_df`) so the suite builds each query exactly ONCE across this
# module AND test_registry_oracle (r15: the duplicate build was 165 s
# of suite wall, most of it re-draining the streaming twins).


_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
_FRACTIONAL = (T.FloatType, T.DoubleType)


def _spark_kind(dtype) -> str | None:
    if isinstance(dtype, _INTEGRAL):
        return "int"
    if isinstance(dtype, _FRACTIONAL):
        return "float"
    return None  # decimals / strings / timestamps: out of scope


def _duck_kind(pd_dtype) -> str | None:
    if pd_dtype.kind in ("i", "u"):
        return "int"
    if pd_dtype.kind == "f":
        return "float"
    return None


def test_oracle_numeric_dtypes_match_spark(spark, duck, sf_dir, query_df):
    """DuckDB oracle numeric kinds must equal the Spark schema's kinds.

    Catches the HUGEINT->float64 trap (un-cast SUM over integers) and the
    reverse (Spark double vs oracle int) -- both hash-mismatch at the
    driver even with identical values.
    """
    problems: list[str] = []
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        sql = q.oracle.strip().rstrip(";")
        o_dtypes = (
            duck.execute(f"SELECT * FROM ({sql}) AS __lint LIMIT 0")
            .fetch_df()
            .dtypes
        )
        s_schema = query_df(name).schema
        s_kinds = {f.name.lower(): _spark_kind(f.dataType) for f in s_schema.fields}
        for col, pd_dtype in o_dtypes.items():
            sk = s_kinds.get(col.lower())
            ok = _duck_kind(pd_dtype)
            if sk is not None and ok is not None and sk != ok:
                problems.append(
                    f"{name}.{col}: spark={sk} oracle={ok} ({pd_dtype}) -- "
                    "if the oracle SUMs integers, wrap it in "
                    "CAST(... AS BIGINT)"
                )
    assert not problems, "\n".join(problems)


def test_no_uncast_sum_case_in_oracles():
    """Textual belt-and-braces: SUM(CASE ...) in an oracle must sit
    inside a CAST (DuckDB returns HUGEINT for integer sums)."""
    pat = re.compile(r"SUM\s*\(\s*CASE", re.IGNORECASE)
    cast_pat = re.compile(r"CAST\s*\(\s*SUM\s*\(\s*CASE", re.IGNORECASE)
    offenders = []
    for name, q in QUERIES.items():
        if q.oracle is None:
            continue
        n_sum_case = len(pat.findall(q.oracle))
        n_cast = len(cast_pat.findall(q.oracle))
        if n_sum_case > n_cast:
            offenders.append(f"{name}: {n_sum_case - n_cast} un-cast SUM(CASE")
    assert not offenders, "\n".join(offenders)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_no_array_or_map_columns(name, spark, sf_dir, query_df):
    """The driver's pandas canonicalization chokes on array cells (round-3
    failure class); every driver-facing query canonicalizes arrays to
    scalar columns before returning."""
    schema = query_df(name).schema
    bad = [
        f.name
        for f in schema.fields
        if isinstance(f.dataType, (T.ArrayType, T.MapType))
    ]
    assert not bad, f"{name} returns non-scalar columns {bad}"
