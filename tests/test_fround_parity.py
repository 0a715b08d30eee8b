"""Cross-engine bit parity of the house fround (functions/numeric.py):
one batch of adversarial doubles -- exact half-grid ties, off-by-one-ulp
neighbors, negatives, large magnitudes inside the 2^53 exactness bound
-- evaluated through Spark's fround Column, DuckDB's sql_fround text,
and the Python replay (tests/rounding.py), compared bit-for-bit.

This is the unit-level guarantee under the round-13 registry-wide
conversion: every float emission goes through this one IEEE sequence,
so if the three implementations ever disagree on ANY representable
input in the documented finite domain, this fails before a driver row
can."""

from __future__ import annotations

import math
import struct

import duckdb
import pytest

from rippled_historical_database_spark.functions.numeric import (
    fround,
    sql_fround,
)
from tests.rounding import fround_py


def _ulp_away(x: float, direction: int) -> float:
    return math.nextafter(x, math.inf if direction > 0 else -math.inf)


def _cases() -> list[float]:
    vals: list[float] = []
    for s_vals in ((6, 1_000_000), (9, 1_000_000_000)):
        _s, m = s_vals
        # exact half-grid ties (k + 0.5)/m where representable, their
        # ulp neighbors, and plain grid/off-grid values
        for k in (0, 1, 2, 7, 12345, 999_999, 123_456_789):
            t = (2 * k + 1) / (2 * m)
            vals += [t, _ulp_away(t, +1), _ulp_away(t, -1), -t]
        vals += [1.0 / m, 3.0 / m, 1.0 / 1024.0, 976562.5 / m]
    vals += [
        0.0, -0.0, 0.1, -0.1, 2.675, -2.675, 0.015625, 1e-12,
        1234.5678901234, -1234.5678901234, 8191.999999999,
        # near the 6-dp 2^53 exactness edge (|x|*10^6 + 0.5 < 2^53)
        9.0e9, -9.0e9,
    ]
    return vals


@pytest.mark.parametrize("scale", [6, 9])
def test_fround_three_way_bit_parity(spark, scale):
    vals = _cases()
    sdf = spark.createDataFrame([(v,) for v in vals], "x double")
    got_spark = [
        r["y"] for r in sdf.select(fround("x", scale).alias("y"))
        .collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (i INTEGER, x DOUBLE)")
    con.executemany(
        "INSERT INTO t VALUES (?, ?)", list(enumerate(vals))
    )
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {sql_fround('x', scale)} FROM t ORDER BY i"
        ).fetchall()
    ]
    for v, a, b in zip(vals, got_spark, got_duck):
        c = fround_py(v, scale)
        assert struct.pack("<d", a) == struct.pack("<d", b) == struct.pack(
            "<d", c
        ), (v, scale, a, b, c)
