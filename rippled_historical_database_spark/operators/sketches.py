"""Mergeable cardinality sketches: HyperLogLog register construction.

The reference counts distincts by brute aggregation (e.g. active
accounts via full groupBy); at 100 TB a mergeable sketch answers
"how many distinct users/documents" in one pass with O(registers)
state, and -- because max-per-register is associative -- partial
sketches from any partitioning merge exactly (the same property the
candle rollups exploit for re-reduce).

Spark has approx_count_distinct (HLL++), but its registers are not
reachable or engine-portable.  This sketch is built from md5 (both
engines bit-identical), so the REGISTER TABLE itself is the verified
output: the rho ladder is generated once and rendered into both the
Spark expression and the oracle SQL.  The scalar estimate stays a
trivial post-processing fold over 64 rows (tests assert it lands
within HLL's error bound of the exact distinct count).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

N_REGISTERS = 64   # 2^6 registers -> ~13% standard error (1.04/sqrt(64))
RHO_BITS = 20      # ladder depth: P(rho > 20) = 2^-20, beyond any testdata

# h is a 48-bit md5-derived integer; register = h % 64; the remaining
# bits w = h // 64 feed rho = position (1-based) of the lowest set bit.
_RHO_CASES = " ".join(
    f"WHEN w % {2 ** r} = {2 ** (r - 1)} THEN {r}" for r in range(1, RHO_BITS + 1)
)
SQL_HLL = f"""
    WITH h_t AS (
        SELECT CAST('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)
               AS BIGINT) AS h
        FROM events
    ),
    w_t AS (
        SELECT CAST(h % {N_REGISTERS} AS INT) AS register,
               h // {N_REGISTERS} AS w
        FROM h_t
    )
    SELECT register,
           MAX(CASE {_RHO_CASES} ELSE {RHO_BITS + 1} END) AS max_rho
    FROM w_t
    GROUP BY register
    ORDER BY register
"""


def _rho(w: Column) -> Column:
    expr = F.lit(RHO_BITS + 1)
    for r in range(RHO_BITS, 0, -1):
        expr = F.when(w % (2 ** r) == 2 ** (r - 1), F.lit(r)).otherwise(expr)
    return expr


@register(
    "sketch_hll_registers",
    oracle=SQL_HLL,
    doc="HyperLogLog register construction over distinct events.user_id: "
        "md5-derived 48-bit hash -> 64 registers, max rank of the lowest "
        "set bit per register.  The register table IS the sketch -- "
        "mergeable by per-register max (associative, so partial sketches "
        "from any partitioning combine exactly), 64 rows of state "
        "regardless of input size.  Construction is verified bit-exact "
        "(the rho ladder renders identically in both engines); the "
        "cardinality estimate from the registers is post-processing, "
        "asserted within HLL error bounds by tests/test_invariants.py.",
    tags=("sketch",),
)
def sketch_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    h = F.conv(
        F.substring(F.md5(F.col("user_id").cast("string").cast("binary")), 1, 12),
        16,
        10,
    ).cast("bigint")
    base = e.select(
        (h % N_REGISTERS).cast("int").alias("register"),
        (h / F.lit(N_REGISTERS)).cast("bigint").alias("w"),
    )
    return (
        base.groupBy("register")
        .agg(F.max(_rho(F.col("w"))).alias("max_rho"))
        .orderBy("register")
    )


def hll_estimate(registers: dict[int, int]) -> float:
    """Standard HLL estimator from the register table (driver-side,
    64 values -- no distributed float-order concern)."""
    m = N_REGISTERS
    alpha = 0.709  # alpha_64
    z = sum(2.0 ** -registers.get(i, 0) for i in range(m))
    raw = alpha * m * m / z
    if raw <= 2.5 * m:  # small-range correction (linear counting)
        zeros = sum(1 for i in range(m) if registers.get(i, 0) == 0)
        if zeros:
            import math

            return m * math.log(m / zeros)
    return raw
