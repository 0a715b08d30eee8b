"""Data-layout keys: Z-order (Morton) interleaving for multi-dimensional
file clustering.

The reference gets its locality from ONE hand-designed HBase rowkey per
table (``lib/hbase/hbase-thrift/data.js`` rowkey prefixes: time-major
for ledgers, account-major for account_tx) -- a query filtering on the
*other* dimension scans everything.  Columnar lakes solve this with a
space-filling curve: write files sorted by an interleaved key and
parquet min/max stats prune on BOTH dimensions at once.  This module
computes that key as pure integer column arithmetic.

Scale design (100 TB): the key itself is a zero-shuffle projection (the
only extra input is a broadcast 1-row min/max stats relation).  The
write path is ``df.repartitionByRange(N, "zkey").sortWithinPartitions
("zkey")`` -- one range shuffle at write time buys bounded min/max
ranges per file on every interleaved dimension, the same trade the
reference makes once, statically, in its rowkey design.  tests/
test_plan_quality.py asserts the projection plans with no hash exchange
and tests/test_invariants.py asserts the pruning benefit: against each
single-dimension-sorted layout, the Z-order layout shrinks the per-file
envelope of the OTHER dimension.

Determinism: the time bucket is all-integer arithmetic on epoch micros;
the value bucket is a single subtract/divide/multiply/floor pipeline
(each one IEEE op, engine-identical); the Morton interleave is a
generated sum of disjoint power-of-two terms (addition of disjoint bits
== bitwise OR, exact in any engine).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

Z_BITS = 8  # 8 bits per dimension -> 16-bit Morton key


def _morton_terms(cu: str, cv: str, spark_side: bool) -> str:
    """Render sum-of-disjoint-bits Morton interleave; same structure in
    both engines (Spark: shiftleft/shiftright fns, DuckDB: << >> ops)."""
    terms = []
    for i in range(Z_BITS):
        if spark_side:
            terms.append(f"shiftleft(shiftright({cu}, {i}) & 1, {2 * i})")
            terms.append(f"shiftleft(shiftright({cv}, {i}) & 1, {2 * i + 1})")
        else:
            terms.append(f"((({cu} >> {i}) & 1) << {2 * i})")
            terms.append(f"((({cv} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


M = 2 ** Z_BITS

# Time bucket 0..255 against broadcast [tmin, tmax] epoch-micros range:
# all-integer (floor-div), bit-exact in both engines.
_T_BUCKET = f"CAST((us - tmin) * {M} {{div}} (tmax - tmin + 1) AS INT)"

# Value bucket 0..255 against broadcast [vmin, vmax]: one subtract, one
# divide, one multiply, one floor -- each a single IEEE op.
_V_BUCKET = (
    f"LEAST(CAST(FLOOR((value - vmin) / (vmax - vmin) * {M}) AS INT), {M - 1})"
)


@register(
    "layout_zorder_key",
    rotation_group=2,
    oracle=f"""
    WITH base AS (
        SELECT event_id, value, epoch_us(ts) AS us FROM events
    ),
    stats AS (
        SELECT MIN(us) AS tmin, MAX(us) AS tmax,
               MIN(value) AS vmin, MAX(value) AS vmax
        FROM base
    )
    SELECT event_id,
           {_T_BUCKET.format(div='//')} AS code_t,
           {_V_BUCKET} AS code_v,
           CAST({_morton_terms(_T_BUCKET.format(div='//'), _V_BUCKET,
                               spark_side=False)} AS BIGINT) AS zkey
    FROM base CROSS JOIN stats
    ORDER BY zkey, event_id
    """,
    doc="Z-order (Morton) layout key over (time-bucket, value-bucket): "
        "interleave 8 bits of each dimension so sorting by zkey "
        "co-locates rows close in BOTH dimensions -- the multi-"
        "dimensional generalization of the reference's single rowkey "
        "prefix (data.js time-major/account-major keys).  Writing "
        "repartitionByRange(zkey).sortWithinPartitions(zkey) gives "
        "every parquet file a bounded min/max envelope on time AND "
        "value, so either predicate prunes files at scan time.  The "
        "key computation is a zero-shuffle projection; the only extra "
        "input is the broadcast 1-row min/max stats relation.",
    tags=("layout",),
)
def layout_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    base = e.select("event_id", "value", F.unix_micros("ts").alias("us"))
    stats = base.agg(
        F.min("us").alias("tmin"),
        F.max("us").alias("tmax"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
    )
    t_bucket = _T_BUCKET.format(div="div")
    return (
        base.crossJoin(F.broadcast(stats))
        .selectExpr(
            "event_id",
            f"{t_bucket} AS code_t",
            f"{_V_BUCKET} AS code_v",
            f"CAST({_morton_terms(t_bucket, _V_BUCKET, spark_side=True)} AS BIGINT)"
            " AS zkey",
        )
        .orderBy("zkey", "event_id")
    )
