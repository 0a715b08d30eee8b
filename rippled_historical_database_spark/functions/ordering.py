"""Scale-safe exact global ordering: row numbers and running sums
over a TOTAL order without a single-partition sort.

``Window.orderBy(...)`` with no partition spec is semantically a global
rank but physically a one-task sort: Spark moves EVERY row into a
single partition (WindowExec warns "No Partition Defined ... Moving
all data to a single partition").  Fine over a bounded artifact (a
top-K cut, a histogram, per-partition offsets); a scale killer over an
unbounded relation -- the defect class the round-9 verdict flagged on
``profile_quantile_drift``'s 2-partition rank.

The classic exact fix (the two-pass scheme behind RDD.zipWithIndex,
kept entirely in the DataFrame API so Catalyst/Tungsten run it):

1. ``repartitionByRange`` on the order columns -- partition i's keys
   all precede partition i+1's, so a global position splits into
   (rows before my partition) + (my rank inside it).  Range boundaries
   come from Spark's deterministic reservoir sample, so recomputed
   branches of the same plan agree on the assignment (and the shuffle
   itself is reused across branches via ReuseExchange).
2. Per-partition totals -- one map-side-combinable aggregation yielding
   at most ``num_partitions`` rows.
3. Cumulative offsets over that bounded relation (the one remaining
   unpartitioned window runs over <= num_partitions rows), broadcast
   back, and a within-partition window keyed by the range partition id.

Cost shape at 100 TB: one range shuffle + one hash shuffle of the
relation (each fully parallel) + a broadcast of ~num_partitions rows --
versus the naive form's single task sorting the entire table.

Requirement: the order columns must form a TOTAL order (include a
unique tie-break).  With ties straddling a range boundary the two
passes could disagree on which duplicate precedes which.

The offsets branch and the main branch both reference the ranged
child, so the textual plan shows the upstream lineage twice; at
runtime the two branches collapse into one physical computation via
exchange reuse (``spark.sql.exchange.reuse``, default on; under AQE,
identical canonicalized shuffles become ReusedExchange stages --
asserted by tests/test_plan_quality.py's heaps-law reuse check).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

_PID = "__gord_pid"


def _with_range_pid(
    df: DataFrame, order: list[Column | str], num_partitions: int | None
) -> tuple[DataFrame, list[Column]]:
    cols = [F.col(c) if isinstance(c, str) else c for c in order]
    n = num_partitions or int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions")
    )
    ranged = df.repartitionByRange(n, *cols)
    return ranged.withColumn(_PID, F.spark_partition_id()), cols


def _offsets(
    t: DataFrame, aggs: list[Column], offs: list[tuple[str, str]]
) -> DataFrame:
    """Per-partition totals -> exclusive prefix sums, one row per range
    partition (bounded by num_partitions, so the unpartitioned window
    here is over a bounded artifact)."""
    w_prev = Window.orderBy(_PID).rowsBetween(
        Window.unboundedPreceding, -1
    )
    totals = t.groupBy(_PID).agg(*aggs)
    return totals.select(
        _PID,
        *(
            F.coalesce(F.sum(tot).over(w_prev), F.lit(0)).alias(off)
            for tot, off in offs
        ),
    )


def global_row_number(
    df: DataFrame,
    order: list[Column | str],
    out_col: str = "rn",
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + BIGINT ``out_col`` = exact 1-based global row number in
    ``order`` (which must be a total order), without a one-task sort."""
    t, cols = _with_range_pid(df, order, num_partitions)
    offsets = _offsets(
        t, [F.count(F.lit(1)).alias("__n")], [("__n", "__off")]
    )
    w_in = Window.partitionBy(_PID).orderBy(*cols)
    return (
        t.join(F.broadcast(offsets), _PID)
        .withColumn(
            out_col,
            (F.row_number().over(w_in) + F.col("__off")).cast("bigint"),
        )
        .drop(_PID, "__off")
    )


def global_running_sums(
    df: DataFrame,
    order: list[Column | str],
    sums: dict[str, Column | str],
    num_partitions: int | None = None,
) -> DataFrame:
    """``df`` + one inclusive global running-sum column per ``sums``
    entry ({out_col: summed expression}), cumulated in ``order`` (a
    total order).  Exact for integer/decimal inputs (addition is
    associative, so the two-pass split cannot change the value); for
    DOUBLE inputs route through the house DECIMAL accumulator first."""
    items = [
        (out, F.col(e) if isinstance(e, str) else e)
        for out, e in sums.items()
    ]
    t, cols = _with_range_pid(df, order, num_partitions)
    offsets = _offsets(
        t,
        [F.sum(e).alias(f"__t_{out}") for out, e in items],
        [(f"__t_{out}", f"__off_{out}") for out, _ in items],
    )
    w_in = Window.partitionBy(_PID).orderBy(*cols)
    res = t.join(F.broadcast(offsets), _PID)
    for out, e in items:
        res = res.withColumn(
            out, F.sum(e).over(w_in) + F.col(f"__off_{out}")
        )
    return res.drop(_PID, *(f"__off_{out}" for out, _ in items))
