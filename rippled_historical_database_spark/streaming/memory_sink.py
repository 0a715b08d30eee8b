"""Shared memory-sink runner for finite streaming plans.

The registry's streaming operators drive a bounded file source to
completion through Spark's memory sink (the test/driver harness path;
production plans swap in file/kafka sinks).  Memory-sink results are
driver-resident by construction, so snapshotting the table and dropping
the temp view costs nothing extra and fixes two leaks the shared
hard-coded-name pattern had: concurrent invocations on one
SparkSession no longer collide on the sink name, and the sink table no
longer outlives the call.
"""

from __future__ import annotations

import os
import uuid

from pyspark.sql import DataFrame

# State-store parallelism for the finite correctness twins.  A stateful
# query creates (and commits, every micro-batch) one state-store
# partition per shuffle partition; the twins carry between 4 keys (one
# per pair) and a few 10k keys, so the session default of 32 mostly
# schedules empty-store commits -- measured at 10x, ~2.5-3 s of
# per-batch constant at 32 partitions vs ~0.9 s at 8
# (SCALE.md round-12 note).  Production streams on a real cluster size
# this to key cardinality / executor count instead; the env override
# keeps the harness honest if someone wants the session default back.
STREAM_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


def run_to_memory(df: DataFrame, base_name: str, output_mode: str) -> DataFrame:
    """Run a finite streaming DataFrame to completion through a
    uniquely-named memory sink, snapshot the result, free the sink, and
    return the snapshot as a local (batch) DataFrame.

    The stream runs with STREAM_STATE_PARTITIONS shuffle partitions
    (restored after): a streaming query pins its state partitioning at
    start, so this is the one place the twins' state-store parallelism
    can be sized to their key counts.
    """
    spark = df.sparkSession
    name = f"{base_name}_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(STREAM_STATE_PARTITIONS))
    try:
        q = (
            df.writeStream.outputMode(output_mode)
            .format("memory")
            .queryName(name)
            .start()
        )
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    snap = spark.table(name)
    rows, schema = snap.collect(), snap.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)
