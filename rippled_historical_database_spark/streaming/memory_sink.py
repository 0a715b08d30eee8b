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

import uuid

from pyspark.sql import DataFrame


def run_to_memory(df: DataFrame, base_name: str, output_mode: str) -> DataFrame:
    """Run a finite streaming DataFrame to completion through a
    uniquely-named memory sink, snapshot the result, free the sink, and
    return the snapshot as a local (batch) DataFrame."""
    spark = df.sparkSession
    name = f"{base_name}_{uuid.uuid4().hex[:12]}"
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
    snap = spark.table(name)
    rows, schema = snap.collect(), snap.schema
    spark.catalog.dropTempView(name)
    return spark.createDataFrame(rows, schema)
