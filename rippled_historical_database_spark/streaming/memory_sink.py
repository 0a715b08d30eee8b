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

from ..functions.localrel import local_df

# State-store parallelism override for FEW-KEY stateful twins (the
# per-pair indicator streams: ~4 keys).  A stateful query creates (and
# commits, every micro-batch) one state-store partition per shuffle
# partition, so at 4 keys the session default of 32 mostly schedules
# empty-store commits (~2.5-3 s/batch vs ~0.9 s at 8 -- SCALE.md
# round-12 note).  Key-HEAVY twins (the account-bucket and pHash
# registries: 10k-160k keys) must NOT be narrowed: the per-key Python
# work is the cost there and 8 partitions starve the 32 cores
# (measured at the 10x corpus: 86.5 s at 8 vs 38.9 s at 32).  Callers
# therefore opt in per stream; default = leave the session setting.
FEW_KEY_STATE_PARTITIONS = int(
    os.environ.get("SPARK_GRAFT_STREAM_STATE_PARTITIONS", "8")
)


def run_to_memory(
    df: DataFrame,
    base_name: str,
    output_mode: str,
    state_partitions: int | None = None,
) -> DataFrame:
    """Run a finite streaming DataFrame to completion through a
    uniquely-named memory sink, snapshot the result, free the sink, and
    return the snapshot as a local (batch) DataFrame.

    ``state_partitions`` (optional) scopes
    ``spark.sql.shuffle.partitions`` for the stream's lifetime (a
    streaming query pins its state partitioning at start) -- pass
    FEW_KEY_STATE_PARTITIONS for per-pair twins, leave None for
    key-heavy state.
    """
    spark = df.sparkSession
    name = f"{base_name}_{uuid.uuid4().hex[:12]}"
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    if state_partitions is not None:
        spark.conf.set("spark.sql.shuffle.partitions", str(state_partitions))
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
    # local_df: the drained snapshot is re-entered as a local relation
    # that every downstream action (oracle compare, noop eval) re-reads;
    # the Arrow form scans JVM-side instead of paying Python unpickle
    # workers per evaluation (functions/localrel.py).
    return local_df(spark, rows, schema)
