"""Table catalog over the driver-provided parquet tables.

The reference's ~50 HBase tables with handcrafted composite string row keys
(``lib/hbase/hbase-thrift/data.js:2625-3087``) collapse in Spark to plain
columnar tables with typed columns; the rowkey apparatus (zero-padded
numerics, YYYYMMDDHHmmss strings, inverse timestamps) is replaced by
ordinary ORDER BY / WHERE on typed columns, which Catalyst pushes down to
the parquet scan (predicate pushdown + column pruning for free).

Schemas are declared explicitly (never inferred) so a bad file fails fast
at read time -- the reference's stringly-typed cells required ``Number()``
coercion at ~50 read sites (``data.js:193-217``); explicit StructType
removes that class of bug.

At 100 TB these tables would be date-partitioned (events by day,
lineitem by ship month) and bucketed on their join keys; the loader keeps
a single read path so the same plans work on a directory of partitioned
parquet as on the single-file test inputs.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

# Explicit schema per table (matches the driver-generated parquet;
# see TESTDATA.md).  ts fields are parquet TIMESTAMP which Spark reads as
# TimestampType in the UTC session zone.
TABLES: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    # events.ts is parquet TIMESTAMP(NANOS): Spark reads it as LongType
    # (nanosAsLong) and the loader truncates to a microsecond timestamp --
    # the same ns->us conversion DuckDB applies on read.
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.LongType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}

DEFAULT_SF_DIR = "/root/testdata/sf0.001"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one table.  The explicit schema lets Catalyst prune columns
    and push filters without a footer-inference pass per query."""
    path = os.path.join(sf_dir, f"{name}.parquet")
    df = spark.read.schema(TABLES[name]).parquet(path)
    if name == "events":
        from pyspark.sql import functions as F

        # integer `div`, not `/`: float division is lossy at ns-epoch scale
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every table as a temp view so plans can be written in SQL.

    Catalyst produces identical plans for DataFrame and SQL forms; views
    make the oracle-SQL and the Spark plan visually comparable.
    """
    for name in TABLES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
