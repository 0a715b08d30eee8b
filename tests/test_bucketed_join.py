"""Bucketing: the production layout for fact-fact joins (SURVEY.md §4 --
the reference co-locates by rowkey design; Spark co-locates by bucketed
tables).  A join between two tables bucketed+sorted on the join key must
plan with NO shuffle exchange -- at 100 TB that is the difference between
a metadata operation and reshuffling both fact tables."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from rippled_historical_database_spark.sources.catalog import load_table


@pytest.fixture(scope="module")
def bucketed_tables(spark, sf_dir, tmp_path_factory):
    warehouse = str(tmp_path_factory.mktemp("warehouse"))
    spark.sql(f"CREATE DATABASE IF NOT EXISTS bucketdemo LOCATION '{warehouse}'")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    (
        o.write.mode("overwrite")
        .bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .saveAsTable("bucketdemo.orders_b")
    )
    (
        l.write.mode("overwrite")
        .bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .saveAsTable("bucketdemo.lineitem_b")
    )
    yield "bucketdemo.orders_b", "bucketdemo.lineitem_b"
    spark.sql("DROP DATABASE bucketdemo CASCADE")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    ot, lt = bucketed_tables
    o = spark.table(ot)
    l = spark.table(lt)
    # At test scale Catalyst would broadcast; disable it to exercise the
    # sort-merge path that dominates fact-fact joins at 100 TB.
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(l, o.o_orderkey == l.l_orderkey).groupBy("o_orderkey").agg(
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double").alias("total")
        )
        plan = joined._sc._jvm.PythonSQLUtils.explainString(
            joined._jdf.queryExecution(), "formatted"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    assert "SortMergeJoin" in plan, plan
    # No exchange feeding the join: bucketing provides the partitioning.
    assert "Exchange hashpartitioning(o_orderkey" not in plan, plan
    assert "Exchange hashpartitioning(l_orderkey" not in plan, plan


def test_bucketed_join_matches_unbucketed(spark, sf_dir, bucketed_tables):
    ot, lt = bucketed_tables
    bucketed = (
        spark.table(ot)
        .join(spark.table(lt), F.col("o_orderkey") == F.col("l_orderkey"))
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    plain = (
        load_table(spark, sf_dir, "orders")
        .join(
            load_table(spark, sf_dir, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        .groupBy("o_orderkey")
        .agg(F.count("*").alias("n"))
    )
    a = sorted(map(tuple, bucketed.collect()))
    b = sorted(map(tuple, plain.collect()))
    assert a == b
