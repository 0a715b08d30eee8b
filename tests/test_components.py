"""Connected components (large-star/small-star) on adversarial graph
shapes: a chain (max diameter), two components, and a star.  Asserts
O(log n) round convergence and that the per-round persist chain stays
bounded (only the current round's relation cached) -- the 100 TB
property the one-hop label-propagation version lacked.
"""

from __future__ import annotations

import math

import pytest

from rippled_historical_database_spark.operators.dedup import (
    CC_MAX_ROUNDS,
    connected_components_labels,
)


def _labels(spark, edges: list[tuple[int, int]]) -> tuple[dict[int, int], int]:
    df = spark.createDataFrame(edges, "doc_a long, doc_b long")
    out, rounds = connected_components_labels(df)
    return {r["node"]: r["label"] for r in out.collect()}, rounds


def test_chain_graph_converges_in_log_rounds(spark):
    # 0-1-2-...-63: diameter 63.  One-hop propagation needs ~diameter
    # rounds; large-star/small-star must stay O(log n).
    n = 64
    labels, rounds = _labels(spark, [(i, i + 1) for i in range(n - 1)])
    assert labels == {i: 0 for i in range(n)}
    assert rounds <= math.ceil(math.log2(n)) + 2, rounds
    assert rounds <= CC_MAX_ROUNDS


def test_two_components_and_reversed_edge_order(spark):
    labels, _ = _labels(spark, [(5, 3), (3, 9), (20, 30), (30, 21)])
    assert labels == {3: 3, 5: 3, 9: 3, 20: 20, 21: 20, 30: 20}


def test_star_graph_is_a_fixed_point(spark):
    labels, rounds = _labels(spark, [(0, i) for i in range(1, 33)])
    assert labels == {i: 0 for i in range(33)}
    assert rounds <= 2, rounds


def test_duplicate_and_self_edges_are_tolerated(spark):
    labels, _ = _labels(spark, [(1, 2), (2, 1), (1, 1), (2, 3)])
    assert labels == {1: 1, 2: 1, 3: 1}


def test_empty_graph(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    out, _ = connected_components_labels(df)
    assert out.count() == 0


def test_persist_chain_stays_bounded(spark):
    """Per-round relations must be unpersisted as they are superseded:
    cached state after a run is O(1) relations, not O(rounds)."""
    jsc = spark.sparkContext._jsc.sc()

    def n_cached() -> int:
        return jsc.getPersistentRDDs().size()

    spark.catalog.clearCache()
    before = n_cached()
    n = 128  # chain: enough rounds that an O(rounds) leak is visible
    df = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    out, rounds = connected_components_labels(df)
    out.count()
    assert rounds >= 3  # the leak scenario really was exercised
    leaked = n_cached() - before
    assert leaked <= 2, (
        f"{leaked} relations left cached after {rounds} rounds -- "
        "per-round persists are accumulating"
    )


def test_self_pair_only_nodes_become_singletons(spark):
    # A node appearing only as (x, x) has no real edge but IS a node of
    # the duplicate graph: it must label itself, exactly as the
    # recursive-CTE oracle and one-hop propagation would.
    labels, _ = _labels(spark, [(1, 2), (7, 7)])
    assert labels == {1: 1, 2: 1, 7: 7}
