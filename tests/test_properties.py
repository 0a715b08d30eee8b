"""Property-based invariants (hypothesis): the merge algebra and
pagination must hold for arbitrary splits, not just the ones the
example-based tests pick."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

import pytest

from rippled_historical_database_spark.sources.catalog import load_table
from rippled_historical_database_spark.streaming.incremental_gold import (
    merge_candles,
    partial_candles,
)

pytestmark = pytest.mark.usefixtures("spark")


@pytest.fixture(scope="module")
def events(spark, sf_dir):
    return load_table(spark, sf_dir, "events").cache()


@settings(max_examples=5, deadline=None)
@given(n_shards=st.integers(2, 7), offset=st.integers(0, 100))
def test_candle_merge_associative_for_any_split(request, n_shards, offset):
    """merge(partials of ANY disjoint split) == merge(one partial of the
    whole) -- the property that makes incremental maintenance, shuffles,
    and re-runs all agree (aggregation/exchanges.js's forceUpdate exists
    because the reference's merge is NOT race-free; ours is associative
    by construction)."""
    spark = request.getfixturevalue("spark")
    e = request.getfixturevalue("events")
    shard = F.pmod(F.col("event_id") + offset, F.lit(n_shards))
    partials = None
    for i in range(n_shards):
        p = partial_candles(e.filter(shard == i))
        partials = p if partials is None else partials.unionByName(p)
    split_result = merge_candles(partials)
    whole_result = merge_candles(partial_candles(e))
    cols = sorted(split_result.columns)
    a = sorted(map(tuple, split_result.select(*cols).collect()))
    b = sorted(map(tuple, whole_result.select(*cols).collect()))
    assert a == b


@settings(max_examples=5, deadline=None)
@given(page_size=st.integers(1, 97))
def test_pagination_complete_for_any_page_size(request, page_size):
    """Keyset pagination reproduces the prefix for ANY page size
    (reference test/utils.js walks only limit=1)."""
    e = request.getfixturevalue("events").select("event_id", "ts")
    target = 120
    full = [
        (r.ts, r.event_id)
        for r in e.orderBy("ts", "event_id").limit(target).collect()
    ]
    paged: list[tuple] = []
    marker = None
    while len(paged) < target:
        df = e
        if marker is not None:
            m_ts, m_id = marker
            df = df.filter(
                (F.col("ts") > F.lit(m_ts))
                | ((F.col("ts") == F.lit(m_ts)) & (F.col("event_id") > F.lit(m_id)))
            )
        rows = df.orderBy("ts", "event_id").limit(page_size).collect()
        if not rows:
            break
        paged.extend((r.ts, r.event_id) for r in rows)
        marker = (rows[-1].ts, rows[-1].event_id)
    assert paged[:target] == full
