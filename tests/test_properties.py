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
    # yield + unpersist: Spark's cache keys on the LOGICAL plan, so a
    # leaked module-scope cache turns every later load_table("events")
    # -- including test_plan_quality's scan/shuffle-shape assertions --
    # into an InMemoryTableScan (order-dependent failures whenever this
    # module runs first).
    df = load_table(spark, sf_dir, "events").cache()
    yield df
    df.unpersist()


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


# ---------------------------------------------------------------------------
# Real-data parser algebra
# ---------------------------------------------------------------------------

@settings(max_examples=3, deadline=None)
@given(
    quals=st.lists(
        st.tuples(
            st.integers(80, 120),            # exponent byte
            st.integers(1, 16**14 - 1),      # mantissa
            st.sampled_from(["XRP", "USD"]),  # pays currency
            st.sampled_from(["XRP", "JPY"]),  # gets currency
        ),
        min_size=1,
        max_size=20,
    )
)
def test_quality_decode_matches_decimal(request, quals):
    """The conv-arithmetic BookDirectory decode equals the exact Decimal
    computation (quality.js:5-21) for arbitrary exponent/mantissa."""
    from decimal import Decimal

    from rippled_historical_database_spark.operators.xrpl_silver import _quality_rate

    spark = request.getfixturevalue("spark")
    rows = [
        (f"{'0' * 48}{e:02X}{m:014X}", p, g) for e, m, p, g in quals
    ]
    df = spark.createDataFrame(rows, ["bd", "pays", "gets"])
    got = df.select(
        _quality_rate(F.col("bd"), F.col("pays"), F.col("gets")).alias("q")
    ).collect()
    for (e, m, p, g), r in zip(quals, got):
        shift = (-6 if p == "XRP" else 0) - (-6 if g == "XRP" else 0)
        exp = Decimal(m) * Decimal(10) ** (e - 100 + shift)
        assert abs(r.q - float(exp)) <= 1e-12 * float(exp)


@settings(max_examples=3, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(
            st.sampled_from(["XRP", "USD", "EUR", "CNY", "jpy"]),
            st.one_of(st.none(), st.sampled_from(["rAAA", "rZZZ", "rMid"])),
            st.sampled_from(["XRP", "USD", "BTC"]),
            st.one_of(st.none(), st.sampled_from(["rAAA", "rZZZ"])),
        ),
        min_size=1,
        max_size=20,
    )
)
def test_canonical_ordering_idempotent(request, pairs):
    """Canonicalizing a pair twice is the identity, and canonical order
    always holds post-swap (the exchanges.js orderPair algebra) --
    including the JS 'undefined' issuer quirk."""
    spark = request.getfixturevalue("spark")
    rows = [(bc, bi, cc, ci) for bc, bi, cc, ci in pairs]
    df = spark.createDataFrame(
        rows, "b_cur string, b_iss string, c_cur string, c_iss string"
    )
    c1 = F.lower(F.concat(F.col("b_cur"), F.coalesce(F.col("b_iss"), F.lit("undefined"))))
    c2 = F.lower(F.concat(F.col("c_cur"), F.coalesce(F.col("c_iss"), F.lit("undefined"))))
    swap = c2 < c1
    out = df.select(
        F.when(swap, F.col("c_cur")).otherwise(F.col("b_cur")).alias("b_cur"),
        F.when(swap, F.col("c_iss")).otherwise(F.col("b_iss")).alias("b_iss"),
        F.when(swap, F.col("b_cur")).otherwise(F.col("c_cur")).alias("c_cur"),
        F.when(swap, F.col("b_iss")).otherwise(F.col("c_iss")).alias("c_iss"),
    )
    for r in out.collect():
        k1 = (r.b_cur + (r.b_iss or "undefined")).lower()
        k2 = (r.c_cur + (r.c_iss or "undefined")).lower()
        assert k1 <= k2  # canonical; applying the swap again is identity


@settings(max_examples=8, deadline=None)
@given(
    gaps=st.lists(
        # offsets around the gap (gap=100): -100 clamps spacing to 0 so
        # the duplicate-timestamp tie-break path is actually generated
        st.sampled_from([-100, -1, 0, 1, 3600, 10**9]),
        min_size=1,
        max_size=8,
    )
)
def test_sessionize_boundary_semantics(request, gaps):
    """Generated inter-event spacings AT the gap boundary: the session
    split must follow the strict > gap rule exactly -- spacing == gap
    (offset 0) stays ONE session; spacing == gap + 1 second splits.
    Equal timestamps (offset makes spacing 0) also stay together.
    Verified against a pure-Python reference fold."""
    import datetime as dt

    from rippled_historical_database_spark.operators.sessions import sessionize

    spark = request.getfixturevalue("spark")
    gap = 100  # seconds, small for test speed
    t0 = dt.datetime(2024, 1, 1)
    ts_list = [t0]
    for g in gaps:
        # next event is (gap + g) seconds after the previous; clamp >= 0
        ts_list.append(ts_list[-1] + dt.timedelta(seconds=max(gap + g, 0)))
    rows = [(1, t, i, 1.0) for i, t in enumerate(ts_list)]
    df = spark.createDataFrame(
        rows, "user_id long, ts timestamp, event_id long, value double"
    )
    got = [
        (r.session_start, r.session_end, r.n_events)
        for r in sessionize(df, gap_seconds=gap).collect()
    ]

    # pure-Python reference fold of the same strict-> rule
    expected = []
    cur = [ts_list[0]]
    for prev, t in zip(ts_list, ts_list[1:]):
        if (t - prev).total_seconds() > gap:
            expected.append(cur)
            cur = [t]
        else:
            cur.append(t)
    expected.append(cur)
    exp = [(s[0], s[-1], len(s)) for s in expected]
    assert got == exp
