"""Round-11 operator laws: streaming Bollinger twin, top currencies."""

from __future__ import annotations

import pytest


def test_stream_bollinger_equals_batch(spark, sf_dir):
    """The streamed Bollinger rows must equal window_bollinger_bands
    row-for-row -- same EXACT arithmetic (decimal window sums, IEEE
    stddev, HALF_UP 6-decimal round), so equality is bitwise, not
    epsilon."""
    from rippled_historical_database_spark.operators.candles import (
        window_bollinger_bands,
    )
    from rippled_historical_database_spark.streaming.rsi_stream import (
        stream_bollinger_bands,
    )

    batch = window_bollinger_bands(spark, sf_dir).collect()
    streamed = stream_bollinger_bands(spark, sf_dir).collect()
    assert len(batch) == len(streamed) > 0
    for b, s in zip(batch, streamed):
        assert (b.pair, b.bucket) == (s.pair, s.bucket)
        assert b.close == s.close
        assert b.mid == s.mid, (b.pair, b.bucket)
        assert b.upper == s.upper, (b.pair, b.bucket)
        assert b.lower == s.lower, (b.pair, b.bucket)
        assert b.breakout == s.breakout


def test_bollinger_state_is_ring_bounded():
    """The per-pair state is exactly the BB_N-close ring: feeding 10x
    BB_N bars leaves at most BB_N doubles in state (bounded by live
    pairs, never history)."""
    import pandas as pd

    from rippled_historical_database_spark.operators.candles import BB_N
    from rippled_historical_database_spark.streaming.rsi_stream import (
        _update_bollinger,
    )

    class FakeState:
        exists = False

        def __init__(self):
            self.stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v
            self.exists = True

    st = FakeState()
    bars = pd.DataFrame(
        {
            "bucket": pd.date_range("2024-01-01", periods=10 * BB_N, freq="h"),
            "c": [float(i % 17) + 0.125 for i in range(10 * BB_N)],
        }
    )
    out = list(_update_bollinger(("XRP/USD",), iter([bars]), st))
    assert len(st.stored[0]) == BB_N
    # emission starts at the first full window
    assert len(out[0]) == 10 * BB_N - (BB_N - 1)


def test_top_currencies_rank_properties(spark, sf_dir):
    """Per-day ranks are 1..k contiguous, normalized volume is
    non-increasing within a day, and every (date, currency) is unique."""
    from rippled_historical_database_spark.operators.topk import (
        top_currencies_daily,
    )

    rows = top_currencies_daily(spark, sf_dir).collect()
    assert rows
    by_day: dict = {}
    for r in rows:
        by_day.setdefault(r.date, []).append(r)
    for day, rs in by_day.items():
        ranks = [r.rank for r in rs]
        assert ranks == list(range(1, len(rs) + 1)), day
        vols = [r.normalized_volume for r in rs]
        assert all(a >= b for a, b in zip(vols, vols[1:])), day
        assert len({r.currency for r in rs}) == len(rs)


def test_top_currencies_normalization_is_rate_division(spark, sf_dir):
    """normalized_volume * day rate == payment+exchange volume (the
    aggregation pipeline's XRP normalization, inverted)."""
    from pyspark.sql import functions as F

    from rippled_historical_database_spark.functions.numeric import dsum
    from rippled_historical_database_spark.operators.topk import (
        top_currencies_daily,
    )
    from rippled_historical_database_spark.sources.catalog import load_table

    e = load_table(spark, sf_dir, "events")
    rate = {
        r.date: r.rate
        for r in e.filter(F.col("event_type") == "click")
        .groupBy(F.date_trunc("day", "ts").alias("date"))
        .agg((dsum("value") / F.count("value")).alias("rate"))
        .collect()
    }
    for r in top_currencies_daily(spark, sf_dir).collect():
        raw = (r.payment_volume or 0.0) + (r.exchange_volume or 0.0)
        assert r.normalized_volume == pytest.approx(raw / rate[r.date])


def test_stream_stochastic_equals_batch(spark, sf_dir):
    """streamed == batch row-for-row, bitwise (same exact arithmetic)."""
    from rippled_historical_database_spark.operators.candles import (
        window_stochastic_oscillator,
    )
    from rippled_historical_database_spark.streaming.rsi_stream import (
        stream_stochastic_oscillator,
    )

    batch = window_stochastic_oscillator(spark, sf_dir).collect()
    streamed = stream_stochastic_oscillator(spark, sf_dir).collect()
    assert len(batch) == len(streamed) > 0
    for b, s in zip(batch, streamed):
        assert (b.pair, b.bucket) == (s.pair, s.bucket)
        assert b.pct_k == s.pct_k, (b.pair, b.bucket)
        assert b.pct_d == s.pct_d, (b.pair, b.bucket)


def test_stream_keltner_equals_batch(spark, sf_dir):
    """streamed == batch row-for-row, bitwise (the two EMA folds
    replicated digit-for-digit with six scalars of state)."""
    from rippled_historical_database_spark.operators.candles import (
        window_keltner_channels,
    )
    from rippled_historical_database_spark.streaming.rsi_stream import (
        stream_keltner_channels,
    )

    batch = window_keltner_channels(spark, sf_dir).collect()
    streamed = stream_keltner_channels(spark, sf_dir).collect()
    assert len(batch) == len(streamed) > 0
    for b, s in zip(batch, streamed):
        assert (b.pair, b.bucket) == (s.pair, s.bucket)
        assert b.mid == s.mid, (b.pair, b.bucket)
        assert b.upper == s.upper, (b.pair, b.bucket)
        assert b.lower == s.lower, (b.pair, b.bucket)


def test_keltner_state_is_six_scalars():
    """The Keltner fold state never grows: after 1000 bars it is still
    (i, s_tp, s_tr, ema, atr, prev_close)."""
    import pandas as pd

    from rippled_historical_database_spark.streaming.rsi_stream import (
        _update_keltner,
    )

    class FakeState:
        exists = False

        def __init__(self):
            self.stored = None

        @property
        def get(self):
            return self.stored

        def update(self, v):
            self.stored = v
            self.exists = True

    st = FakeState()
    bars = pd.DataFrame(
        {
            "bucket": pd.date_range("2024-01-01", periods=1000, freq="h"),
            "high": [float(i % 13) + 2.0 for i in range(1000)],
            "low": [float(i % 13) for i in range(1000)],
            "close": [float(i % 13) + 1.0 for i in range(1000)],
        }
    )
    out = list(_update_keltner(("XRP/USD",), iter([bars]), st))
    assert len(st.stored) == 6
    assert st.stored[0] == 1000
    assert len(out[0]) == 1000 - 19  # emits from bar KC_N onward


@pytest.mark.parametrize(
    "batch_name,stream_name,cols",
    [
        ("window_macd", "stream_macd", ("macd", "signal", "histogram")),
        ("window_obv", "stream_obv", ("obv",)),
        ("window_rsi_cutler", "stream_rsi_cutler", ("rsi",)),
    ],
)
def test_stream_twin_equals_batch(spark, sf_dir, batch_name, stream_name, cols):
    """The family-completion law: every remaining batch indicator's
    streaming twin matches it row-for-row, bitwise."""
    from rippled_historical_database_spark.plans.registry import all_queries

    qs = all_queries()
    batch = qs[batch_name].spark(spark, sf_dir).collect()
    streamed = qs[stream_name].spark(spark, sf_dir).collect()
    assert len(batch) == len(streamed) > 0
    for b, s in zip(batch, streamed):
        assert (b.pair, b.bucket) == (s.pair, s.bucket)
        for c in cols:
            assert getattr(b, c) == getattr(s, c), (batch_name, b.pair, b.bucket, c)


def test_every_window_indicator_has_a_stream_twin():
    """Registry-level completeness: each window_* indicator over the
    per-pair hourly series has a stream_* twin sharing its oracle
    (window_max_drawdown's twin runs in UPDATE mode -- a running
    aggregate revised per micro-batch -- and window_ichimoku's twin
    keeps the batch name stream_ichimoku)."""
    from rippled_historical_database_spark.plans.registry import all_queries

    qs = all_queries()
    twins = {
        "window_max_drawdown": "stream_max_drawdown",
        "window_rsi_wilder": "stream_rsi_wilder",
        "window_atr_wilder": "stream_atr_wilder",
        "window_ichimoku": "stream_ichimoku",
        "window_bollinger_bands": "stream_bollinger_bands",
        "window_stochastic_oscillator": "stream_stochastic_oscillator",
        "window_keltner_channels": "stream_keltner_channels",
        "window_macd": "stream_macd",
        "window_obv": "stream_obv",
        "window_rsi_cutler": "stream_rsi_cutler",
    }
    for batch_name, stream_name in twins.items():
        assert batch_name in qs, batch_name
        assert stream_name in qs, stream_name


def test_stream_max_drawdown_equals_batch(spark, sf_dir):
    """The update-mode twin's last revision per pair equals the batch
    final aggregate, bitwise."""
    from rippled_historical_database_spark.operators.candles import (
        window_max_drawdown,
    )
    from rippled_historical_database_spark.streaming.rsi_stream import (
        stream_max_drawdown,
    )

    batch = window_max_drawdown(spark, sf_dir).collect()
    streamed = stream_max_drawdown(spark, sf_dir).collect()
    assert len(batch) == len(streamed) > 0
    for b, s in zip(batch, streamed):
        assert b.pair == s.pair
        assert b.n_hours == s.n_hours
        assert b.max_drawdown == s.max_drawdown, b.pair
