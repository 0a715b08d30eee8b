"""Round-10 laws: the sketch-served decile drift (plan shape + bin-width
error bound + size dispatch) and the streaming Ichimoku twin."""

from __future__ import annotations

import pytest

from rippled_historical_database_spark.plans.registry import all_queries


@pytest.fixture(scope="module")
def qs():
    return all_queries()


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _window_has_aggregated_input(plan: str) -> bool:
    """True iff every Window's input relation is aggregate output, not
    raw scan rows.  Tree strings print a node's subtree directly below
    it with the primary input branch first, so the FIRST HashAggregate
    / FileScan encountered after a Window line is what that window
    actually ranks over: a FileScan first means the window sorts raw
    rows -- the 2-partition global-rank shape this test forbids.
    (A mere HashAggregate-anywhere-below check is vacuous: the
    broadcast MIN(ts) cut subtree puts an aggregate below every plan.)"""
    lines = plan.splitlines()
    for i, ln in enumerate(lines):
        if "Window" not in ln:
            continue
        for nxt in lines[i + 1:]:
            if "HashAggregate" in nxt:
                break  # window input is the bounded aggregated relation
            if "Scan parquet" in nxt:
                return False  # window ranks raw scan rows
    return True


def test_drift_sketch_plan_has_no_raw_row_rank(spark, sf_dir, qs):
    """The sketch-served form must aggregate raw events down to
    (half, bin) counts BEFORE any Window runs: its windows operate on
    the bounded bin relation only, and no row_number appears at all."""
    df = qs["profile_quantile_drift_sketch"].spark(spark, sf_dir)
    plan = _executed_plan(df)
    assert "row_number" not in plan.lower(), plan
    assert _window_has_aggregated_input(plan), (
        "a Window reads raw scan output (2-partition global-rank "
        "shape):\n" + plan
    )


def test_drift_exact_plan_fails_the_same_assertion(spark, sf_dir):
    """Negative control: the exact-rank form (the small-input oracle)
    IS the raw-row-rank shape, so the discriminator must reject it --
    proving the sketch-plan test above can actually fail."""
    from rippled_historical_database_spark.operators.profiling import (
        quantile_drift_exact_plan,
    )

    plan = _executed_plan(quantile_drift_exact_plan(spark, sf_dir))
    assert "row_number" in plan.lower()
    assert not _window_has_aggregated_input(plan)


def test_drift_dispatch_serves_sketch_above_threshold(
    spark, sf_dir, qs, monkeypatch
):
    """profile_quantile_drift switches to the histogram form above
    DRIFT_EXACT_MAX_ROWS: force the threshold to 0 and the served rows
    must equal profile_quantile_drift_sketch exactly."""
    from rippled_historical_database_spark.operators import profiling

    monkeypatch.setattr(profiling, "DRIFT_EXACT_MAX_ROWS", 0)
    served = profiling.profile_quantile_drift(spark, sf_dir)
    plan = _executed_plan(served)
    assert "row_number" not in plan.lower()
    got = sorted(map(tuple, served.collect()))
    want = sorted(
        map(
            tuple,
            qs["profile_quantile_drift_sketch"].spark(spark, sf_dir).collect(),
        )
    )
    assert got == want


def test_stream_ichimoku_equals_batch(spark, sf_dir, qs):
    """The stateful replay (52-bar ring + 26-deep displacement queues
    per pair) must reproduce window_ichimoku row-for-row, including the
    NULL chikou tail and the bar-78 warmup cut."""
    batch = sorted(
        map(tuple, qs["window_ichimoku"].spark(spark, sf_dir).collect())
    )
    streamed = sorted(
        map(tuple, qs["stream_ichimoku"].spark(spark, sf_dir).collect())
    )
    assert batch, "empty ichimoku batch result -- fixture too short"
    assert streamed == batch


def test_stream_ichimoku_state_is_bounded(spark, sf_dir):
    """Replaying twice as many bars must not grow the per-pair state:
    ring capped at ICHI_S, queues at ICHI_K (the boundedness claim)."""
    from rippled_historical_database_spark.operators.candles import (
        ICHI_K,
        ICHI_S,
    )
    from rippled_historical_database_spark.streaming.rsi_stream import (
        _update_ichimoku,
    )

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

    import pandas as pd

    bars = pd.DataFrame(
        {
            "bucket": pd.date_range("2024-01-01", periods=500, freq="h"),
            "high": [100.0 + (i % 7) for i in range(500)],
            "low": [99.0 - (i % 5) for i in range(500)],
            "close": [99.5 + (i % 3) for i in range(500)],
        }
    )
    st = FakeState()
    list(_update_ichimoku(("P",), iter([bars]), st))
    n, highs, lows, pend_a, pend_b = st.value
    assert n == 500
    assert len(highs) == len(lows) == ICHI_S
    assert len(pend_a) == len(pend_b) == ICHI_K


def test_drift_sketch_within_one_bin_of_exact(spark, sf_dir, qs):
    """Error bound: each sketch decile is the lower edge of the bin
    holding the exact decile, so 0 <= exact - sketch <= DRIFT_BIN_W."""
    from rippled_historical_database_spark.operators.profiling import (
        DRIFT_BIN_W,
    )

    exact = {
        r["decile"]: r
        for r in qs["profile_quantile_drift"].spark(spark, sf_dir).collect()
    }
    sk = {
        r["decile"]: r
        for r in qs["profile_quantile_drift_sketch"]
        .spark(spark, sf_dir)
        .collect()
    }
    assert set(exact) == set(sk) == set(range(1, 10))
    for d in range(1, 10):
        for c in ("v_early", "v_late"):
            gap = exact[d][c] - sk[d][c]
            assert 0 <= gap <= DRIFT_BIN_W, (d, c, exact[d][c], sk[d][c])
