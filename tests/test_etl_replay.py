"""In-suite proof of the ETL replay laws at a small factor.

tools/etl_replay.py's committed x30/x100 throughput table (SCALE.md
section 1) rests on three laws; this runs the same code at x3 so the
laws are continuously verified by the suite, not only by the one-off
artifact: every table count exactly Nx the base corpus, the decimal
fee total exactly Nx, and XRP conservation over the replayed corpus.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
)

MOCK_DIR = "/root/reference/test/mock/ledgers"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock ledgers not present"
)


def test_replay_x3_nx_laws_and_throughput_fields(spark):
    from etl_replay import run

    base_result, base = run(spark, 1, None)
    assert base_result["laws_ok"]  # XRP conservation on the base corpus
    assert base_result["ledgers"] == 54
    assert set(base_result["stage_wall"]) == {
        "_parse", "_stage1", "_stage2", "_total",
    }
    assert len(base_result["table_wall"]) == 17

    result, counts = run(spark, 3, base)
    assert result["laws_ok"], result["violations"]
    assert result["ledgers"] == 162
    assert result["ledgers_per_sec"] > 0
    # spot-check the Nx counts the tool asserted internally
    for t in ("silver_transactions", "silver_escrows", "gold_candles_1m"):
        assert counts["counts"][t] == 3 * base["counts"][t], t
