"""The driver-registered real-data queries assert true invariants of
the fixture corpus, not just Spark-vs-DuckDB agreement."""

from __future__ import annotations

import os

import pytest

from rippled_historical_database_spark.operators import golden as G

needs_fixtures = pytest.mark.skipif(
    not os.path.isdir(G.FIXTURE_LEDGERS), reason="no reference fixtures"
)


@needs_fixtures
def test_xrp_is_conserved_in_every_ledger(spark):
    df = G.golden_xrp_conservation(spark, "ignored")
    rows = df.collect()
    assert len(rows) == 54
    bad = [r["ledger_index"] for r in rows if not r["is_conserved"]]
    assert bad == [], f"XRP not conserved in ledgers {bad}"
    # the correction terms really were exercised by the corpus
    assert any(r["escrow_locked_drops"] != 0 for r in rows)
    assert any(r["paychan_released_drops"] != 0 for r in rows)


@needs_fixtures
def test_reference_golden_pair_present(spark):
    # test/exchanges.test.js: the USD.rMwjYedjc7... / XRP ledger holds 5
    # exchanges -- the published golden this repo's parsers match.
    df = G.golden_exchange_pair_stats(spark, "ignored")
    usd = [r for r in df.collect() if r["pair"].startswith("USD.rMwjYedjc7")]
    assert len(usd) == 1
    assert usd[0]["n_exchanges"] >= 5


@needs_fixtures
def test_tx_mix_covers_the_corpus(spark):
    df = G.golden_tx_type_results(spark, "ignored")
    rows = {(r["tx_type"], r["result"]): r["n"] for r in df.collect()}
    assert sum(rows.values()) == 933  # every fixture tx accounted for
    assert ("EscrowCreate", "tesSUCCESS") in rows
    assert ("PaymentChannelClaim", "tesSUCCESS") in rows


@needs_fixtures
def test_warehouse_artifact_reused(spark):
    p = G.warehouse_artifact(spark)
    marker = os.path.join(p, "_BUILT")
    stamp = os.stat(marker).st_mtime_ns
    assert G.warehouse_artifact(spark) == p
    assert os.stat(marker).st_mtime_ns == stamp, "warehouse was rebuilt"
