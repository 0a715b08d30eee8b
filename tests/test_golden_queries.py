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


@needs_fixtures
def test_every_fixture_ledger_flows_through_the_warehouse(spark):
    """The warehouse build must ingest EVERY fixture file -- including
    the later-era escrow (29136413) and paychan (29709909) ledgers the
    reference imports in test/setup.importLedgers.js -- one bronze row
    per fixture, no silent drops."""
    import glob
    import json
    import os

    paths = sorted(glob.glob(os.path.join(G.FIXTURE_LEDGERS, "*.json")))
    expected = set()
    for p in paths:
        with open(p) as f:
            led = json.load(f)
        expected.add(int(led.get("ledger_index") or led["seqNum"]))
    bronze = spark.read.parquet(
        os.path.join(G.warehouse_artifact(spark), "bronze_ledgers")
    )
    got = {r.ledger_index for r in bronze.select("ledger_index").collect()}
    assert got == expected
    assert len(paths) == 54  # the reference's full corpus, not a subset
    assert {29136413, 29709909} <= got


@needs_fixtures
def test_escrow_paychan_lifecycle_matches_reference_fixtures(spark):
    """The published fixture values: 29136413's EscrowCreate locks
    exactly 100 XRP; 29709909's two PaymentChannelClaims release
    0.223509 XRP each (447018 drops total)."""
    rows = {
        r["change_type"]: r
        for r in G.golden_escrow_paychan_lifecycle(spark, "ignored").collect()
    }
    esc = rows["escrow_create"]
    assert esc["tx_type"] == "EscrowCreate"
    assert esc["n_rows"] == 1
    assert esc["net_change_drops"] == -100_000_000
    assert esc["escrow_locked_drops"] == 100_000_000
    pay = rows["paychannel_payout"]
    assert pay["tx_type"] == "PaymentChannelClaim"
    assert pay["n_rows"] == 2
    assert pay["net_change_drops"] == 447_018
