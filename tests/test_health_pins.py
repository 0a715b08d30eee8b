"""Reference pins for the health-check plane (checkHealth.js +
test.healthCheck.js): every mocha case replayed against the real
warehouse artifact, with the same seeded `control` row and the
reference's own mock/validator-state.json, at a pinned clock.
"""

from __future__ import annotations

import json
import os

import pytest

MOCK = "/root/reference/test/mock"
LEDGERS = os.path.join(MOCK, "ledgers")
pytestmark = pytest.mark.skipif(
    not os.path.isdir(LEDGERS), reason="reference mock ledgers not present"
)

# test.healthCheck.js:15-19 seeds last_validated close 2014-10-04, the
# fixture ledgers close 2017-05-12, and mock/validator-state.json's
# newest last_ledger_time is 2019-02-07 -- pin "now" after all three
# so every gap exceeds its threshold like the mocha run (whose seeded
# data is years older than its wall clock).
NOW_MS = 1554076800000.0  # 2019-04-01T00:00:00Z


@pytest.fixture(scope="module")
def warehouse(spark):
    from rippled_historical_database_spark.operators.golden import (
        warehouse_artifact,
    )

    return warehouse_artifact(spark)


@pytest.fixture(scope="module")
def tables_dir(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("health_tables"))
    spark.createDataFrame(
        [{"close_time": "2014-10-04T00:07:30+00:00",
          "ledger_index": 1234567}]
    ).write.mode("overwrite").parquet(os.path.join(out, "control"))
    state = json.load(open(os.path.join(MOCK, "validator-state.json")))
    rows = [
        {"pubkey": k, "last_ledger_time": str(v.get("last_ledger_time"))}
        for k, v in (
            state.items() if isinstance(state, dict)
            else ((r.get("validation_public_key", str(i)), r)
                  for i, r in enumerate(state))
        )
    ]
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        os.path.join(out, "validator_state")
    )
    return out


def _health(spark, warehouse, tables_dir, aspect, **kw):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        check_health_xrpl,
    )

    return check_health_xrpl(
        spark, warehouse, aspect, tables_dir=tables_dir, now_ms=NOW_MS, **kw
    )


def test_api_score_zero(spark, warehouse, tables_dir):
    assert _health(spark, warehouse, tables_dir, "api") == "0"


def test_api_verbose(spark, warehouse, tables_dir):
    body = _health(spark, warehouse, tables_dir, "api", verbose=True)
    assert body["score"] == 0
    assert body["message"] is None


def test_api_custom_threshold_trips(spark, warehouse, tables_dir):
    body = _health(
        spark, warehouse, tables_dir, "api",
        threshold=".0000001", verbose=True,
    )
    assert body["score"] == 1
    assert body["message"] == "response time exceeds threshold"


def test_invalid_threshold_errors(spark, warehouse, tables_dir):
    with pytest.raises(ValueError, match="invalid threshold"):
        _health(spark, warehouse, tables_dir, "api", threshold="z")


def test_invalid_aspect_errors(spark, warehouse, tables_dir):
    with pytest.raises(ValueError, match="invalid aspect type"):
        _health(spark, warehouse, tables_dir, "nope")


def test_importer_score_two(spark, warehouse, tables_dir):
    # fixture ledgers are months older than the pinned clock ->
    # ledger gap exceeds the 300 s default -> '2'
    assert _health(spark, warehouse, tables_dir, "importer") == "2"


def test_importer_verbose(spark, warehouse, tables_dir):
    body = _health(spark, warehouse, tables_dir, "importer", verbose=True)
    assert body["score"] == 2
    assert body["last_validated_ledger"] == 1234567
    assert body["message"] == "last ledger gap exceeds threshold"


def test_importer_infinity_threshold(spark, warehouse, tables_dir):
    # Number('Infinity') is legal: the ledger gap passes, the seeded
    # 2014 validation gap exceeds t2 -> score 1, threshold 'Infinity'
    body = _health(
        spark, warehouse, tables_dir, "importer",
        threshold="Infinity", verbose=True,
    )
    assert body["score"] == 1
    assert body["ledger_gap_threshold"] == "Infinity"
    assert body["message"] == "last validation gap exceeds threshold"


def test_validations_etl_stale(spark, warehouse, tables_dir):
    assert _health(spark, warehouse, tables_dir, "validations_etl") == "1"
    body = _health(
        spark, warehouse, tables_dir, "validations_etl", verbose=True
    )
    assert body["score"] == 1
    assert body["message"] == "last imported data exceeds threshold"


def test_validations_etl_infinity_threshold(spark, warehouse, tables_dir):
    body = _health(
        spark, warehouse, tables_dir, "validations_etl",
        threshold="Infinity", verbose=True,
    )
    assert body["score"] == 0
    assert body["gap_threshold"] == "Infinity"


def test_absent_external_tables_score_one(spark, warehouse, tables_dir):
    # the reference's empty-scan path: newest = 0 -> gap = forever
    for aspect in ("forex_etl", "trades_etl", "agg_trades_etl",
                   "orderbook_etl", "nodes_etl"):
        assert _health(spark, warehouse, tables_dir, aspect) == "1", aspect
