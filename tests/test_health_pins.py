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


def test_threshold_number_semantics(spark, warehouse, tables_dir):
    # JS Number(): 'nan'/'inf' are NaN -> 400; '' falls through `||`
    # to the default; whitespace coerces to 0 (-> api probe trips)
    for bad in ("nan", "inf", "1_000"):
        with pytest.raises(ValueError, match="invalid threshold"):
            _health(spark, warehouse, tables_dir, "api", threshold=bad)
    assert _health(spark, warehouse, tables_dir, "api", threshold="") == "0"
    body = _health(
        spark, warehouse, tables_dir, "api", threshold="  ", verbose=True
    )
    assert body["score"] == 1  # Number('  ') is 0 -> any probe exceeds


def test_orderbook_default_threshold_is_120s(spark, warehouse, tables_dir):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        HEALTH_DEFAULTS,
    )

    assert HEALTH_DEFAULTS["orderbook_etl"]["threshold1"] == 120


def test_empty_feed_gap_is_finite_epoch_zero(spark, warehouse, tables_dir):
    # getLatest resolves 0 for an empty scan and the gap is measured
    # from EPOCH ZERO -- a huge finite duration ('~49y' at the pinned
    # clock), NOT Infinity (reserved for validations_etl's empty max)
    body = _health(
        spark, warehouse, tables_dir, "forex_etl", verbose=True
    )
    assert body["score"] == 1
    assert body["gap"].endswith("y") and body["gap"] != "Infinity"


def test_validator_state_max_is_numeric_not_lexicographic(
    spark, tmp_path_factory, warehouse
):
    # a -05:00-offset instant that is numerically the NEWEST but
    # lexicographically the smallest, plus a 'None' sentinel that
    # would win a string MAX and crash a naive parse
    import os

    out = str(tmp_path_factory.mktemp("vstate"))
    spark.createDataFrame(
        [
            {"pubkey": "a", "last_ledger_time": "2019-02-07T10:00:00Z"},
            {"pubkey": "b", "last_ledger_time": "2019-02-07T09:30:00-05:00"},
            {"pubkey": "c", "last_ledger_time": "None"},
        ]
    ).write.mode("overwrite").parquet(os.path.join(out, "validator_state"))
    spark.createDataFrame(
        [{"close_time": "2014-10-04T00:07:30+00:00", "ledger_index": 1}]
    ).write.mode("overwrite").parquet(os.path.join(out, "control"))
    from rippled_historical_database_spark.plans.xrpl_etl import (
        check_health_xrpl,
    )

    # now = 110 s after the true newest (14:30Z): within the 120 s
    # default ONLY if the numeric max (not the 10:00Z string max) wins
    now_ms = (1549549800 + 110) * 1000.0
    assert (
        check_health_xrpl(
            spark, warehouse, "validations_etl",
            tables_dir=out, now_ms=now_ms,
        )
        == "0"
    )
