"""Reference pins for the account-reports path (the accountPayments
aggregation + GET /v2/accounts/{address}/reports).

test.account.reports.js drives the route over buckets the test setup
derives from the SAME 54 imported ledgers this engine's warehouse is
built from (setup.importLedgers.js:128-140 feeds every parsed payment
to the aggregation from both perspectives), so the mocha expectations
transfer directly: 3 rows for r3fRiC… over 2015-01-14..16 (one real
bucket + two ZERO-FILLED spine days, data.js:398-405), inclusive day
bounds, descending reversal, and the accounts/payments render options.
The XRP-normalization law (normalize(), accountPayments.js:173-213) is
pinned on both an XRP bucket (value == delivered amount exactly) and
an IOU account whose values route through the bit-exact exchange-rate
operator.
"""

from __future__ import annotations

import os

import pytest

MOCK_DIR = "/root/reference/test/mock/ledgers"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock ledgers not present"
)

ACCOUNT = "r3fRiC42XCDHFkE4vLdJUhsVcx7hFbE5gU"   # test.account.reports.js:11
IOU_SENDER = "rJAeQMhtr89PvFPnAZXkdgJgScZ1YuB9UR"  # 36 CNY payments


@pytest.fixture(scope="module")
def warehouse(spark):
    from rippled_historical_database_spark.operators.golden import (
        warehouse_artifact,
    )

    return warehouse_artifact(spark)


def test_mocha_report_range(spark, warehouse):
    """test.account.reports.js:10-47: 3 rows for 2015-01-14..16, every
    date inside the inclusive bounds, zero-filled days carry empty
    buckets (the Bucket defaults, data.js:337-356)."""
    import datetime as dt

    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_reports_xrpl,
    )

    rows = get_account_reports_xrpl(
        spark, warehouse, ACCOUNT, "2015-01-14", "2015-01-16"
    ).collect()
    assert len(rows) == 3
    assert [r.date.date() for r in rows] == [
        dt.date(2015, 1, 14), dt.date(2015, 1, 15), dt.date(2015, 1, 16)
    ]
    assert all(r.account == ACCOUNT for r in rows)
    # the one real payment: received, 500 XRP, one sending counterparty
    first = rows[0]
    assert first.payments_received == 1 and first.payments_sent == 0
    assert first.sending_counterparties == 1
    assert first.receiving_counterparties == 0
    # XRP normalization: value == delivered amount exactly
    assert first.total_value_received == 500.0
    assert first.high_value_received == 500.0
    assert first.total_value == 500.0
    # zero-filled spine days
    for r in rows[1:]:
        assert r.payments_sent == 0 and r.payments_received == 0
        assert r.total_value == 0.0
        assert r.sending_counterparties == 0


def test_mocha_descending(spark, warehouse):
    """test.account.reports.js:49-…: descending reverses the spine."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_reports_xrpl,
    )

    asc = get_account_reports_xrpl(
        spark, warehouse, ACCOUNT, "2015-01-14", "2015-01-16"
    ).collect()
    desc = get_account_reports_xrpl(
        spark, warehouse, ACCOUNT, "2015-01-14", "2015-01-16",
        descending=True,
    ).collect()
    assert [r.date for r in desc] == [r.date for r in reversed(asc)]


def test_accounts_and_payments_options(spark, warehouse):
    """accountReports.js:31-43: accounts=true serves the counterparty
    ARRAYS; payments=true embeds the per-payment list."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_reports_xrpl,
    )

    (row,) = get_account_reports_xrpl(
        spark, warehouse, ACCOUNT, "2015-01-14", "2015-01-14",
        accounts=True, payments=True,
    ).collect()
    assert isinstance(row.sending_counterparties, list)
    assert len(row.sending_counterparties) == 1
    assert row.receiving_counterparties == []
    assert len(row.payments) == 1
    p = row.payments[0]
    assert p.type == "received" and p.currency == "XRP" and p.amount == 500.0


def test_iou_normalization_through_rate_operator(spark, warehouse):
    """normalize() (accountPayments.js:173-213): IOU values divide the
    delivered amount by the day's XRP exchange rate; counts and
    counterparty sets are rate-free and must reconcile against the raw
    payment table; total_value == sent + received."""
    from pyspark.sql import functions as F

    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_reports_xrpl,
        get_exchange_rate_xrpl,
    )

    rows = get_account_reports_xrpl(
        spark, warehouse, IOU_SENDER, "2015-01-14", "2015-01-14"
    ).collect()
    (r,) = rows
    p = (
        spark.read.parquet(os.path.join(warehouse, "silver_payments"))
        .filter(
            (F.col("source") == IOU_SENDER)
            | (F.col("destination") == IOU_SENDER)
        )
        .filter(F.to_date("executed_time") == F.lit("2015-01-14"))
    )
    sent = p.filter(F.col("source") == IOU_SENDER).collect()
    recv = p.filter(F.col("destination") == IOU_SENDER).collect()
    assert r.payments_sent == len(sent)
    assert r.payments_received == len(recv)
    assert r.receiving_counterparties == len({x.destination for x in sent})
    assert r.sending_counterparties == len({x.source for x in recv})
    assert r.total_value == pytest.approx(
        r.total_value_sent + r.total_value_received
    )
    # one payment's normalized value re-derived independently
    sample = next(x for x in sent if x.currency != "XRP")
    rate = get_exchange_rate_xrpl(
        spark, warehouse, "XRP",
        f"{sample.currency}+{sample.issuer}", date=str(sample.executed_time),
    ).first()["rate"]
    expected = sample.delivered_amount / rate if rate else 0.0
    assert r.high_value_sent >= expected - 1e-9
    assert r.total_value_sent >= expected - 1e-9


def test_option_errors(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_reports_xrpl,
    )

    with pytest.raises(ValueError, match="invalid date"):
        get_account_reports_xrpl(spark, warehouse, ACCOUNT, "bogus", "2015-01-16")
    with pytest.raises(ValueError):
        get_account_reports_xrpl(
            spark, warehouse, "not-an-address", "2015-01-14", "2015-01-16"
        )
