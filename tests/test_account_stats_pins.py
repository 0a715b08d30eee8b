"""Reference pins for the account-stats plane.

Serving contract: api/routes/accountStats.js over the
agg_account_stats / agg_account_balance_changes tables
(hbase-thrift/data.js getAccountStats, :699-786).  Pinned two ways:
(1) every case of the reference's own mocha suite
(test.account.stats.js) over gold parquet seeded from the same mock
fixtures it putRow-seeds into HBase -- including the LITERAL
`account|YYYYMMDDHHmmss` marker string its link-header test asserts;
(2) the warehouse BUILDER's accounting laws over real fixture data
(counts close against silver_transactions / silver_balance_changes).

Mirrored quirks: the stop bound is the raw parsed end instant
(hbaseFormatSTARTRow, end-exclusive with NO +1-granule ceiling --
unlike every other read path), and a sub-day range floors start to
its day (`if (!days) start.startOf('day')`).
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

MOCK = "/root/reference/test/mock"
LEDGERS = os.path.join(MOCK, "ledgers")
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(MOCK, "account-stats-tx.json")),
    reason="reference mock fixtures not present",
)

ACCOUNT = "r3fRiC42XCDHFkE4vLdJUhsVcx7hFbE5gU"  # test.account.stats.js:12


@pytest.fixture(scope="module")
def stats_dir(spark, tmp_path_factory):
    """Seed both gold tables from the mocha fixtures, exactly like
    test.account.stats.js putRow-seeds HBase (20 daily rows each,
    2015-01-01..2015-01-20)."""
    out = str(tmp_path_factory.mktemp("account_stats"))
    tx = json.load(open(os.path.join(MOCK, "account-stats-tx.json")))
    val = json.load(open(os.path.join(MOCK, "account-stats-value.json")))
    tx_rows = [
        {
            "account": ACCOUNT,
            "date": dt.datetime.strptime(r["date"], "%Y-%m-%dT%H:%M:%SZ"),
            "transaction_count": r["transaction_count"],
            "type": {k: int(v) for k, v in r["type"].items()},
            "result": {k: int(v) for k, v in r["result"].items()},
        }
        for r in tx
    ]
    val_rows = [
        {
            "account": ACCOUNT,
            "date": dt.datetime.strptime(r["date"], "%Y-%m-%dT%H:%M:%SZ"),
            "account_value": r["account_value"],
            "balance_change_count": int(r["balance_change_count"]),
        }
        for r in val
    ]
    spark.createDataFrame(tx_rows).write.mode("overwrite").parquet(
        os.path.join(out, "gold_account_stats_tx")
    )
    spark.createDataFrame(val_rows).write.mode("overwrite").parquet(
        os.path.join(out, "gold_account_balance_changes")
    )
    return out


def _get(spark, stats_dir, family, **kw):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_stats_xrpl,
    )

    return get_account_stats_xrpl(
        spark, stats_dir, ACCOUNT, family, **kw
    ).collect()


def test_tx_stats_by_date_range(spark, stats_dir):
    # test.account.stats.js:58-87: [2015-01-01, 2015-01-16) -> 15 rows;
    # the end instant itself is EXCLUDED (raw start-row stop bound)
    rows = _get(
        spark, stats_dir, "transactions",
        start="2015-01-01T00:00:00Z", end="2015-01-16T00:00:00Z",
    )
    assert len(rows) == 15
    for r in rows:
        assert isinstance(r.type, dict) and isinstance(r.result, dict)
        assert dt.datetime(2015, 1, 1) <= r.date < dt.datetime(2015, 1, 16)
    # maps match the fixture exactly on a spot day
    assert rows[0].transaction_count == sum(rows[0].type.values())


def test_tx_stats_descending(spark, stats_dir):
    # :89-113 -- no bounds: start default 2013-01-01, end now -> all 20
    rows = _get(spark, stats_dir, "transactions", descending=True)
    assert len(rows) == 20
    dates = [r.date for r in rows]
    assert dates == sorted(dates, reverse=True)


def test_value_stats_by_date_range(spark, stats_dir):
    # :115-143 -- account_value stays a STRING through the engine
    rows = _get(
        spark, stats_dir, "value",
        start="2015-01-01T00:00:00Z", end="2015-01-16T00:00:00Z",
    )
    assert len(rows) == 15
    for r in rows:
        assert isinstance(r.account_value, str)
        assert isinstance(r.balance_change_count, int)


def test_value_stats_descending(spark, stats_dir):
    rows = _get(spark, stats_dir, "value", descending=True)
    assert len(rows) == 20
    dates = [r.date for r in rows]
    assert dates == sorted(dates, reverse=True)


def test_marker_is_the_literal_next_rowkey(spark, stats_dir):
    # :171-186 -- limit=5 from the default range yields the link
    # header marker r3fRiC...|20150106000000 (the first UNSERVED row)
    from rippled_historical_database_spark.plans.xrpl_etl import (
        page_account_stats_xrpl,
    )

    rows, marker = page_account_stats_xrpl(
        spark, stats_dir, ACCOUNT, "transactions", limit=5
    )
    assert len(rows) == 5
    assert marker == ACCOUNT + "|20150106000000"


def test_pagination_walk_equals_whole_set(spark, stats_dir):
    # :188-196 utils.checkPagination -- limit=1 pages reassemble the set
    from rippled_historical_database_spark.plans.xrpl_etl import (
        page_account_stats_xrpl,
    )

    ref = _get(spark, stats_dir, "transactions")
    walked, marker = [], None
    for _ in range(25):
        rows, marker = page_account_stats_xrpl(
            spark, stats_dir, ACCOUNT, "transactions",
            limit=1, marker=marker,
        )
        walked.extend(rows)
        if marker is None:
            break
    assert len(walked) == len(ref) == 20
    for w, r in zip(walked, ref):
        assert w.date == r.date
        assert w.transaction_count == r.transaction_count


def test_invalid_family_errors(spark, stats_dir):
    # :198-214
    with pytest.raises(ValueError, match="invalid family"):
        _get(spark, stats_dir, "foo")


def test_invalid_dates_error(spark, stats_dir):
    # :216-262
    with pytest.raises(ValueError, match="invalid start date format"):
        _get(spark, stats_dir, "transactions",
             start="x2015-01-14T00:00", end="2015-01-14T00:00")
    with pytest.raises(ValueError, match="invalid end date format"):
        _get(spark, stats_dir, "transactions",
             start="2015-01-14T00:00", end="x2015-01-14T00:00")


def test_sub_day_range_floors_start(spark, stats_dir):
    # accountStats.js:49-51: end within a day of start -> start floored
    # to ITS day, so a mid-day start still serves that day's 00:00 row
    rows = _get(
        spark, stats_dir, "transactions",
        start="2015-01-03T12:00:00Z", end="2015-01-04T06:00:00Z",
    )
    assert [r.date for r in rows] == [
        dt.datetime(2015, 1, 3), dt.datetime(2015, 1, 4)
    ]


@pytest.mark.skipif(
    not os.path.isdir(LEDGERS), reason="reference mock ledgers not present"
)
def test_builder_counts_close_against_silver(spark, tmp_path_factory):
    """build_account_stats accounting laws over the REAL warehouse:
    per-account map sums equal the total, totals sum to the silver
    transaction count, and value-family counts sum to the silver
    balance-change count."""
    from pyspark.sql import functions as F

    from rippled_historical_database_spark.operators.golden import (
        warehouse_artifact,
    )
    from rippled_historical_database_spark.plans.xrpl_etl import (
        ACCOUNT_STATS_TABLES,
        build_account_stats,
    )

    wh = warehouse_artifact(spark)
    out = str(tmp_path_factory.mktemp("stats_gold"))
    build_account_stats(spark, wh, out)
    gold_tx = spark.read.parquet(
        os.path.join(out, ACCOUNT_STATS_TABLES["transactions"])
    ).collect()
    assert gold_tx
    for r in gold_tx:
        assert sum(r.type.values()) == r.transaction_count
        assert sum(r.result.values()) == r.transaction_count
    n_silver = spark.read.parquet(
        os.path.join(wh, "silver_transactions")
    ).count()
    assert sum(r.transaction_count for r in gold_tx) == n_silver
    gold_val = spark.read.parquet(
        os.path.join(out, ACCOUNT_STATS_TABLES["value"])
    )
    n_bc = spark.read.parquet(
        os.path.join(wh, "silver_balance_changes")
    ).count()
    assert (
        gold_val.agg(F.sum("balance_change_count")).collect()[0][0] == n_bc
    )


def test_backwards_sub_day_range_still_floors(spark, stats_dir):
    # moment.diff truncates toward zero, so end BEFORE start within a
    # day is "0 days": start floors to midnight and the midnight row
    # is served by the (floored-start, end) range
    rows = _get(
        spark, stats_dir, "transactions",
        start="2015-01-03T12:00:00Z", end="2015-01-03T06:00:00Z",
    )
    assert [r.date for r in rows] == [dt.datetime(2015, 1, 3)]
