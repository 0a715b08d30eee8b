"""Reference pins for the getTop read plane (top currencies / markets).

test.network.js:1200-1295 seeds HBase with mock/top-currencies.json
(41 rows) and mock/top-markets.json (56 rows) under `20150114|000NN`
rowkeys and asserts row counts and the limit option; this suite seeds
the same fixtures into date+rank-keyed parquet and pins
get_top_xrpl's contract: day filter, latest-day fallback, no-cap limit
clamp, invalid-table/date errors, formatResults column deletions, and
rank order preserved.
"""

from __future__ import annotations

import datetime as dt
import json
import os

import pytest

MOCK = "/root/reference/test/mock"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(MOCK, "top-currencies.json")),
    reason="reference mock fixtures not present",
)

DAY = dt.date(2015, 1, 14)  # test.network.js:174 rowkey 20150114|...


@pytest.fixture(scope="module")
def top_dir(spark, tmp_path_factory):
    """Seed the two gold tables from the mocha fixtures, exactly like
    test.network.js putRow-seeds them (rank = fixture order + 1); a
    second synthetic day proves the date filter and latest-day mode."""
    out = str(tmp_path_factory.mktemp("top_tables"))
    for name, fixture in (
        ("top_currencies", "top-currencies.json"),
        ("top_markets", "top-markets.json"),
    ):
        rows = json.load(open(os.path.join(MOCK, fixture)))
        recs = [
            {**r, "rank": i + 1, "date": DAY}
            for i, r in enumerate(rows)
        ]
        # one later, smaller day: latest-mode must pick THIS one
        recs += [
            {**r, "rank": i + 1, "date": DAY + dt.timedelta(days=1)}
            for i, r in enumerate(rows[:5])
        ]
        spark.createDataFrame(recs).write.mode("overwrite").partitionBy(
            "date"
        ).parquet(os.path.join(out, name))
    return out


def test_mocha_counts_and_limit(spark, top_dir):
    """test.network.js:1216 (56 markets), :1276 (41 currencies), and
    the limit=3 pins (:1221-1236, :1281-1295)."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_top_currencies_xrpl,
        get_top_markets_xrpl,
    )

    assert get_top_currencies_xrpl(spark, top_dir, "2015-01-14").count() == 41
    assert get_top_markets_xrpl(spark, top_dir, "2015-01-14").count() == 56
    assert (
        get_top_currencies_xrpl(spark, top_dir, "2015-01-14", limit=3).count()
        == 3
    )
    assert (
        get_top_markets_xrpl(spark, top_dir, "2015-01-14", limit=3).count()
        == 3
    )


def test_rank_order_and_format_deletions(spark, top_dir):
    """Rows come back in rank order with rank/date stripped
    (formatResults, data.js:1074-1090): the first currency row is the
    fixture's first entry (USD.rvYA...)."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_top_currencies_xrpl,
    )

    rows = get_top_currencies_xrpl(spark, top_dir, "2015-01-14").collect()
    assert "rank" not in rows[0].asDict() and "date" not in rows[0].asDict()
    assert rows[0].currency == "USD"
    assert rows[0].issuer == "rvYAfWj5gh67oV6fW32ZzP3Aw4Eubs59B"
    assert rows[1].currency == "CNY"


def test_latest_day_mode(spark, top_dir):
    """No date -> the newest day's rows (data.js:1120-1136): the seeded
    second day has exactly 5 rows."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_top_currencies_xrpl,
        get_top_markets_xrpl,
    )

    assert get_top_currencies_xrpl(spark, top_dir).count() == 5
    assert get_top_markets_xrpl(spark, top_dir).count() == 5


def test_option_errors_and_limit_defaults(spark, top_dir):
    """Invalid table / date -> error; limit 0/NaN -> the 1000 default
    (topCurrencies.js:26-28); no 1000 cap on explicit values."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        _page_limit,
        get_top_xrpl,
    )

    with pytest.raises(ValueError, match="invalid table"):
        get_top_xrpl(spark, top_dir, "top_accounts")
    with pytest.raises(ValueError, match="invalid date"):
        get_top_xrpl(spark, top_dir, "top_currencies", date="bogus")
    assert (
        get_top_xrpl(spark, top_dir, "top_currencies", "2015-01-14",
                     limit=0).count()
        == 41
    )
    assert _page_limit(2000, default=1000, cap=None) == 2000


def test_latest_mode_empty_table_errors(spark, tmp_path):
    """data.js:1124-1136: the latest-row probe on an EMPTY table errors
    ('no markets found') rather than serving an empty page."""
    import datetime as dt

    from rippled_historical_database_spark.plans.xrpl_etl import get_top_xrpl

    d = str(tmp_path / "tables")
    # unpartitioned: an empty partitionBy write emits no readable files
    spark.createDataFrame(
        [], "currency string, rank int, date date"
    ).write.parquet(os.path.join(d, "top_currencies"))
    with pytest.raises(ValueError, match="no markets found"):
        get_top_xrpl(spark, d, "top_currencies")
