"""Endpoint-layer tests: parameter validation, limit caps, marker
pagination law, interval/reduce modes -- the contracts of the
reference's route layer (SURVEY.md section 3.1)."""

from __future__ import annotations

import pytest

from rippled_historical_database_spark.plans import api


def test_reduce_and_interval_exclusive(spark, sf_dir):
    with pytest.raises(api.InvalidRequest):
        api.get_exchanges(spark, sf_dir, "purchase", interval="1hour", reduce=True)


def test_invalid_interval_rejected(spark, sf_dir):
    with pytest.raises(api.InvalidRequest):
        api.get_exchanges(spark, sf_dir, "purchase", interval="13minute")


def test_invalid_marker_rejected(spark, sf_dir):
    with pytest.raises(api.InvalidRequest):
        api.get_exchanges(spark, sf_dir, "purchase", marker="garbage!!")


def test_limit_cap(spark, sf_dir):
    page = api.get_exchanges(spark, sf_dir, "purchase", limit=99999)
    assert page.df.count() <= api.MAX_LIMIT_EXCHANGES


def test_marker_pagination_law(spark, sf_dir):
    """Pages walked via markers == the unpaginated prefix (reference
    test/utils.js:7-41)."""
    full = api.get_exchanges(spark, sf_dir, "purchase", limit=60).df.collect()
    seen = []
    marker = None
    for _ in range(3):
        page = api.get_exchanges(spark, sf_dir, "purchase", limit=20, marker=marker)
        rows = page.df.collect()
        seen.extend(rows)
        marker = page.marker
        if marker is None:
            break
    assert [(r.ts, r.event_id) for r in seen] == [(r.ts, r.event_id) for r in full[:len(seen)]]
    assert len(seen) == 60


def test_descending_mode(spark, sf_dir):
    page = api.get_exchanges(spark, sf_dir, "purchase", limit=10, descending=True)
    rows = page.df.collect()
    keys = [(r.ts, r.event_id) for r in rows]
    assert keys == sorted(keys, reverse=True)


def _assert_bucket_aligned(start, interval):
    """Every emitted bucket start sits on the interval grid
    (data.js:16-29's 12 intervals; 3day anchored to utils.js:99-115)."""
    from datetime import date

    unit, n = api.INTERVALS[interval]
    assert start.second == 0 and start.microsecond == 0
    if unit == "minute":
        assert start.minute % n == 0
    elif unit == "hour":
        assert start.minute == 0 and start.hour % n == 0
    else:
        assert start.hour == 0 and start.minute == 0
        if unit == "3day":
            assert (start.date() - date(2013, 1, 1)).days % 3 == 0
        elif unit == "week":
            assert start.isoweekday() == 1
        elif unit == "month":
            assert start.day == 1
        elif unit == "year":
            assert start.day == 1 and start.month == 1


@pytest.mark.parametrize("interval", sorted(api.INTERVALS))
def test_interval_marker_pagination_law(spark, sf_dir, interval):
    """Interval (candle) rows obey the same pagination law as raw rows,
    for every one of the reference's 12 intervals: pages walked via
    markers == the unpaginated prefix, and every bucket is grid-aligned
    (reference test/utils.js:7-41 over the agg_exchanges rowkey)."""
    full = api.get_exchanges(
        spark, sf_dir, "purchase", interval=interval, limit=400
    ).df.collect()
    assert full, "need at least one bucket"
    seen: list = []
    marker = None
    for _ in range(8):
        page = api.get_exchanges(
            spark, sf_dir, "purchase", interval=interval, limit=5, marker=marker
        )
        rows = page.df.collect()
        assert len(rows) <= 5
        seen.extend(rows)
        marker = page.marker
        if marker is None:
            break
    assert [r.start for r in seen] == [r.start for r in full[: len(seen)]]
    assert seen == full[: len(seen)]
    if len(full) < 40:
        assert marker is None and len(seen) == len(full)
    for r in seen:
        _assert_bucket_aligned(r.start, interval)


def test_interval_marker_pagination_descending(spark, sf_dir):
    full = api.get_exchanges(
        spark, sf_dir, "purchase", interval="4hour", limit=400, descending=True
    ).df.collect()
    seen: list = []
    marker = None
    for _ in range(8):
        page = api.get_exchanges(
            spark, sf_dir, "purchase", interval="4hour", limit=5,
            marker=marker, descending=True,
        )
        seen.extend(page.df.collect())
        marker = page.marker
        if marker is None:
            break
    assert seen == full[: len(seen)]
    starts = [r.start for r in seen]
    assert starts == sorted(starts, reverse=True)


def test_interval_mode_buckets(spark, sf_dir):
    page = api.get_exchanges(
        spark, sf_dir, "purchase", interval="5minute", limit=400,
        start="2024-01-05", end="2024-01-06",
    )
    rows = page.df.collect()
    assert rows
    for r in rows:
        assert r.start.minute % 5 == 0
        assert r["count"] >= 1  # Row.count is the tuple method; index by name


def test_reduce_mode_single_candle(spark, sf_dir):
    page = api.get_exchanges(
        spark, sf_dir, "purchase", reduce=True,
        start="2024-01-05", end="2024-01-12",
    )
    rows = page.df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.low <= r.open <= r.high
    assert r.low <= r.close <= r.high


def test_account_transactions_type_whitelist(spark, sf_dir):
    with pytest.raises(api.InvalidRequest):
        api.get_account_transactions(spark, sf_dir, 3, tx_type="NotAType")
    page = api.get_account_transactions(spark, sf_dir, 3, tx_type="purchase", limit=50)
    rows = page.df.collect()
    assert all(r.user_id == 3 and r.event_type == "purchase" for r in rows)


def test_account_balances_asof_consistency(spark, sf_dir):
    early = api.get_account_balances(spark, sf_dir, 3, at="2024-01-10").df.collect()[0]
    late = api.get_account_balances(spark, sf_dir, 3, at="2024-01-25").df.collect()[0]
    assert early.n_changes < late.n_changes
    assert early.as_of <= late.as_of


def test_stats_family_validation(spark, sf_dir):
    with pytest.raises(api.InvalidRequest):
        api.get_stats(spark, sf_dir, interval="month")
    page = api.get_stats(spark, sf_dir, interval="day", family="type")
    assert page.df.count() > 0


def test_account_transactions_sequence_mode(spark, sf_dir):
    # Sequence range is [min, max) and ordered by sequence, mirroring the
    # reference's account|sequence rowkey scan (data.js:1180-1191).
    all_rows = api.get_account_transactions(
        spark, sf_dir, 3, limit=1000, descending=False
    ).df.collect()
    assert len(all_rows) >= 3, "account 3 needs a few events for this test"
    seqs = sorted(r.event_id for r in all_rows)
    lo, hi = seqs[0], seqs[-1]
    page = api.get_account_transactions(
        spark, sf_dir, 3, min_sequence=lo, max_sequence=hi, descending=False
    )
    got = [r.event_id for r in page.df.collect()]
    assert got == [s for s in seqs if lo <= s < hi]  # exclusive stop
    desc = api.get_account_transactions(
        spark, sf_dir, 3, min_sequence=lo, max_sequence=hi, descending=True
    )
    assert [r.event_id for r in desc.df.collect()] == got[::-1]


def test_account_transaction_by_seq_point_lookup(spark, sf_dir):
    some = api.get_account_transactions(
        spark, sf_dir, 3, limit=1, descending=False
    ).df.collect()[0]
    rows = api.get_account_transaction_by_seq(
        spark, sf_dir, 3, some.event_id
    ).df.collect()
    assert len(rows) == 1 and rows[0].event_id == some.event_id
    assert api.get_account_transaction_by_seq(
        spark, sf_dir, 3, 10**15
    ).df.collect() == []
    with pytest.raises(api.InvalidRequest):
        api.get_account_transaction_by_seq(spark, sf_dir, 3, "12abc")


def test_get_account_point_lookup(spark, sf_dir):
    created = api.get_accounts(spark, sf_dir, limit=1).df.collect()
    if not created:  # sf without signups -- nothing to assert
        return
    acct = created[0].account
    rows = api.get_account(spark, sf_dir, acct).df.collect()
    assert len(rows) == 1 and rows[0].account == acct
    assert rows[0].inception is not None
    assert api.get_account(spark, sf_dir, -1).df.collect() == []
