"""Pins from the reference's test.smoment.js (all 3 describe blocks)
onto functions/timeutils.smoment_parse / smoment_stop_exclusive, plus
the api-plane consequence: an `end` bound covers its WHOLE stated
granule (data.js startRow/stopRow pairing)."""

from __future__ import annotations

import datetime as dt

import pytest

from rippled_historical_database_spark.functions.timeutils import (
    smoment_parse,
    smoment_stop_exclusive,
)
from rippled_historical_database_spark.plans import api


@pytest.mark.parametrize(
    "raw,expected",
    [
        # test.smoment.js:14-22 -- parse whitelist
        ("abcd", None),
        (0, dt.datetime(1970, 1, 1)),
        (946684800, dt.datetime(2000, 1, 1)),  # Ripple epoch comment
        ("1234567890", dt.datetime(2009, 2, 13, 23, 31, 30)),
        ("946684d800", None),  # letter inside digits
        ("2015-03-04 18:22:33", None),  # space form NOT whitelisted
        ("2015-03-04T18:22:33", dt.datetime(2015, 3, 4, 18, 22, 33)),
        # not in the mocha file but pinned by smoment.js:29 ("10 digit
        # timestamps only"): an 11-digit string matches no format
        ("12345678901", None),
    ],
)
def test_parse_matches_reference(raw, expected):
    got = smoment_parse(raw)
    assert (got[0] if got else None) == expected


@pytest.mark.parametrize(
    "end,next_start",
    [
        # test.smoment.js:26-34 -- stopRow == next granule's startRow
        ("2015", "2016"),
        ("2015-04", "2015-05"),
        ("2015-04", "2015-05-01T00:00:00"),
        ("2015-04-10", "2015-04-11T00:00:00"),
        ("2015-04-10T13", "2015-04-10T14:00:00"),
        ("2015-04-10T13:12", "2015-04-10T13:13:00"),
        ("2015-04-10T13:12:42", "2015-04-10T13:12:43"),
        ("2015-12", "2016-01"),  # year rollover
    ],
)
def test_stop_row_equals_next_start_row(end, next_start):
    assert smoment_stop_exclusive(smoment_parse(end)) == (
        smoment_parse(next_start)[0]
    )


def test_end_bound_covers_its_whole_granule(spark, sf_dir):
    """end=<day> must include every event ON that day -- identical to
    an explicit exclusive bound at the next midnight, and strictly
    wider than the pre-smoment literal `< end` cut."""
    day = api.get_payments(spark, sf_dir, start="2024-01-04", end="2024-01-05")
    explicit = api.get_payments(
        spark, sf_dir, start="2024-01-04", end="2024-01-05T23:59:59"
    )
    n_day = day.df.count()
    n_explicit = explicit.df.count()
    assert n_day == n_explicit > 0
    # and the old semantics (cut at midnight of the end date) is a
    # strict subset on this fixture
    narrow = api.get_payments(
        spark, sf_dir, start="2024-01-04", end="2024-01-04T23:59:59"
    )
    assert narrow.df.count() < n_day


def test_invalid_dates_raise_400_equivalent(spark, sf_dir):
    for bad in ("abcd", "2015-03-04 18:22:33"):
        with pytest.raises(api.InvalidRequest):
            api.get_payments(spark, sf_dir, start=bad)
        with pytest.raises(api.InvalidRequest):
            api.get_payments(spark, sf_dir, end=bad)
