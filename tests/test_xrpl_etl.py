"""Warehouse ETL + flagship-query tests over real XRPL ledgers:
build bronze->silver->gold once, then check the reference's laws --
pair inversion symmetry (test.exchanges.js:109-137), candle rollup
associativity, idempotent rebuild."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from rippled_historical_database_spark.plans.xrpl_etl import (
    build_warehouse,
    get_exchanges_xrpl,
    parse_currency,
)

MOCK_DIR = "/root/reference/test/mock/ledgers"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock ledgers not present"
)

USD = "USD+rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q"


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("xrpl_warehouse"))
    paths = sorted(f for f in glob.glob(f"{MOCK_DIR}/*.json") if " - " not in f)
    build_warehouse(spark, paths, out)
    return out


def test_parse_currency_rules():
    assert parse_currency("XRP") == ("XRP", None)
    assert parse_currency(USD) == ("USD", USD.split("+")[1])
    with pytest.raises(ValueError):
        parse_currency("XRP+rSomeIssuer")  # XRP has no issuer
    with pytest.raises(ValueError):
        parse_currency("USD")  # IOU needs an issuer


def test_flagship_query_golden_count(spark, warehouse):
    rows = get_exchanges_xrpl(spark, warehouse, USD, "XRP").collect()
    assert len(rows) == 5  # test.exchanges.js:25


def test_pair_inversion_symmetry_raw(spark, warehouse):
    """query(A/B) == invert(query(B/A)) row by row
    (test.exchanges.js:109-137, data.js:1480-1498)."""
    fwd = get_exchanges_xrpl(spark, warehouse, USD, "XRP").collect()
    rev = get_exchanges_xrpl(spark, warehouse, "XRP", USD).collect()
    assert len(fwd) == len(rev) == 5
    for a, b in zip(fwd, rev):
        assert a.tx_hash == b.tx_hash and a.node_index == b.node_index
        assert abs(a.rate - 1 / b.rate) <= 1e-12 * a.rate
        assert a.base_amount == b.counter_amount
        assert a.counter_amount == b.base_amount
        assert a.buyer == b.seller and a.seller == b.buyer


def test_pair_inversion_symmetry_candles(spark, warehouse):
    fwd = {r.start: r for r in get_exchanges_xrpl(spark, warehouse, USD, "XRP", interval_minutes=5).collect()}
    rev = {r.start: r for r in get_exchanges_xrpl(spark, warehouse, "XRP", USD, interval_minutes=5).collect()}
    assert fwd and set(fwd) == set(rev)
    for start, a in fwd.items():
        b = rev[start]
        assert a["count"] == b["count"]  # Row.count is the tuple method
        assert abs(a.high - 1 / b.low) <= 1e-9 * a.high
        assert abs(a.low - 1 / b.high) <= 1e-9 * a.low
        assert abs(a.open - 1 / b.open) <= 1e-9 * a.open
        assert abs(a.close - 1 / b.close) <= 1e-9 * a.close
        assert abs(a.vwap - 1 / b.vwap) <= 1e-9 * a.vwap
        assert abs(a.base_volume - b.counter_volume) <= 1e-9 * max(1, a.base_volume)


def test_candle_rollup_consistent_with_raw(spark, warehouse):
    """sum of candle volumes over the whole range == sum over raw
    exchanges (minus dust, which this pair has none of)."""
    raw = get_exchanges_xrpl(spark, warehouse, USD, "XRP").agg(
        F.sum("base_amount").alias("v"), F.count("*").alias("n")
    ).first()
    day = get_exchanges_xrpl(
        spark, warehouse, USD, "XRP", interval_minutes=24 * 60
    ).agg(F.sum("base_volume").alias("v"), F.sum("count").alias("n")).first()
    assert raw.n == day.n
    assert abs(raw.v - day.v) < 1e-9


def test_warehouse_layout_partitioned_by_date(warehouse):
    parts = glob.glob(os.path.join(warehouse, "silver_exchanges", "date=*"))
    assert parts, "silver_exchanges must be date-partitioned"


def test_silver_exchanges_files_are_pair_sorted(warehouse):
    """The pair-clustered layout the ETL doc promises must be REAL in
    the landed files: within every parquet file, rows sorted by
    (base_currency, base_issuer, counter_currency, counter_issuer,
    sort_key) -- the property that keeps a pair scan to a few row
    groups.  (Guards the partitioned-writer non-stable re-sort trap:
    a sort not led by the partition column is silently destroyed.)"""
    import pyarrow.parquet as pq

    files = glob.glob(
        os.path.join(warehouse, "silver_exchanges", "date=*", "*.parquet")
    )
    assert files
    checked = 0
    for f in files:
        t = pq.read_table(
            f,
            columns=[
                "base_currency", "base_issuer",
                "counter_currency", "counter_issuer", "sort_key",
            ],
        )
        rows = list(
            zip(*[[v if v is not None else "" for v in t[c].to_pylist()]
                  for c in t.column_names])
        )
        assert rows == sorted(rows), f
        checked += len(rows)
    assert checked > 0


def test_rebuild_is_idempotent(spark, warehouse, tmp_path):
    """Rebuilding from the same ledgers produces identical gold candles
    (the removeLedger compensation story: overwrite == re-derive)."""
    paths = sorted(f for f in glob.glob(f"{MOCK_DIR}/*.json") if " - " not in f)
    out2 = str(tmp_path / "rebuild")
    build_warehouse(spark, paths, out2)
    a = spark.read.parquet(os.path.join(warehouse, "gold_candles_1m"))
    b = spark.read.parquet(os.path.join(out2, "gold_candles_1m"))
    assert a.count() == b.count()
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_warehouse_full_table_set(spark, warehouse):
    import glob as g

    tables = {os.path.basename(p) for p in g.glob(os.path.join(warehouse, "*"))}
    assert {
        "bronze_ledgers", "silver_transactions", "silver_exchanges",
        "silver_balance_changes", "silver_accounts_created", "silver_offers",
        "silver_payments", "silver_memos", "silver_tx_client",
        "silver_affected_accounts", "silver_ledger_fees",
        "gold_candles_1m", "gold_stats_hourly",
    } <= tables
    txs = spark.read.parquet(os.path.join(warehouse, "silver_transactions"))
    assert txs.count() == 836  # the fixture set's tx total


def test_gold_stats_hourly_reconciles(spark, warehouse):
    stats = spark.read.parquet(os.path.join(warehouse, "gold_stats_hourly"))
    txs = spark.read.parquet(os.path.join(warehouse, "silver_transactions"))
    assert stats.agg(F.sum("transaction_count")).first()[0] == txs.count()
    row = stats.orderBy("hour").first()
    assert row.tx_per_ledger == row.transaction_count / row.ledger_count
    # both stat families present (type and result pivots, data.js:76-110)
    assert "OfferCreate" in stats.columns
    assert "result_tesSUCCESS" in stats.columns
    assert row["result_tesSUCCESS"] == row.success_count


def test_account_transactions_two_phase(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_transactions_xrpl,
    )

    # pick an account with known activity: the golden pair's issuer
    aff = spark.read.parquet(os.path.join(warehouse, "silver_affected_accounts"))
    account = aff.groupBy("account").count().orderBy(F.col("count").desc()).first().account
    rows = get_account_transactions_xrpl(spark, warehouse, account, limit=1000).collect()
    assert rows
    # every returned tx really touches the account (closure check)
    hashes = {r.tx_hash for r in rows}
    idx = {r.tx_hash for r in aff.filter(F.col("account") == account).collect()}
    assert hashes <= idx
    # descending (ledger, tx) order
    keys = [(r.ledger_index, r.tx_index) for r in rows]
    assert keys == sorted(keys, reverse=True)
    # type filter narrows
    typed = get_account_transactions_xrpl(
        spark, warehouse, account, tx_type="OfferCreate", limit=1000
    ).collect()
    assert all(r.tx_type == "OfferCreate" for r in typed)
    assert len(typed) <= len(rows)


def test_account_transactions_binary_false_decodes(spark, warehouse):
    """binary=false (data.js:2083-2084): raw/meta hex replaced by decoded
    display JSON whose scalars agree with the silver columns, including
    the delivered_amount rule for successful payments."""
    import json

    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_transactions_xrpl,
    )

    aff = spark.read.parquet(os.path.join(warehouse, "silver_affected_accounts"))
    account = aff.groupBy("account").count().orderBy(F.col("count").desc()).first().account
    rows = get_account_transactions_xrpl(
        spark, warehouse, account, limit=50, binary=False
    ).collect()
    assert rows
    assert "raw" not in rows[0].asDict() and "meta" not in rows[0].asDict()
    for r in rows:
        doc = json.loads(r.tx_json)
        assert doc["tx"]["TransactionType"] == r.tx_type
        assert doc["tx"]["Account"] == r.account
        assert int(doc["tx"]["Fee"]) == int(r.fee_drops)
        assert doc["meta"]["TransactionResult"] == r.result
        assert doc["meta"]["TransactionIndex"] == r.tx_index
        if r.tx_type == "Payment" and r.result == "tesSUCCESS":
            assert "delivered_amount" in doc["meta"]
    # binary=true returns the stored hex instead
    raw_rows = get_account_transactions_xrpl(
        spark, warehouse, account, limit=5, binary=True
    ).collect()
    assert all(set("0123456789ABCDEF") >= set(r.raw) for r in raw_rows)


# ---------------------------------------------------------------------------
# point-in-time state reconstruction (the live-rippled proxy replacement)
# ---------------------------------------------------------------------------

import json as _json
from decimal import Decimal as _D


def _replay_balances(account: str, as_of: int | None) -> dict:
    """Independent replay: last known balance per (currency, cp) line."""
    state = {}
    events = []
    paths = sorted(f for f in glob.glob(f"{MOCK_DIR}/*.json") if " - " not in f)
    for path in paths:
        d = _json.load(open(path))
        li = int(d["ledger_index"])
        if as_of is not None and li > as_of:
            continue
        for tx in d["transactions"]:
            meta = tx["metaData"]
            res = meta["TransactionResult"]
            if res != "tesSUCCESS" and not res.startswith("tec"):
                continue
            for i, aff in enumerate(meta["AffectedNodes"]):
                node = (
                    aff.get("ModifiedNode") or aff.get("CreatedNode") or aff.get("DeletedNode")
                )
                et = node.get("LedgerEntryType")
                if et == "AccountRoot":
                    ff, nf, pf = node.get("FinalFields"), node.get("NewFields"), node.get("PreviousFields")
                    if ff and pf and ff.get("Balance") and pf.get("Balance"):
                        owner, bal = ff["Account"], _D(ff["Balance"])
                    elif nf:
                        owner, bal = nf["Account"], _D(nf["Balance"])
                    else:
                        continue
                    if owner == account:
                        events.append(((li, meta["TransactionIndex"], i), ("XRP", ""), float(bal / 1_000_000)))
                elif et == "RippleState":
                    if tx["TransactionType"] not in ("Payment", "OfferCreate"):
                        continue
                    nf, pf, ff = node.get("NewFields"), node.get("PreviousFields"), node.get("FinalFields")
                    if nf and nf["Balance"]["value"] == "0":
                        continue
                    if nf:
                        cur, high, low, bal = (
                            nf["Balance"]["currency"], nf["HighLimit"]["issuer"],
                            nf["LowLimit"]["issuer"], _D(nf["Balance"]["value"]),
                        )
                    elif pf and pf.get("Balance"):
                        cur, high, low, bal = (
                            ff["Balance"]["currency"], ff["HighLimit"]["issuer"],
                            ff["LowLimit"]["issuer"], _D(ff["Balance"]["value"]),
                        )
                    else:
                        continue
                    if low == account:
                        events.append(((li, meta["TransactionIndex"], i), (cur, high), float(bal)))
                    if high == account:
                        events.append(((li, meta["TransactionIndex"], i), (cur, low), float(-bal)))
    for _, line, bal in sorted(events):
        state[line] = bal
    return state


def test_balances_asof_matches_replay(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_balances_xrpl,
    )

    account = "rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q"
    for as_of in (None, 11119610):
        got = {
            (r.currency, r.counterparty): r.balance
            for r in get_account_balances_xrpl(
                spark, warehouse, account, as_of, use_snapshot=False
            ).collect()
        }
        exp = _replay_balances(account, as_of)
        assert set(got) == set(exp), (as_of, set(got) ^ set(exp))
        for line, bal in exp.items():
            assert abs(got[line] - bal) <= 1e-9 * max(1, abs(bal)), (as_of, line)


def test_snapshot_balances_equal_replay_at_many_asof_points(spark, warehouse):
    """The gold_balance_snapshots path (daily checkpoint + same-day tail)
    must equal the full-replay path at EVERY as-of point: quartile
    ledgers of the corpus, a day-boundary first ledger, the max, and
    latest (None)."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_balances_snapshot,
        get_account_balances_xrpl,
    )

    account = "rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q"
    ledgers = sorted(
        int(_json.load(open(f))["ledger_index"])
        for f in glob.glob(f"{MOCK_DIR}/*.json")
        if " - " not in f
    )
    n = len(ledgers)
    points = [None, ledgers[0], ledgers[n // 4], ledgers[n // 2],
              ledgers[3 * n // 4], ledgers[-1], 11119610]
    for as_of in points:
        replay = {
            (r.currency, r.counterparty): (r.balance, r.last_change_ledger)
            for r in get_account_balances_xrpl(
                spark, warehouse, account, as_of, use_snapshot=False
            ).collect()
        }
        snap = {
            (r.currency, r.counterparty): (r.balance, r.last_change_ledger)
            for r in get_account_balances_snapshot(
                spark, warehouse, account, as_of
            ).collect()
        }
        assert snap == replay, (as_of, set(snap.items()) ^ set(replay.items()))


def test_snapshot_asof_warehouse_wide_equals_replay(spark, warehouse):
    """All-accounts as-of state via snapshot+tail == a direct last-row
    replay over the raw change stream (the oracle the driver query
    golden_balance_snapshot_asof registers)."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        _bc_key,
        asof_balances_via_snapshot,
    )

    as_of = 11119610
    bc = spark.read.parquet(os.path.join(warehouse, "silver_balance_changes"))
    expect = {
        (r.account, r.currency, r.counterparty): (r.balance, r.last_change_ledger)
        for r in bc.filter(F.col("ledger_index") <= as_of)
        .groupBy(
            "account",
            "currency",
            F.coalesce(F.col("counterparty"), F.lit("")).alias("counterparty"),
        )
        .agg(
            F.max_by("final_balance", _bc_key()).alias("balance"),
            F.max("ledger_index").alias("last_change_ledger"),
        )
        .collect()
    }
    got = {
        (r.account, r.currency, r.counterparty): (r.balance, r.last_change_ledger)
        for r in asof_balances_via_snapshot(spark, warehouse, as_of).collect()
    }
    assert got == expect


def _partition_filters(df) -> list[str]:
    """All ``PartitionFilters: [...]`` substrings of the executed plan."""
    import re

    plan = df._jdf.queryExecution().executedPlan().toString()
    return re.findall(r"PartitionFilters: \[[^\]]*\]", plan)


def _assert_literal_date_pruning(filters: list[str]) -> None:
    """The tail branch must pin ``date = <literal day>`` and the
    snapshot branch must prune ``date < <literal day>``.  Matches the
    actual Spark plan shape ``(date#123 = 2015-01-14)`` -- a plan that
    merely references the date column (every plan does) fails."""
    import re

    eq = [f for f in filters if re.search(r"date#\d+ = \d{4}-\d{2}-\d{2}", f)]
    lt = [f for f in filters if re.search(r"date#\d+ < \d{4}-\d{2}-\d{2}", f)]
    assert eq, f"no literal-date equality PartitionFilter (tail read): {filters}"
    assert lt, f"no literal-date range PartitionFilter (snapshot read): {filters}"


def test_snapshot_tail_scan_prunes_to_one_date_partition(spark, warehouse):
    """The same-day tail replay must read ONE date partition of the
    change stream: the as-of day resolves to a literal before the plan
    builds, so the scan carries a static date PartitionFilter."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        asof_balances_via_snapshot,
    )

    df = asof_balances_via_snapshot(spark, warehouse, 11119610)
    # the tail branch pins date = <literal day>; the snapshot branch
    # prunes date < it.  Both shapes only exist with a literal date --
    # asserted against the PartitionFilters content, not mere column
    # references (the old `"(date" in plan.replace("date#", "(date")`
    # check was vacuously true for any plan touching the date column).
    _assert_literal_date_pruning(_partition_filters(df))


def test_literal_date_pruning_assertion_can_fail():
    """Negative control: the pruning assertion must reject plans whose
    PartitionFilters carry no literal-date predicate (the failure mode
    the old tautological check could never see)."""
    with pytest.raises(AssertionError):
        _assert_literal_date_pruning(["PartitionFilters: [isnotnull(date#1)]"])
    with pytest.raises(AssertionError):  # range without the tail equality
        _assert_literal_date_pruning(
            ["PartitionFilters: [(date#1 < 2015-01-14)]"]
        )
    _assert_literal_date_pruning(  # the real two-branch shape passes
        [
            "PartitionFilters: [isnotnull(date#8851), (date#8851 < 2015-01-14)]",
            "PartitionFilters: [isnotnull(date#8876), (date#8876 = 2015-01-14)]",
        ]
    )


def test_gold_balance_snapshots_layout(warehouse):
    parts = glob.glob(os.path.join(warehouse, "gold_balance_snapshots", "date=*"))
    assert len(parts) > 1  # partitioned by day, prunable


def test_orders_asof_open_set(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_orders_xrpl,
    )

    offers = spark.read.parquet(os.path.join(warehouse, "silver_offers"))
    # the busiest offer owner exercises creates, fills, and cancels
    owner = (
        offers.groupBy("owner").count().orderBy(F.col("count").desc()).first().owner
    )
    got = {
        r.offer_sequence: r
        for r in get_account_orders_xrpl(spark, warehouse, owner).collect()
    }
    # independent replay over the silver stream collected to the driver
    rows = sorted(
        offers.filter(F.col("owner") == owner).collect(),
        key=lambda r: (r.ledger_index, r.tx_index, r.node_index),
    )
    last = {}
    for r in rows:
        last[r.offer_sequence] = r
    # open == the entry still exists in ledger state (last event not a
    # deletion), matching rippled's account_offers -- the change_type
    # label under-closes (see tests/test_account_orders_pins.py)
    exp = {
        s: r for s, r in last.items()
        if r.node_type != "DeletedNode" and r.pays_value > 0
    }
    assert set(got) == set(exp)
    for s, e in exp.items():
        assert abs(got[s].pays_value - e.pays_value) < 1e-12
        assert abs(got[s].gets_value - e.gets_value) < 1e-12


def test_orders_asof_monotone_history(spark, warehouse):
    """An offer created then deleted: open in the as-of window between,
    absent after -- spot-check the time-travel semantics."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_orders_xrpl,
    )

    offers = spark.read.parquet(os.path.join(warehouse, "silver_offers"))
    gone = (
        offers.filter(F.col("change_type") == "fill")
        .select("owner", "offer_sequence", "ledger_index")
        .first()
    )
    if gone is None:
        pytest.skip("no filled offers in fixture set")
    created = offers.filter(
        (F.col("owner") == gone.owner)
        & (F.col("offer_sequence") == gone.offer_sequence)
        & (F.col("ledger_index") < gone.ledger_index)
    ).orderBy("ledger_index")
    first_evt = created.first()
    if first_evt is None or first_evt.change_type in ("cancel", "fill", "replace"):
        pytest.skip("offer's creation predates the fixture window")
    before = get_account_orders_xrpl(
        spark, warehouse, gone.owner, as_of_ledger=gone.ledger_index - 1
    ).collect()
    after = get_account_orders_xrpl(
        spark, warehouse, gone.owner, as_of_ledger=gone.ledger_index
    ).collect()
    assert any(r.offer_sequence == gone.offer_sequence for r in before)
    assert not any(r.offer_sequence == gone.offer_sequence for r in after)


def test_snapshot_orders_equal_replay_at_many_asof_points(spark, warehouse):
    """The gold_open_offers path (daily checkpoint + same-day tail) must
    equal the full-replay path at EVERY as-of point -- quartile ledgers
    of the corpus, the max, latest (None), and the mid-day point the
    driver row uses -- for the two busiest offer owners."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_orders_xrpl,
    )

    offers = spark.read.parquet(os.path.join(warehouse, "silver_offers"))
    owners = [
        r.owner
        for r in offers.groupBy("owner")
        .count()
        .orderBy(F.col("count").desc(), "owner")
        .limit(2)
        .collect()
    ]
    ledgers = sorted(
        int(_json.load(open(f))["ledger_index"])
        for f in glob.glob(f"{MOCK_DIR}/*.json")
        if " - " not in f
    )
    n = len(ledgers)
    points = [None, ledgers[0], ledgers[n // 4], ledgers[n // 2],
              ledgers[3 * n // 4], ledgers[-1], 11119610]

    def as_map(df):
        return {
            r.offer_sequence: (
                r.change_type, r.pays_currency, r.pays_issuer, r.pays_value,
                r.gets_currency, r.gets_issuer, r.gets_value, r.rate,
                r.ledger_index, r.expiration,
            )
            for r in df.collect()
        }

    for owner in owners:
        for as_of in points:
            replay = as_map(get_account_orders_xrpl(
                spark, warehouse, owner, as_of, use_snapshot=False
            ))
            snap = as_map(get_account_orders_xrpl(
                spark, warehouse, owner, as_of, use_snapshot=True
            ))
            assert snap == replay, (
                owner, as_of, set(snap.items()) ^ set(replay.items())
            )


def test_gold_open_offers_layout_and_tail_pruning(spark, warehouse):
    """The checkpoint table is date-partitioned (prunable) and the
    as-of tail scan pins date = <literal day>, so the plan reads at
    most ONE date partition of the offer stream."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        asof_open_offers_via_snapshot,
    )

    parts = glob.glob(os.path.join(warehouse, "gold_open_offers", "date=*"))
    assert len(parts) > 1
    df = asof_open_offers_via_snapshot(spark, warehouse, None, 11119610)
    _assert_literal_date_pruning(_partition_filters(df))


def test_calendar_interval_buckets(spark, warehouse):
    """1-day-span fixture data: day/3day/7day/1month/1year reductions all
    collapse to one bucket with identical totals (re-reduce associativity
    across bucket kinds)."""
    from rippled_historical_database_spark.plans.xrpl_etl import get_exchanges_xrpl

    day = get_exchanges_xrpl(spark, warehouse, USD, "XRP", interval_minutes=24 * 60).collect()
    assert len(day) == 1
    for interval in ("3day", "7day", "1month", "1year"):
        rows = get_exchanges_xrpl(spark, warehouse, USD, "XRP", interval_minutes=interval).collect()
        assert len(rows) == 1, interval
        assert rows[0]["count"] == day[0]["count"], interval
        assert abs(rows[0].base_volume - day[0].base_volume) < 1e-9, interval
        assert rows[0].open == day[0].open and rows[0].close == day[0].close, interval


def test_autobridged_filter(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import get_exchanges_xrpl

    ex = spark.read.parquet(os.path.join(warehouse, "silver_exchanges"))
    bridged = ex.filter(F.col("autobridged_currency").isNotNull())
    if bridged.count() == 0:
        pytest.skip("no autobridged exchanges in fixture set")
    pair = bridged.select("base_currency", "base_issuer", "counter_currency").first()
    base = pair.base_currency + ("+" + pair.base_issuer if pair.base_issuer else "")
    rows = get_exchanges_xrpl(
        spark, warehouse, base, "XRP", autobridged=True
    ).collect()
    assert rows


def test_agg_exchanges_materialization(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        INTERVALS_ALL,
        build_agg_exchanges,
        reduce_candles,
    )

    out = build_agg_exchanges(spark, warehouse)
    agg = spark.read.parquet(out)
    assert set(
        r.interval for r in agg.select("interval").distinct().collect()
    ) == set(INTERVALS_ALL)
    # each partition equals the on-the-fly re-reduce
    gold = spark.read.parquet(os.path.join(warehouse, "gold_candles_1m"))
    for name, arg in [("5minute", 5), ("1day", 1440), ("7day", "7day")]:
        part = agg.filter(F.col("interval") == name).drop("interval")
        ref = reduce_candles(gold, arg)
        assert part.count() == ref.count(), name
        assert part.exceptAll(ref).count() == 0, name
    # partition pruning on the interval column
    df = agg.filter(F.col("interval") == "1hour")
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters: [isnotnull(interval" in plan


def test_exchanges_marker_pagination_law(spark, warehouse):
    """Pages walked via markers == the unpaginated prefix
    (test/utils.js:7-41)."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_exchanges_xrpl,
        page_exchanges_xrpl,
    )

    full = get_exchanges_xrpl(spark, warehouse, USD, "XRP").collect()
    seen, marker = [], None
    for _ in range(5):
        rows, marker = page_exchanges_xrpl(
            spark, warehouse, USD, "XRP", limit=2, marker=marker
        )
        seen.extend(rows)
        if marker is None:
            break
    assert len(seen) == len(full) == 5
    assert [(r.ledger_index, r.tx_index, r.node_index) for r in seen] == [
        (r.ledger_index, r.tx_index, r.node_index) for r in full
    ]
    with pytest.raises(ValueError):
        page_exchanges_xrpl(spark, warehouse, USD, "XRP", marker="!!bad!!")


def test_candles_csv_shape(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        CSV_COLUMNS,
        format_candles_csv,
        get_exchanges_xrpl,
    )

    candles = get_exchanges_xrpl(spark, warehouse, USD, "XRP", interval_minutes=5)
    # the candle projection lacks pair columns (single-pair query);
    # reattach for the CSV shape
    for c, v in (
        ("base_currency", "USD"), ("base_issuer", USD.split("+")[1]),
        ("counter_currency", "XRP"), ("counter_issuer", None),
    ):
        candles = candles.withColumn(c, F.lit(v))
    csv = format_candles_csv(candles, "5minute")
    assert csv.columns == CSV_COLUMNS
    rows = csv.collect()
    assert rows
    for r in rows:
        assert r.start.endswith("Z") and "T" in r.start
        assert all(isinstance(v, str) for v in r)


def test_exchange_rate_vs_duckdb(spark, warehouse):
    """The dual-VWAP rate over the real warehouse, cross-checked by
    DuckDB reading the SAME silver parquet -- the synthetic oracle
    pattern extended to real data."""
    import duckdb

    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_exchange_rate_xrpl,
    )

    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW ex AS SELECT * FROM '{warehouse}/silver_exchanges/*/*.parquet'"
    )
    iss = USD.split("+")[1]
    pair = (
        f"base_currency='USD' AND base_issuer='{iss}' AND counter_currency='XRP'"
    )
    anchor = con.execute(f"SELECT MAX(executed_time) FROM ex WHERE {pair}").fetchone()[0]
    daily, latest, n = con.execute(
        f"""
        WITH day AS (
            SELECT CAST(SUM(CAST(counter_amount AS DECIMAL(38,18))) AS DOUBLE)
                 / CAST(SUM(CAST(base_amount AS DECIMAL(38,18))) AS DOUBLE) AS r
            FROM ex WHERE {pair}
              AND DATE_TRUNC('day', executed_time) = DATE_TRUNC('day', TIMESTAMP '{anchor}')
        ),
        recent AS (
            SELECT * FROM ex WHERE {pair}
              AND executed_time <= TIMESTAMP '{anchor}'
              AND executed_time > TIMESTAMP '{anchor}' - INTERVAL 14 DAY
            ORDER BY (ledger_index * 100000 + tx_index) * 100000 + node_index DESC
            LIMIT 50
        )
        SELECT (SELECT r FROM day),
               CAST(SUM(CAST(counter_amount AS DECIMAL(38,18))) AS DOUBLE)
                 / CAST(SUM(CAST(base_amount AS DECIMAL(38,18))) AS DOUBLE),
               COUNT(*)
        FROM recent
        """
    ).fetchone()

    # non-strict: both legs live -> average
    row = get_exchange_rate_xrpl(
        spark, warehouse, USD, "XRP", date=str(anchor), strict=False
    ).first()
    assert row.n_recent == n
    assert abs(row.rate_daily - daily) < 1e-12 * daily
    assert abs(row.rate_latest - latest) < 1e-12 * latest
    assert abs(row.rate - (daily + latest) / 2) < 1e-12

    # strict with only 5 trades: recent leg zeroed -> rate 0 (the
    # reference quirk: daily alone does not produce a rate)
    srow = get_exchange_rate_xrpl(
        spark, warehouse, USD, "XRP", date=str(anchor), strict=True
    ).first()
    assert srow.n_recent == n == 5
    assert srow.rate_latest is None and srow.rate == 0.0

    # identity pair -> 1 (data.js:1436-1438)
    ident = get_exchange_rate_xrpl(spark, warehouse, "XRP", "XRP").first()
    assert ident.rate == 1.0


def test_address_validation_gate(spark, warehouse):
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_balances_xrpl,
        get_account_orders_xrpl,
        get_account_transactions_xrpl,
        validate_address,
    )

    assert validate_address("rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q")
    for fn in (
        get_account_transactions_xrpl,
        get_account_balances_xrpl,
        get_account_orders_xrpl,
    ):
        with pytest.raises(ValueError):
            fn(spark, warehouse, "not-an-address")
        with pytest.raises(ValueError):
            fn(spark, warehouse, "r0contains0forbidden0chars")


def test_address_validation_checksums_like_reference():
    """The gate must verify the 4-byte double-SHA256 checksum, not just
    the character-class shape, matching the reference's isValidAddress
    (api/routes/accountBalances.js:30-36 via ripple-address-codec)."""
    from rippled_historical_database_spark.functions.xrpl_binary import (
        account_id_to_address,
    )
    from rippled_historical_database_spark.plans.xrpl_etl import validate_address

    good = "rMwjYedjc7qqtKYVLiAccJSmCwih4LnE2q"
    assert validate_address(good) == good

    # valid shape (regex passes) but one flipped trailing character ->
    # checksum mismatch -> rejected.
    corrupted = good[:-1] + ("r" if good[-1] != "r" else "p")
    with pytest.raises(ValueError, match="invalid address"):
        validate_address(corrupted)

    # every synthesized AccountID round-trips through the encoder and
    # passes the gate (the encoder appends a correct checksum).
    for seed in (b"\x00" * 20, b"\xff" * 20, bytes(range(20))):
        assert validate_address(account_id_to_address(seed))
