"""Reference pins for the account payment-channels path: the escrows
twin.  Pinned the same three ways -- test.account.paychan.js mocha
expectations (exactly 2 rows for rnNzy3..., account field equal to the
queried account; 0 for rUeX...), a pure-Python paychan.js:26-81 replay
over the raw fixture JSON compared field-by-field with
silver_payment_channels, and the route option semantics (source-OR-
destination dual keying per data.js:2993-2994, limit paging order,
smoment bounds)."""

from __future__ import annotations

import glob
import json
import os
from decimal import Decimal

import pytest

MOCK_DIR = "/root/reference/test/mock/ledgers"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock ledgers not present"
)

CLAIMER = "rnNzy3iPc7gPEAJbAdXwxY1UTBamBqTYhR"  # test.account.paychan.js:12
EMPTY = "rUeXUxaMTH1pELvD2EkiHTRcM9FsH3v4d7"    # test.account.paychan.js:31
RIPPLE_EPOCH = 946684800


@pytest.fixture(scope="module")
def warehouse(spark):
    from rippled_historical_database_spark.operators.golden import (
        warehouse_artifact,
    )

    return warehouse_artifact(spark)


def _paychan_js(tx: dict, ledger_index: int, close_time: int) -> dict | None:
    """Pure-Python paychan.js:26-81 replay (the independent oracle)."""
    if tx["metaData"]["TransactionResult"] != "tesSUCCESS":
        return None
    if tx["TransactionType"] not in (
        "PaymentChannelCreate", "PaymentChannelFund", "PaymentChannelClaim"
    ):
        return None
    fields = {}
    for wrapper in tx["metaData"]["AffectedNodes"]:
        node = (
            wrapper.get("CreatedNode")
            or wrapper.get("ModifiedNode")
            or wrapper.get("DeletedNode")
        )
        if node and node["LedgerEntryType"] == "PayChannel":
            fields = node.get("NewFields") or node.get("FinalFields") or {}
            break
    return {
        "fee": Decimal(tx["Fee"]) / 1_000_000,
        "flags": tx.get("Flags"),
        "ledger_index": ledger_index,
        "tx_index": tx["metaData"]["TransactionIndex"],
        "time": close_time + RIPPLE_EPOCH,
        "tx_hash": tx["hash"],
        "tx_type": tx["TransactionType"],
        "channel": tx.get("Channel"),
        "signature": tx.get("Signature"),
        "pubkey": tx.get("PublicKey"),
        "settle": tx.get("SettleDelay"),
        "account": tx["Account"],
        "source": fields.get("Account"),
        "destination": fields.get("Destination"),
        "destination_tag": fields.get("DestinationTag"),
        "source_tag": fields.get("SourceTag"),
        "amount": (
            Decimal(fields["Amount"]) / 1_000_000 if fields.get("Amount") else None
        ),
        "balance": (
            Decimal(fields["Balance"]) / 1_000_000 if fields.get("Balance") else None
        ),
        "cancel_after": (
            tx["CancelAfter"] + RIPPLE_EPOCH if tx.get("CancelAfter") else None
        ),
        "expiration": (
            tx["Expiration"] + RIPPLE_EPOCH if tx.get("Expiration") else None
        ),
    }


def _replay_all() -> list[dict]:
    out = []
    for f in sorted(glob.glob(os.path.join(MOCK_DIR, "*.json"))):
        d = json.load(open(f))
        for tx in d.get("transactions", []):
            row = _paychan_js(tx, d["ledger_index"], d["close_time"])
            if row:
                out.append(row)
    return out


def test_mocha_paychan_counts(spark, warehouse):
    """test.account.paychan.js:11-47: 2 rows for the claimer, each
    row's account == queried account; 0 for the other account."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_payment_channels_xrpl,
    )

    rows = get_account_payment_channels_xrpl(spark, warehouse, CLAIMER).collect()
    assert len(rows) == 2
    assert all(r.account == CLAIMER for r in rows)
    assert (
        get_account_payment_channels_xrpl(spark, warehouse, EMPTY).count() == 0
    )


def test_silver_paychan_match_paychan_js_replay(spark, warehouse):
    import datetime as dt

    expected = sorted(
        _replay_all(), key=lambda r: (r["ledger_index"], r["tx_index"])
    )
    assert expected, "fixture corpus has no payment-channel transactions"
    got = sorted(
        spark.read.parquet(
            os.path.join(warehouse, "silver_payment_channels")
        ).collect(),
        key=lambda r: (r.ledger_index, r.tx_index),
    )
    assert len(got) == len(expected)
    epoch = dt.datetime(1970, 1, 1)
    for g, e in zip(got, expected):
        for k in ("tx_hash", "tx_type", "channel", "signature", "pubkey",
                  "settle", "account", "source", "destination",
                  "destination_tag", "source_tag", "flags"):
            assert getattr(g, k) == e[k], (k, getattr(g, k), e[k])
        for k in ("amount", "balance", "fee"):
            gv = getattr(g, k)
            assert (Decimal(gv) if gv is not None else None) == e[k], k
        assert int((g.executed_time - epoch).total_seconds()) == e["time"]
        for k in ("cancel_after", "expiration"):
            gv = getattr(g, k)
            if e[k] is None:
                assert gv is None
            else:
                assert int((gv - epoch).total_seconds()) == e[k]


def test_paychan_source_keyed_read_and_paging(spark, warehouse):
    """data.js:2993-2994 keys each row by the channel's source AND
    destination; the claim txs' source (the channel funder, not the
    mocha account) must retrieve the same 2 rows.  limit=1 pages in
    (time, ledger, tx) order; descending reverses it
    (test.account.paychan.js:50-71's pagination walk)."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_payment_channels_xrpl,
    )

    source = _replay_all()[0]["source"]
    assert source != CLAIMER
    rows = get_account_payment_channels_xrpl(spark, warehouse, source).collect()
    assert len(rows) == 2

    full = get_account_payment_channels_xrpl(spark, warehouse, CLAIMER).collect()
    first = get_account_payment_channels_xrpl(
        spark, warehouse, CLAIMER, limit=1
    ).collect()
    assert [r.tx_hash for r in first] == [full[0].tx_hash]
    desc = get_account_payment_channels_xrpl(
        spark, warehouse, CLAIMER, descending=True
    ).collect()
    assert [r.tx_hash for r in desc] == [r.tx_hash for r in reversed(full)]


def test_marker_pagination_laws(spark, warehouse):
    """accountPaymentChannels marker contract: limit+1 probe, opaque
    keyset marker, walk == whole set, no overlap, invalid marker 400.
    (accountEscrows.js:29,86-100 via the shared prepareOptions.)"""
    import pytest as _pytest

    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_payment_channels_xrpl,
        page_account_payment_channels_xrpl,
    )

    src = _replay_all()[0]["source"]
    full = [
        r.tx_hash
        for r in get_account_payment_channels_xrpl(
            spark, warehouse, src
        ).collect()
    ]
    assert len(full) >= 2, "fixture should have multiple paychan rows"

    walked, marker, pages = [], None, 0
    while True:
        rows, marker = page_account_payment_channels_xrpl(
            spark, warehouse, src, limit=1, marker=marker
        )
        walked += [r.tx_hash for r in rows]
        pages += 1
        assert len(rows) <= 1
        if marker is None:
            break
        assert pages < 50
    assert walked == full              # walk == whole set, in order
    assert len(set(walked)) == len(walked)  # no overlap

    # descending walk reverses the order
    rows_desc, m = page_account_payment_channels_xrpl(
        spark, warehouse, src, limit=1, descending=True
    )
    assert rows_desc[0].tx_hash == full[-1]

    with _pytest.raises(ValueError, match="invalid marker"):
        page_account_payment_channels_xrpl(
            spark, warehouse, src, marker="not!!base64@@"
        )
