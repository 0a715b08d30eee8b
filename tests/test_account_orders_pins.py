"""Reference pins for the account-orders serving path.

The reference's own ``test.account.orders.js`` pins ONLY the error path
("unable to retrieve orders") because the endpoint proxies LIVE rippled
``account_offers`` (api/routes/accountOrders.js:107-114,
lib/rippled.js:54-106) -- no success-path mock rows exist anywhere in
the reference tree.  The serving CONTRACT is therefore rippled's
ledger-state semantics plus ``formatOrder`` (lib/rippled.js:136-168):
the Offer entries an account owns in the as-of ledger state, their
remaining taker amounts, and the BookDirectory quality with
``adjustQualityForXRP``'s +-6 XRP shifts (lib/rippled.js:112-120).

This module pins that contract onto ``get_account_orders_xrpl`` with a
pure-Python replay of the RAW fixture ledger JSON -- fully independent
of the Spark silver parser: Created/Modified/Deleted Offer nodes are
applied in (ledger, tx, node) order to a live-entry map, which IS the
ledger state rippled would serve.  Every open offer of every owner is
compared field-by-field (sequence, both taker amounts with
currency/issuer, the decoded quality).  The reference's one pinned
behavior -- the error response for a bad account -- is pinned too.
"""

from __future__ import annotations

import glob
import json
import os

import pytest

MOCK_DIR = "/root/reference/test/mock/ledgers"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK_DIR), reason="reference mock ledgers not present"
)

XRP_DROPS = 1_000_000


def _amount(raw):
    """rippled Amount -> (currency, issuer, value): drops string for
    XRP, {currency, issuer, value} object for IOUs (parseAmount,
    lib/rippled.js:124-131)."""
    if isinstance(raw, dict):
        return raw["currency"], raw["issuer"], float(raw["value"])
    return "XRP", None, int(raw) / XRP_DROPS


def _quality(book_dir: str, pays_cur: str, gets_cur: str) -> float | None:
    """BookDirectory tail quality with adjustQualityForXRP's shifts:
    exponent byte - 100, 14-hex-digit mantissa,
    shift = (pays==XRP ? -6 : 0) - (gets==XRP ? -6 : 0)."""
    if not book_dir:
        return None
    tail = book_dir[-16:]
    exponent = int(tail[:2], 16) - 100
    mantissa = int(tail[2:], 16)
    shift = (-6 if pays_cur == "XRP" else 0) - (-6 if gets_cur == "XRP" else 0)
    return mantissa * 10.0 ** (exponent + shift)


def _replay_ledger_state() -> dict[tuple[str, int], dict]:
    """Apply every successful tx's Offer nodes in (ledger, tx, node)
    order; the surviving map is rippled's end-state Offer book keyed by
    (owner, sequence)."""
    ledgers = {}
    for path in sorted(glob.glob(os.path.join(MOCK_DIR, "*.json"))):
        with open(path) as f:
            led = json.load(f)
        # one entry per ledger_index (ad-hoc fixture copies dedup here)
        ledgers[int(led["ledger_index"])] = led

    live: dict[tuple[str, int], dict] = {}
    for lidx in sorted(ledgers):
        txs = sorted(
            ledgers[lidx]["transactions"],
            key=lambda t: t["metaData"]["TransactionIndex"],
        )
        for tx in txs:
            meta = tx["metaData"]
            if meta["TransactionResult"] != "tesSUCCESS":
                continue
            for node in meta["AffectedNodes"]:
                (cls, body), = node.items()
                if body.get("LedgerEntryType") != "Offer":
                    continue
                fields = body.get("NewFields") or body.get("FinalFields")
                if fields is None:
                    continue
                key = (fields["Account"], int(fields["Sequence"]))
                if cls == "DeletedNode":
                    live.pop(key, None)
                else:  # CreatedNode / ModifiedNode
                    live[key] = fields
    return live


@pytest.fixture(scope="module")
def warehouse(spark):
    from rippled_historical_database_spark.operators.golden import (
        warehouse_artifact,
    )

    return warehouse_artifact(spark)


@pytest.fixture(scope="module")
def end_state():
    return _replay_ledger_state()


def test_fixture_has_enough_open_offers(end_state):
    # the pin below must cover >= 3 exact rows to mean anything
    assert len(end_state) >= 3, "fixture set lost its open offers"


def test_orders_serving_matches_raw_ledger_state(spark, warehouse, end_state):
    """Every owner with open offers in the replayed raw-ledger state:
    get_account_orders_xrpl (snapshot serving path) must return exactly
    rippled's account_offers rows -- sequence set, remaining taker
    amounts, currencies/issuers, and the formatOrder quality."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_orders_xrpl,
    )

    owners = sorted({owner for owner, _ in end_state})
    assert owners
    checked = 0
    for owner in owners:
        expect = {
            seq: fields
            for (acct, seq), fields in end_state.items()
            if acct == owner
        }
        got = {
            r.offer_sequence: r
            for r in get_account_orders_xrpl(spark, warehouse, owner).collect()
        }
        assert set(got) == set(expect), owner
        for seq, fields in expect.items():
            row = got[seq]
            p_cur, p_iss, p_val = _amount(fields["TakerPays"])
            g_cur, g_iss, g_val = _amount(fields["TakerGets"])
            assert row.pays_currency == p_cur and row.pays_issuer == p_iss
            assert row.gets_currency == g_cur and row.gets_issuer == g_iss
            assert row.pays_value == pytest.approx(p_val, rel=1e-12)
            assert row.gets_value == pytest.approx(g_val, rel=1e-12)
            q = _quality(fields.get("BookDirectory"), p_cur, g_cur)
            if q is not None:
                assert row.rate == pytest.approx(q, rel=1e-12), (owner, seq)
            checked += 1
    assert checked >= 3, f"only {checked} offer rows pinned"


def test_orders_error_contract_bad_account(spark, warehouse):
    """The one behavior test.account.orders.js actually pins: a request
    that cannot be served answers with an error, not data
    (accountOrders.js errorResponse)."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_orders_xrpl,
    )

    with pytest.raises(ValueError):
        get_account_orders_xrpl(spark, warehouse, "not-a-ripple-address")


def test_orders_replay_equals_snapshot_path(spark, warehouse, end_state):
    """Both serving strategies (full replay / checkpoint + tail) agree
    with the raw-ledger state at latest -- so the pin covers them
    both."""
    from rippled_historical_database_spark.plans.xrpl_etl import (
        get_account_orders_xrpl,
    )

    owner = sorted({o for o, _ in end_state})[0]
    snap = sorted(
        map(
            tuple,
            get_account_orders_xrpl(
                spark, warehouse, owner, use_snapshot=True
            ).collect(),
        )
    )
    replay = sorted(
        map(
            tuple,
            get_account_orders_xrpl(
                spark, warehouse, owner, use_snapshot=False
            ).collect(),
        )
    )
    assert snap == replay
