"""XRPL canonical binary codec: external vectors, hand-derived bytes,
and a full roundtrip over the reference's own mock ledger corpus.

The roundtrip alone would be circular (an encoder bug inverted by the
matching decoder bug passes).  Independence comes from:
  * the ACCOUNT_ZERO base58 vector (public constant),
  * hand-derived wire bytes for each field header / amount form,
asserted against literal hex written from the serialization spec, not
from the codec's own output.
"""

from __future__ import annotations

import glob
import json
import os
from decimal import Decimal

import pytest

from rippled_historical_database_spark.functions.xrpl_binary import (
    account_id_to_address,
    address_to_account_id,
    decode_tx,
    encode_amount,
    encode_tx,
)

LEDGERS = "/root/reference/test/mock/ledgers"


def test_base58_account_zero_vector():
    # Public constant: the all-zero AccountID renders as ACCOUNT_ZERO.
    assert account_id_to_address(b"\x00" * 20) == "rrrrrrrrrrrrrrrrrrrrrhoLvTp"
    assert address_to_account_id("rrrrrrrrrrrrrrrrrrrrrhoLvTp") == b"\x00" * 20


def test_base58_roundtrip_arbitrary_ids():
    for seed in (b"\x01" + b"\x00" * 19, bytes(range(20)), b"\xff" * 20):
        assert address_to_account_id(account_id_to_address(seed)) == seed


def test_hand_derived_payment_bytes():
    """Wire bytes derived by hand from the serialization spec:
    TransactionType is UInt16 field 2 -> header 0x12; Flags UInt32
    field 2 -> 0x22; Sequence UInt32 field 4 -> 0x24; Amount field 1 ->
    0x61; Fee field 8 -> 0x68; SigningPubKey blob field 3 -> 0x73;
    Account field 1 -> 0x81 + VL 0x14; Destination field 3 -> 0x83.
    XRP amounts carry the positive bit 0x4000000000000000."""
    acct = account_id_to_address(b"\x11" * 20)
    dest = account_id_to_address(b"\x22" * 20)
    tx = {
        "TransactionType": "Payment",
        "Flags": 0,
        "Sequence": 1,
        "Amount": "1000",
        "Fee": "10",
        "SigningPubKey": "02" * 33,
        "Account": acct,
        "Destination": dest,
    }
    hexed = encode_tx(tx)
    expected = (
        "120000"                      # TransactionType Payment
        "2200000000"                  # Flags 0
        "2400000001"                  # Sequence 1
        "6140000000000003E8"          # Amount 1000 drops, positive bit
        "68400000000000000A"          # Fee 10 drops
        "7321" + "02" * 33 +          # SigningPubKey, VL 0x21
        "8114" + "11" * 20 +          # Account, VL 0x14
        "8314" + "22" * 20            # Destination
    )
    assert hexed == expected


def test_hand_derived_iou_amount_bytes():
    """IOU wire form from the spec: bit63 IOU flag, bit62 sign,
    exponent+97 in bits 54-61, 16-digit mantissa.  1 USD -> mantissa
    10^15, exponent -15 -> (1<<63)|(1<<62)|((82)<<54)|10^15."""
    issuer_id = b"\x33" * 20
    amt = {"value": "1", "currency": "USD", "issuer": account_id_to_address(issuer_id)}
    raw = encode_amount(amt)
    bits = (1 << 63) | (1 << 62) | (82 << 54) | 10**15
    assert raw[:8] == bits.to_bytes(8, "big")
    assert raw[8:28] == b"\x00" * 12 + b"USD" + b"\x00" * 5
    assert raw[28:48] == issuer_id


def _norm(v):
    if isinstance(v, dict) and "value" in v:
        return {**v, "value": Decimal(v["value"])}
    return v


def _tx_diffs(orig: dict, dec: dict) -> list[str]:
    diffs = []
    for k, v in orig.items():
        if k in ("hash", "metaData"):
            continue
        d = dec.get(k, "<MISSING>")
        if k == "Paths":
            if len(v) != len(d):
                diffs.append(f"{k}: path count {len(v)} != {len(d)}")
                continue
            for p_o, p_d in zip(v, d):
                if len(p_o) != len(p_d):
                    diffs.append(f"{k}: step count {len(p_o)} != {len(p_d)}")
                    continue
                for s_o, s_d in zip(p_o, p_d):
                    so = {kk: vv for kk, vv in s_o.items() if kk != "type_hex"}
                    sd = {kk: s_d.get(kk) for kk in so}
                    if so != sd:
                        diffs.append(f"{k}: step {so} != {sd}")
                    th = s_o.get("type_hex")
                    if th is not None and int(th, 16) != s_d.get("type"):
                        diffs.append(f"{k}: type {th} != {s_d.get('type')}")
            continue
        if k == "Memos":
            if json.dumps(v, sort_keys=True) != json.dumps(d, sort_keys=True):
                diffs.append(f"{k}: memos differ")
            continue
        if _norm(v) != _norm(d) and str(v) != str(d):
            diffs.append(f"{k}: {v!r} != {d!r}")
    return diffs


@pytest.mark.skipif(not os.path.isdir(LEDGERS), reason="no reference fixtures")
def test_roundtrip_every_fixture_transaction():
    n = 0
    for path in glob.glob(os.path.join(LEDGERS, "*.json")):
        try:
            data = json.load(open(path))
        except ValueError:
            continue
        ledger = data.get("result", data).get("ledger", data)
        for tx in ledger.get("transactions", []) or []:
            if not isinstance(tx, dict):
                continue
            n += 1
            diffs = _tx_diffs(tx, decode_tx(encode_tx(tx)))
            assert not diffs, f"{path}: {diffs[:3]}"
            md = {
                k: v for k, v in tx["metaData"].items() if k != "AffectedNodes"
            }
            dec_md = decode_tx(encode_tx(md))
            assert not _tx_diffs(md, dec_md), path
    assert n > 900  # the corpus really was exercised


def test_unknown_field_skipped_structurally():
    # A full-codec blob may carry fields outside the display subset; the
    # decoder must skip them by TYPE and keep decoding.  UInt32 field 31
    # (outside our table) -> header 0x20 0x1F + 4 bytes.
    blob = "201F00000007" + "2400000001"  # unknown UInt32, then Sequence 1
    dec = decode_tx(blob)
    assert dec["Sequence"] == 1
    assert dec["Field_2_31"] == 7


def test_encode_unknown_key_raises():
    # The write path must never silently drop a field the subset table
    # doesn't know: the reference stores the FULL canonical binary, so a
    # silent drop would corrupt silver_transactions raw/meta undetected.
    with pytest.raises(ValueError, match="NFTokenTaxon"):
        encode_tx({"Sequence": 1, "NFTokenTaxon": 7})
    # JSON-only display keys are explicitly skip-listed, not errors.
    assert decode_tx(encode_tx({"Sequence": 1, "hash": "AB", "validated": True})) == {
        "Sequence": 1
    }


def test_roundtrip_multisig_and_escrow_fields():
    # The fields the r3 advice flagged as out-of-corpus: multi-sig
    # Signers, EscrowFinish Condition/Fulfillment, TicketSequence.
    acct = account_id_to_address(b"\x01" * 20)
    signer = account_id_to_address(b"\x02" * 20)
    tx = {
        "TransactionType": "EscrowFinish",
        "Account": acct,
        "Owner": acct,
        "OfferSequence": 7,
        "TicketSequence": 9,
        "Condition": "A0258020" + "11" * 32 + "810100",
        "Fulfillment": "A0028000",
        "SigningPubKey": "",
        "Signers": [
            {
                "Signer": {
                    "Account": signer,
                    "SigningPubKey": "ED" + "22" * 32,
                    "TxnSignature": "33" * 64,
                }
            }
        ],
        "Fee": "10",
        "Sequence": 0,
    }
    assert decode_tx(encode_tx(tx)) == tx


def test_roundtrip_signer_list_set():
    acct = account_id_to_address(b"\x05" * 20)
    e1 = account_id_to_address(b"\x06" * 20)
    tx = {
        "TransactionType": "SignerListSet",
        "Account": acct,
        "SignerQuorum": 2,
        "SignerEntries": [
            {"SignerEntry": {"Account": e1, "SignerWeight": 1}},
        ],
        "Fee": "12",
        "Sequence": 3,
    }
    assert decode_tx(encode_tx(tx)) == tx


# ---------------------------------------------------- property-based

from hypothesis import given, settings, strategies as st

from rippled_historical_database_spark.functions.xrpl_binary import (
    TX_RESULTS,
    TX_TYPES,
)

_addresses = st.binary(min_size=20, max_size=20).map(account_id_to_address)
_hex_blob = st.binary(min_size=0, max_size=64).map(lambda b: b.hex().upper())
_uint32 = st.integers(min_value=0, max_value=2**32 - 1)
# IOU values the wire format represents exactly: 1-16 significant digits
_iou_value = st.tuples(
    st.integers(min_value=1, max_value=10**16 - 1),
    st.integers(min_value=-20, max_value=20),
    st.booleans(),
).map(lambda t: str(Decimal(t[0] if t[2] else -t[0]).scaleb(t[1])))
_currency = st.sampled_from(["USD", "EUR", "BTC", "CNY", "XAU"])
_amount = st.one_of(
    st.integers(min_value=0, max_value=10**17).map(str),  # XRP drops
    st.fixed_dictionaries(
        {"value": _iou_value, "currency": _currency, "issuer": _addresses}
    ),
)
_tx_strategy = st.fixed_dictionaries(
    {"TransactionType": st.sampled_from(sorted(TX_TYPES)), "Account": _addresses},
    optional={
        "Flags": _uint32,
        "Sequence": _uint32,
        "LastLedgerSequence": _uint32,
        "OfferSequence": _uint32,
        "DestinationTag": _uint32,
        "SourceTag": _uint32,
        "Expiration": _uint32,
        "Destination": _addresses,
        "Amount": _amount,
        "SendMax": _amount,
        "TakerPays": _amount,
        "TakerGets": _amount,
        "Fee": st.integers(min_value=0, max_value=10**9).map(str),
        "SigningPubKey": _hex_blob,
        "TxnSignature": _hex_blob,
        "InvoiceID": st.binary(min_size=32, max_size=32).map(
            lambda b: b.hex().upper()
        ),
        "Memos": st.lists(
            st.fixed_dictionaries(
                {"Memo": st.fixed_dictionaries({"MemoData": _hex_blob})}
            ),
            max_size=2,
        ),
    },
)


@given(tx=_tx_strategy)
@settings(max_examples=200, deadline=None)
def test_codec_roundtrip_property(tx):
    dec = decode_tx(encode_tx(tx))
    assert not _tx_diffs(tx, dec), (tx, dec)


@given(
    mantissa=st.integers(min_value=1, max_value=10**16 - 1),
    exponent=st.integers(min_value=-20, max_value=20),
    negative=st.booleans(),
)
@settings(max_examples=200, deadline=None)
def test_iou_value_roundtrip_property(mantissa, exponent, negative):
    v = str(Decimal(-mantissa if negative else mantissa).scaleb(exponent))
    issuer = account_id_to_address(b"\x42" * 20)
    raw = encode_amount({"value": v, "currency": "USD", "issuer": issuer})
    from rippled_historical_database_spark.functions.xrpl_binary import decode_amount

    dec, pos = decode_amount(raw, 0)
    assert pos == 48
    assert Decimal(dec["value"]) == Decimal(v)
