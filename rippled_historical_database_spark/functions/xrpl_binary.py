"""XRPL canonical binary codec (display-field subset).

The reference stores each transaction's ``raw``/``meta`` as hex of the
XRPL canonical binary form (``lib/utils.js:60-62`` ``toHex`` =
``binary.encode``) and decodes them on read when the caller passes
``binary=false`` (``lib/hbase/hbase-thrift/data.js:2083-2084``
``binary.decode``).  This module re-derives that codec pair from the
public XRPL serialization specification (field IDs, VL prefixes, Amount
/ AccountID / PathSet / STArray wire forms) for the field subset the
display path actually renders -- every field observed across the
reference's own mock ledger corpus, plus the top-level meta scalars.

Scope notes:
  * ``encode_tx``/``decode_tx`` roundtrip every transaction in the
    reference's 50 fixture ledgers bit-for-bit.
  * meta is encoded as its scalar display subset (TransactionIndex,
    TransactionResult, DeliveredAmount); AffectedNodes is a ledger-entry
    tree the display path never renders from binary (the silver parsers
    consume it as JSON upstream), so it is intentionally not part of the
    stored binary subset.
  * Unknown fields DECODE structurally (skipped by type) rather than
    failing, so blobs from a full codec still parse.

Pure-Python core (dict <-> bytes) with an Arrow-batched wrapper in
``operators/parsers.py`` -- the hot path stays one Python call per
BATCH, not per row.
"""

from __future__ import annotations

import hashlib
from decimal import Decimal

# --------------------------------------------------------------- field IDs
# (type_code, field_code) -> name, from the public XRPL definitions.
# Types: 1 UInt16, 2 UInt32, 3 UInt64, 4 Hash128, 5 Hash256, 6 Amount,
# 7 Blob, 8 AccountID, 14 STObject, 15 STArray, 16 UInt8, 17 Hash160,
# 18 PathSet, 19 Vector256.

FIELDS: dict[tuple[int, int], str] = {
    (1, 2): "TransactionType",
    (1, 3): "SignerWeight",
    (2, 2): "Flags",
    (2, 3): "SourceTag",
    (2, 4): "Sequence",
    (2, 10): "Expiration",
    (2, 14): "DestinationTag",
    (2, 25): "OfferSequence",
    (2, 27): "LastLedgerSequence",
    (2, 28): "TransactionIndex",
    (2, 33): "SetFlag",
    (2, 34): "ClearFlag",
    (2, 35): "SignerQuorum",
    (2, 36): "CancelAfter",
    (2, 37): "FinishAfter",
    (2, 38): "SignerListID",
    (2, 39): "SettleDelay",
    (2, 40): "TicketCount",
    (2, 41): "TicketSequence",
    (5, 17): "InvoiceID",
    (5, 22): "Channel",
    (6, 1): "Amount",
    (6, 2): "Balance",
    (6, 3): "LimitAmount",
    (6, 4): "TakerPays",
    (6, 5): "TakerGets",
    (6, 8): "Fee",
    (6, 9): "SendMax",
    (6, 10): "DeliverMin",
    (6, 18): "DeliveredAmount",
    (7, 1): "PublicKey",
    (7, 3): "SigningPubKey",
    (7, 4): "TxnSignature",
    (7, 6): "Signature",
    (7, 12): "MemoType",
    (7, 13): "MemoData",
    (7, 14): "MemoFormat",
    (7, 16): "Fulfillment",
    (7, 17): "Condition",
    (8, 1): "Account",
    (8, 2): "Owner",
    (8, 3): "Destination",
    (8, 4): "Issuer",
    (8, 5): "Authorize",
    (8, 6): "Unauthorize",
    (8, 8): "RegularKey",
    (14, 10): "Memo",
    (14, 11): "SignerEntry",
    (14, 16): "Signer",
    (15, 3): "Signers",
    (15, 4): "SignerEntries",
    (15, 8): "AffectedNodes",
    (15, 9): "Memos",
    (16, 3): "TransactionResult",
    (18, 1): "Paths",
}
FIELD_IDS = {name: tf for tf, name in FIELDS.items()}

OBJECT_END = 0xE1  # type 14, field 1
ARRAY_END = 0xF1   # type 15, field 1

TX_TYPES: dict[str, int] = {
    "Payment": 0,
    "EscrowCreate": 1,
    "EscrowFinish": 2,
    "AccountSet": 3,
    "EscrowCancel": 4,
    "SetRegularKey": 5,
    "OfferCreate": 7,
    "OfferCancel": 8,
    "TicketCreate": 10,
    "SignerListSet": 12,
    "PaymentChannelCreate": 13,
    "PaymentChannelFund": 14,
    "PaymentChannelClaim": 15,
    "CheckCreate": 16,
    "CheckCash": 17,
    "CheckCancel": 18,
    "DepositPreauth": 19,
    "TrustSet": 20,
    "AccountDelete": 21,
    "EnableAmendment": 100,
    "SetFee": 101,
    "UNLModify": 102,
}
TX_TYPE_NAMES = {v: k for k, v in TX_TYPES.items()}

TX_RESULTS: dict[str, int] = {
    "tesSUCCESS": 0,
    "tecCLAIM": 100,
    "tecPATH_PARTIAL": 101,
    "tecUNFUNDED_ADD": 102,
    "tecUNFUNDED_OFFER": 103,
    "tecUNFUNDED_PAYMENT": 104,
    "tecFAILED_PROCESSING": 105,
    "tecDIR_FULL": 121,
    "tecINSUF_RESERVE_LINE": 122,
    "tecINSUF_RESERVE_OFFER": 123,
    "tecNO_DST": 124,
    "tecNO_DST_INSUF_XRP": 125,
    "tecNO_LINE_INSUF_RESERVE": 126,
    "tecNO_LINE_REDUNDANT": 127,
    "tecPATH_DRY": 128,
    "tecUNFUNDED": 129,
    "tecNO_ALTERNATIVE_KEY": 130,
    "tecNO_REGULAR_KEY": 131,
    "tecOWNERS": 132,
    "tecNO_ISSUER": 133,
    "tecNO_AUTH": 134,
    "tecNO_LINE": 135,
    "tecINSUFF_FEE": 136,
    "tecFROZEN": 137,
    "tecNO_TARGET": 138,
    "tecNO_PERMISSION": 139,
    "tecNO_ENTRY": 140,
    "tecINSUFFICIENT_RESERVE": 141,
    "tecNEED_MASTER_KEY": 142,
    "tecDST_TAG_NEEDED": 143,
    "tecINTERNAL": 144,
    "tecOVERSIZE": 145,
    "tecCRYPTOCONDITION_ERROR": 146,
    "tecINVARIANT_FAILED": 147,
    "tecEXPIRED": 148,
    "tecDUPLICATE": 149,
    "tecKILLED": 150,
}
TX_RESULT_NAMES = {v: k for k, v in TX_RESULTS.items()}

# ------------------------------------------------------------- base58check

B58_ALPHABET = "rpshnaf39wBUDNEGHJKLM4PQRST7VWXYZ2bcdeCg65jkm8oFqi1tuvAxyz"
_B58_INDEX = {c: i for i, c in enumerate(B58_ALPHABET)}


def _sha256d(b: bytes) -> bytes:
    return hashlib.sha256(hashlib.sha256(b).digest()).digest()


def account_id_to_address(account_id: bytes) -> str:
    """20-byte AccountID -> classic r-address (version 0x00 + checksum)."""
    payload = b"\x00" + account_id
    full = payload + _sha256d(payload)[:4]
    n = int.from_bytes(full, "big")
    out = []
    while n:
        n, r = divmod(n, 58)
        out.append(B58_ALPHABET[r])
    for byte in full:
        if byte == 0:
            out.append(B58_ALPHABET[0])
        else:
            break
    return "".join(reversed(out))


def _b58check_decode(s: str, version: bytes, payload_len: int, what: str) -> bytes:
    """Shared base58check decode: big-endian base58 with leading-'r'
    zero padding, 4-byte double-sha256 checksum, 1-byte version prefix
    stripped from the returned payload."""
    n = 0
    for c in s:
        n = n * 58 + _B58_INDEX[c]
    raw = n.to_bytes((n.bit_length() + 7) // 8, "big")
    pad = 0
    for c in s:
        if c == B58_ALPHABET[0]:
            pad += 1
        else:
            break
    full = b"\x00" * pad + raw
    payload, check = full[:-4], full[-4:]
    if _sha256d(payload)[:4] != check:
        raise ValueError(f"bad {what} checksum: {s}")
    if payload[:1] != version or len(payload) != payload_len:
        raise ValueError(f"not a {what}: {s}")
    return payload[1:]


def address_to_account_id(address: str) -> bytes:
    return _b58check_decode(address, b"\x00", 21, "classic AccountID")


def decode_node_public(key: str) -> bytes:
    """Node public key (n...) -> 33 key bytes (type prefix 0x1C + 4-byte
    base58check checksum stripped; the leading 0xED byte marking an
    Ed25519 key is KEPT -- the manifest serialization includes it,
    manifests.js:44-63 decodeNodePublic)."""
    return _b58check_decode(key, b"\x1c", 34, "node public key")


# ----------------------------------------------------------------- amounts

_IOU_FLAG = 1 << 63
_POS_FLAG = 1 << 62


def _currency_bytes(code: str) -> bytes:
    if len(code) == 3 and code.isascii():
        return b"\x00" * 12 + code.encode("ascii") + b"\x00" * 5
    if len(code) == 40:  # 160-bit hex form
        return bytes.fromhex(code)
    raise ValueError(f"bad currency code: {code}")


def _currency_str(b: bytes) -> str:
    iso = b[12:15]
    if b[:12] == b"\x00" * 12 and b[15:] == b"\x00" * 5 and iso != b"\x00\x00\x00":
        return iso.decode("ascii")
    return b.hex().upper()


def _encode_iou_value(value: str) -> int:
    d = Decimal(value)
    if d == 0:
        return _IOU_FLAG
    sign = 1 if d > 0 else 0
    t = d.normalize().as_tuple()
    mantissa = int("".join(map(str, t.digits)))
    exponent = t.exponent
    while mantissa < 10**15:
        mantissa *= 10
        exponent -= 1
    while mantissa >= 10**16:
        mantissa //= 10
        exponent += 1
    if not (-96 <= exponent <= 80):
        raise ValueError(f"IOU exponent out of range: {value}")
    return _IOU_FLAG | (sign << 62) | ((exponent + 97) << 54) | mantissa


def _decode_iou_value(bits: int) -> str:
    if bits == _IOU_FLAG:
        return "0"
    sign = 1 if bits & _POS_FLAG else -1
    exponent = ((bits >> 54) & 0xFF) - 97
    mantissa = bits & ((1 << 54) - 1)
    d = Decimal(sign * mantissa).scaleb(exponent)
    s = format(d.normalize(), "f")
    return s


def encode_amount(v) -> bytes:
    if isinstance(v, dict):  # IOU {value, currency, issuer}
        bits = _encode_iou_value(v["value"])
        return (
            bits.to_bytes(8, "big")
            + _currency_bytes(v["currency"])
            + address_to_account_id(v["issuer"])
        )
    drops = int(v)  # XRP: drops string/int, positive "not-IOU" form
    return (_POS_FLAG | drops).to_bytes(8, "big")


def decode_amount(buf: bytes, pos: int):
    bits = int.from_bytes(buf[pos : pos + 8], "big")
    if not bits & _IOU_FLAG:
        return str(bits & ~_POS_FLAG), pos + 8
    value = _decode_iou_value(bits)
    currency = _currency_str(buf[pos + 8 : pos + 28])
    issuer = account_id_to_address(buf[pos + 28 : pos + 48])
    return {"value": value, "currency": currency, "issuer": issuer}, pos + 48


# ------------------------------------------------------------ VL + headers


def _encode_vl(n: int) -> bytes:
    if n <= 192:
        return bytes([n])
    if n <= 12480:
        n -= 193
        return bytes([193 + (n >> 8), n & 0xFF])
    n -= 12481
    return bytes([241 + (n >> 16), (n >> 8) & 0xFF, n & 0xFF])


def _decode_vl(buf: bytes, pos: int) -> tuple[int, int]:
    b0 = buf[pos]
    if b0 <= 192:
        return b0, pos + 1
    if b0 <= 240:
        return 193 + ((b0 - 193) << 8) + buf[pos + 1], pos + 2
    return (
        12481 + ((b0 - 241) << 16) + (buf[pos + 1] << 8) + buf[pos + 2],
        pos + 3,
    )


def _field_header(type_code: int, field_code: int) -> bytes:
    if type_code < 16 and field_code < 16:
        return bytes([(type_code << 4) | field_code])
    if type_code < 16:
        return bytes([type_code << 4, field_code])
    if field_code < 16:
        return bytes([field_code, type_code])
    return bytes([0, type_code, field_code])


def _decode_field_header(buf: bytes, pos: int) -> tuple[int, int, int]:
    b0 = buf[pos]
    pos += 1
    type_code = b0 >> 4
    field_code = b0 & 0x0F
    if type_code == 0:
        type_code = buf[pos]
        pos += 1
    if field_code == 0:
        field_code = buf[pos]
        pos += 1
    return type_code, field_code, pos


# ----------------------------------------------------------------- pathset

_PATH_ACCOUNT = 0x01
_PATH_CURRENCY = 0x10
_PATH_ISSUER = 0x20


def _encode_pathset(paths) -> bytes:
    out = bytearray()
    for i, path in enumerate(paths):
        if i:
            out.append(0xFF)
        for step in path:
            flags = 0
            body = bytearray()
            if "account" in step:
                flags |= _PATH_ACCOUNT
                body += address_to_account_id(step["account"])
            if "currency" in step:
                flags |= _PATH_CURRENCY
                body += _currency_bytes(step["currency"])
            if "issuer" in step:
                flags |= _PATH_ISSUER
                body += address_to_account_id(step["issuer"])
            out.append(flags)
            out += body
    out.append(0x00)
    return bytes(out)


def _decode_pathset(buf: bytes, pos: int):
    paths, path = [], []
    while True:
        flags = buf[pos]
        pos += 1
        if flags == 0x00:
            if path:
                paths.append(path)
            return paths, pos
        if flags == 0xFF:
            paths.append(path)
            path = []
            continue
        step = {}
        if flags & _PATH_ACCOUNT:
            step["account"] = account_id_to_address(buf[pos : pos + 20])
            pos += 20
        if flags & _PATH_CURRENCY:
            step["currency"] = _currency_str(buf[pos : pos + 20])
            pos += 20
        if flags & _PATH_ISSUER:
            step["issuer"] = account_id_to_address(buf[pos : pos + 20])
            pos += 20
        # the reference's decoded JSON carries type markers per step
        step["type"] = flags
        step["type_hex"] = f"{flags:016X}"
        path.append(step)


# ------------------------------------------------------------ object codec


def _encode_field(name: str, value) -> bytes:
    type_code, field_code = FIELD_IDS[name]
    head = _field_header(type_code, field_code)
    if type_code == 1:  # UInt16
        n = TX_TYPES[value] if name == "TransactionType" else int(value)
        return head + n.to_bytes(2, "big")
    if type_code == 2:  # UInt32
        return head + int(value).to_bytes(4, "big")
    if type_code == 3:  # UInt64 (hex string in JSON)
        return head + int(value, 16).to_bytes(8, "big")
    if type_code in (4, 5, 17):  # fixed-width hashes
        return head + bytes.fromhex(value)
    if type_code == 6:
        return head + encode_amount(value)
    if type_code == 7:  # Blob (hex in JSON)
        raw = bytes.fromhex(value)
        return head + _encode_vl(len(raw)) + raw
    if type_code == 8:  # AccountID: VL-prefixed 20 bytes
        return head + b"\x14" + address_to_account_id(value)
    if type_code == 14:  # STObject
        return head + encode_object(value) + bytes([OBJECT_END])
    if type_code == 15:  # STArray of single-field wrapper objects
        out = bytearray(head)
        for elem in value:
            ((inner_name, inner_value),) = elem.items()
            out += _encode_field(inner_name, inner_value)
        out.append(ARRAY_END)
        return bytes(out)
    if type_code == 16:  # UInt8
        n = TX_RESULTS[value] if name == "TransactionResult" else int(value)
        return head + bytes([n])
    if type_code == 18:
        return head + _encode_pathset(value)
    raise ValueError(f"unsupported field {name}")


# JSON-only keys that are legitimately absent from the canonical binary
# form: the tx hash is derived from the binary, metaData/meta are stored
# as a separate cell, and the rest are rippled API display decorations.
ENCODE_SKIP_KEYS = frozenset(
    {"hash", "metaData", "meta", "date", "inLedger", "ledger_index",
     "validated", "delivered_amount", "DeliveredAmount_display"}
)


def encode_object(obj: dict, skip: frozenset[str] = frozenset()) -> bytes:
    """Canonical order: sort fields by (type code, field code).

    Unknown keys RAISE instead of being silently dropped: the reference
    stores the full canonical binary, so a field missing from the subset
    table would otherwise vanish from silver_transactions raw/meta with
    no diagnostic at write time.  Callers pass an explicit ``skip`` set
    for keys that are legitimately not part of the wire form.
    """
    unknown = [k for k in obj if k not in FIELD_IDS and k not in skip]
    if unknown:
        raise ValueError(
            f"cannot encode unknown field(s) {sorted(unknown)}: extend "
            "FIELDS or add to the skip set if JSON-only"
        )
    out = bytearray()
    for name in sorted(
        (k for k in obj if k in FIELD_IDS), key=lambda k: FIELD_IDS[k]
    ):
        out += _encode_field(name, obj[name])
    return bytes(out)


def encode_tx(tx: dict) -> str:
    """dict -> canonical-binary hex (the reference's ``toHex``,
    utils.js:60-62).  JSON-only keys (``hash``, ``metaData``, ...) are
    skipped via the explicit ENCODE_SKIP_KEYS list; any other unknown
    key raises (see encode_object)."""
    return encode_object(tx, skip=ENCODE_SKIP_KEYS).hex().upper()


_FIXED_WIDTH = {4: 16, 5: 32, 17: 20}


def _decode_field(buf: bytes, pos: int):
    type_code, field_code, pos = _decode_field_header(buf, pos)
    name = FIELDS.get((type_code, field_code), f"Field_{type_code}_{field_code}")
    if type_code == 1:
        n = int.from_bytes(buf[pos : pos + 2], "big")
        value = TX_TYPE_NAMES.get(n, n) if name == "TransactionType" else n
        return name, value, pos + 2
    if type_code == 2:
        return name, int.from_bytes(buf[pos : pos + 4], "big"), pos + 4
    if type_code == 3:
        return name, buf[pos : pos + 8].hex().upper(), pos + 8
    if type_code in _FIXED_WIDTH:
        w = _FIXED_WIDTH[type_code]
        return name, buf[pos : pos + w].hex().upper(), pos + w
    if type_code == 6:
        value, pos = decode_amount(buf, pos)
        return name, value, pos
    if type_code == 7:
        n, pos = _decode_vl(buf, pos)
        return name, buf[pos : pos + n].hex().upper(), pos + n
    if type_code == 8:
        n, pos = _decode_vl(buf, pos)
        return name, account_id_to_address(buf[pos : pos + n]), pos + n
    if type_code == 14:
        value, pos = _decode_object(buf, pos, end=OBJECT_END)
        return name, value, pos
    if type_code == 15:
        elems = []
        while buf[pos] != ARRAY_END:
            inner_name, inner_value, pos = _decode_field(buf, pos)
            elems.append({inner_name: inner_value})
        return name, elems, pos + 1
    if type_code == 16:
        n = buf[pos]
        value = TX_RESULT_NAMES.get(n, n) if name == "TransactionResult" else n
        return name, value, pos + 1
    if type_code == 18:
        value, pos = _decode_pathset(buf, pos)
        return name, value, pos
    if type_code == 19:  # Vector256
        n, pos = _decode_vl(buf, pos)
        value = [
            buf[p : p + 32].hex().upper() for p in range(pos, pos + n, 32)
        ]
        return name, value, pos + n
    raise ValueError(f"cannot decode type {type_code}")


def _decode_object(buf: bytes, pos: int, end: int | None = None):
    obj = {}
    while pos < len(buf):
        if end is not None and buf[pos] == end:
            return obj, pos + 1
        name, value, pos = _decode_field(buf, pos)
        obj[name] = value
    return obj, pos


def decode_tx(hex_blob: str) -> dict:
    """Canonical-binary hex -> display dict (the reference's
    ``binary.decode`` read path, data.js:2083-2084)."""
    return _decode_object(bytes.fromhex(hex_blob), 0)[0]
