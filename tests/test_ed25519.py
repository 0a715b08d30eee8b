"""RFC 8032 §7.1 test vectors for the pure-Python Ed25519 verifier
(functions/ed25519.py) -- the primitive under the manifest admission
gate.  Vectors are published in the RFC (public knowledge)."""

from __future__ import annotations

import pytest

from rippled_historical_database_spark.functions.ed25519 import (
    ed25519_verify,
)

# (public_key, message, signature) -- RFC 8032 §7.1 TEST 1-3
VECTORS = [
    (
        "d75a980182b10ab7d54bfed3c964073a0ee172f3daa62325af021a68f707511a",
        "",
        "e5564300c360ac729086e2cc806e828a84877f1eb8e5d974d873e065224901555fb8821590a33bacc61e39701cf9b46bd25bf5f0595bbe24655141438e7a100b",
    ),
    (
        "3d4017c3e843895a92b70aa74d1b7ebc9c982ccf2ec4968cc0cd55f12af4660c",
        "72",
        "92a009a9f0d4cab8720e820b5f642540a2b27b5416503f8fb3762223ebdb69da085ac1e43e15996e458f3613d0f11d8c387b2eaeb4302aeeb00d291612bb0c00",
    ),
    (
        "fc51cd8e6218a1a38da47ed00230f0580816ed13ba3303ac5deb911548908025",
        "af82",
        "6291d657deec24024827e69c3abe01a30ce548a284743a445e3680d7db5ac3ac18ff9b538d16f290ae67f760984dc6594a7c15e9716ed28dc027beceea1ec40a",
    ),
]


@pytest.mark.parametrize("pk,msg,sig", VECTORS)
def test_rfc8032_vectors_verify(pk, msg, sig):
    assert ed25519_verify(
        bytes.fromhex(pk), bytes.fromhex(msg), bytes.fromhex(sig)
    )


@pytest.mark.parametrize("pk,msg,sig", VECTORS)
def test_tampered_message_fails(pk, msg, sig):
    assert not ed25519_verify(
        bytes.fromhex(pk), bytes.fromhex(msg) + b"x", bytes.fromhex(sig)
    )


def test_tampered_signature_fails():
    pk, msg, sig = VECTORS[0]
    bad = bytearray(bytes.fromhex(sig))
    bad[0] ^= 1
    assert not ed25519_verify(bytes.fromhex(pk), b"", bytes(bad))


def test_malformed_inputs_fail_closed():
    pk, msg, sig = VECTORS[0]
    assert not ed25519_verify(b"\x00" * 31, b"", bytes.fromhex(sig))
    assert not ed25519_verify(bytes.fromhex(pk), b"", b"\x00" * 63)
    # S >= group order is rejected (malleability guard)
    big_s = bytes.fromhex(sig)[:32] + b"\xff" * 32
    assert not ed25519_verify(bytes.fromhex(pk), b"", big_s)
