"""Reference pins for the manifest INGEST plane (handleManifest,
lib/validations/manifests.js:338-421), replayed through the engine's
handle_manifests fold.

Every signature-free expectation from test.manifests.js is pinned --
the five admission gates with their exact reject strings, the
revocation exemption, same-seq/different-ephemeral separate rows,
duplicate count folding, stale-vs-new active-key selection, and both
revocation-masking cases -- plus the mock/manifests.json corpus the
GET-route mocha family seeds, checked against
mock/manifests.responses.json.

Round 12 retires the last stub: verify_manifest_signature is a real
pure-Python Ed25519 verifier (functions/ed25519.py, RFC 8032), so the
two invalid-signature mocha cases (:130-153) and the
valid-master-signature-beats-bad-ephemeral case (:155-162) are pinned
too, and the whole mock corpus re-verifies cryptographically through
handle_manifests(verify_signatures=True).
"""

from __future__ import annotations

import json
import os

import pytest

MOCK = "/root/reference/test/mock"
pytestmark = pytest.mark.skipif(
    not os.path.isfile(os.path.join(MOCK, "manifests.json")),
    reason="reference mock fixtures not present",
)

RAW_SCHEMA = (
    "master_public_key string, ephemeral_public_key string, "
    "sequence long, signature string, master_signature string, "
    "timestamp timestamp"
)

MAX_SEQ = 4294967295


def _raw(spark, rows):
    import datetime as dt

    def row(r, i):
        return (
            r.get("master_key"),
            r.get("signing_key"),
            r.get("seq"),
            r.get("signature"),
            r.get("master_signature"),
            dt.datetime(2016, 1, 1) + dt.timedelta(seconds=i),
        )

    return spark.createDataFrame(
        [row(r, i) for i, r in enumerate(rows)], RAW_SCHEMA
    )


def _handle(spark, rows):
    from rippled_historical_database_spark.operators.xrpl_topology import (
        handle_manifests,
    )

    return handle_manifests(_raw(spark, rows))


MANIFEST = {  # test.manifests.js:36-41
    "signing_key": "n9LRZXPh1XZaJr5kVpdciN76WCCcb5ZRwjvHywd4Vc4fxyfGEDJA",
    "master_key": "nHU5wPBpv1kk3kafS2ML2GhyoGJuHhPP4fCa2dwYUjMT5wR8Dk5B",
    "seq": 4,
    "signature": "ba37041d",
}


def test_save_manifest(spark):
    """test.manifests.js:35-65: one by-validator row with the manifest
    fields, one by-master row with (ephemeral, sequence)."""
    bv, bm, rej = _handle(spark, [MANIFEST])
    (r,) = bv.collect()
    assert r.master_public_key == MANIFEST["master_key"]
    assert r.ephemeral_public_key == MANIFEST["signing_key"]
    assert r.sequence == 4
    assert r.signature == MANIFEST["signature"]
    assert r["count"] == 1
    (a,) = bm.collect()
    assert a.master_public_key == MANIFEST["master_key"]
    assert a.ephemeral_public_key == MANIFEST["signing_key"]
    assert a.sequence == 4
    assert rej.count() == 0


@pytest.mark.parametrize(
    "patch,reason",
    [
        # :96-105 -- no master key
        ({"master_key": None}, "master_key cannot be null"),
        # :107-116 -- no sequence (JS-falsy: absent)
        ({"seq": None}, "seq cannot be null"),
        # `!manifest.sequence`: 0 is falsy too
        ({"seq": 0}, "seq cannot be null"),
        # manifests.js:342-343
        ({"seq": MAX_SEQ + 1}, "seq cannot be greater than MAX_SEQUENCE"),
        # :77-86 -- no ephemeral key (and not a revocation)
        ({"signing_key": None}, "signing_key cannot be null"),
        # :118-127 -- neither signature
        (
            {"signature": None, "master_signature": None},
            "master signature and signature cannot be null",
        ),
    ],
)
def test_admission_gates(spark, patch, reason):
    bv, bm, rej = _handle(spark, [{**MANIFEST, **patch}])
    (r,) = rej.collect()
    assert r.reject_reason == reason
    assert bv.count() == 0 and bm.count() == 0


def test_revocation_needs_no_ephemeral_key(spark):
    """test.manifests.js:88-94: seq == MAX_SEQUENCE admits without a
    signing key (master_signature only)."""
    bv, bm, rej = _handle(
        spark,
        [{
            "master_key": "nHB1PvPGSZhhNfdYDbwBmRmSWAEfd8YH97K9Bey82obyFh1nKDmq",
            "seq": MAX_SEQ,
            "master_signature": "A7D7E9C8",
        }],
    )
    assert rej.count() == 0
    assert bv.count() == 1
    assert bm.count() == 0  # a revocation never creates an active row


def test_same_seq_different_ephemeral_separate_rows(spark):
    """test.manifests.js:164-210: two rows, count 1 each."""
    m1 = {**MANIFEST, "signing_key": "n9Jxs", "master_key": "nHDaAY"}
    m2 = {**MANIFEST, "signing_key": "n9L3k", "master_key": "nHDaAY"}
    bv, _, _ = _handle(spark, [m1, m2])
    rows = bv.collect()
    assert len(rows) == 2
    assert {r.ephemeral_public_key for r in rows} == {"n9Jxs", "n9L3k"}
    assert all(r["count"] == 1 for r in rows)


def test_duplicate_folds_count_and_last_datetime(spark):
    """test.manifests.js:212-255 + :257-289: a re-sighted manifest is
    ONE row with count 2 and an advanced last_datetime."""
    bv, _, _ = _handle(spark, [MANIFEST, MANIFEST])
    (r,) = bv.collect()
    assert r["count"] == 2
    assert r.first_datetime < r.last_datetime


def test_active_key_takes_highest_sequence_any_order(spark):
    """test.manifests.js:291-380 (cache new / ignore stale): the active
    row is the highest sequence whichever order the sightings arrive."""
    old = {**MANIFEST, "seq": 2, "signing_key": "n9KXu"}
    new = {**MANIFEST, "seq": 4, "signing_key": "n9LRZ"}
    for order in ([old, new], [new, old]):
        bv, bm, _ = _handle(spark, order)
        assert bv.count() == 2
        (a,) = bm.collect()
        assert (a.sequence, a.ephemeral_public_key) == (4, "n9LRZ")


def test_revocation_masks_master(spark):
    """test.manifests.js:381-431: a revocation sighting leaves the
    by-validator history intact but removes (or never creates) the
    active row."""
    revoke = {
        "master_key": MANIFEST["master_key"],
        "signing_key": "n9KVo",
        "seq": MAX_SEQ,
        "signature": "4d62df",
    }
    # first manifest IS the revocation
    bv, bm, _ = _handle(spark, [revoke])
    assert bv.count() == 1 and bm.count() == 0
    # revocation after a valid manifest
    bv, bm, _ = _handle(spark, [MANIFEST, revoke])
    assert bv.count() == 2 and bm.count() == 0


def test_mock_manifest_corpus(spark):
    """The GET-route family's seed corpus (mock/manifests.json through
    handleManifest; test.manifests.js:448-620): per-master by-validator
    counts match mock/manifests.responses.json -- 1 for nHBV…, 2 for
    nHDEmQKb…, 2 for nHUtR1… (one a revocation) -- and the revoked
    master nHUtR1… has no active row while the others serve their
    highest sequence."""
    rows = json.load(open(os.path.join(MOCK, "manifests.json")))
    responses = json.load(open(os.path.join(MOCK, "manifests.responses.json")))
    bv, bm, rej = _handle(spark, rows)
    assert rej.count() == 0
    counts = {
        r.master_public_key: r.n
        for r in bv.groupBy("master_public_key").count()
        .withColumnRenamed("count", "n").collect()
    }
    assert counts == {k: len(v) for k, v in responses.items()}
    seqs = {
        (r.master_public_key, r.sequence) for r in bv.collect()
    }
    for master, resp in responses.items():
        for m in resp:
            assert (master, int(m["sequence"])) in seqs
    active = {r.master_public_key: r.sequence for r in bm.collect()}
    assert "nHUtR1DUzB5AbHFDTwByTF684SwvyDxDqwcsBavZR62VFESMCBHj" not in active
    assert active["nHDEmQKb2nbcewdQ1fqCTGcPTcePhJ2Rh6MRftsCaf6UNRQLv7pB"] == 2
    assert active["nHBV75zgMXCRHiuTMq6MdbcA6tBoSMWucTvHrnkQFW9gAXWoW15N"] == 1


# ------------------------------------------- Ed25519 signature gate


def _v(m):
    from rippled_historical_database_spark.operators.xrpl_topology import (
        verify_manifest_signature,
    )

    return verify_manifest_signature(
        {
            "sequence": m.get("seq"),
            "master_public_key": m.get("master_key"),
            "ephemeral_public_key": m.get("signing_key"),
            "signature": m.get("signature"),
            "master_signature": m.get("master_signature"),
        }
    )


def test_mock_corpus_signatures_all_verify():
    """Every manifest the reference's GET-route family seeds carries a
    valid Ed25519 master(-field) signature (manifests.js:38-72 resolves
    them all); the pure-Python verifier agrees on all five, including
    the no-ephemeral revocation."""
    rows = json.load(open(os.path.join(MOCK, "manifests.json")))
    assert len(rows) == 5
    assert all(_v(m) for m in rows)
    # tampering any signed field flips the verdict
    assert not _v({**rows[0], "seq": rows[0]["seq"] + 1})
    assert not _v(
        {**rows[0], "master_signature": "AB" + rows[0]["master_signature"][2:]}
    )


def test_mocha_invalid_signature_rejected():
    """test.manifests.js:130-141 'should require a valid signature':
    an undecodable signature fails closed."""
    assert not _v(
        {
            "master_key": "nHU5wPBpv1kk3kafS2ML2GhyoGJuHhPP4fCa2dwYUjMT5wR8Dk5B",
            "signing_key": "n9LRZXPh1XZaJr5kVpdciN76WCCcb5ZRwjvHywd4Vc4fxyfGEDJA",
            "seq": 4,
            "signature": "badsig",
        }
    )


def test_mocha_invalid_master_signature_rejected():
    """test.manifests.js:142-153 'should require a valid master
    signature': master_signature is PREFERRED (manifests.js:47), so a
    bad one rejects even alongside a well-formed ephemeral
    signature."""
    assert not _v(
        {
            "master_key": "nHUM1j7YGDVH7VbYw7bvjh9QR4f59GmQjwaNvnG34ki6U2upPYmY",
            "signing_key": "n9Kk6U5nSF8EggfmTpMdna96UuXWAVwSsDSXRkXeZ5vLcAFk77tr",
            "seq": 4,
            "signature": "3045022100b05e6738721100bf3eee37acab2ad60070bf9c7f"
            "a8e494f0d3f4de5eca291a220220677943ea5b1fcaadb71e6288a4a09822"
            "79c21bfbdcb3b0c3c26dffb84c27dd99",
            "master_signature": "badsig",
        }
    )


def test_mocha_ephemeral_signature_not_checked():
    """test.manifests.js:155-162 'should not require a valid ephemeral
    signature': a garbage ephemeral `signature` is irrelevant when the
    master signature verifies."""
    assert _v(
        {
            "master_key": "nHUM1j7YGDVH7VbYw7bvjh9QR4f59GmQjwaNvnG34ki6U2upPYmY",
            "signing_key": "n9Kk6U5nSF8EggfmTpMdna96UuXWAVwSsDSXRkXeZ5vLcAFk77tr",
            "seq": 4,
            "signature": "badsig",
            "master_signature": "26e008edecbf7457f05fe569dbb6e0a6117da7d2"
            "e6903664647265429dae3acd5edc1fdbfdb792ff038086db46a98205d4d9"
            "ca73b8ef6a41ee42aa6ac3f5a70c",
        }
    )


def test_signature_gate_in_fold(spark):
    """handle_manifests(verify_signatures=True) over the real corpus
    plus one forged sighting: the five genuine manifests admit (same
    by-validator/by-master shape as the signature-free pin) while every
    sighting of the forged manifest rejects with the reference's exact
    string (manifests.js:380 'Manifest has invalid signature')."""
    rows = json.load(open(os.path.join(MOCK, "manifests.json")))
    forged = {
        **rows[0],
        "seq": 3,  # re-signed nothing: the seq-1 signature can't cover it
    }
    from rippled_historical_database_spark.operators.xrpl_topology import (
        handle_manifests,
    )

    # the forged manifest is sighted twice: BOTH sightings must reject
    bv, bm, rej = handle_manifests(
        _raw(spark, rows + [forged, forged]), verify_signatures=True
    )
    assert bv.count() == 5
    rejects = rej.collect()
    assert len(rejects) == 2
    assert all(
        r.reject_reason == "Manifest has invalid signature" for r in rejects
    )
    assert all(r.sequence == 3 for r in rejects)
    active = {r.master_public_key: r.sequence for r in bm.collect()}
    assert active == {
        "nHBV75zgMXCRHiuTMq6MdbcA6tBoSMWucTvHrnkQFW9gAXWoW15N": 1,
        "nHDEmQKb2nbcewdQ1fqCTGcPTcePhJ2Rh6MRftsCaf6UNRQLv7pB": 2,
    }
