"""Reference pins for the manifest INGEST plane (handleManifest,
lib/validations/manifests.js:338-421), replayed through the engine's
handle_manifests fold.

Every signature-free expectation from test.manifests.js is pinned --
the five admission gates with their exact reject strings, the
revocation exemption, same-seq/different-ephemeral separate rows,
duplicate count folding, stale-vs-new active-key selection, and both
revocation-masking cases -- plus the mock/manifests.json corpus the
GET-route mocha family seeds, checked against
mock/manifests.responses.json.  The only stubbed piece is the Ed25519
verify hook (verify_manifest_signature; documented out-of-scope
cryptography), so the two invalid-signature mocha cases are the
documented exclusion.
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
