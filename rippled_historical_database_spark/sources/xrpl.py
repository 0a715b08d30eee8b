"""Bronze ingest of real XRPL ledger JSON (the reference's input format).

Reference ingest plane (SURVEY.md section 3.2): rippled websocket ->
``LedgerStream`` queue -> per-ledger parse -> HBase tables
(``lib/ledgerStream.js:30-113``, ``test/setup.importLedgers.js:33-78``).
Here a ledger JSON document (one per closed ledger, the exact shape the
``ledger`` RPC returns and the mock fixtures under
``test/mock/ledgers/*.json`` capture) lands as ONE bronze row holding a
``VARIANT`` of the whole document.

Why VARIANT and not schema inference: transaction fields are
heterogeneous by design -- ``Amount``/``TakerPays``/``TakerGets`` are a
drops *string* for XRP but an *object* {currency, issuer, value} for
IOUs (``lib/ledgerParser/exchanges.js:57-99`` branches on typeof).
Schema inference would unify them into corrupt records; VARIANT keeps
every tx intact, typed access happens per-path with ``try_variant_get``
(all JVM-side, no Python), and the silver parsers branch on path
null-ness exactly where the reference branches on ``typeof``.

Scale: bronze is one row per ledger (tens of tx each) -- at 100 TB this
partitions by close date; the tx explode is a narrow map (no shuffle),
and silver derivations fan out from the exploded frame with the
(ledger_index, tx_index, node_index) event order the reference encodes
in rowkeys (``data.js:2750-2754``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

# Ripple epoch offset: seconds between 1970-01-01 and 2000-01-01
# (lib/ledgerParser/index.js:5, 38-40).
RIPPLE_EPOCH = 946684800

XRP_ADJUST = 1_000_000  # drops per XRP (ledgerParser/exchanges.js:3)

DEC = "decimal(38,18)"  # BigNumber-equivalent arithmetic


def vstr(col: str | Column, path: str) -> Column:
    """Typed-string path access into a VARIANT column.  For a JSON
    object value this yields its JSON text; for a scalar, the scalar --
    the same duality the reference's ``typeof`` checks exploit."""
    return F.try_variant_get(col, path, "string")


def read_ledgers_bronze(spark: SparkSession, path: str) -> DataFrame:
    """One bronze row per ledger file: the full document as VARIANT plus
    the header scalars every downstream derivation keys on."""
    raw = spark.read.text(path, wholetext=True)
    v = raw.select(F.parse_json(F.col("value")).alias("v"))
    close_time = vstr("v", "$.close_time").cast("long") + F.lit(RIPPLE_EPOCH)
    return v.select(
        vstr("v", "$.ledger_index").cast("long").alias("ledger_index"),
        vstr("v", "$.ledger_hash").alias("ledger_hash"),
        vstr("v", "$.parent_hash").alias("parent_hash"),
        F.timestamp_seconds(close_time).alias("close_time"),
        vstr("v", "$.total_coins").cast("decimal(38,0)").alias("total_coins"),
        F.array_size(
            F.try_variant_get("v", "$.transactions", "array<variant>")
        ).alias("tx_count"),
        F.col("v"),
    )


def transactions_bronze(ledgers: DataFrame) -> DataFrame:
    """Explode ledgers into one row per transaction: header scalars +
    the tx VARIANT (raw preserved; silver parsers pull typed paths)."""
    txs = ledgers.select(
        "ledger_index",
        "close_time",
        F.posexplode(
            F.try_variant_get("v", "$.transactions", "array<variant>")
        ).alias("_pos", "tx"),
    )
    return txs.select(
        "ledger_index",
        F.col("close_time").alias("executed_time"),
        vstr("tx", "$.metaData.TransactionIndex").cast("int").alias("tx_index"),
        vstr("tx", "$.hash").alias("tx_hash"),
        vstr("tx", "$.TransactionType").alias("tx_type"),
        vstr("tx", "$.Account").alias("account"),
        vstr("tx", "$.Fee").cast(DEC).alias("fee_drops"),
        vstr("tx", "$.Sequence").cast("long").alias("sequence"),
        vstr("tx", "$.metaData.TransactionResult").alias("result"),
        F.col("tx"),
    )


def affected_nodes(txs: DataFrame) -> DataFrame:
    """Explode each tx's meta into (node_index, wrapper-variant) rows --
    the frame every silver parser starts from.  ``node`` is the
    Modified/Created/Deleted payload; ``node_class`` says which."""
    nodes = txs.select(
        "ledger_index", "executed_time", "tx_index", "tx_hash", "tx_type",
        "account", "fee_drops", "result", "tx",
        F.posexplode(
            F.try_variant_get("tx", "$.metaData.AffectedNodes", "array<variant>")
        ).alias("node_index", "wrapper"),
    )
    modified = F.try_variant_get("wrapper", "$.ModifiedNode", "variant")
    created = F.try_variant_get("wrapper", "$.CreatedNode", "variant")
    deleted = F.try_variant_get("wrapper", "$.DeletedNode", "variant")
    return nodes.select(
        "*",
        F.coalesce(modified, created, deleted).alias("node"),
        F.when(modified.isNotNull(), "ModifiedNode")
        .when(created.isNotNull(), "CreatedNode")
        .otherwise("DeletedNode")
        .alias("node_class"),
    ).withColumn("entry_type", vstr("node", "$.LedgerEntryType"))
