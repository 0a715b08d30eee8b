"""The parser layer: row-level transforms that fan one transaction into
derived event rows (SURVEY.md section 2.8 -- the reference's real
business logic, ``lib/ledgerParser/*.js``).

All of these are pure functions of one input row, so they compile to
native column expressions (when-chains, JSON extraction, encode/decode,
unions of projections) that stay inside whole-stage codegen -- zero
Python UDFs (SURVEY.md 2.10 design rule).  Synthetic-table mapping:
``events`` rows play transactions; ``props`` (a JSON string) plays the
parsed metadata blob; ``documents.text`` plays memo payloads.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.registry import register
from ..sources.catalog import load_table

# delivered_amount display rule cutoff (data.js:2086-2107 uses ledger
# 4594094; scaled to the synthetic id space). Encoded as data, not a
# comment (SURVEY.md 7.8).
PARTIAL_PAYMENT_CUTOFF_ID = 500


@register(
    "parse_props_classifier",
    oracle="""
    SELECT event_id, user_id, event_type,
           CAST(props->>'k' AS BIGINT) AS k,
           CASE
             WHEN event_type = 'signup' THEN 'account_created'
             WHEN event_type = 'purchase' AND CAST(props->>'k' AS BIGINT) = 0
               THEN 'fee'
             WHEN event_type = 'purchase' AND CAST(props->>'k' AS BIGINT) % 2 = 0
               THEN 'payment_source'
             WHEN event_type = 'purchase' THEN 'payment_destination'
             WHEN event_type = 'click' AND value > 100 THEN 'exchange'
             WHEN event_type IN ('click', 'view') THEN 'intermediary'
             ELSE NULL
           END AS change_type
    FROM events
    ORDER BY event_id
    """,
    doc="balanceChanges change-type classifier (ledgerParser/"
        "balanceChanges.js:23-93, a 9-branch type inference) as a when-"
        "chain over JSON-extracted metadata; props JSON parsed natively "
        "(get_json_object), no stringify round-trip.",
    tags=("parser",),
)
def parse_props_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        e.select(
            "event_id", "user_id", "event_type", k.alias("k"),
            F.when(F.col("event_type") == "signup", "account_created")
            .when((F.col("event_type") == "purchase") & (k == 0), "fee")
            .when((F.col("event_type") == "purchase") & (k % 2 == 0), "payment_source")
            .when(F.col("event_type") == "purchase", "payment_destination")
            .when((F.col("event_type") == "click") & (F.col("value") > 100), "exchange")
            .when(F.col("event_type").isin("click", "view"), "intermediary")
            .alias("change_type"),
        )
        .orderBy("event_id")
    )


@register(
    "parse_memo_decode",
    oracle="""
    WITH encoded AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN hex(encode(substr(text, 1, 40)))
                    ELSE base64(encode(substr(text, 1, 40))) END AS memo_data
        FROM documents
    )
    SELECT doc_id, memo_data,
           CASE WHEN regexp_full_match(memo_data, '^(?:[0-9A-F]{2})+$') THEN 'hex'
                WHEN regexp_full_match(memo_data,
                     '^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$')
                  THEN 'base64'
                ELSE NULL END AS data_encoding,
           CASE WHEN regexp_full_match(memo_data, '^(?:[0-9A-F]{2})+$')
                  THEN decode(unhex(memo_data))
                WHEN regexp_full_match(memo_data,
                     '^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$')
                  THEN decode(from_base64(memo_data))
                ELSE NULL END AS decoded_data
    FROM encoded
    ORDER BY doc_id
    """,
    doc="Memo hex/base64 detection + UTF-8 decode (ledgerParser/memos.js:"
        "5-116): regex encoding detection with the same branch order as the "
        "reference (hex wins over base64), native unhex/unbase64 -- no UDF.",
    tags=("parser", "decode"),
)
def parse_memo_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    payload = F.substring("text", 1, 40)
    memo = F.when(
        F.col("doc_id") % 2 == 0, F.hex(payload.cast("binary"))
    ).otherwise(F.base64(payload.cast("binary")))
    hex_re = "^(?:[0-9A-F]{2})+$"
    b64_re = "^(?:[A-Za-z0-9+/]{4})*(?:[A-Za-z0-9+/]{2}==|[A-Za-z0-9+/]{3}=)?$"
    enc = d.select("doc_id", memo.alias("memo_data"))
    is_hex = F.col("memo_data").rlike(hex_re)
    is_b64 = F.col("memo_data").rlike(b64_re)
    return (
        enc.select(
            "doc_id",
            "memo_data",
            F.when(is_hex, "hex").when(is_b64, "base64").alias("data_encoding"),
            F.when(is_hex, F.decode(F.unhex(F.col("memo_data")), "UTF-8"))
            .when(is_b64, F.decode(F.unbase64(F.col("memo_data")), "UTF-8"))
            .alias("decoded_data"),
        )
        .orderBy("doc_id")
    )


@register(
    "parse_delivered_amount",
    oracle=f"""
    SELECT event_id, event_type, value,
           CASE
             WHEN event_type <> 'purchase' THEN NULL
             WHEN CAST(props->>'k' AS BIGINT) > 50 THEN value
             WHEN event_id > {PARTIAL_PAYMENT_CUTOFF_ID} THEN value
             ELSE NULL
           END AS delivered_amount,
           CASE
             WHEN event_type = 'purchase' AND CAST(props->>'k' AS BIGINT) <= 50
                  AND event_id <= {PARTIAL_PAYMENT_CUTOFF_ID}
               THEN 'unavailable' END AS delivered_note
    FROM events
    ORDER BY event_id
    """,
    doc="delivered_amount display rule with the historical ledger cutoff "
        "(DeliveredAmount || Amount if not partial || Amount if ledger > "
        "4594094 || 'unavailable'; data.js:2066-2107) as a when-chain with "
        "the cutoff encoded as a named constant.",
    tags=("parser",),
)
def parse_delivered_amount(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    is_pay = F.col("event_type") == "purchase"
    return (
        e.select(
            "event_id", "event_type", "value",
            F.when(~is_pay, F.lit(None).cast("double"))
            .when(k > 50, F.col("value"))
            .when(F.col("event_id") > PARTIAL_PAYMENT_CUTOFF_ID, F.col("value"))
            .alias("delivered_amount"),
            F.when(
                is_pay & (k <= 50) & (F.col("event_id") <= PARTIAL_PAYMENT_CUTOFF_ID),
                "unavailable",
            ).alias("delivered_note"),
        )
        .orderBy("event_id")
    )


@register(
    "parse_pair_canonical",
    oracle="""
    WITH raw AS (
        SELECT event_id,
               event_type AS base,
               'm' || CAST(user_id % 3 AS VARCHAR) AS counter,
               1 + user_id / 100.0 AS rate
        FROM events WHERE event_type IN ('purchase', 'view')
    )
    SELECT event_id,
           LEAST(base, counter) AS base,
           GREATEST(base, counter) AS counter,
           CASE WHEN base <= counter THEN rate ELSE 1.0 / rate END AS rate,
           base > counter AS inverted
    FROM raw
    ORDER BY event_id
    """,
    doc="Canonical pair ordering + inversion algebra (ledgerParser/"
        "exchanges.js:180-199 parser side; data.js:1480-1524 query side): "
        "pair stored in lexicographic order, inverted pairs get rate -> "
        "1/rate. Property: query(A/B) == invert(query(B/A)).",
    tags=("parser", "pairs"),
)
def parse_pair_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "view")
    )
    raw = e.select(
        "event_id",
        F.col("event_type").alias("base"),
        F.concat(F.lit("m"), (F.col("user_id") % 3).cast("string")).alias("counter"),
        (F.lit(1) + F.col("user_id") / 100.0).alias("rate"),
    )
    swapped = F.col("base") > F.col("counter")
    return (
        raw.select(
            "event_id",
            F.least("base", "counter").alias("base"),
            F.greatest("base", "counter").alias("counter"),
            F.when(~swapped, F.col("rate")).otherwise(1.0 / F.col("rate")).alias("rate"),
            swapped.alias("inverted"),
        )
        .orderBy("event_id")
    )


@register(
    "parse_quality_decode",
    oracle="""
    SELECT doc_id,
           substr(md5(text), 1, 12) AS quality_hex,
           CAST(CAST('0x' || substr(md5(text), 1, 12) AS BIGINT) AS DOUBLE)
             * (CASE WHEN CAST(CAST('0x' || substr(md5(text), 13, 1) AS BIGINT)
                          AS INT) % 2 = 0
                     THEN 1e-6 ELSE 1e-7 END) AS quality
    FROM documents
    ORDER BY doc_id
    """,
    doc="BookDirectory quality decode (ledgerParser/quality.js:5-21: last "
        "16 hex chars -> mantissa * 10^(offset-100), XRP shift): hex "
        "mantissa via conv()/hex-cast arithmetic, scale via a literal "
        "lookup -- column expressions, not a UDF (SURVEY.md 2.10).",
    tags=("parser", "decode"),
)
def parse_quality_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    h = F.md5(F.col("text").cast("binary"))
    mantissa = F.conv(F.substring(h, 1, 12), 16, 10).cast("bigint").cast("double")
    exp_nibble = F.conv(F.substring(h, 13, 1), 16, 10).cast("int")
    scale = F.when(exp_nibble % 2 == 0, F.lit(1e-6)).otherwise(F.lit(1e-7))
    return (
        d.select(
            "doc_id",
            F.substring(h, 1, 12).alias("quality_hex"),
            (mantissa * scale).alias("quality"),
        )
        .orderBy("doc_id")
    )


@register(
    "parse_time_roundtrip",
    oracle="""
    SELECT event_id,
           strftime(ts, '%Y%m%d%H%M%S') AS rowkey_time,
           strptime(strftime(ts, '%Y%m%d%H%M%S'), '%Y%m%d%H%M%S') AS reparsed
    FROM events
    WHERE event_id < 100
    ORDER BY event_id
    """,
    doc="smoment time format/unformat (lib/smoment.js:14-64, utils.js:9-33): "
        "the YYYYMMDDHHmmss rowkey time format as date_format/to_timestamp "
        "round trip -- the rowkey encoding survives only at the API edge.",
    tags=("parser", "time"),
)
def parse_time_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 100)
    fmt = F.date_format("ts", "yyyyMMddHHmmss")
    return (
        e.select(
            "event_id",
            fmt.alias("rowkey_time"),
            F.to_timestamp(fmt, "yyyyMMddHHmmss").alias("reparsed"),
        )
        .orderBy("event_id")
    )


@register(
    "parse_balance_mirror",
    oracle="""
    WITH pay AS (
        SELECT event_id, ts, user_id,
               (user_id + event_id % 7 + 1) % 15 AS counterparty,
               value, value * 0.001 AS fee
        FROM events WHERE event_type = 'purchase'
    )
    SELECT user_id AS account, counterparty,
           -value AS amount_change, 'payment_source' AS change_type,
           0 AS node_index, event_id, ts
    FROM pay
    UNION ALL
    SELECT counterparty, user_id, value, 'payment_destination', 1, event_id, ts
    FROM pay
    UNION ALL
    SELECT user_id, NULL, -fee, 'fee', -1, event_id, ts
    FROM pay
    ORDER BY event_id, node_index
    """,
    doc="balanceChanges mirrored rows + fee split (ledgerParser/"
        "balanceChanges.js:114-167: AccountRoot fee split out as a separate "
        "type='fee' row with node_index=-1; RippleState nodes emit two "
        "mirrored negated rows): union of three projections over one scan. "
        "Invariant: sum(amount_change) per tx = -fee (FIXTURES.md 5.4).",
    tags=("parser", "silver"),
)
def parse_balance_mirror(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pay = e.select(
        "event_id", "ts", "user_id",
        ((F.col("user_id") + F.col("event_id") % 7 + 1) % 15).alias("counterparty"),
        "value",
        (F.col("value") * 0.001).alias("fee"),
    )
    src = pay.select(
        F.col("user_id").alias("account"),
        F.col("counterparty"),
        (-F.col("value")).alias("amount_change"),
        F.lit("payment_source").alias("change_type"),
        F.lit(0).alias("node_index"),
        "event_id", "ts",
    )
    dst = pay.select(
        F.col("counterparty").alias("account"),
        F.col("user_id").alias("counterparty"),
        F.col("value").alias("amount_change"),
        F.lit("payment_destination").alias("change_type"),
        F.lit(1).alias("node_index"),
        "event_id", "ts",
    )
    fee = pay.select(
        F.col("user_id").alias("account"),
        F.lit(None).cast("bigint").alias("counterparty"),
        (-F.col("fee")).alias("amount_change"),
        F.lit("fee").alias("change_type"),
        F.lit(-1).alias("node_index"),
        "event_id", "ts",
    )
    return src.unionByName(dst).unionByName(fee).orderBy("event_id", "node_index")


@register(
    "parse_affected_accounts",
    oracle="""
    WITH pay AS (
        SELECT event_id, user_id, (user_id + event_id % 7 + 1) % 15 AS counterparty
        FROM events WHERE event_type = 'purchase'
    ),
    touched AS (
        SELECT event_id, user_id AS account FROM pay
        UNION ALL
        SELECT event_id, counterparty FROM pay
    )
    SELECT DISTINCT event_id, account FROM touched
    ORDER BY event_id, account
    """,
    doc="affectedAccounts (ledgerParser/affectedAccounts.js:4-26): every "
        "account touched by a tx = union of account fields across derived "
        "events + distinct; replaces the double-written account-keyed "
        "table copies (data.js:2921-2924).",
    tags=("parser", "silver"),
)
def parse_affected_accounts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    pay = e.select(
        "event_id", "user_id",
        ((F.col("user_id") + F.col("event_id") % 7 + 1) % 15).alias("counterparty"),
    )
    touched = pay.select("event_id", F.col("user_id").alias("account")).unionByName(
        pay.select("event_id", F.col("counterparty").alias("account"))
    )
    return touched.distinct().orderBy("event_id", "account")


@register(
    "parse_accounts_created",
    oracle="""
    SELECT event_id, ts,
           user_id AS account,
           (user_id + event_id % 7 + 1) % 15 AS parent,
           value AS balance
    FROM events WHERE event_type = 'signup'
    ORDER BY event_id
    """,
    doc="accountsCreated (ledgerParser/accountsCreated.js:3-26): Created "
        "AccountRoot nodes -> {account, parent, balance} -- filter + "
        "projection over the parsed stream.",
    tags=("parser", "silver"),
)
def parse_accounts_created(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "signup")
    return (
        e.select(
            "event_id", "ts",
            F.col("user_id").alias("account"),
            ((F.col("user_id") + F.col("event_id") % 7 + 1) % 15).alias("parent"),
            F.col("value").alias("balance"),
        )
        .orderBy("event_id")
    )
