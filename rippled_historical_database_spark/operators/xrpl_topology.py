"""Network topology + validations over the reference's real crawl data.

Reference: ``network_crawls`` rows hold a snapshot's nodes[] and
connections[] ("src>dst" strings keyed by 12-char pubkey prefixes);
``topology.js:111-211`` serves node lists with in/out degree,
``:623-627`` the link graph; ledger validations group per ledger hash
(``topology.js:515-586``).  Spark shape (SURVEY 1.1): a nodes DataFrame
+ an edges DataFrame; degrees are one groupBy each.

Input: the crawl snapshot JSON (``test/mock/topology-crawl.json`` shape)
read as VARIANT, so added node fields never break the schema.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.xrpl import vstr

PREFIX_LEN = 12  # connections key on 12-char pubkey prefixes


def read_crawl(spark: SparkSession, path: str) -> tuple[DataFrame, DataFrame]:
    """One crawl document -> (nodes, links)."""
    raw = spark.read.text(path, wholetext=True)
    v = raw.select(F.parse_json(F.col("value")).alias("v"))
    snap = v.select(
        vstr("v", "$.start").alias("crawl_start"),
        vstr("v", "$.end").alias("crawl_end"),
        F.col("v"),
    )
    nodes = snap.select(
        "crawl_start",
        F.explode(F.try_variant_get("v", "$.nodes", "array<variant>")).alias("n"),
    ).select(
        "crawl_start",
        vstr("n", "$.pubkey_node").alias("pubkey"),
        vstr("n", "$.host").alias("host"),
        # crawls carry port as string OR number (both appear in the
        # reference's own fixture); Number(d.port) per topology.js:185
        vstr("n", "$.port").cast("int").alias("port"),
        vstr("n", "$.server_state").alias("server_state"),
        vstr("n", "$.version").alias("version"),
        vstr("n", "$.uptime").cast("long").alias("uptime"),
        vstr("n", "$.peers").cast("int").alias("peers"),
        vstr("n", "$.in").cast("int").alias("reported_in"),
        vstr("n", "$.out").cast("int").alias("reported_out"),
    )
    links = snap.select(
        "crawl_start",
        F.explode(
            F.try_variant_get("v", "$.connections", "array<string>")
        ).alias("c"),
    ).select(
        "crawl_start",
        F.split_part(F.col("c"), F.lit(">"), F.lit(1)).alias("source"),
        F.split_part(F.col("c"), F.lit(">"), F.lit(2)).alias("target"),
    )
    return nodes, links


def topology_node_summary(nodes: DataFrame, links: DataFrame) -> DataFrame:
    """Per-node view with crawl-derived in/out degree (the reference
    recomputes these when serving /topology/nodes): match links on the
    12-char pubkey prefix, two broadcast aggregations."""
    key = F.substring("pubkey", 1, PREFIX_LEN)
    outd = links.groupBy(F.col("source").alias("k")).agg(
        F.count("*").alias("out_degree")
    )
    ind = links.groupBy(F.col("target").alias("k")).agg(
        F.count("*").alias("in_degree")
    )
    return (
        nodes.withColumn("k", key)
        .join(F.broadcast(outd), "k", "left")
        .join(F.broadcast(ind), "k", "left")
        .select(
            "pubkey", "host", "server_state", "version", "uptime", "peers",
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
        )
        .orderBy("pubkey")
    )


# the geolocation detail column set a verbose topology response merges
# from node_state (hbase-thrift/topology.js:138-151 getNodeDetails)
TOPOLOGY_DETAIL_COLS = (
    "lat", "long", "country", "region", "city", "postal_code",
    "country_code", "region_code", "timezone", "isp",
)


def resolve_links(nodes: DataFrame, links: DataFrame) -> DataFrame:
    """formatLinks (hbase-thrift/topology.js:83-97): connections are
    '12-char-prefix>12-char-prefix' strings; the response resolves both
    ends to full pubkeys via the crawl's own node list.  The node map
    is crawl-sized -> broadcast."""
    nm = nodes.select(
        F.substring("pubkey", 1, PREFIX_LEN).alias("k"),
        F.col("pubkey"),
    )
    return (
        links.join(
            F.broadcast(nm.select(F.col("k").alias("source"),
                                  F.col("pubkey").alias("source_key"))),
            "source", "left",
        )
        .join(
            F.broadcast(nm.select(F.col("k").alias("target"),
                                  F.col("pubkey").alias("target_key"))),
            "target", "left",
        )
        .select(
            F.col("source_key").alias("source"),
            F.col("target_key").alias("target"),
        )
    )


def topology_nodes_serving(
    nodes: DataFrame,
    links: DataFrame,
    node_state: DataFrame | None = None,
    verbose: bool = False,
) -> tuple[DataFrame, DataFrame]:
    """GET /v2/network/topology (hbase-thrift/topology.js:178-215 +
    getTopology.js:44-53): the compact node projection is
    {node_public_key, ip, port (Number, NULL when the crawl omits it
    -- topology.js:185), version 'rippled-<v>', uptime, inbound_count,
    outbound_count} -- geolocation detail (city, country, ...) is
    ABSENT unless verbose, in which case each node merges its
    node_state detail row (options.details -> getDetails).  Returns
    (nodes, links); node_count/link_count are the two counts (the
    mocha pins: 3 and 3 on the crawl fixture)."""
    compact = nodes.select(
        F.col("pubkey").alias("node_public_key"),
        F.col("host").alias("ip"),
        F.col("port"),
        F.concat(F.lit("rippled-"), F.col("version")).alias("version"),
        F.col("uptime").cast("long").alias("uptime"),
        F.col("reported_in").alias("inbound_count"),
        F.col("reported_out").alias("outbound_count"),
    )
    if verbose and node_state is not None:
        detail = node_state.select(
            F.col("pubkey").alias("node_public_key"),
            *[F.col(c) for c in TOPOLOGY_DETAIL_COLS if c in node_state.columns],
        )
        compact = compact.join(F.broadcast(detail), "node_public_key", "left")
    return compact.orderBy("node_public_key"), resolve_links(nodes, links)


def topology_node_detail(node_state: DataFrame, pubkey: str) -> DataFrame:
    """GET /v2/network/topology/nodes/{pubkey}
    (hbase-thrift/topology.js:163-176): the node_state row with
    node_public_key renamed from the crawl's pubkey_node and numeric
    inbound/outbound counts; geolocation fields ride along as stored."""
    keep = [
        c for c in node_state.columns
        if c not in ("pubkey", "reported_in", "reported_out", "uptime")
    ]
    return node_state.filter(F.col("pubkey") == pubkey).select(
        F.col("pubkey").alias("node_public_key"),
        F.col("reported_in").cast("int").alias("inbound_count"),
        F.col("reported_out").cast("int").alias("outbound_count"),
        F.col("uptime").cast("long").alias("uptime"),
        *keep,
    )


def ledger_validations(spark: SparkSession, path: str) -> DataFrame:
    """GET /v2/ledgers/{hash}/validations (topology.js:515-586): group
    raw validation messages per ledger -> validator list + count."""
    raw = spark.read.text(path, wholetext=True)
    v = raw.select(F.parse_json(F.col("value")).alias("v"))
    vals = v.select(
        F.explode(F.try_variant_get("v", "$", "array<variant>")).alias("x")
    ).select(
        vstr("x", "$.ledger_hash").alias("ledger_hash"),
        vstr("x", "$.ledger_index").cast("long").alias("ledger_index"),
        vstr("x", "$.validation_public_key").alias("validator"),
        vstr("x", "$.full").cast("boolean").alias("full"),
    )
    return (
        vals.groupBy("ledger_hash", "ledger_index")
        .agg(
            F.count("*").alias("count"),
            F.count(F.when(F.col("full"), 1)).alias("full_count"),
            F.array_sort(F.collect_list("validator")).alias("validators"),
        )
        .orderBy("ledger_index", "ledger_hash")
    )


# ------------------------------------------------------ validator manifests

# The reference ingests a manifest stream into two tables
# (lib/validations/manifests.js): ``manifests_by_validator`` keyed
# (master_public_key | zero-padded sequence | ephemeral_public_key) with
# first/last sighting + count, merged by a read-modify-write loop
# (combineValidatorManifests, manifests.js:202-266), and
# ``manifests_by_master_key`` holding the ACTIVE manifest -- the highest
# sequence seen per master key (setActiveManifest, manifests.js:99-112;
# a higher sequence revokes the ephemeral keys before it).  In Spark
# both collapse to single aggregations over the observation stream: the
# merge loop is a groupBy (min/max/sum are associative, so partial
# merges from any partitioning combine exactly -- the property the
# reference's incremental loop hand-maintains), and the active manifest
# is one max_by.

from ..plans.registry import register
from ..sources.catalog import load_table


def _manifest_observations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synthetic manifest stream over the events table: each event is
    one manifest sighting; master key from the validator id, sequence
    cycling so masters see multiple manifests, ephemeral key derived
    (deterministically) from (master, sequence)."""
    e = load_table(spark, sf_dir, "events")
    master = F.concat(F.lit("nHU"), (F.col("user_id") % 20).cast("string"))
    seq = (F.col("event_id") % 4 + 1).cast("long")
    eph = F.concat(
        F.lit("n9K"),
        F.md5(F.concat(master, F.lit("|"), seq.cast("string")).cast("binary")),
    )
    return e.select(
        master.alias("master_public_key"),
        seq.alias("sequence"),
        eph.alias("ephemeral_public_key"),
        F.col("ts").alias("timestamp"),
    )


@register(
    "manifests_by_validator",
    oracle="""
    SELECT 'nHU' || CAST(user_id % 20 AS VARCHAR) AS master_public_key,
           event_id % 4 + 1 AS sequence,
           'n9K' || md5('nHU' || CAST(user_id % 20 AS VARCHAR) || '|'
                        || CAST(event_id % 4 + 1 AS VARCHAR))
             AS ephemeral_public_key,
           MIN(ts) AS first_datetime,
           MAX(ts) AS last_datetime,
           COUNT(*) AS count
    FROM events
    GROUP BY 1, 2, 3
    ORDER BY master_public_key, sequence
    """,
    doc="Manifest merge (manifests.js:202-266 combineValidatorManifests): "
        "per (master, sequence, ephemeral) keep first/last sighting and "
        "total count.  The reference's incremental read-modify-write loop "
        "is a single groupBy here -- min/max/sum partial-aggregate and "
        "merge associatively from any partitioning.",
    tags=("topology", "manifests"),
)
def manifests_by_validator(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = _manifest_observations(spark, sf_dir)
    return (
        obs.groupBy("master_public_key", "sequence", "ephemeral_public_key")
        .agg(
            F.min("timestamp").alias("first_datetime"),
            F.max("timestamp").alias("last_datetime"),
            F.count("*").alias("count"),
        )
        .orderBy("master_public_key", "sequence")
    )


@register(
    "manifests_active_key",
    oracle="""
    SELECT master_public_key,
           MAX(sequence) AS sequence,
           MAX_BY(ephemeral_public_key, sequence) AS ephemeral_public_key
    FROM (
        SELECT 'nHU' || CAST(user_id % 20 AS VARCHAR) AS master_public_key,
               event_id % 4 + 1 AS sequence,
               'n9K' || md5('nHU' || CAST(user_id % 20 AS VARCHAR) || '|'
                            || CAST(event_id % 4 + 1 AS VARCHAR))
                 AS ephemeral_public_key
        FROM events
    )
    GROUP BY master_public_key
    ORDER BY master_public_key
    """,
    doc="Active manifest per master key (manifests.js:99-112 "
        "setActiveManifest / 118-136 revocation): the highest sequence "
        "wins; one max_by aggregation replaces the mutable "
        "ephemeral->master map the reference maintains in memory.",
    tags=("topology", "manifests"),
)
def manifests_active_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    obs = _manifest_observations(spark, sf_dir)
    return (
        obs.groupBy("master_public_key")
        .agg(
            F.max("sequence").alias("sequence"),
            F.max_by("ephemeral_public_key", "sequence").alias(
                "ephemeral_public_key"
            ),
        )
        .orderBy("master_public_key")
    )
