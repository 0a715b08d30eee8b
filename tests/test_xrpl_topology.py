"""Topology + validations over the reference's real crawl/validation
fixtures, checked against imperative Python recomputation."""

from __future__ import annotations

import json
import os
from collections import Counter

import pytest

from rippled_historical_database_spark.operators.xrpl_topology import (
    ledger_validations,
    read_crawl,
    topology_node_summary,
)

MOCK = "/root/reference/test/mock"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(MOCK), reason="reference mocks not present"
)


def test_crawl_nodes_and_links(spark):
    nodes, links = read_crawl(spark, f"{MOCK}/topology-crawl.json")
    d = json.load(open(f"{MOCK}/topology-crawl.json"))
    assert nodes.count() == len(d["nodes"])
    assert links.count() == len(d["connections"])
    got = {r.pubkey: r for r in nodes.collect()}
    for n in d["nodes"]:
        g = got[n["pubkey_node"]]
        assert g.host == n.get("host")
        assert g.uptime == n.get("uptime")


def test_node_summary_degrees(spark):
    nodes, links = read_crawl(spark, f"{MOCK}/topology-crawl.json")
    summary = {r.pubkey: r for r in topology_node_summary(nodes, links).collect()}
    d = json.load(open(f"{MOCK}/topology-crawl.json"))
    outs = Counter(c.split(">")[0] for c in d["connections"])
    ins = Counter(c.split(">")[1] for c in d["connections"])
    for n in d["nodes"]:
        k = n["pubkey_node"][:12]
        g = summary[n["pubkey_node"]]
        assert g.out_degree == outs.get(k, 0), k
        assert g.in_degree == ins.get(k, 0), k


def test_ledger_validations_grouping(spark):
    lv = {r.ledger_hash: r for r in ledger_validations(spark, f"{MOCK}/validations.json").collect()}
    d = json.load(open(f"{MOCK}/validations.json"))
    by_hash = Counter(x["ledger_hash"] for x in d)
    full = Counter(x["ledger_hash"] for x in d if x["full"])
    assert set(lv) == set(by_hash)
    for h, n in by_hash.items():
        assert lv[h]["count"] == n
        assert lv[h].full_count == full.get(h, 0)
        assert len(lv[h].validators) == n


# ---------------- mocha pins: network - topology (test.network.js)

# The geolocation detail the reference seeds into node_state for the
# crawl's three nodes (test.network.js:38-76) -- the verbose topology
# response and the single-node route merge these columns.
GEO = [
    ("n9KcmEKTW3ggFgTjNMVkJwJ5R8RhQZeacYLTVgWFcnwheniS7zGA",
     37.3394, -121.895, "United States", "California", "San Jose",
     "95141", "US", "CA", "America/Los_Angeles",
     "SoftLayer Technologies Inc."),
    ("n9LKATbwprxwHPuQpJC2oJjkKZXHPaCjHUskDSBgvDTrTWQLnMwr",
     37.751, -97.822, "United States", None, None,
     None, "US", None, None, "SoftLayer Technologies Inc."),
    ("n9MR8WCUhNLtdVTw4Lc4KaKMLHb7pxfYriQVi6SZ9xUvC6Ni2w59",
     45.8696, -119.688, "United States", "Oregon", "Boardman",
     "97818", "US", "OR", "America/Los_Angeles", "Amazon.com"),
]
GEO_SCHEMA = (
    "pubkey string, lat double, long double, country string, "
    "region string, city string, postal_code string, "
    "country_code string, region_code string, timezone string, "
    "isp string"
)


def _node_state(spark, nodes):
    geo = spark.createDataFrame(GEO, GEO_SCHEMA)
    return nodes.join(geo, "pubkey", "left")


def test_mocha_pin_topology_counts_and_compact_fields(spark):
    """test.network.js:1324-1340: node_count 3, link_count 3, and the
    NON-verbose response has no geolocation fields (nodes[0].city
    undefined); node fields follow hbase-thrift/topology.js:182-189
    (node_public_key / ip / 'rippled-' version / counts)."""
    from rippled_historical_database_spark.operators.xrpl_topology import (
        topology_nodes_serving,
    )

    nodes, links = read_crawl(spark, f"{MOCK}/topology-crawl.json")
    out_nodes, out_links = topology_nodes_serving(nodes, links)
    rows = out_nodes.collect()
    assert len(rows) == 3           # node_count (:1335)
    assert out_links.count() == 3   # link_count (:1336)
    assert "city" not in out_nodes.columns   # :1337
    by_key = {r.node_public_key: r for r in rows}
    brag = by_key["n9LKATbwprxwHPuQpJC2oJjkKZXHPaCjHUskDSBgvDTrTWQLnMwr"]
    assert brag.ip == "169.44.60.105"
    assert brag.version == "rippled-1.0.1"
    assert brag.uptime == 582223
    assert (brag.inbound_count, brag.outbound_count) == (49, 29)
    # port (topology.js:185, parsed at :25): present as Number whether
    # the crawl stored it as string or number, NULL when absent --
    # the fixture deliberately covers all three shapes
    assert brag.port is None
    duty = by_key["n9MR8WCUhNLtdVTw4Lc4KaKMLHb7pxfYriQVi6SZ9xUvC6Ni2w59"]
    assert duty.port == 51235  # stored as the string "51235"
    sj = by_key["n9KcmEKTW3ggFgTjNMVkJwJ5R8RhQZeacYLTVgWFcnwheniS7zGA"]
    assert sj.port == 51235    # stored as the number 51235


def test_mocha_pin_topology_verbose_merges_geolocation(spark):
    """test.network.js:1342-1358: verbose=true keeps the same counts
    and every node carries its node_state geolocation (nodes[0]
    .country === 'United States')."""
    from rippled_historical_database_spark.operators.xrpl_topology import (
        topology_nodes_serving,
    )

    nodes, links = read_crawl(spark, f"{MOCK}/topology-crawl.json")
    out_nodes, out_links = topology_nodes_serving(
        nodes, links, _node_state(spark, nodes), verbose=True
    )
    rows = out_nodes.collect()
    assert len(rows) == 3 and out_links.count() == 3
    assert all(r.country == "United States" for r in rows)  # :1355
    cities = {r.node_public_key: r.city for r in rows}
    assert cities["n9KcmEKTW3ggFgTjNMVkJwJ5R8RhQZeacYLTVgWFcnwheniS7zGA"] == "San Jose"
    assert cities["n9MR8WCUhNLtdVTw4Lc4KaKMLHb7pxfYriQVi6SZ9xUvC6Ni2w59"] == "Boardman"


def test_mocha_pin_single_node_detail(spark):
    """test.network.js:1410-1425: GET /topology/nodes/{pubkey} returns
    the node_state row with node_public_key == pubkey and city
    'San Jose' (hbase-thrift/topology.js:163-176 renames + numeric
    counts)."""
    from rippled_historical_database_spark.operators.xrpl_topology import (
        topology_node_detail,
    )

    pubkey = "n9KcmEKTW3ggFgTjNMVkJwJ5R8RhQZeacYLTVgWFcnwheniS7zGA"
    nodes, _ = read_crawl(spark, f"{MOCK}/topology-crawl.json")
    rows = topology_node_detail(_node_state(spark, nodes), pubkey).collect()
    assert len(rows) == 1
    r = rows[0]
    assert r.node_public_key == pubkey
    assert r.city == "San Jose"
    assert r.country == "United States"
    assert isinstance(r.inbound_count, int) and isinstance(r.outbound_count, int)


def test_mocha_pin_links_resolve_full_pubkeys(spark):
    """hbase-thrift/topology.js:83-97 formatLinks: connections key on
    12-char prefixes and the response resolves both ends to FULL
    pubkeys via the crawl's node list; the fixture's three links
    resolve exactly."""
    from rippled_historical_database_spark.operators.xrpl_topology import (
        resolve_links,
    )

    nodes, links = read_crawl(spark, f"{MOCK}/topology-crawl.json")
    d = json.load(open(f"{MOCK}/topology-crawl.json"))
    full = {n["pubkey_node"][:12]: n["pubkey_node"] for n in d["nodes"]}
    expect = {
        (full[c.split(">")[0]], full[c.split(">")[1]])
        for c in d["connections"]
    }
    got = {(r.source, r.target) for r in resolve_links(nodes, links).collect()}
    assert got == expect and len(got) == 3
