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
