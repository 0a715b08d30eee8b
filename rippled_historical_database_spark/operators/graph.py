"""Network topology / graph queries.

Reference: ``network_crawls`` snapshot rows hold nodes[] + connections[]
and ``node_state`` holds per-node detail (``lib/hbase/topology.js:
111-211, 623-627``); the API serves node lists, per-node detail, and the
link graph.  Spark shape (SURVEY.md 1.1): a nodes DataFrame + an edges
DataFrame; degree/reciprocity/reachability are joins and aggregations
(GraphFrames would layer on the same two tables).

Synthetic mapping: the payment graph -- edges user -> counterparty from
purchase events (the same derivation as parse_balance_mirror).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.caching import scoped_persist, truncate_lineage
from ..functions.numeric import dsum, fround, sql_dsum, sql_fround
from ..plans.registry import register
from ..sources.catalog import load_table

SQL_EDGES = """
    SELECT user_id AS src,
           (user_id + event_id % 7 + 1) % 15 AS dst,
           value, ts
    FROM events WHERE event_type = 'purchase'
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return e.select(
        F.col("user_id").alias("src"),
        ((F.col("user_id") + F.col("event_id") % 7 + 1) % 15).alias("dst"),
        "value",
        "ts",
    )


def undirected_degrees(und: DataFrame) -> DataFrame:
    """node -> degree over a canonical (a < b, distinct) edge set."""
    return (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select(F.col("b").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )


def degree_oriented(und: DataFrame, deg: DataFrame) -> DataFrame:
    """Direct each undirected edge from its lower-(degree, id) endpoint.

    This is what makes the wedge join's m^1.5 bound REAL on skewed
    graphs (round-7 verdict item #2): under (degree, id) rank every
    node's out-neighborhood is at most sqrt(2m) -- all out-neighbors
    have degree >= its own, and at most 2m/d nodes have degree >= d --
    so a hub contributes ~0 wedges instead of O(d^2) on one join key.
    Plain id-orientation has no such bound: a hub whose id falls in
    the middle of its neighbors' ids lands d^2/4 wedge rows on a
    single key.  Orientation is invisible in the output (each
    triangle is still found exactly once, as its rank-ascending
    wedge), so the id-oriented DuckDB oracles stay byte-identical.

    ``und`` must be canonical (a < b by id, distinct); the id
    tie-break is then just ``da <= db``.  Costs two node-keyed hash
    joins against the node-sized degree relation -- the standard
    price of degree orientation, linear in edges.
    """
    e = und.join(
        deg.select(F.col("node").alias("a"), F.col("d").alias("da")), "a"
    ).join(deg.select(F.col("node").alias("b"), F.col("d").alias("db")), "b")
    low_first = F.col("da") <= F.col("db")
    return e.select(
        F.when(low_first, F.col("a")).otherwise(F.col("b")).alias("s"),
        F.when(low_first, F.col("b")).otherwise(F.col("a")).alias("t"),
    )


def oriented_triangles(und: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(degrees, triangles) via the degree-oriented wedge join.

    Each triangle {u, v, w} with rank(u) < rank(v) < rank(w) appears
    exactly once as (x, y, z) = (u, v, w): the wedge u->v, v->w closed
    by u->w.  Wedge volume is sum_v indeg(v) * outdeg(v) <= sqrt(2m)*m
    under degree orientation.
    """
    deg = undirected_degrees(und)
    d = degree_oriented(und, deg)
    e1, e2, e3 = d.alias("e1"), d.alias("e2"), d.alias("e3")
    tri = (
        e1.join(e2, F.col("e1.t") == F.col("e2.s"))
        .join(
            e3,
            (F.col("e3.s") == F.col("e1.s")) & (F.col("e3.t") == F.col("e2.t")),
        )
        .select(
            F.col("e1.s").alias("x"),
            F.col("e1.t").alias("y"),
            F.col("e2.t").alias("z"),
        )
    )
    return deg, tri


@register(
    "graph_node_degrees",
    oracle=f"""
    WITH edges AS ({SQL_EDGES}),
    outd AS (
        SELECT src AS node, COUNT(*) AS out_degree,
               COUNT(DISTINCT dst) AS out_neighbors,
               {sql_dsum("value")} AS out_value
        FROM edges GROUP BY 1
    ),
    ind AS (
        SELECT dst AS node, COUNT(*) AS in_degree,
               COUNT(DISTINCT src) AS in_neighbors,
               {sql_dsum("value")} AS in_value
        FROM edges GROUP BY 1
    )
    SELECT COALESCE(o.node, i.node) AS node,
           COALESCE(out_degree, 0) AS out_degree,
           COALESCE(out_neighbors, 0) AS out_neighbors,
           COALESCE(out_value, 0.0) AS out_value,
           COALESCE(in_degree, 0) AS in_degree,
           COALESCE(in_neighbors, 0) AS in_neighbors,
           COALESCE(in_value, 0.0) AS in_value
    FROM outd o FULL OUTER JOIN ind i ON o.node = i.node
    ORDER BY node
    """,
    doc="Topology node table (topology.js:99-161: crawl nodes joined to "
        "node_state, inbound/outbound counts): in/out degree, distinct "
        "neighbors, and value totals per node from the edges DataFrame -- "
        "two aggregations + full outer combine.",
    tags=("graph",),
)
def graph_node_degrees(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir)
    outd = edges.groupBy(F.col("src").alias("node")).agg(
        F.count("*").alias("out_degree"),
        F.countDistinct("dst").alias("out_neighbors"),
        dsum("value").alias("out_value"),
    )
    ind = edges.groupBy(F.col("dst").alias("node")).agg(
        F.count("*").alias("in_degree"),
        F.countDistinct("src").alias("in_neighbors"),
        dsum("value").alias("in_value"),
    )
    o, i = outd.alias("o"), ind.alias("i")
    return (
        o.join(i, F.col("o.node") == F.col("i.node"), "full_outer")
        .select(
            F.coalesce(F.col("o.node"), F.col("i.node")).alias("node"),
            F.coalesce("out_degree", F.lit(0)).alias("out_degree"),
            F.coalesce("out_neighbors", F.lit(0)).alias("out_neighbors"),
            F.coalesce("out_value", F.lit(0.0)).alias("out_value"),
            F.coalesce("in_degree", F.lit(0)).alias("in_degree"),
            F.coalesce("in_neighbors", F.lit(0)).alias("in_neighbors"),
            F.coalesce("in_value", F.lit(0.0)).alias("in_value"),
        )
        .orderBy("node")
    )


@register(
    "graph_reciprocal_links",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT src, dst FROM ({SQL_EDGES}))
    SELECT a.src AS node_a, a.dst AS node_b
    FROM edges a JOIN edges b ON a.src = b.dst AND a.dst = b.src
    WHERE a.src < a.dst
    ORDER BY node_a, node_b
    """,
    doc="Reciprocal link detection (the topology link graph's undirected "
        "view, topology.js:623-627): self-join of the distinct edge set "
        "on the reversed pair -- an equi-join on both endpoints.",
    tags=("graph",),
)
def graph_reciprocal_links(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir).select("src", "dst").distinct()
    a, b = edges.alias("a"), edges.alias("b")
    return (
        a.join(b, (F.col("a.src") == F.col("b.dst")) & (F.col("a.dst") == F.col("b.src")))
        .filter(F.col("a.src") < F.col("a.dst"))
        .select(F.col("a.src").alias("node_a"), F.col("a.dst").alias("node_b"))
        .orderBy("node_a", "node_b")
    )


@register(
    "graph_two_hop_reach",
    oracle=f"""
    WITH edges AS (SELECT DISTINCT src, dst FROM ({SQL_EDGES}))
    SELECT a.src AS node, COUNT(DISTINCT b.dst) AS two_hop_reach
    FROM edges a JOIN edges b ON a.dst = b.src AND b.dst <> a.src
    GROUP BY a.src
    ORDER BY node
    """,
    doc="Two-hop neighborhood size per node: one self-join hop (the "
        "relational core of crawl-graph traversal; iterate for k hops). "
        "At scale both sides partition on the join endpoint.",
    tags=("graph",),
)
def graph_two_hop_reach(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir).select("src", "dst").distinct()
    a, b = edges.alias("a"), edges.alias("b")
    return (
        a.join(b, (F.col("a.dst") == F.col("b.src")) & (F.col("b.dst") != F.col("a.src")))
        .groupBy(F.col("a.src").alias("node"))
        .agg(F.countDistinct(F.col("b.dst")).alias("two_hop_reach"))
        .orderBy("node")
    )


# --------------------------------------------------------- PageRank

PR_DAMPING = 0.85
PR_ITERS = 3



def _pr_step(i: int) -> str:
    """One PageRank update as oracle text: (1-d)/N + d * contributions."""
    return (
        f"CAST({1.0 - PR_DAMPING:.2f} AS DOUBLE) / nn.n"
        f" + CAST({PR_DAMPING} AS DOUBLE)"
        f" * COALESCE(CAST(c{i}.s AS DOUBLE), 0.0)"
    )

def _sql_pagerank_ctes() -> str:
    """Unrolled r0..r{PR_ITERS} CTE chain mirroring the Spark plan."""
    parts = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({SQL_EDGES}))",
        "outd AS (SELECT src, COUNT(*) AS out_deg FROM edges GROUP BY 1)",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "r0 AS (SELECT node, "
        + sql_fround("CAST(1.0 AS DOUBLE) / nn.n", 12) + " AS rank"
        " FROM nodes CROSS JOIN nn)",
    ]
    for i in range(1, PR_ITERS + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node,"
            f" SUM(CAST({sql_fround('r.rank / o.out_deg', 12)}"
            f" AS DECIMAL(38,12)))"
            f" AS s"
            f" FROM r{i-1} r JOIN edges e ON r.node = e.src"
            f" JOIN outd o ON e.src = o.src GROUP BY 1)"
        )
        parts.append(
            f"r{i} AS (SELECT nd.node,"
            f" {sql_fround(_pr_step(i), 12)}"
            f" AS rank"
            f" FROM nodes nd CROSS JOIN nn"
            f" LEFT JOIN c{i} ON nd.node = c{i}.node)"
        )
    return "WITH " + ",\n    ".join(parts)


@register(
    "graph_pagerank",
    oracle=f"""
    {_sql_pagerank_ctes()}
    SELECT node,
           {sql_fround('rank', 9)} AS pagerank,
           CAST(ROW_NUMBER() OVER (ORDER BY {sql_fround('rank', 9)}
                                   DESC, node)
                AS BIGINT) AS rank_pos
    FROM r{PR_ITERS}
    ORDER BY node
    """,
    doc=f"Fixed-iteration PageRank (damping {PR_DAMPING}, {PR_ITERS} "
        "unrolled iterations) over the payment graph -- the canonical "
        "iterative-fixpoint workload (Page et al. 1999; the "
        "Pregel/GraphX reference algorithm) expressed as pure DataFrame "
        "joins: per iteration, ranks join edges on src, contributions "
        "fround(rank/out_deg, 12) are decimal-summed per dst "
        "(partition-order independent), and every node re-enters at "
        "(1-d)/N + d*sum.  Dangling-node mass is not redistributed "
        "(documented simplification, identical on both engines).  At "
        "100 TB: edges hash-partition on src once and every iteration "
        "reuses that partitioning for the rank join; ranks are "
        "node-count sized, not edge-count; with checkpointing each "
        "round is one shuffle -- the same layout GraphX/Pregel uses.  "
        "Selection and ranking happen on the 9-dp rounded value on "
        "both engines so the rank_pos tie-break is float-noise immune; "
        "rank_pos itself comes from the two-pass range-partitioned "
        "numbering (functions/ordering.py), never a one-task global "
        "sort over the node set.",
    tags=("graph", "iterative"),
)
def graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14: persist the iteration-invariant base relations -- the
    # unrolled rank lineage walks them once per evaluation pass (the
    # two-pass global numbering below evaluates it twice), and each
    # uncached walk re-ran the scan + distinct + union chain.
    edges = scoped_persist(
        _edges(spark, sf_dir).select("src", "dst").distinct()
    )
    outd = scoped_persist(
        edges.groupBy("src").agg(F.count("*").alias("out_deg"))
    )
    nodes = scoped_persist(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    nn = nodes.agg(F.count("*").alias("n"))

    ranks = nodes.crossJoin(F.broadcast(nn)).select(
        "node", fround(F.lit(1.0) / F.col("n"), 12).alias("rank")
    )
    for _ in range(PR_ITERS):
        contribs = (
            ranks.join(edges, ranks["node"] == edges["src"])
            .join(outd, "src")
            .select(
                F.col("dst").alias("node"),
                fround(F.col("rank") / F.col("out_deg"), 12)
                .cast("decimal(38,12)")
                .alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.crossJoin(F.broadcast(nn))
            .join(contribs, "node", "left")
            .select(
                "node",
                fround(
                    F.lit(1.0 - PR_DAMPING) / F.col("n")
                    + F.lit(PR_DAMPING)
                    * F.coalesce(F.col("s").cast("double"), F.lit(0.0)),
                    12,
                ).alias("rank"),
            )
        )
    # rank_pos over ALL nodes is node-count sized -- a plain
    # Window.orderBy would sort every node in one task.  The two-pass
    # range-partitioned numbering (functions/ordering.py) computes the
    # identical total-order position fully in parallel; (pagerank DESC,
    # node) is total because node is unique.
    from ..functions.ordering import global_row_number

    # r14: persist the final scores -- the two-pass numbering evaluates
    # its input several times (boundary sample, offsets, final join),
    # and each uncached walk re-ran the whole unrolled iteration chain.
    scored = scoped_persist(ranks.select(
        "node", fround(F.col("rank"), 9).alias("pagerank")
    ))
    return (
        global_row_number(
            scored, [("pagerank", "desc"), "node"], "rank_pos"
        )
        .select("node", "pagerank", "rank_pos")
        .orderBy("node")
    )


# --------------------------------------------- HITS (hubs/authorities)

HITS_ITERS = 3



def _hits_norm(raw: str, mx: str, i: int) -> str:
    """One HITS max-normalized half-step as oracle text."""
    return (
        f"COALESCE(CAST({raw}{i}.s AS DOUBLE), 0.0)"
        f" / CAST({mx}{i}.m AS DOUBLE)"
    )

def _sql_hits_ctes() -> str:
    """Unrolled h0..h{HITS_ITERS}/a{HITS_ITERS} CTE chain mirroring the
    Spark loop: auth = decimal-summed in-edge hubs, hub = decimal-summed
    out-edge auths, each max-normalized then rounded at 12 dp."""
    parts = [
        f"edges AS (SELECT DISTINCT src, dst FROM ({SQL_EDGES}))",
        "nodes AS (SELECT src AS node FROM edges"
        " UNION SELECT dst FROM edges)",
        "h0 AS (SELECT node, CAST(1.0 AS DOUBLE) AS hub FROM nodes)",
    ]
    for i in range(1, HITS_ITERS + 1):
        parts.append(
            f"ar{i} AS (SELECT e.dst AS node,"
            f" SUM(CAST({sql_fround('h.hub', 12)} AS DECIMAL(38,12))) AS s"
            f" FROM h{i-1} h JOIN edges e ON h.node = e.src GROUP BY 1)"
        )
        parts.append(
            f"am{i} AS (SELECT MAX(s) AS m FROM ar{i})"
        )
        parts.append(
            f"a{i} AS (SELECT nd.node,"
            f" {sql_fround(_hits_norm('ar', 'am', i), 12)} AS auth"
            f" FROM nodes nd CROSS JOIN am{i}"
            f" LEFT JOIN ar{i} ON nd.node = ar{i}.node)"
        )
        parts.append(
            f"hr{i} AS (SELECT e.src AS node,"
            f" SUM(CAST({sql_fround('a.auth', 12)} AS DECIMAL(38,12))) AS s"
            f" FROM a{i} a JOIN edges e ON a.node = e.dst GROUP BY 1)"
        )
        parts.append(
            f"hm{i} AS (SELECT MAX(s) AS m FROM hr{i})"
        )
        parts.append(
            f"h{i} AS (SELECT nd.node,"
            f" {sql_fround(_hits_norm('hr', 'hm', i), 12)} AS hub"
            f" FROM nodes nd CROSS JOIN hm{i}"
            f" LEFT JOIN hr{i} ON nd.node = hr{i}.node)"
        )
    return "WITH " + ",\n    ".join(parts)


@register(
    "graph_hits",
    rotation_group=11,
    oracle=f"""
    {_sql_hits_ctes()}
    SELECT h.node,
           {sql_fround('a.auth', 9)} AS authority,
           {sql_fround('h.hub', 9)} AS hub
    FROM h{HITS_ITERS} h JOIN a{HITS_ITERS} a ON h.node = a.node
    ORDER BY h.node
    """,
    doc=f"HITS hubs and authorities (Kleinberg 1999), {HITS_ITERS} "
        "unrolled iterations over the payment graph -- the mutual "
        "recursion pagerank's single score cannot express: authority = "
        "sum of in-edge hub scores, hub = sum of out-edge authority "
        "scores, each max-normalized per half-step.  Determinism "
        "discipline is pagerank's: contributions rounded at 12 dp and "
        "DECIMAL-summed (partition-order independent), the max is a "
        "selection, the normalizing divide is one IEEE op on identical "
        "operands in both engines, re-rounded at 12 dp.  At 100 TB: "
        "edges hash-partition once and both half-step joins reuse that "
        "partitioning; score relations are node-count sized; the "
        "normalizer is a broadcast scalar -- per iteration two keyed "
        "shuffles, never a global sort.",
    tags=("graph", "iterative"),
)
def graph_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    # r14 optimization (guide section 5 "caching"): edges and nodes are
    # read by EVERY one of the 2*HITS_ITERS eager normalizer jobs (each
    # a_max/h_max materialization walked the uncached scan -> distinct
    # -> union lineage again -- measured 77.8 s noop at sf0.1, the
    # census's worst query).  Persist both once; they are edge-/node-
    # count sized, the same budget the per-iteration half-step persists
    # already spend.
    edges = scoped_persist(
        _edges(spark, sf_dir).select("src", "dst").distinct()
    )
    nodes = scoped_persist(
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    hubs = nodes.select("node", F.lit(1.0).alias("hub"))
    auths = None
    for _ in range(HITS_ITERS):
        # each half-step relation feeds BOTH its max-normalizer and the
        # re-join; persist so the contribution aggregation runs once
        # per iteration instead of twice
        a_raw = (
            hubs.join(edges, hubs["node"] == edges["src"])
            .select(
                F.col("dst").alias("node"),
                fround("hub", 12).cast("decimal(38,12)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
            # truncate_lineage (not persist): also TRUNCATES the
            # logical plan, which otherwise grows ~4x per half-step and
            # makes each of the 2*HITS_ITERS eager normalizer jobs
            # re-plan the whole unrolled tree (r14; same lineage
            # discipline as connected_components_labels).  r15: uses a
            # RELIABLE checkpoint when SPARK_GRAFT_CHECKPOINT_DIR is
            # configured -- see functions/caching.truncate_lineage.
            .transform(truncate_lineage)
        )
        a_max = a_raw.agg(F.max("s").alias("m"))
        auths = (
            nodes.crossJoin(F.broadcast(a_max))
            .join(a_raw, "node", "left")
            .select(
                "node",
                fround(
                    F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                    / F.col("m").cast("double"),
                    12,
                ).alias("auth"),
            )
        )
        h_raw = (
            auths.join(edges, auths["node"] == edges["dst"])
            .select(
                F.col("src").alias("node"),
                fround("auth", 12).cast("decimal(38,12)").alias("c"),
            )
            .groupBy("node")
            .agg(F.sum("c").alias("s"))
            .transform(truncate_lineage)
        )
        h_max = h_raw.agg(F.max("s").alias("m"))
        hubs = (
            nodes.crossJoin(F.broadcast(h_max))
            .join(h_raw, "node", "left")
            .select(
                "node",
                fround(
                    F.coalesce(F.col("s").cast("double"), F.lit(0.0))
                    / F.col("m").cast("double"),
                    12,
                ).alias("hub"),
            )
        )
    return (
        hubs.join(auths, "node")
        .select(
            "node",
            fround("auth", 9).alias("authority"),
            fround("hub", 9).alias("hub"),
        )
        .orderBy("node")
    )


# --------------------------------------------- link prediction

# Jaccard link prediction over the undirected payment graph: for every
# non-adjacent pair sharing at least one neighbor, score
# |N(a) n N(b)| / |N(a) u N(b)| -- the classic common-neighbors
# recommender (Liben-Nowell & Kleinberg, 2003).
#
# HUB CAP -- the scale-defining choice: wedges are keyed on the shared
# neighbor, so a neighbor of degree d contributes d^2/2 candidate
# pairs; one hub node makes the OUTPUT itself quadratic (measured
# here: the uncapped form emitted 91.9M pairs at 10x through the 15
# synthetic hub nodes).  Production systems drop super-node
# neighbors for exactly this reason -- a neighbor everyone shares
# carries no signal -- so the neighbor sets are restricted to the
# degree-<=HUB_CAP subgraph for BOTH the intersection and the union,
# bounding per-neighbor work at HUB_CAP^2 and total work at
# O(nodes x HUB_CAP^2): linear.  Predictions against existing edges
# are still excluded using the FULL adjacency.
LP_HUB_CAP = 64


@register(
    "graph_jaccard_link_prediction",
    rotation_group=6,
    oracle=f"""
    WITH edges AS (SELECT DISTINCT src, dst FROM ({SQL_EDGES})),
    und AS (
        SELECT src AS u, dst AS v FROM edges WHERE src <> dst
        UNION
        SELECT dst AS u, src AS v FROM edges WHERE src <> dst
    ),
    deg AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY u),
    und_f AS (
        SELECT n.u, n.v FROM und n JOIN deg dv ON n.v = dv.u
        WHERE dv.d <= {{LP_HUB_CAP}}
    ),
    deg_f AS (SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM und_f GROUP BY u),
    wedges AS (
        SELECT a.u AS na, b.u AS nb, CAST(COUNT(*) AS BIGINT) AS cn
        FROM und_f a JOIN und_f b ON a.v = b.v AND a.u < b.u
        GROUP BY 1, 2
    ),
    adjacent AS (SELECT u AS na, v AS nb FROM und WHERE u < v),
    cand AS (
        SELECT w.na, w.nb, w.cn
        FROM wedges w
        LEFT JOIN adjacent adj ON w.na = adj.na AND w.nb = adj.nb
        WHERE adj.na IS NULL
    )
    SELECT c.na AS node_a, c.nb AS node_b,
           c.cn AS common_neighbors,
           (FLOOR((CAST(c.cn AS DOUBLE) / (da.d + db.d - c.cn))
                  * 1000000e0 + 0.5) / 1000000e0) AS jaccard
    FROM cand c
    JOIN deg_f da ON c.na = da.u
    JOIN deg_f db ON c.nb = db.u
    ORDER BY node_a, node_b
    """.format(LP_HUB_CAP=LP_HUB_CAP),
    doc=f"Jaccard link prediction (Liben-Nowell & Kleinberg, 2003) on "
        f"the hub-capped subgraph: neighbors of degree > {LP_HUB_CAP} "
        "are excluded from both the intersection and the union -- a "
        "neighbor everyone shares carries no signal, and keyed on it "
        "the wedge join's output is itself quadratic (measured: the "
        "uncapped form emitted 91.9M pairs at 10x through 15 hub "
        "nodes; capped, candidates are bounded by nodes x cap^2 -- "
        "linear).  Same oriented wedge shape as graph_triangle_count; "
        "|A u B| folds from two capped-degree lookups (dA + dB - cn), "
        "no second neighborhood pass; existing edges drop via an "
        "anti-join against the FULL adjacency so a capped edge can "
        "never be 'predicted'.",
    tags=("graph",),
)
def graph_jaccard_link_prediction(spark: SparkSession, sf_dir: str) -> DataFrame:
    ed = _edges(spark, sf_dir).select("src", "dst").distinct().filter(
        F.col("src") != F.col("dst")
    )
    und = (
        ed.select(F.col("src").alias("u"), F.col("dst").alias("v"))
        .unionByName(ed.select(F.col("dst").alias("u"), F.col("src").alias("v")))
        .distinct()
    )
    deg = und.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
    dv = deg.select(F.col("u").alias("v"), "d")
    und_f = und.join(dv, "v").filter(F.col("d") <= LP_HUB_CAP).select("u", "v")
    deg_f = und_f.groupBy("u").agg(F.count("*").cast("bigint").alias("d"))
    a = und_f.select(F.col("u").alias("na"), F.col("v").alias("w"))
    b = und_f.select(F.col("u").alias("nb"), F.col("v").alias("w"))
    wedges = (
        a.join(b, "w")
        .filter(F.col("na") < F.col("nb"))
        .groupBy("na", "nb")
        .agg(F.count("*").cast("bigint").alias("cn"))
    )
    adjacent = und.filter(F.col("u") < F.col("v")).select(
        F.col("u").alias("na"), F.col("v").alias("nb")
    )
    cand = wedges.join(adjacent, ["na", "nb"], "left_anti")
    # degrees are a NODE-sized relation -- no broadcast hint (billions
    # of nodes at 100 TB); stats/AQE may still broadcast at small SF.
    da = deg_f.select(F.col("u").alias("na"), F.col("d").alias("da"))
    db = deg_f.select(F.col("u").alias("nb"), F.col("d").alias("db"))
    return (
        cand.join(da, "na")
        .join(db, "nb")
        .select(
            F.col("na").alias("node_a"),
            F.col("nb").alias("node_b"),
            F.col("cn").alias("common_neighbors"),
            fround(
                F.col("cn").cast("double")
                / (F.col("da") + F.col("db") - F.col("cn")),
                6,
            ).alias("jaccard"),
        )
        .orderBy("node_a", "node_b")
    )


# ------------------------------------------------- degree assortativity

@register(
    "graph_degree_assortativity",
    rotation_group=7,
    oracle=f"""
    WITH und AS (
        SELECT DISTINCT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({SQL_EDGES}) WHERE src <> dst
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
        ) GROUP BY 1
    ),
    pairs AS (
        SELECT da.d AS x, db.d AS y
        FROM und e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node
        UNION ALL
        SELECT db.d, da.d
        FROM und e JOIN deg da ON e.a = da.node JOIN deg db ON e.b = db.node
    )
    SELECT CAST((SELECT COUNT(*) FROM und) AS BIGINT) AS n_edges,
           CAST((SELECT COUNT(*) FROM deg) AS BIGINT) AS n_nodes,
           (FLOOR((
             (COUNT(*) * SUM(x * y) - SUM(x) * SUM(y)) /
             (SQRT(CAST(COUNT(*) * SUM(x * x) - SUM(x) * SUM(x) AS DOUBLE))
              * SQRT(CAST(COUNT(*) * SUM(y * y) - SUM(y) * SUM(y) AS DOUBLE)))
             ) * 1000000e0 + 0.5) / 1000000e0) AS assortativity
    FROM pairs
    """,
    doc="Degree assortativity of the payment graph: Pearson correlation "
        "of endpoint degrees over the undirected distinct edge set, "
        "each edge contributing both orientations (Newman 2002).  Every "
        "moment (sum x, xy, x^2) is an exact BIGINT over integer "
        "degrees -- no float accumulation order anywhere; only the "
        "final closed-form division is floating point, so the two "
        "engines agree bit-exactly.  Cost: one distinct-edge shuffle, "
        "one degree aggregation, two broadcast-sized joins back to the "
        "edge list (degrees relation is node-count rows), one global "
        "reduce to a single row.  The synthetic graph's 15-value dst "
        "domain makes it strongly disassortative (hubs attach to "
        "leaves) -- the skew shape §3 of SCALE.md warns about, "
        "measured in one number.",
    tags=("graph",),
)
def graph_degree_assortativity(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _edges(spark, sf_dir).filter(F.col("src") != F.col("dst"))
    und = edges.select(
        F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
    ).distinct()
    deg = (
        und.select(F.col("a").alias("node"))
        .unionAll(und.select("b"))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("d"))
    )
    da = deg.select(F.col("node").alias("a"), F.col("d").alias("xa"))
    db = deg.select(F.col("node").alias("b"), F.col("d").alias("xb"))
    joined = und.join(F.broadcast(da), "a").join(F.broadcast(db), "b")
    pairs = joined.select(F.col("xa").alias("x"), F.col("xb").alias("y")).unionAll(
        joined.select(F.col("xb").alias("x"), F.col("xa").alias("y"))
    )
    m = F.count("*")
    num = (m * F.sum(F.col("x") * F.col("y")) - F.sum("x") * F.sum("y")).cast(
        "double"
    )
    denx = F.sqrt((m * F.sum(F.col("x") * F.col("x")) - F.sum("x") * F.sum("x")).cast("double"))
    deny = F.sqrt((m * F.sum(F.col("y") * F.col("y")) - F.sum("y") * F.sum("y")).cast("double"))
    n_edges = und.count()
    n_nodes = deg.count()
    return pairs.agg(
        F.lit(n_edges).cast("bigint").alias("n_edges"),
        F.lit(n_nodes).cast("bigint").alias("n_nodes"),
        fround(num / (denx * deny), 6).alias("assortativity"),
    )


# --------------------------------------------- clustering coefficient

@register(
    "graph_clustering_coefficient",
    rotation_group=7,
    oracle=f"""
    WITH und AS MATERIALIZED (
        SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b
        FROM ({SQL_EDGES}) WHERE src <> dst
        GROUP BY 1, 2
    ),
    deg AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS d FROM (
            SELECT a AS node FROM und UNION ALL SELECT b FROM und
        ) GROUP BY 1
    ),
    wedges AS MATERIALIZED (
        SELECT e1.a AS x, e1.b AS y, e2.b AS z
        FROM und e1 JOIN und e2 ON e1.b = e2.a
    ),
    tri AS (
        SELECT w.x, w.y, w.z
        FROM wedges w JOIN und e3 ON e3.a = w.x AND e3.b = w.z
    ),
    per_node AS (
        SELECT node, CAST(COUNT(*) AS BIGINT) AS triangles FROM (
            SELECT x AS node FROM tri
            UNION ALL SELECT y FROM tri
            UNION ALL SELECT z FROM tri
        ) GROUP BY 1
    )
    SELECT deg.node, deg.d AS degree,
           COALESCE(p.triangles, 0) AS triangles,
           (FLOOR((CAST(COALESCE(p.triangles, 0) AS DOUBLE)
                 / (deg.d * (deg.d - 1) / 2e0)) * 1000000e0 + 0.5)
            / 1000000e0) AS clustering_coeff
    FROM deg LEFT JOIN per_node p ON deg.node = p.node
    WHERE deg.d >= 2
    ORDER BY deg.node
    """,
    doc="Per-node local clustering coefficient: triangles through the "
        "node over C(degree, 2) possible wedge closures (Watts-"
        "Strogatz) -- the normalized form of graph_triangle_count, the "
        "community-density reading per node.  Degree-oriented wedge "
        "join (each triangle found once; (degree, id) rank gives the "
        "genuine m^1.5 wedge bound -- see degree_oriented), one LEFT "
        "join back to the node-sized degree relation so zero-triangle "
        "nodes report 0.0 instead of vanishing; degree-1 nodes "
        "(coefficient undefined) are excluded in both engines.  The "
        "oracle keeps id orientation: output is orientation-invariant. "
        "All counts exact BIGINTs; one closed-form division at the "
        "end.",
    tags=("graph",),
)
def graph_clustering_coefficient(spark: SparkSession, sf_dir: str) -> DataFrame:
    und = (
        _edges(spark, sf_dir)
        .filter(F.col("src") != F.col("dst"))
        .select(
            F.least("src", "dst").alias("a"),
            F.greatest("src", "dst").alias("b"),
        )
        .distinct()
    )
    deg, tri = oriented_triangles(und)
    per_node = (
        tri.select(F.col("x").alias("node"))
        .unionAll(tri.select(F.col("y").alias("node")))
        .unionAll(tri.select(F.col("z").alias("node")))
        .groupBy("node")
        .agg(F.count("*").cast("bigint").alias("triangles"))
    )
    return (
        deg.join(per_node, "node", "left")
        .filter(F.col("d") >= 2)
        .select(
            "node",
            F.col("d").alias("degree"),
            F.coalesce("triangles", F.lit(0)).cast("bigint").alias("triangles"),
            fround(
                F.coalesce("triangles", F.lit(0)).cast("double")
                / (F.col("d") * (F.col("d") - 1) / F.lit(2.0)),
                6,
            ).alias("clustering_coeff"),
        )
        .orderBy("node")
    )
