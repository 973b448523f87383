"""Solr graph streaming expressions, Spark-first.

Reference surfaces (behavioral parity targets, not ports):

- ``GatherNodesStream`` (reference solr/solrj/src/java/org/apache/solr/
  client/solrj/io/graph/GatherNodesStream.java:60) — the ``nodes()``
  expression: from a root node set, walk ``from -> to`` edge relations one
  level at a time, emitting the gathered node ids per level with duplicates
  collapsed. Spark shape: each hop is one equi-join against the edge
  relation + ``distinct``. Join strategy is left to AQE: it broadcasts the
  frontier while it measures small and falls back to a shuffle join when a
  hop fans out — a forced broadcast would cap the walk at the driver's
  broadcast limit.
- ``ShortestPathStream`` (reference solr/solrj/src/java/org/apache/solr/
  client/solrj/io/graph/ShortestPathStream.java:54) — breadth-first search
  bounded by ``maxDepth``, iterative "join frontier to edges" per level,
  exactly the reference's own algorithm (it issues one distributed query
  per BFS level). Spark shape: the edge DataFrame is built once and cached
  for the loop (released on exit); each level is ``frontier ⋈ edges`` →
  ``distinct`` → anti-join against the visited set, so a node is emitted at
  its minimal distance and never re-expanded. Each level is checkpointed to
  truncate the iterated-join lineage; the per-level join picks broadcast vs
  shuffle via AQE since BFS frontiers can grow to a large fraction of the
  graph on dense inputs.

Both ops run on the TPC-H-ish test tables: the bipartite part↔supplier
graph induced by ``lineitem`` (edge = "supplier shipped this part") and the
customer→order→part purchase walk.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from .relational import _t


def gather_nodes(
    roots: DataFrame,
    hops: list[tuple[DataFrame, str, str, str]],
) -> DataFrame:
    """``nodes()`` / GatherNodesStream: multi-level gather.

    ``roots``: one-column DataFrame of level-0 node ids. ``hops``: per level
    ``(edges, from_col, to_col, level_name)``, non-empty. Returns
    ``(level: string, node: bigint)`` — the distinct nodes discovered at each
    level (the reference's ``gather`` output, one tuple per node per level).

    Each hop joins the frontier to the edge relation on ``from_col``; AQE
    picks broadcast while the frontier measures small and a shuffle join
    once a hop fans out past the broadcast threshold.
    """
    if not hops:
        raise ValueError("gather_nodes: hops must be non-empty")
    frontier = roots.toDF("node")
    levels: list[DataFrame] = []
    for edges, src, dst, name in hops:
        frontier = (
            edges.join(frontier, edges[src] == frontier["node"])
            .select(edges[dst].alias("node"))
            .distinct()
        )
        levels.append(frontier.select(F.lit(name).alias("level"), "node"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionAll(lv)
    return out


def shortest_path(
    edges: DataFrame,
    source,
    max_depth: int,
) -> DataFrame:
    """ShortestPathStream: BFS distances from ``source`` over ``edges``.

    ``edges`` is directed ``(src, dst)``; callers union both directions for
    an undirected walk. Returns ``(node, dist)`` for every node reachable
    within ``max_depth`` (the source itself at dist 0), each at its minimal
    distance — the reference's per-level frontier semantics with visited-set
    pruning (ShortestPathStream.java:54 keeps exactly this per-level
    ``visited`` map so no node is re-expanded).

    The edge DataFrame is cached for the loop and released on exit. Each
    level is one join (AQE: broadcast while the frontier is small, shuffle
    once it grows) + distinct + anti-join, then ``localCheckpoint`` — the
    checkpoint truncates the iterated-join lineage AND lets the edge cache
    be dropped without the returned DataFrame recomputing the walk.
    ``max_depth`` bounds the job count; the loop exits early when the
    frontier drains.
    """
    edges = edges.toDF("src", "dst").cache()
    spark = edges.sparkSession
    frontier = spark.createDataFrame([(source, 0)], "node string, dist int")
    visited = frontier
    out = [frontier]
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(F.col("dst").alias("node"), F.lit(depth).alias("dist"))
            .distinct()
            .join(visited.select("node"), "node", "left_anti")
            .localCheckpoint(eager=True)
        )
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt)
        frontier = nxt
        out.append(nxt)
    edges.unpersist()
    res = out[0]
    for lv in out[1:]:
        res = res.unionAll(lv)
    return res


# --- driver-gated ops over the TPC-H-ish tables ---------------------------


def graph_nodes_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """nodes(): customers in BUILDING → their orders → the parts on them."""
    roots = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    return gather_nodes(
        roots,
        [
            (orders, "o_custkey", "o_orderkey", "order"),
            (lineitem, "l_orderkey", "l_partkey", "part"),
        ],
    ).select("level", F.col("node").cast("long").alias("node"))


GRAPH_NODES_SQL = """
WITH roots AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
hop1 AS (SELECT DISTINCT o.o_orderkey
         FROM orders o JOIN roots r ON o.o_custkey = r.c_custkey),
hop2 AS (SELECT DISTINCT l.l_partkey
         FROM lineitem l JOIN hop1 h ON l.l_orderkey = h.o_orderkey)
SELECT 'order' AS level, CAST(o_orderkey AS BIGINT) AS node FROM hop1
UNION ALL
SELECT 'part', CAST(l_partkey AS BIGINT) FROM hop2
"""


def shortest_path_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """shortestPath() over the part↔supplier bipartite graph (undirected),
    BFS from supplier 1, maxDepth 4. Node ids are namespaced strings
    ('S:<suppkey>' / 'P:<partkey>') exactly as Solr walks mixed from/to
    fields."""
    li = _t(spark, sf_dir, "lineitem")
    e = li.select(
        F.concat(F.lit("S:"), F.col("l_suppkey").cast("string")).alias("src"),
        F.concat(F.lit("P:"), F.col("l_partkey").cast("string")).alias("dst"),
    ).distinct()
    und = e.unionAll(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    return shortest_path(und, "S:1", max_depth=4).select(
        "node", F.col("dist").cast("long").alias("dist")
    )


SHORTEST_PATH_SQL = """
WITH RECURSIVE edges AS (
  SELECT DISTINCT 'S:' || CAST(l_suppkey AS VARCHAR) AS src,
                  'P:' || CAST(l_partkey AS VARCHAR) AS dst FROM lineitem
),
und AS (SELECT src, dst FROM edges UNION ALL SELECT dst, src FROM edges),
bfs(node, dist) AS (
  SELECT 'S:1', 0
  UNION
  SELECT u.dst, b.dist + 1 FROM bfs b JOIN und u ON u.src = b.node
  WHERE b.dist < 4
)
SELECT node, CAST(min(dist) AS BIGINT) AS dist FROM bfs GROUP BY node
"""


def score_nodes(gathered: DataFrame, corpus_freq: DataFrame, num_docs: int) -> DataFrame:
    """``scoreNodes()`` / ScoreNodesStream (reference solr/solrj/src/java/
    org/apache/solr/client/solrj/io/stream/ScoreNodesStream.java:243):
    score each gathered node tf-idf style —
    ``(ln(termFreq) + 1) * (ln((numDocs + 1) / (docFreq + 1)) + 1)``,
    where termFreq is the node's gather count (``count(*)`` from nodes()),
    docFreq its frequency in the whole edge collection, numDocs the edge
    collection size. Surfaces significant traversal targets the way the
    reference recommends related-content nodes.

    ``gathered``: (node, term_freq). ``corpus_freq``: (node, doc_freq) —
    broadcast-joined when small; both sides stay DataFrames so a 100-TB
    edge collection's docFreq side is just another distributed agg.
    """
    return gathered.join(corpus_freq, "node", "left").select(
        "node",
        "term_freq",
        F.coalesce("doc_freq", F.lit(0)).alias("doc_freq"),
        (
            (F.log(F.col("term_freq").cast("double")) + F.lit(1.0))
            * (
                F.log(
                    F.lit(float(num_docs + 1))
                    / (F.coalesce("doc_freq", F.lit(0)).cast("double") + F.lit(1.0))
                )
                + F.lit(1.0)
            )
        ).alias("node_score"),
    )


def score_nodes_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scoreNodes(nodes(...)): parts reached from BUILDING customers' orders,
    scored by gather-count tf vs corpus docFreq over lineitem edges."""
    roots = (
        _t(spark, sf_dir, "customer")
        .filter(F.col("c_mktsegment") == "BUILDING")
        .select("c_custkey")
    )
    orders = _t(spark, sf_dir, "orders").select("o_custkey", "o_orderkey")
    lineitem = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_partkey")
    hop1 = (
        orders.join(roots, orders["o_custkey"] == roots["c_custkey"])
        .select(F.col("o_orderkey").alias("okey"))
        .distinct()
    )
    # termFreq = times the part was gathered (NOT collapsed — the count(*)
    # the reference's gatherNodes carries into scoreNodes)
    gathered = (
        lineitem.join(hop1, lineitem["l_orderkey"] == hop1["okey"])
        .groupBy(F.col("l_partkey").alias("node"))
        .agg(F.count("*").alias("term_freq"))
    )
    corpus = lineitem.groupBy(F.col("l_partkey").alias("node")).agg(
        F.count("*").alias("doc_freq")
    )
    num_docs = lineitem.count()
    return score_nodes(gathered, corpus, num_docs).select(
        F.col("node").cast("long").alias("node"),
        F.col("term_freq").cast("long").alias("term_freq"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        F.round("node_score", 4).alias("node_score"),
    )


SCORE_NODES_SQL = """
WITH roots AS (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'),
hop1 AS (SELECT DISTINCT o.o_orderkey
         FROM orders o JOIN roots r ON o.o_custkey = r.c_custkey),
gathered AS (
  SELECT l.l_partkey AS node, count(*) AS term_freq
  FROM lineitem l JOIN hop1 h ON l.l_orderkey = h.o_orderkey
  GROUP BY l.l_partkey
),
corpus AS (SELECT l_partkey AS node, count(*) AS doc_freq FROM lineitem GROUP BY l_partkey),
nd AS (SELECT count(*) AS n FROM lineitem)
SELECT CAST(g.node AS BIGINT) AS node,
       CAST(g.term_freq AS BIGINT) AS term_freq,
       CAST(c.doc_freq AS BIGINT) AS doc_freq,
       round((ln(g.term_freq) + 1.0) * (ln((nd.n + 1.0) / (c.doc_freq + 1.0)) + 1.0), 4) AS node_score
FROM gathered g JOIN corpus c ON g.node = c.node, nd
"""


GRAPH_OPS: dict[str, tuple] = {
    "graph_nodes_parts": (graph_nodes_parts, GRAPH_NODES_SQL),
    "shortest_path_parts": (shortest_path_parts, SHORTEST_PATH_SQL),
}

# pytest-gated only (the driver window is capped at 50 entries)
GRAPH_EXTRA_OPS: dict[str, tuple] = {
    "score_nodes_parts": (score_nodes_parts, SCORE_NODES_SQL),
}
