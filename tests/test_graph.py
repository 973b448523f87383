"""Graph streaming expressions: gatherNodes / shortestPath semantics.

Oracle parity for the driver-gated ops rides tests/test_entry.py; here we
pin the BFS algebra on tiny hand-built graphs (reference behavior:
ShortestPathStream.java per-level visited pruning, GatherNodesStream.java
per-level distinct gather).
"""

import pyspark.sql.functions as F
import pytest

from lucene_solr_spark.graph import gather_nodes, shortest_path


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_bfs_min_distance_on_diamond(spark):
    # a->b, a->c, b->d, c->d, d->e : d is reachable two ways, dist must be 2
    e = _edges(
        spark, [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e")]
    )
    got = {r["node"]: r["dist"] for r in shortest_path(e, "a", 5).collect()}
    assert got == {"a": 0, "b": 1, "c": 1, "d": 2, "e": 3}


def test_bfs_max_depth_bounds_and_early_exit(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    got = {r["node"]: r["dist"] for r in shortest_path(e, "a", 2).collect()}
    assert got == {"a": 0, "b": 1, "c": 2}  # d is beyond maxDepth
    # disconnected source: frontier drains immediately, loop exits early
    got = {r["node"]: r["dist"] for r in shortest_path(e, "zz", 4).collect()}
    assert got == {"zz": 0}


def test_bfs_cycle_terminates_each_node_once(spark):
    e = _edges(spark, [("a", "b"), ("b", "c"), ("c", "a")])
    rows = shortest_path(e, "a", 10).collect()
    assert len(rows) == len({r["node"] for r in rows}) == 3
    got = {r["node"]: r["dist"] for r in rows}
    assert got == {"a": 0, "b": 1, "c": 2}


def test_gather_nodes_two_levels_distinct(spark):
    roots = spark.createDataFrame([("r1",), ("r2",)], "node string")
    hop1 = _edges(spark, [("r1", "m1"), ("r2", "m1"), ("r2", "m2")])
    hop2 = _edges(spark, [("m1", "x"), ("m2", "x"), ("m2", "y")])
    out = gather_nodes(
        roots, [(hop1, "src", "dst", "L1"), (hop2, "src", "dst", "L2")]
    )
    got = {(r["level"], r["node"]) for r in out.collect()}
    # m1 gathered once despite two inbound roots; x once despite two paths
    assert got == {("L1", "m1"), ("L1", "m2"), ("L2", "x"), ("L2", "y")}


def test_bfs_levels_are_checkpointed(spark):
    """The returned BFS frame must be a union over checkpointed levels — no
    live join lineage (else each downstream action re-runs the whole walk,
    and the per-round plan would grow until Catalyst analysis OOMs)."""
    e = _edges(spark, [("a", "b"), ("b", "c")])
    df = shortest_path(e, "a", 2)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "ExistingRDD" in plan or "LocalTableScan" in plan
