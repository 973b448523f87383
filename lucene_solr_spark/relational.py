"""Relational operator surface — Solr streaming-expression analogues.

Each operator from the reference's streaming algebra
(``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/``, SURVEY §2.9)
re-expressed as an idiomatic DataFrame/Catalyst plan, paired with the ANSI-SQL
oracle the driver runs in DuckDB. Registry: ``RELATIONAL_OPS[name] =
(fn(spark, sf_dir) -> DataFrame, oracle_sql | None)``.

Scale notes are attached per-op: joins pick broadcast for dimension tables,
aggregations are partial+final (map-side combine) by construction, and
nothing collects to the driver.
"""

from __future__ import annotations

import datetime
import math
import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# --------------------------------------------------------------------------
# RollupStream / HashRollupStream (RollupStream.java:46) — hash aggregation
# with the metrics of metrics/{Count,Sum,Mean,Min,Max}Metric.java
def rollup_lineitem(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"),
            F.count("*").alias("n_rows"),
            F.countDistinct("l_orderkey").alias("n_orders"),
            F.min("l_quantity").alias("min_qty"),
            F.max("l_quantity").alias("max_qty"),
        )
    )


ROLLUP_SQL = """
SELECT l_returnflag, l_linestatus,
       sum(l_quantity) AS sum_qty,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_rows,
       count(DISTINCT l_orderkey) AS n_orders,
       min(l_quantity) AS min_qty,
       max(l_quantity) AS max_qty
FROM lineitem GROUP BY l_returnflag, l_linestatus
"""


# FacetStream / FacetField terms buckets (FacetField.java:71): top buckets by
# count — groupBy + orderBy + limit (deterministic tie-break on the key)
def facet_field_mktsegment(spark, sf_dir):
    return (
        _t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("bucket_count"), F.round(F.avg("c_acctbal"), 4).alias("avg_bal"))
        .orderBy(F.col("bucket_count").desc(), F.col("c_mktsegment").asc())
        .limit(5)
    )


FACET_FIELD_SQL = """
SELECT c_mktsegment, count(*) AS bucket_count, round(avg(c_acctbal), 4) AS avg_bal
FROM customer GROUP BY c_mktsegment
ORDER BY bucket_count DESC, c_mktsegment ASC LIMIT 5
"""


# SimpleFacets parameter surface (solr/core/.../request/SimpleFacets.java:
# getTermCounts — facet.sort=index|count, facet.offset/facet.limit paging,
# facet.mincount, facet.missing): the full bucket-listing knobs. The missing
# bucket (NULL key) counts rows with no value and sorts LAST like Solr
# appends it after the listed terms. One partial+final count agg; paging is
# driver-side arithmetic over bucket rows, never a second scan.
def facet_options_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").withColumn(
        # synthesize sparse NULLs deterministically so facet.missing has
        # something to count (clerk key space is dense in the test data)
        "prio",
        F.when(F.col("o_orderkey") % 7 == 0, F.lit(None)).otherwise(
            F.col("o_orderpriority")
        ),
    )
    counts = o.groupBy("prio").agg(F.count("*").alias("bucket_count"))
    # facet.sort=index + facet.mincount=2 + facet.offset=1 facet.limit=3 —
    # the rank runs over BUCKET rows (≤ cardinality of the field), not docs
    from pyspark.sql import Window

    w = Window.orderBy(F.col("prio").asc())
    paged = (
        counts.filter(F.col("prio").isNotNull())
        .filter(F.col("bucket_count") >= 2)
        .withColumn("rk", F.row_number().over(w))
        .filter((F.col("rk") >= 2) & (F.col("rk") <= 4))
        .select(F.col("prio").alias("bucket"), "bucket_count")
    )
    missing = counts.filter(F.col("prio").isNull()).select(
        F.lit("__missing__").alias("bucket"), "bucket_count"
    )
    return paged.unionAll(missing)


FACET_OPTIONS_SQL = """
WITH o AS (
  SELECT CASE WHEN o_orderkey % 7 = 0 THEN NULL ELSE o_orderpriority END AS prio
  FROM orders
),
counts AS (SELECT prio, count(*) AS bucket_count FROM o GROUP BY prio),
paged AS (
  SELECT prio AS bucket, bucket_count FROM (
    SELECT *, row_number() OVER (ORDER BY prio ASC) AS rk
    FROM counts WHERE prio IS NOT NULL AND bucket_count >= 2
  ) WHERE rk BETWEEN 2 AND 4
)
SELECT bucket, bucket_count FROM paged
UNION ALL
SELECT '__missing__', bucket_count FROM counts WHERE prio IS NULL
"""


# SimpleFacets term-filter knobs (solr/core/.../request/SimpleFacets.java
# getTermCounts: facet.prefix narrows the term range BEFORE counting —
# the reference seeks the term dict to the prefix — facet.contains (+
# facet.contains.ignoreCase) substring-filters, facet.excludeTerms drops
# exact terms). Bucket-row filters over the partial+final count agg: the
# prefix is sargable (starts_with on the dictionary), never a doc rescan.
def facet_prefix_part(spark, sf_dir):
    counts = (
        _t(spark, sf_dir, "part")
        .groupBy("p_brand")
        .agg(F.count("*").alias("bucket_count"))
    )
    out = (
        counts.filter(F.col("p_brand").startswith("Brand#1"))
        .filter(F.lower("p_brand").contains("2"))  # contains, ignoreCase
        .filter(~F.col("p_brand").isin("Brand#12"))  # facet.excludeTerms
        .orderBy(F.col("bucket_count").desc(), F.col("p_brand").asc())
        .limit(10)
        .select(F.col("p_brand").alias("bucket"), "bucket_count")
    )
    return out


FACET_PREFIX_SQL = """
SELECT p_brand AS bucket, count(*) AS bucket_count
FROM part
WHERE p_brand LIKE 'Brand#1%'
  AND contains(lower(p_brand), '2')
  AND p_brand != 'Brand#12'
GROUP BY p_brand
ORDER BY bucket_count DESC, p_brand ASC LIMIT 10
"""


# Date-range faceting (solr/core/.../request/SimpleFacets + facet.range on
# a date field with a DateMath gap — RangeEndpointCalculator's DATE case):
# bucket edges are start, start+gap, start+2·gap, … computed through the
# DATEMATH parser (so month-arithmetic clamping is Calendar.add-compatible),
# docs land in [edge_k, edge_{k+1}). The edge list is tiny (driver-side,
# like Solr's own endpoint loop); rows bucket via one broadcast range join —
# the fact side never shuffles. Oracle recomputes edges with independent
# INTERVAL arithmetic.
_DATERANGE_START = "2024-01-01T00:00:00Z"
_DATERANGE_GAP_DAYS = 7
_DATERANGE_BUCKETS = 5


def facet_daterange_events(spark, sf_dir):
    from .datemath import parse_datemath

    edges = [
        parse_datemath(f"{_DATERANGE_START}+{_DATERANGE_GAP_DAYS * k}DAYS")
        for k in range(_DATERANGE_BUCKETS + 1)
    ]
    # tz-naive edges: events.ts is a naive parquet timestamp and the oracle
    # compares naive TIMESTAMP edges — tz-aware values would shift under a
    # non-UTC session timezone
    ranges = spark.createDataFrame(
        [
            (
                edges[k].isoformat(),
                edges[k].replace(tzinfo=None),
                edges[k + 1].replace(tzinfo=None),
            )
            for k in range(_DATERANGE_BUCKETS)
        ],
        "bucket_start string, lo timestamp, hi timestamp",
    )
    e = _t(spark, sf_dir, "events")
    return (
        e.join(
            F.broadcast(ranges),
            (e.ts >= F.col("lo")) & (e.ts < F.col("hi")),
        )
        .groupBy("bucket_start")
        .agg(
            F.count("*").alias("bucket_count"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


FACET_DATERANGE_SQL = f"""
WITH edges AS (
  SELECT k,
         TIMESTAMP '2024-01-01 00:00:00' + to_days(CAST(k * {_DATERANGE_GAP_DAYS} AS INTEGER)) AS lo,
         TIMESTAMP '2024-01-01 00:00:00' + to_days(CAST((k + 1) * {_DATERANGE_GAP_DAYS} AS INTEGER)) AS hi
  FROM unnest(range(0, {_DATERANGE_BUCKETS})) AS t(k)
),
b AS (
  SELECT strftime(e2.lo, '%Y-%m-%dT%H:%M:%S+00:00') AS bucket_start,
         ev.value
  FROM events ev JOIN edges e2 ON ev.ts >= e2.lo AND ev.ts < e2.hi
)
SELECT bucket_start, CAST(count(*) AS BIGINT) AS bucket_count,
       round(sum(value), 4) AS sum_value
FROM b GROUP BY bucket_start
"""


# FacetRange (FacetRange.java:46): numeric range buckets via floor division
def facet_range_price(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .withColumn("bucket", F.floor(F.col("o_totalprice") / 50000).cast("long"))
        .groupBy("bucket")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


FACET_RANGE_SQL = """
SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS bucket,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders GROUP BY 1
"""


# FacetQuery (facet/FacetQuery.java): one bucket per predicate — conditional agg
def facet_query_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return o.agg(
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
        F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("n_big"),
        F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n_urgent"),
    )


FACET_QUERY_SQL = """
SELECT CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_finished,
       CAST(sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END) AS BIGINT) AS n_big,
       CAST(sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent
FROM orders
"""


# Driver-gated compound facet op: JSON-facet style multi-facet response —
# FacetField terms buckets + FacetRange numeric buckets + FacetQuery predicate
# buckets normalized to one (facet, bucket, n, val) frame, the shape of a
# single Solr JSON-facet request with three facet blocks. Per-facet single
# ops stay in RELATIONAL_EXTRA_OPS for the local pytest gate.
def facets_all(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    field = (
        c.groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"), F.round(F.avg("c_acctbal"), 4).alias("val"))
        .orderBy(F.col("n").desc(), F.col("c_mktsegment").asc())
        .limit(5)
        .select(
            F.lit("field").alias("facet"),
            F.col("c_mktsegment").alias("bucket"),
            "n",
            "val",
        )
    )
    rng = (
        o.withColumn("b", F.floor(F.col("o_totalprice") / 50000).cast("long"))
        .groupBy("b")
        .agg(F.count("*").alias("n"), F.round(F.sum("o_totalprice"), 2).alias("val"))
        .select(
            F.lit("range").alias("facet"),
            F.col("b").cast("string").alias("bucket"),
            "n",
            "val",
        )
    )
    qrows = (
        o.agg(
            F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).alias("n_finished"),
            F.sum(F.when(F.col("o_totalprice") > 100000, 1).otherwise(0)).alias("n_big"),
            F.sum(F.when(F.col("o_orderpriority") == "1-URGENT", 1).otherwise(0)).alias("n_urgent"),
        )
        .select(
            F.expr(
                "stack(3, 'n_finished', n_finished, 'n_big', n_big, 'n_urgent', n_urgent)"
                " AS (bucket, n)"
            )
        )
        .select(
            F.lit("query").alias("facet"),
            "bucket",
            F.col("n").cast("long").alias("n"),
            F.col("n").cast("double").alias("val"),
        )
    )
    return field.unionByName(rng).unionByName(qrows)


FACETS_ALL_SQL = """
SELECT 'field' AS facet, c_mktsegment AS bucket, n, val FROM (
  SELECT c_mktsegment, count(*) AS n, round(avg(c_acctbal), 4) AS val
  FROM customer GROUP BY c_mktsegment
  ORDER BY n DESC, c_mktsegment ASC LIMIT 5
)
UNION ALL
SELECT 'range', CAST(b AS VARCHAR), count(*), round(sum(o_totalprice), 2) FROM (
  SELECT CAST(floor(o_totalprice / 50000) AS BIGINT) AS b, o_totalprice FROM orders
) GROUP BY b
UNION ALL
SELECT 'query', k, CAST(v AS BIGINT), CAST(v AS DOUBLE) FROM (
  SELECT unnest(['n_finished', 'n_big', 'n_urgent']) AS k,
         unnest([sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END),
                 sum(CASE WHEN o_totalprice > 100000 THEN 1 ELSE 0 END),
                 sum(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END)]) AS v
  FROM orders
)
"""


# HavingStream (HavingStream.java:41): predicate over aggregated tuples
def having_suppliers(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 10000)
    )


HAVING_SQL = """
SELECT l_suppkey, sum(l_quantity) AS total_qty
FROM lineitem GROUP BY l_suppkey HAVING sum(l_quantity) > 10000
"""


# UniqueStream (UniqueStream.java:46): dedupe on a field
def unique_priority(spark, sf_dir):
    return _t(spark, sf_dir, "orders").select("o_orderpriority").distinct()


UNIQUE_SQL = "SELECT DISTINCT o_orderpriority FROM orders"


# ReduceStream + within-reduce tuple ops (ReduceStream.java:47 and
# solr/solrj/.../io/ops/): the stream groups sorted tuples by key and applies
# an operation per group. All four reference operations in one plan, each as
# a partial+final aggregate (map-side combinable, one shuffle on the key):
# - GroupOperation (GroupOperation.java:39, "top N tuples per group by sort"):
#   collect_list -> array_sort -> slice 3 (top-3 orders by price desc).
# - ConcatOperation (ConcatOperation.java:37, join field values into one):
#   concat_ws over the grouped keys.
# - DistinctOperation (DistinctOperation.java:34, first tuple per group):
#   min_by on the group's sort key.
# - ReplaceOperation (ReplaceWithValueOperation.java:33, rewrite field values
#   that equal X): when(status=='P', 'PENDING') before aggregation.
def reduce_group_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    top3 = F.transform(
        F.slice(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        (-F.col("o_totalprice")).alias("np"),
                        F.col("o_orderkey").alias("k"),
                    )
                )
            ),
            1,
            3,
        ),
        lambda s: s["k"].cast("string"),
    )
    replaced = F.when(F.col("o_orderstatus") == "P", F.lit("PENDING")).otherwise(
        F.col("o_orderstatus")
    )
    return o.groupBy("o_custkey").agg(
        F.concat_ws(",", top3).alias("top_orders"),
        F.min_by("o_orderpriority", "o_orderkey").alias("first_priority"),
        F.concat_ws("/", F.array_sort(F.collect_set(replaced))).alias("statuses"),
        F.count("*").alias("n_orders"),
    )


REDUCE_GROUP_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_orderpriority,
         CASE WHEN o_orderstatus = 'P' THEN 'PENDING' ELSE o_orderstatus END AS status,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC
         ) AS rn
  FROM orders)
SELECT o_custkey,
       string_agg(CASE WHEN rn <= 3 THEN CAST(o_orderkey AS VARCHAR) END,
                  ',' ORDER BY rn) AS top_orders,
       arg_min(o_orderpriority, o_orderkey) AS first_priority,
       string_agg(DISTINCT status, '/' ORDER BY status) AS statuses,
       count(*) AS n_orders
FROM ranked
GROUP BY o_custkey
"""


# RankStream (RankStream.java:48): global top-N by comparator
def rank_orders(spark, sf_dir):
    return (
        _t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(10)
    )


RANK_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10
"""


# SelectStream (SelectStream.java:50): projection + rename + computed column
def select_revenue(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .filter(F.col("l_discount") > 0.05)
        .select(
            F.col("l_orderkey").alias("okey"),
            F.col("l_linenumber").alias("line"),
            F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")), 4).alias("net"),
        )
    )


SELECT_SQL = """
SELECT l_orderkey AS okey, l_linenumber AS line,
       round(l_extendedprice * (1 - l_discount), 4) AS net
FROM lineitem WHERE l_discount > 0.05
"""


# InnerJoinStream (InnerJoinStream.java:35): sort-merge equi-join → Spark SMJ
def inner_join_orders_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("total"))
    )


INNER_JOIN_SQL = """
SELECT c_mktsegment, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
"""


# LeftOuterJoinStream (LeftOuterJoinStream.java:35)
def left_join_customer_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )


LEFT_JOIN_SQL = """
SELECT c_custkey, count(o_orderkey) AS n_orders
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# Driver-gated compound join op: InnerJoinStream + LeftOuterJoinStream
# (InnerJoinStream.java:35, LeftOuterJoinStream.java:35) normalized to one
# (variant, key, n_orders, total) frame. The per-variant ops stay in
# RELATIONAL_EXTRA_OPS.
def join_orders_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    inner = (
        o.join(c, o.o_custkey == c.c_custkey, "inner")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
        .select(
            F.lit("inner").alias("variant"),
            F.col("c_mktsegment").alias("key"),
            "n_orders",
            "total",
        )
    )
    left = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.sum(F.coalesce(F.col("o_totalprice"), F.lit(0.0))), 2).alias("total"),
        )
        .select(
            F.lit("left").alias("variant"),
            F.col("c_custkey").cast("string").alias("key"),
            "n_orders",
            "total",
        )
    )
    return inner.unionByName(left)


JOIN_OC_SQL = """
SELECT 'inner' AS variant, c_mktsegment AS key,
       count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
UNION ALL
SELECT 'left', CAST(c_custkey AS VARCHAR),
       count(o_orderkey), round(sum(coalesce(o_totalprice, 0)), 2)
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


# Driver-gated compound set op: IntersectStream (semi-join) +
# ComplementStream (anti-join) (IntersectStream.java:43,
# ComplementStream.java:43) as one (variant, custkey) frame.
def setops_custkeys(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    inter = a.join(b, "o_custkey", "left_semi").select(
        F.lit("intersect").alias("variant"), F.col("o_custkey").alias("custkey")
    )
    comp = c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        F.lit("complement").alias("variant"), F.col("c_custkey").alias("custkey")
    )
    return inter.unionByName(comp)


SETOPS_SQL = """
SELECT 'intersect' AS variant, o_custkey AS custkey FROM (
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
  INTERSECT
  SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
)
UNION ALL
SELECT 'complement', c_custkey FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# HashJoinStream (HashJoinStream.java:45): build side in memory → broadcast
# hash join; `part` is a dimension table — broadcast() makes the join
# shuffle-free (the 100-TB-safe plan: fact table never moves)
def hash_join_part_revenue(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    return (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


HASH_JOIN_SQL = """
SELECT p_brand, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
"""


# MergeStream (MergeStream.java:41): ordered union of streams
def merge_union(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    hi = o.filter(F.col("o_totalprice") > 150000).select("o_orderkey").withColumn("src", F.lit("hi"))
    lo = o.filter(F.col("o_totalprice") < 20000).select("o_orderkey").withColumn("src", F.lit("lo"))
    return hi.unionByName(lo)


MERGE_SQL = """
SELECT o_orderkey, 'hi' AS src FROM orders WHERE o_totalprice > 150000
UNION ALL
SELECT o_orderkey, 'lo' AS src FROM orders WHERE o_totalprice < 20000
"""


# IntersectStream (IntersectStream.java:43): keys present in both — semi-join
def intersect_custkeys(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    a = o.filter(F.col("o_orderstatus") == "O").select("o_custkey").distinct()
    b = o.filter(F.col("o_orderstatus") == "F").select("o_custkey").distinct()
    return a.join(b, "o_custkey", "left_semi")


INTERSECT_SQL = """
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'O'
INTERSECT
SELECT DISTINCT o_custkey FROM orders WHERE o_orderstatus = 'F'
"""


# ComplementStream (ComplementStream.java:43): in A, not in B — anti-join
def complement_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


COMPLEMENT_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


# CartesianProductStream (CartesianProductStream.java:47): unnest multivalued
# field → one row per element (explode)
def cartesian_part_types(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    return (
        p.select("p_partkey", F.explode(F.split(F.col("p_type"), " ")).alias("type_word"))
        .groupBy("type_word")
        .agg(F.count("*").alias("n"))
    )


CARTESIAN_SQL = """
SELECT t.type_word, count(*) AS n
FROM (SELECT p_partkey, unnest(string_split(p_type, ' ')) AS type_word FROM part) t
GROUP BY t.type_word
"""


# FetchStream (FetchStream.java:55): batched lookup-join for display fields —
# the two-phase fetch of SURVEY §3.3 (winners only, broadcast the small side)
def fetch_top_orders_customer(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    top = (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )
    return top.join(F.broadcast(c), top.o_custkey == c.c_custkey, "left").select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


FETCH_SQL = """
SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
FROM (SELECT * FROM orders ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20) o
LEFT JOIN customer ON o.o_custkey = c_custkey
"""


# ParallelStream (ParallelStream.java:48): hash-repartition by key then run
# the inner expression per worker — Spark's shuffle IS this operator; the
# repartition is a no-op semantically (result equals the plain agg)
def parallel_rollup_supplier(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .repartition(8, "l_suppkey")
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"), F.sum("l_quantity").alias("qty"))
    )


PARALLEL_SQL = """
SELECT l_suppkey, count(*) AS n, sum(l_quantity) AS qty FROM lineitem GROUP BY l_suppkey
"""


# TimeSeriesStream (TimeSeriesStream.java:57): date-bucketed aggregation
def timeseries_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"))
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


TIMESERIES_SQL = """
SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
       count(*) AS n, round(sum(value), 4) AS total_value
FROM events GROUP BY 1
"""


# SignificantTermsStream (SignificantTermsStream.java:59): terms
# over-represented in the foreground set vs the corpus — two aggs + join
def significant_event_types(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    fg = e.filter(F.col("value") > 50).groupBy("event_type").agg(F.count("*").alias("fg"))
    bg = e.groupBy("event_type").agg(F.count("*").alias("bg"))
    return (
        fg.join(bg, "event_type")
        .withColumn("lift", F.round(F.col("fg") / F.col("bg"), 4))
        .select("event_type", "fg", "bg", "lift")
    )


SIGNIFICANT_SQL = """
SELECT f.event_type, f.fg, b.bg, round(f.fg * 1.0 / b.bg, 4) AS lift
FROM (SELECT event_type, count(*) AS fg FROM events WHERE value > 50 GROUP BY 1) f
JOIN (SELECT event_type, count(*) AS bg FROM events GROUP BY 1) b USING (event_type)
"""


# StatsStream (StatsStream.java:53) + facet agg functions (SURVEY §2.8):
# min/max/sum/mean/stddev/percentile/unique — Spark built-ins
def stats_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return li.agg(
        F.count("*").alias("n"),
        F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
        F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
        F.min("l_quantity").alias("min_qty"),
        F.max("l_quantity").alias("max_qty"),
        F.countDistinct("l_partkey").alias("unique_parts"),
        F.round(F.stddev_samp("l_extendedprice"), 2).alias("std_price"),
    )


STATS_SQL = """
SELECT count(*) AS n, round(sum(l_quantity), 4) AS sum_qty,
       round(avg(l_quantity), 4) AS avg_qty,
       min(l_quantity) AS min_qty, max(l_quantity) AS max_qty,
       count(DISTINCT l_partkey) AS unique_parts,
       round(stddev_samp(l_extendedprice), 2) AS std_price
FROM lineitem
"""


# Grouping module (grouping/GroupingSearch.java): top-k rows per group
def group_topk_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


GROUP_TOPK_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn <= 2
"""


# searchAfter paging (IndexSearcher.java:459): keyset pagination — page 2 of
# the (totalprice desc, orderkey asc) sort. orderBy().limit(20) compiles to
# TakeOrderedAndProject (per-partition top-20 + tiny merge) — the 100-TB-safe
# plan; the row_number window then runs over just those 20 rows. (The old
# global no-partition Window funnelled the whole table through one task.)
def search_after_page2(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    top = (
        o.select("o_orderkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
    )
    w = Window.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
    return (
        top.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") > 10) & (F.col("rn") <= 20))
        .select("o_orderkey", "o_totalprice", "rn")
    )


SEARCH_AFTER_SQL = """
SELECT o_orderkey, o_totalprice, rn FROM (
  SELECT o_orderkey, o_totalprice,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
) WHERE rn > 10 AND rn <= 20
"""


# PointRangeQuery (search/PointRangeQuery.java:47): typed range predicate —
# Catalyst pushes this to the parquet scan (PushedFilters)
def point_range_shipdate(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
        )
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
    )


POINT_RANGE_SQL = """
SELECT l_returnflag, count(*) AS n FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_shipdate < TIMESTAMP '1996-01-01'
GROUP BY l_returnflag
"""


# Solr `geodist` function query (ValueSourceParser geo functions, SURVEY
# §2.10): haversine distance as a Catalyst expression. Coordinates are
# derived deterministically from the key (the driver tables carry no geo
# columns); the point is the function surface, identical in both engines.
def geodist_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 180) - 90 + 0.5
    lon = (F.col("c_custkey") % 360) - 180 + 0.5
    lat0, lon0 = F.lit(40.7), F.lit(-74.0)
    # haversine, earth radius 6371 km
    dlat = F.radians(lat - lat0)
    dlon = F.radians(lon - lon0)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat0)) * F.cos(F.radians(lat)) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = 2 * 6371 * F.asin(F.sqrt(a))
    return (
        c.select("c_custkey", F.round(dist, 2).alias("dist_km"))
        .filter(F.col("dist_km") < 5000)
    )


GEODIST_SQL = """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 180) - 90 + 0.5 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer
)
SELECT c_custkey, dist_km FROM (
  SELECT c_custkey,
         round(2 * 6371 * asin(sqrt(
           pow(sin(radians(lat - 40.7) / 2), 2) +
           cos(radians(40.7)) * cos(radians(lat)) * pow(sin(radians(lon - (-74.0)) / 2), 2)
         )), 2) AS dist_km
  FROM pts
) WHERE dist_km < 5000
"""


# LatLonPoint box query + distance sort (lucene/core document/
# LatLonPoint.java newBoxQuery:143 + LatLonDocValuesField.newDistanceSort;
# Solr spatial bbox/geofilt + sort=geodist() asc). Same derived coordinate
# scheme as geodist_customers. Scale shape: the box predicate is a pushed-
# down scan filter (the 2-D analogue of PointRangeQuery pruning), the
# distance sort is orderBy().limit() — TakeOrderedAndProject, never a
# single-partition window.
def spatial_bbox(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 180) - 90 + 0.5
    lon = (F.col("c_custkey") % 360) - 180 + 0.5
    lat0, lon0 = F.lit(40.7), F.lit(-74.0)
    dlat = F.radians(lat - lat0)
    dlon = F.radians(lon - lon0)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat0)) * F.cos(F.radians(lat)) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = 2 * 6371 * F.asin(F.sqrt(a))
    return (
        c.select("c_custkey", lat.alias("lat"), lon.alias("lon"), dist.alias("dist"))
        .filter(F.col("lat").between(10, 60) & F.col("lon").between(-120, -40))
        .orderBy(F.col("dist").asc(), F.col("c_custkey").asc())
        .limit(20)
        .select("c_custkey", F.round("dist", 2).alias("dist_km"))
    )


SPATIAL_BBOX_SQL = """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 180) - 90 + 0.5 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer
),
d AS (
  SELECT c_custkey,
         2 * 6371 * asin(sqrt(
           pow(sin(radians(lat - 40.7) / 2), 2) +
           cos(radians(40.7)) * cos(radians(lat)) * pow(sin(radians(lon - (-74.0)) / 2), 2)
         )) AS dist
  FROM pts WHERE lat BETWEEN 10 AND 60 AND lon BETWEEN -120 AND -40
)
SELECT c_custkey, round(dist, 2) AS dist_km FROM d
ORDER BY dist ASC, c_custkey ASC LIMIT 20
"""


# LatLonPoint.newPolygonQuery (lucene/core document/LatLonPoint.java:253,
# geo/Polygon2D.java:54 contains()) — arbitrary (non-convex) polygon
# containment via even-odd ray casting. Two-phase like the reference's
# BKD traversal: a cheap bounding-box prefilter (pushed-down scan filter,
# the coarse-cell approximation) then the exact per-edge crossing test
# (Polygon2D.contains). The crossing sum is generated ONCE as a SQL
# expression string and compiled by BOTH Catalyst and DuckDB, so the two
# engines evaluate identical IEEE-double arithmetic. No horizontal edges
# in the polygon (the guarded division never sees y2 == y1).
_POLY = [(10.0, -150.0), (45.0, -100.0), (10.0, -50.0), (70.0, -70.0), (80.0, -120.0)]


def _poly_crossing_expr(lat_col: str, lon_col: str) -> str:
    terms = []
    for i, (y1, x1) in enumerate(_POLY):
        y2, x2 = _POLY[(i + 1) % len(_POLY)]
        terms.append(
            f"(CASE WHEN (({y1} > {lat_col}) <> ({y2} > {lat_col})) AND "
            f"({lon_col} < ({x2} - {x1}) * ({lat_col} - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return " + ".join(terms)


def _poly_bbox() -> tuple[float, float, float, float]:
    lats = [p[0] for p in _POLY]
    lons = [p[1] for p in _POLY]
    return min(lats), max(lats), min(lons), max(lons)


def spatial_polygon(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat_min, lat_max, lon_min, lon_max = _poly_bbox()
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180) - 90 + 0.5).alias("lat"),
        ((F.col("c_custkey") % 360) - 180 + 0.5).alias("lon"),
    )
    return (
        pts.filter(F.col("lat").between(lat_min, lat_max))
        .filter(F.col("lon").between(lon_min, lon_max))
        .filter(F.expr(_poly_crossing_expr("lat", "lon")) % 2 == 1)
        .select("c_custkey", "lat", "lon")
    )


# LatLonShape polygon-SET indexing role (lucene/core document/LatLonShape
# .java:63 — shapes tessellated into triangles stored in a BKD tree; at
# query time the tree walk classifies each cell against the query geometry
# as CELL_INSIDE_QUERY / CELL_CROSSES_QUERY / CELL_OUTSIDE_QUERY
# (ShapeQuery.java relate()) and only CROSSES cells visit their points).
# Columnar form of the same three-way split:
#
# - INGEST: a coarse grid-cell id column rides the table (here derived in
#   the first projection; a real geo table writes it at ingest and
#   partitions/sorts by it, so the IN-list below prunes row groups).
# - PLAN TIME (driver, tiny): classify every grid cell against each
#   polygon — INSIDE cells match with NO exact test, BOUNDARY cells carry
#   the set of polygons whose exact edge-crossing test must run, OUTSIDE
#   cells never leave the scan.
# - EXECUTE: one pushed-down `cell IN (candidates)` scan filter, a
#   broadcast join against the ≤|cells| classification frame, and the
#   O(edges) crossing expression gated to boundary rows only.
#
# Correctness is pinned by the oracle: the pruned plan must equal the
# plain any-polygon ray-cast over all rows.

_GRID_DEG = 10.0
_N_LON_CELLS = int(360 / _GRID_DEG)

_POLY_SET = [
    _POLY,
    [(-40.0, 20.0), (-10.0, 45.0), (-35.0, 70.0)],
    [(20.0, 100.0), (50.0, 130.0), (25.0, 160.0), (5.0, 130.0)],
]


def _pt_in_poly(poly, lat: float, lon: float) -> bool:
    """Driver-side even-odd ray cast — same arithmetic as the SQL expr."""
    n = 0
    for i, (y1, x1) in enumerate(poly):
        y2, x2 = poly[(i + 1) % len(poly)]
        if ((y1 > lat) != (y2 > lat)) and lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1:
            n += 1
    return n % 2 == 1


def _segs_intersect(p1, p2, q1, q2) -> bool:
    def orient(a, b, c):
        v = (b[0] - a[0]) * (c[1] - a[1]) - (b[1] - a[1]) * (c[0] - a[0])
        return 0 if v == 0 else (1 if v > 0 else -1)

    def on_seg(a, b, c):
        return (
            min(a[0], b[0]) <= c[0] <= max(a[0], b[0])
            and min(a[1], b[1]) <= c[1] <= max(a[1], b[1])
        )

    o1, o2 = orient(p1, p2, q1), orient(p1, p2, q2)
    o3, o4 = orient(q1, q2, p1), orient(q1, q2, p2)
    if o1 != o2 and o3 != o4:
        return True
    return (
        (o1 == 0 and on_seg(p1, p2, q1))
        or (o2 == 0 and on_seg(p1, p2, q2))
        or (o3 == 0 and on_seg(q1, q2, p1))
        or (o4 == 0 and on_seg(q1, q2, p2))
    )


def _classify_cells(poly) -> tuple[set[int], set[int]]:
    """(inside_cells, boundary_cells) for one polygon — the ComponentTree
    relate() three-way split over the ingest grid. A cell is BOUNDARY when
    any polygon edge touches its rectangle (edge-rect intersection or a
    vertex inside); otherwise its four corners agree and decide
    INSIDE/OUTSIDE. Runs over the polygon's bbox cells only — a handful of
    driver-side float ops, never a Spark job."""
    lats = [p[0] for p in poly]
    lons = [p[1] for p in poly]
    inside: set[int] = set()
    boundary: set[int] = set()
    ci_lo = int(math.floor((min(lats) + 90) / _GRID_DEG))
    ci_hi = int(math.floor((max(lats) + 90) / _GRID_DEG))
    cj_lo = int(math.floor((min(lons) + 180) / _GRID_DEG))
    cj_hi = int(math.floor((max(lons) + 180) / _GRID_DEG))
    edges = [(poly[i], poly[(i + 1) % len(poly)]) for i in range(len(poly))]
    for ci in range(ci_lo, ci_hi + 1):
        for cj in range(cj_lo, cj_hi + 1):
            cell = ci * _N_LON_CELLS + cj
            y0, y1 = ci * _GRID_DEG - 90, (ci + 1) * _GRID_DEG - 90
            x0, x1 = cj * _GRID_DEG - 180, (cj + 1) * _GRID_DEG - 180
            corners = [(y0, x0), (y0, x1), (y1, x1), (y1, x0)]
            rect_edges = [
                (corners[i], corners[(i + 1) % 4]) for i in range(4)
            ]
            crosses = any(
                y0 <= vy <= y1 and x0 <= vx <= x1 for vy, vx in poly
            ) or any(
                _segs_intersect(a, b, c, d)
                for a, b in edges
                for c, d in rect_edges
            )
            if crosses:
                boundary.add(cell)
            elif _pt_in_poly(poly, *corners[0]):
                inside.add(cell)
    return inside, boundary


def _grid_cell_col(lat_col: str, lon_col: str):
    return (
        F.floor((F.col(lat_col) + 90) / _GRID_DEG) * _N_LON_CELLS
        + F.floor((F.col(lon_col) + 180) / _GRID_DEG)
    ).cast("long")


def spatial_polygon_set(spark, sf_dir):
    """Match customers inside ANY of the three polygons, grid-pruned."""
    c = _t(spark, sf_dir, "customer")
    pts = c.select(
        "c_custkey",
        ((F.col("c_custkey") % 180) - 90 + 0.5).alias("lat"),
        ((F.col("c_custkey") % 360) - 180 + 0.5).alias("lon"),
    ).withColumn("cell", _grid_cell_col("lat", "lon"))
    classified = [_classify_cells(p) for p in _POLY_SET]
    # a cell INSIDE any polygon matches outright; BOUNDARY cells carry the
    # per-polygon test mask (minus polygons the cell is already inside)
    inside_any = set().union(*(ins for ins, _ in classified))
    cells_rows = []
    all_boundary = set().union(*(b for _, b in classified)) - inside_any
    for cell in sorted(inside_any):
        cells_rows.append((cell, True, [False] * len(_POLY_SET)))
    for cell in sorted(all_boundary):
        mask = [cell in b for _, b in classified]
        cells_rows.append((cell, False, mask))
    cells = spark.createDataFrame(
        [(c_, i_, *m_) for c_, i_, m_ in cells_rows],
        "cell long, cell_inside boolean, "
        + ", ".join(f"test{k} boolean" for k in range(len(_POLY_SET))),
    )
    exact = [
        F.expr(_poly_set_crossing_expr(k, "lat", "lon")) % 2 == 1
        for k in range(len(_POLY_SET))
    ]
    cond = F.col("cell_inside")
    for k in range(len(_POLY_SET)):
        cond = cond | (F.col(f"test{k}") & exact[k])
    return (
        # the IN-list prune IS the scan filter — OUTSIDE cells never join
        pts.filter(F.col("cell").isin([r[0] for r in cells_rows]))
        .join(F.broadcast(cells), "cell")
        .filter(cond)
        .select("c_custkey", "lat", "lon")
    )


def _poly_set_crossing_expr(k: int, lat_col: str, lon_col: str) -> str:
    poly = _POLY_SET[k]
    terms = []
    for i, (y1, x1) in enumerate(poly):
        y2, x2 = poly[(i + 1) % len(poly)]
        terms.append(
            f"(CASE WHEN (({y1} > {lat_col}) <> ({y2} > {lat_col})) AND "
            f"({lon_col} < ({x2} - {x1}) * ({lat_col} - {y1}) / ({y2} - {y1}) + {x1}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _spatial_polygon_set_sql() -> str:
    # the oracle is the UNPRUNED any-polygon ray cast — grid pruning must
    # be invisible in the result
    tests = " OR ".join(
        f"({_poly_set_crossing_expr(k, 'lat', 'lon')} % 2 = 1)"
        for k in range(len(_POLY_SET))
    )
    return f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 180) - 90 + 0.5 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer
)
SELECT c_custkey, lat, lon FROM pts WHERE {tests}
"""


SPATIAL_POLYGON_SET_SQL = _spatial_polygon_set_sql()


# ---------------------------------------------------------------------------
# LatLonShape — SHAPE DOCUMENTS (round-4 verdict missing #3): indexing
# polygons/lines AS documents, not just querying point docs.
#
# Reference: ``lucene/sandbox/src/java/org/apache/lucene/document/
# LatLonShape.java:63`` — ``createIndexableFields`` tessellates a polygon
# into triangles (``Tessellator``) and stores each triangle's encoded
# vertices in a 7-dim BKD tree; ``LatLonShapePolygonQuery.java`` walks the
# tree classifying cells against the query geometry and relates candidate
# triangles exactly (INTERSECTS / WITHIN / DISJOINT).
#
# Columnar form: the tessellation unit (a triangle, vertex columns
# y1..y3/x1..x3) is one ROW; at ingest each triangle expands to its
# covering grid cells — ``shape_cell_index`` is the (cell, shape_id,
# vertices) posting table, partitioned by cell at scale (the BKD leaf
# analogue; the expansion is pure Catalyst ``sequence``+``explode`` over
# the bbox cell range, ≤ a handful of rows per shape at 10° cells). The
# shape corpus here derives deterministically from `supplier` so the
# DuckDB oracle can rebuild it; a real table writes the cells at ingest.
#
# Queries:
# - ``shape_index_join`` — point-in-indexed-shape: points equi-join the
#   cell index on their ONE cell id, then the exact ray cast runs per
#   candidate pair (never all pairs). Oracle = brute-force all-pairs.
# - ``shape_relate`` — polygon-polygon relate against a literal query
#   polygon: candidates = shapes with a cell the query's
#   inside∪boundary set touches (driver-side ``_classify_cells``, the
#   ShapeQuery.relate() split), exact predicate = edge×edge proper
#   intersections + vertex containment both ways, generated ONCE as SQL
#   text both engines compile (identical IEEE doubles). WITHIN = all
#   vertices inside ∧ no edge crossing; DISJOINT = anti-join of
#   INTERSECTS against the shape corpus (the inverted prune). Degenerate
#   touch-only contacts are covered by the vertex tests, not the proper-
#   intersection test — documented scope, identical in both engines.

# one expression text, two compilers: Spark selectExpr AND the oracle SQL
_TRI_COLS = [
    "s_suppkey AS shape_id",
    "CAST((s_suppkey * 7 % 150) - 75 + 0.5 AS DOUBLE) AS y1",
    "CAST((s_suppkey * 13 % 330) - 165 + 0.5 AS DOUBLE) AS x1",
    "CAST((s_suppkey * 7 % 150) - 75 + 6.5 AS DOUBLE) AS y2",
    "CAST((s_suppkey * 13 % 330) - 165 + 9.5 AS DOUBLE) AS x2",
    "CAST((s_suppkey * 7 % 150) - 75 + 11.5 AS DOUBLE) AS y3",
    "CAST((s_suppkey * 13 % 330) - 165 + 2.5 AS DOUBLE) AS x3",
]
_TRI_DERIVE_SQL = "SELECT " + ", ".join(_TRI_COLS) + " FROM supplier"

_PTS_COLS = [
    "c_custkey",
    "(c_custkey % 180) - 90 + 0.5 AS lat",
    "(c_custkey % 360) - 180 + 0.5 AS lon",
]
_PTS_DERIVE_SQL = "SELECT " + ", ".join(_PTS_COLS) + " FROM customer"


def _tri_crossing_expr(lat: str, lon: str) -> str:
    """Even-odd ray cast of point (lat, lon) against the triangle held in
    COLUMNS y1..y3/x1..x3 — same arithmetic text for Catalyst and DuckDB.
    Triangle lats are distinct by construction (offsets 0/6/11), so the
    guarded division never sees y2 == y1."""
    terms = []
    idx = [(1, 2), (2, 3), (3, 1)]
    for a, b in idx:
        terms.append(
            f"(CASE WHEN ((y{a} > {lat}) <> (y{b} > {lat})) AND "
            f"({lon} < (x{b} - x{a}) * ({lat} - y{a}) / (y{b} - y{a}) + x{a}) "
            f"THEN 1 ELSE 0 END)"
        )
    return "(" + " + ".join(terms) + ")"


def _shapes_df(spark, sf_dir):
    return _t(spark, sf_dir, "supplier").selectExpr(*_TRI_COLS)


def shape_cell_index(spark, sf_dir):
    """The tessellated-shape posting table: (cell, shape_id, vertices) —
    one row per (bbox-covering cell, triangle). Pure Catalyst expansion;
    at 100 TB this is written at ingest and partitioned by cell."""
    shp = _shapes_df(spark, sf_dir)
    lat_lo = F.least("y1", "y2", "y3")
    lat_hi = F.greatest("y1", "y2", "y3")
    lon_lo = F.least("x1", "x2", "x3")
    lon_hi = F.greatest("x1", "x2", "x3")
    return (
        shp.withColumn(
            "ci",
            F.explode(
                F.sequence(
                    F.floor((lat_lo + 90) / _GRID_DEG).cast("long"),
                    F.floor((lat_hi + 90) / _GRID_DEG).cast("long"),
                )
            ),
        )
        .withColumn(
            "cj",
            F.explode(
                F.sequence(
                    F.floor((lon_lo + 180) / _GRID_DEG).cast("long"),
                    F.floor((lon_hi + 180) / _GRID_DEG).cast("long"),
                )
            ),
        )
        .withColumn("cell", F.col("ci") * _N_LON_CELLS + F.col("cj"))
        .select("cell", "shape_id", "y1", "x1", "y2", "x2", "y3", "x3")
    )


def shape_index_join(spark, sf_dir):
    """Point-in-indexed-shape join: each point probes the cell index with
    its ONE cell id; the exact ray cast runs only on cell-colocated
    (point, triangle) pairs. (cell, shape_id) rows are unique and a point
    has one cell, so no post-join distinct is needed."""
    pts = (
        _t(spark, sf_dir, "customer")
        .selectExpr(*_PTS_COLS)
        .withColumn("cell", _grid_cell_col("lat", "lon"))
    )
    idx = shape_cell_index(spark, sf_dir)
    return (
        pts.join(idx, "cell")
        .filter(F.expr(f"{_tri_crossing_expr('lat', 'lon')} % 2 = 1"))
        .select("c_custkey", "shape_id")
    )


SHAPE_INDEX_JOIN_SQL = f"""
WITH shapes AS ({_TRI_DERIVE_SQL}),
pts AS ({_PTS_DERIVE_SQL})
SELECT c_custkey, shape_id
FROM pts, shapes
WHERE {_tri_crossing_expr('lat', 'lon')} % 2 = 1
"""


def _orient(ax, ay, bx, by, cx, cy) -> str:
    return f"(({bx} - {ax}) * ({cy} - {ay}) - ({by} - {ay}) * ({cx} - {ax}))"


def _seg_intersect_expr(p1, p2, q1, q2) -> str:
    """Proper segment intersection (strict sign flips both ways); p/q are
    (x_expr, y_expr) pairs — mixed literals and column names."""
    o1 = _orient(p1[0], p1[1], p2[0], p2[1], q1[0], q1[1])
    o2 = _orient(p1[0], p1[1], p2[0], p2[1], q2[0], q2[1])
    o3 = _orient(q1[0], q1[1], q2[0], q2[1], p1[0], p1[1])
    o4 = _orient(q1[0], q1[1], q2[0], q2[1], p2[0], p2[1])
    return (
        f"((({o1}) > 0 AND ({o2}) < 0 OR ({o1}) < 0 AND ({o2}) > 0) AND "
        f"(({o3}) > 0 AND ({o4}) < 0 OR ({o3}) < 0 AND ({o4}) > 0))"
    )


def _shape_relate_exprs(poly) -> tuple[str, str]:
    """(intersects_expr, within_expr) for the column triangle vs the
    literal query polygon — one text, two compilers."""
    # triangle vertices inside the polygon (literal poly, column point)
    vin = []
    for v in (1, 2, 3):
        terms = []
        for i, (py1, px1) in enumerate(poly):
            py2, px2 = poly[(i + 1) % len(poly)]
            terms.append(
                f"(CASE WHEN (({py1} > y{v}) <> ({py2} > y{v})) AND "
                f"(x{v} < ({px2} - {px1}) * (y{v} - {py1}) / ({py2} - {py1}) + {px1}) "
                f"THEN 1 ELSE 0 END)"
            )
        vin.append("((" + " + ".join(terms) + ") % 2 = 1)")
    # polygon's first vertex inside the column triangle
    p0y, p0x = poly[0]
    pv_in_tri = f"({_tri_crossing_expr(str(p0y), str(p0x))} % 2 = 1)"
    # edge × edge proper intersections
    tri_edges = [((f"x{a}", f"y{a}"), (f"x{b}", f"y{b}")) for a, b in ((1, 2), (2, 3), (3, 1))]
    pairs = []
    for i, (py1, px1) in enumerate(poly):
        py2, px2 = poly[(i + 1) % len(poly)]
        for te in tri_edges:
            pairs.append(
                _seg_intersect_expr(te[0], te[1], (str(px1), str(py1)), (str(px2), str(py2)))
            )
    any_cross = "(" + " OR ".join(pairs) + ")"
    any_vin = "(" + " OR ".join(vin) + ")"
    all_vin = "(" + " AND ".join(vin) + ")"
    intersects = f"({any_cross} OR {any_vin} OR {pv_in_tri})"
    within = f"({all_vin} AND NOT {any_cross})"
    return intersects, within


# the default relate query polygon: a near-rectangular quad over the
# shape corpus's southern band (triangles derive at lats -75..-4 for the
# low suppkeys every SF has). Slightly tilted edges — no horizontal edge,
# the ray-cast division guard (same constraint as _POLY).
_SHAPE_QUERY_POLY = [(-80.0, -170.0), (4.0, -168.0), (6.0, -40.0), (-78.0, -42.0)]


def shape_relate(spark, sf_dir, relate: str = "intersects", poly=None):
    """Polygon relate over INDEXED shapes (``LatLonShapePolygonQuery``):
    candidates come from the query polygon's inside∪boundary grid cells
    (one pushed ``cell IN (...)`` scan filter on the posting table), the
    exact predicate runs per candidate. DISJOINT anti-joins INTERSECTS
    against the shape corpus — the inverted prune."""
    poly = poly or _SHAPE_QUERY_POLY
    intersects, within = _shape_relate_exprs(poly)
    inside, boundary = _classify_cells(poly)
    cand_cells = sorted(inside | boundary)
    idx = shape_cell_index(spark, sf_dir)
    cands = (
        idx.filter(F.col("cell").isin(cand_cells))
        .select("shape_id", "y1", "x1", "y2", "x2", "y3", "x3")
        .distinct()
    )
    if relate == "intersects":
        return cands.filter(F.expr(intersects)).select("shape_id")
    if relate == "within":
        return cands.filter(F.expr(within)).select("shape_id")
    if relate == "disjoint":
        hits = cands.filter(F.expr(intersects)).select("shape_id")
        return (
            _shapes_df(spark, sf_dir)
            .select("shape_id")
            .join(hits, "shape_id", "left_anti")
        )
    raise ValueError(f"unknown relate {relate!r} "
                     "(supported: intersects, within, disjoint)")


def _shape_relate_sql(relate: str) -> str:
    intersects, within = _shape_relate_exprs(_SHAPE_QUERY_POLY)
    base = f"WITH shapes AS ({_TRI_DERIVE_SQL})\n"
    if relate == "intersects":
        return base + f"SELECT shape_id FROM shapes WHERE {intersects}"
    if relate == "within":
        return base + f"SELECT shape_id FROM shapes WHERE {within}"
    return base + f"SELECT shape_id FROM shapes WHERE NOT {intersects}"


# ---- LINE shapes (LatLonShape.createIndexableFields over Line geometries:
# each SEGMENT is the tessellation unit — the reference encodes a line's
# segments as degenerate triangles in the same BKD tree). Same cell-posting
# scheme; the exact relate drops the triangle-specific parts: INTERSECTS =
# any proper segment×edge crossing OR an endpoint inside the query polygon
# (a line has no interior, so polygon-vertex-in-shape does not apply);
# WITHIN = both endpoints inside ∧ no crossing; DISJOINT = ¬INTERSECTS.
_LINE_COLS = [
    "p_partkey AS shape_id",
    "CAST((p_partkey * 11 % 150) - 75 + 0.5 AS DOUBLE) AS y1",
    "CAST((p_partkey * 17 % 330) - 165 + 0.5 AS DOUBLE) AS x1",
    "CAST((p_partkey * 11 % 150) - 75 + 7.5 AS DOUBLE) AS y2",
    "CAST((p_partkey * 17 % 330) - 165 + 5.5 AS DOUBLE) AS x2",
]
_LINE_DERIVE_SQL = "SELECT " + ", ".join(_LINE_COLS) + " FROM part"


def _lines_df(spark, sf_dir):
    return _t(spark, sf_dir, "part").selectExpr(*_LINE_COLS)


def line_cell_index(spark, sf_dir):
    """(cell, shape_id, endpoints) posting rows for line segments — the
    same ingest-time bbox-cell expansion as the triangle index."""
    ln = _lines_df(spark, sf_dir)
    return (
        ln.withColumn(
            "ci",
            F.explode(
                F.sequence(
                    F.floor((F.least("y1", "y2") + 90) / _GRID_DEG).cast("long"),
                    F.floor((F.greatest("y1", "y2") + 90) / _GRID_DEG).cast("long"),
                )
            ),
        )
        .withColumn(
            "cj",
            F.explode(
                F.sequence(
                    F.floor((F.least("x1", "x2") + 180) / _GRID_DEG).cast("long"),
                    F.floor((F.greatest("x1", "x2") + 180) / _GRID_DEG).cast("long"),
                )
            ),
        )
        .withColumn("cell", F.col("ci") * _N_LON_CELLS + F.col("cj"))
        .select("cell", "shape_id", "y1", "x1", "y2", "x2")
    )


def _line_relate_exprs(poly) -> tuple[str, str]:
    """(intersects_expr, within_expr) for the column segment (y1,x1)-(y2,x2)
    vs the literal query polygon."""
    vin = []
    for v in (1, 2):
        terms = []
        for i, (py1, px1) in enumerate(poly):
            py2, px2 = poly[(i + 1) % len(poly)]
            terms.append(
                f"(CASE WHEN (({py1} > y{v}) <> ({py2} > y{v})) AND "
                f"(x{v} < ({px2} - {px1}) * (y{v} - {py1}) / ({py2} - {py1}) + {px1}) "
                f"THEN 1 ELSE 0 END)"
            )
        vin.append("((" + " + ".join(terms) + ") % 2 = 1)")
    pairs = []
    for i, (py1, px1) in enumerate(poly):
        py2, px2 = poly[(i + 1) % len(poly)]
        pairs.append(
            _seg_intersect_expr(
                ("x1", "y1"), ("x2", "y2"), (str(px1), str(py1)), (str(px2), str(py2))
            )
        )
    any_cross = "(" + " OR ".join(pairs) + ")"
    any_vin = "(" + " OR ".join(vin) + ")"
    all_vin = "(" + " AND ".join(vin) + ")"
    return f"({any_cross} OR {any_vin})", f"({all_vin} AND NOT {any_cross})"


def line_relate(spark, sf_dir, relate: str = "intersects", poly=None):
    """INTERSECTS/WITHIN/DISJOINT of INDEXED line shapes against a query
    polygon — the cell-pruned candidate scan + per-candidate exact test,
    DISJOINT via the inverted-prune anti-join."""
    poly = poly or _SHAPE_QUERY_POLY
    intersects, within = _line_relate_exprs(poly)
    inside, boundary = _classify_cells(poly)
    cand_cells = sorted(inside | boundary)
    idx = line_cell_index(spark, sf_dir)
    cands = (
        idx.filter(F.col("cell").isin(cand_cells))
        .select("shape_id", "y1", "x1", "y2", "x2")
        .distinct()
    )
    if relate == "intersects":
        return cands.filter(F.expr(intersects)).select("shape_id")
    if relate == "within":
        return cands.filter(F.expr(within)).select("shape_id")
    if relate == "disjoint":
        hits = cands.filter(F.expr(intersects)).select("shape_id")
        return (
            _lines_df(spark, sf_dir)
            .select("shape_id")
            .join(hits, "shape_id", "left_anti")
        )
    raise ValueError(f"unknown relate {relate!r} "
                     "(supported: intersects, within, disjoint)")


def _line_relate_sql(relate: str) -> str:
    intersects, within = _line_relate_exprs(_SHAPE_QUERY_POLY)
    base = f"WITH lines AS ({_LINE_DERIVE_SQL})\n"
    if relate == "intersects":
        return base + f"SELECT shape_id FROM lines WHERE {intersects}"
    if relate == "within":
        return base + f"SELECT shape_id FROM lines WHERE {within}"
    return base + f"SELECT shape_id FROM lines WHERE NOT {intersects}"


def line_relate_intersects(spark, sf_dir):
    return line_relate(spark, sf_dir, "intersects")


def line_relate_within(spark, sf_dir):
    return line_relate(spark, sf_dir, "within")


def shape_relate_intersects(spark, sf_dir):
    return shape_relate(spark, sf_dir, "intersects")


def shape_relate_within(spark, sf_dir):
    return shape_relate(spark, sf_dir, "within")


def shape_relate_disjoint(spark, sf_dir):
    return shape_relate(spark, sf_dir, "disjoint")


def _spatial_polygon_sql() -> str:
    lat_min, lat_max, lon_min, lon_max = _poly_bbox()
    return f"""
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 180) - 90 + 0.5 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer
)
SELECT c_custkey, lat, lon FROM pts
WHERE lat BETWEEN {lat_min} AND {lat_max}
  AND lon BETWEEN {lon_min} AND {lon_max}
  AND ({_poly_crossing_expr("lat", "lon")}) % 2 = 1
"""


SPATIAL_POLYGON_SQL = _spatial_polygon_sql()


# Solr JSON Facet API (solr/core search/facet/FacetModule.java,
# FacetField.java:71, FacetFieldProcessor.java): terms buckets sorted by a
# METRIC (not count — the sort:"sum_price desc" spec), per-bucket aggs
# (count/sum/avg/unique: CountAgg/SumAgg/AvgAgg/UniqueAgg), and a NESTED
# subfacet evaluated within each surviving parent bucket. Scale shape: the
# parent facet is one partial+final groupBy; the subfacet re-aggregates only
# rows of surviving buckets (broadcast semi-join on ≤limit keys) with a
# per-parent partitioned window for the inner top-k — never a global window.
def json_facet_orders(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    parents = (
        o.groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("bucket_count"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.avg("o_totalprice"), 2).alias("avg_price"),
            F.countDistinct("o_custkey").alias("uniq_cust"),
        )
        .orderBy(F.col("sum_price").desc(), F.col("o_orderpriority").asc())
        .limit(3)
    )
    sub = (
        o.join(F.broadcast(parents.select("o_orderpriority")), "o_orderpriority")
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("status_count"),
            F.round(F.sum("o_totalprice"), 2).alias("status_sum"),
        )
    )
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.col("status_count").desc(), F.col("o_orderstatus").asc()
    )
    sub = sub.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    return parents.join(sub, "o_orderpriority").select(
        "o_orderpriority",
        "bucket_count",
        "sum_price",
        "avg_price",
        "uniq_cust",
        "o_orderstatus",
        "status_count",
        "status_sum",
    )


JSON_FACET_SQL = """
WITH parents AS (
  SELECT o_orderpriority,
         count(*) AS bucket_count,
         round(sum(o_totalprice), 2) AS sum_price,
         round(avg(o_totalprice), 2) AS avg_price,
         count(DISTINCT o_custkey) AS uniq_cust
  FROM orders GROUP BY o_orderpriority
  ORDER BY sum_price DESC, o_orderpriority ASC LIMIT 3
),
sub AS (
  SELECT o.o_orderpriority, o.o_orderstatus,
         count(*) AS status_count,
         round(sum(o.o_totalprice), 2) AS status_sum,
         row_number() OVER (PARTITION BY o.o_orderpriority
                            ORDER BY count(*) DESC, o.o_orderstatus ASC) AS rk
  FROM orders o JOIN parents p USING (o_orderpriority)
  GROUP BY o.o_orderpriority, o.o_orderstatus
)
SELECT p.o_orderpriority,
       CAST(p.bucket_count AS BIGINT) AS bucket_count,
       p.sum_price, p.avg_price,
       CAST(p.uniq_cust AS BIGINT) AS uniq_cust,
       s.o_orderstatus,
       CAST(s.status_count AS BIGINT) AS status_count,
       s.status_sum
FROM parents p JOIN sub s USING (o_orderpriority)
WHERE s.rk <= 2
"""


# RelatednessAgg (solr/core search/facet/RelatednessAgg.java:473
# computeRelatedness + :500 sigmoidHelper) — the Semantic Knowledge Graph
# relatedness score of each facet bucket w.r.t. a foreground query vs the
# background collection: z = (fg_count - fg_size·bg_prob) /
# sqrt(fg_size·bg_prob·(1-bg_prob)), squashed through the 5-sigmoid blend,
# rounded to 5 digits (roundTo5Digits). popularity = count/bg_size (fg_pop
# intentionally divides by BACKGROUND size, RelatednessAgg.java:356).
# One groupBy with conditional counts + a broadcast 1-row global-sizes
# aggregate — single shuffle, scale-safe.
def relatedness_mktsegment(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    fg = F.col("c_acctbal") > 5000  # the foreground query $q
    per = c.groupBy("c_mktsegment").agg(
        F.sum(F.when(fg, 1).otherwise(0)).cast("long").alias("fg_count"),
        F.count("*").alias("bg_count"),
    )
    sizes = c.agg(
        F.sum(F.when(fg, 1).otherwise(0)).cast("double").alias("fg_size"),
        F.count("*").cast("double").alias("bg_size"),
    )
    j = per.crossJoin(F.broadcast(sizes))
    bg_prob = F.col("bg_count") / F.col("bg_size")
    num = F.col("fg_count") - F.col("fg_size") * bg_prob
    denom_raw = F.sqrt(F.col("fg_size") * bg_prob * (1 - bg_prob))
    z = num / F.when(denom_raw != 0, denom_raw).otherwise(F.lit(1e-10))

    def sig(off, scale):
        return (z + off) / (scale + F.abs(z + off))

    rel = F.round(
        0.2 * sig(-80.0, 50.0)
        + 0.2 * sig(-30.0, 30.0)
        + 0.2 * sig(0.0, 30.0)
        + 0.2 * sig(30.0, 30.0)
        + 0.2 * sig(80.0, 50.0),
        5,
    )
    return (
        j.select(
            "c_mktsegment",
            "fg_count",
            "bg_count",
            F.round(F.col("fg_count") / F.col("bg_size"), 5).alias("fg_pop"),
            F.round(F.col("bg_count") / F.col("bg_size"), 5).alias("bg_pop"),
            rel.alias("relatedness"),
        )
        .orderBy(F.col("relatedness").desc(), F.col("c_mktsegment").asc())
    )


RELATEDNESS_SQL = """
WITH per AS (
  SELECT c_mktsegment,
         CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS BIGINT) AS fg_count,
         CAST(count(*) AS BIGINT) AS bg_count
  FROM customer GROUP BY c_mktsegment
),
sizes AS (
  SELECT CAST(sum(CASE WHEN c_acctbal > 5000 THEN 1 ELSE 0 END) AS DOUBLE) AS fg_size,
         CAST(count(*) AS DOUBLE) AS bg_size
  FROM customer
),
calc AS (
  SELECT c_mktsegment, fg_count, bg_count, fg_size, bg_size,
         (fg_count - fg_size * (bg_count / bg_size)) /
         (CASE WHEN sqrt(fg_size * (bg_count / bg_size) * (1 - bg_count / bg_size)) <> 0
               THEN sqrt(fg_size * (bg_count / bg_size) * (1 - bg_count / bg_size))
               ELSE 1e-10 END) AS z
  FROM per CROSS JOIN sizes
)
SELECT c_mktsegment, fg_count, bg_count,
       round(fg_count / bg_size, 5) AS fg_pop,
       round(bg_count / bg_size, 5) AS bg_pop,
       round(0.2 * (z - 80) / (50 + abs(z - 80))
           + 0.2 * (z - 30) / (30 + abs(z - 30))
           + 0.2 * (z + 0)  / (30 + abs(z + 0))
           + 0.2 * (z + 30) / (30 + abs(z + 30))
           + 0.2 * (z + 80) / (50 + abs(z + 80)), 5) AS relatedness
FROM calc
ORDER BY relatedness DESC, c_mktsegment ASC
"""


# DiversifiedTopDocsCollector (reference lucene/misc/src/java/org/apache/
# lucene/search/DiversifiedTopDocsCollector.java:61): global top-N with at
# most maxHitsPerKey results per key. Two-stage Spark shape: per-key rank
# window (partitioned — parallel across keys) caps each key, then TakeOrdered
# merges the survivors; identical result set to the reference's single-pass
# collector because a doc outside its key's top-maxHitsPerKey can never be
# in the diversified global top-N.
def diversified_top_orders(spark, sf_dir):
    from pyspark.sql import Window

    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("krk", F.row_number().over(w))
        .filter(F.col("krk") <= 2)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    )


DIVERSIFIED_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice FROM (
  SELECT o_orderkey, o_custkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS krk
  FROM orders
) WHERE krk <= 2
ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
"""


# Solr ExportHandler / export streaming expression (solr/core/.../handler/
# export/ExportWriter.java): full sorted export of a filtered result set —
# no top-k cap, the sort IS the contract (downstream joins/merges consume
# it). Spark shape: pushed-down filter + column pruning + a range-partitioned
# global sort (each output partition sorted AND partition ranges ordered —
# the per-shard-sorted stream the reference emits).
def export_sorted_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") < "1992-03-01")
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate")
        .orderBy("l_orderkey", "l_linenumber")
    )


EXPORT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate FROM lineitem
WHERE l_shipdate < DATE '1992-03-01'
ORDER BY l_orderkey, l_linenumber
"""


# PercentileAgg (solr/core/.../facet/PercentileAgg.java:32): exact
# interpolated percentiles per bucket — Spark `percentile` == DuckDB
# `quantile_cont` (both linear interpolation). The approx variants
# (percentile_approx / HLLAgg->approx_count_distinct) exist as built-ins but
# are not oracle-gated: sketch implementations differ across engines.
def percentile_quantity(spark, sf_dir):
    return (
        _t(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_extendedprice, 0.5)"), 4).alias("p50"),
            F.round(F.expr("percentile(l_extendedprice, 0.9)"), 4).alias("p90"),
            F.round(F.expr("percentile(l_extendedprice, 0.99)"), 4).alias("p99"),
        )
    )


PERCENTILE_SQL = """
SELECT l_returnflag,
       round(quantile_cont(l_extendedprice, 0.5), 4) AS p50,
       round(quantile_cont(l_extendedprice, 0.9), 4) AS p90,
       round(quantile_cont(l_extendedprice, 0.99), 4) AS p99
FROM lineitem GROUP BY l_returnflag
"""


# Solr query-time join ({!join from=... to=...}, reference solr/core/src/
# java/org/apache/solr/search/JoinQParserPlugin.java:63): filter one
# collection by key membership in a filtered view of another — a semi-join.
# Spark shape: LEFT SEMI join, child side filtered before the join so only
# qualifying keys shuffle; Catalyst broadcasts the small side under AQE.
def join_query_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_quantity") > 45)
    return o.join(
        li, o["o_orderkey"] == li["l_orderkey"], "left_semi"
    ).select("o_orderkey", "o_totalprice")


JOIN_QUERY_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity > 45)
"""


# Solr pivot facets (facet.pivot, reference solr/core/src/java/org/apache/
# solr/handler/component/PivotFacetProcessor.java:48): hierarchical
# field,field counting with a per-parent top-k limit. Spark shape: one
# partial+final count agg, then a rank window PARTITIONED by the parent
# value — never a global single-partition window.
def facet_pivot_orders(spark, sf_dir):
    from pyspark.sql import Window

    cnt = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_orderstatus", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.col("n").desc(), "o_orderpriority"
    )
    return (
        cnt.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_orderstatus", "o_orderpriority", "n", F.col("rk").cast("int").alias("rk"))
    )


FACET_PIVOT_SQL = """
WITH cnt AS (
  SELECT o_orderstatus, o_orderpriority, count(*) AS n
  FROM orders GROUP BY 1, 2
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY o_orderstatus
            ORDER BY n DESC, o_orderpriority) AS rk
  FROM cnt
)
SELECT o_orderstatus, o_orderpriority, n, CAST(rk AS INT) AS rk
FROM rk WHERE rk <= 3
"""


# Solr math movingAvg / diff over a timeseries (reference solr/solrj/src/
# java/org/apache/solr/client/solrj/io/eval/MovingAverageEvaluator.java:33,
# DerivativeEvaluator.java:36): per-series sliding mean and first difference.
# Windows are PARTITIONED by the series key — bounded per-series state, no
# global single-partition exchange.
def moving_avg_events(spark, sf_dir):
    e = _t(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type",
        F.date_format(F.date_trunc("day", F.col("ts")), "yyyy-MM-dd").alias("day"),
    ).agg(F.count("*").alias("n"))
    w = Window.partitionBy("event_type").orderBy("day")
    return daily.select(
        "event_type",
        "day",
        "n",
        F.round(F.avg("n").over(w.rowsBetween(-2, 0)), 4).alias("ma3"),
        (F.col("n") - F.lag("n", 1).over(w)).alias("diff1"),
    )


MOVING_AVG_SQL = """
WITH daily AS (
  SELECT event_type, strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
         count(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT event_type, day, n,
       round(avg(n) OVER (PARTITION BY event_type ORDER BY day
                          ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS ma3,
       n - lag(n, 1) OVER (PARTITION BY event_type ORDER BY day) AS diff1
FROM daily
"""


# Solr math/stat streaming expressions (corr/regress/cov — reference
# solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
# CorrelationEvaluator.java:35, RegressionEvaluator.java:38): grouped
# Pearson correlation + OLS fit as single-pass distributed aggregates.
def corr_regress_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.corr("l_extendedprice", "l_quantity"), 5).alias("corr_pq"),
            F.round(F.regr_slope("l_extendedprice", "l_quantity"), 4).alias("slope"),
            F.round(F.regr_intercept("l_extendedprice", "l_quantity"), 4).alias("icept"),
            F.round(F.covar_samp("l_extendedprice", "l_quantity"), 2).alias("cov_pq"),
        )
    )


CORR_REGRESS_SQL = """
SELECT l_returnflag,
       round(corr(l_extendedprice, l_quantity), 5) AS corr_pq,
       round(regr_slope(l_extendedprice, l_quantity), 4) AS slope,
       round(regr_intercept(l_extendedprice, l_quantity), 4) AS icept,
       round(covar_samp(l_extendedprice, l_quantity), 2) AS cov_pq
FROM lineitem GROUP BY l_returnflag
"""


# Driver-gated registry (first-50-entries window — see textops.FT_OPS note);
# single-facet / single-join-type / single-set-op variants are folded into
# the compound ops and stay pytest-gated via RELATIONAL_EXTRA_OPS.
RELATIONAL_OPS: dict[str, tuple] = {
    "geodist_customers": (geodist_customers, GEODIST_SQL),
    "spatial_bbox": (spatial_bbox, SPATIAL_BBOX_SQL),
    "percentile_quantity": (percentile_quantity, PERCENTILE_SQL),
    "rollup_lineitem": (rollup_lineitem, ROLLUP_SQL),
    "facets_all": (facets_all, FACETS_ALL_SQL),
    "having_suppliers": (having_suppliers, HAVING_SQL),
    "reduce_group_orders": (reduce_group_orders, REDUCE_GROUP_SQL),
    "rank_orders": (rank_orders, RANK_SQL),
    "facet_pivot_orders": (facet_pivot_orders, FACET_PIVOT_SQL),
    "hash_join_part_revenue": (hash_join_part_revenue, HASH_JOIN_SQL),
    "merge_union": (merge_union, MERGE_SQL),
    "setops_custkeys": (setops_custkeys, SETOPS_SQL),
    "corr_regress_lineitem": (corr_regress_lineitem, CORR_REGRESS_SQL),
    "fetch_top_orders_customer": (fetch_top_orders_customer, FETCH_SQL),
    "parallel_rollup_supplier": (parallel_rollup_supplier, PARALLEL_SQL),
    "timeseries_events": (timeseries_events, TIMESERIES_SQL),
    "significant_event_types": (significant_event_types, SIGNIFICANT_SQL),
    "stats_lineitem": (stats_lineitem, STATS_SQL),
    "group_topk_orders": (group_topk_orders, GROUP_TOPK_SQL),
    "search_after_page2": (search_after_page2, SEARCH_AFTER_SQL),
    "point_range_shipdate": (point_range_shipdate, POINT_RANGE_SQL),
}

# pytest-gated only: per-variant ops folded into the compound driver entries.
# Session windows over keyed events — the batch twin of the stateful
# streaming operator (streaming/stateful.py, applyInPandasWithState). The
# DuckDB oracle mirrors the lag + running-sum session assignment.
def sessionize_events(spark, sf_dir):
    from .streaming.stateful import sessionize_batch

    e = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    return sessionize_batch(e, gap_seconds=1800.0).select(
        "user_id",
        "session_start",
        "session_end",
        "n_events",
        F.round("sum_value", 4).alias("sum_value"),
    )


SESSIONIZE_SQL = """
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800 * 1000000
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts)
),
sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM flagged
)
SELECT user_id, min(ts) AS session_start, max(ts) AS session_end,
       count(*) AS n_events, round(sum(value), 4) AS sum_value
FROM sess GROUP BY user_id, session_no
"""


# Solr function-query surface end-to-end: the string is parsed by
# functions.parse_func (ValueSourceParser role) into one Catalyst expression.
def func_query_lineitem(spark, sf_dir):
    from .functions import parse_func

    expr = "recip(mul(l_quantity,l_extendedprice),0.0001,1,1)"
    return (
        _t(spark, sf_dir, "lineitem")
        .select(
            "l_orderkey",
            "l_linenumber",
            F.round(parse_func(expr), 6).alias("boost"),
            F.round(parse_func("log(add(abs(l_extendedprice),1))"), 6).alias("logf"),
        )
        .orderBy(F.col("boost").desc(), "l_orderkey", "l_linenumber")
        .limit(50)
    )


FUNC_QUERY_SQL = """
SELECT l_orderkey, l_linenumber,
       round(1 / (0.0001 * (l_quantity * l_extendedprice) + 1), 6) AS boost,
       round(log10(abs(l_extendedprice) + 1), 6) AS logf
FROM lineitem
ORDER BY boost DESC, l_orderkey, l_linenumber LIMIT 50
"""



# Block join (the lucene/join module): ToParentBlockJoinQuery aggregates the
# scores of a child query's matches up to their enclosing parent under a
# ScoreMode (Total/Avg/Min/Max — ``ToParentBlockJoinQuery.java:350-377``);
# ToChildBlockJoinQuery maps matching parents back to all their children.
# Lucene needs parent/child docs co-located in one index block; in Spark the
# parent key IS the block identity, so to-parent is one map-side-combinable
# groupBy on the FK followed by a parent join (bucket both by orderkey at
# 100 TB and neither side re-shuffles), and to-child is a semi-join with the
# selective parent side broadcast.
def block_join_parents(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    # child score in integer cents: double sums are summation-order-dependent
    # (Spark's partial aggs vs the oracle differ a ULP at rounding boundaries);
    # integer sums are exact and associative on both engines
    child = l.filter(F.col("l_quantity") >= 45).withColumn(
        "c",
        F.floor(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100 + 0.5),
    )
    agg = child.groupBy("l_orderkey").agg(
        F.count("*").alias("n_children"),
        (F.sum("c") / 100.0).alias("score_total"),
        F.round(F.sum("c") / (100.0 * F.count("*")), 4).alias("score_avg"),
        (F.min("c") / 100.0).alias("score_min"),
        (F.max("c") / 100.0).alias("score_max"),
    )
    return (
        o.filter(F.col("o_orderstatus") == "O")  # parentsFilter bitset
        .join(agg, o.o_orderkey == agg.l_orderkey)
        .select(
            "o_orderkey",
            "n_children",
            "score_total",
            "score_avg",
            "score_min",
            "score_max",
        )
    )


BLOCK_JOIN_PARENTS_SQL = """
WITH child AS (
  SELECT l_orderkey,
         CAST(floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) AS BIGINT) AS c
  FROM lineitem WHERE l_quantity >= 45
),
agg AS (
  SELECT l_orderkey, count(*) AS n_children,
         CAST(sum(c) AS BIGINT) / 100.0 AS score_total,
         round(CAST(sum(c) AS BIGINT) / (100.0 * count(*)), 4) AS score_avg,
         min(c) / 100.0 AS score_min,
         max(c) / 100.0 AS score_max
  FROM child GROUP BY l_orderkey
)
SELECT o_orderkey, n_children, score_total, score_avg, score_min, score_max
FROM orders JOIN agg ON o_orderkey = l_orderkey
WHERE o_orderstatus = 'O'
"""


def block_join_children(spark, sf_dir):
    """ToChildBlockJoinQuery (``ToChildBlockJoinQuery.java``): parents
    matching the parent query emit all their children. Selective parent
    side → broadcast semi-join, no fact-table shuffle."""
    l = _t(spark, sf_dir, "lineitem")
    parents = (
        _t(spark, sf_dir, "orders")
        .filter((F.col("o_totalprice") > 400000) & (F.col("o_orderstatus") == "F"))
        .select("o_orderkey")
    )
    return l.join(
        F.broadcast(parents), l.l_orderkey == parents.o_orderkey, "left_semi"
    ).select("l_orderkey", "l_linenumber", "l_quantity")


BLOCK_JOIN_CHILDREN_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity
FROM lineitem
WHERE l_orderkey IN (
  SELECT o_orderkey FROM orders
  WHERE o_totalprice > 400000 AND o_orderstatus = 'F')
"""


# Nested-doc RETRIEVAL — the ``[child]`` / ``[parent]`` doc transformers
# (``solr/core/src/java/org/apache/solr/response/transform/
# ChildDocTransformerFactory.java:57``): a matching parent is returned with
# its (childFilter-filtered, limit-capped) children NESTED as an array
# column; the inverse attaches each matching child's parent as a struct.
# Scale shape: children aggregate map-side per parent key (the Lucene block
# contract bounds a parent's children, so collect_list is block-bounded,
# and `limit` caps the carried payload); bucket both sides by orderkey at
# 100 TB and neither re-shuffles. Childless parents keep an empty array —
# the transformer decorates, never filters (ChildDocTransformer.transform).
def child_doc_transform(
    spark,
    sf_dir,
    parent_filter: str = "o_totalprice > 400000 AND o_orderstatus = 'F'",
    child_filter: str = "l_quantity >= 30",
    limit: int = 3,
):
    """``fl=*,[child childFilter=... limit=...]``: parents matching
    ``parent_filter`` with up to ``limit`` children (child order =
    l_linenumber, the within-block doc order) nested as
    ``children: array<struct>``."""
    o = _t(spark, sf_dir, "orders")
    l = _t(spark, sf_dir, "lineitem")
    kids = (
        l.filter(F.expr(child_filter))
        .groupBy("l_orderkey")
        .agg(
            F.slice(
                F.sort_array(
                    F.collect_list(
                        F.struct("l_linenumber", "l_quantity", "l_extendedprice")
                    )
                ),
                1,
                limit,
            ).alias("children")
        )
    )
    return (
        o.filter(F.expr(parent_filter))
        .join(kids, o.o_orderkey == kids.l_orderkey, "left")
        .select(
            "o_orderkey",
            "o_totalprice",
            F.coalesce(
                "children",
                F.expr(
                    "cast(array() as array<struct<l_linenumber:int,"
                    "l_quantity:double,l_extendedprice:double>>)"
                ),
            ).alias("children"),
        )
    )


def parent_doc_transform(
    spark,
    sf_dir,
    child_filter: str = "l_quantity >= 49 AND l_discount >= 0.09",
):
    """The inverse decoration (``[parent]`` role): each matching child row
    carries its parent as a nested struct — a broadcast-friendly dimension
    join when the matching child set is selective."""
    o = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.struct("o_orderkey", "o_orderstatus", "o_totalprice").alias("parent")
    )
    l = _t(spark, sf_dir, "lineitem").filter(F.expr(child_filter))
    return l.join(o, l.l_orderkey == o.o_orderkey).select(
        "o_orderkey", "l_linenumber", "l_quantity", "parent"
    )


# Tagged-facet exclusions (Solr ``{!tag=…}`` filters + ``{!ex=…}`` facets,
# ``reference solr/core/src/java/org/apache/solr/request/SimpleFacets.java``
# getFacetFieldCounts excluded-filter handling): with filters mktsegment =
# 'BUILDING' AND acctbal > 0 applied, the mktsegment facet EXCLUDES its own
# filter (so the user still sees the other segments' counts under the
# remaining filters), while the acctbal facet excludes its own range filter
# symmetrically. Each facet is one scan + groupBy over the OTHER filters —
# no self-join, both facets union into one frame.
def facet_exclusions(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    f_seg = F.col("c_mktsegment") == "BUILDING"
    f_bal = F.col("c_acctbal") > 0
    seg_facet = (
        c.filter(f_bal)  # {!ex=seg}: every filter but the segment's own
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n"))
        .select(
            F.lit("mktsegment").alias("facet"),
            F.col("c_mktsegment").alias("bucket"),
            "n",
        )
    )
    bal_facet = (
        c.filter(f_seg)  # {!ex=bal}
        .withColumn("b", F.when(f_bal, "pos").otherwise("nonpos"))
        .groupBy("b")
        .agg(F.count("*").alias("n"))
        .select(F.lit("acctbal").alias("facet"), F.col("b").alias("bucket"), "n")
    )
    return seg_facet.unionByName(bal_facet)


FACET_EXCLUSIONS_SQL = """
SELECT 'mktsegment' AS facet, c_mktsegment AS bucket, count(*) AS n
FROM customer WHERE c_acctbal > 0 GROUP BY c_mktsegment
UNION ALL
SELECT 'acctbal' AS facet,
       CASE WHEN c_acctbal > 0 THEN 'pos' ELSE 'nonpos' END AS bucket,
       count(*) AS n
FROM customer WHERE c_mktsegment = 'BUILDING'
GROUP BY 2
"""


# Solr collapse/expand (CollapsingQParserPlugin
# solr/core/src/java/org/apache/solr/search/CollapsingQParserPlugin.java:137 +
# ExpandComponent
# solr/core/src/java/org/apache/solr/handler/component/ExpandComponent.java:91):
# collapse the result set to ONE head document per group (best sort value,
# ties to the lowest key), page the heads globally, then expand only the
# paged heads' groups with their next-best members. Distinct from plain
# grouped-top-k: the expand stage is restricted to the page's groups.
# Spark shape: partitioned window picks heads (never a global window);
# orderBy().limit() pages them (TakeOrderedAndProject); expand re-joins the
# ranked rows against the tiny broadcast head set — at 100 TB the second
# window only ever sees the paged groups' rows, not the whole table.
def collapse_expand_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    ranked = o.select("o_custkey", "o_orderkey", "o_totalprice").withColumn(
        "rn", F.row_number().over(w)
    )
    heads = (
        ranked.filter(F.col("rn") == 1)
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(20)
        .select("o_custkey", "o_orderkey", "o_totalprice")
    )
    expanded = (
        ranked.join(F.broadcast(heads.select("o_custkey")), "o_custkey")
        .filter((F.col("rn") >= 2) & (F.col("rn") <= 3))
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("kind", F.lit("expanded"))
    )
    return heads.withColumn("kind", F.lit("collapsed")).unionByName(expanded)


COLLAPSE_EXPAND_SQL = """
WITH ranked AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
  FROM orders
), heads AS (
  SELECT o_custkey, o_orderkey, o_totalprice FROM ranked WHERE rn = 1
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 20
)
SELECT o_custkey, o_orderkey, o_totalprice, 'collapsed' AS kind FROM heads
UNION ALL
SELECT r.o_custkey, r.o_orderkey, r.o_totalprice, 'expanded' AS kind
FROM ranked r JOIN heads h ON r.o_custkey = h.o_custkey
WHERE r.rn BETWEEN 2 AND 3
"""


# Solr frange — FunctionRangeQuery ({!frange l=.. u=..}func,
# solr/core/src/java/org/apache/solr/search/FunctionRangeQParserPlugin.java:35,
# lucene/queries/src/java/org/apache/lucene/queries/function/FunctionRangeQuery.java:33):
# filter documents by the value of a COMPUTED function, not a stored field.
# In Catalyst the function is just an expression, so the predicate stays
# inside WholeStageCodegen and never materializes the function column.
def frange_lineitem(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    netprice = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter((netprice >= F.lit(900.0)) & (netprice <= F.lit(1000.0)))
        .groupBy("l_returnflag")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum(netprice), 2).alias("net_sum"),
        )
    )


FRANGE_SQL = """
SELECT l_returnflag, count(*) AS n,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS net_sum
FROM lineitem
WHERE l_extendedprice * (1 - l_discount) BETWEEN 900.0 AND 1000.0
GROUP BY l_returnflag
"""


# Taxonomy facets (lucene/facet/src/java/org/apache/lucene/facet/taxonomy/
# TaxonomyFacetCounts.java + FacetsConfig hierarchical dims): counts at
# EVERY node of an arbitrary-depth category tree. Spark-first: the path
# levels explode into all prefixes scan-locally (one pass, no taxonomy
# sidecar index — the path string IS the ordinal), then one
# map-side-combinable groupBy. Depth-generic: `levels` is any array column.
def taxonomy_facets(spark, sf_dir):
    p = _t(spark, sf_dir, "part")
    levels = F.array(
        F.col("p_brand"), F.col("p_type"), F.col("p_size").cast("string")
    )
    prefixes = F.transform(
        F.sequence(F.lit(1), F.size(levels)),
        lambda i: F.concat_ws("/", F.slice(levels, F.lit(1), i)),
    )
    return (
        p.select(F.explode(prefixes).alias("path"))
        .groupBy("path")
        .agg(F.count("*").alias("cnt"))
    )


TAXONOMY_SQL = """
WITH base AS (
  SELECT p_brand AS l1, p_type AS l2, CAST(p_size AS VARCHAR) AS l3 FROM part
), pref AS (
  SELECT l1 AS path FROM base
  UNION ALL SELECT l1 || '/' || l2 FROM base
  UNION ALL SELECT l1 || '/' || l2 || '/' || l3 FROM base
)
SELECT path, count(*) AS cnt FROM pref GROUP BY path
"""


# DrillSideways (lucene/facet/src/java/org/apache/lucene/facet/
# DrillSideways.java:63-100): for each drilled-down dimension, facet counts
# are computed with THAT dimension's own drill-down removed and all others
# applied — "what else could I have picked". One scan: each row emits one
# (dim, value, keep) struct per dimension, keep = the OTHER dims' filters;
# explode → filter → one groupBy. No per-dim re-scan at any scale.
_DS_SEG, _DS_PRI = "BUILDING", "1-URGENT"


def drill_sideways_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    j = o.join(
        F.broadcast(c.select("c_custkey", "c_mktsegment")),
        o.o_custkey == c.c_custkey,
    )
    sideways = F.array(
        F.struct(
            F.lit("mktsegment").alias("dim"),
            F.col("c_mktsegment").alias("value"),
            (F.col("o_orderpriority") == _DS_PRI).alias("keep"),
        ),
        F.struct(
            F.lit("priority").alias("dim"),
            F.col("o_orderpriority").alias("value"),
            (F.col("c_mktsegment") == _DS_SEG).alias("keep"),
        ),
    )
    return (
        j.select(F.explode(sideways).alias("s"))
        .filter(F.col("s.keep"))
        .groupBy(F.col("s.dim").alias("dim"), F.col("s.value").alias("value"))
        .agg(F.count("*").alias("cnt"))
    )


DRILL_SIDEWAYS_SQL = f"""
WITH j AS (
  SELECT o_orderpriority AS pri, c_mktsegment AS seg
  FROM orders JOIN customer ON o_custkey = c_custkey
), u AS (
  SELECT 'mktsegment' AS dim, seg AS value FROM j WHERE pri = '{_DS_PRI}'
  UNION ALL
  SELECT 'priority' AS dim, pri AS value FROM j WHERE seg = '{_DS_SEG}'
)
SELECT dim, value, count(*) AS cnt FROM u GROUP BY dim, value
"""


# Solr math-evaluator pipeline over a relation — LetStream variable bindings
# chaining array evaluators (solr/solrj/src/java/org/apache/solr/client/
# solrj/io/stream/LetStream.java + io/eval/*Evaluator.java). The whole let()
# program parses into Catalyst Columns (evaluators.parse_let), so the row
# path is pure codegen: per-row array build, mean/stddev/l2norm/cosine over
# it, no Python, no shuffle.
def eval_let_lineitem(spark, sf_dir):
    from .evaluators import apply_let

    li = _t(spark, sf_dir, "lineitem")
    base = li.where(F.col("l_orderkey") <= 1000).select(
        "l_orderkey",
        "l_linenumber",
        F.col("l_quantity").cast("double").alias("q"),
        F.col("l_extendedprice").cast("double").alias("p"),
        F.col("l_discount").cast("double").alias("d"),
        F.col("l_tax").cast("double").alias("t"),
    )
    out = apply_let(
        base,
        "let(v = array(q, p, d, t), m = mean(v), s = stddev(v),"
        " u = l2norm(v), c = cosineSimilarity(v, rev(v)))",
    )
    return out.select(
        "l_orderkey",
        "l_linenumber",
        F.round("m", 4).alias("m"),
        F.round("s", 4).alias("s"),
        F.round("u", 4).alias("u"),
        F.round("c", 4).alias("c"),
    )


# Oracle mirrors the evaluators' exact fold order (left-to-right over the
# array) so doubles agree before the 4dp display rounding.
EVAL_LET_SQL = """
WITH base AS (
  SELECT l_orderkey, l_linenumber,
         CAST(l_quantity AS DOUBLE) AS q, CAST(l_extendedprice AS DOUBLE) AS p,
         CAST(l_discount AS DOUBLE) AS d, CAST(l_tax AS DOUBLE) AS t
  FROM lineitem WHERE l_orderkey <= 1000
), mid AS (
  SELECT *, (q + p + d + t) / 4 AS mv FROM base
)
SELECT l_orderkey, l_linenumber,
  round(mv, 4) AS m,
  round(sqrt(((q-mv)*(q-mv) + (p-mv)*(p-mv) + (d-mv)*(d-mv) + (t-mv)*(t-mv)) / 3), 4) AS s,
  round(sqrt(q*q + p*p + d*d + t*t), 4) AS u,
  round((q*t + p*d + d*p + t*q)
        / (sqrt(q*q + p*p + d*d + t*t) * sqrt(t*t + d*d + p*p + q*q)), 4) AS c
FROM mid
"""


# MultiRangeQuery (sandbox MultiRangeQuery.java): a disjunction of ranges
# over ONE point field evaluated in a single scan/traversal rather than N
# separate range queries. Spark-first: one OR-of-ranges predicate, pushed to
# the parquet scan as a row-group filter (the BKD single-traversal analogue).
_MR_RANGES = ((1, 5), (20, 25), (45, 50))


def multi_range_quantity(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    q = F.col("l_quantity")
    pred = None
    for lo, hi in _MR_RANGES:
        r = (q >= lo) & (q <= hi)
        pred = r if pred is None else (pred | r)
    return (
        li.filter(pred)
        .groupBy("l_linestatus")
        .agg(
            F.count("*").alias("n"),
            F.sum(q.cast("double")).alias("sum_qty"),
        )
    )


MULTI_RANGE_SQL = """
SELECT l_linestatus, count(*) AS n,
       CAST(sum(CAST(l_quantity AS DOUBLE)) AS DOUBLE) AS sum_qty
FROM lineitem
WHERE (l_quantity BETWEEN 1 AND 5)
   OR (l_quantity BETWEEN 20 AND 25)
   OR (l_quantity BETWEEN 45 AND 50)
GROUP BY l_linestatus
"""


# DocValuesTermsQuery + DocValuesNumbersQuery (sandbox DocValuesTermsQuery
# .java / DocValuesNumbersQuery.java): verify-time set membership against
# per-doc values instead of an inverted index. In a columnar store the
# index-vs-docvalues execution split collapses (IndexOrDocValuesQuery role,
# COVERAGE §2.5) — both compile to an IN filter on the column scan; Catalyst
# still makes the reference's cost choice (pushed filter vs post-scan) per
# AQE statistics.
_DV_PRIORITIES = ("1-URGENT", "3-MEDIUM")


def dv_terms_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.filter(F.col("o_orderpriority").isin(*_DV_PRIORITIES))
        .filter((F.col("o_custkey") % 10).isin(0, 3, 7))
        .groupBy("o_orderpriority", "o_orderstatus")
        .agg(F.count("*").alias("n"))
    )


DV_TERMS_SQL = """
SELECT o_orderpriority, o_orderstatus, count(*) AS n
FROM orders
WHERE o_orderpriority IN ('1-URGENT', '3-MEDIUM')
  AND (o_custkey % 10) IN (0, 3, 7)
GROUP BY o_orderpriority, o_orderstatus
"""


# LatLonPoint nearest-neighbor (sandbox LatLonPointPrototypeQueries.nearest
# + NearestNeighbor.java): k nearest indexed points to an origin. The BKD
# best-first traversal's job is to avoid scoring every point; Spark's
# analogue is a TakeOrderedAndProject over the distance expression (per-
# partition top-k, then a k-row merge — never a global sort). Same derived
# coordinate scheme as geodist_customers.
def geo_nearest_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 180) - 90 + 0.5
    lon = (F.col("c_custkey") % 360) - 180 + 0.5
    lat0, lon0 = F.lit(40.7), F.lit(-74.0)
    dlat = F.radians(lat - lat0)
    dlon = F.radians(lon - lon0)
    a = (
        F.pow(F.sin(dlat / 2), 2)
        + F.cos(F.radians(lat0)) * F.cos(F.radians(lat)) * F.pow(F.sin(dlon / 2), 2)
    )
    dist = 2 * 6371 * F.asin(F.sqrt(a))
    top = (
        c.select("c_custkey", F.round(dist, 4).alias("dist_km"))
        .orderBy(F.col("dist_km").asc(), F.col("c_custkey").asc())
        .limit(10)
    )
    w = Window.orderBy(F.col("dist_km").asc(), F.col("c_custkey").asc())
    return top.withColumn("rank", F.row_number().over(w))


GEO_NEAREST_SQL = """
WITH pts AS (
  SELECT c_custkey,
         (c_custkey % 180) - 90 + 0.5 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer
), d AS (
  SELECT c_custkey,
         round(2 * 6371 * asin(sqrt(
           pow(sin(radians(lat - 40.7) / 2), 2) +
           cos(radians(40.7)) * cos(radians(lat)) * pow(sin(radians(lon - (-74.0)) / 2), 2)
         )), 4) AS dist_km
  FROM pts
)
SELECT c_custkey, dist_km,
       CAST(row_number() OVER (ORDER BY dist_km ASC, c_custkey ASC) AS INT) AS rank
FROM d ORDER BY dist_km ASC, c_custkey ASC LIMIT 10
"""


# Solr interval facets (solr/core/.../request/IntervalFacets.java:102,
# FacetInterval parsing at :467-615): arbitrary user intervals with
# open/closed bounds — `[0,1000)`, `(1000,5000]`, `[5000,*]` — counted in
# ONE accumulating pass over the field (the class javadoc's contract vs N
# facet.query passes). Spark-first: one scan, N conditional-count aggregates.
def parse_interval(spec: str) -> tuple[float | None, float | None, bool, bool]:
    """Solr facet.interval.set syntax -> (lo, hi, lo_open, hi_open);
    None = unbounded (`*`). Mirrors FacetInterval's bracket parsing."""
    s = spec.strip()
    if s[0] not in "([" or s[-1] not in ")]":
        raise ValueError(f"invalid interval: {spec!r}")
    lo_open, hi_open = s[0] == "(", s[-1] == ")"
    body = s[1:-1]
    parts = body.split(",")
    if len(parts) != 2:
        raise ValueError(f"invalid interval: {spec!r}")
    lo = None if parts[0].strip() == "*" else float(parts[0])
    hi = None if parts[1].strip() == "*" else float(parts[1])
    if lo is not None and hi is not None and (
        lo > hi or (lo == hi and (lo_open or hi_open))
    ):
        raise ValueError(f"empty interval: {spec!r}")
    return lo, hi, lo_open, hi_open


def _interval_pred(col, spec: str):
    lo, hi, lo_open, hi_open = parse_interval(spec)
    pred = F.lit(True)
    if lo is not None:
        pred = pred & ((col > lo) if lo_open else (col >= lo))
    if hi is not None:
        pred = pred & ((col < hi) if hi_open else (col <= hi))
    return pred


_PRICE_INTERVALS = ("[*,50000)", "[50000,150000)", "(150000,250000]", "[250000,*]")


def facet_interval_price(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    col = F.col("o_totalprice").cast("double")
    aggs = [
        F.count(F.when(_interval_pred(col, spec), 1)).alias(f"i{i}")
        for i, spec in enumerate(_PRICE_INTERVALS)
    ]
    wide = o.agg(*aggs)
    # one row per interval, labeled with the user's spec string
    pairs = F.array(*[
        F.struct(F.lit(spec).alias("interval"), F.col(f"i{i}").alias("n"))
        for i, spec in enumerate(_PRICE_INTERVALS)
    ])
    return (
        wide.select(F.explode(pairs).alias("kv"))
        .select(F.col("kv.interval").alias("interval"), F.col("kv.n").alias("n"))
    )


FACET_INTERVAL_SQL = """
WITH p AS (SELECT CAST(o_totalprice AS DOUBLE) AS v FROM orders)
SELECT '[*,50000)' AS interval, count(*) FILTER (v < 50000) AS n FROM p
UNION ALL
SELECT '[50000,150000)', count(*) FILTER (v >= 50000 AND v < 150000) FROM p
UNION ALL
SELECT '(150000,250000]', count(*) FILTER (v > 150000 AND v <= 250000) FROM p
UNION ALL
SELECT '[250000,*]', count(*) FILTER (v >= 250000) FROM p
"""


# Solr heatmap facets (solr/core/.../component/SpatialHeatmapFacets.java:41;
# backed by lucene spatial-extras HeatmapFacetCounter): counts per grid cell
# over a bounding box at a chosen grid level. One scan, floor-div bucketing,
# groupBy (row, col) — the 2-D histogram shape that survives any scale.
_HM_BOX = (-60.0, 60.0, -120.0, 120.0)  # minLat, maxLat, minLon, maxLon
_HM_ROWS, _HM_COLS = 6, 12


def facet_heatmap_customers(spark, sf_dir):
    c = _t(spark, sf_dir, "customer")
    lat = (F.col("c_custkey") % 180) - 90 + 0.5
    lon = (F.col("c_custkey") % 360) - 180 + 0.5
    min_lat, max_lat, min_lon, max_lon = _HM_BOX
    cell_h = (max_lat - min_lat) / _HM_ROWS
    cell_w = (max_lon - min_lon) / _HM_COLS
    return (
        c.select(lat.alias("lat"), lon.alias("lon"))
        .filter(
            (F.col("lat") >= min_lat) & (F.col("lat") < max_lat)
            & (F.col("lon") >= min_lon) & (F.col("lon") < max_lon)
        )
        .select(
            F.floor((F.col("lat") - min_lat) / cell_h).alias("grid_row"),
            F.floor((F.col("lon") - min_lon) / cell_w).alias("grid_col"),
        )
        .groupBy("grid_row", "grid_col")
        .agg(F.count("*").alias("n"))
    )


FACET_HEATMAP_SQL = """
WITH pts AS (
  SELECT (c_custkey % 180) - 90 + 0.5 AS lat,
         (c_custkey % 360) - 180 + 0.5 AS lon
  FROM customer
)
SELECT CAST(floor((lat - (-60.0)) / 20.0) AS BIGINT) AS grid_row,
       CAST(floor((lon - (-120.0)) / 20.0) AS BIGINT) AS grid_col,
       count(*) AS n
FROM pts
WHERE lat >= -60 AND lat < 60 AND lon >= -120 AND lon < 120
GROUP BY 1, 2
"""


# Solr date-math range filter (solr/core/.../util/DateMathParser.java via
# the `ts:[NOW/DAY-7DAYS TO NOW/DAY+1DAY]` range-query form,
# TrieDateField/DatePointField semantics: NOW frozen once per request).
# The Spark side evaluates the date-math chain with datemath.parse_datemath
# and pushes the resolved bounds down as literals (exactly how the
# reference's parsed Date enters the query as a constant — the predicate
# stays a parquet row-group pruning filter); the DuckDB oracle recomputes
# the SAME expressions independently with date_trunc + INTERVAL arithmetic,
# cross-checking the rounding/add semantics rather than sharing them.
DATEMATH_NOW = "2024-01-20T13:45:30Z"


def datemath_range_events(spark, sf_dir):
    from .datemath import parse_datemath

    now = datetime.datetime(2024, 1, 20, 13, 45, 30, tzinfo=datetime.timezone.utc)
    lo = parse_datemath("NOW/DAY-7DAYS", now=now).replace(tzinfo=None)
    hi = parse_datemath("NOW/DAY+1DAY", now=now).replace(tzinfo=None)
    e = _t(spark, sf_dir, "events")
    return (
        e.filter((F.col("ts") >= F.lit(lo)) & (F.col("ts") < F.lit(hi)))
        .groupBy("event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("total_value"))
    )


DATEMATH_RANGE_SQL = """
SELECT event_type, count(*) AS n, round(sum(value), 4) AS total_value
FROM events
WHERE ts >= date_trunc('day', TIMESTAMP '2024-01-20 13:45:30') - INTERVAL 7 DAY
  AND ts <  date_trunc('day', TIMESTAMP '2024-01-20 13:45:30') + INTERVAL 1 DAY
GROUP BY 1
"""


# CellStream / TupStream (solrj/io/stream/CellStream.java:110-143,
# TupStream.java:45-180): cell(name, stream) drains a stream and emits ONE
# tuple {name: [tuples…]}; tup(k1=v, k2=evaluator, k3=stream) emits one
# tuple of evaluated params, stream params collected as lists. In Spark the
# "one tuple carrying a list" is a single-row DataFrame with an
# array<struct> column — a bounded agg (the reference materializes the
# whole child stream in memory too, CellStream.open(), so the small-result
# contract is inherited, not invented). No shuffle beyond the child's own
# plan: collect_list runs as a partial+final agg.


def cell_stream(df: DataFrame, name: str) -> DataFrame:
    """cell(name, stream): one row, one array<struct> column named
    ``name`` holding every tuple of ``df`` (CellStream.java:123-143).
    Order within the cell follows the child's sort if any — pass a sorted
    struct key when determinism matters."""
    return df.agg(F.collect_list(F.struct(*df.columns)).alias(name))


def tup_stream(spark: SparkSession, params: dict) -> DataFrame:
    """tup(name=value, …): one tuple of evaluated params
    (TupStream.java:95-180). Values may be literals, Columns (evaluator
    params), or DataFrames (stream params — collected as array<struct>,
    the reference's list-valued entries)."""
    row = spark.range(1).select()
    for name, v in params.items():
        if isinstance(v, DataFrame):
            cell = cell_stream(v, name)
            row = row.crossJoin(F.broadcast(cell))
        elif isinstance(v, Column):
            row = row.withColumn(name, v)
        else:
            row = row.withColumn(name, F.lit(v))
    return row


def tup_cell_orders(spark, sf_dir):
    # tup(label=string param, n_urgent=count tuple, top=cell of the top-5
    # URGENT orders by price). The cell's array<struct> payload is then
    # serialized to a sorted comma-joined key list so both engines hash the
    # LIST VALUE itself (sort_array over (−price, key) structs — no global
    # window, no reliance on collect_list input order).
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    top = (
        o.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(5)
        .select((-F.col("o_totalprice")).alias("negprice"), "o_orderkey")
    )
    n = o.agg(F.count("*").alias("n_urgent"))
    out = tup_stream(spark, {"label": "urgent", "top": top})
    return out.crossJoin(F.broadcast(n)).select(
        "label",
        "n_urgent",
        F.array_join(
            F.transform(
                F.sort_array(F.col("top")),
                lambda s: s["o_orderkey"].cast("string"),
            ),
            ",",
        ).alias("top_keys"),
    )


TUP_CELL_SQL = """
SELECT 'urgent' AS label,
       (SELECT count(*) FROM orders WHERE o_orderpriority = '1-URGENT') AS n_urgent,
       (SELECT string_agg(CAST(o_orderkey AS VARCHAR), ',' ORDER BY o_totalprice DESC, o_orderkey ASC)
        FROM (SELECT o_orderkey, o_totalprice
              FROM orders WHERE o_orderpriority = '1-URGENT'
              ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 5)) AS top_keys
"""


# Solr `cardinality` stat (solr/core/src/java/org/apache/solr/search/facet/
# HLLAgg.java:36 + the stats-component hll option): HyperLogLog approximate
# distinct counting. Engine sketch builtins (approx_count_distinct) differ
# across engines, so this runs the HLL ALGORITHM itself identically on both:
# md5-based 60-bit hash (15 hex chars), m = 64 registers keyed by the top 6
# bits, register = max leading-zero rank of the low 54 bits, raw estimate
# alpha_64·m²/Σ2^(-M_j) with the small-range linear-counting correction
# (Flajolet et al. 2007, the same algorithm HLLAgg's java-hll implements).
# All register math is exact integer on both engines (the Σ2^(-M_j) sum is
# scaled by 2^55 and summed as BIGINT) so the f64 estimate is bit-identical
# — a sketch the driver can hash-gate. At 100 TB this is the point of the
# stat: registers combine map-side (max per bucket), the shuffle is ≤
# groups × 64 rows, while exact count(distinct) shuffles every value.
def stats_cardinality(spark, sf_dir):
    vals = (
        _t(spark, sf_dir, "lineitem")
        .select("l_returnflag", "l_partkey")
        .distinct()
    )
    reg = vals.select(
        "l_returnflag",
        F.conv(F.substring(F.md5(F.col("l_partkey").cast("string")), 1, 15), 16, 10)
        .cast("bigint")
        .alias("v"),
    ).select(
        "l_returnflag",
        F.expr("v div 18014398509481984").alias("bucket"),  # top 6 of 60 bits
        F.expr("v % 18014398509481984").alias("w"),  # low 54 bits
    )
    mreg = reg.groupBy("l_returnflag", "bucket").agg(
        F.max(
            F.when(F.col("w") > 0, F.lit(55) - F.length(F.expr("bin(w)"))).otherwise(
                F.lit(55)
            )
        ).alias("m")
    )
    est = mreg.groupBy("l_returnflag").agg(
        (
            F.sum(F.expr("shiftleft(1L, 55 - m)"))
            + (F.lit(64) - F.count("*")) * F.lit(2**55)
        ).alias("s"),  # Σ 2^(-M_j) scaled by 2^55, exact integer
        (F.lit(64) - F.count("*")).alias("zeros"),
    )
    raw = F.lit(0.709 * 4096.0 * float(2**55)) / F.col("s").cast("double")
    corrected = F.when(
        (raw <= F.lit(160.0)) & (F.col("zeros") > 0),
        F.lit(64.0) * F.log(F.lit(64.0) / F.col("zeros").cast("double")),
    ).otherwise(raw)
    exact = vals.groupBy("l_returnflag").agg(F.count("*").alias("card_exact"))
    return (
        est.select("l_returnflag", F.round(corrected, 4).alias("card_est"))
        .join(exact, "l_returnflag")
    )


STATS_CARDINALITY_SQL = """
WITH vals AS (SELECT DISTINCT l_returnflag, l_partkey FROM lineitem),
hx AS (SELECT l_returnflag, substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15) AS h FROM vals),
iv AS (
  SELECT l_returnflag,
    (SELECT sum(CAST(instr('0123456789abcdef', substr(h, i, 1)) - 1 AS HUGEINT)
                * (CAST(1 AS HUGEINT) << CAST(4 * (15 - i) AS INTEGER)))
     FROM unnest(range(1, 16)) AS t(i)) AS val
  FROM hx
),
reg AS (
  SELECT l_returnflag,
         CAST(val // 18014398509481984 AS BIGINT) AS bucket,
         CAST(val % 18014398509481984 AS BIGINT) AS w
  FROM iv
),
mreg AS (
  SELECT l_returnflag, bucket,
         max(CASE WHEN w > 0 THEN 55 - length(bin(w)) ELSE 55 END) AS m
  FROM reg GROUP BY l_returnflag, bucket
),
est AS (
  SELECT l_returnflag,
         sum(CAST(1 AS BIGINT) << (55 - m)) + (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS s,
         64 - count(*) AS zeros
  FROM mreg GROUP BY l_returnflag
),
ex AS (SELECT l_returnflag, CAST(count(*) AS BIGINT) AS card_exact FROM vals GROUP BY l_returnflag)
SELECT e.l_returnflag,
       round(CASE WHEN 1.0462993238608057e+20 / CAST(s AS DOUBLE) <= 160.0
                   AND zeros > 0
             THEN 64.0 * ln(64.0 / zeros)
             ELSE 1.0462993238608057e+20 / CAST(s AS DOUBLE) END, 4) AS card_est,
       ex.card_exact
FROM est e JOIN ex ON e.l_returnflag = ex.l_returnflag
"""


# BlockJoinFacetComponent (reference solr/core/src/java/org/apache/solr/
# search/join/BlockJoinFacetComponent.java:21 +
# BlockJoinFieldFacetAccumulator.java): facet counts over CHILD documents of
# matching parents, where each facet value counts a PARENT at most once no
# matter how many of its children carry the value (the "uniqueBlock"
# semantics). Spark shape: child filter → per-(value, parent) dedup inside
# the count-distinct agg — one shuffle keyed by facet value; never a
# per-parent loop.
def block_join_child_facets(spark, sf_dir):
    l = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    child = l.filter(F.col("l_quantity") >= 45)
    joined = child.join(
        o.select("o_orderkey"), child.l_orderkey == F.col("o_orderkey")
    )
    facets = []
    for fld in ("l_returnflag", "l_linestatus"):
        facets.append(
            joined.groupBy(F.col(fld).alias("value")).agg(
                F.countDistinct("o_orderkey").alias("parent_count")
            ).select(F.lit(fld).alias("field"), "value", "parent_count")
        )
    out = facets[0]
    for f in facets[1:]:
        out = out.unionAll(f)
    return out.select("field", "value", F.col("parent_count").cast("long").alias("parent_count"))


BLOCK_JOIN_FACETS_SQL = """
WITH joined AS (
  SELECT l.l_returnflag, l.l_linestatus, o.o_orderkey
  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
  WHERE l.l_quantity >= 45 AND o.o_orderstatus = 'O'
)
SELECT 'l_returnflag' AS field, l_returnflag AS value,
       CAST(count(DISTINCT o_orderkey) AS BIGINT) AS parent_count
FROM joined GROUP BY l_returnflag
UNION ALL
SELECT 'l_linestatus', l_linestatus, CAST(count(DISTINCT o_orderkey) AS BIGINT)
FROM joined GROUP BY l_linestatus
"""


# RandomStream (reference solr/solrj/src/java/org/apache/solr/client/solrj/
# io/stream/RandomStream.java:55 — the random() expression: a pseudo-random
# sample of a query's results). Solr's sample changes per call; a data
# pipeline needs the REPRODUCIBLE variant, so the randomness here is a
# seeded hash order — rank by md5(key ‖ seed), take n (the standard
# deterministic-sampling idiom; same spirit as with_segment_id's hash
# routing). One TakeOrdered, no shuffle beyond top-n.
_RANDOM_SEED = "seed42"
_RANDOM_N = 50


def random_sample_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    return (
        o.select(
            "o_orderkey",
            "o_custkey",
            F.md5(F.concat(F.col("o_orderkey").cast("string"), F.lit(_RANDOM_SEED))).alias("rnd"),
        )
        .orderBy(F.col("rnd").asc(), F.col("o_orderkey").asc())
        .limit(_RANDOM_N)
        .select("o_orderkey", "o_custkey", "rnd")
    )


RANDOM_SAMPLE_SQL = f"""
SELECT o_orderkey, o_custkey, md5(CAST(o_orderkey AS VARCHAR) || '{_RANDOM_SEED}') AS rnd
FROM orders
ORDER BY rnd ASC, o_orderkey ASC
LIMIT {_RANDOM_N}
"""


# The streaming-expression LANGUAGE end-to-end (streaming_expr.py — the
# StreamExpressionParser/StreamFactory role): a Solr user's expression
# STRING compiles onto the engine's plans. Gate exercises search q-syntax
# pushdown, rollup metrics with Solr tuple names, having(), and select
# renames in one pipeline.
def stream_expr_rollup(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    out = run_stream_expr(
        spark,
        sf_dir,
        'select(having(rollup(search(lineitem, q="l_quantity:[20 TO *] -l_returnflag:N"),'
        ' over="l_returnflag,l_linestatus", sum(l_quantity), avg(l_extendedprice), count(*)),'
        " gt(count(*), 10)),"
        ' "l_returnflag", "l_linestatus", "sum(l_quantity) as sum_qty",'
        ' "avg(l_extendedprice) as avg_price", "count(*) as n")',
    )
    return out.select(
        "l_returnflag",
        "l_linestatus",
        F.col("sum_qty").cast("double"),
        F.round("avg_price", 4).alias("avg_price"),
        F.col("n").cast("long"),
    )


STREAM_EXPR_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
       round(avg(l_extendedprice), 4) AS avg_price,
       CAST(count(*) AS BIGINT) AS n
FROM lineitem
WHERE l_quantity >= 20 AND l_returnflag <> 'N'
GROUP BY l_returnflag, l_linestatus
HAVING count(*) > 10
"""


# /sql handler (SQLHandler.java role — see sqlhandler.py): the SAME SQL
# string runs on Spark (as the engine) and on DuckDB (as the oracle) —
# dialect-neutral SELECT, the strongest possible parity statement for the
# surface.
SQL_HANDLER_STMT = """
SELECT o.o_orderstatus, c.c_mktsegment,
       CAST(count(*) AS BIGINT) AS n,
       round(sum(o.o_totalprice), 4) AS total
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
WHERE o.o_totalprice > 1000
GROUP BY o.o_orderstatus, c.c_mktsegment
HAVING count(*) > 5
"""


def sql_handler_orders(spark, sf_dir):
    from .sqlhandler import sql_handler

    return sql_handler(spark, sf_dir, SQL_HANDLER_STMT)


# ---------------------------------------------------------------------------
# Streaming-expression LANGUAGE gates, round 4: one compound stream_expr_*
# op per newly-compilable head family (Lang.java:116-330 registrations —
# intersect/complement, reduce+group, significantTerms, knn, random, let/col,
# facet2D, scoreNodes(nodes()), features, search fq/start paging). Each runs
# a Solr expression STRING through run_stream_expr and is value-gated against
# a DuckDB oracle; heads without a SQL shape (train/classify lockstep, topic,
# executor, eval, shortestPath path tuples, daemon, priority, echo/list/calc)
# are covered in tests/test_streaming_expr.py.


def stream_expr_setops(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    has = run_stream_expr(
        spark,
        sf_dir,
        'intersect(search(customer, fl="c_custkey,c_mktsegment"),'
        ' search(orders, fl="o_custkey"), on="c_custkey=o_custkey")',
    )
    hasnt = run_stream_expr(
        spark,
        sf_dir,
        'complement(search(customer, fl="c_custkey,c_mktsegment"),'
        ' search(orders, fl="o_custkey"), on="c_custkey=o_custkey")',
    )
    return has.withColumn("tag", F.lit("with")).unionByName(
        hasnt.withColumn("tag", F.lit("without"))
    )


STREAM_EXPR_SETOPS_SQL = """
SELECT c_custkey, c_mktsegment, 'with' AS tag FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders)
UNION ALL
SELECT c_custkey, c_mktsegment, 'without' AS tag FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
"""


def stream_expr_reduce_top(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    out = run_stream_expr(
        spark,
        sf_dir,
        'reduce(search(orders, q="o_totalprice:[100000 TO *]",'
        ' fl="o_custkey,o_orderkey,o_totalprice"), by="o_custkey",'
        ' group(sort="o_totalprice desc,o_orderkey asc", n=2))',
    )
    g = out.select("o_custkey", F.explode("group").alias("g"))
    return g.select(
        "o_custkey",
        F.col("g.o_orderkey").alias("o_orderkey"),
        F.col("g.o_totalprice").alias("o_totalprice"),
    )


STREAM_EXPR_REDUCE_SQL = """
SELECT o_custkey, o_orderkey, o_totalprice FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rk
  FROM orders WHERE o_totalprice >= 100000
) WHERE rk <= 2
"""


def stream_expr_significant(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    return run_stream_expr(
        spark,
        sf_dir,
        'significantTerms(documents, q="lang:en", field="text", limit=15,'
        " minDocFreq=5, maxDocFreq=0.5, minTermLength=4)",
    )


STREAM_EXPR_SIGNIFICANT_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
  FROM documents
),
tot AS (SELECT count(*) AS n FROM d),
bg AS (
  SELECT term, count(*) AS background
  FROM (SELECT doc_id, unnest(toks) AS term FROM d) GROUP BY term
),
fg AS (
  SELECT term, count(*) AS foreground
  FROM (SELECT doc_id, unnest(toks) AS term FROM d WHERE lang = 'en')
  GROUP BY term
)
SELECT term, CAST(foreground AS BIGINT) AS foreground,
       CAST(background AS BIGINT) AS background,
       round((ln(foreground) + 1.0) * (ln((n + 1.0) / (background + 1.0)) + 1.0), 4)
         AS score
FROM fg JOIN bg USING (term), tot
WHERE length(term) >= 4 AND background >= 5 AND background <= 0.5 * n
ORDER BY score DESC, term ASC
LIMIT 15
"""


def stream_expr_knn(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    return run_stream_expr(
        spark,
        sf_dir,
        'knn(documents, id=7, qf="text", k=12, mindf=3, minwl=4,'
        ' fl="doc_id,score,lang")',
    )


STREAM_EXPR_KNN_SQL = """
WITH d AS (
  SELECT doc_id, lang,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
  FROM documents
),
tok AS (
  SELECT doc_id, term
  FROM (SELECT doc_id, unnest(toks) AS term FROM d) WHERE length(term) >= 4
),
target AS (SELECT DISTINCT term FROM tok WHERE doc_id = 7),
dfreq AS (
  SELECT term, count(*) AS df FROM tok
  WHERE term IN (SELECT term FROM target)
  GROUP BY term HAVING count(*) >= 3
),
tot AS (SELECT count(*) AS n FROM d),
scored AS (
  SELECT t.doc_id,
         round(sum(ln((n + 1.0) / (df + 1.0)) + 1.0), 4) AS score
  FROM tok t JOIN dfreq USING (term), tot
  WHERE t.doc_id <> 7
  GROUP BY t.doc_id
)
SELECT s.doc_id, s.score, d2.lang
FROM scored s JOIN documents d2 ON s.doc_id = d2.doc_id
ORDER BY s.score DESC, s.doc_id ASC
LIMIT 12
"""


def stream_expr_facet2d(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    out = run_stream_expr(
        spark,
        sf_dir,
        'facet2D(orders, x="o_orderpriority", y="o_orderstatus",'
        ' dimensions="3,2", sum(o_totalprice))',
    )
    return out.select(
        "o_orderpriority",
        "o_orderstatus",
        F.round(F.col("`sum(o_totalprice)`"), 2).alias("total"),
    )


STREAM_EXPR_FACET2D_SQL = """
WITH cells AS (
  SELECT o_orderpriority, o_orderstatus, sum(o_totalprice) AS m
  FROM orders GROUP BY o_orderpriority, o_orderstatus
),
xtot AS (
  SELECT o_orderpriority FROM cells
  GROUP BY o_orderpriority ORDER BY sum(m) DESC, o_orderpriority ASC LIMIT 3
),
ranked AS (
  SELECT c.o_orderpriority, c.o_orderstatus, c.m,
         row_number() OVER (PARTITION BY c.o_orderpriority
                            ORDER BY c.m DESC, c.o_orderstatus ASC) AS rk
  FROM cells c JOIN xtot USING (o_orderpriority)
)
SELECT o_orderpriority, o_orderstatus, round(m, 2) AS total
FROM ranked WHERE rk <= 2
"""


def stream_expr_scorenodes(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    out = run_stream_expr(
        spark,
        sf_dir,
        'scoreNodes(nodes(lineitem, search(orders, q="o_totalprice:[150000 TO *]",'
        ' fl="o_orderkey"), walk="o_orderkey->l_orderkey", gather="l_partkey",'
        " count(*)))",
    )
    # the gate's column compare is case-insensitive on the oracle side only —
    # expose the reference's camelCase tuple name as lowercase here
    return out.withColumnRenamed("nodeScore", "nodescore")


STREAM_EXPR_SCORENODES_SQL = """
WITH roots AS (SELECT DISTINCT o_orderkey FROM orders WHERE o_totalprice >= 150000),
hit AS (
  SELECT l.l_partkey AS node, count(*) AS term_freq
  FROM lineitem l JOIN roots r ON l.l_orderkey = r.o_orderkey
  GROUP BY l.l_partkey
),
corpus AS (SELECT l_partkey AS node, count(*) AS doc_freq FROM lineitem GROUP BY l_partkey),
tot AS (SELECT count(*) AS n FROM lineitem)
SELECT h.node, CAST(h.term_freq AS BIGINT) AS term_freq,
       CAST(c.doc_freq AS BIGINT) AS doc_freq,
       round((ln(h.term_freq) + 1.0) * (ln((n + 1.0) / (c.doc_freq + 1.0)) + 1.0), 4)
         AS nodescore
FROM hit h JOIN corpus c USING (node), tot
"""


def stream_expr_random(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    return run_stream_expr(
        spark,
        sf_dir,
        'random(orders, q="o_orderstatus:F", rows=30, seed=r4,'
        ' fl="o_orderkey,o_custkey")',
    )


STREAM_EXPR_RANDOM_SQL = """
SELECT o_orderkey, o_custkey FROM (
  SELECT o_orderkey, o_custkey,
         md5(CAST(o_orderkey AS VARCHAR) || 'r4') AS rnd
  FROM orders WHERE o_orderstatus = 'F'
  ORDER BY rnd ASC, o_orderkey ASC LIMIT 30
)
"""


def stream_expr_let_col(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    out = run_stream_expr(
        spark,
        sf_dir,
        'let(a=search(lineitem, q="l_quantity:[48 TO *]",'
        ' fl="l_orderkey,l_linenumber,l_quantity",'
        ' sort="l_orderkey asc,l_linenumber asc"),'
        ' q=col(a, l_quantity), echo="q")',
    )
    return out.select(F.col("q").alias("quantities"))


STREAM_EXPR_LET_SQL = """
SELECT list(l_quantity ORDER BY l_orderkey, l_linenumber) AS quantities
FROM lineitem WHERE l_quantity >= 48
"""


def stream_expr_features(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    out = run_stream_expr(
        spark,
        sf_dir,
        'features(documents, field="text", outcome="lang:en", numTerms=10,'
        ' featureSet="fs1")',
    )
    return out.withColumnRenamed("featureSet_s", "featureset_s")


STREAM_EXPR_FEATURES_SQL = """
WITH d AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
  FROM documents
),
tot AS (SELECT count(*) AS n, sum(y) AS p FROM d),
dt AS (SELECT doc_id, y, unnest(toks) AS term FROM d),
counts AS (SELECT term, count(*) AS df, sum(y) AS xc FROM dt GROUP BY term),
scored AS (
  SELECT term,
    (CASE WHEN CAST(p AS DOUBLE) / n <= 0 OR CAST(p AS DOUBLE) / n >= 1 THEN 0.0
          ELSE -(CAST(p AS DOUBLE) / n) * ln(CAST(p AS DOUBLE) / n)
               - (1.0 - CAST(p AS DOUBLE) / n) * ln(1.0 - CAST(p AS DOUBLE) / n) END)
    - (CAST(df AS DOUBLE) / n) *
      (CASE WHEN CAST(xc AS DOUBLE) / CAST(df AS DOUBLE) <= 0
              OR CAST(xc AS DOUBLE) / CAST(df AS DOUBLE) >= 1 THEN 0.0
            ELSE -(CAST(xc AS DOUBLE) / CAST(df AS DOUBLE)) * ln(CAST(xc AS DOUBLE) / CAST(df AS DOUBLE))
                 - (1.0 - CAST(xc AS DOUBLE) / CAST(df AS DOUBLE)) * ln(1.0 - CAST(xc AS DOUBLE) / CAST(df AS DOUBLE)) END)
    - (1.0 - CAST(df AS DOUBLE) / n) *
      (CASE WHEN (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0) <= 0
              OR (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0) >= 1 THEN 0.0
            ELSE -((CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0)) * ln((CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0))
                 - (1.0 - (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0)) * ln(1.0 - (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0)) END)
    AS raw,
    ln((CAST(n AS DOUBLE) + 1.0) / (df + 1.0)) AS idf
  FROM counts, tot
),
top AS (
  SELECT term, round(raw, 4) AS score_f, round(idf, 6) AS idf_d
  FROM scored ORDER BY round(raw, 4) DESC, term ASC LIMIT 10
)
SELECT 'fs1' AS featureSet_s,
       CAST(row_number() OVER (ORDER BY score_f DESC, term ASC) AS INT) AS index_i,
       term AS term_s, score_f, idf_d
FROM top
"""


def stream_expr_search_page(spark, sf_dir):
    from .streaming_expr import run_stream_expr

    return run_stream_expr(
        spark,
        sf_dir,
        'search(orders, q="o_orderstatus:O", fq="o_totalprice:[50000 TO *]",'
        ' fl="o_orderkey,o_totalprice", sort="o_totalprice desc,o_orderkey asc",'
        " start=10, rows=15)",
    )


STREAM_EXPR_SEARCH_PAGE_SQL = """
SELECT o_orderkey, o_totalprice FROM orders
WHERE o_orderstatus = 'O' AND o_totalprice >= 50000
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 15 OFFSET 10
"""


def js_expression_lineitem(spark, sf_dir):
    """The lucene/expressions Javascript language over a relation
    (``JavascriptCompiler.java`` / ``Javascript.g4`` — see
    ``expressions.py``): arithmetic + ternary + function-call expression
    compiled to ONE Catalyst column (whole-stage codegen, no Python at
    row time)."""
    from .expressions import compile_expression

    li = _t(spark, sf_dir, "lineitem")
    expr = (
        "sqrt(l_quantity) + ln(l_extendedprice + 1) * "
        "(l_discount > 0.05 ? 2 : 1) + min(l_tax, 0.04)"
    )
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(compile_expression(expr), 4).alias("val"),
    )


JS_EXPRESSION_SQL = """
SELECT l_orderkey, l_linenumber,
       round(sqrt(l_quantity) + ln(l_extendedprice + 1) *
             (CASE WHEN l_discount > 0.05 THEN 2 ELSE 1 END)
             + least(l_tax, 0.04), 4) AS val
FROM lineitem
"""


RELATIONAL_EXTRA_OPS: dict[str, tuple] = {
    "js_expression_lineitem": (js_expression_lineitem, JS_EXPRESSION_SQL),
    "facet_prefix_part": (facet_prefix_part, FACET_PREFIX_SQL),
    "sql_handler_orders": (sql_handler_orders, SQL_HANDLER_STMT),
    "stream_expr_rollup": (stream_expr_rollup, STREAM_EXPR_SQL),
    "stream_expr_setops": (stream_expr_setops, STREAM_EXPR_SETOPS_SQL),
    "stream_expr_reduce_top": (stream_expr_reduce_top, STREAM_EXPR_REDUCE_SQL),
    "stream_expr_significant": (stream_expr_significant, STREAM_EXPR_SIGNIFICANT_SQL),
    "stream_expr_knn": (stream_expr_knn, STREAM_EXPR_KNN_SQL),
    "stream_expr_facet2d": (stream_expr_facet2d, STREAM_EXPR_FACET2D_SQL),
    "stream_expr_scorenodes": (stream_expr_scorenodes, STREAM_EXPR_SCORENODES_SQL),
    "stream_expr_random": (stream_expr_random, STREAM_EXPR_RANDOM_SQL),
    "stream_expr_let_col": (stream_expr_let_col, STREAM_EXPR_LET_SQL),
    "stream_expr_features": (stream_expr_features, STREAM_EXPR_FEATURES_SQL),
    "stream_expr_search_page": (stream_expr_search_page, STREAM_EXPR_SEARCH_PAGE_SQL),
    "stats_cardinality": (stats_cardinality, STATS_CARDINALITY_SQL),
    "block_join_child_facets": (block_join_child_facets, BLOCK_JOIN_FACETS_SQL),
    "random_sample_orders": (random_sample_orders, RANDOM_SAMPLE_SQL),
    "datemath_range_events": (datemath_range_events, DATEMATH_RANGE_SQL),
    "facet_daterange_events": (facet_daterange_events, FACET_DATERANGE_SQL),
    "tup_cell_orders": (tup_cell_orders, TUP_CELL_SQL),
    "multi_range_quantity": (multi_range_quantity, MULTI_RANGE_SQL),
    "facet_interval_price": (facet_interval_price, FACET_INTERVAL_SQL),
    "facet_options_orders": (facet_options_orders, FACET_OPTIONS_SQL),
    "facet_heatmap_customers": (facet_heatmap_customers, FACET_HEATMAP_SQL),
    "dv_terms_orders": (dv_terms_orders, DV_TERMS_SQL),
    "geo_nearest_customers": (geo_nearest_customers, GEO_NEAREST_SQL),
    "eval_let_lineitem": (eval_let_lineitem, EVAL_LET_SQL),
    "taxonomy_facets": (taxonomy_facets, TAXONOMY_SQL),
    "drill_sideways_orders": (drill_sideways_orders, DRILL_SIDEWAYS_SQL),
    "collapse_expand_orders": (collapse_expand_orders, COLLAPSE_EXPAND_SQL),
    "frange_lineitem": (frange_lineitem, FRANGE_SQL),
    "func_query_lineitem": (func_query_lineitem, FUNC_QUERY_SQL),
    "diversified_top_orders": (diversified_top_orders, DIVERSIFIED_SQL),
    "export_sorted_lineitem": (export_sorted_lineitem, EXPORT_SQL),
    "block_join_parents": (block_join_parents, BLOCK_JOIN_PARENTS_SQL),
    "block_join_children": (block_join_children, BLOCK_JOIN_CHILDREN_SQL),
    "facet_exclusions": (facet_exclusions, FACET_EXCLUSIONS_SQL),
    # trivial projection / cross-join reps: window slots went to the pivot
    # facet and corr/regress math expressions
    "select_revenue": (select_revenue, SELECT_SQL),
    "cartesian_part_types": (cartesian_part_types, CARTESIAN_SQL),
    "join_orders_customer": (join_orders_customer, JOIN_OC_SQL),
    "join_query_orders": (join_query_orders, JOIN_QUERY_SQL),
    "moving_avg_events": (moving_avg_events, MOVING_AVG_SQL),
    "sessionize_events": (sessionize_events, SESSIONIZE_SQL),
    # UniqueStream is DISTINCT — its semantics are fully covered by the
    # DistinctOperation inside reduce_group_orders, which took its window slot
    "unique_priority": (unique_priority, UNIQUE_SQL),
    "facet_field_mktsegment": (facet_field_mktsegment, FACET_FIELD_SQL),
    "facet_range_price": (facet_range_price, FACET_RANGE_SQL),
    "facet_query_orders": (facet_query_orders, FACET_QUERY_SQL),
    "inner_join_orders_customer": (inner_join_orders_customer, INNER_JOIN_SQL),
    "left_join_customer_orders": (left_join_customer_orders, LEFT_JOIN_SQL),
    "intersect_custkeys": (intersect_custkeys, INTERSECT_SQL),
    "complement_customers": (complement_customers, COMPLEMENT_SQL),
    "spatial_polygon": (spatial_polygon, SPATIAL_POLYGON_SQL),
    # grid-pruned polygon SET (LatLonShape.java:63 BKD role) — the oracle is
    # the unpruned any-polygon ray cast, so pruning must be invisible
    "spatial_polygon_set": (spatial_polygon_set, SPATIAL_POLYGON_SET_SQL),
    "shape_index_join": (shape_index_join, SHAPE_INDEX_JOIN_SQL),
    "shape_relate_intersects": (shape_relate_intersects, _shape_relate_sql("intersects")),
    "shape_relate_within": (shape_relate_within, _shape_relate_sql("within")),
    "shape_relate_disjoint": (shape_relate_disjoint, _shape_relate_sql("disjoint")),
    "line_relate_intersects": (line_relate_intersects, _line_relate_sql("intersects")),
    "line_relate_within": (line_relate_within, _line_relate_sql("within")),
    "json_facet_orders": (json_facet_orders, JSON_FACET_SQL),
    "relatedness_mktsegment": (relatedness_mktsegment, RELATEDNESS_SQL),
}
