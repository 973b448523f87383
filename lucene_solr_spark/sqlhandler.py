"""Parallel SQL — the Solr ``/sql`` handler role.

Reference: ``solr/core/src/java/org/apache/solr/handler/SQLHandler.java``
(Calcite planner compiling SELECT statements onto streaming expressions —
``solr/solrj/.../io/sql`` is the JDBC client side). Collections are tables;
only SELECT is accepted; aggregations/facets become rollup/facet streams.

Here the planner IS Spark SQL/Catalyst — strictly more capable than the
reference's Calcite subset — so the handler reduces to: register every
test-corpus collection as a temp view bound to its parquet (once per
(session, sf_dir)), guard the statement to read-only SELECT/WITH exactly
like SQLHandler rejects DML, and hand the text to ``spark.sql``. Pushdown,
join planning and partial aggregation come from Catalyst, which is the
point of the whole engine.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

def register_collections(spark: SparkSession, sf_dir: str) -> None:
    """Bind each collection name to its parquet as a temp view — always
    re-registered (createOrReplaceTempView is a catalog-only operation;
    temp views are session-scoped, so any cache keyed off the session
    object's identity would go stale when sessions are recycled)."""
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            spark.read.parquet(p).createOrReplaceTempView(t)


def sql_handler(spark: SparkSession, sf_dir: str, stmt: str) -> DataFrame:
    """Run one read-only SQL statement over the collections
    (``SQLHandler`` contract: SELECT only, anything else is rejected)."""
    head = re.match(r"\s*(\w+)", stmt)
    if not head or head.group(1).upper() not in ("SELECT", "WITH"):
        raise ValueError(
            f"/sql accepts SELECT statements only, got {head.group(1) if head else stmt!r}"
        )
    register_collections(spark, sf_dir)
    return spark.sql(stmt)
