"""Driver contract for the spark-graft builder (PySpark target).

entry(spark)  — flagship: build the inverted index over the sf0.001
                `documents` table and run a BM25 boolean query end-to-end.
queries()     — one callable per implemented operator (SURVEY.md §2):
                fulltext engine ops (ft_*), Solr streaming-expression
                analogues (relational), and training-data pipeline ops.
oracle_sql()  — the DuckDB-equivalent ANSI SQL for every entry, including a
                full BM25 implementation in SQL (tokenize → tf/df →
                SmallFloat norm quantization → score) for the ft_* entries.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: BM25 top-10 for a boolean
    query over the documents corpus via the inverted-index engine."""
    from lucene_solr_spark.textops import _searcher
    import pyspark.sql.functions as F

    sf_dir = "/root/testdata/sf0.001"
    s = _searcher(spark, sf_dir)
    hits = s.search("table AND hash", k=10)
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id", "lang", "source"
    )
    return (
        hits.join(docs, ["segment_id", "doc_id"])
        .select(F.col("ext_id").alias("doc_id"), "lang", "source", "score", "rank")
        .orderBy("rank")
    )


def _registries():
    from lucene_solr_spark.graph import GRAPH_OPS
    from lucene_solr_spark.multimodal import MULTIMODAL_OPS
    from lucene_solr_spark.relational import RELATIONAL_OPS
    from lucene_solr_spark.textops import FT_OPS, TRAINING_OPS

    return (FT_OPS, RELATIONAL_OPS, GRAPH_OPS, TRAINING_OPS, MULTIMODAL_OPS)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable] = {}
    for reg in _registries():
        for name, (fn, _sql) in reg.items():
            out[name] = fn
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for reg in _registries():
        for name, (_fn, sql) in reg.items():
            if sql is not None:
                out[name] = sql
    return out
