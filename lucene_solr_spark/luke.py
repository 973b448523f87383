"""Luke handler — index introspection (the Solr admin/luke surface).

Reference: ``solr/core/src/java/org/apache/solr/handler/admin/
LukeRequestHandler.java`` (``getIndexInfo``: numDocs / maxDoc / deletedDocs
/ indexVersion / segmentCount / current commit; per-field ``topTerms`` and
distinct-term counts via the terms enum). Here the same report reads ONLY
metadata-sized tables: the manifest (segment rows), the published
``term_stats`` generation (term dictionary with df/ttf), and the tombstone
rows' delete counts — no posting blob is ever decoded, so ``luke()`` on a
100-TB index costs a manifest scan plus one term_stats agg.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .index.merge import KIND_DELETES
from .index.manifest import (
    latest_term_stats_dir,
    list_commits,
    live_segments,
    live_stats,
    read_manifest,
)

def luke(spark: SparkSession, index_dir: str) -> dict:
    """Index overview (LukeRequestHandler.getIndexInfo role):
    ``numDocs`` (live, delete-adjusted), ``maxDoc``, ``deletedDocs``,
    ``segmentCount``, ``indexVersion`` (the latest commit id), ``commits``,
    ``numTerms``, ``sumTotalTermFreq``."""
    stats = live_stats(spark, index_dir)
    live = set(stats["live"])
    # deleted docs: union of tombstoned local ids over live segments
    idx = spark.read.parquet(os.path.join(index_dir, "index"))
    # df on a tombstone row = number of ids in its blob; rows are append-only
    # so the same id may appear twice — report the DISTINCT count like
    # liveDocs does, via the decoded table only when tombstones exist at all
    n_rows = (
        idx.filter(F.col("kind") == KIND_DELETES)
        .filter(F.col("segment_id").isin([int(s) for s in live]))
        .agg(F.sum("df"))
        .collect()[0][0]
    )
    deleted = 0
    if n_rows:
        from .index.read import deleted_docs_table

        deleted = (
            deleted_docs_table(spark, index_dir)
            .filter(F.col("segment_id").isin([int(s) for s in live]))
            .distinct()
            .count()
        )
    ts = spark.read.parquet(latest_term_stats_dir(index_dir))
    term_agg = ts.agg(
        F.count("*").alias("n_terms"), F.sum("ttf").alias("sum_ttf")
    ).collect()[0]
    commits = list_commits(spark, index_dir)
    return {
        "numDocs": stats["doc_count"] - deleted,
        "maxDoc": stats["max_doc"],
        "deletedDocs": deleted,
        "segmentCount": stats["segments"],
        "indexVersion": commits[-1] if commits else -1,
        "commits": len(commits),
        "numTerms": int(term_agg["n_terms"]),
        "sumTotalTermFreq": int(term_agg["sum_ttf"] or 0),
    }


def top_terms(spark: SparkSession, index_dir: str, n: int = 10) -> DataFrame:
    """LukeRequestHandler ``topTerms``: the n highest-docFreq terms of the
    (single) indexed field — (term, df, ttf), df desc / term asc. Reads the
    published term_stats generation only (TakeOrdered, no postings)."""
    ts = spark.read.parquet(latest_term_stats_dir(index_dir))
    return (
        ts.select("term", "df", "ttf")
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(n)
    )


def segments_info(spark: SparkSession, index_dir: str) -> DataFrame:
    """Per-segment report (the Solr admin/segments handler,
    ``SegmentsInfoRequestHandler.java``): live segments with doc counts,
    token sums, and merge lineage straight from the manifest."""
    live = live_segments(spark, index_dir)
    return (
        read_manifest(spark, index_dir)
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "max_doc", "doc_count", "sum_len", "lineage")
        .orderBy("segment_id")
    )


def analyze_field(
    text: str, analyzer: str = "code", query: str | None = None
) -> list[dict]:
    """Field-analysis introspection (``solr/core/src/java/org/apache/solr/
    handler/FieldAnalysisRequestHandler.java:60`` +
    ``AnalysisRequestHandlerBase.analyzeValue``): the per-token attribute
    listing for one field value — term text, position, start/end char
    offsets — with the handler's showMatch flag (``analysis.query`` terms
    re-analyzed through the same chain; tokens equal to a query term are
    marked ``match``).

    The engine's chains are single whole-document vectorized passes
    (``analysis.py``), so the listing reports the FINAL stage's attributes
    rather than one list per Tokenizer/TokenFilter stage — the reference's
    per-stage view decomposes a chain this engine fuses. Chains outside
    :data:`~lucene_solr_spark.analysis.OFFSET_ANALYZERS` report offsets as
    ``None`` (they have no display path). Driver-local by design:
    introspecting one value needs no cluster.
    """
    from .analysis import OFFSET_ANALYZERS, analyze_batch, analyze_batch_offsets

    if analyzer in OFFSET_ANALYZERS:
        terms, positions, _, _, _, off_s, off_e = analyze_batch_offsets(
            [text], analyzer
        )
        offs = [(int(s), int(e)) for s, e in zip(off_s, off_e)]
    else:
        terms, positions, _, _, _ = analyze_batch([text], analyzer)
        offs = [(None, None)] * len(terms)
    match_terms: set = set()
    if query is not None:
        qt = analyze_batch([query], analyzer)[0]
        match_terms = {str(t) for t in qt}
    return [
        {
            "term": str(t),
            "position": int(p),
            "start_offset": offs[i][0],
            "end_offset": offs[i][1],
            "match": str(t) in match_terms,
        }
        for i, (t, p) in enumerate(zip(terms, positions))
    ]
