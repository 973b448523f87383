"""Multi-field search — ``MultiFieldQueryParser`` / Solr dismax ``qf``.

The engine stores one analyzed text field per index directory (SURVEY §1.1:
typed fields are ordinary columns; analyzed text is the postings field). A
multi-field document indexes each analyzed field into its OWN index dir —
the per-field columnar layout Lucene has inside one segment. The load-bearing
invariant making cross-field scoring a cheap join: per-field indexes built
from the SAME docs frame with the same ``key_cols`` / ``num_segments`` /
``segment_base`` assign IDENTICAL (segment_id, doc_id) coordinates to every
document (segment hash and within-segment sort are functions of the keys
alone), so field scores for one document meet on an equi-join — no global
doc-id mapping table.

Combine modes:

- ``"sum"`` — ``MultiFieldQueryParser.parse`` semantics
  (``reference lucene/queryparser/src/java/org/apache/lucene/queryparser/classic/MultiFieldQueryParser.java:40-60``:
  ``(title:t1 body:t1) (title:t2 body:t2)``). For disjunctive queries the
  per-term/per-field double sum commutes, so summing WHOLE-QUERY per-field
  scores is exactly Lucene's query structure. Cross-field conjunction
  ("every MUST term in *some* field") is not expressible per-field and is
  documented out of scope — per-field AND then sum is stricter.
- ``"dismax"`` — Solr DisMaxQParser ``qf``/``tie``
  (``reference solr/core/src/java/org/apache/solr/search/DisMaxQParser.java:182-190``):
  ``max + tie·(sum − max)`` over fields. Solr applies DisMax PER TERM; this
  applies it per query — identical for single-term queries, an aggregate
  variant for multi-term ones (noted here, not hidden).

Scale shape: each per-field pass is the engine's normal one-shuffle match
job; the combine is an N-way full outer join on (segment_id, doc_id) — at
100 TB all sides share the same partitioning key, so AQE plans co-partitioned
joins, and the final top-k is a TakeOrdered, never a global sort.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, SparkSession, functions as F

from .executor import IndexSearcher


class MultiFieldSearcher:
    """Searches N per-field indexes and combines scores per document.

    ``fields``: ``{field_name: (index_dir, boost)}`` — boost is the Solr
    ``qf`` field boost (``title^2``)."""

    def __init__(
        self,
        spark: SparkSession,
        fields: dict[str, tuple[str, float]],
        analyzer: str = "code",
        precision: str = "f32",
        similarity: str = "bm25",
    ):
        if not fields:
            raise ValueError("at least one field required")
        self.spark = spark
        self.boosts = {f: float(b) for f, (_, b) in fields.items()}
        self.searchers = {
            f: IndexSearcher(
                spark, d, analyzer=analyzer, precision=precision, similarity=similarity
            )
            for f, (d, _) in fields.items()
        }

    def search(
        self,
        query,
        k: int | None = 10,
        combine: str = "sum",
        tie: float = 0.0,
    ) -> DataFrame:
        """Top-k across fields. Returns (segment_id, doc_id, score,
        per-field score columns, rank). ``k=None`` returns every matching
        doc unranked (the exhaustive mode oracle comparisons use)."""
        frames = []
        for f, s in self.searchers.items():
            hits = (
                s.search_many({0: query}, k=None)
                .drop("qid")
                .withColumnRenamed("score", f"score_{f}")
            )
            frames.append(hits)
        joined = reduce(
            lambda a, b: a.join(b, ["segment_id", "doc_id"], "full_outer"), frames
        )
        cols = [
            (F.coalesce(F.col(f"score_{f}"), F.lit(0.0)) * self.boosts[f]).alias(
                f"score_{f}"
            )
            for f in self.searchers
        ]
        joined = joined.select("segment_id", "doc_id", *cols)
        parts = [F.col(f"score_{f}") for f in self.searchers]
        total = reduce(lambda a, b: a + b, parts)
        if combine == "sum":
            score = total
        elif combine == "dismax":
            best = F.greatest(*parts) if len(parts) > 1 else parts[0]
            score = best + float(tie) * (total - best)
        else:
            raise ValueError(f"unknown combine mode {combine!r}")
        dt = "float" if all(s.f32 for s in self.searchers.values()) else "double"
        out = joined.withColumn("score", score.cast(dt))
        if k is None:
            return out
        top = out.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        ).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        # rank over ≤ k rows (TakeOrdered output) — bounded input
        return top.withColumn("rank", F.row_number().over(w))
