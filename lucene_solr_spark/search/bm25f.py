"""BM25F combined-field scoring — the sandbox ``BM25FQuery``.

Reference: ``lucene/sandbox/src/java/org/apache/lucene/search/BM25FQuery.java``
(+ ``MultiNormsLeafSimScorer.java``). Semantics, exactly as the reference
computes them:

- **pseudo term stats** (``BM25FWeight`` ctor, ``BM25FQuery.java:279-295``):
  ``docFreq = max`` over every (field, term) pair's df; ``totalTermFreq`` is
  the weighted sum (unused by BM25 scoring beyond a >=1 clamp).
- **pseudo collection stats** (``mergeCollectionStatistics``,
  ``BM25FQuery.java:300-316``): ``docCount = max`` over fields,
  ``sumTotalTermFreq = Σ weight_f · sumTotalTermFreq_f`` — so
  ``avgdl = Σ w_f·sttf_f / max docCount``.
- **per-doc freq** (``WeightedDisiWrapper.freq`` + ``BM25FScorer.freq``,
  ``BM25FQuery.java:404-436``): ``Σ over matching (field, term) iterators of
  weight_f · tf`` — a float, fields blended BEFORE tf saturation (this is
  what distinguishes BM25F from a dismax/sum of per-field BM25 scores).
- **combined norm** (``MultiNormsLeafSimScorer.MultiFieldNormValues
  .advanceExact``): ``SmallFloat.intToByte4(round(Σ w_f ·
  byte4ToInt(norm_f)))`` — re-quantized after the weighted sum, then decoded
  again by the BM25 norm cache.
- field weights must be ≥ 1 (``Builder.addField``, ``BM25FQuery.java:99``).

Execution shape: the reference scorer is an exhaustive disjunction — it
declares no impacts and ``isCacheable == false`` (``BM25FQuery.java:393``),
i.e. even Lucene cannot block-max-prune across blended norms. The Spark
plan mirrors that honestly: per-(field, term) postings decode (term filter
pushed to the parquet scan), a weighted union, one groupBy on the document
coordinate, a co-partitioned join against the combined-norm frame, and a
TakeOrdered top-k — no global sort, no driver collect beyond scalar stats.

Coordinate alignment contract (same as ``multifield.py``): all field
indexes must be built from the same docs frame with the same
key_cols/num_segments/segment_base so (segment_id, doc_id) match. Merges
remap coordinates, so after compaction the alignment holds only if every
field index was merged with the same source segments in the same order
(deterministic `merge_segments` over identical manifests) — merge all
fields together or none.
"""

from __future__ import annotations

import math
import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..index.read import norms_table, term_postings
from .executor import IndexSearcher

# SmallFloat.byte4ToInt as one SQL CASE (reference SmallFloat.java:161-169);
# same expression the function-query registry uses for norm(field).
def _byte4_to_int(v: str) -> str:
    return (
        f"CASE WHEN {v} < 24 THEN {v} ELSE 24 + ("
        f"CASE WHEN shiftright({v} - 24, 3) = 0 THEN ({v} - 24) & 7 "
        f"ELSE shiftleft((({v} - 24) & 7) | 8, shiftright({v} - 24, 3) - 1) "
        f"END) END"
    )


# SmallFloat.intToByte4 (reference SmallFloat.java:139-153) — the same
# formula the DuckDB oracle chain uses (textops._bm25_chain `nb`).
def _int_to_byte4(v: str) -> str:
    lg = f"(CAST(FLOOR(LOG2({v} - 24)) AS INT))"
    return (
        f"CASE WHEN {v} < 24 THEN {v} ELSE 24 + ("
        f"CASE WHEN ({v} - 24) < 8 THEN ({v} - 24) "
        f"ELSE (shiftright({v} - 24, {lg} - 3) & 7) | shiftleft({lg} - 2, 3) "
        f"END) END"
    )


class BM25FSearcher:
    """Scores terms against N coordinate-aligned per-field indexes as if
    they had been indexed into one combined pseudo-field.

    ``fields``: ``{field_name: (index_dir, weight)}``, weight ≥ 1."""

    def __init__(
        self,
        spark: SparkSession,
        fields: dict[str, tuple[str, float]],
        analyzer: str = "simple",
        precision: str = "f64",
        k1: float = 1.2,
        b: float = 0.75,
    ):
        if not fields:
            raise ValueError("at least one field required")
        for f, (_, w) in fields.items():
            if w < 1.0:
                # reference BM25FQuery.Builder.addField:99
                raise ValueError(f"field weight must be >= 1 (got {w} for {f!r})")
        self.spark = spark
        self.k1, self.b = float(k1), float(b)
        self.weights = {f: float(w) for f, (_, w) in fields.items()}
        self.searchers = {
            f: IndexSearcher(spark, d, analyzer=analyzer, precision=precision)
            for f, (d, _) in fields.items()
        }

    # -- pseudo stats (driver-side scalars: planner reads, never row data) --

    def _pseudo_stats(self, terms: list[str]) -> tuple[int, float, int]:
        """(docFreq, avgdl, docCount) per BM25FWeight/mergeCollectionStatistics.

        Collection stats come from each per-field searcher's precomputed
        live-set values (``live_stats``, resolved once at open) — no
        full-index rescans, and merged-away segments don't inflate them."""
        df_max = 0
        sttf_weighted = 0.0
        doc_count = 0
        for f, s in self.searchers.items():
            dfs = s.term_stats(set(terms))
            for d in dfs.values():
                df_max = max(df_max, int(d))
            sttf_weighted += self.weights[f] * float(s.sum_total_term_freq)
            doc_count = max(doc_count, int(s.doc_count))
        avgdl = sttf_weighted / doc_count if doc_count else 1.0
        return df_max, avgdl, doc_count

    def search(self, terms, k: int | None = 10) -> DataFrame:
        """Top-k (segment_id, doc_id, score) under BM25F blending. ``k=None``
        returns every matching document unranked (oracle mode)."""
        terms = list(terms)
        df_pseudo, avgdl, doc_count = self._pseudo_stats(terms)
        if df_pseudo == 0:
            schema = "segment_id int, doc_id bigint, score double"
            if k is not None:
                schema += ", rank int"
            return self.spark.createDataFrame([], schema)
        idf = math.log(1.0 + (doc_count - df_pseudo + 0.5) / (df_pseudo + 0.5))

        # live-set + tombstone view, like every other searcher path: the
        # index dirs are append-only (merged-away segments keep their rows)
        # and deletes are kind=3 tombstones
        from ..index.read import deleted_docs_table

        def _live(df: DataFrame, s) -> DataFrame:
            df = df.filter(F.col("segment_id").isin([int(x) for x in s.live]))
            tombs = deleted_docs_table(self.spark, s.index_dir)
            return df.join(tombs, ["segment_id", "doc_id"], "left_anti")

        # weighted per-(field, term) postings union -> blended freq
        freq_frames = []
        for f, s in self.searchers.items():
            posts = _live(term_postings(self.spark, s.index_dir, terms), s).select(
                "segment_id",
                "doc_id",
                (F.col("freq").cast("double") * F.lit(self.weights[f])).alias("wf"),
            )
            freq_frames.append(posts)
        freq = freq_frames[0]
        for fr in freq_frames[1:]:
            freq = freq.unionByName(fr)
        freq = freq.groupBy("segment_id", "doc_id").agg(F.sum("wf").alias("freq"))

        # combined norm: re-quantized weighted sum of decoded per-field norms
        norm_frames = []
        for f, s in self.searchers.items():
            dl = _live(norms_table(self.spark, s.index_dir), s).select(
                "segment_id",
                "doc_id",
                (
                    F.expr(_byte4_to_int("norm_byte")).cast("double")
                    * F.lit(self.weights[f])
                ).alias("wl"),
            )
            norm_frames.append(dl)
        norms = norm_frames[0]
        for fr in norm_frames[1:]:
            norms = norms.unionByName(fr)
        norms = (
            norms.groupBy("segment_id", "doc_id")
            .agg(F.round(F.sum("wl"), 0).cast("long").alias("cl"))
            .withColumn("nb", F.expr(_int_to_byte4("cl")))
            .withColumn("dl", F.expr(_byte4_to_int("nb")).cast("double"))
            .select("segment_id", "doc_id", "dl")
        )

        scored = freq.join(norms, ["segment_id", "doc_id"]).select(
            "segment_id",
            "doc_id",
            (
                F.lit(idf)
                * F.col("freq")
                / (
                    F.col("freq")
                    + F.lit(self.k1)
                    * (F.lit(1.0 - self.b) + F.lit(self.b) * F.col("dl") / F.lit(avgdl))
                )
            ).alias("score"),
        )
        if k is None:
            return scored
        top = scored.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        ).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        return top.withColumn("rank", F.row_number().over(w))
