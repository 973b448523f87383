"""IndexSearcher — distributed query execution over the segment index.

Reference lifecycle (SURVEY §3.2, ``search/IndexSearcher.java``):

1. rewrite the query to fixed point (:740-748)
2. resolve **global** term/collection statistics before scoring (:875-909) —
   here: a parquet-pushdown read of ``term_stats`` filtered to the query's
   terms (a few rows collected to the driver) + collection stats from the
   manifest; idf weights are shipped to executors inside the kernel closure
   (the ``broadcast()`` of a dict that fits in a packet)
3. per-segment scoring — one vectorized kernel per segment via
   ``cogroup().applyInPandas`` over (postings-by-segment, norms-by-segment),
   emitting each segment's top-k (the leaf-slice collector of
   ``IndexSearcher.java:642-675`` + ``TopScoreDocCollector``)
4. global reduce: ``orderBy(score desc, segment_id asc, doc_id asc) LIMIT k``
   — exactly ``TopDocs.merge``'s tie-break (``TopDocs.java:33-40,187-212``)
   with segment_id playing shardIndex

Scale properties: the postings read is pushed down on ``term`` (parquet
row-group min/max over the term-sorted files — the FST term-index analogue),
so a query touches O(query terms × segments) rows regardless of corpus size;
blobs for non-query terms are never read (column pruning + predicate
pushdown). The only shuffle is the tiny per-segment top-k reduce.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from . import bm25
from .kernels import QueryContext, SegmentPostings, eval_query, topk, topk_term_pruned
from .query import MatchNoneQuery, Query, TermQuery, parse_query, rewrite

RESULT_SCHEMA = "qid int, segment_id int, doc_id bigint, score double"

POSTING_COLS = [
    "segment_id",
    "term",
    "df",
    "doc_blob",
    "freq_blob",
    "pos_blob",
    "blk_last",
    "blk_maxf",
    "blk_minn",
]


class IndexSearcher:
    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        analyzer: str = "code",
        precision: str = "f32",
    ):
        """precision='f32' replicates the reference's float arithmetic
        (Lucene score parity); 'f64' computes in double (SQL-oracle mode)."""
        self.spark = spark
        self.index_dir = index_dir
        self.analyzer = analyzer
        self.f32 = precision == "f32"
        man = spark.read.parquet(os.path.join(index_dir, "manifest"))
        agg = man.agg(
            F.sum("doc_count").alias("dc"),
            F.sum("sum_len").alias("sl"),
            F.sum("max_doc").alias("md"),
        ).collect()[0]
        # CollectionStatistics (search/CollectionStatistics.java:51-54):
        # docCount = docs with >=1 token; sumTotalTermFreq = total tokens.
        self.doc_count = int(agg.dc or 0)
        self.sum_total_term_freq = int(agg.sl or 0)
        self.max_doc = int(agg.md or 0)
        if self.f32:
            self.avgdl = bm25.avgdl(self.sum_total_term_freq, max(self.doc_count, 1))
            self.cache = bm25.norm_cache(self.avgdl)
        else:
            from ..smallfloat import byte4_to_int

            self.avgdl = self.sum_total_term_freq / max(self.doc_count, 1)
            table = byte4_to_int(np.arange(256, dtype=np.uint8)).astype(np.float64)
            self.cache = 1.2 * (0.25 + 0.75 * table / self.avgdl)

    # -------------------------------------------------------------- stats --
    def term_stats(self, terms: set[str]) -> dict[str, int]:
        """Global df per term — pushdown-filtered read of the stats table
        (IndexSearcher.termStatistics, :875)."""
        if not terms:
            return {}
        ts = (
            self.spark.read.parquet(os.path.join(self.index_dir, "term_stats"))
            .filter(F.col("term").isin(*terms))
            .select("term", "df")
            .collect()
        )
        return {r.term: int(r.df) for r in ts}

    def weights_for(self, terms: set[str]) -> dict[str, float]:
        import math

        dfs = self.term_stats(terms)
        out = {}
        for t in terms:
            df = dfs.get(t, 0)
            if df == 0:
                out[t] = 0.0
            elif self.f32:
                out[t] = float(
                    bm25.term_weight(bm25.idf(np.array([df]), self.doc_count)[0])
                )
            else:
                out[t] = math.log1p((self.doc_count - df + 0.5) / (df + 0.5))
        return out

    # ------------------------------------------------------------- search --
    def search(self, query: Query | str, k: int = 10) -> DataFrame:
        return self.search_many({0: query}, k).drop("qid")

    def search_many(
        self, queries: dict[int, Query | str], k: int | None = 10
    ) -> DataFrame:
        """Run a batch of queries in ONE Spark job; returns
        (qid, segment_id, doc_id, score, rank). ``k=None`` returns ALL
        matching docs per query (no per-segment pruning, no global limit) —
        the exhaustive-collection mode used for oracle comparisons."""
        parsed: dict[int, Query] = {}
        for qid, q in queries.items():
            if isinstance(q, str):
                q = parse_query(q, self.analyzer)
            parsed[qid] = rewrite(q)
        all_terms: set[str] = set()
        for q in parsed.values():
            all_terms |= q.terms()
        weights = self.weights_for(all_terms)
        cache = self.cache
        f32 = self.f32
        live = {
            qid: q for qid, q in parsed.items() if not isinstance(q, MatchNoneQuery)
        }
        spark = self.spark
        if not live or not all_terms:
            schema = RESULT_SCHEMA if k is None else RESULT_SCHEMA + ", rank int"
            return spark.createDataFrame([], schema)

        idx_path = os.path.join(self.index_dir, "index")
        postings = (
            spark.read.parquet(idx_path)
            .filter(F.col("kind") == 0)
            .filter(F.col("term").isin(*all_terms))
            .select(*POSTING_COLS)
        )
        norms = (
            spark.read.parquet(idx_path)
            .filter(F.col("kind") == 1)
            .select("segment_id", F.col("doc_blob").alias("norms"), "max_doc")
        )

        def score_segment(key, post_pdf, norm_pdf) -> pd.DataFrame:
            if len(norm_pdf) == 0 or len(post_pdf) == 0:
                return pd.DataFrame(
                    {"qid": [], "segment_id": [], "doc_id": [], "score": []}
                ).astype({"qid": "int32", "segment_id": "int32", "doc_id": "int64", "score": "float32"})
            seg_id = int(key[0])
            norms_arr = np.frombuffer(norm_pdf["norms"].iloc[0], dtype=np.uint8)
            rows = {
                r["term"]: r
                for r in post_pdf.to_dict("records")
            }
            seg = SegmentPostings(rows, norms_arr, int(norm_pdf["max_doc"].iloc[0]))
            ctx = QueryContext(weights, cache, f32=f32)
            out_qid, out_doc, out_score = [], [], []
            for qid, q in live.items():
                if k is not None and isinstance(q, TermQuery):
                    d, s = topk_term_pruned(q.term, seg, ctx, k)
                else:
                    docs, scores = eval_query(q, seg, ctx)
                    if k is None:
                        d, s = docs, scores.astype(np.float32) if f32 else scores
                    else:
                        d, s = topk(docs, scores, k, f32)
                out_qid.append(np.full(len(d), qid, dtype=np.int32))
                out_doc.append(d)
                out_score.append(s)
            return pd.DataFrame(
                {
                    "qid": np.concatenate(out_qid) if out_qid else np.empty(0, np.int32),
                    "segment_id": np.int32(seg_id),
                    "doc_id": np.concatenate(out_doc) if out_doc else np.empty(0, np.int64),
                    "score": np.concatenate(out_score) if out_score else np.empty(0, np.float32),
                }
            )

        per_seg = (
            postings.groupBy("segment_id")
            .cogroup(norms.groupBy("segment_id"))
            .applyInPandas(score_segment, RESULT_SCHEMA)
        )
        if k is None:
            return per_seg
        # TopDocs.merge tie-break: score desc, shard (segment) asc, doc asc
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        return (
            per_seg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def fetch(self, hits: DataFrame, cols: list[str] | None = None) -> DataFrame:
        """Second phase of the distributed top-k (QueryComponent.mergeIds →
        PURPOSE_GET_FIELDS, SURVEY §3.3): join winners back to stored fields.
        The hits side is tiny → broadcast it."""
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        if cols:
            docs = docs.select("segment_id", "doc_id", *cols)
        return docs.join(F.broadcast(hits), ["segment_id", "doc_id"], "inner")
