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

from ..index.manifest import live_stats
from ..index.read import sql_in
from . import bm25
from .kernels import (
    UNPRUNABLE_SIMS,
    QueryContext,
    SegmentPostings,
    eval_query,
    first_k_matches,
    topk,
    topk_and_pruned,
    topk_or_pruned,
    topk_term_pruned,
)
from .query import (
    CONSTANT_SCORE,
    MAX_CLAUSE_COUNT,
    SCORING_BOOLEAN,
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MultiTermQuery,
    PhraseQuery,
    PointRangeQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
    rewrite,
)


def _contains_point_range(q: Query) -> bool:
    if isinstance(q, PointRangeQuery):
        return True
    inner = getattr(q, "inner", None)
    if inner is not None:
        return _contains_point_range(inner)
    if isinstance(q, BooleanQuery):
        return any(
            _contains_point_range(c)
            for c in (*q.must, *q.should, *q.filter, *q.must_not)
        )
    if isinstance(q, DisjunctionMaxQuery):
        return any(_contains_point_range(d) for d in q.disjuncts)
    return False


def _payload_terms(q: Query) -> set[str]:
    """Terms whose PAYLOADS the query needs (PayloadScoreQuery leaves) —
    the pay blobs of every other term stay unshipped, like positions."""
    from .query import PayloadScoreQuery, SpanPayloadCheckQuery

    if isinstance(q, (PayloadScoreQuery, SpanPayloadCheckQuery)):
        return {q.term}
    out: set[str] = set()
    inner = getattr(q, "inner", None)
    if inner is not None:
        out |= _payload_terms(inner)
    for attr in ("must", "should", "filter", "must_not", "disjuncts"):
        for c in getattr(q, attr, ()):
            if not isinstance(c, str):
                out |= _payload_terms(c)
    return out


def _position_terms(q: Query) -> set[str]:
    """Terms whose POSITIONS the query needs (phrase matching). Everything
    else only needs docs+freqs — their (large) position blobs are never
    shuffled or shipped to the kernel."""
    from .query import (
        MultiPhraseQuery,
        PhraseQuery,
        SloppyPhraseQuery,
        SpanFirstQuery,
        SpanNearQuery,
        SpanNotQuery,
        SpanOrQuery,
        SpanPositionRangeQuery,
        SpanTermQuery,
        TermAutomatonQuery,
    )

    from .intervals import IntervalQuery

    if isinstance(q, (PhraseQuery, SloppyPhraseQuery)):
        return set(q.phrase_terms)
    if isinstance(
        q,
        (
            SpanNearQuery,
            SpanTermQuery,
            SpanOrQuery,
            SpanNotQuery,
            SpanFirstQuery,
            SpanPositionRangeQuery,
            IntervalQuery,
            TermAutomatonQuery,
        ),
    ):
        return q.terms()
    if isinstance(q, MultiPhraseQuery):
        return {t for slot in q.slots for t in slot}
    if isinstance(q, BooleanQuery):
        out: set[str] = set()
        for c in (*q.must, *q.should, *q.must_not, *q.filter):
            out |= _position_terms(c)
        return out
    if isinstance(q, DisjunctionMaxQuery):
        out = set()
        for d in q.disjuncts:
            out |= _position_terms(d)
        return out
    if isinstance(q, (ConstantScoreQuery, BoostQuery)):
        return _position_terms(q.inner)
    return set()


def _pure_or_terms(q: Query) -> list[str] | None:
    """Terms of a pure term-disjunction (WAND-eligible, the TOP_SCORES
    disjunction dispatch of ``Boolean2ScorerSupplier.java:100-206``)."""
    if (
        isinstance(q, BooleanQuery)
        and not q.must
        and not q.must_not
        and not q.filter
        and q.min_should_match <= 1
        and all(isinstance(c, TermQuery) for c in q.should)
    ):
        return [c.term for c in q.should]
    return None


def _pure_and_terms(q: Query) -> list[str] | None:
    """Terms of a pure term-conjunction (BlockMaxConjunction-eligible)."""
    if (
        isinstance(q, BooleanQuery)
        and not q.should
        and not q.must_not
        and not q.filter
        and all(isinstance(c, TermQuery) for c in q.must)
    ):
        return [c.term for c in q.must]
    return None

RESULT_SCHEMA = "qid int, segment_id int, doc_id bigint, score double"

POSTING_COLS = [
    "segment_id",
    "shard",
    "term",
    "df",
    "doc_blob",
    "freq_blob",
    "pos_blob",
    "blk_last",
    "blk_maxf",
    "blk_minn",
    "blk_len",
    "blk_doc_boff",
    "blk_freq_boff",
    "blk_pos_boff",
]


class LRUQueryResultCache:
    """``LRUQueryCache`` + ``UsageTrackingQueryCachingPolicy`` role
    (``search/LRUQueryCache.java:68``, ``UsageTrackingQueryCachingPolicy.java:36``)
    adapted to the distributed engine: in Lucene the reusable per-reader
    artifact is a filter's DocIdSet; here per-segment evaluation happens
    inside one Spark job, so the reusable artifact across requests is the
    reduced top-k result (≤ k rows). Entries are scoped to one searcher's
    commit-point snapshot — reader-core semantics: a new searcher (NRT
    refresh) starts a fresh cache, so no invalidation logic is needed.
    Admission mirrors the usage-tracking policy: a query must be seen at
    least ``min_frequency`` times in the recent-history ring before its
    result is materialized and cached (one-off queries never pay the
    collect)."""

    def __init__(self, max_entries: int = 256, history: int = 256, min_frequency: int = 2):
        from collections import Counter, OrderedDict, deque

        self.max_entries = max_entries
        self.min_frequency = min_frequency
        self._entries: "OrderedDict" = OrderedDict()
        self._history: "deque" = deque(maxlen=history)
        self._counts: "Counter" = Counter()  # O(1) frequency beside the ring
        self.hit_count = 0
        self.miss_count = 0

    def seen(self, key) -> bool:
        """Record a sighting; True once the key is frequent enough to cache."""
        if len(self._history) == self._history.maxlen:
            old = self._history[0]
            self._counts[old] -= 1
            if self._counts[old] <= 0:
                del self._counts[old]
        self._history.append(key)
        self._counts[key] += 1
        return self._counts[key] >= self.min_frequency

    def get(self, key):
        e = self._entries.get(key)
        if e is None:
            self.miss_count += 1
            return None
        self._entries.move_to_end(key)
        self.hit_count += 1
        return e

    def put(self, key, value) -> None:
        self._entries[key] = value
        self._entries.move_to_end(key)
        while len(self._entries) > self.max_entries:
            self._entries.popitem(last=False)


class IndexSearcher:
    LMD_MU = 2000.0  # LMDirichletSimilarity default µ (:54)
    AX2_K = 0.35  # AxiomaticF2EXP default k (Axiomatic.java:100)
    # SweetSpotSimilarity lengthNorm plateau (the class javadoc's worked
    # example; defaults ln_min=ln_max=1 would degenerate to classic)
    SS_MIN, SS_MAX, SS_STEEP = 3, 12, 0.5

    def __init__(
        self,
        spark: SparkSession,
        index_dir: str,
        analyzer: str = "code",
        precision: str = "f32",
        similarity: str = "bm25",
        commit: int | None = None,
        parser: str = "benchmark",
        ax3_query_len: int = 1,
    ):
        """precision='f32' replicates the reference's float arithmetic
        (Lucene score parity); 'f64' computes in double (SQL-oracle mode).
        ``similarity``: 'bm25' (default), 'classic' (TFIDFSimilarity),
        'lmd' (LMDirichletSimilarity, µ=2000), 'lmjm'
        (LMJelinekMercerSimilarity, λ=0.1), 'inl2' (DFRSimilarity with
        I(n)/L/H2, c=1), 'dfi' (DFISimilarity, IndependenceStandardized),
        'ibll' (IBSimilarity with DistributionLL/LambdaDF/H2), 'ax2exp'
        (AxiomaticF2EXP, s=0.25/k=0.35), 'gl2'/'ifl2'/'inel2' (DFR basic
        models G / I(F) / I(ne) with AfterEffectL + NormalizationH2, c=1)
        'ax1log' (AxiomaticF1LOG, s=0.25), 'ax2log' (AxiomaticF2LOG,
        s=0.25, idf=ln((N+1)/df) over the F2 tfln), 'ax3exp'/'ax3log'
        (AxiomaticF3EXP/F3LOG — score = max(0, (1+ln(1+ln(tf+1)))·idf − γ),
        γ = (dl−queryLen)·s·queryLen/avgdl with queryLen from
        ``ax3_query_len``, Lucene's explicit constructor parameter,
        default 1 per ``Axiomatic.java:99-101``), or 'sweetspot'
        (lucene/misc SweetSpotSimilarity: classic idf · sqrt(tf) · plateau
        lengthNorm, min=3/max=12/steepness=0.5) — SURVEY §2.7;
        all share the (freq, norm_byte) scoring seam. Every model except
        sweetspot is monotone ↑freq / ↓length and keeps the block-max
        pruning bounds admissible unchanged; sweetspot's length plateau is
        non-monotone, so it is in ``kernels.UNPRUNABLE_SIMS`` and always
        evaluates exhaustively (k-bounded results still equal the
        exhaustive top-k).

        ``commit``: open a PAST commit point (a segment id from
        ``manifest.list_commits``) — the ``DirectoryReader.open(IndexCommit)``
        analogue. Matching AND scoring are exact as of that commit: the
        live set is resolved over the manifest id-prefix, and term
        statistics are resolved on demand from the posting rows of that
        live set (the published term_stats generation describes the LATEST
        commit, so time-traveled opens bypass it). Deletes ARE versioned
        (per-commit liveDocs): each tombstone carries the commit watermark
        at delete time, and a time-traveled open applies only tombstones
        with watermark < commit — a doc deleted after commit N is still
        returned by ``IndexSearcher(commit=N)``. The live view (commit=None)
        applies every tombstone, like an NRT reader seeing buffered
        deletes.

        ``parser``: 'benchmark' (default — the flat AND/OR/+/-/"…"~N syntax
        the driver queries use) or 'classic' (the full lucene/queryparser
        classic grammar: parens, boosts, inline fuzzy/wildcard/range,
        field prefixes — ``search/queryparser.py``)."""
        self.spark = spark
        self.index_dir = index_dir
        self.analyzer = analyzer
        self.parser = parser
        self.sim = similarity
        self.f32 = precision == "f32"
        self.commit = commit
        # snapshot the commit point: live segments only (DirectoryReader open)
        st = live_stats(spark, index_dir, as_of=commit)
        self.live = st["live"]
        # CollectionStatistics (search/CollectionStatistics.java:51-54):
        # docCount = docs with >=1 token; sumTotalTermFreq = total tokens.
        self.doc_count = st["doc_count"]
        self.sum_total_term_freq = st["sum_total_term_freq"]
        self.max_doc = st["max_doc"]
        from ..smallfloat import byte4_to_int

        table = byte4_to_int(np.arange(256, dtype=np.uint8)).astype(np.float64)
        # non-BM25 caches come from the single bm25.py formula seam (f64);
        # parity mode round-trips them through float32
        if self.sim in (
            "classic", "lmd", "lmjm", "inl2", "dfi", "ibll", "ax2exp",
            "gl2", "ifl2", "inel2", "ax1log", "ax2log", "sweetspot",
            "ax3exp", "ax3log",
        ):
            self.avgdl = self.sum_total_term_freq / max(self.doc_count, 1)
            c = {
                "classic": bm25.classic_norm_cache,
                "sweetspot": lambda: bm25.sweetspot_norm_cache(
                    self.SS_MIN, self.SS_MAX, self.SS_STEEP
                ),
                "lmd": lambda: bm25.lmd_norm_cache(self.LMD_MU),
                "lmjm": bm25.lmjm_norm_cache,
                "inl2": lambda: bm25.inl2_norm_cache(self.avgdl),
                "dfi": bm25.raw_len_cache,
                "ibll": lambda: bm25.inl2_norm_cache(self.avgdl),
                # ax2exp reuses the default w·f/(f+norm) kernel branch with
                # the F2EXP denominator as the norm table
                "ax2exp": lambda: bm25.ax2exp_norm_cache(self.avgdl),
                # F2LOG shares F2EXP's tfln denominator table; only the
                # idf differs (AxiomaticF2LOG.java:69-79)
                "ax2log": lambda: bm25.ax2exp_norm_cache(self.avgdl),
                # the H2 tfn table serves every DFR basic model (the model
                # only changes the per-term scalar weight)
                "gl2": lambda: bm25.inl2_norm_cache(self.avgdl),
                "ifl2": lambda: bm25.inl2_norm_cache(self.avgdl),
                "inel2": lambda: bm25.inl2_norm_cache(self.avgdl),
                "ax1log": lambda: bm25.axf1_norm_cache(self.avgdl),
                # F3's norm table is the gamma SUBTRACTED by the kernel
                "ax3exp": lambda: bm25.ax3_gamma_cache(self.avgdl, ax3_query_len),
                "ax3log": lambda: bm25.ax3_gamma_cache(self.avgdl, ax3_query_len),
            }[self.sim]()
            self.cache = c.astype(np.float32).astype(np.float64) if self.f32 else c
        elif self.f32:
            self.avgdl = bm25.avgdl(self.sum_total_term_freq, max(self.doc_count, 1))
            self.cache = bm25.norm_cache(self.avgdl)
        else:
            self.avgdl = self.sum_total_term_freq / max(self.doc_count, 1)
            self.cache = 1.2 * (0.25 + 0.75 * table / self.avgdl)
        # memoized global term stats (the reference caches resolved TermStates
        # per reader too — TermStates.build once per query term per reader);
        # repeated query terms never re-hit the stats table
        self._stats_cache: dict[str, int] = {}
        self._ttf_cache: dict[str, int] = {}
        # one-time DataFrame handles: parquet file listing + schema resolution
        # happen once per searcher, not once per query. term_stats binds to
        # the LATEST GENERATION at open (manifest.latest_term_stats_dir):
        # rebuilds publish new gen= dirs and never touch this one, so the
        # handle stays valid for the searcher's lifetime (snapshot isolation,
        # SearcherManager semantics).
        from ..index.manifest import latest_term_stats_dir

        idx_path = os.path.join(index_dir, "index")
        self._postings_df = spark.read.parquet(idx_path)
        self._term_stats_df = spark.read.parquet(latest_term_stats_dir(index_dir))
        # top-k result cache, scoped to this searcher's snapshot
        self.query_cache = LRUQueryResultCache()

    # -------------------------------------------------------------- stats --
    def term_stats(self, terms: set[str]) -> dict[str, int]:
        """Global df per term — pushdown-filtered read of the stats table
        (IndexSearcher.termStatistics, :875), memoized per searcher.
        (ttf rides the same probe, cached in _ttf_cache for LMD weights.)"""
        if not terms:
            return {}
        missing = [t for t in terms if t not in self._stats_cache]
        if missing:
            if self.commit is not None:
                # time-traveled open: the published term_stats generation
                # describes the LATEST commit — aggregate this commit's df/ttf
                # straight from the live posting rows (term-pushdown point
                # read; query terms only, so the scan is tiny)
                ts = (
                    self._postings_df
                    .filter((F.col("kind") == 0) & F.col("segment_id").isin(self.live))
                    .filter(sql_in("term", missing))
                    .groupBy("term")
                    .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
                    .collect()
                )
            else:
                ts = (
                    self._term_stats_df.filter(sql_in("term", missing))
                    .select("term", "df", "ttf")
                    .collect()
                )
            found = {r.term: (int(r.df), int(r.ttf)) for r in ts}
            for t in missing:
                df, ttf = found.get(t, (0, 0))
                self._stats_cache[t] = df
                self._ttf_cache[t] = ttf
        return {t: self._stats_cache[t] for t in terms if self._stats_cache[t] > 0}

    def weights_for(self, terms: set[str]) -> dict[str, float]:
        import math

        dfs = self.term_stats(terms)
        out = {}
        for t in terms:
            df = dfs.get(t, 0)
            if df == 0:
                out[t] = 0.0
            elif self.sim in ("classic", "sweetspot"):
                # SweetSpotSimilarity extends ClassicSimilarity — same idf
                out[t] = float(bm25.classic_idf(np.array([df]), self.doc_count)[0])
            elif self.sim == "lmd":
                # weight = µ · p(t|C); the kernel computes ln(1 + freq/weight)
                out[t] = self.LMD_MU * self._ttf_cache[t] / max(
                    self.sum_total_term_freq, 1
                )
            elif self.sim == "lmjm":
                # weight = p(t|C); kernel: ln(1 + (1-λ)/λ · freq/dl / weight)
                out[t] = self._ttf_cache[t] / max(self.sum_total_term_freq, 1)
            elif self.sim == "inl2":
                # BasicModelIn: log2((N+1)/(n+0.5))
                out[t] = float(np.log2((self.doc_count + 1) / (df + 0.5)))
            elif self.sim == "dfi":
                # weight = (F+1)/(T+1); kernel: expected = weight · docLen
                # (DFISimilarity.java:57)
                out[t] = (self._ttf_cache[t] + 1.0) / (
                    self.sum_total_term_freq + 1.0
                )
            elif self.sim == "ibll":
                # weight = λ = (n+1)/(N+1) (LambdaDF.java:32-38)
                out[t] = (df + 1.0) / (self.doc_count + 1.0)
            elif self.sim in ("ax2exp", "ax3exp"):
                # idf = ((N+1)/df)^k, k=0.35 (AxiomaticF2EXP.java:99-101,
                # AxiomaticF3EXP.java:100-103)
                out[t] = float(((self.doc_count + 1.0) / df) ** self.AX2_K)
            elif self.sim == "gl2":
                # λ = (F+1)/(N+F+1) (BasicModelG.java:36-39); the kernel
                # derives A/B from λ
                F_ = self._ttf_cache[t]
                out[t] = (F_ + 1.0) / (self.doc_count + F_ + 1.0)
            elif self.sim == "ifl2":
                # A = log2(1 + (N+1)/(F+0.5)) (BasicModelIF.java:34-44)
                out[t] = float(
                    np.log2(1.0 + (self.doc_count + 1.0) / (self._ttf_cache[t] + 0.5))
                )
            elif self.sim == "inel2":
                # ne = N·(1−((N−1)/N)^F); A = log2((N+1)/(ne+0.5))
                # (BasicModelIne.java:34-44)
                N = float(self.doc_count)
                ne = N * (1.0 - ((N - 1.0) / N) ** self._ttf_cache[t])
                out[t] = float(np.log2((N + 1.0) / (ne + 0.5)))
            elif self.sim in ("ax1log", "ax2log", "ax3log"):
                # idf = ln((N+1)/df) (AxiomaticF1LOG.java:79-80,
                # AxiomaticF2LOG.java:77-79, AxiomaticF3LOG.java:90-93)
                out[t] = float(np.log((self.doc_count + 1.0) / df))
            elif self.f32:
                out[t] = float(
                    bm25.term_weight(bm25.idf(np.array([df]), self.doc_count)[0])
                )
            else:
                out[t] = math.log1p((self.doc_count - df + 0.5) / (df + 0.5))
        return out

    # ------------------------------------------- multi-term expansion ------
    def _terms_df(self):
        if self.commit is not None:
            # time-traveled open: expand against THIS commit's dictionary —
            # the latest term_stats gen would rank top_terms rewrites by
            # post-commit dfs and admit terms born after the commit
            return (
                self._postings_df
                .filter((F.col("kind") == 0) & F.col("segment_id").isin(self.live))
                .groupBy("term")
                .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
            )
        return self._term_stats_df

    def matching_terms(self, q: MultiTermQuery, cap: int = 65536) -> list[str]:
        """Expand a MultiTermQuery against the term dictionary
        (``MultiTermQuery.java:66`` — automaton ∩ terms enum). Here: a
        pushdown-friendly Catalyst predicate over the term-sorted stats table
        (prefix/range filters reach the parquet row-group stats; regex/edit
        distance evaluates after the pushdown narrows the scan)."""
        t = self._terms_df()
        c = F.col("term")
        if isinstance(q, PrefixQuery):
            t = t.filter(c.startswith(q.prefix))
        elif isinstance(q, WildcardQuery):
            lit_prefix = q.pattern.split("*", 1)[0].split("?", 1)[0]
            if lit_prefix:
                t = t.filter(c.startswith(lit_prefix))
            sql_like = q.pattern.replace("%", r"\%").replace("_", r"\_")
            sql_like = sql_like.replace("*", "%").replace("?", "_")
            t = t.filter(c.like(sql_like))
        elif isinstance(q, RegexpQuery):
            t = t.filter(c.rlike(f"^(?:{q.pattern})$"))
        elif isinstance(q, FuzzyQuery):
            if q.prefix_len:
                t = t.filter(c.startswith(q.term[: q.prefix_len]))
            band = q.max_edits
            t = t.filter(
                (F.length(c) >= len(q.term) - band)
                & (F.length(c) <= len(q.term) + band)
                & (F.levenshtein(c, F.lit(q.term)) <= band)
            )
        elif isinstance(q, TermRangeQuery):
            if q.lower is not None:
                t = t.filter(c >= q.lower if q.include_lower else c > q.lower)
            if q.upper is not None:
                t = t.filter(c <= q.upper if q.include_upper else c < q.upper)
        else:
            raise TypeError(f"not a MultiTermQuery: {type(q)}")
        rows = t.select("term", "df").limit(cap + 1).collect()
        if len(rows) > cap:
            raise ValueError(f"multi-term expansion exceeds cap {cap}")
        # deterministic order: df desc then term asc (top-terms rewrite order)
        rows.sort(key=lambda r: (-int(r.df), r.term))
        return [r.term for r in rows]

    def expand(self, q: Query) -> Query:
        """Plan-time rewrite of MultiTermQuerys to concrete term queries —
        the reference's rewrite dispatch (``MultiTermQuery.java:68,94``,
        ``TopTermsRewrite.java``)."""
        if isinstance(q, MultiTermQuery):
            method = q.rewrite_method
            top_n = None
            if method.startswith("top_terms_"):
                top_n = int(method.rsplit("_", 1)[1])
            terms = self.matching_terms(q)
            if not terms:
                return MatchNoneQuery()
            if top_n is not None:
                terms = terms[:top_n]
                method = SCORING_BOOLEAN
            if method == SCORING_BOOLEAN:
                if len(terms) > MAX_CLAUSE_COUNT:
                    raise ValueError(
                        f"maxClauseCount exceeded: {len(terms)} > {MAX_CLAUSE_COUNT}"
                    )
                return BooleanQuery(should=tuple(TermQuery(t) for t in terms))
            return ConstantScoreQuery(
                BooleanQuery(should=tuple(TermQuery(t) for t in terms))
            )
        if isinstance(q, TermInSetQuery):
            present = set(self.term_stats(set(q.set_terms)))
            if not present:
                return MatchNoneQuery()
            return ConstantScoreQuery(
                BooleanQuery(should=tuple(TermQuery(t) for t in sorted(present)))
            )
        if isinstance(q, BooleanQuery):
            return BooleanQuery(
                tuple(self.expand(c) for c in q.must),
                tuple(self.expand(c) for c in q.should),
                tuple(self.expand(c) for c in q.must_not),
                tuple(self.expand(c) for c in q.filter),
                q.min_should_match,
            )
        if isinstance(q, DisjunctionMaxQuery):
            return DisjunctionMaxQuery(
                tuple(self.expand(d) for d in q.disjuncts), q.tiebreak
            )
        if isinstance(q, ConstantScoreQuery):
            return ConstantScoreQuery(self.expand(q.inner), q.boost)
        if isinstance(q, BoostQuery):
            return BoostQuery(self.expand(q.inner), q.boost)
        return q

    # ------------------------------------------------------------- search --
    def search(self, query: Query | str, k: int = 10) -> DataFrame:
        """Single-query search through the LRU result cache: a query seen
        ``min_frequency`` times on this searcher has its ≤ k-row result
        materialized once and replayed as a local DataFrame on every repeat
        (LRUQueryCache.doCache wrapping)."""
        cache = self.query_cache
        key = (query, k)
        if cache is not None and k is not None:
            hit = cache.get(key)
            if hit is not None:
                rows, schema = hit
                return self.spark.createDataFrame(rows, schema=schema)
            if cache.seen(key):
                df = self.search_many({0: query}, k).drop("qid")
                rows, schema = df.collect(), df.schema
                cache.put(key, (rows, schema))
                return self.spark.createDataFrame(rows, schema=schema)
        return self.search_many({0: query}, k).drop("qid")

    def search_many(
        self,
        queries: dict[int, Query | str],
        k: int | None = 10,
        after: tuple | None = None,
        scoring: bool = True,
        first_k: bool = False,
        reverse: bool = False,
    ) -> DataFrame:
        """Run a batch of queries in ONE Spark job; returns
        (qid, segment_id, doc_id, score, rank). ``k=None`` returns ALL
        matching docs per query (no per-segment pruning, no global limit) —
        the exhaustive-collection mode used for oracle comparisons.

        ``after=(score, segment_id, doc_id)`` pushes a searchAfter cursor
        INTO the per-segment collectors (``PagingTopScoreDocCollector``
        semantics): each segment filters hits to strictly-after the cursor in
        the (score desc, segment asc, doc asc) total order and emits only its
        top-k of those — so deep paging ships k rows per segment instead of
        every match.

        ``first_k=True`` (used by :meth:`search_sorted`): collect each
        segment's first (or, with ``reverse``, last) k matching docIDs in
        LOCAL DOC ORDER without scoring (``first_k_matches`` early
        termination) and return them unranked (score=0) — the caller joins
        sort-field values and runs the global TakeOrdered merge."""
        parsed: dict[int, Query] = {}
        for qid, q in queries.items():
            if isinstance(q, str):
                if q.startswith("{!"):
                    # Solr local-params prefix: only types that stay a Query
                    # string here — {!lucene df=..} / v= body override
                    # (QueryParsing.parseLocalParams); frame-level types
                    # (func/frange/boost/rerank) dispatch via local_query
                    from .localparams import parse_local_params

                    typ, _lp, q = parse_local_params(q)
                    if typ != "lucene":
                        raise ValueError(
                            f"{{!{typ}}} needs localparams.local_query "
                            "(frame/score context)"
                        )
                    if _lp:
                        # one field per index dir; silently searching the
                        # wrong field would be worse than refusing
                        raise ValueError(
                            "unsupported {!lucene} local params: "
                            + ", ".join(sorted(_lp))
                        )
                if self.parser == "classic":
                    from .queryparser import parse_classic

                    q = parse_classic(q, self.analyzer)
                else:
                    q = parse_query(q, self.analyzer)
            parsed[qid] = rewrite(self.expand(rewrite(q)))
        # point-range queries route around the postings kernels: their doc
        # set comes from a pushed-down docs-table scan, joined against the
        # exhaustively-scored text side (IndexOrDocValuesQuery verify shape)
        pr_qids = {
            qid: q for qid, q in parsed.items() if _contains_point_range(q)
        }
        if pr_qids:
            if after is not None or first_k:
                raise ValueError(
                    "PointRangeQuery does not support searchAfter/first_k"
                )
            parts = [
                self._search_point_range(qid, q, k, scoring=scoring)
                for qid, q in pr_qids.items()
            ]
            rest = {qid: q for qid, q in parsed.items() if qid not in pr_qids}
            if rest:
                parts.append(
                    self.search_many(rest, k=k, scoring=scoring)
                )
            out = parts[0]
            for p in parts[1:]:
                out = out.unionByName(p)
            return out
        all_terms: set[str] = set()
        for q in parsed.values():
            all_terms |= q.terms()
        weights = self.weights_for(all_terms)
        dfs = self.term_stats(all_terms)
        # snapshot AFTER weights_for/term_stats populated the cache — the
        # ttf-based DFR models need per-term F for synonym pseudo-terms
        ttfs = {t: self._ttf_cache.get(t, 0) for t in all_terms}
        doc_count = self.doc_count
        total_tokens = self.sum_total_term_freq
        cache = self.cache
        f32 = self.f32
        sim = self.sim
        # non-monotone-in-length similarities bypass the pruned kernels
        # (their (max_freq, min_norm) block bounds are inadmissible)
        prunable = sim not in UNPRUNABLE_SIMS
        live = {
            qid: q for qid, q in parsed.items() if not isinstance(q, MatchNoneQuery)
        }
        spark = self.spark
        def _has_matchall(q) -> bool:
            # recurse wrappers AND compound clauses: a MatchAll inside a
            # BooleanQuery (e.g. "+*:* -zzz") must keep segments whose
            # postings side is empty from short-circuiting to no-hits
            if isinstance(q, MatchAllQuery):
                return True
            inner = getattr(q, "inner", None)
            if inner is not None and _has_matchall(inner):
                return True
            if isinstance(q, BooleanQuery):
                return any(
                    _has_matchall(c)
                    for c in (*q.must, *q.should, *q.filter, *q.must_not)
                )
            if isinstance(q, DisjunctionMaxQuery):
                return any(_has_matchall(c) for c in q.disjuncts)
            return False

        termless_ok = any(_has_matchall(q) for q in live.values())
        if not live or (not all_terms and not termless_ok):
            schema = RESULT_SCHEMA if k is None else RESULT_SCHEMA + ", rank int"
            return spark.createDataFrame([], schema)

        live_segs = self.live
        pos_terms: set[str] = set()
        pay_terms: set[str] = set()
        for q in live.values():
            pos_terms |= _position_terms(q)
            pay_terms |= _payload_terms(q)
        cols = [c for c in POSTING_COLS if c != "pos_blob"]
        if not pos_terms:
            pos_col = F.lit(None).cast("binary").alias("pos_blob")
        elif pos_terms >= all_terms:
            pos_col = F.col("pos_blob")
        else:
            # ship position blobs only for phrase terms — they dominate blob
            # volume (one entry per occurrence vs one per doc)
            pos_col = (
                F.when(sql_in("term", pos_terms), F.col("pos_blob"))
                .otherwise(F.lit(None))
                .alias("pos_blob")
            )
        # payload blobs ride only for PayloadScoreQuery terms (and only on
        # indexes whose layout has them)
        if pay_terms and "pay_blob" in self._postings_df.columns:
            pay_col = (
                F.when(sql_in("term", pay_terms), F.col("pay_blob"))
                .otherwise(F.lit(None))
                .alias("pay_blob")
            )
        else:
            pay_col = F.lit(None).cast("binary").alias("pay_blob")
        postings = (
            self._postings_df
            .filter((F.col("kind") == 0) & F.col("segment_id").isin(live_segs))
            .filter(sql_in("term", all_terms))
            .select(*cols, pos_col, pay_col)
        )
        # kind=1 norms + kind=3 tombstones ride the same cogroup side
        norms = (
            self._postings_df
            .filter(F.col("kind").isin(1, 3) & F.col("segment_id").isin(live_segs))
            .select("segment_id", "kind", F.col("doc_blob").alias("blob"), "max_doc")
        )
        if self.commit is not None:
            # soft-delete versioning: a tombstone's max_doc slot holds the
            # commit watermark at delete time — a delete buffered after
            # commit W is invisible at commit<=W (per-commit liveDocs,
            # SoftDeletesRetentionMergePolicy role). Legacy -1 rows stay
            # unversioned and apply to every commit.
            norms = norms.filter(
                (F.col("kind") == 1) | (F.col("max_doc") < self.commit)
            )

        def score_segment(key, post_pdf, norm_pdf) -> pd.DataFrame:
            norm_rows = norm_pdf[norm_pdf["kind"] == 1]
            if len(norm_rows) == 0 or (len(post_pdf) == 0 and not termless_ok):
                return pd.DataFrame(
                    {"qid": [], "segment_id": [], "doc_id": [], "score": []}
                ).astype({"qid": "int32", "segment_id": "int32", "doc_id": "int64", "score": "float32"})
            seg_id = int(key[0])
            norms_arr = np.frombuffer(norm_rows["blob"].iloc[0], dtype=np.uint8)
            del_rows = norm_pdf[norm_pdf["kind"] == 3]
            deleted = (
                np.unique(
                    np.concatenate(
                        [np.frombuffer(b, dtype=np.int64) for b in del_rows["blob"]]
                    )
                )
                if len(del_rows)
                else None
            )
            rows: dict[str, list[dict]] = {}
            for r in post_pdf.sort_values("shard").to_dict("records"):
                rows.setdefault(r["term"], []).append(r)
            seg = SegmentPostings(
                rows, norms_arr, int(norm_rows["max_doc"].iloc[0]), deleted
            )
            ctx = QueryContext(
                weights, cache, f32=f32, dfs=dfs, doc_count=doc_count, sim=sim,
                total_tokens=total_tokens, ttfs=ttfs,
            )
            out_qid, out_doc, out_score = [], [], []
            for qid, q in live.items():
                if after is not None:
                    # cursor-filtered collection: exhaustive per-segment
                    # scoring (pruned paths could drop the page's docs), then
                    # keep only hits strictly after the cursor, then top-k
                    a_score, a_seg, a_doc = after
                    docs, scores = eval_query(q, seg, ctx)
                    s_cmp = scores.astype(np.float32).astype(np.float64) if f32 else scores
                    if seg_id > a_seg:
                        coord_ok = np.ones(len(docs), dtype=bool)
                    elif seg_id == a_seg:
                        coord_ok = docs > a_doc
                    else:
                        coord_ok = np.zeros(len(docs), dtype=bool)
                    keep = (s_cmp < a_score) | ((s_cmp == a_score) & coord_ok)
                    d, s = topk(docs[keep], scores[keep], k or 10, f32)
                elif first_k:
                    d = first_k_matches(q, seg, ctx, k or 10, reverse=reverse)
                    s = np.zeros(len(d), dtype=np.float32)
                elif k is not None and prunable and isinstance(q, TermQuery):
                    d, s = topk_term_pruned(q.term, seg, ctx, k)
                elif (or_terms := (_pure_or_terms(q) if k is not None and prunable else None)) is not None:
                    d, s = topk_or_pruned(or_terms, seg, ctx, k)
                elif (and_terms := (_pure_and_terms(q) if k is not None and prunable else None)) is not None:
                    d, s = topk_and_pruned(and_terms, seg, ctx, k)
                else:
                    docs, scores = eval_query(q, seg, ctx, scoring=scoring)
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
        if k is None or first_k:
            return per_seg
        # TopDocs.merge tie-break: score desc, shard (segment) asc, doc asc
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        return (
            per_seg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
        )

    def search_after(
        self, query: Query | str, after: tuple, k: int = 10
    ) -> DataFrame:
        """Keyset pagination (``IndexSearcher.searchAfter:459``): resume
        strictly after cursor ``after = (score, segment_id, doc_id)`` in the
        (score desc, segment asc, doc asc) total order. The cursor predicate
        is pushed INTO the per-segment collectors (search_many(after=...)),
        so each segment ships only its k first-after-cursor hits — the
        ``PagingTopScoreDocCollector`` shape; the global reduce window sees
        ≤ k·segments rows, never the full match set."""
        a = (float(after[0]), int(after[1]), int(after[2]))
        hits = self.search_many({0: query}, k=k, after=a).drop("qid")
        # search_many already ranked the merged result; rank is 1-based per
        # page (the page's global order)
        return hits

    def count(self, query: Query | str) -> int:
        """TotalHitCountCollector (``search/TotalHitCountCollector.java:24``)
        — matching without scoring (the collector never reads scores)."""
        return self.search_many({0: query}, k=None, scoring=False).count()

    def rescore(
        self, hits: DataFrame, query: Query | str, weight: float = 1.0, k: int = 10
    ) -> DataFrame:
        """Two-phase rescoring (``QueryRescorer.rescore`` sugar API,
        ``reference lucene/core/src/java/org/apache/lucene/search/QueryRescorer.java:168-182``):
        re-run a (typically more expensive) second query and combine
        ``new = first + weight · second``; first-pass hits the second query
        misses keep their first-pass score.

        Shape at scale: the first-pass top-N is tiny → it broadcasts into
        the join against the second pass; the expensive part of a phrase
        second pass already restricts position work to conjunction
        candidates inside the kernel. Returns (segment_id, doc_id, score,
        rank) re-ranked by the combined score."""
        second = (
            self.search_many({0: query}, k=None)
            .drop("qid")
            .withColumnRenamed("score", "score2")
        )
        first = hits.select("segment_id", "doc_id", "score")
        # two buildable broadcast joins (Spark can't build the preserved side
        # of an outer join): inner-join shrinks the exhaustive second pass to
        # the top-N coordinates, then the tiny result is the BUILD side of
        # the left outer
        matched = second.join(
            F.broadcast(first.select("segment_id", "doc_id")),
            ["segment_id", "doc_id"],
        )
        combined = (
            first.join(F.broadcast(matched), ["segment_id", "doc_id"], "left")
            .withColumn(
                "score",
                (F.col("score") + float(weight) * F.coalesce(F.col("score2"), F.lit(0.0)))
                .cast("float"),
            )
            .drop("score2")
        )
        top = combined.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        ).limit(k)
        # rank over ≤ k rows (the TakeOrdered result) — bounded input, the
        # single-partition window is fine here
        w = Window.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        return top.withColumn("rank", F.row_number().over(w))

    def _point_range_matches(self, ranges) -> DataFrame:
        """(segment_id, doc_id) set matching EVERY range in ``ranges`` — one
        pushed-down docs-parquet scan (row-group min/max pruning plays the
        BKD skip-subtree role), liveDocs intersected like every reader."""
        from ..index.read import deleted_docs_table

        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        out = docs.filter(F.col("segment_id").isin(list(self.live)))
        for r in ranges:
            if r.field not in docs.columns:
                raise ValueError(
                    f"PointRangeQuery field {r.field!r} is not a stored docs "
                    "column (pass it via build_index(stored_cols=...))"
                )
            c = F.col(r.field)
            if r.lower is not None:
                out = out.filter(c >= r.lower if r.include_lower else c > r.lower)
            if r.upper is not None:
                out = out.filter(c <= r.upper if r.include_upper else c < r.upper)
        out = out.select("segment_id", "doc_id")
        tombs = deleted_docs_table(self.spark, self.index_dir, commit=self.commit)
        return out.join(tombs, ["segment_id", "doc_id"], "left_anti")

    def _search_point_range(
        self, qid: int, q: Query, k: int | None, scoring: bool = True
    ) -> DataFrame:
        """Execute one query containing PointRangeQuery clauses.

        Score semantics follow the reference's ``ConstantScoreWeight``:
        a standalone range (or one wrapped in Boost/ConstantScore) scores its
        boost; inside a BooleanQuery, MUST ranges each add their boost,
        FILTER ranges add 0, MUST_NOT ranges exclude. Nesting anywhere else
        (SHOULD, dismax, inner boolean) raises — the reference surface
        (XML CoreParser / classic parser ranges) never produces those shapes.

        Shape at scale: the text side runs the normal batched kernel path
        exhaustively (pruned top-k could drop docs the range admits), the
        range side is one pushed-down scan, and they meet in one equi-join
        on the document coordinate before the global top-k."""
        boost = 1.0
        while isinstance(q, (BoostQuery, ConstantScoreQuery)):
            boost *= q.boost
            q = q.inner
        must_ranges: list[tuple[PointRangeQuery, float]] = []
        filter_ranges: list[PointRangeQuery] = []
        not_ranges: list[PointRangeQuery] = []

        def _unwrap(c):
            b = 1.0
            while isinstance(c, (BoostQuery, ConstantScoreQuery)):
                b *= c.boost
                c = c.inner
            return c, b

        core: Query | None = None
        if isinstance(q, PointRangeQuery):
            must_ranges.append((q, boost))
            boost = 1.0
        elif isinstance(q, BooleanQuery):
            keep_must, keep_filter, keep_not = [], [], []
            for c in q.must:
                u, b = _unwrap(c)
                (must_ranges.append((u, b)) if isinstance(u, PointRangeQuery)
                 else keep_must.append(c))
            for c in q.filter:
                u, _ = _unwrap(c)
                (filter_ranges.append(u) if isinstance(u, PointRangeQuery)
                 else keep_filter.append(c))
            for c in q.must_not:
                u, _ = _unwrap(c)
                (not_ranges.append(u) if isinstance(u, PointRangeQuery)
                 else keep_not.append(c))
            for c in q.should:
                if _contains_point_range(c):
                    raise ValueError(
                        "PointRangeQuery in a SHOULD clause is not supported"
                    )
            for c in (*keep_must, *keep_filter, *keep_not):
                if _contains_point_range(c):
                    raise ValueError(
                        "PointRangeQuery must be standalone or a top-level "
                        "must/filter/must_not clause"
                    )
            rest = BooleanQuery(
                tuple(keep_must), q.should, tuple(keep_not),
                tuple(keep_filter), q.min_should_match,
            )
            if rest.must or rest.should or rest.filter or rest.must_not:
                core = rest
        else:
            raise ValueError(
                "PointRangeQuery must be standalone or a top-level "
                "BooleanQuery clause"
            )

        pos_ranges = [r for r, _ in must_ranges] + filter_ranges
        matches = (
            self._point_range_matches(pos_ranges) if pos_ranges else None
        )
        const_score = sum(b for _, b in must_ranges) * boost if scoring else 0.0
        if core is None:
            if matches is None:
                # pure must_not ranges over nothing to score — no matches
                hits = None
            else:
                hits = matches.withColumn(
                    "qid", F.lit(int(qid)).cast("int")
                ).withColumn("score", F.lit(float(const_score)))
        else:
            # exhaustive text-side collection, then one coordinate equi-join
            scored = self.search_many({qid: core}, k=None, scoring=scoring)
            if matches is not None:
                scored = scored.join(matches, ["segment_id", "doc_id"], "semi")
            hits = scored.withColumn(
                "score", (F.col("score") + F.lit(float(const_score)))
            )
        if hits is None:
            schema = RESULT_SCHEMA if k is None else RESULT_SCHEMA + ", rank int"
            return self.spark.createDataFrame([], schema)
        if not_ranges:
            hits = hits.join(
                self._point_range_matches(not_ranges),
                ["segment_id", "doc_id"],
                "left_anti",
            )
        hits = hits.select(
            F.col("qid").cast("int"),
            F.col("segment_id").cast("int"),
            F.col("doc_id").cast("bigint"),
            F.col("score").cast("double"),
        )
        if k is None:
            return hits
        w = Window.partitionBy("qid").orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        return hits.withColumn("rank", F.row_number().over(w)).filter(
            F.col("rank") <= k
        )

    def search_sorted_range(self, lo, hi) -> DataFrame:
        """Range filter on the INDEX SORT field
        (sandbox ``IndexSortSortedNumericDocValuesRangeQuery.java``: when the
        index sort leads with the queried field, the matching docs form one
        contiguous docID run per segment, found by binary search instead of
        visiting every doc's value).

        The columnar analogue: ``build_index(index_sort=...)`` writes the
        docs parquet in sort order, so the pushed-down range predicate
        prunes whole row groups by their min/max stats — the same
        skip-most-of-the-segment effect the reference gets from the docID
        binary search, and `.explain` shows the filter at the scan
        (plan-asserted in tests). Matches are returned as
        (segment_id, doc_id, <field>) — local doc ids ARE contiguous per
        segment (asserted by the equivalence test), so downstream
        conjunctions can treat the result as a doc-id interval, exactly the
        reference's BitSetIterator-over-a-run shape."""
        field = self.index_sort_field()
        if field is None:
            raise ValueError(
                "search_sorted_range requires an index built with index_sort=<field>"
            )
        from ..index.read import deleted_docs_table

        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        out = docs.filter(F.col("segment_id").isin(list(self.live))).filter(
            (F.col(field) >= lo) & (F.col(field) <= hi)
        ).select("segment_id", "doc_id", field)
        # liveDocs intersection, like the reference query (and search_sorted)
        tombs = deleted_docs_table(self.spark, self.index_dir, commit=self.commit)
        return out.join(tombs, ["segment_id", "doc_id"], "left_anti")

    def search_covering(
        self,
        queries,
        min_match: "int | DataFrame",
        k: int | None = 10,
    ) -> DataFrame:
        """``CoveringQuery`` (reference ``lucene/sandbox/src/java/org/apache/
        lucene/search/CoveringQuery.java:54-66`` + ``CoveringScorer.java:
        204-212``): a document matches when at least ``max(1, minMatch(doc))``
        of the sub-queries match it; its score is the SUM of the matching
        sub-queries' scores. ``min_match`` is either a constant int (a
        ``LongValuesSource.constant``) or a DataFrame of ``(segment_id,
        doc_id, <value>)`` playing the per-document ``LongValuesSource`` —
        documents with no row in it do NOT match (ctor javadoc), hence the
        inner join.

        Shape at scale: one batched ``search_many`` job over every clause
        (shared postings scan, term filter pushed down), one groupBy on the
        document coordinate (count + sum are map-side combinable), an
        equi-join against the per-doc min-match frame, TakeOrdered top-k.
        ``k=None`` returns every covering match unranked (oracle mode)."""
        queries = list(queries)
        if len(queries) > MAX_CLAUSE_COUNT:
            raise ValueError(
                f"maxClauseCount exceeded: {len(queries)} > {MAX_CLAUSE_COUNT}"
            )
        hits = self.search_many({i: q for i, q in enumerate(queries)}, k=None)
        agg = hits.groupBy("segment_id", "doc_id").agg(
            F.count("*").alias("n_matching"),
            F.sum(F.col("score").cast("double")).alias("score"),
        )
        if isinstance(min_match, DataFrame):
            c = [c for c in min_match.columns if c not in ("segment_id", "doc_id")][0]
            mm = min_match.select(
                "segment_id", "doc_id", F.col(c).cast("long").alias("_mm")
            )
            agg = (
                agg.join(mm, ["segment_id", "doc_id"])
                .filter(F.col("n_matching") >= F.greatest(F.lit(1), F.col("_mm")))
                .drop("_mm")
            )
        else:
            agg = agg.filter(F.col("n_matching") >= max(1, int(min_match)))
        if k is None:
            return agg
        top = agg.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        ).limit(k)
        w = Window.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        return top.withColumn("rank", F.row_number().over(w))

    def search_by_field(
        self, query: Query | str, field: str, k: int = 10, ascending: bool = True
    ) -> DataFrame:
        """General field-sorted top-k (``TopFieldCollector``/``Sort`` over a
        stored field, no index-sort requirement — and therefore no early
        termination: every match is visited, like Lucene on an unsorted
        index). Matching runs without scoring; the match set joins the docs
        table for the sort value and the global merge is a TakeOrdered.
        Prefer ``search_sorted`` when the index was built with
        ``index_sort=field`` — it skips decode past k docs per segment."""
        cand = self.search_many({0: query}, k=None, scoring=False).select(
            "segment_id", "doc_id"
        )
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs")).select(
            "segment_id", "doc_id", field
        )
        order = [
            F.col(field).asc() if ascending else F.col(field).desc(),
            F.col("segment_id").asc(),
            F.col("doc_id").asc(),
        ]
        return docs.join(cand, ["segment_id", "doc_id"]).orderBy(*order).limit(k)

    def index_sort_field(self) -> str | None:
        """The index-sort field recorded at build time
        (``IndexWriterConfig.setIndexSort``), or None. All live segments
        must agree — a mixed index cannot early-terminate."""
        import json as _json

        from ..index.manifest import manifest_rows

        live = set(self.live)
        fields = {
            _json.loads(r.get("lineage") or "{}").get("index_sort")
            for r in manifest_rows(self.spark, self.index_dir)
            if r["segment_id"] in live
        }
        if len(fields) > 1:
            raise ValueError(f"mixed index_sort across live segments: {fields}")
        return next(iter(fields), None)

    def search_sorted(
        self, query: Query | str = "*:*", k: int = 10, ascending: bool = True
    ) -> DataFrame:
        """Top-k by the INDEX SORT field, with per-segment early
        termination (``TopFieldCollector.java:52-76`` canEarlyTerminate:
        when the requested sort matches the index sort, each leaf stops
        after k competitive hits). Requires ``build_index(index_sort=...)``.

        Shape at scale (ascending — the direction matching the index sort):
        each segment ships its first k matching local docIDs (term queries
        stop DECODING after ceil(k/128) blocks — see ``first_k_matches``),
        the ≤ k·segments candidates broadcast into the docs-table join for
        sort values, and the global merge is a TakeOrdered limit — never a
        full sort. ``ascending=False`` cannot early-terminate (direction
        mismatch, exactly Lucene's canEarlyTerminate rule) and collects
        exhaustively via ``search_by_field``. Returns
        (segment_id, doc_id, <field>) in final sort order
        (field asc|desc, segment asc, doc asc)."""
        field = self.index_sort_field()
        if field is None:
            raise ValueError(
                "search_sorted requires an index built with index_sort=<field>"
            )
        q = query if not isinstance(query, str) or query != "*:*" else MatchAllQuery()
        if not ascending:
            # Lucene's canEarlyTerminate requires the query sort DIRECTION to
            # match the index sort (TopFieldCollector.java:52-76); a per-
            # segment "last k docs" cut would also break the doc-asc
            # tie-break when equal field values straddle the k boundary.
            # Descending over an ascending sort collects exhaustively.
            return self.search_by_field(q, field, k=k, ascending=False)
        cand = self.search_many(
            {0: q}, k=k, scoring=False, first_k=True
        ).select("segment_id", "doc_id")
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs")).select(
            "segment_id", "doc_id", field
        )
        return docs.join(F.broadcast(cand), ["segment_id", "doc_id"]).orderBy(
            F.col(field).asc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        ).limit(k)

    def explain(self, query: Query | str, segment_id: int, doc_id: int) -> dict:
        """Score breakdown for one hit (``Weight.explain`` /
        ``BM25Similarity.explain``): per-term boost·idf·tf/(tf+k1·norm)
        components with the resolved global stats. Driver-side decode of one
        segment's rows — a debugging surface, not a query path."""
        from ..index.read import norms_table, term_postings

        if isinstance(query, str):
            query = parse_query(query, self.analyzer)
        query = rewrite(self.expand(rewrite(query)))
        terms = sorted(query.terms())
        weights = self.weights_for(set(terms))
        posts = (
            term_postings(self.spark, self.index_dir, terms)
            .filter((F.col("segment_id") == segment_id) & (F.col("doc_id") == doc_id))
            .collect()
        )
        norm_row = (
            norms_table(self.spark, self.index_dir)
            .filter((F.col("segment_id") == segment_id) & (F.col("doc_id") == doc_id))
            .collect()
        )
        norm_byte = int(norm_row[0].norm_byte) if norm_row else 0
        cache = self.cache
        details = []
        total = 0.0
        for r in posts:
            w = weights.get(r.term, 0.0)
            if self.sim in ("classic", "sweetspot"):
                # same shape: idf · sqrt(freq) · lengthNorm[normByte] — only
                # the norm table differs (sweetspot plateau)
                tf_val = float(np.sqrt(float(r.freq)))
                s = w * tf_val * float(cache[norm_byte])
            elif self.sim == "lmd":
                tf_val = float(np.log1p(float(r.freq) / w)) if w > 0 else 0.0
                s = max(tf_val + float(cache[norm_byte]), 0.0)
            elif self.sim == "lmjm":
                from .kernels import LMJM_LAMBDA

                tf_val = float(r.freq) * float(cache[norm_byte])
                s = (
                    float(np.log1p((1.0 - LMJM_LAMBDA) / LMJM_LAMBDA * tf_val / w))
                    if w > 0
                    else 0.0
                )
            elif self.sim == "inl2":
                tf_val = float(r.freq) * float(cache[norm_byte])  # tfn
                s = w * tf_val / (tf_val + 1.0)
            elif self.sim == "dfi":
                e = w * float(cache[norm_byte])  # expected count
                tf_val = (float(r.freq) - e) / np.sqrt(e) if e > 0 else 0.0
                s = float(np.log2(tf_val + 1.0)) if float(r.freq) > e else 0.0
            elif self.sim == "ibll":
                tf_val = float(r.freq) * float(cache[norm_byte])  # tfn
                s = float(np.log1p(tf_val / w)) if w > 0 else 0.0
            else:
                tf_val = float(r.freq) / (float(r.freq) + float(cache[norm_byte]))
                s = float(np.float32(w) * np.float32(tf_val)) if self.f32 else w * tf_val
            if self.f32 and self.sim in (
                "classic", "sweetspot", "lmd", "lmjm", "inl2", "dfi", "ibll"
            ):
                s = float(np.float32(s))
            details.append(
                {
                    "term": r.term,
                    "freq": int(r.freq),
                    "idf_weight": float(w),
                    "norm_byte": norm_byte,
                    "tf": tf_val,
                    "score": s,
                }
            )
            total += s
        return {
            "segment_id": segment_id,
            "doc_id": doc_id,
            "doc_count": self.doc_count,
            "avgdl": float(self.avgdl),
            "details": details,
            "total_if_sum": float(np.float32(total)) if self.f32 else total,
        }

    def fetch(self, hits: DataFrame, cols: list[str] | None = None) -> DataFrame:
        """Second phase of the distributed top-k (QueryComponent.mergeIds →
        PURPOSE_GET_FIELDS, SURVEY §3.3): join winners back to stored fields.
        The hits side is tiny → broadcast it."""
        docs = self.spark.read.parquet(os.path.join(self.index_dir, "docs"))
        if cols:
            docs = docs.select("segment_id", "doc_id", *cols)
        return docs.join(F.broadcast(hits), ["segment_id", "doc_id"], "inner")
