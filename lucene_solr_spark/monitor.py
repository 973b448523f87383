"""Reverse search (percolation) — the lucene/monitor module, Spark-first.

Reference: ``lucene/monitor/src/java/org/apache/lucene/monitor/Monitor.java``
(register/match lifecycle), ``TermFilteredPresearcher.java`` (anchor-term
extraction: a conjunction contributes its highest-weight child, a
disjunction contributes ALL children — any matching document must contain at
least one extracted anchor term), ``QueryIndex.java`` (registered-query
storage) and ``lucene/memory/.../MemoryIndex.java`` (the single-document
verification index run under every candidate query).

Spark-first shape — registered queries are the SMALL side (thousands), the
document stream is the BIG side:

- Queries are parsed ONCE on the driver into the engine's Query algebra,
  anchor terms are extracted per query, and the whole registry (parsed
  queries + anchor sets) ships to executors by closure capture — the
  broadcast-dimension pattern. No query-side shuffle ever.
- Matching is ONE ``mapInPandas`` pass over the documents with ZERO
  shuffles: each Arrow batch is analyzed by the vectorized analyzer chain
  and turned into an EPHEMERAL in-memory segment via the same
  ``build_segment_frame`` kernel the index writer uses (the MemoryIndex
  role, amortized over a whole batch instead of one doc), then every
  candidate query — selected by intersecting the batch vocabulary with the
  anchor map, the presearcher role at batch granularity — is evaluated by
  the ordinary ``eval_query`` kernels. The FULL query algebra works:
  boolean, phrase, sloppy phrase, spans, synonyms, dismax, and
  MultiTermQuerys (expanded against the batch's own term dictionary).
- Because ``match`` is a pure DataFrame transform it applies unchanged to a
  Structured Streaming DataFrame: ``monitor.match(readStream_df)`` →
  ``writeStream`` is the streaming-alert topology (docs flow past standing
  queries), with no state store needed — the operator is stateless per
  batch by construction.

Matches are reported unscored by default (the reference's ``QueryMatch``
mode). Pass ``stats_from=IndexSearcher(...)`` to score them with that
index's collection statistics (``ScoringMatch`` role): percolation then
produces EXACTLY the scores searching that index would — batch-invariant,
unlike the reference's single-document MemoryIndex statistics (documented
deviation; tested by rank/score parity against ``search_many`` in
``tests/test_monitor.py``).

For registries too large to broadcast (millions of standing queries —
Lucene's QueryIndex is itself an index for this reason), use
:func:`percolate_distributed`, which keeps queries AND documents as
DataFrames end-to-end.
"""

from __future__ import annotations

import re
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from .search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchNoneQuery,
    MultiPhraseQuery,
    MultiTermQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SloppyPhraseQuery,
    SpanFirstQuery,
    SpanPositionRangeQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
)

# ---------------------------------------------------------------------------
# presearcher: anchor-term extraction (TermFilteredPresearcher.java:66)
#
# anchor_terms(q) returns a set S such that every document matching q
# contains at least one term of S — or None when no such finite set exists
# (MatchAll, pure must_not, un-expanded multi-term patterns), meaning the
# query must be checked against every batch (the reference's ANYTOKEN).

def _term_weight(t: str) -> tuple:
    # TermWeightor default: longer tokens are rarer, hence cheaper anchors
    # (TermWeightor.DEFAULT length weighting); term text breaks ties.
    return (len(t), t)


def _set_weight(s: frozenset) -> tuple:
    # a set is as strong as its weakest member (every member may be the one
    # that fires candidate selection)
    return min(_term_weight(t) for t in s)


def _best_child(children: list[frozenset | None]) -> frozenset | None:
    """Conjunction rule: any ONE child's anchors suffice — pick the
    highest-weight anchored child (QueryAnalyzer conjunction pruning)."""
    anchored = [c for c in children if c is not None and len(c)]
    if not anchored:
        return None
    return max(anchored, key=_set_weight)


def _union_children(children: list[frozenset | None]) -> frozenset | None:
    """Disjunction rule: a match may come through any child, so every
    child must be anchored or the union is unbounded."""
    out: set = set()
    for c in children:
        if c is None:
            return None
        out |= c
    return frozenset(out)


def anchor_terms(q: Query) -> frozenset | None:
    if isinstance(q, str):  # bare span-clause term
        return frozenset((q,))
    if isinstance(q, (TermQuery, SpanTermQuery)):
        return frozenset((q.term,))
    if isinstance(q, SynonymQuery):
        return frozenset(q.syn_terms)
    if isinstance(q, TermInSetQuery):
        return frozenset(q.set_terms)
    if isinstance(q, (PhraseQuery, SloppyPhraseQuery)):
        return _best_child([frozenset((t,)) for t in q.phrase_terms])
    if isinstance(q, MultiPhraseQuery):
        # each position slot is a disjunction of alternatives; the phrase is
        # the conjunction of its slots
        return _best_child([frozenset(alts) for alts in q.slots])
    if isinstance(q, SpanNearQuery):
        return _best_child([anchor_terms(c) for c in q.clauses])
    if isinstance(q, SpanOrQuery):
        return _union_children([anchor_terms(c) for c in q.clauses])
    if isinstance(q, SpanNotQuery):
        return anchor_terms(q.include)
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        return anchor_terms(q.match)
    if isinstance(q, DisjunctionMaxQuery):
        return _union_children([anchor_terms(d) for d in q.disjuncts])
    if isinstance(q, (ConstantScoreQuery, BoostQuery)):
        return anchor_terms(q.inner)
    if isinstance(q, BooleanQuery):
        conj = _best_child([anchor_terms(c) for c in (*q.must, *q.filter)])
        if conj is not None:
            return conj
        if q.must or q.filter:
            # required clauses exist but none is anchorable (e.g. MatchAll
            # with a must_not) — fall through to always-check only if the
            # should side can't anchor either (msm>0 would make should
            # required, but with must present should is optional)
            return None
        if q.should:
            return _union_children([anchor_terms(c) for c in q.should])
        return None  # pure must_not / empty
    if isinstance(q, MatchNoneQuery):
        return frozenset()  # never selected, never matches
    # interval sources: ordered/unordered/block are conjunctions, or is a
    # disjunction, filters pass through, containing-family needs (at least)
    # its required side(s)
    from .search.intervals import (
        IBlock,
        IContainedBy,
        IContaining,
        IMaxGaps,
        IMaxWidth,
        INotContaining,
        IOr,
        IOrdered,
        ITerm,
        IntervalQuery,
        IUnordered,
    )

    if isinstance(q, IntervalQuery):
        return anchor_terms(q.source)
    if isinstance(q, ITerm):
        return frozenset((q.term,))
    if isinstance(q, (IOrdered, IUnordered, IBlock)):
        return _best_child([anchor_terms(_isrc(c)) for c in q.sources])
    if isinstance(q, IOr):
        return _union_children([anchor_terms(_isrc(c)) for c in q.sources])
    if isinstance(q, (IMaxGaps, IMaxWidth)):
        return anchor_terms(q.inner)
    if isinstance(q, (IContaining, INotContaining)):
        return anchor_terms(q.big)
    if isinstance(q, IContainedBy):
        return _best_child([anchor_terms(q.small), anchor_terms(q.big)])
    # MatchAllQuery, MultiTermQuery patterns (prefix/wildcard/fuzzy/regexp/
    # range): no finite anchor set → always-check
    return None


def _isrc(c):
    from .search.intervals import ITerm

    return ITerm(c) if isinstance(c, str) else c


# ---------------------------------------------------------------------------
# batch-local MultiTermQuery expansion against the batch vocabulary
# (MemoryIndex gives MultiTermQuerys a real terms enum; same here, the enum
# is the batch's sorted term dictionary)

def _levenshtein(a: str, b: str) -> int:
    if a == b:
        return 0
    la, lb = len(a), len(b)
    prev = list(range(lb + 1))
    for i in range(1, la + 1):
        cur = [i] + [0] * lb
        ca = a[i - 1]
        for j in range(1, lb + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != b[j - 1])
            )
        prev = cur
    return prev[lb]


def _vocab_range(vocab: np.ndarray, lo: str | None, hi_prefix: str | None):
    """Contiguous slice of the sorted vocab: [lo, prefix-upper-bound)."""
    start = int(np.searchsorted(vocab, lo)) if lo is not None else 0
    end = (
        int(np.searchsorted(vocab, hi_prefix + "￿"))
        if hi_prefix is not None
        else len(vocab)
    )
    return start, end


def expand_against_vocab(q: Query, vocab: np.ndarray) -> Query:
    """Rewrite MultiTermQuerys to concrete term disjunctions using the
    batch's sorted term dictionary (MultiTermQuery.java:68 rewrite, with the
    MemoryIndex terms enum as the dictionary). Everything else recurses.

    Rewrite-method note: this batch-local path always produces a
    CONSTANT_SCORE disjunction regardless of ``q.rewrite_method`` — the
    batch vocabulary has no collection-level dfs to rank a top_terms_N
    truncation with, and unscored percolation only needs match semantics.
    Scored percolation (``Monitor.match(stats_from=...)``) never reaches
    this branch for MultiTermQuerys: the queries are pre-expanded against
    the stats index's own dictionary with the executor's full rewrite
    dispatch (scoring_boolean / top_terms_N honored), which is what keeps
    the score-identity contract exact."""
    if isinstance(q, PrefixQuery):
        s, e = _vocab_range(vocab, q.prefix, q.prefix)
        terms = vocab[s:e]
    elif isinstance(q, TermRangeQuery):
        s = int(np.searchsorted(vocab, q.lower, side="left" if q.include_lower else "right")) if q.lower is not None else 0
        e = int(np.searchsorted(vocab, q.upper, side="right" if q.include_upper else "left")) if q.upper is not None else len(vocab)
        terms = vocab[s:e]
    elif isinstance(q, WildcardQuery):
        lit = q.pattern.split("*", 1)[0].split("?", 1)[0]
        s, e = _vocab_range(vocab, lit or None, lit or None)
        rx = re.compile(
            "".join(
                ".*" if ch == "*" else "." if ch == "?" else re.escape(ch)
                for ch in q.pattern
            )
        )
        terms = np.array([t for t in vocab[s:e] if rx.fullmatch(t)], dtype=object)
    elif isinstance(q, RegexpQuery):
        rx = re.compile(f"(?:{q.pattern})")
        terms = np.array([t for t in vocab if rx.fullmatch(t)], dtype=object)
    elif isinstance(q, FuzzyQuery):
        pre = q.term[: q.prefix_len] if q.prefix_len else None
        s, e = _vocab_range(vocab, pre, pre)
        band = q.max_edits
        cand = [t for t in vocab[s:e] if abs(len(t) - len(q.term)) <= band]
        terms = np.array(
            [t for t in cand if _levenshtein(t, q.term) <= band], dtype=object
        )
    elif isinstance(q, TermInSetQuery):
        terms = np.array(sorted(set(q.set_terms)), dtype=object)
    elif isinstance(q, BooleanQuery):
        return BooleanQuery(
            tuple(expand_against_vocab(c, vocab) for c in q.must),
            tuple(expand_against_vocab(c, vocab) for c in q.should),
            tuple(expand_against_vocab(c, vocab) for c in q.must_not),
            tuple(expand_against_vocab(c, vocab) for c in q.filter),
            q.min_should_match,
        )
    elif isinstance(q, DisjunctionMaxQuery):
        return DisjunctionMaxQuery(
            tuple(expand_against_vocab(d, vocab) for d in q.disjuncts), q.tiebreak
        )
    elif isinstance(q, (ConstantScoreQuery, BoostQuery)):
        return type(q)(expand_against_vocab(q.inner, vocab), q.boost)
    else:
        return q
    if len(terms) == 0:
        return MatchNoneQuery()
    return ConstantScoreQuery(
        BooleanQuery(should=tuple(TermQuery(t) for t in terms))
    )


# ---------------------------------------------------------------------------
# the monitor

class Monitor:
    """Standing-query registry + percolation operator.

    >>> m = Monitor(analyzer="simple")
    >>> m.register("alert-1", "vector AND hash")
    >>> matches = m.match(docs_df)          # (key_col, query_id) pairs
    """

    def __init__(self, analyzer: str = "simple"):
        self.analyzer = analyzer
        # query_id -> (parsed Query, anchor set | None)
        self._queries: dict[str, tuple[Query, frozenset | None]] = {}

    def register(self, query_id: str, query: Query | str) -> None:
        q = parse_query(query, self.analyzer) if isinstance(query, str) else query
        self._queries[str(query_id)] = (q, anchor_terms(q))

    def unregister(self, query_id: str) -> None:
        self._queries.pop(str(query_id), None)

    def __len__(self) -> int:
        return len(self._queries)

    def match(
        self,
        docs: DataFrame,
        content_col: str = "text",
        key_col: str = "doc_id",
        stats_from=None,
    ) -> DataFrame:
        """All (document, registered query) match pairs — one shuffle-free
        ``mapInPandas`` pass; works on batch AND streaming DataFrames.

        ``stats_from``: an :class:`~.search.executor.IndexSearcher` whose
        COLLECTION statistics (idf weights, norm cache, docCount) score the
        matches — the output gains a ``score`` column and percolation
        becomes rank-equivalent to searching that index with the same
        queries (the reference's ``ScoringMatch``, except scores come from
        corpus statistics instead of the single-document MemoryIndex —
        batch-invariant by construction, documented deviation). Without it,
        matches are unscored ``QueryMatch`` rows."""
        entries = sorted(
            (qid, q, anch) for qid, (q, anch) in self._queries.items()
        )
        analyzer = self.analyzer
        key_field = docs.schema[key_col]
        out_schema = f"{key_col} {key_field.dataType.simpleString()}, query_id string"
        scoring = stats_from is not None
        if scoring:
            # Pre-expand MultiTermQuerys against the STATS INDEX's dictionary
            # with the executor's own rewrite dispatch (constant_score /
            # scoring_boolean / top_terms_N all honored) — exactly what
            # search_many does, so scored percolation stays score-identical
            # to searching that index even for non-default rewrite_methods.
            from .search.query import rewrite as _rw

            expanded = [
                (qid, _rw(stats_from.expand(_rw(q)))) for qid, q, _a in entries
            ]
            # re-derive anchors from the expanded form: a MultiTermQuery is
            # unanchorable (always-check) but its expansion is a finite term
            # disjunction, so the presearcher gate gets sharper, not weaker
            entries = [(qid, q, anchor_terms(q)) for qid, q in expanded]
            all_terms: set[str] = set()
            for _qid, q, _a in entries:
                all_terms |= q.terms()
            ctx_args = (
                stats_from.weights_for(all_terms),
                stats_from.cache,
                stats_from.f32,
                stats_from.term_stats(all_terms),
                stats_from.doc_count,
                stats_from.sim,
                stats_from.sum_total_term_freq,
            )
            out_schema += ", score double"
        else:
            ctx_args = ({}, np.zeros(256, dtype=np.float64), False, None, 0, "bm25", 0)

        def match_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            from .index.build import KIND_NORMS, KIND_POSTING, build_segment_frame
            from .search.kernels import QueryContext, SegmentPostings, eval_query

            weights, cache, f32, dfs, doc_count, sim, total = ctx_args
            ctx = QueryContext(
                weights, cache, f32=f32, dfs=dfs, doc_count=doc_count, sim=sim,
                total_tokens=total,
            )
            for pdf in it:
                n = len(pdf)
                if n == 0:
                    continue
                content = pdf[content_col].tolist()
                frame = build_segment_frame(
                    content, np.arange(n, dtype=np.int64), 0, analyzer
                )
                post = frame[frame["kind"] == KIND_POSTING]
                rows: dict[str, list[dict]] = {
                    r["term"]: [r] for r in post.to_dict("records")
                }
                norm_blob = frame.loc[frame["kind"] == KIND_NORMS, "doc_blob"].iloc[0]
                seg = SegmentPostings(
                    rows, np.frombuffer(norm_blob, dtype=np.uint8), n
                )
                vocab = post["term"].to_numpy(dtype=object)  # sorted (build order)
                vocab_set = set(vocab)
                keys = pdf[key_col].to_numpy()
                out_keys, out_qids, out_scores = [], [], []
                for qid, q, anch in entries:
                    # presearcher gate at batch granularity: skip queries
                    # whose anchors don't intersect the batch vocabulary
                    if anch is not None and vocab_set.isdisjoint(anch):
                        continue
                    docs_m, scores_m = eval_query(
                        expand_against_vocab(q, vocab), seg, ctx, scoring=scoring
                    )
                    if len(docs_m):
                        out_keys.append(keys[docs_m])
                        out_qids.append(np.full(len(docs_m), qid, dtype=object))
                        if scoring:
                            out_scores.append(scores_m.astype(np.float64))
                if out_keys:
                    data = {
                        key_col: np.concatenate(out_keys),
                        "query_id": np.concatenate(out_qids),
                    }
                    if scoring:
                        data["score"] = np.concatenate(out_scores)
                    yield pd.DataFrame(data)

        return docs.select(key_col, content_col).mapInPandas(
            match_batches, out_schema
        )


# ---------------------------------------------------------------------------
# large query registries: the distributed percolation path
#
# Monitor.match ships the registry by closure — right when queries number in
# the thousands. Lucene's QueryIndex is itself an INDEX because registries
# grow to millions (alerting platforms); at that scale the registry is data,
# not metadata. percolate_distributed keeps BOTH sides as DataFrames:
#
#   1. parse + anchor-extract the queries distributedly → an inverted
#      (anchor_term → query) relation (the presearcher's query index);
#   2. candidate generation = distinct doc terms ⋈ anchor relation — an
#      equi-join Catalyst can hash or sort-merge at any scale (never
#      all-pairs; a doc meets only queries anchored on its own terms);
#   3. verification groups candidates by DOCUMENT (one shuffle on the doc
#      key), rebuilds each batch's ephemeral segment, and evaluates each
#      candidate query on its candidate docs only.
#
# Queries with NO anchor set (MatchAll, pure-negation, unexpanded leading
# wildcards) must be checked against every document; they are collected to
# the driver and capped — at web scale an unanchorable standing query is a
# full corpus scan per epoch and deserves the loud failure.

_ALWAYS_CHECK_CAP = 256


def percolate_distributed(
    queries: DataFrame,
    docs: DataFrame,
    analyzer: str = "simple",
    query_id_col: str = "query_id",
    query_col: str = "query",
    content_col: str = "text",
    key_col: str = "doc_id",
) -> DataFrame:
    """(query_id, doc key) match pairs for a DataFrame-sized query registry."""
    import pyspark.sql.functions as F

    spark = docs.sparkSession
    key_field = docs.schema[key_col]
    key_type = key_field.dataType.simpleString()

    # ---- stage 1: distributed parse + anchor extraction --------------------
    def extract(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            qids, terms = [], []
            none_qids = []
            for qid, qs in zip(pdf[query_id_col], pdf[query_col]):
                try:
                    anch = anchor_terms(parse_query(qs, analyzer))
                except ValueError:
                    # unparseable standing query: it can never be VERIFIED,
                    # so it can never match — drop it here rather than demote
                    # it to always-check and crash in the verify stage
                    # (verify() carries the same guard for defense in depth)
                    continue
                if anch is None:
                    none_qids.append(qid)
                elif anch:
                    for t in anch:
                        qids.append(qid)
                        terms.append(t)
                # empty frozenset (MatchNone): never matches, drop
            out = pd.DataFrame({"query_id": qids, "anchor": terms, "always": False})
            if none_qids:
                out = pd.concat(
                    [out, pd.DataFrame({
                        "query_id": none_qids,
                        "anchor": [""] * len(none_qids),
                        "always": True,
                    })],
                    ignore_index=True,
                )
            yield out

    # NOT cached: the always-check probe below and the stage-2 join each run
    # extract once (a linear parse pass over the registry — cheap relative to
    # pinning an unbounded cached relation in a long-lived session; the old
    # .cache() here was never unpersisted)
    anchors = queries.mapInPandas(
        extract, "query_id string, anchor string, always boolean"
    )
    always_rows = (
        anchors.filter("always").select("query_id").limit(_ALWAYS_CHECK_CAP + 1).collect()
    )
    if len(always_rows) > _ALWAYS_CHECK_CAP:
        raise ValueError(
            f"more than {_ALWAYS_CHECK_CAP} unanchorable standing queries — "
            "each one is a full corpus scan per batch; anchor them or raise the cap"
        )
    always_ids = {r.query_id for r in always_rows}

    # ---- stage 2: candidate pairs via the anchor join -----------------------
    # doc terms come from the SAME analyzer chain the queries verify with —
    # a cheaper tokenizer would miss subword/stemmed anchors (the code chain
    # splits camelCase identifiers; an anchor like 'parse' must hit a doc
    # whose only occurrence is inside 'asyncDiskParse')
    def doc_term_rows(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .analysis import analyze_batch

        for pdf in it:
            if len(pdf) == 0:
                continue
            terms, _pos, lens, _starts, _norm = analyze_batch(
                pdf[content_col].tolist(), analyzer
            )
            keys = np.repeat(pdf[key_col].to_numpy(), lens)
            out = pd.DataFrame({key_col: keys, "anchor": terms})
            yield out.drop_duplicates()

    key_schema = f"{key_col} {key_type}"
    doc_terms = docs.select(key_col, content_col).mapInPandas(
        doc_term_rows, f"{key_schema}, anchor string"
    )
    cand = (
        doc_terms.join(anchors.filter(~F.col("always")), "anchor")
        .select(key_col, "query_id")
        .distinct()
    )
    if always_ids:
        every = docs.select(key_col).crossJoin(
            queries.filter(F.col(query_id_col).isin(sorted(always_ids))).select(
                F.col(query_id_col).alias("query_id")
            )
        )
        cand = cand.unionByName(every)

    # ---- stage 3: grouped verification (one shuffle on the doc key) --------
    pairs = cand.join(
        queries.select(F.col(query_id_col).alias("query_id"), F.col(query_col).alias("_qs")),
        "query_id",
    ).join(docs.select(key_col, content_col), key_col)

    def verify(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from .index.build import KIND_NORMS, KIND_POSTING, build_segment_frame
        from .search.kernels import QueryContext, SegmentPostings, eval_query

        ctx = QueryContext({}, np.zeros(256, dtype=np.float64), f32=False)
        for pdf in it:
            if len(pdf) == 0:
                continue
            # one segment over the batch's DISTINCT docs
            uniq = pdf.drop_duplicates(subset=[key_col])
            keys = uniq[key_col].to_numpy()
            idx_of = {k: i for i, k in enumerate(keys)}
            frame = build_segment_frame(
                uniq[content_col].tolist(),
                np.arange(len(uniq), dtype=np.int64),
                0,
                analyzer,
            )
            post = frame[frame["kind"] == KIND_POSTING]
            rows = {r["term"]: [r] for r in post.to_dict("records")}
            norm_blob = frame.loc[frame["kind"] == KIND_NORMS, "doc_blob"].iloc[0]
            seg = SegmentPostings(
                rows, np.frombuffer(norm_blob, dtype=np.uint8), len(uniq)
            )
            vocab = post["term"].to_numpy(dtype=object)
            out_keys, out_qids = [], []
            for (qid, qs), grp in pdf.groupby(["query_id", "_qs"], sort=True):
                try:
                    q = expand_against_vocab(parse_query(qs, analyzer), vocab)
                except ValueError:
                    continue  # same tolerance as extract(): unverifiable → no match
                docs_m, _ = eval_query(q, seg, ctx, scoring=False)
                if not len(docs_m):
                    continue
                cand_idx = np.array(
                    sorted(idx_of[k] for k in grp[key_col]), dtype=np.int64
                )
                hit = cand_idx[np.isin(cand_idx, docs_m)]
                if len(hit):
                    out_keys.append(keys[hit])
                    out_qids.append(np.full(len(hit), qid, dtype=object))
            if out_keys:
                yield pd.DataFrame(
                    {key_col: np.concatenate(out_keys),
                     "query_id": np.concatenate(out_qids)}
                )

    # sortWithinPartitions clusters each document's candidate rows so they
    # land in ONE Arrow batch — a doc straddling a batch boundary is analyzed
    # and segment-built once per batch it appears in (correct both ways, but
    # the re-analysis is wasted work for docs with many candidate queries)
    return pairs.repartition(key_col).sortWithinPartitions(key_col).mapInPandas(
        verify, f"{key_col} {key_type}, query_id string"
    )

