"""Per-segment query evaluation kernels — flat numpy, no per-row Python.

These are the vectorized counterparts of the reference's scorer tree
(SURVEY §2.5):

- conjunction = sorted-array intersection (``search/ConjunctionDISI.java:38``
  leapfrog; numpy ``intersect1d``/``searchsorted`` is the bulk equivalent)
- disjunction = k-way merge with per-doc sum (``DisjunctionSumScorer.java:25``)
  — scores accumulate in float64 and cast to float32 at the end, matching the
  reference's ``double score; ... return (float) score`` accumulation
- MUST_NOT = set difference (``ReqExclScorer.java``)
- optional-sum over required = ``ReqOptSumScorer.java``
- minimumNumberShouldMatch = match-count filter
  (``MinShouldMatchSumScorer``)
- exact phrase = position intersection: encode each (doc, pos) occurrence of
  term *i* as ``doc * 2^32 + (pos - rel_i)`` and intersect the key arrays —
  the fully-vectorized form of ``ExactPhraseMatcher.java:117-148``; the
  surviving key count per doc is the phrase freq
- block-max pruning for TOP_SCORES term queries using the per-128 block
  impact metadata (``ImpactsDISI.java:95-127``, ``MaxScoreCache.java``):
  process blocks in upper-bound order, stop when the bound can't beat the
  current kth score — results provably identical to exhaustive evaluation.
"""

from __future__ import annotations

import numpy as np

from ..codec import BLOCK_SIZE, delta_decode_lists, vbyte_decode
from . import bm25
from .query import (
    BooleanQuery,
    MatchAllQuery,
    MatchNoneQuery,
    PhraseQuery,
    Query,
    TermQuery,
)

_EMPTY_I = np.empty(0, dtype=np.int64)
_EMPTY_F = np.empty(0, dtype=np.float64)

_POS_SHIFT = np.int64(1) << np.int64(32)


class SegmentPostings:
    """Lazy decoder over one segment's posting rows for the query's terms."""

    def __init__(self, rows: dict[str, dict], norms: np.ndarray, max_doc: int):
        self.rows = rows  # term -> {doc_blob, freq_blob, pos_blob, blk_*}
        self.norms = norms
        self.max_doc = max_doc
        self._docs: dict[str, np.ndarray] = {}
        self._freqs: dict[str, np.ndarray] = {}
        self._pos: dict[str, np.ndarray] = {}

    def docs_freqs(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        if term not in self.rows:
            return _EMPTY_I, _EMPTY_I
        if term not in self._docs:
            r = self.rows[term]
            deltas = vbyte_decode(np.frombuffer(r["doc_blob"], dtype=np.uint8)).astype(np.int64)
            docs = np.cumsum(deltas)  # first delta is absolute (single list)
            freqs = vbyte_decode(np.frombuffer(r["freq_blob"], dtype=np.uint8)).astype(np.int64)
            self._docs[term] = docs
            self._freqs[term] = freqs
        return self._docs[term], self._freqs[term]

    def positions(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Returns (flat positions, per-posting start offsets incl. end)."""
        docs, freqs = self.docs_freqs(term)
        if term not in self._pos:
            r = self.rows[term]
            deltas = vbyte_decode(np.frombuffer(r["pos_blob"], dtype=np.uint8)).astype(np.int64)
            occ_starts = np.zeros(len(freqs), dtype=np.int64)
            np.cumsum(freqs[:-1], out=occ_starts[1:])
            pos = delta_decode_lists(deltas, occ_starts)
            self._pos[term] = (pos, np.append(occ_starts, len(pos)))
        return self._pos[term]

    def blocks(self, term: str) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
        r = self.rows[term]
        return (
            np.frombuffer(r["blk_last"], dtype=np.int32),
            np.frombuffer(r["blk_maxf"], dtype=np.int32),
            np.frombuffer(r["blk_minn"], dtype=np.uint8),
        )


# ------------------------------------------------------------- combinators --

def _union_sum(results: list[tuple[np.ndarray, np.ndarray]]):
    """k-way union; returns (docs sorted, score_sum float64, match_count)."""
    non_empty = [(d, s) for d, s in results if len(d)]
    if not non_empty:
        return _EMPTY_I, _EMPTY_F, _EMPTY_I
    docs = np.concatenate([d for d, _ in non_empty])
    scores = np.concatenate([s for _, s in non_empty])
    uniq, inv = np.unique(docs, return_inverse=True)
    acc = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(acc, inv, scores)
    cnt = np.bincount(inv, minlength=len(uniq))
    return uniq, acc, cnt


def _intersect_sum(results: list[tuple[np.ndarray, np.ndarray]]):
    """Conjunction: intersect all doc arrays, summing scores (float64)."""
    if not results:
        return _EMPTY_I, _EMPTY_F
    # lead with the rarest list (ConjunctionDISI cost ordering)
    results = sorted(results, key=lambda r: len(r[0]))
    docs, score = results[0]
    score = score.copy()
    for d2, s2 in results[1:]:
        idx = np.searchsorted(d2, docs)
        idx_c = np.minimum(idx, len(d2) - 1) if len(d2) else idx
        ok = np.zeros(len(docs), dtype=bool)
        if len(d2):
            ok = d2[idx_c] == docs
        docs = docs[ok]
        score = score[ok] + s2[idx_c[ok]]
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
    return docs, score


def _setdiff(docs: np.ndarray, scores: np.ndarray, excl: np.ndarray):
    if len(docs) == 0 or len(excl) == 0:
        return docs, scores
    keep = ~np.isin(docs, excl, assume_unique=False)
    return docs[keep], scores[keep]


# ---------------------------------------------------------------- evaluator --

class QueryContext:
    """Global scoring state: idf weights per term + the BM25 norm cache.

    Built from GLOBAL collection statistics (docCount, sumTotalTermFreq, df
    summed over all segments) — the reason BM25 scores are identical no matter
    how the corpus is segmented (``IndexSearcher.java:875-909``).

    ``f32=True`` (default) replicates the reference's float arithmetic exactly
    (Lucene rank/score parity). ``f32=False`` computes everything in float64 —
    used for the DuckDB SQL oracle comparisons, where the oracle is plain
    double-precision SQL.
    """

    def __init__(self, weights: dict[str, float], cache: np.ndarray, f32: bool = True):
        dt = np.float32 if f32 else np.float64
        self.f32 = f32
        self.weights = {t: dt(w) for t, w in weights.items()}
        self.cache = cache.astype(dt)
        self.cache64 = self.cache.astype(np.float64)  # exact widening

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray, weight) -> np.ndarray:
        """BM25 tf*weight with the mode's float semantics; returns float64 carrier."""
        f = np.asarray(freqs, dtype=np.float64)
        norm = self.cache64[np.asarray(norm_bytes, dtype=np.uint8)]
        tf = f / (f + norm)
        if self.f32:
            return (np.float32(weight) * tf.astype(np.float32)).astype(np.float64)
        return float(weight) * tf

    def phrase_weight(self, terms) -> float:
        """idf of a phrase = sum of term idfs (BM25Similarity.java:172-181)."""
        s = float(np.sum(np.array([self.weights[t] for t in terms], dtype=np.float64)))
        return np.float32(s) if self.f32 else s


def eval_query(q: Query, seg: SegmentPostings, ctx: QueryContext, scoring: bool = True):
    """Evaluate a query on one segment → (docs sorted asc, scores float64).

    Scores are float64 carriers of float32-rounded per-term values; the final
    cast to float32 happens in :func:`topk` (matching Lucene's accumulate-in-
    double, return-float scorer contract).
    """
    if isinstance(q, MatchNoneQuery):
        return _EMPTY_I, _EMPTY_F
    if isinstance(q, MatchAllQuery):
        docs = np.arange(seg.max_doc, dtype=np.int64)
        return docs, np.ones(len(docs), dtype=np.float64)
    if isinstance(q, TermQuery):
        docs, freqs = seg.docs_freqs(q.term)
        if not scoring or len(docs) == 0:
            return docs, np.zeros(len(docs), dtype=np.float64)
        return docs, ctx.score(freqs, seg.norms[docs], ctx.weights[q.term])
    if isinstance(q, PhraseQuery):
        return _eval_phrase(q, seg, ctx, scoring)
    if isinstance(q, BooleanQuery):
        return _eval_bool(q, seg, ctx, scoring)
    raise TypeError(f"unknown query type {type(q)}")


def _eval_phrase(q: PhraseQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool):
    """Exact phrase via vectorized position intersection.

    ExactPhraseMatcher semantics (``ExactPhraseMatcher.java:36,117-148``):
    doc matches iff positions align as pos_i - rel_i all equal; freq = number
    of alignments; scored as one pseudo-term with idf = Σ term idfs
    (``BM25Similarity.idfExplain[]:172-181``).
    """
    keys = None
    for term, rel in zip(q.phrase_terms, q.positions):
        docs, freqs = seg.docs_freqs(term)
        if len(docs) == 0:
            return _EMPTY_I, _EMPTY_F
        pos, occ_off = seg.positions(term)
        doc_of_occ = np.repeat(docs, freqs)
        k = doc_of_occ * _POS_SHIFT + (pos - np.int64(rel))
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if len(keys) == 0:
            return _EMPTY_I, _EMPTY_F
    match_docs = (keys >> np.int64(32)).astype(np.int64)
    uniq, counts = np.unique(match_docs, return_counts=True)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    w = ctx.phrase_weight(q.phrase_terms)
    return uniq, ctx.score(counts, seg.norms[uniq], w)


def _eval_bool(q: BooleanQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool):
    # required part: MUST (scored) + FILTER (unscored)
    must_res = [eval_query(c, seg, ctx, scoring) for c in q.must]
    filt_res = [eval_query(c, seg, ctx, scoring=False) for c in q.filter]
    should_res = [eval_query(c, seg, ctx, scoring) for c in q.should]
    msm = q.min_should_match

    if q.must or q.filter:
        req = _intersect_sum(must_res + [(d, np.zeros(len(d))) for d, _ in filt_res])
        docs, scores = req
        if len(docs) and should_res and (scoring or msm > 0):
            u_docs, u_scores, u_cnt = _union_sum(should_res)
            if len(u_docs) == 0:
                if msm > 0:
                    docs, scores = _EMPTY_I, _EMPTY_F
            else:
                idx_c = np.minimum(np.searchsorted(u_docs, docs), len(u_docs) - 1)
                hit = u_docs[idx_c] == docs
                if msm > 0:
                    cnt = np.where(hit, u_cnt[idx_c], 0)
                    keep = cnt >= msm
                    docs, scores, hit, idx_c = docs[keep], scores[keep], hit[keep], idx_c[keep]
                if scoring:
                    scores = scores + np.where(hit, u_scores[idx_c], 0.0)
    else:
        docs, scores, cnt = _union_sum(should_res)
        if msm > 1:
            keep = cnt >= msm
            docs, scores = docs[keep], scores[keep]

    if q.must_not and len(docs):
        for c in q.must_not:
            ex_docs, _ = eval_query(c, seg, ctx, scoring=False)
            docs, scores = _setdiff(docs, scores, ex_docs)
            if len(docs) == 0:
                break
    # a Scorer returns float32 (Scorer.score contract) — round the boolean
    # sum so enclosing queries consume float32 values like the reference
    if ctx.f32:
        scores = scores.astype(np.float32).astype(np.float64)
    return docs, scores


# ------------------------------------------------------------------- top-k --

def topk(docs: np.ndarray, scores: np.ndarray, k: int, f32: bool = True):
    """Per-segment top-k with the reference tie-break: score desc, doc asc
    (``HitQueue.java:76-81``). Returns (docs, scores) of length ≤ k."""
    s32 = scores.astype(np.float32) if f32 else scores
    if len(docs) > max(k * 8, 1024):
        # np.partition gives the exact kth-largest score; every candidate for
        # the top-k (under score-desc, doc-asc tie-break) has score >= kth.
        kth = np.partition(s32, len(s32) - k)[len(s32) - k]
        cand = np.flatnonzero(s32 >= kth)
        order = np.lexsort((docs[cand], -s32[cand]))[:k]
        sel = cand[order]
        return docs[sel], s32[sel]
    order = np.lexsort((docs, -s32))[:k]
    return docs[order], s32[order]


def topk_term_pruned(term: str, seg: SegmentPostings, ctx: QueryContext, k: int):
    """Block-max pruned top-k for a single term (ImpactsDISI analogue).

    Decode blocks in decreasing upper-bound order; stop when the next block's
    bound cannot beat the current kth score. Identical results to exhaustive
    scoring (property-tested).
    """
    if term not in seg.rows:
        return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
    blk_last, blk_maxf, blk_minn = seg.blocks(term)
    w = ctx.weights[term]
    # admissible block bound: score(max_freq, min_norm) — monotone in both
    # (CompetitiveImpactAccumulator/MaxScoreCache role, SURVEY §2.3)
    ubs = ctx.score(blk_maxf.astype(np.float64), blk_minn, w)
    nblocks = len(ubs)
    if nblocks <= 2:
        docs, scores = eval_query(TermQuery(term), seg, ctx)
        return topk(docs, scores, k, ctx.f32)
    docs, freqs = seg.docs_freqs(term)  # decode once; pruning saves scoring
    order = np.argsort(-ubs, kind="stable")
    out_docs: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    theta = -np.inf
    count = 0
    for bi in order:
        if ubs[bi] < theta:
            break
        s = bi * BLOCK_SIZE
        e = min(s + BLOCK_SIZE, len(docs))
        d = docs[s:e]
        out_docs.append(d)
        out_scores.append(ctx.score(freqs[s:e], seg.norms[d], w))
        count += len(d)
        if count >= k:
            alls = np.concatenate(out_scores)
            if len(alls) >= k:
                theta = np.partition(alls, len(alls) - k)[len(alls) - k]
    docs_c = np.concatenate(out_docs) if out_docs else _EMPTY_I
    scores_c = np.concatenate(out_scores) if out_scores else _EMPTY_F
    return topk(docs_c, scores_c, k, ctx.f32)
