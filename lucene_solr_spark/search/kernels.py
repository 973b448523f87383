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
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MultiPhraseQuery,
    PhraseQuery,
    Query,
    SynonymQuery,
    TermQuery,
)

_EMPTY_I = np.empty(0, dtype=np.int64)
_EMPTY_F = np.empty(0, dtype=np.float64)

_POS_SHIFT = np.int64(1) << np.int64(32)


class SegmentPostings:
    """Lazy decoder over one segment's posting rows for the query's terms.

    ``rows[term]`` is a LIST of posting rows sorted by ``shard`` — normally
    one row, but hot terms stay sharded after a merge (salted path). Every
    row is SELF-CONTAINED: its first VByte doc value is absolute, so shards
    decode independently (parallelizable at scale) and concatenate.

    ``deleted`` is the segment's tombstone set (live-docs analogue,
    ``Lucene50LiveDocsFormat``): matching docs are masked out after decode,
    positions of deleted docs are dropped before phrase matching. Block
    metadata is NOT rewritten on delete — the stored per-block bounds remain
    admissible (removing docs can only lower the true block max).
    """

    def __init__(
        self,
        rows: dict[str, list[dict]],
        norms: np.ndarray,
        max_doc: int,
        deleted: np.ndarray | None = None,
    ):
        self.rows = rows  # term -> [ {doc_blob, freq_blob, pos_blob, blk_*, df}, ... ]
        self.norms = norms
        self.max_doc = max_doc
        self.deleted = deleted if deleted is not None and len(deleted) else None
        self._raw: dict[str, tuple] = {}
        self._docs: dict[str, tuple] = {}
        self._pos: dict[str, tuple] = {}

    def _cat(self, term: str, col: str) -> np.ndarray:
        parts = [np.frombuffer(r[col], dtype=np.uint8) for r in self.rows[term]]
        return parts[0] if len(parts) == 1 else np.concatenate(parts)

    def docs_freqs_raw(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Decoded (docs, freqs) BEFORE delete masking (block-aligned)."""
        if term not in self.rows:
            return _EMPTY_I, _EMPTY_I
        if term not in self._raw:
            rows = self.rows[term]
            # each shard row decodes independently (first value absolute)
            docs_parts = [
                np.cumsum(
                    vbyte_decode(np.frombuffer(r["doc_blob"], np.uint8)).astype(np.int64)
                )
                for r in rows
            ]
            docs = docs_parts[0] if len(rows) == 1 else np.concatenate(docs_parts)
            freqs = vbyte_decode(self._cat(term, "freq_blob")).astype(np.int64)
            self._raw[term] = (docs, freqs)
        return self._raw[term]

    def docs_freqs(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        if term not in self.rows:
            return _EMPTY_I, _EMPTY_I
        if term not in self._docs:
            docs, freqs = self.docs_freqs_raw(term)
            if self.deleted is not None and len(docs):
                keep = ~np.isin(docs, self.deleted)
                self._docs[term] = (docs[keep], freqs[keep], keep)
            else:
                self._docs[term] = (docs, freqs, None)
        d, f, _ = self._docs[term]
        return d, f

    def positions(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """Returns (flat positions, per-posting start offsets incl. end) —
        aligned with the delete-masked docs_freqs."""
        docs, freqs = self.docs_freqs(term)
        if term not in self._pos:
            _, raw_freqs = self.docs_freqs_raw(term)
            deltas = vbyte_decode(self._cat(term, "pos_blob")).astype(np.int64)
            occ_starts = np.zeros(len(raw_freqs), dtype=np.int64)
            np.cumsum(raw_freqs[:-1], out=occ_starts[1:])
            pos = delta_decode_lists(deltas, occ_starts)
            keep = self._docs[term][2]
            if keep is not None:
                pos = pos[np.repeat(keep, raw_freqs)]
            occ2 = np.zeros(len(freqs), dtype=np.int64)
            if len(freqs):
                np.cumsum(freqs[:-1], out=occ2[1:])
            self._pos[term] = (pos, np.append(occ2, len(pos)))
        return self._pos[term]

    def blocks(self, term: str):
        """Per-block (start, end, last_doc, max_freq, min_norm) over the RAW
        posting order — offsets account for shard boundaries (each shard is
        independently 128-blocked)."""
        rows = self.rows[term]
        last = np.concatenate([np.frombuffer(r["blk_last"], np.int32) for r in rows])
        maxf = np.concatenate([np.frombuffer(r["blk_maxf"], np.int32) for r in rows])
        minn = np.concatenate([np.frombuffer(r["blk_minn"], np.uint8) for r in rows])
        lens = np.concatenate(
            [np.frombuffer(r["blk_len"], np.int32) for r in rows]
        ).astype(np.int64)
        ends = np.cumsum(lens)
        starts = ends - lens
        return starts, ends, last, maxf, minn


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

    def __init__(
        self,
        weights: dict[str, float],
        cache: np.ndarray,
        f32: bool = True,
        dfs: dict[str, int] | None = None,
        doc_count: int = 0,
    ):
        dt = np.float32 if f32 else np.float64
        self.f32 = f32
        self.weights = {t: dt(w) for t, w in weights.items()}
        self.cache = cache.astype(dt)
        self.cache64 = self.cache.astype(np.float64)  # exact widening
        self.dfs = dfs or {}
        self.doc_count = doc_count

    def synonym_weight(self, terms) -> float:
        """Pseudo-term idf with df = max over the synonyms
        (``SynonymQuery.java:204-218``)."""
        df = max((self.dfs.get(t, 0) for t in terms), default=0)
        if df == 0:
            return 0.0
        w = np.log1p((self.doc_count - df + 0.5) / (df + 0.5))
        return np.float32(w) if self.f32 else float(w)

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
    if isinstance(q, MultiPhraseQuery):
        return _eval_multi_phrase(q, seg, ctx, scoring)
    if isinstance(q, BooleanQuery):
        return _eval_bool(q, seg, ctx, scoring)
    if isinstance(q, ConstantScoreQuery):
        docs, _ = eval_query(q.inner, seg, ctx, scoring=False)
        return docs, np.full(len(docs), np.float64(np.float32(q.boost)) if ctx.f32 else q.boost)
    if isinstance(q, BoostQuery):
        docs, scores = eval_query(q.inner, seg, ctx, scoring)
        if scoring:
            scores = scores * q.boost
            if ctx.f32:
                scores = scores.astype(np.float32).astype(np.float64)
        return docs, scores
    if isinstance(q, SynonymQuery):
        return _eval_synonym(q, seg, ctx, scoring)
    if isinstance(q, DisjunctionMaxQuery):
        return _eval_dismax(q, seg, ctx, scoring)
    raise TypeError(f"unknown query type {type(q)}")


def _eval_synonym(q: SynonymQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool):
    """Union with freq-sum, scored as one pseudo-term (SynonymScorer.freq)."""
    pairs = [seg.docs_freqs(t) for t in q.syn_terms]
    non_empty = [(d, f.astype(np.float64)) for d, f in pairs if len(d)]
    if not non_empty:
        return _EMPTY_I, _EMPTY_F
    docs = np.concatenate([d for d, _ in non_empty])
    freqs = np.concatenate([f for _, f in non_empty])
    uniq, inv = np.unique(docs, return_inverse=True)
    fsum = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(fsum, inv, freqs)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    w = ctx.synonym_weight(q.syn_terms)
    return uniq, ctx.score(fsum, seg.norms[uniq], w)


def _eval_dismax(q: DisjunctionMaxQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool):
    """max + tiebreak·(sum − max) over disjuncts (DisjunctionMaxScorer)."""
    results = [eval_query(d, seg, ctx, scoring) for d in q.disjuncts]
    non_empty = [(d, s) for d, s in results if len(d)]
    if not non_empty:
        return _EMPTY_I, _EMPTY_F
    docs = np.concatenate([d for d, _ in non_empty])
    scores = np.concatenate([s for _, s in non_empty])
    uniq, inv = np.unique(docs, return_inverse=True)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    mx = np.full(len(uniq), -np.inf)
    np.maximum.at(mx, inv, scores)
    sm = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(sm, inv, scores)
    out = mx + q.tiebreak * (sm - mx)
    if ctx.f32:
        out = out.astype(np.float32).astype(np.float64)
    return uniq, out


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


def _eval_multi_phrase(
    q: MultiPhraseQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool
):
    """MultiPhraseQuery (``search/MultiPhraseQuery.java:56``): per slot, the
    occurrence keys are the UNION over the slot's alternatives (a union of
    ``doc·2³² + (pos − rel)`` arrays), then slots intersect exactly like the
    exact-phrase matcher. idf = Σ idf over all alternative terms."""
    keys = None
    for slot, rel in zip(q.slots, q.positions):
        slot_keys = []
        for term in slot:
            docs, freqs = seg.docs_freqs(term)
            if len(docs) == 0:
                continue
            pos, _ = seg.positions(term)
            doc_of_occ = np.repeat(docs, freqs)
            slot_keys.append(doc_of_occ * _POS_SHIFT + (pos - np.int64(rel)))
        if not slot_keys:
            return _EMPTY_I, _EMPTY_F
        k = np.unique(np.concatenate(slot_keys))
        keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
        if len(keys) == 0:
            return _EMPTY_I, _EMPTY_F
    match_docs = (keys >> np.int64(32)).astype(np.int64)
    uniq, counts = np.unique(match_docs, return_counts=True)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    w = ctx.phrase_weight([t for slot in q.slots for t in slot])
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


def topk_or_pruned(terms: list[str], seg: SegmentPostings, ctx: QueryContext, k: int):
    """Block-max WAND for a pure term disjunction (``WANDScorer.java:45``,
    Broder et al. WAND + Ding & Suel block-max), bulk-evaluated:

    1. *theta seed*: per-term top-k blocks give candidate docs; their EXACT
       disjunction scores (searchsorted lookup into every term's postings)
       seed ``theta`` = kth-best candidate — a lower bound on the true kth
       score (kth-largest over a subset ≤ kth-largest overall).
    2. *block sweep*: elementary doc ranges are the union of all terms' block
       boundaries; each range's bound = Σ_i ub_i(block covering it) — the
       ``MaxScoreSumPropagator``/``WANDScorer`` head-sum at block granularity.
       Ranges with bound < theta are skipped wholesale (strict <, so an
       excluded doc's exact score is strictly below the kth — pruning can
       never change the (score desc, doc asc) top-k; property-tested).
    3. survivors are union-summed and top-k'd exactly.
    """
    present = [t for t in terms if t in seg.rows and ctx.weights.get(t, 0.0) != 0.0]
    if seg.deleted is not None or len(present) < 2:
        q = BooleanQuery(should=tuple(TermQuery(t) for t in terms))
        docs, scores = eval_query(q, seg, ctx)
        return topk(docs, scores, k, ctx.f32)

    blocks = {t: seg.blocks(t) for t in present}
    posting = {t: seg.docs_freqs_raw(t) for t in present}
    ubs = {
        t: ctx.score(blocks[t][3].astype(np.float64), blocks[t][4], ctx.weights[t])
        for t in present
    }
    exact = {
        t: ctx.score(posting[t][1], seg.norms[posting[t][0]], ctx.weights[t])
        for t in present
    }

    def _sum_at(cand: np.ndarray) -> np.ndarray:
        total = np.zeros(len(cand), dtype=np.float64)
        for t in present:
            docs_t = posting[t][0]
            idx = np.searchsorted(docs_t, cand)
            idx_c = np.minimum(idx, len(docs_t) - 1)
            hit = docs_t[idx_c] == cand
            total[hit] += exact[t][idx_c[hit]]
        if ctx.f32:
            total = total.astype(np.float32).astype(np.float64)
        return total

    # phase 1: theta seed from per-term best blocks
    seeds = []
    for t in present:
        order = np.argsort(-ubs[t], kind="stable")
        got = 0
        starts, ends = blocks[t][0], blocks[t][1]
        for bi in order:
            seeds.append(posting[t][0][starts[bi] : ends[bi]])
            got += int(ends[bi] - starts[bi])
            if got >= k:
                break
    cand = np.unique(np.concatenate(seeds))
    cand_scores = _sum_at(cand)
    if len(cand) >= k:
        theta = float(np.partition(cand_scores, len(cand) - k)[len(cand) - k])
    else:
        theta = -np.inf

    # phase 2: block sweep — elementary ranges from all block last-docs
    boundaries = np.unique(np.concatenate([blocks[t][2] for t in present]).astype(np.int64))
    range_ub = np.zeros(len(boundaries), dtype=np.float64)
    for t in present:
        last = blocks[t][2].astype(np.int64)
        idx = np.searchsorted(last, boundaries)  # block covering each range end
        covered = idx < len(last)
        range_ub[covered] += ubs[t][idx[covered]]
    live_range = range_ub >= theta

    kept_docs, kept_scores = [], []
    for t in present:
        docs_t = posting[t][0]
        rid = np.searchsorted(boundaries, docs_t)  # boundaries are inclusive ends
        keep = live_range[np.minimum(rid, len(boundaries) - 1)]
        kept_docs.append(docs_t[keep])
        kept_scores.append(exact[t][keep])
    docs_u, scores_u, _ = _union_sum(list(zip(kept_docs, kept_scores)))
    if ctx.f32:
        scores_u = scores_u.astype(np.float32).astype(np.float64)
    return topk(docs_u, scores_u, k, ctx.f32)


def topk_term_pruned(term: str, seg: SegmentPostings, ctx: QueryContext, k: int):
    """Block-max pruned top-k for a single term (ImpactsDISI analogue).

    Decode blocks in decreasing upper-bound order; stop when the next block's
    bound cannot beat the current kth score. Identical results to exhaustive
    scoring (property-tested).
    """
    if term not in seg.rows:
        return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
    if seg.deleted is not None:
        # deletes break block alignment of the masked arrays — exhaustive path
        docs, scores = eval_query(TermQuery(term), seg, ctx)
        return topk(docs, scores, k, ctx.f32)
    blk_start, blk_end, blk_last, blk_maxf, blk_minn = seg.blocks(term)
    w = ctx.weights[term]
    # admissible block bound: score(max_freq, min_norm) — monotone in both
    # (CompetitiveImpactAccumulator/MaxScoreCache role, SURVEY §2.3)
    ubs = ctx.score(blk_maxf.astype(np.float64), blk_minn, w)
    nblocks = len(ubs)
    if nblocks <= 2:
        docs, scores = eval_query(TermQuery(term), seg, ctx)
        return topk(docs, scores, k, ctx.f32)
    docs, freqs = seg.docs_freqs_raw(term)  # decode once; pruning saves scoring
    order = np.argsort(-ubs, kind="stable")
    out_docs: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    theta = -np.inf
    count = 0
    for bi in order:
        if ubs[bi] < theta:
            break
        s = int(blk_start[bi])
        e = int(blk_end[bi])
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
