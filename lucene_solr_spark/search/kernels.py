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

from ..codec import (
    BLOCK_SIZE,
    decode_blocked,
    decode_doc_deltas,
    decode_freq_values,
    delta_decode_lists,
    vbyte_decode,
)
from . import bm25
from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MultiPhraseQuery,
    PayloadScoreQuery,
    PhraseQuery,
    SpanPayloadCheckQuery,
    Query,
    SloppyPhraseQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanPositionRangeQuery,
    SpanTermQuery,
    SynonymQuery,
    TermAutomatonQuery,
    TermQuery,
)
from .intervals import IntervalQuery, eval_interval_query

_EMPTY_I = np.empty(0, dtype=np.int64)
_EMPTY_F = np.empty(0, dtype=np.float64)

_POS_SHIFT = np.int64(1) << np.int64(32)

# LMJelinekMercerSimilarity default λ (LMJelinekMercerSimilarity.java:47)
LMJM_LAMBDA = 0.1

# Similarities whose score is NOT monotone non-increasing in encoded length
# — the pruned kernels' (max_freq, min_norm) block bounds are inadmissible
# for these, so the executor routes them through exhaustive evaluation
# (the invariant documented in CLAUDE.md / codec.py).
UNPRUNABLE_SIMS = frozenset({"sweetspot"})


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
        self._pay: dict[str, tuple] = {}
        self._blkinfo: dict[str, dict] = {}
        self._partial: dict[str, "_PartialPostings"] = {}
        # instrumentation: postings actually decoded (block-skip evidence)
        self.decoded_postings = 0

    def partial(self, term: str) -> "_PartialPostings":
        """Segment-cached incremental decode state — partial decodes
        accumulate ACROSS the queries of a batch (a batch shares hot terms;
        re-decoding per query would forfeit the savings)."""
        if term not in self._partial:
            self._partial[term] = _PartialPostings(self, term)
        return self._partial[term]

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
            docs_parts, freq_parts = [], []
            for r in rows:
                deltas = decode_doc_deltas(
                    r["doc_blob"], r["blk_doc_boff"], r["blk_len"]
                )
                docs_parts.append(np.cumsum(deltas))
                freq_parts.append(
                    decode_freq_values(r["freq_blob"], r["blk_freq_boff"], r["blk_len"])
                )
                self.decoded_postings += len(deltas)
            docs = docs_parts[0] if len(rows) == 1 else np.concatenate(docs_parts)
            freqs = freq_parts[0] if len(rows) == 1 else np.concatenate(freq_parts)
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

    def payloads(self, term: str) -> tuple[np.ndarray, np.ndarray]:
        """(flat float32 payloads, per-posting occ starts incl. end) —
        aligned with the delete-masked docs_freqs (``PostingsEnum.PAYLOADS``
        stream; fixed-width float32 per occurrence in position order)."""
        docs, freqs = self.docs_freqs(term)
        if term not in self._pay:
            _, raw_freqs = self.docs_freqs_raw(term)
            pay = np.concatenate(
                [np.frombuffer(r["pay_blob"] or b"", np.float32) for r in self.rows[term]]
            ) if term in self.rows else np.empty(0, np.float32)
            if len(pay) != int(raw_freqs.sum()):
                raise ValueError(
                    f"no stored payloads for term {term!r} — the index was "
                    "built without store_payloads=True"
                )
            keep = self._docs[term][2]
            if keep is not None:
                pay = pay[np.repeat(keep, raw_freqs)]
            occ2 = np.zeros(len(freqs), dtype=np.int64)
            if len(freqs):
                np.cumsum(freqs[:-1], out=occ2[1:])
            self._pay[term] = (pay, np.append(occ2, len(pay)))
        return self._pay[term]

    def occurrences_at(self, term: str, cand: np.ndarray):
        """(docs, freqs, flat positions) of the term's postings RESTRICTED to
        candidate docs, decoding only the pos/doc blocks that cover them
        (the lazy-positions behaviour of ``Lucene50PostingsReader`` — skip
        data carries the positions file pointer). Falls back to the cached
        full decode when the term is already decoded, deletes are present,
        or the candidates cover most blocks anyway."""
        bi = self.block_meta(term)
        nblk = len(bi["lens"])
        pp = self.partial(term)
        sel = pp.covering_blocks(cand)
        if (
            self.deleted is not None
            or term in self._pos
            or len(sel) * 4 >= nblk
            or len(self.rows[term]) > 1  # sharded rows: keep the simple path
        ):
            # returning the full (cached) arrays is correct — the caller's
            # key intersection restricts to matches; slicing a huge
            # candidate set would cost more than it saves
            docs, freqs = self.docs_freqs(term)
            pos, _ = self.positions(term)
            return docs, freqs, pos
        # block-sliced decode through the shared partial cache: the phrase
        # conjunction loop decoded covering blocks into partial(term) already,
        # so only blocks it hasn't seen unpack here; positions decode via
        # blk_pos_boff slices (pos deltas reset at every posting, so block
        # slices decode independently)
        pp.extend(sel)
        d, f = pp.postings_in_blocks(sel)
        r = self.rows[term][0]
        pboff = np.frombuffer(r["blk_pos_boff"], np.int32).astype(np.int64)
        blob = np.frombuffer(r["pos_blob"], np.uint8)
        pnb = np.diff(np.append(pboff, len(blob)))
        parts = [blob[pboff[b] : pboff[b] + pnb[b]] for b in sel]
        deltas = vbyte_decode(np.concatenate(parts) if parts else np.empty(0, np.uint8))
        occ_starts = np.zeros(len(f), dtype=np.int64)
        if len(f):
            np.cumsum(f[:-1], out=occ_starts[1:])
        pos = delta_decode_lists(deltas.astype(np.int64), occ_starts)
        # restrict to candidate docs (vectorized region gather)
        idx = np.searchsorted(d, cand)
        idx = idx[idx < len(d)]
        idx = np.unique(idx[np.isin(d[idx], cand)])
        if not len(idx):
            return (
                np.empty(0, np.int64),
                np.empty(0, np.int64),
                np.empty(0, np.int64),
            )
        lens = f[idx]
        base = np.repeat(occ_starts[idx], lens)
        intra = np.arange(int(lens.sum()), dtype=np.int64) - np.repeat(
            np.concatenate(([0], np.cumsum(lens)[:-1])), lens
        )
        return d[idx], f[idx], pos[base + intra]

    def blocks(self, term: str):
        """Per-block (start, end, last_doc, max_freq, min_norm) over the RAW
        posting order — offsets account for shard boundaries (each shard is
        independently 128-blocked)."""
        bi = self.block_meta(term)
        return bi["starts"], bi["ends"], bi["last"], bi["maxf"], bi["minn"]

    def block_meta(self, term: str) -> dict:
        """Full per-block table over the term's concatenated shard rows —
        impact metadata PLUS the byte-offset skip data (blk_*_boff), row
        ownership and per-block byte lengths (the ``Lucene50SkipWriter``
        file-pointer role). No blob bytes are touched here."""
        if term in self._blkinfo:
            return self._blkinfo[term]
        rows = self.rows[term]
        last_p, maxf_p, minn_p, lens_p = [], [], [], []
        dboff_p, fboff_p, dnb_p, fnb_p, row_p, rowfirst_p = [], [], [], [], [], []
        for i, r in enumerate(rows):
            lens = np.frombuffer(r["blk_len"], np.int32).astype(np.int64)
            dboff = np.frombuffer(r["blk_doc_boff"], np.int32).astype(np.int64)
            fboff = np.frombuffer(r["blk_freq_boff"], np.int32).astype(np.int64)
            dnb = np.diff(np.append(dboff, len(r["doc_blob"])))
            fnb = np.diff(np.append(fboff, len(r["freq_blob"])))
            last_p.append(np.frombuffer(r["blk_last"], np.int32))
            maxf_p.append(np.frombuffer(r["blk_maxf"], np.int32))
            minn_p.append(np.frombuffer(r["blk_minn"], np.uint8))
            lens_p.append(lens)
            dboff_p.append(dboff)
            fboff_p.append(fboff)
            dnb_p.append(dnb)
            fnb_p.append(fnb)
            row_p.append(np.full(len(lens), i, dtype=np.int64))
            first = np.zeros(len(lens), dtype=bool)
            if len(first):
                first[0] = True
            rowfirst_p.append(first)
        cat = np.concatenate
        lens = cat(lens_p)
        ends = np.cumsum(lens)
        bi = {
            "starts": ends - lens,
            "ends": ends,
            "last": cat(last_p),
            "maxf": cat(maxf_p),
            "minn": cat(minn_p),
            "lens": lens,
            "doc_boff": cat(dboff_p),
            "freq_boff": cat(fboff_p),
            "doc_nbytes": cat(dnb_p),
            "freq_nbytes": cat(fnb_p),
            "row": cat(row_p),
            "row_first": cat(rowfirst_p),
        }
        self._blkinfo[term] = bi
        return bi

    def decode_block_subset(self, term: str, sel: np.ndarray):
        """Decode ONLY the selected blocks (indices into block_meta order).
        Returns (docs, freqs, out_starts): docs/freqs concatenate the
        selected blocks in ascending block order, out_starts marks each
        block's slice. The ImpactsDISI skip-pointer decode path — bytes of
        unselected blocks are never unpacked."""
        bi = self.block_meta(term)
        sel = np.sort(np.asarray(sel, dtype=np.int64))
        rows = self.rows[term]
        lens_sel = bi["lens"][sel]
        out_starts = np.concatenate(([0], np.cumsum(lens_sel)[:-1]))
        docs = np.empty(int(lens_sel.sum()), dtype=np.int64)
        freqs = np.empty_like(docs)
        # per-block doc base: previous block's last doc (row-first blocks
        # carry an absolute first delta, base 0)
        bases = np.zeros(len(sel), dtype=np.int64)
        not_first = ~bi["row_first"][sel]
        bases[not_first] = bi["last"][sel[not_first] - 1]
        for i in np.unique(bi["row"][sel]):
            m = bi["row"][sel] == i
            s = sel[m]
            r = rows[int(i)]
            d = decode_blocked(
                np.frombuffer(r["doc_blob"], np.uint8),
                bi["doc_boff"][s],
                bi["doc_nbytes"][s],
                bi["lens"][s],
                prefix=True,
            ).astype(np.int64)
            f = decode_blocked(
                np.frombuffer(r["freq_blob"], np.uint8),
                bi["freq_boff"][s],
                bi["freq_nbytes"][s],
                bi["lens"][s],
                prefix=False,
            ).astype(np.int64)
            # segmented cumsum per block, then shift by each block's base
            local_starts = np.concatenate(([0], np.cumsum(bi["lens"][s])[:-1]))
            d = delta_decode_lists(d, local_starts) + np.repeat(bases[m], bi["lens"][s])
            tgt = (
                np.repeat(out_starts[m] - local_starts, bi["lens"][s])
                + np.arange(int(bi["lens"][s].sum()))
            )
            docs[tgt] = d
            freqs[tgt] = f
            self.decoded_postings += len(d)
        return docs, freqs, out_starts


# ------------------------------------------------------------- combinators --

def _union_sum(results: list[tuple[np.ndarray, np.ndarray]]):
    """k-way union; returns (docs sorted, score_sum float64, match_count)."""
    non_empty = [(d, s) for d, s in results if len(d)]
    if not non_empty:
        return _EMPTY_I, _EMPTY_F, _EMPTY_I
    docs = np.concatenate([d for d, _ in non_empty])
    scores = np.concatenate([s for _, s in non_empty])
    uniq, inv = np.unique(docs, return_inverse=True)
    # bincount-with-weights is the buffered sum (np.add.at is the unbuffered
    # per-element fallback, ~10-30x slower on the disjunction hot path)
    acc = np.bincount(inv, weights=scores, minlength=len(uniq))
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
        sim: str = "bm25",
        total_tokens: int = 0,
        ttfs: dict[str, int] | None = None,
    ):
        dt = np.float32 if f32 else np.float64
        self.f32 = f32
        # "bm25" | "classic" | "lmd" | "lmjm" | "inl2" | "dfi" | "ibll"
        # | "ax2exp" | "ax2log" | "ax3exp" | "ax3log" | DFR gl2/ifl2/inel2
        # | "ax1log" | "sweetspot" (SURVEY §2.7)
        self.sim = sim
        self.weights = {t: dt(w) for t, w in weights.items()}
        self.cache = cache.astype(dt)
        self.cache64 = self.cache.astype(np.float64)  # exact widening
        self.dfs = dfs or {}
        self.doc_count = doc_count
        # sumTotalTermFreq — needed only to undo DFI's per-term +1 smoothing
        # when synonym members' weights are summed
        self.total_tokens = total_tokens
        # per-term totalTermFreq — needed by the ttf-based DFR basic models
        # (G / I(F) / I(ne)) whose synonym pseudo-term stats sum members' F
        self.ttfs = ttfs or {}

    def synonym_weight(self, terms) -> float:
        """Pseudo-term weight for a synonym group: df = max over the
        synonyms for the idf-style sims (``SynonymQuery.java:204-218``);
        under LMD the pseudo collection probability is the SUM of the
        members' (freq sums ⇒ probabilities sum)."""
        if self.sim in ("lmd", "lmjm", "dfi"):
            # collection-probability-style weights: members' freqs sum, so
            # their probabilities (and DFI expected counts) sum too
            w = float(sum(float(self.weights.get(t, 0.0)) for t in terms))
            if self.sim == "dfi":
                # per-member weights each carry a +1 smoothing
                # ((ttf+1)/(T+1)); the pseudo-term gets ONE smoothing over
                # the SUMMED ttf (SynonymQuery builds a single
                # TermStatistics) — subtract the extras
                n_pos = sum(1 for t in terms if float(self.weights.get(t, 0.0)) > 0.0)
                if n_pos == 0:
                    return 0.0
                w -= (n_pos - 1) / (self.total_tokens + 1.0)
            return w
        if self.sim in ("gl2", "ifl2", "inel2"):
            # ttf-based DFR basic models: the pseudo-term's F is the SUM of
            # members' totalTermFreq (SynonymQuery single TermStatistics)
            F = sum(self.ttfs.get(t, 0) for t in terms)
            if F <= 0:
                return 0.0
            N = self.doc_count
            if self.sim == "gl2":
                w = (F + 1.0) / (N + F + 1.0)  # λ (BasicModelG.java:38-39)
            elif self.sim == "ifl2":
                w = np.log2(1.0 + (N + 1.0) / (F + 0.5))
            else:
                ne = N * (1.0 - ((N - 1.0) / N) ** F)
                w = np.log2((N + 1.0) / (ne + 0.5))
            return float(w)
        df = max((self.dfs.get(t, 0) for t in terms), default=0)
        if df == 0:
            return 0.0
        if self.sim in ("classic", "sweetspot"):
            w = 1.0 + np.log((self.doc_count + 1) / (df + 1.0))
        elif self.sim == "inl2":
            w = np.log2((self.doc_count + 1) / (df + 0.5))
        elif self.sim == "ibll":
            # LambdaDF over the pseudo-term df (LambdaDF.java:32-38)
            w = (df + 1.0) / (self.doc_count + 1.0)
        elif self.sim in ("ax2exp", "ax3exp"):
            # F2/F3EXP idf over the pseudo-term df (AxiomaticF2EXP.java:
            # 99-101, AxiomaticF3EXP.java:100-103)
            w = ((self.doc_count + 1.0) / df) ** 0.35
        elif self.sim in ("ax1log", "ax2log", "ax3log"):
            # F1/F2/F3LOG idf over the pseudo-term df (AxiomaticF1LOG.java:
            # 79-80, AxiomaticF2LOG.java:77-79, AxiomaticF3LOG.java:90-93)
            w = np.log((self.doc_count + 1.0) / df)
        else:
            w = np.log1p((self.doc_count - df + 0.5) / (df + 0.5))
        return np.float32(w) if self.f32 else float(w)

    def score(self, freqs: np.ndarray, norm_bytes: np.ndarray, weight) -> np.ndarray:
        """Per-posting score under the active similarity; float64 carrier.

        - bm25 (default): weight · freq/(freq + normCache) — the reference
          formula with exact float32 rounding in f32 mode.
        - classic (``ClassicSimilarity.java:52-76``): weight(=boost·idf) ·
          sqrt(freq) · lengthNorm[normByte].
        - lmd (``LMDirichletSimilarity.java:70-90``): max(0, ln(1 +
          freq/(µ·p(t|C))) + lnNorm[normByte]) with weight = µ·p(t|C).
        - lmjm (``LMJelinekMercerSimilarity.java:60-76``, λ=0.1): ln(1 +
          (1−λ)/λ · freq·invLen[normByte] / p(t|C)) with weight = p(t|C).
        - inl2 (``DFRSimilarity.java:63`` with BasicModelIn/AfterEffectL/
          NormalizationH2, c=1): weight · tfn/(tfn+1) where tfn =
          freq·log2(1+avgdl/dl)[normByte] and weight = log2((N+1)/(n+0.5)).
        All of the above are monotone ↑ in freq and ↓ in encoded length, so
        the block-max pruning bound stays admissible unchanged. sweetspot
        (classic idf · sqrt(freq) · plateau lengthNorm) is NOT monotone in
        length — it is in :data:`UNPRUNABLE_SIMS` and the executor routes
        it around the pruned kernels; any future non-monotone model must
        join that set.
        """
        f = np.asarray(freqs, dtype=np.float64)
        norm = self.cache64[np.asarray(norm_bytes, dtype=np.uint8)]
        if self.sim in ("classic", "sweetspot"):
            # sweetspot default baselineTf (min=base=0) is sqrt(freq), the
            # classic tf (SweetSpotSimilarity.java:141-165); only the norm
            # table differs (plateau lengthNorm)
            out = float(weight) * np.sqrt(f) * norm
        elif self.sim == "lmd":
            w = float(weight)
            if w <= 0.0:
                return np.zeros(len(f), dtype=np.float64)
            out = np.maximum(np.log1p(f / w) + norm, 0.0)
        elif self.sim == "lmjm":
            w = float(weight)
            if w <= 0.0:
                return np.zeros(len(f), dtype=np.float64)
            out = np.log1p((1.0 - LMJM_LAMBDA) / LMJM_LAMBDA * f * norm / w)
        elif self.sim in ("inl2", "ifl2", "inel2"):
            # shared DFR shape (AfterEffectL + NormalizationH2): the basic
            # model contributes only the per-term scalar A (In: log2((N+1)/
            # (n+0.5)); IF: log2(1+(N+1)/(F+0.5)), BasicModelIF.java:34-44;
            # Ine: log2((N+1)/(ne+0.5)), BasicModelIne.java:34-44) —
            # score = A · tfn/(tfn+1)
            tfn = f * norm
            out = float(weight) * tfn / (tfn + 1.0)
        elif self.sim == "gl2":
            # BasicModelG + AfterEffectL + H2 (BasicModelG.java:36-49):
            # λ = (F+1)/(N+F+1) rides in as the weight; with aeTimes1pTfn=1
            # score = B − (B−A)/(1+tfn), A = log2(1+λ), B = log2((1+λ)/λ).
            # B ≥ A (λ ≤ 1) keeps it monotone ↑ tfn → bounds admissible.
            lam = float(weight)
            if lam <= 0.0:
                return np.zeros(len(f), dtype=np.float64)
            a = np.log2(1.0 + lam)
            b = np.log2((1.0 + lam) / lam)
            tfn = f * norm
            out = b - (b - a) / (1.0 + tfn)
        elif self.sim == "ax1log":
            # AxiomaticF1LOG (AxiomaticF1LOG.java:54-64, Axiomatic.java:
            # 104-110): score = (1+ln(1+ln(f+1))) · lnNorm[normByte] · idf,
            # idf = ln((N+1)/df) riding in as the weight, tfln = 1, γ = 0
            out = float(weight) * norm * (1.0 + np.log1p(np.log1p(f)))
        elif self.sim in ("ax3exp", "ax3log"):
            # Axiomatic F3 family (AxiomaticF3EXP.java:75-109 /
            # AxiomaticF3LOG.java:66-99, Axiomatic.java:104-112): ln = tfln
            # = 1; score = max(0, (1+ln(1+ln(f+1)))·idf − γ[normByte]) with
            # γ = (dl − queryLen)·s·queryLen/avgdl riding in as the norm
            # cache. γ grows with dl and the clamp preserves monotonicity,
            # so the (max_freq, min_norm) block bound stays admissible.
            out = np.maximum(
                float(weight) * (1.0 + np.log1p(np.log1p(f))) - norm, 0.0
            )
        elif self.sim == "dfi":
            # DFISimilarity.java:55-64 with IndependenceStandardized
            # (IndependenceStandardized.java:37): expected = w·dl where the
            # norm cache holds RAW decoded lengths and w = (ttf+1)/(T+1);
            # score = log2((freq−e)/sqrt(e) + 1), zero when freq ≤ e.
            e = float(weight) * norm
            with np.errstate(divide="ignore", invalid="ignore"):
                measure = (f - e) / np.sqrt(e)
                out = np.where(f > e, np.log2(measure + 1.0), 0.0)
            out = np.nan_to_num(out, nan=0.0, posinf=0.0)
        elif self.sim == "ibll":
            # IBSimilarity.java:77-82 with DistributionLL/LambdaDF/H2:
            # score = −ln(λ/(tfn+λ)) = ln1p(tfn/λ); norm cache = H2 table,
            # weight = λ = (df+1)/(N+1) (DistributionLL.java:33-35)
            lam = float(weight)
            if lam <= 0.0:
                return np.zeros(len(f), dtype=np.float64)
            out = np.log1p(f * norm / lam)
        else:
            # bm25 AND ax2exp: both are w·f/(f+norm) with their own norm
            # table (BM25: k1·(1−b+b·dl/avgdl); F2EXP: s+s·dl/avgdl,
            # ``AxiomaticF2EXP.java:91-93``) and weight (BM25 idf·(k1+1);
            # F2EXP ((N+1)/df)^k)
            tf = f / (f + norm)
            if self.f32:
                return (np.float32(weight) * tf.astype(np.float32)).astype(np.float64)
            return float(weight) * tf
        if self.f32:
            out = out.astype(np.float32).astype(np.float64)
        return out

    def phrase_weight(self, terms) -> float:
        """idf of a phrase = sum of term idfs (BM25Similarity.java:172-181)."""
        s = float(np.sum(np.array([self.weights[t] for t in terms], dtype=np.float64)))
        return np.float32(s) if self.f32 else s


def first_k_matches(
    q: Query, seg: SegmentPostings, ctx: QueryContext, k: int, reverse: bool = False
) -> np.ndarray:
    """Early-terminating match collection for a SORTED segment (index sort:
    local docID order == sort-field order). The ``TopFieldCollector``
    early-termination role (``reference search/TopFieldCollector.java:52-76``
    ``canEarlyTerminate`` — when the query sort is a prefix of the index
    sort, collection stops after k competitive hits per leaf).

    MatchAll needs no postings at all (the first/last k local ids); a
    single-row term query decodes blocks from the relevant end of the
    posting list and STOPS once k docs are gathered — trailing blocks'
    bytes are never unpacked. Everything else falls back to full match
    evaluation and keeps the head/tail k.
    """
    if k <= 0:
        return _EMPTY_I
    if isinstance(q, MatchAllQuery) and seg.deleted is None:
        n = min(k, seg.max_doc)
        return (
            np.arange(n, dtype=np.int64)
            if not reverse
            else np.arange(seg.max_doc - n, seg.max_doc, dtype=np.int64)
        )
    if (
        isinstance(q, TermQuery)
        and seg.deleted is None
        and q.term in seg.rows
        and q.term not in seg._raw
        and len(seg.rows[q.term]) == 1  # sharded hot terms: rows interleave
    ):
        bi = seg.block_meta(q.term)
        lens = bi["lens"]
        order = range(len(lens)) if not reverse else range(len(lens) - 1, -1, -1)
        take, cnt = [], 0
        for b in order:
            take.append(b)
            cnt += int(lens[b])
            if cnt >= k:
                break
        docs, _, _ = seg.decode_block_subset(q.term, np.array(take, dtype=np.int64))
        return docs[:k] if not reverse else docs[-k:]
    docs, _ = eval_query(q, seg, ctx, scoring=False)
    return docs[:k] if not reverse else docs[len(docs) - min(k, len(docs)):]


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
        if seg.deleted is not None:  # live-docs mask, like every other leaf
            docs = docs[~np.isin(docs, seg.deleted)]
        return docs, np.ones(len(docs), dtype=np.float64)
    if isinstance(q, TermQuery):
        docs, freqs = seg.docs_freqs(q.term)
        if not scoring or len(docs) == 0:
            return docs, np.zeros(len(docs), dtype=np.float64)
        return docs, ctx.score(freqs, seg.norms[docs], ctx.weights[q.term])
    if isinstance(q, PayloadScoreQuery):
        return _eval_payload(q, seg, ctx, scoring)
    if isinstance(q, SpanPayloadCheckQuery):
        return _eval_payload_check(q, seg, ctx, scoring)
    if isinstance(q, SloppyPhraseQuery):
        return _eval_sloppy_phrase(q, seg, ctx, scoring)
    if isinstance(
        q,
        (SpanNearQuery, SpanTermQuery, SpanOrQuery, SpanNotQuery, SpanFirstQuery,
         SpanPositionRangeQuery),
    ):
        return _eval_spans(q, seg, ctx, scoring)
    if isinstance(q, PhraseQuery):
        return _eval_phrase(q, seg, ctx, scoring)
    if isinstance(q, MultiPhraseQuery):
        return _eval_multi_phrase(q, seg, ctx, scoring)
    if isinstance(q, IntervalQuery):
        return eval_interval_query(q, seg, ctx, scoring)
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
    if isinstance(q, TermAutomatonQuery):
        return _eval_term_automaton(q, seg, ctx, scoring)
    raise TypeError(f"unknown query type {type(q)}")


def _eval_payload(q: PayloadScoreQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool):
    """PayloadScoreQuery over a span term (PayloadScoreQuery.java:46,
    PayloadSpanScorer.scoreCurrentDoc): docScore = func over the doc's
    occurrence payloads (Min/Max/Sum/AveragePayloadFunction), times the
    wrapped term's similarity score when include_span_score. Payloads are
    accumulated in float like the reference (payloadScore is a float field),
    in occurrence order."""
    docs, freqs = seg.docs_freqs(q.term)
    if not scoring or len(docs) == 0:
        return docs, np.zeros(len(docs), dtype=np.float64)
    pay, starts = seg.payloads(q.term)
    st = starts[:-1]
    acc = pay if ctx.f32 else pay.astype(np.float64)  # float accumulation
    if q.func == "sum":
        agg = np.add.reduceat(acc, st)
    elif q.func == "max":
        agg = np.maximum.reduceat(pay, st)
    elif q.func == "min":
        agg = np.minimum.reduceat(pay, st)
    elif q.func == "average":
        agg = np.add.reduceat(acc, st) / freqs.astype(acc.dtype)
    else:
        raise ValueError(f"unknown payload function {q.func!r}")
    scores = agg.astype(np.float64)
    if q.include_span_score:
        scores = scores * ctx.score(freqs, seg.norms[docs], ctx.weights[q.term])
        if ctx.f32:
            scores = scores.astype(np.float32).astype(np.float64)
    return docs, scores


def _eval_payload_check(
    q: SpanPayloadCheckQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool
):
    """SpanPayloadCheckQuery over a unit span (SpanPayloadCheckQuery.java:
    103-135 accept): an occurrence survives iff its payload equals the
    target; docs keep their surviving-occurrence count as the span freq and
    score through the similarity like any span query."""
    if len(q.payloads_to_match) != 1:
        raise ValueError("single-term span: exactly one payload to match")
    docs, freqs = seg.docs_freqs(q.term)
    if len(docs) == 0:
        return docs, np.zeros(0, dtype=np.float64)
    pay, starts = seg.payloads(q.term)
    hit = (pay == np.float32(q.payloads_to_match[0])).astype(np.int64)
    freq2 = np.add.reduceat(hit, starts[:-1])
    keep = freq2 > 0
    docs2 = docs[keep]
    if not scoring:
        return docs2, np.zeros(len(docs2), dtype=np.float64)
    return docs2, ctx.score(freq2[keep], seg.norms[docs2], ctx.weights[q.term])


def _eval_synonym(q: SynonymQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool):
    """Union with freq-sum, scored as one pseudo-term (SynonymScorer.freq)."""
    pairs = [seg.docs_freqs(t) for t in q.syn_terms]
    non_empty = [(d, f.astype(np.float64)) for d, f in pairs if len(d)]
    if not non_empty:
        return _EMPTY_I, _EMPTY_F
    docs = np.concatenate([d for d, _ in non_empty])
    freqs = np.concatenate([f for _, f in non_empty])
    uniq, inv = np.unique(docs, return_inverse=True)
    fsum = np.bincount(inv, weights=freqs, minlength=len(uniq))
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
    if seg.deleted is None:
        # candidate docs first (AND-style leapfrog: rarest term decoded in
        # full, the others only where candidates land), then occurrence keys
        # restricted to candidates with lazily-decoded position blocks —
        # Lucene reads positions through the skip pointers the same way
        uniq_terms = list(dict.fromkeys(q.phrase_terms))
        if any(t not in seg.rows for t in uniq_terms):
            return _EMPTY_I, _EMPTY_F
        by_df = sorted(
            uniq_terms, key=lambda t: sum(int(r["df"]) for r in seg.rows[t])
        )
        cand = seg.docs_freqs(by_df[0])[0]
        for t in by_df[1:]:
            if len(cand) == 0:
                return _EMPTY_I, _EMPTY_F
            pp = seg.partial(t)
            pp.extend(pp.covering_blocks(cand))
            if not len(pp.docs):
                return _EMPTY_I, _EMPTY_F
            idx = np.minimum(np.searchsorted(pp.docs, cand), len(pp.docs) - 1)
            cand = cand[pp.docs[idx] == cand]
        if len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
        keys = None
        for term, rel in zip(q.phrase_terms, q.positions):
            d_k, f_k, pos_k = seg.occurrences_at(term, cand)
            if len(d_k) == 0:
                return _EMPTY_I, _EMPTY_F
            k = np.repeat(d_k, f_k) * _POS_SHIFT + (pos_k - np.int64(rel))
            keys = k if keys is None else np.intersect1d(keys, k, assume_unique=True)
            if len(keys) == 0:
                return _EMPTY_I, _EMPTY_F
    else:
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


def _eval_sloppy_phrase(
    q: SloppyPhraseQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool
):
    """Sloppy phrase via per-delta position intersections.

    Phrase positions pp_i = pos - rel_i (``PhrasePositions.java:25``); an
    occurrence pair at phrase-position distance d (|d| ≤ slop) contributes
    sloppyWeight = 1/(1+|d|) to the phrase freq
    (``PhraseScorer.java:73-81``). One vectorized key-intersection per delta
    — 2·slop+1 bulk passes of the exact-phrase machinery, no per-doc loops.
    Scored as a pseudo-term with idf = Σ term idfs, tf = Σ weights (float).

    n > 2 terms route to the minimal-window sweep over rel-adjusted
    positions (``SloppyPhraseMatcher.java:56`` matchLength = max − min of
    the adjusted phrase positions): candidate docs via the vectorized
    conjunction, per-candidate k-way sweep counting each minimal window
    once with weight 1/(1+matchLength). Repeating phrase terms are treated
    as independent lists (documented deviation from the reference's
    repeat-group handling).
    """
    if len(q.phrase_terms) > 2:
        return _eval_sloppy_phrase_n(q, seg, ctx, scoring)
    t1, t2 = q.phrase_terms
    rel1, rel2 = q.positions
    d1, f1 = seg.docs_freqs(t1)
    d2, f2 = seg.docs_freqs(t2)
    if len(d1) == 0 or len(d2) == 0:
        return _EMPTY_I, _EMPTY_F
    pos1, _ = seg.positions(t1)
    pos2, _ = seg.positions(t2)
    # +OFFSET keeps phrase positions non-negative inside the packed keys
    OFF = np.int64(256)
    k1 = np.repeat(d1, f1) * _POS_SHIFT + (pos1 - np.int64(rel1) + OFF)
    k2 = np.repeat(d2, f2) * _POS_SHIFT + (pos2 - np.int64(rel2) + OFF)
    doc_parts, w_parts = [], []
    for d in range(-q.slop, q.slop + 1):
        inter = np.intersect1d(k1, k2 - np.int64(d), assume_unique=True)
        if len(inter):
            doc_parts.append((inter >> np.int64(32)).astype(np.int64))
            w_parts.append(np.full(len(inter), 1.0 / (1 + abs(d)), dtype=np.float64))
    if not doc_parts:
        return _EMPTY_I, _EMPTY_F
    docs_cat = np.concatenate(doc_parts)
    w_cat = np.concatenate(w_parts)
    uniq, inv = np.unique(docs_cat, return_inverse=True)
    freq = np.zeros(len(uniq), dtype=np.float64)
    np.add.at(freq, inv, w_cat)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    w = ctx.phrase_weight(q.phrase_terms)
    if ctx.f32:
        freq = freq.astype(np.float32).astype(np.float64)
    return uniq, ctx.score(freq, seg.norms[uniq], w)


def sloppy_weight_n(adj_lists, slop: int) -> float:
    """Σ sloppyWeight over minimal windows of rel-ADJUSTED position lists
    (sorted): matchLength = max − min of the window; each minimal window
    counts once. Shared verbatim by the engine kernel and the pure-Python
    oracle — what the parity tests then check is the distributed plumbing."""
    n = len(adj_lists)
    idx = [0] * n
    total = 0.0
    while all(idx[i] < len(adj_lists[i]) for i in range(n)):
        cur = [int(adj_lists[i][idx[i]]) for i in range(n)]
        lo = min(range(n), key=lambda i: cur[i])
        d = max(cur) - cur[lo]
        if d <= slop:
            total += 1.0 / (1 + d)
        idx[lo] += 1
    return total


def _eval_sloppy_phrase_n(
    q: SloppyPhraseQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool
):
    """n-term sloppy phrase: conjunction-restricted candidates, then the
    minimal-window sweep per candidate (same evaluation shape as
    ``_eval_span_near`` — spans are inherently sequential; candidates are
    few by construction)."""
    lists = [seg.docs_freqs(t) for t in q.phrase_terms]
    if any(len(d) == 0 for d, _ in lists):
        return _EMPTY_I, _EMPTY_F
    cand = lists[0][0]
    for d, _ in lists[1:]:
        idx = np.minimum(np.searchsorted(d, cand), len(d) - 1)
        cand = cand[d[idx] == cand]
        if len(cand) == 0:
            return _EMPTY_I, _EMPTY_F
    pos_all = [seg.positions(t) for t in q.phrase_terms]
    match_docs, match_w = [], []
    for doc in cand:
        adj = []
        for (docs_t, _), (pos, occ_off), rel in zip(lists, pos_all, q.positions):
            i = int(np.searchsorted(docs_t, doc))
            adj.append(pos[occ_off[i] : occ_off[i + 1]] - np.int64(rel))
        w = sloppy_weight_n(adj, q.slop)
        if w > 0:
            match_docs.append(int(doc))
            match_w.append(w)
    if not match_docs:
        return _EMPTY_I, _EMPTY_F
    uniq = np.array(match_docs, dtype=np.int64)
    freq = np.array(match_w, dtype=np.float64)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    w = ctx.phrase_weight(q.phrase_terms)
    if ctx.f32:
        freq = freq.astype(np.float32).astype(np.float64)
    return uniq, ctx.score(freq, seg.norms[uniq], w)


# ------------------------------------------------- term automaton ----------
# Sandbox TermAutomatonQuery (TermAutomatonQuery.java + TermAutomatonScorer
# .java): token-graph matching over a determinized automaton with per-
# position state MULTIPLICITIES (PosState appends without dedup — freq
# counts interpretation paths, not distinct states). See the query class
# docstring for the full countMatches contract this mirrors.

from functools import lru_cache as _lru_cache


@_lru_cache(maxsize=256)
def _term_automaton_dfa(q: TermAutomatonQuery):
    """Subset-construction determinization (``finish()``'s
    ``Operations.determinize`` role; ANY/None is an ordinary alphabet
    symbol). Returns ``(step, accept)``: ``step[s][symbol] -> dst`` and a
    per-DFA-state accept flag."""
    from collections import defaultdict

    nfa: dict = defaultdict(lambda: defaultdict(set))
    for s, d, t in q.transitions:
        nfa[s][t].add(d)
    start = frozenset({0})
    ids = {start: 0}
    step: list[dict] = [{}]
    accept: list[bool] = [bool(start & q.accept)]
    work = [start]
    while work:
        cur = work.pop()
        sid = ids[cur]
        merged: dict = defaultdict(set)
        for s in cur:
            for sym, dsts in nfa[s].items():
                merged[sym] |= dsts
        for sym, dsts in merged.items():
            key = frozenset(dsts)
            nid = ids.get(key)
            if nid is None:
                nid = ids[key] = len(ids)
                step.append({})
                accept.append(bool(key & q.accept))
                work.append(key)
            step[sid][sym] = nid
    return step, accept


def _automaton_count(occ, step, accept, has_any) -> int:
    """``TermAutomatonScorer.countMatches`` over one document's query-term
    occurrences ``occ`` = [(pos, term)] sorted by pos. ``cur`` maps DFA
    state -> path multiplicity at the tracked position; gaps between token
    positions advance via ANY one position at a time (holes match ANY),
    freq counts only real-term steps into accept."""
    init = step[0]
    freq = 0
    cur: dict[int, int] = {}
    qpos = -1  # position `cur` refers to; -1 = nothing tracked yet
    i, n = 0, len(occ)
    while i < n:
        p = occ[i][0]
        j = i
        while j < n and occ[j][0] == p:
            j += 1
        batch = [occ[m][1] for m in range(i, j)]
        if cur and p > qpos:
            if has_any:
                for _ in range(p - qpos):
                    nxt: dict[int, int] = {}
                    for s, m in cur.items():
                        d = step[s].get(None)
                        if d is not None:
                            nxt[d] = nxt.get(d, 0) + m
                    cur = nxt
                    if not cur:  # petered out (reference's early break)
                        break
            else:
                cur = {}
        nxt = {}
        for s, m in cur.items():
            for t in batch:
                d = step[s].get(t)
                if d is not None:
                    nxt[d] = nxt.get(d, 0) + m
                    if accept[d]:
                        freq += m
            if has_any:
                d = step[s].get(None)
                if d is not None:
                    nxt[d] = nxt.get(d, 0) + m
        for t in batch:
            d = init.get(t)
            if d is not None:
                nxt[d] = nxt.get(d, 0) + 1
                if accept[d]:
                    freq += 1
        cur = nxt
        qpos = p + 1
        i = j
    return freq


def _eval_term_automaton(
    q: TermAutomatonQuery, seg: SegmentPostings, ctx: QueryContext, scoring: bool
):
    """Candidate docs = union of the real terms' postings (an ANY-only
    automaton matches nothing — the reference scorer iterates term enums);
    per candidate the countMatches simulation runs over its few query-term
    occurrences, like the span family. Scored as a pseudo-term with
    idf = Σ real-term idfs (TermAutomatonWeight gathers all termStates)."""
    terms = sorted(q.terms())
    if not terms:
        return _EMPTY_I, _EMPTY_F
    step, accept = _term_automaton_dfa(q)
    has_any = any(None in st for st in step)
    lists = {t: seg.docs_freqs(t) for t in terms}
    present = [t for t in terms if len(lists[t][0])]
    if not present:
        return _EMPTY_I, _EMPTY_F
    # candidate restriction (sound): a match must START with a real-term
    # step from DFA state 0, and freq only counts real-term steps INTO an
    # accepting state — so a matching doc contains at least one seed term
    # AND at least one accept-entering term. The intersection of those two
    # unions keeps the per-doc Python sweep candidate-restricted (the same
    # contract the span family honors) even when one OR-slot holds a
    # high-df term.
    seed_terms = [t for t in present if t in step[0]]
    accept_terms = [
        t
        for t in present
        if any(accept[st[t]] for st in step if t in st)
    ]
    if not seed_terms or not accept_terms:
        return _EMPTY_I, _EMPTY_F
    seed_docs = np.unique(np.concatenate([lists[t][0] for t in seed_terms]))
    acc_docs = np.unique(np.concatenate([lists[t][0] for t in accept_terms]))
    cand = np.intersect1d(seed_docs, acc_docs, assume_unique=True)
    if len(cand) == 0:
        return _EMPTY_I, _EMPTY_F
    pos_all = {t: seg.positions(t) for t in present}
    match_docs, match_freq = [], []
    for doc in cand:
        occ = []
        for t in present:
            docs_t = lists[t][0]
            k = int(np.searchsorted(docs_t, doc))
            if k < len(docs_t) and docs_t[k] == doc:
                pos, occ_off = pos_all[t]
                for p in pos[occ_off[k] : occ_off[k + 1]]:
                    occ.append((int(p), t))
        occ.sort()
        f = _automaton_count(occ, step, accept, has_any)
        if f > 0:
            match_docs.append(int(doc))
            match_freq.append(f)
    if not match_docs:
        return _EMPTY_I, _EMPTY_F
    uniq = np.array(match_docs, dtype=np.int64)
    freq = np.array(match_freq, dtype=np.float64)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    w = ctx.phrase_weight(tuple(terms))
    if ctx.f32:
        freq = freq.astype(np.float32).astype(np.float64)
    return uniq, ctx.score(freq, seg.norms[uniq], w)


def _span_weight_ordered(pos_lists: list[np.ndarray], slop: int) -> float:
    """Σ sloppyWeight over ordered spans: one span per first-clause
    occurrence, chaining each next clause to its smallest strictly-later
    position (NearSpansOrdered's advance)."""
    n = len(pos_lists)
    total = 0.0
    for a in pos_lists[0]:
        p = a
        ok = True
        for lst in pos_lists[1:]:
            j = np.searchsorted(lst, p, side="right")
            if j >= len(lst):
                ok = False
                break
            p = lst[j]
        if ok:
            d = int(p - a) - (n - 1)  # excess width beyond adjacency
            if d <= slop:
                total += 1.0 / (1 + d)
    return total


def _span_weight_unordered(pos_lists: list[np.ndarray], slop: int) -> float:
    """Σ sloppyWeight over minimal unordered windows (smallest-range sweep
    over the merged occurrence stream — NearSpansUnordered's span queue)."""
    n = len(pos_lists)
    idx = [0] * n
    total = 0.0
    while all(idx[i] < len(pos_lists[i]) for i in range(n)):
        cur = [pos_lists[i][idx[i]] for i in range(n)]
        lo_i = min(range(n), key=lambda i: cur[i])
        d = int(max(cur) - cur[lo_i]) - (n - 1)
        if d <= slop:
            total += 1.0 / (1 + max(d, 0))
        idx[lo_i] += 1
    return total


# ------------------------------------------------------- span algebra ------
# SpanTerm / SpanOr / SpanNot / SpanFirst / SpanNear compose recursively
# (lucene/core search/spans/*): every node enumerates (start, end, excess)
# triples per document, where ``excess`` is the total gap width accumulated
# inside the span (0 for leaves). Matching at each SpanNear level tests only
# that level's BETWEEN-children gap against its own slop (NearSpansOrdered /
# NearSpansUnordered semantics); the top-level scorer weighs each surviving
# span 1/(1+excess) into the span freq (SpanScorer.java:118-124). Evaluation
# is candidate-restricted per-doc Python — the documented exception to the
# no-per-row rule: candidates come from the vectorized doc-level combine.


def _as_span(c):
    return SpanTermQuery(c) if isinstance(c, str) else c


def _span_candidates(q, seg: SegmentPostings) -> np.ndarray:
    """Sorted doc ids that MAY have a span (exact for term/or/near; a
    superset for not — the exclude side only removes spans per doc)."""
    if isinstance(q, SpanTermQuery):
        return seg.docs_freqs(q.term)[0]
    if isinstance(q, SpanNearQuery):
        cand = None
        for c in q.clauses:
            d = _span_candidates(_as_span(c), seg)
            if len(d) == 0:
                return _EMPTY_I
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
            if len(cand) == 0:
                return _EMPTY_I
        return cand if cand is not None else _EMPTY_I
    if isinstance(q, SpanOrQuery):
        parts = [_span_candidates(_as_span(c), seg) for c in q.clauses]
        parts = [p for p in parts if len(p)]
        return np.unique(np.concatenate(parts)) if parts else _EMPTY_I
    if isinstance(q, SpanNotQuery):
        return _span_candidates(_as_span(q.include), seg)
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        return _span_candidates(_as_span(q.match), seg)
    raise TypeError(type(q))


def _term_doc_spans(seg: SegmentPostings, term: str, doc: int):
    docs, _ = seg.docs_freqs(term)
    i = int(np.searchsorted(docs, doc))
    if i >= len(docs) or docs[i] != doc:
        return []
    pos, occ_off = seg.positions(term)
    return [(int(p), int(p) + 1, 0) for p in pos[occ_off[i] : occ_off[i + 1]]]


def _near_combine(kids, slop: int, in_order: bool):
    """Combine per-child (start, end, excess) lists into near spans."""
    out = []
    if in_order:
        # one span per first-clause occurrence, each next child chained to
        # its earliest non-overlapping span (start >= previous end)
        for s0, e0, x0 in kids[0]:
            prev_end, covered, excess = e0, e0 - s0, x0
            ok = True
            for lst in kids[1:]:
                nxt = next(((s, e, x) for s, e, x in lst if s >= prev_end), None)
                if nxt is None:
                    ok = False
                    break
                prev_end = nxt[1]
                covered += nxt[1] - nxt[0]
                excess += nxt[2]
            if ok:
                d = (prev_end - s0) - covered
                if d <= slop:
                    out.append((s0, prev_end, d + excess))
        return out
    # unordered: minimal windows covering one span per child (smallest-range
    # sweep by start position)
    n = len(kids)
    idx = [0] * n
    while all(idx[i] < len(kids[i]) for i in range(n)):
        cur = [kids[i][idx[i]] for i in range(n)]
        lo = min(range(n), key=lambda i: cur[i][0])
        start = cur[lo][0]
        end = max(c[1] for c in cur)
        d = (end - start) - sum(c[1] - c[0] for c in cur)
        if d <= slop:
            out.append((start, end, max(d, 0) + sum(c[2] for c in cur)))
        idx[lo] += 1
    return out


def _doc_spans(q, seg: SegmentPostings, doc: int):
    """(start, end, excess) spans of the query in one document, start-sorted."""
    if isinstance(q, SpanTermQuery):
        return _term_doc_spans(seg, q.term, doc)
    if isinstance(q, SpanNearQuery):
        kids = []
        for c in q.clauses:
            sp = _doc_spans(_as_span(c), seg, doc)
            if not sp:
                return []
            kids.append(sp)
        return sorted(_near_combine(kids, q.slop, q.in_order))
    if isinstance(q, SpanOrQuery):
        out = []
        for c in q.clauses:
            out.extend(_doc_spans(_as_span(c), seg, doc))
        return sorted(out)
    if isinstance(q, SpanNotQuery):
        inc = _doc_spans(_as_span(q.include), seg, doc)
        if not inc:
            return []
        exc = _doc_spans(_as_span(q.exclude), seg, doc)
        if not exc:
            return inc
        return [
            s for s in inc if not any(s[0] < e[1] and e[0] < s[1] for e in exc)
        ]
    if isinstance(q, SpanFirstQuery):
        return [s for s in _doc_spans(_as_span(q.match), seg, doc) if s[1] <= q.end]
    if isinstance(q, SpanPositionRangeQuery):
        # acceptPosition (SpanPositionRangeQuery.java:41-46)
        return [
            s
            for s in _doc_spans(_as_span(q.match), seg, doc)
            if s[0] >= q.start and s[1] <= q.end
        ]
    raise TypeError(type(q))


def _span_scoring_terms(q) -> list[str]:
    """Terms contributing idf to the span weight — SpanNot excludes the
    exclusion side (it never matches, only removes)."""
    if isinstance(q, SpanNotQuery):
        return _span_scoring_terms(_as_span(q.include))
    if isinstance(q, (SpanFirstQuery, SpanPositionRangeQuery)):
        return _span_scoring_terms(_as_span(q.match))
    return sorted(q.terms())


def _eval_spans(q, seg: SegmentPostings, ctx: QueryContext, scoring: bool):
    """Any span query: vectorized candidate restriction, per-candidate span
    enumeration, freq = Σ 1/(1+excess) over the doc's spans."""
    cand = _span_candidates(q, seg)
    if len(cand) == 0:
        return _EMPTY_I, _EMPTY_F
    match_docs, match_w = [], []
    for doc in cand:
        spans = _doc_spans(q, seg, int(doc))
        if spans:
            match_docs.append(int(doc))
            match_w.append(sum(1.0 / (1 + x) for _, _, x in spans))
    if not match_docs:
        return _EMPTY_I, _EMPTY_F
    uniq = np.array(match_docs, dtype=np.int64)
    freq = np.array(match_w, dtype=np.float64)
    if not scoring:
        return uniq, np.zeros(len(uniq), dtype=np.float64)
    w = ctx.phrase_weight(_span_scoring_terms(q))
    if ctx.f32:
        freq = freq.astype(np.float32).astype(np.float64)
    return uniq, ctx.score(freq, seg.norms[uniq], w)


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
    if k <= 0:
        return _EMPTY_I, np.empty(0, np.float32 if f32 else np.float64)
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


class _PartialPostings:
    """Incrementally-decoded view of one term's postings: tracks which blocks
    are decoded and keeps (docs, freqs) merged in ascending doc order. The
    decode-skip bookkeeping shared by the pruned kernels."""

    def __init__(self, seg: SegmentPostings, term: str):
        self.seg = seg
        self.term = term
        self.bi = seg.block_meta(term)
        self.sel = np.empty(0, dtype=np.int64)
        self.docs = np.empty(0, dtype=np.int64)
        self.freqs = np.empty(0, dtype=np.int64)
        self.complete = term in seg._raw
        if self.complete:
            self.docs, self.freqs = seg._raw[term]
            self.sel = np.arange(len(self.bi["lens"]), dtype=np.int64)

    def extend(self, new_sel: np.ndarray) -> None:
        if self.complete:
            return  # already fully decoded (shared _raw cache)
        new_sel = np.setdiff1d(np.asarray(new_sel, np.int64), self.sel)
        if not len(new_sel):
            return
        d, f, _ = self.seg.decode_block_subset(self.term, new_sel)
        if len(self.docs):
            docs = np.concatenate([self.docs, d])
            freqs = np.concatenate([self.freqs, f])
            order = np.argsort(docs, kind="stable")
            self.docs, self.freqs = docs[order], freqs[order]
        else:
            self.docs, self.freqs = d, f
        self.sel = np.union1d(self.sel, new_sel)
        if len(self.sel) == len(self.bi["lens"]):
            self.complete = True
            # promote to the shared full-decode cache (block-ordered == doc-
            # ordered for single rows; merged rows keep ascending order too)
            self.seg._raw.setdefault(self.term, (self.docs, self.freqs))

    def covering_blocks(self, cand: np.ndarray) -> np.ndarray:
        """Blocks whose doc range may contain any of ``cand`` (blk_last is the
        inclusive end of each block's range)."""
        idx = np.searchsorted(self.bi["last"].astype(np.int64), cand)
        return np.unique(idx[idx < len(self.bi["last"])])

    def _block_slices(self, sel: np.ndarray):
        last = self.bi["last"].astype(np.int64)
        prev = np.concatenate(([-1], last[:-1]))
        sel = np.asarray(sel, np.int64)
        lo = np.searchsorted(self.docs, prev[sel] + 1, side="left")
        hi = np.searchsorted(self.docs, last[sel], side="right")
        return lo, hi

    def docs_in_blocks(self, sel: np.ndarray) -> np.ndarray:
        """Docs of the given (already decoded) blocks, sliced from the merged
        decoded arrays by doc range — block b's docs are exactly those in
        (last[b-1], last[b]] (ranges ascend across shard rows too)."""
        lo, hi = self._block_slices(sel)
        parts = [self.docs[a:b] for a, b in zip(lo, hi)]
        return np.concatenate(parts) if parts else np.empty(0, np.int64)

    def postings_in_blocks(self, sel: np.ndarray):
        """(docs, freqs) of the given (already decoded) blocks, in ascending
        block order — for single-row terms doc order == block order, so the
        slices align with per-block position decodes."""
        lo, hi = self._block_slices(sel)
        dparts = [self.docs[a:b] for a, b in zip(lo, hi)]
        fparts = [self.freqs[a:b] for a, b in zip(lo, hi)]
        if not dparts:
            return np.empty(0, np.int64), np.empty(0, np.int64)
        return np.concatenate(dparts), np.concatenate(fparts)


def topk_or_pruned(terms: list[str], seg: SegmentPostings, ctx: QueryContext, k: int):
    """Block-max WAND for a pure term disjunction (``WANDScorer.java:45``,
    Broder et al. WAND + Ding & Suel block-max), bulk-evaluated with DECODE
    skip (per-block byte offsets play Lucene's skip-list file pointers):

    1. *theta seed*: each term's top-upper-bound blocks are decoded (only
       those); their docs' EXACT disjunction scores — resolved against the
       blocks covering them, decoded on demand — seed ``theta`` = kth-best
       candidate, a lower bound on the true kth score.
    2. *block sweep*: elementary doc ranges are the union of all terms' block
       boundaries; each range's bound = Σ_i ub_i(block covering it) — the
       ``MaxScoreSumPropagator``/``WANDScorer`` head-sum at block granularity.
       Blocks intersecting no live range (bound ≥ theta) are NEVER DECODED;
       postings of surviving blocks are filtered per elementary range as
       before (strict < exclusion keeps the top-k provably identical).
    3. survivors are union-summed and top-k'd exactly.
    """
    present = [t for t in terms if t in seg.rows and ctx.weights.get(t, 0.0) != 0.0]
    if k <= 0:
        return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
    total_df = sum(int(r["df"]) for t in present for r in seg.rows[t])
    if seg.deleted is not None or len(present) < 2 or total_df < 16 * BLOCK_SIZE:
        # tiny disjunctions: pruning bookkeeping costs more than it saves
        q = BooleanQuery(should=tuple(TermQuery(t) for t in terms))
        docs, scores = eval_query(q, seg, ctx)
        return topk(docs, scores, k, ctx.f32)

    pp = {t: seg.partial(t) for t in present}
    ubs = {
        t: ctx.score(pp[t].bi["maxf"].astype(np.float64), pp[t].bi["minn"], ctx.weights[t])
        for t in present
    }

    # phase 1: theta seed from per-term best blocks (decode only those)
    seed_parts = []
    for t in present:
        order = np.argsort(-ubs[t], kind="stable")
        got, take = 0, []
        for b in order:
            take.append(b)
            got += int(pp[t].bi["lens"][b])
            if got >= k:
                break
        take = np.array(take)
        pp[t].extend(take)
        seed_parts.append(pp[t].docs_in_blocks(take))
    cand = np.unique(np.concatenate(seed_parts))
    # resolve exact disjunction scores at cand: decode the covering blocks
    total = np.zeros(len(cand), dtype=np.float64)
    for t in present:
        pp[t].extend(pp[t].covering_blocks(cand))
        docs_t, freqs_t = pp[t].docs, pp[t].freqs
        idx = np.searchsorted(docs_t, cand)
        idx_c = np.minimum(idx, len(docs_t) - 1) if len(docs_t) else idx
        hit = docs_t[idx_c] == cand if len(docs_t) else np.zeros(len(cand), bool)
        total[hit] += ctx.score(
            freqs_t[idx_c[hit]], seg.norms[docs_t[idx_c[hit]]], ctx.weights[t]
        )
    if ctx.f32:
        total = total.astype(np.float32).astype(np.float64)
    if len(cand) >= k:
        theta = float(np.partition(total, len(cand) - k)[len(cand) - k])
    else:
        theta = -np.inf

    # phase 2: block sweep — elementary ranges from all block last-docs
    boundaries = np.unique(
        np.concatenate([pp[t].bi["last"] for t in present]).astype(np.int64)
    )
    range_ub = np.zeros(len(boundaries), dtype=np.float64)
    for t in present:
        last = pp[t].bi["last"].astype(np.int64)
        idx = np.searchsorted(last, boundaries)  # block covering each range end
        covered = idx < len(last)
        range_ub[covered] += ubs[t][idx[covered]]
    if ctx.f32:
        # theta is an f32-rounded candidate score; compare bounds in the same
        # rounding or a doc whose exact f64 bound sits between f32(theta) and
        # theta could be pruned despite tying the kth f32 score (the rank
        # identity with the exhaustive path is load-bearing)
        range_ub = range_ub.astype(np.float32).astype(np.float64)
    live_range = range_ub >= theta
    live_prefix = np.concatenate(([0], np.cumsum(live_range.astype(np.int64))))

    kept_docs, kept_scores = [], []
    for t in present:
        last = pp[t].bi["last"].astype(np.int64)
        # block b spans ranges [rid(prev_last+1) .. rid(last)] — decode it only
        # if any of those elementary ranges is live (doc ranges ascend across
        # shard rows, so prev block's last bounds row-first blocks too)
        prev_last = np.concatenate(([-1], last[:-1]))
        lo = np.searchsorted(boundaries, prev_last + 1)
        hi = np.minimum(np.searchsorted(boundaries, last), len(boundaries) - 1)
        block_live = live_prefix[hi + 1] - live_prefix[lo] > 0
        pp[t].extend(np.flatnonzero(block_live))
        # per-posting filter over the decoded (live ∪ seed ∪ cover) docs
        docs_t, freqs_t = pp[t].docs, pp[t].freqs
        if not len(docs_t):
            continue
        rid = np.minimum(np.searchsorted(boundaries, docs_t), len(boundaries) - 1)
        keep = live_range[rid]
        kept_docs.append(docs_t[keep])
        kept_scores.append(
            ctx.score(freqs_t[keep], seg.norms[docs_t[keep]], ctx.weights[t])
        )
    docs_u, scores_u, _ = _union_sum(list(zip(kept_docs, kept_scores)))
    if ctx.f32:
        scores_u = scores_u.astype(np.float32).astype(np.float64)
    return topk(docs_u, scores_u, k, ctx.f32)


def topk_and_pruned(
    terms: list[str], seg: SegmentPostings, ctx: QueryContext, k: int
):
    """Decode-skipped pure-term conjunction
    (``BlockMaxConjunctionScorer.java:38`` / ``ConjunctionDISI.java:38``):
    fully decode only the RAREST term; every other term decodes just the
    blocks covering the surviving candidates (the skip-list leapfrog, driven
    by blk_last + byte offsets). Result is the exact intersection — score
    accumulation order matches ``_intersect_sum`` (rarest first), so scores
    are bit-identical to the exhaustive path."""
    present = [t for t in terms if t in seg.rows]
    if k <= 0 or len(present) < len(terms):
        return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
    total_df = sum(int(r["df"]) for t in present for r in seg.rows[t])
    if seg.deleted is not None or len(terms) < 2 or total_df < 16 * BLOCK_SIZE:
        q = BooleanQuery(must=tuple(TermQuery(t) for t in terms))
        docs, scores = eval_query(q, seg, ctx)
        return topk(docs, scores, k, ctx.f32)

    by_df = sorted(present, key=lambda t: sum(int(r["df"]) for r in seg.rows[t]))
    t0 = by_df[0]
    cand, f0 = seg.docs_freqs(t0)
    if len(cand) == 0:
        return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
    scores = ctx.score(f0, seg.norms[cand], ctx.weights[t0])
    for t in by_df[1:]:
        ppt = seg.partial(t)
        ppt.extend(ppt.covering_blocks(cand))
        docs_t, freqs_t = ppt.docs, ppt.freqs
        if not len(docs_t):
            return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
        idx = np.minimum(np.searchsorted(docs_t, cand), len(docs_t) - 1)
        hit = docs_t[idx] == cand
        cand, scores, idx = cand[hit], scores[hit], idx[hit]
        if len(cand) == 0:
            return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
        scores = scores + ctx.score(
            freqs_t[idx], seg.norms[cand], ctx.weights[t]
        )
    if ctx.f32:
        scores = scores.astype(np.float32).astype(np.float64)
    return topk(cand, scores, k, ctx.f32)


def topk_term_pruned(term: str, seg: SegmentPostings, ctx: QueryContext, k: int):
    """Block-max pruned top-k for a single term (ImpactsDISI analogue).

    Blocks are visited in decreasing upper-bound order and DECODED lazily in
    batches (per-block byte offsets = skip pointers); iteration stops when
    the next bound cannot beat the current kth score — unvisited blocks'
    bytes are never unpacked. Results identical to exhaustive scoring
    (property-tested).
    """
    if k <= 0 or term not in seg.rows:
        return _EMPTY_I, np.empty(0, np.float32 if ctx.f32 else np.float64)
    df = sum(int(r["df"]) for r in seg.rows[term])
    if seg.deleted is not None or df < 8 * BLOCK_SIZE or term in seg._raw:
        # deletes break block alignment; tiny lists and already-decoded terms
        # are cheaper exhaustive (pruning then only saves scoring)
        docs, scores = eval_query(TermQuery(term), seg, ctx)
        return topk(docs, scores, k, ctx.f32)
    bi = seg.block_meta(term)
    nblocks = len(bi["lens"])
    w = ctx.weights[term]
    # admissible block bound: score(max_freq, min_norm) — monotone in both
    # (CompetitiveImpactAccumulator/MaxScoreCache role, SURVEY §2.3)
    ubs = ctx.score(bi["maxf"].astype(np.float64), bi["minn"], w)
    order = np.argsort(-ubs, kind="stable")
    out_docs: list[np.ndarray] = []
    out_scores: list[np.ndarray] = []
    theta = -np.inf
    count = 0
    i = 0
    while i < nblocks:
        if ubs[order[i]] < theta:
            break
        # batch the next blocks still above theta (amortize decode calls):
        # first batch gathers ≥ k postings to establish theta, then smaller
        j, batch, cnt = i, [], 0
        target = k if count < k else max(k, 8 * BLOCK_SIZE)
        while j < nblocks and ubs[order[j]] >= theta and cnt < target:
            batch.append(order[j])
            cnt += int(bi["lens"][order[j]])
            j += 1
        d, f, _ = seg.decode_block_subset(term, np.array(batch))
        out_docs.append(d)
        out_scores.append(ctx.score(f, seg.norms[d], w))
        count += len(d)
        if count >= k:
            alls = np.concatenate(out_scores)
            theta = np.partition(alls, len(alls) - k)[len(alls) - k]
        i = j
    docs_c = np.concatenate(out_docs) if out_docs else _EMPTY_I
    scores_c = np.concatenate(out_scores) if out_scores else _EMPTY_F
    return topk(docs_c, scores_c, k, ctx.f32)
