"""Brute-force pure-Python reference searcher — the parity oracle.

Modeled on the reference's test strategy (SURVEY §5): an independent,
obviously-correct implementation (dict-of-dicts inverted index, no
compression, no pruning, no Spark) that shares ONLY the scalar formula
modules (bm25, smallfloat, analysis) with the engine. Every Spark query is
asserted rank-identical against this oracle (TestBM25Similarity /
TestBooleanQuery / TestWANDScorer.testRandom-style equivalence testing).

Tie-break: score desc, then (segment_id, doc_id) asc — matching
``HitQueue.java:76-81`` within a segment and ``TopDocs.java:33-40`` across.
"""

from __future__ import annotations

from collections import defaultdict

import numpy as np

from .analysis import ANALYZERS
from .index.build import segment_of
from .search import bm25
from .search.query import (
    BooleanQuery,
    MatchAllQuery,
    MatchNoneQuery,
    PhraseQuery,
    Query,
    SloppyPhraseQuery,
    TermQuery,
)
from .smallfloat import int_to_byte4


class OracleIndex:
    def __init__(self, docs, num_segments: int, analyzer: str = "code",
                 key_cols=("repo", "path", "commit"), content_col: str = "content"):
        """docs: pandas DataFrame with the key columns + content."""
        self.analyzer = analyzer
        analyze = ANALYZERS[analyzer]
        # deterministic (segment_id, doc_id): same hash + key sort as the engine
        recs = []
        for i in range(len(docs)):
            row = docs.iloc[i]
            key = "\x00".join(str(row[c]) for c in key_cols)
            seg = segment_of(key, num_segments)
            recs.append((seg, tuple(str(row[c]) for c in key_cols), row[content_col]))
        recs.sort(key=lambda r: (r[0], r[1]))
        self.coords: list[tuple[int, int]] = []
        # postings: term -> {(seg,doc): [positions]}
        self.postings: dict[str, dict[tuple[int, int], list[int]]] = defaultdict(dict)
        self.norm_byte: dict[tuple[int, int], int] = {}
        self.lengths: dict[tuple[int, int], int] = {}
        next_id: dict[int, int] = defaultdict(int)
        doc_count = 0
        sum_len = 0
        for seg, _key, content in recs:
            did = next_id[seg]
            next_id[seg] += 1
            coord = (seg, did)
            self.coords.append(coord)
            terms, positions = analyze(content if content is not None else "")
            for t, p in zip(terms, positions):
                self.postings[t].setdefault(coord, []).append(p)
            # field length = occupied position slots (stacked posIncr=0
            # tokens are overlaps and don't count — discountOverlaps)
            n = len(set(positions))
            self.lengths[coord] = n
            self.norm_byte[coord] = int(int_to_byte4(np.array([n]))[0])
            if n > 0:
                doc_count += 1
            sum_len += n
        self.doc_count = doc_count
        self.sum_total_term_freq = sum_len
        self.avgdl = bm25.avgdl(sum_len, max(doc_count, 1))
        self.cache = bm25.norm_cache(self.avgdl)

    # ------------------------------------------------------------- scoring --
    def _weight(self, term: str) -> np.float32:
        df = len(self.postings.get(term, {}))
        if df == 0:
            return np.float32(0.0)
        return bm25.term_weight(bm25.idf(np.array([df]), self.doc_count)[0])

    def _score_one(self, freq: int, coord, weight: np.float32) -> np.float32:
        return bm25.score(
            np.array([freq], np.float32),
            np.array([self.norm_byte[coord]], np.uint8),
            weight,
            self.cache,
        )[0]

    def _eval(self, q: Query, scoring: bool = True) -> dict[tuple[int, int], float]:
        """Returns {coord: score_f64} of matching docs."""
        if isinstance(q, MatchNoneQuery):
            return {}
        if isinstance(q, MatchAllQuery):
            return {c: 1.0 for c in self.coords}
        if isinstance(q, TermQuery):
            w = self._weight(q.term)
            out = {}
            for coord, pos in self.postings.get(q.term, {}).items():
                out[coord] = float(self._score_one(len(pos), coord, w)) if scoring else 0.0
            return out
        if isinstance(q, PhraseQuery):
            idfs = np.array([self._weight(t) for t in q.phrase_terms], np.float32)
            w = bm25.term_weight(bm25.phrase_idf(idfs), q.boost)
            first = self.postings.get(q.phrase_terms[0], {})
            out = {}
            for coord, pos0 in first.items():
                cand = {p - q.positions[0] for p in pos0}
                for t, rel in zip(q.phrase_terms[1:], q.positions[1:]):
                    plist = self.postings.get(t, {}).get(coord)
                    if plist is None:
                        cand = set()
                        break
                    cand &= {p - rel for p in plist}
                    if not cand:
                        break
                if cand:
                    out[coord] = (
                        float(self._score_one(len(cand), coord, w)) if scoring else 0.0
                    )
            return out
        if isinstance(q, SloppyPhraseQuery):
            idfs = np.array([self._weight(t) for t in q.phrase_terms], np.float32)
            w = bm25.term_weight(bm25.phrase_idf(idfs), q.boost)
            if len(q.phrase_terms) > 2:
                # n-term: minimal-window sweep over rel-adjusted positions —
                # the helper is shared with the engine kernel verbatim
                from .search.kernels import sloppy_weight_n

                plists = [self.postings.get(t, {}) for t in q.phrase_terms]
                out = {}
                docs = set(plists[0])
                for p in plists[1:]:
                    docs &= set(p)
                for coord in docs:
                    adj = [
                        np.array(sorted(p[coord]), np.int64) - np.int64(rel)
                        for p, rel in zip(plists, q.positions)
                    ]
                    freq = sloppy_weight_n(adj, q.slop)
                    if freq > 0:
                        f = np.float32(freq)
                        s = bm25.score(
                            np.array([f], np.float32),
                            np.array([self.norm_byte[coord]], np.uint8),
                            w,
                            self.cache,
                        )[0]
                        out[coord] = float(s) if scoring else 0.0
                return out
            t1, t2 = q.phrase_terms
            r1, r2 = q.positions
            p1 = self.postings.get(t1, {})
            p2 = self.postings.get(t2, {})
            out = {}
            for coord, pos1 in p1.items():
                pos2 = p2.get(coord)
                if pos2 is None:
                    continue
                freq = 0.0
                for a in pos1:
                    for b in pos2:
                        d = abs((b - r2) - (a - r1))
                        if d <= q.slop:
                            freq += 1.0 / (1 + d)
                if freq > 0:
                    f = np.float32(freq)
                    s = bm25.score(
                        np.array([f], np.float32),
                        np.array([self.norm_byte[coord]], np.uint8),
                        w,
                        self.cache,
                    )[0]
                    out[coord] = float(s) if scoring else 0.0
            return out
        if isinstance(q, BooleanQuery):
            return self._eval_bool(q, scoring)
        raise TypeError(type(q))

    def _eval_bool(self, q: BooleanQuery, scoring: bool):
        must = [self._eval(c, scoring) for c in q.must]
        filt = [self._eval(c, False) for c in q.filter]
        should = [self._eval(c, scoring) for c in q.should]
        out: dict[tuple[int, int], float] = {}
        if q.must or q.filter:
            req = must + filt
            docs = set(req[0])
            for m in req[1:]:
                docs &= set(m)
            for coord in docs:
                s = sum(m[coord] for m in must)
                cnt = sum(1 for sh in should if coord in sh)
                if cnt < q.min_should_match:
                    continue
                s += sum(sh.get(coord, 0.0) for sh in should)
                out[coord] = s
        else:
            msm = max(q.min_should_match, 1)
            all_docs = set()
            for sh in should:
                all_docs |= set(sh)
            for coord in all_docs:
                cnt = sum(1 for sh in should if coord in sh)
                if cnt >= msm:
                    out[coord] = sum(sh.get(coord, 0.0) for sh in should)
        for c in q.must_not:
            for coord in self._eval(c, False):
                out.pop(coord, None)
        # Scorer.score returns float32 — round like the engine does
        return {c: float(np.float32(s)) for c, s in out.items()}

    # -------------------------------------------------------------- search --
    def search(self, q: Query, k: int = 10) -> list[tuple[int, int, float]]:
        """Returns [(segment_id, doc_id, score_f32)] — score desc, coord asc."""
        scored = self._eval(q)
        items = [
            (coord, np.float32(s)) for coord, s in scored.items()
        ]
        items.sort(key=lambda x: (-x[1], x[0]))
        return [(c[0], c[1], float(s)) for c, s in items[:k]]
