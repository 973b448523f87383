"""Minimal-interval query algebra — the lucene/queries intervals module.

Reference: ``lucene/queries/src/java/org/apache/lucene/queries/intervals/``
(``Intervals.java`` factory surface, ``OrderedIntervalsSource.java``,
``UnorderedIntervalsSource.java``, ``BlockIntervalsSource.java``,
``DisjunctionIntervalsSource.java``, ``FilteredIntervalsSource.java``
MaxGaps/MaxWidth, ``ContainingIntervalsSource.java`` /
``NotContainingIntervalsSource.java`` / ``ContainedByIntervalsSource.java``,
``IntervalQuery.java`` + ``IntervalScorer.java``).

Semantics implemented exactly per the reference:

- every source enumerates the doc's MINIMAL intervals — no enumerated
  interval properly contains another (the on-the-fly minimization all the
  reference iterators perform);
- an interval is an inclusive position range (start, end); a unit term
  occupies (p, p), width = end − start + 1;
- ``gaps`` counts the positions between a combinator's IMMEDIATE
  sub-intervals only (``IntervalIterator.gaps()`` contract: "does not
  include the gaps inside those sub-intervals");
- ordered requires each next sub-interval to start strictly after the
  previous one ends; block requires exact adjacency (next.start ==
  prev.end + 1); unordered allows overlap (the reference's default
  unordered source);
- scoring (``IntervalScorer.java:68``): freq = Σ over intervals of
  1 / max(width − minExtent + 1, 1), passed through the saturation
  function ``IntervalScoreFunction.saturationFunction``: score =
  boost · freq / (freq + pivot), default pivot 1.

Spark shape: an :class:`IntervalQuery` rides the ordinary batched
``search_many`` path — vectorized candidate restriction first (docs
containing ALL required leaf terms, exactly like the span family), then
the per-candidate interval sweep runs over the few surviving docs using
lazily-decoded positions. This is the documented position-work exception
to the no-per-row-python rule (same seam as spans/sloppy).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

from .query import Query

_EMPTY_I = np.empty(0, dtype=np.int64)


# ---------------------------------------------------------------------------
# sources (Intervals.java factory surface)

@dataclass(frozen=True)
class ITerm:
    term: str


@dataclass(frozen=True)
class IOrdered:
    sources: tuple


@dataclass(frozen=True)
class IUnordered:
    sources: tuple


@dataclass(frozen=True)
class IBlock:
    """``Intervals.phrase`` — exact adjacency of the sub-sources."""

    sources: tuple


@dataclass(frozen=True)
class IOr:
    sources: tuple


@dataclass(frozen=True)
class IMaxGaps:
    inner: object
    max_gaps: int


@dataclass(frozen=True)
class IMaxWidth:
    inner: object
    max_width: int


@dataclass(frozen=True)
class IContaining:
    big: object
    small: object


@dataclass(frozen=True)
class INotContaining:
    big: object
    small: object


@dataclass(frozen=True)
class IContainedBy:
    small: object
    big: object


def _src(s):
    return ITerm(s) if isinstance(s, str) else s


def source_terms(src) -> set[str]:
    src = _src(src)
    if isinstance(src, ITerm):
        return {src.term}
    if isinstance(src, (IOrdered, IUnordered, IBlock, IOr)):
        out: set[str] = set()
        for c in src.sources:
            out |= source_terms(c)
        return out
    if isinstance(src, (IMaxGaps, IMaxWidth)):
        return source_terms(src.inner)
    if isinstance(src, (IContaining, INotContaining, IContainedBy)):
        return source_terms(src.big) | source_terms(src.small)
    raise TypeError(type(src))


def min_extent(src) -> int:
    """Smallest width an interval from this source can have
    (``IntervalsSource.minExtent``)."""
    src = _src(src)
    if isinstance(src, ITerm):
        return 1
    if isinstance(src, (IOrdered, IUnordered, IBlock)):
        return sum(min_extent(c) for c in src.sources)
    if isinstance(src, IOr):
        return min(min_extent(c) for c in src.sources)
    if isinstance(src, (IMaxGaps, IMaxWidth)):
        return min_extent(src.inner)
    if isinstance(src, (IContaining, INotContaining)):
        return min_extent(src.big)
    if isinstance(src, IContainedBy):
        return min_extent(src.small)
    raise TypeError(type(src))


@dataclass(frozen=True)
class IntervalQuery(Query):
    """``IntervalQuery.java:77`` with the default saturation score function."""

    source: object = None
    pivot: float = 1.0
    boost: float = 1.0

    def terms(self):
        return source_terms(self.source)


# ---------------------------------------------------------------------------
# per-doc interval algebra — lists of (start, end, gaps), minimal + sorted

def _minimal(cands: list) -> list:
    """Drop intervals that properly contain another (keep the minimal set).
    Input/output: (start, end, gaps) tuples; output sorted by start."""
    if not cands:
        return []
    seen: dict[tuple, int] = {}
    for s, e, g in cands:
        if (s, e) not in seen:
            seen[(s, e)] = g
    # sort (start asc, end DESC) so the reversed scan visits, before any
    # interval X, every interval with start >= X.start and end <= X.end —
    # including same-start shorter intervals
    items = sorted(seen.items(), key=lambda kv: (kv[0][0], -kv[0][1]))
    out = []
    min_e = None
    for (s, e), g in reversed(items):
        # every already-scanned interval has start >= s; X is contained-in
        # (hence non-minimal) iff one of them ends at or before X's end
        if min_e is not None and min_e <= e:
            continue
        out.append((s, e, g))
        min_e = e
    out.sort()
    return out


def _ordered(kids: list[list]) -> list:
    """Minimal in-order chains: for each last-child interval, the tightest
    backwards chain (latest predecessor ending before the successor starts)
    — ``OrderedIntervalsSource.java`` semantics."""
    ends = [np.array([e for _, e, _ in k], dtype=np.int64) for k in kids]
    out = []
    for sL, eL, _gL in kids[-1]:
        chain = [(sL, eL)]
        nxt_start = sL
        ok = True
        for j in range(len(kids) - 2, -1, -1):
            i = int(np.searchsorted(ends[j], nxt_start)) - 1  # last end < start
            if i < 0:
                ok = False
                break
            chain.append((kids[j][i][0], kids[j][i][1]))
            nxt_start = kids[j][i][0]
        if not ok:
            continue
        chain.reverse()
        gaps = sum(
            chain[t + 1][0] - chain[t][1] - 1 for t in range(len(chain) - 1)
        )
        out.append((chain[0][0], chain[-1][1], gaps))
    return _minimal(out)


def _unordered(kids: list[list]) -> list:
    """Minimal covering windows, overlap allowed: anchor every interval as
    the window's max-end; every other child picks its latest interval not
    ending after the anchor (maximizing the window start)."""
    ends = [np.array([e for _, e, _ in k], dtype=np.int64) for k in kids]
    n = len(kids)
    out = []
    for j in range(n):
        for s0, e0, _g0 in kids[j]:
            picks = []
            ok = True
            for m in range(n):
                if m == j:
                    picks.append((s0, e0))
                    continue
                i = int(np.searchsorted(ends[m], e0, side="right")) - 1
                if i < 0:
                    ok = False
                    break
                picks.append((kids[m][i][0], kids[m][i][1]))
            if not ok:
                continue
            picks.sort()
            gaps = sum(
                max(0, picks[t + 1][0] - picks[t][1] - 1) for t in range(n - 1)
            )
            out.append((min(p[0] for p in picks), e0, gaps))
    return _minimal(out)


def _block(kids: list[list]) -> list:
    """Exact adjacency (``BlockIntervalsSource``): next.start == prev.end+1."""
    starts = [np.array([s for s, _, _ in k], dtype=np.int64) for k in kids]
    out = []
    for s0, e0, _ in kids[0]:
        prev_end = e0
        ok = True
        for j in range(1, len(kids)):
            i = int(np.searchsorted(starts[j], prev_end + 1))
            if i >= len(kids[j]) or kids[j][i][0] != prev_end + 1:
                ok = False
                break
            prev_end = kids[j][i][1]
        if ok:
            out.append((s0, prev_end, 0))
    return _minimal(out)


def intervals_in_doc(src, pos_of: dict[str, np.ndarray]) -> list:
    """All minimal (start, end, gaps) intervals of ``src`` in one document,
    given the doc's term → sorted-positions map."""
    src = _src(src)
    if isinstance(src, ITerm):
        return [(int(p), int(p), 0) for p in pos_of.get(src.term, ())]
    if isinstance(src, (IOrdered, IUnordered, IBlock)):
        kids = []
        for c in src.sources:
            k = intervals_in_doc(c, pos_of)
            if not k:
                return []
            kids.append(k)
        if isinstance(src, IOrdered):
            return _ordered(kids)
        if isinstance(src, IUnordered):
            return _unordered(kids)
        return _block(kids)
    if isinstance(src, IOr):
        out = []
        for c in src.sources:
            out.extend(intervals_in_doc(c, pos_of))
        return _minimal(out)
    if isinstance(src, IMaxGaps):
        return [iv for iv in intervals_in_doc(src.inner, pos_of) if iv[2] <= src.max_gaps]
    if isinstance(src, IMaxWidth):
        return [
            iv
            for iv in intervals_in_doc(src.inner, pos_of)
            if iv[1] - iv[0] + 1 <= src.max_width
        ]
    if isinstance(src, (IContaining, INotContaining)):
        big = intervals_in_doc(src.big, pos_of)
        if not big:
            return []
        small = intervals_in_doc(src.small, pos_of)
        keep_if = isinstance(src, IContaining)
        return [
            b
            for b in big
            if any(b[0] <= s and e <= b[1] for s, e, _ in small) == keep_if
        ]
    if isinstance(src, IContainedBy):
        small = intervals_in_doc(src.small, pos_of)
        if not small:
            return []
        big = intervals_in_doc(src.big, pos_of)
        return [
            sm for sm in small if any(b0 <= sm[0] and sm[1] <= b1 for b0, b1, _ in big)
        ]
    raise TypeError(type(src))


# ---------------------------------------------------------------------------
# segment evaluation (the eval_query hook)

def _candidates(src, seg) -> np.ndarray:
    """Sorted docs that MAY produce an interval — exact conjunction for
    ordered/unordered/block, union for or, big side for containing."""
    src = _src(src)
    if isinstance(src, ITerm):
        return seg.docs_freqs(src.term)[0]
    if isinstance(src, (IOrdered, IUnordered, IBlock)):
        cand = None
        for c in src.sources:
            d = _candidates(c, seg)
            if len(d) == 0:
                return _EMPTY_I
            cand = d if cand is None else np.intersect1d(cand, d, assume_unique=True)
            if len(cand) == 0:
                return _EMPTY_I
        return cand if cand is not None else _EMPTY_I
    if isinstance(src, IOr):
        parts = [p for c in src.sources if len(p := _candidates(c, seg))]
        return np.unique(np.concatenate(parts)) if parts else _EMPTY_I
    if isinstance(src, (IMaxGaps, IMaxWidth)):
        return _candidates(src.inner, seg)
    if isinstance(src, (IContaining, INotContaining)):
        return _candidates(src.big, seg)
    if isinstance(src, IContainedBy):
        a = _candidates(src.small, seg)
        if len(a) == 0:
            return _EMPTY_I
        b = _candidates(src.big, seg)
        return np.intersect1d(a, b, assume_unique=True)
    raise TypeError(type(src))


def _doc_positions(seg, terms: list[str], doc: int) -> dict[str, np.ndarray]:
    out = {}
    for t in terms:
        docs, _ = seg.docs_freqs(t)
        i = int(np.searchsorted(docs, doc))
        if i < len(docs) and docs[i] == doc:
            pos, occ_off = seg.positions(t)
            out[t] = pos[occ_off[i] : occ_off[i + 1]]
    return out


def eval_interval_query(q: IntervalQuery, seg, ctx, scoring: bool):
    """(docs, scores) on one segment — saturation-scored interval freq."""
    cand = _candidates(q.source, seg)
    if len(cand) == 0:
        return _EMPTY_I, np.empty(0, dtype=np.float64)
    terms = sorted(source_terms(q.source))
    minext = min_extent(q.source)
    out_docs, out_freq = [], []
    for doc in cand:
        pos_of = _doc_positions(seg, terms, int(doc))
        ivs = intervals_in_doc(q.source, pos_of)
        if ivs:
            out_docs.append(int(doc))
            out_freq.append(
                sum(1.0 / max((e - s + 1) - minext + 1, 1) for s, e, _ in ivs)
            )
    if not out_docs:
        return _EMPTY_I, np.empty(0, dtype=np.float64)
    docs = np.array(out_docs, dtype=np.int64)
    if not scoring:
        return docs, np.zeros(len(docs), dtype=np.float64)
    freq = np.array(out_freq, dtype=np.float64)
    if ctx.f32:
        freq = freq.astype(np.float32).astype(np.float64)
    # IntervalScoreFunction.saturationFunction: boost · freq / (freq + pivot)
    scores = q.boost * freq / (freq + q.pivot)
    if ctx.f32:
        scores = scores.astype(np.float32).astype(np.float64)
    return docs, scores
