"""Query model, parser and logical rewrites.

Mirrors the reference query algebra (SURVEY §2.5):

- ``TermQuery`` (``search/TermQuery.java:38``)
- ``BooleanQuery`` with MUST / SHOULD / FILTER / MUST_NOT clauses and
  ``minimumNumberShouldMatch`` (``search/BooleanQuery.java:42``)
- exact ``PhraseQuery`` with relative positions — stopword gaps included
  (``search/PhraseQuery.java:70``; ``util/QueryBuilder.createPhraseQuery:109``)
- ``MatchAllDocsQuery`` / ``MatchNoDocsQuery``

``rewrite`` replicates the semantics-relevant subset of the reference's
fixed-point rewrite (``search/IndexSearcher.java:740-748``,
``BooleanQuery.rewrite:235-420``): single-clause flattening, empty → MatchNone,
duplicate FILTER/MUST_NOT dedup, ``MUST ∧ MUST_NOT(same) → MatchNone``,
``MUST_NOT(MatchAll) → MatchNone``, SHOULD∩FILTER → MUST.

The parser covers the reference benchmark query surface
(``lucene/benchmark/conf/query-terms.txt`` / ``query-phrases.txt``): bare
terms, ``AND`` / ``OR`` conjunctions/disjunctions, ``+term`` / ``-term``
(MUST / MUST_NOT), and quoted phrases. Query text is run through the same
analysis chain as documents (``util/QueryBuilder.java:60-135``).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import lru_cache

from ..analysis import ANALYZERS, NGRAM_SIZES, QUERY_CHAIN


class Query:
    def terms(self) -> set[str]:
        return set()


@dataclass(frozen=True)
class TermQuery(Query):
    term: str
    boost: float = 1.0

    def terms(self):
        return {self.term}


@dataclass(frozen=True)
class PhraseQuery(Query):
    phrase_terms: tuple[str, ...]
    positions: tuple[int, ...]  # relative positions incl. stopword gaps
    boost: float = 1.0

    def terms(self):
        return set(self.phrase_terms)


@dataclass(frozen=True)
class SloppyPhraseQuery(Query):
    """Phrase with positional slack (``search/PhraseQuery.java:73``,
    ``SloppyPhraseMatcher.java:56``): occurrences may sit up to ``slop``
    phrase-positions apart; each match contributes sloppyWeight =
    1/(1+distance) to the phrase freq (``PhraseScorer.java:73-81`` /
    ``ExactPhraseMatcher`` vs sloppy matcher split).

    Scope note (documented deviation): two-term queries sum over ALL
    in-window occurrence pairs; n > 2 terms count each minimal window of
    rel-adjusted positions once (matchLength = max − min), with repeating
    terms treated as independent lists rather than the reference's
    repeat-group handling — identical for non-repeating terms at small
    slop, which is the ``pf``/quoted-``~N`` regime this models. The same
    definition is used by the engine kernel, the pure-python oracle and the
    DuckDB SQL oracle, so parity is exact."""

    phrase_terms: tuple[str, ...]
    positions: tuple[int, ...]
    slop: int = 0
    boost: float = 1.0

    def __post_init__(self):
        if len(self.phrase_terms) < 2:
            raise ValueError("sloppy phrase needs at least 2 terms")

    def terms(self):
        return set(self.phrase_terms)


@dataclass(frozen=True)
class MultiPhraseQuery(Query):
    """Phrase where each slot admits alternative terms
    (``search/MultiPhraseQuery.java:56``): positions of a slot are the union
    over its alternatives; idf = Σ over ALL alternative terms (the weight is
    built from every term's stats, like the reference)."""

    slots: tuple[tuple[str, ...], ...]
    positions: tuple[int, ...]

    def terms(self):
        return {t for slot in self.slots for t in slot}


@dataclass(frozen=True)
class SpanNearQuery(Query):
    """Proximity algebra over term spans (``search/spans/SpanNearQuery.java:44``
    + ``NearSpansOrdered.java:48`` / ``NearSpansUnordered.java``): clauses
    must co-occur within ``slop`` excess positions, optionally in order.

    Matching semantics (documented): ordered — one span per first-clause
    occurrence, chaining each next clause to its smallest strictly-later
    position; unordered — minimal windows covering one occurrence of every
    clause (classic smallest-range sweep). A span with excess width d ≤ slop
    contributes sloppyWeight 1/(1+d) to the span freq
    (``SpanScorer.java:118-124``); scored as a pseudo-term with idf = Σ
    clause idfs. Evaluation is candidate-restricted: only docs containing
    ALL clauses are visited (the conjunction is vectorized; per-doc position
    chaining runs on those few candidates)."""

    clauses: tuple  # str (term) or nested span queries
    slop: int = 0
    in_order: bool = True

    def terms(self):
        out: set[str] = set()
        for c in self.clauses:
            out |= {c} if isinstance(c, str) else c.terms()
        return out


@dataclass(frozen=True)
class SpanTermQuery(Query):
    """``search/spans/SpanTermQuery.java:38``: unit spans (p, p+1) at every
    occurrence of the term — the leaf of the span algebra."""

    term: str

    def terms(self):
        return {self.term}


@dataclass(frozen=True)
class PayloadScoreQuery(Query):
    """``queries/payloads/PayloadScoreQuery.java:46``: wraps a span term and
    scores each matching doc by a :class:`PayloadFunction` aggregate of the
    occurrences' float payloads — ``min`` / ``max`` / ``sum`` / ``average``
    (``MinPayloadFunction.java`` etc.). Occurrences without a stored payload
    contribute 1.0 (``PayloadDecoder.FLOAT_DECODER`` null contract).
    ``include_span_score=True`` multiplies by the wrapped term's similarity
    score (``PayloadSpanScorer.scoreCurrentDoc``); ``False`` is the
    payload-only ``ScoreMode`` the Solr ``{!payload_score}`` parser defaults
    to. Requires an index built with ``store_payloads=True``."""

    term: str
    func: str = "max"  # min | max | sum | average
    include_span_score: bool = False

    def terms(self):
        return {self.term}


@dataclass(frozen=True)
class SpanPayloadCheckQuery(Query):
    """``queries/payloads/SpanPayloadCheckQuery.java:47``: keeps only span
    matches whose payloads equal ``payloads_to_match``, scored as a normal
    span query over the surviving occurrences (unit-span freq = surviving
    count). Single-term spans only (the common {!payload_check} case);
    a float payload compares exactly against the stored float32."""

    term: str
    payloads_to_match: tuple[float, ...]

    def terms(self):
        return {self.term}


@dataclass(frozen=True)
class SpanOrQuery(Query):
    """``search/spans/SpanOrQuery.java:42``: union of the sub-queries' span
    enumerations, merged in document/start order."""

    clauses: tuple

    def terms(self):
        out: set[str] = set()
        for c in self.clauses:
            out |= {c} if isinstance(c, str) else c.terms()
        return out


@dataclass(frozen=True)
class SpanNotQuery(Query):
    """``search/spans/SpanNotQuery.java:39`` (pre = post = 0): spans of
    ``include`` that do not overlap any span of ``exclude``. Scoring uses
    the include side's terms only; exclude terms are needed just to ship
    their positions."""

    include: Query
    exclude: Query

    def terms(self):
        inc = {self.include} if isinstance(self.include, str) else self.include.terms()
        exc = {self.exclude} if isinstance(self.exclude, str) else self.exclude.terms()
        return inc | exc


@dataclass(frozen=True)
class SpanFirstQuery(Query):
    """``search/spans/SpanFirstQuery.java:36``: spans of ``match`` that end
    within the first ``end`` positions of the field."""

    match: Query
    end: int

    def terms(self):
        return {self.match} if isinstance(self.match, str) else self.match.terms()


@dataclass(frozen=True)
class SpanPositionRangeQuery(Query):
    """``search/spans/SpanPositionRangeQuery.java:30``: spans of ``match``
    accepted iff ``start >= self.start and end <= self.end``
    (``acceptPosition:41-46``). SpanFirst is the ``start=0`` special case."""

    match: Query
    start: int
    end: int

    def terms(self):
        return {self.match} if isinstance(self.match, str) else self.match.terms()


@dataclass(frozen=True)
class TermAutomatonQuery(Query):
    """Token-graph proximity query (sandbox ``search/TermAutomatonQuery.java``
    + ``TermAutomatonScorer.java``): an automaton whose arcs are labeled with
    terms (or ``None`` = ANY, the ``addAnyTransition`` wildcard that matches
    whatever token sits at a position — including one of the query's own
    terms interpreted as "any"); a document matches when some path through
    the automaton consumes tokens at consecutive positions. State ``0`` is
    the initial state.

    Matching/counting semantics (``TermAutomatonScorer.countMatches``,
    mirrored exactly — see ``kernels._eval_term_automaton``):

    - the automaton is determinized first (``finish()`` calls
      ``Operations.determinize``; ANY is just another alphabet symbol), and
      path MULTIPLICITY is tracked over the DFA — per-position state counts,
      not a set;
    - a new thread is seeded only by a real-term step from state 0 at a
      token position — a match can never START with an ANY step;
    - ``freq`` increments (by the thread's multiplicity) each time a
      REAL-term step lands in an accepting DFA state; accepts reached via an
      ANY step are advanced but never counted (the reference's quirk);
    - ANY steps advance threads across every position between query-term
      tokens, so index "holes" (removed stopwords) match ANY, exactly like
      the scorer's lastPos→pos advance loop.

    Scored like a phrase: freq through the similarity with a pseudo-term
    weight built from ALL the real terms' stats (``TermAutomatonWeight``
    gathers every term's termStates)."""

    n_states: int
    transitions: tuple  # (src: int, dst: int, term: str | None), None = ANY
    accept: frozenset

    def __post_init__(self):
        if not self.accept:
            raise ValueError("automaton needs at least one accept state")
        for s, d, _t in self.transitions:
            if not (0 <= s < self.n_states and 0 <= d < self.n_states):
                raise ValueError(
                    f"transition ({s},{d}) out of range for {self.n_states} states"
                )
        for a in self.accept:
            if not (0 <= a < self.n_states):
                raise ValueError(f"accept state {a} out of range")

    def terms(self):
        return {t for _, _, t in self.transitions if t is not None}


def term_automaton_from_token_stream(slots) -> TermAutomatonQuery:
    """``TokenStreamToTermAutomatonQuery`` role: build the linear-chain
    automaton from an analyzed token stream, where each slot is the tuple of
    terms stacked at that position (posIncr=0 alternatives — e.g. a synonym
    graph or WordDelimiterGraph output). Slot i -> state i, final state
    accepts."""
    slots = tuple(tuple(s) for s in slots)
    if not slots or any(len(s) == 0 for s in slots):
        raise ValueError("every slot needs at least one term")
    transitions = tuple(
        (i, i + 1, t) for i, slot in enumerate(slots) for t in slot
    )
    return TermAutomatonQuery(
        n_states=len(slots) + 1,
        transitions=transitions,
        accept=frozenset({len(slots)}),
    )


@dataclass(frozen=True)
class SynonymQuery(Query):
    """Scores multiple terms as one pseudo-term (``search/SynonymQuery.java:55``):
    freq = Σ term freqs per doc; pseudo-stats df = max(df_i), ttf = Σ ttf_i
    (SynonymQuery.java:204-218)."""

    syn_terms: tuple[str, ...]

    def terms(self):
        return set(self.syn_terms)


@dataclass(frozen=True)
class DisjunctionMaxQuery(Query):
    """score = max(disjunct scores) + tiebreak · Σ(other scores)
    (``search/DisjunctionMaxQuery.java:45,50-66``)."""

    disjuncts: tuple[Query, ...]
    tiebreak: float = 0.0

    def terms(self):
        out: set[str] = set()
        for d in self.disjuncts:
            out |= d.terms()
        return out


@dataclass(frozen=True)
class ConstantScoreQuery(Query):
    """Matching docs all score ``boost`` (``search/ConstantScoreQuery.java:32``)."""

    inner: Query
    boost: float = 1.0

    def terms(self):
        return self.inner.terms()


@dataclass(frozen=True)
class BoostQuery(Query):
    """Multiplicative boost wrapper (``search/BoostQuery.java:34``)."""

    inner: Query
    boost: float = 1.0

    def terms(self):
        return self.inner.terms()


# ---- MultiTermQuery family (``search/MultiTermQuery.java:66``): expanded
# against the term dictionary at plan time (IndexSearcher.expand), with the
# reference's rewrite methods: CONSTANT_SCORE_REWRITE (default, :68,94),
# SCORING_BOOLEAN_REWRITE (maxClauseCount-capped), top_terms_N.

CONSTANT_SCORE = "constant_score"
SCORING_BOOLEAN = "scoring_boolean"
MAX_CLAUSE_COUNT = 1024  # IndexSearcher.maxClauseCount


class MultiTermQuery(Query):
    rewrite_method: str = CONSTANT_SCORE


@dataclass(frozen=True)
class PrefixQuery(MultiTermQuery):
    """``search/PrefixQuery.java:31``"""

    prefix: str = ""
    rewrite_method: str = CONSTANT_SCORE


@dataclass(frozen=True)
class WildcardQuery(MultiTermQuery):
    """``search/WildcardQuery.java:42`` — ``*`` any run, ``?`` one char."""

    pattern: str = ""
    rewrite_method: str = CONSTANT_SCORE


@dataclass(frozen=True)
class RegexpQuery(MultiTermQuery):
    """``search/RegexpQuery.java:48`` — anchored regex over the term dict."""

    pattern: str = ""
    rewrite_method: str = CONSTANT_SCORE


@dataclass(frozen=True)
class FuzzyQuery(MultiTermQuery):
    """``search/FuzzyQuery.java:54`` — Levenshtein expansion. The reference's
    default rewrite blends term stats (TopTermsBlendedFreqScoringRewrite);
    here constant-score is the default, scoring_boolean available."""

    term: str = ""
    max_edits: int = 2
    prefix_len: int = 0
    rewrite_method: str = CONSTANT_SCORE


@dataclass(frozen=True)
class TermRangeQuery(MultiTermQuery):
    """``search/TermRangeQuery.java:41``"""

    lower: str | None = None
    upper: str | None = None
    include_lower: bool = True
    include_upper: bool = True
    rewrite_method: str = CONSTANT_SCORE


@dataclass(frozen=True)
class TermInSetQuery(Query):
    """``search/TermInSetQuery.java:67`` — semi-join against a term set;
    constant-score like the reference (it scores 1.0 per match)."""

    set_terms: tuple[str, ...] = ()

    def terms(self):
        return set(self.set_terms)


@dataclass(frozen=True)
class PointRangeQuery(Query):
    """Numeric point-field range (``search/PointRangeQuery.java:56`` — the
    BKD-tree range visit; XML surface ``queryparser/xml/builders/
    PointRangeQueryBuilder.java:40``). Matches docs whose stored numeric
    column falls inside the (inclusive by default) bounds; constant score =
    boost (``ConstantScoreWeight`` role, like the reference).

    Columnar analogue of the BKD visit: the executor evaluates it as a
    pushed-down predicate on the docs parquet (row-group min/max stats prune
    non-matching blocks — the same skip-subtree effect the reference gets
    from the KD tree), then joins the surviving (segment_id, doc_id) set
    against the scoring side. Supported standalone or as a top-level
    BooleanQuery must/filter/must_not clause."""

    field: str = ""
    lower: float | None = None
    upper: float | None = None
    include_lower: bool = True
    include_upper: bool = True


@dataclass(frozen=True)
class MatchAllQuery(Query):
    pass


@dataclass(frozen=True)
class MatchNoneQuery(Query):
    pass


@dataclass(frozen=True)
class BooleanQuery(Query):
    must: tuple[Query, ...] = ()
    should: tuple[Query, ...] = ()
    must_not: tuple[Query, ...] = ()
    filter: tuple[Query, ...] = ()
    min_should_match: int = 0

    def terms(self):
        out: set[str] = set()
        for c in (*self.must, *self.should, *self.must_not, *self.filter):
            out |= c.terms()
        return out


def rewrite(q: Query) -> Query:
    """Fixed-point logical rewrite (reference BooleanQuery.rewrite:235-420)."""
    prev = None
    while prev != q:
        prev = q
        q = _rewrite_once(q)
    return q


def _rewrite_once(q: Query) -> Query:
    if not isinstance(q, BooleanQuery):
        return q
    must = tuple(rewrite(c) for c in q.must)
    should = tuple(rewrite(c) for c in q.should)
    must_not = tuple(dict.fromkeys(rewrite(c) for c in q.must_not))  # dedup :287-305
    filt = tuple(dict.fromkeys(rewrite(c) for c in q.filter))

    # MUST_NOT MatchAll -> MatchNone; MatchNone in MUST -> MatchNone (:307-316)
    if any(isinstance(c, MatchAllQuery) for c in must_not):
        return MatchNoneQuery()
    if any(isinstance(c, MatchNoneQuery) for c in must + filt):
        return MatchNoneQuery()
    # MUST ∧ MUST_NOT same clause -> MatchNone (:307-316)
    if set(must) & set(must_not) or set(filt) & set(must_not):
        return MatchNoneQuery()
    # drop FILTER clause already in MUST (:320-337)
    filt = tuple(c for c in filt if c not in set(must))
    # SHOULD ∩ FILTER -> MUST (scoring dedup, :340-365)
    promote = [c for c in should if c in set(filt)]
    if promote and q.min_should_match == 0:
        must = must + tuple(promote)
        should = tuple(c for c in should if c not in set(promote))
        filt = tuple(c for c in filt if c not in set(promote))
    # drop MatchNone SHOULD clauses
    should = tuple(c for c in should if not isinstance(c, MatchNoneQuery))
    # empty boolean -> MatchNone (:235-262)
    if not must and not should and not filt:
        return MatchNoneQuery()
    # pure SHOULD with minShouldMatch > len -> MatchNone
    if q.min_should_match > len(should) and not (must or filt):
        return MatchNoneQuery()
    # single-clause flattening (:235-262): 1 MUST, nothing else
    if len(must) == 1 and not should and not must_not and not filt:
        return must[0]
    if len(should) == 1 and not must and not must_not and not filt and q.min_should_match <= 1:
        return should[0]
    return BooleanQuery(must, should, must_not, filt, q.min_should_match)


def _slots(terms, pos) -> list[tuple[str, ...]]:
    """Group a token stream into per-position slots (stacked posIncr=0
    tokens share a slot) — the sausage QueryBuilder walks in
    analyzeGraphBoolean/analyzeGraphPhrase. Slot order follows position."""
    by_pos: dict[int, list[str]] = {}
    for t, p in zip(terms, pos):
        by_pos.setdefault(p, []).append(t)
    return [tuple(dict.fromkeys(by_pos[p])) for p in sorted(by_pos)]


# ---------------------------------------------------------------------------
# multi-word query-time synonyms (QueryBuilder.analyzeGraphBoolean /
# analyzeGraphPhrase, util/QueryBuilder.java:540-640 + SynonymGraphFilter
# token-graph semantics, analysis/common/.../synonym/SynonymGraphFilter.
# java:58). The posting format stores no posLength, so multi-word rules are
# compiled HERE — into the query graph — rather than into a token stream:
# each matched span becomes a component whose alternatives are the original
# tokens plus every output path. Components stay FACTORED (SynonymQuery /
# BooleanQuery-of-phrases / SpanOr per component) instead of the reference's
# up-to-1024 enumerated full paths — same match semantics, no combinatorial
# blowup.


def _graph_synonyms(analyzer):
    """synonymq: spec whose rules include multi-word entries →
    (base_chain, graph_rules); single-token specs return None and keep the
    stacked-token path (identical query shapes to rounds 1-3)."""
    from ..analysis import _synonym_spec

    if not (isinstance(analyzer, str) and analyzer.startswith("synonymq:")):
        return None
    base, path = _synonym_spec(analyzer)
    rules = _graph_rules_cached(path)
    multi = any(
        len(lhs) > 1 or any(len(o) > 1 for o in outs)
        for cands in rules.values()
        for lhs, _rep, outs in cands
    )
    return (base, rules) if multi else None


@lru_cache(maxsize=256)
def _graph_rules_cached(path: str):
    from ..analysis import parse_synonym_rules_graph

    return parse_synonym_rules_graph(path)


def _graph_components(terms, rules) -> list[tuple[tuple[str, ...], ...]]:
    """Left-to-right longest-match over the base token stream. Each
    component is a tuple of alternative token paths; unmatched tokens are
    single-path components. Matches never overlap (SynonymMap resumes
    scanning after a match)."""
    comps: list[tuple] = []
    i, n = 0, len(terms)
    while i < n:
        hit = None
        for lhs, replace, outs in rules.get(terms[i], ()):
            if tuple(terms[i : i + len(lhs)]) == lhs:
                hit = (lhs, replace, outs)
                break
        if hit is None:
            comps.append(((terms[i],),))
            i += 1
            continue
        lhs, replace, outs = hit
        alts = outs if replace else (lhs, *outs)
        comps.append(tuple(dict.fromkeys(alts)))
        i += len(lhs)
    return comps


def _path_query(path: tuple[str, ...]) -> Query:
    return (
        TermQuery(path[0])
        if len(path) == 1
        else PhraseQuery(path, tuple(range(len(path))))
    )


def _graph_boolean(text: str, base: str, rules) -> Query:
    """analyzeGraphBoolean role: per component, single-token alternatives
    blend as SynonymQuery; a component with a multi-token path becomes a
    SHOULD over per-path Term/Phrase queries; components conjoin."""
    terms, _pos = ANALYZERS[base](text)
    if not terms:
        return MatchNoneQuery()
    per_comp = []
    for alts in _graph_components(terms, rules):
        if len(alts) == 1:
            per_comp.append(_path_query(alts[0]))
        elif all(len(a) == 1 for a in alts):
            per_comp.append(SynonymQuery(tuple(a[0] for a in alts)))
        else:
            per_comp.append(BooleanQuery(should=tuple(_path_query(a) for a in alts)))
    if len(per_comp) == 1:
        return per_comp[0]
    return BooleanQuery(must=tuple(per_comp))


def _path_span(path: tuple[str, ...]) -> Query:
    return (
        SpanTermQuery(path[0])
        if len(path) == 1
        else SpanNearQuery(tuple(SpanTermQuery(t) for t in path), slop=0, in_order=True)
    )


def _graph_phrase(text: str, slop: int, base: str, rules) -> Query:
    """analyzeGraphPhrase role (QueryBuilder.java:586): SpanNear over
    per-component clauses — SpanOr where a component has alternatives,
    nested zero-slop SpanNear for multi-token paths."""
    terms, pos = ANALYZERS[base](text)
    if not terms:
        return MatchNoneQuery()
    comps = _graph_components(terms, rules)
    if all(len(alts) == 1 and len(alts[0]) == 1 for alts in comps):
        # no synonym touched the phrase: keep the plain positional phrase
        # (exact positions, stopword gaps intact)
        base_pos = tuple(p - pos[0] for p in pos)
        if len(terms) == 1:
            return TermQuery(terms[0])
        if slop > 0:
            return SloppyPhraseQuery(tuple(terms), base_pos, slop)
        return PhraseQuery(tuple(terms), base_pos)
    clauses = tuple(
        _path_span(alts[0])
        if len(alts) == 1
        else SpanOrQuery(tuple(_path_span(a) for a in alts))
        for alts in comps
    )
    if len(clauses) == 1:
        return clauses[0]
    return SpanNearQuery(clauses, slop=slop, in_order=True)


def _analyze_to_query(text: str, analyzer: str) -> Query:
    """One query-text fragment → Term / Synonym / boolean
    (``QueryBuilder.createBooleanQuery`` + ``analyzeGraphBoolean``,
    ``util/QueryBuilder.java:120-180,540-570``): a position slot with
    stacked tokens — a query-time synonym chain — becomes a SynonymQuery
    (scored as one pseudo-term), slots combine as a conjunction."""
    g = _graph_synonyms(analyzer)
    if g is not None:
        return _graph_boolean(text, *g)
    terms, pos = ANALYZERS[analyzer](text)
    if not terms:
        return MatchNoneQuery()
    slots = _slots(terms, pos)
    per_slot = [
        TermQuery(s[0]) if len(s) == 1 else SynonymQuery(s) for s in slots
    ]
    if len(per_slot) == 1:
        return per_slot[0]
    # multi-token fragment: conjunction (QueryBuilder operator AND for code ids)
    return BooleanQuery(must=tuple(per_slot))


def parse_query(text: str, analyzer: str = "code") -> Query:
    """Parse the benchmark-style query syntax into a Query tree.

    Parses are memoized (queries are frozen dataclasses — safe to share):
    the role of Solr's query-parsing layer caches in a large batched job,
    where the same query strings recur across requests."""
    return _parse_query_cached(text.strip(), analyzer)


@lru_cache(maxsize=65536)
def _parse_query_cached(text: str, analyzer: str = "code") -> Query:
    # MatchAllDocsQuery syntax (Solr/classic QueryParser "*:*")
    if text == "*:*":
        return MatchAllQuery()
    # index-side graph chains (code_graph) analyze queries with base rules
    analyzer = QUERY_CHAIN.get(analyzer, analyzer)
    # sloppy phrase: "..."~N (QueryParser proximity syntax)
    slop = 0
    if text.startswith('"') and "~" in text and text.rsplit("~", 1)[1].isdigit():
        body, s = text.rsplit("~", 1)
        if body.endswith('"'):
            text, slop = body, int(s)
    if text.startswith('"') and text.endswith('"') and len(text) > 1:
        g = _graph_synonyms(analyzer)
        if g is not None:
            return _graph_phrase(text[1:-1], slop, *g)
        terms, pos = ANALYZERS[analyzer](text[1:-1])
        if not terms:
            return MatchNoneQuery()
        if len(terms) == 1:
            return TermQuery(terms[0])
        base = pos[0]
        rel = tuple(p - base for p in pos)
        if len(set(pos)) != len(terms):
            # stacked tokens (query-time synonym chain): graph phrase
            # (QueryBuilder.analyzeGraphPhrase, util/QueryBuilder.java:
            # 590-640) — slop=0 builds a MultiPhraseQuery over the position
            # slots; slop>0 builds SpanNear over per-slot SpanOr clauses
            slots = _slots(terms, pos)
            if slop > 0:
                clauses = tuple(
                    SpanTermQuery(s[0])
                    if len(s) == 1
                    else SpanOrQuery(tuple(SpanTermQuery(t) for t in s))
                    for s in slots
                )
                return SpanNearQuery(clauses, slop=slop, in_order=True)
            upos = sorted(set(pos))
            return MultiPhraseQuery(
                tuple(slots), tuple(p - upos[0] for p in upos)
            )
        if slop > 0:
            return SloppyPhraseQuery(tuple(terms), rel, slop)
        # NGramPhraseQuery optimization (search/NGramPhraseQuery.java:34-79):
        # a phrase of consecutive fixed-size grams matches iff every n-th
        # gram plus the last one matches at its position — the kept grams
        # tile the query string, so the match set is identical with ~1/n the
        # posting work. Scores change (fewer pseudo-terms), as in Lucene.
        n = NGRAM_SIZES.get(analyzer)
        if (
            n
            and len(terms) > 2
            and all(len(t) == n for t in terms)
            and rel == tuple(range(len(terms)))
        ):
            keep = list(range(0, len(terms), n))
            if keep[-1] != len(terms) - 1:
                keep.append(len(terms) - 1)
            if len(keep) < len(terms):
                return PhraseQuery(
                    tuple(terms[i] for i in keep), tuple(keep)
                )
        return PhraseQuery(tuple(terms), rel)
    # +/- syntax
    toks = text.split()
    if any(t.startswith(("+", "-")) for t in toks):
        must, must_not, should = [], [], []
        for t in toks:
            if t in ("AND", "OR"):
                continue
            if t.startswith("+"):
                must.append(_analyze_to_query(t[1:], analyzer))
            elif t.startswith("-"):
                must_not.append(_analyze_to_query(t[1:], analyzer))
            else:
                should.append(_analyze_to_query(t, analyzer))
        return rewrite(BooleanQuery(tuple(must), tuple(should), tuple(must_not)))
    if " OR " in text:
        parts = [p.strip() for p in text.split(" OR ")]
        return rewrite(BooleanQuery(should=tuple(_analyze_to_query(p, analyzer) for p in parts)))
    if " AND " in text:
        parts = [p.strip() for p in text.split(" AND ")]
        return rewrite(BooleanQuery(must=tuple(_analyze_to_query(p, analyzer) for p in parts)))
    return rewrite(_analyze_to_query(text, analyzer))
