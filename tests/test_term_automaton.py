"""TermAutomatonQuery (sandbox TermAutomatonQuery.java + TermAutomatonScorer
.java): determinized token-graph matching with per-position state
multiplicities. Engine freqs are checked against a brute-force interpretation
-path counter (the countMatches spec: freq = number of accepting paths whose
LAST consumed symbol is a real term; ANY steps advance threads but never
count an accept), and the token-stream builder is checked score-identical to
PhraseQuery on linear chains."""

import random

import pytest
from pyspark.sql import functions as F

ANY = None


def brute_freq(tokens: list[str], transitions, accept, qterms) -> int:
    """Count accepting interpretation paths over the DETERMINIZED automaton
    (subset construction mirrors TermAutomatonQuery.finish's determinize):
    a path starts at any position in state {0}, consumes one symbol per
    position — the real token (if it's a query term and an arc matches) or
    ANY — and counts ONE the moment a real-term step lands in an accepting
    DFA state (continuing threads may count again later)."""
    from collections import defaultdict

    nfa = defaultdict(lambda: defaultdict(set))
    for s, d, t in transitions:
        nfa[s][t].add(d)

    def dstep(cur: frozenset, sym):
        out = set()
        for s in cur:
            out |= nfa[s].get(sym, set())
        return frozenset(out)

    start = frozenset({0})
    acc = frozenset(accept)
    total = 0

    def walk(pos: int, cur: frozenset):
        nonlocal total
        if pos >= len(tokens):
            return
        tok = tokens[pos]
        if tok in qterms:
            nxt = dstep(cur, tok)
            if nxt:
                if nxt & acc:
                    total += 1
                walk(pos + 1, nxt)
        nxt = dstep(cur, ANY)
        if nxt:
            # ANY never counts an accept (TermAutomatonScorer.countMatches
            # only increments freq on real-term steps)
            walk(pos + 1, nxt)

    # threads are seeded ONLY by a real-term step from state 0 at a token
    # position (countMatches' `runAutomaton.step(0, sub.termID)`) — a match
    # can never START with an ANY step
    for p in range(len(tokens)):
        tok = tokens[p]
        if tok not in qterms:
            continue
        nxt = dstep(start, tok)
        if nxt:
            if nxt & acc:
                total += 1
            walk(p + 1, nxt)
    return total


DOCS = [
    "alpha beta gamma alpha beta",
    "alpha alpha alpha",
    "beta gamma delta alpha",
    "gamma gamma beta alpha beta gamma",
    "delta epsilon alpha zeta beta",
    "alpha beta alpha beta alpha beta",
    "zeta eta theta",
    "beta alpha gamma beta alpha",
]


@pytest.fixture(scope="module")
def ta_index(spark, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    rows = [("r", f"d{i}", "c", t) for i, t in enumerate(DOCS)]
    docs = spark.createDataFrame(rows, "repo string, path string, commit string, content string")
    d = str(tmp_path_factory.mktemp("ta") / "idx")
    build_index(spark, docs, d, num_segments=2, analyzer="simple",
                content_col="content")
    return d


def _engine_freqs(spark, index_dir, q):
    """(path -> freq) recovered from unsaturated scoring: run with a
    freq-transparent check — instead, use matches + compare scores below."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="simple", precision="f64")
    hits = s.search_many({0: q}, k=None)
    docs = spark.read.parquet(index_dir + "/docs").select(
        "segment_id", "doc_id", "path"
    )
    return {
        r.path: float(r.score)
        for r in hits.join(docs, ["segment_id", "doc_id"]).collect()
    }


AUTOMATA = [
    # linear phrase: alpha beta
    (3, ((0, 1, "alpha"), (1, 2, "beta")), {2}),
    # alpha ANY beta
    (4, ((0, 1, "alpha"), (1, 2, ANY), (2, 3, "beta")), {3}),
    # (alpha|gamma) beta
    (3, ((0, 1, "alpha"), (0, 1, "gamma"), (1, 2, "beta")), {2}),
    # alpha+ (self loop, accept at 1)
    (2, ((0, 1, "alpha"), (1, 1, "alpha")), {1}),
    # accept mid-path AND at end: alpha (accept) beta (accept)
    (3, ((0, 1, "alpha"), (1, 2, "beta")), {1, 2}),
    # ANY-final quirk: alpha ANY with accept reached only via ANY -> freq 0
    (3, ((0, 1, "alpha"), (1, 2, ANY)), {2}),
    # branch with different lengths: alpha beta | alpha gamma delta? ->
    # alpha (beta | ANY gamma)
    (4, ((0, 1, "alpha"), (1, 2, "beta"), (1, 3, ANY), (3, 2, "gamma")), {2}),
]


@pytest.mark.parametrize("n_states,transitions,accept", AUTOMATA)
def test_automaton_matches_brute_force(spark, ta_index, n_states, transitions, accept):
    from lucene_solr_spark.search.query import TermAutomatonQuery

    q = TermAutomatonQuery(
        n_states=n_states,
        transitions=tuple(transitions),
        accept=frozenset(accept),
    )
    got = _engine_freqs(spark, ta_index, q)
    qterms = q.terms()
    expect_freq = {
        f"d{i}": brute_freq(t.split(), transitions, accept, qterms)
        for i, t in enumerate(DOCS)
    }
    assert set(got) == {p for p, f in expect_freq.items() if f > 0}
    # scores must be monotone in freq within equal-norm docs; stronger:
    # compare against the engine's own phrase seam by recomputing the score
    # from (freq, doc) via a second automaton run is circular — instead
    # assert freq ordering is respected for same-length docs
    lens = {f"d{i}": len(t.split()) for i, t in enumerate(DOCS)}
    by_len: dict[int, list] = {}
    for p, sc in got.items():
        by_len.setdefault(lens[p], []).append((expect_freq[p], sc))
    for pairs in by_len.values():
        pairs.sort()
        freqs = [f for f, _ in pairs]
        scores = [s for _, s in pairs]
        assert scores == sorted(scores), (freqs, scores)


def test_automaton_from_token_stream_equals_phrase(spark, ta_index):
    """TokenStreamToTermAutomatonQuery role: a single-alternative chain must
    be score-identical to PhraseQuery (same freq = match starts, same
    idf-sum weight)."""
    from lucene_solr_spark.search.query import (
        PhraseQuery,
        term_automaton_from_token_stream,
    )

    ta = term_automaton_from_token_stream((("alpha",), ("beta",)))
    pq = PhraseQuery(phrase_terms=("alpha", "beta"), positions=(0, 1))
    a = _engine_freqs(spark, ta_index, ta)
    b = _engine_freqs(spark, ta_index, pq)
    assert a.keys() == b.keys() and len(a) > 0
    for p in a:
        assert a[p] == pytest.approx(b[p], rel=1e-9)


def test_automaton_stacked_slots_match_alternatives(spark, ta_index):
    """Multi-alternative slots (stacked posIncr=0 tokens) accept either
    term at that position."""
    from lucene_solr_spark.search.query import term_automaton_from_token_stream

    ta = term_automaton_from_token_stream((("alpha", "gamma"), ("beta",)))
    got = _engine_freqs(spark, ta_index, ta)
    expect = {
        f"d{i}": brute_freq(
            t.split(),
            ((0, 1, "alpha"), (0, 1, "gamma"), (1, 2, "beta")),
            {2},
            {"alpha", "gamma", "beta"},
        )
        for i, t in enumerate(DOCS)
    }
    assert set(got) == {p for p, f in expect.items() if f > 0}


def test_automaton_validation(spark):
    from lucene_solr_spark.search.query import TermAutomatonQuery

    with pytest.raises(ValueError):
        TermAutomatonQuery(n_states=2, transitions=((0, 5, "x"),),
                           accept=frozenset({1}))
    with pytest.raises(ValueError):
        TermAutomatonQuery(n_states=2, transitions=((0, 1, "x"),),
                           accept=frozenset())


def test_automaton_random_vs_brute(spark, ta_index):
    """Randomized sweep: random small automata over the corpus vocabulary,
    engine match set == brute-force path counter's positive-freq set."""
    from lucene_solr_spark.search.query import TermAutomatonQuery

    rng = random.Random(42)
    vocab = ["alpha", "beta", "gamma", "delta", ANY]
    for trial in range(12):
        n = rng.randint(2, 4)
        n_tr = rng.randint(2, 6)
        transitions = tuple(
            (rng.randrange(n), rng.randrange(n), rng.choice(vocab))
            for _ in range(n_tr)
        )
        accept = frozenset(
            rng.sample(range(n), rng.randint(1, n))
        )
        q = TermAutomatonQuery(
            n_states=n, transitions=transitions, accept=accept
        )
        if not q.terms():
            continue
        got = set(_engine_freqs(spark, ta_index, q))
        expect = {
            f"d{i}"
            for i, t in enumerate(DOCS)
            if brute_freq(t.split(), transitions, accept, q.terms()) > 0
        }
        assert got == expect, (trial, transitions, accept)
