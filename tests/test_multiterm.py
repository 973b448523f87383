"""MultiTermQuery family + DisMax/Synonym/Boost semantics against manual
composition oracles (SearchEquivalenceTestBase style: query A ≡ query B)."""

import numpy as np
import pytest

from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    PrefixQuery,
    RegexpQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)


@pytest.fixture(scope="module")
def searcher(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    return IndexSearcher(spark, tiny_index[0], analyzer="code")


def _hits(searcher, q, k=None):
    rows = searcher.search_many({0: q}, k=k).collect()
    return {(r.segment_id, r.doc_id): float(np.float32(r.score)) for r in rows}


def test_prefix_expansion(searcher):
    terms = searcher.matching_terms(PrefixQuery(prefix="par"))
    assert terms and all(t.startswith("par") for t in terms)
    hits = _hits(searcher, PrefixQuery(prefix="par"))
    manual = set()
    for t in terms:
        manual |= set(_hits(searcher, TermQuery(t)))
    assert set(hits) == manual
    assert all(s == 1.0 for s in hits.values())  # constant score


def test_prefix_scoring_boolean(searcher):
    terms = searcher.matching_terms(PrefixQuery(prefix="pars"))
    assert 0 < len(terms) <= 1024
    q = PrefixQuery(prefix="pars", rewrite_method="scoring_boolean")
    ref = BooleanQuery(should=tuple(TermQuery(t) for t in terms))
    assert _hits(searcher, q) == _hits(searcher, ref)


def test_wildcard_and_regexp_agree(searcher):
    wc = searcher.matching_terms(WildcardQuery(pattern="pa*se"))
    re_ = searcher.matching_terms(RegexpQuery(pattern="pa.*se"))
    assert sorted(wc) == sorted(re_)
    assert all(t.startswith("pa") and t.endswith("se") for t in wc)


def test_term_range(searcher):
    terms = searcher.matching_terms(TermRangeQuery(lower="parse", upper="parsf"))
    assert "parse" in terms
    ex = searcher.matching_terms(
        TermRangeQuery(lower="parse", upper="parsf", include_lower=False)
    )
    assert "parse" not in ex


def test_fuzzy_expansion(searcher):
    terms = searcher.matching_terms(FuzzyQuery(term="parse", max_edits=1))
    assert "parse" in terms
    for t in terms:
        assert abs(len(t) - 5) <= 1


def test_term_in_set_semi_join(searcher):
    q = TermInSetQuery(set_terms=("parse", "buffer", "zz_nonexistent"))
    hits = _hits(searcher, q)
    manual = set(_hits(searcher, TermQuery("parse"))) | set(
        _hits(searcher, TermQuery("buffer"))
    )
    assert set(hits) == manual
    assert all(s == 1.0 for s in hits.values())


def test_dismax_is_max_plus_tiebreak(searcher):
    a = _hits(searcher, TermQuery("parse"))
    b = _hits(searcher, TermQuery("buffer"))
    got = _hits(searcher, DisjunctionMaxQuery((TermQuery("parse"), TermQuery("buffer")), 0.1))
    assert set(got) == set(a) | set(b)
    for d in got:
        scores = [s for s in (a.get(d), b.get(d)) if s is not None]
        want = np.float32(max(scores) + np.float32(0.1) * (sum(scores) - max(scores)))
        assert abs(got[d] - float(want)) < 1e-5, d


def test_boost_scales_scores(searcher):
    base = _hits(searcher, TermQuery("parse"))
    boosted = _hits(searcher, BoostQuery(TermQuery("parse"), 3.0))
    assert set(base) == set(boosted)
    for d in base:
        assert abs(boosted[d] - float(np.float32(base[d] * 3.0))) < 1e-5


def test_constant_score_wrapper(searcher):
    base = _hits(searcher, TermQuery("parse"))
    cs = _hits(searcher, ConstantScoreQuery(TermQuery("parse"), boost=0.5))
    assert set(base) == set(cs)
    assert all(s == 0.5 for s in cs.values())


def test_synonym_pseudo_stats(searcher, spark, tiny_index):
    """df = max over synonyms, freq = Σ tf — recompute from decoded postings."""
    from lucene_solr_spark.index.read import norms_table, term_postings
    from lucene_solr_spark.search.bm25 import idf, term_weight

    t1, t2 = "parse", "parser"
    got = _hits(searcher, SynonymQuery(syn_terms=(t1, t2)))
    posts = term_postings(spark, tiny_index[0], [t1, t2]).collect()
    dfs = {}
    freq = {}
    for r in posts:
        dfs[r.term] = dfs.get(r.term, 0) + 1
        freq[(r.segment_id, r.doc_id)] = freq.get((r.segment_id, r.doc_id), 0) + r.freq
    assert set(got) == set(freq)
    df_max = max(dfs.values())
    w = term_weight(idf(np.array([df_max]), searcher.doc_count)[0])
    norms = {
        (r.segment_id, r.doc_id): r.norm_byte
        for r in norms_table(spark, tiny_index[0]).collect()
    }
    from lucene_solr_spark.search.bm25 import norm_cache

    cache = norm_cache(searcher.avgdl)
    for d, f in freq.items():
        tf = np.float64(f) / (np.float64(f) + np.float64(cache[norms[d]]))
        want = float(np.float32(w) * np.float32(tf))
        assert abs(got[d] - want) < 1e-5, d


def test_multiterm_inside_boolean(searcher):
    q = BooleanQuery(
        must=(PrefixQuery(prefix="pars", rewrite_method="scoring_boolean"),),
        must_not=(TermQuery("buffer"),),
    )
    hits = _hits(searcher, q)
    buf = set(_hits(searcher, TermQuery("buffer")))
    assert hits and not (set(hits) & buf)


def test_multi_phrase_union_of_exact(searcher):
    """MultiPhrase("parse"|"index", X) ≡ union of the two exact phrases on
    doc sets; freq = sum when both alternatives match at different spots."""
    from lucene_solr_spark.search.query import MultiPhraseQuery, PhraseQuery

    mp = MultiPhraseQuery(slots=(("index", "merge"), ("writer",)), positions=(0, 1))
    got = _hits(searcher, mp)
    p1 = set(_hits(searcher, PhraseQuery(("index", "writer"), (0, 1))))
    p2 = set(_hits(searcher, PhraseQuery(("merge", "writer"), (0, 1))))
    assert set(got) == p1 | p2
    assert got  # corpus contains "index writer"


def test_multi_phrase_single_slot_equals_phrase_docs(searcher):
    from lucene_solr_spark.search.query import MultiPhraseQuery, PhraseQuery

    mp = MultiPhraseQuery(slots=(("index",), ("writer",)), positions=(0, 1))
    ph = PhraseQuery(("index", "writer"), (0, 1))
    # same docs and same freqs -> same tf part; idf identical (same term set)
    assert _hits(searcher, mp) == _hits(searcher, ph)
