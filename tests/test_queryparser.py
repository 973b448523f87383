"""Classic QueryParser: grammar coverage, QueryParserBase.addClause
conjunction quirks, suffix operators, escaping, and end-to-end search
through the engine."""

import pytest

from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoneQuery,
    PhraseQuery,
    PrefixQuery,
    SloppyPhraseQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
)
from lucene_solr_spark.search.queryparser import ClassicQueryParser, parse_classic


def T(t):
    return TermQuery(t)


def test_operators_and_modifiers():
    assert parse_classic("index AND writer") == BooleanQuery(must=(T("index"), T("writer")))
    assert parse_classic("index && writer") == BooleanQuery(must=(T("index"), T("writer")))
    assert parse_classic("index OR writer") == BooleanQuery(should=(T("index"), T("writer")))
    assert parse_classic("index || writer") == BooleanQuery(should=(T("index"), T("writer")))
    assert parse_classic("+index -segment writer") == BooleanQuery(
        must=(T("index"),), should=(T("writer"),), must_not=(T("segment"),)
    )
    assert parse_classic("NOT segment index") == BooleanQuery(
        should=(T("index"),), must_not=(T("segment"),)
    )
    assert parse_classic("!segment index") == BooleanQuery(
        should=(T("index"),), must_not=(T("segment"),)
    )


def test_add_clause_retroactive_promotion():
    # the classic quirk: "x AND y OR z" (default OR) == +x +y z
    assert parse_classic("index AND writer OR merge") == BooleanQuery(
        must=(T("index"), T("writer")), should=(T("merge"),)
    )
    # default AND: OR retroactively demotes the previous clause
    assert parse_classic("index AND writer OR merge", default_op="AND") == BooleanQuery(
        must=(T("index"),), should=(T("writer"), T("merge"))
    )
    # default AND: bare terms are required
    assert parse_classic("index writer", default_op="AND") == BooleanQuery(
        must=(T("index"), T("writer"))
    )


def test_grouping_and_boost():
    q = parse_classic("(buffer OR stream) AND merge^2")
    assert q == BooleanQuery(
        must=(
            BooleanQuery(should=(T("buffer"), T("stream"))),
            BoostQuery(T("merge"), 2.0),
        )
    )
    # boost on a group and on a phrase
    q = parse_classic('(buffer stream)^0.5')
    assert q == BoostQuery(BooleanQuery(should=(T("buffer"), T("stream"))), 0.5)
    q = parse_classic('"index writer"^3')
    assert q == BoostQuery(PhraseQuery(("index", "writer"), (0, 1)), 3.0)


def test_phrases_and_slop():
    assert parse_classic('"index writer"') == PhraseQuery(("index", "writer"), (0, 1))
    assert parse_classic('"index writer"~2') == SloppyPhraseQuery(
        ("index", "writer"), (0, 1), 2
    )
    # stopword gap preserved in relative positions (code chain drops "the")
    q = parse_classic('"merge the segments"')
    assert q == PhraseQuery(("merge", "segments"), (0, 2))


def test_multiterm_syntax():
    assert parse_classic("spar*") == PrefixQuery(prefix="spar")
    assert parse_classic("te?t") == WildcardQuery(pattern="te?t")
    assert parse_classic("t*st?") == WildcardQuery(pattern="t*st?")
    assert parse_classic("parze~1") == FuzzyQuery(term="parze", max_edits=1)
    assert parse_classic("parze~") == FuzzyQuery(term="parze", max_edits=2)
    assert parse_classic("[tab TO tac]") == TermRangeQuery(lower="tab", upper="tac")
    assert parse_classic("{tab TO tac}") == TermRangeQuery(
        lower="tab", upper="tac", include_lower=False, include_upper=False
    )
    assert parse_classic("[* TO merge}") == TermRangeQuery(
        lower=None, upper="merge", include_upper=False
    )
    assert parse_classic("*:*") == MatchAllQuery()


def test_field_prefix():
    assert parse_classic("content:index") == T("index")
    assert parse_classic('content:"index writer"') == PhraseQuery(
        ("index", "writer"), (0, 1)
    )
    with pytest.raises(ValueError, match="unknown field"):
        parse_classic("title:index")
    p = ClassicQueryParser(field_aliases=("title",))
    assert p.parse("title:index") == T("index")


def test_escaped_colon_is_not_a_field_separator():
    # QueryParser.jj escaping: foo\:bar is one raw term, not field "foo\" —
    # the analyzer then splits on the punctuation like StandardAnalyzer does
    assert parse_classic(r"foo\:bar") == BooleanQuery(should=(T("foo"), T("bar")))
    # escaped colon at position 0 still takes the term path
    assert parse_classic(r"\:index") == T("index")
    # unescaped colon still routes through field resolution
    assert parse_classic("content:foo") == T("foo")


def test_analyzer_splitting_and_stopwords():
    # camelCase identifier → default-operator boolean over subwords
    assert parse_classic("camelCaseIdent") == BooleanQuery(
        should=(T("camel"), T("case"), T("ident"))
    )
    assert parse_classic("camelCaseIdent", default_op="AND") == BooleanQuery(
        must=(T("camel"), T("case"), T("ident"))
    )
    # stopword-only clause is dropped like the reference's null clause
    assert parse_classic("the AND index") == T("index")
    # all clauses dropped → MatchNone
    assert parse_classic("the") == MatchNoneQuery()


def test_escaping_and_errors():
    assert parse_classic(r"foo\-bar") == BooleanQuery(should=(T("foo"), T("bar")))
    with pytest.raises(ValueError):
        parse_classic("(unbalanced")
    with pytest.raises(ValueError):
        parse_classic("unbalanced)")
    with pytest.raises(ValueError, match="bad range"):
        parse_classic("[a b]")


def test_nested_depth():
    q = parse_classic("((index AND (writer OR merge)) -flush)")
    assert q == BooleanQuery(
        should=(
            BooleanQuery(
                must=(
                    T("index"),
                    BooleanQuery(should=(T("writer"), T("merge"))),
                )
            ),
        ),
        must_not=(T("flush"),),
    )


def test_end_to_end_search(spark, tiny_index):
    """Classic-syntax queries run through the ordinary searcher and return
    the same hits as the equivalent hand-built algebra."""
    from lucene_solr_spark.search import IndexSearcher

    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir, analyzer="code")
    q1 = parse_classic('(parse AND http) OR "index writer"~1^2')
    manual = BooleanQuery(
        should=(
            BooleanQuery(must=(T("parse"), T("http"))),
            BoostQuery(SloppyPhraseQuery(("index", "writer"), (0, 1), 1), 2.0),
        )
    )
    assert q1 == manual
    a = sorted(
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search_many({0: q1}, k=None).collect()
    )
    assert len(a) > 0
    b = sorted(
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search_many({0: manual}, k=None).collect()
    )
    assert a == b


# ---------------------------------------------------------------------------
# round-trip property: random query trees → classic syntax → parse → equal

from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.analysis import ENGLISH_STOP_WORDS  # the 33-word set
from lucene_solr_spark.search.query import rewrite

_BAD = set(ENGLISH_STOP_WORDS) | {"and", "or", "not", "to"}
_term = st.from_regex(r"[a-z][a-z0-9]{1,5}", fullmatch=True).filter(
    lambda t: t not in _BAD
)


def _to_classic(q) -> str:
    if isinstance(q, TermQuery):
        return q.term
    if isinstance(q, PhraseQuery):
        return '"' + " ".join(q.phrase_terms) + '"'
    if isinstance(q, SloppyPhraseQuery):
        return '"' + " ".join(q.phrase_terms) + f'"~{q.slop}'
    if isinstance(q, PrefixQuery):
        return q.prefix + "*"
    if isinstance(q, WildcardQuery):
        return q.pattern
    if isinstance(q, FuzzyQuery):
        return f"{q.term}~{q.max_edits}"
    if isinstance(q, TermRangeQuery):
        lo = q.lower if q.lower is not None else "*"
        hi = q.upper if q.upper is not None else "*"
        return ("[" if q.include_lower else "{") + f"{lo} TO {hi}" + (
            "]" if q.include_upper else "}"
        )
    if isinstance(q, BoostQuery):
        inner = _to_classic(q.inner)
        if isinstance(q.inner, BooleanQuery):
            inner = f"({inner})"
        return f"{inner}^{q.boost:g}"
    if isinstance(q, BooleanQuery):
        parts = []
        for c in q.must:
            parts.append("+" + _wrap(c))
        for c in q.must_not:
            parts.append("-" + _wrap(c))
        for c in q.should:
            parts.append(_wrap(c))
        return " ".join(parts)
    raise TypeError(type(q))


def _wrap(q) -> str:
    s = _to_classic(q)
    return f"({s})" if isinstance(q, BooleanQuery) else s


_leaf = st.one_of(
    _term.map(TermQuery),
    st.lists(_term, min_size=2, max_size=4, unique=True).map(
        lambda ts: PhraseQuery(tuple(ts), tuple(range(len(ts))))
    ),
    st.tuples(st.lists(_term, min_size=2, max_size=3, unique=True), st.integers(1, 4)).map(
        lambda t: SloppyPhraseQuery(tuple(t[0]), tuple(range(len(t[0]))), t[1])
    ),
    _term.map(lambda t: PrefixQuery(prefix=t)),
    _term.map(lambda t: WildcardQuery(pattern=t[:1] + "?" + t[1:])),
    st.tuples(_term, st.integers(1, 2)).map(
        lambda t: FuzzyQuery(term=t[0], max_edits=t[1])
    ),
    st.tuples(_term, _term, st.booleans(), st.booleans()).map(
        lambda t: TermRangeQuery(
            lower=min(t[0], t[1]), upper=max(t[0], t[1]),
            include_lower=t[2], include_upper=t[3],
        )
    ),
)


def _bool(children):
    return st.tuples(
        st.lists(children, min_size=0, max_size=2),
        st.lists(children, min_size=0, max_size=2),
        st.lists(_term.map(TermQuery), min_size=0, max_size=1),
    ).filter(lambda t: len(t[0]) + len(t[1]) > 0).map(
        lambda t: BooleanQuery(must=tuple(t[0]), should=tuple(t[1]), must_not=tuple(t[2]))
    )


_tree = st.recursive(
    _leaf,
    lambda kids: st.one_of(
        _bool(kids),
        st.tuples(kids, st.sampled_from([0.5, 2.0, 3.0])).map(
            lambda t: BoostQuery(t[0], t[1])
        ),
    ),
    max_leaves=8,
)


@settings(max_examples=300, deadline=None)
@given(_tree)
def test_roundtrip_tree_to_syntax_to_tree(q):
    canon = rewrite(q)
    if isinstance(canon, MatchNoneQuery):
        return
    got = parse_classic(_to_classic(canon), analyzer="simple")
    assert got == canon, f"{_to_classic(canon)!r}: {got} != {canon}"


# ------------------------------------------------- ComplexPhraseQueryParser


def test_complex_phrase_wildcard_expansion(spark, tiny_index):
    """A wildcard word inside a phrase expands to a SpanOr over dictionary
    matches; the parsed query's hits equal the manually-built span query."""
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import (
        SpanNearQuery,
        SpanOrQuery,
        WildcardQuery,
    )
    from lucene_solr_spark.search.queryparser import parse_complex_phrase

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    q = parse_complex_phrase(s, '"par* http"~10')
    terms = s.matching_terms(WildcardQuery(pattern="par*"))
    assert len(terms) > 1
    manual = SpanNearQuery((SpanOrQuery(tuple(terms)), "http"), slop=10, in_order=True)
    got = {
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search_many({0: q}, k=None).collect()
    }
    want = {
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search_many({0: manual}, k=None).collect()
    }
    assert got == want and got


def test_complex_phrase_fuzzy_and_camelcase(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import MatchNoneQuery, SpanNearQuery
    from lucene_solr_spark.search.queryparser import parse_complex_phrase

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    # fuzzy word: parse~1 expands to at least 'parse'
    q = parse_complex_phrase(s, '"parse~1 http"~10')
    assert s.search_many({0: q}, k=None).count() > 0
    # camelCase word nests an exact SpanNear
    q2 = parse_complex_phrase(s, '"parseHttp buffer"~3')
    assert isinstance(q2, SpanNearQuery)
    assert isinstance(q2.clauses[0], SpanNearQuery)
    assert q2.clauses[0].clauses == ("parse", "http")
    # unmatchable wildcard position → MatchNone
    q3 = parse_complex_phrase(s, '"zzzqqq* http"')
    assert isinstance(q3, MatchNoneQuery)
