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
