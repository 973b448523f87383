"""Surround parser semantics (reference ``lucene/queryparser/.../surround/
parser/QueryParser.jj`` grammar + the SrndQuery→Lucene translation):
W/N distance chains, prefix n-ary forms, boolean precedence, truncation
minimums, boosts, error contract. Plus engine equivalence on the tiny
index (parsed span queries score identically to hand-built ones)."""

import pytest

from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    PrefixQuery,
    SCORING_BOOLEAN,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    WildcardQuery,
)
from lucene_solr_spark.search.surround import parse_surround

T = TermQuery
ST = SpanTermQuery


def test_terms_and_booleans():
    assert parse_surround("foo") == T("foo")
    assert parse_surround("foo AND bar") == BooleanQuery(must=(T("foo"), T("bar")))
    assert parse_surround("foo and bar and baz") == BooleanQuery(
        must=(T("foo"), T("bar"), T("baz"))
    )
    assert parse_surround("foo OR bar") == BooleanQuery(should=(T("foo"), T("bar")))
    # NOT: first clause positive, rest negated (NotQuery.java:33-38)
    assert parse_surround("foo NOT bar NOT baz") == BooleanQuery(
        must=(T("foo"),), must_not=(T("bar"), T("baz"))
    )
    # precedence: NOT binds tighter than AND, AND tighter than OR
    assert parse_surround("a OR b AND c") == BooleanQuery(
        should=(T("a"), BooleanQuery(must=(T("b"), T("c"))))
    )
    assert parse_surround("a AND b NOT c") == BooleanQuery(
        must=(T("a"), BooleanQuery(must=(T("b"),), must_not=(T("c"),)))
    )
    # mixed-case operator words are TERMS ("OR"|"or" only in the grammar) —
    # so "foo Or bar" is two adjacent terms, which surround rejects
    with pytest.raises(ValueError):
        parse_surround("foo Or bar")
    assert parse_surround("Not") == T("not")


def test_distance_operators():
    # infix: bare w = adjacent (distance 1, slop 0), ordered
    assert parse_surround("foo w bar") == SpanNearQuery(
        (ST("foo"), ST("bar")), slop=0, in_order=True
    )
    # 3W = within 3 positions -> slop 2 (DistanceQuery.java:97)
    assert parse_surround("foo 3w bar") == SpanNearQuery(
        (ST("foo"), ST("bar")), slop=2, in_order=True
    )
    # N unordered
    assert parse_surround("foo 5n bar") == SpanNearQuery(
        (ST("foo"), ST("bar")), slop=4, in_order=False
    )
    # infix chains pairwise, left-associative
    assert parse_surround("a w b w c") == SpanNearQuery(
        (SpanNearQuery((ST("a"), ST("b")), 0, True), ST("c")), 0, True
    )
    # W binds tighter than N
    assert parse_surround("a n b w c") == SpanNearQuery(
        (ST("a"), SpanNearQuery((ST("b"), ST("c")), 0, True)), 0, False
    )
    # prefix form is n-ary
    assert parse_surround("3w(a, b, c)") == SpanNearQuery(
        (ST("a"), ST("b"), ST("c")), slop=2, in_order=True
    )
    assert parse_surround("N(a, b)") == SpanNearQuery(
        (ST("a"), ST("b")), slop=0, in_order=False
    )
    # OR inside a distance op becomes a span-or
    assert parse_surround("w(a, or(b, c))") == SpanNearQuery(
        (ST("a"), SpanOrQuery((ST("b"), ST("c")))), 0, True
    )
    # uppercase/lowercase operators equivalent
    assert parse_surround("foo 3W bar") == parse_surround("foo 3w bar")
    # 1w is not a distance token (distances are 2-99): it's the term "1w"
    assert parse_surround("1w") == T("1w")


def test_prefix_and_boolean_forms():
    assert parse_surround("AND(a, b, c)") == BooleanQuery(must=(T("a"), T("b"), T("c")))
    assert parse_surround("or(a, b)") == BooleanQuery(should=(T("a"), T("b")))
    # truncations outside a distance op: scoring-boolean rewrite
    # (SimpleTermRewriteQuery via BasicQueryFactory)
    assert parse_surround("pars*") == PrefixQuery(
        prefix="pars", rewrite_method=SCORING_BOOLEAN
    )
    assert parse_surround("pa?se") == WildcardQuery(
        pattern="pa?se", rewrite_method=SCORING_BOOLEAN
    )
    # quoted literal is ONE term, verbatim (no analysis), lowercased here
    assert parse_surround('"foo"') == T("foo")
    # quoted prefix
    assert parse_surround('"pars"*') == PrefixQuery(
        prefix="pars", rewrite_method=SCORING_BOOLEAN
    )


def test_boosts_and_fields():
    assert parse_surround("foo^2") == BoostQuery(T("foo"), 2.0)
    # stacked boosts multiply (OptionalWeights loop)
    assert parse_surround("foo^2^3") == BoostQuery(T("foo"), 6.0)
    assert parse_surround("(a AND b)^0.5") == BoostQuery(
        BooleanQuery(must=(T("a"), T("b"))), 0.5
    )
    # known field prefix accepted and dropped (single-field engine)
    assert parse_surround("content: foo") == T("foo")
    with pytest.raises(ValueError):
        parse_surround("nosuchfield: foo")


def test_error_contract():
    # surround REJECTS malformed input (ParseException), unlike simpleparser
    for bad in ["", "foo AND", "(foo", "3w(a)", "w(a b)", "foo^", "foo)bar("]:
        with pytest.raises(ValueError):
            parse_surround(bad)
    # truncation minimums (MINIMUM_PREFIX_LENGTH / MINIMUM_CHARS_IN_TRUNC = 3)
    with pytest.raises(ValueError):
        parse_surround("ab*")
    with pytest.raises(ValueError):
        parse_surround("a?b")
    parse_surround("abc*")  # exactly 3 chars: fine
    parse_surround("a?bc")  # 3 normal chars: fine
    # AND/NOT not allowed inside a distance op
    with pytest.raises(ValueError):
        parse_surround("w(a, and(b, c))")
    with pytest.raises(ValueError):
        parse_surround("w(a, b NOT c)")
    # truncation inside a distance op needs a searcher
    with pytest.raises(ValueError):
        parse_surround("w(pars*, foo)")


def test_engine_equivalence(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    pairs = [
        (
            # "merge the segments" in the corpus: stopword gap -> distance 2
            parse_surround("merge 2w segments"),
            SpanNearQuery((ST("merge"), ST("segments")), 1, True),
        ),
        (
            parse_surround("parse 4n http"),
            SpanNearQuery((ST("parse"), ST("http")), 3, False),
        ),
        (
            parse_surround("parse AND http NOT cache"),
            BooleanQuery(
                must=(
                    T("parse"),
                    BooleanQuery(must=(T("http"),), must_not=(T("cache"),)),
                )
            ),
        ),
        (
            parse_surround("w(pars*, buffer)", searcher=s),
            SpanNearQuery(
                (
                    SpanOrQuery(
                        tuple(
                            ST(t)
                            for t in s.matching_terms(PrefixQuery(prefix="pars"))
                        )
                    ),
                    ST("buffer"),
                ),
                0,
                True,
            ),
        ),
    ]
    qs = {}
    for i, (a, b) in enumerate(pairs):
        qs[2 * i] = a
        qs[2 * i + 1] = b
    rows = {}
    for r in s.search_many(qs, k=None).collect():
        rows.setdefault(r.qid, set()).add(
            (r.segment_id, r.doc_id, round(float(r.score), 5))
        )
    for i in range(len(pairs)):
        assert rows.get(2 * i, set()) == rows.get(2 * i + 1, set()), f"pair {i}"
    assert rows.get(0), "ordered near should match"


def test_boost_inside_distance_op_parses():
    """^w on a distance operand is grammatical (OptionalWeights on any
    PrimaryQuery); the weight drops inside W/N (review fix: previously
    rejected as 'subquery not allowed')."""
    assert parse_surround("3w(hash^2, table)") == SpanNearQuery(
        (ST("hash"), ST("table")), slop=2, in_order=True
    )
    assert parse_surround("hash^2 w table") == SpanNearQuery(
        (ST("hash"), ST("table")), slop=0, in_order=True
    )
    # outside a distance op the boost is honored
    assert parse_surround("(hash w table)^2") == BoostQuery(
        SpanNearQuery((ST("hash"), ST("table")), 0, True), 2.0
    )
