"""SimpleQueryParser semantics (reference ``lucene/queryparser/.../simple/
SimpleQueryParser.java`` + its published operator contract): tolerant
parsing, right-to-left operator folding, flags, fuzzy/prefix/near edge
cases. Structure-level asserts against hand-built Query trees, plus
engine-equivalence smoke tests."""

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from lucene_solr_spark.search.query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoneQuery,
    PhraseQuery,
    PrefixQuery,
    SloppyPhraseQuery,
    TermQuery,
)
from lucene_solr_spark.search.simpleparser import (
    AND_OPERATOR,
    NOT_OPERATOR,
    OR_OPERATOR,
    PHRASE_OPERATOR,
    PRECEDENCE_OPERATORS,
    PREFIX_OPERATOR,
    WHITESPACE_OPERATOR,
    parse_simple,
)

T = TermQuery
NEG = lambda q: BooleanQuery(should=(MatchAllQuery(),), must_not=(q,))  # noqa: E731


def P(s):
    return parse_simple(s, analyzer="simple")


def test_terms_and_default_or():
    assert P("foobar") == T("foobar")
    assert P("foo bar") == BooleanQuery(should=(T("foo"), T("bar")))
    assert P("foo bar baz") == BooleanQuery(should=(T("foo"), T("bar"), T("baz")))


def test_explicit_operators():
    assert P("foo+bar") == BooleanQuery(must=(T("foo"), T("bar")))
    assert P("foo | bar") == BooleanQuery(should=(T("foo"), T("bar")))
    # duplicate operators: first one wins, later ones ignored
    assert P("foo ++ bar") == BooleanQuery(must=(T("foo"), T("bar")))
    assert P("foo || bar") == BooleanQuery(should=(T("foo"), T("bar")))
    # leading operator has no left operand: ignored
    assert P("+foo") == T("foo")
    assert P("| foo") == T("foo")


def test_right_to_left_fold():
    # token1 | token2 + token3  ==  (token1 OR token2) AND token3
    assert P("foo | bar + baz") == BooleanQuery(
        must=(BooleanQuery(should=(T("foo"), T("bar"))), T("baz"))
    )
    # and the mirror image
    assert P("foo + bar | baz") == BooleanQuery(
        should=(BooleanQuery(must=(T("foo"), T("bar"))), T("baz"))
    )


def test_negation():
    assert P("-foo") == NEG(T("foo"))
    assert P("--foo") == T("foo")  # double negation cancels
    assert P("---foo") == NEG(T("foo"))
    assert P("foo -bar") == BooleanQuery(should=(T("foo"), NEG(T("bar"))))
    # '-' inside a term is literal (term-1 tokenizes through the analyzer)
    assert P("term-1") == BooleanQuery(should=(T("term"), T("1")))


def test_phrases_and_near():
    assert P('"foo bar"') == PhraseQuery(("foo", "bar"), (0, 1))
    assert P('"foo bar"~2') == SloppyPhraseQuery(("foo", "bar"), (0, 1), 2)
    # tilde with nothing after it on a phrase: slop stays 0
    assert P('"foo bar"~') == PhraseQuery(("foo", "bar"), (0, 1))
    # non-numeric slop: 0
    assert P('"foo bar"~xyz') == PhraseQuery(("foo", "bar"), (0, 1))
    # single-term phrase collapses to a term
    assert P('"foo"') == T("foo")
    # empty phrase resets the pending operator
    assert P('foo + "" bar') == BooleanQuery(should=(T("foo"), T("bar")))


def test_prefix_and_fuzzy():
    assert P("foo*") == PrefixQuery(prefix="foo")
    # '*' not at the end is literal text (analyzer splits it away)
    assert P("foo*1") == BooleanQuery(should=(T("foo"), T("1")))
    # '*' as the only char of a token: not a prefix (needs a char before it)
    assert P("*") == MatchAllQuery()
    assert P(" * ") == MatchAllQuery()
    assert P("foo~1") == FuzzyQuery(term="foo", max_edits=1)
    assert P("foo~") == FuzzyQuery(term="foo", max_edits=2)  # auto ~2
    assert P("foo~5") == FuzzyQuery(term="foo", max_edits=2)  # capped at 2
    assert P("foo~0") == T("foo")  # 0 edits = plain term
    assert P("foo~xyz") == T("foo")  # unparsable fuzziness swallowed
    assert P("foo~-2") == T("foo")  # negative -> 0


def test_precedence():
    assert P("(foo | bar) + baz") == BooleanQuery(
        must=(BooleanQuery(should=(T("foo"), T("bar"))), T("baz"))
    )
    assert P("foo + (bar | baz)") == BooleanQuery(
        must=(T("foo"), BooleanQuery(should=(T("bar"), T("baz"))))
    )
    # "()" resets the pending operator
    assert P("foo + () bar") == BooleanQuery(should=(T("foo"), T("bar")))


def test_tolerance_never_raises():
    # unmatched '(' is extraneous
    assert P("(foo") == T("foo")
    # unmatched '"' is extraneous
    assert P('"foo') == T("foo")
    # extraneous ')'
    assert P(")foo)") == T("foo")
    # empty / operator-only input: MatchNone
    assert P("") == MatchNoneQuery()
    assert P("+ | -") == MatchNoneQuery()
    assert P("()") == MatchNoneQuery()


def test_escaping():
    # escaped '*' at the end is literal, not a prefix operator
    assert P("foo\\*") == T("foo")  # analyzer drops the literal star
    assert P("foo\\*") != PrefixQuery(prefix="foo")
    # escaped quote does not open a phrase
    assert P('\\"foo') == T("foo")
    # escaped '-' is not negation
    assert P("\\-foo") == T("foo")
    assert P("-foo") == NEG(T("foo"))


def test_flags_gate_features():
    # PREFIX disabled: trailing '*' is literal text
    no_prefix = -1 & ~PREFIX_OPERATOR
    assert parse_simple("foo*", "simple", no_prefix) == T("foo")
    # AND disabled: '+' delimits nothing, it is part of tokens (analyzer
    # splits it) so both terms land under the default operator
    no_and = -1 & ~AND_OPERATOR
    assert parse_simple("foo+bar", "simple", no_and) == BooleanQuery(
        should=(T("foo"), T("bar"))
    )
    # NOT disabled: '-' is literal
    no_not = -1 & ~NOT_OPERATOR
    assert parse_simple("-foo", "simple", no_not) == T("foo")
    # PHRASE disabled: quotes are literal
    no_phrase = -1 & ~PHRASE_OPERATOR
    assert parse_simple('"foo bar"', "simple", no_phrase) == BooleanQuery(
        should=(T("foo"), T("bar"))
    )
    # WHITESPACE disabled: the whole input is one token through the analyzer
    no_ws = -1 & ~WHITESPACE_OPERATOR
    assert parse_simple("foo bar", "simple", no_ws) == BooleanQuery(
        should=(T("foo"), T("bar"))
    )
    # PRECEDENCE disabled: parens are literal
    no_prec = -1 & ~PRECEDENCE_OPERATORS
    assert parse_simple("(foo)", "simple", no_prec) == T("foo")
    # OR disabled: '|' is literal (analyzer eats it)
    no_or = -1 & ~OR_OPERATOR
    assert parse_simple("foo|bar", "simple", no_or) == BooleanQuery(
        should=(T("foo"), T("bar"))
    )


def test_default_operator_must():
    q = parse_simple("foo bar", "simple", default_operator="must")
    assert q == BooleanQuery(must=(T("foo"), T("bar")))
    with pytest.raises(ValueError):
        parse_simple("x", default_operator="flarb")


@settings(max_examples=300, deadline=None)
@given(st.text(alphabet='ab()|+-"~* \\\t\n', max_size=30))
def test_never_raises_property(s):
    # the reference contract: ANY input parses without an exception
    parse_simple(s, "simple")


def test_engine_equivalence(spark, tiny_index):
    """Parsed trees run through the engine identically to hand-built ones."""
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    pairs = [
        (parse_simple("parse + http", "code"), BooleanQuery(must=(T("parse"), T("http")))),
        (parse_simple("parse | cache", "code"), BooleanQuery(should=(T("parse"), T("cache")))),
        (
            parse_simple('"merge the segments"', "code"),
            '"merge the segments"',
        ),
        (parse_simple("pars*", "code"), PrefixQuery(prefix="pars")),
    ]
    qs = {}
    for i, (a, b) in enumerate(pairs):
        qs[2 * i] = a
        qs[2 * i + 1] = b
    hits = s.search_many(qs, k=None)
    rows = {}
    for r in hits.collect():
        rows.setdefault(r.qid, set()).add((r.segment_id, r.doc_id, round(float(r.score), 5)))
    for i in range(len(pairs)):
        assert rows.get(2 * i, set()) == rows.get(2 * i + 1, set()), f"pair {i}"
    assert rows.get(0), "conjunction should match"
