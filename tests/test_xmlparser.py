"""XML CoreParser (reference ``lucene/queryparser/.../xml/CoreParser.java``
+ builders): element registry, occurs clauses, fieldName inheritance, span
composition, error contract, engine equivalence."""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    SpanFirstQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
)
from lucene_solr_spark.search.xmlparser import parse_xml_query

T = TermQuery
ST = SpanTermQuery


def P(x):
    return parse_xml_query(x, analyzer="simple")


def test_term_and_boolean():
    assert P("<TermQuery>foo</TermQuery>") == T("foo")
    # raw term text is NOT analyzed (TermQueryBuilder) — only lowercased here
    assert P("<TermQuery>FooBar</TermQuery>") == T("foobar")
    assert P('<TermQuery boost="2.5">foo</TermQuery>') == BoostQuery(T("foo"), 2.5)
    q = P(
        """
        <BooleanQuery minimumNumberShouldMatch="1">
          <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>b</TermQuery></Clause>
          <Clause occurs="should"><TermQuery>c</TermQuery></Clause>
          <Clause occurs="mustNot"><TermQuery>d</TermQuery></Clause>
          <Clause occurs="filter"><TermQuery>e</TermQuery></Clause>
        </BooleanQuery>"""
    )
    assert q == BooleanQuery(
        must=(T("a"),),
        should=(T("b"), T("c")),
        must_not=(T("d"),),
        filter=(T("e"),),
        min_should_match=1,
    )


def test_terms_query_analyzes():
    # TermsQueryBuilder runs the analyzer; SHOULD per token
    assert P('<TermsQuery fieldName="content">Foo-Bar baz</TermsQuery>') == BooleanQuery(
        should=(T("foo"), T("bar"), T("baz"))
    )


def test_range_matchall_dismax_constantscore():
    assert P("<MatchAllDocsQuery/>") == MatchAllQuery()
    assert P('<RangeQuery lowerTerm="aaa" upperTerm="bbb" includeUpper="false"/>') == (
        TermRangeQuery(lower="aaa", upper="bbb", include_lower=True, include_upper=False)
    )
    assert P('<RangeQuery lowerTerm="mmm"/>') == TermRangeQuery(lower="mmm", upper=None)
    q = P(
        """
        <DisjunctionMaxQuery tieBreaker="0.1">
          <TermQuery>a</TermQuery>
          <TermQuery>b</TermQuery>
        </DisjunctionMaxQuery>"""
    )
    assert q == DisjunctionMaxQuery((T("a"), T("b")), 0.1)
    assert P("<ConstantScoreQuery><TermQuery>a</TermQuery></ConstantScoreQuery>") == (
        ConstantScoreQuery(T("a"))
    )


def test_user_query_delegates_to_classic():
    from lucene_solr_spark.search.queryparser import parse_classic

    q = P("<UserQuery>a AND b</UserQuery>")
    assert q == parse_classic("a AND b", analyzer="simple")


def test_span_family():
    q = P(
        """
        <SpanNear slop="2" inOrder="true">
          <SpanTerm>foo</SpanTerm>
          <SpanOr>
            <SpanTerm>bar</SpanTerm>
            <SpanTerm>baz</SpanTerm>
          </SpanOr>
        </SpanNear>"""
    )
    assert q == SpanNearQuery(
        (ST("foo"), SpanOrQuery((ST("bar"), ST("baz")))), slop=2, in_order=True
    )
    # inOrder defaults FALSE in the XML builder (SpanNearBuilder)
    q = P('<SpanNear slop="0"><SpanTerm>a</SpanTerm><SpanTerm>b</SpanTerm></SpanNear>')
    assert q == SpanNearQuery((ST("a"), ST("b")), slop=0, in_order=False)
    # SpanOrTerms analyzes
    assert P('<SpanOrTerms fieldName="content">Foo Bar</SpanOrTerms>') == SpanOrQuery(
        (ST("foo"), ST("bar"))
    )
    q = P(
        """
        <SpanNot>
          <Include><SpanTerm>a</SpanTerm></Include>
          <Exclude><SpanTerm>b</SpanTerm></Exclude>
        </SpanNot>"""
    )
    assert q == SpanNotQuery(ST("a"), ST("b"))
    assert P('<SpanFirst end="5"><SpanTerm>a</SpanTerm></SpanFirst>') == SpanFirstQuery(
        ST("a"), 5
    )


def test_fieldname_inheritance_and_errors():
    # fieldName inherited from an ancestor element
    q = P(
        """
        <BooleanQuery fieldName="content">
          <Clause occurs="must"><TermQuery>a</TermQuery></Clause>
        </BooleanQuery>"""
    )
    assert q == BooleanQuery(must=(T("a"),))
    with pytest.raises(ValueError):
        P('<TermQuery fieldName="nosuch">a</TermQuery>')
    with pytest.raises(ValueError):
        P("<NoSuchQuery>a</NoSuchQuery>")
    with pytest.raises(ValueError):
        P("<TermQuery>  </TermQuery>")  # blank text
    with pytest.raises(ValueError):
        P("<SpanNear><SpanTerm>a</SpanTerm></SpanNear>")  # missing slop
    with pytest.raises(ValueError):
        P('<BooleanQuery><Clause occurs="wrong"><TermQuery>a</TermQuery></Clause></BooleanQuery>')
    with pytest.raises(ValueError):
        P("<SpanOr><TermQuery>a</TermQuery></SpanOr>")  # non-span child
    with pytest.raises(ValueError):
        P("not xml at all <<<")
    with pytest.raises(ValueError):
        P('<PointRangeQuery lowerTerm="1" upperTerm="2"/>')  # missing fieldName


def test_engine_equivalence(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    pairs = [
        (
            parse_xml_query(
                """
                <BooleanQuery>
                  <Clause occurs="must"><TermQuery>parse</TermQuery></Clause>
                  <Clause occurs="mustNot"><TermQuery>cache</TermQuery></Clause>
                </BooleanQuery>""",
                analyzer="code",
            ),
            BooleanQuery(must=(T("parse"),), must_not=(T("cache"),)),
        ),
        (
            # "merge the segments" in the corpus: stopword gap -> slop 1
            parse_xml_query(
                '<SpanNear slop="1" inOrder="true">'
                "<SpanTerm>merge</SpanTerm><SpanTerm>segments</SpanTerm>"
                "</SpanNear>",
                analyzer="code",
            ),
            SpanNearQuery((ST("merge"), ST("segments")), 1, True),
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
    assert rows.get(2), "span pair should match"


def test_nested_span_boost_and_boosting_term_are_span_safe(spark, tiny_index):
    """Boost attributes on NESTED span clauses and BoostingTermQuery inside
    span composition must yield kernel-evaluable span trees (review fix:
    previously wrapped in BoostQuery/PayloadScoreQuery and crashed)."""
    from lucene_solr_spark.search import IndexSearcher

    q1 = parse_xml_query(
        '<SpanNear slop="1" inOrder="true">'
        '<SpanTerm boost="2.0">merge</SpanTerm><SpanTerm>segments</SpanTerm>'
        "</SpanNear>",
        analyzer="code",
    )
    assert q1 == SpanNearQuery((ST("merge"), ST("segments")), 1, True)
    q2 = parse_xml_query(
        '<SpanNear slop="1" inOrder="true">'
        "<BoostingTermQuery>merge</BoostingTermQuery><SpanTerm>segments</SpanTerm>"
        "</SpanNear>",
        analyzer="code",
    )
    assert q2 == SpanNearQuery((ST("merge"), ST("segments")), 1, True)
    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    assert s.search_many({0: q1, 1: q2}, k=None).count() > 0


def test_point_range_query_element_parses():
    """PointRangeQueryBuilder.java:40 — fieldName + lowerTerm/upperTerm
    (inclusive, missing = open end) + type (default int)."""
    from lucene_solr_spark.search.query import PointRangeQuery

    assert P(
        '<PointRangeQuery fieldName="size" lowerTerm="10" upperTerm="100"/>'
    ) == PointRangeQuery(field="size", lower=10, upper=100)
    assert P(
        '<PointRangeQuery fieldName="w" type="double" lowerTerm="0.5"/>'
    ) == PointRangeQuery(field="w", lower=0.5, upper=None)
    assert P(
        '<PointRangeQuery fieldName="size" lowerTerm="1" boost="3.0"/>'
    ) == BoostQuery(PointRangeQuery(field="size", lower=1), 3.0)
    with pytest.raises(ValueError):
        P('<PointRangeQuery fieldName="x" type="text" lowerTerm="1"/>')
    with pytest.raises(ValueError):
        P('<PointRangeQuery fieldName="x" lowerTerm="notanumber"/>')


def test_point_range_query_executes(spark, tiny_corpus, tmp_path_factory):
    """Engine semantics: standalone = constant score 1.0 over the pushed-down
    docs scan; as a BooleanQuery FILTER it restricts the hit set without
    touching BM25 scores; as MUST it adds its constant boost; MUST_NOT
    excludes. Oracled against pandas over the same corpus."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher, PointRangeQuery

    pdf = tiny_corpus.copy()
    pdf["size"] = pdf["content"].str.len().astype("int64")
    d = str(tmp_path_factory.mktemp("prq") / "idx")
    build_index(
        spark, spark.createDataFrame(pdf), d, num_segments=4,
        analyzer="code", stored_cols=("size",),
    )
    s = IndexSearcher(spark, d, analyzer="code")
    docs = spark.read.parquet(d + "/docs").select("segment_id", "doc_id", "size")
    lo, hi = int(pdf["size"].quantile(0.25)), int(pdf["size"].quantile(0.75))
    in_range = {
        (r.segment_id, r.doc_id)
        for r in docs.filter((F.col("size") >= lo) & (F.col("size") <= hi)).collect()
    }

    # standalone: matches == range set, constant score 1.0
    pr = PointRangeQuery(field="size", lower=lo, upper=hi)
    hits = s.search_many({0: pr}, k=None).collect()
    assert {(r.segment_id, r.doc_id) for r in hits} == in_range
    assert all(r.score == 1.0 for r in hits)
    # exclusive bounds via the query node
    strict = s.search_many(
        {0: PointRangeQuery(field="size", lower=lo, upper=hi,
                            include_lower=False, include_upper=False)},
        k=None,
    ).count()
    edge_n = docs.filter(F.col("size").isin([lo, hi])).count()
    assert strict == len(in_range) - edge_n

    term_hits = {
        (r.segment_id, r.doc_id): r.score
        for r in s.search_many({0: "parse"}, k=None).collect()
    }
    # FILTER: intersection, BM25 scores untouched
    xml_filter = parse_xml_query(
        f"""<BooleanQuery>
              <Clause occurs="must"><TermQuery>parse</TermQuery></Clause>
              <Clause occurs="filter">
                <PointRangeQuery fieldName="size" lowerTerm="{lo}" upperTerm="{hi}"/>
              </Clause>
            </BooleanQuery>""",
        analyzer="code",
    )
    got = {
        (r.segment_id, r.doc_id): r.score
        for r in s.search_many({0: xml_filter}, k=None).collect()
    }
    assert set(got) == set(term_hits) & in_range
    assert all(got[k] == pytest.approx(term_hits[k]) for k in got)

    # MUST: same hit set, +1.0 constant score; top-k path ranks consistently
    xml_must = parse_xml_query(
        f"""<BooleanQuery>
              <Clause occurs="must"><TermQuery>parse</TermQuery></Clause>
              <Clause occurs="must">
                <PointRangeQuery fieldName="size" lowerTerm="{lo}" upperTerm="{hi}"/>
              </Clause>
            </BooleanQuery>""",
        analyzer="code",
    )
    got_must = {
        (r.segment_id, r.doc_id): r.score
        for r in s.search_many({0: xml_must}, k=None).collect()
    }
    assert set(got_must) == set(got)
    assert all(got_must[k] == pytest.approx(got[k] + 1.0) for k in got_must)
    topk = s.search(xml_must, k=5).collect()
    assert [(r.segment_id, r.doc_id) for r in topk] == [
        k for k, _ in sorted(got_must.items(), key=lambda kv: (-kv[1], kv[0]))
    ][:5]

    # MUST_NOT: complement within the term hits
    xml_not = parse_xml_query(
        f"""<BooleanQuery>
              <Clause occurs="must"><TermQuery>parse</TermQuery></Clause>
              <Clause occurs="mustNot">
                <PointRangeQuery fieldName="size" lowerTerm="{lo}" upperTerm="{hi}"/>
              </Clause>
            </BooleanQuery>""",
        analyzer="code",
    )
    got_not = {
        (r.segment_id, r.doc_id)
        for r in s.search_many({0: xml_not}, k=None).collect()
    }
    assert got_not == set(term_hits) - in_range

    # unsupported shapes refuse loudly
    with pytest.raises(ValueError, match="SHOULD"):
        s.search_many(
            {0: BooleanQuery(should=(TermQuery("parse"), pr))}, k=None
        )
    with pytest.raises(ValueError, match="stored docs column"):
        s.search_many({0: PointRangeQuery(field="nosuch", lower=1)}, k=None)
