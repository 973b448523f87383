"""Local-params grammar (QueryParsing.parseLocalParams) + dispatch."""

import pytest

from lucene_solr_spark.search.localparams import local_query, parse_local_params


def test_grammar_basics():
    assert parse_local_params("foo bar") == ("lucene", {}, "foo bar")
    assert parse_local_params("{!func}sum(x,1)") == ("func", {}, "sum(x,1)")
    t, lp, body = parse_local_params("{!frange l=0 u=10 incu=false}div(x,2)")
    assert t == "frange" and lp == {"l": "0", "u": "10", "incu": "false"}
    assert body == "div(x,2)"


def test_grammar_quotes_and_v():
    t, lp, body = parse_local_params("{!lucene df='the body' v=\"parse AND http\"}")
    assert t == "lucene" and lp == {"df": "the body"} and body == "parse AND http"
    # backslash escape inside quotes
    _, lp2, _ = parse_local_params(r"{!foo a='it\'s'}x")
    assert lp2 == {"a": "it's"}


def test_grammar_param_refs_and_errors():
    t, lp, body = parse_local_params("{!frange l=$lo}x", params={"lo": 5})
    assert lp == {"l": "5"}
    with pytest.raises(ValueError, match="unresolved"):
        parse_local_params("{!frange l=$lo}x")
    with pytest.raises(ValueError, match="missing"):
        parse_local_params("{!frange l=1")
    with pytest.raises(ValueError, match="two bare"):
        parse_local_params("{!a b}x")
    with pytest.raises(ValueError, match="both v="):
        parse_local_params("{!f v=a}b")


def test_dispatch_func_frange(spark):
    df = spark.createDataFrame([(1.0,), (4.0,), (9.0,)], "x double")
    scored = local_query("{!func}sqrt(x)", frame=df)
    assert sorted(r.score for r in scored.collect()) == [1.0, 2.0, 3.0]
    kept = local_query("{!frange l=2 u=4}x", frame=df)
    assert [r.x for r in kept.collect()] == [4.0]
    kept2 = local_query("{!frange l=1 incl=false}x", frame=df)
    assert sorted(r.x for r in kept2.collect()) == [4.0, 9.0]


def test_dispatch_lucene_and_boost(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    base = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in local_query("{!lucene}parse AND http", searcher=s).collect()
    }
    direct = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in s.search("parse AND http", k=None).collect()
    }
    assert base == direct and base
    boosted = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in local_query(
            "{!boost b=sum(2.0,1.0)}parse AND http", searcher=s
        ).collect()
    }
    assert boosted.keys() == base.keys()
    for k_, v in boosted.items():
        assert v == pytest.approx(3.0 * base[k_], rel=1e-6)


def test_dispatch_unknown_type_names_operators():
    with pytest.raises(ValueError, match="dedicated"):
        local_query("{!mlt}x", frame=None)
    # {!graph}/{!collapse} are dispatched now (test_localparams_join.py) —
    # they demand their frame rather than falling through to unknown-type
    with pytest.raises(ValueError, match="needs a frame"):
        local_query("{!graph from=a to=b}x", frame=None)
    with pytest.raises(ValueError, match="needs a frame"):
        local_query("{!collapse field=a}x", frame=None)
    # {!parent} is dispatched now (test_localparams_join.py) — it demands
    # the nested-docs frame rather than falling through to unknown-type
    with pytest.raises(ValueError, match="needs a frame"):
        local_query("{!parent which=kind:p}x", frame=None)


def test_dispatch_rerank(spark, tiny_index):
    """{!rerank} == explicit two-phase rescore (ReRankQParserPlugin →
    QueryRescorer combine)."""
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    got = {
        (r.segment_id, r.doc_id): (r.rank, float(r.score))
        for r in local_query(
            '{!rerank reRankQuery="parse http" reRankDocs=20 reRankWeight=3.0}parse',
            searcher=s,
        ).collect()
    }
    first = s.search("parse", k=20)
    want = {
        (r.segment_id, r.doc_id): (r.rank, float(r.score))
        for r in s.rescore(first, "parse http", weight=3.0, k=20).collect()
    }
    assert got == want and got


def test_search_accepts_lucene_localparams_prefix(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    a = {(r.segment_id, r.doc_id) for r in s.search('{!lucene v="parse AND http"}', k=None).collect()}
    b = {(r.segment_id, r.doc_id) for r in s.search("parse AND http", k=None).collect()}
    assert a == b and a
    with pytest.raises(Exception, match="local_query"):
        s.search("{!func}sqrt(x)", k=5)


def test_quoted_dollar_is_literal_and_lucene_refuses_df(spark, tiny_index):
    _, lp, _ = parse_local_params("{!foo a='$5 off'}x")
    assert lp == {"a": "$5 off"}
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    with pytest.raises(ValueError, match="unsupported"):
        local_query("{!lucene df=path}parse", searcher=s)
    with pytest.raises(Exception, match="unsupported"):
        s.search("{!lucene df=path}parse", k=5)


def test_dispatch_term_raw_prefix(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.localparams import local_query
    from lucene_solr_spark.search.query import PrefixQuery, TermQuery

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    got = {
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in local_query("{!term f=content}Parse", searcher=s).collect()
    }
    want = {
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search_many({0: TermQuery("parse")}, k=None).collect()
    }
    assert got == want and got
    # raw: verbatim (uppercase term is absent from the lowercase dictionary)
    assert local_query("{!raw f=content}Parse", searcher=s).count() == 0
    got_p = {
        (r.segment_id, r.doc_id)
        for r in local_query("{!prefix f=content}pars", searcher=s).collect()
    }
    want_p = {
        (r.segment_id, r.doc_id)
        for r in s.search_many({0: PrefixQuery(prefix="pars")}, k=None).collect()
    }
    assert got_p == want_p and got_p


def test_dispatch_graph_terms_drops_super_nodes(spark, tiny_index):
    import pyspark.sql.functions as F

    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.localparams import local_query

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    dfs = {
        r["term"]: r["df"]
        for r in s._term_stats_df.filter(
            F.col("term").isin("parse", "http")
        ).collect()
    }
    lo, hi = sorted(dfs, key=dfs.get)
    cap = dfs[lo]  # keeps the rarer term only
    hits = local_query(
        f"{{!graphTerms f=content maxDocFreq={cap}}}{lo},{hi}", searcher=s
    )
    from lucene_solr_spark.search.query import TermInSetQuery

    want = {
        (r.segment_id, r.doc_id)
        for r in s.search_many({0: TermInSetQuery(set_terms=(lo,))}, k=None).collect()
    }
    assert {(r.segment_id, r.doc_id) for r in hits.collect()} == want and want


def test_dispatch_maxscore_takes_max_of_should(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.localparams import local_query
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        DisjunctionMaxQuery,
        TermQuery,
    )

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    got = {
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in local_query("{!maxscore}parse OR http", searcher=s).collect()
    }
    want = {
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search_many(
            {0: DisjunctionMaxQuery((TermQuery("parse"), TermQuery("http")), 0.0)},
            k=None,
        ).collect()
    }
    assert got == want and got
    # and it differs from the plain sum-of-should scoring somewhere
    plain = {
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search_many(
            {0: BooleanQuery(should=(TermQuery("parse"), TermQuery("http")))},
            k=None,
        ).collect()
    }
    assert got != plain


def test_dispatch_geofilt_and_bbox(spark):
    from lucene_solr_spark.functions import _haversine
    from lucene_solr_spark.search.localparams import local_query

    import pyspark.sql.functions as F

    pts = spark.createDataFrame(
        [(i, float((i * 37) % 180 - 90) / 2, float((i * 91) % 360 - 180) / 2) for i in range(500)],
        "id long, lat double, lon double",
    )
    kept = local_query(
        "{!geofilt sfield=lat,lon pt=40.7,-74.0 d=3000}", frame=pts
    )
    want = pts.filter(
        _haversine(F.lit(40.7), F.lit(-74.0), F.col("lat"), F.col("lon")) <= 3000.0
    )
    assert {r.id for r in kept.collect()} == {r.id for r in want.collect()}
    assert kept.count() > 0
    # bbox is a superset of geofilt (the circle's bounding box)
    boxed = local_query("{!bbox sfield=lat,lon pt=40.7,-74.0 d=3000}", frame=pts)
    assert {r.id for r in kept.collect()} <= {r.id for r in boxed.collect()}
    # bbox stays pushdown-friendly: plain range predicates, no trig in the plan
    import io
    from contextlib import redirect_stdout

    buf = io.StringIO()
    with redirect_stdout(buf):
        boxed.explain()
    assert "ASIN" not in buf.getvalue().upper()
    import pytest as _pytest

    with _pytest.raises(ValueError):
        local_query("{!geofilt sfield=lat,lon pt=1,2}", frame=pts)  # missing d
    with _pytest.raises(ValueError, match="indexes the"):
        local_query("{!term f=nosuchfield}parse", searcher=object())
