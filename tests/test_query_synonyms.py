"""Query-time synonym chains (`synonymq:<base>:<path>`) — QueryBuilder's
analyzeGraphBoolean / analyzeGraphPhrase roles: stacked tokens become
SynonymQuery in boolean context, MultiPhraseQuery in phrases, SpanNear over
SpanOr in sloppy phrases; scores verified against the explicit query objects."""

import pytest


@pytest.fixture(scope="module")
def syn_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("qsyn") / "synonyms.txt"
    p.write_text("big, large\nsmall => tiny\n")
    return str(p)


def test_parse_shapes(syn_file):
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        MultiPhraseQuery,
        SpanNearQuery,
        SpanOrQuery,
        SynonymQuery,
        TermQuery,
        parse_query,
    )

    a = f"synonymq:simple:{syn_file}"
    q = parse_query("big", a)
    assert q == SynonymQuery(("big", "large"))
    q = parse_query("small", a)
    assert q == TermQuery("tiny")
    q = parse_query("big dog", a)
    assert isinstance(q, BooleanQuery)
    assert q.must == (SynonymQuery(("big", "large")), TermQuery("dog"))
    q = parse_query('"big dog"', a)
    assert q == MultiPhraseQuery((("big", "large"), ("dog",)), (0, 1))
    q = parse_query('"big dog"~2', a)
    assert isinstance(q, SpanNearQuery) and q.slop == 2 and q.in_order
    assert isinstance(q.clauses[0], SpanOrQuery)


def test_scores_match_explicit_queries(spark, tmp_path, syn_file):
    """Parsed query-time synonym text scores identically to the explicit
    SynonymQuery / MultiPhraseQuery objects on a plain index."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import MultiPhraseQuery, SynonymQuery

    rows = [(i, t) for i, t in enumerate([
        "the big dog runs", "a large dog walks", "big large things",
        "a tiny dog yips", "no match here",
    ])]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, num_segments=2, analyzer="simple",
                key_cols=("ext_id",), content_col="text")
    a = f"synonymq:simple:{syn_file}"
    s = IndexSearcher(spark, d, analyzer=a, precision="f64")
    s_plain = IndexSearcher(spark, d, analyzer="simple", precision="f64")

    def res(searcher, q):
        return {
            (r.segment_id, r.doc_id): round(float(r.score), 9)
            for r in searcher.search_many({0: q}, k=None).collect()
        }

    assert res(s, "big") == res(s_plain, SynonymQuery(("big", "large")))
    assert res(s, '"big dog"') == res(
        s_plain, MultiPhraseQuery((("big", "large"), ("dog",)), (0, 1))
    )
    # explicit mapping rewrites the query term
    assert res(s, "small") == res(s_plain, "tiny")
    # the synonym query matches docs containing either variant
    hits = res(s, "big")
    ext = {(r.segment_id, r.doc_id): r.ext_id for r in
           spark.read.parquet(d + "/docs")
           .select("segment_id", "doc_id", "ext_id").collect()}
    assert sorted(ext[c] for c in hits) == [0, 1, 2]


# ---------------------------------------------------------------------------
# round 4: MULTI-WORD query-time synonyms (QueryBuilder.analyzeGraphBoolean /
# analyzeGraphPhrase, util/QueryBuilder.java:540-640; SynonymGraphFilter.java:58)


@pytest.fixture(scope="module")
def mw_syn_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("mwsyn") / "synonyms.txt"
    p.write_text(
        "usa => united states\n"
        "ny, new york\n"
        "big, large\n"
    )
    return str(p)


def test_multiword_parse_shapes(mw_syn_file):
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        PhraseQuery,
        SpanNearQuery,
        SpanOrQuery,
        SpanTermQuery,
        SynonymQuery,
        TermQuery,
        parse_query,
    )

    a = f"synonymq:simple:{mw_syn_file}"
    # replacement: the single query term becomes the multi-word phrase
    q = parse_query("usa", a)
    assert q == PhraseQuery(("united", "states"), (0, 1))
    # equivalence with a multi-word side: term OR phrase
    q = parse_query("ny", a)
    assert isinstance(q, BooleanQuery)
    assert q.should == (TermQuery("ny"), PhraseQuery(("new", "york"), (0, 1)))
    # multi-word LHS collapses to its alternatives (original kept)
    q = parse_query("new york visa", a)
    assert isinstance(q, BooleanQuery) and len(q.must) == 2
    comp, visa = q.must
    assert visa == TermQuery("visa")
    assert comp.should == (PhraseQuery(("new", "york"), (0, 1)), TermQuery("ny"))
    # single-token rules in the same file still blend as SynonymQuery
    assert parse_query("big", a) == SynonymQuery(("big", "large"))
    # phrase context: SpanNear over per-component clauses
    q = parse_query('"usa visa"', a)
    assert isinstance(q, SpanNearQuery) and q.slop == 0 and q.in_order
    inner, visa_s = q.clauses
    assert visa_s == SpanTermQuery("visa")
    assert isinstance(inner, SpanNearQuery)
    assert inner.clauses == (SpanTermQuery("united"), SpanTermQuery("states"))
    q = parse_query('"ny visa"~2', a)
    assert isinstance(q, SpanNearQuery) and q.slop == 2
    assert isinstance(q.clauses[0], SpanOrQuery)
    # a phrase no rule touches keeps the plain positional PhraseQuery
    assert parse_query('"red house"', a) == PhraseQuery(("red", "house"), (0, 1))


def test_multiword_scores_match_explicit_queries(spark, tmp_path, mw_syn_file):
    """Parsed multi-word synonym text matches and scores identically to the
    hand-built PhraseQuery / SpanNear / BooleanQuery equivalents."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        PhraseQuery,
        SpanNearQuery,
        SpanTermQuery,
        TermQuery,
    )

    rows = [(i, t) for i, t in enumerate([
        "the united states anthem",
        "usa visa rules",
        "moving to new york",
        "ny visa office",
        "no match here at all",
    ])]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, num_segments=2, analyzer="simple",
                key_cols=("ext_id",), content_col="text")
    a = f"synonymq:simple:{mw_syn_file}"
    s = IndexSearcher(spark, d, analyzer=a, precision="f64")
    s_plain = IndexSearcher(spark, d, analyzer="simple", precision="f64")

    def res(searcher, q):
        return {
            (r.segment_id, r.doc_id): round(float(r.score), 9)
            for r in searcher.search_many({0: q}, k=None).collect()
        }

    ext = {(r.segment_id, r.doc_id): r.ext_id for r in
           spark.read.parquet(d + "/docs")
           .select("segment_id", "doc_id", "ext_id").collect()}

    # "usa" rewrites to the phrase — matches ONLY the phrase doc
    got = res(s, "usa")
    assert got == res(s_plain, PhraseQuery(("united", "states"), (0, 1)))
    assert sorted(ext[c] for c in got) == [0]

    # equivalence: term OR phrase — matches both surface forms
    got = res(s, "ny")
    want = res(s_plain, BooleanQuery(should=(
        TermQuery("ny"), PhraseQuery(("new", "york"), (0, 1)))))
    assert got == want
    assert sorted(ext[c] for c in got) == [2, 3]

    # multi-word LHS in a conjunction
    got = res(s, "new york visa")
    want = res(s_plain, BooleanQuery(must=(
        BooleanQuery(should=(PhraseQuery(("new", "york"), (0, 1)), TermQuery("ny"))),
        TermQuery("visa"))))
    assert got == want
    assert sorted(ext[c] for c in got) == [3]

    # phrase context: nested SpanNear equivalence
    got = res(s, '"usa visa"')
    want = res(s_plain, SpanNearQuery((
        SpanNearQuery((SpanTermQuery("united"), SpanTermQuery("states")),
                      slop=0, in_order=True),
        SpanTermQuery("visa")), slop=0, in_order=True))
    assert got == want
    assert sorted(ext[c] for c in got) == []  # "united states visa" never adjacent
