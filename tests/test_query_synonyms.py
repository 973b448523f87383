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
