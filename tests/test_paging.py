"""searchAfter / count / explain on the engine searcher."""

import numpy as np
import pytest


@pytest.fixture(scope="module")
def searcher(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    return IndexSearcher(spark, tiny_index[0], analyzer="code")


def test_search_after_continues_ranking(searcher):
    q = "buffer OR stream OR channel"
    full = searcher.search_many({0: q}, k=None).drop("qid").collect()
    order = sorted(
        ((float(np.float32(r.score)), r.segment_id, r.doc_id) for r in full),
        key=lambda t: (-t[0], t[1], t[2]),
    )
    assert len(order) > 10
    page1 = searcher.search(q, k=5).orderBy("rank").collect()
    cursor = (page1[-1].score, page1[-1].segment_id, page1[-1].doc_id)
    page2 = searcher.search_after(q, cursor, k=5).orderBy("rank").collect()
    got = [(r.segment_id, r.doc_id) for r in page1] + [
        (r.segment_id, r.doc_id) for r in page2
    ]
    want = [(s, d) for _, s, d in order[:10]]
    assert got == want
    # pages don't overlap
    assert len(set(got)) == 10


def test_search_after_empty_past_end(searcher):
    q = "sd"
    n = searcher.count(q)
    all_rows = searcher.search(q, k=max(n, 1)).orderBy("rank").collect()
    if not all_rows:
        pytest.skip("no hits for term")
    last = all_rows[-1]
    page = searcher.search_after(q, (last.score, last.segment_id, last.doc_id), k=5)
    assert page.count() == 0


def test_count_matches_exhaustive(searcher):
    assert searcher.count("parse") == searcher.search("parse", k=None).count()
    assert searcher.count("nonexistentterm") == 0


def test_explain_reconstructs_score(searcher):
    hits = searcher.search("parse AND http", k=3).orderBy("rank").collect()
    assert hits
    top = hits[0]
    ex = searcher.explain("parse AND http", top.segment_id, top.doc_id)
    assert {d["term"] for d in ex["details"]} == {"parse", "http"}
    assert abs(ex["total_if_sum"] - float(np.float32(top.score))) < 1e-5
    for d in ex["details"]:
        assert d["freq"] >= 1 and d["idf_weight"] > 0 and 0 < d["tf"] < 1


def test_rescore_combines_first_and_second_pass(searcher):
    """QueryRescorer.rescore sugar (QueryRescorer.java:168-182):
    new = first + weight * second; non-matching second pass keeps first."""
    first_q = "buffer OR stream"
    second_q = '"table hash"'
    weight = 2.5
    hits = searcher.search(first_q, k=20)
    got = searcher.rescore(hits, second_q, weight=weight, k=10).collect()
    assert got, "rescore returned nothing"
    first = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in searcher.search(first_q, k=20).collect()
    }
    second = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in searcher.search_many({0: second_q}, k=None).collect()
    }
    expect = sorted(
        (
            (-(s + weight * second.get(coord, 0.0)), coord[0], coord[1])
            for coord, s in first.items()
        ),
    )[:10]
    want = [(seg, doc) for _, seg, doc in expect]
    assert [(r.segment_id, r.doc_id) for r in sorted(got, key=lambda r: r.rank)] == want
    # combined scores match the linear combination
    for r in got:
        coord = (r.segment_id, r.doc_id)
        exp = first[coord] + weight * second.get(coord, 0.0)
        assert abs(float(r.score) - exp) < 1e-5, coord


def test_matchall_inside_boolean_matches_all_segments(searcher):
    """A MatchAll nested in a BooleanQuery must not lose segments whose
    postings side is empty (the termless guard recurses compounds)."""
    from lucene_solr_spark.search.query import (
        BooleanQuery,
        MatchAllQuery,
        TermQuery,
    )

    q = BooleanQuery(must=(MatchAllQuery(),), must_not=(TermQuery("zzz_absent"),))
    assert searcher.count(q) == searcher.doc_count
    # and with a real excluded term: complement sizes add up
    q2 = BooleanQuery(must=(MatchAllQuery(),), must_not=(TermQuery("buffer"),))
    n_with = searcher.count(TermQuery("buffer"))
    assert n_with > 0
    assert searcher.count(q2) == searcher.doc_count - n_with


def test_rescore_joins_are_broadcast(searcher):
    """The rescore combine must stay broadcast-shaped (no sort-merge join
    of the exhaustive second pass)."""
    import io
    from contextlib import redirect_stdout

    hits = searcher.search("buffer OR stream", k=10)
    df = searcher.rescore(hits, '"table hash"', weight=1.5, k=5)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" in plan
