"""CoveringQuery (search_covering — sandbox CoveringQuery.java): per-doc
minimumNumberMatch semantics, sum-of-matching-clause scores, the
no-value-no-match inner-join contract, and the maxClauseCount guard."""

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def index_dir(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    docs = spark.createDataFrame(synth_corpus_local(150))
    d = str(tmp_path_factory.mktemp("cov") / "idx")
    build_index(spark, docs, d, num_segments=3, analyzer="code",
                content_col="content")
    return d


def _clause_scores(searcher, queries):
    out = []
    for q in queries:
        out.append({
            (r.segment_id, r.doc_id): float(r.score)
            for r in searcher.search_many({0: q}, k=None).collect()
        })
    return out


def test_covering_constant_min_match(spark, index_dir):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code", precision="f64")
    queries = ["parse", "store", "buffer"]
    per = _clause_scores(s, queries)
    for m in (1, 2, 3):
        got = {
            (r.segment_id, r.doc_id): (int(r.n_matching), float(r.score))
            for r in s.search_covering(queries, m, k=None).collect()
        }
        coords = set().union(*[set(p) for p in per])
        expect = {}
        for c in coords:
            hits = [p[c] for p in per if c in p]
            if len(hits) >= max(1, m):
                expect[c] = (len(hits), sum(hits))
        assert set(got) == set(expect)
        for c in got:
            assert got[c][0] == expect[c][0]
            assert got[c][1] == pytest.approx(expect[c][1], rel=1e-9)


def test_covering_min_match_below_one_treated_as_one(spark, index_dir):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code", precision="f64")
    queries = ["parse", "store"]
    a = s.search_covering(queries, 0, k=None).count()
    b = s.search_covering(queries, 1, k=None).count()
    assert a == b > 0


def test_covering_per_doc_source_and_missing_rows(spark, index_dir):
    """Per-doc minMatch frame drives the threshold; docs absent from the
    frame never match (CoveringQuery ctor javadoc)."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code", precision="f64")
    queries = ["parse", "store", "buffer"]
    per = _clause_scores(s, queries)
    coords = sorted(set().union(*[set(p) for p in per]))
    # even doc_id -> needs 2 clauses, odd -> 1; docs in segment 0 get NO row
    mm_rows = [
        (int(sg), int(d), 2 if d % 2 == 0 else 1)
        for sg, d in coords
        if sg != 0
    ]
    mm = spark.createDataFrame(mm_rows, "segment_id int, doc_id bigint, mm long")
    got = {
        (r.segment_id, r.doc_id): (int(r.n_matching), float(r.score))
        for r in s.search_covering(queries, mm, k=None).collect()
    }
    expect = {}
    for sg, d in coords:
        if sg == 0:
            continue
        need = 2 if d % 2 == 0 else 1
        hits = [p[(sg, d)] for p in per if (sg, d) in p]
        if len(hits) >= need:
            expect[(sg, d)] = (len(hits), sum(hits))
    assert set(got) == set(expect)
    for c in got:
        assert got[c][0] == expect[c][0]
        assert got[c][1] == pytest.approx(expect[c][1], rel=1e-9)
    # and at least one segment-0 coordinate matched >=1 clause but was dropped
    assert any(sg == 0 for sg, _ in coords)


def test_covering_topk_rank_order(spark, index_dir):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code", precision="f64")
    rows = s.search_covering(["parse", "store"], 1, k=5).orderBy("rank").collect()
    assert 0 < len(rows) <= 5
    keys = [(-float(r.score), r.segment_id, r.doc_id) for r in rows]
    assert keys == sorted(keys)


def test_covering_too_many_clauses(spark, index_dir):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import MAX_CLAUSE_COUNT

    s = IndexSearcher(spark, index_dir, analyzer="code")
    with pytest.raises(ValueError, match="maxClauseCount"):
        s.search_covering(["t"] * (MAX_CLAUSE_COUNT + 1), 1)
