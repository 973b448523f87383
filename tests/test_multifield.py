"""MultiFieldQueryParser / dismax-qf over per-field indexes: coordinate
alignment of same-key builds, sum-combine parity with the per-field engines,
dismax tie-break combine, and field boosts."""

import pytest


@pytest.fixture(scope="module")
def two_field_indexes(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    corpus = synth_corpus_local(150)
    # title field: a short derived text (the path, de-punctuated) — a second
    # analyzed field over the SAME document keys
    corpus = corpus.assign(title=corpus["path"].str.replace(r"[/.]", " ", regex=True))
    docs = spark.createDataFrame(corpus)
    root = tmp_path_factory.mktemp("mf")
    d_body = str(root / "body")
    d_title = str(root / "title")
    build_index(spark, docs, d_body, num_segments=3, analyzer="code",
                content_col="content")
    build_index(spark, docs, d_title, num_segments=3, analyzer="code",
                content_col="title")
    return d_body, d_title


def test_coordinates_align_across_fields(spark, two_field_indexes):
    """Same keys + same num_segments ⇒ identical (segment_id, doc_id) per
    document — the invariant that makes cross-field scoring an equi-join."""
    d_body, d_title = two_field_indexes
    a = spark.read.parquet(d_body + "/docs").select(
        "repo", "path", "commit", "segment_id", "doc_id"
    )
    b = spark.read.parquet(d_title + "/docs").select(
        "repo", "path", "commit", "segment_id", "doc_id"
    )
    a2 = a.withColumnRenamed("segment_id", "sa").withColumnRenamed("doc_id", "da")
    b2 = b.withColumnRenamed("segment_id", "sb").withColumnRenamed("doc_id", "db")
    j = a2.join(b2, ["repo", "path", "commit"])
    assert j.count() == a.count() == b.count()
    assert j.filter("sa != sb OR da != db").count() == 0


def _field_scores(searcher, q):
    return {
        (r.segment_id, r.doc_id): float(r.score)
        for r in searcher.search_many({0: q}, k=None).collect()
    }


@pytest.mark.parametrize("combine,tie", [("sum", 0.0), ("dismax", 0.3)])
def test_multifield_combines_per_field_scores(spark, two_field_indexes, combine, tie):
    from lucene_solr_spark.search import IndexSearcher, MultiFieldSearcher

    d_body, d_title = two_field_indexes
    q = "parse OR buffer OR store"
    boosts = {"body": 1.0, "title": 2.0}
    mf = MultiFieldSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 2.0)}, analyzer="code"
    )
    got = mf.search(q, k=12, combine=combine, tie=tie).collect()
    assert got
    body = _field_scores(IndexSearcher(spark, d_body, analyzer="code"), q)
    title = _field_scores(IndexSearcher(spark, d_title, analyzer="code"), q)
    coords = set(body) | set(title)
    expect = {}
    for c in coords:
        parts = [boosts["body"] * body.get(c, 0.0), boosts["title"] * title.get(c, 0.0)]
        if combine == "sum":
            expect[c] = sum(parts)
        else:
            expect[c] = max(parts) + tie * (sum(parts) - max(parts))
    order = sorted(expect.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))[:12]
    want = [c for c, _ in order]
    assert [(r.segment_id, r.doc_id) for r in sorted(got, key=lambda r: r.rank)] == want
    for r in got:
        assert abs(float(r.score) - expect[(r.segment_id, r.doc_id)]) < 1e-4


def test_title_boost_changes_winner(spark, two_field_indexes):
    """A term present in titles must rank title-hit docs first under a big
    title boost even if body hits score higher unboosted."""
    from lucene_solr_spark.search import MultiFieldSearcher

    d_body, d_title = two_field_indexes
    mf_flat = MultiFieldSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 1.0)}, analyzer="code"
    )
    mf_boost = MultiFieldSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 10.0)}, analyzer="code"
    )
    from lucene_solr_spark.search import IndexSearcher

    q = "store"
    flat = [(r.segment_id, r.doc_id) for r in
            mf_flat.search(q, k=5).orderBy("rank").collect()]
    boosted = [(r.segment_id, r.doc_id) for r in
               mf_boost.search(q, k=5).orderBy("rank").collect()]
    assert flat and boosted
    title_scores = _field_scores(IndexSearcher(spark, d_title, analyzer="code"), q)
    # under a 10x title boost, the winner must be a title-matching doc
    assert title_scores.get(boosted[0], 0.0) > 0.0
