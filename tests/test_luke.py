"""Luke handler (LukeRequestHandler / admin segments role): index overview
from metadata tables only, consistent through deletes and merges."""

import pyspark.sql.functions as F


def test_luke_overview_and_top_terms(spark, tiny_index):
    from lucene_solr_spark.luke import luke, segments_info, top_terms

    d, metrics = tiny_index
    info = luke(spark, d)
    assert info["maxDoc"] == metrics["max_doc"] == 200
    assert info["numDocs"] == 200 and info["deletedDocs"] == 0
    assert info["segmentCount"] == 4
    # numTerms is GLOBAL distinct terms (metrics["n_terms"] counts
    # per-segment rows) — check against the posting table independently
    distinct_terms = (
        spark.read.parquet(d + "/index")
        .filter("kind = 0")
        .select("term")
        .distinct()
        .count()
    )
    assert info["numTerms"] == distinct_terms
    assert info["sumTotalTermFreq"] == metrics["sum_len"]
    assert info["commits"] >= 1 and info["indexVersion"] >= 0

    tt = top_terms(spark, d, n=5).collect()
    assert len(tt) == 5
    dfs = [r.df for r in tt]
    assert dfs == sorted(dfs, reverse=True)
    # df can never exceed the doc count
    assert all(0 < r.df <= 200 for r in tt)

    segs = segments_info(spark, d).collect()
    assert len(segs) == 4
    assert sum(r.doc_count for r in segs) == 200


def test_luke_sees_deletes(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import delete_docs
    from lucene_solr_spark.luke import luke

    d = str(tmp_path_factory.mktemp("luke") / "idx")
    docs = spark.createDataFrame(synth_corpus_local(120))
    build_index(spark, docs, d, num_segments=2)
    stored = spark.read.parquet(d + "/docs")
    n_del = delete_docs(spark, d, stored.filter(F.col("doc_id") % 3 == 0))
    info = luke(spark, d)
    assert info["deletedDocs"] == n_del > 0
    assert info["numDocs"] == 120 - n_del
    assert info["maxDoc"] == 120


# ------------------------------------------------- FieldAnalysisRequestHandler


def test_analyze_field_attributes():
    from lucene_solr_spark.luke import analyze_field

    text = "the parseHttpRequest was sent"
    out = analyze_field(text, analyzer="code", query="parse buffer")
    terms = [t["term"] for t in out]
    # camelCase split, stopwords dropped ('the', 'was')
    assert terms == ["parse", "http", "request", "sent"]
    # positions carry the stopword gap ('the' occupies slot 0)
    assert [t["position"] for t in out] == [1, 2, 3, 5]
    # offsets point into the ORIGINAL text
    for t in out:
        frag = text[t["start_offset"] : t["end_offset"]]
        assert frag.lower() == t["term"]
    # showMatch: only the query's analyzed terms flag
    assert [t["match"] for t in out] == [True, False, False, False]


def test_analyze_field_no_offsets_chain():
    from lucene_solr_spark.luke import analyze_field

    out = analyze_field("foo bar", analyzer="simple")
    assert [t["term"] for t in out] == ["foo", "bar"]
    assert all(t["start_offset"] is None for t in out)
