"""ASCIIFoldingFilter chain (analysis.fold_to_ascii / simple_fold) and the
IndexSortSortedNumericDocValuesRangeQuery role (search_sorted_range)."""

import pytest
from pyspark.sql import functions as F


def test_fold_to_ascii_examples():
    from lucene_solr_spark.analysis import fold_to_ascii

    assert fold_to_ascii("café naïve Ürümqi") == "cafe naive Urumqi"
    assert fold_to_ascii("Straße œuvre Þing") == "Strasse oeuvre THing"
    assert fold_to_ascii("Łódź Øre Æon") == "Lodz Ore AEon"
    assert fold_to_ascii("plain ascii 123") == "plain ascii 123"


def test_simple_fold_chain_tokens():
    from lucene_solr_spark.analysis import ANALYZERS

    terms, pos = ANALYZERS["simple_fold"]("Café au Łait, n°5")
    assert terms == ["cafe", "au", "lait", "n", "5"]
    assert pos == [0, 1, 2, 3, 4]


def test_accent_insensitive_search(spark, tmp_path):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    rows = [(0, "le café est bon"), (1, "the cafe is good"), (2, "no match")]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, num_segments=1, analyzer="simple_fold",
                key_cols=("ext_id",), content_col="text")
    s = IndexSearcher(spark, d, analyzer="simple_fold")
    ext = {r.doc_id: r.ext_id for r in
           spark.read.parquet(d + "/docs").select("doc_id", "ext_id").collect()}
    # accented AND unaccented queries both hit both docs
    for q in ("café", "cafe"):
        hits = sorted(ext[r.doc_id]
                      for r in s.search_many({0: q}, k=None).collect())
        assert hits == [0, 1], q


@pytest.fixture(scope="module")
def sorted_index(spark, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    rows = [(i, i * 7 % 100, f"text body number {i}") for i in range(120)]
    docs = spark.createDataFrame(rows, "ext_id bigint, price bigint, text string")
    d = str(tmp_path_factory.mktemp("ssr") / "idx")
    build_index(spark, docs, d, num_segments=3, analyzer="simple",
                key_cols=("ext_id",), content_col="text", index_sort="price")
    return d


def test_sorted_range_equals_brute_filter(spark, sorted_index):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sorted_index, analyzer="simple")
    got = s.search_sorted_range(20, 55).collect()
    docs = spark.read.parquet(sorted_index + "/docs")
    expect = {
        (r.segment_id, r.doc_id)
        for r in docs.filter((F.col("price") >= 20) & (F.col("price") <= 55))
        .select("segment_id", "doc_id").collect()
    }
    assert {(r.segment_id, r.doc_id) for r in got} == expect
    assert len(got) > 0
    # index sort ⇒ matches form ONE contiguous local-docID run per segment
    by_seg: dict[int, list[int]] = {}
    for r in got:
        by_seg.setdefault(r.segment_id, []).append(r.doc_id)
    for seg, ids in by_seg.items():
        ids.sort()
        assert ids == list(range(ids[0], ids[-1] + 1)), seg


def test_sorted_range_requires_index_sort(spark, tmp_path):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    rows = [(i, f"words here {i}") for i in range(30)]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, num_segments=1, analyzer="simple",
                key_cols=("ext_id",), content_col="text")
    s = IndexSearcher(spark, d, analyzer="simple")
    with pytest.raises(ValueError, match="index_sort"):
        s.search_sorted_range(0, 10)


def test_sorted_range_filter_pushed_to_scan(spark, sorted_index):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sorted_index, analyzer="simple")
    plan = s.search_sorted_range(20, 55)._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters" in plan
    assert "GreaterThanOrEqual(price,20)" in plan and "LessThanOrEqual(price,55)" in plan


def test_sorted_range_excludes_deleted(spark, sorted_index):
    """liveDocs intersection (review fix): a tombstoned in-range doc is not
    returned."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.merge import delete_docs
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sorted_index, analyzer="simple")
    before = {(r.segment_id, r.doc_id) for r in s.search_sorted_range(20, 55).collect()}
    victim = sorted(before)[0]
    docs = spark.read.parquet(sorted_index + "/docs")
    vic = docs.filter(
        (F.col("segment_id") == victim[0]) & (F.col("doc_id") == victim[1])
    )
    delete_docs(spark, sorted_index, vic)
    after = {(r.segment_id, r.doc_id) for r in s.search_sorted_range(20, 55).collect()}
    assert after == before - {victim}
