"""BM25F combined-field scoring (search/bm25f.py — sandbox BM25FQuery.java):
blend-before-saturation semantics verified against a pure-numpy recomputation
from the raw posting/norm tables, plus the weight>=1 builder contract."""

import math

import numpy as np
import pytest


@pytest.fixture(scope="module")
def two_field_indexes(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    corpus = synth_corpus_local(120)
    corpus = corpus.assign(title=corpus["path"].str.replace(r"[/.]", " ", regex=True))
    docs = spark.createDataFrame(corpus)
    root = tmp_path_factory.mktemp("bm25f")
    d_body = str(root / "body")
    d_title = str(root / "title")
    build_index(spark, docs, d_body, num_segments=3, analyzer="code",
                content_col="content")
    build_index(spark, docs, d_title, num_segments=3, analyzer="code",
                content_col="title")
    return d_body, d_title


def test_weight_below_one_rejected(spark, two_field_indexes):
    from lucene_solr_spark.search.bm25f import BM25FSearcher

    d_body, d_title = two_field_indexes
    with pytest.raises(ValueError, match="weight must be >= 1"):
        BM25FSearcher(spark, {"body": (d_body, 1.0), "title": (d_title, 0.5)})


def test_bm25f_matches_numpy_recompute(spark, two_field_indexes):
    """Engine scores == blend-before-saturation BM25 recomputed in numpy from
    term_postings + norms_table, including the combined-norm re-quantization
    round-trip (MultiNormsLeafSimScorer semantics)."""
    from lucene_solr_spark import smallfloat as sf
    from lucene_solr_spark.index.read import norms_table, term_postings
    from lucene_solr_spark.search.bm25f import BM25FSearcher

    d_body, d_title = two_field_indexes
    weights = {"body": 1.0, "title": 2.0}
    dirs = {"body": d_body, "title": d_title}
    terms = ["store", "parse"]

    bf = BM25FSearcher(
        spark,
        {f: (dirs[f], weights[f]) for f in dirs},
        analyzer="code",
        precision="f64",
    )
    got = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in bf.search(terms, k=None).collect()
    }
    assert got

    # --- independent recompute ---
    freq: dict[tuple, float] = {}
    norm_sum: dict[tuple, float] = {}
    df_by_field_term: dict[str, dict[str, int]] = {}
    sttf_weighted = 0.0
    doc_count = 0
    for f in dirs:
        posts = term_postings(spark, dirs[f], terms).collect()
        dfs: dict[str, int] = {}
        for r in posts:
            c = (r.segment_id, r.doc_id)
            freq[c] = freq.get(c, 0.0) + weights[f] * float(r.freq)
            dfs[r.term] = dfs.get(r.term, 0) + 1
        df_by_field_term[f] = dfs
        nrows = norms_table(spark, dirs[f]).collect()
        sttf = 0.0
        nonzero = 0
        for r in nrows:
            nb = int(r.norm_byte)
            dl = float(sf.byte4_to_int(np.array([nb], dtype=np.int64))[0])
            c = (r.segment_id, r.doc_id)
            norm_sum[c] = norm_sum.get(c, 0.0) + weights[f] * dl
            if nb > 0:
                nonzero += 1
        # sumTotalTermFreq per field = sum of all term ttf == sum of tf over
        # postings of ALL terms; recompute from the full postings table
        allp = term_postings(spark, dirs[f]).collect()
        sttf = sum(float(r.freq) for r in allp)
        sttf_weighted += weights[f] * sttf
        doc_count = max(doc_count, nonzero)

    df_pseudo = max(
        max(dfs.get(t, 0) for dfs in df_by_field_term.values()) for t in terms
    )
    avgdl = sttf_weighted / doc_count
    idf = math.log(1.0 + (doc_count - df_pseudo + 0.5) / (df_pseudo + 0.5))

    k1, b = 1.2, 0.75
    expect = {}
    for c, fr in freq.items():
        cl = int(round(norm_sum[c]))
        nb = int(sf.int_to_byte4(np.array([cl], dtype=np.int64))[0])
        dl = float(sf.byte4_to_int(np.array([nb], dtype=np.int64))[0])
        expect[c] = idf * fr / (fr + k1 * (1.0 - b + b * dl / avgdl))

    assert set(got) == set(expect)
    for c in got:
        assert got[c] == pytest.approx(expect[c], rel=1e-9)


def test_bm25f_differs_from_per_field_sum(spark, two_field_indexes):
    """Blend-before-saturation is NOT the sum of per-field BM25 scores —
    guard that the op doesn't silently degrade into multifield sum-combine."""
    from lucene_solr_spark.search import MultiFieldSearcher
    from lucene_solr_spark.search.bm25f import BM25FSearcher

    d_body, d_title = two_field_indexes
    bf = BM25FSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 2.0)},
        analyzer="code", precision="f64",
    )
    mf = MultiFieldSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 2.0)}, analyzer="code"
    )
    q = "store"
    a = {(r.segment_id, r.doc_id): float(r.score)
         for r in bf.search([q], k=None).collect()}
    b = {(r.segment_id, r.doc_id): float(r.score)
         for r in mf.search(q, k=None, combine="sum").collect()}
    common = set(a) & set(b)
    assert common
    diffs = [abs(a[c] - b[c]) for c in common]
    assert max(diffs) > 1e-6


def test_bm25f_excludes_deleted_docs(spark, two_field_indexes):
    """Tombstoned docs must not be scored (live-view contract — review fix)."""
    from pyspark.sql import functions as F

    from lucene_solr_spark.index.merge import delete_docs
    from lucene_solr_spark.search.bm25f import BM25FSearcher

    d_body, d_title = two_field_indexes
    bf = BM25FSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 2.0)},
        analyzer="code", precision="f64",
    )
    before = {(r.segment_id, r.doc_id)
              for r in bf.search(["store"], k=None).collect()}
    assert before
    victim = sorted(before)[0]
    docs = spark.read.parquet(d_body + "/docs")
    vic = docs.filter(
        (F.col("segment_id") == victim[0]) & (F.col("doc_id") == victim[1])
    )
    delete_docs(spark, d_body, vic)
    delete_docs(spark, d_title, vic)
    # new searcher instances: live/tombstone views resolve at open
    bf2 = BM25FSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 2.0)},
        analyzer="code", precision="f64",
    )
    after = {(r.segment_id, r.doc_id)
             for r in bf2.search(["store"], k=None).collect()}
    assert victim not in after
    assert after == before - {victim}


def test_bm25f_empty_result_schema_has_rank(spark, two_field_indexes):
    from lucene_solr_spark.search.bm25f import BM25FSearcher

    d_body, d_title = two_field_indexes
    bf = BM25FSearcher(spark, {"body": (d_body, 1.0), "title": (d_title, 2.0)},
                       analyzer="code")
    empty = bf.search(["zzzznotaterm"], k=10)
    assert empty.count() == 0
    assert "rank" in empty.columns
    assert "rank" not in bf.search(["zzzznotaterm"], k=None).columns
