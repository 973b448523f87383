"""RealTimeGet (/get handler role, index/read.realtime_get): latest-commit
by-key lookup — add -> visible, delete -> gone, update (delete + re-add) ->
newest version wins; independent of any searcher commit snapshot."""

import os

import pytest
from pyspark.sql import functions as F


def test_realtime_get_add_update_delete(spark, tmp_path):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import delete_docs
    from lucene_solr_spark.index.read import realtime_get
    from lucene_solr_spark.streaming import ingest_batch

    d = str(tmp_path / "idx")
    corpus = spark.createDataFrame(synth_corpus_local(60))
    build_index(spark, corpus, d, num_segments=2)
    key_cols = ("repo", "path", "commit")

    some = corpus.select(*key_cols).limit(3)
    keys = [tuple(r) for r in some.collect()]

    got = realtime_get(spark, d, some, key_cols=key_cols)
    assert got.count() == 3
    assert set(got.columns) >= {"repo", "path", "commit", "content"}

    # update one doc: delete + re-add with new content (IndexWriter
    # updateDocuments semantics)
    upd_key = keys[0]
    docs = spark.read.parquet(os.path.join(d, "docs"))
    victim = docs.filter(
        (F.col("repo") == upd_key[0])
        & (F.col("path") == upd_key[1])
        & (F.col("commit") == upd_key[2])
    )
    delete_docs(spark, d, victim)
    new_row = corpus.filter(
        (F.col("repo") == upd_key[0])
        & (F.col("path") == upd_key[1])
        & (F.col("commit") == upd_key[2])
    ).withColumn("content", F.lit("updated sentinel content"))
    ingest_batch(new_row, 1, d, segments_per_batch=1)

    got2 = realtime_get(spark, d, some, key_cols=key_cols)
    assert got2.count() == 3
    row = got2.filter(F.col("path") == upd_key[1]).collect()[0]
    assert row.content == "updated sentinel content"

    # hard delete another key: /get no longer returns it
    del_key = keys[1]
    victim2 = docs.filter(
        (F.col("repo") == del_key[0])
        & (F.col("path") == del_key[1])
        & (F.col("commit") == del_key[2])
    )
    delete_docs(spark, d, victim2)
    got3 = realtime_get(spark, d, some, key_cols=key_cols)
    assert got3.count() == 2
    assert got3.filter(F.col("path") == del_key[1]).count() == 0


def test_realtime_get_scalar_keys_and_empty(spark, tmp_path):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.read import realtime_get

    d = str(tmp_path / "idx")
    rows = [(i, f"text number {i}") for i in range(20)]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    build_index(spark, docs, d, num_segments=2, key_cols=("ext_id",),
                content_col="text")
    got = realtime_get(spark, d, [3, 7, 11], key_cols=("ext_id",))
    assert sorted(r.ext_id for r in got.collect()) == [3, 7, 11]
    assert realtime_get(spark, d, [], key_cols=("ext_id",)).count() == 0
    # missing keys simply return no row
    assert realtime_get(spark, d, [999], key_cols=("ext_id",)).count() == 0


def test_deleted_docs_table_roundtrip(spark, tmp_path):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import delete_docs
    from lucene_solr_spark.index.read import deleted_docs_table

    d = str(tmp_path / "idx")
    corpus = spark.createDataFrame(synth_corpus_local(50))
    build_index(spark, corpus, d, num_segments=2)
    docs = spark.read.parquet(os.path.join(d, "docs"))
    victims = docs.filter(F.col("doc_id") % 5 == 0)
    expect = {
        (r.segment_id, r.doc_id)
        for r in victims.select("segment_id", "doc_id").collect()
    }
    n = delete_docs(spark, d, victims)
    assert n == len(expect)
    got = {
        (r.segment_id, r.doc_id)
        for r in deleted_docs_table(spark, d).collect()
    }
    assert got == expect
