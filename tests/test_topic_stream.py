"""TopicStream: checkpointed incremental query — each call returns only docs
from segments added since the previous call; merges republish nothing."""

import os

import pytest


def test_topic_stream_incremental(spark, tiny_corpus, tmp_path_factory):
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments
    from lucene_solr_spark.streaming import ingest_batch
    from lucene_solr_spark.streaming.ingest import topic_stream

    root = tmp_path_factory.mktemp("topic")
    d = str(root / "idx")
    ckpt = str(root / "topic.json")
    df = spark.createDataFrame(tiny_corpus).withColumn(
        "_h", F.abs(F.hash("path")) % 2
    )

    ingest_batch(df.filter("_h = 0").drop("_h"), 0, d, segments_per_batch=2)
    first = topic_stream(spark, d, "parse", ckpt)
    n1 = first.count()
    assert n1 > 0

    # no new segments → nothing republished
    assert topic_stream(spark, d, "parse", ckpt).count() == 0

    # second batch → only its docs are returned
    ingest_batch(df.filter("_h = 1").drop("_h"), 1, d, segments_per_batch=2)
    second = topic_stream(spark, d, "parse", ckpt)
    n2 = second.count()
    assert n2 > 0
    # total across calls equals one full query
    from lucene_solr_spark.search import IndexSearcher

    total = IndexSearcher(spark, d, analyzer="code").count("parse")
    assert n1 + n2 == total

    # a merge of already-seen segments republishes nothing
    merge_segments(spark, d, live_segments(spark, d))
    assert topic_stream(spark, d, "parse", ckpt).count() == 0


def test_topic_stream_deferred_commit(spark, tiny_corpus, tmp_path_factory):
    """auto_commit=False: the checkpoint advances only when the caller
    commits — a failed consumer retries the same delivery (at-least-once)."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.streaming import ingest_batch
    from lucene_solr_spark.streaming.ingest import topic_stream

    root = tmp_path_factory.mktemp("topic2")
    d = str(root / "idx")
    ckpt = str(root / "topic.json")
    df = spark.createDataFrame(tiny_corpus)
    ingest_batch(df, 0, d, segments_per_batch=2)

    hits, commit = topic_stream(spark, d, "parse", ckpt, auto_commit=False)
    n = hits.count()
    assert n > 0
    # consumer "failed" — no commit: the next call re-delivers everything
    hits2, commit2 = topic_stream(spark, d, "parse", ckpt, auto_commit=False)
    assert hits2.count() == n
    commit2()
    # committed — nothing left to deliver
    assert topic_stream(spark, d, "parse", ckpt).count() == 0
