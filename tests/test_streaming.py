"""NRT streaming ingest: micro-batches append segments; a refreshed searcher
sees them; results equal a batch-built index (global-stats invariance under
segmentation); epoch replay is a no-op (exactly-once)."""

import os

import numpy as np
import pytest


def _results_by_key(spark, index_dir, queries, k=None):
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code")
    hits = s.search_many({i: q for i, q in enumerate(queries)}, k=k)
    live = live_segments(spark, index_dir)
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "doc_id", "path")
    )
    out = hits.join(docs, ["segment_id", "doc_id"]).select("qid", "path", "score").collect()
    return sorted((r.qid, r.path, float(np.float32(r.score))) for r in out)


QUERIES = ["parse", "buffer OR stream", '"index writer"', "+merge -segment"]


def test_stream_ingest_two_batches(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.streaming import index_stream

    root = tmp_path_factory.mktemp("stream")
    src = str(root / "src")
    index_dir = str(root / "idx")
    ckpt = str(root / "ckpt")
    os.makedirs(src)

    full = spark.createDataFrame(tiny_corpus)
    half1 = full.filter("doc_seq % 2 = 0") if "doc_seq" in full.columns else None
    # split deterministically on path hash
    import pyspark.sql.functions as F

    h = F.abs(F.hash("path")) % 2
    full = full.withColumn("_h", h)
    full.filter("_h = 0").drop("_h").write.parquet(os.path.join(src, "b0"))

    schema = full.drop("_h").schema
    stream = spark.readStream.schema(schema).parquet(src + "/*")

    q = index_stream(stream, index_dir, ckpt, segments_per_batch=3)
    q.awaitTermination(120)

    n_live_1 = len(live_segments(spark, index_dir))
    assert n_live_1 >= 1
    r1 = _results_by_key(spark, index_dir, QUERIES, k=None)
    assert r1

    # second batch arrives
    full.filter("_h = 1").drop("_h").write.parquet(os.path.join(src, "b1"))
    q2 = index_stream(stream, index_dir, ckpt, segments_per_batch=3)
    q2.awaitTermination(120)

    assert len(live_segments(spark, index_dir)) > n_live_1
    r2 = _results_by_key(spark, index_dir, QUERIES, k=None)

    # equivalence oracle: batch-built index over the full corpus
    batch_dir = str(root / "batch_idx")
    build_index(spark, full.drop("_h"), batch_dir, num_segments=6, analyzer="code")
    r_batch = _results_by_key(spark, batch_dir, QUERIES, k=None)
    assert r2 == r_batch


def test_epoch_replay_is_noop(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.streaming import ingest_batch

    root = tmp_path_factory.mktemp("stream2")
    index_dir = str(root / "idx")
    df = spark.createDataFrame(tiny_corpus)
    m1 = ingest_batch(df, 0, index_dir, segments_per_batch=3)
    assert m1 is not None
    live1 = live_segments(spark, index_dir)
    r1 = _results_by_key(spark, index_dir, QUERIES, k=None)
    # replay the same epoch — must be skipped entirely
    m2 = ingest_batch(df, 0, index_dir, segments_per_batch=3)
    assert m2 is None
    assert live_segments(spark, index_dir) == live1
    assert _results_by_key(spark, index_dir, QUERIES, k=None) == r1


def test_stream_then_merge(spark, tiny_corpus, tmp_path_factory):
    """Segments from different epochs merge like any others."""
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments
    from lucene_solr_spark.streaming import ingest_batch

    root = tmp_path_factory.mktemp("stream3")
    index_dir = str(root / "idx")
    df = spark.createDataFrame(tiny_corpus)
    import pyspark.sql.functions as F

    df = df.withColumn("_h", F.abs(F.hash("path")) % 2)
    ingest_batch(df.filter("_h = 0").drop("_h"), 0, index_dir, segments_per_batch=2)
    ingest_batch(df.filter("_h = 1").drop("_h"), 1, index_dir, segments_per_batch=2)
    before = _results_by_key(spark, index_dir, QUERIES, k=None)
    merge_segments(spark, index_dir, live_segments(spark, index_dir))
    assert len(live_segments(spark, index_dir)) == 1
    assert _results_by_key(spark, index_dir, QUERIES, k=None) == before
