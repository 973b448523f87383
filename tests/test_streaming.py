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


def test_torn_commit_replay_converges(spark, tiny_corpus, tmp_path_factory):
    """Crash window: epoch data (index+docs) written but the manifest commit
    lost. The replay must skip the already-written artifacts and just commit
    — no duplicate posting/doc rows, results equal a clean build."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.streaming import ingest_batch

    root = tmp_path_factory.mktemp("torn")
    index_dir = str(root / "idx")
    df = spark.createDataFrame(tiny_corpus).withColumn("_h", F.abs(F.hash("path")) % 2)
    d0, d1 = df.filter("_h = 0").drop("_h"), df.filter("_h = 1").drop("_h")

    ingest_batch(d0, 0, index_dir, segments_per_batch=2)
    man_dir = os.path.join(index_dir, "manifest")
    before = set(os.listdir(man_dir))
    assert ingest_batch(d1, 1, index_dir, segments_per_batch=2) is not None
    # simulate the crash: drop the manifest files epoch 1 just appended
    for f in set(os.listdir(man_dir)) - before:
        if f.startswith("part-"):
            os.remove(os.path.join(man_dir, f))
    # replay epoch 1 — must detect the uncommitted epoch and converge
    m = ingest_batch(d1, 1, index_dir, segments_per_batch=2)
    assert m is not None and m["skipped_segments"] >= 1

    # no duplicate posting rows for any (segment, term, shard)
    dup = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter(F.col("kind") == 0)
        .groupBy("segment_id", "term", "shard")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert dup == 0
    # no duplicate doc rows either
    ddup = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .groupBy("segment_id", "doc_id")
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    assert ddup == 0

    batch_dir = str(root / "batch")
    build_index(spark, df.drop("_h"), batch_dir, num_segments=4, analyzer="code")
    assert _results_by_key(spark, index_dir, QUERIES, k=None) == _results_by_key(
        spark, batch_dir, QUERIES, k=None
    )


def test_new_checkpoint_same_epoch_still_ingests(spark, tiny_corpus, tmp_path_factory):
    """Commits are keyed by (stream_id, epoch): a different stream's epoch 0
    must NOT be mistaken for an already-committed replay."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.streaming import ingest_batch

    root = tmp_path_factory.mktemp("twostreams")
    index_dir = str(root / "idx")
    df = spark.createDataFrame(tiny_corpus).withColumn("_h", F.abs(F.hash("path")) % 2)
    ingest_batch(df.filter("_h = 0").drop("_h"), 0, index_dir, stream_id="ckpt-A")
    n1 = len(live_segments(spark, index_dir))
    m = ingest_batch(df.filter("_h = 1").drop("_h"), 0, index_dir, stream_id="ckpt-B")
    assert m is not None
    assert len(live_segments(spark, index_dir)) > n1
    # but a true replay (same stream, same epoch) is still a no-op
    assert ingest_batch(df.filter("_h = 1").drop("_h"), 0, index_dir, stream_id="ckpt-B") is None


def test_term_stats_snapshot_survives_rebuild(spark, tiny_corpus, tmp_path_factory):
    """An open searcher keeps a valid term_stats handle across
    rebuild_term_stats (generations are append-only; no overwrite races)."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import rebuild_term_stats
    from lucene_solr_spark.search import IndexSearcher

    root = tmp_path_factory.mktemp("tsgen")
    index_dir = str(root / "idx")
    df = spark.createDataFrame(tiny_corpus)
    build_index(spark, df, index_dir, num_segments=3, analyzer="code")
    s = IndexSearcher(spark, index_dir, analyzer="code")
    rebuild_term_stats(spark, index_dir)
    rebuild_term_stats(spark, index_dir)
    # resolve a term the old searcher has NOT cached yet — with an overwritten
    # flat layout this raised FileNotFoundException
    stats = s.term_stats({"parse"})
    assert stats.get("parse", 0) > 0
    # a fresh searcher binds to the newest generation and agrees
    s2 = IndexSearcher(spark, index_dir, analyzer="code")
    assert s2.term_stats({"parse"}) == stats


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
