"""Replication (IndexFetcher / ReplicationHandler role) — replica must be
search-identical to the master, syncs must be incremental and idempotent,
and a torn sync must converge (reference ``solr/core/src/java/org/apache/
solr/handler/IndexFetcher.java`` fetchLatestIndex)."""

import os

import numpy as np
import pyspark.sql.functions as F
import pytest


def _results(spark, index_dir, queries):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code")
    hits = s.search_many({i: q for i, q in enumerate(queries)}, k=None)
    return sorted(
        (r.qid, int(r.segment_id), int(r.doc_id), float(np.float32(r.score)))
        for r in hits.collect()
    )


QUERIES = ["parse", "parse AND http", '"merge the segments"', "cach*"]


@pytest.fixture(scope="module")
def master(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    root = tmp_path_factory.mktemp("repl")
    d = str(root / "master")
    corpus = spark.createDataFrame(synth_corpus_local(300)).withColumn(
        "_b", F.abs(F.hash("path")) % 3
    )
    build_index(spark, corpus.filter("_b = 0").drop("_b"), d, num_segments=3)
    return d, corpus, root


def test_initial_sync_is_search_identical(spark, master):
    from lucene_solr_spark.index.manifest import list_commits
    from lucene_solr_spark.index.replicate import replicate_index

    d, _, root = master
    dst = str(root / "replica")
    res = replicate_index(spark, d, dst)
    assert res["segments_copied"] == 3
    assert res["docs_files_copied"] == 3
    assert not res["up_to_date"]
    assert _results(spark, dst, QUERIES) == _results(spark, d, QUERIES)
    assert list_commits(spark, dst) == list_commits(spark, d)

    # idempotent: equal-generation fast path copies nothing
    res2 = replicate_index(spark, d, dst)
    assert res2["up_to_date"]
    assert res2["segments_copied"] == 0 and res2["tombstones_copied"] == 0


def test_incremental_sync_moves_only_deltas(spark, master):
    from lucene_solr_spark.index.merge import delete_docs
    from lucene_solr_spark.index.replicate import replicate_index
    from lucene_solr_spark.streaming import ingest_batch

    d, corpus, root = master
    dst = str(root / "replica2")
    replicate_index(spark, d, dst)

    # master moves on: new segments + deletes on an ALREADY-replicated segment
    ingest_batch(corpus.filter("_b = 1").drop("_b"), 1, d, segments_per_batch=2)
    docs = spark.read.parquet(os.path.join(d, "docs"))
    delete_docs(spark, d, docs.filter(F.col("doc_id") % 5 == 2))

    res = replicate_index(spark, d, dst)
    assert res["segments_copied"] == 2  # only the new epoch's segments
    assert res["tombstones_copied"] >= 1
    assert _results(spark, dst, QUERIES) == _results(spark, d, QUERIES)

    # a second sync after no master changes is a no-op (tombstone anti-join
    # must not re-copy what already landed)
    res2 = replicate_index(spark, d, dst)
    assert res2["up_to_date"], res2


def test_torn_sync_converges(spark, master):
    import shutil

    from lucene_solr_spark.index.manifest import manifest_path
    from lucene_solr_spark.index.replicate import replicate_index

    d, _, root = master
    dst = str(root / "replica3")
    replicate_index(spark, d, dst)

    # simulate a crash between artifact copy and the manifest commit: the
    # replica has index/docs rows but no manifest rows for them
    shutil.rmtree(manifest_path(dst))
    res = replicate_index(spark, d, dst)
    assert res["segments_copied"] >= 3  # manifest rows re-appended
    assert _results(spark, dst, QUERIES) == _results(spark, d, QUERIES)

    # no duplicate postings landed: per-(segment, kind!=3) row counts match
    for side in (d, dst):
        idx = spark.read.parquet(os.path.join(side, "index")).filter("kind != 3")
        counts = sorted(
            (int(r.segment_id), int(r.n))
            for r in idx.groupBy("segment_id").agg(F.count("*").alias("n")).collect()
        )
        if side == d:
            expect = counts
    assert counts == expect


def test_replica_follows_merge(spark, master):
    """A compacting merge on the master replicates as ordinary new segments
    + manifest lineage; the replica's LIVE set (merge sources excluded)
    matches, and search stays identical (IndexFetcher after a merge —
    segments are immutable so the merged segment is just one more copy)."""
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import run_merges
    from lucene_solr_spark.index.replicate import replicate_index

    d, _, root = master
    dst = str(root / "replica_merge")
    replicate_index(spark, d, dst)

    merges = run_merges(spark, d, segs_per_tier=2, max_merge_at_once=8, floor_size=10**9)
    assert merges  # the fixture's segments qualify for at least one merge
    res = replicate_index(spark, d, dst)
    assert res["segments_copied"] >= 1
    assert live_segments(spark, dst) == live_segments(spark, d)
    assert _results(spark, dst, QUERIES) == _results(spark, d, QUERIES)
