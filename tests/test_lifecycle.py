"""Full-lifecycle integration: everything a reference user does, in one
sequence, ending rank-identical to a from-scratch rebuild.

batch build → streaming ingest of two more batches → deletes → tiered merge
loop → CheckIndex clean → every query family (term/bool/phrase/multiterm/
dismax) equal to an index rebuilt from scratch on the surviving corpus.
"""

import os

import numpy as np
import pytest

QUERIES = [
    "parse",
    "buffer OR stream OR channel",
    "+cache +query -lock",
    '"index writer"',
    '"merge the segments"',
]


def _by_key(spark, index_dir, queries):
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code")
    hits = s.search_many({i: q for i, q in enumerate(queries)}, k=None)
    live = live_segments(spark, index_dir)
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "doc_id", "path")
    )
    out = hits.join(docs, ["segment_id", "doc_id"]).select("qid", "path", "score").collect()
    return sorted((r.qid, r.path, float(np.float32(r.score))) for r in out), s


def test_full_lifecycle(spark, tmp_path_factory):
    import pyspark.sql.functions as F

    from lucene_solr_spark.check import check_index
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import delete_docs, run_merges
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import DisjunctionMaxQuery, PrefixQuery, TermQuery
    from lucene_solr_spark.streaming import ingest_batch

    root = tmp_path_factory.mktemp("life")
    d = str(root / "idx")
    corpus = spark.createDataFrame(synth_corpus_local(300)).withColumn(
        "_b", F.abs(F.hash("path")) % 3
    )

    # 1. batch build of the first third
    build_index(spark, corpus.filter("_b = 0").drop("_b"), d, num_segments=3)
    # 2. two streaming epochs for the rest
    ingest_batch(corpus.filter("_b = 1").drop("_b"), 1, d, segments_per_batch=3)
    ingest_batch(corpus.filter("_b = 2").drop("_b"), 2, d, segments_per_batch=3)
    assert len(live_segments(spark, d)) >= 7

    # 3. delete a deterministic slice (update-style churn)
    docs = spark.read.parquet(os.path.join(d, "docs"))
    victims = docs.filter(F.col("doc_id") % 4 == 1)
    victim_keys = [
        (r.repo, r.path, r.commit)
        for r in victims.select("repo", "path", "commit").distinct().collect()
    ]
    delete_docs(spark, d, victims)

    # 4. tiered merge loop compacts everything
    merges = run_merges(
        spark, d, segs_per_tier=2, max_merge_at_once=4, floor_size=10**9
    )
    assert merges
    assert len(live_segments(spark, d)) <= 3

    # 5. structural invariants hold
    res = check_index(spark, d)
    bad = {k: v for k, v in res.items() if k.startswith("bad_") and v != 0}
    assert not bad, bad

    # 6. rank-identical to a from-scratch rebuild on the surviving corpus
    d2 = str(root / "rebuild")
    keep = corpus.drop("_b").join(
        spark.createDataFrame(victim_keys, "repo string, path string, commit string"),
        ["repo", "path", "commit"],
        "left_anti",
    )
    build_index(spark, keep, d2, num_segments=5)
    r1, s1 = _by_key(spark, d, QUERIES)
    r2, s2 = _by_key(spark, d2, QUERIES)
    assert r1 == r2
    assert s1.doc_count == s2.doc_count and s1.sum_total_term_freq == s2.sum_total_term_freq

    # 7. multiterm/dismax agree across the two indexes too (doc sets + scores)
    for q in (PrefixQuery(prefix="pars"), DisjunctionMaxQuery((TermQuery("parse"), TermQuery("cache")), 0.1)):
        a = sorted(
            round(float(np.float32(r.score)), 5)
            for r in s1.search_many({0: q}, k=None).collect()
        )
        b = sorted(
            round(float(np.float32(r.score)), 5)
            for r in s2.search_many({0: q}, k=None).collect()
        )
        assert a == b
