"""Merge + deletes: the reference's equivalence oracle for merging is that a
merged index is indistinguishable from the index you'd get by rebuilding from
scratch (BaseMergePolicyTestCase / TestIndexWriterMerging style, SURVEY §5).

Checks here:
- TieredMergePolicy planner: budget math + score formula behavior.
- merge-of-everything ≡ original index: identical (key, score, rank) on the
  full query set, scores float32-identical (global stats invariance).
- hot-term salted path (hot_df_threshold=0 forces every term to stay
  sharded) produces identical results.
- deletes: tombstoned docs vanish from results; a compacting merge produces
  results identical to an index rebuilt from scratch WITHOUT the deleted
  docs (df/doc_count/avgdl all move — the strictest stats check).
- resume-after-merge: re-running the build skips everything.
"""

import numpy as np
import pandas as pd
import pytest

QUERIES = [
    "parse",
    "buffer",
    "parse AND http",
    "buffer OR stream OR channel",
    "+merge -segment",
    '"index writer"',
    '"merge the segments"',
]


def _results_by_key(spark, index_dir, queries, k=None):
    """Search results joined back to the stable doc key (path) so they can be
    compared across different segmentations / doc-id assignments."""
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code")
    hits = s.search_many({i: q for i, q in enumerate(queries)}, k=k)
    live = live_segments(spark, index_dir)
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "doc_id", "repo", "path", "commit")
    )
    out = (
        hits.join(docs, ["segment_id", "doc_id"])
        .select("qid", "repo", "path", "commit", "score")
        .collect()
    )
    return sorted(
        (r.qid, r.repo, r.path, r.commit, float(np.float32(r.score))) for r in out
    )


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus):
    return spark.createDataFrame(tiny_corpus)


def _build(spark, corpus_df, tmp_path_factory, name, num_segments=6):
    from lucene_solr_spark.index import build_index

    d = str(tmp_path_factory.mktemp("merge") / name)
    build_index(spark, corpus_df, d, num_segments=num_segments, analyzer="code")
    return d


# ---------------------------------------------------------------- planner --

def test_merge_score_prefers_balanced():
    from lucene_solr_spark.index.merge import merge_score

    balanced = merge_score([100, 100, 100])
    skewed = merge_score([1000, 10, 10])
    assert balanced < skewed  # lower is better; skew dominates


def test_merge_score_rewards_deletes():
    from lucene_solr_spark.index.merge import merge_score

    assert merge_score([100, 100], del_ratio=0.5) < merge_score([100, 100], 0.0)


def test_plan_merges_prefers_delete_rich_window():
    from lucene_solr_spark.index.merge import plan_merges

    # equal sizes; two segments carry 50% tombstones — the planner must pick
    # the delete-rich window (nonDelRatio^2 reward in merge_score)
    segs = [
        {"segment_id": 0, "sum_len": 1000, "max_doc": 100, "del_count": 0},
        {"segment_id": 1, "sum_len": 1000, "max_doc": 100, "del_count": 0},
        {"segment_id": 2, "sum_len": 1000, "max_doc": 100, "del_count": 50},
        {"segment_id": 3, "sum_len": 1000, "max_doc": 100, "del_count": 50},
    ]
    plans = plan_merges(segs, segs_per_tier=2, max_merge_at_once=2, floor_size=1000)
    assert plans and set(plans[0]) == {2, 3}


def test_plan_merges_budget():
    from lucene_solr_spark.index.merge import plan_merges

    # 25 equal small segments with segs_per_tier=10 → must propose a merge
    segs = [{"segment_id": i, "sum_len": 1000} for i in range(25)]
    plans = plan_merges(segs, segs_per_tier=10, max_merge_at_once=10, floor_size=100)
    assert plans and 2 <= len(plans[0]) <= 10
    # few big segments (above floor) fit the tier budget → no merge needed
    big = [{"segment_id": i, "sum_len": 1_000_000} for i in range(3)]
    assert plan_merges(big, segs_per_tier=10, floor_size=100) == []


# ------------------------------------------------------ merge equivalence --

def test_merge_all_equals_original(spark, corpus_df, tmp_path_factory):
    from lucene_solr_spark.index.manifest import live_segments, live_stats
    from lucene_solr_spark.index.merge import merge_segments

    d = _build(spark, corpus_df, tmp_path_factory, "m1")
    before = _results_by_key(spark, d, QUERIES, k=None)
    st0 = live_stats(spark, d)
    sources = live_segments(spark, d)
    info = merge_segments(spark, d, sources)
    assert info["max_doc"] == st0["max_doc"]
    st1 = live_stats(spark, d)
    assert st1["segments"] == 1
    assert st1["doc_count"] == st0["doc_count"]
    assert st1["sum_total_term_freq"] == st0["sum_total_term_freq"]
    after = _results_by_key(spark, d, QUERIES, k=None)
    assert before == after


def test_merge_hot_sharded_equals_original(spark, corpus_df, tmp_path_factory):
    """hot_df_threshold=0 → every term takes the salted (sharded) path."""
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    d = _build(spark, corpus_df, tmp_path_factory, "m2")
    before = _results_by_key(spark, d, QUERIES, k=None)
    new_seg = merge_segments(spark, d, live_segments(spark, d), hot_df_threshold=0)
    # sharded rows actually exist
    n_shards = (
        spark.read.parquet(os.path.join(d, "index"))
        .filter((F.col("kind") == 0) & (F.col("segment_id") == new_seg["segment_id"]))
        .filter(F.col("shard") > 0)
        .count()
    )
    assert n_shards > 0
    assert _results_by_key(spark, d, QUERIES, k=None) == before


def test_partial_merge_then_topk(spark, corpus_df, tmp_path_factory):
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    d = _build(spark, corpus_df, tmp_path_factory, "m3")
    before = _results_by_key(spark, d, QUERIES, k=10)
    live = live_segments(spark, d)
    merge_segments(spark, d, live[:3])
    mid = _results_by_key(spark, d, QUERIES, k=10)
    # NOTE: top-k tie-break is (score, segment_id, doc_id) — doc coordinates
    # change under merge, so only compare the score multiset per query here.
    assert [r[0] for r in before] == [r[0] for r in mid]
    assert sorted((r[0], r[4]) for r in before) == sorted((r[0], r[4]) for r in mid)
    # full-result equality is coordinate-free and must hold exactly
    assert _results_by_key(spark, d, QUERIES, k=None) == _results_by_key(
        spark, d, QUERIES, k=None
    )


def test_merge_of_merged(spark, corpus_df, tmp_path_factory):
    """Merging a previously-merged (sharded) segment with fresh ones."""
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    d = _build(spark, corpus_df, tmp_path_factory, "m4")
    before = _results_by_key(spark, d, QUERIES, k=None)
    live = live_segments(spark, d)
    merge_segments(spark, d, live[:3], hot_df_threshold=0)  # sharded intermediate
    merge_segments(spark, d, live_segments(spark, d))  # merge shards + rest
    assert len(live_segments(spark, d)) == 1
    assert _results_by_key(spark, d, QUERIES, k=None) == before


# --------------------------------------------------------------- deletes ---

def test_delete_hides_docs(spark, corpus_df, tmp_path_factory):
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index.merge import delete_docs

    d = _build(spark, corpus_df, tmp_path_factory, "del1")
    docs = spark.read.parquet(os.path.join(d, "docs"))
    before = _results_by_key(spark, d, ["parse"], k=None)
    assert before
    victims = {(r[1], r[2], r[3]) for r in before[: max(3, len(before) // 3)]}
    victim_df = docs.filter(
        F.concat_ws("\x00", "repo", "path", "commit").isin(
            ["\x00".join(v) for v in victims]
        )
    )
    n = delete_docs(spark, d, victim_df)
    assert n == victim_df.count()
    after = _results_by_key(spark, d, ["parse"], k=None)
    after_keys = {(r[1], r[2], r[3]) for r in after}
    assert not (after_keys & victims)
    # surviving docs keep their scores (stats unchanged until compaction,
    # exactly the reference's deleted-docs-still-count-in-df behavior)
    surviving = [r for r in before if (r[1], r[2], r[3]) not in victims]
    assert after == sorted(surviving)


def test_phrase_and_pruned_term_respect_deletes(spark, corpus_df, tmp_path_factory):
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index.merge import delete_docs

    d = _build(spark, corpus_df, tmp_path_factory, "del2")
    qs = ["buffer", '"index writer"', "+merge -segment"]
    before = _results_by_key(spark, d, qs, k=10)
    victims = {(r[1], r[2], r[3]) for r in before}
    docs = spark.read.parquet(os.path.join(d, "docs"))
    delete_docs(
        spark,
        d,
        docs.filter(
            F.concat_ws("\x00", "repo", "path", "commit").isin(
                ["\x00".join(v) for v in victims]
            )
        ),
    )
    after = _results_by_key(spark, d, qs, k=10)
    assert not ({(r[1], r[2], r[3]) for r in after} & victims)


def test_compacting_merge_equals_rebuild(spark, corpus_df, tmp_path_factory):
    """After merge-with-deletes, results == index rebuilt without the deleted
    docs — df, doc_count, sum_len, avgdl all shift, so this checks the full
    stats pipeline (DocIDMerger + SegmentMerger + stats rebuild)."""
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments, live_stats
    from lucene_solr_spark.index.merge import delete_docs, merge_segments

    d = _build(spark, corpus_df, tmp_path_factory, "del3")
    docs = spark.read.parquet(os.path.join(d, "docs"))
    victim_df = docs.filter(F.col("doc_id") % 5 == 1)
    victim_keys = [
        (r.repo, r.path, r.commit)
        for r in victim_df.select("repo", "path", "commit").collect()
    ]
    assert victim_keys
    delete_docs(spark, d, victim_df)
    merge_segments(spark, d, live_segments(spark, d))

    # rebuild from scratch without the victims
    d2 = str(tmp_path_factory.mktemp("merge") / "del3_rebuild")
    keep = corpus_df.join(
        corpus_df.sparkSession.createDataFrame(
            victim_keys, "repo string, path string, commit string"
        ),
        ["repo", "path", "commit"],
        "left_anti",
    )
    build_index(spark, keep, d2, num_segments=6, analyzer="code")

    st1, st2 = live_stats(spark, d), live_stats(spark, d2)
    assert st1["doc_count"] == st2["doc_count"]
    assert st1["sum_total_term_freq"] == st2["sum_total_term_freq"]
    assert st1["max_doc"] == st2["max_doc"]

    r1 = _results_by_key(spark, d, QUERIES, k=None)
    r2 = _results_by_key(spark, d2, QUERIES, k=None)
    assert r1 == r2


def test_resume_after_merge_skips_all(spark, corpus_df, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    d = _build(spark, corpus_df, tmp_path_factory, "res1")
    merge_segments(spark, d, live_segments(spark, d)[:2])
    before = _results_by_key(spark, d, QUERIES, k=None)
    metrics = build_index(
        spark, corpus_df, d, num_segments=6, analyzer="code", resume=True
    )
    # done-set = 6 gen-0 segments + the merged segment's manifest entry
    assert metrics["skipped_segments"] == 7
    assert _results_by_key(spark, d, QUERIES, k=None) == before


def test_run_merges_converges(spark, corpus_df, tmp_path_factory):
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import run_merges

    d = _build(spark, corpus_df, tmp_path_factory, "loop1", num_segments=12)
    before = _results_by_key(spark, d, QUERIES, k=None)
    # floor above every segment size → tier budget = segs_per_tier → merges
    results = run_merges(
        spark, d, segs_per_tier=2, max_merge_at_once=4, floor_size=100_000
    )
    assert results  # at least one merge happened
    assert len(live_segments(spark, d)) < 12
    assert _results_by_key(spark, d, QUERIES, k=None) == before


def test_build_with_auto_merge(spark, corpus_df, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments

    d = str(tmp_path_factory.mktemp("merge") / "am")
    m = build_index(
        spark, corpus_df, d, num_segments=12, analyzer="code",
        auto_merge=True,
        merge_policy={"segs_per_tier": 2, "max_merge_at_once": 4, "floor_size": 100_000},
    )
    assert m["merges"] >= 1
    assert len(live_segments(spark, d)) < 12
    assert m["max_doc"] == corpus_df.count()


def test_snapshot_isolation_across_merge(spark, corpus_df, tmp_path_factory):
    """A searcher opened before a merge keeps serving its commit point
    (point-in-time reader, DirectoryReader semantics): old segment rows are
    immutable and stay on disk after the merge flips the live set."""
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments
    from lucene_solr_spark.search import IndexSearcher

    d = _build(spark, corpus_df, tmp_path_factory, "snap1")
    old_reader = IndexSearcher(spark, d, analyzer="code")
    before = {
        (r.segment_id, r.doc_id): float(np.float32(r.score))
        for r in old_reader.search("parse", k=None).collect()
    }
    merge_segments(spark, d, live_segments(spark, d))
    # old reader: same snapshot, identical results from the dead segments
    after_old = {
        (r.segment_id, r.doc_id): float(np.float32(r.score))
        for r in old_reader.search("parse", k=None).collect()
    }
    assert after_old == before
    # a fresh reader sees the merged commit point with equal scores
    new_reader = IndexSearcher(spark, d, analyzer="code")
    assert sorted(before.values()) == sorted(
        float(np.float32(r.score)) for r in new_reader.search("parse", k=None).collect()
    )
