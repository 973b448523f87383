"""Solr atomic updates — fetch-merge-reindex against the RealTimeGet view
(``AtomicUpdateDocumentMerger.java:100-146``; delete + re-add =
``IndexWriter.java:1276``). Covers all six ops, the id-field guard, the
upsert path, and that search sees the merged document (and not the stale
one) after the commit."""

import os

import pytest
import pyspark.sql.functions as F

from lucene_solr_spark.index import build_index
from lucene_solr_spark.index.atomic import atomic_update
from lucene_solr_spark.index.read import realtime_get
from lucene_solr_spark.search import IndexSearcher


def _docs(spark):
    rows = [
        ("r1", "a.py", "c1", "parse the buffer quickly", 3, ["alpha", "beta", "beta"]),
        ("r1", "b.py", "c1", "write the index segment", 7, ["gamma"]),
        ("r2", "c.py", "c1", "merge segments on flush", 1, []),
    ]
    return spark.createDataFrame(
        rows,
        "repo string, path string, commit string, content string, "
        "views int, tags array<string>",
    )


@pytest.fixture(scope="module")
def idx(spark, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("atomic") / "idx")
    build_index(
        spark, _docs(spark), d, num_segments=2, stored_cols=("views", "tags")
    )
    return d


def _get(spark, idx_dir, repo, path):
    keys = spark.createDataFrame(
        [(repo, path, "c1")], "repo string, path string, commit string"
    )
    return realtime_get(
        spark, idx_dir, keys, key_cols=("repo", "path", "commit")
    ).collect()[0]


def test_set_inc_add_ops_and_search(spark, idx):
    updates = spark.createDataFrame(
        [("r1", "a.py", "c1", "zebra quantum content", 5, ["delta"])],
        "repo string, path string, commit string, content string, "
        "views int, tags array<string>",
    )
    res = atomic_update(
        spark, idx, updates, ops={"views": "inc", "tags": "add"}
    )
    assert res["updated"] == 1 and res["created"] == 0
    row = _get(spark, idx, "r1", "a.py")
    assert row["content"] == "zebra quantum content"  # plain field = set
    assert row["views"] == 8  # 3 + 5
    assert list(row["tags"]) == ["alpha", "beta", "beta", "delta"]
    # search sees the NEW content and not the stale document
    s = IndexSearcher(spark, idx)
    hits = s.fetch(s.search("zebra AND quantum", k=5), cols=["repo", "path"])
    got = [(r["repo"], r["path"]) for r in hits.collect()]
    assert ("r1", "a.py") in got
    assert s.search("parse AND buffer AND quickly", k=5).count() == 0


def test_add_distinct_remove_removeregex(spark, idx):
    updates = spark.createDataFrame(
        [("r1", "b.py", "c1", ["gamma", "zeta", "zeta"])],
        "repo string, path string, commit string, tags array<string>",
    )
    atomic_update(spark, idx, updates, ops={"tags": "add-distinct"})
    row = _get(spark, idx, "r1", "b.py")
    # gamma already present; zeta added once (in-list duplicate skipped)
    assert list(row["tags"]) == ["gamma", "zeta"]

    updates = spark.createDataFrame(
        [("r1", "b.py", "c1", ["gamma"])],
        "repo string, path string, commit string, tags array<string>",
    )
    atomic_update(spark, idx, updates, ops={"tags": "remove"})
    assert list(_get(spark, idx, "r1", "b.py")["tags"]) == ["zeta"]

    updates = spark.createDataFrame(
        [("r1", "b.py", "c1", "z.*")],
        "repo string, path string, commit string, tags string",
    )
    atomic_update(spark, idx, updates, ops={"tags": "removeregex"})
    assert list(_get(spark, idx, "r1", "b.py")["tags"]) == []


def test_remove_keeps_duplicates_of_other_values(spark, idx):
    updates = spark.createDataFrame(
        [("r1", "a.py", "c1", ["beta"])],
        "repo string, path string, commit string, tags array<string>",
    )
    atomic_update(spark, idx, updates, ops={"tags": "remove"})
    row = _get(spark, idx, "r1", "a.py")
    # removes ALL occurrences of beta; keeps order of the rest
    assert "beta" not in list(row["tags"])
    assert list(row["tags"])[0] == "alpha"


def test_upsert_creates_missing_doc(spark, idx):
    updates = spark.createDataFrame(
        [("r9", "new.py", "c1", "fresh upsert document", 2, ["new"])],
        "repo string, path string, commit string, content string, "
        "views int, tags array<string>",
    )
    res = atomic_update(spark, idx, updates, ops={"views": "inc", "tags": "add"})
    assert res["updated"] == 0 and res["created"] == 1
    row = _get(spark, idx, "r9", "new.py")
    assert row["views"] == 2  # inc over a missing doc starts at 0
    assert list(row["tags"]) == ["new"]
    s = IndexSearcher(spark, idx)
    assert s.search("fresh AND upsert", k=5).count() >= 1


def test_guards(spark, idx):
    updates = spark.createDataFrame(
        [("r1", "a.py", "c1")], "repo string, path string, commit string"
    )
    with pytest.raises(ValueError, match="id field"):
        atomic_update(spark, idx, updates, ops={"repo": "set"})
    with pytest.raises(ValueError, match="Unknown operation"):
        atomic_update(spark, idx, updates, ops={"views": "increment"})
    bad = updates.withColumn("nosuch", F.lit(1))
    with pytest.raises(ValueError, match="not stored"):
        atomic_update(spark, idx, bad)
    scalar = updates.withColumn("views", F.lit(1))
    with pytest.raises(ValueError, match="array field"):
        atomic_update(spark, idx, scalar, ops={"views": "add"})


def test_duplicate_keys_in_one_batch_rejected(spark, idx):
    updates = spark.createDataFrame(
        [("r1", "a.py", "c1", 1), ("r1", "a.py", "c1", 2)],
        "repo string, path string, commit string, views int",
    )
    with pytest.raises(ValueError, match="ONE row per key"):
        atomic_update(spark, idx, updates, ops={"views": "inc"})


def test_crash_replay_converges_for_search(spark, tmp_path, monkeypatch):
    """A crash between the replacement commit and the tombstone append
    leaves BOTH versions live; a replayed update must tombstone the stale
    original too (victims = ALL live rows for the keys, not the deduped
    RealTimeGet view), so search converges to one row per key."""
    from lucene_solr_spark.index import merge as merge_mod

    d = str(tmp_path / "idx")
    build_index(
        spark, _docs(spark), d, num_segments=2, stored_cols=("views", "tags")
    )
    updates = spark.createDataFrame(
        [("r1", "a.py", "c1", "parse the buffer slowly", 4)],
        "repo string, path string, commit string, content string, views int",
    )
    real_delete = merge_mod.delete_docs

    def crash(*a, **k):
        raise RuntimeError("simulated crash before tombstone append")

    monkeypatch.setattr(merge_mod, "delete_docs", crash)
    with pytest.raises(RuntimeError, match="simulated crash"):
        atomic_update(spark, d, updates, ops={"views": "inc"})
    monkeypatch.setattr(merge_mod, "delete_docs", real_delete)

    # crash window: both versions are live (the failure mode under test)
    keys = updates.select("repo", "path", "commit")
    live = realtime_get(
        spark, d, keys, key_cols=("repo", "path", "commit"), all_versions=True
    )
    assert live.count() == 2

    # replay the SAME update — must sweep the stale original as well
    res = atomic_update(spark, d, updates, ops={"views": "inc"})
    assert res["updated"] == 2  # crashed replacement + stale original
    assert res["created"] == 0  # the key existed; nothing new created
    live2 = realtime_get(
        spark, d, keys, key_cols=("repo", "path", "commit"), all_versions=True
    )
    assert live2.count() == 1
    row = _get(spark, d, "r1", "a.py")
    # replayed inc applies over the crashed replacement (newest wins): 3+4+4
    assert row["views"] == 11
    # search sees exactly one live document for the key's content
    s = IndexSearcher(spark, d)
    hits = s.fetch(s.search("parse AND buffer", k=10), cols=["repo", "path"])
    assert [(r["repo"], r["path"]) for r in hits.collect()] == [("r1", "a.py")]
