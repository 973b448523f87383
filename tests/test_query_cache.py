"""LRUQueryCache role (search/LRUQueryCache.java:68): per-searcher top-k
result cache with usage-tracking admission — one-off queries never pay the
materialization; repeated queries replay locally."""

from lucene_solr_spark.search import IndexSearcher
from lucene_solr_spark.search.executor import LRUQueryResultCache


def test_admission_requires_repeat(spark, tiny_index):
    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir)
    r1 = sorted(map(tuple, s.search("parse AND http", k=5).collect()))
    assert len(s.query_cache._entries) == 0  # first sighting: not admitted
    r2 = sorted(map(tuple, s.search("parse AND http", k=5).collect()))
    assert len(s.query_cache._entries) == 1  # second sighting: materialized
    hits_before = s.query_cache.hit_count
    r3 = sorted(map(tuple, s.search("parse AND http", k=5).collect()))
    assert s.query_cache.hit_count == hits_before + 1
    assert r1 == r2 == r3

    # cached result identical to a fresh searcher's (no staleness possible:
    # the cache is scoped to this searcher's immutable snapshot)
    fresh = sorted(
        map(tuple, IndexSearcher(spark, index_dir).search("parse AND http", k=5).collect())
    )
    assert r3 == fresh


def test_distinct_k_are_distinct_entries(spark, tiny_index):
    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir)
    for _ in range(2):
        s.search("buffer", k=3).collect()
    for _ in range(2):
        s.search("buffer", k=7).collect()
    assert {k for _, k in s.query_cache._entries} == {3, 7}


def test_lru_eviction():
    c = LRUQueryResultCache(max_entries=2, min_frequency=1)
    for key in ("a", "b", "c"):
        c.put(key, key.upper())
    assert c.get("a") is None  # evicted by capacity
    assert c.get("b") == "B"
    assert c.get("c") == "C"  # access order is now (b, c)
    c.put("d", "D")  # evicts least-recently-used = b
    assert c.get("b") is None
    assert c.get("c") == "C" and c.get("d") == "D"


def test_empty_result_is_cacheable(spark, tiny_index):
    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir)
    for _ in range(3):
        assert s.search("zzzzqqqq", k=5).count() == 0
    assert s.query_cache.hit_count >= 1
