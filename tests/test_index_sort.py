"""Index sorting (``IndexWriterConfig.setIndexSort``, ``index/Sorter.java``)
and sorted-search early termination (``TopFieldCollector.java:52-76``
canEarlyTerminate): docs are sorted by a field within every segment at build
time, so a top-k by that field collects k docs per segment and stops —
term queries stop DECODING after ceil(k/128) posting blocks."""

import numpy as np
import pytest

from lucene_solr_spark.corpus import synth_corpus_local
from lucene_solr_spark.index.build import KIND_NORMS, KIND_POSTING, build_segment_frame
from lucene_solr_spark.search.kernels import (
    QueryContext,
    SegmentPostings,
    first_k_matches,
)
from lucene_solr_spark.search.query import MatchAllQuery, TermQuery


@pytest.fixture(scope="module")
def sorted_index(spark, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    corpus = synth_corpus_local(300)
    rows = [
        (r.repo, r.path, r.commit, r.content, float((i * 37) % 100) + 0.5)
        for i, r in enumerate(corpus.itertuples())
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string, price double"
    )
    d = str(tmp_path_factory.mktemp("sorted") / "idx")
    build_index(spark, docs, d, num_segments=4, analyzer="code", index_sort="price")
    return d


def test_docs_sorted_within_segment(spark, sorted_index):
    docs = spark.read.parquet(sorted_index + "/docs").collect()
    by_seg = {}
    for r in docs:
        by_seg.setdefault(r.segment_id, []).append((r.doc_id, r.price))
    for seg, rows in by_seg.items():
        rows.sort()
        prices = [p for _, p in rows]
        assert prices == sorted(prices), f"segment {seg} not in index-sort order"


def test_index_sort_field_from_manifest(spark, sorted_index):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sorted_index, analyzer="code")
    assert s.index_sort_field() == "price"


def _oracle_sorted(spark, s, index_dir, query, k, ascending):
    """Exhaustive reference: ALL matches joined to the field, full sort."""
    import pyspark.sql.functions as F

    matches = s.search_many({0: query}, k=None, scoring=False).select(
        "segment_id", "doc_id"
    )
    docs = spark.read.parquet(index_dir + "/docs").select(
        "segment_id", "doc_id", "price"
    )
    rows = matches.join(docs, ["segment_id", "doc_id"]).collect()
    key = lambda r: (r.price if ascending else -r.price, r.segment_id, r.doc_id)
    return [
        (r.segment_id, r.doc_id, r.price) for r in sorted(rows, key=key)[:k]
    ]


@pytest.mark.parametrize("ascending", [True, False])
@pytest.mark.parametrize("query", ["parse", "*:*", "parse AND http"])
def test_search_sorted_matches_exhaustive(spark, sorted_index, query, ascending):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sorted_index, analyzer="code")
    got = [
        (r.segment_id, r.doc_id, r.price)
        for r in s.search_sorted(query, k=7, ascending=ascending).collect()
    ]
    exp = _oracle_sorted(spark, s, sorted_index, query, 7, ascending)
    assert got == exp, (query, ascending)


def test_search_sorted_requires_index_sort(spark, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    corpus = synth_corpus_local(50)
    docs = spark.createDataFrame(
        corpus[["repo", "path", "commit", "content"]],
    )
    d = str(tmp_path_factory.mktemp("unsorted") / "idx")
    build_index(spark, docs, d, num_segments=2, analyzer="code")
    s = IndexSearcher(spark, d, analyzer="code")
    with pytest.raises(ValueError, match="index_sort"):
        s.search_sorted("parse", k=5)


# ---------------------------------------------------------- kernel level ----
@pytest.fixture(scope="module")
def seg_parts():
    corpus = synth_corpus_local(600)
    content = corpus["content"].tolist()
    frame = build_segment_frame(content, np.arange(len(content)), 0, "code")
    norms = np.frombuffer(
        frame[frame["kind"] == KIND_NORMS]["doc_blob"].iloc[0], np.uint8
    )
    posts = frame[frame["kind"] == KIND_POSTING]
    rows = {r["term"]: [r] for r in posts.to_dict("records")}
    dfs = dict(zip(posts["term"], posts["df"]))
    return rows, norms, len(content), max(dfs, key=dfs.get)


@pytest.fixture
def seg_and_ctx(seg_parts):
    # fresh SegmentPostings per test: docs_freqs caches raw decodes in
    # seg._raw, which would mask the early-termination path across tests
    rows, norms, max_doc, hot = seg_parts
    seg = SegmentPostings(rows, norms, max_doc)
    ctx = QueryContext({}, np.ones(256), f32=True)
    return seg, ctx, hot


def test_first_k_equals_head_of_full_matches(seg_and_ctx):
    seg, ctx, hot = seg_and_ctx
    full, _ = seg.docs_freqs(hot)
    for k in (1, 5, 128, 200):
        got = first_k_matches(TermQuery(hot), seg, ctx, k)
        assert np.array_equal(got, full[:k])
        got_r = first_k_matches(TermQuery(hot), seg, ctx, k, reverse=True)
        assert np.array_equal(got_r, full[len(full) - min(k, len(full)):])


def test_first_k_decodes_only_needed_blocks(seg_and_ctx):
    """The early-termination contract: k=5 on a multi-block posting list
    must decode ONE block, not the whole list."""
    seg, ctx, hot = seg_and_ctx
    bi = seg.block_meta(hot)
    assert len(bi["lens"]) >= 2, "need a multi-block term for this test"
    decoded = []
    orig = seg.decode_block_subset

    def spy(term, sel):
        decoded.append(np.asarray(sel))
        return orig(term, sel)

    seg.decode_block_subset = spy
    try:
        first_k_matches(TermQuery(hot), seg, ctx, 5)
    finally:
        seg.decode_block_subset = orig
    assert len(decoded) == 1 and len(decoded[0]) == 1


def test_first_k_matchall_needs_no_postings(seg_and_ctx):
    seg, ctx, _ = seg_and_ctx
    got = first_k_matches(MatchAllQuery(), seg, ctx, 9)
    assert np.array_equal(got, np.arange(9))
    got_r = first_k_matches(MatchAllQuery(), seg, ctx, 9, reverse=True)
    assert np.array_equal(got_r, np.arange(seg.max_doc - 9, seg.max_doc))


def test_search_by_field_equals_search_sorted_on_sorted_index(spark, sorted_index):
    """The general (no-early-termination) field sort and the early-terminated
    index-sort path must produce identical results when both apply."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sorted_index, analyzer="code")
    for asc in (True, False):
        a = [
            (r.segment_id, r.doc_id, r.price)
            for r in s.search_sorted("parse", k=6, ascending=asc).collect()
        ]
        b = [
            (r.segment_id, r.doc_id, r.price)
            for r in s.search_by_field("parse", "price", k=6, ascending=asc).collect()
        ]
        assert a == b, asc


def test_check_index_verifies_index_sort(spark, sorted_index):
    """CheckIndex.testSort analogue: a sorted index passes, and the check
    key is present exactly when a sort is declared."""
    from lucene_solr_spark.check import check_index

    out = check_index(spark, sorted_index)
    assert out["bad_index_sort"] == 0
    assert all(v == 0 for k, v in out.items() if k.startswith("bad_"))


# ------------------------------------------------------- sorted merges ----
# SortingMergePolicy role: merging sorted segments preserves the sort via
# docmaps (MergeState docmaps feeding DocIDMerger sorted mode,
# index/DocIDMerger.java:49-90) so early termination survives compaction.

def _sorted_docs_df(spark, n, price_of):
    corpus = synth_corpus_local(n)
    rows = [
        (r.repo, r.path, r.commit, r.content, price_of(i))
        for i, r in enumerate(corpus.itertuples())
    ]
    return spark.createDataFrame(
        rows, "repo string, path string, commit string, content string, price double"
    )


def _postings_key(spark, index_dir, live):
    """(term, doc_id, pos) + norms of the LIVE segments, segment-id-agnostic
    — the full observable state of a single-live-segment index."""
    from lucene_solr_spark.index.read import norms_table, positions_postings

    live = set(live)
    pos = sorted(
        (r.term, r.doc_id, r.pos)
        for r in positions_postings(spark, index_dir).collect()
        if r.segment_id in live
    )
    norms = sorted(
        (r.doc_id, r.norm_byte)
        for r in norms_table(spark, index_dir).collect()
        if r.segment_id in live
    )
    return pos, norms


def test_sorted_merge_preserves_index_sort(spark, tmp_path_factory):
    from lucene_solr_spark.check import check_index
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import delete_docs, merge_segments
    from lucene_solr_spark.search import IndexSearcher

    docs = _sorted_docs_df(spark, 150, lambda i: float((i * 13) % 50) + 0.25)
    d = str(tmp_path_factory.mktemp("sortmerge") / "idx")
    build_index(spark, docs, d, num_segments=3, analyzer="code", index_sort="price")
    s = IndexSearcher(spark, d, analyzer="code")
    assert s.index_sort_field() == "price"
    # tombstone a slice so the merge also compacts deletes through the docmap
    victims = (
        spark.read.parquet(d + "/docs")
        .select("segment_id", "doc_id")
        .limit(12)
    )
    delete_docs(spark, d, victims)
    out = merge_segments(spark, d, live_segments(spark, d))
    assert out["index_sort"] == "price"

    s2 = IndexSearcher(spark, d, analyzer="code")
    assert s2.index_sort_field() == "price"
    for query in ("parse", "*:*", "parse AND http"):
        for asc in (True, False):
            got = [
                (r.segment_id, r.doc_id, r.price)
                for r in s2.search_sorted(query, k=7, ascending=asc).collect()
            ]
            assert got == _oracle_sorted(spark, s2, d, query, 7, asc), (query, asc)
    # CheckIndex.testSort analogue passes on the merged segment
    out = check_index(spark, d)
    assert all(v == 0 for k, v in out.items() if k.startswith("bad_"))


@pytest.mark.parametrize("hot_df_threshold", [1_000_000, 40])
def test_sorted_merge_equals_sorted_rebuild(spark, tmp_path_factory, hot_df_threshold):
    """Gold contract: merge-then-read ≡ rebuild-sorted-from-scratch, down to
    every posting, position and norm byte (unique sort keys so the order is
    fully determined). hot_df_threshold=40 forces the salted shard path."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    docs = _sorted_docs_df(spark, 120, lambda i: float(i) + 0.5)
    d1 = str(tmp_path_factory.mktemp("sm_merge") / "idx")
    build_index(spark, docs, d1, num_segments=3, analyzer="code", index_sort="price")
    merge_segments(
        spark, d1, live_segments(spark, d1), hot_df_threshold=hot_df_threshold
    )

    d2 = str(tmp_path_factory.mktemp("sm_rebuild") / "idx")
    build_index(spark, docs, d2, num_segments=1, analyzer="code", index_sort="price")

    live1 = live_segments(spark, d1)
    assert len(live1) == 1
    got_pos, got_norms = _postings_key(spark, d1, live1)
    exp_pos, exp_norms = _postings_key(spark, d2, live_segments(spark, d2))
    assert got_norms == exp_norms
    assert got_pos == exp_pos


def test_mixed_sort_merge_raises(spark, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import merge_segments

    docs = _sorted_docs_df(spark, 60, lambda i: float(i))
    d = str(tmp_path_factory.mktemp("mixed") / "idx")
    build_index(spark, docs, d, num_segments=2, analyzer="code", index_sort="price")
    build_index(
        spark,
        docs.limit(20),
        d,
        num_segments=1,
        analyzer="code",
        segment_base=50,
    )
    with pytest.raises(ValueError, match="mixed index_sort"):
        merge_segments(spark, d, live_segments(spark, d))
