"""NGramTokenizer chain + NGramPhraseQuery rewrite
(analysis/ngram/NGramTokenizer.java:58, search/NGramPhraseQuery.java:34-79):
a phrase over consecutive fixed-size grams is rewritten to every n-th gram
plus the last — identical match set, ~1/n the posting work.
"""

import pytest

from lucene_solr_spark.analysis import ANALYZERS
from lucene_solr_spark.search.query import PhraseQuery, parse_query


def test_ngram_emission_and_positions():
    terms, pos = ANALYZERS["ngram3"]("Hello")
    assert terms == ["hel", "ell", "llo"]
    assert pos == [0, 1, 2]


def test_ngram_run_boundaries_gap_positions():
    # n+1 position gap between runs keeps the every-nth rewrite exact
    # (a kept-gram pair can never straddle a boundary at stride <= n)
    terms, pos = ANALYZERS["ngram3"]("foo-bar baz")
    assert terms == ["foo", "bar", "baz"]
    assert pos == [0, 4, 8]


def test_short_runs_emit_nothing():
    assert ANALYZERS["ngram3"]("ab x yz") == ([], [])


def test_phrase_rewrite_keeps_every_nth_plus_last():
    q = parse_query('"abcdefg"', "ngram3")
    # grams abc bcd cde def efg @0-4 -> keep 0, 3, last(4)
    assert isinstance(q, PhraseQuery)
    assert q.phrase_terms == ("abc", "def", "efg")
    assert q.positions == (0, 3, 4)


def test_phrase_rewrite_skips_when_nothing_to_drop():
    q = parse_query('"abcd"', "ngram3")  # 2 grams: no rewrite possible
    assert q.phrase_terms == ("abc", "bcd")
    assert q.positions == (0, 1)


def test_rewrite_only_for_ngram_chains():
    q = parse_query('"read the file into a buffer"', "code")
    # stops dropped with gaps; no every-nth dropping outside ngram chains
    assert q.phrase_terms == ("read", "file", "buffer")
    assert q.positions == (0, 2, 5)


@pytest.fixture(scope="module")
def ngram_index(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    index_dir = str(tmp_path_factory.mktemp("idx") / "ngram3")
    docs = spark.createDataFrame(tiny_corpus.head(100))
    build_index(spark, docs, index_dir, num_segments=2, analyzer="ngram3")
    return index_dir


def test_rewritten_phrase_matches_full_phrase(spark, ngram_index):
    """The optimized query returns exactly the docs of the exhaustive
    all-grams phrase (TestNGramPhraseQuery-style equivalence)."""
    from lucene_solr_spark.analysis import ANALYZERS
    from lucene_solr_spark.search import IndexSearcher

    searcher = IndexSearcher(spark, ngram_index, analyzer="ngram3")
    words = ["parse", "buffer", "segment", "stream", "zzzzzz"]
    full, rewritten = {}, {}
    for qid, w in enumerate(words):
        grams, pos = ANALYZERS["ngram3"](w)
        full[qid] = PhraseQuery(tuple(grams), tuple(pos))
        rewritten[qid] = parse_query(f'"{w}"', "ngram3")
        if len(grams) > 3:
            assert len(rewritten[qid].phrase_terms) < len(grams), w
    docs_full = {
        (r.qid, r.segment_id, r.doc_id)
        for r in searcher.search_many(full, k=None, scoring=False).collect()
    }
    docs_rew = {
        (r.qid, r.segment_id, r.doc_id)
        for r in searcher.search_many(rewritten, k=None, scoring=False).collect()
    }
    assert docs_full == docs_rew
    assert any(q == 0 for q, _, _ in docs_full)  # 'parse' does occur


def test_rewrite_equivalence_property():
    """Random lowercase corpora + random query substrings: the rewritten
    phrase matches exactly the docs of the all-grams phrase (kernel-level,
    no Spark) — TestNGramPhraseQuery.testRewrite-style property."""
    import numpy as np

    from lucene_solr_spark.index.build import (
        KIND_NORMS,
        KIND_POSTING,
        build_segment_frame,
    )
    from lucene_solr_spark.search.bm25 import idf, norm_cache, term_weight
    from lucene_solr_spark.search.kernels import QueryContext, SegmentPostings, eval_query

    rng = np.random.RandomState(31)
    letters = list("abcd")
    docs = [
        "".join(rng.choice(letters, size=rng.randint(3, 12)))
        + " "
        + "".join(rng.choice(letters, size=rng.randint(3, 12)))
        for _ in range(80)
    ]
    frame = build_segment_frame(docs, np.arange(len(docs)), 0, "ngram3")
    norms = np.frombuffer(
        frame[frame["kind"] == KIND_NORMS]["doc_blob"].iloc[0], np.uint8
    )
    posts = frame[frame["kind"] == KIND_POSTING]
    rows = {r["term"]: [r] for r in posts.to_dict("records")}
    seg = SegmentPostings(rows, norms, len(docs))
    dfs = dict(zip(posts["term"], posts["df"]))
    weights = {
        t: float(term_weight(idf(np.array([d]), len(docs))[0])) for t, d in dfs.items()
    }
    sum_len = int(frame[frame["kind"] == KIND_NORMS]["sum_len"].iloc[0])
    ctx = QueryContext(weights, norm_cache(sum_len / len(docs)), f32=True)
    checked = 0
    for _ in range(40):
        src = docs[rng.randint(len(docs))].split()[rng.randint(2)]
        if len(src) < 5:
            continue
        i = rng.randint(len(src) - 4)
        word = src[i : i + rng.randint(5, min(9, len(src) - i + 1))]
        grams, pos = ANALYZERS["ngram3"](word)
        if len(grams) < 3:
            continue
        full = PhraseQuery(tuple(grams), tuple(pos))
        rewritten = parse_query(f'"{word}"', "ngram3")
        d_full, _ = eval_query(full, seg, ctx, scoring=False)
        d_rew, _ = eval_query(rewritten, seg, ctx, scoring=False)
        assert list(d_full) == list(d_rew), (word, grams)
        checked += 1
    assert checked >= 10
