"""End-to-end parity: Spark engine vs pure-Python oracle, rank-identical.

The reference's equivalence-oracle strategy (SURVEY §5.3:
SearchEquivalenceTestBase, TestWANDScorer.testRandom): the engine's
compressed/distributed/pruned path must produce the exact (segment_id,
doc_id) ranking and float32 scores of the brute-force oracle on the
reference-style query set (term, boolean AND/OR/NOT/minShouldMatch, phrase —
modeled on lucene/benchmark/conf/query-terms.txt / query-phrases.txt).
"""

import numpy as np
import pytest

from lucene_solr_spark.search.query import BooleanQuery, TermQuery, parse_query

# reference-style query set over the corpus vocabulary (FIXTURES.md §2)
QUERY_SET = [
    "parse",
    "buffer",
    "sd",
    "parse AND http",
    "read AND file",
    "buffer OR stream OR channel",
    "index OR writer",
    "+merge -segment",
    "+cache +query -lock",
    '"read file async"',  # no match in tiny corpus (empty-result parity)
    '"index writer"',  # adjacent-position phrase, many matches
    '"merge the segments"',  # stopword gap inside the phrase, many matches
    '"read the file into a buffer"',  # multiple stopword gaps
    '"index writer"~1',  # sloppy phrase, small slack
    '"writer index"~2',  # transposed order — needs slop ≥ 2 to match
    '"merge the segments"~1',  # sloppy with a stopword gap (rel positions 0,2)
    '"parse http"~3',
    "nonexistentterm",
    "parse AND nonexistentterm",
    "nonexistentterm OR buffer",
]


def run_engine(spark, index_dir, queries, k=10):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code")
    res = s.search_many({i: q for i, q in enumerate(queries)}, k=k)
    rows = res.collect()
    out = {i: [] for i in range(len(queries))}
    for r in rows:
        out[r.qid].append((r.rank, r.segment_id, r.doc_id, r.score))
    for v in out.values():
        v.sort()
    return out


def run_oracle(oracle, queries, k=10):
    out = {}
    for i, q in enumerate(queries):
        pq = parse_query(q, "code")
        hits = oracle.search(pq, k=k)
        out[i] = [(rank + 1, seg, doc, score) for rank, (seg, doc, score) in enumerate(hits)]
    return out


def test_rank_identical_tiny(spark, tiny_index, tiny_oracle):
    index_dir, metrics = tiny_index
    assert metrics["max_doc"] == 200
    eng = run_engine(spark, index_dir, QUERY_SET, k=10)
    ora = run_oracle(tiny_oracle, QUERY_SET, k=10)
    for i, q in enumerate(QUERY_SET):
        e, o = eng[i], ora[i]
        assert [(r, s, d) for r, s, d, _ in e] == [(r, s, d) for r, s, d, _ in o], (
            f"rank mismatch on query {q!r}:\nengine {e}\noracle {o}"
        )
        for (_, _, _, es), (_, _, _, osc) in zip(e, o):
            assert es == pytest.approx(osc, abs=1e-5), f"score mismatch on {q!r}"


def test_scores_exact_f32(spark, tiny_index, tiny_oracle):
    """Bit-exact float32 parity on term queries (TestBM25Similarity-style)."""
    index_dir, _ = tiny_index
    eng = run_engine(spark, index_dir, ["parse", "read AND file"], k=10)
    ora = run_oracle(tiny_oracle, ["parse", "read AND file"], k=10)
    for i in eng:
        es = np.array([h[3] for h in eng[i]], dtype=np.float32)
        osc = np.array([h[3] for h in ora[i]], dtype=np.float32)
        assert (es == osc).all(), (es, osc)


def test_partitioning_invariance(spark, tiny_corpus, tmp_path):
    """2 vs 8 segments -> identical global top-k modulo (seg,doc) coords.

    The partition-count invariance property (SURVEY §5): global BM25 stats
    make scores segmentation-independent; ranks must agree on doc *identity*
    (resolved via the docs table back to the key).
    """
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    results = {}
    for nseg in (2, 8):
        d = str(tmp_path / f"idx{nseg}")
        docs = spark.createDataFrame(tiny_corpus)
        build_index(spark, docs, d, num_segments=nseg, analyzer="code")
        s = IndexSearcher(spark, d, analyzer="code")
        hits = s.search_many({i: q for i, q in enumerate(QUERY_SET)}, k=10)
        fetched = s.fetch(hits, cols=["path", "commit"]).collect()
        res = {}
        for r in fetched:
            res.setdefault(r.qid, []).append((r.rank, r.commit, round(float(r.score), 5)))
        for v in res.values():
            v.sort()
        results[nseg] = res
    for qid in results[2]:
        a, b = results[2][qid], results[8].get(qid, [])
        # scores are segmentation-independent (global stats) — always equal
        assert [(r, s) for r, _, s in a] == [(r, s) for r, _, s in b], f"qid {qid}"
        # doc identity must agree wherever the score is untied (tie-break is
        # (segment, doc) order, which legitimately depends on layout — same
        # as Lucene's docID-order tie-break depending on index geometry)
        from collections import Counter

        score_counts = Counter(s for _, _, s in a)
        for (_, ca, sa), (_, cb, _sb) in zip(a, b):
            if score_counts[sa] == 1:
                assert ca == cb, f"qid {qid} untied doc mismatch"


def test_wand_pruning_equals_exhaustive(spark, tiny_index):
    """TestWANDScorer.testRandom analogue: pruned term top-k == exhaustive."""
    import pandas as pd
    from lucene_solr_spark.search.executor import IndexSearcher
    from lucene_solr_spark.search.kernels import (
        QueryContext,
        SegmentPostings,
        eval_query,
        topk,
        topk_term_pruned,
    )
    import pyspark.sql.functions as F
    import os

    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir, analyzer="code")
    idx = spark.read.parquet(os.path.join(index_dir, "index"))
    terms = ["parse", "http", "buffer", "sd", "500", "cache"]
    weights = s.weights_for(set(terms))
    post = idx.filter(F.col("kind") == 0).filter(F.col("term").isin(terms)).toPandas()
    normsdf = idx.filter(F.col("kind") == 1).select("segment_id", "doc_blob", "max_doc").toPandas()
    for seg_id in normsdf.segment_id.unique():
        rows = {
            r["term"]: [r]
            for _, r in post[post.segment_id == seg_id].iterrows()
        }
        nb = normsdf[normsdf.segment_id == seg_id]
        seg = SegmentPostings(rows, np.frombuffer(nb.doc_blob.iloc[0], np.uint8), int(nb.max_doc.iloc[0]))
        ctx = QueryContext(weights, s.cache)
        for t in terms:
            if t not in rows:
                continue
            for k in (1, 3, 10, 100):
                d1, s1 = topk_term_pruned(t, seg, ctx, k)
                docs, scores = eval_query(TermQuery(t), seg, ctx)
                d2, s2 = topk(docs, scores, k)
                assert (d1 == d2).all() and (s1 == s2).all(), (t, k, seg_id)
