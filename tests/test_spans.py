"""SpanNearQuery: ordered/unordered proximity matching with slop, verified
against hand-computed spans and a brute-force per-doc reference."""

import numpy as np
import pytest

from lucene_solr_spark.index.build import KIND_NORMS, KIND_POSTING, build_segment_frame
from lucene_solr_spark.search.bm25 import idf, norm_cache, term_weight
from lucene_solr_spark.search.kernels import (
    QueryContext,
    SegmentPostings,
    _span_weight_ordered,
    _span_weight_unordered,
    eval_query,
)
from lucene_solr_spark.search.query import SpanNearQuery


def _seg(docs):
    frame = build_segment_frame(docs, np.arange(len(docs)), 0, "code")
    norms = np.frombuffer(
        frame[frame["kind"] == KIND_NORMS]["doc_blob"].iloc[0], np.uint8
    )
    posts = frame[frame["kind"] == KIND_POSTING]
    rows = {r["term"]: [r] for r in posts.to_dict("records")}
    seg = SegmentPostings(rows, norms, len(docs))
    doc_count = len(docs)
    sum_len = int(frame[frame["kind"] == KIND_NORMS]["sum_len"].iloc[0])
    dfs = dict(zip(posts["term"], posts["df"]))
    weights = {
        t: float(term_weight(idf(np.array([df]), doc_count)[0]))
        for t, df in dfs.items()
    }
    ctx = QueryContext(weights, norm_cache(sum_len / doc_count), f32=True)
    return seg, ctx


def test_ordered_weights():
    # "error handling" adjacent → d=0 → weight 1
    assert _span_weight_ordered([np.array([0]), np.array([1])], 0) == 1.0
    # one gap → d=1 → needs slop ≥ 1, weight 1/2
    assert _span_weight_ordered([np.array([0]), np.array([2])], 0) == 0.0
    assert _span_weight_ordered([np.array([0]), np.array([2])], 1) == 0.5
    # three clauses chained: positions 0, 2, 3 → width 3, excess 1
    assert _span_weight_ordered([np.array([0]), np.array([2]), np.array([3])], 1) == 0.5
    # order violated → no match even with big slop
    assert _span_weight_ordered([np.array([5]), np.array([1])], 10) == 0.0


def test_unordered_weights():
    # transposed pair within slop
    assert _span_weight_unordered([np.array([5]), np.array([4])], 0) == 1.0
    assert _span_weight_unordered([np.array([5]), np.array([0])], 3) == 0.0
    assert _span_weight_unordered([np.array([5]), np.array([0])], 4) == pytest.approx(0.2)


def test_span_near_end_to_end():
    docs = [
        "error handling code",          # adjacent, ordered
        "error in the handling",        # gap of 2 (stop gaps count)
        "handling the error",           # reversed
        "error but nothing else",       # missing clause
    ]
    seg, ctx = _seg(docs)
    q0 = SpanNearQuery(clauses=("error", "handling"), slop=0, in_order=True)
    d, s = eval_query(q0, seg, ctx)
    assert list(d) == [0]
    q2 = SpanNearQuery(clauses=("error", "handling"), slop=2, in_order=True)
    d, s = eval_query(q2, seg, ctx)
    assert list(d) == [0, 1]
    qu = SpanNearQuery(clauses=("error", "handling"), slop=2, in_order=False)
    d, s = eval_query(qu, seg, ctx)
    assert list(d) == [0, 1, 2]
    # scores positive and ranked: adjacency beats gap
    assert s[0] > s[1]


def test_span_matches_brute_force_random():
    rng = np.random.RandomState(17)
    vocab = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta"]
    docs = [
        " ".join(rng.choice(vocab, size=rng.randint(3, 30)))
        for _ in range(120)
    ]
    seg, ctx = _seg(docs)
    for _ in range(20):
        n = rng.randint(2, 4)
        clauses = tuple(rng.choice(["alpha", "beta", "gamma"], size=n, replace=False))
        slop = int(rng.randint(0, 4))
        in_order = bool(rng.randint(0, 2))
        q = SpanNearQuery(clauses=clauses, slop=slop, in_order=in_order)
        d, s = eval_query(q, seg, ctx)
        # brute force: recompute weights from raw token positions
        for i, text in enumerate(docs):
            toks = text.split()
            pls = [
                np.array([p for p, t in enumerate(toks) if t == c], dtype=np.int64)
                for c in clauses
            ]
            if any(len(p) == 0 for p in pls):
                assert i not in d
                continue
            w = (
                _span_weight_ordered(pls, slop)
                if in_order
                else _span_weight_unordered(pls, slop)
            )
            assert (i in d) == (w > 0), (clauses, slop, in_order, i)


# ---------------------------------------------------------------- n-term ~N --
def test_sloppy_n_hand_cases():
    from lucene_solr_spark.search.kernels import sloppy_weight_n

    # exact in-order occurrence of a 3-term phrase: matchLength 0, weight 1
    # (adjusted lists: pos_i - rel_i all equal)
    assert sloppy_weight_n([np.array([0]), np.array([0]), np.array([0])], 0) == 1.0
    # one term displaced by 2: needs slop >= 2, weight 1/3
    assert sloppy_weight_n([np.array([0]), np.array([2]), np.array([0])], 1) == 0.0
    assert sloppy_weight_n([np.array([0]), np.array([2]), np.array([0])], 2) == pytest.approx(1 / 3)
    # fully reversed 3-term phrase: adjusted spread 4 (see SloppyPhraseMatcher)
    assert sloppy_weight_n([np.array([-2]), np.array([0]), np.array([2])], 3) == 0.0
    assert sloppy_weight_n([np.array([-2]), np.array([0]), np.array([2])], 4) == pytest.approx(0.2)


def test_sloppy_n_end_to_end():
    from lucene_solr_spark.search.query import parse_query

    docs = [
        "alpha beta gamma trail",       # exact: w=1
        "alpha beta filler gamma",      # gamma displaced 1: w=1/2 at slop>=1
        "gamma beta alpha",             # reversed: spread 4
        "alpha gamma beta",             # partial scramble
        "alpha beta delta",             # missing gamma: never matches
    ]
    seg, ctx = _seg(docs)
    q0 = parse_query('"alpha beta gamma"~0')
    d, s = eval_query(q0, seg, ctx)
    assert list(d) == [0]
    q1 = parse_query('"alpha beta gamma"~1')
    d, _ = eval_query(q1, seg, ctx)
    assert list(d) == [0, 1]
    q4 = parse_query('"alpha beta gamma"~4')
    d, _ = eval_query(q4, seg, ctx)
    assert set(d) == {0, 1, 2, 3}
    # exact occurrence outranks displaced ones at the same norm-ish lengths
    d, s = eval_query(q4, seg, ctx)
    assert d[int(np.argmax(s))] == 0


def test_sloppy_n_engine_matches_oracle(spark, tiny_index, tiny_corpus):
    from lucene_solr_spark.oracle import OracleIndex
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import parse_query

    index_dir, _ = tiny_index
    searcher = IndexSearcher(spark, index_dir)
    oracle = OracleIndex(tiny_corpus, num_segments=4, analyzer="code")
    queries = ['"read the file into buffer"~3', '"merge segments index"~5']
    hits = searcher.search_many(
        {i: parse_query(q) for i, q in enumerate(queries)}, k=10
    ).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r.qid, []).append(
            (r.rank, r.segment_id, r.doc_id, round(float(r.score), 4))
        )
    for qid, q in enumerate(queries):
        got = sorted(by_q.get(qid, []))
        exp = [
            (i + 1, seg, doc, round(float(s), 4))
            for i, (seg, doc, s) in enumerate(oracle.search(parse_query(q), k=10))
        ]
        assert got == exp, f"{q!r}:\n{got}\n{exp}"


# -------------------------------------------------------- span algebra ------
def test_span_or_end_to_end():
    from lucene_solr_spark.search.query import SpanNearQuery, SpanOrQuery, SpanTermQuery

    docs = [
        "fatal error handling",     # 'error handling'
        "fatal failure handling",   # 'failure handling'
        "fatal handling",           # neither first clause
        "error but not handled",    # no 'handling' adjacency
    ]
    seg, ctx = _seg(docs)
    q = SpanNearQuery(
        clauses=(SpanOrQuery((SpanTermQuery("error"), SpanTermQuery("failure"))), "handling"),
        slop=0,
        in_order=True,
    )
    d, s = eval_query(q, seg, ctx)
    assert list(d) == [0, 1]
    assert all(v > 0 for v in s)


def test_span_not_excludes_overlaps():
    from lucene_solr_spark.search.query import SpanNearQuery, SpanNotQuery

    docs = [
        "error handling code",          # matches, no 'fatal' anywhere near
        "fatal error handling code",    # near span overlaps... fatal NOT inside the span
        "error fatal handling",         # 'fatal' inside the matched window
    ]
    seg, ctx = _seg(docs)
    inner = SpanNearQuery(clauses=("error", "handling"), slop=2, in_order=True)
    q = SpanNotQuery(include=inner, exclude="fatal")
    d, _ = eval_query(q, seg, ctx)
    # doc2's only span 'error..handling' covers position of 'fatal' -> dropped;
    # doc1's 'fatal' sits BEFORE the span (no overlap) -> kept
    assert list(d) == [0, 1]


def test_span_first_limits_end_position():
    from lucene_solr_spark.search.query import SpanFirstQuery

    docs = [
        "needle early in doc",
        "the words come first and the needle later",
    ]
    seg, ctx = _seg(docs)
    q = SpanFirstQuery(match="needle", end=2)
    d, _ = eval_query(q, seg, ctx)
    assert list(d) == [0]
    q_all = SpanFirstQuery(match="needle", end=100)
    d, _ = eval_query(q_all, seg, ctx)
    assert list(d) == [0, 1]


def test_nested_near_checks_per_level_slop():
    from lucene_solr_spark.search.query import SpanNearQuery

    docs = [
        "alpha beta filler filler gamma",   # inner (alpha beta) tight, gamma 3 away
        "alpha filler beta gamma",          # inner needs slop 1
    ]
    seg, ctx = _seg(docs)
    inner_tight = SpanNearQuery(clauses=("alpha", "beta"), slop=0, in_order=True)
    outer = SpanNearQuery(clauses=(inner_tight, "gamma"), slop=2, in_order=True)
    d, _ = eval_query(outer, seg, ctx)
    assert list(d) == [0]  # doc1's inner span needs slop 1 -> no inner span
    inner_loose = SpanNearQuery(clauses=("alpha", "beta"), slop=1, in_order=True)
    outer2 = SpanNearQuery(clauses=(inner_loose, "gamma"), slop=2, in_order=True)
    d2, s2 = eval_query(outer2, seg, ctx)
    assert list(d2) == [0, 1]
    # doc0 total excess 2 vs doc1 inner-excess 1 + between-gap 0 = 1: doc1's
    # span is tighter overall, but norms differ; just check weights positive
    assert all(v > 0 for v in s2)


def test_generic_path_equals_unit_span_helpers():
    """The triple-based combiner reproduces the flat unit-span weights the
    original helpers compute (same corpus as the brute-force test)."""
    from lucene_solr_spark.search.kernels import _doc_spans
    from lucene_solr_spark.search.query import SpanNearQuery

    rng = np.random.RandomState(23)
    vocab = ["alpha", "beta", "gamma", "delta"]
    docs = [" ".join(rng.choice(vocab, size=rng.randint(3, 25))) for _ in range(60)]
    seg, ctx = _seg(docs)
    for _ in range(15):
        n = rng.randint(2, 4)
        clauses = tuple(rng.choice(vocab[:3], size=n, replace=False))
        slop = int(rng.randint(0, 4))
        in_order = bool(rng.randint(0, 2))
        q = SpanNearQuery(clauses=clauses, slop=slop, in_order=in_order)
        for i, text in enumerate(docs):
            toks = text.split()
            pls = [
                np.array([p for p, t in enumerate(toks) if t == c], dtype=np.int64)
                for c in clauses
            ]
            if any(len(p) == 0 for p in pls):
                continue
            ref = (
                _span_weight_ordered(pls, slop)
                if in_order
                else _span_weight_unordered(pls, slop)
            )
            got = sum(1.0 / (1 + x) for _, _, x in _doc_spans(q, seg, i))
            assert got == pytest.approx(ref), (clauses, slop, in_order, i)


def test_span_position_range():
    """SpanPositionRangeQuery.acceptPosition (SpanPositionRangeQuery.java:
    41-46): start >= range-start AND end <= range-end; SpanFirst is the
    start=0 special case."""
    from lucene_solr_spark.search.query import (
        SpanFirstQuery,
        SpanNearQuery,
        SpanPositionRangeQuery,
    )

    docs = [
        "needle early in doc",            # needle at position 0
        "one two needle after",           # needle at position 2
        "one two three four five needle", # needle at position 5
    ]
    seg, ctx = _seg(docs)
    q = SpanPositionRangeQuery(match="needle", start=1, end=4)
    d, _ = eval_query(q, seg, ctx)
    assert list(d) == [1]
    # start=0 degenerates to SpanFirst
    for end in (1, 3, 6):
        a, wa = eval_query(SpanPositionRangeQuery(match="needle", start=0, end=end), seg, ctx)
        b, wb = eval_query(SpanFirstQuery(match="needle", end=end), seg, ctx)
        assert list(a) == list(b) and list(wa) == list(wb)
    # composite span inside the range check
    near = SpanNearQuery(("two", "needle"), slop=0, in_order=True)
    d, _ = eval_query(SpanPositionRangeQuery(match=near, start=1, end=3), seg, ctx)
    assert list(d) == [1]  # doc 1 span is (1,3); doc 2 has no two-needle pair
    # brute force over every (start, end) window on doc 2's needle at pos 5
    for s in range(0, 7):
        for e in range(0, 8):
            d, _ = eval_query(SpanPositionRangeQuery(match="needle", start=s, end=e), seg, ctx)
            assert (2 in list(d)) == (s <= 5 and 6 <= e)
