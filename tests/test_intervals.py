"""Intervals algebra: minimality/gaps semantics vs brute-force enumeration,
hand-checked examples, and engine-path parity (IntervalQuery via search_many
== per-doc python over analyzed positions)."""

import itertools

import numpy as np
import pytest

from lucene_solr_spark.search.intervals import (
    IBlock,
    IContainedBy,
    IContaining,
    IMaxGaps,
    IMaxWidth,
    INotContaining,
    IOr,
    IOrdered,
    ITerm,
    IUnordered,
    IntervalQuery,
    intervals_in_doc,
    min_extent,
    source_terms,
)


def _pos(**kw):
    return {t: np.array(sorted(ps), dtype=np.int64) for t, ps in kw.items()}


# ---------------------------------------------------------------------------
# brute-force reference: enumerate every combination, keep minimal set

def _brute_ordered(pos_lists):
    cands = set()
    for combo in itertools.product(*pos_lists):
        if all(combo[i + 1] > combo[i] for i in range(len(combo) - 1)):
            cands.add((combo[0], combo[-1]))
    return _brute_minimal(cands)


def _brute_unordered(pos_lists):
    cands = set()
    for combo in itertools.product(*pos_lists):
        cands.add((min(combo), max(combo)))
    return _brute_minimal(cands)


def _brute_minimal(cands):
    return sorted(
        c
        for c in cands
        if not any(
            o != c and c[0] <= o[0] and o[1] <= c[1] for o in cands
        )
    )


def test_ordered_matches_brute_force_property():
    rng = np.random.RandomState(7)
    for trial in range(300):
        n = rng.randint(2, 4)
        lists = [
            sorted(rng.choice(30, size=rng.randint(1, 6), replace=False))
            for _ in range(n)
        ]
        pos = {f"t{i}": np.array(l, dtype=np.int64) for i, l in enumerate(lists)}
        src = IOrdered(tuple(f"t{i}" for i in range(n)))
        got = sorted((s, e) for s, e, _ in intervals_in_doc(src, pos))
        want = _brute_ordered(lists)
        assert got == want, f"trial {trial}: {lists} -> {got} != {want}"


def test_unordered_matches_brute_force_property():
    rng = np.random.RandomState(11)
    for trial in range(300):
        n = rng.randint(2, 4)
        lists = [
            sorted(rng.choice(30, size=rng.randint(1, 6), replace=False))
            for _ in range(n)
        ]
        pos = {f"t{i}": np.array(l, dtype=np.int64) for i, l in enumerate(lists)}
        src = IUnordered(tuple(f"t{i}" for i in range(n)))
        got = sorted((s, e) for s, e, _ in intervals_in_doc(src, pos))
        want = _brute_unordered(lists)
        assert got == want, f"trial {trial}: {lists} -> {got} != {want}"


def test_ordered_gaps_and_maxgaps():
    # "a x x b" — one gap of 2 between a and b
    pos = _pos(a=[0], b=[3])
    ivs = intervals_in_doc(IOrdered(("a", "b")), pos)
    assert ivs == [(0, 3, 2)]
    assert intervals_in_doc(IMaxGaps(IOrdered(("a", "b")), 1), pos) == []
    assert intervals_in_doc(IMaxGaps(IOrdered(("a", "b")), 2), pos) == [(0, 3, 2)]
    # immediate gaps only: ordered(ordered(a,b), c) counts the outer gap,
    # not the gap inside the inner pair
    pos = _pos(a=[0], b=[3], c=[5])
    outer = intervals_in_doc(IOrdered((IOrdered(("a", "b")), ITerm("c"))), pos)
    assert outer == [(0, 5, 1)]  # gap between (0,3) and (5,5) is position 4


def test_block_is_exact_adjacency():
    pos = _pos(a=[0, 10], b=[1, 12])
    assert intervals_in_doc(IBlock(("a", "b")), pos) == [(0, 1, 0)]
    pos = _pos(a=[0], b=[2])
    assert intervals_in_doc(IBlock(("a", "b")), pos) == []


def test_or_minimality():
    # (2,2) nests inside (0,4): the wider interval is dropped
    pos = _pos(a=[0], b=[4], c=[2])
    src = IOr((IOrdered(("a", "b")), ITerm("c")))
    assert intervals_in_doc(src, pos) == [(2, 2, 0)]


def test_unordered_overlap_allowed_and_width():
    pos = _pos(a=[5], b=[5 + 3])
    got = intervals_in_doc(IMaxWidth(IUnordered(("a", "b")), 4), pos)
    assert got == [(5, 8, 2)]
    assert intervals_in_doc(IMaxWidth(IUnordered(("a", "b")), 3), pos) == []


def test_containing_family():
    pos = _pos(a=[0, 10], b=[4, 14], c=[2])
    big = IUnordered(("a", "b"))
    # minimal windows: (0,4), (4,10), (10,14); only (0,4) contains c@2
    assert intervals_in_doc(IContaining(big, ITerm("c")), pos) == [(0, 4, 3)]
    assert intervals_in_doc(INotContaining(big, ITerm("c")), pos) == [
        (4, 10, 5),
        (10, 14, 3),
    ]
    assert intervals_in_doc(IContainedBy(ITerm("c"), big), pos) == [(2, 2, 0)]


def test_min_extent_and_terms():
    src = IMaxGaps(IOrdered(("a", IBlock(("b", "c")))), 2)
    assert min_extent(src) == 3
    assert source_terms(src) == {"a", "b", "c"}
    assert min_extent(IOr((ITerm("a"), IBlock(("b", "c"))))) == 1


def test_empty_child_short_circuits():
    pos = _pos(a=[1])
    assert intervals_in_doc(IOrdered(("a", "zzz")), pos) == []
    assert intervals_in_doc(IUnordered(("a", "zzz")), pos) == []
    assert intervals_in_doc(IOr((ITerm("a"), ITerm("zzz"))), pos) == [(1, 1, 0)]


# ---------------------------------------------------------------------------
# engine path: IntervalQuery through the searcher == per-doc python

def test_interval_query_engine_parity(spark, tiny_corpus, tiny_index):
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.analysis import ANALYZERS
    from lucene_solr_spark.search import IndexSearcher

    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir, analyzer="code", precision="f64")

    queries = {
        0: IntervalQuery(source=IMaxGaps(IOrdered(("index", "writer")), 4)),
        1: IntervalQuery(source=IMaxWidth(IUnordered(("merge", "segment")), 8)),
        2: IntervalQuery(source=IOr((IBlock(("index", "writer")), ITerm("http")))),
        3: IntervalQuery(
            source=IContainedBy(
                ITerm("parse"), IMaxWidth(IUnordered(("read", "file")), 10)
            )
        ),
    }
    hits = s.search_many(queries, k=None)
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .select("segment_id", "doc_id", F.concat_ws("\x00", "repo", "path", "commit").alias("key"))
    )
    got = {
        (r.qid, r.key, round(float(r.score), 6))
        for r in hits.join(docs, ["segment_id", "doc_id"]).collect()
    }

    analyze = ANALYZERS["code"]
    want = set()
    for i in range(len(tiny_corpus)):
        row = tiny_corpus.iloc[i]
        key = "\x00".join(str(row[c]) for c in ("repo", "path", "commit"))
        terms, positions = analyze(row["content"] or "")
        pos: dict = {}
        for t, p in zip(terms, positions):
            pos.setdefault(t, []).append(p)
        pos = {t: np.array(sorted(ps), dtype=np.int64) for t, ps in pos.items()}
        for qid, q in queries.items():
            ivs = intervals_in_doc(q.source, pos)
            if ivs:
                me = min_extent(q.source)
                freq = sum(1.0 / max((e - st + 1) - me + 1, 1) for st, e, _ in ivs)
                want.add((qid, key, round(freq / (freq + 1.0), 6)))
    assert got == want
    assert len({q for q, _, _ in got}) >= 3  # corpus exercises most variants
