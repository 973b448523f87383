"""cursorMark deep paging (CursorMark.java totem contract): opaque
round-trip, loud failure on tampering, page-walk equivalence to one big
search, and the end-of-results fixed-point."""

import pytest

from lucene_solr_spark.search.cursormark import (
    CURSOR_MARK_START,
    cursor_page,
    next_cursor_mark,
    parse_cursor_mark,
)


def test_totem_roundtrip_and_tampering():
    t = next_cursor_mark(2.53125, 3, 17)
    assert parse_cursor_mark(t) == (2.53125, 3, 17)
    assert parse_cursor_mark(CURSOR_MARK_START) is None
    with pytest.raises(ValueError):
        parse_cursor_mark("not-a-totem!!")
    with pytest.raises(ValueError):
        parse_cursor_mark(t[:-4])  # truncated
    tampered = ("A" if t[0] != "A" else "B") + t[1:]
    with pytest.raises(ValueError):
        parse_cursor_mark(tampered)
    # negative scores / large ids survive
    t2 = next_cursor_mark(-1.5e-9, 2**40, 2**33)
    assert parse_cursor_mark(t2) == (-1.5e-9, 2**40, 2**33)


def test_cursor_walk_equals_one_search(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    full = [
        (r.segment_id, r.doc_id, round(float(r.score), 5))
        for r in s.search("parse", k=30).orderBy("rank").collect()
    ]
    walked, totem = [], CURSOR_MARK_START
    for _ in range(10):
        rows, nxt = cursor_page(s, "parse", totem, k=7)
        walked.extend(
            (r.segment_id, r.doc_id, round(float(r.score), 5)) for r in rows
        )
        if nxt == totem:  # end of results: totem fixed point
            break
        totem = nxt
        if len(walked) >= 30:
            break
    assert walked[:30] == full
    # walking an exhausted cursor returns the same totem again
    rows, nxt = cursor_page(s, "zzz_no_such_term", CURSOR_MARK_START, k=5)
    assert rows == [] and nxt == CURSOR_MARK_START
