"""Re-analysis highlighter: snippets mark chain-matching tokens (including
camelCase subwords and stemmed variants), windows clip long docs."""

import pytest

from lucene_solr_spark.highlight import _best_fragment, _match_spans, highlight


def test_match_spans_subwords():
    text = "call parseHttp for the HTTPServer now"
    spans = _match_spans(text, {"http"}, "code")
    got = [text[s:e] for s, e in spans]
    assert got == ["Http", "HTTP"]


def test_match_spans_stemmed():
    text = "opening database connections"
    spans = _match_spans(text, {"connect"}, "english")
    assert [text[s:e] for s, e in spans] == ["connections"]


def test_best_fragment_tags_and_window():
    text = "x" * 200 + " the needle is here " + "y" * 200
    spans = _match_spans(text, {"needle"}, "code")
    frag = _best_fragment(text, spans, 60)
    assert "<b>needle</b>" in frag
    assert len(frag) < 90
    assert frag.startswith("...") and frag.endswith("...")


def test_highlight_end_to_end(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir, analyzer="code")
    hits = s.search("parse AND http", k=5)
    fetched = s.fetch(hits, cols=["path", "content"])
    rows = highlight(fetched, "parse AND http", analyzer="code").collect()
    assert rows
    for r in rows:
        assert "<b>" in r.snippet
