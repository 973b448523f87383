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


# ------------------------------------------------------- stored offsets ----


@pytest.fixture(scope="module")
def hl_off_index(spark, tiny_corpus, tmp_path_factory):
    """tiny corpus indexed WITH stored offsets (code chain)."""
    from lucene_solr_spark.index import build_index

    d = str(tmp_path_factory.mktemp("hl_off") / "idx")
    docs = spark.createDataFrame(tiny_corpus)
    build_index(spark, docs, d, num_segments=4, analyzer="code", store_offsets=True)
    return d


def test_highlight_offsets_matches_reanalysis(spark, hl_off_index):
    """On an ASCII corpus with the code chain, stored-offset snippets are
    byte-identical to the re-analysis highlighter (same spans, same
    fragmenter)."""
    from lucene_solr_spark.highlight import highlight_offsets
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, hl_off_index, analyzer="code")
    for q in ["parse AND http", "buffer OR stream", '"index writer"']:
        hits = s.search(q, k=10)
        fetched = s.fetch(hits, cols=["path", "content"])
        ref = {
            r.path: r.snippet
            for r in highlight(fetched, q, analyzer="code").collect()
        }
        got = {
            r.path: r.snippet
            for r in highlight_offsets(
                spark, hl_off_index, fetched, q, analyzer="code"
            ).collect()
        }
        assert got == ref, q


def test_highlight_offsets_fallback_without_offsets(spark, tiny_index):
    """Against an offset-free index the offsets highlighter degrades to the
    re-analysis strategy per document."""
    from lucene_solr_spark.highlight import highlight_offsets
    from lucene_solr_spark.search import IndexSearcher

    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir, analyzer="code")
    hits = s.search("parse AND http", k=5)
    fetched = s.fetch(hits, cols=["path", "content"])
    ref = {
        r.path: r.snippet
        for r in highlight(fetched, "parse AND http", analyzer="code").collect()
    }
    got = {
        r.path: r.snippet
        for r in highlight_offsets(
            spark, index_dir, fetched, "parse AND http", analyzer="code"
        ).collect()
    }
    assert got == ref


def test_highlight_offsets_graph_chain_exact(spark, tmp_path_factory):
    """The case stored offsets exist for: a WordDelimiterGraph catenation
    ('fooBar_baz' → 'foobarbaz') has NO re-analysis span — the base scan
    yields the parts foo/Bar/baz, never the catenated term — but its stored
    offsets mark the whole original token."""
    from lucene_solr_spark.highlight import highlight_offsets
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    rows = [
        ("r", f"p{i}", "c", f"filler{i} calls fooBar_baz handler and returns")
        for i in range(8)
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    d = str(tmp_path_factory.mktemp("hl_graph") / "idx")
    build_index(
        spark, docs, d, num_segments=2, analyzer="code_graph", store_offsets=True
    )
    s = IndexSearcher(spark, d, analyzer="code_graph")
    # single-term query for the CATENATED token: only the graph index knows it
    hits = s.search("foobarbaz", k=8)
    assert hits.count() == 8
    fetched = s.fetch(hits, cols=["path", "content"])
    got = highlight_offsets(
        spark, d, fetched, "foobarbaz", analyzer="code_graph", fallback=False
    ).collect()
    assert got
    for r in got:
        assert "<b>fooBar_baz</b>" in r.snippet, r.snippet
    # re-analysis CANNOT find this span: term set {foobarbaz} matches no
    # base-scan token of the stored text
    ref = highlight(fetched, "foobarbaz", analyzer="code").collect()
    for r in ref:
        assert "<b>" not in r.snippet


# ------------------------------------------------------ passage scoring ----


def _py_passage_scores(text, spans, k1=1.2, b=0.75, pivot=87.0):
    """Independent PassageScorer implementation (PassageScorer.java:98-141)
    over pre-computed (start, end, term) spans."""
    import math
    from collections import Counter

    from lucene_solr_spark.highlight import _passage_bounds

    doc_freq = Counter(t for _, _, t in spans)
    out = []
    for ps, pe in _passage_bounds(text):
        inside = [sp for sp in spans if sp[0] >= ps and sp[1] <= pe]
        if not inside:
            continue
        score = 0.0
        for t, fp in Counter(t for _, _, t in inside).items():
            tf = fp / (fp + k1 * ((1 - b) + b * ((pe - ps) / pivot)))
            w = (k1 + 1) * math.log(1 + (1 + len(text) / pivot + 0.5) / (doc_freq[t] + 0.5))
            score += tf * w
        out.append((score * (1 + 1 / math.log(pivot + ps)), ps))
    return sorted(out, key=lambda x: (-x[0], x[1]))


def test_highlight_passages_scores_and_order(spark, hl_off_index):
    """Passage scores match an independent PassageScorer implementation;
    snippets contain tagged matches in document order."""
    from lucene_solr_spark.highlight import _match_spans_terms, highlight_passages
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.analysis import ANALYZERS

    s = IndexSearcher(spark, hl_off_index, analyzer="code")
    q = "parse AND http"
    hits = s.search(q, k=8)
    fetched = s.fetch(hits, cols=["path", "content"])
    rows = highlight_passages(
        spark, hl_off_index, fetched, q, analyzer="code", max_passages=2
    ).collect()
    assert rows
    terms = set(ANALYZERS["code"](q)[0])
    content = {r.path: r.content for r in fetched.collect()}
    for r in rows:
        assert "<b>" in r.snippet and r.passage_score > 0
        expect = _py_passage_scores(
            content[r.path], _match_spans_terms(content[r.path], terms, "code")
        )
        assert r.passage_score == pytest.approx(expect[0][0], rel=1e-9), r.path


def test_highlight_passages_fallback(spark, tiny_index):
    """Offset-free index: spans come from re-analysis, scoring identical."""
    from lucene_solr_spark.highlight import highlight_passages
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    hits = s.search("parse", k=5)
    fetched = s.fetch(hits, cols=["path", "content"])
    rows = highlight_passages(spark, d, fetched, "parse", analyzer="code").collect()
    assert rows and all("<b>" in r.snippet for r in rows)
