"""WordDelimiterGraphFilter CATENATE_ALL + PRESERVE_ORIGINAL (code_graph).

Semantics: stacked tokens (posIncr=0) at the first part's position
(WordDelimiterGraphFilter.java:99-164), discountOverlaps norms
(FieldInvertState.numOverlap), index-side-only graph chain. End-to-end:
engine rank/score-identical to the oracle on a code_graph index; catenated
single-term queries match split identifiers.
"""

import pytest

from lucene_solr_spark.analysis import (
    analyze_batch,
    analyze_code,
    analyze_code_graph,
    analyze_query,
)


def test_stacked_tokens_at_first_part_position():
    terms, pos = analyze_code_graph("parseHttpRequest")
    # catenated + original coincide -> one stacked token, deduped
    assert sorted(zip(pos, terms)) == [
        (0, "parse"),
        (0, "parsehttprequest"),
        (1, "http"),
        (2, "request"),
    ]


def test_preserve_original_differs_with_delimiters():
    terms, pos = analyze_code_graph("foo_bar")
    # catenate_all drops the delimiter, preserve_original keeps it
    assert sorted(zip(pos, terms)) == [
        (0, "foo"),
        (0, "foo_bar"),
        (0, "foobar"),
        (1, "bar"),
    ]


def test_single_part_tokens_emit_no_stack():
    assert analyze_code_graph("buffer stream") == analyze_code("buffer stream")


def test_base_tokens_and_positions_are_a_subset():
    text = "a parseHttp buffer the SD500 read_file"
    base = set(zip(*reversed(analyze_code(text))))
    graph = set(zip(*reversed(analyze_code_graph(text))))
    assert base <= graph
    stacked = graph - base
    # every stacked token sits at a position occupied by a base part
    base_positions = {p for p, _ in base}
    assert stacked and all(p in base_positions for p, _ in stacked)


def test_norm_length_discounts_overlaps():
    texts = ["parseHttp read_file the buffer", "plain words only"]
    _, _, lens, _, norm_lens = analyze_batch(texts, "code_graph")
    _, _, base_lens, _, base_norms = analyze_batch(texts, "code")
    # stacked tokens inflate emitted counts but not the field length
    assert lens[0] > base_lens[0]
    assert list(norm_lens) == list(base_norms)


def test_query_side_uses_base_rules():
    assert analyze_query("parseHttp", "code_graph") == ["parse", "http"]
    assert analyze_query("parsehttp", "code_graph") == ["parsehttp"]


@pytest.fixture(scope="module")
def graph_index(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    index_dir = str(tmp_path_factory.mktemp("idx") / "graph")
    docs = spark.createDataFrame(tiny_corpus)
    build_index(spark, docs, index_dir, num_segments=4, analyzer="code_graph")
    return index_dir


@pytest.fixture(scope="module")
def graph_oracle(tiny_corpus):
    from lucene_solr_spark.oracle import OracleIndex

    return OracleIndex(tiny_corpus, num_segments=4, analyzer="code_graph")


def test_engine_matches_oracle_on_graph_index(spark, graph_index, graph_oracle):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import parse_query

    searcher = IndexSearcher(spark, graph_index, analyzer="code_graph")
    queries = ["parse", "parsehttp", "read AND file", '"read the file"', "buffer OR stream"]
    hits = searcher.search_many(dict(enumerate(queries)), k=10).collect()
    by_q = {}
    for r in hits:
        by_q.setdefault(r.qid, []).append(
            (r.rank, r.segment_id, r.doc_id, round(float(r.score), 4))
        )
    for qid, q in enumerate(queries):
        got = sorted(by_q.get(qid, []))
        exp = [
            (i + 1, seg, doc, round(float(s), 4))
            for i, (seg, doc, s) in enumerate(graph_oracle.search(parse_query(q), k=10))
        ]
        assert got == exp, f"mismatch on {q!r}:\n{got}\n{exp}"


def test_catenated_query_matches_split_identifier(spark, graph_index, tiny_corpus):
    from lucene_solr_spark.search import IndexSearcher

    # find a camelCase identifier in the corpus to query catenated
    searcher = IndexSearcher(spark, graph_index, analyzer="code_graph")
    target = None
    for content in tiny_corpus["content"]:
        for w in content.split():
            wl = "".join(c for c in w if c.isalnum() or c == "_")
            if any(c.isupper() for c in wl[1:]) and wl[:1].islower() and len(wl) > 4:
                target = wl
                break
        if target:
            break
    assert target is not None, "corpus has no camelCase identifier"
    n = searcher.search(target.lower().replace("_", ""), k=5).count()
    assert n > 0, f"catenated query {target!r} found nothing"


def test_norms_identical_to_base_chain(spark, graph_index, tiny_index):
    """Stacked tokens don't change norms: BM25 stats of the graph index equal
    the base index's (same corpus, same segments)."""
    import os

    base_dir, _ = tiny_index
    for d in (graph_index, base_dir):
        assert os.path.exists(os.path.join(d, "index"))
    from pyspark.sql import functions as F

    def norm_rows(d):
        df = spark.read.parquet(os.path.join(d, "index")).filter(F.col("kind") == 1)
        return sorted(
            (r.segment_id, bytes(r.doc_blob)) for r in df.select("segment_id", "doc_blob").collect()
        )

    assert norm_rows(graph_index) == norm_rows(base_dir)
