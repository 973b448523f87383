"""SynonymGraphFilter / SolrSynonymParser (analysis.py synonym chains):
rules-file grammar, stacked posIncr=0 injection, norm neutrality
(discountOverlaps), cross-synonym search and phrase matching through an
index built with a ``synonym:<base>:<path>`` chain."""

import os

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def syn_file(tmp_path_factory):
    p = tmp_path_factory.mktemp("syn") / "synonyms.txt"
    p.write_text(
        "# test rules\n"
        "big, large, huge\n"
        "small => tiny\n"
        "\n"
        "fast, quick   # trailing comment\n"
    )
    return str(p)


def test_parse_rules(syn_file):
    from lucene_solr_spark.analysis import parse_synonym_rules

    r = parse_synonym_rules(syn_file)
    assert r["big"] == (False, ("large", "huge"))
    assert r["large"] == (False, ("big", "huge"))
    assert r["small"] == (True, ("tiny",))
    assert "tiny" not in r
    assert r["fast"] == (False, ("quick",))


def test_parse_rules_rejects_multiword(tmp_path):
    from lucene_solr_spark.analysis import parse_synonym_rules

    p = tmp_path / "bad.txt"
    p.write_text("machine learning, ml\n")
    with pytest.raises(ValueError, match="multi-word"):
        parse_synonym_rules(str(p))


def test_chain_stacks_at_position(syn_file):
    from lucene_solr_spark.analysis import ANALYZERS

    fn = ANALYZERS[f"synonym:simple:{syn_file}"]
    terms, pos = fn("a BIG small dog")
    # big -> big+large+huge stacked at pos 1; small -> tiny (replaced) at 2
    assert list(zip(terms, pos)) == [
        ("a", 0),
        ("big", 1), ("large", 1), ("huge", 1),
        ("tiny", 2),
        ("dog", 3),
    ]


def test_norms_unchanged_vs_base(spark, tmp_path, syn_file):
    """Stacked synonyms are overlaps: field length (and therefore scores of
    non-synonym terms) must equal the base chain's."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.read import norms_table

    rows = [(i, t) for i, t in enumerate([
        "the big dog runs", "a small cat sleeps", "plain words only",
        "big big huge thing", "nothing to see here",
    ])]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    d_base = str(tmp_path / "base")
    d_syn = str(tmp_path / "syn")
    build_index(spark, docs, d_base, num_segments=2, analyzer="simple",
                key_cols=("ext_id",), content_col="text")
    build_index(spark, docs, d_syn, num_segments=2,
                analyzer=f"synonym:simple:{syn_file}",
                key_cols=("ext_id",), content_col="text")
    a = {(r.segment_id, r.doc_id): r.norm_byte
         for r in norms_table(spark, d_base).collect()}
    b = {(r.segment_id, r.doc_id): r.norm_byte
         for r in norms_table(spark, d_syn).collect()}
    assert a == b


def test_search_through_synonyms(spark, tmp_path, syn_file):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    rows = [(i, t) for i, t in enumerate([
        "the big dog runs", "a large dog walks", "a small cat sleeps",
        "plain words only",
    ])]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, num_segments=1,
                analyzer=f"synonym:simple:{syn_file}",
                key_cols=("ext_id",), content_col="text")
    s = IndexSearcher(spark, d, analyzer=f"synonym:simple:{syn_file}")
    ids = lambda q: sorted(
        r.doc_id for r in s.search_many({0: q}, k=None).collect()
    )
    ext = {
        r.doc_id: r.ext_id
        for r in spark.read.parquet(d + "/docs").select("doc_id", "ext_id").collect()
    }
    # "large" matches both the big-doc (via stacked synonym) and the
    # large-doc; queries analyze with the BASE chain (no expansion)
    assert sorted(ext[i] for i in ids("large")) == [0, 1]
    assert sorted(ext[i] for i in ids("huge")) == [0, 1]
    # explicit mapping: 'small' was replaced by 'tiny' at index time
    assert sorted(ext[i] for i in ids("tiny")) == [2]
    assert ids("small") == []
    # phrase across a synonym: stacked token keeps the position
    assert sorted(ext[i] for i in ids('"large dog"')) == [0, 1]


def test_searcher_equivalence_classes_symmetric_df(spark, tmp_path, syn_file):
    """After expansion each equivalence-class member has identical postings
    — df('big') == df('large') == df('huge') on the synonym index."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.read import term_postings

    rows = [(i, t) for i, t in enumerate(
        ["big dog", "large cat", "huge bird", "no match"]
    )]
    docs = spark.createDataFrame(rows, "ext_id bigint, text string")
    d = str(tmp_path / "idx")
    build_index(spark, docs, d, num_segments=1,
                analyzer=f"synonym:simple:{syn_file}",
                key_cols=("ext_id",), content_col="text")
    tp = term_postings(spark, d, ["big", "large", "huge"])
    counts = {r["term"]: r["n"] for r in
              tp.groupBy("term").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 3, "large": 3, "huge": 3}


def test_rules_merge_across_lines(tmp_path):
    """A term on several lines merges outputs (SynonymMap.Builder.add
    semantics); keep-original wins if any rule keeps it — review fix."""
    from lucene_solr_spark.analysis import parse_synonym_rules

    p = tmp_path / "multi.txt"
    p.write_text("couch, sofa\ncouch, divan\nlift => elevator\nlift, hoist\n")
    r = parse_synonym_rules(str(p))
    assert r["couch"] == (False, ("sofa", "divan"))
    # equivalence line keeps the original even though the => rule replaced
    assert r["lift"] == (False, ("elevator", "hoist"))


def test_query_chain_recurses_through_graph_base(syn_file):
    """synonym:<graph-base> queries must analyze with the graph base's OWN
    query rules (code_graph -> code) — review fix."""
    from lucene_solr_spark.analysis import QUERY_CHAIN

    assert QUERY_CHAIN.get(f"synonym:code_graph:{syn_file}", None) == "code"
    assert QUERY_CHAIN.get(f"synonym:simple:{syn_file}", None) == "simple"
