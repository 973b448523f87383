"""CommonGramsFilter / CommonGramsQueryFilter
(``CommonGramsFilter.java:51``): the phrase-speed chain that keeps common
words. Index side stacks ``w1_w2`` grams (posIncr=0) beside the unigrams;
the query side replaces covered unigrams with grams. A common-gram phrase
must match EXACTLY the docs the plain phrase matches while walking far
shorter postings."""

import pytest

from lucene_solr_spark.analysis import (
    analyze_common_grams,
    common_grams_query,
)


def test_index_chain_stacks_grams():
    terms, pos = analyze_common_grams("the quick brown fox")
    # unigram stream intact; gram stacked at the first word's slot
    assert terms == ["the", "the_quick", "quick", "brown", "fox"]
    assert pos == [0, 0, 1, 2, 3]


def test_index_chain_gram_on_either_side():
    # gram forms when EITHER word is common (CommonGramsFilter.isCommon)
    terms, pos = analyze_common_grams("jump the gun")
    assert terms == ["jump", "jump_the", "the", "the_gun", "gun"]
    assert pos == [0, 0, 1, 1, 2]


def test_index_chain_norm_length_discounts_grams(spark=None):
    from lucene_solr_spark.analysis import analyze_batch

    terms, positions, lens, starts, norm_lens = analyze_batch(
        ["the quick brown fox"], analyzer="commongrams"
    )
    assert lens[0] == 5          # emitted tokens incl. the gram
    assert norm_lens[0] == 4     # field length = occupied slots (4 words)


def test_query_filter_replaces_covered_unigrams():
    # javadoc shape: "the quick brown" -> (the_quick) (brown)
    assert common_grams_query("the quick brown") == (
        ["the_quick", "brown"], [0, 2]
    )
    # consecutive grams chain through a common word
    assert common_grams_query("jump the gun") == (
        ["jump_the", "the_gun"], [0, 1]
    )
    # isolated tokens stay unigrams — incl. a lone common word
    assert common_grams_query("the") == (["the"], [0])
    assert common_grams_query("quick fox") == (["quick", "fox"], [0, 1])


@pytest.fixture(scope="module")
def cg_indexes(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    corpus = synth_corpus_local(150)
    base = tmp_path_factory.mktemp("cg")
    d_plain = str(base / "plain")
    d_cg = str(base / "cg")
    docs = spark.createDataFrame(corpus)
    # simple chain keeps stopwords too — same unigram stream, no grams
    build_index(spark, docs, d_plain, num_segments=2, analyzer="simple")
    build_index(spark, docs, d_cg, num_segments=2, analyzer="commongrams")
    return d_plain, d_cg


def _phrase_hits(spark, index_dir, analyzer, query):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer=analyzer)
    hits = s.search(query, k=None)
    docs = spark.read.parquet(index_dir + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    return {
        (r["repo"], r["path"])
        for r in hits.join(docs, ["segment_id", "doc_id"]).collect()
    }


@pytest.mark.parametrize(
    "phrase",
    ['"merge the segments"', '"the index"', '"into a buffer"'],
)
def test_phrase_equivalence(spark, cg_indexes, phrase):
    """Common-gram phrase ≡ plain phrase: identical matching doc sets."""
    d_plain, d_cg = cg_indexes
    plain = _phrase_hits(spark, d_plain, "simple", phrase)
    cg = _phrase_hits(spark, d_cg, "commongrams", phrase)
    assert cg == plain
    assert plain  # the phrase actually occurs in the corpus


def test_fewer_postings_touched(spark, cg_indexes):
    """The gram's df is far below the stop word's — that's the point."""
    from lucene_solr_spark.search import IndexSearcher

    _, d_cg = cg_indexes
    s = IndexSearcher(spark, d_cg, analyzer="commongrams")
    stats = {
        r["term"]: r["df"]
        for r in s._term_stats_df.filter(
            s._term_stats_df.term.isin("the", "merge_the", "the_segments")
        ).collect()
    }
    assert stats["merge_the"] < stats["the"]
    assert stats["the_segments"] < stats["the"]
