"""termVectors / topFeatures — the Solr text-clustering bridge
(``TermVectorsEvaluator.java`` / ``TopFeaturesEvaluator.java``): a bound
stream of (id, terms) tuples → labeled TF-IDF matrix → per-row top
features; composes with kmeans/getCentroids through the labeled-matrix
PlanValue."""

import math

import pytest

from lucene_solr_spark import streaming_expr as SE
from lucene_solr_spark.evaluators import apply_let
from lucene_solr_spark.streaming_expr import run_stream_expr

SF = "/root/testdata/sf0.001"


def test_term_vectors_cell_matches_reference_formula(spark):
    docs = spark.createDataFrame(
        [
            ("d1", ["hello", "world", "spark", "hello"]),
            ("d2", ["world", "query", "spark"]),
            ("d3", ["query", "index", "spark", "world"]),
            ("d4", ["alpha", "beta", "index"]),
        ],
        "id string, terms array<string>",
    )
    tv = SE._term_vectors_cell(docs, [("id", True)], {}).collect()[0]["__tv"]
    # N=4, band [int(4*.05), int(4*.5)] = [0, 2]: world/spark (df 3) are out
    assert list(tv["cl"]) == ["alpha", "beta", "hello", "index", "query"]
    assert list(tv["rl"]) == ["d1", "d2", "d3", "d4"]

    def tfidf(tf, df):
        return math.sqrt(tf) * (math.log((4 + 1) / (df + 1)) + 1.0)

    m = [list(r) for r in tv["m"]]
    assert m[0] == pytest.approx([0, 0, tfidf(2, 1), 0, 0], abs=1e-12)
    assert m[1] == pytest.approx([0, 0, 0, 0, tfidf(1, 2)], abs=1e-12)
    assert m[2] == pytest.approx([0, 0, 0, tfidf(1, 2), tfidf(1, 2)], abs=1e-12)
    assert m[3] == pytest.approx(
        [tfidf(1, 1), tfidf(1, 1), 0, tfidf(1, 2), 0], abs=1e-12
    )


def test_term_vectors_named_params(spark):
    docs = spark.createDataFrame(
        [
            ("d1", ["aa", "hello", "worldly"]),
            ("d2", ["hello", "worldly"]),
            ("d3", ["hello", "index"]),
        ],
        "id string, terms array<string>",
    )
    # minTermLength drops "aa"; exclude drops "worldly"; minDocFreq=0.5
    # keeps only df >= 1 (int(3*0.5)=1) and maxDocFreq=1.0 keeps all
    tv = SE._term_vectors_cell(
        docs,
        [("id", True)],
        {"minTermLength": "3", "exclude": "world", "minDocFreq": "0.5", "maxDocFreq": "1.0"},
    ).collect()[0]["__tv"]
    assert list(tv["cl"]) == ["hello", "index"]


def test_top_features_with_labels(spark):
    row = apply_let(
        spark.range(1),
        "let(m=setColumnLabels(matrix(array(1, 5, 3), array(9, 2, 4)), "
        "array('a', 'b', 'c')), t=topFeatures(m, 2))",
    ).collect()[0]
    assert [list(r) for r in row["t"]] == [["b", "c"], ["a", "c"]]


def test_term_vectors_in_expression_language(spark):
    """The reference workflow shape: search → select(split as terms) →
    termVectors → topFeatures, all from one expression string."""
    out = run_stream_expr(
        spark,
        SF,
        'let(a=select(search(documents, q="table hash", fl="doc_id,text,score", '
        'sort="doc_id asc", rows="20"), '
        "\"split(text, ' ') as terms\", \"doc_id as id\", \"score\"), "
        "tv=termVectors(a, minDocFreq=0.1, maxDocFreq=0.9), "
        "t=topFeatures(tv, 3), "
        "n=columnCount(tv), "
        'echo="t,n")',
    ).collect()[0]
    assert out.n > 0
    assert len(out.t) == 20
    assert all(1 <= len(feats) <= 3 for feats in out.t)
