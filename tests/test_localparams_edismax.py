"""{!edismax}/{!dismax} local-params dispatch onto EDisMaxSearcher.

Reference: solr/core/src/java/org/apache/solr/search/DisMaxQParserPlugin
.java:40 and ExtendedDismaxQParser.java:129 — the {!type} syntax selects the
parser and its local params carry qf/mm/tie/pf/ps/pf2/ps2/pf3/ps3/bq/bf/
boost. Per-field indexes are fixed at EDisMaxSearcher construction; qf
re-weights and RESTRICTS that set (a field with no configured index is a
loud error, same contract as {!lucene}'s df= refusal).
"""

import copy

import pytest

from lucene_solr_spark.search.edismax import EDisMaxSearcher
from lucene_solr_spark.search.localparams import local_query


@pytest.fixture(scope="module")
def eds(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    corpus = synth_corpus_local(150)
    corpus = corpus.assign(
        title=corpus["path"].str.replace(r"[/.]", " ", regex=True)
    )
    docs = spark.createDataFrame(corpus)
    root = tmp_path_factory.mktemp("lpedm")
    d_body, d_title = str(root / "body"), str(root / "title")
    build_index(spark, docs, d_body, num_segments=3, analyzer="code",
                content_col="content")
    build_index(spark, docs, d_title, num_segments=3, analyzer="code",
                content_col="title")
    return EDisMaxSearcher(
        spark,
        {"body": (d_body, 1.0), "title": (d_title, 2.0)},
        analyzer="code",
        precision="f64",
        tie=0.3,
    )


def _h(df):
    return {(r.segment_id, r.doc_id): float(r.score) for r in df.collect()}


def test_edismax_dispatch_equals_direct(eds):
    got = _h(local_query("{!edismax mm=2}parse buffer store", searcher=eds))
    want = _h(eds.search("parse buffer store", mm="2", k=None))
    assert got == want and got


def test_edismax_qf_reweights_and_restricts(eds, spark):
    got = _h(local_query("{!edismax qf='body^3'}parse", searcher=eds))
    solo = EDisMaxSearcher(
        spark,
        {"body": (eds.searchers["body"].index_dir, 3.0)},
        analyzer="code",
        precision="f64",
        tie=0.3,
    )
    want = _h(solo.search("parse", k=None))
    assert got == want and got
    # the dispatched qf override must not mutate the shared searcher
    assert set(eds.boosts) == {"body", "title"} and eds.boosts["title"] == 2.0
    assert set(eds.searchers) == {"body", "title"}
    with pytest.raises(ValueError, match="nosuch"):
        local_query("{!edismax qf='nosuch^2'}parse", searcher=eds)


def test_edismax_tie_and_pf_params(eds):
    got = _h(
        local_query(
            "{!edismax tie=0.0 pf='body^2' ps=1}parse buffer", searcher=eds
        )
    )
    e2 = copy.copy(eds)
    e2.tie = 0.0
    want = _h(e2.search("parse buffer", pf={"body": 2.0}, ps=1, k=None))
    assert got == want and got
    assert eds.tie == 0.3  # untouched


def test_dismax_rejects_edismax_only_params(eds):
    with pytest.raises(ValueError, match="pf2"):
        local_query("{!dismax pf2='body^2'}parse buffer", searcher=eds)
    got = _h(local_query("{!dismax mm=1}parse buffer", searcher=eds))
    want = _h(eds.search("parse buffer", mm="1", k=None))
    assert got == want and got


def test_edismax_needs_edismax_searcher(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    s = IndexSearcher(spark, d, analyzer="code")
    with pytest.raises(ValueError, match="EDisMaxSearcher"):
        local_query("{!edismax}parse", searcher=s)


def test_multivalued_bq_params(eds):
    """Repeated bq= local params (Solr's genuinely multi-valued boost
    queries) must flatten into the bq list, not nest."""
    both = local_query("{!edismax bq=parse bq=http}buffer", searcher=eds)
    one = local_query("{!edismax bq=parse}buffer", searcher=eds)
    h_both = {(r.segment_id, r.doc_id): r.score for r in both.collect()}
    h_one = {(r.segment_id, r.doc_id): r.score for r in one.collect()}
    assert set(h_both) == set(h_one)
    assert any(h_both[k] > h_one[k] for k in h_both)  # the second bq adds


def test_repeated_scalar_param_raises(eds):
    with pytest.raises(ValueError, match="more than once"):
        local_query("{!edismax mm=1 mm=2}buffer", searcher=eds)
