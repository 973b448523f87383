"""Physical-plan assertions — the scale contract, checked via explain().

At 100 TB these properties are the difference between O(query) and O(corpus):
- the postings read pushes the term predicate into the parquet scan
  (PushedFilters) and prunes blob columns for non-query terms (ReadSchema);
- the term-stats lookup is a pushdown point-read on the term-sorted table;
- dimension joins broadcast (no shuffle of the fact table);
- aggregations are partial+final (map-side combine).
"""

import io
import os
from contextlib import redirect_stdout

import pytest


def _plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_postings_scan_pushes_term_filter(spark, tiny_index):
    import pyspark.sql.functions as F

    index_dir, _ = tiny_index
    df = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter((F.col("kind") == 0) & F.col("term").isin("parse", "http"))
        .select("segment_id", "term", "doc_blob")
    )
    plan = _plan(df)
    assert "PushedFilters" in plan
    assert "In(term" in plan or "term" in plan.split("PushedFilters", 1)[1][:200]
    # column pruning: pos_blob et al. must NOT be read
    read_schema = plan.split("ReadSchema", 1)[1][:400]
    assert "pos_blob" not in read_schema
    assert "freq_blob" not in read_schema


def test_term_stats_scan_pushes_filter(spark, tiny_index):
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import latest_term_stats_dir

    index_dir, _ = tiny_index
    df = (
        spark.read.parquet(latest_term_stats_dir(index_dir))
        .filter(F.col("term").isin("parse", "http"))
        .select("term", "df")
    )
    plan = _plan(df)
    pushed = plan.split("PushedFilters", 1)[1][:200]
    assert "term" in pushed


def test_dimension_join_broadcasts(spark):
    from lucene_solr_spark.relational import hash_join_part_revenue

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(hash_join_part_revenue(spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_rollup_is_partial_final(spark):
    from lucene_solr_spark.relational import rollup_lineitem

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(rollup_lineitem(spark, sf))
    # two HashAggregate nodes (partial + final) around one exchange
    assert plan.count("HashAggregate") >= 2
    # lineitem scan reads only the needed columns
    read_schema = plan.split("ReadSchema", 1)[1][:500]
    assert "l_comment" not in read_schema


def test_shipdate_range_pushdown(spark):
    from lucene_solr_spark.relational import point_range_shipdate

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(point_range_shipdate(spark, sf))
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "l_shipdate" in pushed


def test_search_after_page_is_take_ordered(spark):
    """Deep paging must compile to TakeOrderedAndProject (per-partition
    top-N + tiny merge), never a full-table single-partition sort window
    (VERDICT round 1, finding 5)."""
    from lucene_solr_spark.relational import search_after_page2

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(search_after_page2(spark, sf))
    assert "TakeOrderedAndProject" in plan


def test_search_shuffles_only_topk(spark, tiny_index):
    """The per-segment search emits ≤ k rows per (query, segment) into the
    final rank window — verify the materialized intermediate is tiny."""
    from lucene_solr_spark.search import IndexSearcher

    index_dir, _ = tiny_index
    s = IndexSearcher(spark, index_dir, analyzer="code")
    hits = s.search_many({0: "parse", 1: "buffer OR stream"}, k=5)
    n = hits.count()
    n_segments = len(s.live)
    assert n <= 2 * 5  # k per query after the global limit
    assert n_segments >= 1


def test_sql_in_matches_isin_and_pushes_down(spark, tiny_index):
    """sql_in builds the IN predicate as one parsed expression (driver-side
    plan build was dominated by per-literal py4j calls for 1000-term
    batches); it must stay semantically identical to Column.isin — escaping
    included — and still reach the parquet scan as a pushed filter."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.index.read import sql_in

    df = spark.createDataFrame(
        [("a'b",), ("c\\d",), ("héllo",), ("plain",), ("other",)], "term string"
    )
    want = ["a'b", "c\\d", "héllo", "plain"]
    got_sql = sorted(r.term for r in df.filter(sql_in("term", want)).collect())
    got_isin = sorted(r.term for r in df.filter(F.col("term").isin(*want)).collect())
    assert got_sql == got_isin == sorted(want)
    # empty list: matches nothing (isin semantics)
    assert df.filter(sql_in("term", [])).count() == 0

    index_dir, _ = tiny_index
    plan = _plan(
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter((F.col("kind") == 0) & sql_in("term", ["parse", "http"]))
        .select("segment_id", "term")
    )
    assert "PushedFilters" in plan
    assert "In(term" in plan or "term" in plan.split("PushedFilters", 1)[1][:200]


def test_partitioned_windows_never_global(spark):
    """facet_pivot / moving_avg / spellcheck rank windows are PARTITIONED by
    their key — a Window without partitionBy funnels the table through one
    task (the round-1 search_after_page2 scale-killer, VERDICT finding 5)."""
    from lucene_solr_spark.relational import facet_pivot_orders, moving_avg_events
    from lucene_solr_spark.textops import spellcheck_suggest

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    for fn in (facet_pivot_orders, moving_avg_events, spellcheck_suggest):
        plan = _plan(fn(spark, sf))
        for line in plan.splitlines():
            if "Window" in line and "windowspecdefinition" in line.lower():
                assert "SinglePartition" not in line, (fn.__name__, line)
        # the window's exchange must be hash-partitioned, not a global sort
        assert "Exchange SinglePartition" not in plan, fn.__name__


def test_join_query_is_semi_join(spark):
    """{!join} compiles to a semi-join (child keys only), never an inner
    join that would duplicate parents per matching child."""
    from lucene_solr_spark.relational import join_query_orders

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(join_query_orders(spark, sf))
    assert "LeftSemi" in plan


def test_classify_model_join_broadcasts(spark):
    """The NB model (counts/priors) is the broadcast side; the test-token
    explode never shuffles for the model join."""
    from lucene_solr_spark.textops import classify_docs

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(classify_docs(spark, sf))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_block_join_parents_is_partial_final_rollup(spark):
    """ToParentBlockJoinQuery analogue: the child-score rollup must be
    partial+final (map-side combine on the FK), and the child scan must
    prune to the four columns it needs."""
    from lucene_solr_spark.relational import block_join_parents

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(block_join_parents(spark, sf))
    assert plan.count("HashAggregate") >= 2
    read_schema = plan.split("ReadSchema", 1)[1][:500]
    assert "l_comment" not in read_schema


def test_block_join_children_is_broadcast_semi(spark):
    """ToChildBlockJoinQuery analogue: selective parents broadcast into a
    semi-join — the lineitem fact table never shuffles."""
    from lucene_solr_spark.relational import block_join_children

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(block_join_children(spark, sf))
    assert "LeftSemi" in plan
    assert "BroadcastHashJoin" in plan


def test_monitor_match_is_shuffle_free(spark):
    """Percolation = one mapInPandas over the pruned (key, content) scan —
    no Exchange anywhere; at 100 TB the operator is embarrassingly parallel."""
    from lucene_solr_spark.monitor import Monitor

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    m = Monitor(analyzer="simple")
    m.register("q1", "spark AND vector")
    m.register("q2", '"table hash"')
    plan = _plan(m.match(docs))
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
    # column pruning: only the key + content columns are read
    read_schema = plan.split("ReadSchema", 1)[1][:200]
    assert "lang" not in read_schema and "source" not in read_schema


def test_spatial_bbox_is_take_ordered(spark):
    """Distance-sorted top-k must be TakeOrdered (per-partition top-k +
    single merge), never a global sort or single-partition window."""
    from lucene_solr_spark.relational import spatial_bbox

    plan = _plan(spatial_bbox(spark, "/root/testdata/sf0.001"))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan


def test_knn_classify_windows_are_partitioned(spark):
    """Both rank windows partition by the query id — parallel across query
    docs, never a global single-partition exchange."""
    from lucene_solr_spark.textops import knn_classify

    plan = _plan(knn_classify(spark, "/root/testdata/sf0.001"))
    assert "Window" in plan
    assert "SinglePartition" not in plan


def test_distributed_percolation_candidate_join_shuffles_not_crossjoin(spark):
    """The anchor join must be an equi-join (hash/sort-merge/broadcast),
    never a cartesian product over docs × queries."""
    from lucene_solr_spark.monitor import percolate_distributed

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    queries = spark.createDataFrame(
        [("q1", "spark AND vector"), ("q2", '"table hash"')],
        "query_id string, query string",
    )
    plan = _plan(
        percolate_distributed(queries, docs, analyzer="simple")
    )
    assert "CartesianProduct" not in plan
    assert "Join" in plan


def test_collapse_expand_is_paged_and_broadcast(spark):
    """Collapse/expand: head paging compiles to TakeOrderedAndProject (never
    a full global sort), the head window is partitioned by the collapse key,
    and the expand stage joins the ranked rows against the tiny paged head
    set as the BROADCAST side — at 100 TB the expansion touches only the
    paged groups."""
    from lucene_solr_spark.relational import collapse_expand_orders

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(collapse_expand_orders(spark, sf))
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastHashJoin" in plan
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line.lower():
            assert "SinglePartition" not in line, line


def test_frange_stays_jvm_side(spark):
    """The {!frange} computed-expression predicate evaluates inside
    WholeStageCodegen — no Python eval, and the aggregation is
    partial+final (map-side combine)."""
    from lucene_solr_spark.relational import frange_lineitem

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(frange_lineitem(spark, sf))
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final
    assert "partial_sum" in plan  # map-side combine before the exchange


def test_ltr_rescore_broadcasts_candidates(spark):
    """LTRScoringQuery analogue: the ≤N-candidate set broadcasts into the
    docs relation for feature extraction — the corpus never shuffles, and
    the linear model is constant-folded (no Python eval in the plan)."""
    from lucene_solr_spark.textops import ltr_rescore

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(ltr_rescore(spark, sf))
    assert "BroadcastHashJoin" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_json_facet_subfacet_broadcasts_parents(spark):
    """The nested subfacet re-aggregates only surviving parent buckets via a
    broadcast join (≤limit keys), and its top-k window is per-parent."""
    from lucene_solr_spark.relational import json_facet_orders

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(json_facet_orders(spark, sf))
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan


def test_function_score_rank_pushes_term_filter(spark):
    """The relevance frame reads ONLY the query term's posting rows — the
    term filter reaches the parquet scan."""
    from lucene_solr_spark.textops import function_score_rank

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(function_score_rank(spark, sf))
    assert "PushedFilters" in plan
    assert "TakeOrderedAndProject" in plan  # top-15 never a global sort


def test_spatial_polygon_stays_jvm_side(spark):
    """The crossing-sum predicate compiles into WholeStageCodegen — no
    Python stage anywhere in the polygon filter."""
    from lucene_solr_spark.relational import spatial_polygon

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(spatial_polygon(spark, sf))
    assert "[codegen id :" in plan  # the filter runs inside a codegen stage
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_phonetic_suggest_broadcasts_inputs(spark):
    from lucene_solr_spark.textops import phonetic_suggest

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(phonetic_suggest(spark, sf))
    # the handful of typed inputs broadcast against the dictionary — the
    # dictionary side (the big side at 100 TB) never shuffles for the join
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_score_nodes_stats_join_not_cross(spark):
    from lucene_solr_spark.graph import score_nodes_parts

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(score_nodes_parts(spark, sf))
    # gather-count x corpus-docFreq is an equi-join (broadcast or shuffled
    # hash — AQE's call), never a nested-loop cross join
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # partial+final aggregation for the corpus docFreq side
    assert plan.count("HashAggregate") >= 2


def test_igain_counts_are_partial_final_and_take_ordered(spark):
    from lucene_solr_spark.textops import features_igain_docs

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(features_igain_docs(spark, sf))
    # top-N by score is TakeOrdered (never a global single-partition window)
    assert "TakeOrderedAndProject" in plan
    assert plan.count("HashAggregate") >= 2


def test_blended_infix_windows_are_partitioned(spark):
    from lucene_solr_spark.textops import blended_infix_suggest

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(blended_infix_suggest(spark, sf))
    # per-input top-5 window partitions by input; no global empty-key window
    assert "WindowGroupLimit" in plan or "Window" in plan
    assert "CartesianProduct" not in plan  # inputs broadcast


def test_spatial_polygon_set_is_grid_pruned_broadcast(spark):
    """LatLonShape-role polygon set: the cell IN-list prune sits in the scan
    filter (OUTSIDE cells never reach the join), the cell-classification
    frame broadcasts, and the whole thing stays JVM-side."""
    from lucene_solr_spark.relational import spatial_polygon_set

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(spatial_polygon_set(spark, sf))
    assert "cell" in plan and (" IN " in plan or "isin" in plan.lower()
                               or "cell#" in plan)
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def test_text_tagger_no_sub_keeps_equi_anti_join(spark):
    """NO_SUB containment must plan as a doc_id-keyed anti-join (hash/SMJ
    with the containment as residual), never a nested-loop product."""
    from lucene_solr_spark.textops import text_tagger

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(text_tagger(spark, sf))
    assert "LeftAnti" in plan
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_json_facet_partial_aggregation(spark, tiny_index):
    """Facet groupBys must map-side combine (partial_count before the
    exchange) and the sub-facet window must be partitioned."""
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.jsonfacet import json_facets

    s = IndexSearcher(spark, tiny_index[0], analyzer="code")
    out = json_facets(
        {
            "query": "parse",
            "facet": {
                "r": {
                    "type": "terms",
                    "field": "repo",
                    "limit": 2,
                    "facet": {
                        "p": {"type": "terms", "field": "path", "limit": 2}
                    },
                }
            },
        },
        searcher=s,
    )
    top = _plan(out["r"])
    assert "partial_count" in top
    sub = _plan(out["r.p"])
    assert "partial_count" in sub
    # per-parent rank: a partitioned window, not a global sort
    assert "Window" in sub
    assert "partitionBy" not in sub or "repo" in sub


def test_repetition_filter_partial_aggregation(spark):
    from lucene_solr_spark.textops import repetition_filter

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    plan = _plan(repetition_filter(spark, sf))
    assert "partial_count" in plan
    assert "CartesianProduct" not in plan
