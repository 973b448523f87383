"""Round-4 local-params types: {!join} (Score)JoinQParserPlugin, {!terms},
{!switch}, {!parent}/{!child} nested-docs parsers, and routing of
{!surround}/{!complexphrase}/{!xmlparser} onto the existing parsers.

Reference: solr/core/src/java/org/apache/solr/search/JoinQParserPlugin.java:63
(+ ScoreJoinQParserPlugin.java:57 for score=), TermsQParserPlugin.java:71,
SwitchQParserPlugin.java:144, BlockJoinParentQParserPlugin.java:30 /
BlockJoinChildQParserPlugin.java:27 (Solr nested docs keep the block root in
the `_root_` field — solr/core/src/java/org/apache/solr/update/
AddUpdateCommand.java:160 flattening), QParserPlugin.java standardPlugins.
"""

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.search.localparams import local_query


def _hits(df):
    return {(r.segment_id, r.doc_id): float(r.score) for r in df.collect()}


@pytest.fixture(scope="module")
def searcher(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    d, _ = tiny_index
    return IndexSearcher(spark, d, analyzer="code")


@pytest.fixture(scope="module")
def tiny_docs(spark, tiny_index):
    d, _ = tiny_index
    return spark.read.parquet(d + "/docs")


# ---------------------------------------------------------------- {!join}


def test_join_default_score_none_is_semi_join(searcher, tiny_docs):
    res = _hits(
        local_query("{!join from=repo to=repo}parse AND http", searcher=searcher)
    )
    from_hits = searcher.search("parse AND http", k=None)
    vals = {
        r.repo
        for r in from_hits.join(tiny_docs, ["segment_id", "doc_id"])
        .select("repo")
        .collect()
    }
    assert vals  # non-trivial fixture
    expect = {
        (r.segment_id, r.doc_id)
        for r in tiny_docs.filter(F.col("repo").isin(*vals))
        .select("segment_id", "doc_id")
        .collect()
    }
    assert set(res) == expect
    # superset of the from-side hits (self-join on the same field)
    assert {(s, d) for (s, d) in _hits(from_hits)} <= expect
    # ScoreMode.None: constant score
    assert set(res.values()) == {1.0}


@pytest.mark.parametrize("mode", ["max", "avg", "total", "min"])
def test_join_score_modes_aggregate_from_side(searcher, tiny_docs, mode):
    res = _hits(
        local_query(
            f"{{!join from=repo to=repo score={mode}}}parse AND http",
            searcher=searcher,
        )
    )
    rows = (
        searcher.search("parse AND http", k=None)
        .join(tiny_docs, ["segment_id", "doc_id"])
        .select("repo", "score")
        .collect()
    )
    per_val = {}
    for r in rows:
        per_val.setdefault(r.repo, []).append(float(r.score))
    agg = {
        "max": max,
        "min": min,
        "total": sum,
        "avg": lambda v: sum(v) / len(v),
    }[mode]
    want = {v: agg(s) for v, s in per_val.items()}
    to_rows = tiny_docs.filter(F.col("repo").isin(*want.keys())).select(
        "segment_id", "doc_id", "repo"
    ).collect()
    expect = {(r.segment_id, r.doc_id): want[r.repo] for r in to_rows}
    assert set(res) == set(expect)
    for k in expect:
        assert res[k] == pytest.approx(expect[k], rel=1e-9)


def test_join_validates_fields_and_needs_searcher(searcher):
    with pytest.raises(ValueError, match="needs a searcher"):
        local_query("{!join from=repo to=repo}x")
    with pytest.raises(ValueError, match="nosuch"):
        local_query("{!join from=nosuch to=repo}parse", searcher=searcher)
    with pytest.raises(ValueError, match="from=.*to="):
        local_query("{!join}parse", searcher=searcher)
    with pytest.raises(ValueError, match="score"):
        local_query(
            "{!join from=repo to=repo score=bogus}parse", searcher=searcher
        )


def test_join_from_searcher_cross_index(spark, tiny_corpus, tmp_path, searcher, tiny_docs):
    """fromIndex role: query one index, filter another via the joined field."""
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    sub = spark.createDataFrame(tiny_corpus.iloc[:50])
    d2 = str(tmp_path / "sub")
    build_index(spark, sub, d2, num_segments=2, analyzer="code")
    s2 = IndexSearcher(spark, d2, analyzer="code")
    res = _hits(
        local_query(
            "{!join from=repo to=repo}parse AND http",
            searcher=searcher,
            from_searcher=s2,
        )
    )
    docs2 = spark.read.parquet(d2 + "/docs")
    vals = {
        r.repo
        for r in s2.search("parse AND http", k=None)
        .join(docs2, ["segment_id", "doc_id"])
        .select("repo")
        .collect()
    }
    expect = {
        (r.segment_id, r.doc_id)
        for r in tiny_docs.filter(F.col("repo").isin(*vals))
        .select("segment_id", "doc_id")
        .collect()
    }
    assert set(res) == expect and expect


# --------------------------------------------------------------- {!terms}


def test_terms_frame_path(spark):
    df = spark.createDataFrame(
        [("a", 1), ("b", 2), ("c", 3)], "k string, v int"
    )
    kept = local_query("{!terms f=k}a,c", frame=df)
    assert sorted(r.k for r in kept.collect()) == ["a", "c"]
    # custom separator
    kept2 = local_query("{!terms f=k separator=|}b|c", frame=df)
    assert sorted(r.k for r in kept2.collect()) == ["b", "c"]
    with pytest.raises(ValueError, match="nosuch"):
        local_query("{!terms f=nosuch}a", frame=df)
    with pytest.raises(ValueError, match="f="):
        local_query("{!terms}a", frame=df)


def test_terms_searcher_path_verbatim(searcher):
    """TermsQParserPlugin bypasses analysis: raw term values, no lowercase."""
    from lucene_solr_spark.search.query import TermInSetQuery

    res = _hits(local_query("{!terms f=content}parse,http", searcher=searcher))
    want = _hits(
        searcher.search_many(
            {0: TermInSetQuery(set_terms=("parse", "http"))}, k=None
        ).drop("qid")
    )
    assert res == want and res
    # raw: an upper-case value matches nothing in the lowercased dictionary
    assert not local_query("{!terms f=content}PARSE", searcher=searcher).collect()


# -------------------------------------------------------------- {!switch}


def test_switch_selects_case_and_recurses(spark):
    df = spark.createDataFrame([(1.0,), (4.0,), (9.0,)], "x double")
    q = (
        "{!switch case.hi='{!frange l=4}x' case.lo='{!frange u=4}x' "
        "default='{!func}x'}hi"
    )
    assert sorted(r.x for r in local_query(q, frame=df).collect()) == [4.0, 9.0]
    q2 = q[:-2] + "lo"
    assert sorted(r.x for r in local_query(q2, frame=df).collect()) == [1.0, 4.0]
    # unmatched body -> default
    q3 = q[:-2] + "zz"
    assert {r.score for r in local_query(q3, frame=df).collect()} == {1.0, 4.0, 9.0}
    # empty/whitespace body -> the `case` param (SwitchQParserPlugin.java:144)
    q4 = "{!switch case='{!frange u=1}x' default='{!func}x'}  "
    assert [r.x for r in local_query(q4, frame=df).collect()] == [1.0]
    with pytest.raises(ValueError, match="switch"):
        local_query("{!switch case.a='{!func}x'}zz", frame=df)


# ------------------------------------------------- {!parent} / {!child}


@pytest.fixture(scope="module")
def nested(spark):
    # Solr nested docs: every row carries its block root in `_root_`
    rows = [
        # (_root_, is_parent, tag, x)
        ("r1", 1, "p", 0.0),
        ("r1", 0, "c", 3.0),
        ("r1", 0, "c", 9.0),
        ("r2", 1, "p", 0.0),
        ("r2", 0, "c", 1.0),
        ("r3", 1, "p", 0.0),  # childless parent
        ("r4", 1, "p", 0.0),
        ("r4", 0, "c", 7.0),
    ]
    return spark.createDataFrame(
        rows, "_root_ string, is_parent int, tag string, x double"
    )


def test_parent_filters_blocks_by_child_match(nested):
    res = local_query(
        "{!parent which='is_parent = 1'}x >= 3", frame=nested
    ).collect()
    assert sorted(r._root_ for r in res) == ["r1", "r4"]
    assert all(r.is_parent == 1 for r in res)
    # every parent row scores 1.0 (ScoreMode.None)
    assert {float(r.score) for r in res} == {1.0}


def test_parent_score_modes_aggregate_children(nested):
    # an unscored child query (a filter) contributes 1.0 per matching child,
    # so score=total counts matching children (ToParentBlockJoinQuery's
    # ScoreMode over constant-scoring child scorers)
    res = {
        r._root_: float(r.score)
        for r in local_query(
            "{!parent which='is_parent = 1' score=total}{!frange l=3}x",
            frame=nested,
        ).collect()
    }
    assert res == {"r1": 2.0, "r4": 1.0}
    # a scored child query ({!func}) aggregates its score column
    res2 = {
        r._root_: float(r.score)
        for r in local_query(
            "{!parent which='is_parent = 1' score=max}{!func}x",
            frame=nested,
        ).collect()
    }
    assert res2 == {"r1": 9.0, "r2": 1.0, "r4": 7.0}


def test_child_emits_children_of_matching_parents(nested):
    res = local_query(
        "{!child of='is_parent = 1'}_root_ in ('r1', 'r3')", frame=nested
    ).collect()
    assert all(r.is_parent == 0 for r in res)
    assert sorted(float(r.x) for r in res) == [3.0, 9.0]  # r3 has no children


def test_parent_child_require_root_column(spark):
    df = spark.createDataFrame([(1,)], "a int")
    with pytest.raises(ValueError, match="_root_"):
        local_query("{!parent which='a=1'}a=1", frame=df)
    with pytest.raises(ValueError, match="_root_"):
        local_query("{!child of='a=1'}a=1", frame=df)


# ------------------------------------------- parser routing (searcher)


def test_surround_routing(searcher):
    from lucene_solr_spark.search.surround import parse_surround

    res = _hits(local_query("{!surround}20N(parse, http)", searcher=searcher))
    want = _hits(
        searcher.search_many(
            {0: parse_surround("20N(parse, http)", searcher=searcher)}, k=None
        ).drop("qid")
    )
    assert res == want and res


def test_complexphrase_routing(searcher):
    from lucene_solr_spark.search.queryparser import parse_complex_phrase

    body = '"pars* value"~5'
    res = _hits(local_query("{!complexphrase}" + body, searcher=searcher))
    want = _hits(
        searcher.search_many(
            {0: parse_complex_phrase(searcher, body, in_order=True)}, k=None
        ).drop("qid")
    )
    assert res == want and res
    # inOrder=false widens (unordered near)
    res2 = _hits(
        local_query("{!complexphrase inOrder=false}" + body, searcher=searcher)
    )
    want2 = _hits(
        searcher.search_many(
            {0: parse_complex_phrase(searcher, body, in_order=False)}, k=None
        ).drop("qid")
    )
    assert res2 == want2 and set(want) <= set(want2)


def test_xmlparser_routing(searcher):
    from lucene_solr_spark.search.xmlparser import parse_xml_query

    xml = "<BooleanQuery><Clause occurs='must'><TermQuery>parse</TermQuery></Clause></BooleanQuery>"
    res = _hits(local_query("{!xmlparser}" + xml, searcher=searcher))
    want = _hits(
        searcher.search_many(
            {0: parse_xml_query(xml, analyzer=searcher.analyzer)}, k=None
        ).drop("qid")
    )
    assert res == want and res


# ---------------------------------------------------------------- {!graph}


@pytest.fixture(scope="module")
def graph_frame(spark):
    """a → [b, c]; b → [d]; c → []; d → [a] (cycle back); e isolated."""
    rows = [
        ("a", ["b", "c"], 1),
        ("b", ["d"], 2),
        ("c", [], 3),
        ("d", ["a"], 4),
        ("e", None, 5),
    ]
    return spark.createDataFrame(rows, "node_id string, edge_ids array<string>, w int")


def _nodes(df):
    return sorted(r.node_id for r in df.collect())


def test_graph_full_traversal_terminates_on_cycle(graph_frame):
    out = local_query("{!graph}node_id = 'a'", frame=graph_frame)
    assert _nodes(out) == ["a", "b", "c", "d"]  # e unreachable; cycle stops


def test_graph_max_depth_counts_edge_hops(graph_frame):
    # GraphQuery.java:190-231: roots are depth 0, maxDepth = edge hops
    out = local_query("{!graph maxDepth=1}node_id = 'a'", frame=graph_frame)
    assert _nodes(out) == ["a", "b", "c"]
    out0 = local_query("{!graph maxDepth=0}node_id = 'a'", frame=graph_frame)
    assert _nodes(out0) == ["a"]


def test_graph_return_root_false(graph_frame):
    out = local_query(
        "{!graph returnRoot=false maxDepth=1}node_id = 'a'", frame=graph_frame
    )
    assert _nodes(out) == ["b", "c"]


def test_graph_only_leaf_nodes(graph_frame):
    out = local_query("{!graph onlyLeafNodes=true}node_id = 'a'", frame=graph_frame)
    assert _nodes(out) == ["c"]  # the only reachable doc with no edges


def test_graph_traversal_filter_prunes_hops_not_roots(graph_frame):
    # filter excludes b (w=2) from traversal; roots are exempt (GraphQuery
    # applies traversalFilter per-hop)
    out = local_query(
        "{!graph traversalFilter='w <> 2'}node_id = 'a'", frame=graph_frame
    )
    assert _nodes(out) == ["a", "c"]  # b pruned, so d never reached


def test_graph_scalar_to_field(spark):
    rows = [("a", "b"), ("b", "c"), ("c", None)]
    df = spark.createDataFrame(rows, "node_id string, edge_ids string")
    out = local_query("{!graph}node_id = 'a'", frame=df)
    assert _nodes(out) == ["a", "b", "c"]


def test_graph_unknown_field_raises(graph_frame):
    with pytest.raises(ValueError, match="not a column"):
        local_query("{!graph from=nope}node_id = 'a'", frame=graph_frame)


# -------------------------------------------------------------- {!collapse}


@pytest.fixture(scope="module")
def collapse_frame(spark):
    rows = [
        ("g1", 1.0, 10, 1), ("g1", 3.0, 5, 2), ("g2", 2.0, 7, 3),
        (None, 9.0, 1, 4), (None, 8.0, 2, 5),
    ]
    return spark.createDataFrame(rows, "grp string, score double, v int, id int")


def test_collapse_default_highest_score(collapse_frame):
    out = local_query("{!collapse field=grp}", frame=collapse_frame)
    assert sorted((r.grp, r.id) for r in out.collect()) == [("g1", 2), ("g2", 3)]


def test_collapse_min_field(collapse_frame):
    out = local_query("{!collapse field=grp min=v}", frame=collapse_frame)
    assert sorted((r.grp, r.id) for r in out.collect()) == [("g1", 2), ("g2", 3)]
    out2 = local_query("{!collapse field=grp max=v}", frame=collapse_frame)
    assert sorted((r.grp, r.id) for r in out2.collect()) == [("g1", 1), ("g2", 3)]


def test_collapse_null_policies(collapse_frame):
    # ignore (default): null-group docs dropped
    out = local_query("{!collapse field=grp}", frame=collapse_frame)
    assert all(r.grp is not None for r in out.collect())
    # expand: nulls pass through uncollapsed
    out_e = local_query(
        "{!collapse field=grp nullPolicy=expand}", frame=collapse_frame
    )
    assert sorted(r.id for r in out_e.collect()) == [2, 3, 4, 5]
    # collapse: all nulls form one group (best score wins)
    out_c = local_query(
        "{!collapse field=grp nullPolicy=collapse}", frame=collapse_frame
    )
    assert sorted(r.id for r in out_c.collect()) == [2, 3, 4]


def test_collapse_body_filters_first(collapse_frame):
    out = local_query("{!collapse field=grp}v > 5", frame=collapse_frame)
    assert sorted((r.grp, r.id) for r in out.collect()) == [("g1", 1), ("g2", 3)]


def test_collapse_requires_selector_without_score(spark):
    df = spark.createDataFrame([("g", 1)], "grp string, v int")
    with pytest.raises(ValueError, match="min=/max="):
        local_query("{!collapse field=grp}", frame=df)
