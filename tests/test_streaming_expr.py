"""Streaming-expression LANGUAGE (StreamExpressionParser +
StreamFactory role): expression strings compile to the same results as
hand-built DataFrames; parser edge cases; sorted-stream contract."""

import os

import pytest

import pyspark.sql.functions as F

from lucene_solr_spark.streaming_expr import (
    parse_stream_expr,
    run_stream_expr,
)

SF = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_parser_shapes():
    e = parse_stream_expr(
        'rollup(search(lineitem, q="l_quantity:[45 TO *]", fl="l_returnflag,l_quantity"),'
        ' over="l_returnflag", sum(l_quantity), count(*))'
    )
    assert e.name == "rollup" and e.named["over"] == "l_returnflag"
    assert e.pos[0].name == "search" and e.pos[0].pos == ["lineitem"]
    assert [p.name for p in e.pos[1:]] == ["sum", "count"]
    # escapes in quoted strings
    e2 = parse_stream_expr('search(orders, q="o_comment:a\\"b")')
    assert e2.named["q"] == 'o_comment:a"b'
    with pytest.raises(ValueError):
        parse_stream_expr("rollup(search(lineitem)")  # unbalanced
    # unknown names parse (the grammar is generic) but refuse to compile
    with pytest.raises(ValueError):
        run_stream_expr(None, SF, "nosuchstream(x)")


def test_search_q_syntax(spark):
    from lucene_solr_spark.relational import _t

    got = run_stream_expr(
        spark,
        SF,
        'search(lineitem, q="l_quantity:[45 TO *] -l_returnflag:A", '
        'fl="l_orderkey,l_quantity,l_returnflag")',
    )
    want = (
        _t(spark, SF, "lineitem")
        .filter((F.col("l_quantity") >= 45) & (F.col("l_returnflag") != "A"))
        .select("l_orderkey", "l_quantity", "l_returnflag")
    )
    assert _rows(got) == _rows(want)
    # exclusive upper bound + equality clause
    got2 = run_stream_expr(
        spark, SF, 'search(orders, q="o_orderstatus:O o_totalprice:{* TO 50000}", fl="o_orderkey")'
    )
    want2 = (
        _t(spark, SF, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") < 50000))
        .select("o_orderkey")
    )
    assert _rows(got2) == _rows(want2)


def test_rollup_having_select_pipeline(spark):
    from lucene_solr_spark.relational import _t

    got = run_stream_expr(
        spark,
        SF,
        'select(having(rollup(search(lineitem, q="*:*"), over="l_returnflag",'
        " sum(l_quantity), count(*)), gt(count(*), 100)),"
        ' "l_returnflag", "sum(l_quantity) as total", "count(*) as n")',
    )
    want = (
        _t(spark, SF, "lineitem")
        .groupBy("l_returnflag")
        .agg(F.sum("l_quantity").alias("total"), F.count("*").alias("n"))
        .filter(F.col("n") > 100)
    )
    assert _rows(got) == _rows(want)


def test_facet_stats_and_joins(spark):
    from lucene_solr_spark.relational import _t

    got = run_stream_expr(
        spark,
        SF,
        'facet(customer, buckets="c_mktsegment", bucketSorts="count(*) desc,c_mktsegment asc",'
        " bucketSizeLimit=3, count(*), avg(c_acctbal))",
    )
    rows = got.collect()
    assert len(rows) == 3
    counts = [r["count(*)"] for r in rows]
    assert counts == sorted(counts, reverse=True)

    st = run_stream_expr(
        spark, SF, "stats(lineitem, sum(l_quantity), min(l_quantity), max(l_quantity))"
    ).first()
    li = _t(spark, SF, "lineitem")
    agg = li.agg(F.sum("l_quantity"), F.min("l_quantity"), F.max("l_quantity")).first()
    assert tuple(st) == tuple(agg)

    joined = run_stream_expr(
        spark,
        SF,
        'innerJoin(search(orders, fl="o_orderkey,o_custkey"),'
        ' search(customer, fl="c_custkey,c_mktsegment"), on="o_custkey=c_custkey")',
    )
    want = (
        _t(spark, SF, "orders")
        .select("o_orderkey", "o_custkey")
        .join(
            _t(spark, SF, "customer")
            .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment"),
            "o_custkey",
        )
    )
    assert joined.count() == want.count()


def test_unique_needs_sorted_stream_and_takes_first(spark):
    from lucene_solr_spark.relational import _t

    with pytest.raises(ValueError):
        run_stream_expr(spark, SF, 'unique(search(orders), over="o_custkey")')
    got = run_stream_expr(
        spark,
        SF,
        'unique(search(orders, sort="o_totalprice desc", '
        'fl="o_custkey,o_orderkey,o_totalprice"), over="o_custkey")',
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc())
    want = (
        _t(spark, SF, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .drop("rk")
    )
    # compare per-custkey max price (orderkey ties can differ — Solr's
    # comparator would also need a tiebreak field to be deterministic)
    assert _rows(got.select("o_custkey", "o_totalprice")) == _rows(
        want.select("o_custkey", "o_totalprice")
    )


def test_top_merge_parallel(spark):
    got = run_stream_expr(
        spark,
        SF,
        'parallel(4, top(merge(search(region, fl="r_name"), search(nation, fl="n_name as r_name"),'
        ' on="r_name asc"), n=5, sort="r_name asc"))',
    )
    rows = [r.r_name for r in got.collect()]
    assert rows == sorted(rows) and len(rows) == 5


def test_search_free_text_routes_to_ft_engine(spark):
    """search(documents, q="<free text>") runs the BM25 engine (the real
    CloudSolrStream contract), scores join the stored fields, order is the
    searcher's score-desc total order."""
    from lucene_solr_spark.textops import _ft_search_all

    got = run_stream_expr(
        spark, SF, 'search(documents, q="table hash", fl="doc_id,score,lang", rows=10)'
    )
    rows = got.collect()
    assert 0 < len(rows) <= 10
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)
    want = {
        (r.doc_id, r.score)
        for r in _ft_search_all(spark, SF, "table hash").collect()
    }
    assert {(r.doc_id, r.score) for r in rows} <= want


def test_update_head_sinks_tuples(spark, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("upd") / "out")
    got = run_stream_expr(
        spark,
        SF,
        f'update(search(region, fl="r_regionkey,r_name"), dest="{dest}")',
    )
    assert got.count() == 5
    assert _rows(spark.read.parquet(dest)) == _rows(got)


def test_timeseries_cartesian_fetch_nodes(spark):
    from lucene_solr_spark.relational import _t

    ts = run_stream_expr(
        spark,
        SF,
        'timeseries(events, field="ts", start="2024-01-01T00:00:00Z",'
        ' end="2024-01-29T00:00:00Z", gap="+7DAYS", count(*), sum(value))',
    )
    rows = ts.collect()
    assert len(rows) == 4  # four full weeks
    assert sum(r["count(*)"] for r in rows) == (
        _t(spark, SF, "events")
        .filter("ts >= timestamp'2024-01-01' AND ts < timestamp'2024-01-29'")
        .count()
    )

    cp = run_stream_expr(
        spark,
        SF,
        'cartesianProduct(select(search(region, fl="r_regionkey"),'
        ' "r_regionkey", "array(r_regionkey, r_regionkey) as pair"), "pair")',
    )
    assert cp.count() == 10  # 5 regions x 2 elements each

    f = run_stream_expr(
        spark,
        SF,
        'fetch(customer, search(orders, fl="o_orderkey,o_custkey", rows=20,'
        ' sort="o_orderkey asc"), on="o_custkey=c_custkey", fl="c_mktsegment")',
    )
    assert f.count() == 20 and "c_mktsegment" in f.columns
    assert f.filter(F.col("c_mktsegment").isNull()).count() == 0

    n = run_stream_expr(
        spark,
        SF,
        'nodes(orders, search(customer, q="c_mktsegment:BUILDING", fl="c_custkey"),'
        ' walk="c_custkey->o_custkey", gather="o_orderkey")',
    )
    want = (
        _t(spark, SF, "orders")
        .join(
            _t(spark, SF, "customer")
            .filter("c_mktsegment = 'BUILDING'")
            .select(F.col("c_custkey").alias("o_custkey")),
            "o_custkey",
        )
        .select("o_orderkey")
        .distinct()
    )
    assert n.count() == want.count()
