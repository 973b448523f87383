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


# ---------------------------------------------------------------------------
# round 4: the full Lang.java head registry


def test_intersect_complement_reduce_distinct(spark):
    from lucene_solr_spark.relational import _t

    has = run_stream_expr(
        spark,
        SF,
        'intersect(search(customer, fl="c_custkey"),'
        ' search(orders, fl="o_custkey"), on="c_custkey=o_custkey")',
    )
    hasnt = run_stream_expr(
        spark,
        SF,
        'complement(search(customer, fl="c_custkey"),'
        ' search(orders, fl="o_custkey"), on="c_custkey=o_custkey")',
    )
    total = _t(spark, SF, "customer").count()
    assert has.count() + hasnt.count() == total
    assert has.join(hasnt, "c_custkey").count() == 0

    # reduce(distinct()) = first tuple per key in stream sort order
    rd = run_stream_expr(
        spark,
        SF,
        'reduce(search(orders, sort="o_totalprice desc,o_orderkey asc",'
        ' fl="o_custkey,o_orderkey,o_totalprice"), by="o_custkey", distinct())',
    )
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    want = (
        _t(spark, SF, "orders")
        .select("o_custkey", "o_orderkey", "o_totalprice")
        .withColumn("rk", F.row_number().over(w))
        .filter("rk = 1")
        .drop("rk")
    )
    assert _rows(rd) == _rows(want)


def test_ml_chain_train_model_classify(spark, tmp_path_factory):
    """features → train → update(dest) → model(id) → classify: the TextLogit
    chain end-to-end from one expression string each, with the classify
    scores re-derived by hand from the stored model tuple."""
    import math
    import re as _re

    dest = str(tmp_path_factory.mktemp("mdl") / "models")
    trained = run_stream_expr(
        spark,
        SF,
        f'update(train(documents, features(documents, field="text",'
        f' outcome="lang:en", numTerms=4), field="text", outcome="lang:en",'
        f' maxIterations=2, name="m1"), dest="{dest}")',
    )
    rows = trained.orderBy("iteration_i").collect()
    assert [r.iteration_i for r in rows] == [1, 2]
    assert len(rows[0].weights_ds) == 5  # intercept + 4 terms
    assert len(rows[0].terms_ss) == 4

    m = run_stream_expr(spark, SF, f'model("{dest}", id="m1")').collect()
    assert len(m) == 1 and m[0].iteration_i == 2

    got = run_stream_expr(
        spark,
        SF,
        f'classify(model("{dest}", id="m1"), search(documents, q="lang:de",'
        f' fl="doc_id,text"), field="text")',
    )
    out = sorted((r.doc_id, r.score_d, r.probability_d, r.text) for r in got.collect())
    assert out
    mrow = m[0]
    idx = {
        t: (w, i)
        for t, w, i in zip(mrow.terms_ss, mrow.weights_ds[1:], mrow.idfs_ds)
    }
    for doc_id, score, prob, text in out[:5]:
        tf = {}
        for t in _re.findall(r"[a-z0-9]+", text.lower()):
            if t in idx:
                tf[t] = tf.get(t, 0) + 1
        z = mrow.weights_ds[0] + sum(
            idx[t][1] * (1.0 + math.log(c)) * idx[t][0] for t, c in tf.items()
        )
        assert abs(score - z) < 1e-3
        assert abs(prob - 1.0 / (1.0 + math.exp(-z))) < 1e-3


def test_shortest_path_expr(spark, tmp_path):
    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("b", "d"), ("c", "d"), ("d", "e"), ("a", "x")],
        "src string, dst string",
    )
    edges.write.mode("overwrite").parquet(str(tmp_path / "g.parquet"))
    got = run_stream_expr(
        spark,
        str(tmp_path),
        'shortestPath(g, from="a", to="d", edge="src=dst", maxDepth=4)',
    ).collect()
    assert sorted(tuple(r.path) for r in got) == [("a", "b", "d"), ("a", "c", "d")]
    assert {r.dist for r in got} == {2}
    # unreachable (directed) within maxDepth → empty
    none = run_stream_expr(
        spark,
        str(tmp_path),
        'shortestPath(g, from="e", to="a", edge="src=dst", maxDepth=3)',
    )
    assert none.count() == 0


def test_small_heads(spark):
    assert run_stream_expr(spark, SF, "echo(hello)").collect()[0].echo == "hello"

    lst = run_stream_expr(
        spark, SF, 'list(search(region, fl="r_name"), search(nation, fl="n_name as r_name"))'
    )
    assert lst.count() == 30

    nul = run_stream_expr(spark, SF, "null(search(region))").collect()
    assert nul[0].nullCount == 5

    # priority: high-priority stream empty → low drains; else high wins
    assert (
        run_stream_expr(
            spark, SF, 'priority(search(region, q="r_regionkey:[99 TO *]"), search(nation))'
        ).count()
        == 25
    )
    assert run_stream_expr(spark, SF, "priority(search(region), search(nation))").count() == 5

    # calc(): collection-free evaluator math
    assert run_stream_expr(spark, SF, 'select(calc(), "add(1, 2) as x")').collect()[0].x == 3

    # eval(): run the first tuple's expr_s
    ev = run_stream_expr(spark, SF, 'eval(tuple(expr_s="search(region, fl=\\"r_name\\")"))')
    assert ev.count() == 5

    # daemon: one-iteration pass-through
    assert (
        run_stream_expr(spark, SF, 'daemon(search(region), id="d1", runInterval="1000")').count()
        == 5
    )


def test_executor_tuple_get_sql(spark):
    ex = run_stream_expr(spark, SF, 'executor(tuple(expr_s="search(region)"))')
    assert [r.expr_s for r in ex.collect()] == ["search(region)"]

    t = run_stream_expr(spark, SF, "tuple(a=1, b=add(2, 3))").collect()[0]
    assert str(t.a) == "1" and t.b == 5

    g = run_stream_expr(
        spark, SF, 'let(a=search(region, fl="r_name", sort="r_name asc"), get(a))'
    )
    assert g.count() == 5

    s = run_stream_expr(spark, SF, 'sql(stmt="SELECT count(*) AS n FROM region")').collect()
    assert s[0].n == 5


def test_topic_head_incremental(spark, tmp_path):
    first = run_stream_expr(
        spark, SF, f'topic("{tmp_path}", documents, q="hash", id="t1")'
    )
    assert first.count() > 0
    again = run_stream_expr(
        spark, SF, f'topic("{tmp_path}", documents, q="hash", id="t1")'
    )
    assert again.count() == 0


def test_search_fq_start_parameters(spark):
    """SearchStream.java:55 parameter surface: fq restricts the hit set
    without touching score; start pages an ordered stream; start without
    sort refuses."""
    from lucene_solr_spark.relational import _t
    from lucene_solr_spark.textops import _ft_search_all

    # fq on the free-text path: same scores as the unfiltered search,
    # restricted to the fq subset
    base = {
        (r.doc_id, r.score)
        for r in run_stream_expr(
            spark, SF, 'search(documents, q="table hash", fl="doc_id,score,lang")'
        ).collect()
    }
    got = run_stream_expr(
        spark,
        SF,
        'search(documents, q="table hash", fq="lang:en", fl="doc_id,score,lang")',
    ).collect()
    assert all(r.lang == "en" for r in got)
    assert {(r.doc_id, r.score) for r in got} == {
        (d, s) for (d, s) in base
    } & {(r.doc_id, r.score) for r in got}
    en_docs = {
        r.doc_id
        for r in _t(spark, SF, "documents").filter(F.col("lang") == "en").collect()
    }
    assert {r.doc_id for r in got} == {d for d, _ in base if d in en_docs}

    # fq on the field-syntax path composes with q
    got2 = run_stream_expr(
        spark,
        SF,
        'search(orders, q="o_orderstatus:O", fq="o_totalprice:[100000 TO *]", '
        'fl="o_orderkey")',
    )
    want2 = (
        _t(spark, SF, "orders")
        .filter((F.col("o_orderstatus") == "O") & (F.col("o_totalprice") >= 100000))
        .select("o_orderkey")
    )
    assert _rows(got2) == _rows(want2)

    # start pages: rows k..k+n of the sorted stream
    whole = run_stream_expr(
        spark, SF, 'search(region, fl="r_regionkey", sort="r_regionkey asc", rows=5)'
    ).collect()
    page2 = run_stream_expr(
        spark,
        SF,
        'search(region, fl="r_regionkey", sort="r_regionkey asc", start=2, rows=2)',
    ).collect()
    assert [r.r_regionkey for r in page2] == [r.r_regionkey for r in whole][2:4]
    # free-text path: start pages the score-desc total order
    ft_page = run_stream_expr(
        spark, SF, 'search(documents, q="table hash", fl="doc_id,score", start=3, rows=4)'
    ).collect()
    ft_all = sorted(
        _ft_search_all(spark, SF, "table hash").collect(),
        key=lambda r: (-r.score, r.doc_id),
    )
    assert [(r.doc_id, r.score) for r in ft_page] == [
        (r.doc_id, r.score) for r in ft_all
    ][3:7]

    with pytest.raises(ValueError, match="start"):
        run_stream_expr(spark, SF, 'search(region, fl="r_name", start=1)')


def test_let_interpolation_model_over_stream(spark):
    """A model bound in the stream-language let() keeps its plan-time kind
    across bindings — predict()/derivative() dispatch on it (parse_binding
    threads the PlanValue tag scope through the env)."""
    out = run_stream_expr(
        spark,
        SF,
        'let(a=search(region, fl="r_regionkey", sort="r_regionkey asc"), '
        "b=col(a, r_regionkey), "
        "m=lerp(b, array(1, 3, 2, 5, 4)), "
        'p=predict(m, 1.5), d=predict(derivative(m), 1.5), echo="p,d")',
    ).collect()[0]
    assert out.p == 2.5
    assert out.d == -1.0
