"""The final Lang.java stream-context bridges — ``memset``, ``pivot``,
``latlonVectors``, ``plot``, ``zplot``, ``parseCSV``/``parseTSV``,
``recNum``, ``getAttribute``/``getAttributes``, and the ``stream``/
``knnSearch`` aliases (reference ``solr/solrj/src/java/org/apache/solr/
client/solrj/io/eval/MemsetEvaluator.java``, ``PivotEvaluator.java``,
``LatLonVectorsEvaluator.java``, ``RecNumEvaluator.java``,
``GetAttributeEvaluator.java``, ``stream/PlotStream.java``,
``stream/ZplotStream.java``, ``stream/CsvStream.java``,
``stream/TsvStream.java``, ``stream/GetStream.java``, registration in
``Lang.java:116-330``)."""

import math

import pytest

from lucene_solr_spark.streaming_expr import run_stream_expr

SF = "/root/testdata/sf0.001"


def _rows(df):
    return [tuple(r) for r in df.collect()]


def test_memset_binds_columns_as_vectors(spark):
    out = run_stream_expr(
        spark,
        SF,
        'let(a=memset(search(region, fl="r_regionkey,r_name", sort="r_regionkey asc"), '
        'cols="r_regionkey,r_name", vars="k,nm"), '
        'm=mean(k), n=length(nm), echo="m,n")',
    ).collect()[0]
    assert out.m == 2.0  # mean of 0..4
    assert out.n == 5


def test_memset_size_truncates(spark):
    out = run_stream_expr(
        spark,
        SF,
        'let(a=memset(search(region, fl="r_regionkey", sort="r_regionkey asc"), '
        'cols="r_regionkey", vars="k", size=3), s=length(k), echo="s")',
    ).collect()[0]
    assert out.s == 3


def test_pivot_builds_labeled_matrix(spark, tmp_path):
    rows = [
        ("a", "x", 1.0), ("a", "y", 2.0), ("b", "x", 3.0), ("c", "z", 4.0),
    ]
    df = spark.createDataFrame(rows, "r string, c string, v double")
    df.write.parquet(str(tmp_path / "pivot_src.parquet"))
    out = run_stream_expr(
        spark,
        str(tmp_path),
        'let(a=search(pivot_src, fl="r,c,v", sort="r asc"), '
        "m=pivot(a, r, c, v), rl=getRowLabels(m), cl=getColumnLabels(m), "
        'echo="m,rl,cl")',
    ).collect()[0]
    assert list(out.rl) == ["a", "b", "c"]
    assert list(out.cl) == ["x", "y", "z"]
    assert [list(r) for r in out.m["m"]] == [
        [1.0, 2.0, 0.0],
        [3.0, 0.0, 0.0],
        [0.0, 0.0, 4.0],
    ]


def test_latlon_vectors(spark, tmp_path):
    rows = [("p1", "40.7, -74.0"), ("p2", "51.5 -0.1")]
    spark.createDataFrame(rows, "id string, loc string").write.parquet(
        str(tmp_path / "latlon_src.parquet")
    )
    out = run_stream_expr(
        spark,
        str(tmp_path),
        'let(a=search(latlon_src, fl="id,loc", sort="id asc"), '
        "m=latlonVectors(a, field=loc), rl=getRowLabels(m), "
        'cl=getColumnLabels(m), echo="m,rl,cl")',
    ).collect()[0]
    assert list(out.rl) == ["p1", "p2"]
    assert list(out.cl) == ["lat", "lon"]
    assert [list(r) for r in out.m["m"]] == [[40.7, -74.0], [51.5, -0.1]]


def test_plot_stream(spark):
    out = run_stream_expr(
        spark,
        SF,
        'let(x=array(1, 2, 3), y=array(2, 4, 6), '
        'plot(x=x, y=y, type="scatter"))',
    )
    row = out.collect()[0]
    assert row["plot"] == "scatter"
    assert [list(p) for p in row["data"]] == [[1.0, 2.0], [2.0, 4.0], [3.0, 6.0]]


def test_plot_generates_x_axis(spark):
    row = run_stream_expr(
        spark, SF, 'let(y=array(5, 7), plot(y=y, type="line"))'
    ).collect()[0]
    assert [list(p) for p in row["data"]] == [[1.0, 5.0], [2.0, 7.0]]


def test_zplot_vectors(spark):
    got = _rows(
        run_stream_expr(
            spark, SF, "let(a=array(10, 20), b=array(1, 2), zplot(x=a, y=b))"
        )
    )
    assert got == [(10.0, 1.0), (20.0, 2.0)]
    # y only: x generated 0..n-1
    got = _rows(run_stream_expr(spark, SF, "let(b=array(5, 6), zplot(y=b))"))
    assert got == [(5.0, 0), (6.0, 1)]


def test_zplot_clusters(spark):
    got = _rows(
        run_stream_expr(
            spark,
            SF,
            "let(m=matrix(array(0, 0), array(0.5, 0), array(10, 10), array(10.5, 10)), "
            "c=kmeans(m, 2), zplot(clusters=c))",
        )
    )
    assert sorted(got) == [
        (0.0, 0.0, "cluster1"),
        (0.5, 0.0, "cluster1"),
        (10.0, 10.0, "cluster2"),
        (10.5, 10.0, "cluster2"),
    ]


def test_parse_csv_and_tsv(spark, tmp_path):
    rows = [
        ("f1.csv", 1, "name,qty"),
        ("f1.csv", 2, "widget,4"),
        ("f1.csv", 3, 'a "quoted",7'),
        ("f2.csv", 1, "name,color"),
        ("f2.csv", 2, "gadget,blue"),
    ]
    spark.createDataFrame(rows, "file string, n int, line string").write.parquet(
        str(tmp_path / "csv_lines.parquet")
    )
    out = run_stream_expr(
        spark,
        str(tmp_path),
        'parseCSV(search(csv_lines, fl="file,n,line", sort="file asc,n asc"))',
    )
    got = {r["id"]: r.asDict() for r in out.collect()}
    assert got["f1.csv_2"]["name"] == "widget" and got["f1.csv_2"]["qty"] == "4"
    assert got["f1.csv_3"]["name"] == 'a "quoted"' and got["f1.csv_3"]["qty"] == "7"
    assert got["f2.csv_2"]["name"] == "gadget" and got["f2.csv_2"]["color"] == "blue"
    # per-file headers: qty only for f1, color only for f2
    assert got["f2.csv_2"].get("qty") is None

    rows = [("t.tsv", 1, "a\tb"), ("t.tsv", 2, "1\t2")]
    spark.createDataFrame(rows, "file string, n int, line string").write.parquet(
        str(tmp_path / "tsv_lines.parquet")
    )
    out = run_stream_expr(
        spark,
        str(tmp_path),
        'parseTSV(search(tsv_lines, fl="file,n,line", sort="file asc,n asc"))',
    )
    got = [r.asDict() for r in out.collect()]
    assert got[0]["a"] == "1" and got[0]["b"] == "2" and got[0]["id"] == "t.tsv_2"


def test_rec_num_in_select(spark):
    out = run_stream_expr(
        spark,
        SF,
        'select(search(region, fl="r_regionkey,r_name", sort="r_name desc"), '
        '"r_name as name", "recNum() as rec")',
    )
    rows = out.collect()
    names = [r["name"] for r in rows]
    assert names == sorted(names, reverse=True)
    assert [r["rec"] for r in sorted(rows, key=lambda r: r["name"], reverse=True)] == [
        0, 1, 2, 3, 4,
    ]


def test_stream_and_knn_search_aliases(spark):
    got = _rows(
        run_stream_expr(
            spark,
            SF,
            'let(a=search(region, fl="r_regionkey", sort="r_regionkey asc"), stream(a))',
        )
    )
    assert got == [(i,) for i in range(5)]
    # knnSearch == knn (KnnStream registration alias, Lang.java:46)
    a = run_stream_expr(
        spark, SF, 'knn(documents, id="3", qf="text", k="4", fl="doc_id,score")'
    )
    b = run_stream_expr(
        spark, SF, 'knnSearch(documents, id="3", qf="text", k="4", fl="doc_id,score")'
    )
    assert _rows(a) == _rows(b)


def test_get_attribute_on_term_vectors(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            ("d1", ["hello", "world", "spark", "hello"]),
            ("d2", ["world", "query", "spark"]),
            ("d3", ["query", "index", "spark", "world"]),
            ("d4", ["alpha", "beta", "index"]),
        ],
        "id string, terms array<string>",
    )
    docs.write.parquet(str(tmp_path / "tv_docs.parquet"))
    out = run_stream_expr(
        spark,
        str(tmp_path),
        'let(a=search(tv_docs, fl="id,terms", sort="id asc"), '
        "tv=termVectors(a, minDocFreq=0, maxDocFreq=0.5), "
        'df=getAttribute(tv, "docFreqs"), all=getAttributes(tv), echo="df,all")',
    ).collect()[0]
    assert dict(out.df) == {
        "alpha": 1.0, "beta": 1.0, "hello": 1.0, "index": 2.0, "query": 2.0,
    }
    assert dict(out.all)["docFreqs"]["index"] == 2.0
