"""Solr function-query surface (ValueSourceParser, SURVEY §2.10): the
named-function registry and the recursive-descent parser, evaluated on real
tables and cross-checked against DuckDB."""

import math
import os

import duckdb
import pytest

from lucene_solr_spark.functions import FUNCTIONS, parse_func

SF_DIR = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "lineitem.parquet"))


def test_registry_covers_the_standard_families():
    math_fns = {"abs", "add", "sub", "mul", "div", "mod", "pow", "sqrt", "log",
                "ln", "exp", "sin", "cos", "tan", "ceil", "floor", "rint",
                "max", "min"}
    cond_fns = {"if", "def", "exists", "not", "and", "or", "xor",
                "lt", "lte", "gt", "gte", "eq", "map"}
    boost_fns = {"recip", "linear", "scale"}
    date_geo = {"ms", "geodist", "hsin", "sqedist", "strdist"}
    assert math_fns <= set(FUNCTIONS)
    assert cond_fns <= set(FUNCTIONS)
    assert boost_fns <= set(FUNCTIONS)
    assert date_geo <= set(FUNCTIONS)
    assert len(FUNCTIONS) >= 45


def test_parse_rejects_garbage(spark):
    for bad in ("nosuchfn(x)", "add(1,", "add(1) extra", "add(1,2))"):
        with pytest.raises(ValueError):
            parse_func(bad)


def test_parsed_expression_matches_duckdb(spark, lineitem):
    """recip(mul(l_quantity,l_extendedprice),0.0001,1,1) + log/abs composite
    evaluated by Catalyst == the same arithmetic in DuckDB."""
    import pyspark.sql.functions as F

    expr = "recip(mul(l_quantity,l_extendedprice),0.0001,1,1)"
    sdf = lineitem.filter(F.col("l_orderkey") < 100).select(
        F.col("l_orderkey").alias("k"),
        F.col("l_linenumber").alias("ln"),
        F.round(parse_func(expr), 8).alias("v"),
        F.round(parse_func("log(add(abs(l_extendedprice),1))"), 8).alias("v2"),
        parse_func("if(gt(l_quantity,25),1,0)").cast("int").alias("v3"),
    )
    srows = sorted(map(tuple, sdf.collect()))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    drows = sorted(
        map(
            tuple,
            con.execute(
                """
        SELECT l_orderkey AS k, l_linenumber AS ln,
               round(1 / (0.0001 * (l_quantity * l_extendedprice) + 1), 8) AS v,
               round(log10(abs(l_extendedprice) + 1), 8) AS v2,
               CASE WHEN l_quantity > 25 THEN 1 ELSE 0 END AS v3
        FROM lineitem WHERE l_orderkey < 100
        """
            ).fetchall(),
        )
    )
    assert len(srows) == len(drows) and len(srows) > 0
    for s, d in zip(srows, drows):
        assert s[0] == d[0] and s[1] == d[1]
        assert s[2] == pytest.approx(d[2], abs=1e-6)
        assert s[3] == pytest.approx(d[3], abs=1e-6)
        assert s[4] == d[4]


def test_geodist_is_haversine_km(spark):
    import pyspark.sql.functions as F

    df = spark.range(1).select(
        parse_func("geodist(48.8566,2.3522,51.5074,-0.1278)").alias("d")
    )
    # Paris -> London great-circle ~343.5 km
    assert df.collect()[0].d == pytest.approx(343.5, abs=1.0)


def test_scale_minmax(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(1.0,), (2.0,), (3.0,)], "x double")
    vals = sorted(r.s for r in df.select(parse_func("scale(x,0,10)").alias("s")).collect())
    assert vals == pytest.approx([0.0, 5.0, 10.0])


def test_spatial_polygon_matches_independent_pnpoly(spark):
    """LatLonPoint.newPolygonQuery role: the shared Catalyst/DuckDB crossing
    expression must agree with an independent per-point PNPOLY loop on a
    non-convex polygon (guards expression-string generation bugs — both
    engines would be wrong the same way; the loop would not)."""
    from lucene_solr_spark.relational import _POLY, spatial_polygon

    sf = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
    got = {
        int(r.c_custkey)
        for r in spatial_polygon(spark, sf).select("c_custkey").collect()
    }

    def pnpoly(lat, lon):
        inside = False
        for i, (y1, x1) in enumerate(_POLY):
            y2, x2 = _POLY[(i + 1) % len(_POLY)]
            if ((y1 > lat) != (y2 > lat)) and (
                lon < (x2 - x1) * (lat - y1) / (y2 - y1) + x1
            ):
                inside = not inside
        return inside

    import pyspark.sql.functions as F

    cust = (
        spark.read.parquet(os.path.join(sf, "customer.parquet"))
        .select("c_custkey")
        .collect()
    )
    expect = set()
    for r in cust:
        k = int(r.c_custkey)
        if pnpoly((k % 180) - 90 + 0.5, (k % 360) - 180 + 0.5):
            expect.add(k)
    assert got == expect and len(got) > 0


def test_norm_decode_expr_matches_byte4_to_int(spark):
    """The Catalyst CASE decode used by function_score_rank must equal the
    numpy byte4ToInt for every possible stored byte."""
    import numpy as np
    import pyspark.sql.functions as F

    from lucene_solr_spark.smallfloat import byte4_to_int
    from lucene_solr_spark.textops import _NORM_DECODE

    df = spark.range(256).select(F.col("id").cast("int").alias("norm_byte"))
    got = {
        r.norm_byte: r.dec
        for r in df.withColumn("dec", F.expr(_NORM_DECODE)).collect()
    }
    expect = byte4_to_int(np.arange(256, dtype=np.uint8))
    for b in range(256):
        assert got[b] == int(expect[b]), b


def test_parse_func_quoted_string_args(spark):
    """Quoted args reach the builder as plain strings (FunctionQParser)."""
    seen = {}

    def probe(f, t):
        seen["args"] = (f, t)
        import pyspark.sql.functions as F

        return F.lit(1.0)

    col = parse_func("probe(body,'spark')", registry={**FUNCTIONS, "probe": probe})
    assert seen["args"][1] == "spark"


def test_dist_concat_ord_rord(spark):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [(0.0, 0.0, "a"), (3.0, 4.0, "c"), (1.0, 1.0, "b")], "x double, y double, s string"
    )
    # dist(2, x, y, 0, 0) = euclidean norm
    d = df.select(parse_func("dist(2, x, y, 0, 0)").alias("d"))
    assert sorted(r.d for r in d.collect()) == pytest.approx([0.0, 2**0.5, 5.0])
    # dist(1, ...) = manhattan
    m = df.select(parse_func("dist(1, x, y, 0, 0)").alias("d"))
    assert sorted(r.d for r in m.collect()) == pytest.approx([0.0, 2.0, 7.0])
    rows = df.select(
        "s",
        parse_func("ord(s)").alias("o"),
        parse_func("rord(s)").alias("r"),
        parse_func("concat(s, s)").alias("c"),
    ).collect()
    got = {r.s: (r.o, r.r, r.c) for r in rows}
    assert got == {"a": (1, 3, "aa"), "b": (2, 2, "bb"), "c": (3, 1, "cc")}
    assert df.select(parse_func("pi()").alias("p")).collect()[0].p == pytest.approx(math.pi)


def _py_geohash(lat: float, lon: float, precision: int = 12) -> str:
    """Independent driver-side encoder (public geohash algorithm) — the
    oracle for the Catalyst expression."""
    b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
    lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
    bits, out, even = 0, [], True
    ch = 0
    while len(out) < precision:
        if even:
            mid = (lon_lo + lon_hi) / 2
            if lon >= mid:
                ch = (ch << 1) | 1
                lon_lo = mid
            else:
                ch <<= 1
                lon_hi = mid
        else:
            mid = (lat_lo + lat_hi) / 2
            if lat >= mid:
                ch = (ch << 1) | 1
                lat_lo = mid
            else:
                ch <<= 1
                lat_hi = mid
        even = not even
        bits += 1
        if bits == 5:
            out.append(b32[ch])
            bits, ch = 0, 0
    return "".join(out)


def test_geohash_matches_reference_vectors(spark):
    """geohash(lat,lon) (GeohashFunction.java:35 via spatial4j
    GeohashUtils.encodeLatLon, 12-char precision) — pinned to the public
    test vector and an independent python encoder over a lattice."""
    import pyspark.sql.functions as F

    pts = [
        (57.64911, 10.40744),  # wikipedia vector -> u4pruydqqvj8
        (0.0, 0.0),
        (-89.9, -179.9),
        (89.9, 179.9),
        (40.7, -74.0),
        (-33.86, 151.21),
    ]
    df = spark.createDataFrame(pts, "lat double, lon double").select(
        "lat", "lon", parse_func("geohash(lat,lon)").alias("gh")
    )
    got = {(r.lat, r.lon): r.gh for r in df.collect()}
    assert got[(57.64911, 10.40744)] == "u4pruydqqvj8"
    for lat, lon in pts:
        assert got[(lat, lon)] == _py_geohash(lat, lon), (lat, lon)


def test_ghhsin_decodes_and_measures(spark):
    """ghhsin(radius, gh1, gh2) (GeohashHaversineFunction.java:43): decode
    both geohashes to their cell centers, haversine on the given sphere.
    Cross-checked against the python decode + the registry's own hsin."""
    import pyspark.sql.functions as F

    a = _py_geohash(57.64911, 10.40744)
    b = _py_geohash(40.7, -74.0)
    df = spark.createDataFrame([(a, b)], "g1 string, g2 string").select(
        parse_func("ghhsin(6371.0087714, g1, g2)").alias("d")
    )
    got = df.collect()[0].d

    def decode(gh):
        b32 = "0123456789bcdefghjkmnpqrstuvwxyz"
        lat_lo, lat_hi, lon_lo, lon_hi = -90.0, 90.0, -180.0, 180.0
        even = True
        for c in gh:
            v = b32.index(c)
            for k in range(4, -1, -1):
                bit = (v >> k) & 1
                if even:
                    mid = (lon_lo + lon_hi) / 2
                    if bit:
                        lon_lo = mid
                    else:
                        lon_hi = mid
                else:
                    mid = (lat_lo + lat_hi) / 2
                    if bit:
                        lat_lo = mid
                    else:
                        lat_hi = mid
                even = not even
        return (lat_lo + lat_hi) / 2, (lon_lo + lon_hi) / 2

    lat1, lon1 = decode(a)
    lat2, lon2 = decode(b)
    r = 6371.0087714
    dlat = math.radians(lat2 - lat1)
    dlon = math.radians(lon2 - lon1)
    h = (
        math.sin(dlat / 2) ** 2
        + math.cos(math.radians(lat1))
        * math.cos(math.radians(lat2))
        * math.sin(dlon / 2) ** 2
    )
    want = 2 * r * math.asin(math.sqrt(h))
    assert got == pytest.approx(want, rel=1e-9)


def test_round4_scalar_names(spark):
    """rad/deg/hypot/atan2/literal/vector/true/false — the remaining
    deterministic ValueSourceParser scalar names."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame([(3.0, 4.0)], "a double, b double")
    row = df.select(
        parse_func("rad(180)").alias("rad"),
        parse_func("deg(pi())").alias("deg"),
        parse_func("hypot(a,b)").alias("hyp"),
        parse_func("atan2(a,b)").alias("at2"),
        parse_func("literal('abc')").alias("lit"),
        parse_func("vector(a,b,1)").alias("vec"),
        parse_func("true()").alias("t"),
        parse_func("false()").alias("f"),
    ).collect()[0]
    assert row.rad == pytest.approx(math.pi)
    assert row.deg == pytest.approx(180.0)
    assert row.hyp == pytest.approx(5.0)
    assert row.at2 == pytest.approx(math.atan2(3.0, 4.0))
    assert row.lit == "abc"
    assert row.vec == [3.0, 4.0, 1.0]
    assert row.t is True and row.f is False


def test_agg_function_registry_matches_duckdb(spark, lineitem):
    """The agg_* pseudo-functions (ValueSourceParser.java agg registrations →
    facet module aggregates): population variance/stddev per VarianceAgg
    .java:61 / StddevAgg.java:62, exact percentile, countDistinct unique."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.functions import AGG_FUNCTIONS

    got = (
        lineitem.groupBy("l_returnflag")
        .agg(
            AGG_FUNCTIONS["agg_count"]().alias("cnt"),
            AGG_FUNCTIONS["agg_sum"](F.col("l_quantity")).alias("s"),
            AGG_FUNCTIONS["agg_avg"](F.col("l_quantity")).alias("a"),
            AGG_FUNCTIONS["agg_min"](F.col("l_quantity")).alias("mn"),
            AGG_FUNCTIONS["agg_max"](F.col("l_quantity")).alias("mx"),
            AGG_FUNCTIONS["agg_sumsq"](F.col("l_quantity")).alias("ss"),
            AGG_FUNCTIONS["agg_variance"](F.col("l_quantity")).alias("v"),
            AGG_FUNCTIONS["agg_stddev"](F.col("l_quantity")).alias("sd"),
            AGG_FUNCTIONS["agg_percentile"](F.col("l_quantity"), 0.5).alias("p50"),
            AGG_FUNCTIONS["agg_unique"](F.col("l_linenumber")).alias("u"),
        )
        .orderBy("l_returnflag")
        .collect()
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW lineitem AS SELECT * FROM read_parquet('{SF_DIR}/lineitem.parquet')"
    )
    want = con.execute(
        """
        SELECT l_returnflag, count(*), sum(l_quantity), avg(l_quantity),
               min(l_quantity), max(l_quantity), sum(l_quantity*l_quantity),
               var_pop(l_quantity), stddev_pop(l_quantity),
               quantile_cont(l_quantity, 0.5), count(DISTINCT l_linenumber)
        FROM lineitem GROUP BY 1 ORDER BY 1
        """
    ).fetchall()
    for g, w in zip(got, want):
        assert g.l_returnflag == w[0]
        assert g.cnt == w[1]
        assert float(g.s) == pytest.approx(float(w[2]))
        assert g.a == pytest.approx(w[3])
        assert float(g.mn) == pytest.approx(float(w[4]))
        assert float(g.mx) == pytest.approx(float(w[5]))
        assert float(g.ss) == pytest.approx(float(w[6]))
        assert g.v == pytest.approx(w[7])
        assert g.sd == pytest.approx(w[8])
        assert float(g.p50) == pytest.approx(float(w[9]))
        assert g.u == w[10]


class TestSearcherBoundValueSources:
    """query()/boost() (ValueSourceParser.java:315,327 — QueryValueSource /
    FunctionScoreQuery.boostByValue) behind parse_func_with_searcher: per-doc
    nested-query scores join the frame once per distinct nested query."""

    @pytest.fixture(scope="class")
    def searcher(self, spark, tiny_index):
        from lucene_solr_spark.search import IndexSearcher

        d, _ = tiny_index
        return IndexSearcher(spark, d, analyzer="code", precision="f64")

    def _scores(self, searcher, q):
        return {
            (r.segment_id, r.doc_id): float(r.score)
            for r in searcher.search(q, k=None).collect()
        }

    def test_query_scores_and_default(self, spark, searcher, tiny_index):
        from lucene_solr_spark.functions import parse_func_with_searcher

        frame, col = parse_func_with_searcher(
            "sum(query('parse', 0.5), 1)", searcher
        )
        got = {
            (r.segment_id, r.doc_id): float(r.v)
            for r in frame.select("segment_id", "doc_id", col.alias("v")).collect()
        }
        want = self._scores(searcher, "parse")
        n_docs = spark.read.parquet(tiny_index[0] + "/docs").count()
        assert len(got) == n_docs and want
        for key, v in got.items():
            expect = want[key] + 1.0 if key in want else 1.5
            assert v == pytest.approx(expect, rel=1e-9)

    def test_boost_multiplies_matching_docs_only(self, searcher):
        from lucene_solr_spark.functions import parse_func_with_searcher

        frame, col = parse_func_with_searcher("boost('buffer', 2.0)", searcher)
        got = {
            (r.segment_id, r.doc_id): float(r.v)
            for r in frame.select("segment_id", "doc_id", col.alias("v")).collect()
        }
        want = self._scores(searcher, "buffer")
        assert want
        for key, v in got.items():
            expect = 2.0 * want[key] if key in want else 0.0
            assert v == pytest.approx(expect, rel=1e-9)

    def test_param_deref_and_two_nested_queries(self, searcher):
        from lucene_solr_spark.functions import parse_func_with_searcher

        frame, col = parse_func_with_searcher(
            "sub(query('$qq'), query('$q2'))",
            searcher,
            params={"qq": "parse", "q2": "buffer"},
        )
        got = {
            (r.segment_id, r.doc_id): float(r.v)
            for r in frame.select("segment_id", "doc_id", col.alias("v")).collect()
        }
        a, b = self._scores(searcher, "parse"), self._scores(searcher, "buffer")
        for key, v in got.items():
            assert v == pytest.approx(a.get(key, 0.0) - b.get(key, 0.0), rel=1e-9)

    def test_unresolved_ref_and_unquoted_arg_raise(self, searcher):
        from lucene_solr_spark.functions import parse_func_with_searcher

        with pytest.raises(ValueError, match=r"\$qq"):
            parse_func_with_searcher("query('$qq')", searcher)
        with pytest.raises(ValueError, match="quoted"):
            parse_func_with_searcher("query(5)", searcher)


def test_agg_unique_block_counts_blocks(spark):
    """agg_uniqueBlock(_root_) (UniqueBlockFieldAgg): distinct block roots
    per bucket, verified against DuckDB count(DISTINCT)."""
    from lucene_solr_spark.functions import AGG_FUNCTIONS
    import pyspark.sql.functions as F

    rows = [("a", f"r{i % 3}") for i in range(9)] + [("b", f"r{i % 2}") for i in range(4)]
    df = spark.createDataFrame(rows, ["bucket", "_root_"])
    got = {
        r.bucket: r.n
        for r in df.groupBy("bucket")
        .agg(AGG_FUNCTIONS["agg_uniqueBlock"](F.col("_root_")).alias("n"))
        .collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t (bucket VARCHAR, root VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?, ?)", rows)
    want = dict(
        con.execute(
            "SELECT bucket, count(DISTINCT root) FROM t GROUP BY bucket"
        ).fetchall()
    )
    assert got == want == {"a": 3, "b": 2}


def test_tf_value_source_is_classic_sqrt(spark, tiny_index):
    """tf(f,t) (TFValueSource.java:34): TFIDFSimilarity.tf(freq) =
    ClassicSimilarity's sqrt(freq) — checked against termfreq's raw count."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.functions import parse_func
    from lucene_solr_spark.index.read import term_postings
    from lucene_solr_spark.textops import relevance_registry

    d, _ = tiny_index
    term = "parse"
    frame = term_postings(spark, d, [term]).select(
        "segment_id", "doc_id", F.col("freq").cast("long").alias(f"tf_{term}")
    )
    stats = {"df": {term: 1}, "ttf": {term: 1}, "numdocs": 1, "maxdoc": 1,
             "sumttf": 0}
    reg = relevance_registry(stats)
    out = frame.select(
        parse_func(f"termfreq(content,'{term}')", registry=reg).alias("raw"),
        parse_func(f"tf(content,'{term}')", registry=reg).alias("tf"),
    ).collect()
    assert out
    for r in out:
        assert float(r.tf) == pytest.approx(math.sqrt(float(r.raw)), rel=1e-12)
        assert r.raw >= 1
