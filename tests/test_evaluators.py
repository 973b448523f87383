"""Math-evaluator zoo (``solrj/io/eval``, registered in ``Lang.java``):
every implemented name cross-checked against a numpy/python reference on a
small frame, plus let() binding-chain semantics."""

import math

import numpy as np
import pytest

import pyspark.sql.functions as F

from lucene_solr_spark.evaluators import (
    EVALUATORS,
    apply_let,
    parse_eval,
    parse_let,
)


@pytest.fixture(scope="module")
def frame(spark):
    rows = [
        (1, 4.0, 2.0, [1.0, 2.0, 3.0, 4.0], [2.0, 0.5, -1.0, 3.0], "2024-03-07 10:30:45"),
        (2, 9.0, -3.5, [5.0, 5.0, 5.0], [0.0, 1.0, 2.0], "2023-11-21 23:05:01"),
        (3, 0.25, 7.0, [-2.0, 8.0, 0.5, 1.5, 10.0], [1.0, 1.0, 1.0, 1.0, 1.0], "2024-01-01 00:00:00"),
    ]
    return spark.createDataFrame(
        rows, "id int, x double, y double, a array<double>, b array<double>, ts_s string"
    ).withColumn("ts", F.to_timestamp("ts_s"))


def _vals(frame, col):
    return [r[0] for r in frame.select(col).orderBy("id").collect()]


def _ev(name, *args):
    return EVALUATORS[name](*args)


# ---------------------------------------------------------------- scalars --

SCALAR_CASES = {
    "abs": (lambda x, y: abs(y), lambda c: _ev("abs", c["y"])),
    "add": (lambda x, y: x + y + 1.0, lambda c: _ev("add", c["x"], c["y"], F.lit(1.0))),
    "sub": (lambda x, y: x - y, lambda c: _ev("sub", c["x"], c["y"])),
    "mult": (lambda x, y: x * y, lambda c: _ev("mult", c["x"], c["y"])),
    "div": (lambda x, y: x / y, lambda c: _ev("div", c["x"], c["y"])),
    "mod": (lambda x, y: math.fmod(x, 3.0), lambda c: _ev("mod", c["x"], F.lit(3.0))),
    "pow": (lambda x, y: x**2.0, lambda c: _ev("pow", c["x"], F.lit(2.0))),
    "sqrt": (lambda x, y: math.sqrt(x), lambda c: _ev("sqrt", c["x"])),
    "cbrt": (lambda x, y: np.cbrt(x), lambda c: _ev("cbrt", c["x"])),
    "log": (lambda x, y: math.log(x), lambda c: _ev("log", c["x"])),  # ln!
    "log10": (lambda x, y: math.log10(x), lambda c: _ev("log10", c["x"])),
    "exp": (lambda x, y: math.exp(-x / 4), lambda c: _ev("exp", -c["x"] / 4)),
    "ceil": (lambda x, y: math.ceil(y), lambda c: _ev("ceil", c["y"])),
    "floor": (lambda x, y: math.floor(y), lambda c: _ev("floor", c["y"])),
    "round": (lambda x, y: np.rint(y), lambda c: _ev("round", c["y"])),
    "sin": (lambda x, y: math.sin(x), lambda c: _ev("sin", c["x"])),
    "cos": (lambda x, y: math.cos(x), lambda c: _ev("cos", c["x"])),
    "tan": (lambda x, y: math.tan(x), lambda c: _ev("tan", c["x"])),
    "asin": (lambda x, y: math.asin(min(x, 1.0) / 10), lambda c: _ev("asin", F.least(c["x"], F.lit(1.0)) / 10)),
    "acos": (lambda x, y: math.acos(min(x, 1.0) / 10), lambda c: _ev("acos", F.least(c["x"], F.lit(1.0)) / 10)),
    "atan": (lambda x, y: math.atan(y), lambda c: _ev("atan", c["y"])),
    "sinh": (lambda x, y: math.sinh(y / 4), lambda c: _ev("sinh", c["y"] / 4)),
    "cosh": (lambda x, y: math.cosh(y / 4), lambda c: _ev("cosh", c["y"] / 4)),
    "tanh": (lambda x, y: math.tanh(y), lambda c: _ev("tanh", c["y"])),
    "recip": (lambda x, y: 1.0 / x, lambda c: _ev("recip", c["x"])),
    "precision": (lambda x, y: round(y * 100) / 100, lambda c: _ev("precision", c["y"], F.lit(2))),
    "factorial": (lambda x, y: 120.0, lambda c: _ev("factorial", F.lit(5))),
    "binomialCoefficient": (lambda x, y: 10.0, lambda c: _ev("binomialCoefficient", F.lit(5), F.lit(2))),
}


@pytest.mark.parametrize("name", sorted(SCALAR_CASES))
def test_scalar_evaluators(frame, name):
    expect_fn, col_fn = SCALAR_CASES[name]
    got = _vals(frame.withColumn("out", col_fn(frame)), "out")
    want = [expect_fn(x, y) for x, y in zip(_vals(frame, "x"), _vals(frame, "y"))]
    assert got == pytest.approx(want, rel=1e-12, abs=1e-12), name


def test_boolean_and_comparison(frame):
    df = frame.withColumn("gt", _ev("gt", F.col("x"), F.col("y"))).withColumn(
        "both", _ev("and", _ev("gt", F.col("x"), F.lit(0)), _ev("lteq", F.col("y"), F.lit(2.0)))
    ).withColumn("eor", _ev("eor", F.col("x") > 1, F.col("y") > 1))
    rows = {r.id: r for r in df.collect()}
    assert rows[1].gt and not rows[3].gt
    assert rows[1].both and rows[2].both and not rows[3].both
    assert rows[1].eor == ((4.0 > 1) != (2.0 > 1))


def test_string_evaluators(frame):
    df = frame.select(
        "id",
        _ev("concat", F.lit("a"), F.lit("-"), F.upper(F.lit("b"))).alias("c"),
        _ev("lower", F.lit("AbC")).alias("lo"),
        _ev("trim", F.lit("  x ")).alias("t"),
        _ev("matches", F.lit("hello42"), F.lit("h.*\\d+")).alias("m"),
        _ev("split", F.lit("a,b,c"), F.lit(",")).alias("sp"),
    ).first()
    assert (df.c, df.lo, df.t, df.m, df.sp) == ("a-B", "abc", "x", True, ["a", "b", "c"])


def test_temporal_evaluators(frame):
    r = {
        row.id: row
        for row in frame.select(
            "id",
            _ev("year", F.col("ts")).alias("yy"),
            _ev("month", F.col("ts")).alias("mm"),
            _ev("day", F.col("ts")).alias("dd"),
            _ev("dayOfYear", F.col("ts")).alias("doy"),
            _ev("dayOfQuarter", F.col("ts")).alias("doq"),
            _ev("hour", F.col("ts")).alias("hh"),
            _ev("minute", F.col("ts")).alias("mi"),
            _ev("second", F.col("ts")).alias("ss"),
            _ev("quarter", F.col("ts")).alias("qq"),
        ).collect()
    }
    assert (r[1].yy, r[1].mm, r[1].dd, r[1].hh, r[1].mi, r[1].ss) == (2024, 3, 7, 10, 30, 45)
    assert r[1].doy == 31 + 29 + 7  # 2024 is a leap year
    assert r[1].doq == 31 + 29 + 7  # Q1 → same as day-of-year
    assert (r[2].qq, r[2].doq) == (4, 31 + 21)  # Nov 21: Oct has 31 days


# ----------------------------------------------------------------- arrays --


def test_array_creation(frame):
    df = frame.select(
        _ev("sequence", F.lit(4), F.lit(3), F.lit(2)).alias("seq"),
        _ev("natural", F.lit(4)).alias("nat"),
        _ev("ones", F.lit(3)).alias("on"),
        _ev("zeros", F.lit(2)).alias("ze"),
        _ev("repeat", F.lit(7.0), F.lit(3)).alias("rep"),
        _ev("array", F.lit(3), F.lit(1), F.lit(2)).alias("arr"),
    ).first()
    assert df.seq == [3.0, 5.0, 7.0, 9.0]
    assert df.nat == [0.0, 1.0, 2.0, 3.0]
    assert df.on == [1.0, 1.0, 1.0] and df.ze == [0.0, 0.0]
    assert df.rep == [7.0, 7.0, 7.0]
    assert df.arr == [3.0, 1.0, 2.0]


def test_array_manipulation(frame):
    a = [1.0, 2.0, 3.0, 4.0]
    df = frame.filter("id = 1").select(
        _ev("rev", F.col("a")).alias("rev"),
        _ev("asc", F.col("b")).alias("asc"),
        _ev("length", F.col("a")).alias("n"),
        _ev("valueAt", F.col("a"), F.lit(2)).alias("v2"),
        _ev("indexOf", F.col("a"), F.lit(3.0)).alias("idx"),
        _ev("copyOf", F.col("a"), F.lit(6)).alias("co6"),
        _ev("copyOf", F.col("a"), F.lit(2)).alias("co2"),
        _ev("copyOfRange", F.col("a"), F.lit(1), F.lit(3)).alias("cor"),
        _ev("ltrim", F.col("a"), F.lit(2)).alias("lt"),
        _ev("rtrim", F.col("a"), F.lit(1)).alias("rt"),
        _ev("append", F.col("a"), F.col("b")).alias("app"),
    ).first()
    assert df.rev == a[::-1]
    assert df.asc == sorted([2.0, 0.5, -1.0, 3.0])
    assert df.n == 4 and df.v2 == 3.0 and df.idx == 2
    assert df.co6 == a + [0.0, 0.0] and df.co2 == [1.0, 2.0]
    assert df.cor == [2.0, 3.0]  # Arrays.copyOfRange(a, 1, 3)
    assert df.lt == [3.0, 4.0] and df.rt == [1.0, 2.0, 3.0]
    assert df.app == a + [2.0, 0.5, -1.0, 3.0]


def test_elementwise_and_scalar_broadcast(frame):
    df = frame.filter("id = 2").select(
        _ev("ebeAdd", F.col("a"), F.col("b")).alias("ea"),
        _ev("ebeSubtract", F.col("a"), F.col("b")).alias("es"),
        _ev("ebeMultiply", F.col("a"), F.col("b")).alias("em"),
        _ev("ebeDivide", F.col("a"), _ev("scalarAdd", F.lit(1.0), F.col("b"))).alias("ed"),
        _ev("scalarMultiply", F.lit(2.0), F.col("a")).alias("sm"),
        _ev("scalarSubtract", F.lit(1.0), F.col("a")).alias("ss"),
        _ev("scalarDivide", F.lit(2.0), F.col("a")).alias("sd"),
        _ev("scale", F.lit(3.0), F.col("a")).alias("sc"),
    ).first()
    # a=[5,5,5], b=[0,1,2]
    assert df.ea == [5.0, 6.0, 7.0] and df.es == [5.0, 4.0, 3.0]
    assert df.em == [0.0, 5.0, 10.0]
    assert df.ed == [5.0, 2.5, 5.0 / 3.0]
    assert df.sm == [10.0, 10.0, 10.0] and df.ss == [4.0, 4.0, 4.0]
    assert df.sd == [2.5, 2.5, 2.5] and df.sc == [15.0, 15.0, 15.0]


def test_reductions_match_numpy(frame):
    rows = frame.select(
        "id",
        _ev("mean", F.col("a")).alias("mean"),
        _ev("var", F.col("a")).alias("var"),
        _ev("stddev", F.col("a")).alias("sd"),
        _ev("sumSq", F.col("a")).alias("ssq"),
        _ev("grandSum", F.col("a")).alias("gs"),
        _ev("l1norm", F.col("a")).alias("l1"),
        _ev("l2norm", F.col("a")).alias("l2"),
        _ev("linfnorm", F.col("a")).alias("linf"),
    ).orderBy("id").collect()
    arrays = [np.array([1.0, 2, 3, 4]), np.array([5.0, 5, 5]), np.array([-2.0, 8, 0.5, 1.5, 10])]
    for r, a in zip(rows, arrays):
        assert r["mean"] == pytest.approx(a.mean())
        assert r["var"] == pytest.approx(a.var(ddof=1))  # commons-math: sample
        assert r["sd"] == pytest.approx(a.std(ddof=1))
        assert r["ssq"] == pytest.approx((a * a).sum())
        assert r["gs"] == pytest.approx(a.sum())
        assert r["l1"] == pytest.approx(np.abs(a).sum())
        assert r["l2"] == pytest.approx(np.linalg.norm(a))
        assert r["linf"] == pytest.approx(np.abs(a).max())


def test_vector_pair_measures(frame):
    r = frame.filter("id = 1").select(
        _ev("dotProduct", F.col("a"), F.col("b")).alias("dot"),
        _ev("cosineSimilarity", F.col("a"), F.col("b")).alias("cos"),
        _ev("euclidean", F.col("a"), F.col("b")).alias("euc"),
        _ev("manhattan", F.col("a"), F.col("b")).alias("man"),
        _ev("chebyshev", F.col("a"), F.col("b")).alias("che"),
        _ev("canberra", F.col("a"), F.col("b")).alias("can"),
    ).first()
    a, b = np.array([1.0, 2, 3, 4]), np.array([2.0, 0.5, -1, 3])
    assert r.dot == pytest.approx(a @ b)
    assert r.cos == pytest.approx(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert r.euc == pytest.approx(np.linalg.norm(a - b))
    assert r.man == pytest.approx(np.abs(a - b).sum())
    assert r.che == pytest.approx(np.abs(a - b).max())
    assert r.can == pytest.approx((np.abs(a - b) / (np.abs(a) + np.abs(b))).sum())


def test_array_transforms_match_numpy(frame):
    r = frame.filter("id = 3").select(
        _ev("unitize", F.col("a")).alias("unit"),
        _ev("zscores", F.col("a")).alias("z"),
        _ev("normalizeSum", F.col("a")).alias("ns"),
        _ev("normalizeSum", F.col("a"), F.lit(100.0)).alias("ns100"),
        _ev("minMaxScale", F.col("a")).alias("mm"),
        _ev("minMaxScale", F.col("a"), F.lit(-1.0), F.lit(1.0)).alias("mm11"),
    ).first()
    a = np.array([-2.0, 8, 0.5, 1.5, 10])
    assert r.unit == pytest.approx(list(a / np.linalg.norm(a)))
    assert r.z == pytest.approx(list((a - a.mean()) / a.std(ddof=1)))
    assert r.ns == pytest.approx(list(a / a.sum()))
    assert r.ns100 == pytest.approx(list(a * 100 / a.sum()))
    assert r.mm == pytest.approx(list((a - a.min()) / (a.max() - a.min())))
    assert r.mm11 == pytest.approx(list(-1 + (a - a.min()) * 2 / (a.max() - a.min())))


def test_moving_avg_and_diff(frame):
    r = frame.filter("id = 3").select(
        _ev("movingAvg", F.col("a"), F.lit(2)).alias("ma"),
        _ev("diff", F.col("a")).alias("d1"),
        _ev("diff", F.col("a"), F.lit(2)).alias("d2"),
    ).first()
    a = np.array([-2.0, 8, 0.5, 1.5, 10])
    assert r.ma == pytest.approx([(a[i] + a[i + 1]) / 2 for i in range(4)])
    assert r.d1 == pytest.approx(list(np.diff(a)))
    assert r.d2 == pytest.approx(list(a[2:] - a[:-2]))


# ------------------------------------------------------------ parse / let --


def test_parse_eval_namespace(frame):
    # evaluator 'log' is NATURAL log (NaturalLogEvaluator), unlike the
    # function-query 'log' (base 10) — the namespace layering must pick ln
    got = _vals(frame.withColumn("out", parse_eval("log(x)")), "out")
    assert got == pytest.approx([math.log(4.0), math.log(9.0), math.log(0.25)])
    got = _vals(frame.withColumn("out", parse_eval("mean(ebeAdd(a, a))")), "out")
    assert got == pytest.approx([5.0, 10.0, 7.2])


def test_parse_func_still_base10(frame):
    from lucene_solr_spark.functions import parse_func

    got = _vals(frame.withColumn("out", parse_func("log(x)")), "out")
    assert got == pytest.approx([math.log10(4.0), math.log10(9.0), math.log10(0.25)])


def test_let_bindings_chain(frame):
    df = apply_let(frame, "let(m = mean(a), centered = scalarSubtract(m, a), chk = grandSum(centered))")
    rows = {r.id: r for r in df.collect()}
    assert rows[1].m == pytest.approx(2.5)
    assert rows[1].centered == pytest.approx([-1.5, -0.5, 0.5, 1.5])
    for r in rows.values():
        assert r.chk == pytest.approx(0.0, abs=1e-9)  # centering invariant


def test_let_parse_errors():
    with pytest.raises(ValueError):
        parse_let("notlet(a=1)")
    with pytest.raises(ValueError):
        parse_let("let(= 1)")


def test_registry_size():
    # the pragmatic-zoo bar: function queries + evaluators ≈ the ~100-name
    # commonly-used surface (VERDICT r2 #8)
    from lucene_solr_spark.functions import FUNCTIONS

    merged = {**FUNCTIONS, **EVALUATORS}
    assert len(merged) >= 100


def test_array_statistics_second_tranche(frame):
    r = frame.filter("id = 3").select(
        _ev("avg", F.col("a")).alias("avg"),
        _ev("min", F.col("a")).alias("mn"),
        _ev("max", F.col("a")).alias("mx"),
        _ev("sum", F.col("a")).alias("sm"),
        _ev("count", F.col("a")).alias("n"),
        _ev("percentile", F.col("a"), F.lit(50.0)).alias("p50"),
        _ev("percentile", F.col("a"), F.lit(90.0)).alias("p90"),
        _ev("cov", F.col("a"), F.col("b")).alias("cov"),
        _ev("corr", F.col("a"), F.col("a")).alias("selfcorr"),
        _ev("distance", F.col("a"), F.col("b")).alias("dist"),
        _ev("meanDifference", F.col("a"), F.col("b")).alias("md"),
        _ev("sumDifference", F.col("a"), F.col("b")).alias("sd"),
    ).first()
    a = np.array([-2.0, 8.0, 0.5, 1.5, 10.0])
    b = np.ones(5)
    assert r.avg == pytest.approx(a.mean())
    assert (r.mn, r.mx, r.sm, r.n) == (a.min(), a.max(), pytest.approx(a.sum()), 5)
    # commons-math LEGACY percentile: pos = p/100*(n+1)
    s = np.sort(a)
    assert r.p50 == pytest.approx(s[2])  # pos=3 exactly -> 3rd order stat
    assert r.p90 == pytest.approx(s[-1])  # pos=5.4 >= n -> max
    assert r.cov == pytest.approx(np.cov(a, b, ddof=1)[0, 1])
    assert r.selfcorr == pytest.approx(1.0)
    assert r.dist == pytest.approx(np.linalg.norm(a - b))
    assert r.md == pytest.approx((a - b).mean())
    assert r.sd == pytest.approx((a - b).sum())


def test_mode_freqtable_describe(spark):
    df = spark.createDataFrame([([1.0, 2.0, 2.0, 3.0, 3.0, 4.0],)], "a array<double>")
    r = df.select(
        _ev("mode", F.col("a")).alias("mode"),
        _ev("freqTable", F.col("a")).alias("ft"),
        _ev("describe", F.col("a")).alias("d"),
    ).first()
    assert r.mode == [2.0, 3.0]  # ALL most-frequent values, ascending
    ft = [(x["value"], x["count"], round(x["pct"], 6)) for x in r.ft]
    assert ft == [(1.0, 1, round(1 / 6, 6)), (2.0, 2, round(2 / 6, 6)),
                  (3.0, 2, round(2 / 6, 6)), (4.0, 1, round(1 / 6, 6))]
    a = np.array([1.0, 2, 2, 3, 3, 4])
    assert r.d["N"] == 6 and r.d["mean"] == pytest.approx(a.mean())
    assert r.d["var"] == pytest.approx(a.var(ddof=1))


def test_moving_windows_and_pairsort(spark):
    df = spark.createDataFrame(
        [([3.0, 1.0, 4.0, 1.0, 5.0, 9.0, 2.0], [10.0, 20.0, 30.0])],
        "a array<double>, b array<double>",
    )
    r = df.select(
        _ev("movingMedian", F.col("a"), F.lit(3)).alias("mm"),
        _ev("movingMAD", F.col("a"), F.lit(3)).alias("mad"),
        _ev("expMovingAvg", F.col("b"), F.lit(2)).alias("ema"),
        _ev("pairSort", F.col("b"), _ev("rev", F.col("b"))).alias("ps"),
    ).first()
    a = np.array([3.0, 1, 4, 1, 5, 9, 2])
    want_mm = [float(np.median(a[i:i + 3])) for i in range(5)]
    assert r.mm == pytest.approx(want_mm)
    want_mad = [float(np.abs(a[i:i + 3] - a[i:i + 3].mean()).mean()) for i in range(5)]
    assert r.mad == pytest.approx(want_mad)
    # EMA: seed = mean(10,20)=15; alpha=2/3; next = 15 + 2/3*(30-15) = 25
    assert r.ema == pytest.approx([15.0, 25.0])
    # pairSort sorts by the first vector, carrying the second
    assert r.ps[0] == [10.0, 20.0, 30.0] and r.ps[1] == [30.0, 20.0, 10.0]


def test_matrix_family(spark):
    df = spark.createDataFrame([(1,)], "id int")
    m = _ev("matrix", F.array(F.lit(1.0), F.lit(2.0)), F.array(F.lit(3.0), F.lit(4.0)))
    r = df.select(
        _ev("transpose", m).alias("t"),
        _ev("rowAt", m, F.lit(1)).alias("r1"),
        _ev("colAt", m, F.lit(0)).alias("c0"),
        _ev("rowCount", m).alias("rc"),
        _ev("columnCount", m).alias("cc"),
        _ev("sumRows", m).alias("sr"),
        _ev("sumColumns", m).alias("sc"),
        _ev("matrixMult", m, m).alias("mm"),
        _ev("replace", F.array(F.lit(1.0), F.lit(2.0), F.lit(1.0)), F.lit(1.0), F.lit(9.0)).alias("rep"),
    ).first()
    assert r.t == [[1.0, 3.0], [2.0, 4.0]]
    assert r.r1 == [3.0, 4.0] and r.c0 == [1.0, 3.0]
    assert (r.rc, r.cc) == (2, 2)
    assert r.sr == [3.0, 7.0] and r.sc == [4.0, 6.0]
    # [[1,2],[3,4]]^2 = [[7,10],[15,22]]
    assert r.mm == [[7.0, 10.0], [15.0, 22.0]]
    assert r.rep == [9.0, 2.0, 9.0]
