"""Interpolation-model evaluators — lerp/akima/spline + predict/derivative/
integrate — against pure-Python mirrors of the commons-math algorithms the
reference delegates to (``solr/solrj/src/java/org/apache/solr/client/solrj/
io/eval/{Lerp,Akima,Spline,Derivative,Integrate}Evaluator.java``; the
interpolators build a commons ``PolynomialSplineFunction`` and wrap it in a
``VectorFunction`` whose list value is the fitted y's).

Also the batch-2 signal/scalar names: finddelay, hist, earthMovers, ifft,
convert, val, getValue, betaDistribution.
"""

import math

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.evaluators import apply_let, parse_eval, parse_let


def _one(spark, col):
    return spark.range(1).select(col.alias("v")).collect()[0]["v"]


def _eval(spark, text):
    return _one(spark, parse_eval(text))


# --------------------------------------------------------------------------
# pure-Python mirrors (commons-math3 algorithms, written from the published
# formulas — LinearInterpolator, AkimaSplineInterpolator, SplineInterpolator)


def _segment(xs, v):
    """PolynomialSplineFunction.value segment choice: greatest knot <= v,
    clamped to the last polynomial."""
    cnt = sum(1 for x in xs if x <= v)
    return max(min(cnt, len(xs) - 1), 1) - 1


def _lerp_coeffs(xs, ys):
    return [
        (ys[j], (ys[j + 1] - ys[j]) / (xs[j + 1] - xs[j]), 0.0, 0.0)
        for j in range(len(xs) - 1)
    ]


def _akima_slopes(xs, ys):
    n = len(xs)
    d = [(ys[i + 1] - ys[i]) / (xs[i + 1] - xs[i]) for i in range(n - 1)]

    def three_point(i, i0, i1, i2):
        y0, y1, y2 = ys[i0], ys[i1], ys[i2]
        t = xs[i] - xs[i0]
        t1 = xs[i1] - xs[i0]
        t2 = xs[i2] - xs[i0]
        a = (y2 - y0 - (t2 / t1 * (y1 - y0))) / (t2 * t2 - t1 * t2)
        b = (y1 - y0 - a * t1 * t1) / t1
        return 2 * a * t + b

    m = [0.0] * n
    m[0] = three_point(0, 0, 1, 2)
    m[1] = three_point(1, 0, 1, 2)
    for i in range(2, n - 2):
        w_p = abs(d[i + 1] - d[i])
        w_m = abs(d[i - 1] - d[i - 2])
        if w_p == 0.0 and w_m == 0.0:
            m[i] = ((xs[i + 1] - xs[i]) * d[i - 1] + (xs[i] - xs[i - 1]) * d[i]) / (
                xs[i + 1] - xs[i - 1]
            )
        else:
            m[i] = (w_p * d[i - 1] + w_m * d[i]) / (w_p + w_m)
    m[n - 2] = three_point(n - 2, n - 3, n - 2, n - 1)
    m[n - 1] = three_point(n - 1, n - 3, n - 2, n - 1)
    return m


def _hermite_coeffs(xs, ys, m):
    out = []
    for j in range(len(xs) - 1):
        h = xs[j + 1] - xs[j]
        delta = (ys[j + 1] - ys[j]) / h
        c2 = (3 * delta - 2 * m[j] - m[j + 1]) / h
        c3 = (m[j] + m[j + 1] - 2 * delta) / (h * h)
        out.append((ys[j], m[j], c2, c3))
    return out


def _spline_coeffs(xs, ys):
    """Natural cubic spline (commons SplineInterpolator: the classic
    tridiagonal algorithm)."""
    n = len(xs)
    h = [xs[i + 1] - xs[i] for i in range(n - 1)]
    mu = [0.0] * (n - 1)
    z = [0.0] * n
    for i in range(1, n - 1):
        ell = 2 * (xs[i + 1] - xs[i - 1]) - h[i - 1] * mu[i - 1]
        mu[i] = h[i] / ell
        alpha = (
            3 / h[i] * (ys[i + 1] - ys[i]) - 3 / h[i - 1] * (ys[i] - ys[i - 1])
        )
        z[i] = (alpha - h[i - 1] * z[i - 1]) / ell
    c = [0.0] * n
    for j in range(n - 2, -1, -1):
        c[j] = z[j] - mu[j] * c[j + 1]
    out = []
    for j in range(n - 1):
        b = (ys[j + 1] - ys[j]) / h[j] - h[j] * (c[j + 1] + 2 * c[j]) / 3
        d = (c[j + 1] - c[j]) / (3 * h[j])
        out.append((ys[j], b, c[j], d))
    return out


def _poly_eval(coeffs, xs, v, order=0):
    j = _segment(xs, v)
    a = list(coeffs[j])
    for _ in range(order):
        a = [a[1], 2 * a[2], 3 * a[3], 0.0]
    t = v - xs[j]
    return a[0] + a[1] * t + a[2] * t * t + a[3] * t * t * t


def _poly_integrate(coeffs, xs, lo, hi, order=0):
    lo = max(lo, xs[0])
    hi = min(hi, xs[-1])
    tot = 0.0
    for j in range(len(xs) - 1):
        s0, s1 = max(lo, xs[j]), min(hi, xs[j + 1])
        if s1 <= s0:
            continue
        a = list(coeffs[j])
        for _ in range(order):
            a = [a[1], 2 * a[2], 3 * a[3], 0.0]

        def anti(t):
            return a[0] * t + a[1] * t * t / 2 + a[2] * t ** 3 / 3 + a[3] * t ** 4 / 4

        tot += anti(s1 - xs[j]) - anti(s0 - xs[j])
    return tot


XS = [0.0, 1.0, 2.5, 3.0, 4.5, 6.0, 7.0]
YS = [1.0, 2.0, 1.5, 4.0, 3.0, 5.5, 5.0]
_ARR = "array(0, 1, 2.5, 3, 4.5, 6, 7), array(1, 2, 1.5, 4, 3, 5.5, 5)"
# probe points: interior, exact knots (incl. first/last), segment boundaries
PROBES = [0.0, 0.4, 1.0, 1.7, 2.5, 2.9, 3.0, 3.7, 4.5, 5.2, 6.0, 6.5, 7.0]


@pytest.mark.parametrize(
    "kind,coeff_fn",
    [
        ("lerp", lambda: _lerp_coeffs(XS, YS)),
        ("akima", lambda: _hermite_coeffs(XS, YS, _akima_slopes(XS, YS))),
        ("spline", lambda: _spline_coeffs(XS, YS)),
    ],
)
def test_predict_matches_commons_algorithm(spark, kind, coeff_fn):
    # let-bound model: the struct is built once, the probes reference it —
    # the shape a real let() pipeline has (inline models are covered by
    # test_inline_model_predict)
    coeffs = coeff_fn()
    binds = ", ".join(
        f"p{i}=predict(a, {v})" for i, v in enumerate(PROBES)
    )
    df = apply_let(spark.range(1), f"let(a={kind}({_ARR}), {binds})")
    row = df.collect()[0]
    for i, v in enumerate(PROBES):
        assert row[f"p{i}"] == pytest.approx(_poly_eval(coeffs, XS, v), abs=1e-9), (
            kind,
            v,
        )


def test_inline_model_predict(spark):
    # un-bound (inline) models dispatch the same way
    coeffs = _spline_coeffs(XS, YS)
    got = _eval(spark, f"predict(spline({_ARR}), 3.7)")
    assert got == pytest.approx(_poly_eval(coeffs, XS, 3.7), abs=1e-9)


@pytest.mark.parametrize("kind", ["lerp", "akima", "spline"])
def test_derivative_predict_and_values(spark, kind):
    coeffs = {
        "lerp": _lerp_coeffs(XS, YS),
        "akima": _hermite_coeffs(XS, YS, _akima_slopes(XS, YS)),
        "spline": _spline_coeffs(XS, YS),
    }[kind]
    probes = [0.4, 1.7, 3.7, 5.2, 6.5]
    binds = ", ".join(f"d{i}=predict(d, {v})" for i, v in enumerate(probes))
    df = apply_let(
        spark.range(1),
        f"let(a={kind}({_ARR}), d=derivative(a), {binds}, "
        f"dd=predict(derivative(d), 3.7))",
    )
    row = df.collect()[0]
    for i, v in enumerate(probes):
        assert row[f"d{i}"] == pytest.approx(
            _poly_eval(coeffs, XS, v, order=1), abs=1e-9
        ), (kind, v)
    # second derivative composes
    assert row["dd"] == pytest.approx(_poly_eval(coeffs, XS, 3.7, order=2), abs=1e-9)


def test_model_used_as_array_is_the_fitted_values(spark):
    # the reference VectorFunction serializes as the fitted y list — a model
    # handed to a kind-unaware evaluator behaves as that array
    got = _eval(spark, f"length(lerp({_ARR}))")
    assert got == len(XS)
    got = _eval(spark, f"valueAt(akima({_ARR}), 3)")
    assert got == pytest.approx(YS[3], abs=1e-12)
    # derivative's values are the derivative sampled at the knots
    coeffs = _spline_coeffs(XS, YS)
    got = _eval(spark, f"valueAt(derivative(spline({_ARR})), 2)")
    assert got == pytest.approx(_poly_eval(coeffs, XS, XS[2], order=1), abs=1e-9)


def test_one_arg_form_uses_index_x(spark):
    # LerpEvaluator.java: single-array form interpolates over x = 0..n-1
    ys = [2.0, 4.0, 3.0, 5.0, 6.0]
    got = _eval(spark, "predict(lerp(array(2, 4, 3, 5, 6)), 2.5)")
    assert got == pytest.approx(4.0, abs=1e-12)
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    coeffs = _hermite_coeffs(xs, ys, _akima_slopes(xs, ys))
    got = _eval(spark, "predict(akima(array(2, 4, 3, 5, 6)), 2.5)")
    assert got == pytest.approx(_poly_eval(coeffs, xs, 2.5), abs=1e-9)


def test_let_bound_model_keeps_its_kind(spark):
    df = apply_let(
        spark.range(1),
        f"let(a=spline({_ARR}), d=derivative(a), p=predict(a, 3.7), q=predict(d, 3.7))",
    )
    row = df.collect()[0]
    coeffs = _spline_coeffs(XS, YS)
    assert row["p"] == pytest.approx(_poly_eval(coeffs, XS, 3.7), abs=1e-9)
    assert row["q"] == pytest.approx(_poly_eval(coeffs, XS, 3.7, order=1), abs=1e-9)


@pytest.mark.parametrize("kind", ["lerp", "akima", "spline"])
def test_integrate_is_the_piecewise_integral(spark, kind):
    coeffs = {
        "lerp": _lerp_coeffs(XS, YS),
        "akima": _hermite_coeffs(XS, YS, _akima_slopes(XS, YS)),
        "spline": _spline_coeffs(XS, YS),
    }[kind]
    bounds = [(0.0, 7.0), (1.3, 5.9), (2.5, 3.0), (0.0, 0.0)]
    binds = ", ".join(
        f"i{i}=integrate(a, {lo}, {hi})" for i, (lo, hi) in enumerate(bounds)
    )
    df = apply_let(spark.range(1), f"let(a={kind}({_ARR}), {binds})")
    row = df.collect()[0]
    for i, (lo, hi) in enumerate(bounds):
        assert row[f"i{i}"] == pytest.approx(
            _poly_integrate(coeffs, XS, lo, hi), abs=1e-8
        ), (kind, lo, hi)


def test_spline_reproduces_a_line_exactly(spark):
    # natural cubic spline of collinear points is the line itself
    got = _eval(spark, "predict(spline(array(0, 1, 2, 3, 4), array(1, 3, 5, 7, 9)), 2.7)")
    assert got == pytest.approx(6.4, abs=1e-12)


# --------------------------------------------------------------------------
# signal / scalar names


def _finddelay_py(a, b):
    rev = list(reversed(b))
    n, m = len(a), len(rev)
    conv = [
        sum(
            a[j] * rev[k - j]
            for j in range(max(0, k - m + 1), min(k, n - 1) + 1)
        )
        for k in range(n + m - 1)
    ]
    best, idx = -float("inf"), -1
    for i, v in enumerate(conv):
        if abs(v) > best:
            best, idx = abs(v), i
    return (idx + 1) - m


def test_finddelay(spark):
    # FindDelayEvaluator.java: argmax |convolve(a, reverse(b))| -> delay
    cases = [
        ([0, 0, 1, 2, 3, 0, 0], [1, 2, 3]),
        ([1, 2, 3, 0, 0], [0, 0, 1, 2, 3]),
        ([4, 1, 0, 0, 0], [0, 0, 0, 4, 1]),
        ([1, -2, 3, -1, 2], [3, -1, 2]),
    ]
    for a, b in cases:
        expr = "finddelay(array(%s), array(%s))" % (
            ", ".join(map(str, a)),
            ", ".join(map(str, b)),
        )
        assert _eval(spark, expr) == pytest.approx(float(_finddelay_py(a, b)))


def test_earth_movers(spark):
    # commons EarthMoversDistance: cumulative-flow absolute sum
    a = [0.1, 0.4, 0.2, 0.3]
    b = [0.3, 0.2, 0.4, 0.1]
    last = tot = 0.0
    for p, q in zip(a, b):
        last = p + last - q
        tot += abs(last)
    got = _eval(spark, "earthMovers(array(0.1, 0.4, 0.2, 0.3), array(0.3, 0.2, 0.4, 0.1))")
    assert got == pytest.approx(tot, abs=1e-12)


def test_ifft_roundtrips_fft(spark):
    got = _eval(spark, "ifft(fft(array(1, 2, 3, 4, 5, 6, 7, 8)))")
    assert [round(v, 9) for v in got] == [1, 2, 3, 4, 5, 6, 7, 8]


def test_convert_lengths(spark):
    assert _eval(spark, "convert('miles', 'kilometers', 50)") == pytest.approx(80.4672)
    assert _eval(spark, "convert('inches', 'millimeters', 2)") == pytest.approx(50.8)
    # the reference takes the unit names as raw (unquoted) tokens
    assert _eval(spark, "convert(yards, meters, 100)") == pytest.approx(91.44)
    with pytest.raises(ValueError):
        parse_eval("convert('fathoms', 'meters', 1)")


def test_val_and_get_value(spark):
    assert _eval(spark, "val(10)") == 10
    assert _eval(spark, "val('a')") == "a"
    got = _eval(spark, "getValue(regress(array(1, 2, 3), array(2, 4, 6.5)), 'slope')")
    assert got == pytest.approx(2.25)


def test_beta_distribution(spark):
    # I_x(2,3) at x=.5 = 0.6875 (exact for integer parameters)
    got = _eval(spark, "cumulativeProbability(betaDistribution(2, 3), 0.5)")
    assert got == pytest.approx(0.6875, abs=1e-7)
    got = _eval(spark, "density(betaDistribution(2, 3), 0.5)")
    assert got == pytest.approx(1.5, abs=1e-9)


# --------------------------------------------------------------------------
# hist — commons EmpiricalDistribution bin stats


def _hist_py(values, bins):
    mn, mx = min(values), max(values)
    delta = (mx - mn) / bins
    n = len(values)

    def bin_of(v):
        return min(max(math.ceil((v - mn) / delta) - 1, 0), bins - 1)

    out = []
    for b in range(bins):
        vals = [v for v in values if bin_of(v) == b]
        nb = len(vals)
        mean = sum(vals) / nb
        var = (
            sum((v - mean) ** 2 for v in vals) / (nb - 1) if nb > 1 else 0.0
        )
        sd = math.sqrt(var)
        before = sum(1 for v in values if bin_of(v) < b)
        if sd > 0:
            cum = (before + 0.5 * nb) / n
            phi = lambda x: 0.5 * (1 + math.erf((x - mean) / (sd * math.sqrt(2))))
            prob = nb / n * (phi(max(vals)) - phi(min(vals)))
        else:
            cum = (before + nb) / n
            prob = 0.0
        out.append(
            dict(N=nb, min=min(vals), max=max(vals), mean=mean, stdev=sd,
                 sum=sum(vals), var=var, cumProb=cum, prob=prob)
        )
    return out


def test_hist_matches_empirical_distribution(spark):
    values = [1.0, 2.0, 2.5, 3.0, 4.0, 5.5, 6.0, 7.5, 8.0, 9.0, 9.5, 10.0]
    expect = _hist_py(values, 4)
    expr = "hist(array(%s), 4)" % ", ".join(map(str, values))
    got = _one(spark, parse_eval(expr))
    assert len(got) == 4
    for g, e in zip(got, expect):
        for k in ("N", "min", "max", "mean", "stdev", "sum", "var", "cumProb"):
            assert g[k] == pytest.approx(e[k], abs=1e-9), k
        # prob goes through the engine's A&S erf polynomial (|err| < 1.5e-7)
        assert g["prob"] == pytest.approx(e["prob"], abs=1e-6)
