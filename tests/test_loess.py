"""loess — against a pure-Python mirror of commons-math3
LoessInterpolator.smooth (``solr/solrj/src/java/org/apache/solr/client/
solrj/io/eval/LoessEvaluator.java``: bandwidth 0.25, robustIterations 2;
the returned function is the natural spline over the SMOOTHED values)."""

import math

import pytest

from lucene_solr_spark.evaluators import apply_let

XS = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0, 9.0, 10.0, 11.0]
YS = [1.0, 1.8, 3.4, 3.1, 4.9, 6.2, 5.8, 7.7, 9.4, 8.6, 10.5, 11.1]
_ARGS = "array(%s), array(%s)" % (
    ", ".join(map(str, XS)),
    ", ".join(map(str, YS)),
)


def _loess_py(xval, yval, bandwidth=0.25, robustness_iters=2, accuracy=1e-12):
    n = len(xval)
    if n <= 2:
        return list(yval)
    bw = int(bandwidth * n)
    res = [0.0] * n
    residuals = [0.0] * n
    rw = [1.0] * n
    for it in range(robustness_iters + 1):
        interval = [0, bw - 1]
        for i in range(n):
            x = xval[i]
            if i > 0:
                left, right = interval
                if right + 1 < n and xval[right + 1] - x < x - xval[left]:
                    interval[0] += 1
                    interval[1] += 1
            left, right = interval
            edge = left if (x - xval[left]) > (xval[right] - x) else right
            denom = abs(1.0 / (xval[edge] - x))
            sw = sx = sxx = sy = sxy = 0.0
            for k in range(left, right + 1):
                xk, yk = xval[k], yval[k]
                dist = (x - xk) if k < i else (xk - x)
                t = dist * denom
                tri = 0.0 if t >= 1 else (1 - t * t * t) ** 3
                w = tri * rw[k]
                sw += w
                sx += xk * w
                sxx += xk * xk * w
                sy += yk * w
                sxy += yk * xk * w
            mx, my = sx / sw, sy / sw
            mxx, mxy = sxx / sw, sxy / sw
            if math.sqrt(abs(mxx - mx * mx)) < accuracy:
                beta = 0.0
            else:
                beta = (mxy - mx * my) / (mxx - mx * mx)
            alpha = my - beta * mx
            res[i] = beta * x + alpha
            residuals[i] = abs(yval[i] - res[i])
        if it == robustness_iters:
            break
        med = sorted(residuals)[n // 2]
        if med == 0:
            break
        for i in range(n):
            arg = residuals[i] / (6 * med)
            rw[i] = 0.0 if arg >= 1 else (1 - arg * arg) ** 2


    return res


def test_loess_smoothed_values(spark):
    row = apply_let(spark.range(1), f"let(l=loess({_ARGS}))").collect()[0]
    expect = _loess_py(XS, YS)
    # the model binds as a VectorFunction struct whose vals are the smoothed ys
    assert list(row["l"]["vals"]) == pytest.approx(expect, abs=1e-9)


def test_loess_named_params_and_predict(spark):
    row = apply_let(
        spark.range(1),
        f"let(l=loess({_ARGS}, bandwidth=0.5, robustIterations=1), "
        "p=predict(l, 4.0), q=predict(l, 4.6))",
    ).collect()[0]
    sm = _loess_py(XS, YS, bandwidth=0.5, robustness_iters=1)
    # at a knot the spline over the smoothed values IS the smoothed value
    assert row["p"] == pytest.approx(sm[4], abs=1e-9)
    # between knots: natural-spline interpolation of the smoothed series
    from tests.test_interpolation import _poly_eval, _spline_coeffs

    assert row["q"] == pytest.approx(
        _poly_eval(_spline_coeffs(XS, sm), XS, 4.6), abs=1e-9
    )
