"""Curve-fit evaluator tranche — ``harmonicFit``/``harmfit`` (+
``getAmplitude``/``getAngularFrequency``/``getPhase``), ``gaussfit``,
``bicubicSpline``, ``projectToBorder``, ``featureSelect`` (reference
``solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
HarmonicFitEvaluator.java``, ``GaussFitEvaluator.java``,
``BicubicSplineEvaluator.java``, ``ProjectToBorderEvaluator.java``,
``FeatureSelectEvaluator.java``).

The commons-math fitters run Levenberg-Marquardt to convergence from a
closed-form ParameterGuesser start; the engine runs the SAME guesser then a
fixed 5-step Gauss-Newton refinement (deterministic, documented). Each test
mirrors the engine's exact algorithm in pure Python and pins values, plus
loose accuracy checks against the true generating curves.
"""

import math

import pytest

from lucene_solr_spark.evaluators import apply_let


def _row(spark, text):
    return apply_let(spark.range(1), text).collect()[0]


# ---------------------------------------------------------------- mirrors


def harmonic_guess(xs, ys):
    """commons HarmonicCurveFitter.ParameterGuesser (integral method)."""
    sx2 = sy2 = sxy = sxz = syz = 0.0
    f2i = fp2i = 0.0
    start_x = cx = xs[0]
    cy = ys[0]
    for i in range(1, len(xs)):
        px, py = cx, cy
        cx, cy = xs[i], ys[i]
        dx = cx - px
        dy = cy - py
        f2i += dx * (py * py + py * cy + cy * cy) / 3
        fp2i += dy * dy / dx
        z = cx - start_x
        sx2 += z * z
        sy2 += f2i * f2i
        sxy += z * f2i
        sxz += z * fp2i
        syz += f2i * fp2i
    c1 = sy2 * sxz - sxy * syz
    c2 = sxy * sxz - sx2 * syz
    c3 = sx2 * sy2 - sxy * sxy
    if c2 == 0 or c3 == 0 or c1 / c2 < 0 or c2 / c3 < 0:
        rng = xs[-1] - xs[0]
        omega = 2 * math.pi / rng
        a = 0.5 * (max(ys) - min(ys))
    else:
        a = math.sqrt(c1 / c2)
        omega = math.sqrt(c2 / c3)
    fc = fs = 0.0
    cx, cy = xs[0], ys[0]
    for i in range(1, len(xs)):
        px, py = cx, cy
        cx, cy = xs[i], ys[i]
        yp = (cy - py) / (cx - px)
        wx = omega * cx
        fc += omega * cy * math.cos(wx) - yp * math.sin(wx)
        fs += omega * cy * math.sin(wx) + yp * math.cos(wx)
    return a, omega, math.atan2(-fs, fc)


def solve3(N, b):
    det = (
        N[0][0] * (N[1][1] * N[2][2] - N[1][2] * N[2][1])
        - N[0][1] * (N[1][0] * N[2][2] - N[1][2] * N[2][0])
        + N[0][2] * (N[1][0] * N[2][1] - N[1][1] * N[2][0])
    )
    if abs(det) < 1e-250:
        return [0.0, 0.0, 0.0]
    out = []
    for j in range(3):
        Aj = [[(b[i] if k == j else N[i][k]) for k in range(3)] for i in range(3)]
        dj = (
            Aj[0][0] * (Aj[1][1] * Aj[2][2] - Aj[1][2] * Aj[2][1])
            - Aj[0][1] * (Aj[1][0] * Aj[2][2] - Aj[1][2] * Aj[2][0])
            + Aj[0][2] * (Aj[1][0] * Aj[2][1] - Aj[1][1] * Aj[2][0])
        )
        out.append(dj / det)
    return out


def harmonic_fit(xs, ys, steps=5):
    a, w, p = harmonic_guess(xs, ys)
    for _ in range(steps):
        N = [[0.0] * 3 for _ in range(3)]
        b = [0.0] * 3
        for x, y in zip(xs, ys):
            g = [math.cos(w * x + p), -a * x * math.sin(w * x + p), -a * math.sin(w * x + p)]
            r = y - a * math.cos(w * x + p)
            for i in range(3):
                b[i] += g[i] * r
                for j in range(3):
                    N[i][j] += g[i] * g[j]
        d = solve3(N, b)
        a, w, p = a + d[0], w + d[1], p + d[2]
    return a, w, p


def gauss_guess(xs, ys):
    """commons GaussianCurveFitter.ParameterGuesser — including the 3.6.1
    ``halfY = n + ((m - n) / 2)`` quirk (mean mixed into the half-max)."""
    imax = max(range(len(ys)), key=lambda i: (ys[i], -i))
    # first max: walk ties left
    for i in range(len(ys)):
        if ys[i] == ys[imax]:
            imax = i
            break
    n, m = ys[imax], xs[imax]
    half = n + (m - n) / 2

    def interp(step):
        i = imax
        while 0 <= i + step < len(xs):
            y1, y2 = ys[i], ys[i + step]
            if min(y1, y2) <= half <= max(y1, y2):
                x1, x2 = xs[i], xs[i + step]
                if y2 == y1:
                    return x1
                return x1 + (half - y1) * (x2 - x1) / (y2 - y1)
            i += step
        return None

    x1, x2 = interp(-1), interp(1)
    if x1 is None or x2 is None:
        fwhm = xs[-1] - xs[0]
    else:
        fwhm = x2 - x1
    s = fwhm / (2 * math.sqrt(2 * math.log(2)))
    return n, m, s


def gauss_fit(xs, ys, steps=5):
    pts = sorted(zip(xs, ys))
    xs = [p[0] for p in pts]
    ys = [p[1] for p in pts]
    n, m, s = gauss_guess(xs, ys)
    for _ in range(steps):
        N = [[0.0] * 3 for _ in range(3)]
        b = [0.0] * 3
        for x, y in zip(xs, ys):
            f = n * math.exp(-((x - m) ** 2) / (2 * s * s))
            g = [f / n, f * (x - m) / (s * s), f * (x - m) ** 2 / (s ** 3)]
            r = y - f
            for i in range(3):
                b[i] += g[i] * r
                for j in range(3):
                    N[i][j] += g[i] * g[j]
        d = solve3(N, b)
        n, m, s = n + d[0], m + d[1], s + d[2]
    return n, m, s


def natural_spline_eval(xs, ys, v):
    """Natural cubic spline (the engine's _natural_c Thomas sweep form)."""
    n = len(xs)
    h = [xs[i + 1] - xs[i] for i in range(n - 1)]
    # tridiagonal solve for second-derivative coefficients c (natural ends)
    al = [0.0] * n
    for i in range(1, n - 1):
        al[i] = 3 / h[i] * (ys[i + 1] - ys[i]) - 3 / h[i - 1] * (ys[i] - ys[i - 1])
    l = [1.0] + [0.0] * (n - 1)
    mu = [0.0] * n
    z = [0.0] * n
    for i in range(1, n - 1):
        l[i] = 2 * (xs[i + 1] - xs[i - 1]) - h[i - 1] * mu[i - 1]
        mu[i] = h[i] / l[i]
        z[i] = (al[i] - h[i - 1] * z[i - 1]) / l[i]
    c = [0.0] * n
    for j in range(n - 2, 0, -1):
        c[j] = z[j] - mu[j] * c[j + 1]
    # segment eval
    j = max(0, min(n - 2, _last_le(xs, v)))
    bb = (ys[j + 1] - ys[j]) / h[j] - h[j] * (c[j + 1] + 2 * c[j]) / 3
    dd = (c[j + 1] - c[j]) / (3 * h[j])
    t = v - xs[j]
    return ys[j] + bb * t + c[j] * t * t + dd * t ** 3


def _last_le(xs, v):
    j = 0
    for i, x in enumerate(xs):
        if x <= v:
            j = i
    return j


def bicubic_eval(xs, ys, grid, xv, yv):
    i0 = max(0, min(_last_le(xs, xv) - 2, len(xs) - 5))
    j0 = max(0, min(_last_le(ys, yv) - 2, len(ys) - 5))
    zz = []
    for ii in range(5):
        row = grid[i0 + ii][j0:j0 + 5]
        zz.append(natural_spline_eval(ys[j0:j0 + 5], row, yv))
    return natural_spline_eval(xs[i0:i0 + 5], zz, xv)


# ------------------------------------------------------------------ tests


_HX = [i * 0.25 for i in range(40)]
_HY = [3.0 * math.cos(1.7 * x + 0.4) for x in _HX]


def _arr(vals):
    return "array(" + ", ".join(repr(round(v, 10)) for v in vals) + ")"


def test_harmonic_fit_values_and_getters(spark):
    row = _row(
        spark,
        f"let(f=harmonicFit({_arr(_HX)}, {_arr(_HY)}), "
        "a=getAmplitude(f), w=getAngularFrequency(f), p=getPhase(f))",
    )
    xs = [round(v, 10) for v in _HX]
    ys = [round(v, 10) for v in _HY]
    a, w, p = harmonic_fit(xs, ys)
    assert row["a"] == pytest.approx(a, rel=1e-9)
    assert row["w"] == pytest.approx(w, rel=1e-9)
    assert row["p"] == pytest.approx(p, rel=1e-9)
    # and the fit actually recovered the generating curve
    assert abs(a) == pytest.approx(3.0, rel=1e-3)
    assert abs(w) == pytest.approx(1.7, rel=1e-3)
    want = [a * math.cos(w * x + p) for x in xs]
    assert list(row["f"]["vals"]) == pytest.approx(want, rel=1e-6, abs=1e-8)


def test_harmfit_alias_and_predict(spark):
    row = _row(
        spark,
        f"let(f=harmfit({_arr(_HX)}, {_arr(_HY)}), y=predict(f, 2.0))",
    )
    xs = [round(v, 10) for v in _HX]
    ys = [round(v, 10) for v in _HY]
    a, w, p = harmonic_fit(xs, ys)
    assert row["y"] == pytest.approx(a * math.cos(w * 2.0 + p), rel=1e-9)


def test_harmonic_fit_y_only_uses_index_x(spark):
    ys = [2.0 * math.cos(0.9 * i + 1.1) for i in range(30)]
    row = _row(spark, f"let(f=harmonicFit({_arr(ys)}), a=getAmplitude(f))")
    a, w, p = harmonic_fit(list(range(30)), [round(v, 10) for v in ys])
    assert row["a"] == pytest.approx(a, rel=1e-9)


_GX = [i * 0.5 for i in range(30)]
_GY = [4.0 * math.exp(-((x - 7.0) ** 2) / (2 * 2.25)) + 0.01 for x in _GX]


def test_gaussfit_values(spark):
    row = _row(spark, f"let(f=gaussfit({_arr(_GX)}, {_arr(_GY)}))")
    xs = [round(v, 10) for v in _GX]
    ys = [round(v, 10) for v in _GY]
    n, m, s = gauss_fit(xs, ys)
    want = [n * math.exp(-((x - m) ** 2) / (2 * s * s)) for x in xs]
    assert list(row["f"]["vals"]) == pytest.approx(want, rel=1e-9)
    assert n == pytest.approx(4.0, abs=0.05)
    assert m == pytest.approx(7.0, abs=0.05)
    assert s == pytest.approx(1.5, abs=0.05)


def test_gaussfit_predict(spark):
    row = _row(spark, f"let(f=gaussfit({_arr(_GX)}, {_arr(_GY)}), y=predict(f, 6.2))")
    xs = [round(v, 10) for v in _GX]
    ys = [round(v, 10) for v in _GY]
    n, m, s = gauss_fit(xs, ys)
    assert row["y"] == pytest.approx(n * math.exp(-((6.2 - m) ** 2) / (2 * s * s)), rel=1e-9)


def test_bicubic_spline_predict(spark):
    xs = [0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0]
    ys = [0.0, 2.0, 4.0, 6.0, 8.0]
    grid = [[math.sin(0.3 * x) * y + 0.1 * y * y for y in ys] for x in xs]
    rows = ", ".join(_arr(r) for r in grid)
    row = _row(
        spark,
        f"let(b=bicubicSpline({_arr(xs)}, {_arr(ys)}, matrix({rows})), "
        "p1=predict(b, 2.5, 3.0), p2=predict(b, 0.5, 7.5), p3=predict(b, 5.9, 0.1))",
    )
    for key, (xv, yv) in {"p1": (2.5, 3.0), "p2": (0.5, 7.5), "p3": (5.9, 0.1)}.items():
        assert row[key] == pytest.approx(bicubic_eval(xs, ys, grid, xv, yv), rel=1e-9)
    # interpolates the grid points (up to spline smoothing at knots: exact)
    row = _row(
        spark,
        f"let(b=bicubicSpline({_arr(xs)}, {_arr(ys)}, matrix({rows})), "
        "p=predict(b, 3.0, 4.0))",
    )
    assert row["p"] == pytest.approx(grid[3][2], rel=1e-9)


def test_project_to_border(spark):
    # unit square hull; points project to its nearest edge
    row = _row(
        spark,
        "let(h=convexHull(matrix(array(0, 0), array(0, 1), array(1, 0), array(1, 1))), "
        "p=projectToBorder(h, matrix(array(0.5, 0.2), array(2, 0.5), array(0.9, 0.9))))",
    )
    got = [list(r) for r in row["p"]]
    assert got[0] == pytest.approx([0.5, 0.0])   # nearest edge: bottom
    assert got[1] == pytest.approx([1.0, 0.5])   # outside: clamps to right edge
    assert got[2] == pytest.approx([1.0, 0.9])   # nearest edge: right


def test_feature_select(spark):
    row = _row(
        spark,
        "let(m=setColumnLabels(matrix(array(1, 2, 3), array(4, 5, 6)), "
        "array('a', 'b', 'c')), s=featureSelect(m, array('c', 'a')), "
        "cl=getColumnLabels(s))",
    )
    assert list(row["cl"]) == ["a", "c"]  # original column order preserved
    assert [list(r) for r in row["s"]["m"]] == [[1.0, 3.0], [4.0, 6.0]]


def test_gaussfit_peak_at_edge_uses_range_fallback(spark):
    # monotone data: the peak is the LAST point, no right half-max crossing
    # exists — the guess must take the full-range FWHM fallback, not a
    # degenerate zero sigma (the descending-sequence trap)
    xs = [0.0, 1.0, 2.0, 3.0, 4.0]
    ys = [0.1, 0.2, 0.4, 0.7, 1.0]
    row = _row(spark, f"let(f=gaussfit({_arr(xs)}, {_arr(ys)}))")
    vals = list(row["f"]["vals"])
    assert all(v == v for v in vals)  # no NaNs
    n, m, s = gauss_fit(xs, ys)
    assert vals == pytest.approx(
        [n * math.exp(-((x - m) ** 2) / (2 * s * s)) for x in xs], rel=1e-9
    )


def test_harmonic_fit_fallback_on_flat_data(spark):
    # constant data: the integral system is indefinite → the guesser takes
    # the range fallback (a = (max−min)/2 = 0, w = 2π/range), and the GN
    # normal matrix is singular → the Cramer guard keeps deltas at zero.
    # (On sloped aperiodic data GN diverges chaotically and last-ulp
    # engine differences amplify — that regime is unpinnable by design.)
    xs = [float(i) for i in range(12)]
    ys = [2.5] * 12
    row = _row(spark, f"let(f=harmonicFit({_arr(xs)}, {_arr(ys)}), a=getAmplitude(f), w=getAngularFrequency(f))")
    a, w, p = harmonic_fit(xs, ys)
    assert a == 0.0 and row["a"] == 0.0
    assert row["w"] == pytest.approx(w, rel=1e-12)
    assert w == pytest.approx(2 * math.pi / 11, rel=1e-12)


def test_fit_mirror_sweep(spark):
    # deterministic pseudo-random datasets (fixed LCG) — every path must
    # match the pure-Python mirror bit-for-bit-ish
    def lcg(seed, n):
        out, s = [], seed
        for _ in range(n):
            s = (s * 16807) % 2147483647
            out.append(s / 2147483647)
        return out

    for seed in (7, 99):
        noise = lcg(seed, 25)
        xs = [i * 0.4 for i in range(25)]
        hy = [2.2 * math.cos(1.1 * x + 0.9) + 0.05 * (u - 0.5) for x, u in zip(xs, noise)]
        row = _row(spark, f"let(f=harmonicFit({_arr(xs)}, {_arr(hy)}), a=getAmplitude(f), w=getAngularFrequency(f), p=getPhase(f))")
        a, w, p = harmonic_fit([round(v, 10) for v in xs], [round(v, 10) for v in hy])
        assert row["a"] == pytest.approx(a, rel=1e-6)
        assert row["w"] == pytest.approx(w, rel=1e-6)
        gy = [3.0 * math.exp(-((x - 5.0) ** 2) / 4.0) + 0.1 * (u - 0.5) for x, u in zip(xs, noise)]
        row = _row(spark, f"let(f=gaussfit({_arr(xs)}, {_arr(gy)}))")
        n, m, s = gauss_fit([round(v, 10) for v in xs], [round(v, 10) for v in gy])
        want = [n * math.exp(-((x - m) ** 2) / (2 * s * s)) for x in [round(v, 10) for v in xs]]
        assert list(row["f"]["vals"]) == pytest.approx(want, rel=1e-6)
