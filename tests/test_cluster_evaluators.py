"""Clustering / multivariate-regression evaluators — kmeans/multiKmeans/
fuzzyKmeans (+ getCentroids/getCluster/getMembershipMatrix), knnRegress,
olsRegress — against pure-Python/numpy mirrors of the commons-math
algorithms the reference delegates to (``solr/solrj/src/java/org/apache/
solr/client/solrj/io/eval/{Kmeans,MultiKmeans,FuzzyKmeans,KnnRegression,
OLSRegression}Evaluator.java``). Init is deterministic (first k rows /
rotating restarts) where commons seeds an RNG — documented in the module.
"""

import math

import numpy as np
import pytest

from lucene_solr_spark.evaluators import apply_let, parse_eval

# two well-separated 2-D clusters; rows ordered so the first two rows (the
# deterministic init) land one in each cluster
DATA = [
    [0.0, 0.0],
    [5.0, 5.0],
    [0.1, 0.2],
    [5.2, 4.9],
    [-0.1, 0.1],
    [4.8, 5.1],
    [0.2, -0.1],
]
_MAT = "matrix(%s)" % ", ".join(
    "array(%s)" % ", ".join(map(str, row)) for row in DATA
)


def _row(spark, let_text):
    return apply_let(spark.range(1), let_text).collect()[0]


# --------------------------------------------------------------------------
# mirrors


def _lloyd_py(data, k, iters):
    cents = [list(r) for r in data[:k]]
    for _ in range(iters):
        groups = [[] for _ in range(k)]
        for row in data:
            j = min(
                range(k),
                key=lambda j: (
                    sum((a - b) ** 2 for a, b in zip(row, cents[j])),
                    j,
                ),
            )
            groups[j].append(row)
        for j in range(k):
            if groups[j]:
                cents[j] = [
                    sum(r[d] for r in groups[j]) / len(groups[j])
                    for d in range(len(data[0]))
                ]
    assign = [
        min(range(k), key=lambda j: (sum((a - b) ** 2 for a, b in zip(row, cents[j])), j))
        for row in data
    ]
    return cents, assign


def _fuzzy_py(data, k, fz, iters):
    cents = [list(r) for r in data[:k]]

    def memb_row(row):
        d = [math.sqrt(sum((a - b) ** 2 for a, b in zip(row, c))) for c in cents]
        if any(x == 0.0 for x in d):
            nz = sum(1 for x in d if x == 0.0)
            return [(1.0 / nz if x == 0.0 else 0.0) for x in d]
        p = 2.0 / (fz - 1.0)
        return [1.0 / sum((dj / dl) ** p for dl in d) for dj in d]

    for _ in range(iters):
        u = [memb_row(row) for row in data]
        cents = [
            [
                sum(u[i][j] ** fz * data[i][d] for i in range(len(data)))
                / sum(u[i][j] ** fz for i in range(len(data)))
                for d in range(len(data[0]))
            ]
            for j in range(k)
        ]
    return cents, [memb_row(row) for row in data]


# --------------------------------------------------------------------------


def test_kmeans_matches_lloyd(spark):
    row = _row(
        spark,
        f"let(m={_MAT}, cl=kmeans(m, 2, maxIterations=5), "
        "c=getCentroids(cl), g0=getCluster(cl, 0), g1=getCluster(cl, 1))",
    )
    cents, assign = _lloyd_py(DATA, 2, 5)
    assert np.allclose([list(c) for c in row["c"]], cents, atol=1e-12)
    for j, key in enumerate(("g0", "g1")):
        expect = [DATA[i] for i in range(len(DATA)) if assign[i] == j]
        assert np.allclose([list(r) for r in row[key]], expect, atol=1e-12)


def test_kmeans_default_iterations(spark):
    # no maxIterations named param -> default; separated data is already at
    # the fixpoint by then
    row = _row(spark, f"let(m={_MAT}, c=getCentroids(kmeans(m, 2)))")
    cents, _ = _lloyd_py(DATA, 2, 20)
    assert np.allclose([list(c) for c in row["c"]], cents, atol=1e-12)


def test_multi_kmeans_is_best_wcss_restart(spark):
    # separated data: every restart converges to the same partition, the
    # strict < keeps the first trial — mirror is the offset-0 run
    row = _row(spark, f"let(m={_MAT}, c=getCentroids(multiKmeans(m, 2, 3)))")
    cents, _ = _lloyd_py(DATA, 2, 20)
    assert np.allclose([list(c) for c in row["c"]], cents, atol=1e-12)


def test_fuzzy_kmeans_membership(spark):
    row = _row(
        spark,
        f"let(m={_MAT}, cl=fuzzyKmeans(m, 2, fuzziness=2.0, maxIterations=5), "
        "c=getCentroids(cl), u=getMembershipMatrix(cl))",
    )
    cents, memb = _fuzzy_py(DATA, 2, 2.0, 5)
    assert np.allclose([list(c) for c in row["c"]], cents, atol=1e-9)
    assert np.allclose([list(r) for r in row["u"]], memb, atol=1e-9)
    # memberships are distributions
    for r in row["u"]:
        assert sum(r) == pytest.approx(1.0, abs=1e-12)


def test_get_membership_rejects_hard_kmeans(spark):
    with pytest.raises(ValueError):
        parse_eval(f"getMembershipMatrix(kmeans({_MAT}, 2))")


# --------------------------------------------------------------------------
# knnRegress


OBS = [[1.0, 10.0], [2.0, 20.0], [3.0, 30.0], [4.0, 40.0], [5.0, 50.0], [6.0, 60.0]]
OUT = [1.5, 2.5, 3.5, 4.5, 5.5, 6.5]
_OBS = "matrix(%s)" % ", ".join("array(%s)" % ", ".join(map(str, r)) for r in OBS)
_OUT = "array(%s)" % ", ".join(map(str, OUT))


def _knn_py(obs, out, k, vec, robust=False, scale=False):
    obs = [list(r) for r in obs]
    vec = list(vec)
    if scale:
        for i in range(len(vec)):
            col = [r[i] for r in obs] + [vec[i]]
            mn, mx = min(col), max(col)
            rng = (mx - mn) or 1.0
            for r in obs:
                r[i] = (r[i] - mn) / rng
            vec[i] = (vec[i] - mn) / rng
    scored = sorted(
        (math.sqrt(sum((a - b) ** 2 for a, b in zip(vec, r))), i)
        for i, r in enumerate(obs)
    )
    outs = [out[i] for _, i in scored[:k]]
    if robust:
        # commons Median = Percentile(50), LEGACY estimation
        s = sorted(outs)
        pos = 0.5 * (len(s) + 1)
        f = int(pos)
        if pos < 1:
            return s[0]
        if pos >= len(s):
            return s[-1]
        return s[f - 1] + (pos - f) * (s[f] - s[f - 1])
    return sum(outs) / len(outs)


def test_knn_regress_mean_and_robust(spark):
    row = _row(
        spark,
        f"let(m={_OBS}, y={_OUT}, "
        "r1=knnRegress(m, y, 3), p1=predict(r1, array(3.4, 33)), "
        "r2=knnRegress(m, y, 4, robust=true), p2=predict(r2, array(3.4, 33)))",
    )
    assert row["p1"] == pytest.approx(_knn_py(OBS, OUT, 3, [3.4, 33]), abs=1e-12)
    assert row["p2"] == pytest.approx(
        _knn_py(OBS, OUT, 4, [3.4, 33], robust=True), abs=1e-12
    )


def test_knn_regress_scaled(spark):
    # second feature dominates unscaled distances; scale=true normalizes
    # each feature column jointly with the predictor (KnnRegressionTuple.scale)
    row = _row(
        spark,
        f"let(m={_OBS}, y={_OUT}, "
        "r=knnRegress(m, y, 2, scale=true), p=predict(r, array(2.2, 58)))",
    )
    assert row["p"] == pytest.approx(
        _knn_py(OBS, OUT, 2, [2.2, 58], scale=True), abs=1e-12
    )


# --------------------------------------------------------------------------
# olsRegress


XMAT = [
    [1.0, 2.0],
    [2.0, 1.0],
    [3.0, 4.0],
    [4.0, 3.0],
    [5.0, 7.0],
    [6.0, 5.0],
    [7.0, 8.0],
]
YVEC = [5.1, 4.2, 11.3, 10.1, 19.8, 15.9, 23.2]
_X = "matrix(%s)" % ", ".join("array(%s)" % ", ".join(map(str, r)) for r in XMAT)
_Y = "array(%s)" % ", ".join(map(str, YVEC))


def test_ols_regress_matches_numpy(spark):
    row = _row(
        spark,
        f"let(x={_X}, y={_Y}, o=olsRegress(x, y), "
        "w=getValue(o, 'regressionParameters'), "
        "r2=getValue(o, 'RSquared'), a2=getValue(o, 'adjustedRSquared'), "
        "ssr=getValue(o, 'residualSumSquares'), "
        "rv=getValue(o, 'regressandVariance'), "
        "p=predict(o, array(3.5, 4.5)))",
    )
    X = np.hstack([np.ones((len(XMAT), 1)), np.array(XMAT)])
    y = np.array(YVEC)
    w, *_ = np.linalg.lstsq(X, y, rcond=None)
    assert list(row["w"]) == pytest.approx(list(w), abs=1e-9)
    resid = y - X @ w
    ssr = float(resid @ resid)
    sst = float(((y - y.mean()) ** 2).sum())
    n, p1 = X.shape
    assert row["ssr"] == pytest.approx(ssr, abs=1e-9)
    assert row["r2"] == pytest.approx(1 - ssr / sst, abs=1e-12)
    assert row["a2"] == pytest.approx(
        1 - (1 - (1 - ssr / sst)) * (n - 1) / (n - p1), abs=1e-12
    )
    assert row["rv"] == pytest.approx(float(y.var(ddof=1)), abs=1e-12)
    assert row["p"] == pytest.approx(float(w @ [1.0, 3.5, 4.5]), abs=1e-9)


def test_ols_predict_inline(spark):
    got = (
        apply_let(
            spark.range(1),
            f"let(p=predict(olsRegress({_X}, {_Y}), array(1, 2)))",
        )
        .collect()[0]["p"]
    )
    X = np.hstack([np.ones((len(XMAT), 1)), np.array(XMAT)])
    w, *_ = np.linalg.lstsq(X, np.array(YVEC), rcond=None)
    assert got == pytest.approx(float(w @ [1.0, 1.0, 2.0]), abs=1e-9)
