"""Deterministic sampling evaluators — ``sample``/``monteCarlo``/
``markovChain``/``multiVariateNormalDistribution``/``uuid`` (reference
``solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/SampleEvaluator.
java``, ``MonteCarloEvaluator.java``, ``MarkovChainEvaluator.java``,
``MultiVariateNormalDistributionEvaluator.java``, ``UuidEvaluator.java``).

The reference draws from commons-math Well19937c; this engine's draws are
DETERMINISTIC by design (documented deviation): a Park–Miller minimal
standard generator seeded per (call-site salt, monteCarlo iteration i,
draw index j, sub-trial t), inverse-CDF transforms per distribution family.
Every test below mirrors that spec in pure Python and pins the Spark values
exactly — the same recipe any SQL oracle can replay (integer LCG + closed
forms only).
"""

import math
import zlib

import pytest

from lucene_solr_spark.evaluators import apply_let, parse_eval

M = 2147483647
A = 16807


def u_mirror(salt, j, i=0, t=0):
    s = (salt * 1000003 + 12345 + i * 7919 + j * 104729 + t * 65537) % (M - 1) + 1
    for _ in range(3):
        s = (s * A) % M
    return s / M


def binding_salt(name, ctr=0):
    return (zlib.crc32(name.encode()) & 0xFFFF) * 131 + ctr


# Acklam inverse normal CDF mirror (same coefficients as the engine)
_IA = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
       1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
_IB = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
       6.680131188771972e+01, -1.328068155288572e+01]
_IC = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
       -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
_ID = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
       3.754408661907416e+00]


def inv_norm(p):
    plow = 0.02425
    if p < plow:
        q = math.sqrt(-2 * math.log(p))
        return (((((_IC[0] * q + _IC[1]) * q + _IC[2]) * q + _IC[3]) * q + _IC[4]) * q + _IC[5]) / \
            ((((_ID[0] * q + _ID[1]) * q + _ID[2]) * q + _ID[3]) * q + 1)
    if p > 1 - plow:
        q = math.sqrt(-2 * math.log(1 - p))
        return -(((((_IC[0] * q + _IC[1]) * q + _IC[2]) * q + _IC[3]) * q + _IC[4]) * q + _IC[5]) / \
            ((((_ID[0] * q + _ID[1]) * q + _ID[2]) * q + _ID[3]) * q + 1)
    q = p - 0.5
    r = q * q
    return (((((_IA[0] * r + _IA[1]) * r + _IA[2]) * r + _IA[3]) * r + _IA[4]) * r + _IA[5]) * q / \
        (((((_IB[0] * r + _IB[1]) * r + _IB[2]) * r + _IB[3]) * r + _IB[4]) * r + 1)


def _one(spark, let_text, col="s"):
    return apply_let(spark.range(1), let_text).select(col).collect()[0][0]


def test_sample_normal_array(spark):
    got = _one(spark, "let(s=sample(normalDistribution(10, 2), 5))")
    salt = binding_salt("s")
    want = [10 + 2 * inv_norm(u_mirror(salt, j)) for j in range(5)]
    assert got == pytest.approx(want, rel=1e-12)


def test_sample_single_draw_is_j0(spark):
    got = _one(spark, "let(s=sample(normalDistribution(0, 1)))")
    salt = binding_salt("s")
    assert got == pytest.approx(inv_norm(u_mirror(salt, 0)), rel=1e-12)


def test_sample_uniform_and_uniform_integer(spark):
    got = _one(spark, "let(s=sample(uniformDistribution(2, 6), 4))")
    salt = binding_salt("s")
    want = [2 + u_mirror(salt, j) * 4 for j in range(4)]
    assert got == pytest.approx(want, rel=1e-12)

    got = _one(spark, "let(s=sample(uniformIntegerDistribution(1, 6), 8))")
    salt = binding_salt("s")
    want = [1 + math.floor(u_mirror(salt, j) * 6) for j in range(8)]
    assert got == want


def test_sample_weibull_triangular_geometric(spark):
    salt = binding_salt("s")
    got = _one(spark, "let(s=sample(weibullDistribution(2, 3), 3))")
    want = [3 * (-math.log(1 - u_mirror(salt, j))) ** 0.5 for j in range(3)]
    assert got == pytest.approx(want, rel=1e-12)

    got = _one(spark, "let(s=sample(triangularDistribution(0, 2, 10), 6))")
    want = []
    for j in range(6):
        uu = u_mirror(salt, j)
        if uu < (2 - 0) / (10 - 0):
            want.append(0 + math.sqrt(uu * 10 * 2))
        else:
            want.append(10 - math.sqrt((1 - uu) * 10 * 8))
    assert got == pytest.approx(want, rel=1e-12)

    got = _one(spark, "let(s=sample(geometricDistribution(0.3), 5))")
    want = [math.floor(math.log(1 - u_mirror(salt, j)) / math.log(0.7)) for j in range(5)]
    assert got == want


def test_sample_binomial_poisson(spark):
    salt = binding_salt("s")
    got = _one(spark, "let(s=sample(binomialDistribution(10, 0.4), 4))")
    want = [
        sum(1 for t in range(1, 11) if u_mirror(salt, j, t=t) < 0.4) for j in range(4)
    ]
    assert got == want

    lam = 4.0
    got = _one(spark, "let(s=sample(poissonDistribution(4.0), 6))")
    want = []
    for j in range(6):
        uu = u_mirror(salt, j)
        cum = term = math.exp(-lam)
        k = 0
        while cum < uu:
            k += 1
            term *= lam / k
            cum += term
        want.append(k)
    assert got == want


def test_sample_zipf_gamma_beta(spark):
    salt = binding_salt("s")
    got = _one(spark, "let(s=sample(zipFDistribution(20, 1.1), 5))")
    H = sum(r ** -1.1 for r in range(1, 21))
    want = []
    for j in range(5):
        uu = u_mirror(salt, j)
        cum = 0.0
        for r in range(1, 21):
            cum += r ** -1.1 / H
            if cum >= uu:
                want.append(r)
                break
    assert got == want

    def wh_gamma(shape, scale, z):
        x = shape * (1 - 1 / (9 * shape) + z * math.sqrt(1 / (9 * shape))) ** 3
        return max(x, 0.0) * scale

    got = _one(spark, "let(s=sample(gammaDistribution(3, 2), 4))")
    want = [wh_gamma(3, 2, inv_norm(u_mirror(salt, j))) for j in range(4)]
    assert got == pytest.approx(want, rel=1e-12)

    got = _one(spark, "let(s=sample(betaDistribution(2, 5), 4))")
    want = []
    for j in range(4):
        g1 = wh_gamma(2, 1, inv_norm(u_mirror(salt, j, t=1)))
        g2 = wh_gamma(5, 1, inv_norm(u_mirror(salt, j, t=2)))
        want.append(g1 / (g1 + g2))
    assert got == pytest.approx(want, rel=1e-12)


def test_sample_empirical_enumerated_constant_lognormal(spark):
    salt = binding_salt("s")
    data = "array(4, 1, 3, 9, 7)"
    got = _one(spark, f"let(s=sample(empiricalDistribution({data}), 5))")
    srt = [1, 3, 4, 7, 9]
    want = [float(srt[int(u_mirror(salt, j) * 5)]) for j in range(5)]
    assert got == pytest.approx(want)

    got = _one(spark, f"let(s=sample(enumeratedDistribution({data}), 5))")
    raw = [4, 1, 3, 9, 7]
    want = [float(raw[int(u_mirror(salt, j) * 5)]) for j in range(5)]
    assert got == pytest.approx(want)

    got = _one(spark, "let(s=sample(constantDistribution(42), 3))")
    assert got == [42.0, 42.0, 42.0]

    got = _one(spark, "let(s=sample(logNormalDistribution(1.0, 0.5), 3))")
    want = [math.exp(1.0 + 0.5 * inv_norm(u_mirror(salt, j))) for j in range(3)]
    assert got == pytest.approx(want, rel=1e-12)


def test_markov_chain_sample(spark):
    got = _one(
        spark,
        "let(s=sample(markovChain(matrix(array(0.1, 0.9), array(0.8, 0.2)), 0), 8))",
    )
    salt = binding_salt("s")
    rows = [[0.1, 0.9], [0.8, 0.2]]
    state, want = 0, []
    for k in range(8):
        uu = u_mirror(salt, k)
        cum, pick = 0.0, len(rows) - 1
        for idx, pr in enumerate(rows[state]):
            cum += pr
            if cum >= uu:
                pick = idx
                break
        state = pick
        want.append(state)
    assert got == want


def test_markov_chain_requires_square(spark):
    with pytest.raises(Exception, match="square"):
        _one(spark, "let(s=sample(markovChain(matrix(array(0.1, 0.9)), 0), 3))")


def test_multivariate_normal_sample(spark):
    got = _one(
        spark,
        "let(s=sample(multiVariateNormalDistribution("
        "array(1, 10), matrix(array(4, 2), array(2, 3))), 3))",
    )
    salt = binding_salt("s")
    # Cholesky of [[4,2],[2,3]]
    l11 = 2.0
    l21 = 2 / l11
    l22 = math.sqrt(3 - l21 * l21)
    want = []
    for j in range(3):
        z = [inv_norm(u_mirror(salt, j, t=1)), inv_norm(u_mirror(salt, j, t=2))]
        want.append([1 + l11 * z[0], 10 + l21 * z[0] + l22 * z[1]])
    for g, w in zip(got, want):
        assert list(g) == pytest.approx(w, rel=1e-12)


def test_monte_carlo_rebinds_per_iteration(spark):
    got = _one(
        spark,
        "let(s=monteCarlo(d=normalDistribution(10, 5), b=sample(d), mult(b, 2), 10))",
    )
    salt = binding_salt("s")  # call-site counter resets inside monteCarlo
    want = [2 * (10 + 5 * inv_norm(u_mirror(salt, 0, i=i))) for i in range(10)]
    assert got == pytest.approx(want, rel=1e-12)
    # the mean of a larger run lands near the rescaled distribution mean
    got = _one(
        spark,
        "let(s=monteCarlo(d=normalDistribution(10, 5), b=sample(d), mult(b, 2), 400))",
    )
    assert sum(got) / len(got) == pytest.approx(20.0, abs=1.5)


def test_two_call_sites_differ_and_repeat_runs_match(spark):
    a1 = _one(spark, "let(s=sample(normalDistribution(0, 1), 3))")
    a2 = _one(spark, "let(s=sample(normalDistribution(0, 1), 3))")
    assert a1 == a2  # same binding name, fresh parse → identical draws
    b = _one(spark, "let(t=sample(normalDistribution(0, 1), 3))", col="t")
    assert b != a1  # different binding name → different salt


def test_uuid_format_and_uniqueness(spark):
    import pyspark.sql.functions as F

    df = spark.range(5).select(parse_eval("uuid()").alias("u"))
    vals = [r["u"] for r in df.collect()]
    assert len(set(vals)) == 5
    import re

    for v in vals:
        assert re.fullmatch(r"[0-9a-f-]{36}", v)


def test_empty_draw_counts_are_empty(spark):
    # sequence() descends for empty ranges — the guards keep them empty
    assert _one(spark, "let(s=sample(normalDistribution(0, 1), 0))") == []
    assert _one(spark, "let(s=sample(binomialDistribution(0, 0.5), 3))") == [0, 0, 0]
    assert (
        _one(spark, "let(s=sample(markovChain(matrix(array(1.0)), 0), 0))") == []
    )
    assert _one(spark, "let(s=monteCarlo(d=normalDistribution(0, 1), b=sample(d), mult(b, 2), 0))") == []


def test_sibling_parse_eval_calls_draw_independently(spark):
    from lucene_solr_spark.evaluators import parse_eval

    a = spark.range(1).select(parse_eval("sample(normalDistribution(0, 1), 5)").alias("a")).collect()[0]["a"]
    b = spark.range(1).select(parse_eval("sample(normalDistribution(0, 1), 5)").alias("b")).collect()[0]["b"]
    assert a != b  # per-entry salt base: sibling expressions differ
