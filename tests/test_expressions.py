"""Lucene expressions module (lucene/expressions Javascript.g4 +
JavascriptCompiler.java): the JS-like expression language compiled to
Catalyst, cross-checked against a driver-side twin with the reference's
double/long semantics, plus ExpressionRescorer.
"""

import math
import random

import pytest

from lucene_solr_spark.expressions import (
    compile_expression,
    evaluate,
    expression_rescore,
)

VARS = {"a": 2.5, "b": -3.25, "c": 7.0, "popularity": 42.0}

VECTORS = [
    # precedence / literals (Javascript.g4 rule order)
    "2+3*4",
    "(2+3)*4",
    "0xF + 010 + 1e2 + .5",
    "2*a - b/c + 4%3",
    "a % b",
    "-a + +c - -b",
    # comparisons / equality / logical → 1.0/0.0
    "a < c",
    "c <= 7",
    "a > c || c >= 7",
    "(a != b) && (a == 2.5)",
    "!a + !0",
    # ternary, right-assoc
    "1 ? 2 : 0 ? 3 : 4",
    "0 ? 2 : 0 ? 3 : 4",
    "a > b ? a : b",
    # bitwise / shifts on the long casts
    "5 & 3",
    "5 | 3",
    "5 ^ 3",
    "~2",
    "~b",
    "1 << 3 + 1",
    "255 >> 2",
    "-8 >> 1",
    "-8 >>> 60",
    "c << 2",
    # functions (JavascriptCompiler.properties)
    "abs(b)",
    "ceil(a) + floor(a)",
    "sqrt(c * c)",
    "ln(exp(2))",
    "log10(1000)",
    "logn(2, 8)",
    "min(a, c) + max(a, c)",
    "pow(2, 10)",
    "sin(0) + cos(0)",
    "atan2(1, 1)",
    "acosh(2) + asinh(1) + atanh(0.5)",
    "tanh(1) + sinh(1) + cosh(1)",
    "haversin(38.898, -77.037, 38.897, -77.043)",
    # composite
    "sqrt(popularity) * (a > 2 ? 1.5 : 0.5) + ln(c + 1)",
    # Java NaN / domain semantics (division, comparisons, log family)
    "1 / 0",
    "(0 - 1) / 0",
    "0 / 0",
    "5 % 0",
    "(0/0) == (0/0)",
    "(0/0) > 1",
    "(0/0) <= (0/0)",
    "(0/0) != 1",
    "1 != (0/0)",
    "(0/0) ? 1 : 2",
    "ln(0)",
    "ln(0 - 1)",
    "log10(0)",
    "logn(1, 8)",
    "sqrt(0 - 4)",
    "atanh(1)",
    "atanh(0 - 1)",
    "acosh(0.5)",
    "(0/0)/0",
]


def _compare(got, want, expr):
    if math.isnan(want):
        assert got is None or math.isnan(got), expr
    elif math.isinf(want):
        assert got is not None and math.isinf(got) and (got > 0) == (want > 0), expr
    else:
        assert got is not None, expr
        assert got == pytest.approx(want, rel=1e-12, abs=1e-12), expr


def test_vectors_match_reference_twin(spark):
    df = spark.createDataFrame([VARS])
    cols = [
        compile_expression(e).alias(f"e{i}") for i, e in enumerate(VECTORS)
    ]
    row = df.select(*cols).collect()[0]
    for i, e in enumerate(VECTORS):
        _compare(row[f"e{i}"], evaluate(e, VARS), e)


def test_random_expressions_match_twin(spark):
    rng = random.Random(42)
    lits = ["2", "3.5", "0.25", "7", "a", "b", "c", "0x1F", "011"]
    ops = ["+", "-", "*", "/", "<", ">", "==", "&&", "||", "&", "^", ">>"]

    def gen(depth):
        if depth == 0 or rng.random() < 0.3:
            return rng.choice(lits)
        kind = rng.random()
        if kind < 0.15:
            return f"({gen(depth - 1)} ? {gen(depth - 1)} : {gen(depth - 1)})"
        if kind < 0.3:
            fn = rng.choice(["abs", "sqrt", "min", "max", "floor"])
            if fn in ("min", "max"):
                return f"{fn}({gen(depth - 1)}, {gen(depth - 1)})"
            arg = gen(depth - 1)
            if fn == "sqrt":
                arg = f"abs({arg})"
            return f"{fn}({arg})"
        return f"({gen(depth - 1)} {rng.choice(ops)} {gen(depth - 1)})"

    exprs = [gen(3) for _ in range(80)]
    df = spark.createDataFrame([VARS])
    cols = [compile_expression(e).alias(f"e{i}") for i, e in enumerate(exprs)]
    row = df.select(*cols).collect()[0]
    for i, e in enumerate(exprs):
        _compare(row[f"e{i}"], evaluate(e, VARS), e)


def test_bindings_override_columns(spark):
    df = spark.createDataFrame([{"x": 1.0}])
    got = df.select(
        compile_expression("x + 1", bindings={"x": 10.0}).alias("v")
    ).collect()[0].v
    assert got == 11.0


def test_dotted_variable_requires_binding():
    with pytest.raises(ValueError, match="bound explicitly"):
        compile_expression("doc['f'].value + 1")


def test_errors():
    with pytest.raises(ValueError, match="unknown function"):
        compile_expression("nope(1)")
    with pytest.raises(ValueError, match="takes 2 argument"):
        compile_expression("pow(2)")
    with pytest.raises(ValueError, match="trailing input"):
        compile_expression("1 2")
    with pytest.raises(ValueError, match="bad token"):
        compile_expression("1 @ 2")


def test_expression_rescore(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, tiny_index[0], analyzer="code")
    base = [
        ((r.segment_id, r.doc_id), float(r.score))
        for r in s.search("parse", k=20).collect()
    ]
    out = expression_rescore(s, "parse", "ln(_score + 1) * 10", k=20)
    got = [
        ((r.segment_id, r.doc_id), float(r.score)) for r in out.collect()
    ]
    # monotone transform: same ids, same relative order, transformed scores
    assert [i for i, _ in got] == [i for i, _ in base]
    for (_, gs), (_, bs) in zip(got, base):
        assert gs == pytest.approx(math.log(bs + 1) * 10, rel=1e-6)
