"""Solr math-expression evaluators — the ``solrj/io/eval`` surface as
Catalyst Columns.

The reference registers ~180 evaluator names on the streaming-expression
language (``solr/solrj/src/java/org/apache/solr/client/solrj/io/Lang.java:
116-330``), each a per-tuple function over numbers, arrays ("vectors") and
matrices (``solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/``).
Here every implemented name maps to a JVM-side Column expression — scalars
stay scalar Columns, Solr "numeric arrays" are ``array<double>`` Columns
manipulated with the higher-order builtins (``transform``/``aggregate``/
``zip_with``/``slice``/``filter``) — whole-stage codegen applies, no Python
in the row path.

Scope (documented): per-tuple evaluators only — 180 names. Round 4 adds the
deterministic model-state tranche (distributions as value-typed structs +
cumulativeProbability/probability/density, regress/predict/residuals,
polyfit via Cramer-solved normal equations, knn rows, fft/convolve/
oscillate/primes, bias-corrected skewness/kurtosis) and the hypothesis-
testing tranche (ttest/pairedTtest/anova/mannWhitney/ks/kolmogorovSmirnov/
chiSquareDataSet/gtestDataSet/corrPValues/outliers — p-values via a
fixed-step Lentz incomplete-beta continued fraction, one F.aggregate).
Still out: names that need an RNG (``sample``/``monteCarlo``/``random*``)
or runtime-sized model state a Column cannot hold (``kmeans``/``loess``/
``spline`` — the engine's k-means is ``textops.cluster_results_docs``). ``corr``/``regress``/
``movingAvg`` over whole relations live in ``relational.py``
(streaming-expression ops); here ``movingAvg``/``diff`` are the per-tuple
ARRAY forms (``MovingAverageEvaluator.java``,
``TimeDifferencingEvaluator.java``).

``let()`` (``solr/solrj/.../io/stream/LetStream.java``) is the variable-
binding wrapper: ``parse_let`` parses ``let(a=expr, b=expr(a), ...)`` into
ordered (name, Column) bindings where later bindings reference earlier ones;
``apply_let`` folds them onto a DataFrame as sequential ``withColumn``s.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, functions as F

from .functions import FUNCTIONS, parse_func  # noqa: F401  (registry base)

# --------------------------------------------------------------------------
# helpers (array<double> Column combinators)


def _agg_sum(arr: Column) -> Column:
    return F.aggregate(arr, F.lit(0.0), lambda a, x: a + x)


def _mean(arr: Column) -> Column:
    # MeanEvaluator (commons-math Mean over the list)
    return _agg_sum(arr) / F.size(arr)


def _var(arr: Column) -> Column:
    """Sample (n-1) variance — commons-math ``Variance`` default
    (``VarianceEvaluator.java``: bias-corrected)."""
    m = _mean(arr)
    ss = F.aggregate(arr, F.lit(0.0), lambda a, x: a + (x - m) * (x - m))
    return ss / (F.size(arr) - F.lit(1))


def _l2(arr: Column) -> Column:
    return F.sqrt(F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x))


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda s, x: s + x)


def _moving_avg(arr: Column, w: Column) -> Column:
    """MovingAverageEvaluator: means of each length-w sliding window —
    result length n-w+1."""
    return F.transform(
        F.sequence(F.lit(1), F.size(arr) - w + 1),
        lambda i: F.aggregate(F.slice(arr, i, w), F.lit(0.0), lambda a, x: a + x) / w,
    )


def _diff(arr: Column, lag: Column | None = None) -> Column:
    """TimeDifferencingEvaluator: x[i] - x[i-lag], result length n-lag."""
    lag = F.lit(1) if lag is None else lag
    return F.transform(
        F.sequence(F.lit(1), F.size(arr) - lag),
        lambda i: F.element_at(arr, (i + lag).cast("int"))
        - F.element_at(arr, i.cast("int")),
    )


def _copy_of(arr: Column, n: Column) -> Column:
    # Arrays.copyOf semantics (CopyOfEvaluator): truncate or zero-pad to n
    pad = F.transform(F.sequence(F.lit(1), F.greatest(n - F.size(arr), F.lit(0))), lambda i: F.lit(0.0))
    return F.slice(F.concat(arr, pad), 1, n)


def _minmax_scale(arr: Column, lo: Column | None = None, hi: Column | None = None) -> Column:
    lo = F.lit(0.0) if lo is None else lo
    hi = F.lit(1.0) if hi is None else hi
    mn, mx = F.array_min(arr), F.array_max(arr)
    rng = F.when(mx != mn, mx - mn).otherwise(F.lit(1.0))
    return F.transform(arr, lambda x: lo + (x - mn) * (hi - lo) / rng)


def _zscores(arr: Column) -> Column:
    # NormalizeEvaluator ("standardize"/"zscores"): commons-math
    # StatUtils.normalize — mean 0, SAMPLE stddev 1
    m, sd = _mean(arr), F.sqrt(_var(arr))
    return F.transform(arr, lambda x: (x - m) / sd)


_FACT_TABLE = None  # factorial via prod over sequence — exact to n=170 in f64


def _factorial(n: Column) -> Column:
    return F.aggregate(
        F.sequence(F.lit(1), n.cast("int")), F.lit(1.0), lambda a, x: a * x
    )


def _sorted(arr: Column) -> Column:
    return F.array_sort(arr)


def _percentile(arr: Column, p: Column) -> Column:
    """commons-math ``Percentile`` LEGACY estimation (the Solr
    PercentileEvaluator default): pos = p/100·(n+1); below 1 → min, at/past
    n → max, else linear interpolation between the straddling order
    statistics."""
    s = _sorted(arr)
    n = F.size(s)
    pos = p / F.lit(100.0) * (n + F.lit(1)).cast("double")
    fpos = F.floor(pos).cast("int")
    d = pos - fpos.cast("double")
    lower = F.element_at(s, fpos)
    upper = F.element_at(s, fpos + 1)
    return (
        F.when(pos < 1.0, F.element_at(s, 1))
        .when(pos >= n.cast("double"), F.element_at(s, -1))
        .otherwise(lower + d * (upper - lower))
    )


def _mode(arr: Column) -> Column:
    """StatUtils.mode: ALL most-frequent values, ascending (ModeEvaluator)."""
    dist = F.array_distinct(arr)
    cnt = lambda v: F.size(F.filter(arr, lambda x: x == v))  # noqa: E731
    maxc = F.array_max(F.transform(dist, cnt))
    return F.array_sort(F.filter(dist, lambda v: cnt(v) == maxc))


def _cov(a: Column, b: Column) -> Column:
    """commons-math Covariance (bias-corrected, CovarianceEvaluator)."""
    ma, mb = _mean(a), _mean(b)
    s = F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - ma) * (y - mb)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return s / (F.size(a) - F.lit(1))


def _corr_arrays(a: Column, b: Column) -> Column:
    """PearsonsCorrelation over two numeric arrays (CorrelationEvaluator's
    vector-pair form; the relation-level corr() lives in relational.py)."""
    return _cov(a, b) / (F.sqrt(_var(a)) * F.sqrt(_var(b)))


def _windows(arr: Column, w) -> Column:
    """array<array>: all length-w sliding windows (helper for moving*).
    A window longer than the array fails loudly (the reference throws),
    not with an inscrutable descending-sequence slice error."""
    n = F.size(arr)
    wi = w.cast("int")
    return F.when(
        n >= wi,
        F.transform(F.sequence(F.lit(1), n - wi + 1), lambda i: F.slice(arr, i, wi)),
    ).otherwise(
        F.raise_error(F.lit("moving window is larger than the array"))
    )


def _median_of(win: Column) -> Column:
    s = F.array_sort(win)
    n = F.size(s)
    mid = (n / 2).cast("int")
    return F.when(
        n % 2 == 1, F.element_at(s, mid + 1)
    ).otherwise((F.element_at(s, mid) + F.element_at(s, mid + 1)) / 2.0)


def _exp_moving_avg(arr: Column, w) -> Column:
    """ExponentialMovingAverageEvaluator: seed = SMA of the first window,
    alpha = 2/(window+1), then ema += alpha·(x − ema) per remaining value;
    output length n − window + 1 (like movingAvg)."""
    wi = w.cast("int")
    alpha = F.lit(2.0) / (w.cast("double") + 1.0)
    seed = F.when(F.size(arr) >= wi, _mean(F.slice(arr, 1, wi))).otherwise(
        F.raise_error(F.lit("expMovingAvg window is larger than the array"))
    )
    rest = F.slice(arr, wi + 1, F.greatest(F.size(arr) - wi, F.lit(0)))
    acc0 = F.struct(F.array(seed).alias("out"), seed.alias("prev"))
    folded = F.aggregate(
        rest,
        acc0,
        lambda acc, x: F.struct(
            F.concat(
                acc["out"], F.array((x - acc["prev"]) * alpha + acc["prev"])
            ).alias("out"),
            ((x - acc["prev"]) * alpha + acc["prev"]).alias("prev"),
        ),
    )
    return folded["out"]


def _describe(arr: Column) -> Column:
    """DescribeEvaluator: the DescriptiveStatistics summary as a struct."""
    return F.struct(
        F.size(arr).cast("long").alias("N"),
        F.array_min(arr).alias("min"),
        F.array_max(arr).alias("max"),
        _agg_sum(arr).alias("sum"),
        _mean(arr).alias("mean"),
        _var(arr).alias("var"),
        F.sqrt(_var(arr)).alias("stdev"),
        F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x).alias("sumsq"),
    )


def _freq_table(arr: Column) -> Column:
    """FrequencyTableEvaluator: (value, count, pct) per distinct value asc."""
    dist = F.array_sort(F.array_distinct(arr))
    n = F.size(arr).cast("double")
    return F.transform(
        dist,
        lambda v: F.struct(
            v.alias("value"),
            F.size(F.filter(arr, lambda x: x == v)).cast("long").alias("count"),
            (F.size(F.filter(arr, lambda x: x == v)).cast("double") / n).alias("pct"),
        ),
    )


def _pair_sort(a: Column, b: Column) -> Column:
    """PairSortEvaluator: sort both vectors by the FIRST; returns the 2×n
    matrix [sorted_a, reordered_b]."""
    z = F.array_sort(F.zip_with(a, b, lambda x, y: F.struct(x.alias("k"), y.alias("v"))))
    return F.array(
        F.transform(z, lambda s: s["k"]), F.transform(z, lambda s: s["v"])
    )


def _transpose(m: Column) -> Column:
    cols = F.size(F.element_at(m, 1))
    return F.transform(
        F.sequence(F.lit(1), cols), lambda j: F.transform(m, lambda row: F.element_at(row, j))
    )


def _matrix_mult(a: Column, b: Column) -> Column:
    """MatrixMultiplyEvaluator: (r×k)·(k×c) via per-cell dot products —
    nested transforms, whole-stage codegen, no Python."""
    cols_b = F.size(F.element_at(b, 1))
    return F.transform(
        a,
        lambda row: F.transform(
            F.sequence(F.lit(1), cols_b),
            lambda j: F.aggregate(
                F.zip_with(
                    row,
                    F.transform(b, lambda brow: F.element_at(brow, j)),
                    lambda x, y: x * y,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        ),
    )


# --------------------------------------------------------------------------
# the registry — name parity with Lang.java registrations

EVALUATORS: dict = {
    # second tranche: array statistics (Lang.java stats block). min/max/
    # sum/avg are POLYMORPHIC like the reference evaluators: one arg = the
    # numeric-array form, several args = the scalar form (so the
    # function-query scalar spellings keep working through parse_eval)
    "avg": lambda *c: _mean(c[0]) if len(c) == 1 else sum(c[1:], c[0]) / len(c),
    "min": lambda *c: F.array_min(c[0]) if len(c) == 1 else F.least(*c),
    "max": lambda *c: F.array_max(c[0]) if len(c) == 1 else F.greatest(*c),
    "sum": lambda *c: _agg_sum(c[0]) if len(c) == 1 else sum(c[1:], c[0]),
    "count": lambda a: F.size(a).cast("long"),
    "mode": _mode,
    "percentile": _percentile,
    "cov": _cov,
    "corr": _corr_arrays,
    "distance": lambda a, b: _l2(F.zip_with(a, b, lambda x, y: x - y)),
    "meanDifference": lambda a, b: _mean(F.zip_with(a, b, lambda x, y: x - y)),
    "sumDifference": lambda a, b: _agg_sum(F.zip_with(a, b, lambda x, y: x - y)),
    "describe": _describe,
    "freqTable": _freq_table,
    "pairSort": _pair_sort,
    # moving windows (ExponentialMovingAverage/MovingMedian/MovingMAD)
    "expMovingAvg": _exp_moving_avg,
    "movingMedian": lambda a, w: F.transform(_windows(a, w), _median_of),
    # moving mean-absolute-deviation around each window's mean
    "movingMAD": lambda a, w: F.transform(
        _windows(a, w),
        lambda win: _mean(F.transform(win, lambda x: F.abs(x - _mean(win)))),
    ),
    "replace": lambda a, old, new: F.transform(
        a, lambda x: F.when(x == old, new).otherwise(x)
    ),
    "dateTime": lambda ts, fmt: F.date_format(ts, fmt),
    # matrices as array<array<double>> (Lang.java matrix block)
    "matrix": lambda *rows: F.array(*rows),
    "transpose": _transpose,
    "rowAt": lambda m, i: F.element_at(m, i.cast("int") + 1),  # 0-based
    "colAt": lambda m, j: F.transform(
        m, lambda row: F.element_at(row, j.cast("int") + 1)
    ),
    "rowCount": lambda m: F.size(m).cast("long"),
    "columnCount": lambda m: F.size(F.element_at(m, 1)).cast("long"),
    "sumRows": lambda m: F.transform(m, _agg_sum),
    "sumColumns": lambda m: F.transform(_transpose(m), _agg_sum),
    "matrixMult": _matrix_mult,
    # scalar math (Lang.java tail block: abs..cbrt)
    "abs": F.abs,
    "add": lambda *c: sum(c[1:], c[0]),
    "sub": lambda a, b: a - b,
    "mult": lambda *c: _prod(c),
    "div": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "pow": lambda a, b: a**b,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "log": lambda c: F.log(c),  # NaturalLogEvaluator — ln (function-query log() is base-10)
    "log10": F.log10,
    "exp": F.exp,
    "ceil": F.ceil,
    "floor": F.floor,
    "round": F.rint,  # RoundEvaluator: Math.round to nearest
    "sin": F.sin,
    "asin": F.asin,
    "sinh": F.sinh,
    "cos": F.cos,
    "acos": F.acos,
    "cosh": F.cosh,
    "tan": F.tan,
    "atan": F.atan,
    "tanh": F.tanh,
    "recip": lambda c: F.lit(1.0) / c,  # RecipEvaluator (commons Inverse)
    "precision": lambda x, d: _precision(x, d),
    "factorial": _factorial,
    "binomialCoefficient": lambda n, k: _factorial(n) / (_factorial(k) * _factorial(n - k)),
    "coalesce": lambda *c: F.coalesce(*c),
    "if": lambda c, a, b: F.when(c.cast("boolean"), a).otherwise(b),
    # boolean / comparison (AndEvaluator.. NotEvaluator)
    "and": lambda a, b: a.cast("boolean") & b.cast("boolean"),
    "or": lambda a, b: a.cast("boolean") | b.cast("boolean"),
    "eor": lambda a, b: a.cast("boolean") != b.cast("boolean"),
    "not": lambda a: ~a.cast("boolean"),
    "eq": lambda a, b: a == b,
    "gt": lambda a, b: a > b,
    "gteq": lambda a, b: a >= b,
    "lt": lambda a, b: a < b,
    "lteq": lambda a, b: a <= b,
    "isNull": lambda a: a.isNull(),
    "notNull": lambda a: a.isNotNull(),
    # strings (ConcatEvaluator..TrimEvaluator, MatchesEvaluator)
    "concat": lambda *c: F.concat(*c),
    "lower": F.lower,
    "upper": F.upper,
    "trim": F.trim,
    "split": lambda s, sep: F.split(s, sep),
    "matches": lambda s, pat: F.regexp_like(s, pat),
    # casts (DoubleEvaluator / LongEvaluator)
    "double": lambda c: c.cast("double"),
    "long": lambda c: c.cast("bigint"),
    # temporal (TemporalEvaluator*.FUNCTION_NAME)
    "year": F.year,
    "month": F.month,
    "day": F.dayofmonth,
    "dayOfYear": F.dayofyear,
    "dayOfQuarter": lambda c: F.dayofyear(c) - F.dayofyear(F.trunc(c, "quarter")) + 1,
    "hour": F.hour,
    "minute": F.minute,
    "second": F.second,
    "epoch": lambda c: F.unix_timestamp(c) * 1000,  # TemporalEvaluatorEpoch: millis
    "week": F.weekofyear,
    "quarter": F.quarter,
    # array creation (ArrayEvaluator, SequenceEvaluator, NaturalEvaluator, ..)
    "array": lambda *c: F.array(*c).cast("array<double>"),
    "sequence": lambda n, start, stride: F.transform(
        F.sequence(F.lit(0), n.cast("int") - 1),
        lambda i: (start + i * stride).cast("double"),
    ),
    "natural": lambda n: F.transform(
        F.sequence(F.lit(0), n.cast("int") - 1), lambda i: i.cast("double")
    ),
    "ones": lambda n: F.transform(F.sequence(F.lit(1), n.cast("int")), lambda i: F.lit(1.0)),
    "zeros": lambda n: F.transform(F.sequence(F.lit(1), n.cast("int")), lambda i: F.lit(0.0)),
    "repeat": lambda v, n: F.transform(F.sequence(F.lit(1), n.cast("int")), lambda i: v),
    # array manipulation (ReverseEvaluator, AscEvaluator, LengthEvaluator, ..)
    "rev": F.reverse,
    "asc": F.array_sort,
    "length": F.size,
    "valueAt": lambda arr, i: F.element_at(arr, i.cast("int") + 1),  # 0-based
    "indexOf": lambda arr, v: F.array_position(arr, v) - 1,  # 0-based, -1 = missing
    "copyOf": _copy_of,
    "copyOfRange": lambda arr, lo, hi: F.slice(arr, lo.cast("int") + 1, (hi - lo).cast("int")),
    "ltrim": lambda arr, n: F.slice(arr, n.cast("int") + 1, F.size(arr) - n.cast("int")),
    "rtrim": lambda arr, n: F.slice(arr, 1, F.size(arr) - n.cast("int")),
    "append": lambda *c: F.concat(*c),
    "addAll": lambda *c: F.concat(*c),
    # element-by-element / scalar-broadcast (EBE*/Scalar* evaluators)
    "ebeAdd": lambda a, b: F.zip_with(a, b, lambda x, y: x + y),
    "ebeSubtract": lambda a, b: F.zip_with(a, b, lambda x, y: x - y),
    "ebeMultiply": lambda a, b: F.zip_with(a, b, lambda x, y: x * y),
    "ebeDivide": lambda a, b: F.zip_with(a, b, lambda x, y: x / y),
    "scalarAdd": lambda v, arr: F.transform(arr, lambda x: x + v),
    "scalarSubtract": lambda v, arr: F.transform(arr, lambda x: x - v),
    "scalarMultiply": lambda v, arr: F.transform(arr, lambda x: x * v),
    "scalarDivide": lambda v, arr: F.transform(arr, lambda x: x / v),
    "scale": lambda v, arr: F.transform(arr, lambda x: x * v),  # ScaleEvaluator
    # reductions (MeanEvaluator, VarianceEvaluator n-1, SumSqEvaluator, ..)
    "mean": _mean,
    "var": _var,
    "stddev": lambda arr: F.sqrt(_var(arr)),
    "sumSq": lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + x * x),
    "grandSum": _agg_sum,
    "l1norm": lambda arr: F.aggregate(arr, F.lit(0.0), lambda a, x: a + F.abs(x)),
    "l2norm": _l2,
    "linfnorm": lambda arr: F.array_max(F.transform(arr, F.abs)),
    # vector-pair measures (DotProduct/CosineSimilarity/distance evaluators)
    "dotProduct": _dot,
    "cosineSimilarity": lambda a, b: _dot(a, b) / (_l2(a) * _l2(b)),
    "euclidean": lambda a, b: F.sqrt(
        F.aggregate(F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, x: s + x)
    ),
    "manhattan": lambda a, b: F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)), F.lit(0.0), lambda s, x: s + x
    ),
    "chebyshev": lambda a, b: F.array_max(F.zip_with(a, b, lambda x, y: F.abs(x - y))),
    "canberra": lambda a, b: F.aggregate(
        F.zip_with(
            a, b,
            lambda x, y: F.when(
                F.abs(x) + F.abs(y) > 0, F.abs(x - y) / (F.abs(x) + F.abs(y))
            ).otherwise(F.lit(0.0)),
        ),
        F.lit(0.0),
        lambda s, x: s + x,
    ),
    # array transforms (UnitEvaluator, NormalizeEvaluator, MinMaxScale, ..)
    "unitize": lambda arr: F.transform(arr, lambda x: x / _l2(arr)),
    "zscores": _zscores,
    "standardize": _zscores,
    "normalizeSum": lambda arr, *to: F.transform(
        arr, lambda x: x * (to[0] if to else F.lit(1.0)) / _agg_sum(arr)
    ),
    "minMaxScale": _minmax_scale,
    "movingAvg": _moving_avg,
    "diff": lambda arr, *lag: _diff(arr, lag[0] if lag else None),
}


def _prod(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out * c
    return out


def _precision(x: Column, d: Column) -> Column:
    # PrecisionEvaluator: commons Precision.round(x, digits) — digits is a
    # runtime Column here, so scale/unscale instead of F.round's literal arg
    p = F.pow(F.lit(10.0), d.cast("int"))
    return F.round(x * p, 0) / p


# --------------------------------------------------------------------------
# parsing: the evaluator namespace + let() bindings

_MERGED = None


def _registry() -> dict:
    """Function-query names with evaluator names layered on top (evaluator
    semantics win on collisions — e.g. ``log`` is ln here, base-10 there)."""
    global _MERGED
    if _MERGED is None:
        _MERGED = {**FUNCTIONS, **EVALUATORS}
    return _MERGED


def parse_eval(text: str) -> Column:
    """Parse one math expression in the evaluator namespace → Column."""
    return parse_func(text, registry=_registry())


_BIND_RE = re.compile(r"\s*([A-Za-z_]\w*)\s*=")


def parse_let(text: str) -> list[tuple[str, Column]]:
    """Parse ``let(a=expr, b=expr, ...)`` into ordered (name, Column)
    bindings (``LetStream.java``: variables evaluate in order; later
    expressions see earlier names — here as plain column references,
    resolved by :func:`apply_let`'s sequential ``withColumn``)."""
    s = text.strip()
    if not (s.startswith("let(") and s.endswith(")")):
        raise ValueError(f"not a let() expression: {text!r}")
    body = s[4:-1]
    out: list[tuple[str, Column]] = []
    pos = 0
    while pos < len(body):
        m = _BIND_RE.match(body, pos)
        if not m:
            raise ValueError(f"expected name= at {body[pos:pos+20]!r}")
        name = m.group(1)
        depth = 0
        i = m.end()
        while i < len(body) and (depth > 0 or body[i] != ","):
            if body[i] == "(":
                depth += 1
            elif body[i] == ")":
                depth -= 1
            i += 1
        out.append((name, parse_eval(body[m.end():i])))
        pos = i + 1
    return out


def apply_let(df: DataFrame, text: str) -> DataFrame:
    """Fold ``let()`` bindings onto ``df`` — one withColumn per binding, so
    each binding sees the previous ones (pure Catalyst; Spark collapses the
    chain into a single Project)."""
    for name, col in parse_let(text):
        df = df.withColumn(name, col)
    return df


# --------------------------------------------------------------------------
# round 4: the deterministic model-state tranche — distributions, regression
# / curve fitting, signal and number-theory names (reference
# ``solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/*Evaluator.java``,
# registered in ``Lang.java:116-330``). A distribution VALUE is a struct
# Column ``(d = tag, p = params-or-data)`` consumed by cumulativeProbability
# / probability / density — no driver state, so the same expression runs on
# every engine deterministically. Sampling names (``sample``, ``monteCarlo``,
# ``random*``) stay out: they need an RNG (documented). ``kmeans``'s array
# form needs runtime-sized model state a Column expression cannot hold —
# the engine's k-means is ``textops.cluster_results_docs`` (documented).

import math as _math

_SQRT2 = 1.4142135623730951


def _erf(x: Column) -> Column:
    """Abramowitz & Stegun 7.1.26 polynomial erf (|err| < 1.5e-7) — the
    engine's documented deterministic approximation (Catalyst has no erf);
    both the Spark side and any SQL oracle use this same polynomial."""
    ax = F.abs(x)
    t = F.lit(1.0) / (F.lit(1.0) + F.lit(0.3275911) * ax)
    poly = t * (
        F.lit(0.254829592)
        + t
        * (
            F.lit(-0.284496736)
            + t * (F.lit(1.421413741) + t * (F.lit(-1.453152027) + t * F.lit(1.061405429)))
        )
    )
    e = F.lit(1.0) - poly * F.exp(-ax * ax)
    return F.when(x < 0, -e).otherwise(e)


def _norm_cdf(x: Column, m: Column, sd: Column) -> Column:
    return F.lit(0.5) * (F.lit(1.0) + _erf((x - m) / (sd * F.lit(_SQRT2))))


def _lgamma(x: Column) -> Column:
    """Lanczos log-gamma (g=7, the classic 9 public coefficients), x > 0;
    |rel err| ~1e-13 — within the 6dp the evaluator tests pin."""
    g = [
        0.99999999999980993, 676.5203681218851, -1259.1392167224028,
        771.32342877765313, -176.61502916214059, 12.507343278686905,
        -0.13857109526572012, 9.9843695780195716e-6, 1.5056327351493116e-7,
    ]
    xm1 = x - 1.0
    s = F.lit(g[0])
    for i, c in enumerate(g[1:], 1):
        s = s + F.lit(c) / (xm1 + F.lit(float(i)))
    t = xm1 + 7.5
    return (
        F.lit(0.5 * _math.log(2 * _math.pi))
        + (xm1 + 0.5) * F.log(t)
        - t
        + F.log(s)
    )


def _gammainc_p(a: Column, x: Column) -> Column:
    """Regularized lower incomplete gamma P(a, x) by the standard series
    γ(a,x) = x^a e^−x Σ xⁿ/(a(a+1)…(a+n)) with a FIXED 160 terms —
    converges for the x ≲ a + 120 regime distribution CDFs live in; the
    result is clamped to [0, 1]."""
    s = F.aggregate(
        F.sequence(F.lit(1), F.lit(160)),
        F.struct(F.lit(1.0).alias("t"), F.lit(1.0).alias("s")),
        lambda acc, n: F.struct(
            (acc["t"] * x / (a + n.cast("double"))).alias("t"),
            (acc["s"] + acc["t"] * x / (a + n.cast("double"))).alias("s"),
        ),
        lambda acc: acc["s"],
    )
    p = s * F.exp(a * F.log(x) - x - _lgamma(a + 1.0))
    return F.when(x <= 0, F.lit(0.0)).otherwise(
        F.least(F.greatest(p, F.lit(0.0)), F.lit(1.0))
    )


def _dist(tag: str, *params: Column) -> Column:
    return F.struct(
        F.lit(tag).alias("d"),
        F.array(*[p.cast("double") for p in params]).alias("p"),
    )


def _dist_data(tag: str, arr: Column) -> Column:
    return F.struct(F.lit(tag).alias("d"), arr.cast("array<double>").alias("p"))


def _binom_pmf(n: Column, p: Column, j: Column) -> Column:
    return F.exp(
        _lgamma(n + 1.0)
        - _lgamma(j + 1.0)
        - _lgamma(n - j + 1.0)
        + j * F.log(p)
        + (n - j) * F.log(F.lit(1.0) - p)
    )


def _pois_pmf(lam: Column, j: Column) -> Column:
    return F.exp(-lam + j * F.log(lam) - _lgamma(j + 1.0))


def _zipf_h(n: Column, s: Column) -> Column:
    return F.aggregate(
        F.sequence(F.lit(1), n.cast("int")),
        F.lit(0.0),
        lambda acc, j: acc + F.lit(1.0) / F.pow(j.cast("double"), s),
    )


def _dsum(x: Column, pmf, lo: int = 0) -> Column:
    """Σ_{j=lo..⌊x⌋} pmf(j) — discrete CDF by direct summation."""
    k = F.floor(x).cast("int")
    return F.when(x < F.lit(float(lo)), F.lit(0.0)).otherwise(
        F.aggregate(
            F.sequence(F.lit(lo), F.greatest(k, F.lit(lo))),
            F.lit(0.0),
            lambda s, j: s + pmf(j.cast("double")),
        )
    )


def _cdf(dist: Column, x: Column) -> Column:
    d, p = dist["d"], dist["p"]
    a, b, c = F.element_at(p, 1), F.element_at(p, 2), F.element_at(p, 3)
    kf = F.floor(x)
    tri = (
        F.when(x <= a, F.lit(0.0))
        .when(x <= b, (x - a) * (x - a) / ((c - a) * (b - a)))
        .when(x < c, F.lit(1.0) - (c - x) * (c - x) / ((c - a) * (c - b)))
        .otherwise(F.lit(1.0))
    )
    emp = F.size(F.filter(p, lambda v: v <= x)).cast("double") / F.size(p)
    return (
        F.when(d == "normal", _norm_cdf(x, a, b))
        .when(
            d == "lognormal",
            F.when(x <= 0, F.lit(0.0)).otherwise(_norm_cdf(F.log(x), a, b)),
        )
        .when(
            d == "uniform",
            F.least(F.greatest((x - a) / (b - a), F.lit(0.0)), F.lit(1.0)),
        )
        .when(
            d == "uniformint",
            F.least(F.greatest((kf - a + 1) / (b - a + 1), F.lit(0.0)), F.lit(1.0)),
        )
        .when(d == "triangular", tri)
        .when(
            d == "weibull",
            F.when(x <= 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - F.exp(-F.pow(x / b, a))
            ),
        )
        .when(d == "constant", (x >= a).cast("double"))
        .when(d == "gamma", _gammainc_p(a, x / b))
        .when(d == "binomial", _dsum(x, lambda j: _binom_pmf(a, b, j)))
        .when(d == "poisson", _dsum(x, lambda j: _pois_pmf(a, j)))
        .when(
            d == "geometric",
            F.when(x < 0, F.lit(0.0)).otherwise(
                F.lit(1.0) - F.pow(F.lit(1.0) - a, kf + 1)
            ),
        )
        .when(d == "zipf", _dsum(x, lambda j: F.lit(1.0) / F.pow(j, b) / _zipf_h(a, b), lo=1))
        .when((d == "empirical") | (d == "enumerated"), emp)
        .otherwise(F.lit(None).cast("double"))
    )


def _pmf(dist: Column, x: Column) -> Column:
    d, p = dist["d"], dist["p"]
    a, b = F.element_at(p, 1), F.element_at(p, 2)
    frac_eq = F.size(F.filter(p, lambda v: v == x)).cast("double") / F.size(p)
    return (
        F.when(d == "binomial", _binom_pmf(a, b, x))
        .when(d == "poisson", _pois_pmf(a, x))
        .when(d == "geometric", a * F.pow(F.lit(1.0) - a, x))
        .when(
            d == "uniformint",
            F.when((x >= a) & (x <= b), F.lit(1.0) / (b - a + 1)).otherwise(F.lit(0.0)),
        )
        .when(d == "zipf", F.lit(1.0) / F.pow(x, b) / _zipf_h(a, b))
        .when(d == "constant", (x == a).cast("double"))
        .when(d == "enumerated", frac_eq)
        .otherwise(F.lit(0.0))  # continuous point probability is 0
    )


def _probability(dist: Column, *args: Column) -> Column:
    """ProbabilityEvaluator: pmf at a point (discrete) or, with two bounds,
    the interval probability CDF(hi) − CDF(lo) (the commons-math
    ``probability(x0, x1)`` continuous form)."""
    if len(args) == 2:
        return _cdf(dist, args[1]) - _cdf(dist, args[0])
    return _pmf(dist, args[0])


def _density(dist: Column, x: Column) -> Column:
    d, p = dist["d"], dist["p"]
    a, b, c = F.element_at(p, 1), F.element_at(p, 2), F.element_at(p, 3)
    inv_sqrt2pi = 1.0 / _math.sqrt(2 * _math.pi)
    norm_pdf = (
        F.lit(inv_sqrt2pi) / b * F.exp(-(x - a) * (x - a) / (F.lit(2.0) * b * b))
    )
    logn_pdf = F.lit(inv_sqrt2pi) / (x * b) * F.exp(
        -(F.log(x) - a) * (F.log(x) - a) / (F.lit(2.0) * b * b)
    )
    tri_pdf = (
        F.when((x < a) | (x > c), F.lit(0.0))
        .when(x < b, F.lit(2.0) * (x - a) / ((c - a) * (b - a)))
        .when(x > b, F.lit(2.0) * (c - x) / ((c - a) * (c - b)))
        .otherwise(F.lit(2.0) / (c - a))
    )
    weib_pdf = F.when(x <= 0, F.lit(0.0)).otherwise(
        (a / b) * F.pow(x / b, a - 1.0) * F.exp(-F.pow(x / b, a))
    )
    gamma_pdf = F.when(x <= 0, F.lit(0.0)).otherwise(
        F.exp((a - 1.0) * F.log(x) - x / b - _lgamma(a) - a * F.log(b))
    )
    return (
        F.when(d == "normal", norm_pdf)
        .when(d == "lognormal", F.when(x <= 0, F.lit(0.0)).otherwise(logn_pdf))
        .when(
            d == "uniform",
            F.when((x >= a) & (x <= b), F.lit(1.0) / (b - a)).otherwise(F.lit(0.0)),
        )
        .when(d == "triangular", tri_pdf)
        .when(d == "weibull", weib_pdf)
        .when(d == "gamma", gamma_pdf)
        .otherwise(F.lit(None).cast("double"))
    )


# -- regression / curve fitting ---------------------------------------------


def _regress(x: Column, y: Column) -> Column:
    """RegressionEvaluator (commons SimpleRegression): OLS over paired
    arrays → tuple (slope, intercept, R, RSquared)."""
    mx, my = _mean(x), _mean(y)
    sxy = F.aggregate(
        F.zip_with(x, y, lambda a, b: (a - mx) * (b - my)), F.lit(0.0), lambda s, v: s + v
    )
    sxx = F.aggregate(x, F.lit(0.0), lambda s, v: s + (v - mx) * (v - mx))
    syy = F.aggregate(y, F.lit(0.0), lambda s, v: s + (v - my) * (v - my))
    slope = sxy / sxx
    r = sxy / F.sqrt(sxx * syy)
    return F.struct(
        slope.alias("slope"),
        (my - slope * mx).alias("intercept"),
        r.alias("R"),
        (r * r).alias("RSquared"),
    )


def _det(A: list) -> Column:
    """Determinant of a small matrix of Columns by cofactor expansion —
    built in PYTHON at plan time (≤ 4×4 here), evaluated JVM-side."""
    if len(A) == 1:
        return A[0][0]
    out = None
    for j in range(len(A)):
        minor = [row[:j] + row[j + 1 :] for row in A[1:]]
        term = A[0][j] * _det(minor)
        if j % 2 == 1:
            term = -term
        out = term if out is None else out + term
    return out


def _polyfit(y: Column, degree: Column | None = None) -> Column:
    """PolyFitEvaluator: least-squares polynomial over x = 0..n−1 via the
    normal equations, solved by Cramer's rule (degrees 1-3; the Solr default
    is 3). Returns coefficients ascending-degree, like commons
    PolynomialCurveFitter."""
    n = F.size(y)
    xs = F.transform(F.sequence(F.lit(0), n - 1), lambda i: i.cast("double"))

    def S(k):
        return F.aggregate(xs, F.lit(0.0), lambda s, v: s + F.pow(v, F.lit(float(k))))

    def T(k):
        return F.aggregate(
            F.zip_with(xs, y, lambda a, b: F.pow(a, F.lit(float(k))) * b),
            F.lit(0.0),
            lambda s, v: s + v,
        )

    Ss = [S(k) for k in range(7)]
    Ts = [T(k) for k in range(4)]

    def solve(d):
        A = [[Ss[i + j] for j in range(d + 1)] for i in range(d + 1)]
        det = _det(A)
        coefs = []
        for j in range(d + 1):
            Aj = [
                [(Ts[i] if jj == j else A[i][jj]) for jj in range(d + 1)]
                for i in range(d + 1)
            ]
            coefs.append(_det(Aj) / det)
        return F.array(*coefs)

    dg = F.lit(3) if degree is None else degree.cast("int")
    return F.when(dg == 1, solve(1)).when(dg == 2, solve(2)).otherwise(solve(3))


def _knn_rows(m: Column, v: Column, k: Column) -> Column:
    """KnnEvaluator array form: the k rows of matrix m nearest to vector v
    (euclidean), nearest first."""
    scored = F.transform(
        m,
        lambda row: F.struct(
            F.sqrt(
                F.aggregate(
                    F.zip_with(row, v, lambda a, b: (a - b) * (a - b)),
                    F.lit(0.0),
                    lambda s, z: s + z,
                )
            ).alias("dist"),
            row.alias("r"),
        ),
    )
    return F.transform(F.slice(F.array_sort(scored), 1, k.cast("int")), lambda s: s["r"])


# -- signal / number theory ---------------------------------------------------


def _convolve(a: Column, b: Column) -> Column:
    """ConvolutionEvaluator: full convolution, length |a|+|b|−1."""
    na, nb = F.size(a), F.size(b)
    return F.transform(
        F.sequence(F.lit(0), na + nb - 2),
        lambda k: F.aggregate(
            F.sequence(F.greatest(F.lit(0), k - nb + 1), F.least(k, na - 1)),
            F.lit(0.0),
            lambda s, j: s
            + F.element_at(a, (j + 1).cast("int"))
            * F.element_at(b, (k - j + 1).cast("int")),
        ),
    )


def _fft(arr: Column) -> Column:
    """FFTEvaluator shape: returns [real[], imag[]] — computed as a direct
    DFT (O(n²) inside one row's array; the per-tuple regime these run in)."""
    n = F.size(arr)
    idx = F.sequence(F.lit(0), n - 1)

    def comp(trig):
        return F.transform(
            idx,
            lambda k: F.aggregate(
                F.zip_with(
                    arr,
                    idx,
                    lambda v, j: v
                    * trig(
                        F.lit(-2.0 * _math.pi)
                        * k.cast("double")
                        * j.cast("double")
                        / n.cast("double")
                    ),
                ),
                F.lit(0.0),
                lambda s, z: s + z,
            ),
        )

    return F.array(comp(F.cos), comp(F.sin))


def _oscillate(amp: Column, ang: Column, phase: Column) -> Column:
    """OscillateEvaluator: 128-sample sine wave amp·sin(ang·i + phase)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(127)),
        lambda i: amp * F.sin(ang * i.cast("double") + phase),
    )


def _primes(n: Column, start: Column) -> Column:
    """PrimesEvaluator: the first n primes ≥ start (trial division over a
    bounded candidate window)."""
    lo = F.greatest(start.cast("int"), F.lit(2))
    cand = F.sequence(lo, lo + n.cast("int") * 20 + 200)
    isp = lambda x: ~F.exists(
        F.sequence(F.lit(2), F.greatest(F.floor(F.sqrt(x)).cast("int"), F.lit(2))),
        lambda d: (x % d == 0) & (d < x),
    )
    return F.transform(
        F.slice(F.filter(cand, isp), 1, n.cast("int")), lambda v: v.cast("double")
    )


def _haversine_m(*args: Column) -> Column:
    """HaversineMetersEvaluator: great-circle metres between [lat, lon]
    arrays (2-arg form) or four scalars; mean earth radius 6371008.7714 m
    (Lucene GeoUtils constant)."""
    if len(args) == 2:
        o, t = args
        lat1, lon1 = F.element_at(o, 1), F.element_at(o, 2)
        lat2, lon2 = F.element_at(t, 1), F.element_at(t, 2)
    else:
        lat1, lon1, lat2, lon2 = args
    rad = _math.pi / 180.0
    dlat = (lat2 - lat1) * rad
    dlon = (lon2 - lon1) * rad
    h = F.pow(F.sin(dlat / 2), 2) + F.cos(lat1 * F.lit(rad)) * F.cos(
        lat2 * F.lit(rad)
    ) * F.pow(F.sin(dlon / 2), 2)
    return F.lit(2.0 * 6371008.7714) * F.asin(F.sqrt(h))


EVALUATORS.update(
    {
        # distribution constructors (commons-math parameterizations)
        "normalDistribution": lambda m, sd: _dist("normal", m, sd),
        "logNormalDistribution": lambda scale, shape: _dist("lognormal", scale, shape),
        "uniformDistribution": lambda lo, hi: _dist("uniform", lo, hi),
        "uniformIntegerDistribution": lambda lo, hi: _dist("uniformint", lo, hi),
        "triangularDistribution": lambda lo, mode, hi: _dist("triangular", lo, mode, hi),
        "weibullDistribution": lambda shape, scale: _dist("weibull", shape, scale),
        "constantDistribution": lambda v: _dist("constant", v),
        "binomialDistribution": lambda n, p: _dist("binomial", n, p),
        "poissonDistribution": lambda lam: _dist("poisson", lam),
        "geometricDistribution": lambda p: _dist("geometric", p),
        "zipFDistribution": lambda n, s: _dist("zipf", n, s),
        "gammaDistribution": lambda shape, scale: _dist("gamma", shape, scale),
        "empiricalDistribution": lambda arr: _dist_data("empirical", arr),
        "enumeratedDistribution": lambda arr: _dist_data("enumerated", arr),
        # distribution functions
        "cumulativeProbability": _cdf,
        "probability": _probability,
        "density": _density,
        # regression / curve fitting
        "regress": _regress,
        "predict": lambda m, x: m["intercept"] + m["slope"] * x,
        "residuals": lambda m, x, y: F.zip_with(
            y, x, lambda yy, xx: yy - (m["intercept"] + m["slope"] * xx)
        ),
        "polyfit": lambda y, *d: _polyfit(y, d[0] if d else None),
        "knn": _knn_rows,
        # univariate stats (commons-math bias-corrected forms)
        "harmonicMean": lambda arr: F.size(arr)
        / F.aggregate(arr, F.lit(0.0), lambda s, v: s + F.lit(1.0) / v),
        # NOTE: F.log is two-arg (base, expr) — transform would feed it
        # (element, index); the lambda pins the one-arg ln form
        "geometricMean": lambda arr: F.exp(_mean(F.transform(arr, lambda x: F.log(x)))),
        "median": _median_of,
        "mad": lambda arr: _mean(F.transform(arr, lambda x: F.abs(x - _mean(arr)))),
        "skewness": lambda arr: (
            F.size(arr).cast("double")
            / ((F.size(arr) - 1) * (F.size(arr) - 2)).cast("double")
        )
        * F.aggregate(
            arr, F.lit(0.0), lambda s, v: s + F.pow((v - _mean(arr)) / F.sqrt(_var(arr)), 3)
        ),
        "kurtosis": lambda arr: (
            F.size(arr).cast("double")
            * (F.size(arr) + 1).cast("double")
            / (
                (F.size(arr) - 1) * (F.size(arr) - 2) * (F.size(arr) - 3)
            ).cast("double")
        )
        * F.aggregate(
            arr, F.lit(0.0), lambda s, v: s + F.pow((v - _mean(arr)) / F.sqrt(_var(arr)), 4)
        )
        - F.lit(3.0)
        * F.pow((F.size(arr) - 1).cast("double"), 2)
        / ((F.size(arr) - 2) * (F.size(arr) - 3)).cast("double"),
        # signal / number theory / geo
        "convolve": _convolve,
        "fft": _fft,
        "oscillate": _oscillate,
        "primes": _primes,
        "cosine": lambda a, b: _dot(a, b) / (_l2(a) * _l2(b)),
        "haversineMeters": _haversine_m,
    }
)


# --------------------------------------------------------------------------
# round 4b: the hypothesis-testing tranche — ttest/pairedTtest/anova/
# mannWhitney/ks/chiSquareDataSet/gtestDataSet/corrPValues/outliers
# (reference solr/solrj/src/java/org/apache/solr/client/solrj/io/eval/
# TTestEvaluator.java, PairedTTestEvaluator.java, AnovaEvaluator.java,
# MannWhitneyUEvaluator.java, KolmogorovSmirnovEvaluator.java,
# ChiSquareDataSetEvaluator.java, GTestDataSetEvaluator.java,
# CorrelationSignificanceEvaluator.java, OutliersEvaluator.java — all
# delegating to commons-math). p-values ride a regularized incomplete beta
# computed as a FIXED-120-double-step Lentz continued fraction inside one
# F.aggregate — like _gammainc_p, pure Catalyst, no Python in the row path.
# Result tuples keep the reference's exact keys ("t-statistic", "p-value",
# "f-ratio", "u-statistic", "d-statistic"...) as struct field names.


def _guard(v: Column) -> Column:
    # Lentz FPMIN guard (Numerical-Recipes betacf)
    return F.when(F.abs(v) < 1e-30, F.lit(1e-30)).otherwise(v)


def _betacf(a: Column, b: Column, x: Column) -> Column:
    """Continued fraction for the incomplete beta (NR 6.4 'betacf', modified
    Lentz) with a FIXED 120 double-steps — commons-math iterates to 1e-14
    convergence; 120 steps are past that for every df the tests reach."""
    qab, qap, qam = a + b, a + 1.0, a - 1.0
    d0 = F.lit(1.0) / _guard(F.lit(1.0) - qab * x / qap)
    init = F.struct(
        F.lit(1.0).alias("c"), d0.alias("d"), d0.alias("h")
    )

    def step(acc, m):
        m = m.cast("double")
        m2 = 2.0 * m
        aa = m * (b - m) * x / ((qam + m2) * (a + m2))
        d1 = F.lit(1.0) / _guard(F.lit(1.0) + aa * acc["d"])
        c1 = _guard(F.lit(1.0) + aa / acc["c"])
        h1 = acc["h"] * d1 * c1
        aa2 = -(a + m) * (qab + m) * x / ((a + m2) * (qap + m2))
        d2 = F.lit(1.0) / _guard(F.lit(1.0) + aa2 * d1)
        c2 = _guard(F.lit(1.0) + aa2 / c1)
        return F.struct(c2.alias("c"), d2.alias("d"), (h1 * d2 * c2).alias("h"))

    return F.aggregate(
        F.sequence(F.lit(1), F.lit(120)), init, step, lambda acc: acc["h"]
    )


def _betainc(a: Column, b: Column, x: Column) -> Column:
    """Regularized incomplete beta I_x(a,b) (NR 'betai'): the continued
    fraction converges fast for x < (a+1)/(a+b+2), else via the symmetry
    I_x(a,b) = 1 − I_{1−x}(b,a)."""
    xc = F.least(F.greatest(x, F.lit(1e-300)), F.lit(1.0) - 1e-16)
    bt = F.exp(
        _lgamma(a + b) - _lgamma(a) - _lgamma(b)
        + a * F.log(xc) + b * F.log(F.lit(1.0) - xc)
    )
    direct = bt * _betacf(a, b, xc) / a
    flipped = F.lit(1.0) - bt * _betacf(b, a, F.lit(1.0) - xc) / b
    out = F.when(xc < (a + 1.0) / (a + b + 2.0), direct).otherwise(flipped)
    out = F.when(x <= 0, F.lit(0.0)).when(x >= 1, F.lit(1.0)).otherwise(out)
    return F.least(F.greatest(out, F.lit(0.0)), F.lit(1.0))


def _t_p2(t: Column, df: Column) -> Column:
    """Two-sided Student-t p-value: I_{df/(df+t²)}(df/2, 1/2)."""
    return _betainc(df / 2.0, F.lit(0.5), df / (df + t * t))


def _f_sf(f: Column, d1: Column, d2: Column) -> Column:
    """P(F > f) for F(d1, d2): I_{d2/(d2+d1·f)}(d2/2, d1/2)."""
    return _betainc(d2 / 2.0, d1 / 2.0, d2 / (d2 + d1 * f))


def _ttest(a: Column, b: Column) -> Column:
    """ttest(a,b) (TTestEvaluator two-array branch → commons-math
    TTest.tTest(double[],double[])): Welch's unequal-variance two-sample
    t-test, df by Welch–Satterthwaite, two-sided p. (The reference's
    one-sample number+array branch is not expressible here — a Column's
    scalar-vs-array shape is schema-fixed; use the two-array form.)"""
    n1, n2 = F.size(a).cast("double"), F.size(b).cast("double")
    v1n, v2n = _var(a) / n1, _var(b) / n2
    t = (_mean(a) - _mean(b)) / F.sqrt(v1n + v2n)
    df = (v1n + v2n) * (v1n + v2n) / (
        v1n * v1n / (n1 - 1.0) + v2n * v2n / (n2 - 1.0)
    )
    return F.struct(t.alias("t-statistic"), _t_p2(t, df).alias("p-value"))


def _paired_ttest(a: Column, b: Column) -> Column:
    """pairedTtest (PairedTTestEvaluator → TTest.pairedTTest): one-sample
    t on the element-wise differences, df = n−1."""
    d = F.zip_with(a, b, lambda x, y: x - y)
    n = F.size(d).cast("double")
    t = _mean(d) / F.sqrt(_var(d) / n)
    return F.struct(
        t.alias("t-statistic"), _t_p2(t, n - 1.0).alias("p-value")
    )


def _anova(*groups: Column) -> Column:
    """anova(a,b,...) (AnovaEvaluator → commons-math OneWayAnova): one-way
    F = (SSB/(k−1)) / (SSW/(N−k)), p = P(F > f)."""
    k = float(len(groups))
    ns = [F.size(g).cast("double") for g in groups]
    n_tot = ns[0]
    for n in ns[1:]:
        n_tot = n_tot + n
    tot = _agg_sum(groups[0])
    for g in groups[1:]:
        tot = tot + _agg_sum(g)
    grand = tot / n_tot
    def _sq_dev_sum(g, m):
        return F.aggregate(g, F.lit(0.0), lambda s, v: s + (v - m) * (v - m))

    ssb = F.lit(0.0)
    ssw = F.lit(0.0)
    for g, n in zip(groups, ns):
        m = _mean(g)
        ssb = ssb + n * (m - grand) * (m - grand)
        ssw = ssw + _sq_dev_sum(g, m)
    d1, d2 = F.lit(k - 1.0), n_tot - k
    f = (ssb / d1) / (ssw / d2)
    return F.struct(_f_sf(f, d1, d2).alias("p-value"), f.alias("f-ratio"))


def _rank_sum(a: Column, combined: Column) -> Column:
    """Σ mid-ranks of a's elements within combined (ties → average rank):
    rank(v) = (#{< v} + #{≤ v} + 1) / 2."""
    return F.aggregate(
        a,
        F.lit(0.0),
        lambda s, v: s
        + (
            F.size(F.filter(combined, lambda w: w < v))
            + F.size(F.filter(combined, lambda w: w <= v))
            + 1
        ).cast("double")
        / 2.0,
    )


def _mann_whitney(a: Column, b: Column) -> Column:
    """mannWhitney (MannWhitneyUEvaluator → commons-math MannWhitneyUTest):
    u = max(U1, U2); p = asymptotic normal 2·Φ((Umin − μ)/σ) with
    μ = n1n2/2, σ = √(n1n2(n1+n2+1)/12) — the reference's commons-math
    path applies no tie or continuity correction; neither does this."""
    n1, n2 = F.size(a).cast("double"), F.size(b).cast("double")
    combined = F.concat(a, b)
    u1 = _rank_sum(a, combined) - n1 * (n1 + 1.0) / 2.0
    u2 = n1 * n2 - u1
    umin, umax = F.least(u1, u2), F.greatest(u1, u2)
    mu = n1 * n2 / 2.0
    sd = F.sqrt(n1 * n2 * (n1 + n2 + 1.0) / 12.0)
    p = 2.0 * _norm_cdf((umin - mu) / sd, F.lit(0.0), F.lit(1.0))
    return F.struct(
        umax.alias("u-statistic"), F.least(p, F.lit(1.0)).alias("p-value")
    )


def _ks_sum(t: Column) -> Column:
    """Kolmogorov asymptotic Q(t) = 2 Σ_{k≥1} (−1)^{k−1} e^{−2k²t²}
    (commons-math KolmogorovSmirnovTest.ksSum role, fixed 100 terms)."""
    q = F.aggregate(
        F.sequence(F.lit(1), F.lit(100)),
        F.lit(0.0),
        lambda s, k: s
        + F.when(k % 2 == 1, F.lit(2.0)).otherwise(F.lit(-2.0))
        * F.exp(-2.0 * (k * k).cast("double") * t * t),
    )
    return F.least(F.greatest(q, F.lit(0.0)), F.lit(1.0))


def _ks_one_sample(dist: Column, data: Column) -> Column:
    """kolmogorovSmirnov(dist, data) (KolmogorovSmirnovEvaluator's
    RealDistribution branch): D = max over sorted x_i of
    max(i/n − F(x_i), F(x_i) − (i−1)/n); p by the asymptotic Kolmogorov
    sum at √n·D (the reference switches to an exact small-n evaluation
    under n ≤ 100 — documented asymptotic-only delta)."""
    s = F.array_sort(data)
    n = F.size(s).cast("double")
    d = F.aggregate(
        F.sequence(F.lit(1), F.size(s)),
        F.lit(0.0),
        lambda acc, i: F.greatest(
            acc,
            i.cast("double") / n - _cdf(dist, F.element_at(s, i)),
            _cdf(dist, F.element_at(s, i)) - (i.cast("double") - 1.0) / n,
        ),
    )
    return F.struct(
        _ks_sum(F.sqrt(n) * d).alias("p-value"), d.alias("d-statistic")
    )


def _ks_two_sample(a: Column, b: Column) -> Column:
    """ks(a, b) (KolmogorovSmirnovEvaluator's two-array branch): NOTE the
    reference stores the two-sample P-VALUE under the "d-statistic" key
    (KolmogorovSmirnovEvaluator.java:66) — mirrored verbatim. D = sup
    |ecdf_a − ecdf_b| over the pooled points; p asymptotic at
    D·√(nm/(n+m))."""
    n1, n2 = F.size(a).cast("double"), F.size(b).cast("double")
    pooled = F.concat(a, b)
    d = F.aggregate(
        pooled,
        F.lit(0.0),
        lambda acc, v: F.greatest(
            acc,
            F.abs(
                F.size(F.filter(a, lambda w: w <= v)).cast("double") / n1
                - F.size(F.filter(b, lambda w: w <= v)).cast("double") / n2
            ),
        ),
    )
    p = _ks_sum(d * F.sqrt(n1 * n2 / (n1 + n2)))
    return F.struct(p.alias("d-statistic"))


def _chisq_dataset(a: Column, b: Column) -> Column:
    """chiSquareDataSet (ChiSquareDataSetEvaluator → commons-math
    ChiSquareTest.chiSquareDataSetsComparison): two observed count sets,
    stat = Σ (√(n2/n1)·a_i − √(n1/n2)·b_i)² / (a_i + b_i), df = bins − 1,
    p = Q(df/2, stat/2)."""
    n1, n2 = _agg_sum(a), _agg_sum(b)
    r1, r2 = F.sqrt(n2 / n1), F.sqrt(n1 / n2)
    stat = F.aggregate(
        F.zip_with(
            a, b, lambda x, y: (r1 * x - r2 * y) * (r1 * x - r2 * y) / (x + y)
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    df = (F.size(a) - 1).cast("double")
    p = F.lit(1.0) - _gammainc_p(df / 2.0, stat / 2.0)
    return F.struct(stat.alias("chisquare-statistic"), p.alias("p-value"))


def _gtest_dataset(a: Column, b: Column) -> Column:
    """gtestDataSet (GTestDataSetEvaluator → commons-math
    GTest.gTestDataSetsComparison): G = 2 Σ [a_i ln(a_i/e1_i) +
    b_i ln(b_i/e2_i)] with e_{1,2} the pooled expectations, df = bins − 1
    (0·ln 0 = 0)."""
    n1, n2 = _agg_sum(a), _agg_sum(b)

    def _term(o, e):
        return F.when(o > 0, o * F.log(o / e)).otherwise(F.lit(0.0))

    g = F.lit(2.0) * F.aggregate(
        F.zip_with(
            a,
            b,
            lambda x, y: _term(x, (x + y) * n1 / (n1 + n2))
            + _term(y, (x + y) * n2 / (n1 + n2)),
        ),
        F.lit(0.0),
        lambda s, v: s + v,
    )
    df = (F.size(a) - 1).cast("double")
    p = F.lit(1.0) - _gammainc_p(df / 2.0, g / 2.0)
    return F.struct(g.alias("G-statistic"), p.alias("p-value"))


def _corr_pvalues(m: Column) -> Column:
    """corrPValues (CorrelationSignificanceEvaluator): symmetric matrix of
    two-sided correlation p-values, p_ij from t = r·√((n−2)/(1−r²)) with
    df = n − 2. DELTA from the reference: commons-math reads the sample
    size off the PearsonsCorrelation object stashed on the matrix — a
    value-typed Column carries no attributes, so this takes the
    OBSERVATION matrix (rows = observations, columns = variables)
    directly and derives both r and n from it."""

    def _mcol(j):
        return F.transform(m, lambda row: F.element_at(row, j.cast("int")))

    n = F.size(m).cast("double")
    k = F.size(F.element_at(m, 1))

    def _p(i, j):
        r = _corr_arrays(_mcol(i), _mcol(j))
        t = F.abs(r) * F.sqrt((n - 2.0) / (F.lit(1.0) - r * r))
        return F.when(i == j, F.lit(0.0)).otherwise(_t_p2(t, n - 2.0))

    return F.transform(
        F.sequence(F.lit(1), k),
        lambda i: F.transform(F.sequence(F.lit(1), k), lambda j: _p(i, j)),
    )


def _outliers(dist: Column, vec: Column, low: Column, hi: Column) -> Column:
    """outliers(d, vec, low, hi) (OutliersEvaluator): keep values whose
    CDF under d is ≤ low (low outliers) or ≥ hi (high outliers). The
    reference emits per-row Tuples keyed lowOutlierValue_d /
    highOutlierValue_d; the Column form is an array of structs
    (value, cumulativeProbability, low) — same selection, one shape."""
    return F.filter(
        F.transform(
            vec,
            lambda v: F.struct(
                v.alias("value"),
                _cdf(dist, v).alias("cumulativeProbability"),
                (_cdf(dist, v) <= low).alias("low"),
            ),
        ),
        lambda s: (s["cumulativeProbability"] <= low)
        | (s["cumulativeProbability"] >= hi),
    )


EVALUATORS.update(
    {
        "ttest": _ttest,
        "pairedTtest": _paired_ttest,
        "anova": _anova,
        "mannWhitney": _mann_whitney,
        # reference registers both names on one evaluator whose branch is
        # the runtime ARG TYPE; Column shapes are schema-fixed, so the two
        # branches get one name each (documented):
        "kolmogorovSmirnov": _ks_one_sample,  # (distribution, data)
        "ks": _ks_two_sample,  # (data, data)
        "chiSquareDataSet": _chisq_dataset,
        "gtestDataSet": _gtest_dataset,
        "corrPValues": _corr_pvalues,
        "outliers": _outliers,
    }
)
