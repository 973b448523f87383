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

Scope (documented): per-tuple evaluators only — 223 names (+ the
``termVectors`` stream-context bridge in ``streaming_expr``). Round 4 adds the
deterministic model-state tranche (distributions as value-typed structs +
cumulativeProbability/probability/density, regress/predict/residuals,
polyfit via Cramer-solved normal equations, knn rows, fft/convolve/
oscillate/primes, bias-corrected skewness/kurtosis), the hypothesis-
testing tranche (ttest/pairedTtest/anova/mannWhitney/ks/kolmogorovSmirnov/
chiSquareDataSet/gtestDataSet/corrPValues/outliers — p-values via a
fixed-step Lentz incomplete-beta continued fraction, one F.aggregate), and
the interpolation tranche (lerp/akima/spline models on the VectorFunction
protocol with predict/derivative/integrate — the spline tridiagonal solve
is an array-accumulator ``F.aggregate`` Thomas sweep — plus finddelay/
hist/earthMovers/ifft/conv/convert/val/getValue/betaDistribution), and
the clustering/multivariate-regression tranche (kmeans/multiKmeans/
fuzzyKmeans + getters, knnRegress, olsRegress — deterministic init where
commons seeds an RNG, documented at the batch-3 block), and the 2-D
geometry/labels/cache tranche (convexHull + enclosingDisk families, rank,
set/get row-column labels, setValue, putCache/getCache/listCache/
removeCache — batch-4 block).
Still out: names that need an RNG (``sample``/``monteCarlo``/``random*``).
``corr``/``regress``/
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

from .functions import FUNCTIONS, PlanValue, parse_func  # noqa: F401  (registry base)

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
    # ArrayEvaluator: numeric arrays cast to double; quoted string literals
    # build a string array (the reference's array('a','b') form, used e.g.
    # for setRowLabels)
    "array": lambda *c: (
        F.array(*[F.lit(x) for x in c])
        if any(isinstance(x, str) for x in c)
        else F.array(*c).cast("array<double>")
    ),
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


def parse_eval(text: str, names: dict | None = None) -> Column:
    """Parse one math expression in the evaluator namespace → Column.
    A top-level :class:`~.functions.PlanValue` (an interpolation model used
    as a value) decays to its serialized form — the fitted-values array,
    like the reference VectorFunction."""
    r = parse_func(text, registry=_registry(), names=names)
    return r.value() if isinstance(r, PlanValue) else r


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
    names: dict[str, PlanValue] = {}
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
        out.append((name, parse_binding(body[m.end():i], name, names)))
        pos = i + 1
    return out


def parse_binding(text: str, name: str, names: dict) -> Column:
    """Parse ONE let-binding expression, threading the model-tag scope: a
    PlanValue result binds its struct column while ``names`` keeps the
    plan-time tag so later bindings referencing ``name`` stay model-aware.
    Shared by :func:`parse_let` and the streaming-expression ``let()``
    head (``streaming_expr._let_stream``)."""
    r = parse_func(text, registry=_registry(), names=names)
    if isinstance(r, PlanValue):
        names[name] = r.rebind(F.col(name))
        return r.materialize()
    return r


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
        .when(
            d == "beta",
            _betainc(a, b, F.least(F.greatest(x, F.lit(0.0)), F.lit(1.0))),
        )
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
    beta_pdf = F.when((x <= 0) | (x >= 1), F.lit(0.0)).otherwise(
        F.exp(
            (a - 1.0) * F.log(x)
            + (b - 1.0) * F.log(F.lit(1.0) - x)
            + _lgamma(a + b)
            - _lgamma(a)
            - _lgamma(b)
        )
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
        .when(d == "beta", beta_pdf)
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
        # "predict" is registered in the batch-2 block below — it dispatches
        # on the plan-time model marker (interpolation) vs the regress struct
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
# --------------------------------------------------------------------------
# round 4 batch 2: interpolation models + the VectorFunction protocol
# (``LerpEvaluator.java`` / ``AkimaEvaluator.java`` / ``SplineEvaluator.java``
# → commons LinearInterpolator / AkimaSplineInterpolator / SplineInterpolator;
# ``DerivativeEvaluator.java``, ``IntegrateEvaluator.java``,
# ``PredictEvaluator.java``). The reference wraps a commons
# ``PolynomialSplineFunction`` in a ``VectorFunction`` whose serialized value
# is the fitted y list while the function itself feeds predict/derivative/
# integrate. Here a model is a struct Column ``(xs, ys, m, vals)`` — knots,
# original y's, per-kind coefficient array, and the sampled values — carried
# inside a plan-time ``Model`` marker (:class:`~.functions.PlanValue`) whose
# KIND + derivative ORDER pick the expression shape predict/derivative/
# integrate emit. A model handed to a kind-unaware evaluator decays to its
# ``vals`` array, mirroring the VectorFunction-as-list behavior.


class Model(PlanValue):
    """Interpolation model: ``kind`` ∈ lerp|akima|spline, ``order`` = how
    many times it has been differentiated (0 = the interpolant).

    ``bound`` = the struct's ``vals`` field matches this order (true for
    constructors and for ``let()``-bound refs, false after an inline
    ``derivative()``). Derivatives DON'T rebuild the struct — for an inline
    model every field access copies the whole construction expression, and
    nesting a re-sampled ``vals`` inside it makes the tree grow
    multiplicatively per derivative level (Catalyst analysis OOMs long
    before the optimizer's extract-value collapse runs). Instead the order
    lives in the marker and ``vals`` is derived lazily only where a
    derivative model is actually USED as a value."""

    def __init__(self, col: Column, kind: str, order: int = 0, bound: bool = True):
        super().__init__(col)
        self.kind = kind
        self.order = order
        self.bound = bound

    def rebind(self, col: Column) -> "Model":
        # post-binding column ref: materialize() wrote vals at this order
        return Model(col, self.kind, self.order, bound=True)

    def materialize(self) -> Column:
        """The struct to bind into a DataFrame — vals sampled at THIS
        order (linear, one re-sample per binding)."""
        if self.bound:
            return self.col
        c = self.col
        return _model_struct(
            c["xs"], c["ys"], c["m"],
            F.transform(c["xs"], lambda xv: _model_eval(self, xv)),
        )

    def value(self) -> Column:
        if self.bound:
            return self.col["vals"]
        return F.transform(self.col["xs"], lambda xv: _model_eval(self, xv))


def _model_struct(xs: Column, ys: Column, m: Column, vals: Column) -> Column:
    return F.struct(xs.alias("xs"), ys.alias("ys"), m.alias("m"), vals.alias("vals"))


def _interp_xy(a: Column, b: tuple) -> tuple:
    """The shared 1-arg (y only, x = 0..n−1) / 2-arg (x, y) constructor
    convention (LerpEvaluator.java doWork)."""
    if b:
        return a, b[0]
    xs = F.transform(F.sequence(F.lit(0), F.size(a) - 1), lambda i: i.cast("double"))
    return xs, a


def _at(arr: Column, j) -> Column:
    # 0-based index j (Column or int) over a 1-based element_at
    j = F.lit(j) if isinstance(j, int) else j
    return F.element_at(arr, (j + 1).cast("int"))


def _lerp(a: Column, *b: Column) -> Model:
    xs, ys = _interp_xy(a, b)
    slopes = F.zip_with(_diff(ys), _diff(xs), lambda dy, dx: dy / dx)
    return Model(_model_struct(xs, ys, slopes, ys), "lerp")


def _akima(a: Column, *b: Column) -> Model:
    """Akima slopes per commons AkimaSplineInterpolator (≥ 5 points):
    weighted secant slopes with three-point parabolic endpoints."""
    xs, ys = _interp_xy(a, b)
    n = F.size(xs)
    d = F.zip_with(_diff(ys), _diff(xs), lambda dy, dx: dy / dx)

    def three_point(i, i0, i1, i2):
        # AkimaSplineInterpolator.differentiateThreePoint
        y0, y1, y2 = _at(ys, i0), _at(ys, i1), _at(ys, i2)
        t = _at(xs, i) - _at(xs, i0)
        t1 = _at(xs, i1) - _at(xs, i0)
        t2 = _at(xs, i2) - _at(xs, i0)
        aa = (y2 - y0 - (t2 / t1 * (y1 - y0))) / (t2 * t2 - t1 * t2)
        bb = (y1 - y0 - aa * t1 * t1) / t1
        return F.lit(2.0) * aa * t + bb

    def interior_slope(i):
        w_p = F.abs(_at(d, i + 1) - _at(d, i))
        w_m = F.abs(_at(d, i - 1) - _at(d, i - 2))
        flat = (
            (_at(xs, i + 1) - _at(xs, i)) * _at(d, i - 1)
            + (_at(xs, i) - _at(xs, i - 1)) * _at(d, i)
        ) / (_at(xs, i + 1) - _at(xs, i - 1))
        return F.when((w_p == 0.0) & (w_m == 0.0), flat).otherwise(
            (w_p * _at(d, i - 1) + w_m * _at(d, i)) / (w_p + w_m)
        )

    interior = F.transform(
        F.filter(
            F.sequence(F.lit(2), F.greatest(n - 3, F.lit(2))), lambda i: i <= n - 3
        ),
        interior_slope,
    )
    m = F.concat(
        F.array(three_point(F.lit(0), F.lit(0), F.lit(1), F.lit(2)),
                three_point(F.lit(1), F.lit(0), F.lit(1), F.lit(2))),
        interior,
        F.array(three_point(n - 2, n - 3, n - 2, n - 1),
                three_point(n - 1, n - 3, n - 2, n - 1)),
    )
    return Model(_model_struct(xs, ys, m, ys), "akima")


def _spline(a: Column, *b: Column) -> Model:
    """Natural cubic spline per commons SplineInterpolator — the classic
    tridiagonal system, solved with a forward/backward ``F.aggregate`` sweep
    (array-accumulator Thomas algorithm, all JVM-side). ``m`` stores the
    c coefficients; predict derives b, d per segment."""
    xs, ys = _interp_xy(a, b)
    return Model(_model_struct(xs, ys, _natural_c(xs, ys), ys), "spline")


def _natural_c(xs: Column, ys: Column) -> Column:
    """The natural-spline c coefficient array for knots (xs, ys)."""
    n = F.size(xs)
    h = _diff(xs)

    def step(acc, i):
        ell = (
            F.lit(2.0) * (_at(xs, i + 1) - _at(xs, i - 1))
            - _at(h, i - 1) * F.element_at(acc["mu"], -1)
        )
        alpha = F.lit(3.0) / _at(h, i) * (_at(ys, i + 1) - _at(ys, i)) - F.lit(
            3.0
        ) / _at(h, i - 1) * (_at(ys, i) - _at(ys, i - 1))
        z = (alpha - _at(h, i - 1) * F.element_at(acc["z"], -1)) / ell
        return F.struct(
            F.concat(acc["mu"], F.array(_at(h, i) / ell)).alias("mu"),
            F.concat(acc["z"], F.array(z)).alias("z"),
        )

    fwd = F.aggregate(
        F.filter(
            F.sequence(F.lit(1), F.greatest(n - 2, F.lit(1))), lambda i: i <= n - 2
        ),
        F.struct(F.array(F.lit(0.0)).alias("mu"), F.array(F.lit(0.0)).alias("z")),
        step,
    )
    c_rev = F.aggregate(
        F.sequence(n - 2, F.lit(0), F.lit(-1)),
        F.array(F.lit(0.0)),  # c[n-1] = 0 (natural boundary)
        lambda acc, j: F.concat(
            acc, F.array(_at(fwd["z"], j) - _at(fwd["mu"], j) * F.element_at(acc, -1))
        ),
    )
    return F.reverse(c_rev)


def _seg_index(xs: Column, v: Column) -> Column:
    """PolynomialSplineFunction.value segment choice: greatest knot ≤ v,
    clamped into [0, n−2] (the commons function THROWS outside [x0, xn−1];
    the Column form clamps = extrapolates the end polynomials, documented)."""
    cnt = F.aggregate(
        xs, F.lit(0), lambda acc, xk: acc + F.when(xk <= v, 1).otherwise(0)
    )
    return F.greatest(F.least(cnt, F.size(xs) - 1), F.lit(1)) - 1


def _seg_coeffs(mod: Model, j: Column) -> list:
    """Cubic coefficients [a0..a3] of segment j (p(t) = Σ aᵢ tⁱ, t = v−x_j),
    differentiated ``mod.order`` times at plan time."""
    xs, ys, m = mod.col["xs"], mod.col["ys"], mod.col["m"]
    if mod.kind == "lerp":
        a = [_at(ys, j), _at(m, j), F.lit(0.0), F.lit(0.0)]
    elif mod.kind == "akima":
        h = _at(xs, j + 1) - _at(xs, j)
        delta = (_at(ys, j + 1) - _at(ys, j)) / h
        c2 = (F.lit(3.0) * delta - F.lit(2.0) * _at(m, j) - _at(m, j + 1)) / h
        c3 = (_at(m, j) + _at(m, j + 1) - F.lit(2.0) * delta) / (h * h)
        a = [_at(ys, j), _at(m, j), c2, c3]
    elif mod.kind == "spline":
        h = _at(xs, j + 1) - _at(xs, j)
        bb = (_at(ys, j + 1) - _at(ys, j)) / h - h * (
            _at(m, j + 1) + F.lit(2.0) * _at(m, j)
        ) / F.lit(3.0)
        dd = (_at(m, j + 1) - _at(m, j)) / (F.lit(3.0) * h)
        a = [_at(ys, j), bb, _at(m, j), dd]
    else:  # pragma: no cover
        raise ValueError(f"unknown interpolation kind {mod.kind!r}")
    for _ in range(mod.order):
        a = [a[1], F.lit(2.0) * a[2], F.lit(3.0) * a[3], F.lit(0.0)]
    return a


def _model_eval(mod: Model, v: Column) -> Column:
    xs = mod.col["xs"]
    j = _seg_index(xs, v)
    a = _seg_coeffs(mod, j)
    t = v - _at(xs, j)
    return a[0] + a[1] * t + a[2] * t * t + a[3] * t * t * t


def _predict(mod, v: Column) -> Column:
    """PredictEvaluator: models dispatch on the plan-time marker
    (interpolation / knnRegress / olsRegress, defined below); a plain
    struct is the ``regress`` result (slope/intercept)."""
    if isinstance(mod, Model):
        return _model_eval(mod, v)
    if isinstance(mod, KnnModel):
        return _knn_predict(mod, v)
    if isinstance(mod, OlsModel):
        return _ols_predict(mod, v)
    return mod["intercept"] + mod["slope"] * v


_predict._plan_aware = True


def _derivative(mod) -> Model:
    """DerivativeEvaluator: model → model one order up; ``vals`` become the
    derivative sampled at the knots and ``ys`` stays the original y context
    (VectorFunction semantics) — both realized lazily by the marker, see
    :class:`Model`."""
    if not isinstance(mod, Model):
        raise ValueError("derivative() requires an interpolation model "
                         "(lerp/akima/spline) — the reference rejects "
                         "non-VectorFunction input the same way")
    return Model(mod.col, mod.kind, mod.order + 1, bound=False)


_derivative._plan_aware = True


def _integrate(mod, lo: Column, hi: Column) -> Column:
    """IntegrateEvaluator (3-arg form): ∫ over [lo, hi]. The reference runs
    a Romberg integrator over the spline; the piecewise polynomial has an
    exact antiderivative, so integrate segment-by-segment analytically
    (bounds clamped to the knot span — outside it the commons function
    throws)."""
    if not isinstance(mod, Model):
        raise ValueError("integrate() requires an interpolation model")
    xs = mod.col["xs"]
    n = F.size(xs)
    lo_c = F.greatest(lo, _at(xs, F.lit(0)))
    hi_c = F.least(hi, F.element_at(xs, -1))

    def seg_contrib(j):
        a = _seg_coeffs(mod, j)
        s0 = F.greatest(lo_c, _at(xs, j)) - _at(xs, j)
        s1 = F.least(hi_c, _at(xs, j + 1)) - _at(xs, j)

        def anti(t):
            return (
                a[0] * t
                + a[1] * t * t / F.lit(2.0)
                + a[2] * t * t * t / F.lit(3.0)
                + a[3] * t * t * t * t / F.lit(4.0)
            )

        return F.when(s1 > s0, anti(s1) - anti(s0)).otherwise(F.lit(0.0))

    return F.aggregate(
        F.sequence(F.lit(0), n - 2), F.lit(0.0), lambda acc, j: acc + seg_contrib(j)
    )


_integrate._plan_aware = True


# -- batch-2 signal / scalar names -------------------------------------------


def _finddelay(a: Column, b: Column) -> Column:
    """FindDelayEvaluator: argmax |convolve(a, reverse(b))| (first maximum,
    strict >), delay = (idx+1) − |b|."""
    conv = _convolve(a, F.reverse(b))
    best = F.aggregate(
        F.sequence(F.lit(1), F.size(conv)),
        F.struct(F.lit(-1.7976931348623157e308).alias("v"), F.lit(-1).alias("k")),
        lambda acc, k: F.when(
            F.abs(F.element_at(conv, k.cast("int"))) > acc["v"],
            F.struct(
                F.abs(F.element_at(conv, k.cast("int"))).alias("v"),
                k.cast("int").alias("k"),
            ),
        ).otherwise(acc),
    )
    return (best["k"] - F.size(b)).cast("double")


def _earth_movers(a: Column, b: Column) -> Column:
    """commons EarthMoversDistance: Σ |cumulative flow|."""
    acc = F.aggregate(
        F.zip_with(a, b, lambda p, q: F.struct(p.alias("p"), q.alias("q"))),
        F.struct(F.lit(0.0).alias("last"), F.lit(0.0).alias("tot")),
        lambda s, e: F.struct(
            (e["p"] + s["last"] - e["q"]).alias("last"),
            (s["tot"] + F.abs(e["p"] + s["last"] - e["q"])).alias("tot"),
        ),
    )
    return acc["tot"]


def _ifft(mat: Column) -> Column:
    """IFFTEvaluator: input [re[], im[]] matrix, STANDARD-normalized inverse
    DFT, REAL parts only (the reference discards the imaginary result)."""
    re_, im_ = F.element_at(mat, 1), F.element_at(mat, 2)
    n = F.size(re_)
    idx = F.sequence(F.lit(0), n - 1)

    def comp(j):
        ang = lambda k: (
            F.lit(2.0 * _math.pi) * j.cast("double") * k.cast("double") / n.cast("double")
        )
        return (
            F.aggregate(
                idx,
                F.lit(0.0),
                lambda s, k: s
                + F.element_at(re_, (k + 1).cast("int")) * F.cos(ang(k))
                - F.element_at(im_, (k + 1).cast("int")) * F.sin(ang(k)),
            )
            / n.cast("double")
        )

    return F.transform(idx, comp)


def _hist(arr: Column, *binsarg: Column) -> Column:
    """HistogramEvaluator → commons EmpiricalDistribution(bins): equal-width
    bins over [min, max] (findBin = ceil((v−min)/Δ)−1 clamped), per-bin
    SummaryStatistics plus the kernel-based cumProb/prob — Normal(mean, sd)
    within-bin kernel when sd > 0 (so cumProb at the bin mean is the
    half-bin point), constant kernel otherwise."""
    bins = (binsarg[0] if binsarg else F.lit(10)).cast("int")
    mn, mx = F.array_min(arr), F.array_max(arr)
    delta = (mx - mn) / bins.cast("double")
    ntot = F.size(arr).cast("double")

    def bin_of(v):
        return F.least(
            F.greatest(F.ceil((v - mn) / delta).cast("int") - 1, F.lit(0)), bins - 1
        )

    def bin_stats(b):
        vals = F.filter(arr, lambda v: bin_of(v) == b)
        nb = F.size(vals).cast("double")
        mean = _agg_sum(vals) / nb
        var = F.when(
            nb > 1,
            F.aggregate(vals, F.lit(0.0), lambda s, v: s + (v - mean) * (v - mean))
            / (nb - 1),
        ).otherwise(F.lit(0.0))
        sd = F.sqrt(var)
        bmin, bmax = F.array_min(vals), F.array_max(vals)
        before = F.aggregate(
            arr, F.lit(0.0), lambda s, v: s + F.when(bin_of(v) < b, 1.0).otherwise(0.0)
        )
        cum = F.when(sd > 0, (before + F.lit(0.5) * nb) / ntot).otherwise(
            (before + nb) / ntot
        )
        prob = F.when(
            sd > 0, nb / ntot * (_norm_cdf(bmax, mean, sd) - _norm_cdf(bmin, mean, sd))
        ).otherwise(F.lit(0.0))
        return F.struct(
            nb.alias("N"),
            bmin.alias("min"),
            bmax.alias("max"),
            mean.alias("mean"),
            sd.alias("stdev"),
            _agg_sum(vals).alias("sum"),
            var.alias("var"),
            cum.alias("cumProb"),
            prob.alias("prob"),
        )

    return F.transform(F.sequence(F.lit(0), bins - 1), bin_stats)


_LENGTH_IN_METERS = {
    # ConversionEvaluator LENGTH_CONSTANT units (exact factors: in→mm 25.4,
    # mile 1609.344 m, yard 0.9144 m, foot 0.3048 m)
    "miles": 1609.344,
    "yards": 0.9144,
    "feet": 0.3048,
    "inches": 0.0254,
    "millimeters": 0.001,
    "centimeters": 0.01,
    "meters": 1.0,
    "kilometers": 1000.0,
}

_COLNAME_RE = re.compile(r"Column<'([^']*)'>")


def _raw_token(v) -> str | None:
    """The reference's convert()/getValue() take RAW (unquoted) tokens for
    unit/key names; the parser turns those into bare column refs — recover
    the token from the Column's name (plan-time only, classic mode)."""
    if isinstance(v, str):
        return v
    m = _COLNAME_RE.fullmatch(str(v))
    return m.group(1) if m else None


def _convert(frm, to, v: Column) -> Column:
    f, t = _raw_token(frm), _raw_token(to)
    if f is None or t is None:
        raise ValueError("convert() unit names must be raw or quoted strings")
    f, t = f.lower(), t.lower()
    if f not in _LENGTH_IN_METERS or t not in _LENGTH_IN_METERS:
        raise ValueError(
            f"convert(): {f!r} and {t!r} are not both valid conversion types"
        )
    return v * F.lit(_LENGTH_IN_METERS[f] / _LENGTH_IN_METERS[t])


def _get_value(tup: Column, key) -> Column:
    k = _raw_token(key)
    if k is None:
        raise ValueError("getValue() key must be a raw or quoted string")
    return tup[k]


EVALUATORS.update(
    {
        "lerp": _lerp,
        "akima": _akima,
        "spline": _spline,
        "predict": _predict,
        "derivative": _derivative,
        "integrate": _integrate,
        "conv": _convolve,  # Lang.java:122 — alias of convolve
        "finddelay": _finddelay,
        "earthMovers": _earth_movers,
        "ifft": _ifft,
        "hist": _hist,
        "convert": _convert,
        "val": lambda v: v if isinstance(v, Column) else F.lit(v),
        "getValue": _get_value,
        "betaDistribution": lambda a, b: _dist("beta", a, b),
    }
)


# --------------------------------------------------------------------------
# round 4 batch 3: clustering / multivariate-regression model state
# (``KmeansEvaluator.java`` / ``FuzzyKmeansEvaluator.java`` /
# ``MultiKmeansEvaluator.java`` + ``GetCentroidsEvaluator`` /
# ``GetClusterEvaluator`` / ``GetMembershipMatrixEvaluator``,
# ``KnnRegressionEvaluator.java``, ``OLSRegressionEvaluator.java``). The
# reference's clusterers delegate to commons KMeansPlusPlus /
# FuzzyKMeansClusterer, whose INITIALIZATION is RNG-seeded — here init is
# deterministic (the first k rows; multiKmeans rotates the starting row per
# restart), a documented deviation: the ENGINE math (Lloyd / fuzzy-c-means
# updates, WCSS model selection) is the commons algorithm, reproducible on
# every run. Iteration happens at RUNTIME inside one ``F.aggregate`` over
# ``sequence(1, maxIterations)`` — the expression tree stays one-step-sized
# (a fixpoint re-runs as a no-op, so extra iterations cost compute, never
# correctness).


def _dist2(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)), F.lit(0.0), lambda s, z: s + z
    )


def _nearest(cents: Column, row: Column) -> Column:
    """0-based index of the nearest centroid (euclidean; ties → lowest
    index, strict <)."""
    best = F.aggregate(
        F.sequence(F.lit(0), F.size(cents) - 1),
        F.struct(F.lit(float("inf")).alias("d"), F.lit(-1).alias("j")),
        lambda acc, j: F.when(
            _dist2(row, F.element_at(cents, (j + 1).cast("int"))) < acc["d"],
            F.struct(
                _dist2(row, F.element_at(cents, (j + 1).cast("int"))).alias("d"),
                j.cast("int").alias("j"),
            ),
        ).otherwise(acc),
    )
    return best["j"]


def _vec_mean(vectors: Column, fallback: Column) -> Column:
    """Component-wise mean of a list of vectors; ``fallback`` when empty
    (Lloyd keeps the old centroid for an emptied cluster)."""
    n = F.size(vectors)
    sums = F.aggregate(
        vectors,
        F.transform(fallback, lambda _: F.lit(0.0)),
        lambda acc, v: F.zip_with(acc, v, lambda a, x: a + x),
    )
    return F.when(
        n > 0, F.transform(sums, lambda s: s / n.cast("double"))
    ).otherwise(fallback)


class ClusterModel(PlanValue):
    """kind ∈ kmeans|fuzzy — struct (data, centroids, assign[, memb])."""

    def __init__(self, col: Column, kind: str):
        super().__init__(col)
        self.kind = kind

    def rebind(self, col: Column) -> "ClusterModel":
        return ClusterModel(col, self.kind)


def _lloyd(mat: Column, k: Column, init: Column, iters: Column) -> Column:
    return F.aggregate(
        F.sequence(F.lit(1), iters),
        init,
        lambda cents, _i: F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda j: _vec_mean(
                F.filter(mat, lambda row: _nearest(cents, row) == j),
                F.element_at(cents, (j + 1).cast("int")),
            ),
        ),
    )


def _kmeans(mat: Column, k: Column, maxIterations: Column | None = None) -> ClusterModel:
    k = k.cast("int")
    iters = F.lit(20) if maxIterations is None else maxIterations.cast("int")
    cents = _lloyd(mat, k, F.slice(mat, 1, k), iters)
    assign = F.transform(mat, lambda row: _nearest(cents, row))
    return ClusterModel(
        F.struct(mat.alias("data"), cents.alias("centroids"), assign.alias("assign")),
        "kmeans",
    )


def _wcss(mat: Column, cents: Column) -> Column:
    return F.aggregate(
        mat,
        F.lit(0.0),
        lambda s, row: s
        + _dist2(row, F.element_at(cents, (_nearest(cents, row) + 1).cast("int"))),
    )


def _multi_kmeans(
    mat: Column, k: Column, trials: Column, maxIterations: Column | None = None
) -> ClusterModel:
    """MultiKmeansEvaluator: best-WCSS of ``trials`` restarts. The
    reference's restarts draw random inits; here restart t seeds from rows
    t, t+1, … (mod n) — deterministic, documented."""
    k = k.cast("int")
    n = F.size(mat)
    iters = F.lit(20) if maxIterations is None else maxIterations.cast("int")

    def run(offset):
        init = F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda j: F.element_at(mat, ((offset + j) % n + 1).cast("int")),
        )
        return _lloyd(mat, k, init, iters)

    # evaluate every restart once, score each against its lambda VARIABLE
    # (zero tree duplication), then min-fold over the evaluated array —
    # folding over run() expressions directly nests the Lloyd lambdas deep
    # enough to exhaust the analyzer's resolution-iteration budget
    runs = F.transform(F.sequence(F.lit(0), trials.cast("int") - 1), run)
    cands = F.transform(
        runs, lambda c: F.struct(c.alias("c"), _wcss(mat, c).alias("w"))
    )
    best = F.aggregate(
        F.slice(cands, 2, F.size(cands) - 1),
        F.element_at(cands, 1),
        lambda acc, s: F.when(s["w"] < acc["w"], s).otherwise(acc),
    )
    cents = best["c"]
    assign = F.transform(mat, lambda row: _nearest(cents, row))
    return ClusterModel(
        F.struct(mat.alias("data"), cents.alias("centroids"), assign.alias("assign")),
        "kmeans",
    )


def _fuzzy_memb_row(cents: Column, row: Column, p: Column) -> Column:
    """Fuzzy-c-means membership of one row across centroids:
    u_j = 1 / Σ_l (d_j/d_l)^(2/(m−1)); a zero distance → membership splits
    over the coincident centroids."""
    d = F.transform(cents, lambda c: F.sqrt(_dist2(row, c)))
    onehot = F.transform(d, lambda dj: F.when(dj == 0.0, 1.0).otherwise(0.0))
    nz = F.aggregate(onehot, F.lit(0.0), lambda s, x: s + x)
    u = F.transform(
        d,
        lambda dj: F.lit(1.0)
        / F.aggregate(d, F.lit(0.0), lambda s, dl: s + F.pow(dj / dl, p)),
    )
    return F.when(nz > 0, F.transform(onehot, lambda x: x / nz)).otherwise(u)


def _fuzzy_kmeans(
    mat: Column,
    k: Column,
    fuzziness: Column | None = None,
    maxIterations: Column | None = None,
) -> ClusterModel:
    """FuzzyKmeansEvaluator → commons FuzzyKMeansClusterer (default
    fuzziness 2.0): membership update + weighted centroid update; init =
    first k rows (the reference's random init, documented deviation)."""
    k = k.cast("int")
    fz = F.lit(2.0) if fuzziness is None else fuzziness.cast("double")
    p = F.lit(2.0) / (fz - 1.0)
    iters = F.lit(20) if maxIterations is None else maxIterations.cast("int")
    n = F.size(mat)
    zero = F.transform(F.element_at(mat, 1), lambda _: F.lit(0.0))

    def centroid(membs, j):
        acc = F.aggregate(
            F.sequence(F.lit(1), n),
            F.struct(zero.alias("s"), F.lit(0.0).alias("w")),
            lambda a, r: F.struct(
                F.zip_with(
                    a["s"],
                    F.element_at(mat, r.cast("int")),
                    lambda s, x: s
                    + F.pow(
                        F.element_at(
                            F.element_at(membs, r.cast("int")), (j + 1).cast("int")
                        ),
                        fz,
                    )
                    * x,
                ).alias("s"),
                (
                    a["w"]
                    + F.pow(
                        F.element_at(
                            F.element_at(membs, r.cast("int")), (j + 1).cast("int")
                        ),
                        fz,
                    )
                ).alias("w"),
            ),
        )
        return F.transform(acc["s"], lambda s: s / acc["w"])

    def step(cents, _i):
        membs = F.transform(mat, lambda row: _fuzzy_memb_row(cents, row, p))
        return F.transform(F.sequence(F.lit(0), k - 1), lambda j: centroid(membs, j))

    cents = F.aggregate(F.sequence(F.lit(1), iters), F.slice(mat, 1, k), step)
    memb = F.transform(mat, lambda row: _fuzzy_memb_row(cents, row, p))
    assign = F.transform(mat, lambda row: _nearest(cents, row))
    return ClusterModel(
        F.struct(
            mat.alias("data"),
            cents.alias("centroids"),
            assign.alias("assign"),
            memb.alias("memb"),
        ),
        "fuzzy",
    )


def _get_centroids(mod) -> Column:
    if not isinstance(mod, ClusterModel):
        raise ValueError("getCentroids() requires a clustering result")
    return mod.col["centroids"]


def _get_cluster(mod, i: Column) -> Column:
    """GetClusterEvaluator: the member rows of cluster i as a matrix."""
    if not isinstance(mod, ClusterModel):
        raise ValueError("getCluster() requires a clustering result")
    data, assign = mod.col["data"], mod.col["assign"]
    return F.transform(
        F.filter(
            F.sequence(F.lit(1), F.size(data)),
            lambda r: F.element_at(assign, r.cast("int")) == i.cast("int"),
        ),
        lambda r: F.element_at(data, r.cast("int")),
    )


def _get_membership(mod) -> Column:
    if not (isinstance(mod, ClusterModel) and mod.kind == "fuzzy"):
        raise ValueError(
            "getMembershipMatrix() requires a fuzzyKmeans result "
            "(the reference's ClusterTuple only carries it there)"
        )
    return mod.col["memb"]


_get_centroids._plan_aware = True
_get_cluster._plan_aware = True
_get_membership._plan_aware = True


class KnnModel(PlanValue):
    """knnRegress model: struct (obs matrix, out vector, k); robust/scale
    are plan-time flags (``KnnRegressionEvaluator`` named operands)."""

    def __init__(self, col: Column, robust: bool = False, scale: bool = False):
        super().__init__(col)
        self.robust = robust
        self.scale = scale

    def rebind(self, col: Column) -> "KnnModel":
        return KnnModel(col, self.robust, self.scale)


def _flag(v) -> bool:
    if v is None:
        return False
    t = _raw_token(v)
    if t is None or t.lower() not in ("true", "false"):
        raise ValueError("expected true/false flag")
    return t.lower() == "true"


def _knn_regress(
    obs: Column, outcomes: Column, k: Column, robust=None, scale=None
) -> KnnModel:
    """KnnRegressionEvaluator (matrix form; for the bivariate vector form
    wrap with transpose(matrix(vec))). Model state only — the work happens
    in predict."""
    return KnnModel(
        F.struct(
            obs.alias("obs"), outcomes.alias("out"), k.cast("int").alias("k")
        ),
        robust=_flag(robust),
        scale=_flag(scale),
    )


def _minmax01(vals: Column) -> Column:
    mn, mx = F.array_min(vals), F.array_max(vals)
    rng = F.when(mx != mn, mx - mn).otherwise(F.lit(1.0))
    return F.transform(vals, lambda x: (x - mn) / rng)


def _knn_predict(mod: KnnModel, vec: Column) -> Column:
    """Mean (robust → commons Median) of the outcomes of the k nearest
    observations; scale=true min-max scales each feature column JOINTLY
    with the predictor value appended (KnnRegressionTuple.scale)."""
    obs, out, k = mod.col["obs"], mod.col["out"], mod.col["k"]
    n = F.size(obs)
    if mod.scale:
        nfeat = F.size(F.element_at(obs, 1))

        def scaled_feature(i):
            colvals = F.transform(
                F.sequence(F.lit(1), n),
                lambda r: F.element_at(F.element_at(obs, r.cast("int")), i.cast("int")),
            )
            return _minmax01(F.concat(colvals, F.array(F.element_at(vec, i.cast("int")))))

        # per-feature scaled columns, predictor last — re-assembled to rows
        scaled_cols = F.transform(
            F.sequence(F.lit(1), nfeat), lambda i: scaled_feature(i)
        )
        obs_s = F.transform(
            F.sequence(F.lit(1), n),
            lambda r: F.transform(
                scaled_cols, lambda c: F.element_at(c, r.cast("int"))
            ),
        )
        vec_s = F.transform(scaled_cols, lambda c: F.element_at(c, -1))
        obs, vec = obs_s, vec_s
    scored = F.transform(
        F.sequence(F.lit(1), n),
        lambda r: F.struct(
            F.sqrt(_dist2(vec, F.element_at(obs, r.cast("int")))).alias("d"),
            r.cast("int").alias("r"),
        ),
    )
    sel = F.slice(F.array_sort(scored), 1, k)
    outs = F.transform(sel, lambda s: F.element_at(out, s["r"]))
    if mod.robust:
        return _percentile(outs, F.lit(50.0))
    return _mean(outs)


class OlsModel(PlanValue):
    """olsRegress result: the reference's MultipleRegressionTuple fields as
    a struct (regressionParameters includes the intercept first)."""

    def rebind(self, col: Column) -> "OlsModel":
        return OlsModel(col)


def _ols_regress(X: Column, y: Column) -> OlsModel:
    """OLSRegressionEvaluator → commons OLSMultipleLinearRegression (with
    intercept). Parameters via the normal equations (X̃ᵀX̃)w = X̃ᵀy, X̃ =
    [1|X], solved by a Gauss-Jordan ``F.aggregate`` sweep over the
    augmented matrix — runtime-sized in the feature count, diagonal pivots
    (X̃ᵀX̃ is SPD; the reference's QR agrees to fp tolerance). Standard
    errors / parameter variance (reference best-effort fields) are not
    carried — documented."""
    n = F.size(y)
    p1 = F.size(F.element_at(X, 1)) + 1  # features + intercept

    def xval(r, i):
        # design-matrix entry: column 0 is the intercept
        return F.when(i == 0, F.lit(1.0)).otherwise(
            F.element_at(F.element_at(X, r.cast("int")), i.cast("int"))
        )

    aug0 = F.transform(
        F.sequence(F.lit(0), p1 - 1),
        lambda i: F.concat(
            F.transform(
                F.sequence(F.lit(0), p1 - 1),
                lambda j: F.aggregate(
                    F.sequence(F.lit(1), n),
                    F.lit(0.0),
                    lambda s, r: s + xval(r, i) * xval(r, j),
                ),
            ),
            F.array(
                F.aggregate(
                    F.sequence(F.lit(1), n),
                    F.lit(0.0),
                    lambda s, r: s + xval(r, i) * F.element_at(y, r.cast("int")),
                )
            ),
        ),
    )

    def eliminate(aug, i):
        pivot_row = F.element_at(aug, (i + 1).cast("int"))
        pivot = F.element_at(pivot_row, (i + 1).cast("int"))
        norm = F.transform(pivot_row, lambda v: v / pivot)
        return F.transform(
            F.sequence(F.lit(0), p1 - 1),
            lambda l: F.when(l == i, norm).otherwise(
                F.zip_with(
                    F.element_at(aug, (l + 1).cast("int")),
                    norm,
                    lambda v, nv: v
                    - F.element_at(
                        F.element_at(aug, (l + 1).cast("int")), (i + 1).cast("int")
                    )
                    * nv,
                )
            ),
        )

    solved = F.aggregate(F.sequence(F.lit(0), p1 - 1), aug0, eliminate)
    w = F.transform(solved, lambda row: F.element_at(row, -1))

    def yhat(r):
        return F.aggregate(
            F.sequence(F.lit(0), p1 - 1),
            F.lit(0.0),
            lambda s, i: s + F.element_at(w, (i + 1).cast("int")) * xval(r, i),
        )

    ssr = F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda s, r: s
        + (F.element_at(y, r.cast("int")) - yhat(r))
        * (F.element_at(y, r.cast("int")) - yhat(r)),
    )
    ybar = _mean(y)
    sst = F.aggregate(y, F.lit(0.0), lambda s, v: s + (v - ybar) * (v - ybar))
    r2 = F.lit(1.0) - ssr / sst
    adj = F.lit(1.0) - (F.lit(1.0) - r2) * (n - 1).cast("double") / (
        n - p1
    ).cast("double")
    return OlsModel(
        F.struct(
            w.alias("regressionParameters"),
            _var(y).alias("regressandVariance"),
            r2.alias("RSquared"),
            adj.alias("adjustedRSquared"),
            ssr.alias("residualSumSquares"),
        )
    )


def _ols_predict(mod: OlsModel, vec: Column) -> Column:
    w = mod.col["regressionParameters"]
    return F.element_at(w, 1) + F.aggregate(
        F.sequence(F.lit(1), F.size(vec)),
        F.lit(0.0),
        lambda s, i: s
        + F.element_at(w, (i + 1).cast("int")) * F.element_at(vec, i.cast("int")),
    )


EVALUATORS.update(
    {
        "kmeans": _kmeans,
        "multiKmeans": _multi_kmeans,
        "fuzzyKmeans": _fuzzy_kmeans,
        "getCentroids": _get_centroids,
        "getCluster": _get_cluster,
        "getMembershipMatrix": _get_membership,
        "knnRegress": _knn_regress,
        "olsRegress": _ols_regress,
    }
)


# --------------------------------------------------------------------------
# round 4 batch 4: 2-D computational geometry + matrix labels + caches
# (``ConvexHullEvaluator.java`` → commons MonotoneChain/ConvexHull2D with
# ``Get{Vertices,BaryCenter,Area,BoundarySize}Evaluator``,
# ``EnclosingDiskEvaluator.java`` → commons WelzlEncloser with
# ``Get{Center,Radius,SupportPoints}Evaluator``, ``RankEvaluator.java`` →
# commons NaturalRanking (ascending, ties averaged),
# ``Set/Get{Row,Column}LabelsEvaluator``, ``SetValueEvaluator``,
# ``{Put,Get,List,Remove}CacheEvaluator``.)
#
# The monotone-chain pop loop IS expressible as one Catalyst aggregate: a
# push's sequential drop-while tests touch ABSOLUTE stack positions
# (dropping only removes the top), so the number of pops equals the count
# of leading non-left-turn tests — a short inner aggregate with a done
# flag. Welzl's enclosing disk is RNG-ordered in commons; here the minimal
# disk is found deterministically by scoring every pair-diameter and
# triple-circumcircle candidate (the minimal enclosing disk is always
# determined by ≤ 3 points; the disk is unique even though the support set
# can tie in degenerate configurations — documented).


def _rank_avg(arr: Column) -> Column:
    """NaturalRanking default: ascending, 1-based, ties → average rank."""
    return F.transform(
        arr,
        lambda v: (
            F.size(F.filter(arr, lambda w: w < v))
            + (F.size(F.filter(arr, lambda w: w == v)) + 1).cast("double") / 2.0
        ),
    )


class HullModel(PlanValue):
    """ConvexHull2D: struct (v = CCW vertex matrix)."""

    def rebind(self, col: Column) -> "HullModel":
        return HullModel(col)


def _cross(o: Column, a: Column, b: Column) -> Column:
    ox, oy = F.element_at(o, 1), F.element_at(o, 2)
    return (F.element_at(a, 1) - ox) * (F.element_at(b, 2) - oy) - (
        F.element_at(a, 2) - oy
    ) * (F.element_at(b, 1) - ox)


def _half_hull(pts: Column) -> Column:
    """One monotone-chain half over lexicographically ordered points:
    push each point after popping trailing non-left turns."""

    def push(h, p):
        m = F.size(h)
        drops = F.aggregate(
            F.filter(F.sequence(F.lit(0), F.greatest(m - 2, F.lit(0))), lambda s: s <= m - 2),
            F.struct(F.lit(0).alias("t"), F.lit(False).alias("done")),
            lambda acc, s: F.when(
                ~acc["done"]
                & (
                    _cross(
                        F.element_at(h, (m - 1 - s).cast("int")),
                        F.element_at(h, (m - s).cast("int")),
                        p,
                    )
                    <= 0
                ),
                F.struct((acc["t"] + 1).alias("t"), F.lit(False).alias("done")),
            ).otherwise(F.struct(acc["t"].alias("t"), F.lit(True).alias("done"))),
        )["t"]
        return F.concat(F.slice(h, 1, m - drops), F.array(p))

    return F.aggregate(
        F.slice(pts, 2, F.size(pts) - 1), F.array(F.element_at(pts, 1)), push
    )


def _convex_hull(mat: Column) -> HullModel:
    """Andrew's monotone chain (the commons MonotoneChain algorithm,
    includesCollinear=false): CCW vertices starting at the lexicographic
    minimum."""
    srt = F.array_sort(mat)
    lower = _half_hull(srt)
    upper = _half_hull(F.reverse(srt))
    ring = F.concat(
        F.slice(lower, 1, F.size(lower) - 1), F.slice(upper, 1, F.size(upper) - 1)
    )
    # degenerate single-point / collinear inputs: keep whatever survived
    verts = F.when(F.size(ring) > 0, ring).otherwise(F.slice(srt, 1, 1))
    return HullModel(F.struct(verts.alias("v")))


def _hull_verts(mod) -> Column:
    if not isinstance(mod, HullModel):
        raise ValueError("expected a convexHull() result")
    return mod.col["v"]


def _shoelace2(v: Column) -> Column:
    """Σ (x_i·y_{i+1} − x_{i+1}·y_i) over the closed ring = 2·signed area
    (positive for the CCW hull)."""
    n = F.size(v)

    def at(i):  # 1-based, wrapping
        return F.element_at(v, ((i - 1) % n + 1).cast("int"))

    return F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda s, i: s
        + F.element_at(at(i), 1) * F.element_at(at(i + 1), 2)
        - F.element_at(at(i + 1), 1) * F.element_at(at(i), 2),
    )


def _hull_area(mod) -> Column:
    return _shoelace2(_hull_verts(mod)) / 2.0


def _hull_boundary(mod) -> Column:
    v = _hull_verts(mod)
    n = F.size(v)

    def at(i):
        return F.element_at(v, ((i - 1) % n + 1).cast("int"))

    return F.aggregate(
        F.sequence(F.lit(1), n),
        F.lit(0.0),
        lambda s, i: s + F.sqrt(_dist2(at(i), at(i + 1))),
    )


def _hull_barycenter(mod) -> Column:
    """Area centroid of the hull polygon (commons Region.getBarycenter):
    C = (1/6A) Σ (p_i + p_{i+1})·cross_i."""
    v = _hull_verts(mod)
    n = F.size(v)

    def at(i):
        return F.element_at(v, ((i - 1) % n + 1).cast("int"))

    a2 = _shoelace2(v)

    def comp(axis):
        return (
            F.aggregate(
                F.sequence(F.lit(1), n),
                F.lit(0.0),
                lambda s, i: s
                + (F.element_at(at(i), axis) + F.element_at(at(i + 1), axis))
                * (
                    F.element_at(at(i), 1) * F.element_at(at(i + 1), 2)
                    - F.element_at(at(i + 1), 1) * F.element_at(at(i), 2)
                ),
            )
            / (F.lit(3.0) * a2)
        )

    return F.array(comp(1), comp(2))


_convex_hull._plan_aware = False  # consumes a plain matrix
_hull_verts._plan_aware = True
_hull_area._plan_aware = True
_hull_boundary._plan_aware = True
_hull_barycenter._plan_aware = True


class DiskModel(PlanValue):
    """Enclosing disk: struct (c = [x,y], r, support = matrix)."""

    def rebind(self, col: Column) -> "DiskModel":
        return DiskModel(col)


def _enclosing_disk(mat: Column) -> DiskModel:
    """Minimal enclosing disk of 2-D points. commons WelzlEncloser is
    recursion over an RNG-shuffled order; deterministically, the minimal
    disk is defined by 2 or 3 of the points — score every pair (diameter
    disk) and triple (circumcircle), keep the smallest that contains all
    points (1e-10 containment slack). O(n⁴) inside one row — the per-tuple
    regime these evaluators run in."""
    n = F.size(mat)

    def P(i):
        return F.element_at(mat, i.cast("int"))

    def disk(cx, cy, r, ids):
        return F.struct(
            cx.alias("cx"), cy.alias("cy"), r.alias("r"), ids.alias("ids")
        )

    pair_ids = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.transform(
                F.filter(F.sequence(F.lit(1), n), lambda j: j > i),
                lambda j: F.array(i, j, F.lit(0)),
            ),
        )
    )
    triple_ids = F.flatten(
        F.transform(
            F.sequence(F.lit(1), n),
            lambda i: F.flatten(
                F.transform(
                    F.filter(F.sequence(F.lit(1), n), lambda j: j > i),
                    lambda j: F.transform(
                        F.filter(F.sequence(F.lit(1), n), lambda kk: kk > j),
                        lambda kk: F.array(i, j, kk),
                    ),
                )
            ),
        )
    )

    def pair_disk(ids):
        a, b = P(F.element_at(ids, 1)), P(F.element_at(ids, 2))
        cx = (F.element_at(a, 1) + F.element_at(b, 1)) / 2.0
        cy = (F.element_at(a, 2) + F.element_at(b, 2)) / 2.0
        return disk(cx, cy, F.sqrt(_dist2(a, b)) / 2.0, ids)

    def triple_disk(ids):
        a = P(F.element_at(ids, 1))
        b = P(F.element_at(ids, 2))
        c = P(F.element_at(ids, 3))
        ax, ay = F.element_at(a, 1), F.element_at(a, 2)
        bx, by = F.element_at(b, 1), F.element_at(b, 2)
        cx_, cy_ = F.element_at(c, 1), F.element_at(c, 2)
        d = F.lit(2.0) * (ax * (by - cy_) + bx * (cy_ - ay) + cx_ * (ay - by))
        ux = (
            (ax * ax + ay * ay) * (by - cy_)
            + (bx * bx + by * by) * (cy_ - ay)
            + (cx_ * cx_ + cy_ * cy_) * (ay - by)
        ) / d
        uy = (
            (ax * ax + ay * ay) * (cx_ - bx)
            + (bx * bx + by * by) * (ax - cx_)
            + (cx_ * cx_ + cy_ * cy_) * (bx - ax)
        ) / d
        r = F.sqrt((ux - ax) * (ux - ax) + (uy - ay) * (uy - ay))
        # collinear -> d == 0 -> inf/NaN radius, never selected
        return disk(ux, uy, F.when(d != 0, r).otherwise(F.lit(float("inf"))), ids)

    cands = F.concat(
        F.transform(pair_ids, pair_disk), F.transform(triple_ids, triple_disk)
    )

    def contains_all(dk):
        return F.forall(
            mat,
            lambda p: F.sqrt(
                (F.element_at(p, 1) - dk["cx"]) * (F.element_at(p, 1) - dk["cx"])
                + (F.element_at(p, 2) - dk["cy"]) * (F.element_at(p, 2) - dk["cy"])
            )
            <= dk["r"] + 1e-10,
        )

    ok = F.filter(cands, contains_all)
    best = F.aggregate(
        F.slice(ok, 2, F.size(ok) - 1),
        F.element_at(ok, 1),
        lambda acc, dk: F.when(dk["r"] < acc["r"], dk).otherwise(acc),
    )
    support = F.transform(
        F.filter(best["ids"], lambda i: i > 0), lambda i: P(i)
    )
    return DiskModel(
        F.struct(
            F.array(best["cx"], best["cy"]).alias("c"),
            best["r"].alias("r"),
            support.alias("support"),
        )
    )


def _disk_field(field):
    def get(mod):
        if not isinstance(mod, DiskModel):
            raise ValueError("expected an enclosingDisk() result")
        return mod.col[field]

    get._plan_aware = True
    return get


class LabeledMatrix(PlanValue):
    """Matrix + row/column labels (``Matrix.setRowLabels`` role): struct
    (m, rl, cl); label-unaware consumers see the plain matrix."""

    def value(self) -> Column:
        return self.col["m"]

    def rebind(self, col: Column) -> "LabeledMatrix":
        return LabeledMatrix(col)


def _labeled(m, rl=None, cl=None) -> LabeledMatrix:
    if isinstance(m, LabeledMatrix):
        prev_rl, prev_cl, mm = m.col["rl"], m.col["cl"], m.col["m"]
    else:
        prev_rl = prev_cl = F.lit(None).cast("array<string>")
        mm = m
    return LabeledMatrix(
        F.struct(
            mm.alias("m"),
            (prev_rl if rl is None else rl.cast("array<string>")).alias("rl"),
            (prev_cl if cl is None else cl.cast("array<string>")).alias("cl"),
        )
    )


def _set_row_labels(m, labels) -> LabeledMatrix:
    return _labeled(m, rl=labels)


def _set_col_labels(m, labels) -> LabeledMatrix:
    return _labeled(m, cl=labels)


def _get_row_labels(m) -> Column:
    if not isinstance(m, LabeledMatrix):
        raise ValueError("getRowLabels(): no labels set on this matrix")
    return m.col["rl"]


def _get_col_labels(m) -> Column:
    if not isinstance(m, LabeledMatrix):
        raise ValueError("getColumnLabels(): no labels set on this matrix")
    return m.col["cl"]


_set_row_labels._plan_aware = True
_set_col_labels._plan_aware = True
_get_row_labels._plan_aware = True
_get_col_labels._plan_aware = True


def _set_value(tup: Column, key, v) -> Column:
    """SetValueEvaluator: tuple + (key, value) → tuple with the field
    replaced/added (Column.withField)."""
    k = _raw_token(key)
    if k is None:
        raise ValueError("setValue() key must be a raw or quoted string")
    return tup.withField(k, v if isinstance(v, Column) else F.lit(v))


# let()-scoped caches (reference {Put,Get,List,Remove}CacheEvaluator over
# the in-memory ConcurrentHashMap "object caches"): here a PLAN-TIME store
# of Column expressions, process-scoped like the reference's JVM-scoped
# maps — a getCache splices the stored expression into the consuming plan.
_OBJECT_CACHES: dict = {}


def _put_cache(space, key, v):
    s, k = _raw_token(space), _raw_token(key)
    if s is None or k is None:
        raise ValueError("putCache(space, key, value): space/key must be strings")
    _OBJECT_CACHES.setdefault(s, {})[k] = v
    return v if isinstance(v, Column) else F.lit(v)


def _get_cache(space, key):
    s, k = _raw_token(space), _raw_token(key)
    try:
        return _OBJECT_CACHES[s][k]
    except KeyError:
        raise ValueError(f"getCache: nothing cached under {s!r}/{k!r}")


def _list_cache(space=None):
    if space is None:
        return F.array(*[F.lit(s) for s in sorted(_OBJECT_CACHES)])
    s = _raw_token(space)
    return F.array(*[F.lit(k) for k in sorted(_OBJECT_CACHES.get(s, {}))])


def _remove_cache(space, key):
    s, k = _raw_token(space), _raw_token(key)
    v = _OBJECT_CACHES.get(s, {}).pop(k, None)
    if v is None:
        raise ValueError(f"removeCache: nothing cached under {s!r}/{k!r}")
    return v if isinstance(v, Column) else F.lit(v)


_put_cache._plan_aware = True
_get_cache._plan_aware = True
_remove_cache._plan_aware = True


EVALUATORS.update(
    {
        "rank": _rank_avg,
        "convexHull": _convex_hull,
        "getVertices": _hull_verts,
        "getArea": _hull_area,
        "getBoundarySize": _hull_boundary,
        "getBaryCenter": _hull_barycenter,
        "enclosingDisk": _enclosing_disk,
        "getCenter": _disk_field("c"),
        "getRadius": _disk_field("r"),
        "getSupportPoints": _disk_field("support"),
        "setRowLabels": _set_row_labels,
        "getRowLabels": _get_row_labels,
        "setColumnLabels": _set_col_labels,
        "getColumnLabels": _get_col_labels,
        "setValue": _set_value,
        "putCache": _put_cache,
        "getCache": _get_cache,
        "listCache": _list_cache,
        "removeCache": _remove_cache,
    }
)


# --------------------------------------------------------------------------
# round 4 batch 5: loess (``LoessEvaluator.java`` → commons
# LoessInterpolator, default bandwidth 0.25 / robustIterations 2 /
# accuracy 1e-12). The commons smoother is: per point, a tricube-weighted
# linear regression over a sliding bandwidth window (⌊bandwidth·n⌋ points;
# the window advances AT MOST ONE step per point), then ``robustIterations``
# bisquare reweightings against the median |residual| (taken at
# sortedResiduals[n/2], not an interpolated percentile). The reference
# returns a VectorFunction whose list is the smoothed values and whose
# function is the natural spline OVER the smoothed values — so the result
# here is simply a spline :class:`Model` with ys = smoothed, and
# predict/derivative/integrate compose for free.


def _let1(value: Column, fn) -> Column:
    """Expression-level let: bind ``value`` once as a higher-order-function
    lambda variable (a single-element transform) so ``fn`` can reference it
    many times WITHOUT duplicating its tree — Column expressions are trees,
    so a big subexpression referenced k times is otherwise copied k times
    and nested reuse grows multiplicatively (the loess model references its
    smoothing pass ~10×; inlined, that OOMs the analyzer)."""
    return F.element_at(F.transform(F.array(value), fn), 1)


def _loess_windows(xs: Column, bw: Column) -> Column:
    """0-based left edges L_i of each point's bandwidth window
    (LoessInterpolator.updateBandwidthInterval: advance one step when the
    next right point is closer than the current left)."""
    n = F.size(xs)

    def advance(acc, i):
        L = F.element_at(acc, -1)
        adv = F.when(
            (L + bw < n)
            & ((_at(xs, L + bw) - _at(xs, i)) < (_at(xs, i) - _at(xs, L))),
            1,
        ).otherwise(0)
        return F.concat(acc, F.array(L + adv))

    return F.aggregate(F.sequence(F.lit(1), n - 1), F.array(F.lit(0)), advance)


def _loess_fit(xs: Column, ys: Column, Ls: Column, bw: Column, rw: Column) -> Column:
    """One smoothing pass with robustness weights ``rw``: the commons
    tricube-weighted local linear regression at every point."""
    n = F.size(xs)

    def fit_point(i):
        x = _at(xs, i)
        L = F.element_at(Ls, (i + 1).cast("int"))
        R = L + bw - 1
        edge = F.when((x - _at(xs, L)) > (_at(xs, R) - x), L).otherwise(R)
        denom = F.abs(F.lit(1.0) / (_at(xs, edge) - x))
        zero5 = F.struct(
            F.lit(0.0).alias("w"),
            F.lit(0.0).alias("sx"),
            F.lit(0.0).alias("sxx"),
            F.lit(0.0).alias("sy"),
            F.lit(0.0).alias("sxy"),
        )

        def add(s, k):
            xk, yk = _at(xs, k), _at(ys, k)
            t = F.abs(x - xk) * denom
            tri = F.when(t >= 1, F.lit(0.0)).otherwise(
                F.pow(F.lit(1.0) - t * t * t, F.lit(3.0))
            )
            w = tri * F.element_at(rw, (k + 1).cast("int"))
            return F.struct(
                (s["w"] + w).alias("w"),
                (s["sx"] + xk * w).alias("sx"),
                (s["sxx"] + xk * xk * w).alias("sxx"),
                (s["sy"] + yk * w).alias("sy"),
                (s["sxy"] + yk * xk * w).alias("sxy"),
            )

        s = F.aggregate(F.sequence(L, R), zero5, add)
        mx, my = s["sx"] / s["w"], s["sy"] / s["w"]
        mxx, mxy = s["sxx"] / s["w"], s["sxy"] / s["w"]
        beta = F.when(
            F.sqrt(F.abs(mxx - mx * mx)) < 1e-12, F.lit(0.0)
        ).otherwise((mxy - mx * my) / (mxx - mx * mx))
        return beta * x + (my - beta * mx)

    return F.transform(F.sequence(F.lit(0), n - 1), fit_point)


def _loess(
    a: Column,
    *b: Column,
    bandwidth: Column | None = None,
    robustIterations: Column | None = None,
) -> Model:
    xs, ys = _interp_xy(a, b)
    n = F.size(xs)
    bwf = F.lit(0.25) if bandwidth is None else bandwidth.cast("double")
    bw = F.floor(bwf * n.cast("double")).cast("int")
    # robustIterations is PLAN-TIME: the reweighting loop must unroll flat
    # (each pass bound with _let1, fits as SIBLINGS) — the runtime-aggregate
    # pattern used by kmeans would nest one fit's lambda tree inside
    # another's step, and analyzer cost explodes with HOF nesting depth
    if robustIterations is None:
        iters = 2
    else:
        t = _raw_token(robustIterations) or str(robustIterations)
        try:
            iters = int(t)
        except ValueError:
            raise ValueError("loess robustIterations must be a literal integer")
    # bind the window-edge array once — embedded inline it re-enters every
    # fit pass and triples the analyzer's work
    return Model(
        _let1(
            _loess_windows(xs, bw),
            lambda Ls: _loess_body(xs, ys, Ls, bw, iters, n),
        ),
        "spline",
    )


def _loess_body(
    xs: Column, ys: Column, Ls: Column, bw: Column, iters: int, n: Column
) -> Column:
    def reweight(rw):
        fit = _loess_fit(xs, ys, Ls, bw, rw)
        resid = F.zip_with(ys, fit, lambda y, f: F.abs(y - f))

        def with_med(rs, med, rw):
            new_rw = F.transform(
                rs,
                lambda r: F.when(r / (6 * med) >= 1, F.lit(0.0)).otherwise(
                    F.pow(F.lit(1.0) - (r / (6 * med)) * (r / (6 * med)), F.lit(2.0))
                ),
            )
            # commons breaks out when the median residual is 0 — keeping rw
            # makes the remaining passes no-ops, same result
            return F.when(med == 0, rw).otherwise(new_rw)

        return _let1(
            resid,
            lambda rs: _let1(
                F.element_at(
                    F.array_sort(rs), (F.floor(n.cast("double") / 2) + 1).cast("int")
                ),
                lambda med: with_med(rs, med, rw),
            ),
        )

    def chain(rw, remaining):
        if remaining == 0:
            sm_n = F.when(n <= 2, ys).otherwise(_loess_fit(xs, ys, Ls, bw, rw))
            # the spline-model construction references the smoothed series
            # ~10× (ys, vals, and the Thomas sweep) — bind it once
            return _let1(
                sm_n, lambda sm: _model_struct(xs, sm, _natural_c(xs, sm), sm)
            )
        return _let1(reweight(rw), lambda r2: chain(r2, remaining - 1))

    return chain(F.transform(xs, lambda _: F.lit(1.0)), iters)


EVALUATORS.update({"loess": _loess})


def _top_features(m, k: Column) -> Column:
    """TopFeaturesEvaluator: per row, the column labels of the k largest
    values, largest first (value ties broken toward the lower column index;
    the reference's TreeSet collapses exactly-equal values — a documented
    difference on degenerate ties)."""
    if not isinstance(m, LabeledMatrix):
        raise ValueError(
            "topFeatures() needs a matrix with column labels "
            "(termVectors or setColumnLabels)"
        )
    mat, cl = m.col["m"], m.col["cl"]

    def row_top(row):
        scored = F.zip_with(
            row,
            F.sequence(F.lit(1), F.size(row)),
            lambda v, i: F.struct((-v).alias("nv"), i.alias("i")),
        )
        sel = F.slice(F.array_sort(scored), 1, k.cast("int"))
        return F.transform(sel, lambda s: F.element_at(cl, s["i"]))

    return F.transform(mat, row_top)


_top_features._plan_aware = True

EVALUATORS.update({"topFeatures": _top_features})
