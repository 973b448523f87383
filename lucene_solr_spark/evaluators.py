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

Scope (documented): per-tuple evaluators only — 238 names (+ the
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
Round-4 batches 6-7 close the registry: deterministic sampling
(``sample``/``monteCarlo``/``markovChain``/
``multiVariateNormalDistribution`` — a Park–Miller LCG + inverse-CDF per
family, documented deviation from commons' Well19937c; ``uuid`` stays
random like the reference) and the curve-fit tranche (``harmonicFit``/
``harmfit``/``gaussfit`` = the commons ParameterGuesser + 5 fixed
Gauss-Newton steps, ``bicubicSpline``, ``projectToBorder``,
``featureSelect``, ``getAttribute(s)``). With the stream-context bridges
in ``streaming_expr`` (memset/pivot/latlonVectors/plot/zplot/
parseCSV/parseTSV/recNum), EVERY name registered in ``Lang.java:116-330``
now compiles and runs.
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
import zlib

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
    # each parse_eval entry gets its own salt base (a running counter):
    # sibling expressions in one head — zplot(x=sample(…), y=sample(…)) —
    # parse separately and must draw INDEPENDENT streams; the counter is
    # deterministic for a given program's parse order
    _SAMPLE_STATE["entry"] = (_SAMPLE_STATE.get("entry", 0) + 1) & 0xFFFF
    _sample_entry(_SAMPLE_STATE["entry"])
    s = text.strip()
    if s.startswith("monteCarlo(") and s.endswith(")"):
        return parse_monte_carlo(s, names)
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
    _sample_entry(zlib.crc32(name.encode()) & 0xFFFF)
    s = text.strip()
    if s.startswith("monteCarlo(") and s.endswith(")"):
        return parse_monte_carlo(s, names or {})
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
# every engine deterministically. (Sampling over these structs landed in
# batch 6 below — the deterministic LCG draws; kmeans' array form in the
# batch-3 clustering tranche.)

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


def _predict(mod, v: Column = None, *more: Column) -> Column:
    """PredictEvaluator: models dispatch on the plan-time marker
    (interpolation / knnRegress / olsRegress / curve fits / bicubic,
    defined below); a plain struct is the ``regress`` result
    (slope/intercept). The bicubic form takes TWO coordinates."""
    if type(mod).__name__ == "BicubicModel":
        if v is None or not more:
            raise ValueError("predict(bicubicSpline, x, y) takes two coordinates")
        return _bicubic_eval(mod, v, more[0])
    if more:
        raise ValueError("predict() takes one value (two only for bicubicSpline)")
    if type(mod).__name__ == "FitModel":
        return _fit_f(mod.kind, mod.col["p"], v)
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
    (``has_attrs`` marks a stream-bridge struct that additionally carries
    an ``attrs`` map — ``termVectors`` docFreqs — for ``getAttribute``);
    (m, rl, cl); label-unaware consumers see the plain matrix."""

    def __init__(self, col: Column, has_attrs: bool = False):
        super().__init__(col)
        self.has_attrs = has_attrs

    def value(self) -> Column:
        return self.col["m"]

    def rebind(self, col: Column) -> "LabeledMatrix":
        return LabeledMatrix(col, self.has_attrs)


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
# --------------------------------------------------------------------------
# round 4 batch 6: the sampling tranche — ``sample`` / ``monteCarlo`` /
# ``markovChain`` / ``multiVariateNormalDistribution`` / ``uuid``
# (``SampleEvaluator.java``, ``MonteCarloEvaluator.java``,
# ``MarkovChainEvaluator.java``,
# ``MultiVariateNormalDistributionEvaluator.java``, ``UuidEvaluator.java``).
#
# The reference samples from commons-math's Well19937c RNG. This engine's
# draws are DETERMINISTIC by design (documented deviation): a Park–Miller
# minimal-standard LCG seeded per (call-site salt, monteCarlo iteration i,
# draw index j, sub-trial t) feeds inverse-CDF transforms per distribution
# family — pure integer + closed-form double arithmetic, so a SQL oracle
# (or the pure-Python mirror in tests/test_sampling_evaluators.py) can
# replay every draw bit-for-bit, and the whole expression stays one
# Catalyst Column. Salts: the call-site counter resets at each top-level
# parse entry and each let() binding mixes its NAME into the base.
# Reparse-stability holds for let() BINDINGS only (the name's crc32 salts
# the stream): re-parsing `let(a=sample(…), …)` reproduces a's draws.
# Top-level parse_eval entries deliberately increment a session counter —
# sibling expressions in one head (zplot(x=sample(…), y=sample(…))) must
# draw INDEPENDENT streams — so two parse_eval calls on the identical
# top-level text draw different streams; determinism there is per
# program-parse-order, not per expression text.

_PM_M = 2147483647  # 2^31 − 1, Park–Miller modulus
_PM_A = 16807

_SAMPLE_STATE: dict = {"base": 0, "ctr": 0, "idx": None}


def _sample_entry(base: int) -> None:
    """Reset the call-site salt counter at a top-level parse entry —
    ``base`` mixes the binding name (crc32 & 0xffff) so each let() binding
    draws an independent stream."""
    _SAMPLE_STATE["base"] = base
    _SAMPLE_STATE["ctr"] = 0


def _next_salt() -> int:
    s = _SAMPLE_STATE["base"] * 131 + _SAMPLE_STATE["ctr"]
    _SAMPLE_STATE["ctr"] += 1
    return s


def _seq0(n: Column) -> Column:
    """0..n−1, EMPTY for n ≤ 0 — ``sequence()`` DESCENDS when start > stop
    ([0, −1] for n = 0), so every draw-count range needs this guard."""
    nc = n.cast("int")
    return F.filter(
        F.sequence(F.lit(0), F.greatest(nc - 1, F.lit(0))), lambda j: j <= nc - 1
    )


def _seq1(n: Column) -> Column:
    """1..n, empty for n ≤ 0 (same descending-sequence guard)."""
    nc = n.cast("int")
    return F.filter(
        F.sequence(F.lit(1), F.greatest(nc, F.lit(1))), lambda j: j <= nc
    )


def _u_draw(salt: int, j, t=None) -> Column:
    """One uniform in (0,1): seed = (salt, monteCarlo-iteration, j, t)
    mixed with fixed odd multipliers, 3 LCG warmup steps. All terms stay
    far below 2^63 (salt < 2^24 → salt·1000003 < 2^44)."""
    j = F.lit(j) if isinstance(j, int) else j
    acc = F.lit(salt * 1000003 + 12345).cast("bigint")
    idx = _SAMPLE_STATE["idx"]
    if idx is not None:
        acc = acc + idx.cast("bigint") * 7919
    acc = acc + j.cast("bigint") * 104729
    if t is not None:
        t = F.lit(t) if isinstance(t, int) else t
        acc = acc + t.cast("bigint") * 65537
    s = acc % (_PM_M - 1) + 1
    for _ in range(3):
        s = (s * _PM_A) % _PM_M
    return s.cast("double") / F.lit(float(_PM_M))


# Acklam's inverse normal CDF (|rel err| < 1.15e-9) — the deterministic
# quantile the engine pairs with the LCG uniforms; the Python mirror in the
# tests carries the same coefficients.
_INA = [-3.969683028665376e+01, 2.209460984245205e+02, -2.759285104469687e+02,
        1.383577518672690e+02, -3.066479806614716e+01, 2.506628277459239e+00]
_INB = [-5.447609879822406e+01, 1.615858368580409e+02, -1.556989798598866e+02,
        6.680131188771972e+01, -1.328068155288572e+01]
_INC = [-7.784894002430293e-03, -3.223964580411365e-01, -2.400758277161838e+00,
        -2.549732539343734e+00, 4.374664141464968e+00, 2.938163982698783e+00]
_IND = [7.784695709041462e-03, 3.224671290700398e-01, 2.445134137142996e+00,
        3.754408661907416e+00]


def _horner(cs, q):
    out = F.lit(cs[0])
    for c in cs[1:]:
        out = out * q + c
    return out


def _inv_norm_col(p: Column) -> Column:
    plow = 0.02425

    def tail_ratio(q):
        return _horner(_INC, q) / (_horner(_IND, q) * q + 1)

    ql = F.sqrt(F.lit(-2.0) * F.log(p))
    qh = F.sqrt(F.lit(-2.0) * F.log(1 - p))
    q = p - 0.5
    r = q * q
    central = _horner(_INA, r) * q / (_horner(_INB, r) * r + 1)
    return (
        F.when(p < plow, tail_ratio(ql))
        .when(p > 1 - plow, -tail_ratio(qh))
        .otherwise(central)
    )


def _wh_gamma(shape: Column, z: Column) -> Column:
    """Wilson–Hilferty gamma quantile approximation (documented: the
    reference's commons sampler is RNG-exact; this closed form keeps the
    draw a pure expression)."""
    t = F.lit(1.0) - 1 / (9 * shape) + z * F.sqrt(1 / (9 * shape))
    return F.greatest(shape * t * t * t, F.lit(0.0))


def _categorical(row: Column, u0: Column, d: Column) -> Column:
    """Smallest 0-based index whose cumulative probability ≥ u0 (inverse
    CDF over one weight row); falls back to the last index."""
    res = F.aggregate(
        F.sequence(F.lit(1), d),
        F.struct(F.lit(0.0).alias("c"), F.lit(-1).alias("pick")),
        lambda acc, t: F.when(acc["pick"] >= 0, acc).otherwise(
            F.when(
                acc["c"] + F.element_at(row, t.cast("int")) >= u0,
                F.struct(
                    (acc["c"] + F.element_at(row, t.cast("int"))).alias("c"),
                    (t - 1).cast("int").alias("pick"),
                ),
            ).otherwise(
                F.struct(
                    (acc["c"] + F.element_at(row, t.cast("int"))).alias("c"),
                    F.lit(-1).alias("pick"),
                )
            )
        ),
    )
    return F.when(res["pick"] >= 0, res["pick"]).otherwise((d - 1).cast("int"))


def _draw_scalar(dist: Column, salt: int, j) -> Column:
    """One draw from a value-typed distribution struct (d = tag, p =
    params) — a When-chain over every family's inverse CDF."""
    d, p = dist["d"], dist["p"]
    u0 = _u_draw(salt, j)
    z = _inv_norm_col(u0)

    def P(k):
        return F.element_at(p, k)

    tri_f = (P(2) - P(1)) / (P(3) - P(1))
    triangular = F.when(
        u0 < tri_f, P(1) + F.sqrt(u0 * (P(3) - P(1)) * (P(2) - P(1)))
    ).otherwise(P(3) - F.sqrt((1 - u0) * (P(3) - P(1)) * (P(3) - P(2))))

    binom = F.aggregate(
        _seq1(P(1)),
        F.lit(0.0),
        lambda acc, t: acc + F.when(_u_draw(salt, j, t=t) < P(2), 1.0).otherwise(0.0),
    )

    lam = P(1)
    kmax = F.ceil(lam + F.lit(12.0) * F.sqrt(lam) + 30).cast("int")
    p0 = F.exp(-lam)
    pois_res = F.aggregate(
        F.sequence(F.lit(1), kmax),
        F.struct(
            p0.alias("cum"),
            p0.alias("term"),
            F.when(p0 >= u0, 0).otherwise(-1).alias("pick"),
        ),
        lambda acc, r: F.when(acc["pick"] >= 0, acc).otherwise(
            F.struct(
                (acc["cum"] + acc["term"] * lam / r).alias("cum"),
                (acc["term"] * lam / r).alias("term"),
                F.when(
                    acc["cum"] + acc["term"] * lam / r >= u0, r.cast("int")
                ).otherwise(-1).alias("pick"),
            )
        ),
    )
    poisson = (
        F.when(pois_res["pick"] >= 0, pois_res["pick"]).otherwise(kmax).cast("double")
    )

    nz = P(1).cast("int")
    zH = F.aggregate(
        _seq1(nz),
        F.lit(0.0),
        lambda acc, r: acc + F.pow(r.cast("double"), -P(2)),
    )
    zres = F.aggregate(
        _seq1(nz),
        F.struct(F.lit(0.0).alias("c"), F.lit(-1).alias("pick")),
        lambda acc, r: F.when(acc["pick"] >= 0, acc).otherwise(
            F.when(
                acc["c"] + F.pow(r.cast("double"), -P(2)) / zH >= u0,
                F.struct(
                    (acc["c"] + F.pow(r.cast("double"), -P(2)) / zH).alias("c"),
                    r.cast("int").alias("pick"),
                ),
            ).otherwise(
                F.struct(
                    (acc["c"] + F.pow(r.cast("double"), -P(2)) / zH).alias("c"),
                    F.lit(-1).alias("pick"),
                )
            )
        ),
    )
    zipf = F.when(zres["pick"] >= 0, zres["pick"]).otherwise(nz).cast("double")

    beta = _wh_gamma(P(1), _inv_norm_col(_u_draw(salt, j, t=1)))
    betb = _wh_gamma(P(2), _inv_norm_col(_u_draw(salt, j, t=2)))

    return (
        F.when(d == "normal", P(1) + P(2) * z)
        .when(d == "lognormal", F.exp(P(1) + P(2) * z))
        .when(d == "uniform", P(1) + u0 * (P(2) - P(1)))
        .when(d == "uniformint", P(1) + F.floor(u0 * (P(2) - P(1) + 1)))
        .when(d == "triangular", triangular)
        .when(d == "weibull", P(2) * F.pow(-F.log(1 - u0), 1 / P(1)))
        .when(d == "constant", P(1))
        .when(d == "binomial", binom)
        .when(d == "poisson", poisson)
        .when(d == "geometric", F.floor(F.log(1 - u0) / F.log(1 - P(1))))
        .when(d == "zipf", zipf)
        .when(d == "gamma", _wh_gamma(P(1), z) * P(2))
        .when(d == "beta", beta / (beta + betb))
        .when(
            d == "empirical",
            F.element_at(
                F.array_sort(p), (F.floor(u0 * F.size(p)) + 1).cast("int")
            ),
        )
        .when(
            d == "enumerated",
            F.element_at(p, (F.floor(u0 * F.size(p)) + 1).cast("int")),
        )
        .otherwise(F.lit(float("nan")))
    ).cast("double")


class MarkovModel(PlanValue):
    """markovChain(): struct (m = transition rows, s0 = start state). The
    reference seeds a RANDOM start when none is given; here it defaults to
    state 0 (deterministic, documented)."""

    def rebind(self, col: Column) -> "MarkovModel":
        return MarkovModel(col)


def _markov_chain(mat: Column, *start: Column) -> MarkovModel:
    s0 = start[0].cast("int") if start else F.lit(0)
    return MarkovModel(F.struct(mat.alias("m"), s0.alias("s0")))


def _markov_sample(mm: MarkovModel, salt: int, n: Column) -> Column:
    mat, s0 = mm.col["m"], mm.col["s0"]
    d = F.size(mat)
    square = F.assert_true(
        d == F.size(F.element_at(mat, 1)),
        F.lit("markovChain must be initialized with a square matrix."),
    )
    res = F.aggregate(
        _seq0(n),
        F.struct(
            s0.alias("s"), F.expr("cast(array() as array<int>)").alias("out")
        ),
        lambda acc, k: F.element_at(
            F.transform(
                F.array(
                    _categorical(
                        F.element_at(mat, (acc["s"] + 1).cast("int")),
                        _u_draw(salt, k),
                        d,
                    )
                ),
                lambda pick: F.struct(
                    pick.alias("s"), F.concat(acc["out"], F.array(pick)).alias("out")
                ),
            ),
            1,
        ),
    )
    return F.when(square.isNull(), res["out"])


class MvnModel(PlanValue):
    """multiVariateNormalDistribution(): struct (mu, L = Cholesky lower
    rows, row r holding r+1 entries)."""

    def rebind(self, col: Column) -> "MvnModel":
        return MvnModel(col)


def _cholesky(A: Column) -> Column:
    """Lower-triangular Cholesky of a small SPD matrix — rows built
    sequentially by a pair of array-accumulator sweeps (the dimension here
    is the distribution's, single digits)."""
    d = F.size(A)

    def build(Ls, jj):
        def cell(row, kk):
            k1 = (kk + 1).cast("int")
            a_jk = F.element_at(F.element_at(A, (jj + 1).cast("int")), k1)
            off = F.aggregate(
                F.zip_with(
                    F.slice(row, 1, kk.cast("int")),
                    F.slice(F.element_at(Ls, k1), 1, kk.cast("int")),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda s, v: s + v,
            )
            diag = F.aggregate(row, F.lit(0.0), lambda s, v: s + v * v)
            v = F.when(kk < jj, (a_jk - off) / F.element_at(F.element_at(Ls, k1), k1)).otherwise(
                F.sqrt(a_jk - diag)
            )
            return F.concat(row, F.array(v))

        row = F.aggregate(
            F.sequence(F.lit(0), jj),
            F.expr("cast(array() as array<double>)"),
            cell,
        )
        return F.concat(Ls, F.array(row))

    return F.aggregate(
        F.sequence(F.lit(0), d - 1),
        F.expr("cast(array() as array<array<double>>)"),
        build,
    )


def _mvnormal(mu: Column, cov: Column) -> MvnModel:
    return MvnModel(
        F.struct(mu.cast("array<double>").alias("mu"), _cholesky(cov).alias("L"))
    )


def _mvn_draw(mm: MvnModel, salt: int, j) -> Column:
    mu, L = mm.col["mu"], mm.col["L"]
    d = F.size(mu)
    z = F.transform(
        F.sequence(F.lit(1), d), lambda m: _inv_norm_col(_u_draw(salt, j, t=m))
    )
    return F.transform(
        F.sequence(F.lit(1), d),
        lambda r: F.element_at(mu, r.cast("int"))
        + F.aggregate(
            F.zip_with(
                F.element_at(L, r.cast("int")),
                F.slice(z, 1, r.cast("int")),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda s, v: s + v,
        ),
    )


def _sample(dist, *n):
    """SampleEvaluator: draw(s) from a distribution value, Markov chain, or
    multivariate normal. 1-arg → one draw; 2-arg → n draws (array; a Matrix
    for the multivariate case)."""
    salt = _next_salt()
    if isinstance(dist, MarkovModel):
        if not n:
            # the reference's no-size form ADVANCES stateful iterator state;
            # a Column is stateless — single draw = first step (documented)
            return F.element_at(_markov_sample(dist, salt, F.lit(1)), 1)
        return _markov_sample(dist, salt, n[0])
    if isinstance(dist, MvnModel):
        if not n:
            return _mvn_draw(dist, salt, F.lit(0))
        return F.transform(_seq0(n[0]), lambda j: _mvn_draw(dist, salt, j))
    dist = dist.value() if isinstance(dist, PlanValue) else dist
    if not n:
        return _draw_scalar(dist, salt, F.lit(0))
    return F.transform(_seq0(n[0]), lambda j: _draw_scalar(dist, salt, j))


_sample._plan_aware = True


_MC_BIND_RE = re.compile(r"\s*([A-Za-z_]\w*)\s*=(.*)$", re.S)


def _split_top(body: str) -> list[str]:
    out, depth, start = [], 0, 0
    for i, ch in enumerate(body):
        if ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif ch == "," and depth == 0:
            out.append(body[start:i])
            start = i + 1
    out.append(body[start:])
    return out


def parse_monte_carlo(text: str, names: dict | None) -> Column:
    """MonteCarloEvaluator: named params re-bind per iteration, then the
    function evaluates — iterations → one ``transform`` over the iteration
    sequence, with the iteration index threaded into every ``sample()``
    seed (the bindings and function are re-parsed INSIDE the transform
    lambda, which Catalyst invokes once with a symbolic index — one tree,
    n runtime evaluations). Supported at the top level of a binding /
    expression (the reference's usage shape)."""
    s = text.strip()
    body = s[len("monteCarlo("):-1]
    bindings: list[tuple[str, str]] = []
    rest: list[str] = []
    for part in _split_top(body):
        m = _MC_BIND_RE.match(part)
        if m and "(" not in part[: m.start(2)]:
            bindings.append((m.group(1), m.group(2)))
        else:
            rest.append(part)
    if len(rest) != 2:
        raise ValueError(
            "monteCarlo() takes named bindings, one function and an "
            f"iteration count — got {len(rest)} positional parameters"
        )
    func_text, it_text = rest[0].strip(), rest[1].strip()
    iters = int(it_text)
    if iters <= 0:
        return F.expr("cast(array() as array<double>)")
    base_ctr = _SAMPLE_STATE["ctr"]

    def body_fn(i):
        saved = dict(_SAMPLE_STATE)
        _SAMPLE_STATE["idx"] = i
        _SAMPLE_STATE["ctr"] = base_ctr
        try:
            local = dict(names or {})
            for nm, ex in bindings:
                local[nm] = parse_func(ex.strip(), registry=_registry(), names=local)
            r = parse_func(func_text, registry=_registry(), names=local)
            return r.value() if isinstance(r, PlanValue) else r
        finally:
            _SAMPLE_STATE.clear()
            _SAMPLE_STATE.update(saved)

    return F.transform(F.sequence(F.lit(0), F.lit(iters - 1)), body_fn)


EVALUATORS.update(
    {
        "sample": _sample,
        "markovChain": _markov_chain,
        "multiVariateNormalDistribution": _mvnormal,
        # UuidEvaluator: random per tuple, faithful to the reference (the
        # one non-deterministic name — excluded from value-pinned oracles)
        "uuid": lambda: F.expr("uuid()"),
    }
)
# --------------------------------------------------------------------------
# round 4 batch 7: the curve-fit tranche — ``harmonicFit``/``harmfit`` (+
# ``getAmplitude``/``getAngularFrequency``/``getPhase``), ``gaussfit``,
# ``bicubicSpline``, ``projectToBorder``, ``featureSelect``,
# ``getAttribute``/``getAttributes`` (``HarmonicFitEvaluator.java``,
# ``GaussFitEvaluator.java``, ``BicubicSplineEvaluator.java``,
# ``ProjectToBorderEvaluator.java``, ``FeatureSelectEvaluator.java``,
# ``GetAttributeEvaluator.java``). The commons fitters run
# Levenberg-Marquardt to convergence from a closed-form ParameterGuesser;
# the engine runs the SAME guesser then a fixed 5-step Gauss-Newton
# refinement — deterministic, one Catalyst expression, pinned against a
# pure-Python mirror in tests/test_fit_evaluators.py.


class FitModel(PlanValue):
    """Parametric fit: struct (p = the 3 parameters, xs, vals). kind
    ``harmonic`` → a·cos(ωx+φ) (commons HarmonicOscillator), ``gaussian``
    → n·exp(−(x−m)²/2s²) (commons Gaussian)."""

    def __init__(self, col: Column, kind: str):
        super().__init__(col)
        self.kind = kind

    def rebind(self, col: Column) -> "FitModel":
        return FitModel(col, self.kind)

    def value(self) -> Column:
        return self.col["vals"]


def _fit_f(kind: str, p: Column, x: Column) -> Column:
    a, b, c = F.element_at(p, 1), F.element_at(p, 2), F.element_at(p, 3)
    if kind == "harmonic":
        return a * F.cos(b * x + c)
    return a * F.exp(-((x - b) * (x - b)) / (2 * c * c))


def _solve3(N: list, b: list) -> list:
    """Cramer solve of symmetric 3×3 normal equations; a near-singular
    system returns zero deltas (the GN step degrades to a no-op, mirroring
    the test oracle's guard)."""
    det = _det(N)
    ok = F.abs(det) > 1e-250
    out = []
    for j in range(3):
        Aj = [[(b[i] if k == j else N[i][k]) for k in range(3)] for i in range(3)]
        out.append(F.when(ok, _det(Aj) / det).otherwise(F.lit(0.0)))
    return out


def _gn_step(kind: str, xs: Column, ys: Column, g: Column) -> Column:
    """One Gauss-Newton step over the points: accumulate JᵀJ (6 sums) and
    Jᵀr, Cramer-solve, add the delta."""
    n = F.size(xs)
    a, b, c = F.element_at(g, 1), F.element_at(g, 2), F.element_at(g, 3)
    zero = F.struct(
        *[F.lit(0.0).alias(k) for k in
          ("n11", "n12", "n13", "n22", "n23", "n33", "b1", "b2", "b3")]
    )

    def step(acc, i):
        x, y = _at(xs, i), _at(ys, i)
        if kind == "harmonic":
            cv = F.cos(b * x + c)
            sv = F.sin(b * x + c)
            f = a * cv
            g1, g2, g3 = cv, -a * x * sv, -a * sv
        else:
            f = a * F.exp(-((x - b) * (x - b)) / (2 * c * c))
            g1 = f / a
            g2 = f * (x - b) / (c * c)
            g3 = f * (x - b) * (x - b) / (c * c * c)
        r = y - f
        return F.struct(
            (acc["n11"] + g1 * g1).alias("n11"),
            (acc["n12"] + g1 * g2).alias("n12"),
            (acc["n13"] + g1 * g3).alias("n13"),
            (acc["n22"] + g2 * g2).alias("n22"),
            (acc["n23"] + g2 * g3).alias("n23"),
            (acc["n33"] + g3 * g3).alias("n33"),
            (acc["b1"] + g1 * r).alias("b1"),
            (acc["b2"] + g2 * r).alias("b2"),
            (acc["b3"] + g3 * r).alias("b3"),
        )

    S = F.aggregate(F.sequence(F.lit(0), n - 1), zero, step)
    return _let1(
        S,
        lambda s: _let1(
            F.array(
                *_solve3(
                    [
                        [s["n11"], s["n12"], s["n13"]],
                        [s["n12"], s["n22"], s["n23"]],
                        [s["n13"], s["n23"], s["n33"]],
                    ],
                    [s["b1"], s["b2"], s["b3"]],
                )
            ),
            lambda d: F.array(
                a + F.element_at(d, 1), b + F.element_at(d, 2), c + F.element_at(d, 3)
            ),
        ),
    )


def _gn_chain(kind: str, xs: Column, ys: Column, g0: Column, k: int) -> Column:
    if k == 0:
        return g0
    return _let1(_gn_step(kind, xs, ys, g0), lambda g: _gn_chain(kind, xs, ys, g, k - 1))


def _harm_guess(xs: Column, ys: Column) -> Column:
    """commons HarmonicCurveFitter.ParameterGuesser — the integral-equation
    regression for (a, ω), then the derivative regression for φ; the
    range-based fallback when the integral system is indefinite."""
    n = F.size(xs)
    zero = F.struct(
        *[F.lit(0.0).alias(k) for k in ("sx2", "sy2", "sxy", "sxz", "syz", "f2", "fp2")]
    )

    def acc_step(acc, i):
        px, py = _at(xs, i - 1), _at(ys, i - 1)
        cx, cy = _at(xs, i), _at(ys, i)
        dx, dy = cx - px, cy - py
        f2 = acc["f2"] + dx * (py * py + py * cy + cy * cy) / 3
        fp2 = acc["fp2"] + dy * dy / dx
        z = cx - _at(xs, F.lit(0))
        return F.struct(
            (acc["sx2"] + z * z).alias("sx2"),
            (acc["sy2"] + f2 * f2).alias("sy2"),
            (acc["sxy"] + z * f2).alias("sxy"),
            (acc["sxz"] + z * fp2).alias("sxz"),
            (acc["syz"] + f2 * fp2).alias("syz"),
            f2.alias("f2"),
            fp2.alias("fp2"),
        )

    def aw_of(s):
        c1 = s["sy2"] * s["sxz"] - s["sxy"] * s["syz"]
        c2 = s["sxy"] * s["sxz"] - s["sx2"] * s["syz"]
        c3 = s["sx2"] * s["sy2"] - s["sxy"] * s["sxy"]
        r12 = F.when(c2 != 0, c1 / c2)
        r23 = F.when(c3 != 0, c2 / c3)
        ok = r12.isNotNull() & r23.isNotNull() & (r12 >= 0) & (r23 >= 0)
        a0 = F.when(ok, F.sqrt(r12)).otherwise(
            0.5 * (F.array_max(ys) - F.array_min(ys))
        )
        w0 = F.when(ok, F.sqrt(r23)).otherwise(
            F.lit(2.0 * _math.pi) / (F.element_at(xs, -1) - F.element_at(xs, 1))
        )
        return F.array(a0, w0)

    def phi_of(aw):
        w = F.element_at(aw, 2)
        fcfs = F.aggregate(
            F.sequence(F.lit(1), n - 1),
            F.struct(F.lit(0.0).alias("fc"), F.lit(0.0).alias("fs")),
            lambda acc, i: F.element_at(
                F.transform(
                    F.array(
                        F.struct(
                            _at(xs, i).alias("cx"),
                            _at(ys, i).alias("cy"),
                            (
                                (_at(ys, i) - _at(ys, i - 1))
                                / (_at(xs, i) - _at(xs, i - 1))
                            ).alias("yp"),
                        )
                    ),
                    lambda t: F.struct(
                        (
                            acc["fc"]
                            + w * t["cy"] * F.cos(w * t["cx"])
                            - t["yp"] * F.sin(w * t["cx"])
                        ).alias("fc"),
                        (
                            acc["fs"]
                            + w * t["cy"] * F.sin(w * t["cx"])
                            + t["yp"] * F.cos(w * t["cx"])
                        ).alias("fs"),
                    ),
                ),
                1,
            ),
        )
        return F.array(
            F.element_at(aw, 1), w, F.atan2(-fcfs["fs"], fcfs["fc"])
        )

    sums = F.aggregate(F.sequence(F.lit(1), n - 1), zero, acc_step)
    return _let1(sums, lambda s: _let1(aw_of(s), phi_of))


def _fit_struct(kind: str, xs: Column, ys: Column, g0: Column) -> Column:
    # bind the guess before the GN chain — each step references its input
    # params ~a dozen times, and the guess carries two aggregates
    params = _let1(g0, lambda g: _gn_chain(kind, xs, ys, g, 5))
    return _let1(
        params,
        lambda p: F.struct(
            p.alias("p"),
            xs.alias("xs"),
            F.transform(xs, lambda x: _fit_f(kind, p, x)).alias("vals"),
        ),
    )


def _harmonic_fit(a: Column, *b: Column) -> FitModel:
    xs, ys = _interp_xy(a, b)
    return FitModel(
        _fit_struct("harmonic", xs, ys, _harm_guess(xs, ys)), "harmonic"
    )


def _gauss_guess(xs: Column, ys: Column) -> Column:
    """commons GaussianCurveFitter.ParameterGuesser — including the 3.6.1
    ``halfY = n + ((m − n) / 2)`` quirk (the MEAN mixed into the half-max
    level; GaussianCurveFitter.java basicGuess, shipped behavior)."""
    n = F.size(xs)
    imax = F.array_position(ys, F.array_max(ys)).cast("int")  # first max, 1-based
    n0 = F.array_max(ys)
    m0 = F.element_at(xs, imax)
    half = n0 + (m0 - n0) / 2

    def between(j):
        y1, y2 = F.element_at(ys, j), F.element_at(ys, j + 1)
        return (F.least(y1, y2) <= half) & (half <= F.greatest(y1, y2))

    def interp(j, p1, p2):
        x1, y1 = F.element_at(xs, p1), F.element_at(ys, p1)
        x2, y2 = F.element_at(xs, p2), F.element_at(ys, p2)
        return F.when(y2 == y1, x1).otherwise(x1 + (half - y1) * (x2 - x1) / (y2 - y1))

    lcand = F.filter(F.sequence(F.lit(1), F.greatest(imax - 1, F.lit(1))),
                     lambda j: (j <= imax - 1) & between(j))
    # guard like lcand: sequence() DESCENDS when start > stop, so a peak at
    # the last point would otherwise scan [n, n-1] and fake a right crossing
    rcand = F.filter(
        F.sequence(imax, F.greatest(n - 1, imax)),
        lambda j: (j <= n - 1) & between(j),
    )
    lj = F.when(F.size(lcand) > 0, F.element_at(lcand, -1))
    rj = F.when(F.size(rcand) > 0, F.element_at(rcand, 1))
    x1 = interp(lj, lj + 1, lj)
    x2 = interp(rj, rj, rj + 1)
    fwhm = F.when(
        lj.isNotNull() & rj.isNotNull(), x2 - x1
    ).otherwise(F.element_at(xs, -1) - F.element_at(xs, 1))
    s0 = fwhm / F.lit(2.0 * _math.sqrt(2.0 * _math.log(2.0)))
    return F.array(n0, m0, s0)


def _gauss_fit(a: Column, *b: Column) -> FitModel:
    # the guesser needs x-ascending points (commons sorts its observations)
    xs0, ys0 = _interp_xy(a, b)
    srt = F.array_sort(
        F.zip_with(xs0, ys0, lambda x, y: F.struct(x.alias("x"), y.alias("y")))
    )

    def of_sorted(s):
        xs = F.transform(s, lambda t: t["x"])
        ys = F.transform(s, lambda t: t["y"])
        return _fit_struct("gaussian", xs, ys, _gauss_guess(xs, ys))

    return FitModel(_let1(srt, of_sorted), "gaussian")


def _fit_param(idx: int, name: str):
    def get(mod):
        if not isinstance(mod, FitModel) or mod.kind != "harmonic":
            raise ValueError(f"{name}() expects a harmonicFit() result")
        return F.element_at(mod.col["p"], idx)

    get._plan_aware = True
    return get


class BicubicModel(PlanValue):
    """bicubicSpline(): struct (xs, ys, g) — commons
    PiecewiseBicubicSplineInterpolatingFunction role; predict(b, x, y)
    interpolates a natural spline across the 5-knot window in each axis
    (the commons evaluation scheme)."""

    def rebind(self, col: Column) -> "BicubicModel":
        return BicubicModel(col)


def _bicubic_spline(xs: Column, ys: Column, grid: Column) -> BicubicModel:
    return BicubicModel(
        F.struct(
            xs.cast("array<double>").alias("xs"),
            ys.cast("array<double>").alias("ys"),
            grid.alias("g"),
        )
    )


def _spline_at(x5: Column, y5: Column, v: Column) -> Column:
    # bind the spline struct once — _model_eval references xs/ys/m several
    # times and the _natural_c sweep would copy multiplicatively otherwise
    return _let1(
        _model_struct(x5, y5, _natural_c(x5, y5), y5),
        lambda s: _model_eval(Model(s, "spline"), v),
    )


def _win0(arr: Column, v: Column) -> Column:
    """0-based left edge of the 5-knot window around v (commons
    searchIndex with offset 2, clamped so the window fits)."""
    last_le = F.greatest(
        F.size(F.filter(arr, lambda e: e <= v)) - 1, F.lit(0)
    )
    return F.greatest(F.least(last_le - 2, F.size(arr) - 5), F.lit(0))


def _bicubic_eval(mod: BicubicModel, xv: Column, yv: Column) -> Column:
    xs, ys, g = mod.col["xs"], mod.col["ys"], mod.col["g"]

    def with_win(w):
        i0, j0 = w["i"], w["j"]
        zz = F.transform(
            F.sequence(F.lit(0), F.lit(4)),
            lambda ii: _spline_at(
                F.slice(ys, j0 + 1, 5),
                F.slice(F.element_at(g, (i0 + ii + 1).cast("int")), j0 + 1, 5),
                yv,
            ),
        )
        return _let1(zz, lambda z: _spline_at(F.slice(xs, i0 + 1, 5), z, xv))

    return _let1(
        F.struct(_win0(xs, xv).alias("i"), _win0(ys, yv).alias("j")), with_win
    )


def _project_to_border(hull, mat: Column) -> Column:
    """ProjectToBorderEvaluator: each row of the matrix projected to the
    nearest point on the hull boundary (closest point over every edge
    segment — the commons BoundaryProjection result for a convex region)."""
    if not isinstance(hull, HullModel):
        raise ValueError("projectToBorder() expects a convexHull() result")
    v = hull.col["v"]
    nv = F.size(v)

    def project_row(row):
        px, py = F.element_at(row, 1), F.element_at(row, 2)

        def edge_point(k):  # edge from vertex k to k % nv + 1 (closed ring)
            a = F.element_at(v, k.cast("int"))
            b2 = F.element_at(v, (k % nv + 1).cast("int"))
            ax, ay = F.element_at(a, 1), F.element_at(a, 2)
            bx, by = F.element_at(b2, 1), F.element_at(b2, 2)
            dx, dy = bx - ax, by - ay
            den = dx * dx + dy * dy
            t = F.when(
                den > 0, ((px - ax) * dx + (py - ay) * dy) / den
            ).otherwise(F.lit(0.0))
            tc = F.greatest(F.least(t, F.lit(1.0)), F.lit(0.0))
            qx, qy = ax + tc * dx, ay + tc * dy
            d2 = (px - qx) * (px - qx) + (py - qy) * (py - qy)
            return F.struct(d2.alias("d"), qx.alias("x"), qy.alias("y"))

        best = F.aggregate(
            F.filter(
                F.sequence(F.lit(2), F.greatest(nv, F.lit(2))), lambda k: k <= nv
            ),
            edge_point(F.lit(1)),
            lambda acc, k: F.element_at(
                F.transform(
                    F.array(edge_point(k)),
                    lambda cand: F.when(cand["d"] < acc["d"], cand).otherwise(acc),
                ),
                1,
            ),
        )
        return F.array(best["x"], best["y"])

    return F.transform(mat, project_row)


_project_to_border._plan_aware = True


def _feature_select(m, feats: Column) -> LabeledMatrix:
    """FeatureSelectEvaluator: keep the matrix columns whose labels are in
    the feature list — original column order preserved."""
    if not isinstance(m, LabeledMatrix):
        raise ValueError(
            "featureSelect() needs a matrix with column labels "
            "(termVectors or setColumnLabels)"
        )
    mat, rl, cl = m.col["m"], m.col["rl"], m.col["cl"]
    keep = F.filter(
        F.sequence(F.lit(1), F.size(cl)),
        lambda i: F.array_contains(feats, F.element_at(cl, i.cast("int"))),
    )
    return LabeledMatrix(
        F.struct(
            F.transform(
                mat,
                lambda row: F.transform(
                    keep, lambda i: F.element_at(row, i.cast("int"))
                ),
            ).alias("m"),
            rl.alias("rl"),
            F.transform(keep, lambda i: F.element_at(cl, i.cast("int"))).alias("cl"),
        )
    )


_feature_select._plan_aware = True


def _get_attribute(m, key) -> Column:
    """GetAttributeEvaluator: read one attribute a stream-bridge attached
    to a matrix (``termVectors`` attaches ``docFreqs``)."""
    if not isinstance(m, LabeledMatrix) or not m.has_attrs:
        raise ValueError("getAttribute() expects a matrix carrying attributes "
                         "(a termVectors() result)")
    k = _raw_token(key) or str(key)
    return F.element_at(m.col["attrs"], k.strip('"'))


_get_attribute._plan_aware = True


def _get_attributes(m) -> Column:
    if not isinstance(m, LabeledMatrix) or not m.has_attrs:
        raise ValueError("getAttributes() expects a matrix carrying attributes "
                         "(a termVectors() result)")
    return m.col["attrs"]


_get_attributes._plan_aware = True


EVALUATORS.update(
    {
        "harmonicFit": _harmonic_fit,
        "harmfit": _harmonic_fit,
        "gaussfit": _gauss_fit,
        "getAmplitude": _fit_param(1, "getAmplitude"),
        "getAngularFrequency": _fit_param(2, "getAngularFrequency"),
        "getPhase": _fit_param(3, "getPhase"),
        "bicubicSpline": _bicubic_spline,
        "projectToBorder": _project_to_border,
        "featureSelect": _feature_select,
        "getAttribute": _get_attribute,
        "getAttributes": _get_attributes,
    }
)
