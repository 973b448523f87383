"""Solr function queries — the ValueSourceParser surface as Spark Columns.

The reference registers ~100 named functions
(``solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:70-480``)
that parse expressions like ``recip(ms(NOW,mydate),3.16e-11,1,1)`` into
``ValueSource`` trees evaluated per document. Here each function maps to a
Catalyst ``Column`` expression (JVM-side, whole-stage-codegen — never a
Python UDF), and ``parse_func`` is a recursive-descent parser for the Solr
function-query syntax: nested calls, numeric literals, field references.

``FUNCTIONS[name]`` = callable(*Column) -> Column (68 names).
``AGG_FUNCTIONS[name]`` = the ``agg_*`` GROUP-aggregate names (11).
Relevance functions (termfreq/docfreq/norm/payload) live in ``textops`` —
they are literal columns of the engine's postings/stats tables (SURVEY
§2.10). The handful of names a pure-DataFrame registry cannot carry are
documented out below the registry with rationale.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, functions as F


def _scale(x, lo, hi):
    """scale(x,min,max) — min-max rescale over the column's range. Needs a
    window over the whole frame; expressed with unpartitioned min/max which
    Spark computes as a separate tiny aggregate (ValueSourceParser 'scale')."""
    from pyspark.sql.window import Window

    w = Window.partitionBy()
    cmin, cmax = F.min(x).over(w), F.max(x).over(w)
    return lo + (x - cmin) * (hi - lo) / F.when(cmax != cmin, cmax - cmin).otherwise(
        F.lit(1.0)
    )


_EARTH_RADIUS_KM = 6371.0087714  # GeoDistValueSourceParser / DistanceUtils


def _haversine(lat1, lon1, lat2, lon2):
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * (
        F.sin(dlon / 2) ** 2
    )
    return 2 * _EARTH_RADIUS_KM * F.asin(F.sqrt(a))


FUNCTIONS: dict = {
    # math (ValueSourceParser.java:70-180)
    "abs": F.abs,
    "add": lambda *c: sum(c[1:], c[0]),
    "sum": lambda *c: sum(c[1:], c[0]),
    "sub": lambda a, b: a - b,
    "mul": lambda *c: _prod(c),
    "product": lambda *c: _prod(c),
    "div": lambda a, b: a / b,
    "mod": lambda a, b: a % b,
    "pow": lambda a, b: a**b,
    "sqrt": F.sqrt,
    "cbrt": F.cbrt,
    "log": F.log10,   # Solr log() is base-10 (ValueSourceParser 'log')
    "ln": lambda c: F.log(c),
    "exp": F.exp,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
    "ceil": F.ceil,
    "floor": F.floor,
    "rint": F.rint,
    "signum": F.signum,
    "max": F.greatest,
    "min": F.least,
    # conditionals / comparison
    "if": lambda c, a, b: F.when(c.cast("boolean"), a).otherwise(b),
    "def": lambda a, b: F.coalesce(a, b),   # 'default' value source
    "exists": lambda a: a.isNotNull(),
    "not": lambda a: ~a.cast("boolean"),
    "and": lambda a, b: a.cast("boolean") & b.cast("boolean"),
    "or": lambda a, b: a.cast("boolean") | b.cast("boolean"),
    "xor": lambda a, b: a.cast("boolean") != b.cast("boolean"),
    "lt": lambda a, b: a < b,
    "lte": lambda a, b: a <= b,
    "gt": lambda a, b: a > b,
    "gte": lambda a, b: a >= b,
    "eq": lambda a, b: a == b,
    "map": lambda x, lo, hi, target: F.when((x >= lo) & (x <= hi), target).otherwise(x),
    # recip(x,m,a,b) = a/(m*x+b) — the age-boost staple
    "recip": lambda x, m, a, b: a / (m * x + b),
    "linear": lambda x, m, c: m * x + c,
    "scale": _scale,
    # dates: ms(a[,b]) — epoch millis / difference (DateValueSourceParser)
    "ms": lambda *c: (
        (c[0].cast("double") - c[1].cast("double")) * 1000.0
        if len(c) == 2
        else c[0].cast("double") * 1000.0
    ),
    # geo (GeoDistValueSourceParser): geodist/hsin in km, sqedist/dist
    "geodist": _haversine,
    "hsin": _haversine,
    "sqedist": lambda *c: _sqedist(c),
    "strdist": lambda a, b: 1.0
    - F.levenshtein(a, b)
    / F.greatest(F.length(a), F.length(b)).cast("double"),
    "field": lambda c: c,
    # dist(p, x1..xn, y1..yn) — Minkowski p-distance (DistanceUtils.vectorDistance;
    # p=0 → sparseness "distance" is not supported, loud error)
    "dist": lambda p, *c: _dist(p, c),
    "top": lambda c: c,  # TopValueSource — per-reader vs top-level is moot here
    "concat": lambda *c: F.concat(*c),
    "e": lambda: F.lit(math.e),
    "pi": lambda: F.lit(math.pi),
    # ord/rord (OrdFieldSource/ReverseOrdFieldSource) — global term ordinal
    # of the field value. Like scale(), needs a whole-frame window (Solr's
    # ord is index-global too); use on bounded frames only.
    "ord": lambda c: _ord(c, False),
    "rord": lambda c: _ord(c, True),
    # remaining deterministic scalar names (round 4): rad/deg/hypot/atan2
    # (DoubleParser/Double2Parser registrations), literal
    # (LiteralValueSource), vector (VectorValueSource), true/false
    # (BoolConstValueSource)
    "rad": F.radians,
    "deg": F.degrees,
    "hypot": F.hypot,
    "atan2": F.atan2,
    "literal": lambda s: F.lit(s),
    "vector": lambda *c: F.array(*[x.cast("double") for x in c]),
    "true": lambda: F.lit(True),
    "false": lambda: F.lit(False),
    # geohash(lat,lon) / ghhsin(radius,gh1,gh2) — see _geohash/_ghhsin
    "geohash": lambda lat, lon: _geohash(lat, lon),
    "ghhsin": lambda r, g1, g2: _ghhsin(r, g1, g2),
}

# Documented out (the names a pure-DataFrame registry cannot or should not
# carry): testfunc (test hook), threadid/sleep (side effects), currency
# (needs currency-field config), joindf (cross-core join — the engine's
# join surface is relational.join_query), cscore (collapse score context —
# relational.collapse_expand_*), childfield (block-join context —
# relational block-join ops), agg_multistat (internal multiplexer).
# query()/boost() ARE carried — they need a searcher, so they live behind
# parse_func_with_searcher below, not in this frame-only table. The agg_*
# aggregation names live in AGG_FUNCTIONS below: they are GROUP aggregates,
# not per-doc value sources, so they compose with groupBy/agg, not
# parse_func.

_B32 = "0123456789bcdefghjkmnpqrstuvwxyz"
_GH_CHARS = 12  # spatial4j GeohashUtils.MAX_PRECISION — what encodeLatLon emits
_GH_BITS = _GH_CHARS * 5 // 2  # 30 bits per axis


def _geohash(lat: Column, lon: Column) -> Column:
    """``geohash(lat,lon)`` (GeohashFunction.java:35 → spatial4j
    GeohashUtils.encodeLatLon, 12 chars): the standard base-32 geohash as a
    pure Catalyst expression. Both axes quantize to 30 bits, the classic
    bisection being exactly binary expansion; the 60 interleaved bits
    (even=lon, odd=lat, MSB first) group into twelve 5-bit base-32 chars.
    ~120 unrolled bit ops — all inside whole-stage codegen, no Python."""
    scale = float(1 << _GH_BITS)
    latq = F.least(
        F.floor((lat + 90.0) / 180.0 * scale).cast("long"),
        F.lit((1 << _GH_BITS) - 1),
    )
    lonq = F.least(
        F.floor((lon + 180.0) / 360.0 * scale).cast("long"),
        F.lit((1 << _GH_BITS) - 1),
    )
    chars = []
    for ci in range(_GH_CHARS):
        acc = None
        for bi in range(5):
            gpos = ci * 5 + bi  # global interleaved bit index, MSB first
            src = lonq if gpos % 2 == 0 else latq
            bit = F.shiftright(src, _GH_BITS - 1 - gpos // 2).bitwiseAND(F.lit(1))
            term = bit * (1 << (4 - bi))
            acc = term if acc is None else acc + term
        chars.append(F.lit(_B32).substr((acc + 1).cast("int"), F.lit(1)))
    return F.concat(*chars)


def _gh_decode(gh: Column) -> tuple[Column, Column]:
    """(lat, lon) cell center of a 12-char geohash — the exact inverse of
    :func:`_geohash` (spatial4j GeohashUtils.decode returns the center)."""
    char_vals = F.create_map(
        *[x for i, c in enumerate(_B32) for x in (F.lit(c), F.lit(i))]
    )
    latq = None
    lonq = None
    for ci in range(_GH_CHARS):
        v = char_vals[F.substring(gh, ci + 1, 1)]
        for bi in range(5):
            gpos = ci * 5 + bi
            bit = F.shiftright(v, 4 - bi).bitwiseAND(F.lit(1)).cast("long")
            shifted = bit * (1 << (_GH_BITS - 1 - gpos // 2))
            if gpos % 2 == 0:
                lonq = shifted if lonq is None else lonq + shifted
            else:
                latq = shifted if latq is None else latq + shifted
    scale = float(1 << _GH_BITS)
    lat = (latq.cast("double") + 0.5) / scale * 180.0 - 90.0
    lon = (lonq.cast("double") + 0.5) / scale * 360.0 - 180.0
    return lat, lon


def _ghhsin(radius: Column, gh1: Column, gh2: Column) -> Column:
    """``ghhsin(radius, gh1, gh2)`` (GeohashHaversineFunction.java:43):
    haversine between two geohash-encoded points on a sphere of the given
    radius, each decoded to its cell center."""
    lat1, lon1 = _gh_decode(gh1)
    lat2, lon2 = _gh_decode(gh2)
    dlat = F.radians(lat2 - lat1)
    dlon = F.radians(lon2 - lon1)
    a = F.sin(dlat / 2) ** 2 + F.cos(F.radians(lat1)) * F.cos(F.radians(lat2)) * (
        F.sin(dlon / 2) ** 2
    )
    return 2 * radius * F.asin(F.sqrt(a))


# The JSON-facet / stats aggregation names (ValueSourceParser.java agg
# registrations → solr/core/src/java/org/apache/solr/search/facet/*Agg):
# GROUP aggregates over a value source. variance/stddev are POPULATION
# moments (VarianceAgg.java:61 sumSq/count - (sum/count)^2,
# StddevAgg.java:62 its sqrt); percentile here is the exact interpolated
# quantile (the reference's t-digest is approximate — documented
# difference); unique is exact count-distinct; hll maps to Spark's native
# HLL sketch (the bit-identical cross-engine HLL this engine gates lives in
# relational.stats_cardinality). All are map-side-combinable Catalyst
# aggregates except percentile/unique, whose exactness costs a full
# shuffle of the grouped values — the documented Solr trade-off inverted.
AGG_FUNCTIONS: dict = {
    "agg_count": lambda c=None: F.count("*") if c is None else F.count(c),
    "agg_sum": F.sum,
    "agg_avg": F.avg,
    "agg_min": F.min,
    "agg_max": F.max,
    "agg_sumsq": lambda c: F.sum(c * c),
    "agg_variance": F.var_pop,
    "agg_stddev": F.stddev_pop,
    "agg_percentile": lambda c, p: F.percentile(c, F.lit(p)),
    "agg_unique": F.count_distinct,
    "agg_hll": F.approx_count_distinct,
    # agg_uniqueBlock (ValueSourceParser.java:969 → UniqueBlockFieldAgg):
    # distinct BLOCKS among the bucket's rows — pass the block-root column
    # (Solr's _root_, solr/core/.../search/facet/UniqueBlockFieldAgg.java).
    # Columnar blocks are _root_ groups here (same model as {!parent}), so
    # the block count IS a count_distinct over that column.
    "agg_uniqueBlock": F.count_distinct,
}


def parse_func_with_searcher(
    expr: str,
    searcher,
    frame=None,
    params: dict | None = None,
    registry: dict | None = None,
):
    """``parse_func`` plus the searcher-bound ``query()``/``boost()`` value
    sources — returns ``(frame, score_col)``.

    Reference: ``solr/core/src/java/org/apache/solr/search/
    ValueSourceParser.java:315`` (``query(sub[,def])`` → ``QueryValueSource``:
    per-doc score of the nested query, ``def`` — default 0 — for docs it
    does not match) and ``:327`` (``boost(sub, f)`` →
    ``FunctionScoreQuery.boostByValue``: matching docs score ``sub × f``,
    others take QueryValueSource's 0 default).

    Spark shape: parsing RECORDS each nested query; afterwards every one is
    planned as a single exhaustive sub-search left-joined onto ``frame`` on
    the (segment_id, doc_id) key — one join per distinct nested query, no
    per-row re-scoring. The returned column reads the joined score columns,
    so it is only valid over the returned frame. Unquoted ``$ref`` args
    resolve from ``params`` (FunctionQParser's nested-query param deref);
    ``frame=None`` defaults to the searcher's docs table.
    """
    pending: list[str] = []

    def _resolve(q) -> str:
        if not isinstance(q, str):
            raise ValueError(
                "query()/boost() need a quoted sub-query string, e.g. "
                "query('parse buffer', 0.5)"
            )
        if q.startswith("$"):
            ref = q[1:]
            if params is None or ref not in params:
                raise ValueError(f"unresolved param ref ${ref} in {expr!r}")
            q = str(params[ref])
        return q

    def _score_col(q: str) -> Column:
        i = len(pending)
        pending.append(q)
        return F.col(f"_qscore_{i}").cast("double")

    def _query(q, d=None) -> Column:
        dcol = F.lit(0.0) if d is None else (
            d.cast("double") if isinstance(d, Column) else F.lit(float(d))
        )
        return F.coalesce(_score_col(_resolve(q)), dcol)

    def _boost(q, vs) -> Column:
        if not isinstance(vs, Column):
            vs = F.lit(float(vs))
        return F.coalesce(
            _score_col(_resolve(q)) * vs.cast("double"), F.lit(0.0)
        )

    reg = dict(FUNCTIONS if registry is None else registry)
    reg["query"] = _query
    reg["boost"] = _boost
    col = parse_func(expr, registry=reg)
    base = frame
    if base is None:
        base = searcher.spark.read.parquet(searcher.index_dir + "/docs")
    for i, q in enumerate(pending):
        scores = searcher.search(q, k=None).select(
            "segment_id",
            "doc_id",
            F.col("score").cast("double").alias(f"_qscore_{i}"),
        )
        base = base.join(scores, ["segment_id", "doc_id"], "left")
    return base, col


def _ord(c, reverse: bool):
    from pyspark.sql.window import Window

    w = Window.partitionBy().orderBy(c.desc() if reverse else c.asc())
    return F.dense_rank().over(w)


def _prod(cols):
    out = cols[0]
    for c in cols[1:]:
        out = out * c
    return out


def _sqedist(cols):
    n = len(cols) // 2
    out = F.lit(0.0)
    for x, y in zip(cols[:n], cols[n:]):
        out = out + (x - y) * (x - y)
    return out


def _dist(p, cols):
    """Minkowski p-distance (ValueSourceParser 'dist' → DistanceUtils.
    vectorDistance): p=1 manhattan, p=2 euclidean. p stays a Column —
    the power arithmetic is symbolic, whole-stage-codegen applies (p must
    be ≥ 1; p=0 sparseness distance is not supported and yields NULL)."""
    if len(cols) % 2 != 0:
        raise ValueError(
            f"dist() needs an even coordinate count (x1..xn, y1..yn), got {len(cols)}"
        )
    n = len(cols) // 2
    out = F.lit(0.0)
    for x, y in zip(cols[:n], cols[n:]):
        out = out + F.abs(x - y) ** p
    return out ** (F.lit(1.0) / p)


_TOK_RE = re.compile(r"\s*('[^']*'|[A-Za-z_][\w.]*|-?\d+\.?\d*(?:[eE][+-]?\d+)?|[(),=])")


class PlanValue:
    """A plan-time-tagged value: a Column plus plan-time metadata (e.g. an
    interpolation model's kind) that picks the expression shape a
    model-aware evaluator emits. Tag-AWARE consumers are registered with
    ``fn._plan_aware = True`` and receive the PlanValue itself; every other
    consumer gets :meth:`value` (for an interpolation model: its
    sampled-values array — mirroring the reference ``VectorFunction``'s
    serialize-as-list behavior, ``solr/solrj/src/java/org/apache/solr/
    client/solrj/io/eval/VectorFunction.java``). ``parse_func`` threads
    bound names through its ``names`` dict so a ``let()``-bound model keeps
    its tag across later bindings."""

    def __init__(self, col: Column):
        self.col = col

    def rebind(self, col: Column) -> "PlanValue":
        """The same tag over a fresh Column (a post-binding name ref)."""
        return type(self)(col)

    def materialize(self) -> Column:
        """The Column a ``let()`` binding writes into the DataFrame."""
        return self.col

    def value(self) -> Column:
        return self.col


def parse_func(
    text: str, registry: dict | None = None, names: dict | None = None
) -> Column:
    """Parse Solr function-query syntax into one Catalyst Column:
    ``name(arg,...)`` calls, numeric literals, bare field references
    (``FunctionQParser.parseValueSource``). The result stays a JVM-side
    expression — whole-stage codegen applies, no Python in the row path.

    ``registry`` overrides the name→builder table (default: the
    function-query ``FUNCTIONS``); lookups try the exact (camelCase) name
    first, then the lowercased form — Solr math evaluators are
    case-sensitive camelCase (``Lang.java``), function queries lowercase.
    ``names`` maps already-bound variable names to :class:`PlanValue`s
    (see ``evaluators.parse_let``); a bare reference found there returns
    the tagged value instead of a plain column ref. The return may itself
    be a PlanValue — ``parse_eval`` unwraps at the top level."""
    fns = FUNCTIONS if registry is None else registry
    toks = _TOK_RE.findall(text)
    if not toks or "".join(_TOK_RE.sub("", text).split()):
        raise ValueError(f"cannot tokenize function query: {text!r}")
    pos = 0

    def peek():
        return toks[pos] if pos < len(toks) else None

    def advance():
        nonlocal pos
        if pos >= len(toks):
            raise ValueError(f"unexpected end of function query {text!r}")
        t = toks[pos]
        pos += 1
        return t

    def parse_expr() -> Column:
        t = advance()
        if t.startswith("'") and t.endswith("'"):
            # quoted literal (FunctionQParser string args, e.g.
            # termfreq(body,'spark')) — passed to the builder as a plain str
            return t[1:-1]
        if re.fullmatch(r"-?\d+\.?\d*(?:[eE][+-]?\d+)?", t):
            return F.lit(float(t) if ("." in t or "e" in t or "E" in t) else int(t))
        if peek() == "(":
            name = t if t in fns else t.lower()
            if name not in fns:
                raise ValueError(f"unknown function {name!r}")
            advance()  # '('
            args, kwargs = [], {}

            def one_arg():
                # named operand `key=expr` (StreamExpressionNamedParameter,
                # e.g. kmeans(m, 2, maxIterations=20)) → keyword argument
                nonlocal pos
                if (
                    pos + 1 < len(toks)
                    and toks[pos + 1] == "="
                    and re.fullmatch(r"[A-Za-z_]\w*", toks[pos])
                ):
                    key = advance()
                    advance()  # '='
                    kwargs[key] = parse_expr()
                else:
                    args.append(parse_expr())

            if peek() != ")":
                one_arg()
                while peek() == ",":
                    advance()
                    one_arg()
            if advance() != ")":
                raise ValueError(f"unbalanced parens in {text!r}")
            fn = fns[name]
            if not getattr(fn, "_plan_aware", False):
                args = [a.value() if isinstance(a, PlanValue) else a for a in args]
                kwargs = {
                    k: (v.value() if isinstance(v, PlanValue) else v)
                    for k, v in kwargs.items()
                }
            try:
                return fn(*args, **kwargs)
            except TypeError as e:
                if kwargs and "keyword argument" in str(e):
                    raise ValueError(
                        f"unexpected named parameter for {name}: {sorted(kwargs)}"
                    ) from e
                raise
        if names and t in names:
            return names[t]
        return F.col(t)  # bare field reference

    out = parse_expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in function query {text!r}")
    return out
