"""Solr function queries — the ValueSourceParser surface as Spark Columns.

The reference registers ~100 named functions
(``solr/core/src/java/org/apache/solr/search/ValueSourceParser.java:70-480``)
that parse expressions like ``recip(ms(NOW,mydate),3.16e-11,1,1)`` into
``ValueSource`` trees evaluated per document. Here each function maps to a
Catalyst ``Column`` expression (JVM-side, whole-stage-codegen — never a
Python UDF), and ``parse_func`` is a recursive-descent parser for the Solr
function-query syntax: nested calls, numeric literals, field references.

``FUNCTIONS[name]`` = callable(*Column) -> Column. Relevance functions
(termfreq/docfreq/norm) live in ``textops`` — they are literal columns of
the engine's postings/stats tables (SURVEY §2.10).
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
}


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


_TOK_RE = re.compile(r"\s*('[^']*'|[A-Za-z_][\w.]*|-?\d+\.?\d*(?:[eE][+-]?\d+)?|[(),])")


def parse_func(text: str, registry: dict | None = None) -> Column:
    """Parse Solr function-query syntax into one Catalyst Column:
    ``name(arg,...)`` calls, numeric literals, bare field references
    (``FunctionQParser.parseValueSource``). The result stays a JVM-side
    expression — whole-stage codegen applies, no Python in the row path.

    ``registry`` overrides the name→builder table (default: the
    function-query ``FUNCTIONS``); lookups try the exact (camelCase) name
    first, then the lowercased form — Solr math evaluators are
    case-sensitive camelCase (``Lang.java``), function queries lowercase."""
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
            args = []
            if peek() != ")":
                args.append(parse_expr())
                while peek() == ",":
                    advance()
                    args.append(parse_expr())
            if advance() != ")":
                raise ValueError(f"unbalanced parens in {text!r}")
            return fns[name](*args)
        return F.col(t)  # bare field reference

    out = parse_expr()
    if pos != len(toks):
        raise ValueError(f"trailing tokens in function query {text!r}")
    return out
