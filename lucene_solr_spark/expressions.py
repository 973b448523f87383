"""Lucene expressions module — the JavaScript-like expression language
compiled to Catalyst columns.

Reference: ``lucene/expressions/src/java/org/apache/lucene/expressions/js/
Javascript.g4`` (the ANTLR grammar: C-style precedence with numeric /
variable / call primaries, unary ``! ~ + -``, ``* / %``, ``+ -``, shifts
``<< >> >>>``, comparisons, equality, ``& ^ |``, ``&& ||``, right-assoc
``?:``; octal / hex / decimal literals; ``VARIABLE`` = dotted ids with
``['...']`` subscripts), ``JavascriptCompiler.java:683`` (DEFAULT_FUNCTIONS
— the 25-entry table in ``JavascriptCompiler.properties``: abs..tanh,
``haversin`` = SloppyMath.haversinKilometers/4 args, ``logn(base, x)``),
and ``ExpressionRescorer.java:44`` (expressions as a second-pass score with
``_score`` bound to the first pass).

Semantics mirrored from the compiled bytecode: every value is a DOUBLE;
comparison / equality / logical operators yield 1.0 or 0.0; logical and
conditional operands are truthy iff != 0; bitwise and shift operators cast
``double → long``, operate, and cast back (Java long semantics — shift
counts use the low 6 bits). ``compile_expression`` is a recursive-descent
parser producing one Catalyst ``Column`` tree — whole-stage codegen, no
Python at row time.

Variables resolve through a ``bindings`` dict (the ``SimpleBindings``
role); a plain identifier falls back to the column of that name. Dotted /
subscripted variables (``doc['f'].value``) must be bound explicitly —
there is no document API object here, the frame's columns ARE the values.
"""

from __future__ import annotations

import math
import re

from pyspark.sql import Column, functions as F

# token spec mirrors Javascript.g4 (OCTAL before DECIMAL — a leading 0
# with octal digits is octal, like the grammar)
_TOKEN_RE = re.compile(
    r"""\s*(?:
        (?P<hex>0[xX][0-9a-fA-F]+)
      | (?P<octal>0[0-7]+)
      | (?P<decimal>(?:0|[1-9][0-9]*)(?:\.[0-9]*)?(?:[eE][+-]?[0-9]+)?|\.[0-9]+(?:[eE][+-]?[0-9]+)?)
      | (?P<variable>[_$A-Za-z][_$A-Za-z0-9]*(?:\[(?:'(?:\\'|\\\\|[^\\'])*'|"(?:\\"|\\\\|[^\\"])*"|[0-9]+)\])*(?:\.[_$A-Za-z][_$A-Za-z0-9]*(?:\[(?:'(?:\\'|\\\\|[^\\'])*'|"(?:\\"|\\\\|[^\\"])*"|[0-9]+)\])*)*)
      | (?P<op><<|>>>|>>|<=|>=|==|!=|&&|\|\||[-+*/%()!,~<>&^|?:])
    )""",
    re.VERBOSE,
)

_FUNCS = {
    "abs": (1, F.abs),
    "acos": (1, F.acos),
    "acosh": (1, lambda x: _jln(x + F.sqrt(x * x - 1))),
    "asin": (1, F.asin),
    "asinh": (1, lambda x: F.log(x + F.sqrt(x * x + 1))),
    "atan": (1, F.atan),
    "atan2": (2, F.atan2),
    "atanh": (1, lambda x: F.lit(0.5) * _jln(_jdiv(F.lit(1.0) + x, F.lit(1.0) - x))),
    "ceil": (1, lambda x: F.ceil(x).cast("double")),
    "cos": (1, F.cos),
    "cosh": (1, F.cosh),
    "exp": (1, F.exp),
    "floor": (1, lambda x: F.floor(x).cast("double")),
    "ln": (1, lambda x: _jln(x)),
    "log10": (1, lambda x: _jdiv(_jln(x), F.lit(math.log(10.0)))),
    "logn": (2, lambda base, x: _jdiv(_jln(x), _jln(base))),  # MathUtil.log(base, x)
    "max": (2, F.greatest),
    "min": (2, F.least),
    "pow": (2, F.pow),
    "sin": (1, F.sin),
    "sinh": (1, F.sinh),
    "sqrt": (1, F.sqrt),
    "tan": (1, F.tan),
    "tanh": (1, F.tanh),
    # SloppyMath.haversinKilometers(lat1, lon1, lat2, lon2)
    "haversin": (
        4,
        lambda lat1, lon1, lat2, lon2: __import__(
            "lucene_solr_spark.functions", fromlist=["_haversine"]
        )._haversine(lat1, lon1, lat2, lon2),
    ),
}


def _tokenize(text: str) -> list[tuple[str, str]]:
    out = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m or m.end() == m.start():
            if text[pos:].strip():
                raise ValueError(f"bad token at {pos} in expression {text!r}")
            break
        pos = m.end()
        for kind in ("hex", "octal", "decimal", "variable", "op"):
            v = m.group(kind)
            if v is not None:
                out.append((kind, v))
                break
    out.append(("eof", ""))
    return out


def _num(kind: str, text: str) -> float:
    if kind == "hex":
        return float(int(text, 16))
    if kind == "octal":
        return float(int(text, 8))
    return float(text)


def _bool(c: Column) -> Column:
    """Truthiness: != 0 (the compiled DCMPL/IFEQ sequence)."""
    return c != F.lit(0.0)


def _as_double(cond: Column) -> Column:
    return F.when(cond, F.lit(1.0)).otherwise(F.lit(0.0))


_LONG = "bigint"
_MAXL_D = float(2**63)  # 9.223372036854776e18


def _to_long(c: Column) -> Column:
    """Java ``(long) double``: NaN → 0, saturate at Long.MIN/MAX, truncate
    toward zero — spelled out so ANSI mode can't throw where the JVM
    wouldn't."""
    return (
        F.when(F.isnan(c), F.lit(0).cast(_LONG))
        .when(c >= F.lit(_MAXL_D), F.lit(2**63 - 1).cast(_LONG))
        .when(c <= F.lit(-_MAXL_D), F.lit(-(2**63)).cast(_LONG))
        .otherwise(c.cast(_LONG))
    )


def _jdiv(a: Column, b: Column) -> Column:
    """Java double division: x/0 → ±Inf (sign of x), 0/0 → NaN (ANSI Spark
    throws on /0 instead)."""
    return (
        F.when(b != 0, a / b)
        .when(F.isnan(b) | F.isnan(a), F.lit(float("nan")))
        .when(a > 0, F.lit(float("inf")))
        .when(a < 0, F.lit(float("-inf")))
        .otherwise(F.lit(float("nan")))
    )


def _jrem(a: Column, b: Column) -> Column:
    """Java double remainder: x % 0 → NaN."""
    return F.when(b != 0, a % b).otherwise(F.lit(float("nan")))


def _jln(x: Column) -> Column:
    """Java ``Math.log``: log(0) → -Inf, log(<0) → NaN (Spark's ``log``
    returns NULL for both — a silent divergence the comparisons would
    then propagate)."""
    return (
        F.when(F.isnan(x), F.lit(float("nan")))
        .when(x < 0, F.lit(float("nan")))
        .when(x == 0, F.lit(float("-inf")))
        .otherwise(F.log(x))
    )


def _nan_cmp(a: Column, b: Column, op) -> Column:
    """Java comparison bytecode: every ordered comparison with a NaN
    operand is FALSE (Spark instead treats NaN as equal to itself and
    greater than everything)."""
    either_nan = F.isnan(a) | F.isnan(b)
    return _as_double(~either_nan & op(a, b))


class _Parser:
    def __init__(self, tokens, bindings):
        self.toks = tokens
        self.i = 0
        self.bindings = bindings or {}

    def peek(self):
        return self.toks[self.i]

    def next(self):
        t = self.toks[self.i]
        self.i += 1
        return t

    def expect(self, op):
        k, v = self.next()
        if k != "op" or v != op:
            raise ValueError(f"expected {op!r}, got {v!r}")

    def at(self, op):
        k, v = self.peek()
        return k == "op" and v == op

    def eat(self, op):
        if self.at(op):
            self.next()
            return True
        return False

    # precedence climbing, lowest first (grammar order, Javascript.g4)
    def parse(self) -> Column:
        c = self.conditional()
        if self.peek()[0] != "eof":
            raise ValueError(f"trailing input at token {self.peek()[1]!r}")
        return c

    def conditional(self) -> Column:
        cond = self.boolor()
        if self.eat("?"):
            then = self.conditional()
            self.expect(":")
            other = self.conditional()  # right-assoc
            return F.when(_bool(cond), then).otherwise(other)
        return cond

    def boolor(self) -> Column:
        c = self.booland()
        while self.eat("||"):
            c = _as_double(_bool(c) | _bool(self.booland()))
        return c

    def booland(self) -> Column:
        c = self.bwor()
        while self.eat("&&"):
            c = _as_double(_bool(c) & _bool(self.bwor()))
        return c

    def bwor(self) -> Column:
        c = self.bwxor()
        while self.at("|") and self.toks[self.i][1] == "|":
            self.next()
            c = _to_long(c).bitwiseOR(_to_long(self.bwxor())).cast("double")
        return c

    def bwxor(self) -> Column:
        c = self.bwand()
        while self.eat("^"):
            c = _to_long(c).bitwiseXOR(_to_long(self.bwand())).cast("double")
        return c

    def bwand(self) -> Column:
        c = self.eqne()
        while self.eat("&"):
            c = _to_long(c).bitwiseAND(_to_long(self.eqne())).cast("double")
        return c

    def eqne(self) -> Column:
        c = self.cmp()
        while True:
            if self.eat("=="):
                c = _nan_cmp(c, self.cmp(), lambda a, b: a == b)
            elif self.eat("!="):
                # Java: x != NaN is TRUE (the negation of the false ==)
                r = self.cmp()
                c = _as_double(F.isnan(c) | F.isnan(r) | (c != r))
            else:
                return c

    def cmp(self) -> Column:
        c = self.shift()
        while True:
            if self.eat("<="):
                c = _nan_cmp(c, self.shift(), lambda a, b: a <= b)
            elif self.eat(">="):
                c = _nan_cmp(c, self.shift(), lambda a, b: a >= b)
            elif self.eat("<"):
                c = _nan_cmp(c, self.shift(), lambda a, b: a < b)
            elif self.eat(">"):
                c = _nan_cmp(c, self.shift(), lambda a, b: a > b)
            else:
                return c

    def shift(self) -> Column:
        # Java long shifts use the low 6 bits of the count; mask explicitly
        # so the double→long→int narrowing can't change the count
        def _cnt(col: Column) -> Column:
            return _to_long(col).bitwiseAND(F.lit(63).cast(_LONG)).cast("int")

        c = self.addsub()
        while True:
            if self.eat("<<"):
                c = F.call_function(
                    "shiftleft", _to_long(c), _cnt(self.addsub())
                ).cast("double")
            elif self.eat(">>"):
                c = F.call_function(
                    "shiftright", _to_long(c), _cnt(self.addsub())
                ).cast("double")
            elif self.eat(">>>"):
                c = F.call_function(
                    "shiftrightunsigned", _to_long(c), _cnt(self.addsub())
                ).cast("double")
            else:
                return c

    def addsub(self) -> Column:
        c = self.muldiv()
        while True:
            if self.eat("+"):
                c = c + self.muldiv()
            elif self.eat("-"):
                c = c - self.muldiv()
            else:
                return c

    def muldiv(self) -> Column:
        c = self.unary()
        while True:
            if self.eat("*"):
                c = c * self.unary()
            elif self.eat("/"):
                c = _jdiv(c, self.unary())
            elif self.eat("%"):
                c = _jrem(c, self.unary())
            else:
                return c

    def unary(self) -> Column:
        if self.eat("!"):
            return _as_double(~_bool(self.unary()))
        if self.eat("~"):
            return (
                F.lit(-1)
                .cast(_LONG)
                .bitwiseXOR(_to_long(self.unary()))  # ~x == x ^ -1
                .cast("double")
            )
        if self.eat("+"):
            return self.unary()
        if self.eat("-"):
            return -self.unary()
        return self.primary()

    def primary(self) -> Column:
        kind, v = self.next()
        if kind in ("hex", "octal", "decimal"):
            return F.lit(_num(kind, v))
        if kind == "op" and v == "(":
            c = self.conditional()
            self.expect(")")
            return c
        if kind == "variable":
            if self.at("("):
                self.next()
                args = []
                if not self.at(")"):
                    args.append(self.conditional())
                    while self.eat(","):
                        args.append(self.conditional())
                self.expect(")")
                if v not in _FUNCS:
                    raise ValueError(f"unknown function {v!r}")
                arity, fn = _FUNCS[v]
                if len(args) != arity:
                    raise ValueError(
                        f"{v} takes {arity} argument(s), got {len(args)}"
                    )
                return fn(*args).cast("double")
            if v in self.bindings:
                b = self.bindings[v]
                return (b if isinstance(b, Column) else F.lit(float(b))).cast(
                    "double"
                )
            if re.fullmatch(r"[_$A-Za-z][_$A-Za-z0-9]*", v):
                return F.col(v).cast("double")
            raise ValueError(
                f"variable {v!r} must be bound explicitly (dotted/subscripted "
                "names have no document API here)"
            )
        raise ValueError(f"unexpected token {v!r}")


def compile_expression(text: str, bindings: dict | None = None) -> Column:
    """Compile one Lucene-expressions string to a Catalyst ``Column``
    (``JavascriptCompiler.compile`` + ``SimpleBindings``)."""
    return _Parser(_tokenize(text), bindings).parse().cast("double")


def expression_rescore(
    searcher, query, expr: str, k: int = 10, bindings: dict | None = None
):
    """``ExpressionRescorer.java:44``: re-rank first-pass top-k with the
    expression as the new score; ``_score`` binds to the first-pass score
    and every stored field is addressable by name."""
    hits = searcher.search(query, k=k)
    fields = sorted(set(re.findall(r"[_$A-Za-z][_$A-Za-z0-9]*", expr)) - {"_score"} - set(_FUNCS))
    docs_cols = set(
        searcher.spark.read.parquet(searcher.index_dir + "/docs").columns
    )
    joined = searcher.fetch(hits, cols=[f for f in fields if f in docs_cols])
    b = dict(bindings or {})
    b.setdefault("_score", F.col("score").cast("double"))
    out = joined.withColumn("new_score", compile_expression(expr, b))
    return (
        out.drop("score", "rank")
        .withColumnRenamed("new_score", "score")
        .orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        .limit(k)
    )


# pure-Python twin of the double/long semantics, for property testing
def evaluate(text: str, variables: dict | None = None) -> float:
    """Driver-side reference evaluator with the same semantics — used by
    the tests to cross-check the Catalyst compilation."""
    return _PyEval(_tokenize(text), variables or {}).parse()


def _jlong(x: float) -> int:
    """Java ``(long) double`` cast: NaN → 0, saturate at Long.MIN/MAX."""
    if math.isnan(x):
        return 0
    if x >= 2**63 - 1:
        return 2**63 - 1
    if x <= -(2**63):
        return -(2**63)
    return int(x)


def _wrap64(v: int) -> int:
    v &= (1 << 64) - 1
    return v - (1 << 64) if v >= 1 << 63 else v


class _PyEval(_Parser):
    def __init__(self, tokens, variables):
        super().__init__(tokens, None)
        self.vars = variables

    def conditional(self):
        cond = self.boolor()
        if self.eat("?"):
            then = self.conditional()
            self.expect(":")
            other = self.conditional()
            return then if cond != 0 else other
        return cond

    def boolor(self):
        c = self.booland()
        while self.eat("||"):
            r = self.booland()
            c = 1.0 if (c != 0 or r != 0) else 0.0
        return c

    def booland(self):
        c = self.bwor()
        while self.eat("&&"):
            r = self.bwor()
            c = 1.0 if (c != 0 and r != 0) else 0.0
        return c

    def bwor(self):
        c = self.bwxor()
        while self.at("|") and self.toks[self.i][1] == "|":
            self.next()
            c = float(_wrap64(_jlong(c) | _jlong(self.bwxor())))
        return c

    def bwxor(self):
        c = self.bwand()
        while self.eat("^"):
            c = float(_wrap64(_jlong(c) ^ _jlong(self.bwand())))
        return c

    def bwand(self):
        c = self.eqne()
        while self.eat("&"):
            c = float(_wrap64(_jlong(c) & _jlong(self.eqne())))
        return c

    def eqne(self):
        c = self.cmp()
        while True:
            if self.eat("=="):
                c = 1.0 if c == self.cmp() else 0.0
            elif self.eat("!="):
                c = 1.0 if c != self.cmp() else 0.0
            else:
                return c

    def cmp(self):
        c = self.shift()
        while True:
            if self.eat("<="):
                c = 1.0 if c <= self.shift() else 0.0
            elif self.eat(">="):
                c = 1.0 if c >= self.shift() else 0.0
            elif self.eat("<"):
                c = 1.0 if c < self.shift() else 0.0
            elif self.eat(">"):
                c = 1.0 if c > self.shift() else 0.0
            else:
                return c

    def shift(self):
        c = self.addsub()
        while True:
            if self.eat("<<"):
                c = float(_wrap64(_jlong(c) << (_jlong(self.addsub()) & 63)))
            elif self.eat(">>"):
                c = float(_jlong(c) >> (_jlong(self.addsub()) & 63))
            elif self.eat(">>>"):
                n = _jlong(self.addsub()) & 63
                c = float(_wrap64((_jlong(c) & ((1 << 64) - 1)) >> n))
            else:
                return c

    def addsub(self):
        c = self.muldiv()
        while True:
            if self.eat("+"):
                c = c + self.muldiv()
            elif self.eat("-"):
                c = c - self.muldiv()
            else:
                return c

    def muldiv(self):
        c = self.unary()
        while True:
            if self.eat("*"):
                c = c * self.unary()
            elif self.eat("/"):
                r = self.unary()
                if r != 0:
                    c = c / r
                elif math.isnan(c) or math.isnan(r):
                    c = math.nan
                else:
                    c = math.copysign(math.inf, c) if c != 0 else math.nan
            elif self.eat("%"):
                r = self.unary()
                c = math.fmod(c, r) if r != 0 else math.nan
            else:
                return c

    def unary(self):
        if self.eat("!"):
            return 1.0 if self.unary() == 0 else 0.0
        if self.eat("~"):
            return float(_wrap64(~_jlong(self.unary())))
        if self.eat("+"):
            return self.unary()
        if self.eat("-"):
            return -self.unary()
        return self.primary()

    _PYF = {
        "abs": abs,
        "acos": math.acos,
        "acosh": lambda x: _pylog(x + math.sqrt(x * x - 1)) if x * x >= 1 else math.nan,
        "asin": math.asin,
        "asinh": math.asinh,
        "atan": math.atan,
        "atan2": math.atan2,
        "atanh": lambda x: 0.5 * _pylog(_pydiv(1.0 + x, 1.0 - x)),
        "ceil": lambda x: float(math.ceil(x)),
        "cos": math.cos,
        "cosh": math.cosh,
        "exp": math.exp,
        "floor": lambda x: float(math.floor(x)),
        "ln": lambda x: _pylog(x),
        "log10": lambda x: _pydiv(_pylog(x), math.log(10.0)),
        "logn": lambda base, x: _pydiv(_pylog(x), _pylog(base)),
        "max": max,
        "min": min,
        "pow": math.pow,
        "sin": math.sin,
        "sinh": math.sinh,
        "sqrt": lambda x: math.sqrt(x) if x >= 0 else math.nan,
        "tan": math.tan,
        "tanh": math.tanh,
    }

    def primary(self):
        kind, v = self.next()
        if kind in ("hex", "octal", "decimal"):
            return _num(kind, v)
        if kind == "op" and v == "(":
            c = self.conditional()
            self.expect(")")
            return c
        if kind == "variable":
            if self.at("("):
                self.next()
                args = []
                if not self.at(")"):
                    args.append(self.conditional())
                    while self.eat(","):
                        args.append(self.conditional())
                self.expect(")")
                if v == "haversin":
                    from .functions import _EARTH_RADIUS_KM

                    lat1, lon1, lat2, lon2 = map(math.radians, args)
                    h = (
                        math.sin((lat2 - lat1) / 2) ** 2
                        + math.cos(lat1)
                        * math.cos(lat2)
                        * math.sin((lon2 - lon1) / 2) ** 2
                    )
                    return 2 * _EARTH_RADIUS_KM * math.asin(math.sqrt(h))
                if v not in self._PYF:
                    raise ValueError(f"unknown function {v!r}")
                try:
                    return float(self._PYF[v](*args))
                except ValueError:
                    return math.nan  # Java Math.* return NaN off-domain
                except OverflowError:
                    return math.inf
            if v in self.vars:
                return float(self.vars[v])
            raise ValueError(f"unbound variable {v!r}")
        raise ValueError(f"unexpected token {v!r}")


def _pylog(x: float) -> float:
    """Java ``Math.log`` for the twin: log(0) → -Inf, log(<0) → NaN."""
    if math.isnan(x) or x < 0:
        return math.nan
    if x == 0:
        return -math.inf
    return math.log(x)


def _pydiv(a: float, b: float) -> float:
    if b != 0:
        return a / b
    if math.isnan(a) or math.isnan(b):
        return math.nan
    return math.copysign(math.inf, a) if a != 0 else math.nan
