"""Solr streaming-expression LANGUAGE — the string syntax, compiled to plans.

Reference: ``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
expr/StreamExpressionParser.java`` (prefix notation, word chars ``_ . -``,
quoted values with escapes) + ``StreamFactory.java`` (name → stream
construction) and the individual stream classes named per function below.
The ops themselves have long been implemented as DataFrame builders
(``relational.py`` §2.9); this module adds what a Solr user actually types
— ``rollup(search(…), over=…, sum(…))`` — so expression STRINGS run
unchanged on the engine.

Supported heads (v1, the decision-table subset):

- ``search(table, q=…, fl=…, sort=…, rows=…)`` — ``CloudSolrStream``/
  ``SearchStream``: ``q`` is conjunctive field syntax (``*:*``,
  ``field:value``, ``field:[lo TO hi]``/``{`` exclusive ``}``, ``*``
  endpoints, ``-field:value`` negation), pushed down as Catalyst filters.
- ``facet(table, buckets=…, bucketSorts=…, bucketSizeLimit=…, metrics…)``
- ``rollup(stream, over=…, metrics…)`` — metrics: ``sum(f) avg(f) min(f)
  max(f) count(*)``; output columns carry the Solr tuple names
  (``sum(f)`` etc.).
- ``stats(table, q=…, metrics…)``
- ``having(stream, cond)`` — ``eq/gt/gteq/lt/lteq/and/or/not`` over tuple
  fields (metric names included).
- ``select(stream, "a", "b as c", "expr(...) as d")`` — renames,
  projections, and evaluator expressions (the full evaluator zoo).
- ``unique(stream, over=…)`` — first tuple per key IN STREAM SORT ORDER
  (requires a sorted upstream, like the reference's UniqueStream).
- ``top(stream, n=…, sort=…)`` / ``sort(stream, by=…)``
- ``innerJoin/leftOuterJoin/hashJoin(left, right, on=…)`` — ``on`` is
  ``field`` or ``leftField=rightField`` pairs, comma-separated.
- ``merge(a, b, on=…)`` — union preserving the comparator order.
- ``parallel(workers, stream)`` / ``plist(stream)`` — pass-through:
  Spark owns physical parallelism (the ``workers`` hint is accepted and
  ignored, documented).

Each head compiles to (DataFrame, sort-spec); the sort-spec threads the
stream's comparator so order-sensitive decorators (unique) behave like the
reference's sorted-stream contract instead of silently guessing.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from .relational import _t

_WORD = r"[A-Za-z_][\w.\-]*"
_METRICS = {"sum", "avg", "min", "max", "count"}
_COMPS = {"eq", "gt", "gteq", "lt", "lteq"}


# ---------------------------------------------------------------------------
# parser (StreamExpressionParser role): name(param, k=v, nested(...), ...)


class Expr:
    __slots__ = ("name", "pos", "named")

    def __init__(self, name, pos, named):
        self.name, self.pos, self.named = name, pos, named

    def __repr__(self):
        return f"{self.name}({self.pos}, {self.named})"


def parse_stream_expr(text: str) -> Expr:
    node, i = _parse(text, 0)
    if text[i:].strip():
        raise ValueError(f"trailing input: {text[i:]!r}")
    return node


def _skip_ws(s, i):
    while i < len(s) and s[i].isspace():
        i += 1
    return i


def _parse(s: str, i: int):
    i = _skip_ws(s, i)
    m = re.match(_WORD, s[i:])
    if not m:
        raise ValueError(f"expected name at {s[i:i+20]!r}")
    name = m.group()
    i = _skip_ws(s, i + len(m.group()))
    if i >= len(s) or s[i] != "(":
        raise ValueError(f"expected '(' after {name!r}")
    i += 1
    pos, named = [], {}
    while True:
        i = _skip_ws(s, i)
        if i >= len(s):
            raise ValueError("unbalanced '('")
        if s[i] == ")":
            return Expr(name, pos, named), i + 1
        if s[i] == ",":
            i += 1
            continue
        # k=value?
        mk = re.match(rf"({_WORD})\s*=", s[i:])
        if mk and s[i + mk.end() - 1] == "=" and not s[i:].startswith(mk.group(1) + "=="):
            key = mk.group(1)
            i = _skip_ws(s, i + mk.end())
            val, i = _parse_value(s, i)
            named[key] = val
        else:
            val, i = _parse_value(s, i)
            pos.append(val)


def _parse_value(s: str, i: int):
    i = _skip_ws(s, i)
    if s[i] == '"':
        j = i + 1
        out = []
        while j < len(s) and s[j] != '"':
            if s[j] == "\\" and j + 1 < len(s):
                j += 1
            out.append(s[j])
            j += 1
        if j >= len(s):
            raise ValueError("unterminated string")
        return "".join(out), j + 1
    m = re.match(_WORD, s[i:])
    if m:
        j = _skip_ws(s, i + len(m.group()))
        if j < len(s) and s[j] == "(":
            return _parse(s, i)  # nested expression
        return m.group(), i + len(m.group())
    # bare number / remaining token up to , or )
    m = re.match(r"[^,()\s]+", s[i:])
    if not m:
        raise ValueError(f"cannot parse value at {s[i:i+20]!r}")
    return m.group(), i + len(m.group())


# ---------------------------------------------------------------------------
# q-syntax: conjunctive field filters


def _q_filter(df: DataFrame, q: str) -> DataFrame:
    q = q.strip()
    if q in ("", "*:*"):
        return df
    # clause split respecting [lo TO hi] / {lo TO hi} range bodies; anything
    # the clause grammar didn't consume is a syntax error, not silence
    pat = r"-?[\w.]+:(?:[\[{][^\]}]*[\]}]|\S+)"
    clauses = re.findall(pat, q)
    if re.sub(pat, "", q).strip():
        raise ValueError(f"unsupported q syntax: {q!r}")
    for clause in clauses:
        neg = clause.startswith("-")
        body = clause[1:] if neg else clause
        if ":" not in body:
            raise ValueError(f"q clause needs field: {clause!r}")
        fld, val = body.split(":", 1)
        if val.startswith(("[", "{")) and val.endswith(("]", "}")):
            inc_lo, inc_hi = val[0] == "[", val[-1] == "]"
            lo, hi = re.split(r"\s+TO\s+", val[1:-1].strip())
            col = F.col(fld)
            # Solr [* TO *] means "field exists" — NULL rows never match a
            # positive clause
            c = col.isNotNull()
            if lo != "*":
                c = c & (col >= _lit(lo) if inc_lo else col > _lit(lo))
            if hi != "*":
                c = c & (col <= _lit(hi) if inc_hi else col < _lit(hi))
        else:
            c = F.col(fld) == _lit(val)
        if neg:
            # -f:v keeps docs where f is missing OR != v (Lucene MUST_NOT
            # over a field clause; a NULL comparison must not drop the row)
            df = df.filter(~F.coalesce(c, F.lit(False)))
        else:
            df = df.filter(c)
    return df


def _lit(v: str):
    try:
        return F.lit(int(v))
    except ValueError:
        pass
    try:
        return F.lit(float(v))
    except ValueError:
        pass
    if re.fullmatch(r"\d{4}-\d{2}-\d{2}", v):
        return F.lit(v).cast("date")
    return F.lit(v)


def _sort_spec(spec: str):
    out = []
    for part in spec.split(","):
        bits = part.split()
        col = bits[0]
        asc = len(bits) < 2 or bits[1].lower() != "desc"
        out.append((col, asc))
    return out


def _apply_sort(df, spec):
    return df.orderBy(
        *[F.col(c).asc() if a else F.col(c).desc() for c, a in spec]
    )


def _metric_col(node: Expr):
    """sum(f)/avg(f)/min(f)/max(f)/count(*) → (Column, Solr tuple name)."""
    arg = node.pos[0]
    name = f"{node.name}({arg})"
    if node.name == "count":
        return F.count("*").alias(name), name
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[node.name]
    return fn(arg).alias(name), name


# ---------------------------------------------------------------------------
# compiler


def run_stream_expr(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    df, _sort = _compile(spark, sf_dir, parse_stream_expr(text))
    return df


def _compile(spark, sf_dir, node: Expr):
    if not isinstance(node, Expr):
        raise ValueError(f"expected a stream expression, got {node!r}")
    h = node.name

    if h == "search":
        table = node.pos[0]
        q = node.named.get("q", "*:*")
        if table == "documents" and q != "*:*" and ":" not in q:
            # FULL-TEXT search (the real CloudSolrStream/SearchStream path):
            # free text q runs through the BM25 engine over the docs index,
            # scores join back to the stored fields, default order = the
            # searcher's (score desc, tie-broken) total order
            from .textops import _ft_search_all

            hits = _ft_search_all(spark, sf_dir, q)  # (doc_id, score)
            df = hits.join(_t(spark, sf_dir, table), "doc_id")
            sort = _sort_spec(node.named.get("sort", "score desc,doc_id asc"))
        else:
            df = _q_filter(_t(spark, sf_dir, table), q)
            sort = _sort_spec(node.named["sort"]) if "sort" in node.named else []
        if sort:
            df = _apply_sort(df, sort)
        if "fl" in node.named:
            cols = []
            for c in node.named["fl"].split(","):
                m = re.match(r"(.+?)\s+as\s+(\w+)$", c.strip())
                cols.append(
                    F.col(m.group(1)).alias(m.group(2)) if m else F.col(c.strip())
                )
            df = df.select(*cols)
        if "rows" in node.named:
            df = df.limit(int(node.named["rows"]))
        return df, sort

    if h in ("rollup", "hashRollup"):
        df, _ = _compile(spark, sf_dir, node.pos[0])
        over = [c.strip() for c in node.named["over"].split(",")]
        metrics = [_metric_col(p) for p in node.pos[1:]]
        return df.groupBy(*over).agg(*[c for c, _ in metrics]), []

    if h == "facet":
        table = node.pos[0]
        df = _q_filter(_t(spark, sf_dir, table), node.named.get("q", "*:*"))
        buckets = [c.strip() for c in node.named["buckets"].split(",")]
        metrics = [_metric_col(p) for p in node.pos[1:]]
        out = df.groupBy(*buckets).agg(*[c for c, _ in metrics])
        sort = _sort_spec(node.named["bucketSorts"]) if "bucketSorts" in node.named else []
        if sort:
            out = out.orderBy(
                *[F.col(f"`{c}`").asc() if a else F.col(f"`{c}`").desc() for c, a in sort]
            )
        if "bucketSizeLimit" in node.named:
            out = out.limit(int(node.named["bucketSizeLimit"]))
        return out, sort

    if h == "stats":
        table = node.pos[0]
        df = _q_filter(_t(spark, sf_dir, table), node.named.get("q", "*:*"))
        metrics = [_metric_col(p) for p in node.pos[1:]]
        return df.agg(*[c for c, _ in metrics]), []

    if h == "having":
        df, sort = _compile(spark, sf_dir, node.pos[0])
        return df.filter(_condition(node.pos[1], df.columns)), sort

    if h == "select":
        df, sort = _compile(spark, sf_dir, node.pos[0])
        cols = []
        for p in node.pos[1:]:
            spec = p if isinstance(p, str) else None
            if spec is None:
                raise ValueError("select() fields must be strings")
            m = re.match(r"(.+?)\s+as\s+(\w+)$", spec)
            if m:
                src, alias = m.group(1).strip(), m.group(2)
                # tuple fields first: rollup metrics are literally named
                # "sum(f)" — only non-columns go through the evaluator zoo
                if src in df.columns or "(" not in src:
                    cols.append(F.col(f"`{src}`").alias(alias))
                else:
                    from .evaluators import parse_eval

                    cols.append(parse_eval(src).alias(alias))
            else:
                cols.append(F.col(f"`{spec.strip()}`"))
        return df.select(*cols), []

    if h == "unique":
        # UniqueStream: first tuple per key in the STREAM's sort order —
        # requires a sorted upstream exactly like the reference
        from pyspark.sql import Window

        df, sort = _compile(spark, sf_dir, node.pos[0])
        if not sort:
            raise ValueError("unique() needs a sorted upstream (search sort=…)")
        over = [c.strip() for c in node.named["over"].split(",")]
        w = Window.partitionBy(*over).orderBy(
            *[F.col(c).asc() if a else F.col(c).desc() for c, a in sort]
        )
        return (
            df.withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") == 1)
            .drop("__rk")
        ), sort

    if h == "top":
        df, _ = _compile(spark, sf_dir, node.pos[0])
        sort = _sort_spec(node.named["sort"])
        return _apply_sort(df, sort).limit(int(node.named["n"])), sort

    if h == "sort":
        df, _ = _compile(spark, sf_dir, node.pos[0])
        sort = _sort_spec(node.named["by"])
        return _apply_sort(df, sort), sort

    if h in ("innerJoin", "hashJoin", "leftOuterJoin", "outerHashJoin"):
        left, lsort = _compile(spark, sf_dir, node.pos[0])
        right, _ = _compile(spark, sf_dir, node.pos[1])
        on = []
        for pair in node.named["on"].split(","):
            if "=" in pair:
                a, b = (x.strip() for x in pair.split("="))
                right = right.withColumnRenamed(b, a)
                on.append(a)
            else:
                on.append(pair.strip())
        how = "left" if h in ("leftOuterJoin", "outerHashJoin") else "inner"
        return left.join(right, on, how), lsort

    if h == "merge":
        a, _ = _compile(spark, sf_dir, node.pos[0])
        b, _ = _compile(spark, sf_dir, node.pos[1])
        sort = _sort_spec(node.named["on"])
        return _apply_sort(a.unionByName(b), sort), sort

    if h == "timeseries":
        # TimeSeriesStream (solrj/io/stream/TimeSeriesStream.java:63):
        # date-range buckets between start/end with a DateMath gap, metrics
        # per bucket. Edges run through the datemath parser (month-clamping
        # Calendar.add semantics); rows bucket via one broadcast range join.
        from .datemath import parse_datemath

        table = node.pos[0]
        df = _q_filter(_t(spark, sf_dir, table), node.named.get("q", "*:*"))
        fld = node.named["field"]
        start_s, end_s, gap = node.named["start"], node.named["end"], node.named["gap"]
        edges = [parse_datemath(start_s)]
        end = parse_datemath(end_s)
        while edges[-1] < end:
            nxt = parse_datemath(f"{edges[-1].isoformat().replace('+00:00', 'Z')}{gap}")
            if nxt <= edges[-1]:
                raise ValueError(f"timeseries gap {gap!r} does not advance")
            if len(edges) >= 10000:
                raise ValueError("timeseries range/gap yields > 10000 buckets")
            edges.append(nxt)
        ranges = spark.createDataFrame(
            [
                (edges[k].isoformat(), edges[k].replace(tzinfo=None), edges[k + 1].replace(tzinfo=None))
                for k in range(len(edges) - 1)
            ],
            "bucket string, __lo timestamp, __hi timestamp",
        )
        metrics = [_metric_col(p) for p in node.pos[1:]]
        col = F.col(fld)
        out = (
            df.join(F.broadcast(ranges), (col >= F.col("__lo")) & (col < F.col("__hi")))
            .groupBy("bucket")
            .agg(*[c for c, _ in metrics])
            .orderBy("bucket")
        )
        return out, [("bucket", True)]

    if h == "cartesianProduct":
        # CartesianProductStream (solrj/io/stream/CartesianProductStream.
        # java:46): one tuple per element of an array field
        df, sort = _compile(spark, sf_dir, node.pos[0])
        fld = node.pos[1]
        return df.withColumn(fld, F.explode(fld)), sort

    if h == "fetch":
        # FetchStream (solrj/io/stream/FetchStream.java:49): decorate the
        # stream's tuples with fields fetched from another collection by key
        table = node.pos[0]
        left, sort = _compile(spark, sf_dir, node.pos[1])
        on = node.named["on"]
        if "=" in on:
            lkey, rkey = (x.strip() for x in on.split("="))
        else:
            lkey = rkey = on.strip()
        fl = [c.strip() for c in node.named["fl"].split(",")]
        right = _t(spark, sf_dir, table).select(
            F.col(rkey).alias(lkey), *[c for c in fl if c != rkey]
        )
        return left.join(F.broadcast(right), lkey, "left"), sort

    if h == "nodes":
        # GatherNodesStream (solrj/io/graph/GatherNodesStream.java:60): one
        # traversal level per nodes() call — walk="from->to" joins the
        # incoming tuples' `from` values to the edge collection, emitting
        # the distinct `gather` values (nested nodes() calls walk further;
        # the multi-hop builder API is graph.gather_nodes)
        table = node.pos[0]
        sub, _ = _compile(spark, sf_dir, node.pos[1])
        frm, to = (x.strip() for x in node.named["walk"].split("->"))
        gather = node.named.get("gather", to)
        edges = _t(spark, sf_dir, table).select(F.col(to).alias("__to"), F.col(gather))
        roots = sub.select(F.col(frm)).distinct()
        out = (
            edges.join(roots, edges["__to"] == roots[frm])
            .select(F.col(gather).alias("node"))
            .distinct()
            .select(F.lit("level1").alias("level"), "node")
        )
        return out, []

    if h == "update":
        # UpdateStream (solrj/io/stream/UpdateStream.java:46): index the
        # wrapped stream's tuples into the destination collection — here a
        # storage path (`dest=`); format parquet by default. Side-effectful
        # by design, exactly like the reference; returns the tuple stream so
        # the expression composes (the reference emits batch summaries —
        # deviation documented).
        from .sources import write_docs

        sub, sort = _compile(spark, sf_dir, next(p for p in node.pos if isinstance(p, Expr)))
        dest = node.named["dest"]
        write_docs(sub, dest, fmt=node.named.get("fmt", "parquet"))
        return sub, sort

    if h in ("parallel", "plist"):
        # physical parallelism is Spark's; the nested stream is the plan
        sub = next(p for p in node.pos if isinstance(p, Expr))
        return _compile(spark, sf_dir, sub)

    raise ValueError(
        f"unsupported stream function {h!r} — graph/ml/io heads have "
        "dedicated operators (graph.py, textops.py, sources.py)"
    )


def _condition(node: Expr, columns):
    """HavingStream boolean operations over tuple fields."""
    if node.name == "and":
        return _condition(node.pos[0], columns) & _condition(node.pos[1], columns)
    if node.name == "or":
        return _condition(node.pos[0], columns) | _condition(node.pos[1], columns)
    if node.name == "not":
        return ~_condition(node.pos[0], columns)
    if node.name in _COMPS:
        lhs, rhs = node.pos
        lcol = F.col(f"`{lhs.name}({lhs.pos[0]})`") if isinstance(lhs, Expr) else F.col(f"`{lhs}`")
        if isinstance(rhs, Expr):
            r = F.col(f"`{rhs.name}({rhs.pos[0]})`")
        elif isinstance(rhs, str) and rhs in columns:
            # a bare word naming a tuple field compares COLUMNS, like
            # HavingStream's field-vs-field operations
            r = F.col(f"`{rhs}`")
        else:
            r = _lit(rhs) if isinstance(rhs, str) else rhs
        return {
            "eq": lcol == r,
            "gt": lcol > r,
            "gteq": lcol >= r,
            "lt": lcol < r,
            "lteq": lcol <= r,
        }[node.name]
    raise ValueError(f"unsupported having() op {node.name!r}")
