"""Solr streaming-expression LANGUAGE — the string syntax, compiled to plans.

Reference: ``solr/solrj/src/java/org/apache/solr/client/solrj/io/stream/
expr/StreamExpressionParser.java`` (prefix notation, word chars ``_ . -``,
quoted values with escapes) + ``StreamFactory.java`` (name → stream
construction), the head registry ``solr/solrj/src/java/org/apache/solr/
client/solrj/io/Lang.java:38-95``, and the individual stream classes named
per function below. The ops themselves have long been implemented as
DataFrame builders (``relational.py`` §2.9, ``graph.py``, ``textops.py``);
this module adds what a Solr user actually types — ``rollup(search(…),
over=…, sum(…))`` — so expression STRINGS run unchanged on the engine.

Supported heads (the full Lang.java decision table minus the documented
exclusions at the bottom):

- ``search(table, q=…, fq=…, fl=…, sort=…, start=…, rows=…)`` —
  ``CloudSolrStream``/``SearchStream``: ``q`` is conjunctive field syntax
  (``*:*``, ``field:value``, ``field:[lo TO hi]``/``{`` exclusive ``}``,
  ``*`` endpoints, ``-field:value`` negation) pushed down as Catalyst
  filters; free-text ``q`` against the ``documents`` corpus routes through
  the BM25 engine (score joins the stored fields). ``fq`` adds filter
  clauses that never contribute to score, ``start`` pages (offset).
  ``shuffle``/``export`` are aliases (sorted full export — same plan; Spark
  owns the partition-level streaming the /export handler hand-rolls).
- ``facet(table, buckets=…, bucketSorts=…, bucketSizeLimit=…, metrics…)`` /
  ``facet2D(table, x=…, y=…, dimensions="nx,ny", metric)``
- ``rollup(stream, over=…, metrics…)`` / ``hashRollup`` — metrics:
  ``sum(f) avg(f) min(f) max(f) count(*)``; output columns carry the Solr
  tuple names (``sum(f)`` etc.).
- ``stats(table, q=…, metrics…)``
- ``having(stream, cond)`` — ``eq/gt/gteq/lt/lteq/and/or/not`` over tuple
  fields (metric names included).
- ``select(stream, "a", "b as c", "expr(...) as d")`` — renames,
  projections, and evaluator expressions (the full evaluator zoo).
- ``unique(stream, over=…)`` — first tuple per key IN STREAM SORT ORDER
  (requires a sorted upstream, like the reference's UniqueStream).
- ``top(stream, n=…, sort=…)`` / ``sort(stream, by=…)``
- ``innerJoin/leftOuterJoin/hashJoin/outerHashJoin(left, right, on=…)``
- ``merge(a, b, on=…)`` — union preserving the comparator order.
- ``intersect(left, right, on=…)`` / ``complement(left, right, on=…)`` —
  IntersectStream/ComplementStream: left tuples whose key does/doesn't
  appear in right (semi/anti join; the reference's sorted-merge is the
  physical strategy Spark picks itself).
- ``reduce(stream, by=…, group(sort=…, n=…))`` — ReducerStream with the
  GroupOperation: one tuple per key carrying the top-n group tuples as an
  array<struct> column ``group`` (ReduceStream.java:47,
  GroupOperation.java:39).
- ``significantTerms(table, q=…, field=…, limit=…, minDocFreq=…,
  maxDocFreq=…, minTermLength=…)`` — SignificantTermsStream.java:325 score
  ``(ln(fg)+1)·(ln((N+1)/(bg+1))+1)``; doc-freq bounds < 1.0 are corpus
  fractions exactly like the reference.
- ``knn(table, id=…, qf=…, k=…, mindf=…, maxdf=…, minwl=…)`` — KnnStream
  (more-like-this): candidates share distinct analyzed terms with the
  target doc, scored by summed ClassicSimilarity idf (deterministic
  deviation from MLT's boosted-query rerank, same candidate set).
- ``random(table, q=…, rows=…, fl=…, seed=…)`` — RandomStream with a
  SEEDED deterministic hash order (md5(key‖seed)) instead of RNG so both
  engines agree; same contract, reproducible.
- ``nodes(table, stream, walk=…, gather=…, count(*))`` — GatherNodesStream,
  one level per call; with a ``count(*)`` metric the gather multiplicity is
  kept (what scoreNodes consumes). ``shortestPath(table, from=…, to=…,
  edge="src=dst", maxDepth=…)`` emits one tuple per shortest path (the
  reference's path tuples). ``scoreNodes(nodes(…))`` — tf-idf node scoring
  (ScoreNodesStream.java:243).
- ``let(a=…, b=…, out)`` / ``get(a)`` / ``col(a, f)`` / ``tuple(k=v,…)`` /
  ``cell(name, stream)`` / ``list(s…)`` / ``echo(text)`` / ``eval(stream)``
  / ``calc()`` — the Let/math programming surface. Stream bindings stay
  DataFrames; ``col()`` materializes one bound column as an array cell
  (one-row frame, exactly the reference's in-memory contract —
  LetStream.java evaluates bindings in order, later ones see earlier ones).
- ``features(table, q=…, field=…, outcome=…, numTerms=…, featureSet=…)`` /
  ``train(table, features(…), field=…, outcome=…, maxIterations=…,
  name=…)`` / ``model(dir, id=…)`` / ``classify(model(…), stream,
  field=…)`` — the TextLogit ML chain (TextLogitStream.java:60,
  FeaturesSelectionStream.java:57, ClassifyStream.java:41): IGain feature
  selection, deterministic full-batch GD (gradient rounded 6dp — the
  engine's documented lockstep deviation from per-doc SGD), model tuples
  written via update() and read back by model(), sigmoid scoring.
- ``update(stream, dest=…)`` sinks tuples (parquet by default);
  ``commit(dest, update(…))`` is pass-through — the engine's manifest/
  parquet write IS the commit point. ``executor(stream)`` drains the
  stream's ``expr_s`` expressions and runs each (work-queue contract:
  the queue is small by design, exactly the reference's usage).
- ``daemon(stream, id=…, runInterval=…)`` — one iteration, pass-through:
  recurring execution belongs to Structured Streaming
  (``streaming/ingest.py``), documented deviation. ``topic(checkpointDir,
  documents, q=…, id=…)`` — the REAL checkpointed TopicStream over the
  docs index (streaming/ingest.topic_stream). ``priority(a, b)`` drains a
  first, b only when a is empty.
- ``sql(stmt=…)`` — the /sql handler. ``jdbc(url=…, table=…,
  predicate=…)`` — JDBCStream (sources.read_jdbc). ``null(stream)`` —
  NullStream's single count tuple. ``noop()`` passes through.
- ``parallel(workers, stream)`` / ``plist(stream)`` — pass-through: Spark
  owns physical parallelism (the ``workers`` hint is accepted and ignored,
  documented).

Not compiled (documented): ``plot``/``zplot`` (visualization payloads),
``get``-cache evaluators (putCache etc. — driver cache state), ``stream``
(remote zk fetch). Each raises with a pointer.

Each head compiles to (DataFrame, sort-spec); the sort-spec threads the
stream's comparator so order-sensitive decorators (unique, reduce-distinct,
col) behave like the reference's sorted-stream contract instead of silently
guessing.
"""

from __future__ import annotations

import math as _math
import os
import re

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

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


def _unparse(v) -> str:
    """Expr → canonical expression text (for re-dispatch into the evaluator
    parser, whose input is text — the nested node was consumed by THIS
    parser first when it appeared as a let()/tuple()/select() value)."""
    if isinstance(v, Expr):
        parts = [_unparse(p) for p in v.pos]
        parts += [f"{k}={_unparse(x)}" for k, x in v.named.items()]
        return f"{v.name}({','.join(parts)})"
    return str(v)


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


def _struct_cmp(spec):
    """array_sort comparator over struct elements for a multi-key
    mixed-direction sort spec (works for any orderable type, unlike the
    negate-the-number trick)."""

    def cmp(l, r):  # noqa: E741 - l/r mirror Spark's comparator convention
        e = F.lit(0)
        for colname, asc in reversed(spec):
            a, b = l[colname], r[colname]
            lt, gt = (F.lit(-1), F.lit(1)) if asc else (F.lit(1), F.lit(-1))
            e = F.when(a < b, lt).when(a > b, gt).otherwise(e)
        return e

    return cmp


def _metric_col(node: Expr):
    """sum(f)/avg(f)/min(f)/max(f)/count(*) → (Column, Solr tuple name)."""
    arg = node.pos[0]
    name = f"{node.name}({arg})"
    if node.name == "count":
        return F.count("*").alias(name), name
    fn = {"sum": F.sum, "avg": F.avg, "min": F.min, "max": F.max}[node.name]
    return fn(arg).alias(name), name


def _tok_expr(field: str) -> str:
    """The corpus tokenizer for text-head surfaces (same chain textops.py
    gates: lowercase alnum runs)."""
    return f"regexp_extract_all(lower({field}), '[a-z0-9]+', 0)"


def _source(spark, sf_dir, table: str, q: str):
    """search-head source resolution shared by search/significantTerms/knn/
    random: field-syntax q pushes down as Catalyst filters; free text against
    the documents corpus routes through the BM25 engine (the real
    CloudSolrStream path). Returns (df, default_sort)."""
    if table == "documents" and q not in ("", "*:*") and ":" not in q:
        from .textops import _ft_search_all

        hits = _ft_search_all(spark, sf_dir, q)  # (doc_id, score)
        df = hits.join(_t(spark, sf_dir, table), "doc_id")
        return df, _sort_spec("score desc,doc_id asc")
    return _q_filter(_t(spark, sf_dir, table), q), []


# ---------------------------------------------------------------------------
# compiler

# heads this compiler dispatches — let() uses this to tell a stream binding
# from an evaluator expression binding
_STREAM_HEADS = frozenset(
    """search shuffle export rollup hashRollup facet facet2D stats having
    select unique top sort innerJoin hashJoin leftOuterJoin outerHashJoin
    merge intersect complement reduce timeseries cartesianProduct fetch
    nodes gatherNodes update commit parallel plist significantTerms knn
    random let get tuple cell list echo eval calc features train model
    classify shortestPath scoreNodes daemon topic executor null priority
    sql jdbc noop plot zplot parseCSV parseTSV stream knnSearch""".split()
)


def run_stream_expr(spark: SparkSession, sf_dir: str, text: str) -> DataFrame:
    df, _sort = _compile(spark, sf_dir, parse_stream_expr(text))
    return df


def _compile(spark, sf_dir, node: Expr, scope: dict | None = None):
    if not isinstance(node, Expr):
        raise ValueError(f"expected a stream expression, got {node!r}")
    h = node.name
    scope = scope if scope is not None else {}

    if h in ("search", "shuffle", "export"):
        # ShuffleStream (ShuffleStream.java:40) is the /export handler role:
        # identical logical plan; Spark's sorted scan IS the export path.
        table = node.pos[0]
        q = node.named.get("q", "*:*")
        df, sort = _source(spark, sf_dir, table, q)
        if sort:  # free-text path carries the searcher's total order
            pass
        elif "sort" in node.named:
            sort = _sort_spec(node.named["sort"])
        # fq: filter clauses that never contribute to score
        # (SearchStream.java:55 parameter surface)
        if "fq" in node.named:
            df = _q_filter(df, node.named["fq"])
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
        if "start" in node.named:
            if not sort:
                raise ValueError("search(start=…) needs sort=… (paging is ordered)")
            df = df.offset(int(node.named["start"]))
        if "rows" in node.named:
            df = df.limit(int(node.named["rows"]))
        return df, sort

    if h in ("rollup", "hashRollup"):
        df, _ = _compile(spark, sf_dir, node.pos[0], scope)
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

    if h == "facet2D":
        # Facet2DStream (Facet2DStream.java:76): top-nx x buckets by the
        # metric, top-ny y buckets within each x — two partitioned windows,
        # never a global sort.
        from pyspark.sql import Window

        table = node.pos[0]
        df = _q_filter(_t(spark, sf_dir, table), node.named.get("q", "*:*"))
        x, y = node.named["x"], node.named["y"]
        nx, ny = (int(v) for v in node.named.get("dimensions", "10,10").split(","))
        mexprs = [p for p in node.pos[1:] if isinstance(p, Expr)]
        mcol, mname = _metric_col(mexprs[0]) if mexprs else (F.count("*").alias("count(*)"), "count(*)")
        cells = df.groupBy(x, y).agg(mcol)
        xtot = (
            cells.groupBy(x)
            .agg(F.sum(f"`{mname}`").alias("__xm"))
            .orderBy(F.col("__xm").desc(), F.col(x).asc())
            .limit(nx)
            .select(x)
        )
        w = Window.partitionBy(x).orderBy(F.col(f"`{mname}`").desc(), F.col(y).asc())
        out = (
            cells.join(F.broadcast(xtot), x)
            .withColumn("__rk", F.row_number().over(w))
            .filter(F.col("__rk") <= ny)
            .drop("__rk")
        )
        return out, []

    if h == "stats":
        table = node.pos[0]
        df = _q_filter(_t(spark, sf_dir, table), node.named.get("q", "*:*"))
        metrics = [_metric_col(p) for p in node.pos[1:]]
        return df.agg(*[c for c, _ in metrics]), []

    if h == "having":
        df, sort = _compile(spark, sf_dir, node.pos[0], scope)
        return df.filter(_condition(node.pos[1], df.columns)), sort

    if h == "select":
        df, sort = _compile(spark, sf_dir, node.pos[0], scope)
        cols = []
        renames: dict = {}
        for p in node.pos[1:]:
            spec = p if isinstance(p, str) else _unparse(p)
            m = re.match(r"(.+?)\s+as\s+(\w+)$", spec)
            if m:
                src, alias = m.group(1).strip(), m.group(2)
                # tuple fields first: rollup metrics are literally named
                # "sum(f)" — only non-columns go through the evaluator zoo
                if src.replace(" ", "") == "recNum()":
                    # RecNumEvaluator: the tuple's 0-based position in the
                    # stream — inherently a global sequence over the sort
                    # (the reference is a mutable counter on a single
                    # stream), so this is a documented display-time global
                    # window like cursorMark paging
                    if not sort:
                        raise ValueError("recNum() needs a sorted upstream stream")
                    from pyspark.sql import Window

                    w = Window.orderBy(
                        *[
                            F.col(f).asc() if asc else F.col(f).desc()
                            for f, asc in sort
                        ]
                    )
                    cols.append((F.row_number().over(w) - 1).alias(alias))
                elif src in df.columns or "(" not in src:
                    cols.append(F.col(f"`{src}`").alias(alias))
                    renames[src] = alias
                else:
                    from .evaluators import parse_eval

                    cols.append(parse_eval(src).alias(alias))
            else:
                cols.append(F.col(f"`{spec.strip()}`"))
        out = df.select(*cols)
        # SelectStream is an order-preserving decorator — keep the upstream
        # sort spec when its fields survive the projection (renames mapped)
        kept = []
        for f, asc in sort or []:
            if f in out.columns:
                kept.append((f, asc))
            elif f in renames:
                kept.append((renames[f], asc))
            else:
                kept = []
                break
        return out, kept

    if h == "unique":
        # UniqueStream: first tuple per key in the STREAM's sort order —
        # requires a sorted upstream exactly like the reference
        df, sort = _compile(spark, sf_dir, node.pos[0], scope)
        over = [c.strip() for c in node.named["over"].split(",")]
        return _first_per_key(df, sort, over, "unique"), sort

    if h == "top":
        df, _ = _compile(spark, sf_dir, node.pos[0], scope)
        sort = _sort_spec(node.named["sort"])
        return _apply_sort(df, sort).limit(int(node.named["n"])), sort

    if h == "sort":
        df, _ = _compile(spark, sf_dir, node.pos[0], scope)
        sort = _sort_spec(node.named["by"])
        return _apply_sort(df, sort), sort

    if h in ("innerJoin", "hashJoin", "leftOuterJoin", "outerHashJoin"):
        left, lsort = _compile(spark, sf_dir, node.pos[0], scope)
        right, _ = _compile(spark, sf_dir, node.pos[1], scope)
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
        a, _ = _compile(spark, sf_dir, node.pos[0], scope)
        b, _ = _compile(spark, sf_dir, node.pos[1], scope)
        sort = _sort_spec(node.named["on"])
        return _apply_sort(a.unionByName(b), sort), sort

    if h in ("intersect", "complement"):
        # IntersectStream.java:43 / ComplementStream.java:43: keep the left
        # tuples whose key does (semi) / does not (anti) appear on the right.
        # The reference merges two sorted streams; semi/anti join is the same
        # relation and lets Spark pick merge-vs-hash physically.
        left, lsort = _compile(spark, sf_dir, node.pos[0], scope)
        right, _ = _compile(spark, sf_dir, node.pos[1], scope)
        cond = []
        for pair in node.named["on"].split(","):
            if "=" in pair:
                a, b = (x.strip() for x in pair.split("="))
            else:
                a = b = pair.strip()
            cond.append(left[a] == right[b])
        how = "left_semi" if h == "intersect" else "left_anti"
        out = left.join(right, cond, how)
        return (_apply_sort(out, lsort) if lsort else out), lsort

    if h == "reduce":
        return _reduce_stream(spark, sf_dir, node, scope)

    if h == "significantTerms":
        return _significant_terms(spark, sf_dir, node)

    if h in ("knn", "knnSearch"):
        # both names register KnnStream (Lang.java:45-46)
        return _knn_mlt(spark, sf_dir, node)

    if h == "random":
        # RandomStream (RandomFacadeStream/RandomStream.java:66): pseudo-random
        # rows-sized sample. Deterministic deviation: seeded md5 hash order
        # (documented; a true RNG cannot be oracle-gated).
        table = node.pos[0]
        df = _q_filter(_t(spark, sf_dir, table), node.named.get("q", "*:*"))
        seed = node.named.get("seed", "lss")
        key = df.columns[0]
        rnd = F.md5(F.concat(F.col(key).cast("string"), F.lit(seed)))
        out = (
            df.withColumn("__rnd", rnd)
            .orderBy(F.col("__rnd").asc(), F.col(key).asc())
            .limit(int(node.named.get("rows", 500)))
            .drop("__rnd")
        )
        if "fl" in node.named:
            out = out.select(*[c.strip() for c in node.named["fl"].split(",")])
        return out, []

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
        df, sort = _compile(spark, sf_dir, node.pos[0], scope)
        fld = node.pos[1]
        return df.withColumn(fld, F.explode(fld)), sort

    if h == "fetch":
        # FetchStream (solrj/io/stream/FetchStream.java:49): decorate the
        # stream's tuples with fields fetched from another collection by key
        table = node.pos[0]
        left, sort = _compile(spark, sf_dir, node.pos[1], scope)
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

    if h in ("nodes", "gatherNodes"):
        # GatherNodesStream (solrj/io/graph/GatherNodesStream.java:60): one
        # traversal level per nodes() call — walk="from->to" joins the
        # incoming tuples' `from` values to the edge collection, emitting
        # the distinct `gather` values. A count(*) metric keeps the gather
        # multiplicity (what scoreNodes consumes). Nested nodes() calls walk
        # further; the multi-hop builder API is graph.gather_nodes.
        table = node.pos[0]
        sub, _ = _compile(spark, sf_dir, node.pos[1], scope)
        frm, to = (x.strip() for x in node.named["walk"].split("->"))
        gather = node.named.get("gather", to)
        counted = any(isinstance(p, Expr) and p.name == "count" for p in node.pos[2:])
        edges = _t(spark, sf_dir, table).select(F.col(to).alias("__to"), F.col(gather))
        roots = sub.select(F.col(frm)).distinct()
        hit = edges.join(roots, edges["__to"] == roots[frm])
        if counted:
            out = hit.groupBy(F.col(gather).alias("node")).agg(
                F.count("*").alias("count(*)")
            ).select(F.lit("level1").alias("level"), "node", "count(*)")
        else:
            out = (
                hit.select(F.col(gather).alias("node"))
                .distinct()
                .select(F.lit("level1").alias("level"), "node")
            )
        return out, []

    if h == "scoreNodes":
        return _score_nodes(spark, sf_dir, node, scope)

    if h == "shortestPath":
        return _shortest_path(spark, sf_dir, node)

    if h in ("update", "commit"):
        # UpdateStream (solrj/io/stream/UpdateStream.java:46): index the
        # wrapped stream's tuples into the destination collection — here a
        # storage path (`dest=`); format parquet by default. Side-effectful
        # by design, exactly like the reference; returns the tuple stream so
        # the expression composes (the reference emits batch summaries —
        # deviation documented). CommitStream (CommitStream.java:45) is
        # pass-through: the parquet/manifest write IS the commit point.
        from .sources import write_docs

        inner = next(p for p in node.pos if isinstance(p, Expr))
        if h == "commit":
            return _compile(spark, sf_dir, inner, scope)
        sub, sort = _compile(spark, sf_dir, inner, scope)
        dest = node.named["dest"]
        write_docs(sub, dest, fmt=node.named.get("fmt", "parquet"))
        return sub, sort

    if h in ("parallel", "plist", "daemon", "noop"):
        # parallel/plist: physical parallelism is Spark's; the nested stream
        # is the plan. daemon (DaemonStream.java:48): ONE iteration pass-
        # through — recurring execution belongs to Structured Streaming
        # (streaming/ingest.py), documented deviation. noop: pass-through.
        sub = next(p for p in node.pos if isinstance(p, Expr))
        return _compile(spark, sf_dir, sub, scope)

    if h == "null":
        # NullStream (NullStream.java:43): drain the stream, emit one tuple
        # with the count — the profiling head.
        df, _ = _compile(spark, sf_dir, node.pos[0], scope)
        return df.agg(F.count("*").alias("nullCount")), []

    if h == "priority":
        # PriorityStream (PriorityStream.java:41): emit the high-priority
        # stream's tuples; only when it is empty, the low-priority one. The
        # emptiness probe is one bounded driver check, like the reference's
        # first-read.
        a, asort = _compile(spark, sf_dir, node.pos[0], scope)
        b, bsort = _compile(spark, sf_dir, node.pos[1], scope)
        return (b, bsort) if a.isEmpty() else (a, asort)

    if h == "topic":
        # TopicStream (TopicStream.java:71): checkpointed pub/sub over query
        # results — wired to the REAL incremental topic_stream over the docs
        # index. First positional is the checkpoint home (a directory here;
        # the reference uses a checkpoint collection), second the corpus.
        from .streaming.ingest import topic_stream
        from .textops import docs_index_dir

        ckpt_home, table = node.pos[0], node.pos[1]
        if table != "documents":
            raise ValueError("topic() runs over the documents full-text corpus")
        topic_id = node.named.get("id", "topic")
        ckpt = os.path.join(ckpt_home, f"topic_{topic_id}.json")
        index_dir = docs_index_dir(spark, sf_dir)
        hits = topic_stream(spark, index_dir, node.named["q"], ckpt)
        if "fl" in node.named:
            # hits carry index-internal (segment_id, doc_id); the stored
            # fields sidecar maps them back to the external doc key
            stored = spark.read.parquet(os.path.join(index_dir, "docs"))
            hits = hits.join(stored, ["segment_id", "doc_id"]).select(
                F.col("ext_id").alias("doc_id"),
                "score",
                *[
                    c
                    for c in stored.columns
                    if c not in ("segment_id", "doc_id", "ext_id")
                ],
            )
            hits = hits.select(*[c.strip() for c in node.named["fl"].split(",")])
        return hits, []

    if h == "executor":
        # ExecutorStream (ExecutorStream.java:48): drain the stream's
        # `expr_s` field and execute each expression (the work-queue
        # pattern — the queue is small by design; threads= accepted and
        # ignored, Spark owns parallelism within each executed plan).
        df, _ = _compile(spark, sf_dir, next(p for p in node.pos if isinstance(p, Expr)), scope)
        rows = df.collect()
        done = []
        for r in rows:
            run_stream_expr(spark, sf_dir, r["expr_s"]).count()
            done.append((r["expr_s"],))
        out = spark.createDataFrame(done or [("",)], "expr_s string")
        return (out if done else out.limit(0)), []

    if h == "eval":
        # EvalStream (EvalStream.java:39): read the FIRST tuple's expr_s and
        # run it (one bounded driver read, exactly the reference).
        df, _ = _compile(spark, sf_dir, node.pos[0], scope)
        first = df.first()
        if first is None:
            raise ValueError("eval(): empty stream, no expr_s to run")
        return _compile(spark, sf_dir, parse_stream_expr(first["expr_s"]), scope)

    if h == "echo":
        # EchoStream (EchoStream.java:36): one tuple, field `echo`
        return spark.range(1).select(F.lit(" ".join(str(p) for p in node.pos)).alias("echo")), []

    if h == "list":
        # ListStream (ListStream.java:38): concatenate streams in order
        parts = [_compile(spark, sf_dir, p, scope)[0] for p in node.pos]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p, allowMissingColumns=True)
        return out, []

    if h == "calc":
        # CalculatorStream (CalculatorStream.java:33): one empty tuple —
        # select(calc(), add(1,2) as x) evaluates collection-free math
        return spark.range(1).select(), []

    if h == "cell":
        from .relational import cell_stream

        name = node.pos[0]
        df, _ = _compile(spark, sf_dir, node.pos[1], scope)
        return cell_stream(df, name), []

    if h == "tuple":
        return _tuple_stream(spark, sf_dir, node, scope), []

    if h == "plot":
        return _plot_stream(spark, sf_dir, node, scope)

    if h == "zplot":
        return _zplot_stream(spark, sf_dir, node, scope)

    if h in ("parseCSV", "parseTSV"):
        return _parse_csv_stream(spark, sf_dir, node, scope, tsv=(h == "parseTSV"))

    if h == "let":
        return _let_stream(spark, sf_dir, node, scope)

    if h in ("get", "stream"):
        # GetStream (GetStream.java:36): retrieve a let()-bound stream —
        # registered under both names (Lang.java:260)
        name = node.pos[0]
        if name not in scope:
            raise ValueError(f"get({name!r}): no such let() binding")
        return scope[name]

    if h == "features":
        return _features_select(spark, sf_dir, node)

    if h == "train":
        return _train_logit(spark, sf_dir, node)

    if h == "model":
        # ModelStream (ModelStream.java:44): fetch the latest stored model
        # tuple by name from the model store (a parquet dir written by
        # update(train(...)))
        df = spark.read.parquet(node.pos[0]).filter(
            F.col("name_s") == node.named["id"]
        )
        return df.orderBy(F.col("iteration_i").desc()).limit(1), []

    if h == "classify":
        return _classify(spark, sf_dir, node, scope)

    if h == "sql":
        # SqlStream (SqlStream.java:46) / the /sql handler: same statement
        # runs on the engine's SQL surface
        from .sqlhandler import sql_handler

        return sql_handler(spark, sf_dir, node.named["stmt"]), []

    if h == "jdbc":
        # JDBCStream (JDBCStream.java:75)
        from .sources import read_jdbc

        df = read_jdbc(
            spark,
            node.named["url"],
            node.named["table"],
            predicate=node.named.get("predicate"),
        )
        sort = _sort_spec(node.named["sort"]) if "sort" in node.named else []
        return (_apply_sort(df, sort) if sort else df), sort

    if h in ("plot", "zplot"):
        raise ValueError(f"{h}() builds visualization payloads — not compiled; "
                         "select the underlying arrays with col()/select() instead")

    raise ValueError(
        f"unsupported stream function {h!r} — remaining io heads are "
        "driver-cache/zk surfaces (putCache/stream); see module docstring"
    )


# ---------------------------------------------------------------------------
# decorated heads with enough body to warrant their own functions


def _first_per_key(df, sort, over, head):
    """First tuple per key in stream sort order (UniqueStream contract —
    also ReducerStream's DistinctOperation)."""
    from pyspark.sql import Window

    if not sort:
        raise ValueError(f"{head}() needs a sorted upstream (search sort=…)")
    w = Window.partitionBy(*over).orderBy(
        *[F.col(c).asc() if a else F.col(c).desc() for c, a in sort]
    )
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .drop("__rk")
    )


def _reduce_stream(spark, sf_dir, node, scope):
    """ReducerStream (ReducerStream.java:47) + operations: group (top-n per
    key by the op's own sort — GroupOperation.java:39, emitted as an
    array<struct> column ``group``), distinct (first per key in stream
    order — DistinctOperation.java:34). One shuffle on the key; the group
    sort happens inside the aggregated array (partial+final combinable)."""
    df, sort = _compile(spark, sf_dir, node.pos[0], scope)
    by = [c.strip() for c in node.named["by"].split(",")]
    op = next((p for p in node.pos[1:] if isinstance(p, Expr)), None)
    if op is None:
        raise ValueError("reduce() needs an operation: group(sort=…, n=…) or distinct()")
    if op.name == "distinct":
        return _first_per_key(df, sort, by, "reduce(distinct)"), sort
    if op.name != "group":
        raise ValueError(f"unsupported reduce() operation {op.name!r}")
    gsort = _sort_spec(op.named["sort"])
    n = int(op.named["n"])
    items = F.array_sort(
        F.collect_list(F.struct(*df.columns)), _struct_cmp(gsort)
    )
    return df.groupBy(*by).agg(F.slice(items, 1, n).alias("group")), []


def _significant_terms(spark, sf_dir, node):
    """SignificantTermsStream (SignificantTermsStream.java:59): terms of
    `field` over-represented in the q-selected foreground vs the whole
    corpus. Score (line 325): ``(ln(fg)+1)·(ln((N+1)/(bg+1))+1)``;
    minDocFreq/maxDocFreq < 1.0 are corpus FRACTIONS (the reference's
    percentage form), else absolute doc counts; both bound the BACKGROUND
    doc freq. Two aggs + one join; per-doc term sets are distinct
    (doc-freq semantics, not term-freq)."""
    table = node.pos[0]
    named = node.named
    field = named.get("field", "text")
    fgsrc, _ = _source(spark, sf_dir, table, named.get("q", "*:*"))
    base = _t(spark, sf_dir, table)

    def doc_terms(d):
        return d.select(
            F.explode(F.array_distinct(F.expr(_tok_expr(field)))).alias("term")
        )

    fg = doc_terms(fgsrc).groupBy("term").agg(F.count("*").alias("foreground"))
    bg = doc_terms(base).groupBy("term").agg(F.count("*").alias("background"))
    n = base.agg(F.count("*").alias("__n"))
    out = fg.join(bg, "term").crossJoin(F.broadcast(n))
    out = out.filter(F.length("term") >= int(named.get("minTermLength", 3)))

    def bound(v):
        x = float(v)
        return F.lit(x) * F.col("__n") if x < 1.0 else F.lit(x)

    if "minDocFreq" in named:
        out = out.filter(F.col("background") >= bound(named["minDocFreq"]))
    if "maxDocFreq" in named:
        out = out.filter(F.col("background") <= bound(named["maxDocFreq"]))
    score = (F.log(F.col("foreground").cast("double")) + 1.0) * (
        F.log((F.col("__n") + 1.0) / (F.col("background") + 1.0)) + 1.0
    )
    out = (
        out.select(
            "term",
            F.col("foreground").cast("long").alias("foreground"),
            F.col("background").cast("long").alias("background"),
            F.round(score, 4).alias("score"),
        )
        .orderBy(F.col("score").desc(), F.col("term").asc())
        .limit(int(named.get("limit", 20)))
    )
    return out, [("score", False), ("term", True)]


def _knn_mlt(spark, sf_dir, node):
    """KnnStream (KnnStream.java:56): more-like-this — documents sharing
    analyzed terms with the target doc `id` over field `qf`, top k.
    mintf/mindf/maxdf/minwl mirror the MLT knobs (mindf/maxdf bound the
    candidate terms' corpus doc freq; minwl the term length). Score =
    Σ shared-term ClassicSimilarity idf (ln((N+1)/(df+1))+1) — the
    deterministic deviation from MLT's boosted-query rerank (same candidate
    set, oracle-checkable scores); target terms broadcast, never all-pairs."""
    table = node.pos[0]
    named = node.named
    qf = named["qf"]
    key = named.get("key", "doc_id")
    k = int(named.get("k", 10))
    base = _t(spark, sf_dir, table)
    tok = base.select(
        F.col(key).alias("__key"),
        F.explode(F.array_distinct(F.expr(_tok_expr(qf)))).alias("term"),
    )
    if "minwl" in named:
        tok = tok.filter(F.length("term") >= int(named["minwl"]))
    target = tok.filter(F.col("__key") == _lit(named["id"])).select("term")
    dfreq = (
        tok.join(F.broadcast(target), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("__df"))
    )
    if "mindf" in named:
        dfreq = dfreq.filter(F.col("__df") >= int(named["mindf"]))
    if "maxdf" in named:
        dfreq = dfreq.filter(F.col("__df") <= int(named["maxdf"]))
    n = base.agg(F.count("*").alias("__n"))
    idf = F.log((F.col("__n") + 1.0) / (F.col("__df") + 1.0)) + 1.0
    out = (
        tok.filter(F.col("__key") != _lit(named["id"]))
        .join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("__key")
        .agg(F.round(F.sum(idf), 4).alias("score"))
        .orderBy(F.col("score").desc(), F.col("__key").asc())
        .limit(k)
        .withColumnRenamed("__key", key)
    )
    if "fl" in named:
        fl = [c.strip() for c in named["fl"].split(",")]
        out = out.join(base.select(key, *[c for c in fl if c != key and c != "score"]), key)
        out = out.select(*[c if c != "score" else F.col("score") for c in fl + ([key] if key not in fl else [])])
    sort = [("score", False), (key, True)]
    return out, sort


def _score_nodes(spark, sf_dir, node, scope):
    """ScoreNodesStream (ScoreNodesStream.java:243) over a compiled nodes()
    — needs the inner head's edge table for corpus doc-freq, so it compiles
    the traversal itself: term_freq = gather multiplicity, doc_freq = the
    node's frequency in the whole edge collection, tf-idf score via
    graph.score_nodes."""
    from .graph import score_nodes

    inner = next(p for p in node.pos if isinstance(p, Expr))
    if inner.name not in ("nodes", "gatherNodes"):
        raise ValueError("scoreNodes() expects a nodes()/gatherNodes() stream")
    table = inner.pos[0]
    sub, _ = _compile(spark, sf_dir, inner.pos[1], scope)
    frm, to = (x.strip() for x in inner.named["walk"].split("->"))
    gather = inner.named.get("gather", to)
    edges = _t(spark, sf_dir, table)
    roots = sub.select(F.col(frm)).distinct()
    gathered = (
        edges.select(F.col(to).alias("__to"), F.col(gather))
        .join(roots, F.col("__to") == roots[frm])
        .groupBy(F.col(gather).alias("node"))
        .agg(F.count("*").alias("term_freq"))
    )
    corpus = edges.groupBy(F.col(gather).alias("node")).agg(
        F.count("*").alias("doc_freq")
    )
    num_docs = edges.count()
    out = score_nodes(gathered, corpus, num_docs).select(
        "node",
        F.col("term_freq").cast("long").alias("term_freq"),
        F.col("doc_freq").cast("long").alias("doc_freq"),
        F.round("node_score", 4).alias("nodeScore"),
    )
    return out, []


def _shortest_path(spark, sf_dir, node):
    """ShortestPathStream (ShortestPathStream.java:54): BFS from `from` to
    `to` over edge="src_col=dst_col", emitting one tuple per SHORTEST path
    (the reference's path tuples — `path` array + `dist`). Per level one
    frontier⋈edges join (AQE broadcast-vs-shuffle) + anti-join against
    nodes found at earlier levels (multiple parents at the SAME level keep
    all shortest paths, like the reference's per-level visited map);
    localCheckpoint truncates the iterated lineage. maxDepth bounds the job
    count; node ids compare as strings for mixed-type genericity."""
    named = node.named
    src_c, dst_c = (x.strip() for x in named["edge"].split("="))
    frm, to = named["from"], named["to"]
    max_depth = int(named.get("maxDepth", 4))
    edges = (
        _t(spark, sf_dir, node.pos[0])
        .select(
            F.col(src_c).cast("string").alias("src"),
            F.col(dst_c).cast("string").alias("dst"),
        )
        .distinct()
        .cache()
    )
    frontier = spark.createDataFrame([(frm, [frm])], "node string, path array<string>")
    visited = frontier.select("node")
    empty = spark.createDataFrame([], "path array<string>, dist bigint")
    found = empty
    for depth in range(1, max_depth + 1):
        nxt = (
            edges.join(frontier, edges["src"] == frontier["node"])
            .select(
                F.col("dst").alias("node"),
                F.concat(F.col("path"), F.array(F.col("dst"))).alias("path"),
            )
            .join(visited, "node", "left_anti")
            .distinct()
            .localCheckpoint(eager=True)
        )
        hits = nxt.filter(F.col("node") == F.lit(to))
        if not hits.isEmpty():
            found = hits.select("path", F.lit(depth).cast("bigint").alias("dist"))
            break
        if nxt.isEmpty():
            break
        visited = visited.unionAll(nxt.select("node").distinct())
        frontier = nxt
    edges.unpersist()
    return found, []


# ---------------------------------------------------------------------------
# the let()/math programming surface


def _col_cell(df: DataFrame, sort, field: str):
    """col(stream, field) → one-row frame with the column as an array, in
    the STREAM's sort order (ColumnEvaluator preserves tuple order; like
    unique(), that needs a sorted upstream)."""
    if not sort:
        raise ValueError("col() needs a sorted bound stream (search sort=…)")
    items = F.array_sort(
        F.collect_list(F.struct(*df.columns)), _struct_cmp(sort)
    )
    return df.agg(F.transform(items, lambda s: s[field]).alias("__cell"))


def _pivot_cell(df: DataFrame, sort, x: str, y: str, v: str):
    """pivot(tuples, x, y, v) → one-row frame with a labeled matrix struct
    (``PivotEvaluator.java``): row labels = sorted distinct x, column
    labels = sorted distinct y (the reference's ``TreeSet<String>``s — the
    keys go through ``getString``, so the order is lexicographic even for
    numeric fields, and so is ours), cell = the LAST tuple's value in
    STREAM order for that (x, y) (the reference's array overwrite — the
    collected list is re-sorted by the bound stream's sort, like the other
    cell builders, because collect_list order is partition-dependent),
    0.0 where no tuple landed (Java array default)."""
    if not sort:
        raise ValueError("pivot() needs a sorted bound stream (search sort=…)")
    sx = F.col(x).cast("string")
    sy = F.col(y).cast("string")
    items = F.array_sort(
        F.collect_list(
            F.struct(
                *df.columns,
                sx.alias("__x"),
                sy.alias("__y"),
                F.col(v).cast("double").alias("__v"),
            )
        ),
        _struct_cmp(sort),
    )
    xl = F.array_sort(F.collect_set(sx))
    yl = F.array_sort(F.collect_set(sy))

    def cell(xv, yv):
        hits = F.filter(items, lambda t: (t["__x"] == xv) & (t["__y"] == yv))
        return F.when(F.size(hits) > 0, F.element_at(hits, -1)["__v"]).otherwise(
            F.lit(0.0)
        )

    return df.agg(
        F.struct(
            F.transform(xl, lambda xv: F.transform(yl, lambda yv: cell(xv, yv))).alias(
                "m"
            ),
            xl.alias("rl"),
            yl.alias("cl"),
        ).alias("__pv")
    )


def _latlon_cell(df: DataFrame, sort, field: str):
    """latlonVectors(tuples, field=…) → one-row frame with a labeled
    [lat, lon] matrix (``LatLonVectorsEvaluator.java``): the point field
    splits on "," when present else on space; row labels = the tuples'
    ``id`` values, column labels = [lat, lon]."""
    if not sort:
        raise ValueError("latlonVectors() needs a sorted bound stream (search sort=…)")
    if "id" not in df.columns:
        raise ValueError("The document tuples must contain an id field")
    parts = F.when(
        F.col(field).contains(","), F.split(F.col(field), ",")
    ).otherwise(F.split(F.col(field), " "))
    vec = F.array(
        F.trim(F.element_at(parts, 1)).cast("double"),
        F.trim(F.element_at(parts, 2)).cast("double"),
    )
    items = F.array_sort(
        F.collect_list(F.struct(*df.columns, vec.alias("__v"))), _struct_cmp(sort)
    )
    return df.agg(
        F.struct(
            F.transform(items, lambda s: s["__v"]).alias("m"),
            F.transform(items, lambda s: s["id"].cast("string")).alias("rl"),
            F.array(F.lit("lat"), F.lit("lon")).alias("cl"),
        ).alias("__ll")
    )


def _term_vectors_cell(df: DataFrame, sort, named: dict):
    """termVectors(stream, ...) → one-row frame with a labeled TF-IDF
    matrix struct (m, rl, cl) (``TermVectorsEvaluator.java``): docs need
    ``id`` and ``terms`` fields; features are the lexicographically-sorted
    terms with length ≥ minTermLength (default 3), no excluded substring,
    and doc freq within [⌊N·minDocFreq⌋, ⌊N·maxDocFreq⌋] (defaults .05/.5);
    cell value = √tf · (ln((N+1)/(df+1)) + 1). The feature dictionary is
    gathered to the driver — bounded by the maxDocFreq band, and the
    reference materializes the whole stream in memory here anyway (the
    let() bounded-env contract)."""
    if not sort:
        raise ValueError("termVectors() needs a sorted bound stream (search sort=…)")
    if "terms" not in df.columns or "id" not in df.columns:
        raise ValueError("The document tuples must contain terms and id fields")
    mtl = int(named.get("minTermLength", 3))
    mindf = float(named.get("minDocFreq", 0.05))
    maxdf = float(named.get("maxDocFreq", 0.5))
    excludes = [e for e in str(named.get("exclude", "")).split(",") if e]
    n_docs = df.count()
    lo, hi = int(n_docs * mindf), int(n_docs * maxdf)
    cand = df.select(F.explode(F.array_distinct("terms")).alias("term")).where(
        F.length("term") >= mtl
    )
    for e in excludes:
        cand = cand.where(~F.col("term").contains(e))
    rows = (
        cand.groupBy("term")
        .count()
        .where((F.col("count") >= lo) & (F.col("count") <= hi))
        .orderBy("term")
        .collect()
    )
    features = [r["term"] for r in rows]
    idf = {
        r["term"]: _math.log((n_docs + 1) / (r["count"] + 1.0)) + 1.0 for r in rows
    }
    def tf_of(term):
        # closure factory — a 2-arg lambda would be read as (element, index)
        return F.size(F.filter(F.col("terms"), lambda x: x == F.lit(term)))

    if features:
        vec = F.array(
            *[F.sqrt(tf_of(t).cast("double")) * F.lit(idf[t]) for t in features]
        )
        cl = F.array(*[F.lit(t) for t in features])
        dfs = F.map_from_arrays(
            cl, F.array(*[F.lit(float(r["count"])) for r in rows])
        )
    else:
        vec = F.array().cast("array<double>")
        cl = F.array().cast("array<string>")
        dfs = F.map_from_arrays(cl, F.array().cast("array<double>"))
    items = F.array_sort(
        F.collect_list(F.struct(*df.columns, vec.alias("__v"))), _struct_cmp(sort)
    )
    return df.agg(
        F.struct(
            F.transform(items, lambda s: s["__v"]).alias("m"),
            F.transform(items, lambda s: s["id"].cast("string")).alias("rl"),
            cl.alias("cl"),
            # the reference matrix carries a docFreqs attribute
            # (TermVectorsEvaluator.java setAttribute) — getAttribute reads it
            F.create_map(F.lit("docFreqs"), dfs).alias("attrs"),
        ).alias("__tv")
    )


def _let_stream(spark, sf_dir, node, outer_scope):
    """LetStream (LetStream.java:60): evaluate name=value bindings in order
    (later ones see earlier ones), then run the positional output stream.
    Stream bindings stay DataFrames (get(name) retrieves); col() bindings
    and evaluator bindings accumulate on a one-row env frame (the
    reference's variable map — its lets materialize streams in memory too,
    so the bounded-env contract is inherited). echo="a,b" emits env
    variables directly when no output stream is given."""
    from .evaluators import parse_binding

    scope = dict(outer_scope)
    env = spark.range(1).select()
    echo = None
    model_tags: dict = {}  # plan-time PlanValue tags across bindings
    for key, v in node.named.items():
        if key == "echo":
            echo = v
            continue
        if isinstance(v, Expr) and v.name == "col":
            var, field = v.pos[0], _unparse(v.pos[1]) if isinstance(v.pos[1], Expr) else v.pos[1]
            if var not in scope:
                raise ValueError(f"col({var!r}): no such let() binding")
            bdf, bsort = scope[var]
            env = env.crossJoin(
                F.broadcast(_col_cell(bdf, bsort, field))
            ).withColumnRenamed("__cell", key)
        elif isinstance(v, Expr) and v.name == "termVectors":
            var = v.pos[0]
            if var not in scope:
                raise ValueError(f"termVectors({var!r}): no such let() binding")
            bdf, bsort = scope[var]
            env = env.crossJoin(
                F.broadcast(_term_vectors_cell(bdf, bsort, v.named))
            ).withColumnRenamed("__tv", key)
            from .evaluators import LabeledMatrix

            model_tags[key] = LabeledMatrix(F.col(key), has_attrs=True)
        elif isinstance(v, Expr) and v.name == "memset":
            # MemsetEvaluator (MemsetEvaluator.java:44): load stream columns
            # into let()-visible vectors; the binding name itself holds the
            # var list marker (the reference binds a Map the lets expose)
            sub_df, sub_sort = _compile(spark, sf_dir, v.pos[0], scope)
            cols_p = [c.strip() for c in v.named["cols"].split(",")]
            vars_p = [c.strip() for c in v.named["vars"].split(",")]
            if len(cols_p) != len(vars_p):
                raise ValueError("The cols and vars lists must be the same size")
            size = int(v.named["size"]) if "size" in v.named else None
            # ONE agg job builds every vector (the per-column _col_cell
            # shape would re-aggregate the same stream len(cols) times)
            if not sub_sort:
                raise ValueError("memset() needs a sorted stream (search sort=…)")
            items = F.array_sort(
                F.collect_list(F.struct(*sub_df.columns)), _struct_cmp(sub_sort)
            )
            def _pick(cname):
                # closure factory — a 2-arg transform lambda would be read
                # as (element, index)
                return F.transform(items, lambda s: s[cname])

            cells = sub_df.agg(
                *[_pick(cname).alias(var) for cname, var in zip(cols_p, vars_p)]
            )
            env = env.crossJoin(F.broadcast(cells))
            if size is not None:
                for var in vars_p:
                    env = env.withColumn(var, F.slice(F.col(var), 1, size))
            env = env.withColumn(key, F.lit(",".join(vars_p)))
        elif isinstance(v, Expr) and v.name == "pivot":
            var = v.pos[0]
            if var not in scope:
                raise ValueError(f"pivot({var!r}): no such let() binding")
            bdf, bsort = scope[var]
            args = [p if isinstance(p, str) else _unparse(p) for p in v.pos[1:4]]
            if len(args) != 3:
                raise ValueError("The pivot function requires four parameters.")
            env = env.crossJoin(
                F.broadcast(_pivot_cell(bdf, bsort, *args))
            ).withColumnRenamed("__pv", key)
            from .evaluators import LabeledMatrix

            model_tags[key] = LabeledMatrix(F.col(key))
        elif isinstance(v, Expr) and v.name == "latlonVectors":
            var = v.pos[0]
            if var not in scope:
                raise ValueError(f"latlonVectors({var!r}): no such let() binding")
            bdf, bsort = scope[var]
            fld = v.named.get("field")
            if not fld:
                raise ValueError(
                    'The named parameter "field" must be set for the '
                    "latlonVectors function."
                )
            env = env.crossJoin(
                F.broadcast(_latlon_cell(bdf, bsort, fld))
            ).withColumnRenamed("__ll", key)
            from .evaluators import LabeledMatrix

            model_tags[key] = LabeledMatrix(F.col(key))
        elif isinstance(v, Expr) and v.name in _STREAM_HEADS:
            scope[key] = _compile(spark, sf_dir, v, scope)
        else:
            expr_text = _unparse(v) if isinstance(v, Expr) else v
            env = env.withColumn(key, parse_binding(expr_text, key, model_tags))
    scope["__env__"] = (env, [])
    scope["__tags__"] = model_tags
    out = next((p for p in node.pos if isinstance(p, Expr)), None)
    if out is not None:
        return _compile(spark, sf_dir, out, scope)
    if echo:
        names = [c.strip() for c in echo.split(",")] if echo not in ("true", "True") else [
            c for c in env.columns
        ]
        return env.select(*names), []
    raise ValueError("let() needs an output stream or echo=")


def _plot_stream(spark, sf_dir, node, scope):
    """PlotStream (PlotStream.java:151): one tuple (plot = the type string,
    data = the zipped [x, y] pairs); x defaults to 1..n when only y is
    given. Vector params are evaluator expressions or let()-bound names
    over the enclosing let() env."""
    from .evaluators import parse_eval

    env = scope.get("__env__", (spark.range(1).select(), []))[0]
    typ = node.named.get("type", "line")
    typ = _unparse(typ) if isinstance(typ, Expr) else typ
    vals = {}
    for k, v in node.named.items():
        if k == "type":
            continue
        vals[k] = parse_eval(_unparse(v) if isinstance(v, Expr) else v)
    if "y" not in vals:
        raise ValueError("plot() needs a y= vector")
    y = vals["y"]
    x = vals.get("x")
    if x is None:
        # filter-guarded: sequence() descends for an empty y ([1, 0])
        x = F.transform(
            F.filter(
                F.sequence(F.lit(1), F.greatest(F.size(y), F.lit(1))),
                lambda i: i <= F.size(y),
            ),
            lambda i: i.cast("double"),
        )
    data = F.zip_with(x, y, lambda a, b: F.array(a.cast("double"), b.cast("double")))
    return env.select(F.lit(typ).alias("plot"), data.alias("data")), []


def _zplot_stream(spark, sf_dir, node, scope):
    """ZplotStream (ZplotStream.java open()): explode let()-bound vectors
    into per-index tuples (columns in parameter order; x generated 0..n−1
    when y is given without x), or clusters= over a kmeans result (x, y,
    cluster name — the reference's first-two-dims projection). The dist=
    form needs the reference's 500k-draw empirical binning — out of the
    deterministic contract, rejected with a clear message."""
    from .evaluators import ClusterModel

    env = scope.get("__env__", (spark.range(1).select(), []))[0]
    tags = scope.get("__tags__", {})
    if "dist" in node.named:
        raise ValueError(
            "zplot(dist=…) samples 500k draws in the reference — use "
            "hist()/density() bindings with zplot vectors instead"
        )
    if "clusters" in node.named:
        var = node.named["clusters"]
        var = _unparse(var) if isinstance(var, Expr) else var
        tag = tags.get(var)
        if not isinstance(tag, ClusterModel):
            raise ValueError("zplot(clusters=…) needs a kmeans()-family binding")
        col = F.col(var)
        rows = F.zip_with(
            col["data"],
            col["assign"],
            lambda row, a: F.struct(
                F.element_at(row, 1).alias("x"),
                F.element_at(row, 2).alias("y"),
                F.concat(F.lit("cluster"), (a + 1).cast("string")).alias("cluster"),
            ),
        )
        return (
            env.select(F.explode(rows).alias("__t")).select(
                "__t.x", "__t.y", "__t.cluster"
            ),
            [],
        )
    from .evaluators import parse_eval

    arrs = []
    for k, v in node.named.items():
        arrs.append((k, parse_eval(_unparse(v) if isinstance(v, Expr) else v)))
    if not arrs:
        raise ValueError("zplot() needs vector parameters")
    n = F.size(arrs[0][1])
    keys = [k for k, _ in arrs]
    auto_x = "y" in keys and "x" not in keys
    rows = F.transform(
        # filter-guarded: sequence() descends for an empty vector
        F.filter(F.sequence(F.lit(1), F.greatest(n, F.lit(1))), lambda i: i <= n),
        lambda i: F.struct(
            *[F.element_at(c, i.cast("int")).alias(k) for k, c in arrs],
            *([(i - 1).cast("int").alias("x")] if auto_x else []),
        ),
    )
    out_cols = keys + (["x"] if auto_x else [])
    return (
        env.select(F.explode(rows).alias("__t")).select(
            *[f"__t.{k}" for k in out_cols]
        ),
        [],
    )


_CSV_SPLIT = r',(?=(?:[^"]*"[^"]*")*[^"]*$)'


def _csv_fields(line: str, tsv: bool) -> list[str]:
    """Driver-side header split — the same rules the row path applies
    (CsvStream.java split(): quote-aware comma regex, surrounding quotes
    stripped)."""
    parts = re.split("\t" if tsv else _CSV_SPLIT, line, flags=0)
    out = []
    for p in parts:
        if p.startswith('"') and p.endswith('"') and len(p) >= 2:
            p = p[1:-1]
        out.append(p)
    return out


def _parse_csv_stream(spark, sf_dir, node, scope, tsv: bool):
    """CsvStream/TsvStream (CsvStream.java:120): tuples carry ``file`` and
    ``line``; the first line of each file is its header, data rows emit
    id = file_lineNumber (absolute, header = line 1) plus one column per
    header field (empty fields → null). Headers are a plan-time schema
    discovery — one bounded driver read of line 1 per file, exactly like
    spark.read.csv's header inference; the row path stays Catalyst."""
    from pyspark.sql import Window

    sub, sort = _compile(spark, sf_dir, node.pos[0], scope)
    if "file" not in sub.columns or "line" not in sub.columns:
        raise ValueError("parseCSV() needs a stream with file and line fields")
    if not sort:
        raise ValueError("parseCSV() needs a sorted stream (line order)")
    order = [F.col(f).asc() if asc else F.col(f).desc() for f, asc in sort]
    df = sub.withColumn("__ln", F.row_number().over(Window.partitionBy("file").orderBy(*order)))
    headers = {
        r["file"]: _csv_fields(r["line"], tsv)
        for r in df.filter("__ln = 1").select("file", "line").collect()
    }
    all_cols: list[str] = []
    for f in sorted(headers):
        for c in headers[f]:
            if c not in all_cols:
                all_cols.append(c)
    split_pat = "\t" if tsv else _CSV_SPLIT
    frames = []
    for f in sorted(headers):
        cols = headers[f]
        part = df.filter((F.col("file") == f) & (F.col("__ln") > 1))
        fields = F.split(F.col("line"), split_pat, -1)
        ok = F.assert_true(
            F.size(fields) == len(cols),
            F.concat(
                F.lit("Headers and lines must have the same number of fields "),
                F.lit(f"[file:{f} line number:"),
                F.col("__ln").cast("string"),
                F.lit("]"),
            ),
        )

        def unquote(c):
            return F.regexp_replace(c, r'^"(.*)"$', r"$1")

        # the field-count assert rides a FILTER (true when the assert
        # passes) — attached to a projected column it could be pruned away
        # with that column and let malformed rows through silently
        part = part.where(ok.isNull())
        sel = [F.concat(F.col("file"), F.lit("_"), F.col("__ln")).alias("id")]
        for c in all_cols:
            if c in cols:
                val = unquote(F.element_at(fields, cols.index(c) + 1))
                sel.append(F.when(val != "", val).alias(c))
            else:
                sel.append(F.lit(None).cast("string").alias(c))
        frames.append(part.orderBy("__ln").select(*sel))
    if not frames:
        raise ValueError("parseCSV(): empty stream")
    out = frames[0]
    for fr in frames[1:]:
        out = out.unionByName(fr)
    return out, []


def _tuple_stream(spark, sf_dir, node, scope):
    """TupStream (TupStream.java:95): one tuple of evaluated params —
    literals, evaluator expressions (over the let() env when inside one),
    or stream params (collected as array<struct> cells)."""
    from .evaluators import parse_eval
    from .relational import cell_stream

    row = scope["__env__"][0] if "__env__" in scope else spark.range(1).select()
    for key, v in node.named.items():
        if isinstance(v, Expr) and v.name in _STREAM_HEADS:
            sub, _ = _compile(spark, sf_dir, v, scope)
            row = row.crossJoin(F.broadcast(cell_stream(sub, key)))
        elif isinstance(v, Expr):
            row = row.withColumn(key, parse_eval(_unparse(v)))
        else:
            row = row.withColumn(key, F.lit(v))
    return row.select(*node.named.keys())


# ---------------------------------------------------------------------------
# the TextLogit ML chain: features / train / model / classify


def _outcome_col(outcome: str) -> Column:
    """outcome= is a 0/1 column name, or a `field:value` clause marking the
    positive class (the engine's clause form — the reference requires a
    pre-materialized outcome field)."""
    if ":" in outcome:
        fld, val = outcome.split(":", 1)
        return (F.col(fld) == _lit(val)).cast("int")
    return F.col(outcome).cast("int")


def _features_select(spark, sf_dir, node):
    """FeaturesSelectionStream (FeaturesSelectionStream.java:57): top
    numTerms terms of `field` by information gain against the binary
    `outcome`. Emits the reference tuple shape (featureSet_s, index_i,
    term_s, score_f, idf_d); idf = ln((N+1)/(df+1)) — the engine's train()
    convention (deviation from the reference's ln(N/(df+1)), shared by both
    sides of the gate). Two scalar probes (N, positives) + one agg; H(p)
    math is pure Catalyst."""
    import math

    table = node.pos[0]
    named = node.named
    field = named.get("field", "text")
    fs = named.get("featureSet", "first")
    num_terms = int(named.get("numTerms", 8))
    base = _q_filter(_t(spark, sf_dir, table), named.get("q", "*:*"))
    d = base.select(
        _outcome_col(named["outcome"]).alias("y"),
        F.array_distinct(F.expr(_tok_expr(field))).alias("toks"),
    )
    n_docs = d.count()
    n_pos = d.filter("y = 1").count()
    counts = d.select("y", F.explode("toks").alias("term")).groupBy("term").agg(
        F.count("*").alias("df"), F.sum("y").alias("xc")
    )

    def H(p):
        return F.when((p <= 0) | (p >= 1), F.lit(0.0)).otherwise(
            -p * F.log(p) - (1.0 - p) * F.log(1.0 - p)
        )

    pc = float(n_pos) / float(n_docs) if n_docs else 0.0
    entropy_c = 0.0 if pc in (0.0, 1.0) else (-pc * math.log(pc) - (1 - pc) * math.log(1 - pc))
    dfc = F.col("df").cast("double")
    xc = F.col("xc").cast("double")
    score = (
        F.lit(entropy_c)
        - (dfc / F.lit(float(n_docs))) * H(xc / dfc)
        - (1.0 - dfc / F.lit(float(n_docs)))
        * H((F.lit(float(n_pos)) - xc) / (F.lit(float(n_docs)) - dfc + 1.0))
    )
    idf = F.log((F.lit(float(n_docs)) + 1.0) / (dfc + 1.0))
    ranked = (
        counts.select(
            F.lit(fs).alias("featureSet_s"),
            F.col("term").alias("term_s"),
            F.round(score, 4).alias("score_f"),
            F.round(idf, 6).alias("idf_d"),
        )
        .orderBy(F.col("score_f").desc(), F.col("term_s").asc())
        .limit(num_terms)
    )
    from pyspark.sql import Window

    w = Window.orderBy(F.col("score_f").desc(), F.col("term_s").asc())
    out = ranked.select(
        "featureSet_s",
        F.row_number().over(w).alias("index_i"),
        "term_s",
        "score_f",
        "idf_d",
    )
    return out, [("index_i", True)]


def _train_logit(spark, sf_dir, node):
    """TextLogitStream (TextLogitStream.java:60 + shard side
    TextLogisticRegressionQParserPlugin.java:188-210): logistic regression
    over tf-idf text features — vector intercept 1, vector[t] =
    idf_t·(1+ln tf) — weights initialised to 1.0, learning rate alpha.
    Deterministic deviation (documented at textops.train_logit_docs):
    full-batch GD with the gradient rounded to 6dp per iteration so
    cross-engine lockstep holds. Emits the reference's per-iteration tuple
    (name_s, iteration_i, terms_ss, weights_ds, idfs_ds, alpha_d, error_d);
    per iteration one corpus scan + one |features|-row agg; the weight
    vector is bounded driver model state, broadcast back."""
    table = node.pos[0]
    named = node.named
    field = named.get("field", "text")
    name = named.get("name", "model")
    iters = int(named.get("maxIterations", 3))
    alpha = float(named.get("alpha", 0.5))
    feats_node = next(p for p in node.pos[1:] if isinstance(p, Expr))
    if feats_node.name != "features":
        raise ValueError("train() expects a features(...) stream")
    fdf, _ = _features_select(spark, sf_dir, feats_node)
    frows = fdf.collect()  # bounded: numTerms rows of model state
    terms = [r["term_s"] for r in frows]
    idfs = {r["term_s"]: float(r["idf_d"]) for r in frows}
    base = _q_filter(_t(spark, sf_dir, table), named.get("q", "*:*"))
    d = base.select(
        F.monotonically_increasing_id().alias("__rid"),
        _outcome_col(named["outcome"]).cast("double").alias("y"),
        F.expr(_tok_expr(field)).alias("toks"),
    ).localCheckpoint(eager=True)  # pin __rid: it must not re-derive per job
    n_docs = d.count()
    tf = (
        d.select("__rid", F.explode("toks").alias("term"))
        .filter(F.col("term").isin(terms))
        .groupBy("__rid", "term")
        .agg(F.count("*").alias("tf"))
    )
    idf_map = F.create_map(*[F.lit(v) for kv in idfs.items() for v in kv])
    x = tf.select(
        "__rid",
        "term",
        (idf_map[F.col("term")] * (1.0 + F.log(F.col("tf").cast("double")))).alias("xv"),
    ).cache()
    y = d.select("__rid", "y")
    weights = {t: 1.0 for t in terms}
    w_int = 1.0
    records = []
    for it in range(1, iters + 1):
        w_map = F.create_map(*[F.lit(v) for kv in weights.items() for v in kv])
        dot = (
            y.join(x, "__rid", "left")
            .groupBy("__rid", "y")
            .agg(
                (
                    F.lit(w_int)
                    + F.coalesce(F.sum(F.col("xv") * w_map[F.col("term")]), F.lit(0.0))
                ).alias("z")
            )
        )
        err = dot.select(
            "__rid",
            (1.0 / (1.0 + F.exp(-F.col("z"))) - F.col("y")).alias("e"),
        )
        g_rows = (
            err.join(x, "__rid")
            .groupBy("term")
            .agg(F.round(F.sum(F.col("e") * F.col("xv")) / n_docs, 6).alias("g"))
            .collect()
        )
        stats = err.agg(
            F.round(F.sum("e") / n_docs, 6).alias("g"),
            F.round(F.sum(F.col("e") * F.col("e")), 6).alias("sse"),
        ).collect()[0]
        for r in g_rows:
            weights[r["term"]] -= alpha * r["g"]
        w_int -= alpha * stats["g"]
        records.append(
            (
                name,
                it,
                terms,
                [round(w_int, 6)] + [round(weights[t], 6) for t in terms],
                [round(idfs[t], 6) for t in terms],
                alpha,
                float(stats["sse"]),
            )
        )
    x.unpersist()
    out = spark.createDataFrame(
        records,
        "name_s string, iteration_i int, terms_ss array<string>, "
        "weights_ds array<double>, idfs_ds array<double>, alpha_d double, "
        "error_d double",
    )
    return out, [("iteration_i", True)]


def _classify(spark, sf_dir, node, scope):
    """ClassifyStream (ClassifyStream.java:41): score each tuple of the
    wrapped stream against a stored logistic model — probability_d =
    sigmoid(w·x), score_d = w·x, with the model's tf-idf feature convention
    (idf·(1+ln tf), intercept weight w[0]). The model is ONE bounded driver
    row; the per-term frame broadcasts against the stream's exploded
    tokens. key= names the tuple id used to regroup (default doc_id)."""
    model_node, stream_node = (p for p in node.pos if isinstance(p, Expr))
    mdf, _ = _compile(spark, sf_dir, model_node, scope)
    m = mdf.first()
    if m is None:
        raise ValueError("classify(): model not found")
    terms, weights, idfs = list(m["terms_ss"]), list(m["weights_ds"]), list(m["idfs_ds"])
    w_int = float(weights[0])
    tw = spark.createDataFrame(
        [(t, float(w), float(i)) for t, w, i in zip(terms, weights[1:], idfs)],
        "term string, w double, idf double",
    )
    df, sort = _compile(spark, sf_dir, stream_node, scope)
    field = node.named.get("field", "text")
    key = node.named.get("key", "doc_id")
    tf = (
        df.select(F.col(key).alias("__key"), F.explode(F.expr(_tok_expr(field))).alias("term"))
        .groupBy("__key", "term")
        .agg(F.count("*").alias("tf"))
    )
    z = (
        tf.join(F.broadcast(tw), "term")
        .groupBy("__key")
        .agg(
            (
                F.lit(w_int)
                + F.sum(F.col("idf") * (1.0 + F.log(F.col("tf").cast("double"))) * F.col("w"))
            ).alias("z")
        )
    )
    out = df.join(z, df[key] == z["__key"], "left").drop("__key")
    zc = F.coalesce(F.col("z"), F.lit(w_int))
    return (
        out.withColumn("score_d", F.round(zc, 4))
        .withColumn("probability_d", F.round(1.0 / (1.0 + F.exp(-zc)), 4))
        .drop("z")
    ), sort


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
