"""Solr local-params syntax — ``{!type k=v ...}body`` parsing + dispatch.

Reference: ``solr/core/src/java/org/apache/solr/search/QueryParsing.java:66``
(``parseLocalParams`` — the ``{!...}`` prefix grammar: an implicit leading
``type``, ``k=v`` pairs with single- or double-quoted values and backslash
escapes, ``v=`` overriding the trailing body) and ``QParserPlugin.java``
(the type→parser registry).

``parse_local_params`` is the grammar; ``local_query`` dispatches the types
this engine implements onto its own operators:

- ``lucene`` (default) — the classic parser (``queryparser.parse_classic``)
  executed by the bound :class:`IndexSearcher`.
- ``func`` — FunctionQuery: score = the parsed function over the frame's
  columns (``FunctionQParserPlugin``).
- ``frange`` — FunctionRangeQuery: filter ``l <= f(x) <= u`` with
  ``incl``/``incu`` bounds (``FunctionRangeQParserPlugin``).
- ``boost`` — multiplicative boost of the wrapped query's score by a
  function (``BoostQParserPlugin``).

Dollar-sign parameter refs (``$qq``) resolve from the optional ``params``
dict; an unresolved ref raises (Solr resolves from the request — there is
no request here). Unknown types raise ``ValueError`` naming the type: the
block-join / graph / collapse surfaces have dedicated operators
(``relational.block_join_*``, ``graph.*``, ``relational.collapse_*``) that
need more context than one string (two frames, schemas) — same reason Solr
ships them as separate QParserPlugins.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _check_field(typ: str, lp: dict, known: tuple[str, ...] = ("content",)) -> None:
    """One field per index dir: an `f=` naming anything else would silently
    search the wrong field, so refuse loudly (the same contract as
    {!lucene}'s df= refusal)."""
    f = lp.get("f")
    if f is not None and f not in known:
        raise ValueError(
            f"{{!{typ}}} f={f!r}: this searcher indexes the {known[0]!r} "
            "field only"
        )


def parse_local_params(
    q: str, params: dict | None = None
) -> tuple[str, dict[str, str], str]:
    """``(type, local_params, body)`` for a ``{!...}rest`` string.

    Without the ``{!`` prefix the whole string is the body of the default
    ``lucene`` type. A ``v=`` local param replaces the trailing body
    (QueryParsing.java:160-166).
    """
    if not q.startswith("{!"):
        return "lucene", {}, q
    i = 2
    n = len(q)
    typ = None
    kv: dict[str, str] = {}

    def skip_ws(j):
        while j < n and q[j].isspace():
            j += 1
        return j

    while True:
        i = skip_ws(i)
        if i >= n:
            raise ValueError(f"missing '}}' in local params: {q!r}")
        if q[i] == "}":
            i += 1
            break
        # read an identifier
        j = i
        while j < n and (q[j].isalnum() or q[j] in "._-$"):
            j += 1
        ident = q[i:j]
        if not ident:
            raise ValueError(f"bad local params at {i}: {q!r}")
        j2 = skip_ws(j)
        if j2 < n and q[j2] == "=":
            # k=v with optional quoting
            j2 += 1
            quoted = False
            if j2 < n and q[j2] in "'\"":
                quoted = True
                quote = q[j2]
                j2 += 1
                val = []
                while j2 < n and q[j2] != quote:
                    if q[j2] == "\\" and j2 + 1 < n:
                        j2 += 1
                    val.append(q[j2])
                    j2 += 1
                if j2 >= n:
                    raise ValueError(f"unterminated quote in local params: {q!r}")
                j2 += 1
                value = "".join(val)
            else:
                k0 = j2
                while j2 < n and not q[j2].isspace() and q[j2] != "}":
                    j2 += 1
                value = q[k0:j2]
            # Solr dereferences only UNQUOTED $refs (QueryParsing StrParser
            # getQuotedString vs getId) — quoted '$...' is a literal
            if not quoted and value.startswith("$"):
                ref = value[1:]
                if params is None or ref not in params:
                    raise ValueError(f"unresolved param ref ${ref} in {q!r}")
                value = str(params[ref])
            # repeated keys collect into a list — Solr local params are
            # multi-valued (the {!bool} clause params and the JSON DSL's
            # converted lists rely on it)
            if ident in kv:
                prev = kv[ident]
                kv[ident] = (prev if isinstance(prev, list) else [prev]) + [value]
            else:
                kv[ident] = value
            i = j2
        else:
            # bare first token = the parser type (QueryParsing 'type' slot)
            if typ is not None:
                raise ValueError(f"two bare types in local params: {q!r}")
            typ = ident
            i = j
    body = kv.pop("v", None)
    if isinstance(body, list):
        raise ValueError(f"v= given more than once in {q!r}")
    if body is None:
        body = q[i:]
    elif q[i:].strip():
        raise ValueError(f"both v= and trailing body in {q!r}")
    return (typ or "lucene"), kv, body


def local_query(
    q: str,
    frame: DataFrame | None = None,
    searcher=None,
    params: dict | None = None,
    from_searcher=None,
) -> DataFrame | Column:
    """Dispatch one local-params query string.

    ``lucene``/``boost`` need ``searcher`` (an :class:`IndexSearcher`);
    ``func``/``frange`` need ``frame`` (the relation whose columns the
    function reads) and return a scored frame / a filtered frame.
    ``from_searcher`` is ``{!join}``'s ``fromIndex`` role: the index the
    body query runs against when it differs from the to-side ``searcher``.
    """
    from ..functions import parse_func

    typ, lp, body = parse_local_params(q, params)
    if typ == "lucene":
        if searcher is None:
            raise ValueError("{!lucene} needs a searcher")
        if lp:
            # one field per index dir — df/q.op can't be honored; refuse
            # loudly instead of silently searching the wrong field
            raise ValueError(
                "unsupported {!lucene} local params: " + ", ".join(sorted(lp))
            )
        if body.lstrip().startswith("{!"):
            # a dereferenced $param may itself be a local-params query —
            # QParser.subQuery re-detects the {! prefix (the JSON DSL's
            # named-queries section depends on this)
            return local_query(
                body.lstrip(),
                frame=frame,
                searcher=searcher,
                params=params,
                from_searcher=from_searcher,
            )
        return searcher.search(body, k=None)
    if typ == "func":
        if frame is None:
            raise ValueError("{!func} needs a frame")
        return frame.withColumn("score", parse_func(body).cast("double"))
    if typ == "frange":
        if frame is None:
            raise ValueError("{!frange} needs a frame")
        f = parse_func(body)
        cond = None
        if "l" in lp:
            lo = float(lp["l"])
            c = (f >= lo) if lp.get("incl", "true") != "false" else (f > lo)
            cond = c
        if "u" in lp:
            hi = float(lp["u"])
            c = (f <= hi) if lp.get("incu", "true") != "false" else (f < hi)
            cond = c if cond is None else (cond & c)
        if cond is None:
            raise ValueError("{!frange} needs l= and/or u=")
        return frame.filter(cond)
    if typ == "boost":
        if searcher is None:
            raise ValueError("{!boost} needs a searcher")
        b = lp.get("b")
        if not b:
            raise ValueError("{!boost} needs b=function")
        hits = searcher.search(body, k=None)
        docs = searcher.spark.read.parquet(searcher.index_dir + "/docs")
        joined = hits.join(docs, ["segment_id", "doc_id"])
        return joined.select(
            "segment_id",
            "doc_id",
            (F.col("score").cast("double") * parse_func(b).cast("double")).alias(
                "score"
            ),
        )
    if typ in ("geofilt", "bbox"):
        # SpatialFilterQParserPlugin (solr/core/.../search/
        # SpatialFilterQParserPlugin.java:42): {!geofilt sfield=lat,lon
        # pt=40.7,-74.0 d=km} keeps rows within d km great-circle distance;
        # {!bbox} keeps the circle's BOUNDING BOX (cheaper, a superset —
        # LatLonType.createSpatialQuery's box path). sfield names the two
        # coordinate COLUMNS of the frame (one spatial field = a lat/lon
        # column pair here). Both stay pure Catalyst — pushdown-friendly
        # range predicates for bbox, one haversine expression for geofilt.
        if frame is None:
            raise ValueError(f"{{!{typ}}} needs a frame")
        from ..functions import _EARTH_RADIUS_KM, _haversine

        try:
            lat_c, lon_c = (c.strip() for c in lp["sfield"].split(","))
            lat0, lon0 = (float(v) for v in lp["pt"].split(","))
            d_km = float(lp["d"])
        except KeyError as exc:
            raise ValueError(f"{{!{typ}}} needs sfield=, pt=, d=") from exc
        lat, lon = F.col(lat_c), F.col(lon_c)
        if typ == "geofilt":
            return frame.filter(
                _haversine(F.lit(lat0), F.lit(lon0), lat, lon) <= d_km
            )
        import math as _math

        dlat = _math.degrees(d_km / _EARTH_RADIUS_KM)
        dlon = _math.degrees(
            d_km / (_EARTH_RADIUS_KM * _math.cos(_math.radians(lat0)))
        )
        return frame.filter(
            lat.between(lat0 - dlat, lat0 + dlat)
            & lon.between(lon0 - dlon, lon0 + dlon)
        )
    if typ in ("term", "raw"):
        # TermQParserPlugin / RawQParserPlugin (solr/core/.../search/
        # TermQParserPlugin.java:40, RawQParserPlugin.java:35): the body is
        # ONE term, no query-syntax parsing. `term` normalizes through the
        # field type (here: the lowercase dictionary); `raw` is verbatim.
        if searcher is None:
            raise ValueError(f"{{!{typ}}} needs a searcher")
        _check_field(typ, lp)
        from .query import TermQuery

        text = body.strip()
        return searcher.search_many(
            {0: TermQuery(text.lower() if typ == "term" else text)}, k=None
        ).drop("qid")
    if typ == "prefix":
        # PrefixQParserPlugin (solr/core/.../search/PrefixQParserPlugin.java)
        if searcher is None:
            raise ValueError("{!prefix} needs a searcher")
        _check_field(typ, lp)
        from .query import PrefixQuery

        return searcher.search_many(
            {0: PrefixQuery(prefix=body.strip().lower())}, k=None
        ).drop("qid")
    if typ == "graphTerms":
        # GraphTermsQParserPlugin (solr/core/.../search/GraphTermsQParserPlugin
        # .java:62): a terms filter that DROPS terms whose docFreq exceeds
        # maxDocFreq — gatherNodes uses it to skip super-nodes. The df check
        # reads the published term_stats (pushdown point-reads), never
        # postings.
        if searcher is None:
            raise ValueError("{!graphTerms} needs a searcher")
        _check_field(typ, lp)
        from .query import TermInSetQuery

        max_df = int(lp.get("maxDocFreq", 2**31 - 1))
        want = [t.strip().lower() for t in body.split(",") if t.strip()]
        keep = tuple(
            r["term"]
            for r in searcher._term_stats_df.filter(
                F.col("term").isin(want) & (F.col("df") <= max_df)
            )
            .select("term")
            .collect()
        )
        return searcher.search_many(
            {0: TermInSetQuery(set_terms=keep)}, k=None
        ).drop("qid")
    if typ == "maxscore":
        # MaxScoreQParserPlugin (solr/core/.../search/MaxScoreQParserPlugin
        # .java:35): parse like lucene, but SHOULD clauses score as the MAX
        # of their sub-scores (wrapped in a DisjunctionMaxQuery with `tie`)
        # instead of the sum.
        if searcher is None:
            raise ValueError("{!maxscore} needs a searcher")
        from .query import BooleanQuery, DisjunctionMaxQuery, parse_query

        tie = float(lp.get("tie", "0.0"))
        q = parse_query(body, searcher.analyzer)
        if isinstance(q, BooleanQuery) and len(q.should) > 1:
            q = BooleanQuery(
                must=q.must + (DisjunctionMaxQuery(q.should, tie),),
                should=(),
                must_not=q.must_not,
                filter=q.filter,
            )
        return searcher.search_many({0: q}, k=None).drop("qid")
    if typ == "join":
        # JoinQParserPlugin (solr/core/.../search/JoinQParserPlugin.java:63)
        # + ScoreJoinQParserPlugin (ScoreJoinQParserPlugin.java:57): run the
        # body query against the FROM side, collect matching docs' `from`
        # field values, keep every to-side doc whose `to` field equals one.
        # score= aggregates the from-doc BM25 scores per join value
        # (ScoreMode None/Avg/Max/Total/Min); default none = constant 1.0.
        # Spark shape: to-side docs equi-join the (value, agg-score)
        # relation — its size is bounded by the from-query's distinct join
        # values, so AQE broadcasts it when small and shuffles when not;
        # never an all-pairs comparison. The stored to-field being
        # single-valued makes per-value aggregation exact (each to-doc
        # matches exactly one join value).
        if searcher is None:
            raise ValueError("{!join} needs a searcher")
        f_from, f_to = lp.get("from"), lp.get("to")
        if not f_from or not f_to:
            raise ValueError("{!join} needs from= and to=")
        mode = lp.get("score", "none")
        if mode not in ("none", "avg", "max", "total", "min"):
            raise ValueError(
                f"{{!join}} score={mode!r}: one of none|avg|max|total|min"
            )
        src = from_searcher if from_searcher is not None else searcher
        from_docs = src.spark.read.parquet(src.index_dir + "/docs")
        if f_from not in from_docs.columns:
            raise ValueError(
                f"{{!join}} from={f_from!r}: not a stored field "
                f"(have: {', '.join(from_docs.columns)})"
            )
        to_docs = searcher.spark.read.parquet(searcher.index_dir + "/docs")
        if f_to not in to_docs.columns:
            raise ValueError(
                f"{{!join}} to={f_to!r}: not a stored field "
                f"(have: {', '.join(to_docs.columns)})"
            )
        vals = (
            src.search(body, k=None)
            .join(from_docs, ["segment_id", "doc_id"])
            .select(
                F.col(f_from).alias("_jv"),
                F.col("score").cast("double").alias("_js"),
            )
        )
        to_side = to_docs.select(
            "segment_id", "doc_id", F.col(f_to).alias("_jv")
        )
        if mode == "none":
            keep = vals.select("_jv").distinct()
            return to_side.join(keep, "_jv", "left_semi").select(
                "segment_id", "doc_id", F.lit(1.0).alias("score")
            )
        agg = {"avg": F.avg, "max": F.max, "min": F.min, "total": F.sum}[mode]
        per_val = vals.groupBy("_jv").agg(agg("_js").alias("_s"))
        return to_side.join(per_val, "_jv").select(
            "segment_id", "doc_id", F.col("_s").alias("score")
        )
    if typ == "terms":
        # TermsQParserPlugin (solr/core/.../search/TermsQParserPlugin.java:71):
        # raw term values, NO analysis (the plugin builds TermInSetQuery over
        # the verbatim bytes); separator defaults to ','.
        sep = lp.get("separator", ",")
        vals = [v for v in body.split(sep) if v != ""]
        f = lp.get("f")
        if frame is not None:
            if not f:
                raise ValueError("{!terms} needs f=")
            if f not in frame.columns:
                raise ValueError(
                    f"{{!terms}} f={f!r}: not a column "
                    f"(have: {', '.join(frame.columns)})"
                )
            return frame.filter(F.col(f).isin(vals))
        if searcher is None:
            raise ValueError("{!terms} needs a frame or a searcher")
        if f is not None and f != "content":
            # a STORED field: the docValues method of TermsQParserPlugin —
            # constant-score filter over the column (parquet pushes the IN
            # predicate into the scan)
            docs = searcher.spark.read.parquet(searcher.index_dir + "/docs")
            if f not in docs.columns:
                raise ValueError(
                    f"{{!terms}} f={f!r}: not a stored field "
                    f"(have: {', '.join(docs.columns)})"
                )
            return docs.filter(F.col(f).isin(vals)).select(
                "segment_id", "doc_id", F.lit(1.0).alias("score")
            )
        from .query import TermInSetQuery

        return searcher.search_many(
            {0: TermInSetQuery(set_terms=tuple(vals))}, k=None
        ).drop("qid")
    if typ == "switch":
        # SwitchQParserPlugin (solr/core/.../search/SwitchQParserPlugin.java:
        # 144): the body selects among case.<val> params (whitespace-only
        # body → the bare `case` param), falling back to default=; the
        # selected value is itself a query string, dispatched recursively.
        val = body.strip()
        sel = lp.get("case") if not val else lp.get("case." + val)
        if sel is None:
            sel = lp.get("default")
        if sel is None:
            raise ValueError(
                f"{{!switch}}: no case matching {val!r} and no default="
            )
        return local_query(
            sel,
            frame=frame,
            searcher=searcher,
            params=params,
            from_searcher=from_searcher,
        )
    if typ in ("parent", "child"):
        # BlockJoinParentQParserPlugin.java:30 / BlockJoinChildQParserPlugin
        # .java:27 over Solr's nested-document model: every row carries its
        # block root in `_root_` (update/AddUpdateCommand.java:160 assigns it
        # at flatten time), so a "block" is a _root_ group rather than an
        # index-adjacency run — the columnar form of ToParent/ToChildBlock-
        # JoinQuery. which=/of= is the allParents filter; the body matches
        # children ({!parent}) or parents ({!child}). Bodies may themselves
        # be local-params queries — a scored child sub-query ({!func}) feeds
        # {!parent}'s score= aggregation (ScoreMode, default none = 1.0).
        # Spark shape: one partitioned agg over _root_ + one equi-join; the
        # matched-root relation is query-selective so AQE broadcasts it.
        if frame is None:
            raise ValueError(f"{{!{typ}}} needs a frame")
        if "_root_" not in frame.columns:
            raise ValueError(
                f"{{!{typ}}} needs a _root_ column "
                "(Solr nested-doc block key)"
            )
        key = "which" if typ == "parent" else "of"
        pred = lp.get(key)
        if not pred:
            raise ValueError(f"{{!{typ}}} needs {key}=")
        parents_mask = F.expr(pred)

        def _sub(rows, expr_text):
            if expr_text.lstrip().startswith("{!"):
                out = local_query(
                    expr_text, frame=rows, searcher=searcher, params=params
                )
            else:
                out = rows.filter(F.expr(expr_text))
            if "score" not in out.columns:
                out = out.withColumn("score", F.lit(1.0))
            return out

        if typ == "parent":
            mode = lp.get("score", "none")
            if mode not in ("none", "avg", "max", "total", "min"):
                raise ValueError(
                    f"{{!parent}} score={mode!r}: one of "
                    "none|avg|max|total|min"
                )
            matched = _sub(frame.filter(~parents_mask), body)
            parents = frame.filter(parents_mask)
            if "score" in parents.columns:
                parents = parents.drop("score")
            if mode == "none":
                roots = matched.select("_root_").distinct()
                return parents.join(roots, "_root_", "left_semi").withColumn(
                    "score", F.lit(1.0)
                )
            agg = {
                "avg": F.avg("score"),
                "max": F.max("score"),
                "min": F.min("score"),
                "total": F.sum("score"),
            }[mode]
            roots = matched.groupBy("_root_").agg(
                agg.cast("double").alias("_bjs")
            )
            return parents.join(roots, "_root_").withColumnRenamed(
                "_bjs", "score"
            )
        matched = _sub(frame.filter(parents_mask), body)
        roots = matched.select("_root_").distinct()
        return frame.filter(~parents_mask).join(roots, "_root_", "left_semi")
    if typ == "surround":
        # SurroundQParserPlugin (solr/core/.../search/SurroundQParserPlugin
        # .java:33) → the surround W/N span parser
        if searcher is None:
            raise ValueError("{!surround} needs a searcher")
        from .surround import parse_surround

        return searcher.search_many(
            {0: parse_surround(body, searcher=searcher)}, k=None
        ).drop("qid")
    if typ == "complexphrase":
        # ComplexPhraseQParserPlugin (solr/core/.../search/ComplexPhrase-
        # QParserPlugin.java:36), inOrder local param
        if searcher is None:
            raise ValueError("{!complexphrase} needs a searcher")
        from .queryparser import parse_complex_phrase

        in_order = lp.get("inOrder", "true") != "false"
        return searcher.search_many(
            {0: parse_complex_phrase(searcher, body, in_order=in_order)},
            k=None,
        ).drop("qid")
    if typ == "xmlparser":
        # XmlQParserPlugin (solr/core/.../search/XmlQParserPlugin.java:40)
        # → the CoreParser element tree
        if searcher is None:
            raise ValueError("{!xmlparser} needs a searcher")
        from .xmlparser import parse_xml_query

        return searcher.search_many(
            {0: parse_xml_query(body, analyzer=searcher.analyzer)}, k=None
        ).drop("qid")
    if typ in ("edismax", "dismax"):
        # DisMaxQParserPlugin (solr/core/.../search/DisMaxQParserPlugin
        # .java:40) / ExtendedDismaxQParser (ExtendedDismaxQParser.java:129):
        # local params carry qf/mm/tie/pf/ps (+pf2/ps2/pf3/ps3/bq/bf/boost
        # for edismax). Per-field indexes are fixed at EDisMaxSearcher
        # construction — qf re-weights and RESTRICTS that set; a field with
        # no configured index is a loud error (same contract as {!lucene}'s
        # df= refusal). qf/tie overrides apply to a shallow COPY so the
        # shared searcher is never mutated.
        from .edismax import EDisMaxSearcher

        if not isinstance(searcher, EDisMaxSearcher):
            raise ValueError(
                f"{{!{typ}}} needs an EDisMaxSearcher (per-field qf indexes); "
                f"got {type(searcher).__name__ if searcher is not None else None}"
            )
        allowed = {"qf", "mm", "tie", "pf", "ps", "bq", "bf"}
        if typ == "edismax":
            allowed |= {"pf2", "ps2", "pf3", "ps3", "boost"}
        unknown = sorted(set(lp) - allowed)
        if unknown:
            raise ValueError(
                f"unsupported {{!{typ}}} local params: " + ", ".join(unknown)
            )
        eds = searcher

        def _field_boosts(spec) -> dict[str, float]:
            # Solr qf/pf syntax: whitespace-separated field^boost tokens;
            # repeated params (a list here) append, like Solr's multi-
            # valued qf
            if isinstance(spec, list):
                spec = " ".join(spec)
            out: dict[str, float] = {}
            for tok in spec.split():
                fld, _, bst = tok.partition("^")
                if fld not in eds.searchers:
                    raise ValueError(
                        f"{{!{typ}}} field {fld!r}: no configured index "
                        f"(have: {', '.join(sorted(eds.searchers))})"
                    )
                out[fld] = float(bst) if bst else 1.0
            return out

        if "qf" in lp or "tie" in lp:
            import copy as _copy

            override = _copy.copy(eds)
            if "tie" in lp:
                override.tie = float(lp["tie"])
            if "qf" in lp:
                qf = _field_boosts(lp["qf"])
                if not qf:
                    raise ValueError(f"{{!{typ}}} qf= names no fields")
                override.boosts = qf
                override.searchers = {f: eds.searchers[f] for f in qf}
            eds = override
        def _scalar(key):
            v = lp[key]
            if isinstance(v, list):
                raise ValueError(f"{{!{typ}}} {key}= given more than once")
            return v

        kwargs: dict = {"k": None}
        if "mm" in lp:
            kwargs["mm"] = _scalar("mm")
        for key in ("pf", "pf2", "pf3"):
            if key in lp:
                kwargs[key] = _field_boosts(lp[key])
        for key in ("ps", "ps2", "ps3"):
            if key in lp:
                kwargs[key] = int(_scalar(key))
        for key in ("bq", "bf", "boost"):
            if key in lp:
                # genuinely multi-valued in Solr — flatten repeated params
                v = lp[key]
                kwargs[key] = v if isinstance(v, list) else [v]
        return eds.search(body, **kwargs)
    if typ == "bool":
        # BoolQParserPlugin (solr/core/.../search/BoolQParserPlugin.java:39):
        # clause params must/must_not/should/filter, each multi-valued (the
        # JSON DSL emits one repeated key per clause element), combined with
        # BooleanQuery occur semantics over doc-keyed hit frames — the
        # columnar BooleanWeight: must = score-summing inner join, should =
        # optional score add (mm=1 when no must: BooleanWeight's implicit
        # minimum-should-match), filter = non-scoring semi join, must_not =
        # anti join. Clause values are query strings dispatched recursively,
        # so any searcher-backed qparser composes. Spark shape: equi-joins
        # on (segment_id, doc_id); each clause frame is query-selective so
        # AQE broadcasts the small sides — no all-pairs work.
        if body.strip():
            raise ValueError("{!bool} takes clause params, not a body")
        ids = ["segment_id", "doc_id"]

        def _clauses(name):
            v = lp.get(name)
            vals = [] if v is None else (v if isinstance(v, list) else [v])
            out = []
            for s in vals:
                d = local_query(
                    s,
                    frame=frame,
                    searcher=searcher,
                    params=params,
                    from_searcher=from_searcher,
                )
                if not isinstance(d, DataFrame) or not set(ids) <= set(d.columns):
                    raise ValueError(
                        f"{{!bool}} {name} clause {s!r} must resolve to "
                        "searcher hits (frame predicates compose with plain "
                        "Catalyst filters instead)"
                    )
                s_col = (
                    F.col("score").cast("double")
                    if "score" in d.columns
                    else F.lit(1.0)
                )
                out.append(d.select(*ids, s_col.alias("_s")))
            return out

        must, should = _clauses("must"), _clauses("should")
        filt, must_not = _clauses("filter"), _clauses("must_not")
        if not (must or should or filt):
            raise ValueError("{!bool} needs at least one positive clause")
        hits = None
        for d in must:
            if hits is None:
                hits = d
            else:
                hits = hits.join(d.withColumnRenamed("_s", "_s2"), ids).select(
                    *ids, (F.col("_s") + F.col("_s2")).alias("_s")
                )
        if hits is None and should:
            # pure disjunction: at least one SHOULD must match
            from functools import reduce

            u = reduce(lambda a, b: a.unionByName(b), should)
            hits = u.groupBy(*ids).agg(F.sum("_s").alias("_s"))
        elif should:
            for d in should:
                hits = hits.join(
                    d.withColumnRenamed("_s", "_s2"), ids, "left"
                ).select(
                    *ids,
                    (F.col("_s") + F.coalesce(F.col("_s2"), F.lit(0.0))).alias(
                        "_s"
                    ),
                )
        if hits is None:
            # filter-only: matches the filters, scores 0 (BooleanWeight's
            # non-scoring-clauses-only case)
            hits = filt[0].select(*ids, F.lit(0.0).alias("_s"))
            filt = filt[1:]
        for d in filt:
            hits = hits.join(d.select(*ids), ids, "left_semi")
        for d in must_not:
            hits = hits.join(d.select(*ids), ids, "left_anti")
        return hits.select(*ids, F.col("_s").alias("score"))
    if typ == "graph":
        # GraphQParserPlugin (solr/core/.../search/join/GraphQParserPlugin
        # .java:30 + GraphQuery.java:47): BFS over same-collection edges —
        # collect the current docs' toField edge ids, next hop = docs whose
        # fromField is one of them; maxDepth counts start nodes as depth 1;
        # returnRoot / onlyLeafNodes (no toField values) / traversalFilter
        # (applied to every hop's candidates, not the roots) as in the
        # reference. Spark shape: per-level distinct edge-id relation
        # equi-joined back to the frame (AQE broadcasts the frontier),
        # visited anti-join guarantees strict growth so the loop terminates
        # in ≤ |nodes| levels; localCheckpoint per level cuts lineage (the
        # shortest_path pattern). The only driver-side value per level is
        # ONE count() emptiness probe.
        from pyspark.sql.types import ArrayType

        if frame is None:
            raise ValueError("{!graph} needs a frame")
        f_from = lp.get("from", "node_id")
        f_to = lp.get("to", "edge_ids")
        for f in (f_from, f_to):
            if f not in frame.columns:
                raise ValueError(
                    f"{{!graph}} field {f!r}: not a column "
                    f"(have: {', '.join(frame.columns)})"
                )
        max_depth = int(lp.get("maxDepth", "-1"))
        return_root = lp.get("returnRoot", "true") != "false"
        only_leaf = lp.get("onlyLeafNodes", "false") == "true"
        trav = lp.get("traversalFilter")
        to_is_array = isinstance(frame.schema[f_to].dataType, ArrayType)

        def _edge_vals(rows: DataFrame) -> DataFrame:
            c = F.explode(F.col(f_to)) if to_is_array else F.col(f_to)
            return (
                rows.select(c.alias(f_from))
                .filter(F.col(f_from).isNotNull())
                .distinct()
            )

        roots = frame.filter(F.expr(body)).localCheckpoint(eager=False)
        cand = frame.filter(F.expr(trav)) if trav else frame
        visited_ids = roots.select(f_from).distinct()
        levels = [roots]
        frontier = roots
        # GraphQuery.java:190-231: the root set is depth 0 (currentDepth
        # starts there) and maxDepth counts EDGE HOPS — maxDepth=1 returns
        # roots plus their direct neighbors. (The class javadoc's "start
        # nodes is depth=1" comment contradicts the code; the code wins.)
        depth = 0
        while max_depth < 0 or depth < max_depth:
            nxt = (
                cand.join(_edge_vals(frontier), f_from, "left_semi")
                .join(visited_ids, f_from, "left_anti")
                .localCheckpoint(eager=False)
            )
            if nxt.limit(1).count() == 0:
                break
            levels.append(nxt)
            # checkpoint the growing visited set too — without it the
            # anti-join's lineage deepens every level and a long chain
            # (graph diameter ≈ levels) goes quadratic
            visited_ids = (
                visited_ids.unionByName(nxt.select(f_from).distinct())
                .distinct()
                .localCheckpoint(eager=False)
            )
            frontier = nxt
            depth += 1
        from functools import reduce

        out = reduce(lambda a, b: a.unionByName(b), levels[0 if return_root else 1:] or [roots.limit(0)])
        if only_leaf:
            leaf = (
                (F.col(f_to).isNull() | (F.size(f_to) == 0))
                if to_is_array
                else F.col(f_to).isNull()
            )
            out = out.filter(leaf)
        return out
    if typ == "collapse":
        # CollapsingQParserPlugin (solr/core/.../search/
        # CollapsingQParserPlugin.java:120): collapse the result set to one
        # head doc per collapse-field group — default head = highest score,
        # min=/max= pick by a field instead; nullPolicy ignore (drop null-
        # field docs, the default) | expand (each null doc is its own
        # group) | collapse (all nulls form one group). Frame shape: ONE
        # partitioned window (parallel across groups; the gated
        # relational.collapse_expand_* ops are the paged two-stage
        # variant with expansion).
        from pyspark.sql import Window

        if frame is None:
            raise ValueError("{!collapse} needs a frame")
        fld = lp.get("field")
        if not fld:
            raise ValueError("{!collapse} needs field=")
        if fld not in frame.columns:
            raise ValueError(
                f"{{!collapse}} field {fld!r}: not a column "
                f"(have: {', '.join(frame.columns)})"
            )
        rows = frame.filter(F.expr(body)) if body.strip() else frame
        policy = lp.get("nullPolicy", "ignore")
        if policy not in ("ignore", "expand", "collapse"):
            raise ValueError(
                f"{{!collapse}} nullPolicy={policy!r}: ignore|expand|collapse"
            )
        sel_min, sel_max = lp.get("min"), lp.get("max")
        if sel_min and sel_max:
            raise ValueError("{!collapse} takes min= or max=, not both")
        for sel in (sel_min, sel_max):
            if sel and sel not in rows.columns:
                raise ValueError(
                    f"{{!collapse}} selector {sel!r}: not a column "
                    f"(have: {', '.join(rows.columns)})"
                )
        if sel_min:
            order = [F.col(sel_min).asc()]
        elif sel_max:
            order = [F.col(sel_max).desc()]
        elif "score" in rows.columns:
            order = [F.col("score").desc()]
        else:
            raise ValueError(
                "{!collapse} needs min=/max= when the frame has no score "
                "column"
            )
        # deterministic head on order ties: engine doc ids when present
        # (Solr's lowest-docid tie-break), else every remaining column —
        # an under-specified window would pick a different head per run
        tie_cols = [c for c in ("segment_id", "doc_id") if c in rows.columns]
        if not tie_cols:
            used = {fld, sel_min, sel_max, "score" if not (sel_min or sel_max) else None}
            tie_cols = [c for c in rows.columns if c not in used]
        order += [F.col(c).asc() for c in tie_cols]
        nn = rows.filter(F.col(fld).isNotNull())
        nulls = rows.filter(F.col(fld).isNull())
        if policy == "collapse":
            nn = nn.unionByName(nulls)  # one shared null group
            nulls = nulls.limit(0)
        w = Window.partitionBy(fld).orderBy(*order)
        heads = (
            nn.withColumn("_cr", F.row_number().over(w))
            .filter(F.col("_cr") == 1)
            .drop("_cr")
        )
        return heads.unionByName(nulls) if policy == "expand" else heads
    if typ == "rerank":
        # ReRankQParserPlugin ({!rerank reRankQuery=.. reRankDocs=N
        # reRankWeight=W}main) → QueryRescorer two-phase combine
        if searcher is None:
            raise ValueError("{!rerank} needs a searcher")
        rq = lp.get("reRankQuery")
        if not rq:
            raise ValueError("{!rerank} needs reRankQuery=")
        n = int(lp.get("reRankDocs", "200"))
        w = float(lp.get("reRankWeight", "2.0"))
        first = searcher.search(body, k=n)
        return searcher.rescore(first, rq, weight=w, k=n)
    raise ValueError(
        f"unknown local-params type {typ!r} — expand-after-collapse and "
        "block join over two tables have dedicated operators "
        "(relational.collapse_expand_*, relational.block_join_*); "
        "cross-collection graph walks: graph.*"
    )
