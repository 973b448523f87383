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
            kv[ident] = value
            i = j2
        else:
            # bare first token = the parser type (QueryParsing 'type' slot)
            if typ is not None:
                raise ValueError(f"two bare types in local params: {q!r}")
            typ = ident
            i = j
    body = kv.pop("v", None)
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
) -> DataFrame | Column:
    """Dispatch one local-params query string.

    ``lucene``/``boost`` need ``searcher`` (an :class:`IndexSearcher`);
    ``func``/``frange`` need ``frame`` (the relation whose columns the
    function reads) and return a scored frame / a filtered frame.
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
        f"unknown local-params type {typ!r} — block join/graph/collapse have "
        "dedicated operators (relational.block_join_*, graph.*, "
        "relational.collapse_expand_*)"
    )
