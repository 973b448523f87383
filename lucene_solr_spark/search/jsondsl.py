"""Solr JSON Request API — the JSON query DSL + request-body execution.

Reference:

- ``solr/core/src/java/org/apache/solr/request/json/JsonQueryConverter.java:30``
  (``toLocalParams`` — every JSON query object is converted to a
  ``{!type ...}`` local-params STRING, with nested sub-queries and bodies
  hoisted into generated ``$_tt<N>`` parameter refs). :func:`json_to_local_params`
  plays that role, so the whole DSL rides the existing
  :func:`~lucene_solr_spark.search.localparams.local_query` dispatcher —
  the same mechanism Solr uses (the DSL is sugar over QParserPlugins, not a
  second query engine).
- ``solr/core/src/java/org/apache/solr/search/BoolQParserPlugin.java:39``
  (the ``bool`` qparser the DSL leans on for composition: ``must`` /
  ``must_not`` / ``should`` / ``filter`` clause params, each multi-valued,
  combined with Lucene ``BooleanQuery`` occur semantics). Implemented in
  :mod:`~lucene_solr_spark.search.localparams` as doc-keyed frame algebra:
  must = score-summing inner join, should = optional add (mm=1 when no
  must), filter = non-scoring semi join, must_not = anti join — the
  columnar form of ``BooleanWeight``.
- ``solr/core/src/java/org/apache/solr/request/json/RequestUtil.java:80``
  (``processParams`` — the JSON body keys ``query`` / ``filter`` /
  ``fields`` / ``sort`` / ``offset`` / ``limit`` / ``params`` / ``queries``
  merged into the request). :func:`json_request` executes that body against
  an :class:`~lucene_solr_spark.search.executor.IndexSearcher` with the
  engine's two-phase retrieval: rank + page on the (segment_id, doc_id,
  score) hit frame FIRST, join stored fields for the surviving page only —
  unless the sort itself needs stored columns, in which case the fetch
  happens before the sort (the same PURPOSE_GET_FIELDS split the
  distributed search head uses).

Scale shape: one engine search per query/filter clause (term-pushed scans),
clause combination is equi-joins on (segment_id, doc_id) — AQE broadcasts
the selective sides; paging is TakeOrdered on the hit frame, so the stored-
fields join touches only ``offset+limit`` rows in the default
score-sorted case.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from .localparams import local_query

_IDS = ("segment_id", "doc_id")


def _quote(v: str) -> str:
    return "'" + v.replace("\\", "\\\\").replace("'", "\\'") + "'"


def _hoist(node, params: dict) -> str:
    """Store a (converted) sub-query under a fresh generated param name and
    return the ``$ref`` (JsonQueryConverter.putParam's ``_tt<N>`` names)."""
    # convert the child FIRST — it allocates its own _tt names; only then
    # pick this node's name from the post-conversion count
    converted = (
        json_to_local_params(node, params) if isinstance(node, dict) else str(node)
    )
    name = f"_tt{len([k for k in params if k.startswith('_tt')])}"
    while name in params:  # user params may collide with the generated names
        name = "_" + name
    params[name] = converted
    return "$" + name


def json_to_local_params(node, params: dict) -> str:
    """Convert one JSON query node to a ``{!type ...}`` local-params string
    (``JsonQueryConverter.toLocalParams``), appending generated ``_tt<N>``
    entries to ``params`` for hoisted sub-queries.

    - a string passes through verbatim (it may itself carry local params);
    - ``{"param": "ref"}`` becomes ``{!v=$ref}`` (resolve a named query —
      the ``queries`` section of a JSON request registers those);
    - ``{type: {...params...}}`` becomes ``{!type k=v ... v=$_ttN}`` — the
      ``query``/``v`` entry is the body, nested objects and multi-valued
      entries hoist each element into its own generated param (multi-valued
      ⇒ the key repeats, which is why
      :func:`~lucene_solr_spark.search.localparams.parse_local_params`
      collects repeated keys into lists);
    - ``{type: "text"}`` / ``{type: 3.5}`` shorthand becomes
      ``{!type v=$_ttN}``.
    """
    if isinstance(node, str):
        return node
    if not isinstance(node, dict):
        raise ValueError(f"a JSON query must be a string or an object, got {node!r}")
    if set(node) == {"param"}:
        return "{!v=$" + str(node["param"]) + "}"
    if len(node) != 1:
        raise ValueError(
            "a JSON query object must have exactly one parser key, got "
            + ", ".join(sorted(map(str, node)))
        )
    (typ, val), = node.items()
    if not isinstance(val, dict):
        return "{!" + typ + " v=" + _hoist(val, params) + "}"
    parts = [typ]
    for k, v in val.items():
        key = "v" if k in ("query", "v") else k
        if key == "v" or isinstance(v, dict):
            # bodies always hoist (JsonQueryConverter routes the query slot
            # through putParam so local-params quoting never interferes)
            parts.append(f"{key}={_hoist(v, params)}")
        elif isinstance(v, (list, tuple)):
            for item in v:
                parts.append(f"{key}={_hoist(item, params)}")
        elif isinstance(v, bool):
            parts.append(f"{key}={'true' if v else 'false'}")
        elif isinstance(v, (int, float)):
            parts.append(f"{key}={v}")
        else:
            sv = str(v)
            # generated/explicit $refs must stay unquoted to dereference
            parts.append(f"{key}={sv if sv.startswith('$') else _quote(sv)}")
    return "{!" + " ".join(parts) + "}"


def json_query(
    node,
    frame: DataFrame | None = None,
    searcher=None,
    params: dict | None = None,
    from_searcher=None,
):
    """Execute one JSON DSL query node: convert to local-params form and
    dispatch (the exact Solr pipeline — JSON → ``{!...}`` string →
    QParserPlugin)."""
    p = dict(params or {})
    q = json_to_local_params(node, p)
    return local_query(
        q, frame=frame, searcher=searcher, params=p, from_searcher=from_searcher
    )


def _parse_sort(spec) -> list[tuple[str, str]]:
    """Solr sort grammar: ``"field (asc|desc), ..."``."""
    if isinstance(spec, (list, tuple)):
        parts = list(spec)
    else:
        parts = [s for s in str(spec).split(",") if s.strip()]
    out = []
    for part in parts:
        toks = part.split()
        if len(toks) != 2 or toks[1] not in ("asc", "desc"):
            raise ValueError(f"bad sort clause {part!r}: want 'field asc|desc'")
        out.append((toks[0], toks[1]))
    if not out:
        raise ValueError(f"empty sort spec {spec!r}")
    return out


def _fields_list(spec) -> list[str]:
    if isinstance(spec, (list, tuple)):
        return [str(f) for f in spec]
    return [f for f in str(spec).replace(",", " ").split() if f]


_BODY_KEYS = {
    "query",
    "filter",
    "fields",
    "sort",
    "offset",
    "limit",
    "params",
    "queries",
    "facet",
}


def _split_tags(fq):
    """``{"#tag1,tag2": node}`` filter wrapper → (frozenset of tags, node)
    (the JSON request tagging syntax — multi-select faceting's ``ex``/
    ``tag`` mechanism, ``RequestUtil.java`` processes ``#``-prefixed
    keys)."""
    if isinstance(fq, dict) and len(fq) == 1:
        (k, v), = fq.items()
        if isinstance(k, str) and k.startswith("#"):
            return frozenset(t for t in k[1:].split(",") if t), v
    return frozenset(), fq


def request_parts(
    body: dict, searcher, params: dict | None = None
) -> tuple[DataFrame, list[tuple[frozenset, DataFrame]], dict]:
    """``(query hits, [(tags, filter hits)], resolved params)`` for a JSON
    request body — filters kept separate (with their ``#tag`` sets) so the
    facet module can re-compose the domain minus ``excludeTags`` filters
    (multi-select faceting)."""
    unknown = sorted(set(body) - _BODY_KEYS)
    if unknown:
        raise ValueError("unknown JSON request keys: " + ", ".join(unknown))
    if "query" not in body:
        raise ValueError("JSON request needs a 'query'")
    p = dict(params or {})
    p.update(body.get("params") or {})
    for name, node in (body.get("queries") or {}).items():
        p[name] = json_to_local_params(node, p)

    hits = json_query(body["query"], searcher=searcher, params=p)
    if not set(_IDS) <= set(hits.columns):
        raise ValueError(
            "the JSON request 'query' must resolve to searcher hits "
            f"(got columns {hits.columns})"
        )
    filters = body.get("filter") or []
    if isinstance(filters, (str, dict)):
        filters = [filters]
    parts = []
    for fq in filters:
        tags, node = _split_tags(fq)
        parts.append((tags, json_query(node, searcher=searcher, params=p)))
    return hits, parts, p


def request_hits(body: dict, searcher, params: dict | None = None) -> DataFrame:
    """The request's DOMAIN: run ``query`` + every ``filter`` clause and
    return the matching (segment_id, doc_id, score) frame — shared by
    :func:`json_request` (which pages it) and
    :func:`~lucene_solr_spark.search.jsonfacet.json_facets` (which
    aggregates over ALL of it — Solr facets count the full result set,
    not the returned page)."""
    hits, parts, _ = request_parts(body, searcher, params)
    for _, fh in parts:
        hits = hits.join(fh.select(*_IDS), list(_IDS), "left_semi")
    return hits


def json_request(body: dict, searcher, params: dict | None = None) -> DataFrame:
    """Execute a Solr JSON request body against ``searcher``
    (``RequestUtil.processParams`` + the SearchHandler flow).

    ``query`` (required) and each ``filter`` entry are JSON DSL nodes;
    filters are non-scoring semi joins (Solr ``fq`` semantics). ``queries``
    registers named sub-queries addressable via ``{"param": name}``.
    ``sort`` defaults to ``"score desc"`` (ties broken segment_id asc,
    doc_id asc — the engine's tie-break invariant); ``offset``/``limit``
    default to Solr's ``start=0``/``rows=10`` (``limit: None`` = all).
    ``fields`` defaults to every stored column (Solr ``fl=*`` — include
    ``"score"`` explicitly to get it, as in Solr). A ``facet`` section is
    accepted (it shapes the same body Solr takes) but evaluated by
    :func:`~lucene_solr_spark.search.jsonfacet.json_facets`, which returns
    the bucket frames — a DataFrame API can't nest facets inside the doc
    page the way one JSON response does.
    """
    hits = request_hits(body, searcher, params)
    sort = _parse_sort(body.get("sort", "score desc"))
    offset = int(body.get("offset", 0))
    limit = body.get("limit", 10)
    if limit is not None:
        limit = int(limit)
        if limit < 0:
            raise ValueError(f"limit must be >= 0, got {limit}")
    if offset < 0:
        raise ValueError(f"offset must be >= 0, got {offset}")

    docs_cols = searcher.spark.read.parquet(searcher.index_dir + "/docs").columns
    if "fields" in body:
        fields = _fields_list(body["fields"])
    else:
        fields = [c for c in docs_cols if c not in _IDS]  # Solr fl=* default
    known = set(docs_cols) | set(hits.columns) | {"score"}
    bad = sorted((set(fields) | {f for f, _ in sort}) - known)
    if bad:
        raise ValueError(f"unknown fields: {', '.join(bad)}")
    stored_needed = sorted(
        ({f for f, _ in sort} | set(fields)) - {"score"} - set(hits.columns)
    )
    order = [
        F.col(f).desc() if d == "desc" else F.col(f).asc() for f, d in sort
    ] + [F.col("segment_id").asc(), F.col("doc_id").asc()]

    def page(df: DataFrame) -> DataFrame:
        df = df.orderBy(*order)
        if offset:
            df = df.offset(offset)
        return df if limit is None else df.limit(limit)

    def join_stored(df: DataFrame, bounded: bool) -> DataFrame:
        if bounded:
            # ≤ offset+limit rows — the broadcast two-phase fetch
            return searcher.fetch(df, cols=stored_needed)
        # unbounded side (limit: None, or pre-sort fetch): a plain equi-
        # join — broadcasting the full match set would ship it to every
        # executor (and through the driver) at scale; let AQE size it
        docs = searcher.spark.read.parquet(searcher.index_dir + "/docs").select(
            *_IDS, *stored_needed
        )
        return df.join(docs, list(_IDS))

    if {f for f, _ in sort} <= set(hits.columns):
        # two-phase: rank + page on the hit frame, fetch stored fields for
        # the surviving page only (PURPOSE_GET_FIELDS)
        hits = page(hits)
        if stored_needed:
            # the join loses the page order — restore it
            hits = join_stored(hits, bounded=limit is not None).orderBy(*order)
    else:
        # the sort itself reads stored columns: fetch first, then page
        hits = page(join_stored(hits, bounded=False))
    return hits.select(*fields)
