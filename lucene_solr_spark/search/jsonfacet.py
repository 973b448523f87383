"""Solr JSON Facet API — terms / range / query facets with nested
aggregations and sub-facets, evaluated over the search domain.

Reference:

- ``solr/core/src/java/org/apache/solr/search/facet/FacetModule.java:48``
  (the ``json.facet`` request section; facets aggregate the FULL query
  result set, independent of the returned doc page),
- ``FacetField.java`` / ``FacetFieldProcessor.java`` (terms facets:
  ``field`` / ``limit`` / ``mincount`` / ``sort`` / nested ``facet``; ties
  and the final bucket order resolve by index order — here: bucket value
  ascending),
- ``FacetRange.java:40`` (``start`` / ``end`` / ``gap`` buckets over
  ``[start, end)``, default ``mincount=0`` keeps empty buckets),
- ``FacetQuery.java:28`` (a named sub-query counted over the domain),
- ``FacetParser.java`` + ``SlotAcc.java`` (the aggregation grammar:
  ``count``, ``sum(f)``, ``avg(f)``, ``min(f)``, ``max(f)``,
  ``unique(f)``, ``missing(f)``, ``sumsq(f)``, ``variance(f)``,
  ``stddev(f)``, ``percentile(f,p)``).

Shape for 100 TB: ONE docs⟖hits equi-join materializes the domain rows
(no broadcast hint — the domain can be the whole match set, AQE picks the
join strategy), then every facet is a Catalyst ``groupBy`` with partial
aggregation; nested facets restrict the domain by joining the (≤ limit,
broadcast) surviving parent buckets and rank per parent with a
partitioned window. Sub-facet recursion multiplies only bounded bucket
frames, never the domain.

A DataFrame API can't nest bucket lists inside one response object the way
Solr's JSON writer does, so :func:`json_facets` returns a dict of frames:
each facet under its name, sub-facets under dotted paths
(``"langs.sources"``) with the parent bucket value as a leading column,
and the FacetField side-channels under ``"name.numBuckets"`` /
``"name.allBuckets"`` / ``"name.missing"``.

Multi-select faceting: request filters may be tagged
(``{"filter": [{"#langTag": {...}}]}``) and a top-level facet may carry a
``domain`` transform (``FacetRequest.Domain`` / DomainMap):
``{"excludeTags": [...]}`` re-derives the domain without the named
filters, ``{"query": ...}`` replaces it with a fresh query over the whole
index, ``{"filter": [...]}`` intersects extra clauses.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, Window, functions as F

from .jsondsl import json_query, request_parts

_IDS = ("segment_id", "doc_id")

_AGG_RE = re.compile(r"(\w+)\(\s*(\w+)\s*(?:,\s*([0-9.]+)\s*)?\)")


def _agg_column(spec: str):
    """One aggregation expression from the FacetParser grammar."""
    s = spec.strip()
    if s == "count":
        return F.count(F.lit(1)).cast("bigint")
    m = _AGG_RE.fullmatch(s)
    if not m:
        raise ValueError(f"bad facet aggregation {spec!r}")
    fn, col, arg = m.group(1), F.col(m.group(2)), m.group(3)
    if fn == "percentile":
        if arg is None:
            raise ValueError(f"percentile needs (field, pct): {spec!r}")
        return F.expr(f"percentile({m.group(2)}, {float(arg) / 100.0})")
    if arg is not None:
        raise ValueError(f"{fn} takes one argument: {spec!r}")
    simple = {
        "sum": F.sum,
        "avg": F.avg,
        "min": F.min,
        "max": F.max,
        "unique": F.countDistinct,
        "hll": F.approx_count_distinct,  # HLLAgg role — approximate like Solr's
        "variance": F.var_samp,
        "stddev": F.stddev_samp,
    }
    if fn in simple:
        return simple[fn](col)
    if fn == "sumsq":
        return F.sum(col * col)
    if fn == "missing":
        return F.sum(col.isNull().cast("bigint")).cast("bigint")
    raise ValueError(f"unknown facet aggregation {fn!r}")


def _agg_fields(spec: str) -> set[str]:
    s = spec.strip()
    if s == "count":
        return set()
    m = _AGG_RE.fullmatch(s)
    return {m.group(2)} if m else set()


def _needed_cols(spec: dict) -> set[str]:
    """Every stored column any facet in the tree reads."""
    out: set[str] = set()
    for node in spec.values():
        if isinstance(node, str):
            out |= _agg_fields(node)
            continue
        if not isinstance(node, dict):
            raise ValueError(f"a facet must be an agg string or object, got {node!r}")
        typ = node.get("type", "terms")
        if typ in ("terms", "range"):
            out.add(node["field"])
        out |= _needed_cols(node.get("facet") or {})
    return out


_REL_RE = re.compile(r"relatedness\(\s*\$(\w+)\s*,\s*\$(\w+)\s*\)")


def _sigmoid_blend(z):
    """RelatednessAgg.java:500 sigmoidHelper — the 5-sigmoid blend squashing
    the z-score into (-1, 1), roundTo5Digits."""
    def sig(off, scale):
        return (z + off) / (scale + F.abs(z + off))

    return F.round(
        0.2 * sig(-80.0, 50.0)
        + 0.2 * sig(-30.0, 30.0)
        + 0.2 * sig(0.0, 30.0)
        + 0.2 * sig(30.0, 30.0)
        + 0.2 * sig(80.0, 50.0),
        5,
    )


def _split_children(node: dict):
    """(agg entries, sub-facet entries) of a facet's nested ``facet`` dict."""
    sub = node.get("facet") or {}
    aggs = {k: v for k, v in sub.items() if isinstance(v, str)}
    facets = {k: v for k, v in sub.items() if not isinstance(v, str)}
    return aggs, facets


def _facet_sort(sort, field: str, agg_names) -> tuple[str, str]:
    """FacetField sort forms: ``"count desc"`` (default), ``"index asc"``,
    ``{"aggname": "desc"}`` / ``"aggname desc"``."""
    if isinstance(sort, dict):
        if len(sort) != 1:
            raise ValueError(f"facet sort object needs exactly one key: {sort!r}")
        (k, d), = sort.items()
    else:
        toks = str(sort).split()
        if len(toks) != 2:
            raise ValueError(f"bad facet sort {sort!r}")
        k, d = toks
    if d not in ("asc", "desc"):
        raise ValueError(f"facet sort direction must be asc|desc: {sort!r}")
    if k == "count":
        return "count", d
    if k == "index":
        return field, d
    if k in agg_names:
        return k, d
    raise ValueError(f"facet sort key {k!r} is not count/index or a named agg")


def _order(col: str, direction: str, tiebreak: str):
    out = [F.col(col).desc() if direction == "desc" else F.col(col).asc()]
    if tiebreak != col:
        out.append(F.col(tiebreak).asc())
    return out


class _FacetEval:
    def __init__(
        self,
        query_hits: DataFrame,
        filter_parts: list,
        docs: DataFrame | None,
        searcher,
        params: dict | None,
    ):
        self.query_hits = query_hits
        self.filter_parts = filter_parts  # [(tags, filter hits)]
        self.docs = docs  # ids + every stored column any facet reads
        self.searcher = searcher
        self.params = params
        self.out: dict[str, DataFrame] = {}

    def _base_domain(self, exclude: frozenset = frozenset()) -> DataFrame:
        """query ∩ filters, skipping filters whose tag set intersects
        ``exclude`` (multi-select faceting — FacetRequest's excludeTags
        re-derives the domain without the excluded constraints)."""
        h = self.query_hits
        for tags, fh in self.filter_parts:
            if tags & exclude:
                continue
            h = h.join(fh.select(*_IDS), list(_IDS), "left_semi")
        return h

    def _with_cols(self, hits: DataFrame) -> DataFrame:
        # no broadcast hint: a domain can be the whole match set — AQE
        # picks the join strategy from the actual sizes
        return hits.join(self.docs, list(_IDS)) if self.docs is not None else hits

    def _domain_rows(self, dom: dict) -> DataFrame:
        """A facet's ``domain`` transform (FacetRequest.Domain /
        DomainMap): ``excludeTags`` re-composes the request domain
        without the named filters, ``query`` REPLACES the domain with a
        fresh query over the whole index, ``filter`` intersects extra
        clauses."""
        unknown = sorted(set(dom) - {"excludeTags", "filter", "query"})
        if unknown:
            raise ValueError("unknown facet domain keys: " + ", ".join(unknown))
        if "query" in dom:
            base = json_query(dom["query"], searcher=self.searcher, params=self.params)
        else:
            ex = dom.get("excludeTags") or []
            if isinstance(ex, str):
                ex = [ex]
            base = self._base_domain(frozenset(ex))
        extra = dom.get("filter") or []
        if isinstance(extra, (str, dict)):
            extra = [extra]
        for f in extra:
            fh = json_query(f, searcher=self.searcher, params=self.params)
            base = base.join(fh.select(*_IDS), list(_IDS), "left_semi")
        return self._with_cols(base)

    def run(self, spec: dict) -> dict[str, DataFrame]:
        self._eval(self._with_cols(self._base_domain()), spec, parents=[], path="")
        return self.out

    # -- dispatch ----------------------------------------------------------

    def _eval(self, rows: DataFrame, spec: dict, parents: list[str], path: str):
        for name, node in spec.items():
            key = f"{path}.{name}" if path else name
            if isinstance(node, str):
                # a bare aggregation ("avgscore": "avg(score)") — grouped by
                # the enclosing bucket, or one global row at the top level
                agg = _agg_column(node).alias(name)
                self.out[key] = (
                    rows.groupBy(*parents).agg(agg)
                    if parents
                    else rows.agg(agg)
                )
                continue
            node_rows = rows
            if isinstance(node, dict) and node.get("domain"):
                if parents:
                    raise ValueError(
                        "facet domain transforms are supported on top-level "
                        "facets (nested facets inherit their parent's domain)"
                    )
                node_rows = self._domain_rows(node["domain"])
            typ = node.get("type", "terms")
            if typ == "terms":
                self._terms(node_rows, key, node, parents)
            elif typ == "query":
                self._query(node_rows, key, node, parents)
            elif typ == "range":
                self._range(node_rows, key, node, parents)
            else:
                raise ValueError(f"unknown facet type {typ!r}")

    # -- terms -------------------------------------------------------------

    def _resolve_docset(self, q) -> DataFrame:
        """A relatedness fore/back query → its (segment_id, doc_id) set.
        ``*:*`` is the whole index (MatchAllDocsQuery)."""
        if isinstance(q, str) and q.strip() == "*:*":
            return self.searcher.spark.read.parquet(
                self.searcher.index_dir + "/docs"
            ).select(*_IDS)
        return json_query(q, searcher=self.searcher, params=self.params).select(
            *_IDS
        )

    def _terms(self, rows: DataFrame, key: str, node: dict, parents: list[str]):
        field = node["field"]
        limit = int(node.get("limit", 10))
        offset = int(node.get("offset", 0))
        mincount = int(node.get("mincount", 1))
        prefix = node.get("prefix")
        aggs, subfacets = _split_children(node)
        # relatedness($fore,$back) — RelatednessAgg.java:473, the Semantic
        # Knowledge Graph score of each bucket w.r.t. a foreground query vs
        # a background set. fore/back are $param refs (queries, or *:*);
        # both are ABSOLUTE docsets, independent of the facet domain.
        rel_specs = {}
        for k in list(aggs):
            m = _REL_RE.fullmatch(aggs[k].strip())
            if m:
                del aggs[k]
                if self.params is None or not {m.group(1), m.group(2)} <= set(
                    self.params
                ):
                    raise ValueError(
                        f"relatedness agg {k!r}: fore/back $refs must name "
                        "request params"
                    )
                rel_specs[k] = (
                    self.params[m.group(1)],
                    self.params[m.group(2)],
                )
        sort_col, sort_dir = _facet_sort(
            node.get("sort", "count desc"), field, set(aggs) | set(rel_specs)
        )
        nn = rows.filter(F.col(field).isNotNull())
        if prefix is not None:
            nn = nn.filter(F.col(field).startswith(str(prefix)))
        agg_cols = [
            F.count(F.lit(1)).cast("bigint").alias("count"),
            *[_agg_column(v).alias(k) for k, v in aggs.items()],
        ]
        nn_rel = nn
        rel_agg_cols = []
        sizes_df = None
        for k, (fore_q, back_q) in rel_specs.items():
            fh, bh = self._resolve_docset(fore_q), self._resolve_docset(back_q)
            nn_rel = nn_rel.join(
                fh.withColumn(f"_fg_{k}", F.lit(1)), list(_IDS), "left"
            ).join(bh.withColumn(f"_bg_{k}", F.lit(1)), list(_IDS), "left")
            rel_agg_cols += [
                F.sum(F.coalesce(F.col(f"_fg_{k}"), F.lit(0)))
                .cast("double")
                .alias(f"_fgc_{k}"),
                F.sum(F.coalesce(F.col(f"_bg_{k}"), F.lit(0)))
                .cast("double")
                .alias(f"_bgc_{k}"),
            ]
            sz = fh.agg(F.count(F.lit(1)).cast("double").alias(f"_fgs_{k}")).crossJoin(
                bh.agg(F.count(F.lit(1)).cast("double").alias(f"_bgs_{k}"))
            )
            sizes_df = sz if sizes_df is None else sizes_df.crossJoin(sz)
        g = nn_rel.groupBy(*parents, field).agg(*agg_cols, *rel_agg_cols)
        if mincount > 0:
            g = g.filter(F.col("count") >= mincount)
        if rel_specs:
            g = g.crossJoin(F.broadcast(sizes_df))
            for k in rel_specs:
                bg_prob = F.col(f"_bgc_{k}") / F.col(f"_bgs_{k}")
                num = F.col(f"_fgc_{k}") - F.col(f"_fgs_{k}") * bg_prob
                den = F.sqrt(F.col(f"_fgs_{k}") * bg_prob * (1 - bg_prob))
                z = num / F.when(den != 0, den).otherwise(F.lit(1e-10))
                g = g.withColumn(k, _sigmoid_blend(z))
            g = g.drop(
                *[c for k in rel_specs for c in (f"_fgc_{k}", f"_bgc_{k}", f"_fgs_{k}", f"_bgs_{k}")]
            )
        # FacetFieldProcessor side-channels, computed before limit/offset:
        if node.get("numBuckets"):
            nb = F.count(F.lit(1)).cast("bigint").alias("numBuckets")
            self.out[key + ".numBuckets"] = (
                g.groupBy(*parents).agg(nb) if parents else g.agg(nb)
            )
        if node.get("allBuckets"):
            self.out[key + ".allBuckets"] = (
                nn.groupBy(*parents).agg(*agg_cols) if parents else nn.agg(*agg_cols)
            )
        if node.get("missing"):
            mrows = rows.filter(F.col(field).isNull())
            self.out[key + ".missing"] = (
                mrows.groupBy(*parents).agg(*agg_cols)
                if parents
                else mrows.agg(*agg_cols)
            )
        if parents:
            w = Window.partitionBy(*parents).orderBy(*_order(sort_col, sort_dir, field))
            g = g.withColumn("_rk", F.row_number().over(w))
            keep = F.col("_rk") > offset
            if limit >= 0:
                keep = keep & (F.col("_rk") <= offset + limit)
            buckets = g.filter(keep).drop("_rk")
        else:
            g = g.orderBy(*_order(sort_col, sort_dir, field))
            if offset:
                g = g.offset(offset)
            buckets = g.limit(limit) if limit >= 0 else g
        self.out[key] = buckets
        if subfacets:
            # restrict the domain to the surviving buckets (≤ limit per
            # parent — a broadcast-sized relation by construction)
            keep = buckets.select(*parents, field)
            sub_rows = rows.join(F.broadcast(keep), [*parents, field], "left_semi")
            self._eval(sub_rows, subfacets, parents=[*parents, field], path=key)

    # -- query -------------------------------------------------------------

    def _query(self, rows: DataFrame, key: str, node: dict, parents: list[str]):
        if "q" not in node:
            raise ValueError("query facet needs q=")
        qh = json_query(node["q"], searcher=self.searcher, params=self.params)
        sub_rows = rows.join(qh.select(*_IDS), list(_IDS), "left_semi")
        aggs, subfacets = _split_children(node)
        agg_cols = [
            F.count(F.lit(1)).cast("bigint").alias("count"),
            *[_agg_column(v).alias(k) for k, v in aggs.items()],
        ]
        self.out[key] = (
            sub_rows.groupBy(*parents).agg(*agg_cols)
            if parents
            else sub_rows.agg(*agg_cols)
        )
        if subfacets:
            self._eval(sub_rows, subfacets, parents=parents, path=key)

    # -- range -------------------------------------------------------------

    def _range(self, rows: DataFrame, key: str, node: dict, parents: list[str]):
        field = node["field"]
        try:
            start, end, gap = (
                float(node["start"]),
                float(node["end"]),
                float(node["gap"]),
            )
        except KeyError as exc:
            raise ValueError("range facet needs start=, end=, gap=") from exc
        if gap <= 0 or end <= start:
            raise ValueError(f"bad range facet bounds {node!r}")
        n_buckets = int(-(-(end - start) // gap))
        if n_buckets > 10_000:
            raise ValueError(f"range facet would create {n_buckets} buckets")
        mincount = int(node.get("mincount", 0))  # FacetRange default: keep empties
        aggs, subfacets = _split_children(node)

        v = F.col(field)
        bucket = (
            F.lit(start) + F.floor((v - F.lit(start)) / F.lit(gap)) * F.lit(gap)
        ).alias("val")
        in_range = rows.filter((v >= start) & (v < end))
        g = in_range.groupBy(*parents, bucket).agg(
            F.count(F.lit(1)).cast("bigint").alias("count"),
            *[_agg_column(vv).alias(k) for k, vv in aggs.items()],
        )
        if mincount > 0:
            g = g.filter(F.col("count") >= mincount)
        else:
            # keep empty buckets: (parent ×) bucket-start scaffold, counts 0
            spark = rows.sparkSession
            starts = spark.createDataFrame(
                [(start + i * gap,) for i in range(n_buckets)], "val double"
            )
            scaffold = (
                rows.select(*parents).distinct().crossJoin(F.broadcast(starts))
                if parents
                else starts
            )
            g = scaffold.join(g, [*parents, "val"], "left").withColumn(
                "count", F.coalesce(F.col("count"), F.lit(0).cast("bigint"))
            )
        self.out[key] = g.orderBy(*parents, F.col("val").asc())
        if subfacets:
            sub_rows = rows.filter((v >= start) & (v < end)).withColumn(
                "val", bucket
            )
            if mincount > 0:
                # sub-facets only for SURVIVING buckets (Solr emits them
                # per returned bucket; the bucket list is ≤ n_buckets →
                # broadcast-sized)
                keep = g.select(*parents, "val")
                sub_rows = sub_rows.join(
                    F.broadcast(keep), [*parents, "val"], "left_semi"
                )
            self._eval(sub_rows, subfacets, parents=[*parents, "val"], path=key)


def json_facets(body: dict, searcher, params: dict | None = None) -> dict[str, DataFrame]:
    """Evaluate the ``facet`` section of a Solr JSON request body over the
    request's domain (``query`` + ``filter``); returns ``{facet path:
    bucket frame}`` (dotted paths for sub-facets, parent bucket values as
    leading columns)."""
    spec = body.get("facet") or {}
    if not isinstance(spec, dict) or not spec:
        raise ValueError("json_facets needs a non-empty 'facet' object")
    hits, parts, p = request_parts(body, searcher, params)
    needed = sorted(_needed_cols(spec) - {"score"} - set(hits.columns))
    docs = None
    if needed:
        docs = searcher.spark.read.parquet(searcher.index_dir + "/docs").select(
            *_IDS, *needed
        )
    return _FacetEval(hits, parts, docs, searcher, p).run(spec)
