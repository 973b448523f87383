"""XML query parser — the CoreParser surface.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/xml/
CoreParser.java`` (builder registry :94-138) and the ``builders/`` package:
one element name per query type, ``fieldName`` attributes inherited from
ancestor elements (``DOMUtils.getAttributeWithInheritance``), ``boost``
attributes wrapping the built query, ``Clause occurs=`` on BooleanQuery
children, the span sub-factory for elements allowed inside span
composition, and ``UserQuery`` delegating to the classic QueryParser.

Element set (CoreParser.java:94-138, default registry):

- ``TermQuery`` — raw term text (NOT analyzed, per TermQueryBuilder)
- ``TermsQuery`` — ANALYZED text, one SHOULD TermQuery per token with
  ``minimumNumberShouldMatch`` (TermsQueryBuilder)
- ``MatchAllDocsQuery``
- ``BooleanQuery`` — ``Clause`` children with ``occurs`` ∈ should / must /
  mustNot / filter, ``minimumNumberShouldMatch``
- ``RangeQuery`` — TermRangeQuery; empty/missing bounds are open ends
- ``DisjunctionMaxQuery`` — ``tieBreaker`` attribute, element children
- ``ConstantScoreQuery`` — first child is the wrapped filter
- ``UserQuery`` — classic QueryParser over the element text
- ``BoostingTermQuery`` — PayloadScoreQuery(avg) over a span term
- ``SpanTerm`` / ``SpanOr`` / ``SpanOrTerms`` (analyzed) / ``SpanNear``
  (``slop`` required, ``inOrder`` default false) / ``SpanNot``
  (``Include``/``Exclude`` children) / ``SpanFirst`` (``end`` default 1)

- ``SpanPositionRange`` (``start``/``end`` attributes)
- ``PointRangeQuery`` (``builders/PointRangeQueryBuilder.java:40``) —
  ``fieldName`` names a stored NUMERIC docs column (not the text field, so
  it bypasses the text-field check), ``lowerTerm``/``upperTerm`` inclusive
  bounds (missing = open end), ``type`` ∈ int/long/float/double (default
  int, like the reference). Compiles to ``query.PointRangeQuery``; the
  executor runs it as a pushed-down docs-parquet scan (BKD role).

Raw term text is lowercased to meet the engine's lowercased term dictionary.

Every parse error raises ``ValueError`` (the ParserException role).
"""

from __future__ import annotations

import xml.etree.ElementTree as ET

from .query import (
    BooleanQuery,
    BoostQuery,
    ConstantScoreQuery,
    DisjunctionMaxQuery,
    MatchAllQuery,
    PayloadScoreQuery,
    PointRangeQuery,
    Query,
    SpanFirstQuery,
    SpanPositionRangeQuery,
    SpanNearQuery,
    SpanNotQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    TermRangeQuery,
)
from ..analysis import ANALYZERS, QUERY_CHAIN

_SPAN_ELEMENTS = frozenset(
    {"SpanTerm", "SpanOr", "SpanOrTerms", "SpanNear", "SpanNot", "SpanFirst",
     "SpanPositionRange", "BoostingTermQuery"}
)


class CoreParser:
    """``CoreParser(defaultField, analyzer)`` over ElementTree."""

    def __init__(
        self,
        analyzer: str = "code",
        default_field: str = "content",
        field_aliases: tuple[str, ...] = (),
    ):
        self.analyzer = QUERY_CHAIN.get(analyzer, analyzer)
        self.default_field = default_field
        self.fields = {default_field, *field_aliases}

    # ------------------------------------------------------------- parse --
    def parse(self, xml: str) -> Query:
        try:
            root = ET.fromstring(xml)
        except ET.ParseError as exc:
            raise ValueError(f"xml query parse error: {exc}") from exc
        return self._query(root, None)

    # ------------------------------------------------------- dispatchers --
    def _query(self, e: ET.Element, inherited_field: str | None) -> Query:
        tag = e.tag
        if tag == "PointRangeQuery":
            # fieldName names a NUMERIC docs column, not the text field —
            # skip the text-field check (PointRangeQueryBuilder reads its
            # own fieldName, no inheritance)
            return _boost(self._q_PointRangeQuery(e), e)
        field = self._field(e, inherited_field, required=False)
        build = getattr(self, f"_q_{tag}", None)
        if build is None:
            raise ValueError(f"xml query: unknown element <{tag}>")
        q = build(e, field)
        return _boost(q, e)

    def _span(self, e: ET.Element, inherited_field: str | None) -> Query:
        if e.tag not in _SPAN_ELEMENTS:
            raise ValueError(f"xml query: <{e.tag}> is not a span element")
        field = self._field(e, inherited_field, required=False)
        # boost attributes on NESTED span clauses parse but do not wrap: the
        # span kernel composes raw span clauses, and in the reference an
        # inner SpanBoostQuery does not change the composite SpanNear score
        # either (only a top-level boost does — handled by _query's _boost)
        return getattr(self, f"_q_{e.tag}")(e, field, as_span=True)

    def _field(self, e: ET.Element, inherited: str | None, required: bool) -> str | None:
        f = e.get("fieldName") or inherited
        if f is not None and f not in self.fields:
            raise ValueError(f"xml query: unknown field {f!r}")
        if required and f is None:
            raise ValueError(f"xml query: <{e.tag}> needs fieldName")
        return f

    # ---------------------------------------------------------- builders --
    def _q_TermQuery(self, e, field):
        return TermQuery(_text(e).lower())

    def _q_TermsQuery(self, e, field):
        terms, _ = ANALYZERS[self.analyzer](_text(e))
        msm = int(e.get("minimumNumberShouldMatch", 0))
        bq = BooleanQuery(
            should=tuple(TermQuery(t) for t in terms), min_should_match=msm
        )
        return bq

    def _q_MatchAllDocsQuery(self, e, field):
        return MatchAllQuery()

    def _q_BooleanQuery(self, e, field):
        must, should, must_not, filt = [], [], [], []
        for clause in e:
            if clause.tag != "Clause":
                continue
            occurs = clause.get("occurs", "should")
            kids = [k for k in clause]
            if not kids:
                raise ValueError("xml query: <Clause> needs a child query")
            q = self._query(kids[0], field)
            if occurs == "must":
                must.append(q)
            elif occurs == "should":
                should.append(q)
            elif occurs == "mustNot":
                must_not.append(q)
            elif occurs == "filter":
                filt.append(q)
            else:
                raise ValueError(
                    f'xml query: invalid value for "occurs" attribute of clause: {occurs}'
                )
        return BooleanQuery(
            tuple(must),
            tuple(should),
            tuple(must_not),
            tuple(filt),
            int(e.get("minimumNumberShouldMatch", 0)),
        )

    def _q_RangeQuery(self, e, field):
        lower = e.get("lowerTerm") or None
        upper = e.get("upperTerm") or None
        return TermRangeQuery(
            lower=lower.lower() if lower else None,
            upper=upper.lower() if upper else None,
            include_lower=_bool(e, "includeLower", True),
            include_upper=_bool(e, "includeUpper", True),
        )

    def _q_PointRangeQuery(self, e):
        fname = e.get("fieldName")
        if not fname:
            raise ValueError("xml query: <PointRangeQuery> needs fieldName")
        typ = e.get("type", "int")
        if typ in ("int", "long"):
            conv = int
        elif typ in ("float", "double"):
            conv = float
        else:
            raise ValueError(
                f"xml query: PointRangeQuery type {typ!r} not in int/long/float/double"
            )
        lower, upper = e.get("lowerTerm"), e.get("upperTerm")
        try:
            return PointRangeQuery(
                field=fname,
                lower=conv(lower) if lower not in (None, "") else None,
                upper=conv(upper) if upper not in (None, "") else None,
            )
        except ValueError as exc:
            raise ValueError(f"xml query: bad PointRangeQuery bound: {exc}") from exc

    def _q_DisjunctionMaxQuery(self, e, field):
        tie = float(e.get("tieBreaker", 0.0))
        return DisjunctionMaxQuery(
            tuple(self._query(kid, field) for kid in e), tie
        )

    def _q_ConstantScoreQuery(self, e, field):
        kids = [k for k in e]
        if not kids:
            raise ValueError("xml query: <ConstantScoreQuery> needs a child")
        return ConstantScoreQuery(self._query(kids[0], field))

    def _q_UserQuery(self, e, field):
        from .queryparser import parse_classic

        return parse_classic(
            _text(e), analyzer=self.analyzer, default_field=field or self.default_field
        )

    def _q_BoostingTermQuery(self, e, field, as_span=False):
        if as_span:
            # inside span composition the payload-scoring wrapper degrades
            # to its term spans (payload aggregation is a top-level scorer
            # here; the match positions are the term's either way)
            return SpanTermQuery(_text(e).lower())
        return PayloadScoreQuery(
            term=_text(e).lower(), func="average", include_span_score=True
        )

    # span family -----------------------------------------------------------
    def _q_SpanTerm(self, e, field, as_span=False):
        return SpanTermQuery(_text(e).lower())

    def _q_SpanOr(self, e, field, as_span=False):
        return SpanOrQuery(tuple(self._span(kid, field) for kid in e))

    def _q_SpanOrTerms(self, e, field, as_span=False):
        terms, _ = ANALYZERS[self.analyzer](_text(e))
        return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))

    def _q_SpanNear(self, e, field, as_span=False):
        slop = e.get("slop")
        if slop is None:
            raise ValueError("xml query: <SpanNear> needs a slop attribute")
        return SpanNearQuery(
            tuple(self._span(kid, field) for kid in e),
            slop=int(slop),
            in_order=_bool(e, "inOrder", False),
        )

    def _q_SpanNot(self, e, field, as_span=False):
        inc = e.find("Include")
        exc = e.find("Exclude")
        if inc is None or exc is None:
            raise ValueError("xml query: <SpanNot> needs <Include> and <Exclude>")
        ikids, ekids = [k for k in inc], [k for k in exc]
        if not ikids or not ekids:
            raise ValueError("xml query: empty <Include>/<Exclude>")
        return SpanNotQuery(self._span(ikids[0], field), self._span(ekids[0], field))

    def _q_SpanFirst(self, e, field, as_span=False):
        kids = [k for k in e]
        if not kids:
            raise ValueError("xml query: <SpanFirst> needs a child span")
        return SpanFirstQuery(self._span(kids[0], field), int(e.get("end", 1)))

    def _q_SpanPositionRange(self, e, field, as_span=False):
        kids = [k for k in e]
        if not kids:
            raise ValueError("xml query: <SpanPositionRange> needs a child span")
        return SpanPositionRangeQuery(
            self._span(kids[0], field),
            int(e.get("start", 0)),
            int(e.get("end", 1)),
        )


def _text(e: ET.Element) -> str:
    t = (e.text or "").strip()
    if not t:
        raise ValueError(f"xml query: <{e.tag}> needs non-blank text")
    return t


def _bool(e: ET.Element, name: str, default: bool) -> bool:
    v = e.get(name)
    if v is None:
        return default
    return v.strip().lower() == "true"


def _boost(q: Query, e: ET.Element) -> Query:
    boost = float(e.get("boost", 1.0))
    return BoostQuery(q, boost) if boost != 1.0 else q


def parse_xml_query(
    xml: str,
    analyzer: str = "code",
    default_field: str = "content",
    field_aliases: tuple[str, ...] = (),
) -> Query:
    return CoreParser(analyzer, default_field, field_aliases).parse(xml)
