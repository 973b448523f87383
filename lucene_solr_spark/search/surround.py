"""Surround query parser — span-centric W/N proximity language.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
surround/parser/QueryParser.jj`` (lexical spec :188-238, productions
``FieldsQuery``/``OrQuery``/``AndQuery``/``NotQuery``/``NQuery``/``WQuery``/
``PrimaryQuery``/``PrefixOperatorQuery``/``SimpleTerm``/``OptionalWeights``)
plus the ``surround/query`` tree it builds (``DistanceQuery.java:97`` →
``SpanNearQuery(clauses, opDistance - 1, ordered)``; ``NotQuery.java:33``
first clause MUST, rest MUST_NOT; ``SrndPrefixQuery``/``SrndTruncQuery``
rewritten through ``SpanNearClauseFactory`` to a span-or over matching
terms inside distance ops, and through ``SimpleTermRewriteQuery`` to a
scoring boolean outside them).

Grammar (precedence tightest→loosest): primary → W → N → NOT → AND → OR.
W is ordered, N unordered; the distance prefix is 2-99 (bare ``w``/``n`` =
adjacent, distance 1), slop = distance − 1. Infix W/N chain PAIRWISE
left-associatively; the prefix forms ``3W(a, b, c)`` are n-ary. ``AND``/
``OR``/``NOT`` match upper- or lower-case only (``Or`` is a term).
Truncation: trailing ``*`` prefix (≥3 chars), ``?``/``*`` wildcards (≥3
normal chars), quoted literals ``"…"`` (single term, no analysis) and
``"…"*`` quoted prefixes. ``^`` boosts (stackable, multiplicative).
``field:`` prefixes are accepted against the searcher's known fields.

Unlike :mod:`.simpleparser` this grammar REJECTS malformed input
(``ParseException`` → ``ValueError`` here), and AND/OR boolean operators
are not allowed inside a distance operator — only terms, truncations,
``OR`` of those, and nested distance ops (``DistanceQuery.
distanceSubQueryNotAllowed``).

Deviation (documented): surround passes term text to the index verbatim
(no analysis); this engine's term dictionary is lowercased at index time,
so term/prefix/truncation text is lowercased here. Prefix/wildcard INSIDE
a distance op needs the term dictionary at parse time — pass ``searcher=``
(the ``SpanNearClauseFactory(reader, …)`` role); without one such queries
raise.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from .query import (
    BooleanQuery,
    BoostQuery,
    PrefixQuery,
    Query,
    SCORING_BOOLEAN,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    TermQuery,
    WildcardQuery,
)

MINIMUM_PREFIX_LENGTH = 3
MINIMUM_CHARS_IN_TRUNC = 3

# ---------------------------------------------------------------------------
# lexer (QueryParser.jj:188-238); term chars = everything except whitespace
# and the operator characters , ? * ( ) : ^ "

_TERM_CHARS = r'[^\s,?*():^"]'
_TOKEN_RE = re.compile(
    rf"""
    (?P<ws>\s+)
  | (?P<truncquoted>"[^"]+"\*)
  | (?P<quoted>"(?:[^"\\]|\\[\\"])+")
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<comma>,)
  | (?P<colon>:)
  | (?P<carat>\^)
  | (?P<truncterm>{_TERM_CHARS}+[*?][^\s,():^"]*)
  | (?P<term>{_TERM_CHARS}+)
""",
    re.VERBOSE,
)
_W_RE = re.compile(r"^(?:[2-9][0-9]?|1[0-9])?[wW]$")
_N_RE = re.compile(r"^(?:[2-9][0-9]?|1[0-9])?[nN]$")
_NUMBER_RE = re.compile(r"\s*([0-9]+(?:\.[0-9]+)?)")


@dataclass
class _Tok:
    kind: str  # OR AND NOT W N LPAREN RPAREN COMMA COLON CARAT TERM QUOTED SUFFIXTERM TRUNCTERM TRUNCQUOTED NUMBER
    text: str


def _lex(text: str) -> list[_Tok]:
    toks: list[_Tok] = []
    i, n = 0, len(text)
    boost_state = False
    while i < n:
        if boost_state:
            m = _NUMBER_RE.match(text, i)
            if not m:
                raise ValueError(f"surround: expected boost number at {text[i:]!r}")
            toks.append(_Tok("NUMBER", m.group(1)))
            i = m.end()
            boost_state = False
            continue
        m = _TOKEN_RE.match(text, i)
        if not m:
            raise ValueError(f"surround: cannot lex {text[i:]!r}")
        i = m.end()
        kind = m.lastgroup
        tok = m.group()
        if kind == "ws":
            continue
        if kind == "term":
            if tok in ("OR", "or"):
                kind = "OR"
            elif tok in ("AND", "and"):
                kind = "AND"
            elif tok in ("NOT", "not"):
                kind = "NOT"
            elif _W_RE.match(tok):
                kind = "W"
            elif _N_RE.match(tok):
                kind = "N"
            else:
                kind = "TERM"
        elif kind == "truncterm":
            # a single trailing '*' (and no '?') is a SUFFIXTERM (prefix)
            if tok.endswith("*") and "*" not in tok[:-1] and "?" not in tok:
                kind = "SUFFIXTERM"
            else:
                kind = "TRUNCTERM"
        elif kind == "carat":
            kind = "CARAT"
            boost_state = True
        else:
            kind = kind.upper()
        toks.append(_Tok(kind, tok))
    return toks


# ---------------------------------------------------------------------------
# AST (the SrndQuery tree)


@dataclass(frozen=True)
class _Term:
    text: str


@dataclass(frozen=True)
class _Prefix:
    prefix: str


@dataclass(frozen=True)
class _Trunc:
    pattern: str  # with * and ?


@dataclass(frozen=True)
class _Or:
    clauses: tuple


@dataclass(frozen=True)
class _And:
    clauses: tuple


@dataclass(frozen=True)
class _Not:
    clauses: tuple  # first positive, rest negated


@dataclass(frozen=True)
class _Dist:
    clauses: tuple
    distance: int
    ordered: bool


@dataclass(frozen=True)
class _Boost:
    sub: object
    weight: float


class SurroundQueryParser:
    """``surround.parser.QueryParser`` over this engine's query algebra."""

    def __init__(self, fields: tuple[str, ...] = ("content",), searcher=None):
        self.fields = set(fields)
        self.searcher = searcher

    # ------------------------------------------------------------- parse --
    def parse(self, text: str) -> Query:
        toks = _lex(text)
        ast, pos = self._fields_query(toks, 0)
        if pos != len(toks):
            raise ValueError(f"surround: unexpected {toks[pos].text!r}")
        return self._to_query(ast, in_span=False)

    # ---------------------------------------------------- productions -----
    def _fields_query(self, toks, pos):
        # OptionalFields: lookahead-2 TERM COLON pairs
        while (
            pos + 1 < len(toks)
            and toks[pos].kind == "TERM"
            and toks[pos + 1].kind == "COLON"
        ):
            if toks[pos].text not in self.fields:
                raise ValueError(f"surround: unknown field {toks[pos].text!r}")
            pos += 2  # single-field engine: scope marker accepted, dropped
        return self._or_query(toks, pos)

    def _or_query(self, toks, pos):
        q, pos = self._and_query(toks, pos)
        clauses = None
        while pos < len(toks) and toks[pos].kind == "OR":
            if clauses is None:
                clauses = [q]
            sub, pos = self._and_query(toks, pos + 1)
            clauses.append(sub)
        return (q if clauses is None else _Or(tuple(clauses))), pos

    def _and_query(self, toks, pos):
        q, pos = self._not_query(toks, pos)
        clauses = None
        while pos < len(toks) and toks[pos].kind == "AND":
            if clauses is None:
                clauses = [q]
            sub, pos = self._not_query(toks, pos + 1)
            clauses.append(sub)
        return (q if clauses is None else _And(tuple(clauses))), pos

    def _not_query(self, toks, pos):
        q, pos = self._n_query(toks, pos)
        clauses = None
        while pos < len(toks) and toks[pos].kind == "NOT":
            if clauses is None:
                clauses = [q]
            sub, pos = self._n_query(toks, pos + 1)
            clauses.append(sub)
        return (q if clauses is None else _Not(tuple(clauses))), pos

    def _n_query(self, toks, pos):
        q, pos = self._w_query(toks, pos)
        while pos < len(toks) and toks[pos].kind == "N":
            op = toks[pos].text
            sub, pos = self._w_query(toks, pos + 1)
            q = self._distance((q, sub), _op_distance(op), ordered=False, op=op)
        return q, pos

    def _w_query(self, toks, pos):
        q, pos = self._primary(toks, pos)
        while pos < len(toks) and toks[pos].kind == "W":
            op = toks[pos].text
            sub, pos = self._primary(toks, pos + 1)
            q = self._distance((q, sub), _op_distance(op), ordered=True, op=op)
        return q, pos

    def _primary(self, toks, pos):
        if pos >= len(toks):
            raise ValueError("surround: unexpected end of query")
        t = toks[pos]
        if t.kind == "LPAREN":
            q, pos = self._fields_query(toks, pos + 1)
            pos = _expect(toks, pos, "RPAREN")
        elif t.kind in ("OR", "AND", "W", "N"):
            q, pos = self._prefix_op(toks, pos)
        else:
            q, pos = self._simple_term(toks, pos)
        # OptionalWeights: any number of ^NUMBER, multiplicative
        while pos < len(toks) and toks[pos].kind == "CARAT":
            if pos + 1 >= len(toks) or toks[pos + 1].kind != "NUMBER":
                raise ValueError("surround: missing boost after '^'")
            w = float(toks[pos + 1].text)
            q = _Boost(q.sub, q.weight * w) if isinstance(q, _Boost) else _Boost(q, w)
            pos += 2
        return q, pos

    def _prefix_op(self, toks, pos):
        op = toks[pos]
        queries, pos = self._query_list(toks, pos + 1)
        if op.kind == "OR":
            return _Or(queries), pos
        if op.kind == "AND":
            return _And(queries), pos
        dist = _op_distance(op.text)
        return self._distance(queries, dist, ordered=(op.kind == "W"), op=op.text), pos

    def _query_list(self, toks, pos):
        pos = _expect(toks, pos, "LPAREN")
        queries = []
        q, pos = self._fields_query(toks, pos)
        queries.append(q)
        pos = _expect(toks, pos, "COMMA")
        while True:
            q, pos = self._fields_query(toks, pos)
            queries.append(q)
            if pos < len(toks) and toks[pos].kind == "COMMA":
                pos += 1
            else:
                break
        pos = _expect(toks, pos, "RPAREN")
        return tuple(queries), pos

    def _simple_term(self, toks, pos):
        t = toks[pos]
        if t.kind == "TERM":
            return _Term(t.text.lower()), pos + 1
        if t.kind == "QUOTED":
            body = re.sub(r"\\([\\\"])", r"\1", t.text[1:-1])
            return _Term(body.lower()), pos + 1
        if t.kind == "SUFFIXTERM":
            if len(t.text) - 1 < MINIMUM_PREFIX_LENGTH:
                raise ValueError(f"surround: too unrestrictive truncation: {t.text}")
            return _Prefix(t.text[:-1].lower()), pos + 1
        if t.kind == "TRUNCTERM":
            if sum(c not in "*?" for c in t.text) < MINIMUM_CHARS_IN_TRUNC:
                raise ValueError(f"surround: too unrestrictive truncation: {t.text}")
            return _Trunc(t.text.lower()), pos + 1
        if t.kind == "TRUNCQUOTED":
            if len(t.text) - 3 < MINIMUM_PREFIX_LENGTH:
                raise ValueError(f"surround: too unrestrictive truncation: {t.text}")
            return _Prefix(t.text[1:-2].lower()), pos + 1
        raise ValueError(f"surround: unexpected {t.text!r}")

    def _distance(self, queries, dist, ordered, op):
        # DistanceQuery.distanceSubQueryNotAllowed: only terms, truncations,
        # OR of those, and nested distance ops may sit under W/N
        for q in queries:
            _check_distance_sub(q, op)
        return _Dist(tuple(queries), dist, ordered)

    # ---------------------------------------------------- translation -----
    def _to_query(self, node, in_span: bool):
        if isinstance(node, _Boost):
            if in_span:  # see _check_distance_sub: weights drop inside W/N
                return self._to_query(node.sub, True)
            return BoostQuery(self._to_query(node.sub, in_span), node.weight)
        if isinstance(node, _Term):
            return SpanTermQuery(node.text) if in_span else TermQuery(node.text)
        if isinstance(node, _Prefix):
            if in_span:
                return self._span_expand(PrefixQuery(prefix=node.prefix))
            return PrefixQuery(prefix=node.prefix, rewrite_method=SCORING_BOOLEAN)
        if isinstance(node, _Trunc):
            if in_span:
                return self._span_expand(WildcardQuery(pattern=node.pattern))
            return WildcardQuery(pattern=node.pattern, rewrite_method=SCORING_BOOLEAN)
        if isinstance(node, _Or):
            subs = tuple(self._to_query(c, in_span) for c in node.clauses)
            if in_span:
                return SpanOrQuery(subs)
            return BooleanQuery(should=subs)
        if isinstance(node, _And):
            return BooleanQuery(must=tuple(self._to_query(c, False) for c in node.clauses))
        if isinstance(node, _Not):
            return BooleanQuery(
                must=(self._to_query(node.clauses[0], False),),
                must_not=tuple(self._to_query(c, False) for c in node.clauses[1:]),
            )
        if isinstance(node, _Dist):
            clauses = tuple(self._to_query(c, True) for c in node.clauses)
            return SpanNearQuery(clauses, slop=node.distance - 1, in_order=node.ordered)
        raise AssertionError(node)

    def _span_expand(self, mtq) -> Query:
        """SpanNearClauseFactory role: truncation inside a distance op
        becomes a span-or over the terms it matches in the dictionary."""
        if self.searcher is None:
            raise ValueError(
                "surround: truncated terms inside W/N need a searcher for "
                "term-dictionary expansion (pass searcher=)"
            )
        terms = self.searcher.matching_terms(mtq)
        return SpanOrQuery(tuple(SpanTermQuery(t) for t in terms))


def _check_distance_sub(node, op):
    if isinstance(node, _Boost):
        # ^w on a distance operand is grammatical (OptionalWeights attaches
        # to any PrimaryQuery); the weight itself cannot influence span
        # matching, so it parses and is dropped inside W/N (documented)
        _check_distance_sub(node.sub, op)
        return
    if isinstance(node, (_Term, _Prefix, _Trunc)):
        return
    if isinstance(node, _Or):
        for c in node.clauses:
            _check_distance_sub(c, op)
        return
    if isinstance(node, _Dist):
        for c in node.clauses:
            _check_distance_sub(c, op)
        return
    raise ValueError(f"surround: operator {op}: subquery not allowed")


def _op_distance(op_text: str) -> int:
    return 1 if len(op_text) == 1 else int(op_text[:-1])


def _expect(toks, pos, kind):
    if pos >= len(toks) or toks[pos].kind != kind:
        got = toks[pos].text if pos < len(toks) else "<eof>"
        raise ValueError(f"surround: expected {kind}, got {got!r}")
    return pos + 1


def parse_surround(
    text: str, fields: tuple[str, ...] = ("content",), searcher=None
) -> Query:
    return SurroundQueryParser(fields=fields, searcher=searcher).parse(text)
