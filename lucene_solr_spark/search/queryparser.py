"""Classic query-parser syntax — the lucene/queryparser module.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
classic/QueryParser.jj`` (grammar) and ``QueryParserBase.java`` (the
``addClause`` conjunction/modifier resolution, boost/fuzzy/slop suffixes,
range and wildcard term handling). Implements the full surface a Solr/Lucene
user types:

- boolean operators ``AND`` / ``OR`` / ``NOT`` / ``&&`` / ``||`` / ``!``,
  ``+``/``-`` modifiers, parenthesised grouping at any depth;
- quoted phrases with proximity ``"a b"~3``;
- boosts on any clause: ``term^2``, ``"a b"^3.5``, ``(a OR b)^0.5``;
- fuzzy ``term~`` (maxEdits 2) / ``term~1``;
- wildcards ``te?t`` / ``te*t``, pure prefix ``term*``;
- ranges ``[a TO b]`` inclusive, ``{a TO b}`` exclusive, mixed bounds,
  ``*`` as an open endpoint;
- ``*:*`` MatchAllDocsQuery;
- ``\\``-escaping of special characters;
- ``field:...`` syntax — accepted for the default field's aliases, rejected
  for unknown fields (this engine indexes one field per index dir; the
  multi-field combine lives in :mod:`.multifield`).

Clause resolution follows ``QueryParserBase.addClause`` exactly, including
its documented quirks ("a AND b OR c" with default OR parses as
``+a +b c``): AND retroactively promotes the previous clause to MUST; with
default-AND, OR retroactively demotes it to SHOULD.

Bare multi-token text (a camelCase identifier the analyzer splits) goes
through QueryBuilder.createBooleanQuery with the parser's default operator.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from ..analysis import ANALYZERS
from .query import (
    BooleanQuery,
    BoostQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoneQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    QUERY_CHAIN,
    SloppyPhraseQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    rewrite,
)

# lexer: special tokens, quoted phrases (with escapes), ranges, then terms
_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<lparen>\()
  | (?P<rparen>\))
  | (?P<and>AND\b|&&)
  | (?P<or>OR\b|\|\|)
  | (?P<not>NOT\b|!)
  | (?P<plus>\+)
  | (?P<minus>-)
  | (?P<phrase>"(?:\\.|[^"\\])*")
  | (?P<range>[\[{](?:\\.|[^\]}\\])*[\]}])
  | (?P<term>(?:\\.|[?*]|[^\s()"\[\]{}+\-!^~])(?:\\.|[^\s()"\[\]{}^~])*)
  | (?P<fuzzy>~(?:\d+(?:\.\d+)?)?)
  | (?P<boost>\^\d+(?:\.\d+)?)
""",
    re.VERBOSE,
)

_ESCAPE_RE = re.compile(r"\\(.)")


def _unescape(s: str) -> str:
    return _ESCAPE_RE.sub(r"\1", s)


@dataclass
class _Tok:
    kind: str
    text: str


def _lex(text: str) -> list[_Tok]:
    out, i = [], 0
    while i < len(text):
        m = _TOKEN_RE.match(text, i)
        if m is None:
            raise ValueError(f"query syntax error at {text[i:]!r}")
        i = m.end()
        kind = m.lastgroup
        if kind != "ws":
            out.append(_Tok(kind, m.group()))
    return out


_CONJ_NONE, _CONJ_AND, _CONJ_OR = 0, 1, 2
_MOD_NONE, _MOD_REQ, _MOD_NOT = 0, 1, 2


class ClassicQueryParser:
    """``QueryParser(field, analyzer)`` with ``setDefaultOperator``."""

    def __init__(
        self,
        analyzer: str = "code",
        default_op: str = "OR",
        default_field: str = "content",
        field_aliases: tuple[str, ...] = (),
    ):
        self.analyzer = QUERY_CHAIN.get(analyzer, analyzer)
        if default_op not in ("OR", "AND"):
            raise ValueError("default_op must be 'OR' or 'AND'")
        self.default_op = default_op
        self.fields = {default_field, *field_aliases}

    # -------------------------------------------------------------- parse --
    def parse(self, text: str) -> Query:
        text = text.strip()
        if text == "*:*":
            return MatchAllQuery()
        toks = _lex(text)
        q, pos = self._parse_clauses(toks, 0)
        if pos != len(toks):
            raise ValueError(f"unbalanced ')' near {toks[pos].text!r}")
        return rewrite(q)

    def _parse_clauses(self, toks: list[_Tok], pos: int) -> tuple[Query, int]:
        # (occur, query) accumulated per QueryParserBase.addClause
        clauses: list[list] = []  # [occur, query]; occur mutable for promotion
        conj, mods = _CONJ_NONE, _MOD_NONE
        while pos < len(toks):
            t = toks[pos]
            if t.kind == "rparen":
                break
            if t.kind == "and":
                conj = _CONJ_AND
                pos += 1
                continue
            if t.kind == "or":
                conj = _CONJ_OR
                pos += 1
                continue
            if t.kind == "not":
                mods = _MOD_NOT
                pos += 1
                continue
            if t.kind == "plus":
                mods = _MOD_REQ
                pos += 1
                continue
            if t.kind == "minus":
                mods = _MOD_NOT
                pos += 1
                continue
            q, pos = self._parse_sub(toks, pos)
            # suffix boost (fuzzy is consumed inside term handling)
            while pos < len(toks) and toks[pos].kind == "boost":
                q = BoostQuery(q, float(toks[pos].text[1:]))
                pos += 1
            self._add_clause(clauses, conj, mods, q)
            conj, mods = _CONJ_NONE, _MOD_NONE
        if not clauses:
            return MatchNoneQuery(), pos
        must = tuple(q for o, q in clauses if o == "MUST")
        should = tuple(q for o, q in clauses if o == "SHOULD")
        must_not = tuple(q for o, q in clauses if o == "MUST_NOT")
        return BooleanQuery(must, should, must_not), pos

    def _add_clause(self, clauses: list, conj: int, mods: int, q: Query) -> None:
        """QueryParserBase.addClause:426-470 — including the retroactive
        promotion/demotion of the PREVIOUS clause."""
        if clauses and conj == _CONJ_AND:
            if clauses[-1][0] == "SHOULD":
                clauses[-1][0] = "MUST"
        if clauses and self.default_op == "AND" and conj == _CONJ_OR:
            if clauses[-1][0] == "MUST":
                clauses[-1][0] = "SHOULD"
        if isinstance(q, MatchNoneQuery) and mods != _MOD_NOT:
            # analyzer dropped the clause (stopwords-only) — like q == null
            return
        if self.default_op == "OR":
            required = mods == _MOD_REQ or (conj == _CONJ_AND and mods != _MOD_NOT)
        else:
            required = mods != _MOD_NOT and conj != _CONJ_OR
        occur = "MUST_NOT" if mods == _MOD_NOT else "MUST" if required else "SHOULD"
        clauses.append([occur, q])

    # ---------------------------------------------------------- sub-query --
    def _parse_sub(self, toks: list[_Tok], pos: int) -> tuple[Query, int]:
        t = toks[pos]
        if t.kind == "lparen":
            q, pos = self._parse_clauses(toks, pos + 1)
            if pos >= len(toks) or toks[pos].kind != "rparen":
                raise ValueError("missing ')'")
            return q, pos + 1
        if t.kind == "phrase":
            body = _unescape(t.text[1:-1])
            pos += 1
            slop = 0
            if pos < len(toks) and toks[pos].kind == "fuzzy":
                s = toks[pos].text[1:]
                slop = int(float(s)) if s else 0
                pos += 1
            return self._phrase(body, slop), pos
        if t.kind == "range":
            return self._range(t.text), pos + 1
        if t.kind == "term":
            raw = t.text
            pos += 1
            # field prefix — only an UNESCAPED ':' separates field from term
            # (QueryParser.jj escaping: foo\:bar is the single term "foo:bar")
            m_colon = re.search(r"(?<!\\):", raw)
            if m_colon:
                field, rest = raw[: m_colon.start()], raw[m_colon.end() :]
                field = _unescape(field)
                if field not in self.fields:
                    raise ValueError(f"unknown field {field!r}")
                raw = rest
                if not raw:  # "field:" followed by phrase/range/group
                    return self._parse_sub(toks, pos)
            if pos < len(toks) and toks[pos].kind == "fuzzy":
                s = toks[pos].text[1:]
                pos += 1
                term = _unescape(raw).lower()
                # bare ~ → maxEdits 2; integers direct; legacy float
                # similarities in (0,1) per FuzzyQuery.floatToEdits:
                # (1 − minSim) · termLen, capped at 2
                if not s:
                    max_edits = 2
                else:
                    f = float(s)
                    max_edits = int(f) if f >= 1 else min(2, int((1 - f) * len(term)))
                return FuzzyQuery(term=term, max_edits=max_edits), pos
            if "*" in raw or "?" in raw:
                pat = _unescape_wild(raw).lower()
                core = pat.replace("*", "").replace("?", "")
                if pat.endswith("*") and "*" not in pat[:-1] and "?" not in pat:
                    return PrefixQuery(prefix=core), pos
                return WildcardQuery(pattern=pat), pos
            return self._text(_unescape(raw)), pos
        raise ValueError(f"unexpected token {t.text!r}")

    def _phrase(self, body: str, slop: int) -> Query:
        terms, positions = ANALYZERS[self.analyzer](body)
        if not terms:
            return MatchNoneQuery()
        if len(terms) == 1:
            return TermQuery(terms[0])
        base = positions[0]
        rel = tuple(p - base for p in positions)
        if slop > 0:
            return SloppyPhraseQuery(tuple(terms), rel, slop)
        return PhraseQuery(tuple(terms), rel)

    def _range(self, text: str) -> Query:
        inc_lo = text[0] == "["
        inc_hi = text[-1] == "]"
        body = _unescape(text[1:-1]).strip()
        m = re.split(r"\s+TO\s+", body)
        if len(m) != 2:
            raise ValueError(f"bad range {text!r}")
        lo = None if m[0] == "*" else m[0].lower()
        hi = None if m[1] == "*" else m[1].lower()
        return TermRangeQuery(
            lower=lo, upper=hi, include_lower=inc_lo, include_upper=inc_hi
        )

    def _text(self, raw: str) -> Query:
        """QueryBuilder.createBooleanQuery(field, text, defaultOperator) —
        the analyzer may split one typed token into several."""
        terms, _ = ANALYZERS[self.analyzer](raw)
        if not terms:
            return MatchNoneQuery()
        if len(terms) == 1:
            return TermQuery(terms[0])
        tq = tuple(TermQuery(t) for t in terms)
        if self.default_op == "AND":
            return BooleanQuery(must=tq)
        return BooleanQuery(should=tq)


def _unescape_wild(s: str) -> str:
    """Plain unescape for wildcard patterns (an escaped ``\\*`` becomes a
    literal star in the pattern — the dictionary-expansion wildcard matcher
    has no literal-star syntax, documented limitation)."""
    return _ESCAPE_RE.sub(r"\1", s)


def parse_classic(
    text: str,
    analyzer: str = "code",
    default_op: str = "OR",
    default_field: str = "content",
) -> Query:
    return ClassicQueryParser(analyzer, default_op, default_field).parse(text)


# ---------------------------------------------------------------------------
# ComplexPhraseQueryParser (lucene/queryparser/src/java/org/apache/lucene/
# queryparser/complexPhrase/ComplexPhraseQueryParser.java:63): phrases whose
# words may be wildcards / prefixes / fuzzy terms, rewritten against the term
# dictionary into the span algebra — each expandable word becomes a SpanOr of
# its concrete dictionary matches, the phrase becomes a SpanNear (in_order by
# default, like the parser's inOrder setting).


def parse_complex_phrase(searcher, text: str, in_order: bool = True):
    """Parse ``"w1 w2*"~slop`` into a span Query executable by ``searcher``.

    Word forms: plain terms (analyzed with the searcher's chain — a
    camelCase token that splits becomes a nested exact SpanNear), wildcard/
    prefix (``?``/``*``), and fuzzy ``word~N``. Expansion happens at parse
    time against the index's term dictionary (the reference rewrites at
    rewrite() time — same effect, one pass). Words whose expansion matches
    nothing make the whole phrase MatchNone (a required position cannot
    match); stopwords dropped by the chain are skipped (the parser's
    documented analyzer limitation).
    """
    from .query import MatchNoneQuery, SpanNearQuery, SpanOrQuery

    m = re.fullmatch(r'\s*"(.*)"(?:~(\d+))?\s*', text, re.S)
    if not m:
        raise ValueError(f"not a quoted phrase: {text!r}")
    slop = int(m.group(2) or 0)
    clauses = []
    for word in m.group(1).split():
        fuzzy = re.fullmatch(r"([^*?~]+)~(\d*)", word)
        if "*" in word or "?" in word:
            terms = searcher.matching_terms(WildcardQuery(pattern=word.lower()))
            if not terms:
                return MatchNoneQuery()
            clauses.append(
                SpanOrQuery(tuple(terms)) if len(terms) > 1 else terms[0]
            )
        elif fuzzy:
            terms = searcher.matching_terms(
                FuzzyQuery(
                    term=fuzzy.group(1).lower(),
                    max_edits=int(fuzzy.group(2) or 2),
                )
            )
            if not terms:
                return MatchNoneQuery()
            clauses.append(
                SpanOrQuery(tuple(terms)) if len(terms) > 1 else terms[0]
            )
        else:
            toks = ANALYZERS[searcher.analyzer](word)[0]
            if not toks:
                continue  # stopword position dropped
            if len(toks) == 1:
                clauses.append(toks[0])
            else:
                clauses.append(
                    SpanNearQuery(tuple(toks), slop=0, in_order=True)
                )
    if not clauses:
        raise ValueError(f"phrase has no indexable words: {text!r}")
    if len(clauses) == 1 and not isinstance(clauses[0], str):
        return clauses[0]
    return SpanNearQuery(tuple(clauses), slop=slop, in_order=in_order)
