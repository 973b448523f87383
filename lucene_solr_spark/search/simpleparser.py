"""SimpleQueryParser — the never-throws human query parser.

Reference: ``lucene/queryparser/src/java/org/apache/lucene/queryparser/
simple/SimpleQueryParser.java`` (``parse:147``, ``parseSubQuery:164``,
``consumeSubQuery:225``, ``consumePhrase:284``, ``consumeToken:354``,
``buildQueryTree:435``, ``parseFuzziness:482``, ``tokenFinished:523``).

Operators: ``+`` AND, ``|`` OR, ``-`` NOT (prefix, stacking negates),
``"…"`` phrase, trailing ``*`` prefix, ``~N`` fuzzy on terms / near on
phrases, ``(…)`` precedence, ``\\`` escape, whitespace delimits. Every
operator is individually gated by a flag bit so callers can switch features
off; any syntax error is tolerated, never raised — unmatched ``(`` or ``"``
are treated as literal noise exactly like the reference.

Semantics preserved bit-for-bit from the reference:

- right-to-left operator folding: whenever the operator CHANGES, the tree
  built so far becomes one clause of a fresh BooleanQuery under the new
  operator (``buildQueryTree:456-468``) — so ``a | b + c`` is
  ``(a OR b) AND c``;
- a negated token becomes ``(MUST_NOT token, SHOULD MatchAll)``
  (``buildQueryTree:439-444``); double negation cancels;
- fuzzy distance is capped at 2 (``LevenshteinAutomata.
  MAXIMUM_SUPPORTED_DISTANCE``), ``~0`` / unparsable fuzziness falls back
  to a plain term (``consumeToken:396-405``, ``parseFuzziness:499-515``);
- a bare ``~`` means ``~2`` for terms; a phrase ``"…"~`` with nothing after
  the tilde gets slop 0 (``consumePhrase:305-313``);
- ``()`` / ``""`` reset the pending operator (``consumeSubQuery:266-272``);
- prefix ``*`` only counts on the LAST, unescaped character with at least
  one char before it (``consumeToken:386``);
- the whole trimmed query being ``*`` is MatchAll; an empty parse is
  MatchNone (``parse:147-162``).

Deviation (documented): phrases are analyzed through this engine's graph
phrase path (stacked tokens → MultiPhrase / SpanNear like
``QueryBuilder.analyzeGraphPhrase``) without the NGramPhrase rewrite, and
multi-field ``weights`` are out of scope — the engine indexes one field per
directory (``MultiFieldSearcher`` composes fields).
"""

from __future__ import annotations

from ..analysis import ANALYZERS, QUERY_CHAIN
from .query import (
    BooleanQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    SloppyPhraseQuery,
    SpanNearQuery,
    SpanOrQuery,
    SpanTermQuery,
    SynonymQuery,
    TermQuery,
    _slots,
)

# feature flag bits (SimpleQueryParser.java:106-124)
AND_OPERATOR = 1 << 0
NOT_OPERATOR = 1 << 1
OR_OPERATOR = 1 << 2
PREFIX_OPERATOR = 1 << 3
PHRASE_OPERATOR = 1 << 4
PRECEDENCE_OPERATORS = 1 << 5
ESCAPE_OPERATOR = 1 << 6
WHITESPACE_OPERATOR = 1 << 7
FUZZY_OPERATOR = 1 << 8
NEAR_OPERATOR = 1 << 9

_MAX_FUZZINESS = 2  # LevenshteinAutomata.MAXIMUM_SUPPORTED_DISTANCE
_WHITESPACE = " \t\n\r"


class _State:
    """Parse state (SimpleQueryParser.State:642) — one per (sub)query."""

    __slots__ = ("data", "index", "length", "current_op", "previous_op", "not_", "top")

    def __init__(self, data: str, index: int, length: int):
        self.data = data
        self.index = index
        self.length = length
        self.current_op: str | None = None  # "must" | "should"
        self.previous_op: str | None = None
        self.not_ = 0
        self.top: Query | None = None


class SimpleQueryParser:
    """``SimpleQueryParser(analyzer, field)`` with flags and default op."""

    def __init__(self, analyzer: str = "code", flags: int = -1, default_operator: str = "should"):
        self.analyzer = QUERY_CHAIN.get(analyzer, analyzer)
        self.flags = flags
        if default_operator not in ("should", "must"):
            raise ValueError("default_operator must be 'should' or 'must'")
        self.default_operator = default_operator

    # ------------------------------------------------------------- parse --
    def parse(self, text: str) -> Query:
        if text.strip() == "*":
            return MatchAllQuery()
        state = _State(text, 0, len(text))
        self._parse_sub(state)
        return state.top if state.top is not None else MatchNoneQuery()

    def _parse_sub(self, state: _State) -> None:
        flags, data = self.flags, state.data
        while state.index < state.length:
            ch = data[state.index]
            if ch == "(" and flags & PRECEDENCE_OPERATORS:
                self._consume_subquery(state)
            elif ch == ")" and flags & PRECEDENCE_OPERATORS:
                state.index += 1  # extraneous, ignored
            elif ch == '"' and flags & PHRASE_OPERATOR:
                self._consume_phrase(state)
            elif ch == "+" and flags & AND_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = "must"
                state.index += 1
            elif ch == "|" and flags & OR_OPERATOR:
                if state.current_op is None and state.top is not None:
                    state.current_op = "should"
                state.index += 1
            elif ch == "-" and flags & NOT_OPERATOR:
                state.not_ += 1
                state.index += 1
                continue  # keep the not count alive for the next char
            elif ch in _WHITESPACE and flags & WHITESPACE_OPERATOR:
                state.index += 1
            else:
                self._consume_token(state)
            state.not_ = 0

    # --------------------------------------------------------- consumers --
    def _consume_subquery(self, state: _State) -> None:
        data, flags = state.data, self.flags
        start = state.index = state.index + 1
        precedence, escaped = 1, False
        while state.index < state.length:
            if not escaped:
                ch = data[state.index]
                if ch == "\\" and flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if ch == "(":
                    precedence += 1
                elif ch == ")":
                    precedence -= 1
                    if precedence == 0:
                        break
            escaped = False
            state.index += 1
        if state.index == state.length:
            # no closing paren: the '(' was extraneous — reparse from start
            state.index = start
        elif state.index == start:
            # "()": resets the pending operator
            state.current_op = None
            state.index += 1
        else:
            sub = _State(data, start, state.index)
            self._parse_sub(sub)
            self._build_tree(state, sub.top)
            state.index += 1

    def _consume_phrase(self, state: _State) -> None:
        data, flags = state.data, self.flags
        start = state.index = state.index + 1
        buf: list[str] = []
        escaped = has_slop = False
        while state.index < state.length:
            if not escaped:
                ch = data[state.index]
                if ch == "\\" and flags & ESCAPE_OPERATOR:
                    escaped = True
                    state.index += 1
                    continue
                if ch == '"':
                    if (
                        state.length > state.index + 1
                        and data[state.index + 1] == "~"
                        and flags & NEAR_OPERATOR
                    ):
                        state.index += 1
                        if state.length > state.index + 1:
                            has_slop = True
                        break
                    break
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if state.index == state.length:
            state.index = start  # unmatched quote: extraneous
        elif state.index == start:
            state.current_op = None  # empty phrase resets the operator
            state.index += 1
        else:
            phrase = "".join(buf)
            slop = self._parse_fuzziness(state) if has_slop else 0
            self._build_tree(state, self._new_phrase(phrase, slop))
            state.index += 1

    def _consume_token(self, state: _State) -> None:
        data, flags = state.data, self.flags
        buf: list[str] = []
        escaped = prefix = fuzzy = False
        while state.index < state.length:
            if not escaped:
                ch = data[state.index]
                if ch == "\\" and flags & ESCAPE_OPERATOR:
                    escaped = True
                    prefix = False
                    state.index += 1
                    continue
                if self._token_finished(state):
                    break
                if buf and ch == "~" and flags & FUZZY_OPERATOR:
                    fuzzy = True
                    break
                prefix = bool(buf) and ch == "*" and bool(flags & PREFIX_OPERATOR)
            escaped = False
            buf.append(data[state.index])
            state.index += 1
        if buf:
            if fuzzy:
                token = "".join(buf)
                fuzziness = min(self._parse_fuzziness(state), _MAX_FUZZINESS)
                if fuzziness == 0:
                    branch = self._new_default(token)
                else:
                    branch = FuzzyQuery(term=token.lower(), max_edits=fuzziness)
            elif prefix:
                branch = PrefixQuery(prefix="".join(buf[:-1]).lower())
            else:
                branch = self._new_default("".join(buf))
            self._build_tree(state, branch)

    # -------------------------------------------------------------- tree --
    def _build_tree(self, state: _State, branch: Query | None) -> None:
        if branch is None:
            return
        if state.not_ % 2 == 1:
            branch = BooleanQuery(should=(MatchAllQuery(),), must_not=(branch,))
        if state.top is None:
            state.top = branch
        else:
            if state.current_op is None:
                state.current_op = self.default_operator
            if state.previous_op != state.current_op:
                state.top = _bq(state.current_op, (state.top,))
            state.top = _add_clause(state.top, branch, state.current_op)
            state.previous_op = state.current_op
        state.current_op = None

    # ----------------------------------------------------------- helpers --
    def _parse_fuzziness(self, state: _State) -> int:
        """slop / edit distance after a ``~``; 0 when unparsable or negative,
        2 for a bare ``~`` (parseFuzziness:482-518)."""
        data = state.data
        if state.index >= state.length or data[state.index] != "~":
            return 0
        buf: list[str] = []
        while state.index < state.length:
            state.index += 1
            if state.index < state.length:
                if self._token_finished(state):
                    break
                buf.append(data[state.index])
        text = "".join(buf)
        if text == "":
            return 2
        try:
            return max(int(text), 0)
        except ValueError:
            return 0

    def _token_finished(self, state: _State) -> bool:
        ch, flags = state.data[state.index], self.flags
        return bool(
            (ch == '"' and flags & PHRASE_OPERATOR)
            or (ch == "|" and flags & OR_OPERATOR)
            or (ch == "+" and flags & AND_OPERATOR)
            or (ch == "(" and flags & PRECEDENCE_OPERATORS)
            or (ch == ")" and flags & PRECEDENCE_OPERATORS)
            or (ch in _WHITESPACE and flags & WHITESPACE_OPERATOR)
        )

    def _new_default(self, text: str) -> Query | None:
        """createBooleanQuery(field, text, defaultOperator) — per-position
        slots, stacked tokens as SynonymQuery, slots combined under the
        default operator (util/QueryBuilder.java:120-180)."""
        terms, pos = ANALYZERS[self.analyzer](text)
        if not terms:
            return None
        slots = _slots(terms, pos)
        per_slot = [TermQuery(s[0]) if len(s) == 1 else SynonymQuery(s) for s in slots]
        if len(per_slot) == 1:
            return per_slot[0]
        if self.default_operator == "must":
            return BooleanQuery(must=tuple(per_slot))
        return BooleanQuery(should=tuple(per_slot))

    def _new_phrase(self, text: str, slop: int) -> Query | None:
        """createPhraseQuery(field, text, slop) with graph-phrase handling
        for stacked tokens (util/QueryBuilder.java:200-230,590-640)."""
        terms, pos = ANALYZERS[self.analyzer](text)
        if not terms:
            return None
        if len(terms) == 1:
            return TermQuery(terms[0])
        if len(set(pos)) != len(terms):  # stacked tokens: graph phrase
            slots = _slots(terms, pos)
            if slop > 0:
                clauses = tuple(
                    SpanTermQuery(s[0])
                    if len(s) == 1
                    else SpanOrQuery(tuple(SpanTermQuery(t) for t in s))
                    for s in slots
                )
                return SpanNearQuery(clauses, slop=slop, in_order=True)
            upos = sorted(set(pos))
            return MultiPhraseQuery(tuple(slots), tuple(p - upos[0] for p in upos))
        base = pos[0]
        rel = tuple(p - base for p in pos)
        if slop > 0:
            return SloppyPhraseQuery(tuple(terms), rel, slop)
        return PhraseQuery(tuple(terms), rel)


def _bq(occur: str, clauses: tuple[Query, ...]) -> BooleanQuery:
    return BooleanQuery(must=clauses) if occur == "must" else BooleanQuery(should=clauses)


def _add_clause(bq: BooleanQuery, q: Query, occur: str) -> BooleanQuery:
    """addClause:422 — append one clause, keeping the others."""
    if occur == "must":
        return BooleanQuery(bq.must + (q,), bq.should, bq.must_not, bq.filter, bq.min_should_match)
    return BooleanQuery(bq.must, bq.should + (q,), bq.must_not, bq.filter, bq.min_should_match)


def parse_simple(
    text: str,
    analyzer: str = "code",
    flags: int = -1,
    default_operator: str = "should",
) -> Query:
    return SimpleQueryParser(analyzer, flags, default_operator).parse(text)
