"""Highlighting — display-time snippet extraction over top-k hits.

The reference's standard ``Highlighter`` (``lucene/highlighter/src/java/org/
apache/lucene/search/highlight/Highlighter.java:54``) RE-ANALYZES the stored
text with the field's analyzer and marks tokens matching the query's terms
(``QueryTermExtractor.java:38``) — no offsets in the index are required.
This module does the same: the query is analyzed to a term set, the stored
text is re-scanned with the chain's own regexes (so ``parseHttp`` highlights
its ``Http`` subword for the query ``http``), and the best-scoring fragment
window is returned with ``<b>..</b>`` markers.

Runs as an Arrow-batched ``mapInPandas`` over the hits (a top-k display
surface — O(k) rows, never the corpus), joined to stored fields via
``IndexSearcher.fetch``.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .analysis import _CASE_BOUND_RE, _WORD_RE, ANALYZERS


def _match_spans(text: str, terms: set[str], analyzer: str) -> list[tuple[int, int]]:
    """Char spans (in the RAW text) of chain tokens matching ``terms``."""
    if not text:
        return []
    # boundary substitution only INSERTS single spaces; map modified-text
    # offsets back by counting insertions before each position
    ins = [m.start() for m in _CASE_BOUND_RE.finditer(text)]
    mod_ins = [p + i for i, p in enumerate(ins)]  # insertion offsets in mod text
    mod = _CASE_BOUND_RE.sub(" ", text)

    stem = None
    if analyzer == "english":
        from .porter import porter_stem

        stem = porter_stem
    spans = []
    for m in _WORD_RE.finditer(mod):
        tok = m.group().lower()
        if stem is not None:
            tok = stem(tok)
        if tok in terms:
            s, e = m.start(), m.end()
            spans.append((s - bisect_right(mod_ins, s - 1), e - bisect_right(mod_ins, e - 1)))
    return spans


def _best_fragment(text: str, spans: list[tuple[int, int]], frag_size: int) -> str:
    """Densest window of matches, tags inserted (SimpleFragmenter +
    SimpleHTMLFormatter roles)."""
    if not spans:
        return text[:frag_size]
    # window = frag_size chars anchored at the span cluster with most matches
    best_i, best_n = 0, 0
    ends = [e for _, e in spans]
    for i, (s, _) in enumerate(spans):
        n = bisect_right(ends, s + frag_size) - i
        if n > best_n:
            best_i, best_n = i, n
    w0 = max(spans[best_i][0] - 10, 0)
    w1 = min(w0 + frag_size, len(text))
    inside = [(s, e) for s, e in spans if s >= w0 and e <= w1]
    out, prev = [], w0
    for s, e in inside:
        out.append(text[prev:s])
        out.append("<b>" + text[s:e] + "</b>")
        prev = e
    out.append(text[prev:w1])
    frag = "".join(out)
    if w0 > 0:
        frag = "..." + frag
    if w1 < len(text):
        frag = frag + "..."
    return frag


def highlight(
    fetched: DataFrame,
    query_text: str,
    analyzer: str = "code",
    content_col: str = "content",
    frag_size: int = 100,
) -> DataFrame:
    """Add a ``snippet`` column to fetched hits (hits joined to stored
    fields). ``query_text`` is analyzed with the same chain as the field."""
    terms = set(ANALYZERS[analyzer](query_text)[0])

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        list(fetched.schema.fields) + [StructField("snippet", StringType())]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            pdf = pdf.copy()
            pdf["snippet"] = [
                _best_fragment(t or "", _match_spans(t or "", terms, analyzer), frag_size)
                for t in pdf[content_col]
            ]
            yield pdf

    return fetched.mapInPandas(kernel, schema)
