"""Highlighting — display-time snippet extraction over top-k hits.

Two strategies, mirroring the reference's two highlighters:

- :func:`highlight` RE-ANALYZES the stored text, the classic ``Highlighter``
  strategy (``lucene/highlighter/src/java/org/apache/lucene/search/highlight/
  Highlighter.java:54``, term extraction ``QueryTermExtractor.java:38``): the
  query is analyzed to a term set, the stored text is re-scanned with the
  chain's own regexes (so ``parseHttp`` highlights its ``Http`` subword for
  the query ``http``), and the best-scoring fragment window is returned with
  ``<b>..</b>`` markers. No offsets in the index required.

- :func:`highlight_offsets` uses offsets STORED in the posting format
  (``UnifiedHighlighter.java`` with ``IndexOptions
  ..._AND_OFFSETS`` — the offset source it calls OffsetSource.POSTINGS):
  match spans come from the index, so no re-tokenization of displayed text,
  and terms re-analysis cannot locate — WordDelimiterGraph catenations like
  ``parsehttp500`` — highlight their originating raw-text span. Falls back
  to re-analysis per document when the index stores no offsets.

Both run as Arrow-batched ``mapInPandas`` over the hits (a top-k display
surface — O(k) rows, never the corpus), joined to stored fields via
``IndexSearcher.fetch``. The offsets variant reads ONLY the query terms'
posting rows (term-pushed parquet scan) and broadcast-joins them to the
O(k) hit keys.
"""

from __future__ import annotations

from bisect import bisect_right
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from .analysis import _CASE_BOUND_RE, _WORD_RE, ANALYZERS


def _match_spans(text: str, terms: set[str], analyzer: str) -> list[tuple[int, int]]:
    """Char spans (in the RAW text) of chain tokens matching ``terms``."""
    return [(s, e) for s, e, _ in _match_spans_terms(text, terms, analyzer)]


def _match_spans_terms(
    text: str, terms: set[str], analyzer: str
) -> list[tuple[int, int, str]]:
    """Like :func:`_match_spans` but keeps the matched chain token — passage
    scoring needs per-term statistics."""
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
    out = []
    for m in _WORD_RE.finditer(mod):
        tok = m.group().lower()
        if stem is not None:
            tok = stem(tok)
        if tok in terms:
            s, e = m.start(), m.end()
            out.append(
                (s - bisect_right(mod_ins, s - 1), e - bisect_right(mod_ins, e - 1), tok)
            )
    return out


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


def _merge_spans(spans: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Sort + coalesce overlapping/duplicate spans (graph chains stack a
    whole-token span over its subword part spans)."""
    out: list[tuple[int, int]] = []
    for s, e in sorted(spans):
        if out and s <= out[-1][1]:
            if e > out[-1][1]:
                out[-1] = (out[-1][0], e)
        else:
            out.append((s, e))
    return out


def highlight_offsets(
    spark,
    index_dir: str,
    fetched: DataFrame,
    query_text: str,
    analyzer: str = "code",
    content_col: str = "content",
    frag_size: int = 100,
    fallback: bool = True,
) -> DataFrame:
    """Add a ``snippet`` column using offsets STORED in the index
    (``store_offsets=True`` builds; ``PostingsEnum.OFFSETS``).

    Plan shape: posting rows for the query's terms only (term filter pushed
    to the parquet scan), offset streams decoded per row, broadcast-semi-
    joined to the O(k) hit keys, spans collected per hit, then one
    ``mapInPandas`` over the hits. The stored text is never re-tokenized.

    ``fallback``: hits with no stored-offset spans (offset-free index, or a
    doc whose match came through a different field) re-analyze that one
    document — the classic :func:`highlight` strategy.
    """
    from pyspark.sql import functions as F

    from .index.read import offsets_postings

    terms = set(ANALYZERS[analyzer](query_text)[0])
    if not terms:
        # zero analyzed terms (stopword-only / punctuation query): nothing
        # can match — never fall through to an unfiltered offsets decode
        return fetched.withColumn("snippet", F.substring(content_col, 1, frag_size))
    spans_df = (
        offsets_postings(spark, index_dir, terms=sorted(terms))
        .join(
            F.broadcast(fetched.select("segment_id", "doc_id").distinct()),
            ["segment_id", "doc_id"],
        )
        .groupBy("segment_id", "doc_id")
        .agg(
            F.collect_list(F.struct("start_off", "end_off")).alias("_hl_spans")
        )
    )
    joined = fetched.join(spans_df, ["segment_id", "doc_id"], "left")

    from pyspark.sql.types import StringType, StructField, StructType

    schema = StructType(
        list(fetched.schema.fields) + [StructField("snippet", StringType())]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            snippets = []
            for text, spans in zip(pdf[content_col], pdf["_hl_spans"]):
                text = text or ""
                if spans is None or len(spans) == 0:
                    got = _match_spans(text, terms, analyzer) if fallback else []
                else:
                    got = _merge_spans(
                        [(int(s["start_off"]), int(s["end_off"])) for s in spans]
                    )
                snippets.append(_best_fragment(text, got, frag_size))
            out = pdf.drop(columns=["_hl_spans"])
            out["snippet"] = snippets
            yield out

    return joined.mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# UnifiedHighlighter passage scoring (uhighlight/PassageScorer.java): rank
# sentence-ish passages by Σ_unique-term tf(freq_in_passage, passage_len) ·
# weight(content_len, freq_in_doc), boosted by 1 + 1/log(pivot + start).
# Defaults k1=1.2, b=0.75, pivot=87 (PassageScorer.java:44-48).

_BREAK_RE = None


def _passage_bounds(text: str) -> list[tuple[int, int]]:
    """Sentence-ish passage segmentation — a deterministic stand-in for the
    JDK BreakIterator the reference uses (UnifiedHighlighter's default
    SENTENCE iterator): break after sentence punctuation + space, or at
    newline runs."""
    global _BREAK_RE
    if _BREAK_RE is None:
        import re

        _BREAK_RE = re.compile(r"[.!?]\s+|\n+")
    bounds, prev = [], 0
    for m in _BREAK_RE.finditer(text):
        if m.end() > prev:
            bounds.append((prev, m.end()))
            prev = m.end()
    if prev < len(text):
        bounds.append((prev, len(text)))
    return bounds


def _score_passages(
    text: str,
    spans: list[tuple[int, int, str]],
    max_passages: int,
    k1: float = 1.2,
    b: float = 0.75,
    pivot: float = 87.0,
) -> list[tuple[float, int, int, list[tuple[int, int]]]]:
    """(score, start, end, match_spans) for every passage containing a
    match, best first (score desc, start asc) — PassageScorer.score()."""
    import math
    from collections import Counter

    if not spans:
        return []
    doc_freq = Counter(t for _, _, t in spans)
    content_len = len(text)
    scored = []
    for ps, pe in _passage_bounds(text):
        inside = [(s, e, t) for s, e, t in spans if s >= ps and e <= pe]
        if not inside:
            continue
        plen = pe - ps
        in_freq = Counter(t for _, _, t in inside)
        score = 0.0
        for t, fp in in_freq.items():
            norm = k1 * ((1 - b) + b * (plen / pivot))
            tf = fp / (fp + norm)
            num_docs = 1 + content_len / pivot
            weight = (k1 + 1) * math.log(1 + (num_docs + 0.5) / (doc_freq[t] + 0.5))
            score += tf * weight
        score *= 1 + 1 / math.log(pivot + ps)
        scored.append((score, ps, pe, [(s, e) for s, e, _ in inside]))
    scored.sort(key=lambda x: (-x[0], x[1]))
    return scored[:max_passages]


def _render_passages(
    text: str, passages: list[tuple[float, int, int, list[tuple[int, int]]]]
) -> str:
    """Concatenate the top passages in DOCUMENT order with '... ' separators
    (DefaultPassageFormatter role), matches tagged <b>..</b>."""
    parts = []
    for _, ps, pe, spans in sorted(passages, key=lambda x: x[1]):
        out, prev = [], ps
        for s, e in _merge_spans(spans):
            out.append(text[prev:s])
            out.append("<b>" + text[s:e] + "</b>")
            prev = e
        out.append(text[prev:pe])
        parts.append("".join(out).strip())
    return "... ".join(parts)


def highlight_passages(
    spark,
    index_dir: str,
    fetched: DataFrame,
    query_text: str,
    analyzer: str = "code",
    content_col: str = "content",
    max_passages: int = 3,
    fallback: bool = True,
) -> DataFrame:
    """Add ``snippet`` (top passages, document order) and ``passage_score``
    (best passage's score) columns — the UnifiedHighlighter surface: match
    spans from offsets stored in the index (term-pushed postings scan,
    broadcast join to the O(k) hits), passages ranked by PassageScorer.

    ``fallback``: hits with no stored-offset spans re-analyze that one
    document (keeping per-span term identity for the scorer)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import DoubleType, StringType, StructField, StructType

    from .index.read import offsets_postings

    terms = set(ANALYZERS[analyzer](query_text)[0])
    if not terms:
        # zero analyzed terms: no passage can contain a match — empty
        # snippet, never an unfiltered offsets decode
        return fetched.withColumn("snippet", F.lit("")).withColumn(
            "passage_score", F.lit(0.0)
        )
    spans_df = (
        offsets_postings(spark, index_dir, terms=sorted(terms))
        .join(
            F.broadcast(fetched.select("segment_id", "doc_id").distinct()),
            ["segment_id", "doc_id"],
        )
        .groupBy("segment_id", "doc_id")
        .agg(
            F.collect_list(F.struct("start_off", "end_off", "term")).alias("_hl_spans")
        )
    )
    joined = fetched.join(spans_df, ["segment_id", "doc_id"], "left")
    schema = StructType(
        list(fetched.schema.fields)
        + [StructField("snippet", StringType()), StructField("passage_score", DoubleType())]
    )

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            snippets, scores = [], []
            for text, spans in zip(pdf[content_col], pdf["_hl_spans"]):
                text = text or ""
                if spans is None or len(spans) == 0:
                    got = (
                        _match_spans_terms(text, terms, analyzer) if fallback else []
                    )
                else:
                    got = [
                        (int(s["start_off"]), int(s["end_off"]), s["term"])
                        for s in spans
                    ]
                    got.sort()
                top = _score_passages(text, got, max_passages)
                snippets.append(_render_passages(text, top))
                scores.append(float(top[0][0]) if top else 0.0)
            out = pdf.drop(columns=["_hl_spans"])
            out["snippet"] = snippets
            out["passage_score"] = scores
            yield out

    return joined.mapInPandas(kernel, schema)
