"""(e)DisMax query parser + executor — Solr's default user-facing parser.

Reference surfaces:

- ``solr/core/src/java/org/apache/solr/search/DisMaxQParser.java`` — ``qf``
  field boosts, per-clause DisjunctionMaxQuery with ``tie``, ``mm``
  min-should-match over the optional clauses, ``pf`` whole-query phrase
  boost with ``ps`` slop.
- ``solr/core/src/java/org/apache/solr/search/ExtendedDismaxQParser.java``
  — lenient user syntax (``+``/``-`` prefixes, quoted phrases with
  ``~slop``, explicit ``field:term`` overrides for fields in ``qf``).
- ``solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java:617-700``
  — the ``mm`` spec grammar (int, negative int, percentage, ``<``
  conditionals), ported exactly in :func:`calculate_min_should_match`.

Semantics: every whitespace chunk of the user query is ONE clause; a clause
becomes a DisjunctionMaxQuery across the ``qf`` fields — per-CLAUSE dismax,
the true Solr structure (``DisMaxQParser.getQuery``), not the per-query
aggregate in :mod:`.multifield`. A clause's per-field query is the field
analyzer's parse of the chunk (so a camelCase chunk may expand to several
tokens inside one clause, exactly like Lucene's field-query analysis).

Scale shape: ONE batched ``search_many`` job per qf/pf field (all clauses
ride one job as distinct qids), then two key-local aggregations — clause
dismax on (qid, segment_id, doc_id), doc pivot on (segment_id, doc_id) —
and a TakeOrdered top-k. Nothing is per-clause-per-job; adding clauses adds
qids, not Spark jobs. All joins meet on the coordinate-aligned
(segment_id, doc_id) keys (see multifield.py's alignment invariant).
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession, functions as F

from .executor import IndexSearcher


def calculate_min_should_match(optional_count: int, spec: str | None) -> int:
    """Solr's ``mm`` spec → required optional-clause count.

    Exact port of ``SolrPluginUtils.calculateMinShouldMatch`` (reference
    ``solr/core/src/java/org/apache/solr/util/SolrPluginUtils.java:669-706``):
    ``"3"`` = at least 3; ``"-2"`` = all but 2; ``"75%"`` = floor(75% of n);
    ``"-25%"`` = all but floor(25% of n); conditional chains
    ``"2<-25% 9<3"`` = for n<=2 all required, n<=9 all-but-25%, else 3.
    Result is clamped to [0, optional_count].
    """
    result = optional_count
    if spec is None:
        return 0
    spec = spec.strip()
    if "<" in spec:
        spec = re.sub(r"\s*<\s*", "<", spec)
        for s in re.split(r"\s+", spec):
            upper, _, sub = s.partition("<")
            if optional_count <= int(upper):
                return result
            result = calculate_min_should_match(optional_count, sub)
        return result
    if "%" in spec:
        percent = int(spec[: spec.index("%")])
        calc = (result * percent) / 100.0
        result = result + int(calc) if calc < 0 else int(calc)
    else:
        calc = int(spec)
        result = result + calc if calc < 0 else calc
    return min(optional_count, max(result, 0))


# --------------------------------------------------------------- parsing ----

# one user clause: optional +/- prefix, optional field: override, then a
# quoted phrase (optional ~slop) or a bare non-space chunk
# (ExtendedDismaxQParser's splitIntoClauses). An escaped colon (foo\:bar)
# fails the \w+ field group and stays a literal chunk.
_CLAUSE_RE = re.compile(r'([+-]?)(?:(\w+):)?("(?:[^"]*)"(?:~\d+)?|\S+)')

SHOULD, MUST, MUST_NOT = 0, 1, 2


def split_clauses(q: str) -> list[tuple[int, str | None, str]]:
    """Lenient clause split → [(occur, field_override, chunk_text)].

    ``field_override`` is set for ``field:rest`` chunks (validated against
    ``qf`` by the caller; unknown fields fall back to literal text, the
    eDisMax leniency rule). AND/OR/NOT connectors are accepted the way
    eDisMax's lowercaseOperators=false treats them: bare ``AND``/``OR``
    words are dropped, ``NOT`` flips the next clause to MUST_NOT.
    """
    out: list[tuple[int, str | None, str]] = []
    negate_next = False
    for m in _CLAUSE_RE.finditer(q):
        sign, field, body = m.group(1), m.group(2), m.group(3)
        if field is None:
            if body == "AND" or body == "OR":
                continue
            if body == "NOT":
                negate_next = True
                continue
        occur = MUST if sign == "+" else MUST_NOT if sign == "-" else SHOULD
        if negate_next:
            occur = MUST_NOT
            negate_next = False
        out.append((occur, field, body))
    return out


class EDisMaxSearcher:
    """Searches ``qf`` per-field indexes with (e)DisMax combination.

    ``fields``: ``{field_name: (index_dir, boost)}`` (the ``qf`` param,
    ``title^2`` style boosts). Indexes must be coordinate-aligned (built
    from the same docs frame / key_cols / num_segments / segment_base).
    """

    def __init__(
        self,
        spark: SparkSession,
        fields: dict[str, tuple[str, float]],
        analyzer: str = "code",
        precision: str = "f32",
        similarity: str = "bm25",
        tie: float = 0.0,
    ):
        if not fields:
            raise ValueError("qf requires at least one field")
        self.spark = spark
        self.tie = float(tie)
        self.boosts = {f: float(b) for f, (_, b) in fields.items()}
        self.searchers = {
            f: IndexSearcher(
                spark, d, analyzer=analyzer, precision=precision, similarity=similarity
            )
            for f, (d, _) in fields.items()
        }

    def search(
        self,
        q: str,
        mm: str | None = None,
        pf: dict[str, float] | None = None,
        ps: int = 0,
        pf2: dict[str, float] | None = None,
        ps2: int = 0,
        pf3: dict[str, float] | None = None,
        ps3: int = 0,
        bq: list[str] | None = None,
        bf: list[str] | None = None,
        boost: list[str] | None = None,
        k: int | None = 10,
    ) -> DataFrame:
        """Top-k (segment_id, doc_id, score, rank); ``k=None`` = exhaustive.

        ``mm``: min-should-match spec over the optional (SHOULD) clauses.
        ``pf``/``pf2``/``pf3``: ``{field: boost}`` shingled phrase boosts
        (``ExtendedDismaxQParser.addShingledPhraseQueries``): the positive
        bare terms as one whole-query phrase (pf), every consecutive bigram
        (pf2) and trigram (pf3), each with its slop (``ps``/``ps2``/``ps3``),
        dismaxed across its fields with ``tie`` and added to the score of
        docs that already pass the main query.
        ``bq``: boost queries (``DisMaxQParser`` bq param) — each string
        (optional trailing ``^boost``) is parsed per qf field, dismaxed
        across fields like a clause, and ADDED to the score of matching
        docs; bq never admits docs or counts toward mm (the SHOULD-beside-
        the-main-query structure).
        ``bf``: boost functions (edismax ``bf``) — Solr function-query
        strings evaluated per matching doc over the docs-table columns of
        the first qf index (coordinate-aligned by construction), each ADDED
        to the score (FunctionQuery-as-SHOULD).
        ``boost``: multiplicative boost (edismax ``boost`` →
        ``BoostedQuery``) — score × the product of the parsed functions.
        Both ride ``functions.parse_func``: pure Catalyst expressions, one
        aligned-key join against the docs table before top-k.
        """
        clauses = split_clauses(q)
        if not any(occ != MUST_NOT for occ, _, _ in clauses):
            raise ValueError("query has no positive clauses")

        # qid ranges: [0, n) main clauses, [n, ...) shingled phrase boosts
        should_qids = [i for i, (o, _, _) in enumerate(clauses) if o == SHOULD]
        must_qids = [i for i, (o, _, _) in enumerate(clauses) if o == MUST]
        not_qids = [i for i, (o, _, _) in enumerate(clauses) if o == MUST_NOT]
        n = len(clauses)

        # per-field batched query dicts + per-(field, qid) boost overrides
        per_field: dict[str, dict[int, str]] = {f: {} for f in self.searchers}
        boost_over: dict[str, dict[int, float]] = {f: {} for f in self.searchers}
        for i, (_, field, body) in enumerate(clauses):
            if field is not None and field in self.searchers:
                per_field[field][i] = body
            else:
                # unknown field prefix: literal text (eDisMax leniency — the
                # analyzer tokenizes straight through the ':')
                text = body if field is None else f"{field}:{body}"
                for f in self.searchers:
                    per_field[f][i] = text

        # shingled phrase boosts (pf = whole query, pf2/pf3 = bi/trigrams)
        terms = [
            b
            for o, fld, b in clauses
            if o != MUST_NOT and fld is None and not b.startswith('"')
        ]
        phrase_qids: list[int] = []
        next_qid = n
        for fb, slop, size in (
            (pf, ps, None), (pf2, ps2, 2), (pf3, ps3, 3),
        ):
            if not fb:
                continue
            for f in fb:
                if f not in self.searchers:
                    raise ValueError(f"phrase field {f!r} not in qf")
            gram = len(terms) if size is None else size
            if gram < 2 or len(terms) < gram:
                continue
            for i in range(len(terms) - gram + 1):
                text = '"' + " ".join(terms[i : i + gram]) + '"'
                if slop:
                    text += f"~{int(slop)}"
                qid = next_qid
                next_qid += 1
                phrase_qids.append(qid)
                for f, b in fb.items():
                    per_field[f][qid] = text
                    boost_over[f][qid] = float(b)

        # boost queries: extra scoring-only qids across the qf fields
        for text in bq or ():
            b_extra = 1.0
            m = re.search(r"\^(\d+(?:\.\d+)?)$", text)
            if m:
                b_extra = float(m.group(1))
                text = text[: m.start()]
            qid = next_qid
            next_qid += 1
            phrase_qids.append(qid)
            for f in self.searchers:
                per_field[f][qid] = text
                boost_over[f][qid] = self.boosts[f] * b_extra

        frames = []
        for f, searcher in self.searchers.items():
            qd = per_field[f]
            if not qd:
                continue
            boost_expr = F.lit(self.boosts[f])
            for qid, b in boost_over[f].items():
                boost_expr = F.when(F.col("qid") == qid, F.lit(b)).otherwise(
                    boost_expr
                )
            hits = searcher.search_many(qd, k=None).select(
                "qid",
                "segment_id",
                "doc_id",
                (F.col("score") * boost_expr).alias("score"),
            )
            frames.append(hits)
        tagged = frames[0]
        for fr in frames[1:]:
            tagged = tagged.unionByName(fr)

        # clause-level dismax: max + tie * (sum - max) over fields
        clause = tagged.groupBy("qid", "segment_id", "doc_id").agg(
            F.max("score").alias("mx"), F.sum("score").alias("sm")
        )
        cs = F.col("mx") + F.lit(self.tie) * (F.col("sm") - F.col("mx"))
        clause = clause.select("qid", "segment_id", "doc_id", cs.alias("cs"))

        scoring = [i for i in range(n) if i not in not_qids] + phrase_qids
        doc = clause.groupBy("segment_id", "doc_id").agg(
            F.sum(F.when(F.col("qid").isin(scoring), F.col("cs"))).alias("score"),
            F.count(F.when(F.col("qid").isin(should_qids), F.lit(1))).alias("n_should"),
            F.count(F.when(F.col("qid").isin(must_qids), F.lit(1))).alias("n_must"),
            F.count(F.when(F.col("qid").isin(not_qids), F.lit(1))).alias("n_not"),
        )
        mm_n = calculate_min_should_match(len(should_qids), mm)
        cond = (F.col("n_not") == 0) & (F.col("n_must") == len(must_qids))
        if should_qids:
            cond = cond & (F.col("n_should") >= mm_n)
            if not must_qids and mm_n == 0:
                cond = cond & (F.col("n_should") > 0)
        dt = "float" if all(s.f32 for s in self.searchers.values()) else "double"
        out = doc.filter(cond).select(
            "segment_id", "doc_id", F.col("score").cast(dt).alias("score")
        )
        if bf or boost:
            from ..functions import parse_func

            first = next(iter(self.searchers.values()))
            docs_df = self.spark.read.parquet(
                os.path.join(first.index_dir, "docs")
            )
            joined = out.join(docs_df, ["segment_id", "doc_id"])
            score = F.col("score").cast("double")
            # missing/NULL function values behave like Solr's default-0
            # numeric doc values: bf adds 0 (base score kept), boost
            # multiplies by 0 (FunctionQuery on an absent value is 0)
            for expr in bf or ():
                score = score + F.coalesce(
                    parse_func(expr).cast("double"), F.lit(0.0)
                )
            for expr in boost or ():
                score = score * F.coalesce(
                    parse_func(expr).cast("double"), F.lit(0.0)
                )
            out = joined.select(
                "segment_id", "doc_id", score.cast(dt).alias("score")
            )
        if k is None:
            return out
        top = out.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        ).limit(k)
        from pyspark.sql import Window

        w = Window.orderBy(
            F.col("score").desc(), F.col("segment_id").asc(), F.col("doc_id").asc()
        )
        # rank over ≤ k rows (TakeOrdered output) — bounded input
        return top.withColumn("rank", F.row_number().over(w))
