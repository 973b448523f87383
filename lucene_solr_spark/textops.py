"""Fulltext queries over the `documents` table + training-data-pipeline ops.

Two families, both registered for the driver's queries()/oracle_sql() gate:

1. ``FT_OPS`` — the inverted-index engine itself run over the driver's
   ``documents`` table with the SQL-expressible ``simple`` analyzer, verified
   against a DuckDB oracle that implements the FULL scoring pipeline in ANSI
   SQL: tokenization, tf/df, **SmallFloat norm quantization** (bit-exact CASE
   expression), BM25 with the exact reference formula, boolean composition and
   positional phrase matching. The engine runs in float64 oracle-precision
   mode; scores are rounded to 4 decimals on both sides. Queries return ALL
   matching docs (no top-k boundary → order-insensitive hash is stable).

2. ``TRAINING_OPS`` — the large-scale training-data operators (dedup,
   similarity, text analysis) expressed in pure DataFrame ops with md5-based
   hashing so DuckDB computes identical values.
"""

from __future__ import annotations

import hashlib
import math
import os
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .index import build_index
from .index.read import norms_table, term_postings
from .search import IndexSearcher

# ---------------------------------------------------------------------------
# engine-over-documents plumbing

_INDEX_CACHE: dict[str, str] = {}
_SEARCHER_CACHE: dict[str, IndexSearcher] = {}


def docs_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the simple-analyzer index over `documents` at sf_dir."""
    key = os.path.realpath(sf_dir)
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    tag = hashlib.sha1(f"{key}:layout-v3".encode()).hexdigest()[:12]
    index_dir = f"/tmp/lss_docs_index/{tag}"
    marker = os.path.join(index_dir, "_built")
    if not os.path.exists(marker):
        docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .withColumnRenamed("doc_id", "ext_id")
        )
        build_index(
            spark,
            docs,
            index_dir,
            num_segments=8,
            analyzer="simple",
            key_cols=("ext_id",),
            content_col="text",
            stored_cols=("lang", "source"),
            resume=True,
        )
        with open(marker, "w") as f:
            f.write("ok")
    _INDEX_CACHE[key] = index_dir
    return index_dir


def _searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    d = docs_index_dir(spark, sf_dir)
    if d not in _SEARCHER_CACHE:
        _SEARCHER_CACHE[d] = IndexSearcher(spark, d, analyzer="simple", precision="f64")
    return _SEARCHER_CACHE[d]


# second analyzed field for the multi-field ops: the doc's first 8 tokens
# ("title"). Derived deterministically from text so the DuckDB oracle can
# reproduce it; built with the SAME keys/num_segments as the content index →
# coordinate-aligned (see search/multifield.py).
TITLE_TOKENS = 8


def title_index_dir(spark: SparkSession, sf_dir: str) -> str:
    key = os.path.realpath(sf_dir) + ":title"
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    tag = hashlib.sha1(f"{key}:layout-v3:t{TITLE_TOKENS}".encode()).hexdigest()[:12]
    index_dir = f"/tmp/lss_docs_index/{tag}"
    marker = os.path.join(index_dir, "_built")
    if not os.path.exists(marker):
        docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .withColumnRenamed("doc_id", "ext_id")
            .withColumn(
                "title_text",
                F.expr(f"concat_ws(' ', slice({_TOK_EXPR}, 1, {TITLE_TOKENS}))"),
            )
        )
        build_index(
            spark,
            docs,
            index_dir,
            num_segments=8,
            analyzer="simple",
            key_cols=("ext_id",),
            content_col="title_text",
            resume=True,
        )
        with open(marker, "w") as f:
            f.write("ok")
    _INDEX_CACHE[key] = index_dir
    return index_dir


# ---------------------------------------------------------------------------
# CJK bigram field — Solr text_cjk (StandardTokenizer → CJKWidthFilter →
# LowerCaseFilter → CJKBigramFilter, ``CJKBigramFilter.java:48``; engine
# chain: analysis.analyze_cjk). The driver corpus is ASCII, so the
# mixed-script corpus is DERIVED deterministically: translate() maps eight
# frequent letters to Han characters, turning each document into
# interleaved Han runs + Latin remnants — both engines apply the identical
# translate, so the DuckDB oracle runs the full BM25 pipeline over the
# same mixed-script text. No external data.

_CJK_TRANSLATE = ("aeiostrn", "的一是不了子而也")
_CJK_TOKENIZE = r"""
flatten([
  CASE WHEN regexp_matches(run, '^[\x{4e00}-\x{9fff}]')
       THEN CASE WHEN length(run) = 1 THEN [run]
                 ELSE [substring(run, i, 2) for i in generate_series(1, length(run)-1)] END
       ELSE [run] END
  for run in regexp_extract_all(translate(lower(text), '%s', '%s'), '[\x{4e00}-\x{9fff}]+|[a-z0-9]+')
])
""" % _CJK_TRANSLATE


def cjk_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Build (once) the cjk-analyzer index over the derived mixed-script
    corpus at sf_dir."""
    key = os.path.realpath(sf_dir) + ":cjk"
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    tag = hashlib.sha1(f"{key}:layout-v3:{_CJK_TRANSLATE[1]}".encode()).hexdigest()[:12]
    index_dir = f"/tmp/lss_docs_index/{tag}"
    marker = os.path.join(index_dir, "_built")
    if not os.path.exists(marker):
        docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .withColumnRenamed("doc_id", "ext_id")
            .withColumn(
                "cjk_text",
                F.translate(F.lower(F.col("text")), *_CJK_TRANSLATE),
            )
        )
        build_index(
            spark,
            docs,
            index_dir,
            num_segments=8,
            analyzer="cjk",
            key_cols=("ext_id",),
            content_col="cjk_text",
            resume=True,
        )
        with open(marker, "w") as f:
            f.write("ok")
    _INDEX_CACHE[key] = index_dir
    return index_dir


def _cjk_searcher(spark: SparkSession, sf_dir: str) -> IndexSearcher:
    d = cjk_index_dir(spark, sf_dir)
    if d not in _SEARCHER_CACHE:
        _SEARCHER_CACHE[d] = IndexSearcher(spark, d, analyzer="cjk", precision="f64")
    return _SEARCHER_CACHE[d]


def _cjk_search_all(spark: SparkSession, sf_dir: str, query) -> DataFrame:
    s = _cjk_searcher(spark, sf_dir)
    hits = s.search_many({0: query}, k=None).drop("qid")
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return (
        hits.join(docs, ["segment_id", "doc_id"])
        .select(F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score"))
    )


def _ft_search_all(spark: SparkSession, sf_dir: str, query) -> DataFrame:
    """Engine search (all matches, f64) resolved back to external doc_ids.
    ``query`` may be a string (parsed) or a Query object."""
    s = _searcher(spark, sf_dir)
    hits = s.search_many({0: query}, k=None).drop("qid")
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return (
        hits.join(docs, ["segment_id", "doc_id"])
        .select(F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score"))
    )


# ---------------------------------------------------------------------------
# DuckDB BM25 oracle SQL — the full pipeline in ANSI SQL

_TOKENIZE = "regexp_extract_all(lower(text), '[a-z0-9]+')"

# SmallFloat.intToByte4 / byte4ToInt as SQL (reference SmallFloat.java:101-169).
# Parametrized by CTE-name prefix + tokenize expression so multi-field oracles
# can instantiate the full pipeline once per analyzed field.
def _bm25_chain(p: str, tokenize: str) -> str:
    return f"""{p}tok AS (
  SELECT doc_id, unnest({tokenize}) AS term FROM documents
),
{p}dl AS (SELECT doc_id, count(*) AS len FROM {p}tok GROUP BY doc_id),
{p}dlq AS (
  SELECT doc_id, len,
    CASE WHEN len < 24 THEN len
         ELSE 24 + (CASE WHEN (len-24) < 8 THEN (len-24)
              ELSE (((len-24) >> (CAST(FLOOR(LOG2(len-24)) AS INT) - 3)) & 7)
                   | ((CAST(FLOOR(LOG2(len-24)) AS INT) - 2) << 3) END)
    END AS nb
  FROM {p}dl
),
{p}dld AS (
  SELECT doc_id, nb,
    CASE WHEN nb < 24 THEN nb
         ELSE 24 + (CASE WHEN ((nb-24) >> 3) = 0 THEN (nb-24) & 7
              ELSE (((nb-24) & 7) | 8) << (((nb-24) >> 3) - 1) END)
    END AS dlq
  FROM {p}dlq
),
{p}cstats AS (SELECT count(*) AS n, sum(len) AS st FROM {p}dl WHERE len > 0),
{p}tf AS (SELECT doc_id, term, count(*) AS tf FROM {p}tok GROUP BY 1, 2),
{p}dft AS (SELECT term, count(*) AS df FROM {p}tf GROUP BY 1)"""


_BM25_CTE = "WITH " + _bm25_chain("", _TOKENIZE) + "\n"

_SCORES_CTE = """
, scores AS (
  SELECT tf.doc_id, tf.term,
         ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5)) *
         (tf.tf / (tf.tf + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))) AS s
  FROM tf JOIN dft USING (term) JOIN dld ON tf.doc_id = dld.doc_id, cstats
  WHERE tf.term IN ({terms})
)
"""


def _terms_list(terms) -> str:
    return ", ".join(f"'{t}'" for t in terms)


def ft_term_sql(term: str) -> str:
    return (
        _BM25_CTE
        + _SCORES_CTE.format(terms=_terms_list([term]))
        + "SELECT doc_id, round(s, 4) AS score FROM scores"
    )


def ft_and_sql(terms) -> str:
    return (
        _BM25_CTE
        + _SCORES_CTE.format(terms=_terms_list(terms))
        + f"""
SELECT doc_id, round(sum(s), 4) AS score FROM scores
GROUP BY doc_id HAVING count(*) = {len(terms)}
"""
    )


def ft_or_sql(terms) -> str:
    return (
        _BM25_CTE
        + _SCORES_CTE.format(terms=_terms_list(terms))
        + "SELECT doc_id, round(sum(s), 4) AS score FROM scores GROUP BY doc_id"
    )


def ft_not_sql(pos: str, neg: str) -> str:
    return (
        _BM25_CTE
        + _SCORES_CTE.format(terms=_terms_list([pos]))
        + f"""
SELECT doc_id, round(s, 4) AS score FROM scores
WHERE doc_id NOT IN (SELECT doc_id FROM tf WHERE term = '{neg}')
"""
    )


def ft_phrase_sql(w1: str, w2: str) -> str:
    return (
        _BM25_CTE
        + f"""
, tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
),
phr AS (
  SELECT a.doc_id, count(*) AS freq
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{w1}' AND b.term = '{w2}' GROUP BY 1
),
pw AS (
  SELECT sum(ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
  FROM dft, cstats WHERE dft.term IN ('{w1}', '{w2}')
)
SELECT phr.doc_id,
       round(pw.w * (phr.freq / (phr.freq + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))), 4) AS score
FROM phr JOIN dld ON phr.doc_id = dld.doc_id, pw, cstats
"""
    )


FT_TF_SQL = (
    _BM25_CTE
    + "SELECT doc_id, term, tf FROM tf WHERE term IN ('spark', 'vector', 'hash')"
)

FT_DF_SQL = (
    _BM25_CTE
    + """
SELECT term, count(*) AS df, CAST(sum(tf) AS BIGINT) AS ttf FROM tf
WHERE term IN ('spark', 'vector', 'hash', 'table', 'the') GROUP BY term
"""
)

FT_NORMS_SQL = _BM25_CTE + "SELECT doc_id, nb AS norm_byte FROM dld"

TERMS_COMPONENT_SQL = (
    _BM25_CTE
    + """
SELECT term, count(*) AS df FROM tf
WHERE term LIKE 't%' GROUP BY term
ORDER BY df DESC, term ASC LIMIT 20
"""
)


# Solr SpellCheckComponent / Lucene DirectSpellChecker (reference lucene/
# suggest/src/java/org/apache/lucene/search/spell/DirectSpellChecker.java:40):
# suggest corrections for unknown query terms from the live term dictionary,
# maxEdits=2, ranked by (edit distance, df desc). The dictionary side is the
# published term_stats generation; the misspelled inputs are a handful of
# rows, so the candidate scan is one broadcast-joined pass over the
# dictionary — no postings access at all.
_SPELL_INPUTS = ["tabel", "strem", "hask", "cach"]


def spellcheck_suggest(spark, sf_dir):
    from pyspark.sql import Window

    s = _searcher(spark, sf_dir)
    inputs = spark.createDataFrame([(w,) for w in _SPELL_INPUTS], "input string")
    cand = (
        s._term_stats_df.select("term", "df")
        .crossJoin(F.broadcast(inputs))
        .withColumn("dist", F.levenshtein("term", "input").cast("long"))
        .filter((F.col("dist") <= 2) & (F.col("term") != F.col("input")))
    )
    w = Window.partitionBy("input").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("input", F.col("term").alias("suggestion"), "df", "dist")
    )


# FreeTextSuggester (reference lucene/suggest/src/java/org/apache/lucene/
# search/suggest/analyzing/FreeTextSuggester.java:66-120): an n-gram language
# model over the corpus suggests the next word for a typed context. This op is
# the bigram level of that model (the reference backs off through lower orders
# weighted 0.4^k; a single order keeps the op deterministic and oracle-exact).
# Scale shape: bigrams come from a scan-local slice+zip over each doc's token
# array — NO position self-join, no shuffle before the one map-side-combinable
# count groupBy; the context filter prunes before the tiny top-5 window.
_SUGGEST_CTX = ["hash", "index", "query"]


def freetext_suggest(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    # greatest(…, 0): slice() rejects a negative length, and a zero-token
    # doc (no [a-z0-9] runs) would otherwise crash the whole op
    pairs = F.expr(
        "transform(slice(arr, 1, greatest(size(arr)-1, 0)), "
        "(x, i) -> struct(x AS context, arr[i+1] AS suggestion))"
    )
    big = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.context", "p.suggestion")
        .filter(F.col("context").isin(_SUGGEST_CTX))
        .groupBy("context", "suggestion")
        .agg(F.count("*").alias("weight"))
    )
    w = Window.partitionBy("context").orderBy(
        F.col("weight").desc(), F.col("suggestion").asc()
    )
    return (
        big.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("context", "suggestion", "weight")
    )


_SUGGEST_CTX_LIST = ", ".join(f"'{w}'" for w in _SUGGEST_CTX)
FREETEXT_SUGGEST_SQL = f"""
WITH tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
),
big AS (
  SELECT a.term AS context, b.term AS suggestion, count(*) AS weight
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term IN ({_SUGGEST_CTX_LIST})
  GROUP BY 1, 2
)
SELECT context, suggestion, weight FROM (
  SELECT *, row_number() OVER (PARTITION BY context
            ORDER BY weight DESC, suggestion ASC) AS rk
  FROM big
) WHERE rk <= 5
"""


# PhoneticFilterFactory role (reference lucene/analysis/phonetic/src/java/
# org/apache/lucene/analysis/phonetic/PhoneticFilter.java:33 + Solr's
# solr.PhoneticFilterFactory with the commons-codec Soundex encoder):
# sound-alike matching by phonetic key. The key here is the classic
# American Soundex (public algorithm; the SQL-style variant that strips
# h/w up front), expressed as the SAME strip → translate → per-digit run
# collapse → zero-strip chain in Catalyst and DuckDB so keys are identical
# by construction (RE2 has no backreferences, hence six per-digit collapse
# replaces instead of one (\d)\1+). Keying the dictionary is one scan-local
# pass over term_stats; suggestion lookup is a broadcast join on the key.
_SOUNDEX_FROM = "abcdefgijklmnopqrstuvxyz0123456789"
_SOUNDEX_TO = "012301202245501262301202" + "0" * 10


def _soundex_spark(col):
    s = F.regexp_replace(col, "[hw]", "")
    m = F.translate(s, _SOUNDEX_FROM, _SOUNDEX_TO)
    for d in "123456":
        m = F.regexp_replace(m, f"{d}+", d)
    return F.concat(
        F.upper(F.substring(col, 1, 1)),
        F.rpad(F.regexp_replace(F.substring(m, 2, 100), "0", ""), 3, "0").substr(1, 3),
    )


def _soundex_sql(expr: str) -> str:
    m = f"translate(regexp_replace({expr}, '[hw]', '', 'g'), '{_SOUNDEX_FROM}', '{_SOUNDEX_TO}')"
    for d in "123456":
        m = f"regexp_replace({m}, '{d}+', '{d}', 'g')"
    return (
        f"upper(substr({expr}, 1, 1)) || "
        f"substr(rpad(replace(substr({m}, 2), '0', ''), 3, '0'), 1, 3)"
    )


_PHONETIC_INPUTS = ["kache", "parz", "hasch", "tabel"]


def _dmetaphone_suggest(spark, sf_dir, inputs):
    """Double Metaphone keying (``DoubleMetaphoneFilter.java:31`` — the real
    Solr phonetic default): each word carries a primary AND an alternate
    key; a term suggests for an input when their key SETS intersect (the
    filter injects both keys as stacked tokens, so any overlap matches —
    smith(SM0/XMT) ↔ schmidt(XMT/SMT) meet on XMT). The rule cascade is
    procedural (no SQL twin — correctness pinned by the published vectors
    in tests/test_phonetic.py); the dictionary pass is one Arrow-batched
    UDF over term_stats — dictionary-grain, never the corpus."""
    from pyspark.sql import Window
    from pyspark.sql.functions import pandas_udf

    from .phonetic import double_metaphone

    s = _searcher(spark, sf_dir)
    in_rows = [
        (w, k) for w in inputs for k in set(double_metaphone(w)) if k
    ]
    in_df = spark.createDataFrame(in_rows, "input string, key string")

    @pandas_udf("array<string>")
    def dm_keys(col: pd.Series) -> pd.Series:
        return col.map(lambda w: sorted({k for k in double_metaphone(w) if k}))

    cand = (
        s._term_stats_df.select("term", "df")
        .withColumn("key", F.explode(dm_keys(F.col("term"))))
        .join(F.broadcast(in_df), "key")
        .filter(F.col("term") != F.col("input"))
        .groupBy("input", "term")
        .agg(F.max("df").alias("df"), F.min("key").alias("key"))
    )
    w = Window.partitionBy("input").orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("input", F.col("term").alias("suggestion"), "df", "key")
    )


def phonetic_suggest(spark, sf_dir, encoder: str = "soundex", inputs=None):
    from pyspark.sql import Window

    if encoder == "dmetaphone":
        return _dmetaphone_suggest(spark, sf_dir, inputs or _PHONETIC_INPUTS)
    if encoder != "soundex":
        raise ValueError(f"unknown phonetic encoder {encoder!r} "
                         "(supported: soundex, dmetaphone)")
    if inputs is not None:
        raise ValueError("custom inputs are a dmetaphone-path knob; the "
                         "soundex op is pinned to the DuckDB oracle's list")
    s = _searcher(spark, sf_dir)
    inputs = spark.createDataFrame(
        [(w,) for w in _PHONETIC_INPUTS], "input string"
    ).select("input", _soundex_spark(F.col("input")).alias("key"))
    cand = (
        s._term_stats_df.select("term", "df")
        .withColumn("key", _soundex_spark(F.col("term")))
        .join(F.broadcast(inputs), "key")
        .filter(F.col("term") != F.col("input"))
    )
    w = Window.partitionBy("input").orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("input", F.col("term").alias("suggestion"), "df", "key")
    )


_PHONETIC_LIST = ", ".join(f"'{w}'" for w in _PHONETIC_INPUTS)
PHONETIC_SUGGEST_SQL = (
    _BM25_CTE
    + f"""
, d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
inputs AS (
  SELECT input, {_soundex_sql('input')} AS key
  FROM (SELECT unnest([{_PHONETIC_LIST}]) AS input)
),
cand AS (
  SELECT i.input, d.term AS suggestion, d.df, i.key
  FROM d JOIN inputs i ON {_soundex_sql('d.term')} = i.key
  WHERE d.term <> i.input
)
SELECT input, suggestion, df, key FROM (
  SELECT *, row_number() OVER (PARTITION BY input
            ORDER BY df DESC, suggestion ASC) AS rk FROM cand
) WHERE rk <= 5
"""
)


# FreeTextSuggester with STUPID BACKOFF (FreeTextSuggester.java:96-133,
# lookup:506-669): scores smooth across n-gram orders — at the bigram level
# score = count(context, w) / count(context); a word NOT accepted there may
# still surface from the unigram level at ALPHA(=0.4) · count(w) / totTokens
# (backoff *= ALPHA per order, :548,669). The `seen` set holding back lower
# orders contains only the candidates ACCEPTED at higher orders (:658-662),
# i.e. the bigram top-k, not every continuation. All scores are one integer
# division (+ the ALPHA factor) — f64-identical cross-engine. Scale shape:
# same scan-local bigram slice+zip as freetext_suggest plus one unigram
# count agg; the per-context union is window-topped at k.
def freetext_backoff_suggest(spark, sf_dir):
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    pairs = F.expr(
        "transform(slice(arr, 1, greatest(size(arr)-1, 0)), "
        "(x, i) -> struct(x AS context, arr[i+1] AS suggestion))"
    )
    uni = (
        d.select(F.explode("arr").alias("term"))
        .groupBy("term")
        .agg(F.count("*").alias("cnt"))
        .cache()
    )
    tot_tokens = uni.agg(F.sum("cnt")).collect()[0][0]
    ctx_counts = {
        r["term"]: r["cnt"] for r in uni.filter(F.col("term").isin(_SUGGEST_CTX)).collect()
    }
    ctx_map = F.create_map(*[F.lit(v) for kv in ctx_counts.items() for v in kv])
    big = (
        d.select(F.explode(pairs).alias("p"))
        .select("p.context", "p.suggestion")
        .filter(F.col("context").isin(_SUGGEST_CTX))
        .groupBy("context", "suggestion")
        .agg(F.count("*").alias("c"))
        .select(
            "context",
            "suggestion",
            F.round(F.col("c").cast("double") / ctx_map[F.col("context")], 6).alias(
                "score"
            ),
        )
    )
    w = Window.partitionBy("context").orderBy(
        F.col("score").desc(), F.col("suggestion").asc()
    )
    big_top = big.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 5)
    # unigram backoff level: every word, ALPHA-damped, minus the accepted set
    contexts = spark.createDataFrame([(c,) for c in _SUGGEST_CTX], "context string")
    uni_lvl = (
        uni.crossJoin(F.broadcast(contexts))
        .select(
            "context",
            F.col("term").alias("suggestion"),
            F.round(0.4 * F.col("cnt").cast("double") / F.lit(float(tot_tokens)), 6).alias("score"),
        )
        .join(big_top.select("context", "suggestion"), ["context", "suggestion"], "left_anti")
    )
    both = big_top.select("context", "suggestion", "score").unionAll(uni_lvl)
    out = (
        both.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("context", "suggestion", "score")
    )
    uni.unpersist()
    return out


FREETEXT_BACKOFF_SQL = f"""
WITH tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {{tok}} AS arr FROM documents)
),
uni AS (SELECT term, count(*) AS cnt FROM tokp GROUP BY term),
tot AS (SELECT sum(cnt) AS t FROM uni),
big AS (
  SELECT a.term AS context, b.term AS suggestion,
         round(CAST(count(*) AS DOUBLE) / any_value(u.cnt), 6) AS score
  FROM tokp a
  JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN uni u ON u.term = a.term
  WHERE a.term IN ({{ctx}})
  GROUP BY a.term, b.term
),
big_top AS (
  SELECT context, suggestion, score FROM (
    SELECT *, row_number() OVER (PARTITION BY context
              ORDER BY score DESC, suggestion ASC) AS rk FROM big
  ) WHERE rk <= 5
),
uni_lvl AS (
  SELECT c.context, u.term AS suggestion,
         round(0.4 * CAST(u.cnt AS DOUBLE) / (SELECT CAST(t AS DOUBLE) FROM tot), 6) AS score
  FROM uni u CROSS JOIN (SELECT unnest([{{ctx}}]) AS context) c
  WHERE NOT EXISTS (
    SELECT 1 FROM big_top bt
    WHERE bt.context = c.context AND bt.suggestion = u.term
  )
),
lvls AS (SELECT * FROM big_top UNION ALL SELECT * FROM uni_lvl)
SELECT context, suggestion, score FROM (
  SELECT *, row_number() OVER (PARTITION BY context
            ORDER BY score DESC, suggestion ASC) AS rk FROM lvls
) WHERE rk <= 5
""".format(tok=_TOKENIZE, ctx=_SUGGEST_CTX_LIST)


# AnalyzingSuggester (reference lucene/suggest/src/java/org/apache/lucene/
# search/suggest/analyzing/AnalyzingSuggester.java:119-175): completion
# where BOTH the stored suggestions and the typed prefix go through the
# analyzer, so "The hash" completes against suggestions whose analyzed form
# starts with "hash" (stop words dropped, case folded) — prior tokens match
# exactly, the final typed token as a prefix, exactly the FST traversal
# semantics. Ranked by weight desc (here: suggestion popularity), surface
# form returned. Scale shape: the dictionary is a distinct+count groupBy
# (map-side combinable) over a scan-local token slice; the handful of typed
# prefixes broadcast into a prefix join — the corpus never shuffles twice.
_ASUG_INPUTS = ["The hash", "index t", "QUERY pl"]


def _analyzed_prefix(s: str) -> str:
    """Query-side analysis (constant inputs, driver-side): the same
    lowercase [a-z0-9]+ + stop-filter chain the dictionary keys use."""
    from .analysis import ENGLISH_STOP_WORDS

    return " ".join(
        t for t in re.findall(r"[a-z0-9]+", s.lower()) if t not in ENGLISH_STOP_WORDS
    )


def _sugg_frame(spark, sf_dir):
    """The suggestion dictionary both analyzing/fuzzy suggesters share:
    3-token surfaces weighted by frequency, keyed by their analyzed
    (stop-filtered) form — the AnalyzingSuggester FST input pairs."""
    from .analysis import ENGLISH_STOP_WORDS

    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    return (
        d.select(F.expr("concat_ws(' ', slice(arr, 1, 3))").alias("surface"))
        .filter(F.col("surface") != "")
        .groupBy("surface")
        .agg(F.count("*").alias("weight"))
        .withColumn(
            "akey",
            F.expr(
                "concat_ws(' ', filter(split(surface, ' '), "
                f"t -> NOT array_contains(array({stops}), t)))"
            ),
        )
    )


def _topk_per_input(cand):
    from pyspark.sql import Window

    w = Window.partitionBy("input").orderBy(
        F.col("weight").desc(), F.col("surface").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("input", "surface", "weight")
    )


def analyzing_suggest(spark, sf_dir):
    sugg = _sugg_frame(spark, sf_dir)
    inputs = spark.createDataFrame(
        [(s, _analyzed_prefix(s)) for s in _ASUG_INPUTS], "input string, aprefix string"
    )
    cand = sugg.join(F.broadcast(inputs), F.col("akey").startswith(F.col("aprefix")))
    return _topk_per_input(cand)


# FuzzySuggester (``suggest/analyzing/FuzzySuggester.java:36-95``): the
# analyzing suggester's completion with Levenshtein tolerance on the
# analyzed input — defaults maxEdits=1, nonFuzzyPrefix=1 (first char exact),
# minFuzzyLength=3 (shorter inputs complete exactly). The automaton accepts
# keys whose SOME prefix is within maxEdits of the input; since one edit
# changes prefix length by at most one, testing prefix lengths |q|-1..|q|+1
# is exact. Deviation: classic Levenshtein (a transposition costs 2), i.e.
# the ``transpositions=false`` constructor config.
_FSUG_INPUTS = ["hach", "custamer", "merge grup"]


def fuzzy_suggest(spark, sf_dir):
    sugg = _sugg_frame(spark, sf_dir)
    inputs = spark.createDataFrame(
        [(s, _analyzed_prefix(s)) for s in _FSUG_INPUTS], "input string, aprefix string"
    )
    lev = lambda delta: (
        F.levenshtein(
            F.expr(f"substr(akey, 1, length(aprefix) + ({delta}))"),
            F.col("aprefix"),
        )
        <= 1
    )
    fuzzy_ok = (
        (F.expr("substr(akey, 1, 1) = substr(aprefix, 1, 1)"))
        & (lev(-1) | lev(0) | lev(1))
    )
    cond = F.when(F.length("aprefix") < 3, F.col("akey").startswith(F.col("aprefix"))).otherwise(fuzzy_ok)
    cand = sugg.join(F.broadcast(inputs), cond)
    return _topk_per_input(cand)


def _fsug_sql() -> str:
    from .analysis import ENGLISH_STOP_WORDS

    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    vals = ", ".join(f"('{s}', '{_analyzed_prefix(s)}')" for s in _FSUG_INPUTS)
    return f"""
WITH sugg AS (
  SELECT array_to_string(list_slice(arr, 1, 3), ' ') AS surface, count(*) AS weight
  FROM (SELECT {_TOKENIZE} AS arr FROM documents)
  GROUP BY 1
), keyed AS (
  SELECT surface, weight,
         array_to_string(list_filter(string_split(surface, ' '),
                                     t -> t NOT IN ({stops})), ' ') AS akey
  FROM sugg WHERE surface <> ''
), inputs(input, aprefix) AS (VALUES {vals}),
cand AS (
  SELECT i.input, s.surface, s.weight
  FROM keyed s JOIN inputs i ON
    CASE WHEN length(i.aprefix) < 3
         THEN s.akey LIKE i.aprefix || '%'
         ELSE substr(s.akey, 1, 1) = substr(i.aprefix, 1, 1)
              AND (levenshtein(substr(s.akey, 1, length(i.aprefix) - 1), i.aprefix) <= 1
                   OR levenshtein(substr(s.akey, 1, length(i.aprefix)), i.aprefix) <= 1
                   OR levenshtein(substr(s.akey, 1, length(i.aprefix) + 1), i.aprefix) <= 1)
    END
)
SELECT input, surface, weight FROM (
  SELECT *, row_number() OVER (PARTITION BY input
            ORDER BY weight DESC, surface ASC) AS rk
  FROM cand
) WHERE rk <= 5
"""


def _asug_sql() -> str:
    from .analysis import ENGLISH_STOP_WORDS

    stops = ", ".join(f"'{w}'" for w in sorted(ENGLISH_STOP_WORDS))
    vals = ", ".join(
        f"('{s}', '{_analyzed_prefix(s)}')" for s in _ASUG_INPUTS
    )
    return f"""
WITH sugg AS (
  SELECT array_to_string(list_slice(arr, 1, 3), ' ') AS surface, count(*) AS weight
  FROM (SELECT {_TOKENIZE} AS arr FROM documents)
  GROUP BY 1
), keyed AS (
  SELECT surface, weight,
         array_to_string(list_filter(string_split(surface, ' '),
                                     t -> t NOT IN ({stops})), ' ') AS akey
  FROM sugg WHERE surface <> ''
), inputs(input, aprefix) AS (VALUES {vals}),
cand AS (
  SELECT i.input, s.surface, s.weight
  FROM keyed s JOIN inputs i ON s.akey LIKE i.aprefix || '%'
)
SELECT input, surface, weight FROM (
  SELECT *, row_number() OVER (PARTITION BY input
            ORDER BY weight DESC, surface ASC) AS rk
  FROM cand
) WHERE rk <= 5
"""


# Multi-field search gate (MultiFieldQueryParser / dismax qf, see
# search/multifield.py): content field + derived title field (first
# TITLE_TOKENS tokens), title boosted 2x, sum combine. The DuckDB oracle
# instantiates the ENTIRE BM25+SmallFloat pipeline once per field via
# _bm25_chain and sums the per-field per-doc scores.
_MF_QUERY = "hash OR index"
_MF_TERMS = ("hash", "index")
_MF_TITLE_BOOST = 2.0


def ft_multifield(spark, sf_dir):
    from .search.multifield import MultiFieldSearcher

    d_c = docs_index_dir(spark, sf_dir)
    d_t = title_index_dir(spark, sf_dir)
    mf = MultiFieldSearcher(
        spark,
        {"text": (d_c, 1.0), "title": (d_t, _MF_TITLE_BOOST)},
        analyzer="simple",
        precision="f64",
    )
    hits = mf.search(_MF_QUERY, k=None).select("segment_id", "doc_id", "score")
    docs = spark.read.parquet(os.path.join(d_c, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return hits.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score")
    )


def _mf_score_cte(p: str, name: str, terms) -> str:
    tl = ", ".join(f"'{t}'" for t in terms)
    return f"""{name} AS (
  SELECT {p}tf.doc_id,
         sum(ln(1 + ({p}cstats.n - {p}dft.df + 0.5) / ({p}dft.df + 0.5)) *
             ({p}tf.tf / ({p}tf.tf + 1.2 * (0.25 + 0.75 * {p}dld.dlq /
                          ({p}cstats.st * 1.0 / {p}cstats.n))))) AS s
  FROM {p}tf JOIN {p}dft USING (term)
       JOIN {p}dld ON {p}tf.doc_id = {p}dld.doc_id, {p}cstats
  WHERE {p}tf.term IN ({tl}) GROUP BY {p}tf.doc_id
)"""


FT_MULTIFIELD_SQL = f"""
WITH {_bm25_chain("", _TOKENIZE)},
{_bm25_chain("t_", f"list_slice({_TOKENIZE}, 1, {TITLE_TOKENS})")},
{_mf_score_cte("", "cscore", _MF_TERMS)},
{_mf_score_cte("t_", "tscore", _MF_TERMS)}
SELECT coalesce(c.doc_id, t.doc_id) AS doc_id,
       round(coalesce(c.s, 0) + {_MF_TITLE_BOOST} * coalesce(t.s, 0), 4) AS score
FROM cscore c FULL OUTER JOIN tscore t ON c.doc_id = t.doc_id
"""


# BM25F combined-field gate (search/bm25f.py — sandbox BM25FQuery.java +
# MultiNormsLeafSimScorer.java): the SAME two aligned fields as ft_multifield
# but blended BEFORE tf saturation: freq = Σ w_f·tf_f, norm =
# intToByte4(round(Σ w_f·byte4ToInt(norm_f))), pseudo stats df=max /
# docCount=max / sumttf=Σw·sttf. The oracle re-derives every piece in SQL,
# including the re-quantization round-trip of the combined norm.
_BM25F_TERMS = ("hash", "index")
_BM25F_TITLE_W = 2.0


def ft_bm25f(spark, sf_dir):
    from .search.bm25f import BM25FSearcher

    d_c = docs_index_dir(spark, sf_dir)
    d_t = title_index_dir(spark, sf_dir)
    bf = BM25FSearcher(
        spark,
        {"text": (d_c, 1.0), "title": (d_t, _BM25F_TITLE_W)},
        analyzer="simple",
        precision="f64",
    )
    hits = bf.search(_BM25F_TERMS, k=None)
    docs = spark.read.parquet(os.path.join(d_c, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return hits.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score")
    )


def _bm25f_sql() -> str:
    tl = ", ".join(f"'{t}'" for t in _BM25F_TERMS)
    w = _BM25F_TITLE_W
    enc = (
        "CASE WHEN v < 24 THEN v ELSE 24 + ("
        "CASE WHEN (v-24) < 8 THEN (v-24) "
        "ELSE (((v-24) >> (CAST(FLOOR(LOG2(v-24)) AS INT) - 3)) & 7) "
        "| ((CAST(FLOOR(LOG2(v-24)) AS INT) - 2) << 3) END) END"
    )
    dec = (
        "CASE WHEN nb < 24 THEN nb ELSE 24 + ("
        "CASE WHEN ((nb-24) >> 3) = 0 THEN (nb-24) & 7 "
        "ELSE (((nb-24) & 7) | 8) << (((nb-24) >> 3) - 1) END) END"
    )
    return f"""
WITH {_bm25_chain("", _TOKENIZE)},
{_bm25_chain("t_", f"list_slice({_TOKENIZE}, 1, {TITLE_TOKENS})")},
cn0 AS (
  SELECT d.doc_id, CAST(round(1.0 * d.dlq + {w} * t.dlq) AS BIGINT) AS v
  FROM dld d JOIN t_dld t ON d.doc_id = t.doc_id
),
cnb AS (SELECT doc_id, {enc} AS nb FROM cn0),
cdl AS (SELECT doc_id, {dec} AS dl FROM cnb),
ff AS (
  SELECT doc_id, sum(wtf) AS freq FROM (
    SELECT doc_id, 1.0 * tf AS wtf FROM tf WHERE term IN ({tl})
    UNION ALL
    SELECT doc_id, {w} * tf FROM t_tf WHERE term IN ({tl})
  ) GROUP BY doc_id
),
pst AS (SELECT greatest(c.n, t.n) AS n, (1.0 * c.st + {w} * t.st) AS st
        FROM cstats c, t_cstats t),
pdf AS (SELECT max(df) AS df FROM (
  SELECT df FROM dft WHERE term IN ({tl})
  UNION ALL SELECT df FROM t_dft WHERE term IN ({tl})
))
SELECT f.doc_id,
       round(ln(1 + (pst.n - pdf.df + 0.5) / (pdf.df + 0.5)) * f.freq /
             (f.freq + 1.2 * (0.25 + 0.75 * cdl.dl / (pst.st * 1.0 / pst.n))),
             4) AS score
FROM ff f JOIN cdl ON f.doc_id = cdl.doc_id, pst, pdf
"""


FT_BM25F_SQL = _bm25f_sql()


# (e)DisMax gate (search/edismax.py — DisMaxQParser.java qf/mm/pf/tie +
# ExtendedDismaxQParser.java leniency): q = two SHOULD clauses over
# text^1/title^2 with per-CLAUSE dismax (tie=0.1), mm="2" (both clauses
# required), pf = whole-query phrase boost on title^1.5. The oracle
# instantiates the BM25+SmallFloat pipeline per field, dismaxes per
# (doc, term), pivots per doc with the mm HAVING, and adds the title
# phrase-adjacency score weighted by the summed term idfs (PhraseQuery
# pseudo-term weighting, BM25Similarity.java:172-181).
_EDM_T1, _EDM_T2 = "join", "key"
_EDM_TIE, _EDM_TITLE_BOOST, _EDM_PF_BOOST = 0.1, 2.0, 1.5


def ft_edismax(spark, sf_dir):
    from .search.edismax import EDisMaxSearcher

    d_c = docs_index_dir(spark, sf_dir)
    d_t = title_index_dir(spark, sf_dir)
    ed = EDisMaxSearcher(
        spark,
        {"text": (d_c, 1.0), "title": (d_t, _EDM_TITLE_BOOST)},
        analyzer="simple",
        precision="f64",
        tie=_EDM_TIE,
    )
    hits = ed.search(
        f"{_EDM_T1} {_EDM_T2}", mm="2", pf={"title": _EDM_PF_BOOST}, k=None
    )
    docs = spark.read.parquet(os.path.join(d_c, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return hits.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score")
    )


def _edm_tscore_cte(p: str) -> str:
    """Per-(doc, term) BM25 score CTE for one field (prefix p)."""
    tl = f"'{_EDM_T1}', '{_EDM_T2}'"
    return f"""{p}tsc AS (
  SELECT {p}tf.doc_id, {p}tf.term,
         ln(1 + ({p}cstats.n - {p}dft.df + 0.5) / ({p}dft.df + 0.5)) *
         ({p}tf.tf / ({p}tf.tf + 1.2 * (0.25 + 0.75 * {p}dld.dlq /
                      ({p}cstats.st * 1.0 / {p}cstats.n)))) AS s
  FROM {p}tf JOIN {p}dft USING (term)
       JOIN {p}dld ON {p}tf.doc_id = {p}dld.doc_id, {p}cstats
  WHERE {p}tf.term IN ({tl})
)"""


_EDM_TITLE_TOK = f"list_slice({_TOKENIZE}, 1, {TITLE_TOKENS})"

FT_EDISMAX_SQL = f"""
WITH {_bm25_chain("", _TOKENIZE)},
{_bm25_chain("t_", _EDM_TITLE_TOK)},
{_edm_tscore_cte("")},
{_edm_tscore_cte("t_")},
merged AS (
  SELECT coalesce(c.doc_id, t.doc_id) AS doc_id,
         coalesce(c.term, t.term) AS term,
         1.0 * c.s AS sa, {_EDM_TITLE_BOOST} * t.s AS sb
  FROM tsc c FULL OUTER JOIN t_tsc t
       ON c.doc_id = t.doc_id AND c.term = t.term
),
cl AS (
  SELECT doc_id, term,
         greatest(coalesce(sa, -1e308), coalesce(sb, -1e308)) AS mx,
         coalesce(sa, 0) + coalesce(sb, 0) AS sm
  FROM merged
),
docagg AS (
  SELECT doc_id, sum(mx + {_EDM_TIE} * (sm - mx)) AS score, count(*) AS nsh
  FROM cl GROUP BY doc_id
),
tpos AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_EDM_TITLE_TOK} AS arr FROM documents)
),
ph AS (
  SELECT a.doc_id, count(*) AS freq
  FROM tpos a JOIN tpos b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = '{_EDM_T1}' AND b.term = '{_EDM_T2}' GROUP BY a.doc_id
),
phw AS (
  SELECT sum(ln(1 + (t_cstats.n - t_dft.df + 0.5) / (t_dft.df + 0.5))) AS w
  FROM t_dft, t_cstats WHERE t_dft.term IN ('{_EDM_T1}', '{_EDM_T2}')
),
phs AS (
  SELECT ph.doc_id,
         phw.w * (ph.freq / (ph.freq + 1.2 * (0.25 + 0.75 * t_dld.dlq /
                  (t_cstats.st * 1.0 / t_cstats.n)))) AS s
  FROM ph JOIN t_dld ON ph.doc_id = t_dld.doc_id, phw, t_cstats
)
SELECT d.doc_id AS doc_id,
       round(d.score + {_EDM_PF_BOOST} * coalesce(p.s, 0), 4) AS score
FROM docagg d LEFT JOIN phs p ON d.doc_id = p.doc_id
WHERE d.nsh >= 2
"""


_SPELL_IN_LIST = ", ".join(f"'{w}'" for w in _SPELL_INPUTS)
SPELLCHECK_SQL = (
    _BM25_CTE
    + f""",
inputs AS (SELECT unnest([{_SPELL_IN_LIST}]) AS input),
cand AS (
  SELECT i.input, d.term AS suggestion, d.df,
         CAST(levenshtein(d.term, i.input) AS BIGINT) AS dist
  FROM dft d CROSS JOIN inputs i
  WHERE levenshtein(d.term, i.input) <= 2 AND d.term != i.input
)
SELECT input, suggestion, df, dist FROM (
  SELECT *, row_number() OVER (PARTITION BY input
            ORDER BY dist ASC, df DESC, suggestion ASC) AS rk
  FROM cand
) WHERE rk <= 5
"""
)


# WordBreakSpellChecker (reference lucene/suggest/src/java/org/apache/
# lucene/search/spell/WordBreakSpellChecker.java): run-on words break into
# dictionary words (suggestWordBreaks:90 — every split point whose left AND
# right parts both clear minSuggestionFrequency, ranked
# NUM_CHANGES_THEN_MAX_FREQUENCY; maxChanges defaults to 1 = single break),
# and adjacent query terms combine into one dictionary word
# (suggestWordCombinations:159, SUGGEST_WHEN_NOT_IN_INDEX: only when at
# least one part is absent from the index, combined freq ≥ min). The split
# points are plan-time literals (the inputs are the op's query), so both
# ops are one broadcast join of the tiny candidate set against the term
# dictionary — the same no-postings shape as spellcheck_suggest.
_WORDBREAK_INPUTS = ["sorttable", "bigbatch", "querykey", "streamjoin", "zzzyx"]


def wordbreak_suggest(spark, sf_dir):
    from pyspark.sql import Window

    s = _searcher(spark, sf_dir)
    rows = [
        (w, w[:i], w[i:])
        for w in _WORDBREAK_INPUTS
        for i in range(1, len(w))
    ]
    splits = spark.createDataFrame(rows, "input string, left string, right string")
    d = s._term_stats_df.select("term", "df")
    lf = d.select(F.col("term").alias("left"), F.col("df").alias("left_df"))
    rf = d.select(F.col("term").alias("right"), F.col("df").alias("right_df"))
    cand = F.broadcast(splits).join(lf, "left").join(rf, "right")
    w = Window.partitionBy("input").orderBy(
        F.greatest("left_df", "right_df").desc(), F.col("left").asc()
    )
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select(
            "input", "left", "right",
            F.col("left_df").cast("bigint").alias("left_df"),
            F.col("right_df").cast("bigint").alias("right_df"),
            F.col("rk").cast("bigint").alias("rk"),
        )
    )


_WB_IN_LIST = ", ".join(f"'{w}'" for w in _WORDBREAK_INPUTS)
WORDBREAK_SQL = (
    _BM25_CTE
    + f""",
inputs AS (SELECT unnest([{_WB_IN_LIST}]) AS input),
splits AS (
  SELECT input, substr(input, 1, CAST(i AS INT)) AS l,
         substr(input, CAST(i AS INT) + 1) AS r
  FROM inputs CROSS JOIN range(1, 64) t(i)
  WHERE i <= length(input) - 1
),
cand AS (
  SELECT s.input, s.l AS "left", s.r AS "right", dl.df AS left_df, dr.df AS right_df
  FROM splits s
  JOIN dft dl ON dl.term = s.l
  JOIN dft dr ON dr.term = s.r
)
SELECT input, "left", "right", CAST(left_df AS BIGINT) AS left_df,
       CAST(right_df AS BIGINT) AS right_df, CAST(rk AS BIGINT) AS rk
FROM (
  SELECT *, row_number() OVER (PARTITION BY input
            ORDER BY greatest(left_df, right_df) DESC, "left" ASC) AS rk
  FROM cand
) WHERE rk <= 3
"""
)


_COMBINE_QUERY = ["val", "ue", "table", "str", "eam"]


def wordcombine_suggest(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    pairs = [
        (i, _COMBINE_QUERY[i], _COMBINE_QUERY[i + 1],
         _COMBINE_QUERY[i] + _COMBINE_QUERY[i + 1])
        for i in range(len(_COMBINE_QUERY) - 1)
    ]
    pf = spark.createDataFrame(
        pairs, "pos int, left string, right string, combined string"
    )
    d = s._term_stats_df.select("term", "df")
    j = (
        F.broadcast(pf)
        .join(d.select(F.col("term").alias("left"), F.col("df").alias("ldf")), "left", "left")
        .join(d.select(F.col("term").alias("right"), F.col("df").alias("rdf")), "right", "left")
        .join(d.select(F.col("term").alias("combined"), F.col("df").alias("df")), "combined")
    )
    # SUGGEST_WHEN_NOT_IN_INDEX: at least one original term absent
    return (
        j.filter(F.least(F.coalesce("ldf", F.lit(0)), F.coalesce("rdf", F.lit(0))) == 0)
        .select(
            F.col("pos").cast("bigint").alias("pos"),
            "left", "right", "combined",
            F.col("df").cast("bigint").alias("df"),
        )
    )


_CQ_IN_LIST = ", ".join(f"'{w}'" for w in _COMBINE_QUERY)
WORDCOMBINE_SQL = (
    _BM25_CTE
    + f""",
q AS (SELECT CAST(i AS INT) AS pos, w FROM (
        SELECT unnest([{_CQ_IN_LIST}]) AS w,
               unnest(range(0, {len(_COMBINE_QUERY)})) AS i)),
pairs AS (
  SELECT a.pos, a.w AS "left", b.w AS "right", a.w || b.w AS combined
  FROM q a JOIN q b ON b.pos = a.pos + 1
)
SELECT CAST(p.pos AS BIGINT) AS pos, p."left", p."right", p.combined,
       CAST(dc.df AS BIGINT) AS df
FROM pairs p
LEFT JOIN dft dl ON dl.term = p."left"
LEFT JOIN dft dr ON dr.term = p."right"
JOIN dft dc ON dc.term = p.combined
WHERE least(coalesce(dl.df, 0), coalesce(dr.df, 0)) = 0
"""
)


# PhrasesIdentificationComponent (reference solr/core/src/java/org/apache/
# solr/handler/component/PhrasesIdentificationComponent.java:115): score the
# sub-phrases of a query string as "real phrases" from indexed shingle
# statistics — the bayesian categorization model of computeFieldScore
# (:~830-950): for each largest-indexed sub-phrase ("words", a bigram at
# maxIndexedPositionLength=2) of a candidate phrase P,
#   P(words|phrase)      = shingle_ttf / min(word ttf)
#   P(phrase)            = conj(P) / conj(words)   (minus the max wrapper
#                          probability — zero here: no indexed phrase is
#                          longer than the shingle size)
#   P(words|not phrase)  = shingle_ttf / max(word ttf)
#   words_score = P(w|p)·P(p) − P(w|¬p)·(1 − P(p))
# summed over the bigrams, scaled by 1/(1+maxQuery−maxIndexed) and by
# conj(P)/max_sub_conj. A phrase with a missing term or an empty
# conjunction scores −1; single words score 0 (the component's sentinel
# contract). This op fixes maxIndexedPositionLength=2 /
# maxQueryPositionLength=3, one field at weight 1 — the default shipped
# shingle config. Everything derives from two scans: token incidence
# (conjunction counts) and the slice+zip adjacent-pair shingle counts —
# no shingle field needs to exist ahead of time, the stats ARE the role.
_PHRASE_QUERY = ["hash", "table", "scan", "fast"]


def _phrase_cands():
    q = _PHRASE_QUERY
    out = []
    for n in (1, 2, 3):
        for i in range(len(q) - n + 1):
            out.append((" ".join(q[i : i + n]), q[i : i + n], n))
    return out


def phrases_identify(spark, sf_dir):
    cands = _phrase_cands()
    cf = spark.createDataFrame(
        cands, "phrase string, words array<string>, nw int"
    )
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    qset = list(dict.fromkeys(_PHRASE_QUERY))

    # per-term total term frequency over the corpus
    tstats = (
        d.select(F.explode("arr").alias("term"))
        .filter(F.col("term").isin(qset))
        .groupBy("term")
        .agg(F.count("*").alias("ttf"))
    )
    # conjunction doc counts for every candidate (bigrams included)
    inc = d.select("doc_id", F.explode(F.array_distinct("arr")).alias("term")).filter(
        F.col("term").isin(qset)
    )
    cw = cf.select("phrase", "nw", F.explode("words").alias("term")).distinct()
    conj = (
        cw.join(inc, "term")
        .groupBy("phrase", "nw", "doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .join(
            cf.select("phrase", F.size(F.array_distinct("words")).alias("du")),
            "phrase",
        )
        .filter(F.col("nt") == F.col("du"))
        .groupBy("phrase")
        .agg(F.count("*").alias("conj"))
    )
    # bigram shingle ttf: adjacent pairs via scan-local slice+zip
    pairs = F.expr(
        "transform(slice(arr, 1, greatest(size(arr)-1, 0)), "
        "(x, i) -> concat(x, ' ', arr[i+1]))"
    )
    bigrams = [p for p, w, n in cands if n == 2]
    bttf = (
        d.select(F.explode(pairs).alias("big"))
        .filter(F.col("big").isin(bigrams))
        .groupBy("big")
        .agg(F.count("*").alias("bttf"))
    )

    # per-candidate decomposition into its adjacent bigrams
    rows = []
    for p, w, n in cands:
        if n == 1:
            continue
        for i in range(n - 1):
            rows.append((p, n, " ".join(w[i : i + 2]), w[i], w[i + 1]))
    sub = spark.createDataFrame(
        rows, "phrase string, nw int, big string, w1 string, w2 string"
    )
    j = (
        F.broadcast(sub)
        .join(conj.select(F.col("phrase").alias("big"), F.col("conj").alias("conj_b")), "big")
        .join(F.broadcast(bttf), "big", "left")
        .join(tstats.select(F.col("term").alias("w1"), F.col("ttf").alias("ttf1")), "w1")
        .join(tstats.select(F.col("term").alias("w2"), F.col("ttf").alias("ttf2")), "w2")
        .join(conj, "phrase")
    )
    pp = F.col("conj") / F.col("conj_b")
    bt = F.coalesce(F.col("bttf"), F.lit(0)).cast("double")
    wpp = bt / F.least("ttf1", "ttf2")
    wnpp = bt / F.greatest("ttf1", "ttf2")
    scored = j.withColumn("ws", wpp * pp - wnpp * (1 - pp))
    agg = scored.groupBy("phrase", "nw", "conj").agg(
        F.sum("ws").alias("fs"), F.max("conj_b").alias("max_sub")
    )
    multi = agg.select(
        "phrase",
        F.col("nw").cast("bigint").alias("nw"),
        F.round(
            F.col("fs")
            * (1.0 / 2.0)  # 1 / (1 + maxQuery(3) − maxIndexed(2))
            * (F.col("conj") / F.greatest("max_sub", "conj")),
            6,
        ).alias("score"),
    )
    # candidates that dropped out of the stats joins (missing term / empty
    # conjunction) score the −1 sentinel; single present words score 0
    allc = cf.select("phrase", F.col("nw").cast("bigint").alias("nw"))
    singles = (
        cf.filter("nw = 1")
        .join(conj, "phrase", "left")
        .select(
            "phrase",
            F.col("nw").cast("bigint").alias("nw"),
            F.when(F.col("conj") > 0, 0.0).otherwise(-1.0).alias("score"),
        )
    )
    got = multi.unionByName(singles)
    return (
        allc.join(got, ["phrase", "nw"], "left")
        .select("phrase", "nw", F.coalesce("score", F.lit(-1.0)).alias("score"))
    )


def _phrase_sql_lists():
    cands = _phrase_cands()
    c_rows = ", ".join(f"('{p}', {n})" for p, w, n in cands)
    cw_rows = ", ".join(
        f"('{p}', '{t}')" for p, w, n in cands for t in dict.fromkeys(w)
    )
    sub_rows = ", ".join(
        f"('{p}', {n}, '{' '.join(w[i:i+2])}', '{w[i]}', '{w[i+1]}')"
        for p, w, n in cands
        if n > 1
        for i in range(n - 1)
    )
    q_list = ", ".join(f"'{t}'" for t in dict.fromkeys(_PHRASE_QUERY))
    big_list = ", ".join(f"'{p}'" for p, w, n in cands if n == 2)
    return c_rows, cw_rows, sub_rows, q_list, big_list


_PH_C, _PH_CW, _PH_SUB, _PH_Q, _PH_BIG = _phrase_sql_lists()
PHRASES_SQL = (
    _BM25_CTE
    + f""",
cands(phrase, nw) AS (VALUES {_PH_C}),
candw(phrase, term) AS (VALUES {_PH_CW}),
subs(phrase, nw, big, w1, w2) AS (VALUES {_PH_SUB}),
tstats AS (
  SELECT term, count(*) AS ttf FROM tok
  WHERE term IN ({_PH_Q}) GROUP BY term
),
inc AS (SELECT DISTINCT doc_id, term FROM tok WHERE term IN ({_PH_Q})),
du AS (SELECT phrase, count(*) AS du FROM candw GROUP BY 1),
conj AS (
  SELECT phrase, count(*) AS conj FROM (
    SELECT c.phrase, i.doc_id, count(DISTINCT c.term) AS nt
    FROM candw c JOIN inc i USING (term) GROUP BY 1, 2
  ) pd JOIN du USING (phrase) WHERE pd.nt = du.du GROUP BY 1
),
bttf AS (
  SELECT big, count(*) AS bttf FROM (
    SELECT unnest(list_transform(arr[1:len(arr)-1],
                  (x, i) -> x || ' ' || arr[i+1])) AS big
    FROM (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
          FROM documents)
  ) WHERE big IN ({_PH_BIG}) GROUP BY 1
),
j AS (
  SELECT s.phrase, s.nw, cp.conj, cb.conj AS conj_b,
         coalesce(bt.bttf, 0) AS bttf, t1.ttf AS ttf1, t2.ttf AS ttf2
  FROM subs s
  JOIN conj cb ON cb.phrase = s.big
  LEFT JOIN bttf bt ON bt.big = s.big
  JOIN tstats t1 ON t1.term = s.w1
  JOIN tstats t2 ON t2.term = s.w2
  JOIN conj cp ON cp.phrase = s.phrase
),
agg AS (
  SELECT phrase, nw, conj,
         sum((bttf / least(ttf1, ttf2)) * (conj * 1.0 / conj_b)
             - (bttf / greatest(ttf1, ttf2)) * (1 - conj * 1.0 / conj_b)) AS fs,
         max(conj_b) AS max_sub
  FROM j GROUP BY 1, 2, 3
),
multi AS (
  SELECT phrase, CAST(nw AS BIGINT) AS nw,
         round(fs * 0.5 * (conj * 1.0 / greatest(max_sub, conj)), 6) AS score
  FROM agg
),
singles AS (
  SELECT c.phrase, CAST(c.nw AS BIGINT) AS nw,
         CASE WHEN j.conj > 0 THEN 0.0 ELSE -1.0 END AS score
  FROM cands c LEFT JOIN conj j USING (phrase) WHERE c.nw = 1
),
got AS (SELECT * FROM multi UNION ALL SELECT * FROM singles)
SELECT c.phrase, CAST(c.nw AS BIGINT) AS nw,
       coalesce(g.score, -1.0) AS score
FROM cands c LEFT JOIN got g ON g.phrase = c.phrase AND g.nw = c.nw
"""
)


# SpellCheckCollator (reference solr/core/src/java/org/apache/solr/
# spelling/SpellCheckCollator.java:55 collate()): substitute top
# suggestions for the misspelled query terms, re-run each candidate
# collation, keep the ones with hits. The verification is ONE distributed
# pass: explode each collation into its terms, join the (doc, term)
# incidence, a doc counts when it matched every term — no per-collation
# query loop (the reference issues maxCollationTries sub-queries).
_COLLATE_INPUTS = ["tabel", "strem"]


def spellcheck_collate(spark, sf_dir):
    from pyspark.sql import Window

    s = _searcher(spark, sf_dir)
    inputs = spark.createDataFrame([(w,) for w in _COLLATE_INPUTS], "input string")
    cand = (
        s._term_stats_df.select("term", "df")
        .crossJoin(F.broadcast(inputs))
        .withColumn("dist", F.levenshtein("term", "input").cast("long"))
        .filter((F.col("dist") <= 2) & (F.col("term") != F.col("input")))
    )
    w = Window.partitionBy("input").orderBy(
        F.col("dist").asc(), F.col("df").desc(), F.col("term").asc()
    )
    top = cand.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") <= 2)
    coll = None
    for idx, word in enumerate(_COLLATE_INPUTS):
        si = top.filter(F.col("input") == word).select(
            F.col("term").alias(f"s{idx}")
        )
        coll = si if coll is None else coll.crossJoin(F.broadcast(si))
    names = [f"s{i}" for i in range(len(_COLLATE_INPUTS))]
    coll = coll.withColumn("collation", F.concat_ws(" ", *names))
    terms = coll.select("collation", F.explode(F.array(*names)).alias("term"))
    inc = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.array_distinct(F.expr(_TOK_EXPR))).alias("term")
    )
    per_doc = (
        terms.join(inc, "term")
        .groupBy("collation", "doc_id")
        .agg(F.countDistinct("term").alias("nt"))
        .filter(F.col("nt") == len(_COLLATE_INPUTS))
    )
    return (
        per_doc.groupBy("collation")
        .agg(F.count("*").cast("bigint").alias("hits"))
        .filter(F.col("hits") > 0)
    )


_COLL_IN_LIST = ", ".join(f"'{w}'" for w in _COLLATE_INPUTS)
SPELLCOLLATE_SQL = (
    _BM25_CTE
    + f""",
inputs AS (SELECT unnest([{_COLL_IN_LIST}]) AS input),
cand AS (
  SELECT i.input, d.term, d.df,
         CAST(levenshtein(d.term, i.input) AS BIGINT) AS dist
  FROM dft d CROSS JOIN inputs i
  WHERE levenshtein(d.term, i.input) <= 2 AND d.term != i.input
),
top2 AS (
  SELECT input, term FROM (
    SELECT *, row_number() OVER (PARTITION BY input
              ORDER BY dist ASC, df DESC, term ASC) AS rk FROM cand)
  WHERE rk <= 2
),
coll AS (
  SELECT a.term || ' ' || b.term AS "collation", a.term AS t0, b.term AS t1
  FROM (SELECT term FROM top2 WHERE input = '{_COLLATE_INPUTS[0]}') a
  CROSS JOIN (SELECT term FROM top2 WHERE input = '{_COLLATE_INPUTS[1]}') b
),
cterms AS (
  SELECT "collation", t0 AS term FROM coll
  UNION ALL SELECT "collation", t1 FROM coll
),
inc AS (SELECT DISTINCT doc_id, term FROM tf),
per_doc AS (
  SELECT c."collation", i.doc_id, count(DISTINCT c.term) AS nt
  FROM cterms c JOIN inc i USING (term)
  GROUP BY 1, 2
)
SELECT "collation", CAST(count(*) AS BIGINT) AS hits
FROM per_doc WHERE nt = 2 GROUP BY 1 HAVING count(*) > 0
"""
)


# PayloadScoreQuery gate (queries/payloads/PayloadScoreQuery.java +
# DelimitedPayloadTokenFilter.java): documents re-serialized with a
# deterministic per-occurrence payload (token i carries (i % 7) + 0.5),
# indexed through the payload chain with store_payloads=True, scored with
# AveragePayloadFunction (payload-only ScoreMode). The oracle computes the
# same per-occurrence payload from the token positions directly.
_PAY_TERM = "join"


def payload_index_dir(spark: SparkSession, sf_dir: str) -> str:
    key = os.path.realpath(sf_dir) + ":payload"
    if key in _INDEX_CACHE:
        return _INDEX_CACHE[key]
    tag = hashlib.sha1(f"{key}:layout-v3".encode()).hexdigest()[:12]
    index_dir = f"/tmp/lss_docs_index/{tag}"
    marker = os.path.join(index_dir, "_built")
    if not os.path.exists(marker):
        docs = (
            spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            .withColumnRenamed("doc_id", "ext_id")
            .withColumn(
                "pay_text",
                F.expr(
                    "concat_ws(' ', transform("
                    f"{_TOK_EXPR}, "
                    "(t, i) -> concat(t, '|', cast(i % 7 as string), '.5')))"
                ),
            )
        )
        build_index(
            spark,
            docs,
            index_dir,
            num_segments=8,
            analyzer="payload",
            key_cols=("ext_id",),
            content_col="pay_text",
            store_payloads=True,
            resume=True,
        )
        with open(marker, "w") as f:
            f.write("ok")
    _INDEX_CACHE[key] = index_dir
    return index_dir


def join_qparser_docs(spark, sf_dir):
    """Solr ``{!join from= to= score=}`` (JoinQParserPlugin.java:63 /
    ScoreJoinQParserPlugin.java:57) over the documents index: docs matching
    ``spark`` contribute their ``source`` values; every doc whose source is
    in that set scores the MAX of the contributors' BM25 scores (max is
    order-independent, so the f64 engine and the oracle agree exactly)."""
    from .search.localparams import local_query

    s = _searcher(spark, sf_dir)
    hits = local_query(
        "{!join from=source to=source score=max}spark", searcher=s
    )
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return hits.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score")
    )


JOIN_QPARSER_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["spark"]))
    + """
, jv AS (
  SELECT d.source, max(s.s) AS ms
  FROM scores s JOIN documents d ON s.doc_id = d.doc_id
  GROUP BY d.source
)
SELECT d.doc_id, round(jv.ms, 4) AS score
FROM documents d JOIN jv ON d.source = jv.source
"""
)


def payload_score_docs(spark, sf_dir):
    from .search.query import PayloadScoreQuery

    d = payload_index_dir(spark, sf_dir)
    s = IndexSearcher(spark, d, analyzer="payload", precision="f64")
    hits = s.search_many(
        {0: PayloadScoreQuery(_PAY_TERM, func="average")}, k=None
    ).select("segment_id", "doc_id", "score")
    docs = spark.read.parquet(os.path.join(d, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return hits.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score")
    )


PAYLOAD_SCORE_SQL = f"""
WITH tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
)
SELECT doc_id, round(avg(((pos - 1) % 7) + 0.5), 4) AS score
FROM tokp WHERE term = '{_PAY_TERM}' GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# engine-side callables

def ft_term_spark(spark, sf_dir):
    return _ft_search_all(spark, sf_dir, "spark")


def ft_bool_and(spark, sf_dir):
    return _ft_search_all(spark, sf_dir, "vector AND hash")


def ft_bool_or(spark, sf_dir):
    return _ft_search_all(spark, sf_dir, "vector OR stream OR spark")


def ft_bool_not(spark, sf_dir):
    return _ft_search_all(spark, sf_dir, "+vector -hash")


def ft_phrase(spark, sf_dir):
    return _ft_search_all(spark, sf_dir, '"table hash"')


def ft_phrase_slop(spark, sf_dir):
    """Sloppy phrase "table hash"~2 (SloppyPhraseMatcher.java:56): in-window
    occurrence pairs weighted 1/(1+distance), summed into a float phrase
    freq, scored as a pseudo-term with idf = Σ term idfs."""
    return _ft_search_all(spark, sf_dir, '"table hash"~2')


FT_PHRASE_SLOP_SQL = (
    _BM25_CTE
    + f"""
, tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
),
pairs AS (
  SELECT a.doc_id, 1.0 / (1 + abs((b.pos - 1) - a.pos)) AS w
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id
  WHERE a.term = 'table' AND b.term = 'hash'
    AND abs((b.pos - 1) - a.pos) <= 2
),
phr AS (SELECT doc_id, sum(w) AS freq FROM pairs GROUP BY doc_id),
pw AS (
  SELECT sum(ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
  FROM dft, cstats WHERE dft.term IN ('table', 'hash')
)
SELECT phr.doc_id,
       round(pw.w * (phr.freq / (phr.freq + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))), 4) AS score
FROM phr JOIN dld ON phr.doc_id = dld.doc_id, pw, cstats
"""
)


# Driver-gated compound op: one batched search_many() job exercising every
# BooleanQuery occur kind (``search/BooleanQuery.java:86`` MUST / SHOULD /
# MUST_NOT / FILTER and minimumNumberShouldMatch) — each tagged with its
# variant name. The per-variant single ops stay in FT_EXTRA_OPS for the
# local pytest gate (same fold as ft_multiterm).
def ft_bool(spark, sf_dir):
    from .search.query import BooleanQuery, TermQuery

    variants = [
        ("and", "vector AND hash"),
        ("or", "vector OR stream OR spark"),
        ("not", "+vector -hash"),
        (
            "msm",
            BooleanQuery(
                should=(TermQuery("table"), TermQuery("hash"), TermQuery("vector")),
                min_should_match=2,
            ),
        ),
        (
            "filter",
            BooleanQuery(must=(TermQuery("table"),), filter=(TermQuery("hash"),)),
        ),
    ]
    s = _searcher(spark, sf_dir)
    hits = s.search_many({i: q for i, (_, q) in enumerate(variants)}, k=None)
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    vmap = F.array(*[F.lit(n) for n, _ in variants])
    return (
        hits.join(docs, ["segment_id", "doc_id"])
        .select(
            F.element_at(vmap, F.col("qid") + 1).alias("variant"),
            F.col("ext_id").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
    )


FT_BOOL_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(
        terms=_terms_list(["vector", "hash", "stream", "spark", "table"])
    )
    + """
SELECT 'and' AS variant, doc_id, round(sum(s), 4) AS score
FROM scores WHERE term IN ('vector', 'hash')
GROUP BY doc_id HAVING count(*) = 2
UNION ALL
SELECT 'or', doc_id, round(sum(s), 4)
FROM scores WHERE term IN ('vector', 'stream', 'spark') GROUP BY doc_id
UNION ALL
SELECT 'not', doc_id, round(s, 4)
FROM scores WHERE term = 'vector'
  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'hash')
UNION ALL
SELECT 'msm', doc_id, round(sum(s), 4)
FROM scores WHERE term IN ('table', 'hash', 'vector')
GROUP BY doc_id HAVING count(*) >= 2
UNION ALL
SELECT 'filter', doc_id, round(s, 4)
FROM scores WHERE term = 'table'
  AND doc_id IN (SELECT doc_id FROM tf WHERE term = 'hash')
"""
)


# Reverse search / percolation (lucene/monitor — Monitor.java:68,
# TermFilteredPresearcher.java:66): standing queries are registered once and
# a document stream flows past them; output = (doc, query) match pairs.
# Scale shape: queries broadcast by closure, ONE shuffle-free mapInPandas
# pass over the documents, per-batch ephemeral in-memory segment built by
# the same kernel as the index writer (the MemoryIndex role), candidate
# queries gated by anchor-term intersection with the batch vocabulary.
def monitor_matches(spark, sf_dir):
    from .monitor import Monitor
    from .search.query import BooleanQuery, PrefixQuery, TermQuery

    m = Monitor(analyzer="simple")
    m.register("q_and", "vector AND hash")
    m.register("q_term", "spark")
    m.register("q_not", "+table -hash")
    m.register("q_phrase", '"table hash"')
    m.register("q_prefix", PrefixQuery(prefix="spar"))
    m.register(
        "q_msm",
        BooleanQuery(
            should=(TermQuery("table"), TermQuery("hash"), TermQuery("vector")),
            min_should_match=2,
        ),
    )
    return m.match(_docs(spark, sf_dir), content_col="text", key_col="doc_id")


MONITOR_SQL = f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOKENIZE}) AS term FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS c FROM tok GROUP BY 1, 2),
tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
)
SELECT doc_id, 'q_and' AS query_id FROM tf WHERE term IN ('vector', 'hash')
GROUP BY doc_id HAVING count(*) = 2
UNION ALL
SELECT doc_id, 'q_msm' FROM tf WHERE term IN ('table', 'hash', 'vector')
GROUP BY doc_id HAVING count(*) >= 2
UNION ALL
SELECT doc_id, 'q_not' FROM tf WHERE term = 'table'
  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'hash')
UNION ALL
SELECT DISTINCT a.doc_id, 'q_phrase'
FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
WHERE a.term = 'table' AND b.term = 'hash'
UNION ALL
SELECT DISTINCT doc_id, 'q_prefix' FROM tf WHERE term LIKE 'spar%'
UNION ALL
SELECT doc_id, 'q_term' FROM tf WHERE term = 'spark'
"""


# CommonTermsQuery (reference lucene/queries/src/java/org/apache/lucene/
# queries/CommonTermsQuery.java:91): partition the query's terms by document
# frequency at query-build time — terms with df/docCount > maxTermFrequency
# are "common" (stopword-like) and become OPTIONAL (highFreqOccur=SHOULD),
# the rest stay REQUIRED (lowFreqOccur=MUST). A dynamic stopword mechanism:
# the plan-time classification reads the published term_stats, no postings
# touched. The oracle reproduces the df classification in SQL so both
# engines partition identically at any scale factor.
_COMMON_TERMS = ["the", "table", "hash"]
_COMMON_MAX_TF = 0.3


def ft_common_terms(spark, sf_dir):
    from .search.query import BooleanQuery, TermQuery

    s = _searcher(spark, sf_dir)
    dfs = s.term_stats(set(_COMMON_TERMS))
    high = tuple(
        TermQuery(t)
        for t in _COMMON_TERMS
        if dfs.get(t, 0) / s.doc_count > _COMMON_MAX_TF
    )
    low = tuple(
        TermQuery(t)
        for t in _COMMON_TERMS
        if dfs.get(t, 0) / s.doc_count <= _COMMON_MAX_TF
    )
    if low:
        q = BooleanQuery(must=low, should=high)
    else:  # all terms common: plain disjunction (CommonTermsQuery.java:139)
        q = BooleanQuery(should=high)
    return _ft_search_all(spark, sf_dir, q)


FT_COMMON_TERMS_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(_COMMON_TERMS))
    + f"""
, cls AS (
  SELECT dft.term,
         CASE WHEN dft.df * 1.0 / cstats.n > {_COMMON_MAX_TF} THEN 1 ELSE 0 END AS hi
  FROM dft, cstats WHERE dft.term IN ({_terms_list(_COMMON_TERMS)})
),
n_low AS (SELECT count(*) AS n FROM cls WHERE hi = 0)
SELECT s.doc_id, round(sum(s.s), 4) AS score
FROM scores s JOIN cls ON s.term = cls.term, n_low
GROUP BY s.doc_id, n_low.n
HAVING sum(CASE WHEN cls.hi = 0 THEN 1 ELSE 0 END) = n_low.n
   AND count(*) > 0
"""
)


# Solr TermVectorComponent (solr/core/.../component/TermVectorComponent.java):
# per-document term vectors. The reference serves these from a stored
# forward index (term vectors written at index time); Spark-first the
# forward index IS the stored docs table — one scan-local explode+count per
# requested doc, no inverted-index access.
def term_vectors(spark, sf_dir):
    d = _docs(spark, sf_dir).filter(F.col("doc_id") < 3)
    return (
        d.select("doc_id", F.explode(F.expr(_TOK_EXPR)).alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )


TERM_VECTORS_SQL = f"""
SELECT doc_id, term, count(*) AS tf
FROM (SELECT doc_id, unnest({_TOKENIZE}) AS term FROM documents WHERE doc_id < 3)
GROUP BY doc_id, term
"""


# AnalyzingInfixSuggester (reference lucene/suggest/src/java/org/apache/
# lucene/search/suggest/analyzing/AnalyzingInfixSuggester.java:77): suggest
# dictionary entries whose text CONTAINS the typed fragment anywhere, ranked
# by weight. Dictionary = the published term_stats generation, weight = df;
# the fragment set broadcasts against it (same shape as spellcheck_suggest).
_INFIX_INPUTS = ["tab", "ash", "ecto"]


def infix_suggest(spark, sf_dir):
    from pyspark.sql import Window

    s = _searcher(spark, sf_dir)
    inputs = spark.createDataFrame([(w,) for w in _INFIX_INPUTS], "input string")
    cand = (
        s._term_stats_df.select("term", "df")
        .crossJoin(F.broadcast(inputs))
        .filter(F.col("term").contains(F.col("input")))
    )
    w = Window.partitionBy("input").orderBy(F.col("df").desc(), F.col("term").asc())
    return (
        cand.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("input", F.col("term").alias("suggestion"), "df")
    )


_INFIX_LIST = ", ".join(f"'{w}'" for w in _INFIX_INPUTS)
INFIX_SUGGEST_SQL = (
    _BM25_CTE
    + f"""
, d AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
inputs AS (SELECT unnest([{_INFIX_LIST}]) AS input),
cand AS (
  SELECT i.input, d.term AS suggestion, d.df
  FROM d JOIN inputs i ON position(i.input IN d.term) > 0
)
SELECT input, suggestion, df FROM (
  SELECT *, row_number() OVER (PARTITION BY input ORDER BY df DESC, suggestion ASC) AS rk
  FROM cand
) WHERE rk <= 5
"""
)


# BlendedInfixSuggester (reference lucene/suggest/src/java/org/apache/
# lucene/search/suggest/analyzing/BlendedInfixSuggester.java:62-93): an
# AnalyzingInfixSuggester whose suggestion weight is BLENDED by the POSITION
# of the first matched token inside the suggestion text — POSITION_LINEAR
# coefficient = 1 − 0.10·position (LINEAR_COEF), POSITION_RECIPROCAL =
# 1/(position+1). Here suggestions are the documents' leading token windows
# weighted by n_chars; the typed fragment prefix-matches a token and the
# earliest match position sets the coefficient. (The reference's
# long-truncation of weight·coefficient and its <1/LINEAR_COEF weight
# rescale are skipped — scores stay f64; documented deviation.)
_BLENDED_WINDOW = 8


def blended_infix_suggest(spark, sf_dir):
    from pyspark.sql import Window

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        "doc_id",
        F.col("n_chars").cast("double").alias("weight"),
        F.slice(
            F.expr("regexp_extract_all(lower(text), '[a-z0-9]+', 0)"),
            1,
            _BLENDED_WINDOW,
        ).alias("toks"),
    )
    inputs = spark.createDataFrame([(w,) for w in _INFIX_INPUTS], "input string")
    cand = docs.crossJoin(F.broadcast(inputs)).select(
        "input",
        "doc_id",
        "weight",
        F.expr(
            "get(filter(transform(toks, (t, i) -> IF(startswith(t, input), i, -1)),"
            " x -> x >= 0), 0)"
        ).alias("position"),
    ).filter(F.col("position").isNotNull())
    scored = cand.select(
        "input",
        "doc_id",
        F.col("position").cast("long").alias("position"),
        F.round(
            F.col("weight") * (F.lit(1.0) - F.lit(0.10) * F.col("position")), 4
        ).alias("score"),
    )
    w = Window.partitionBy("input").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("input", "doc_id", "position", "score")
    )


BLENDED_INFIX_SQL = f"""
WITH tok AS (
  SELECT doc_id, CAST(n_chars AS DOUBLE) AS weight,
         unnest(arr[1:{_BLENDED_WINDOW}]) AS term,
         generate_subscripts(arr[1:{_BLENDED_WINDOW}], 1) - 1 AS pos
  FROM (SELECT doc_id, n_chars,
               regexp_extract_all(lower(text), '[a-z0-9]+') AS arr
        FROM documents)
),
inputs AS (SELECT unnest([{", ".join(f"'{w}'" for w in _INFIX_INPUTS)}]) AS input),
hit AS (
  SELECT i.input, t.doc_id, min(t.pos) AS position, any_value(t.weight) AS weight
  FROM tok t JOIN inputs i ON t.term LIKE i.input || '%'
  GROUP BY i.input, t.doc_id
)
SELECT input, doc_id, CAST(position AS BIGINT) AS position,
       round(weight * (1.0 - 0.10 * position), 4) AS score
FROM (
  SELECT *, row_number() OVER (
    PARTITION BY input ORDER BY round(weight * (1.0 - 0.10 * position), 4) DESC,
    doc_id ASC) AS rk
  FROM hit
) WHERE rk <= 5
"""


# Solr QueryElevationComponent (solr/core/.../component/
# QueryElevationComponent.java:94): editorially pin documents to the top of
# a query's results; organic hits follow, pinned ids deduplicated out. The
# pinned list is tiny (an editorial map) — broadcast; the organic side is
# the ordinary top-k search; ranks attach via a window over ≤ k+pins rows
# (never the corpus).
_ELEVATED = [7, 3]  # ext doc ids pinned for the query


def elevated_search(spark, sf_dir):
    from pyspark.sql import Window

    base = _ft_search_all(spark, sf_dir, "table AND hash")
    organic = (
        base.filter(~F.col("doc_id").isin(_ELEVATED))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(10)
        .withColumn("pinned", F.lit(0))
    )
    pins = spark.createDataFrame(
        [(d, i + 1) for i, d in enumerate(_ELEVATED)], "doc_id long, pin_rank int"
    )
    pinned = (
        base.join(F.broadcast(pins), "doc_id")
        .select("doc_id", "score", F.lit(1).alias("pinned"), "pin_rank")
    )
    w = Window.partitionBy().orderBy(
        F.col("pinned").desc(), F.col("pin_rank").asc(),
        F.col("score").desc(), F.col("doc_id").asc(),
    )
    out = pinned.drop("pin_rank").unionByName(organic)
    # ranking window runs over ≤ 12 rows (post-limit), not the corpus
    pr = pins.select("doc_id", "pin_rank")
    return (
        out.join(F.broadcast(pr), "doc_id", "left")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select("rank", "doc_id", "score")
    )


ELEVATED_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["table", "hash"]))
    + f"""
, hits AS (
  SELECT doc_id, round(sum(s), 4) AS score FROM scores
  GROUP BY doc_id HAVING count(*) = 2
),
pins AS (SELECT unnest([{", ".join(str(d) for d in _ELEVATED)}]) AS doc_id,
                generate_subscripts([{", ".join(str(d) for d in _ELEVATED)}], 1) AS pin_rank),
ranked AS (
  SELECT h.doc_id, h.score,
         row_number() OVER (ORDER BY
           CASE WHEN p.pin_rank IS NOT NULL THEN 1 ELSE 0 END DESC,
           p.pin_rank ASC NULLS LAST, h.score DESC, h.doc_id ASC) AS rank
  FROM hits h LEFT JOIN pins p ON h.doc_id = p.doc_id
  WHERE p.pin_rank IS NOT NULL
     OR h.doc_id IN (
          SELECT doc_id FROM (
            SELECT doc_id FROM hits
            WHERE doc_id NOT IN (SELECT doc_id FROM pins)
            ORDER BY score DESC, doc_id ASC LIMIT 10)
        )
)
SELECT rank, doc_id, score FROM ranked WHERE rank <= 10
"""
)


# Classic QueryParser syntax end-to-end (lucene/queryparser classic —
# QueryParser.jj grammar + QueryParserBase.addClause): one query string with
# grouping, an inline boost, a phrase and a prohibited clause, parsed by
# search/queryparser.py and scored by the engine; the oracle reproduces the
# exact composed arithmetic (sum of should-clauses, 2× boosted term, phrase
# pseudo-term, NOT-exclusion) in SQL.
def ft_classic_parse(spark, sf_dir):
    from .search.queryparser import parse_classic

    q = parse_classic('(table AND hash^2) OR "table hash" -stream', analyzer="simple")
    return _ft_search_all(spark, sf_dir, q)


def ft_simple_parse(spark, sf_dir):
    """SimpleQueryParser end-to-end (queryparser/simple/SimpleQueryParser.
    java): '+' AND-folds, a trailing '*' prefix (constant score 1 inside the
    conjunction), and a NEAR phrase '"…"~2' — all three as MUST clauses of
    one folded BooleanQuery, scored and summed by the engine."""
    from .search.simpleparser import parse_simple

    q = parse_simple('table + hash* + "table hash"~2', analyzer="simple")
    return _ft_search_all(spark, sf_dir, q)


FT_SIMPLE_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["table"]))
    + f"""
, tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
),
pairs AS (
  SELECT a.doc_id, 1.0 / (1 + abs((b.pos - 1) - a.pos)) AS w
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id
  WHERE a.term = 'table' AND b.term = 'hash'
    AND abs((b.pos - 1) - a.pos) <= 2
),
phr AS (SELECT doc_id, sum(w) AS freq FROM pairs GROUP BY doc_id),
pw AS (
  SELECT sum(ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
  FROM dft, cstats WHERE dft.term IN ('table', 'hash')
),
pref AS (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'hash%')
SELECT s.doc_id,
       round(s.s + 1.0
             + pw.w * (phr.freq / (phr.freq + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))),
             4) AS score
FROM scores s
JOIN phr ON s.doc_id = phr.doc_id
JOIN pref ON s.doc_id = pref.doc_id
JOIN dld ON s.doc_id = dld.doc_id, pw, cstats
"""
)


FT_CLASSIC_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["table", "hash"]))
    + """
, tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr FROM documents)
),
phr AS (
  SELECT a.doc_id, count(*) AS freq
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'table' AND b.term = 'hash' GROUP BY 1
),
pw AS (
  SELECT sum(ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
  FROM dft, cstats WHERE dft.term IN ('table', 'hash')
),
andg AS (
  SELECT doc_id, sum(CASE WHEN term = 'hash' THEN 2 * s ELSE s END) AS sc
  FROM scores GROUP BY doc_id HAVING count(*) = 2
),
phs AS (
  SELECT phr.doc_id,
         pw.w * (phr.freq / (phr.freq + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))) AS sc
  FROM phr JOIN dld ON phr.doc_id = dld.doc_id, pw, cstats
)
SELECT coalesce(a.doc_id, p.doc_id) AS doc_id,
       round(coalesce(a.sc, 0) + coalesce(p.sc, 0), 4) AS score
FROM andg a FULL OUTER JOIN phs p ON a.doc_id = p.doc_id
WHERE coalesce(a.doc_id, p.doc_id) NOT IN (SELECT doc_id FROM tf WHERE term = 'stream')
"""
)


# Minimal-interval queries (lucene/queries/intervals — IntervalQuery.java:77,
# OrderedIntervalsSource / UnorderedIntervalsSource / BlockIntervalsSource /
# FilteredIntervalsSource MaxGaps+MaxWidth / ContainedByIntervalsSource,
# IntervalScorer.java:68 freq = Σ 1/max(width − minExtent + 1, 1), saturation
# score freq/(freq+pivot)). The DuckDB oracle reproduces the MINIMAL-interval
# enumeration in SQL: ordered = per-start tightest end then per-end max
# start; unordered = per-anchor latest companion then an anti-containment
# filter; width/gap filters applied after minimization like the reference.
def ft_intervals(spark, sf_dir):
    from .search.intervals import (
        IBlock,
        IContainedBy,
        IMaxGaps,
        IMaxWidth,
        IOr,
        IOrdered,
        ITerm,
        IUnordered,
        IntervalQuery,
    )

    variants = [
        ("ordered_gap", IntervalQuery(source=IMaxGaps(IOrdered(("table", "hash")), 3))),
        ("unordered_w", IntervalQuery(source=IMaxWidth(IUnordered(("vector", "hash")), 6))),
        ("or_block", IntervalQuery(source=IOr((IBlock(("table", "hash")), ITerm("spark"))))),
        (
            "contained",
            IntervalQuery(
                source=IContainedBy(
                    ITerm("vector"), IMaxWidth(IUnordered(("table", "hash")), 8)
                )
            ),
        ),
    ]
    s = _searcher(spark, sf_dir)
    hits = s.search_many({i: q for i, (_, q) in enumerate(variants)}, k=None)
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    vmap = F.array(*[F.lit(n) for n, _ in variants])
    return (
        hits.join(docs, ["segment_id", "doc_id"])
        .select(
            F.element_at(vmap, F.col("qid") + 1).alias("variant"),
            F.col("ext_id").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
    )


FT_INTERVALS_SQL = f"""
WITH tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
),
-- ordered(table, hash): per table-occurrence tightest following hash,
-- then per-end max start == the minimal-interval set
ord_cand AS (
  SELECT a.doc_id, a.pos AS s, min(b.pos) AS e
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos > a.pos AND b.term = 'hash'
  WHERE a.term = 'table' GROUP BY a.doc_id, a.pos
),
ord_min AS (SELECT doc_id, max(s) AS s, e FROM ord_cand GROUP BY doc_id, e),
v1 AS (
  SELECT doc_id, sum(1.0 / (e - s)) AS freq
  FROM ord_min WHERE e - s - 1 <= 3 GROUP BY doc_id
),
-- unordered(vector, hash): anchor every occurrence as the window max-end,
-- companion = latest other-term occurrence before it; anti-containment
un_cand AS (
  SELECT a.doc_id, max(b.pos) AS s, a.pos AS e
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos <= a.pos AND b.term = 'vector'
  WHERE a.term = 'hash' GROUP BY a.doc_id, a.pos
  UNION
  SELECT a.doc_id, max(b.pos) AS s, a.pos AS e
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos <= a.pos AND b.term = 'hash'
  WHERE a.term = 'vector' GROUP BY a.doc_id, a.pos
),
un_min AS (
  SELECT doc_id, s, e FROM un_cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM un_cand c2 WHERE c2.doc_id = c.doc_id
      AND c2.s >= c.s AND c2.e <= c.e AND (c2.s != c.s OR c2.e != c.e))
),
v2 AS (
  SELECT doc_id, sum(1.0 / greatest(e - s, 1)) AS freq
  FROM un_min WHERE e - s + 1 <= 6 GROUP BY doc_id
),
-- or(block(table, hash), spark): widths 2 and 1 never nest across sides
-- (the block's two slots are table/hash, never spark) — freq is closed-form
ph AS (
  SELECT a.doc_id, count(*) AS pc
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1
  WHERE a.term = 'table' AND b.term = 'hash' GROUP BY a.doc_id
),
sp AS (SELECT doc_id, count(*) AS sc FROM tokp WHERE term = 'spark' GROUP BY doc_id),
v3 AS (
  SELECT coalesce(ph.doc_id, sp.doc_id) AS doc_id,
         coalesce(pc, 0) * 0.5 + coalesce(sc, 0) AS freq
  FROM ph FULL OUTER JOIN sp ON ph.doc_id = sp.doc_id
),
-- contained_by(vector, maxwidth(unordered(table, hash), 8))
un2_cand AS (
  SELECT a.doc_id, max(b.pos) AS s, a.pos AS e
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos <= a.pos AND b.term = 'table'
  WHERE a.term = 'hash' GROUP BY a.doc_id, a.pos
  UNION
  SELECT a.doc_id, max(b.pos) AS s, a.pos AS e
  FROM tokp a JOIN tokp b ON b.doc_id = a.doc_id AND b.pos <= a.pos AND b.term = 'hash'
  WHERE a.term = 'table' GROUP BY a.doc_id, a.pos
),
un2_min AS (
  SELECT doc_id, s, e FROM un2_cand c
  WHERE NOT EXISTS (
    SELECT 1 FROM un2_cand c2 WHERE c2.doc_id = c.doc_id
      AND c2.s >= c.s AND c2.e <= c.e AND (c2.s != c.s OR c2.e != c.e))
),
v4 AS (
  SELECT t.doc_id, count(DISTINCT t.pos) * 1.0 AS freq
  FROM tokp t WHERE t.term = 'vector' AND EXISTS (
    SELECT 1 FROM un2_min m WHERE m.doc_id = t.doc_id
      AND m.e - m.s + 1 <= 8 AND m.s <= t.pos AND t.pos <= m.e)
  GROUP BY t.doc_id
)
SELECT 'ordered_gap' AS variant, doc_id, round(freq / (freq + 1), 4) AS score FROM v1
UNION ALL
SELECT 'unordered_w', doc_id, round(freq / (freq + 1), 4) FROM v2
UNION ALL
SELECT 'or_block', doc_id, round(freq / (freq + 1), 4) FROM v3
UNION ALL
SELECT 'contained', doc_id, round(freq / (freq + 1), 4) FROM v4
"""


def ft_term_tf(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    posts = term_postings(spark, s.index_dir, ["spark", "vector", "hash"])
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return posts.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"), "term", F.col("freq").alias("tf")
    )


def ft_df_stats(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    return (
        s._term_stats_df
        .filter(F.col("term").isin("spark", "vector", "hash", "table", "the"))
        .select("term", "df", "ttf")
    )


# Solr TermsComponent (reference solr/core/src/java/org/apache/solr/handler/
# component/TermsComponent.java:54): enumerate the term dictionary by prefix,
# ranked by document frequency. Served straight from the engine's published
# term_stats generation — no postings decode, no corpus scan.
def terms_component(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    return (
        s._term_stats_df.filter(F.col("term").startswith("t"))
        .orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(20)
        .select("term", "df")
    )


def ft_norms(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    n = norms_table(spark, s.index_dir)
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    return n.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"), F.col("norm_byte")
    )


# ---- MultiTermQuery family / DisMax / Synonym over the documents index ----

# Driver-gated compound op: one batched search_many() job exercising every
# MultiTermQuery rewrite surface (``search/MultiTermQuery.java:66``) — prefix,
# wildcard, anchored regexp, fuzzy (Levenshtein), term range and TermInSet —
# each tagged with its variant name. The per-variant single ops below remain
# in FT_EXTRA_OPS for the local pytest gate.
def ft_multiterm(spark, sf_dir):
    from .search.query import (
        FuzzyQuery,
        PrefixQuery,
        RegexpQuery,
        TermInSetQuery,
        TermRangeQuery,
        WildcardQuery,
    )

    variants = [
        ("prefix", PrefixQuery(prefix="spar")),
        ("wildcard", WildcardQuery(pattern="h*sh")),
        ("regexp", RegexpQuery(pattern="ha.h")),
        ("fuzzy", FuzzyQuery(term="hashe", max_edits=1)),
        ("range", TermRangeQuery(lower="tab", upper="tac")),
        ("in_set", TermInSetQuery(set_terms=("spark", "vector", "nosuchterm"))),
    ]
    s = _searcher(spark, sf_dir)
    hits = s.search_many({i: q for i, (_, q) in enumerate(variants)}, k=None)
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    vmap = F.array(*[F.lit(n) for n, _ in variants])
    return (
        hits.join(docs, ["segment_id", "doc_id"])
        .select(
            F.element_at(vmap, F.col("qid") + 1).alias("variant"),
            F.col("ext_id").alias("doc_id"),
            F.round("score", 4).alias("score"),
        )
    )


FT_MULTITERM_SQL = (
    _BM25_CTE
    + """
SELECT 'prefix' AS variant, doc_id, CAST(1.0 AS DOUBLE) AS score
FROM (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'spar%')
UNION ALL
SELECT 'wildcard', doc_id, CAST(1.0 AS DOUBLE)
FROM (SELECT DISTINCT doc_id FROM tf WHERE term LIKE 'h%sh')
UNION ALL
SELECT 'regexp', doc_id, CAST(1.0 AS DOUBLE)
FROM (SELECT DISTINCT doc_id FROM tf WHERE regexp_full_match(term, 'ha.h'))
UNION ALL
SELECT 'fuzzy', doc_id, CAST(1.0 AS DOUBLE)
FROM (SELECT DISTINCT doc_id FROM tf
      WHERE length(term) BETWEEN 4 AND 6 AND levenshtein(term, 'hashe') <= 1)
UNION ALL
SELECT 'range', doc_id, CAST(1.0 AS DOUBLE)
FROM (SELECT DISTINCT doc_id FROM tf WHERE term >= 'tab' AND term <= 'tac')
UNION ALL
SELECT 'in_set', doc_id, CAST(1.0 AS DOUBLE)
FROM (SELECT DISTINCT doc_id FROM tf WHERE term IN ('spark', 'vector', 'nosuchterm'))
"""
)


def ft_regexp(spark, sf_dir):
    from .search.query import RegexpQuery

    return _ft_search_all(spark, sf_dir, RegexpQuery(pattern="ha.h"))


FT_REGEXP_SQL = (
    _BM25_CTE
    + """
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM tf
WHERE regexp_full_match(term, 'ha.h')
"""
)


def ft_prefix(spark, sf_dir):
    from .search.query import PrefixQuery

    return _ft_search_all(spark, sf_dir, PrefixQuery(prefix="spar"))


FT_PREFIX_SQL = (
    _BM25_CTE
    + """
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM tf WHERE term LIKE 'spar%'
"""
)


def ft_wildcard(spark, sf_dir):
    from .search.query import WildcardQuery

    return _ft_search_all(spark, sf_dir, WildcardQuery(pattern="h*sh"))


FT_WILDCARD_SQL = (
    _BM25_CTE
    + """
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM tf WHERE term LIKE 'h%sh'
"""
)


def ft_term_range(spark, sf_dir):
    from .search.query import TermRangeQuery

    return _ft_search_all(spark, sf_dir, TermRangeQuery(lower="tab", upper="tac"))


FT_RANGE_SQL = (
    _BM25_CTE
    + """
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM tf
WHERE term >= 'tab' AND term <= 'tac'
"""
)


def ft_fuzzy(spark, sf_dir):
    from .search.query import FuzzyQuery

    return _ft_search_all(spark, sf_dir, FuzzyQuery(term="hashe", max_edits=1))


FT_FUZZY_SQL = (
    _BM25_CTE
    + """
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM tf
WHERE length(term) BETWEEN 4 AND 6 AND levenshtein(term, 'hashe') <= 1
"""
)


def ft_term_in_set(spark, sf_dir):
    from .search.query import TermInSetQuery

    return _ft_search_all(
        spark, sf_dir, TermInSetQuery(set_terms=("spark", "vector", "nosuchterm"))
    )


FT_IN_SET_SQL = (
    _BM25_CTE
    + """
SELECT DISTINCT doc_id, CAST(1.0 AS DOUBLE) AS score FROM tf
WHERE term IN ('spark', 'vector', 'nosuchterm')
"""
)


def ft_dismax(spark, sf_dir):
    """DisjunctionMaxQuery with a boosted disjunct — exercises both the
    max+tiebreak combiner (``search/DisjunctionMaxQuery.java:45``) and the
    multiplicative ``BoostQuery`` wrapper (``search/BoostQuery.java:34``) in
    one gated op (the Solr dismax ``qf=field^2`` shape)."""
    from .search.query import BoostQuery, DisjunctionMaxQuery, TermQuery

    q = DisjunctionMaxQuery(
        (BoostQuery(TermQuery("table"), 2.0), TermQuery("hash")), tiebreak=0.1
    )
    return _ft_search_all(spark, sf_dir, q)


FT_DISMAX_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["table", "hash"]))
    + """
, boosted AS (
  SELECT doc_id, CASE WHEN term = 'table' THEN 2.0 * s ELSE s END AS s FROM scores
)
SELECT doc_id,
       round(max(s) + 0.1 * (sum(s) - max(s)), 4) AS score
FROM boosted GROUP BY doc_id
"""
)


def ft_synonym(spark, sf_dir):
    from .search.query import SynonymQuery

    return _ft_search_all(spark, sf_dir, SynonymQuery(syn_terms=("table", "tables")))


# SynonymQuery pseudo-stats: freq = Σ tf, df = max(df) (SynonymQuery.java:204-218)
FT_SYNONYM_SQL = (
    _BM25_CTE
    + """
, syn AS (
  SELECT doc_id, sum(tf) AS fsum FROM tf WHERE term IN ('table', 'tables') GROUP BY doc_id
),
sdf AS (SELECT max(df) AS df FROM dft WHERE term IN ('table', 'tables'))
SELECT syn.doc_id,
       round(ln(1 + (cstats.n - sdf.df + 0.5) / (sdf.df + 0.5)) *
             (syn.fsum / (syn.fsum + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))), 4) AS score
FROM syn JOIN dld ON syn.doc_id = dld.doc_id, sdf, cstats
"""
)


def ft_boost(spark, sf_dir):
    from .search.query import BooleanQuery, BoostQuery, TermQuery

    q = BooleanQuery(
        should=(BoostQuery(TermQuery("table"), 2.0), TermQuery("hash"))
    )
    return _ft_search_all(spark, sf_dir, q)


FT_BOOST_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["table", "hash"]))
    + """
SELECT doc_id,
       round(sum(CASE WHEN term = 'table' THEN 2.0 * s ELSE s END), 4) AS score
FROM scores GROUP BY doc_id
"""
)


def ft_multi_phrase(spark, sf_dir):
    """MultiPhraseQuery: ("table"|"tables") followed by "hash"."""
    from .search.query import MultiPhraseQuery

    q = MultiPhraseQuery(slots=(("table", "tables"), ("hash",)), positions=(0, 1))
    return _ft_search_all(spark, sf_dir, q)


FT_MULTI_PHRASE_SQL = (
    _BM25_CTE
    + """
, tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS arr FROM documents)
),
phr AS (
  SELECT a.doc_id, count(*) AS freq
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term IN ('table', 'tables') AND b.term = 'hash' GROUP BY 1
),
pw AS (
  SELECT sum(ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
  FROM dft, cstats WHERE dft.term IN ('table', 'tables', 'hash')
)
SELECT phr.doc_id,
       round(pw.w * (phr.freq / (phr.freq + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))), 4) AS score
FROM phr JOIN dld ON phr.doc_id = dld.doc_id, pw, cstats
"""
)


def ft_bool_msm(spark, sf_dir):
    """minimumNumberShouldMatch=2 of 3 (MinShouldMatchSumScorer)."""
    from .search.query import BooleanQuery, TermQuery

    q = BooleanQuery(
        should=(TermQuery("table"), TermQuery("hash"), TermQuery("vector")),
        min_should_match=2,
    )
    return _ft_search_all(spark, sf_dir, q)


FT_MSM_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["table", "hash", "vector"]))
    + """
SELECT doc_id, round(sum(s), 4) AS score FROM scores
GROUP BY doc_id HAVING count(*) >= 2
"""
)


def ft_bool_filter(spark, sf_dir):
    """FILTER clause: required match that contributes NO score
    (BooleanClause.Occur.FILTER)."""
    from .search.query import BooleanQuery, TermQuery

    q = BooleanQuery(must=(TermQuery("table"),), filter=(TermQuery("hash"),))
    return _ft_search_all(spark, sf_dir, q)


FT_FILTER_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["table"]))
    + """
SELECT doc_id, round(s, 4) AS score FROM scores
WHERE doc_id IN (SELECT doc_id FROM tf WHERE term = 'hash')
"""
)


# TermAutomatonQuery (sandbox TermAutomatonQuery.java + TermAutomatonScorer
# .java, kernel _eval_term_automaton): (hash|index) ANY table — an OR slot,
# then a wildcard position, then a fixed term. freq = number of start
# positions p with (hash|index)@p AND table@p+2 (paths are unique per start
# here), scored like a phrase with idf = Σ over ALL real terms.
def ft_term_automaton(spark, sf_dir):
    from .search.query import TermAutomatonQuery

    q = TermAutomatonQuery(
        n_states=4,
        transitions=(
            (0, 1, "hash"),
            (0, 1, "index"),
            (1, 2, None),
            (2, 3, "table"),
        ),
        accept=frozenset({3}),
    )
    return _ft_search_all(spark, sf_dir, q)


FT_TERM_AUTOMATON_SQL = (
    _BM25_CTE
    + f"""
, tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_TOKENIZE} AS arr FROM documents)
),
am AS (
  SELECT a.doc_id, count(*) AS freq
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 2
  WHERE a.term IN ('hash', 'index') AND b.term = 'table'
  GROUP BY a.doc_id
),
pw AS (
  SELECT sum(ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
  FROM dft, cstats WHERE dft.term IN ('hash', 'index', 'table')
)
SELECT am.doc_id,
       round(pw.w * (am.freq / (am.freq + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))), 4) AS score
FROM am JOIN dld ON am.doc_id = dld.doc_id, pw, cstats
"""
)


# LambdaMART-style tree-ensemble LTR (solr/contrib/ltr/.../model/
# MultipleAdditiveTreesModel.java:92-188): score = Σ_t weight_t · tree_t(fv),
# each tree a binary regression tree over named features with the
# reference's `feature <= threshold + NODE_SPLIT_SLACK` split rule
# (:125,152). The ensemble compiles to ONE nested-CASE SQL expression
# generated once and evaluated by BOTH Catalyst and DuckDB (the shared-
# expression oracle pattern of spatial_polygon) — at scale the whole model
# constant-folds into WholeStageCodegen, zero extra exchanges.
_LTR_NODE_SLACK = 1e-6


def ltr_tree_sql(node) -> str:
    """RegressionTreeNode.score as SQL (leaf = {'value': v}; split =
    {'feature', 'threshold', 'left', 'right'})."""
    if "value" in node:
        return repr(float(node["value"]))
    thr = float(node["threshold"]) + _LTR_NODE_SLACK
    return (
        f"CASE WHEN {node['feature']} <= {thr!r} "
        f"THEN {ltr_tree_sql(node['left'])} "
        f"ELSE {ltr_tree_sql(node['right'])} END"
    )


LTR_TREES = (
    (1.0, {
        "feature": "f_bm25", "threshold": 0.35,
        "left": {"feature": "f_tf", "threshold": 0.5,
                 "left": {"value": 0.1}, "right": {"value": 0.3}},
        "right": {"feature": "f_doclen", "threshold": 5.5,
                  "left": {"value": 0.6}, "right": {"value": 0.9}},
    }),
    (2.0, {
        "feature": "f_lang", "threshold": 0.5,
        "left": {"value": 0.05},
        "right": {"feature": "f_bm25", "threshold": 0.6,
                  "left": {"value": 0.4}, "right": {"value": 0.8}},
    }),
)

LTR_ENSEMBLE_EXPR = " + ".join(
    f"{w!r} * ({ltr_tree_sql(t)})" for w, t in LTR_TREES
)


def ltr_trees_rescore(spark, sf_dir):
    base = _ft_search_all(spark, sf_dir, "spark").withColumnRenamed("score", "f_bm25")
    feats = _docs(spark, sf_dir).select(
        "doc_id",
        F.log(F.lit(1.0) + F.col("n_chars").cast("double")).alias("f_doclen"),
        F.expr(
            f"CAST(size(filter({_TOK_EXPR}, t -> t = 'hash')) AS DOUBLE)"
        ).alias("f_tf"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("f_lang"),
    )
    fv = feats.join(F.broadcast(base), "doc_id")
    return (
        fv.select("doc_id", F.round(F.expr(LTR_ENSEMBLE_EXPR), 4).alias("ltr_score"))
        .orderBy(F.col("ltr_score").desc(), F.col("doc_id").asc())
        .limit(50)
    )


LTR_TREES_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["spark"]))
    + f"""
, feats AS (
  SELECT s.doc_id,
         round(s.s, 4) AS f_bm25,
         ln(1 + d.n_chars) AS f_doclen,
         CAST(COALESCE(t.tf, 0) AS DOUBLE) AS f_tf,
         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS f_lang
  FROM scores s
  JOIN documents d ON s.doc_id = d.doc_id
  LEFT JOIN tf t ON t.doc_id = s.doc_id AND t.term = 'hash'
)
SELECT doc_id, round({LTR_ENSEMBLE_EXPR}, 4) AS ltr_score
FROM feats ORDER BY ltr_score DESC, doc_id ASC LIMIT 50
"""
)


# CoveringQuery (sandbox CoveringQuery.java:54-66 + CoveringScorer.java:
# 204-212): a doc matches when >= max(1, minMatch(doc)) sub-queries match;
# score = SUM of the matching clauses' scores. minMatch here is the
# LongValuesSource role played by a per-doc column: long docs (n_chars >=
# threshold) must match 2 of the 3 clauses, short docs only 1.
_COVERING_TERMS = ("table", "hash", "vector")
_COVERING_THRESH = 300


def ft_covering(spark, sf_dir):
    s = _searcher(spark, sf_dir)
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    src = spark.read.parquet(os.path.join(sf_dir, "documents.parquet")).select(
        F.col("doc_id").alias("ext_id"),
        F.when(F.col("n_chars") >= _COVERING_THRESH, F.lit(2))
        .otherwise(F.lit(1))
        .alias("mm"),
    )
    mm = docs.join(src, "ext_id").select("segment_id", "doc_id", "mm")
    hits = s.search_covering(list(_COVERING_TERMS), mm, k=None)
    return hits.join(docs, ["segment_id", "doc_id"]).select(
        F.col("ext_id").alias("doc_id"),
        "n_matching",
        F.round("score", 4).alias("score"),
    )


FT_COVERING_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(list(_COVERING_TERMS)))
    + f"""
, cov AS (
  SELECT doc_id, count(*) AS n_matching, sum(s) AS score
  FROM scores GROUP BY doc_id
)
SELECT c.doc_id, c.n_matching, round(c.score, 4) AS score
FROM cov c JOIN documents d ON c.doc_id = d.doc_id
WHERE c.n_matching >=
      greatest(1, CASE WHEN d.n_chars >= {_COVERING_THRESH} THEN 2 ELSE 1 END)
"""
)


# FeatureQuery / FeatureField (document/FeatureField.java:109): a static
# per-doc ranking feature folded additively into the relevance score. The
# feature here is ln(1 + n_chars) — the "document quality/popularity signal"
# pattern — joined as a column, never per-row Python.
def ft_feature_boost(spark, sf_dir):
    base = _ft_search_all(spark, sf_dir, "spark")
    feats = _docs(spark, sf_dir).select(
        "doc_id", F.log(F.lit(1.0) + F.col("n_chars").cast("double")).alias("feat")
    )
    return (
        base.withColumnRenamed("score", "bm25")
        .join(feats, "doc_id")
        .select(
            "doc_id",
            F.round(F.col("bm25") + 0.1 * F.col("feat"), 4).alias("score"),
        )
    )


FT_FEATURE_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["spark"]))
    + """
SELECT s.doc_id, round(round(s.s, 4) + 0.1 * ln(1 + d.n_chars), 4) AS score
FROM scores s JOIN documents d ON s.doc_id = d.doc_id
"""
)


# Learning-to-rank re-ranking (solr/contrib/ltr/src/java/org/apache/solr/
# ltr/LTRScoringQuery.java + model/LinearModel.java:73 `score = Σ w_i·f_i`):
# first-pass retrieval, per-candidate feature-vector extraction (the
# FeatureStore role — each feature a named column), linear-model dot
# product, re-rank. Spark-first shape: the candidate set is a DataFrame
# (≤ matched docs, never the corpus), features join columnar from the docs
# relation / index stats, and the model — a handful of floats — folds into
# the plan as literals (the broadcast-a-tiny-model degenerate case: Catalyst
# constant-folds it into codegen, zero extra exchanges at any scale; feature
# extraction is the O(candidates) part and stays columnar).
LTR_WEIGHTS = {"f_bm25": 0.6, "f_doclen": 0.15, "f_tf": 0.05, "f_lang": 0.3}


def ltr_rescore(spark, sf_dir):
    base = _ft_search_all(spark, sf_dir, "spark").withColumnRenamed("score", "f_bm25")
    feats = _docs(spark, sf_dir).select(
        "doc_id",
        F.log(F.lit(1.0) + F.col("n_chars").cast("double")).alias("f_doclen"),
        F.expr(f"CAST(size(filter({_TOK_EXPR}, t -> t = 'hash')) AS DOUBLE)").alias("f_tf"),
        F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("f_lang"),
    )
    # candidates are ≤ first-pass matches — broadcast them into the (at
    # scale, huge) docs relation so feature extraction never shuffles docs
    fv = feats.join(F.broadcast(base), "doc_id")
    model = sum(
        (F.col(name) * F.lit(w) for name, w in LTR_WEIGHTS.items()), F.lit(0.0)
    )
    return (
        fv.select("doc_id", F.round(model, 4).alias("ltr_score"))
        .orderBy(F.col("ltr_score").desc(), F.col("doc_id").asc())
        .limit(50)
    )


LTR_RESCORE_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["spark"]))
    + """
, feats AS (
  SELECT s.doc_id,
         round(s.s, 4) AS f_bm25,
         ln(1 + d.n_chars) AS f_doclen,
         CAST(COALESCE(t.tf, 0) AS DOUBLE) AS f_tf,
         CASE WHEN d.lang = 'en' THEN 1.0 ELSE 0.0 END AS f_lang
  FROM scores s
  JOIN documents d ON s.doc_id = d.doc_id
  LEFT JOIN tf t ON t.doc_id = s.doc_id AND t.term = 'hash'
)
SELECT doc_id,
       round(0.0 + f_bm25 * 0.6 + f_doclen * 0.15 + f_tf * 0.05 + f_lang * 0.3, 4)
         AS ltr_score
FROM feats ORDER BY ltr_score DESC, doc_id ASC LIMIT 50
"""
)


# FunctionScoreQuery (lucene/queries function/FunctionScoreQuery.java) with
# the Solr relevance ValueSources (ValueSourceParser.java: termfreq/docfreq/
# idf/norm/maxdoc/numdocs/totaltermfreq/sumtotaltermfreq). The index-bound
# names close over planner-read scalars (df/ttf/numdocs — tiny collects of
# ≤|terms| stats rows, the reads a QueryParser does) and per-doc columns the
# frame prepares up front (tf_<term> from a term-pushed postings scan, the
# decoded stored norm). Lucene-9 norm semantics: the stored norm IS the
# SmallFloat byte4 encoding of the emitted token count; ``norm(field)``
# decodes it (SmallFloat.java:161-169 byte4ToInt as one Catalyst CASE).
_NORM_DECODE = (
    "CASE WHEN norm_byte < 24 THEN norm_byte ELSE 24 + ("
    "CASE WHEN shiftright(norm_byte - 24, 3) = 0 THEN (norm_byte - 24) & 7 "
    "ELSE shiftleft(((norm_byte - 24) & 7) | 8, shiftright(norm_byte - 24, 3) - 1) "
    "END) END"
)


def relevance_registry(stats: dict) -> dict:
    """``FUNCTIONS`` extended with the index-bound relevance names. Quoted
    term args must be in ``stats['df']`` — postings joins are planned up
    front like every query in this engine; unknown terms raise loudly."""
    from .functions import FUNCTIONS

    reg = dict(FUNCTIONS)
    reg["termfreq"] = lambda f, t: F.col(f"tf_{t}")
    # tf(f,t) (TFValueSource, lucene/queries/.../valuesource/TFValueSource
    # .java:34): TFIDFSimilarity.tf(freq) — ClassicSimilarity's sqrt(freq).
    # The reference throws unless the field's similarity IS a
    # TFIDFSimilarity, so the classic formula is the only one this name
    # ever computes.
    reg["tf"] = lambda f, t: F.sqrt(F.col(f"tf_{t}").cast("double"))
    reg["docfreq"] = lambda f, t: F.lit(stats["df"][t])
    reg["idf"] = lambda f, t: F.lit(
        math.log(stats["numdocs"] / (stats["df"][t] + 1)) + 1.0
    )
    reg["norm"] = lambda f: F.col("norm_len")
    reg["maxdoc"] = lambda: F.lit(stats["maxdoc"])
    reg["numdocs"] = lambda: F.lit(stats["numdocs"])
    reg["totaltermfreq"] = lambda f, t: F.lit(stats["ttf"][t])
    reg["ttf"] = reg["totaltermfreq"]

    def _sttf(f=None):
        # stats["sumttf"] may be a thunk — the whole-collection aggregate is
        # only paid if an expression actually names sumtotaltermfreq
        v = stats["sumttf"]
        return F.lit(v() if callable(v) else v)

    reg["sumtotaltermfreq"] = _sttf
    reg["sttf"] = _sttf

    def _payload(f, t, d=None):
        # payload(field,term[,default]) (ValueSourceParser 'payload' →
        # FloatPayloadValueSource): the per-doc aggregate of the term's
        # float payloads. The frame prepares ``payload_<term>`` from
        # index.read.payloads_postings (min/max/average/first per doc,
        # caller's choice) exactly like ``tf_<term>`` rides a term-pushed
        # postings scan; docs without the term take the default (0 when
        # omitted, like the reference's defaultValue).
        from pyspark.sql import Column as _C

        dcol = (
            F.lit(0.0)
            if d is None
            else (d if isinstance(d, _C) else F.lit(float(d)))
        )
        return F.coalesce(F.col(f"payload_{t}"), dcol)

    reg["payload"] = _payload
    return reg


FUNCTION_SCORE_EXPR = (
    "div(product(termfreq(content,'spark'), idf(content,'spark')), "
    "sqrt(norm(content)))"
)


def function_score_rank(spark, sf_dir):
    from .functions import parse_func

    s = _searcher(spark, sf_dir)
    term = "spark"
    srow = (
        s._term_stats_df.filter(F.col("term") == term)
        .select("df", "ttf")
        .collect()[0]
    )
    norms = norms_table(spark, s.index_dir)
    counts = norms.agg(
        F.count("*").alias("maxdoc"),
        F.sum((F.col("norm_byte") > 0).cast("long")).alias("numdocs"),
    ).collect()[0]
    stats = {
        "df": {term: int(srow["df"])},
        "ttf": {term: int(srow["ttf"])},
        "numdocs": int(counts["numdocs"]),
        "maxdoc": int(counts["maxdoc"]),
        # lazy: FUNCTION_SCORE_EXPR doesn't reference sumtotaltermfreq, so
        # the whole-stats aggregate is never run unless an expression does
        "sumttf": lambda: int(s._term_stats_df.agg(F.sum("ttf")).collect()[0][0]),
    }
    posts = term_postings(spark, s.index_dir, [term]).select(
        "segment_id", "doc_id", F.col("freq").cast("long").alias(f"tf_{term}")
    )
    docs = spark.read.parquet(os.path.join(s.index_dir, "docs")).select(
        "segment_id", "doc_id", "ext_id"
    )
    frame = (
        posts.join(norms, ["segment_id", "doc_id"])
        .withColumn("norm_len", F.expr(_NORM_DECODE))
        .join(docs, ["segment_id", "doc_id"])
    )
    fcol = parse_func(FUNCTION_SCORE_EXPR, registry=relevance_registry(stats))
    return (
        frame.select(
            F.col("ext_id").alias("doc_id"),
            F.col(f"tf_{term}").alias("tf"),
            F.round(fcol, 4).alias("fscore"),
        )
        .orderBy(F.col("fscore").desc(), F.col("doc_id").asc())
        .limit(15)
    )


FUNCTION_SCORE_SQL = (
    _BM25_CTE
    + """
SELECT t.doc_id, CAST(t.tf AS BIGINT) AS tf,
       round(t.tf * (ln(CAST(cs.n AS DOUBLE) / (df.df + 1)) + 1) / sqrt(dd.dlq), 4)
         AS fscore
FROM tf t
JOIN dft df ON df.term = t.term
JOIN dld dd ON dd.doc_id = t.doc_id
CROSS JOIN cstats cs
WHERE t.term = 'spark'
ORDER BY fscore DESC, t.doc_id ASC LIMIT 15
"""
)


# Lucene expressions module (lucene/expressions/, SURVEY §2.10): arbitrary
# arithmetic over doc values compiled to a DoubleValuesSource → a Spark SQL
# expression; rank events by a computed expression, top-N
def expr_ranked_events(spark, sf_dir):
    e = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    score = F.log(F.lit(1.0) + F.abs(F.col("value"))) + 0.01 * F.dayofmonth("ts")
    return (
        e.select("event_id", F.round(score, 4).alias("expr_score"))
        .orderBy(F.col("expr_score").desc(), F.col("event_id").asc())
        .limit(25)
    )


EXPR_RANKED_SQL = """
SELECT event_id, round(ln(1 + abs(value)) + 0.01 * date_part('day', ts), 4) AS expr_score
FROM events ORDER BY expr_score DESC, event_id ASC LIMIT 25
"""


# Driver-gated registry (the driver checks the first 50 queries() entries —
# every family must land inside that window, so near-duplicate constant-score
# variants are folded into ft_multiterm and BoostQuery into ft_dismax; the
# --------------------------------------------------------------- CJK ops --
# ft_cjk: BM25 OR over three Han bigram terms of the derived mixed-script
# corpus ('了不'=so, '一而'=er, '的也'=an under the translate map);
# ft_cjk_phrase: the quoted run "了不而子" (=sort) — the query analyzes to
# bigrams 了不/不而/而子 at consecutive positions, the reference's
# phrase-over-bigrams shape (CJKBigramFilter.java:48 + QueryBuilder).


def ft_cjk(spark, sf_dir):
    return _cjk_search_all(spark, sf_dir, "了不 OR 一而 OR 的也")


def ft_cjk_phrase(spark, sf_dir):
    return _cjk_search_all(spark, sf_dir, '"了不而子"')


FT_CJK_SQL = (
    "WITH "
    + _bm25_chain("", _CJK_TOKENIZE)
    + _SCORES_CTE.format(terms=_terms_list(["了不", "一而", "的也"]))
    + "SELECT doc_id, round(sum(s), 4) AS score FROM scores GROUP BY doc_id"
)

FT_CJK_PHRASE_SQL = (
    "WITH "
    + _bm25_chain("", _CJK_TOKENIZE)
    + f"""
, tokp AS (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, {_CJK_TOKENIZE} AS arr FROM documents)
),
phr AS (
  SELECT a.doc_id, count(*) AS freq
  FROM tokp a
  JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  JOIN tokp c ON a.doc_id = c.doc_id AND c.pos = a.pos + 2
  WHERE a.term = '了不' AND b.term = '不而' AND c.term = '而子' GROUP BY 1
),
pw AS (
  SELECT sum(ln(1 + (cstats.n - dft.df + 0.5) / (dft.df + 0.5))) AS w
  FROM dft, cstats WHERE dft.term IN ('了不', '不而', '而子')
)
SELECT phr.doc_id,
       round(pw.w * (phr.freq / (phr.freq + 1.2 * (0.25 + 0.75 * dld.dlq / (cstats.st * 1.0 / cstats.n)))), 4) AS score
FROM phr JOIN dld ON phr.doc_id = dld.doc_id, pw, cstats
"""
)


# individual ops stay pytest-gated via FT_EXTRA_OPS).
FT_OPS: dict[str, tuple] = {
    "ft_feature_boost": (ft_feature_boost, FT_FEATURE_SQL),
    "expr_ranked_events": (expr_ranked_events, EXPR_RANKED_SQL),
    "ft_multi_phrase": (ft_multi_phrase, FT_MULTI_PHRASE_SQL),
    "ft_bool": (ft_bool, FT_BOOL_SQL),
    "ft_term_spark": (ft_term_spark, ft_term_sql("spark")),
    "monitor_matches": (monitor_matches, MONITOR_SQL),
    "ft_intervals": (ft_intervals, FT_INTERVALS_SQL),
    "ft_phrase": (ft_phrase, ft_phrase_sql("table", "hash")),
    "ft_phrase_slop": (ft_phrase_slop, FT_PHRASE_SLOP_SQL),
    "ft_edismax": (ft_edismax, FT_EDISMAX_SQL),
    "ft_df_stats": (ft_df_stats, FT_DF_SQL),
    "payload_score": (payload_score_docs, PAYLOAD_SCORE_SQL),
    "ft_multiterm": (ft_multiterm, FT_MULTITERM_SQL),
    "ft_dismax": (ft_dismax, FT_DISMAX_SQL),
    "ft_synonym": (ft_synonym, FT_SYNONYM_SQL),
}

# pytest-gated only (tests/test_entry.py runs main + extra registries against
# DuckDB): the per-variant ops folded into the compound driver entries above.
def json_request_docs(spark, sf_dir):
    """Solr JSON Request API end-to-end (``RequestUtil.processParams`` →
    ``JsonQueryConverter.toLocalParams`` → ``BoolQParserPlugin`` — see
    ``search/jsondsl.py``): a ``bool`` DSL query (must/should/must_not)
    with a param-ref filter, converted to local-params strings and executed
    against the docs index. Score = s(vector) + s(hash when present), docs
    with 'stream' excluded, filtered to docs with 'spark' (non-scoring)."""
    from .search.jsondsl import json_request

    s = _searcher(spark, sf_dir)
    body = {
        "query": {
            "bool": {
                "must": [{"lucene": {"query": "vector"}}],
                "should": ["hash"],
                "must_not": [{"term": {"query": "stream"}}],
            }
        },
        "filter": [{"param": "fq"}],
        "params": {"fq": "spark"},
        "fields": ["ext_id", "score"],
        "limit": None,
    }
    return json_request(body, searcher=s).select(
        F.col("ext_id").alias("doc_id"), F.round("score", 4).alias("score")
    )


JSON_REQUEST_SQL = (
    _BM25_CTE
    + _SCORES_CTE.format(terms=_terms_list(["vector", "hash"]))
    + """
SELECT doc_id, round(sum(s), 4) AS score FROM scores
WHERE doc_id IN (SELECT doc_id FROM tf WHERE term = 'vector')
  AND doc_id NOT IN (SELECT doc_id FROM tf WHERE term = 'stream')
  AND doc_id IN (SELECT doc_id FROM tf WHERE term = 'spark')
GROUP BY doc_id
"""
)


def json_facet_search_docs(spark, sf_dir):
    """JSON Facet API over the search domain (``FacetModule.java:48``,
    ``FacetField.java`` — see ``search/jsonfacet.py``): terms facet on the
    stored ``lang`` field for docs matching 'vector', with the bucket count
    and a nested ``unique(source)`` aggregation. ``limit: -1`` keeps every
    bucket so the comparison is order-free."""
    from .search.jsonfacet import json_facets

    s = _searcher(spark, sf_dir)
    body = {
        "query": "vector",
        "facet": {
            "langs": {
                "type": "terms",
                "field": "lang",
                "limit": -1,
                "mincount": 1,
                "facet": {"uniq_src": "unique(source)"},
            }
        },
    }
    b = json_facets(body, searcher=s)["langs"]
    return b.select(
        "lang",
        F.col("count").cast("long").alias("count"),
        F.col("uniq_src").cast("long").alias("uniq_src"),
    )


JSON_FACET_SEARCH_SQL = (
    _BM25_CTE
    + """
SELECT d.lang AS lang, CAST(count(*) AS BIGINT) AS count,
       CAST(count(DISTINCT d.source) AS BIGINT) AS uniq_src
FROM documents d
WHERE d.doc_id IN (SELECT doc_id FROM tf WHERE term = 'vector')
GROUP BY d.lang
"""
)


FT_EXTRA_OPS: dict[str, tuple] = {
    "json_request_docs": (json_request_docs, JSON_REQUEST_SQL),
    "json_facet_search_docs": (json_facet_search_docs, JSON_FACET_SEARCH_SQL),
    "join_qparser_docs": (join_qparser_docs, JOIN_QPARSER_SQL),
    "ft_bool_and": (ft_bool_and, ft_and_sql(["vector", "hash"])),
    "ft_bool_or": (ft_bool_or, ft_or_sql(["vector", "stream", "spark"])),
    "ft_bool_not": (ft_bool_not, ft_not_sql("vector", "hash")),
    "ft_bool_msm": (ft_bool_msm, FT_MSM_SQL),
    "ft_bool_filter": (ft_bool_filter, FT_FILTER_SQL),
    "ft_classic_parse": (ft_classic_parse, FT_CLASSIC_SQL),
    "ft_simple_parse": (ft_simple_parse, FT_SIMPLE_SQL),
    "ft_common_terms": (ft_common_terms, FT_COMMON_TERMS_SQL),
    "term_vectors": (term_vectors, TERM_VECTORS_SQL),
    "infix_suggest": (infix_suggest, INFIX_SUGGEST_SQL),
    "blended_infix_suggest": (blended_infix_suggest, BLENDED_INFIX_SQL),
    "freetext_backoff_suggest": (freetext_backoff_suggest, FREETEXT_BACKOFF_SQL),
    "phonetic_suggest": (phonetic_suggest, PHONETIC_SUGGEST_SQL),
    "elevated_search": (elevated_search, ELEVATED_SQL),
    "ft_prefix": (ft_prefix, FT_PREFIX_SQL),
    "ft_wildcard": (ft_wildcard, FT_WILDCARD_SQL),
    "ft_regexp": (ft_regexp, FT_REGEXP_SQL),
    "ft_term_range": (ft_term_range, FT_RANGE_SQL),
    "ft_fuzzy": (ft_fuzzy, FT_FUZZY_SQL),
    "ft_term_in_set": (ft_term_in_set, FT_IN_SET_SQL),
    "ft_boost": (ft_boost, FT_BOOST_SQL),
    "ltr_rescore": (ltr_rescore, LTR_RESCORE_SQL),
    "ltr_trees_rescore": (ltr_trees_rescore, LTR_TREES_SQL),
    "terms_component": (terms_component, TERMS_COMPONENT_SQL),
    "spellcheck_suggest": (spellcheck_suggest, SPELLCHECK_SQL),
    "wordbreak_suggest": (wordbreak_suggest, WORDBREAK_SQL),
    "wordcombine_suggest": (wordcombine_suggest, WORDCOMBINE_SQL),
    "spellcheck_collate": (spellcheck_collate, SPELLCOLLATE_SQL),
    "phrases_identify": (phrases_identify, PHRASES_SQL),
    "freetext_suggest": (freetext_suggest, FREETEXT_SUGGEST_SQL),
    "analyzing_suggest": (analyzing_suggest, _asug_sql()),
    "fuzzy_suggest": (fuzzy_suggest, _fsug_sql()),
    "ft_multifield": (ft_multifield, FT_MULTIFIELD_SQL),
    "ft_bm25f": (ft_bm25f, FT_BM25F_SQL),
    "ft_covering": (ft_covering, FT_COVERING_SQL),
    "ft_term_automaton": (ft_term_automaton, FT_TERM_AUTOMATON_SQL),
    "ft_term_tf": (ft_term_tf, FT_TF_SQL),
    "ft_norms": (ft_norms, FT_NORMS_SQL),
    "function_score_rank": (function_score_rank, FUNCTION_SCORE_SQL),
    "ft_cjk": (ft_cjk, FT_CJK_SQL),
    "ft_cjk_phrase": (ft_cjk_phrase, FT_CJK_PHRASE_SQL),
}


# ---------------------------------------------------------------------------
# training-data pipeline operators (dedup / similarity / text analysis)

_TOK_EXPR = "regexp_extract_all(lower(text), '[a-z0-9]+', 0)"


def _docs(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _emb(spark, sf_dir):
    return spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))


# exact dedup: hash-groupBy on content (the canonical web-scale first pass);
# keep the min doc_id representative per content hash
def dedup_exact(spark, sf_dir):
    return (
        _docs(spark, sf_dir)
        .groupBy(F.md5(F.col("text")).alias("content_hash"))
        .agg(F.min("doc_id").alias("keep_id"), F.count("*").alias("n_copies"))
    )


DEDUP_EXACT_SQL = """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
"""


# MinHash signatures over word 3-shingles, 4 hash streams (md5-keyed so both
# engines compute identical values); LSH banding = group by (band signature)
def minhash_signatures(spark, sf_dir):
    # size >= 3 guard: Spark's sequence(0, size-3) runs DESCENDING when
    # size < 3 (DuckDB's generate_series is empty there) — exclude short docs
    d = (
        _docs(spark, sf_dir)
        .withColumn("arr", F.expr(_TOK_EXPR))
        .filter(F.size("arr") >= 3)
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(arr)-3), i -> concat_ws(' ', arr[i], arr[i+1], arr[i+2]))"
            )
        ).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig{i}")
        for i in range(4)
    ]
    return sh.groupBy("doc_id").agg(*aggs)


MINHASH_SQL = f"""
WITH arrs AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
sh AS (
  SELECT doc_id, unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         for i in generate_series(1, len(arr) - 2)]) AS shingle
  FROM arrs
)
SELECT doc_id,
       min(md5('0:' || shingle)) AS sig0, min(md5('1:' || shingle)) AS sig1,
       min(md5('2:' || shingle)) AS sig2, min(md5('3:' || shingle)) AS sig3
FROM sh GROUP BY doc_id
"""


# LSH candidate pairs — the real banding scheme: 16 min-hash signatures
# split into 8 bands × 2 rows (b=8, r=2 ⇒ P(candidate) = 1-(1-s²)⁸, the
# classic S-curve with ~50% threshold at s≈0.3). One shuffle to build the
# signatures (map-side-combinable min aggs), one explode to (band, bucket),
# one equi-join per band key — never an all-pairs comparison, so the plan
# survives 100×: candidate volume is governed by bucket collisions, not n².
_LSH_BANDS = 8
_LSH_ROWS = 2


def minhash_lsh_pairs(spark, sf_dir):
    n_sigs = _LSH_BANDS * _LSH_ROWS
    d = (
        _docs(spark, sf_dir)
        .withColumn("arr", F.expr(_TOK_EXPR))
        .filter(F.size("arr") >= 3)
    )
    sh = d.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(0, size(arr)-3), i -> concat_ws(' ', arr[i], arr[i+1], arr[i+2]))"
            )
        ).alias("shingle"),
    )
    aggs = [
        F.min(F.md5(F.concat(F.lit(f"{i}:"), F.col("shingle")))).alias(f"sig{i}")
        for i in range(n_sigs)
    ]
    sig = sh.groupBy("doc_id").agg(*aggs)
    band_arr = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.md5(
                    F.concat_ws(
                        "|", *[f"sig{b * _LSH_ROWS + r}" for r in range(_LSH_ROWS)]
                    )
                ).alias("bucket"),
            )
            for b in range(_LSH_BANDS)
        ]
    )
    bands = sig.select("doc_id", F.explode(band_arr).alias("x")).select(
        "doc_id", "x.band", "x.bucket"
    )
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bucket")
    b = bands.select(F.col("doc_id").alias("doc_b"), "band", "bucket")
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()  # a pair may collide in several bands
    )


_LSH_SIG_COLS = ",\n       ".join(
    f"min(md5('{i}:' || shingle)) AS sig{i}" for i in range(_LSH_BANDS * _LSH_ROWS)
)
_LSH_BAND_SELECTS = "\n  UNION ALL ".join(
    "SELECT doc_id, {b} AS band, md5({expr}) AS bucket FROM sig".format(
        b=b,
        expr=" || '|' || ".join(f"sig{b * _LSH_ROWS + r}" for r in range(_LSH_ROWS)),
    )
    for b in range(_LSH_BANDS)
)
MINHASH_LSH_SQL = f"""
WITH arrs AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
sh AS (
  SELECT doc_id, unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         for i in generate_series(1, len(arr) - 2)]) AS shingle
  FROM arrs
),
sig AS (
  SELECT doc_id, {_LSH_SIG_COLS}
  FROM sh GROUP BY doc_id
),
bands AS (
  {_LSH_BAND_SELECTS}
)
SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
WHERE a.doc_id < b.doc_id
"""


def connected_components(
    pairs, a: str = "doc_a", b: str = "doc_b", method: str = "propagation"
):
    """Connected components over an undirected pair relation: every node is
    labeled with the min doc_id reachable from it — the canonical web-scale
    dedup endgame (LSH candidate pairs → duplicate CLUSTERS, keep one doc
    per cluster).

    ``method="propagation"`` (default) — distributed min-label propagation:
    each round every node takes the min of its own label and its neighbors'
    labels (one join + one map-side-combinable min-agg per round — no
    all-pairs work anywhere). Rounds = cluster diameter; LSH near-duplicate
    clusters are band-bucket cliques with diameter ≤ 2-3, so this converges
    in a constant number of rounds at any corpus size. Convergence is probed
    with sum(label) — strictly decreasing until fixpoint, one cheap agg
    action per round, no driver-side row collection.

    ``method="star"`` — alternating large-star/small-star contraction (the
    MapReduce-CC construction from the public literature: each round
    rewires strictly-larger neighbors, then smaller-or-equal neighbors, to
    the minimum of the closed neighborhood). O(log² n) rounds regardless of
    component diameter — the choice for adversarial long-chain graphs where
    propagation would need diameter rounds. Same output labels.

    Self-pairs (u == u) carry no connectivity and are dropped by both
    methods: the output covers exactly the nodes with at least one proper
    edge.
    """
    if method == "star":
        return _cc_star(pairs, a, b)
    edges = pairs.select(F.col(a).alias("u"), F.col(b).alias("v")).filter(
        F.col("u") != F.col("v")
    )
    und = edges.unionAll(
        edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
    ).cache()
    labels = und.select(F.col("u").alias("node")).distinct().select(
        "node", F.col("node").alias("label")
    ).cache()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    while True:
        msgs = und.join(
            labels.withColumnRenamed("node", "u"), "u"
        ).select(F.col("v").alias("node"), "label")
        # localCheckpoint truncates the logical plan each round — without it
        # the iterated join lineage grows until Catalyst analysis OOMs on
        # long-diameter graphs
        new_labels = (
            labels.unionAll(msgs)
            .groupBy("node")
            .agg(F.min("label").alias("label"))
            .localCheckpoint(eager=True)
        )
        cur_sum = new_labels.agg(F.sum("label")).collect()[0][0]
        labels.unpersist()
        labels = new_labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    und.unpersist()
    return labels.select(F.col("node").alias("doc_id"), F.col("label").alias("cluster_id"))


def _cc_star(pairs, a: str, b: str):
    """Alternating large-star/small-star contraction. Each round:

    - large-star: group the undirected neighborhood by node u, m = min of
      the closed neighborhood; rewire every neighbor v > u to m.
    - small-star: key each edge by its larger endpoint u over the smaller
      neighbors Γ⁻(u); rewire Γ⁻(u) ∪ {u} to m = min(Γ⁻(u) ∪ {u}).

    The edge set converges to stars (child → component-min root). Fixpoint
    is exact: both rounds' edge sets are canonical and distinct, so equal
    counts plus an empty ``exceptAll`` difference proves set equality — no
    probabilistic probe. A 64-round cap bounds the loop defensively
    (two-phase converges in O(log² n) rounds).
    """
    e = (
        pairs.select(F.col(a).alias("u"), F.col(b).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .cache()
    )
    # materialize the node set up front: the loop rewires (and unpersists) e,
    # and recomputing nodes from the source pair relation later would re-run
    # the whole upstream (e.g. LSH) pipeline
    nodes = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    prev = None
    for _ in range(64):
        # large-star over the full (symmetric) neighborhood
        und = e.unionAll(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
        mins = und.groupBy("u").agg(F.min("v").alias("mv"))
        mins = mins.select("u", F.least("mv", F.col("u")).alias("m"))
        large = (
            und.join(mins, "u")
            .filter(F.col("v") > F.col("u"))
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
        )
        e1 = (
            large.filter(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
            .distinct()
        )
        # small-star keyed by the larger endpoint (canonical form already is)
        mins2 = e1.groupBy("u").agg(F.min("v").alias("m"))
        small = (
            e1.join(mins2, "u")
            .select(F.col("v").alias("x"), F.col("m").alias("y"))
            .unionAll(mins2.select(F.col("u").alias("x"), F.col("m").alias("y")))
        )
        # plan-truncating checkpoint per round (see propagation note)
        new_e = (
            small.filter(F.col("x") != F.col("y"))
            .select(F.greatest("x", "y").alias("u"), F.least("x", "y").alias("v"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        n_new = new_e.count()
        converged = n_new == prev and new_e.exceptAll(e).isEmpty()
        e.unpersist()
        e = new_e
        if converged:
            break
        prev = n_new
    labels = nodes.join(
        e.select(F.col("u").alias("node"), F.col("v").alias("label")), "node", "left"
    ).select("node", F.coalesce("label", "node").alias("label"))
    out = labels.select(
        F.col("node").alias("doc_id"), F.col("label").alias("cluster_id")
    )
    return out


def dedup_clusters(spark, sf_dir):
    """LSH candidate pairs → transitive duplicate clusters (doc_id →
    cluster representative = min reachable doc_id)."""
    return connected_components(minhash_lsh_pairs(spark, sf_dir))


# the oracle computes the same min-reachable-id label via a recursive
# transitive closure over the same LSH pair relation
DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE arrs AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
sh AS (
  SELECT doc_id, unnest([arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2]
                         for i in generate_series(1, len(arr) - 2)]) AS shingle
  FROM arrs
),
sig AS (
  SELECT doc_id, {_LSH_SIG_COLS}
  FROM sh GROUP BY doc_id
),
bands AS (
  {_LSH_BAND_SELECTS}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bucket = b.bucket
  WHERE a.doc_id < b.doc_id
),
edges AS (
  SELECT doc_a AS src, doc_b AS dst FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
),
reach(node, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
)
SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
"""


# Solr classify()/train() streams (reference solr/solrj/src/java/org/apache/
# solr/client/solrj/io/stream/ClassifyStream.java:47, TextLogitStream.java:60):
# train a text classifier on a labeled tuple stream, apply it to another
# stream. The reference's train() fits logistic regression by iterative SGD
# (iteration/order-dependent); the model here is multinomial Naive Bayes with
# add-one smoothing — same surface, but closed-form and deterministic. The
# training corpus is scanned exactly twice: one token explode feeding the
# per-(label,term) count agg (map-side combinable), and one column-pruned
# doc-count agg for the priors; per-label token totals and the vocabulary
# size reduce off the cached model table, not the corpus. Scoring is one
# broadcast join of the tiny model against the test tokens. At 100 TB the
# corpus side never shuffles more than the (doc, term, tf) explode; the
# model (|vocab| × |labels|) is the broadcast side.
def classify_docs(spark, sf_dir):
    import math

    from pyspark.sql import Window

    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    train = d.filter(F.col("doc_id") % 5 != 0)
    test = d.filter((F.col("doc_id") % 5 == 0) & (F.size("arr") >= 1))
    tr_tok = train.select(F.col("lang").alias("label"), F.explode("arr").alias("term"))
    counts = tr_tok.groupBy("label", "term").agg(F.count("*").alias("c")).cache()
    label_tot = counts.groupBy("label").agg(F.sum("c").alias("n_l"))
    vocab = counts.select("term").distinct().count()
    # per-label doc counts: |labels| rows of model metadata
    label_docs = train.groupBy(F.col("lang").alias("label")).count().collect()
    n_train = sum(r["count"] for r in label_docs)
    priors = spark.createDataFrame(
        [(r["label"], math.log(r["count"] / n_train)) for r in label_docs],
        "label string, log_prior double",
    )
    te_tok = (
        test.select("doc_id", F.explode("arr").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    scored = (
        te_tok.crossJoin(F.broadcast(label_tot))
        .join(F.broadcast(counts), ["label", "term"], "left")
        .withColumn(
            "ll",
            F.col("tf")
            * F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + 1.0)
                / (F.col("n_l") + F.lit(float(vocab)))
            ),
        )
        .groupBy("doc_id", "label")
        .agg(F.sum("ll").alias("sum_ll"))
        .join(F.broadcast(priors), "label")
        # round BEFORE the argmax rank so cross-engine float-association noise
        # cannot flip the winner without also flipping the oracle
        .withColumn("score", F.round(F.col("sum_ll") + F.col("log_prior"), 4))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("label").asc())
    pred = scored.withColumn("rk", F.row_number().over(w)).filter(F.col("rk") == 1)
    return pred.join(test.select("doc_id", F.col("lang").alias("actual")), "doc_id").select(
        "doc_id", F.col("label").alias("pred"), "actual", "score"
    )


CLASSIFY_SQL = f"""
WITH d AS (SELECT doc_id, lang, {_TOK_EXPR} AS arr FROM documents),
train AS (SELECT * FROM d WHERE doc_id % 5 != 0),
test AS (SELECT * FROM d WHERE doc_id % 5 = 0 AND len(arr) >= 1),
tr_tok AS (SELECT lang AS label, unnest(arr) AS term FROM train),
counts AS (SELECT label, term, count(*) AS c FROM tr_tok GROUP BY 1, 2),
label_tot AS (SELECT label, count(*) AS n_l FROM tr_tok GROUP BY 1),
priors AS (
  SELECT lang AS label,
         ln(count(*) * 1.0 / (SELECT count(*) FROM train)) AS log_prior
  FROM train GROUP BY 1
),
vocab AS (SELECT count(DISTINCT term) AS v FROM tr_tok),
te_tok AS (
  SELECT doc_id, term, count(*) AS tf
  FROM (SELECT doc_id, unnest(arr) AS term FROM test) GROUP BY 1, 2
),
scored AS (
  SELECT t.doc_id, l.label,
         sum(t.tf * ln((coalesce(c.c, 0) + 1.0) / (l.n_l + v.v))) AS sum_ll
  FROM te_tok t
  CROSS JOIN label_tot l
  CROSS JOIN vocab v
  LEFT JOIN counts c ON c.label = l.label AND c.term = t.term
  GROUP BY 1, 2
),
final AS (
  SELECT s.doc_id, s.label, round(s.sum_ll + p.log_prior, 4) AS score
  FROM scored s JOIN priors p USING (label)
),
rk AS (
  SELECT *, row_number() OVER (PARTITION BY doc_id
            ORDER BY score DESC, label ASC) AS rk
  FROM final
)
SELECT r.doc_id, r.label AS pred, t.lang AS actual, r.score
FROM rk r JOIN test t USING (doc_id) WHERE rk = 1
"""


# SimHash-16: per-token 32-bit md5-derived hash, tf-weighted bit majority
def simhash16(spark, sf_dir):
    tok = _docs(spark, sf_dir).select(
        "doc_id", F.explode(F.expr(_TOK_EXPR)).alias("term")
    )
    h = F.conv(F.substring(F.md5(F.col("term")), 1, 8), 16, 10).cast("long")
    tok = tok.withColumn("h", h)
    aggs = [
        F.sum(
            F.when(F.shiftright(F.col("h"), i).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"b{i}")
        for i in range(16)
    ]
    g = tok.groupBy("doc_id").agg(*aggs)
    sim = None
    for i in range(16):
        bit = F.when(F.col(f"b{i}") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return g.select("doc_id", sim.cast("long").alias("simhash"))


_SIMHASH_BITS_SQL = ",\n".join(
    f"sum(CASE WHEN (h >> {i}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}" for i in range(16)
)
_SIMHASH_VAL_SQL = " + ".join(
    f"(CASE WHEN b{i} > 0 THEN {1 << i} ELSE 0 END)" for i in range(16)
)
SIMHASH_SQL = f"""
WITH tok AS (SELECT doc_id, unnest({_TOK_EXPR}) AS term FROM documents),
hashed AS (SELECT doc_id, CAST(('0x' || substr(md5(term), 1, 8)) AS BIGINT) AS h FROM tok),
bits AS (SELECT doc_id, {_SIMHASH_BITS_SQL} FROM hashed GROUP BY doc_id)
SELECT doc_id, CAST({_SIMHASH_VAL_SQL} AS BIGINT) AS simhash FROM bits
"""


# n-gram (token-set) Jaccard between consecutive doc_ids — the verification
# stage of a near-dup pipeline
def ngram_jaccard(spark, sf_dir):
    tok = (
        _docs(spark, sf_dir)
        .select("doc_id", F.explode(F.expr(_TOK_EXPR)).alias("term"))
        .distinct()
    )
    a = tok.select(F.col("doc_id").alias("doc_a"), "term")
    b = tok.select((F.col("doc_id") - 1).alias("doc_a"), F.col("term").alias("term_b"))
    inter = (
        a.join(b, (a.doc_a == b.doc_a) & (a.term == b.term_b))
        .groupBy(a.doc_a)
        .agg(F.count("*").alias("inter"))
    )
    sizes = tok.groupBy("doc_id").agg(F.count("*").alias("sz"))
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select((F.col("doc_id") - 1).alias("doc_a"), F.col("sz").alias("sz_b"))
    return (
        sa.join(sb, "doc_a")
        .join(inter, "doc_a", "left")
        .na.fill({"inter": 0})
        .select(
            "doc_a",
            F.round(
                F.col("inter") / (F.col("sz_a") + F.col("sz_b") - F.col("inter")), 4
            ).alias("jaccard"),
        )
    )


NGRAM_JACCARD_SQL = f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest({_TOK_EXPR}) AS term FROM documents),
sizes AS (SELECT doc_id, count(*) AS sz FROM tok GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, count(*) AS inter
  FROM tok a JOIN tok b ON b.doc_id = a.doc_id + 1 AND a.term = b.term
  GROUP BY a.doc_id
)
SELECT sa.doc_id AS doc_a,
       round(coalesce(i.inter, 0) * 1.0 / (sa.sz + sb.sz - coalesce(i.inter, 0)), 4) AS jaccard
FROM sizes sa JOIN sizes sb ON sb.doc_id = sa.doc_id + 1
LEFT JOIN inter i ON i.doc_a = sa.doc_id
"""


# embedding cosine similarity between consecutive vectors (brute-force kernel
# of the ANN pipeline) — arrays cast to double on both sides
def emb_cosine_pairs(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn(
        "v", F.expr("transform(embedding, x -> cast(x AS double))")
    )
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    b = e.select((F.col("vec_id") - 1).alias("id_a"), F.col("v").alias("vb"))
    j = a.join(b, "id_a")
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)")
    na = F.expr("aggregate(va, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    nb = F.expr("aggregate(vb, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    return j.select(
        "id_a", F.round(dot / (F.sqrt(na) * F.sqrt(nb)), 4).alias("cosine")
    )


EMB_COSINE_SQL = """
SELECT a.vec_id AS id_a,
       round(list_dot_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) /
             (sqrt(list_dot_product(a.embedding::DOUBLE[], a.embedding::DOUBLE[])) *
              sqrt(list_dot_product(b.embedding::DOUBLE[], b.embedding::DOUBLE[]))), 4) AS cosine
FROM embeddings a JOIN embeddings b ON b.vec_id = a.vec_id + 1
"""


# brute-force similarity search: all vectors within cosine >= threshold of the
# query vector (vec_id = 0) — threshold form avoids top-k tie boundaries
def emb_knn_threshold(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn(
        "v", F.expr("transform(embedding, x -> cast(x AS double))")
    )
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    j = e.filter(F.col("vec_id") != 0).crossJoin(F.broadcast(q))
    dot = F.expr("aggregate(zip_with(v, qv, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)")
    nv = F.expr("aggregate(v, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    nq = F.expr("aggregate(qv, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    return (
        j.withColumn("cosine", dot / (F.sqrt(nv) * F.sqrt(nq)))
        .filter(F.col("cosine") >= 0.15)
        .select("vec_id", F.round("cosine", 4).alias("cosine"))
    )


EMB_KNN_SQL = """
WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0)
SELECT vec_id, round(cosine, 4) AS cosine FROM (
  SELECT e.vec_id,
         list_dot_product(e.embedding::DOUBLE[], q.qv) /
         (sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])) *
          sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM embeddings e, q WHERE e.vec_id != 0
) WHERE cosine >= 0.15
"""


# Random-hyperplane LSH near-dup over embeddings (SimHash in embedding
# space — Charikar'02, the scale path for embedding-cosine near-dup where
# the brute-force emb_cosine_pairs all-pairs join is impossible): 16
# deterministic integer hyperplanes → 16 sign bits per vector, banded
# 4×4 bits; candidate pairs come from a bucket EQUI-JOIN per band (never
# all-pairs — at 100 TB each band shuffles on (band, bkey) and only
# same-bucket vectors meet), then a cosine >= τ verify stage over the
# candidates only. Recall is the standard banding curve (1-(1-p^r)^b,
# p = 1 - θ/π); candidates missed by every band are absent by design —
# the DuckDB oracle mirrors the banding, so the comparison checks the
# exact LSH semantics, not a recall illusion.
_ELSH_H, _ELSH_DIM, _ELSH_BANDS, _ELSH_ROWS = 16, 64, 4, 4
_ELSH_TAU = 0.4


def _elsh_plane(h: int) -> list[int]:
    # deterministic integer components in [-3, 3] — exact in float64 on
    # both engines, no RNG state to ship
    return [((h * 1315423911 + i * 2654435761) % 7) - 3 for i in range(_ELSH_DIM)]


def emb_lsh_neardup(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn(
        "v", F.expr("transform(embedding, x -> cast(x AS double))")
    )
    bits = []
    for h in range(_ELSH_H):
        lits = ", ".join(f"{c}.0D" for c in _elsh_plane(h))
        dot = (
            f"aggregate(zip_with(v, array({lits}), (x, y) -> x * y), "
            "cast(0.0 AS double), (acc, x) -> acc + x)"
        )
        bits.append(f"(CASE WHEN {dot} >= 0 THEN {1 << h} ELSE 0 END)")
    sig = e.select("vec_id", F.expr(" + ".join(bits)).alias("sig"))
    keyed = sig.select(
        "vec_id",
        F.explode(F.expr(f"sequence(0, {_ELSH_BANDS - 1})")).alias("band"),
        "sig",
    ).select(
        "vec_id", "band",
        F.expr(f"shiftright(sig, band * {_ELSH_ROWS}) & {(1 << _ELSH_ROWS) - 1}").alias("bkey"),
    )
    a = keyed.select("band", "bkey", F.col("vec_id").alias("id_a"))
    b = keyed.select("band", "bkey", F.col("vec_id").alias("id_b"))
    cand = (
        a.join(b, ["band", "bkey"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    va = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"))
    vb = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"))
    j = cand.join(va, "id_a").join(vb, "id_b")
    dot = F.expr("aggregate(zip_with(va, vb, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)")
    na = F.expr("aggregate(va, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    nb = F.expr("aggregate(vb, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    return (
        j.withColumn("cosine", dot / (F.sqrt(na) * F.sqrt(nb)))
        .filter(F.col("cosine") >= _ELSH_TAU)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def _elsh_sig_sql() -> str:
    bits = []
    for h in range(_ELSH_H):
        lits = ", ".join(f"{c}" for c in _elsh_plane(h))
        bits.append(
            f"(CASE WHEN list_dot_product(v, [{lits}]::DOUBLE[]) >= 0 "
            f"THEN {1 << h} ELSE 0 END)"
        )
    return " + ".join(bits)


EMB_LSH_SQL = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
sig AS (SELECT vec_id, {_elsh_sig_sql()} AS sig FROM v),
keyed AS (
  SELECT vec_id, band, (sig >> (band * {_ELSH_ROWS})) & {(1 << _ELSH_ROWS) - 1} AS bkey
  FROM sig, generate_series(0, {_ELSH_BANDS - 1}) AS t(band)
),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM keyed a JOIN keyed b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.vec_id < b.vec_id
)
SELECT id_a, id_b, round(cosine, 4) AS cosine FROM (
  SELECT c.id_a, c.id_b,
         list_dot_product(x.v, y.v) /
         (sqrt(list_dot_product(x.v, x.v)) * sqrt(list_dot_product(y.v, y.v))) AS cosine
  FROM cand c JOIN v x ON x.vec_id = c.id_a JOIN v y ON y.vec_id = c.id_b
) WHERE cosine >= {_ELSH_TAU}
"""


# language-ID heuristic: stopword-density rule (n-gram/стоп-слово heuristic —
# the cheap first-pass language filter of a web-scale pipeline)
_STOP10 = ("the", "a", "and", "of", "to", "in", "is", "it", "that", "for")


def lang_id(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    stop_arr = ", ".join(f"'{w}'" for w in _STOP10)
    n_stop = F.expr(f"size(filter(arr, x -> x IN ({stop_arr})))")
    # greatest(n_tok, 1): a zero-token doc must yield 'other', not an ANSI
    # divide-by-zero (Spark 4 default) or a NULL the oracle disagrees on
    return d.select(
        "doc_id",
        n_stop.alias("n_stop"),
        F.size("arr").alias("n_tok"),
        F.when(
            n_stop / F.greatest(F.size("arr"), F.lit(1)) > 0.03, "en"
        ).otherwise("other").alias("pred"),
    )


LANG_ID_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
c AS (SELECT doc_id, len(list_filter(arr, x -> x IN ({", ".join(f"'{w}'" for w in _STOP10)}))) AS n_stop,
             len(arr) AS n_tok FROM t)
SELECT doc_id, n_stop, n_tok,
       CASE WHEN n_stop * 1.0 / greatest(n_tok, 1) > 0.03 THEN 'en' ELSE 'other' END AS pred
FROM c
"""


# quality scoring: length + stopword-ratio composite (web-pipeline filter)
def quality_score(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    stop_arr = ", ".join(f"'{w}'" for w in _STOP10)
    n_stop = F.expr(f"size(filter(arr, x -> x IN ({stop_arr})))")
    n_tok = F.size("arr")
    # greatest(n_tok, 1): empty doc → quality 0.0 on both engines (no ANSI
    # divide-by-zero, no NULL)
    return d.select(
        "doc_id",
        F.round(
            F.least(n_tok / F.lit(60.0), F.lit(1.0))
            * (1 - n_stop / F.greatest(n_tok, F.lit(1))),
            4,
        ).alias("quality"),
    )


QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
c AS (SELECT doc_id, len(list_filter(arr, x -> x IN ({", ".join(f"'{w}'" for w in _STOP10)}))) AS n_stop,
             len(arr) AS n_tok FROM t)
SELECT doc_id, round(least(n_tok / 60.0, 1.0) * (1 - n_stop * 1.0 / greatest(n_tok, 1)), 4) AS quality
FROM c
"""


# token counting: word tokens + "BPE-ish" sub-pieces (letters runs split at 4)
def token_count(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.size(F.expr(_TOK_EXPR)).alias("n_words"),
        F.size(F.expr("regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]{1,4}', 0)")).alias(
            "n_pieces"
        ),
    )


TOKEN_COUNT_SQL = f"""
SELECT doc_id, len({_TOK_EXPR}) AS n_words,
       len(regexp_extract_all(lower(text), '[a-z]{{1,4}}|[0-9]{{1,4}}')) AS n_pieces
FROM documents
"""


# document fingerprint: md5 of the sorted distinct token set (the classic
# "fingerprint" near-dup collapse)
def fingerprint(spark, sf_dir):
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.md5(
            F.concat_ws(" ", F.array_sort(F.array_distinct(F.expr(_TOK_EXPR))))
        ).alias("fp"),
    )


FINGERPRINT_SQL = f"""
SELECT doc_id, md5(array_to_string(list_sort(list_distinct({_TOK_EXPR})), ' ')) AS fp
FROM documents
"""


# KnnStream / MoreLikeThis (SolrJ KnnStream.java:56, MoreLikeThis.java:64):
# k-nearest docs to a target doc by idf-weighted term overlap — the reference
# scores shared terms by similarity (tf·idf), not raw overlap. Here: BM25-idf
# per shared term, summed per candidate. df is computed over ALL docs but the
# aggregation is semi-join-pruned to the target's terms first (at 100 TB the
# df table for one doc's terms is tiny → broadcast).
def mlt_shared_terms(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.expr(_TOK_EXPR)).alias("term")).distinct()
    target = tok.filter(F.col("doc_id") == 0).select("term")
    dfs = (
        tok.join(F.broadcast(target), "term", "left_semi")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
    )
    n = docs.agg(F.count("*").alias("n_docs"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    return (
        tok.filter(F.col("doc_id") != 0)
        .join(F.broadcast(dfs), "term")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("shared"),
            F.round(F.sum(idf), 4).alias("mlt_score"),
        )
        .filter(F.col("shared") >= 5)
    )


# KNearestNeighborClassifier (reference lucene/classification/src/java/org/
# apache/lucene/classification/KNearestNeighborClassifier.java:53): classify
# a document by majority class among its k MLT-nearest neighbors. Neighbor
# rank = shared-distinct-token overlap (the MLT relation above), k=10,
# deterministic tie-breaks (overlap desc, doc_id asc; votes desc, lang asc).
# Scale shape: the query docs' token sets are the broadcast side; the corpus
# side is one explode + count groupBy; both rankings are windows partitioned
# by query id (parallel across queries, never a global single partition).
def knn_classify(spark, sf_dir):
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.expr(_TOK_EXPR)).alias("term")).distinct()
    qids = docs.filter(F.col("doc_id") % 97 == 0).select(
        F.col("doc_id").alias("qid")
    )
    qtok = tok.join(F.broadcast(qids), tok.doc_id == F.col("qid")).select(
        "qid", "term"
    )
    overlap = (
        tok.join(F.broadcast(qtok), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        .agg(F.count("*").alias("overlap"))
    )
    w_n = Window.partitionBy("qid").orderBy(
        F.col("overlap").desc(), F.col("doc_id").asc()
    )
    neigh = overlap.withColumn("rk", F.row_number().over(w_n)).filter(
        F.col("rk") <= 10
    )
    votes = (
        neigh.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("qid", "lang")
        .agg(F.count("*").alias("votes"))
    )
    w_v = Window.partitionBy("qid").orderBy(
        F.col("votes").desc(), F.col("lang").asc()
    )
    return (
        votes.withColumn("vrk", F.row_number().over(w_v))
        .filter(F.col("vrk") == 1)
        .select(F.col("qid").alias("doc_id"), F.col("lang").alias("predicted"), "votes")
    )


KNN_CLASSIFY_SQL = """
WITH tok AS (SELECT DISTINCT doc_id, unnest({tok}) AS term FROM documents),
qtok AS (SELECT doc_id AS qid, term FROM tok WHERE doc_id % 97 = 0),
overlap AS (
  SELECT q.qid, t.doc_id, count(*) AS overlap
  FROM tok t JOIN qtok q USING (term)
  WHERE t.doc_id != q.qid
  GROUP BY q.qid, t.doc_id
),
neigh AS (
  SELECT qid, doc_id FROM (
    SELECT qid, doc_id,
           row_number() OVER (PARTITION BY qid ORDER BY overlap DESC, doc_id ASC) AS rk
    FROM overlap
  ) WHERE rk <= 10
),
votes AS (
  SELECT n.qid, d.lang, count(*) AS votes
  FROM neigh n JOIN documents d ON n.doc_id = d.doc_id
  GROUP BY n.qid, d.lang
)
SELECT qid AS doc_id, lang AS predicted, votes FROM (
  SELECT qid, lang, votes,
         row_number() OVER (PARTITION BY qid ORDER BY votes DESC, lang ASC) AS vrk
  FROM votes
) WHERE vrk = 1
""".format(tok=_TOK_EXPR)


MLT_SQL = f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest({_TOK_EXPR}) AS term FROM documents),
tgt AS (SELECT term FROM tok WHERE doc_id = 0),
dfs AS (SELECT term, count(*) AS df FROM tok
        WHERE term IN (SELECT term FROM tgt) GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT tok.doc_id, count(*) AS shared,
       round(sum(ln(1 + (n.n_docs - dfs.df + 0.5) / (dfs.df + 0.5))), 4) AS mlt_score
FROM tok JOIN dfs USING (term), n
WHERE tok.doc_id != 0
GROUP BY tok.doc_id HAVING count(*) >= 5
"""


# IVF-bucketed ANN — the scale path for similarity search: a deterministic
# coarse quantizer (sign pattern of the first 4 dims ~ a fixed hyperplane
# partition) buckets vectors; the query probes only its own bucket. At 100 TB
# the bucket id is the partition key: candidate generation is a partition-
# pruned scan + broadcast of the query, never an all-pairs join.
def _ivf_bucket_spark(col="embedding"):
    parts = [
        f"CASE WHEN {col}[{i}] >= 0 THEN '1' ELSE '0' END" for i in range(4)
    ]
    return "concat(" + ", ".join(parts) + ")"


def _ivf_bucket_duck(col="embedding"):
    parts = [
        f"CASE WHEN {col}[{i + 1}] >= 0 THEN '1' ELSE '0' END" for i in range(4)
    ]
    return "concat(" + ", ".join(parts) + ")"


def emb_ivf_probe(spark, sf_dir):
    e = _emb(spark, sf_dir).withColumn(
        "v", F.expr("transform(embedding, x -> cast(x AS double))")
    ).withColumn("bucket", F.expr(_ivf_bucket_spark()))
    q = e.filter(F.col("vec_id") == 0).select(
        F.col("v").alias("qv"), F.col("bucket").alias("qbucket")
    )
    cand = e.filter(F.col("vec_id") != 0).join(
        F.broadcast(q), F.col("bucket") == F.col("qbucket")
    )
    dot = F.expr(
        "aggregate(zip_with(v, qv, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)"
    )
    nv = F.expr("aggregate(v, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    nq = F.expr("aggregate(qv, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    return (
        cand.withColumn("cosine", dot / (F.sqrt(nv) * F.sqrt(nq)))
        .filter(F.col("cosine") >= 0.05)
        .select("vec_id", "bucket", F.round("cosine", 4).alias("cosine"))
    )


EMB_IVF_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v, {_ivf_bucket_duck()} AS bucket
  FROM embeddings
),
q AS (SELECT v AS qv, bucket AS qbucket FROM e WHERE vec_id = 0)
SELECT e.vec_id, e.bucket, round(cosine, 4) AS cosine FROM (
  SELECT e.vec_id, e.bucket,
         list_dot_product(e.v, q.qv) /
         (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) AS cosine
  FROM e, q WHERE e.vec_id != 0 AND e.bucket = q.qbucket
) e WHERE cosine >= 0.05
"""


# Trained IVF ANN — the real 100-TB similarity-search shape: a k-means
# coarse quantizer (Lloyd iterations) learned from the data, then an
# nprobe-bucket probe. Training state (K centroids) is MODEL state, not
# data: each Lloyd step is one map-side-combinable Spark aggregation and a
# K×dim collect (exactly what MLlib's KMeans driver loop does); at 100 TB
# you train on a sample and the probe stays a partition-pruned scan over
# cluster-id (the bucket is the partition key) + a broadcast query.
# Determinism across engines: embeddings are quantized to integers
# (floor(x·1000 + 0.5)) so distance sums and centroid sums are EXACT and
# order-independent — Spark and DuckDB produce bit-identical centroids,
# assignments and probe sets (the floats-only cosine rides the proven
# list_dot_product/aggregate seam and rounds to 4dp).
IVF_K = 8
IVF_ITERS = 2
IVF_NPROBE = 2

_VQ_SPARK = (
    "transform(embedding, x -> cast(floor(cast(x AS double) * 1000.0 + 0.5) AS bigint))"
)


def _ivf_assign_expr(cents):
    """Nearest-centroid id as one Catalyst expression: min over K of
    (L2² · K + cid) — ties break to the lowest cid, all integer-exact."""
    terms = []
    for cid, c in cents:
        arr = "array(" + ",".join(f"{int(x)}L" for x in c) + ")"
        d2 = (
            f"aggregate(zip_with(vq, {arr}, (x, y) -> (x - y) * (x - y)), "
            "0L, (acc, d) -> acc + d)"
        )
        terms.append(f"({d2} * {IVF_K} + {cid})")
    inner = terms[0] if len(terms) == 1 else f"least({', '.join(terms)})"
    return F.expr(f"cast({inner} % {IVF_K} AS bigint)")


def emb_ivf_trained(spark, sf_dir):
    e = (
        _emb(spark, sf_dir)
        .select(
            "vec_id",
            F.expr("transform(embedding, x -> cast(x AS double))").alias("v"),
            F.expr(_VQ_SPARK).alias("vq"),
        )
        .persist()
    )
    # init: the first K vectors by vec_id (deterministic seeding)
    cents = sorted(
        (int(r.vec_id), list(r.vq))
        for r in e.filter(F.col("vec_id") < IVF_K).collect()
    )
    for _ in range(IVF_ITERS):
        upd = (
            e.withColumn("cid", _ivf_assign_expr(cents))
            .select("cid", F.posexplode("vq").alias("pos", "x"))
            .groupBy("cid", "pos")
            .agg(F.floor(F.sum("x") / F.count("*")).alias("m"))
            .groupBy("cid")
            .agg(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "m"))),
                    lambda s: s["m"],
                ).alias("c")
            )
            .collect()
        )
        cents = sorted((int(r.cid), list(r.c)) for r in upd)
    # nprobe nearest centroids to the query vector (driver-side: K ints)
    qvq = e.filter(F.col("vec_id") == 0).select("vq").collect()[0].vq
    qd = sorted(
        (sum((int(a) - int(b)) ** 2 for a, b in zip(qvq, c)), cid)
        for cid, c in cents
    )
    probes = sorted(cid for _, cid in qd[:IVF_NPROBE])
    q = e.filter(F.col("vec_id") == 0).select(F.col("v").alias("qv"))
    dot = F.expr(
        "aggregate(zip_with(v, qv, (x, y) -> x * y), cast(0.0 AS double), (acc, x) -> acc + x)"
    )
    nv = F.expr("aggregate(v, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    nq = F.expr("aggregate(qv, cast(0.0 AS double), (acc, x) -> acc + x * x)")
    return (
        e.withColumn("cid", _ivf_assign_expr(cents))
        .filter((F.col("vec_id") != 0) & F.col("cid").isin([int(p) for p in probes]))
        .crossJoin(F.broadcast(q))
        .withColumn("cosine", dot / (F.sqrt(nv) * F.sqrt(nq)))
        .filter(F.col("cosine") >= 0.05)
        .select("vec_id", "cid", F.round("cosine", 4).alias("cosine"))
    )


_IVF_D2 = "list_sum(list_transform(list_zip({a}, {b}), s -> (s[1] - s[2]) * (s[1] - s[2])))"


def _ivf_assign_cte(src, csrc, out):
    d2 = _IVF_D2.format(a=f"{src}.vq", b=f"{csrc}.c")
    return f"""{out} AS (
  SELECT vec_id, CAST(min({d2} * {IVF_K} + {csrc}.cid) % {IVF_K} AS BIGINT) AS cid
  FROM {src}, {csrc} GROUP BY vec_id)"""


def _ivf_update_cte(asrc, out):
    return f"""{out}_u AS (
  SELECT a.cid, u.pos, CAST(floor(sum(u.x) / count(*)) AS BIGINT) AS m
  FROM {asrc} a JOIN e ON a.vec_id = e.vec_id,
       LATERAL (SELECT unnest(e.vq) AS x, generate_subscripts(e.vq, 1) AS pos) u
  GROUP BY a.cid, u.pos),
{out} AS (
  SELECT cid, list_transform(list_sort(list(ROW(pos, m))), s -> CAST(s[2] AS BIGINT)) AS c
  FROM {out}_u GROUP BY cid)"""


EMB_IVF_TRAINED_SQL = f"""
WITH e AS (
  SELECT vec_id, embedding::DOUBLE[] AS v,
         list_transform(embedding, x -> CAST(floor(x * 1000.0 + 0.5) AS BIGINT)) AS vq
  FROM embeddings),
c0 AS (SELECT vec_id AS cid, vq AS c FROM e WHERE vec_id < {IVF_K}),
{_ivf_assign_cte('e', 'c0', 'a1')},
{_ivf_update_cte('a1', 'c1')},
{_ivf_assign_cte('e', 'c1', 'a2')},
{_ivf_update_cte('a2', 'c2')},
qd AS (
  SELECT c2.cid, {_IVF_D2.format(a='e.vq', b='c2.c')} AS d2
  FROM e, c2 WHERE e.vec_id = 0),
probe AS (SELECT cid FROM (SELECT cid, row_number() OVER (ORDER BY d2, cid) AS rn FROM qd) WHERE rn <= {IVF_NPROBE}),
{_ivf_assign_cte('e', 'c2', 'a3')},
q AS (SELECT v AS qv FROM e WHERE vec_id = 0)
SELECT a3.vec_id, a3.cid,
       round(list_dot_product(e.v, q.qv) /
             (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))), 4) AS cosine
FROM a3 JOIN e ON a3.vec_id = e.vec_id, q
WHERE a3.cid IN (SELECT cid FROM probe) AND a3.vec_id != 0
  AND list_dot_product(e.v, q.qv) /
      (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(q.qv, q.qv))) >= 0.05
"""


# text_metrics: language-ID + quality score + token counting in ONE scan —
# the single-pass text-analysis profile of a web-scale pipeline (each metric
# is a pure Catalyst expression over the same tokenization; no shuffle at
# all). Zero-token docs get explicit guards (pred='other', quality=0.0)
# instead of null/NaN division.
def text_metrics(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    stop_arr = ", ".join(f"'{w}'" for w in _STOP10)
    n_stop = F.expr(f"size(filter(arr, x -> x IN ({stop_arr})))")
    n_tok = F.size("arr")
    pred = (
        F.when(n_tok == 0, F.lit("other"))
        .when(n_stop / n_tok > 0.03, F.lit("en"))
        .otherwise(F.lit("other"))
    )
    quality = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.round(F.least(n_tok / F.lit(60.0), F.lit(1.0)) * (1 - n_stop / n_tok), 4)
    )
    n_pieces = F.size(
        F.expr("regexp_extract_all(lower(text), '[a-z]{1,4}|[0-9]{1,4}', 0)")
    )
    return d.select(
        "doc_id",
        n_stop.cast("long").alias("n_stop"),
        n_tok.cast("long").alias("n_tok"),
        pred.alias("pred"),
        quality.alias("quality"),
        n_pieces.cast("long").alias("n_pieces"),
    )


TEXT_METRICS_SQL = f"""
WITH t AS (SELECT doc_id, text, {_TOK_EXPR} AS arr FROM documents),
c AS (
  SELECT doc_id, text,
         len(list_filter(arr, x -> x IN ({", ".join(f"'{w}'" for w in _STOP10)}))) AS n_stop,
         len(arr) AS n_tok
  FROM t
)
SELECT doc_id, n_stop, n_tok,
       CASE WHEN n_tok = 0 THEN 'other'
            WHEN n_stop * 1.0 / n_tok > 0.03 THEN 'en' ELSE 'other' END AS pred,
       CASE WHEN n_tok = 0 THEN 0.0
            ELSE round(least(n_tok / 60.0, 1.0) * (1 - n_stop * 1.0 / n_tok), 4)
       END AS quality,
       len(regexp_extract_all(lower(text), '[a-z]{{1,4}}|[0-9]{{1,4}}')) AS n_pieces
FROM c
"""


# doc_signatures: SimHash-16 + sorted-token-set fingerprint in ONE narrow
# scan. The simhash here is computed with higher-order array functions
# (transform/filter) instead of explode+groupBy — zero shuffle, which is the
# plan you want when fingerprinting 10^12 docs (the legacy exploded simhash16
# stays in TRAINING_EXTRA_OPS). Empty docs get simhash 0 (all bit-majorities
# are ties) rather than being dropped.
def doc_signatures(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    d = d.withColumn(
        "hs",
        F.expr("transform(arr, t -> cast(conv(substring(md5(t), 1, 8), 16, 10) as bigint))"),
    )
    sim = None
    for i in range(16):
        cnt = F.expr(f"size(filter(hs, h -> ((shiftright(h, {i}) & 1)) = 1))")
        bit = F.when(2 * cnt - F.size("arr") > 0, F.lit(1 << i)).otherwise(F.lit(0))
        sim = bit if sim is None else sim + bit
    return d.select(
        "doc_id",
        sim.cast("long").alias("simhash"),
        F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct("arr")))).alias("fp"),
    )


_SIG_BITS_SQL = " + ".join(
    f"(CASE WHEN 2 * len(list_filter(hs, h -> ((h >> {i}) & 1) = 1)) - len(arr) > 0"
    f" THEN {1 << i} ELSE 0 END)"
    for i in range(16)
)
DOC_SIGNATURES_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
h AS (SELECT doc_id, arr,
             list_transform(arr, x -> (('0x' || substr(md5(x), 1, 8)))::BIGINT) AS hs
      FROM t)
SELECT doc_id,
       CAST({_SIG_BITS_SQL} AS BIGINT) AS simhash,
       md5(array_to_string(list_sort(list_distinct(arr)), ' ')) AS fp
FROM h
"""


# PII scrubbing — a first-class training-data hygiene pass (emails / URLs /
# IPv4 redaction + per-doc counts). The driver corpus is PII-free, so the op
# injects deterministic doc_id-derived PII into the text IN BOTH ENGINES and
# scrubs it — the redaction machinery (three global regexp_replace passes,
# counts from regexp_extract_all) is what's under test, and the md5 of the
# redacted text must agree byte-for-byte cross-engine. Pure Catalyst: one
# scan, WholeStageCodegen, no shuffles — at 100 TB this runs at IO speed.
_PII_EMAIL = "[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}"
_PII_URL = "https?://[^ ]+"
_PII_IP = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"


def pii_scrub(spark, sf_dir):
    d = _docs(spark, sf_dir)
    injected = F.concat(
        F.col("text"),
        F.lit(" reach user"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com or http://host"),
        F.col("doc_id").cast("string"),
        F.lit(".io/path via 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit(".7 end"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(injected, _PII_EMAIL, "<EMAIL>"),
            _PII_URL,
            "<URL>",
        ),
        _PII_IP,
        "<IP>",
    )
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(injected, F.lit(_PII_EMAIL), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(injected, F.lit(_PII_URL), 0))
        .cast("long")
        .alias("n_urls"),
        F.size(F.regexp_extract_all(injected, F.lit(_PII_IP), 0))
        .cast("long")
        .alias("n_ips"),
        F.md5(redacted).alias("redacted_md5"),
    )


PII_SCRUB_SQL = f"""
WITH inj AS (
  SELECT doc_id,
         text || ' reach user' || CAST(doc_id AS VARCHAR) ||
         '@example.com or http://host' || CAST(doc_id AS VARCHAR) ||
         '.io/path via 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7 end'
           AS s
  FROM documents
)
SELECT doc_id,
       CAST(len(regexp_extract_all(s, '{_PII_EMAIL}')) AS BIGINT) AS n_emails,
       CAST(len(regexp_extract_all(s, '{_PII_URL}')) AS BIGINT) AS n_urls,
       CAST(len(regexp_extract_all(s, '{_PII_IP}')) AS BIGINT) AS n_ips,
       md5(regexp_replace(regexp_replace(regexp_replace(s,
           '{_PII_EMAIL}', '<EMAIL>', 'g'),
           '{_PII_URL}', '<URL>', 'g'),
           '{_PII_IP}', '<IP>', 'g')) AS redacted_md5
FROM inj
"""


# Canonical-document selection over near-dup clusters — the pipeline stage
# AFTER dedup_clusters: per transitive cluster keep the best doc (quality
# desc, doc_id asc tie-break) and report cluster size. Quality is the same
# deterministic expression as text_metrics, so the window tie-break agrees
# bit-for-bit across engines. One join + one partitioned window over
# cluster-member rows only (clusters ≪ corpus).
def dedup_canonical(spark, sf_dir):
    from pyspark.sql.window import Window

    clusters = connected_components(minhash_lsh_pairs(spark, sf_dir))
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    stop_arr = ", ".join(f"'{w}'" for w in _STOP10)
    n_stop = F.expr(f"size(filter(arr, x -> x IN ({stop_arr})))")
    n_tok = F.size("arr")
    quality = F.when(n_tok == 0, F.lit(0.0)).otherwise(
        F.least(n_tok / F.lit(60.0), F.lit(1.0)) * (1 - n_stop / n_tok)
    )
    q = d.select("doc_id", quality.alias("quality"))
    j = clusters.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    cw = Window.partitionBy("cluster_id")
    return (
        j.withColumn("rk", F.row_number().over(w))
        .withColumn("n_members", F.count("*").over(cw))
        .filter(F.col("rk") == 1)
        .select(
            "cluster_id",
            F.col("doc_id").alias("keep_doc_id"),
            F.round("quality", 4).alias("keep_quality"),
            F.col("n_members").cast("long").alias("n_members"),
        )
    )


DEDUP_CANONICAL_SQL = (
    DEDUP_CLUSTERS_SQL.replace(
        "SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node",
        """, clus AS (
  SELECT node AS doc_id, min(root) AS cluster_id FROM reach GROUP BY node
),
tok AS (SELECT doc_id, {tok} AS arr FROM documents),
q AS (
  SELECT doc_id,
         CASE WHEN len(arr) = 0 THEN 0.0
              ELSE least(len(arr) / 60.0, 1.0) *
                   (1 - len(list_filter(arr, x -> x IN ({stops}))) * 1.0 / len(arr))
         END AS quality
  FROM tok
),
r AS (
  SELECT clus.cluster_id, clus.doc_id, q.quality,
         row_number() OVER (PARTITION BY clus.cluster_id
                            ORDER BY q.quality DESC, clus.doc_id ASC) AS rk,
         count(*) OVER (PARTITION BY clus.cluster_id) AS n_members
  FROM clus JOIN q USING (doc_id)
)
SELECT cluster_id, doc_id AS keep_doc_id, round(quality, 4) AS keep_quality,
       n_members
FROM r WHERE rk = 1""",
    )
).format(tok=_TOK_EXPR, stops=", ".join(f"'{w}'" for w in _STOP10))


# Rule-based quality gate (the Gopher/CCNet-style heuristic filter a
# training pipeline runs before tokenization): first failing rule names the
# drop reason. One scan, pure Catalyst; every threshold is derived from
# integer counts so both engines agree exactly.
def quality_filter(spark, sf_dir):
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    stop_arr = ", ".join(f"'{w}'" for w in _STOP10)
    n_stop = F.expr(f"size(filter(arr, x -> x IN ({stop_arr})))")
    n_tok = F.size("arr")
    n_char = F.expr("aggregate(arr, 0, (acc, x) -> acc + length(x))")
    n_digit = F.length(F.regexp_replace(F.col("text"), "[^0-9]", ""))
    reason = (
        F.when(n_tok < 5, F.lit("too_short"))
        .when(n_digit * 10 > n_char * 3, F.lit("too_numeric"))
        .when(n_stop * 100 < n_tok, F.lit("no_stopwords"))
        .when(n_char > n_tok * 12, F.lit("gibberish"))
        .otherwise(F.lit("ok"))
    )
    return d.select(
        "doc_id",
        reason.alias("reason"),
        (reason == "ok").alias("keep"),
    )


QUALITY_FILTER_SQL = f"""
WITH t AS (SELECT doc_id, text, {_TOK_EXPR} AS arr FROM documents),
c AS (
  SELECT doc_id,
         len(arr) AS n_tok,
         len(list_filter(arr, x -> x IN ({", ".join(f"'{w}'" for w in _STOP10)}))) AS n_stop,
         coalesce(list_sum([len(x) for x in arr]), 0) AS n_char,
         len(regexp_replace(text, '[^0-9]', '', 'g')) AS n_digit
  FROM t
),
r AS (
  SELECT doc_id,
         CASE WHEN n_tok < 5 THEN 'too_short'
              WHEN n_digit * 10 > n_char * 3 THEN 'too_numeric'
              WHEN n_stop * 100 < n_tok THEN 'no_stopwords'
              WHEN n_char > n_tok * 12 THEN 'gibberish'
              ELSE 'ok' END AS reason
  FROM c
)
SELECT doc_id, reason, reason = 'ok' AS keep FROM r
"""


TRAINING_OPS: dict[str, tuple] = {
    "mlt_shared_terms": (mlt_shared_terms, MLT_SQL),
    "knn_classify": (knn_classify, KNN_CLASSIFY_SQL),
    "emb_ivf_trained": (emb_ivf_trained, EMB_IVF_TRAINED_SQL),
    "dedup_exact": (dedup_exact, DEDUP_EXACT_SQL),
    "minhash_lsh_pairs": (minhash_lsh_pairs, MINHASH_LSH_SQL),
    "ngram_jaccard": (ngram_jaccard, NGRAM_JACCARD_SQL),
    "dedup_clusters": (dedup_clusters, DEDUP_CLUSTERS_SQL),
    "classify_docs": (classify_docs, CLASSIFY_SQL),
    "text_metrics": (text_metrics, TEXT_METRICS_SQL),
    "doc_signatures": (doc_signatures, DOC_SIGNATURES_SQL),
}

# Solr features() / FeaturesSelectionStream (reference solr/solrj/src/java/
# org/apache/solr/client/solrj/io/stream/FeaturesSelectionStream.java:63,
# shard side solr/core/src/java/org/apache/solr/search/
# IGainTermsQParserPlugin.java:156-182): select the numTerms most
# class-informative terms by information gain against a binary outcome —
# score = H(P/N) − (df/N)·H(xc/df) − (1 − df/N)·H((P − xc)/(N − df + 1)),
# natural-log binary entropy, including the reference's ``+1`` quirk in the
# not-containing branch. Everything derives from integer doc counts (one
# explode + two aggs, map-side combinable; the outcome join broadcasts), so
# the f64 scores are bit-identical cross-engine. Outcome: lang = 'en'.
_IGAIN_TOP = 12


def features_igain_docs(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("lang") == "en").cast("int").alias("y"),
        F.array_distinct(F.expr(_TOK_EXPR)).alias("toks"),
    )
    n_docs = d.count()
    n_pos = d.filter("y = 1").count()
    doc_term = d.select("doc_id", "y", F.explode("toks").alias("term"))
    counts = doc_term.groupBy("term").agg(
        F.count("*").alias("df"), F.sum("y").alias("xc")
    )

    def H(p):
        return F.when(
            (p <= 0) | (p >= 1), F.lit(0.0)
        ).otherwise(-p * F.log(p) - (1.0 - p) * F.log(1.0 - p))

    pc = float(n_pos) / float(n_docs)
    entropy_c = 0.0 if pc in (0.0, 1.0) else (-pc * math.log(pc) - (1 - pc) * math.log(1 - pc))
    df = F.col("df").cast("double")
    xc = F.col("xc").cast("double")
    score = (
        F.lit(entropy_c)
        - (df / F.lit(float(n_docs))) * H(xc / df)
        - (1.0 - df / F.lit(float(n_docs)))
        * H((F.lit(float(n_pos)) - xc) / (F.lit(float(n_docs)) - df + 1.0))
    )
    out = counts.select(
        "term",
        F.col("df").cast("long").alias("doc_freq"),
        F.round(score, 4).alias("score"),
    )
    # TakeOrdered (never a global window); term-asc tie-break keeps the
    # truncation deterministic across engines
    return out.orderBy(F.col("score").desc(), F.col("term").asc()).limit(_IGAIN_TOP)


FEATURES_IGAIN_SQL = f"""
WITH d AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         list_distinct(regexp_extract_all(lower(text), '[a-z0-9]+')) AS toks
  FROM documents
),
tot AS (SELECT count(*) AS n, sum(y) AS p FROM d),
dt AS (SELECT doc_id, y, unnest(toks) AS term FROM d),
counts AS (SELECT term, count(*) AS df, sum(y) AS xc FROM dt GROUP BY term),
scored AS (
  SELECT term, df,
    (CASE WHEN CAST(p AS DOUBLE) / n <= 0 OR CAST(p AS DOUBLE) / n >= 1 THEN 0.0
          ELSE -(CAST(p AS DOUBLE) / n) * ln(CAST(p AS DOUBLE) / n)
               - (1.0 - CAST(p AS DOUBLE) / n) * ln(1.0 - CAST(p AS DOUBLE) / n) END)
    - (CAST(df AS DOUBLE) / n) *
      (CASE WHEN CAST(xc AS DOUBLE) / CAST(df AS DOUBLE) <= 0
              OR CAST(xc AS DOUBLE) / CAST(df AS DOUBLE) >= 1 THEN 0.0
            ELSE -(CAST(xc AS DOUBLE) / CAST(df AS DOUBLE)) * ln(CAST(xc AS DOUBLE) / CAST(df AS DOUBLE))
                 - (1.0 - CAST(xc AS DOUBLE) / CAST(df AS DOUBLE)) * ln(1.0 - CAST(xc AS DOUBLE) / CAST(df AS DOUBLE)) END)
    - (1.0 - CAST(df AS DOUBLE) / n) *
      (CASE WHEN (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0) <= 0
              OR (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0) >= 1 THEN 0.0
            ELSE -((CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0)) * ln((CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0))
                 - (1.0 - (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0)) * ln(1.0 - (CAST(p AS DOUBLE) - xc) / (CAST(n AS DOUBLE) - df + 1.0)) END)
    AS raw
  FROM counts, tot
)
SELECT term, CAST(df AS BIGINT) AS doc_freq, round(raw, 4) AS score
FROM scored
ORDER BY round(raw, 4) DESC, term ASC
LIMIT {_IGAIN_TOP}
"""


# Solr train() / TextLogitStream (reference solr/solrj/src/java/org/apache/
# solr/client/solrj/io/stream/TextLogitStream.java:60, shard side solr/core/
# src/java/org/apache/solr/search/TextLogisticRegressionQParserPlugin.java:
# 188-210): logistic regression over tf-idf text features — vector[0] = 1
# (intercept), vector[t] = idf_t · (1 + ln(tf)) — iterated with learning
# rate alpha, weights initialised to 1.0. The reference updates weights
# per-document IN SCAN ORDER inside each shard (order-dependent SGD);
# deterministic deviation here (same spirit as classify_docs): full-batch
# gradient descent, gradient components rounded to 6 dp each iteration so
# both engines stay in bit-identical lockstep. Per iteration the corpus
# contributes one scan + one |features|-row agg; the weight vector is
# driver-side model state (9 floats), broadcast back — the TextLogitStream
# shard/reduce shape.
_LOGIT_FEATURES = 8
_LOGIT_ITERS = 3
_LOGIT_ALPHA = 0.5


def _logit_setup_sql() -> str:
    """Shared DuckDB CTEs: feature terms (top df, term-asc tie-break),
    idf, per-doc tf-idf vectors, outcomes."""
    return f"""
WITH d AS (
  SELECT doc_id, CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS toks
  FROM documents
),
tot AS (SELECT count(*) AS n FROM d),
dt AS (SELECT doc_id, unnest(toks) AS term FROM d),
tf AS (SELECT doc_id, term, count(*) AS tf FROM dt GROUP BY doc_id, term),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
feats AS (
  SELECT term, ln((CAST(n AS DOUBLE) + 1.0) / (df + 1.0)) AS idf
  FROM dfreq, tot ORDER BY df DESC, term ASC LIMIT {_LOGIT_FEATURES}
),
x AS (
  SELECT tf.doc_id, tf.term, f.idf * (1.0 + ln(tf.tf)) AS xv
  FROM tf JOIN feats f USING (term)
),
y AS (SELECT doc_id, CAST(y AS DOUBLE) AS y FROM d)
"""


def _logit_iter_sql(k: int) -> str:
    """One batch-GD iteration as chained CTEs: weights w{k} -> w{k+1}."""
    return f"""
, dot{k} AS (
  SELECT y.doc_id, y.y,
         (SELECT w FROM w{k} WHERE term = '(intercept)')
         + coalesce(sum(x.xv * w.w), 0.0) AS z
  FROM y LEFT JOIN x ON y.doc_id = x.doc_id
  LEFT JOIN w{k} w ON x.term = w.term
  GROUP BY y.doc_id, y.y
),
err{k} AS (SELECT doc_id, 1.0 / (1.0 + exp(-z)) - y AS e FROM dot{k}),
g{k} AS (
  SELECT x.term, round(sum(e.e * x.xv) / (SELECT n FROM tot), 6) AS g
  FROM err{k} e JOIN x ON e.doc_id = x.doc_id GROUP BY x.term
  UNION ALL
  SELECT '(intercept)', round(sum(e) / (SELECT n FROM tot), 6) FROM err{k}
),
w{k + 1} AS (
  SELECT w.term, w.w - {_LOGIT_ALPHA} * g.g AS w
  FROM w{k} w JOIN g{k} g USING (term)
)
"""


def train_logit_docs(spark, sf_dir):
    d = _docs(spark, sf_dir).select(
        "doc_id",
        (F.col("lang") == "en").cast("double").alias("y"),
        F.expr(_TOK_EXPR).alias("toks"),
    )
    n_docs = d.count()
    tf = (
        d.select("doc_id", F.explode("toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    feats = {
        r["term"]: math.log((n_docs + 1.0) / (r["df"] + 1.0))
        for r in dfreq.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(_LOGIT_FEATURES)
        .collect()
    }
    idf_map = F.create_map(
        *[F.lit(v) for kv in feats.items() for v in kv]
    )
    x = tf.filter(F.col("term").isin(list(feats))).select(
        "doc_id",
        "term",
        (idf_map[F.col("term")] * (1.0 + F.log(F.col("tf").cast("double")))).alias("xv"),
    ).cache()
    y = d.select("doc_id", "y")
    weights = {t: 1.0 for t in feats}
    w_int = 1.0
    for _ in range(_LOGIT_ITERS):
        w_map = F.create_map(*[F.lit(v) for kv in weights.items() for v in kv])
        dot = (
            y.join(x, "doc_id", "left")
            .groupBy("doc_id", "y")
            .agg(
                (
                    F.lit(w_int)
                    + F.coalesce(F.sum(F.col("xv") * w_map[F.col("term")]), F.lit(0.0))
                ).alias("z")
            )
        )
        err = dot.select(
            "doc_id", (1.0 / (1.0 + F.exp(-F.col("z"))) - F.col("y")).alias("e")
        )
        g_rows = (
            err.join(x, "doc_id")
            .groupBy("term")
            .agg(F.round(F.sum(F.col("e") * F.col("xv")) / n_docs, 6).alias("g"))
            .collect()
        )
        g_int = err.agg(
            F.round(F.sum("e") / n_docs, 6).alias("g")
        ).collect()[0]["g"]
        for r in g_rows:
            weights[r["term"]] -= _LOGIT_ALPHA * r["g"]
        w_int -= _LOGIT_ALPHA * g_int
    x.unpersist()
    rows = [("(intercept)", round(w_int, 4))] + [
        (t, round(w, 4)) for t, w in sorted(weights.items())
    ]
    return spark.createDataFrame(rows, "feature string, weight double")


TRAIN_LOGIT_SQL = (
    _logit_setup_sql()
    + ", w0 AS (SELECT term, 1.0 AS w FROM feats UNION ALL SELECT '(intercept)', 1.0)"
    + "".join(_logit_iter_sql(k) for k in range(_LOGIT_ITERS))
    + f"""
SELECT term AS feature, round(w, 4) AS weight FROM w{_LOGIT_ITERS}
"""
)


# Solr ClusteringComponent (reference solr/contrib/clustering/src/java/org/
# apache/solr/handler/clustering/ClusteringComponent.java:63 +
# SearchClusteringEngine.java): cluster the RESULT SET of a search into
# topic groups with term labels (the Carrot2 integration). The Carrot2
# algorithms (Lingo/STC) are order-dependent native libraries; the
# deterministic stand-in keeps the component's contract — top-k result docs
# → tf-idf vectors → k clusters, each labeled by its centroid's top terms —
# via Lloyd k-means with id-ordered seeds, 2 iterations, and 6-dp rounding
# of centroids/distances so both engines assign identically (the
# round-before-argmax pattern). Distances expand as |x|²+|c|²−2⟨x,c⟩ over a
# sparse (doc, term) join — never a dense doc×cluster×term blowup; at 100 TB
# the result set is top-k bounded, so the whole op is k-bounded.
_CLUSTER_K = 3
_CLUSTER_ITERS = 2
_CLUSTER_FEATURES = 16


def _cluster_setup_sql() -> str:
    return f"""
WITH hits AS (
  SELECT doc_id, lower(text) AS text FROM documents
  WHERE lower(text) LIKE '%table%'
),
tot AS (SELECT count(*) AS n FROM hits),
tf AS (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term
    FROM hits
  ) GROUP BY doc_id, term
),
dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
feats AS (
  SELECT term, ln((CAST(n AS DOUBLE) + 1.0) / (df + 1.0)) AS idf
  FROM dfreq, tot ORDER BY df DESC, term ASC LIMIT {_CLUSTER_FEATURES}
),
x AS (
  SELECT tf.doc_id, tf.term,
         round(f.idf * (1.0 + ln(tf.tf)), 6) AS xv
  FROM tf JOIN feats f USING (term)
),
xn AS (SELECT doc_id, sum(xv * xv) AS x2 FROM x GROUP BY doc_id),
seeds AS (
  SELECT doc_id, row_number() OVER (ORDER BY doc_id ASC) - 1 AS cluster
  FROM (SELECT DISTINCT doc_id FROM x ORDER BY doc_id ASC LIMIT {_CLUSTER_K})
),
c0 AS (
  SELECT s.cluster, x.term, x.xv AS cv FROM seeds s JOIN x USING (doc_id)
)
"""


def _cluster_iter_sql(k: int) -> str:
    """One Lloyd iteration: assign to nearest centroid c{k}, recompute
    c{k+1} (6-dp rounding on distances and centroids, ties to the lowest
    cluster id / the doc's own id order)."""
    return f"""
, cn{k} AS (SELECT cluster, sum(cv * cv) AS c2 FROM c{k} GROUP BY cluster),
dots{k} AS (
  SELECT x.doc_id, c.cluster, sum(x.xv * c.cv) AS dot
  FROM x JOIN c{k} c USING (term) GROUP BY x.doc_id, c.cluster
),
dist{k} AS (
  SELECT xn.doc_id, cn.cluster,
         round(xn.x2 + cn.c2 - 2.0 * coalesce(d.dot, 0.0), 6) AS dist
  FROM xn CROSS JOIN cn{k} cn
  LEFT JOIN dots{k} d ON d.doc_id = xn.doc_id AND d.cluster = cn.cluster
),
assign{k} AS (
  SELECT doc_id, cluster FROM (
    SELECT doc_id, cluster,
           row_number() OVER (PARTITION BY doc_id ORDER BY dist ASC, cluster ASC) AS rk
    FROM dist{k}
  ) WHERE rk = 1
),
size{k} AS (SELECT cluster, count(*) AS n_k FROM assign{k} GROUP BY cluster),
c{k + 1} AS (
  SELECT a.cluster, x.term, round(sum(x.xv) / any_value(s.n_k), 6) AS cv
  FROM assign{k} a JOIN x USING (doc_id) JOIN size{k} s ON a.cluster = s.cluster
  GROUP BY a.cluster, x.term
)
"""


def cluster_results_docs(spark, sf_dir):
    """ClusteringComponent role: k-means over the 'table' result set; output
    = (doc_id, cluster, label) with label = the final centroid's top-3
    terms (weight desc, term asc), '|'-joined."""
    from pyspark.sql import Window

    hits = (
        _docs(spark, sf_dir)
        .filter(F.lower(F.col("text")).contains("table"))
        .select("doc_id", F.lower(F.col("text")).alias("text"))
    )
    n = hits.count()
    tf = (
        hits.select(
            "doc_id",
            F.explode(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    feats = {
        r["term"]: math.log((n + 1.0) / (r["df"] + 1.0))
        for r in dfreq.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(_CLUSTER_FEATURES)
        .collect()
    }
    idf_map = F.create_map(*[F.lit(v) for kv in feats.items() for v in kv])
    x = tf.filter(F.col("term").isin(list(feats))).select(
        "doc_id",
        "term",
        F.round(
            idf_map[F.col("term")] * (1.0 + F.log(F.col("tf").cast("double"))), 6
        ).alias("xv"),
    ).cache()
    xn = x.groupBy("doc_id").agg(F.sum(F.col("xv") * F.col("xv")).alias("x2"))
    seed_ids = [
        r["doc_id"]
        for r in x.select("doc_id").distinct().orderBy("doc_id").limit(_CLUSTER_K).collect()
    ]
    # centroids as driver model state: K × features floats (ann.py pattern);
    # ONE isin-filtered collect gathers every seed vector in a single job
    seed_pos = {d: k for k, d in enumerate(seed_ids)}
    cent: dict[int, dict[str, float]] = {k: {} for k in range(_CLUSTER_K)}
    for r in x.filter(F.col("doc_id").isin(seed_ids)).collect():
        cent[seed_pos[r["doc_id"]]][r["term"]] = r["xv"]
    assign = None
    for _ in range(_CLUSTER_ITERS):
        # an emptied cluster disappears (its centroid has no rows) — the
        # oracle's c{k+1} CTE has the same semantics; keeping a phantom
        # zero centroid would diverge the next assignment round
        cent = {k: tv for k, tv in cent.items() if tv}
        cent_rows = [
            (k, t, v) for k, tv in cent.items() for t, v in tv.items()
        ]
        c = spark.createDataFrame(cent_rows, "cluster int, term string, cv double")
        cn = {k: sum(v * v for v in tv.values()) for k, tv in cent.items()}
        cn_df = spark.createDataFrame(
            [(k, v) for k, v in cn.items()], "cluster int, c2 double"
        )
        dots = (
            x.join(F.broadcast(c), "term")
            .groupBy("doc_id", "cluster")
            .agg(F.sum(F.col("xv") * F.col("cv")).alias("dot"))
        )
        dist = (
            xn.crossJoin(F.broadcast(cn_df))
            .join(dots, ["doc_id", "cluster"], "left")
            .select(
                "doc_id",
                "cluster",
                F.round(
                    F.col("x2") + F.col("c2") - 2.0 * F.coalesce("dot", F.lit(0.0)), 6
                ).alias("dist"),
            )
        )
        w = Window.partitionBy("doc_id").orderBy(F.col("dist").asc(), F.col("cluster").asc())
        prev_assign = assign
        assign = (
            dist.withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") == 1)
            .select("doc_id", "cluster")
        ).cache()
        sizes = {r["cluster"]: r["n_k"] for r in assign.groupBy("cluster").agg(F.count("*").alias("n_k")).collect()}
        if prev_assign is not None:
            prev_assign.unpersist()
        sums = (
            assign.join(x, "doc_id")
            .groupBy("cluster", "term")
            .agg(F.sum("xv").alias("s"))
            .collect()
        )
        cent = {k: {} for k in sizes}
        for r in sums:
            cent[r["cluster"]][r["term"]] = round(r["s"] / sizes[r["cluster"]], 6)
    # labels: top-3 centroid terms per cluster
    labels = {
        k: "|".join(
            t for t, _ in sorted(tv.items(), key=lambda kv: (-kv[1], kv[0]))[:3]
        )
        for k, tv in cent.items()
    }
    label_map = F.create_map(*[F.lit(v) for kv in labels.items() for v in kv])
    out = assign.select(
        "doc_id",
        F.col("cluster").cast("long").alias("cluster"),
        label_map[F.col("cluster")].alias("label"),
    )
    x.unpersist()
    return out


CLUSTER_RESULTS_SQL = (
    _cluster_setup_sql()
    + "".join(_cluster_iter_sql(k) for k in range(_CLUSTER_ITERS))
    + f"""
, lab AS (
  SELECT cluster, string_agg(term, '|' ORDER BY cv DESC, term ASC) AS label
  FROM (
    SELECT cluster, term, cv,
           row_number() OVER (PARTITION BY cluster ORDER BY cv DESC, term ASC) AS rk
    FROM c{_CLUSTER_ITERS}
  ) WHERE rk <= 3 GROUP BY cluster
)
SELECT a.doc_id, CAST(a.cluster AS BIGINT) AS cluster, lab.label
FROM assign{_CLUSTER_ITERS - 1} a JOIN lab ON a.cluster = lab.cluster
"""
)


# ---------------------------------------------------------------------------
# Lingo (Carrot2 ``CarrotClusteringEngine.java`` dispatching the Lingo
# algorithm — Osiński & Weiss, "Lingo: Search Results Clustering Algorithm
# Based on Singular Value Decomposition"): labels FIRST via SVD. The
# term-document tf-idf matrix's leading left singular vectors are abstract
# concepts; each concept picks the best-matching label from phrase/term
# candidates (cosine in term space); documents assign to the concept they
# score highest on. The reference's SVD is an iterative numeric routine —
# re-expressed here as DETERMINISTIC fixed-iteration power iteration with
# deflation on B = A·Aᵀ (the Gram matrix in term space), in 6-dp
# cross-engine lockstep exactly like the k-means/logit/GD ops: B is
# rounded, every normalized iterate is rounded, the deflated matrix is
# rounded — so DuckDB's unrolled-CTE twin reproduces the engine's floats.
#
# Scale shape: the RESULT SET is the contract input (Carrot2 clusters the
# returned snippets, not the corpus). x/B build distributed (two
# map-side-combinable shuffles); B is F×F ≤ 144 rows of driver model
# state (the ann.py centroid precedent); doc scoring re-distributes via a
# broadcast of the K concept vectors.

_LINGO_K = 3
_LINGO_ITERS = 6
_LINGO_FEATURES = 12
_LINGO_FILTER = "stream"


def _lingo_setup_sql() -> str:
    return f"""
WITH hits AS MATERIALIZED (
  SELECT doc_id, lower(text) AS text FROM documents
  WHERE lower(text) LIKE '%{_LINGO_FILTER}%'
),
tot AS MATERIALIZED (SELECT count(*) AS n FROM hits),
tf AS MATERIALIZED (
  SELECT doc_id, term, count(*) AS tf FROM (
    SELECT doc_id, unnest(regexp_extract_all(text, '[a-z0-9]+')) AS term
    FROM hits
  ) GROUP BY doc_id, term
),
dfreq AS MATERIALIZED (SELECT term, count(*) AS df FROM tf GROUP BY term),
feats AS MATERIALIZED (
  SELECT term, ln((CAST(n AS DOUBLE) + 1.0) / (df + 1.0)) AS idf
  FROM dfreq, tot ORDER BY df DESC, term ASC LIMIT {_LINGO_FEATURES}
),
x AS MATERIALIZED (
  SELECT tf.doc_id, tf.term,
         round(f.idf * (1.0 + ln(tf.tf)), 6) AS xv
  FROM tf JOIN feats f USING (term)
),
b0 AS MATERIALIZED (
  SELECT a.term AS ti, b.term AS tj, round(sum(a.xv * b.xv), 6) AS bv
  FROM x a JOIN x b USING (doc_id) GROUP BY a.term, b.term
),
v0_init AS MATERIALIZED (SELECT DISTINCT term, 1.0 AS v FROM x)
"""


def _lingo_concept_sql(c: int) -> str:
    """Power iteration c over b{c} (fixed {_LINGO_ITERS} iterations from
    the uniform init), then eigenvalue + deflation to b{c+1}."""
    out = []
    prev = "v0_init"
    for t in range(_LINGO_ITERS):
        out.append(f"""
, w{c}_{t} AS MATERIALIZED (
  SELECT b.ti AS term, sum(b.bv * v.v) AS wv
  FROM b{c} b JOIN {prev} v ON b.tj = v.term GROUP BY b.ti
),
n{c}_{t} AS MATERIALIZED (SELECT sqrt(sum(wv * wv)) AS nrm FROM w{c}_{t}),
v{c}_{t} AS MATERIALIZED (
  SELECT term, CASE WHEN nrm = 0 THEN 0.0 ELSE round(wv / nrm, 6) END AS v
  FROM w{c}_{t}, n{c}_{t}
)""")
        prev = f"v{c}_{t}"
    out.append(f"""
, u{c} AS MATERIALIZED (SELECT term, v FROM {prev})
, lam{c} AS MATERIALIZED (
  SELECT round(sum(b.bv * u1.v * u2.v), 6) AS lam
  FROM b{c} b JOIN u{c} u1 ON b.ti = u1.term JOIN u{c} u2 ON b.tj = u2.term
)
, b{c + 1} AS MATERIALIZED (
  SELECT b.ti, b.tj, round(b.bv - lam.lam * u1.v * u2.v, 6) AS bv
  FROM b{c} b JOIN u{c} u1 ON b.ti = u1.term JOIN u{c} u2 ON b.tj = u2.term,
       lam{c} lam
)""")
    return "".join(out)


def _lingo_tail_sql() -> str:
    """Label matching + doc assignment (the Lingo phases after the SVD).
    Candidates: single feature terms (one-hot, cosine = |u[t]|) and
    adjacent feature-term bigrams with df ≥ 2, t1 ≠ t2 (two-hot, cosine =
    |u[t1]+u[t2]|/√2). Each concept takes its best candidate GREEDILY with
    cross-concept dedupe (concept order; ties label-asc) — the reference
    prunes duplicate labels the same way. Documents then assign to the
    LABEL they score highest on (cluster-assignment phase: cosine of the
    doc's tf-idf vector with the label's term vector — the per-doc norm is
    constant across labels, so the unnormalized weighted sum decides the
    argmax; ties cluster-asc). Docs matching no label term fall out — the
    reference's "Other Topics" bin, documented."""
    unions = []
    for c in range(_LINGO_K):
        unions.append(f"""
  SELECT {c} AS cluster, term AS label, round(abs(v), 6) AS cscore
  FROM u{c}
  UNION ALL
  SELECT {c}, bg.t1 || ' ' || bg.t2,
         round(abs(u1.v + u2.v) / sqrt(2.0), 6)
  FROM big bg JOIN u{c} u1 ON bg.t1 = u1.term JOIN u{c} u2 ON bg.t2 = u2.term
""")
        unions.append("  UNION ALL" if c < _LINGO_K - 1 else "")
    labs = []
    for c in range(_LINGO_K):
        taken = " UNION ".join(f"SELECT label FROM lab{j}" for j in range(c))
        notin = f" AND label NOT IN ({taken})" if c else ""
        labs.append(
            f", lab{c} AS MATERIALIZED (\n"
            f"  SELECT label FROM cands WHERE cluster = {c}{notin}\n"
            f"  ORDER BY cscore DESC, label ASC LIMIT 1)\n"
        )
    labs_union = " UNION ALL ".join(
        f"SELECT {c} AS cluster, label FROM lab{c}" for c in range(_LINGO_K)
    )
    return f"""
, tokp AS MATERIALIZED (
  SELECT doc_id, unnest(arr) AS term, generate_subscripts(arr, 1) AS pos
  FROM (SELECT doc_id, regexp_extract_all(text, '[a-z0-9]+') AS arr FROM hits)
),
big AS MATERIALIZED (
  SELECT a.term AS t1, b.term AS t2, count(DISTINCT a.doc_id) AS bdf
  FROM tokp a JOIN tokp b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1
  WHERE a.term IN (SELECT term FROM feats) AND b.term IN (SELECT term FROM feats)
        AND a.term <> b.term
  GROUP BY a.term, b.term HAVING count(DISTINCT a.doc_id) >= 2
),
cands AS MATERIALIZED ({"".join(unions)})
{"".join(labs)}
, labs AS MATERIALIZED ({labs_union})
, labterms AS MATERIALIZED (
  SELECT cluster, label, unnest(string_split(label, ' ')) AS term,
         1.0 / sqrt(len(string_split(label, ' '))) AS lw
  FROM labs
),
docscore AS MATERIALIZED (
  SELECT x.doc_id, lt.cluster, round(sum(x.xv * lt.lw), 6) AS s
  FROM x JOIN labterms lt USING (term) GROUP BY x.doc_id, lt.cluster
),
assign AS MATERIALIZED (
  SELECT doc_id, cluster FROM (
    SELECT doc_id, cluster,
           row_number() OVER (PARTITION BY doc_id ORDER BY s DESC, cluster ASC) AS rk
    FROM docscore
  ) WHERE rk = 1
)
SELECT a.doc_id, CAST(a.cluster AS BIGINT) AS cluster, l.label
FROM assign a JOIN labs l USING (cluster)
"""


LINGO_SQL = (
    _lingo_setup_sql()
    + "".join(_lingo_concept_sql(c) for c in range(_LINGO_K))
    + _lingo_tail_sql()
)


def lingo_clusters(spark, sf_dir):
    """Lingo over the result set: (doc_id, cluster, label) — SVD concepts
    via deterministic deflated power iteration, labels from term/bigram
    candidates, docs to their best concept."""
    from pyspark.sql import Window

    hits = (
        _docs(spark, sf_dir)
        .filter(F.lower(F.col("text")).contains(_LINGO_FILTER))
        .select("doc_id", F.lower(F.col("text")).alias("text"))
    )
    n = hits.count()
    tf = (
        hits.select(
            "doc_id",
            F.explode(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    feats = {
        r["term"]: math.log((n + 1.0) / (r["df"] + 1.0))
        for r in dfreq.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(_LINGO_FEATURES)
        .collect()
    }
    idf_map = F.create_map(*[F.lit(v) for kv in feats.items() for v in kv])
    x = tf.filter(F.col("term").isin(list(feats))).select(
        "doc_id",
        "term",
        F.round(
            idf_map[F.col("term")] * (1.0 + F.log(F.col("tf").cast("double"))), 6
        ).alias("xv"),
    ).cache()

    # B = A·Aᵀ distributed, then F×F rows of driver model state
    b_rows = (
        x.alias("a")
        .join(x.alias("b"), "doc_id")
        .groupBy(F.col("a.term").alias("ti"), F.col("b.term").alias("tj"))
        .agg(F.round(F.sum(F.col("a.xv") * F.col("b.xv")), 6).alias("bv"))
        .collect()
    )
    terms = sorted({r["ti"] for r in b_rows})
    B = {(r["ti"], r["tj"]): r["bv"] for r in b_rows}

    # deflated power iteration — plain Python floats in sorted-term order,
    # 6-dp rounding at every step (the SQL twin's arithmetic)
    concepts: list[dict[str, float]] = []
    for _c in range(_LINGO_K):
        v = {t: 1.0 for t in terms}
        for _t in range(_LINGO_ITERS):
            w = {
                ti: sum(B.get((ti, tj), 0.0) * v[tj] for tj in terms)
                for ti in terms
            }
            nrm = math.sqrt(sum(wv * wv for wv in w.values()))
            v = {
                t: (0.0 if nrm == 0 else round(w[t] / nrm, 6)) for t in terms
            }
        lam = round(
            sum(
                B.get((ti, tj), 0.0) * v[ti] * v[tj]
                for ti in terms
                for tj in terms
            ),
            6,
        )
        B = {
            (ti, tj): round(B.get((ti, tj), 0.0) - lam * v[ti] * v[tj], 6)
            for ti in terms
            for tj in terms
        }
        concepts.append(v)

    # label candidates: single terms + adjacent feature-bigrams (df ≥ 2)
    tokp = hits.select(
        "doc_id",
        F.posexplode(F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")).alias(
            "pos", "term"
        ),
    )
    a, bb = tokp.alias("a"), tokp.alias("b")
    big = (
        a.join(
            bb,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("b.pos") == F.col("a.pos") + 1),
        )
        .filter(
            F.col("a.term").isin(terms)
            & F.col("b.term").isin(terms)
            # a repeated-word "phrase" is a degenerate label whose two-hot
            # cosine (√2·|u[t]|) would always beat the single term
            & (F.col("a.term") != F.col("b.term"))
        )
        .groupBy(F.col("a.term").alias("t1"), F.col("b.term").alias("t2"))
        .agg(F.countDistinct(F.col("a.doc_id")).alias("bdf"))
        .filter(F.col("bdf") >= 2)
        .collect()
    )
    # greedy per-concept label pick with cross-concept dedupe — the SQL's
    # lab{c} chain (highest cosine, ties label-asc, earlier concepts win)
    labels: list[tuple[int, str]] = []
    taken: set[str] = set()
    for c, u in enumerate(concepts):
        cands = [(round(abs(u[t]), 6), t) for t in terms]
        for r in big:
            cands.append(
                (
                    round(abs(u[r["t1"]] + u[r["t2"]]) / math.sqrt(2.0), 6),
                    f"{r['t1']} {r['t2']}",
                )
            )
        best = min(
            (cv for cv in cands if cv[1] not in taken),
            key=lambda cv: (-cv[0], cv[1]),
        )
        taken.add(best[1])
        labels.append((c, best[1]))
    lab_df = spark.createDataFrame(labels, "cluster int, label string")

    # cluster-assignment phase: docs go to the LABEL they score highest on
    # (the label's term vector; per-doc norm is constant across labels so
    # the weighted sum decides the argmax). Docs matching no label term
    # fall out — the reference's "Other Topics" bin.
    labterm_rows = []
    for c, lab in labels:
        parts = lab.split(" ")
        lw = 1.0 / math.sqrt(len(parts))
        for t in parts:
            labterm_rows.append((c, t, lw))
    lt_df = spark.createDataFrame(labterm_rows, "cluster int, term string, lw double")
    docscore = (
        x.join(F.broadcast(lt_df), "term")
        .groupBy("doc_id", "cluster")
        .agg(F.round(F.sum(F.col("xv") * F.col("lw")), 6).alias("s"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("s").desc(), F.col("cluster").asc())
    return (
        docscore.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .join(F.broadcast(lab_df), "cluster")
        .select("doc_id", F.col("cluster").cast("bigint").alias("cluster"), "label")
    )


# pytest-gated only: the single-metric ops folded into text_metrics /
# doc_signatures above; emb_knn_threshold is the brute-force ANN baseline
# whose scale path is the gated emb_ivf_probe.
# ---------------------------------------------------------------------------
# SignatureUpdateProcessor — dedup-on-ingest (reference
# ``solr/core/src/java/org/apache/solr/update/processor/
# SignatureUpdateProcessorFactory.java`` with its three Signature impls).
# The factory computes a signature over configured fields and, with
# overwriteDupes, indexes by the signature so later duplicates overwrite —
# the batch analogue keeps ONE row per signature. Three signature kinds:
#
# - md5 (``MD5Signature.java``): md5 over the concatenated field values.
# - text_profile (``TextProfileSignature.java``): the Nutch fuzzy profile —
#   lowercase alnum token runs, length > minTokenLen, frequencies rounded
#   down to QUANT = max(round(maxFreq·quantRate), 2 if maxFreq>1 else 1),
#   sub-QUANT tokens dropped, "tok cnt" lines sorted by cnt desc, md5 of
#   the profile text. Two documented deviations: the token alphabet is
#   [a-z0-9] (Java's isLetterOrDigit is Unicode-wide; this engine's ASCII
#   stance, same both engines), and count ties sort tok-asc (the reference
#   inherits JVM HashMap iteration order — not a spec).
# - lookup3 (``Lookup3Signature.java``): a 64-bit content hash; stand-in =
#   the first 8 md5 bytes (the lookup3ycs64 bit mix is JVM-specific; the
#   ROLE — a short cheap signature — is preserved and cross-engine exact).
#
# Shape at 100 TB: text_profile is explode → (doc, token) groupBy → one
# per-doc agg — two map-side-combinable shuffles, no per-row Python;
# dedup is one partitioned window over the signature.


def text_profile_signatures(
    df,
    content_col: str = "text",
    key_col: str = "doc_id",
    quant_rate: float = 0.01,
    min_token_len: int = 2,
):
    """(key, signature) per row — TextProfileSignature.add() exactly."""
    toks = df.select(
        key_col,
        F.explode(F.split(F.lower(F.col(content_col)), "[^a-z0-9]+")).alias("tok"),
    ).filter(F.length("tok") > min_token_len)
    counts = toks.groupBy(key_col, "tok").agg(F.count("*").alias("cnt"))
    q = counts.groupBy(key_col).agg(F.max("cnt").alias("maxf"))
    rq = F.round(F.col("maxf") * quant_rate)
    q = q.withColumn(
        "quant",
        F.when(
            rq < 2, F.when(F.col("maxf") > 1, F.lit(2)).otherwise(F.lit(1))
        )
        .otherwise(rq)
        .cast("bigint"),
    )
    prof = (
        counts.join(q, key_col)
        .withColumn("cnt2", F.floor(F.col("cnt") / F.col("quant")) * F.col("quant"))
        .filter(F.col("cnt2") >= F.col("quant"))
    )
    txt = prof.groupBy(key_col).agg(
        F.concat_ws(
            "\n",
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            (-F.col("cnt2")).alias("nc"),
                            F.col("tok").alias("tok"),
                            F.col("cnt2").alias("cnt"),
                        )
                    )
                ),
                lambda s: F.concat(s["tok"], F.lit(" "), s["cnt"].cast("string")),
            ),
        ).alias("profile")
    )
    return (
        df.select(key_col)
        .join(txt, key_col, "left")
        .select(
            key_col, F.md5(F.coalesce(F.col("profile"), F.lit(""))).alias("signature")
        )
    )


def md5_signatures(df, fields, key_col: str = "doc_id"):
    """MD5Signature over the configured fields, concatenated in order (the
    factory add()s each value into one digest; null fields skipped)."""
    parts = [F.coalesce(F.col(f).cast("string"), F.lit("")) for f in fields]
    return df.select(key_col, F.md5(F.concat(*parts)).alias("signature"))


def signature_dedup_frame(
    df,
    fields,
    key_col: str = "doc_id",
    signature: str = "text_profile",
    overwrite_dupes: bool = True,
    **kw,
):
    """The update-chain shape: df + a ``signature`` column; with
    overwrite_dupes one row per signature survives (smallest key —
    deterministic where Solr's is arrival order)."""
    if signature == "text_profile":
        sigs = text_profile_signatures(df, fields[0], key_col, **kw)
    elif signature == "md5":
        sigs = md5_signatures(df, fields, key_col)
    elif signature == "lookup3":
        sigs = md5_signatures(df, fields, key_col).withColumn(
            "signature", F.substring("signature", 1, 16)
        )
    else:
        raise ValueError(f"unknown signature kind {signature!r}")
    out = df.join(sigs, key_col)
    if overwrite_dupes:
        from pyspark.sql import Window

        w = Window.partitionBy("signature").orderBy(key_col)
        out = (
            out.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .drop("_rk")
        )
    return out


def signature_dedup(spark, sf_dir):
    """Gated op: TextProfileSignature groups over the documents table —
    (signature, kept = smallest doc_id, dups)."""
    sigs = text_profile_signatures(_docs(spark, sf_dir))
    return sigs.groupBy("signature").agg(
        F.min("doc_id").cast("bigint").alias("kept"),
        (F.count("*") - 1).cast("bigint").alias("dups"),
    )


SIGNATURE_DEDUP_SQL = """
WITH toks AS (
  SELECT doc_id, tok FROM (
    SELECT doc_id, unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+')) AS tok
    FROM documents)
  WHERE length(tok) > 2
), counts AS (
  SELECT doc_id, tok, count(*) AS cnt FROM toks GROUP BY 1, 2
), q AS (
  -- CAST to BIGINT: DuckDB's // does NOT floor when either side is
  -- DECIMAL (7 // 2.0 = 3.5) — integer quant keeps the floor division
  SELECT doc_id,
         CAST(CASE WHEN round(maxf * 0.01) < 2
              THEN CASE WHEN maxf > 1 THEN 2 ELSE 1 END
              ELSE round(maxf * 0.01) END AS BIGINT) AS quant
  FROM (SELECT doc_id, max(cnt) AS maxf FROM counts GROUP BY 1)
), prof AS (
  SELECT c.doc_id, c.tok, (c.cnt // q.quant) * q.quant AS cnt2, q.quant
  FROM counts c JOIN q USING (doc_id)
  WHERE (c.cnt // q.quant) * q.quant >= q.quant
), txt AS (
  SELECT doc_id,
         string_agg(tok || ' ' || CAST(CAST(cnt2 AS BIGINT) AS VARCHAR), chr(10)
                    ORDER BY cnt2 DESC, tok ASC) AS profile
  FROM prof GROUP BY 1
), sigs AS (
  SELECT d.doc_id, md5(coalesce(t.profile, '')) AS signature
  FROM documents d LEFT JOIN txt t USING (doc_id)
)
SELECT signature, CAST(min(doc_id) AS BIGINT) AS kept,
       CAST(count(*) - 1 AS BIGINT) AS dups
FROM sigs GROUP BY 1
"""


# ---------------------------------------------------------------------------
# Carrot2 STC — Suffix Tree Clustering (reference solr/contrib/clustering's
# ClusteringComponent dispatches to the Carrot2 STCClusteringAlgorithm; the
# algorithm itself is Zamir & Etzioni's published STC: frequent phrases →
# base clusters (phrase, covered-doc set) scored |B|·f(|P|) with single
# words penalized, then base clusters MERGE when their doc overlap exceeds
# 50% in BOTH directions, connected components of that merge graph are the
# final clusters, labeled by their best phrase). The engine's earlier
# stand-in was lockstep k-means (`cluster_results_docs`, kept); this is the
# real STC shape, re-expressed Spark-first:
#   - "suffix tree" frequent phrases = 1..3-gram mining over the token
#     arrays (one scan, scan-local slice+zip — the tree is an in-memory
#     device for finding frequent complete phrases; distributed n-gram
#     counting finds the same sets up to the length cap)
#   - base-cluster ranking = one window over phrase rows (top_k bounded)
#   - the >50%-both-ways merge graph = one self-join of the top-k incidence
#     (≤ top_k² candidate edges), components via the same distributed
#     min-label propagation as dedup_clusters — phrase ids are assigned in
#     score order so the component min IS the best-scoring label
# Nothing is collected to the driver; the oracle replays the merge with a
# recursive CTE. Deterministic deviation: Carrot2 caps phrases at the
# suffix-tree depth and trims stop-labels; here the cap is max_phrase_len=3
# and labels keep their raw text.
_STC_F = "CASE WHEN nw = 1 THEN 0.5 ELSE least(nw, 6) END"


def stc_clusters(spark, sf_dir, min_df: int = 3, top_k: int = 15, thr: float = 0.5):
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    grams = []
    for n in (1, 2, 3):
        grams.append(
            d.select(
                "doc_id",
                F.explode(
                    F.expr(
                        f"transform(slice(arr, 1, greatest(size(arr)-{n}+1, 0)), "
                        f"(x, i) -> concat_ws(' ', slice(arr, i+1, {n})))"
                    )
                ).alias("phrase"),
            ).withColumn("nw", F.lit(n))
        )
    pdocs = grams[0].unionByName(grams[1]).unionByName(grams[2]).distinct()
    base = (
        pdocs.groupBy("phrase", "nw")
        .agg(F.count("*").alias("df"))
        .filter(F.col("df") >= min_df)
        .withColumn(
            "score",
            F.col("df")
            * F.when(F.col("nw") == 1, 0.5).otherwise(F.least("nw", F.lit(6))),
        )
    )
    from pyspark.sql import Window

    # distributed top-k FIRST (orderBy+limit = TakeOrderedAndProject — a
    # per-partition heap + tiny driver merge, never a single-partition
    # sort of the full phrase table), THEN rank the ≤ top_k survivors
    # (a global window over top_k rows is free)
    survivors = base.orderBy(F.col("score").desc(), F.col("phrase").asc()).limit(
        top_k
    )
    w = Window.orderBy(F.col("score").desc(), F.col("phrase").asc())
    top = survivors.withColumn("pid", F.row_number().over(w) - 1).select(
        "pid", "phrase", "df", "score"
    )
    inc = pdocs.join(F.broadcast(top.select("pid", "phrase")), "phrase").select(
        "pid", "doc_id"
    )
    common = (
        inc.alias("a")
        .join(inc.alias("b"), "doc_id")
        .filter(F.col("a.pid") < F.col("b.pid"))
        .groupBy(F.col("a.pid").alias("pa"), F.col("b.pid").alias("pb"))
        .agg(F.count("*").alias("common"))
    )
    sizes = top.select("pid", F.col("df").alias("sz"))
    edges = (
        common.join(sizes.select(F.col("pid").alias("pa"), F.col("sz").alias("sa")), "pa")
        .join(sizes.select(F.col("pid").alias("pb"), F.col("sz").alias("sb")), "pb")
        .filter(
            (F.col("common") / F.col("sa") > thr) & (F.col("common") / F.col("sb") > thr)
        )
        .select(F.col("pa").alias("doc_a"), F.col("pb").alias("doc_b"))
    )
    # connected_components drops self-pairs (u == v carries no
    # connectivity), so a base cluster with no >50%-both-ways merge partner
    # would vanish from the output. Re-add isolated pids as their own
    # singleton component via a left join — matches the oracle's recursive
    # CTE, whose reach seeds with `SELECT pid, pid FROM top`.
    cc = connected_components(edges)
    comp = (
        top.select(F.col("pid").alias("doc_id"))
        .join(cc, "doc_id", "left")
        .withColumn("cluster_id", F.coalesce("cluster_id", "doc_id"))
    )
    labeled = comp.join(
        top.select(F.col("pid").alias("cluster_id"), F.col("phrase").alias("label")),
        "cluster_id",
    )
    members = (
        labeled.select(F.col("doc_id").alias("pid"), "cluster_id")
        .join(inc, "pid")
        .select("cluster_id", F.col("doc_id"))
        .distinct()
        .groupBy("cluster_id")
        .agg(F.count("*").alias("n_docs"))
    )
    return (
        labeled.groupBy("cluster_id", "label")
        .agg(F.count("*").alias("n_phrases"))
        .join(members, "cluster_id")
        .select(
            "label",
            F.col("n_phrases").cast("bigint").alias("n_phrases"),
            F.col("n_docs").cast("bigint").alias("n_docs"),
        )
    )


STC_SQL = f"""
WITH RECURSIVE arrs AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
pdocs AS (
  SELECT DISTINCT doc_id, phrase, nw FROM (
    SELECT doc_id, unnest([array_to_string(arr[i:i+0], ' ')
                           for i in generate_series(1, len(arr))]) AS phrase,
           1 AS nw FROM arrs
    UNION ALL
    SELECT doc_id, unnest([array_to_string(arr[i:i+1], ' ')
                           for i in generate_series(1, len(arr)-1)]),
           2 FROM arrs
    UNION ALL
    SELECT doc_id, unnest([array_to_string(arr[i:i+2], ' ')
                           for i in generate_series(1, len(arr)-2)]),
           3 FROM arrs
  )
),
base AS (
  SELECT phrase, nw, count(*) AS df,
         count(*) * ({_STC_F}) AS score
  FROM pdocs GROUP BY phrase, nw HAVING count(*) >= 3
),
top AS (
  SELECT * FROM (
    SELECT phrase, df, score,
           row_number() OVER (ORDER BY score DESC, phrase ASC) - 1 AS pid
    FROM base
  ) WHERE pid < 15
),
inc AS (SELECT t.pid, p.doc_id FROM pdocs p JOIN top t USING (phrase)),
common AS (
  SELECT a.pid AS pa, b.pid AS pb, count(*) AS common
  FROM inc a JOIN inc b ON a.doc_id = b.doc_id AND a.pid < b.pid
  GROUP BY 1, 2
),
edges0 AS (
  SELECT c.pa, c.pb
  FROM common c
  JOIN top ta ON ta.pid = c.pa
  JOIN top tb ON tb.pid = c.pb
  WHERE c.common * 1.0 / ta.df > 0.5 AND c.common * 1.0 / tb.df > 0.5
),
edges AS (
  SELECT pa AS src, pb AS dst FROM edges0
  UNION ALL SELECT pb, pa FROM edges0
  UNION ALL SELECT pid, pid FROM top
),
reach(node, root) AS (
  SELECT src, src FROM edges
  UNION
  SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.node
),
comp AS (SELECT node AS pid, min(root) AS cluster_id FROM reach GROUP BY node),
members AS (
  SELECT c.cluster_id, count(DISTINCT i.doc_id) AS n_docs
  FROM comp c JOIN inc i USING (pid) GROUP BY 1
)
SELECT t.phrase AS label,
       CAST(count(*) AS BIGINT) AS n_phrases,
       CAST(m.n_docs AS BIGINT) AS n_docs
FROM comp c
JOIN top t ON t.pid = c.cluster_id
JOIN members m ON m.cluster_id = c.cluster_id
GROUP BY t.phrase, m.n_docs
"""


# KNearestFuzzyClassifier (reference lucene/classification/src/java/org/
# apache/lucene/classification/KNearestFuzzyClassifier.java + utils/
# NearestFuzzyQuery.java): kNN classification where the neighbor query is a
# FUZZY disjunction — each target-doc term expands to its edit-distance≤2
# dictionary variants, variant weight = (1 − dist/min(len)) (the
# FuzzyTermsEnum boost) · idf, neighbors are the top-k docs by summed
# variant weight, and the class score is buildListFromTopDocs':
# Σ(score/maxScore) per class over the k hits, normalized by max(k, hits).
# Shape: the fuzzy expansion is ONE broadcast levenshtein join of the
# (bounded) target-term set against the term dictionary — the spellcheck
# pattern — capped at MAX_VARIANTS_PER_TERM=50; everything after is
# equi-joins and partitioned windows, never all-pairs.
def knn_fuzzy_classify(spark, sf_dir, k: int = 10):
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    tok = docs.select("doc_id", F.explode(F.expr(_TOK_EXPR)).alias("term")).distinct()
    dft = tok.groupBy("term").agg(F.count("*").alias("df"))
    n_docs = docs.count()
    qids = docs.filter(F.col("doc_id") % 131 == 0).select(F.col("doc_id").alias("qid"))
    qterms = (
        tok.join(F.broadcast(qids), tok.doc_id == F.col("qid"))
        .select("qid", F.col("term").alias("qterm"))
        .distinct()
    )
    # fuzzy variants: dictionary × (bounded) target terms, boost = the
    # FuzzyTermsEnum similarity; the ORIGINAL term's df prices every
    # variant (NearestFuzzyQuery stores it "so all variants use same idf")
    qt = qterms.select("qterm").distinct()
    variants = (
        dft.crossJoin(F.broadcast(qt))
        .withColumn("dist", F.levenshtein("term", "qterm"))
        .filter(F.col("dist") <= 2)
        .withColumn(
            "boost",
            1.0 - F.col("dist") / F.least(F.length("term"), F.length("qterm")),
        )
        .filter(F.col("boost") > 0)
    )
    w_var = Window.partitionBy("qterm").orderBy(
        F.col("boost").desc(), F.col("term").asc()
    )
    variants = variants.withColumn("vrk", F.row_number().over(w_var)).filter(
        F.col("vrk") <= 50
    )
    odf = dft.select(F.col("term").alias("qterm"), F.col("df").alias("odf"))
    variants = variants.join(F.broadcast(odf), "qterm", "left").withColumn(
        "idf",
        F.log((F.lit(float(n_docs)) + 1.0) / (F.coalesce("odf", F.col("df")) + 1.0))
        + 1.0,
    )
    scores = (
        tok.join(F.broadcast(variants.join(qterms, "qterm")), "term")
        .filter(F.col("doc_id") != F.col("qid"))
        .groupBy("qid", "doc_id")
        # 6-dp lockstep rounding (the engine's cross-engine convention):
        # summation ORDER differs between engines, and with heavy score
        # ties a 1-ulp difference would reorder the top-k cut
        .agg(F.round(F.sum(F.col("boost") * F.col("idf")), 6).alias("score"))
    )
    w_n = Window.partitionBy("qid").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    neigh = scores.withColumn("rk", F.row_number().over(w_n)).filter(F.col("rk") <= k)
    w_m = Window.partitionBy("qid")
    neigh = neigh.withColumn("maxs", F.max("score").over(w_m)).withColumn(
        "hits", F.count("*").over(w_m)
    )
    votes = (
        neigh.join(docs.select("doc_id", "lang"), "doc_id")
        .groupBy("qid", "lang", "hits")
        .agg(F.sum(F.col("score") / F.col("maxs")).alias("cboost"))
        .withColumn(
            "cscore",
            F.round(F.col("cboost") / F.greatest(F.lit(k), F.col("hits")), 6),
        )
    )
    w_v = Window.partitionBy("qid").orderBy(F.col("cscore").desc(), F.col("lang").asc())
    return (
        votes.withColumn("vrk", F.row_number().over(w_v))
        .filter(F.col("vrk") == 1)
        .select(F.col("qid").alias("doc_id"), F.col("lang").alias("predicted"), "cscore")
    )


KNN_FUZZY_SQL = f"""
WITH tok AS (SELECT DISTINCT doc_id, unnest({_TOK_EXPR}) AS term FROM documents),
dft AS (SELECT term, count(*) AS df FROM tok GROUP BY term),
n AS (SELECT count(*) AS nd FROM documents),
qterms AS (
  SELECT DISTINCT doc_id AS qid, term AS qterm FROM tok WHERE doc_id % 131 = 0
),
qt AS (SELECT DISTINCT qterm FROM qterms),
var0 AS (
  SELECT d.term, d.df, q.qterm,
         1.0 - levenshtein(d.term, q.qterm) * 1.0
               / least(length(d.term), length(q.qterm)) AS boost
  FROM dft d CROSS JOIN qt q
  WHERE levenshtein(d.term, q.qterm) <= 2
),
var1 AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (PARTITION BY qterm
              ORDER BY boost DESC, term ASC) AS vrk
    FROM var0 WHERE boost > 0
  ) WHERE vrk <= 50
),
variants AS (
  SELECT v.term, v.qterm, v.boost,
         ln((n.nd + 1.0) / (coalesce(o.df, v.df) + 1.0)) + 1.0 AS idf
  FROM var1 v
  LEFT JOIN dft o ON o.term = v.qterm
  CROSS JOIN n
),
scores AS (
  SELECT q.qid, t.doc_id, round(sum(v.boost * v.idf), 6) AS score
  FROM variants v
  JOIN qterms q ON q.qterm = v.qterm
  JOIN tok t ON t.term = v.term
  WHERE t.doc_id != q.qid
  GROUP BY q.qid, t.doc_id
),
neigh AS (
  SELECT * FROM (
    SELECT qid, doc_id, score,
           row_number() OVER (PARTITION BY qid ORDER BY score DESC, doc_id ASC) AS rk
    FROM scores
  ) WHERE rk <= 10
),
nn AS (
  SELECT qid, doc_id, score,
         max(score) OVER (PARTITION BY qid) AS maxs,
         count(*) OVER (PARTITION BY qid) AS hits
  FROM neigh
),
votes AS (
  SELECT nn.qid, d.lang, nn.hits,
         round(sum(nn.score / nn.maxs) / greatest(10, nn.hits), 6) AS cscore
  FROM nn JOIN documents d ON d.doc_id = nn.doc_id
  GROUP BY nn.qid, d.lang, nn.hits
)
SELECT qid AS doc_id, lang AS predicted, cscore FROM (
  SELECT qid, lang, cscore,
         row_number() OVER (PARTITION BY qid ORDER BY cscore DESC, lang ASC) AS vrk
  FROM votes
) WHERE vrk = 1
"""


def _gram_expr(n: int) -> str:
    """Word n-gram array as one Catalyst expression (1-indexed element_at,
    matching DuckDB list indexing). sequence(1, 0) is DESCENDING in Spark,
    so docs shorter than n take the explicit empty-array branch."""
    parts = ", ".join(f"element_at(arr, i + {k})" for k in range(n))
    return (
        f"transform(if(size(arr) >= {n}, sequence(1, size(arr) - {n - 1}), "
        f"cast(array() as array<int>)), i -> concat_ws(' ', {parts}))"
    )


def repetition_filter(spark, sf_dir):
    """Gopher repetition rules (Rae et al. 2021, appendix A1.1 — the
    MassiveText quality filter's n-gram family; public paper): per doc,
    the fraction of characters covered by (a) the most frequent word
    2-gram counting every occurrence (``top2_frac``, drop > 0.20) and
    (b) ALL occurrences of duplicated word 5-grams (``dup5_frac``, drop
    > 0.15). The corpus text is single-line, so the line-level rules of
    the paper are vacuous here and the n-gram family is the load-bearing
    one. Chars of an n-gram = its space-joined length; doc chars =
    space-joined token length — identical convention in both engines.

    Spark shape: element_at-based n-gram arrays (1-indexed, matching
    DuckDB list indexing) → explode → (doc_id, gram) partial-agg groupBy →
    per-doc max / conditional sum — two combinable aggregations, no
    Python."""
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))

    def grams(n):
        return F.expr(_gram_expr(n))

    tot = d.select(
        "doc_id",
        (
            F.expr("aggregate(arr, 0, (acc, x) -> acc + length(x))")
            + F.greatest(F.size("arr") - 1, F.lit(0))
        ).alias("total_chars"),
    )
    g2 = (
        d.select("doc_id", F.explode(grams(2)).alias("gram"))
        .groupBy("doc_id", "gram")
        .count()
        .groupBy("doc_id")
        .agg(F.max(F.col("count") * F.length("gram")).alias("top2_chars"))
    )
    g5 = (
        d.select("doc_id", F.explode(grams(5)).alias("gram"))
        .groupBy("doc_id", "gram")
        .count()
        .filter(F.col("count") > 1)
        .groupBy("doc_id")
        .agg(F.sum(F.col("count") * F.length("gram")).alias("dup5_chars"))
    )
    top2 = F.coalesce(F.col("top2_chars"), F.lit(0)) / F.greatest(
        F.col("total_chars"), F.lit(1)
    )
    dup5 = F.coalesce(F.col("dup5_chars"), F.lit(0)) / F.greatest(
        F.col("total_chars"), F.lit(1)
    )
    # keep decides on the UNROUNDED fractions (the oracle SQL does too —
    # rounding first would flip docs in the half-ulp window at a threshold)
    return (
        tot.join(g2, "doc_id", "left")
        .join(g5, "doc_id", "left")
        .select(
            "doc_id",
            F.round(top2, 4).alias("top2_frac"),
            F.round(dup5, 4).alias("dup5_frac"),
            ((top2 <= 0.20) & (dup5 <= 0.15)).alias("keep"),
        )
    )


REPETITION_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
tot AS (
  SELECT doc_id,
         coalesce(list_sum([len(x) for x in arr]), 0)
           + greatest(len(arr) - 1, 0) AS total_chars
  FROM t
),
g2 AS (
  SELECT doc_id, max(cnt * len(gram)) AS top2_chars FROM (
    SELECT doc_id, gram, count(*) AS cnt FROM (
      SELECT doc_id, arr[i] || ' ' || arr[i+1] AS gram
      FROM t, unnest(range(1, len(arr))) AS r(i)
    ) GROUP BY doc_id, gram
  ) GROUP BY doc_id
),
g5 AS (
  SELECT doc_id, sum(cnt * len(gram)) AS dup5_chars FROM (
    SELECT doc_id, gram, count(*) AS cnt FROM (
      SELECT doc_id,
             arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' '
               || arr[i+3] || ' ' || arr[i+4] AS gram
      FROM t, unnest(range(1, len(arr) - 3)) AS r(i)
    ) GROUP BY doc_id, gram
  ) WHERE cnt > 1 GROUP BY doc_id
)
SELECT t.doc_id,
       round(coalesce(top2_chars, 0) * 1.0 / greatest(total_chars, 1), 4) AS top2_frac,
       round(coalesce(dup5_chars, 0) * 1.0 / greatest(total_chars, 1), 4) AS dup5_frac,
       (coalesce(top2_chars, 0) * 1.0 / greatest(total_chars, 1) <= 0.20
        AND coalesce(dup5_chars, 0) * 1.0 / greatest(total_chars, 1) <= 0.15) AS keep
FROM t JOIN tot USING (doc_id)
LEFT JOIN g2 ON t.doc_id = g2.doc_id
LEFT JOIN g5 ON t.doc_id = g5.doc_id
"""


_CONTAM_N = 13  # the GPT-3 appendix-C 13-gram decontamination window
_CONTAM_MOD = 97  # deterministic stand-in eval split: doc_id % 97 == 0


def contamination_ngrams(spark, sf_dir):
    """Benchmark decontamination (the GPT-3 appendix-C / PaLM 13-gram
    overlap method; public papers): treat the deterministic split
    ``doc_id % 97 == 0`` as the held-out benchmark, build its distinct
    word 13-gram set, and report every training doc's overlap fraction
    (|its 13-grams ∩ benchmark grams| / |its 13-grams|). Docs shorter
    than 13 tokens have no grams → overlap 0.

    Spark shape: grams explode on both sides, distinct benchmark grams,
    one equi-join on the gram string + per-doc conditional count — the
    benchmark side is corpus/97 so AQE broadcasts it at gate scale and
    shuffles it at 100 TB; never an all-pairs comparison."""
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))
    grams = F.expr(_gram_expr(_CONTAM_N))
    g = d.select("doc_id", F.explode(grams).alias("gram"))
    bench = (
        g.filter(F.col("doc_id") % _CONTAM_MOD == 0)
        .select("gram")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    train = g.filter(F.col("doc_id") % _CONTAM_MOD != 0)
    per = (
        train.join(bench, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_grams"),
            F.sum(F.coalesce(F.col("_hit"), F.lit(0))).cast("long").alias("n_hit"),
        )
    )
    base = d.filter(F.col("doc_id") % _CONTAM_MOD != 0).select("doc_id")
    return (
        base.join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_grams"), F.lit(0)).cast("long").alias("n_grams"),
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0))
                / F.greatest(F.coalesce(F.col("n_grams"), F.lit(0)), F.lit(1)),
                4,
            ).alias("overlap"),
        )
    )


CONTAMINATION_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
g AS (
  SELECT doc_id,
         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] || ' ' || arr[i+3]
           || ' ' || arr[i+4] || ' ' || arr[i+5] || ' ' || arr[i+6] || ' '
           || arr[i+7] || ' ' || arr[i+8] || ' ' || arr[i+9] || ' '
           || arr[i+10] || ' ' || arr[i+11] || ' ' || arr[i+12] AS gram
  FROM t, unnest(range(1, len(arr) - {_CONTAM_N - 2})) AS r(i)
),
bench AS (SELECT DISTINCT gram FROM g WHERE doc_id % {_CONTAM_MOD} = 0),
per AS (
  SELECT g.doc_id,
         CAST(count(*) AS BIGINT) AS n_grams,
         CAST(sum(CASE WHEN bench.gram IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
  FROM g LEFT JOIN bench ON g.gram = bench.gram
  WHERE g.doc_id % {_CONTAM_MOD} <> 0
  GROUP BY g.doc_id
)
SELECT t.doc_id,
       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
       CAST(coalesce(n_hit, 0) AS BIGINT) AS n_hit,
       round(coalesce(n_hit, 0) * 1.0 / greatest(coalesce(n_grams, 0), 1), 4) AS overlap
FROM t LEFT JOIN per ON t.doc_id = per.doc_id
WHERE t.doc_id % {_CONTAM_MOD} <> 0
"""


def text_tagger(spark, sf_dir):
    """SolrTextTagger role (``solr/core/src/java/org/apache/solr/handler/
    tagger/TaggerRequestHandler.java:62``, the SolrTextTagger contrib):
    tag every occurrence of a dictionary phrase in every document,
    reporting (start, end) token positions and the matched entity, with
    the ``overlaps=NO_SUB`` policy (a tag strictly contained in a longer
    tag at the same place is dropped — ``TagClusterReducer.NO_SUB``).

    The dictionary is derived deterministically in BOTH engines: the top
    50 word 2-grams and top 25 word 3-grams by (count desc, gram asc) —
    3-grams naturally contain frequent 2-gram prefixes, so NO_SUB has
    real work to do. Spark shape: posexplode n-grams → broadcast
    dictionary semi-join → NO_SUB as a doc-keyed anti-join (equi on
    doc_id, containment as the residual condition); the dictionary is
    broadcast-sized by construction (the tagger's FST role)."""
    d = _docs(spark, sf_dir).withColumn("arr", F.expr(_TOK_EXPR))

    def gram_pos(n):
        g = F.expr(_gram_expr(n))
        return d.select("doc_id", F.posexplode(g).alias("off", "gram")).select(
            "doc_id",
            (F.col("off") + 1).cast("long").alias("start_pos"),
            (F.col("off") + n).cast("long").alias("end_pos"),
            "gram",
        )

    def top_dict(n, k):
        return (
            gram_pos(n)
            .groupBy("gram")
            .count()
            .orderBy(F.col("count").desc(), F.col("gram").asc())
            .limit(k)
            .select("gram")
        )

    tags = None
    for n, k in ((2, 50), (3, 25)):
        cand = gram_pos(n).join(F.broadcast(top_dict(n, k)), "gram")
        tags = cand if tags is None else tags.unionByName(cand)
    b = tags.select(
        F.col("doc_id").alias("b_doc"),
        F.col("start_pos").alias("b_s"),
        F.col("end_pos").alias("b_e"),
    )
    cond = (
        (F.col("doc_id") == F.col("b_doc"))
        & (F.col("b_s") <= F.col("start_pos"))
        & (F.col("end_pos") <= F.col("b_e"))
        & ((F.col("b_e") - F.col("b_s")) > (F.col("end_pos") - F.col("start_pos")))
    )
    return tags.join(b, cond, "left_anti").select(
        "doc_id", "start_pos", "end_pos", F.col("gram").alias("entity")
    )


TEXT_TAGGER_SQL = f"""
WITH t AS (SELECT doc_id, {_TOK_EXPR} AS arr FROM documents),
g2 AS (
  SELECT doc_id, CAST(i AS BIGINT) AS start_pos, CAST(i + 1 AS BIGINT) AS end_pos,
         arr[i] || ' ' || arr[i+1] AS gram
  FROM t, unnest(range(1, len(arr))) AS r(i)
),
g3 AS (
  SELECT doc_id, CAST(i AS BIGINT) AS start_pos, CAST(i + 2 AS BIGINT) AS end_pos,
         arr[i] || ' ' || arr[i+1] || ' ' || arr[i+2] AS gram
  FROM t, unnest(range(1, len(arr) - 1)) AS r(i)
),
d2 AS (
  SELECT gram FROM (
    SELECT gram, count(*) AS cnt FROM g2 GROUP BY gram
  ) ORDER BY cnt DESC, gram ASC LIMIT 50
),
d3 AS (
  SELECT gram FROM (
    SELECT gram, count(*) AS cnt FROM g3 GROUP BY gram
  ) ORDER BY cnt DESC, gram ASC LIMIT 25
),
tags AS (
  SELECT g2.* FROM g2 JOIN d2 USING (gram)
  UNION ALL
  SELECT g3.* FROM g3 JOIN d3 USING (gram)
)
SELECT a.doc_id, a.start_pos, a.end_pos, a.gram AS entity
FROM tags a
WHERE NOT EXISTS (
  SELECT 1 FROM tags b
  WHERE b.doc_id = a.doc_id AND b.start_pos <= a.start_pos
    AND a.end_pos <= b.end_pos
    AND (b.end_pos - b.start_pos) > (a.end_pos - a.start_pos)
)
"""


TRAINING_EXTRA_OPS: dict[str, tuple] = {
    "text_tagger": (text_tagger, TEXT_TAGGER_SQL),
    "repetition_filter": (repetition_filter, REPETITION_SQL),
    "contamination_ngrams": (contamination_ngrams, CONTAMINATION_SQL),
    "signature_dedup": (signature_dedup, SIGNATURE_DEDUP_SQL),
    "stc_clusters": (stc_clusters, STC_SQL),
    "lingo_clusters": (lingo_clusters, LINGO_SQL),
    "knn_fuzzy_classify": (knn_fuzzy_classify, KNN_FUZZY_SQL),
    "features_igain_docs": (features_igain_docs, FEATURES_IGAIN_SQL),
    "train_logit_docs": (train_logit_docs, TRAIN_LOGIT_SQL),
    "cluster_results_docs": (cluster_results_docs, CLUSTER_RESULTS_SQL),
    # signature computation is exercised transitively by the gated
    # minhash_lsh_pairs / dedup_clusters chain
    "minhash_signatures": (minhash_signatures, MINHASH_SQL),
    "dedup_canonical": (dedup_canonical, DEDUP_CANONICAL_SQL),
    "quality_filter": (quality_filter, QUALITY_FILTER_SQL),
    "pii_scrub": (pii_scrub, PII_SCRUB_SQL),
    # fixed sign-pattern coarse quantizer — superseded in the gated window by
    # the k-means-trained emb_ivf_trained; kept as the cheap untrained variant
    "emb_ivf_probe": (emb_ivf_probe, EMB_IVF_SQL),
    "emb_cosine_pairs": (emb_cosine_pairs, EMB_COSINE_SQL),
    "emb_knn_threshold": (emb_knn_threshold, EMB_KNN_SQL),
    "emb_lsh_neardup": (emb_lsh_neardup, EMB_LSH_SQL),
    "simhash16": (simhash16, SIMHASH_SQL),
    "lang_id": (lang_id, LANG_ID_SQL),
    "quality_score": (quality_score, QUALITY_SQL),
    "token_count": (token_count, TOKEN_COUNT_SQL),
    "fingerprint": (fingerprint, FINGERPRINT_SQL),
}
