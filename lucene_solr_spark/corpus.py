"""Deterministic synthetic source-code corpus (FIXTURES.md §1).

Every row is a pure function of (SEED, global doc index) via a counter-based
splitmix64 PRNG, so generation is embarrassingly parallel (spark.range →
mapInArrow), identical at any partition count, and identical between the
Spark engine and the pure-Python oracle. Schema matches BASELINE.json
input_hint: (repo, path, commit, lang, content).

Generator features map to reference semantics (see FIXTURES.md):
camelCase/snake_case/letter-digit identifiers → WordDelimiterGraphFilter
rules; stopword-bearing comments → StopFilter position gaps; Zipf vocabulary
→ skewed df (hot terms, exercises salting); length 5..~3000 tokens → all
SmallFloat norm buckets; short duplicate-ish docs → score-tie tie-breaks.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

SEED = 42

_U64 = np.uint64


def _splitmix64(x: np.ndarray) -> np.ndarray:
    """Vectorized splitmix64 mixer (public-domain constant set)."""
    z = (x + _U64(0x9E3779B97F4A7C15)).astype(_U64)
    z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
    z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
    return z ^ (z >> _U64(31))


def _rand(i: np.ndarray, stream: int) -> np.ndarray:
    """uint64 random per doc index for a named stream."""
    return _splitmix64(i.astype(_U64) * _U64(0x100000001) + _U64(SEED * 1315423911 + stream))


def _randf(i: np.ndarray, stream: int) -> np.ndarray:
    return (_rand(i, stream) >> _U64(11)).astype(np.float64) / float(1 << 53)


# ---- vocabulary: ~5k identifier stems with Zipf weights -------------------

_SYLL = [
    "parse", "http", "request", "read", "file", "async", "buffer", "stream",
    "channel", "index", "writer", "merge", "segment", "token", "query",
    "score", "doc", "field", "term", "block", "cache", "hash", "map", "list",
    "node", "tree", "sort", "scan", "byte", "util", "data", "load", "store",
    "sync", "lock", "pool", "task", "queue", "event", "time", "count", "sum",
    "flush", "split", "join", "key", "value", "page", "disk", "net", "conn",
]


def _build_vocab(n: int = 5000) -> np.ndarray:
    rng = np.random.RandomState(SEED)
    vocab = []
    seen = set()
    while len(vocab) < n:
        k = rng.randint(1, 4)
        w = "".join(rng.choice(_SYLL) for _ in range(k))
        if w not in seen:
            seen.add(w)
            vocab.append(w)
    return np.asarray(vocab, dtype=object)


VOCAB = _build_vocab()
# Zipf cumulative distribution over the vocab (s=1.1)
_zw = 1.0 / np.power(np.arange(1, len(VOCAB) + 1, dtype=np.float64), 1.1)
VOCAB_CDF = np.cumsum(_zw / _zw.sum())

_LANGS = np.asarray(["java", "py", "go", "js", "rs", "md"], dtype=object)
_LANG_CDF = np.cumsum(np.asarray([0.3, 0.25, 0.15, 0.15, 0.1, 0.05]))
_EXT = {"java": "java", "py": "py", "go": "go", "js": "js", "rs": "rs", "md": "md"}

_COMMENT_TAILS = np.asarray(
    [
        "this is the main entry point for the parser and it will not fail",
        "read the file into a buffer if there is no error at this point",
        "these are not the tokens that will be used by the index writer",
        "merge the segments into a tier such that the budget is not exceeded",
        "a cache of the scores for this query as it was in the heap",
    ],
    dtype=object,
)


def _camel(words: list[str]) -> str:
    return words[0] + "".join(w.capitalize() for w in words[1:])


def gen_batch(indices: np.ndarray) -> pd.DataFrame:
    """Generate rows for the given global doc indices — pure function of index."""
    i = np.asarray(indices, dtype=np.int64)
    n = len(i)
    repo = np.char.add(
        np.char.add("org", (i % 7).astype(str)), np.char.add("/repo", (i % 23).astype(str))
    )
    lang = _LANGS[np.searchsorted(_LANG_CDF, _randf(i, 1))]
    # doc length in "statements": Zipf-ish spread 1..~600 statements (~5..3000 tokens)
    u = _randf(i, 2)
    n_stmt = (1 + (u**3) * 599).astype(np.int64)

    contents = []
    paths = []
    commits = []
    for row in range(n):
        idx = int(i[row])
        rs = np.random.RandomState((SEED * 1_000_003 + idx) % (2**31))
        ns = int(n_stmt[row])
        # pick identifier words from the Zipf vocab
        picks = VOCAB[np.searchsorted(VOCAB_CDF, rs.random_sample(ns * 4))]
        lines = []
        for s in range(ns):
            w = picks[s * 4 : s * 4 + 4]
            style = rs.randint(4)
            if style == 0:  # camelCase call with numeric literal
                lines.append(f"int {_camel(list(w[:3]))} = {_camel(list(w[1:3]))}(v{rs.randint(1000)});")
            elif style == 1:  # snake_case assignment
                lines.append(f"{'_'.join(w[:3])} = {w[3]}_{rs.randint(100)} + SD{rs.randint(900)}")
            elif style == 2:  # comment with stopwords
                lines.append("// " + str(_COMMENT_TAILS[rs.randint(len(_COMMENT_TAILS))]))
            else:  # plain identifiers
                lines.append(" ".join(w))
        content = "\n".join(lines)
        contents.append(content)
        paths.append(f"src/{picks[0]}/{_camel(list(picks[1:3]) or ['m'])}.{_EXT[lang[row]]}")
        commits.append(hashlib.sha1(f"{SEED}:{idx}".encode()).hexdigest()[:12])

    return pd.DataFrame(
        {
            "repo": pd.array(repo, dtype="string"),
            "path": pd.array(paths, dtype="string"),
            "commit": pd.array(commits, dtype="string"),
            "lang": pd.array(lang.astype(object), dtype="string"),
            "content": pd.array(contents, dtype="string"),
        }
    )


CORPUS_SCHEMA = (
    "repo string, path string, commit string, lang string, content string"
)


def synth_corpus(spark, n_docs: int, n_partitions: int = 32):
    """Distributed deterministic corpus as a DataFrame.

    spark.range gives each task a contiguous index range; gen_batch is a pure
    function of the index, so the table is identical for any n_partitions —
    the property that makes the index build reproducible across cluster sizes.
    """
    def gen(iterator):
        for batch in iterator:
            idx = batch.column("id").to_numpy()
            yield pa.RecordBatch.from_pandas(gen_batch(idx))

    return (
        spark.range(0, n_docs, 1, n_partitions)
        .mapInArrow(gen, CORPUS_SCHEMA)
    )


def synth_corpus_local(n_docs: int) -> pd.DataFrame:
    """Driver-side corpus for the oracle and unit tests (same rows)."""
    return gen_batch(np.arange(n_docs))
