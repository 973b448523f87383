"""Payloads in the posting format (``PostingsEnum.PAYLOADS``,
``index/PostingsEnum.java:48-56``): one float32 per occurrence stored
fixed-width beside positions, written by the DelimitedPayloadTokenFilter
chain (``analysis/payloads/DelimitedPayloadTokenFilter.java`` +
``FloatEncoder.java``), scored by ``PayloadScoreQuery``
(``queries/payloads/PayloadScoreQuery.java``) with the four
``PayloadFunction``s.

Checks:
- batch analyzer ≡ per-doc ``analyze_payload`` token streams; malformed
  payload suffixes keep the full token, absent payloads default 1.0.
- build → ``payloads_postings`` round-trips exactly.
- ``PayloadScoreQuery`` min/max/sum/average (± include_span_score) against
  a brute-force python aggregate.
- payloads survive the concatenating merge (clean, deletes, hot-sharded)
  and the sorted merge; mixed payload/payload-free merges refuse.
"""

import numpy as np
import pytest

from lucene_solr_spark.analysis import analyze_batch_payloads, analyze_payload
from lucene_solr_spark.corpus import synth_corpus_local

EDGE_TEXTS = [
    "",
    None,
    "plain tokens only",
    "a|1 b|2.5 c|-3 d|1e2 e|.5",
    "bad|x bad| |5 ||| lone|",
    "UP|2 MiXeD|0.125 inf|inf nan|nan",
    "dup|1 dup|2 dup dup|4",
]


def _pay_corpus(n=120):
    """Deterministic payload-annotated corpus: token i of a doc carries
    payload (i % 7) + 0.5, except every 5th token which carries none."""
    corpus = synth_corpus_local(n)

    def annotate(text):
        toks = text.split()
        out = []
        for i, t in enumerate(toks[:80]):
            if i % 5 == 4:
                out.append(t)
            else:
                out.append(f"{t}|{(i % 7) + 0.5}")
        return " ".join(out)

    corpus = corpus.assign(content=corpus["content"].map(annotate))
    return corpus


def _expected_rows(corpus):
    """(path, term, pos, payload) via the per-doc reference chain."""
    rows = []
    for r in corpus.itertuples():
        terms, poss = analyze_payload(r.content)
        toks = [t for t in r.content.split()]
        # recompute payloads the way the filter defines them
        k = 0
        for tok in toks:
            before, sep, after = tok.rpartition("|")
            term = (before if sep else after).lower()
            payload = 1.0
            if sep:
                try:
                    v = float(after)
                    if after and np.isfinite(v):
                        payload = np.float32(v)
                    else:
                        term = tok.lower()
                except ValueError:
                    term = tok.lower()
            if not term:
                continue
            assert term == terms[k]
            rows.append((r.path, term, k, float(np.float32(payload))))
            k += 1
    return sorted(rows)


def test_batch_matches_per_doc_chain():
    texts = [t for t in EDGE_TEXTS] + _pay_corpus(40)["content"].tolist()
    terms, pos, lens, starts, norm_lens, pay = analyze_batch_payloads(texts)
    np.testing.assert_array_equal(lens, norm_lens)
    assert len(pay) == len(terms) == len(pos)
    for i, t in enumerate(texts):
        want_terms, want_pos = analyze_payload(t if t is not None else "")
        got_terms = list(terms[starts[i] : starts[i] + lens[i]])
        got_pos = list(pos[starts[i] : starts[i] + lens[i]])
        assert got_terms == want_terms, (i, t)
        assert got_pos == want_pos, (i, t)


def test_payload_values_and_defaults():
    terms, _, _, _, _, pay = analyze_batch_payloads(
        ["a|2.5 b c|bad d|-1.25", "inf|inf x|3"]
    )
    got = dict(zip(terms, pay))
    assert got["a"] == np.float32(2.5)
    assert got["b"] == 1.0  # no delimiter -> no payload -> 1.0
    assert got["c|bad"] == 1.0  # unparseable -> full token, no payload
    assert got["d"] == np.float32(-1.25)
    assert got["inf|inf"] == 1.0  # non-finite -> full token, no payload
    assert got["x"] == np.float32(3)


# ------------------------------------------------------------------ index --


def _payload_rows_by_key(spark, index_dir):
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.read import payloads_postings

    live = live_segments(spark, index_dir)
    pays = payloads_postings(spark, index_dir).filter(F.col("segment_id").isin(live))
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "doc_id", "path")
    )
    rows = pays.join(docs, ["segment_id", "doc_id"]).select(
        "path", "term", "pos", "payload"
    )
    return sorted(
        (r.path, r.term, int(r.pos), float(np.float32(r.payload)))
        for r in rows.collect()
    )


@pytest.fixture(scope="module")
def pay_corpus():
    return _pay_corpus()


@pytest.fixture(scope="module")
def pay_index(spark, pay_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    d = str(tmp_path_factory.mktemp("pay") / "idx")
    docs = spark.createDataFrame(pay_corpus)
    build_index(
        spark, docs, d, num_segments=4, analyzer="payload", store_payloads=True
    )
    return d


def test_build_payloads_roundtrip(spark, pay_corpus, pay_index):
    assert _payload_rows_by_key(spark, pay_index) == _expected_rows(pay_corpus)


@pytest.mark.parametrize("func", ["min", "max", "sum", "average"])
@pytest.mark.parametrize("include_span", [False, True])
def test_payload_score_query(spark, pay_corpus, pay_index, func, include_span):
    from lucene_solr_spark.search import IndexSearcher, PayloadScoreQuery, TermQuery

    s = IndexSearcher(spark, pay_index, analyzer="payload", precision="f64")
    # the corpus's most frequent term (whitespace tokens are identifiers,
    # not english words — derive from the reference chain)
    from collections import Counter

    term = Counter(t for _, t, _, _ in _expected_rows(pay_corpus)).most_common(1)[0][0]
    got = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in s.search_many(
            {0: PayloadScoreQuery(term, func=func, include_span_score=include_span)},
            k=None,
        ).collect()
    }
    # brute force from the decoded payload stream
    from collections import defaultdict

    from lucene_solr_spark.index.read import payloads_postings

    per_doc = defaultdict(list)
    for r in payloads_postings(spark, pay_index, terms=[term]).collect():
        per_doc[(r.segment_id, r.doc_id)].append(np.float32(r.payload))
    assert got.keys() == per_doc.keys() and got
    span_scores = {}
    if include_span:
        span_scores = {
            (r.segment_id, r.doc_id): float(r.score)
            for r in s.search_many({0: TermQuery(term)}, k=None).collect()
        }
    for c, pays in per_doc.items():
        if func == "min":
            agg = min(pays)
        elif func == "max":
            agg = max(pays)
        elif func == "sum":
            agg = float(np.sum(np.array(pays, np.float32)))
        else:
            agg = float(np.sum(np.array(pays, np.float32)) / np.float32(len(pays)))
        want = agg * (span_scores[c] if include_span else 1.0)
        assert got[c] == pytest.approx(want, rel=1e-6), (c, func)


def test_payload_query_without_payloads_raises(spark, tiny_index):
    from lucene_solr_spark.search import IndexSearcher, PayloadScoreQuery

    d, _ = tiny_index
    s = IndexSearcher(spark, d)
    with pytest.raises(Exception, match="store_payloads|payload"):
        s.search_many({0: PayloadScoreQuery("parse")}, k=None).collect()


# ------------------------------------------------------------------ merge --


def test_payloads_survive_concat_merge(spark, pay_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    d = str(tmp_path_factory.mktemp("pay_m") / "idx")
    docs = spark.createDataFrame(pay_corpus)
    build_index(spark, docs, d, num_segments=4, analyzer="payload", store_payloads=True)
    before = _payload_rows_by_key(spark, d)
    merge_segments(spark, d, [0, 1, 2, 3])
    assert _payload_rows_by_key(spark, d) == before


def test_payloads_survive_merge_with_deletes(spark, pay_corpus, tmp_path_factory):
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import delete_docs, merge_segments

    d = str(tmp_path_factory.mktemp("pay_d") / "idx")
    docs = spark.createDataFrame(pay_corpus)
    build_index(spark, docs, d, num_segments=4, analyzer="payload", store_payloads=True)
    dead_paths = set(pay_corpus.iloc[::7]["path"])
    stored = spark.read.parquet(os.path.join(d, "docs"))
    n = delete_docs(spark, d, stored.filter(F.col("path").isin(list(dead_paths))))
    assert n > 0
    before = [r for r in _payload_rows_by_key(spark, d) if r[0] not in dead_paths]
    merge_segments(spark, d, [0, 1, 2, 3])
    assert _payload_rows_by_key(spark, d) == before


def test_payloads_survive_hot_sharded_merge(spark, pay_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    d = str(tmp_path_factory.mktemp("pay_h") / "idx")
    docs = spark.createDataFrame(pay_corpus)
    build_index(spark, docs, d, num_segments=4, analyzer="payload", store_payloads=True)
    before = _payload_rows_by_key(spark, d)
    merge_segments(spark, d, [0, 1, 2, 3], hot_df_threshold=0)
    assert _payload_rows_by_key(spark, d) == before


def test_payloads_survive_sorted_merge(spark, pay_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    rows = [
        (r.repo, r.path, r.commit, r.content, float((i * 37) % 100) + 0.5)
        for i, r in enumerate(pay_corpus.itertuples())
    ]
    docs = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string, price double"
    )
    d = str(tmp_path_factory.mktemp("pay_s") / "idx")
    build_index(
        spark, docs, d, num_segments=4, analyzer="payload",
        index_sort="price", store_payloads=True,
    )
    before = _payload_rows_by_key(spark, d)
    res = merge_segments(spark, d, [0, 1, 2, 3])
    assert res["index_sort"] == "price"
    assert _payload_rows_by_key(spark, d) == before


def test_mixed_payloads_merge_raises(spark, pay_corpus, tmp_path_factory):
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.merge import merge_segments

    d = str(tmp_path_factory.mktemp("pay_mix") / "idx")
    docs = spark.createDataFrame(pay_corpus)
    build_index(
        spark, docs.limit(40), d, num_segments=2, analyzer="payload",
        store_payloads=True,
    )
    build_index(
        spark, docs, d, num_segments=2, analyzer="payload",
        store_payloads=False, segment_base=2, resume=False,
    )
    with pytest.raises(ValueError, match="store_payloads"):
        merge_segments(spark, d, [0, 1, 2, 3])


def test_span_payload_check_query(spark, pay_corpus, pay_index):
    """SpanPayloadCheckQuery: only occurrences whose payload equals the
    target survive; span freq = surviving count, scored via the similarity
    over that freq."""
    from collections import defaultdict

    from lucene_solr_spark.index.read import payloads_postings
    from lucene_solr_spark.search import IndexSearcher, SpanPayloadCheckQuery

    from collections import Counter

    term = Counter(t for _, t, _, _ in _expected_rows(pay_corpus)).most_common(1)[0][0]
    target = 2.5  # (i % 7) + 0.5 hits 2.5 when i % 7 == 2
    s = IndexSearcher(spark, pay_index, analyzer="payload", precision="f64")
    got = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in s.search_many(
            {0: SpanPayloadCheckQuery(term, (target,))}, k=None
        ).collect()
    }
    per_doc = defaultdict(int)
    for r in payloads_postings(spark, pay_index, terms=[term]).collect():
        if np.float32(r.payload) == np.float32(target):
            per_doc[(r.segment_id, r.doc_id)] += 1
    assert got.keys() == {c for c, n in per_doc.items() if n > 0}
    assert got
    # differential: the surviving freq drives the score — same term with
    # a never-stored payload matches nothing
    none = s.search_many(
        {0: SpanPayloadCheckQuery(term, (123.456,))}, k=None
    ).count()
    assert none == 0


def test_payload_function_query(spark, pay_corpus, pay_index):
    """The 'payload' ValueSourceParser name (FloatPayloadValueSource role):
    payload(field,term,default) resolves the prepared per-doc payload
    aggregate; docs without the term take the default. Oracled against a
    pandas recompute from the decoded payload stream."""
    import pyspark.sql.functions as F

    from lucene_solr_spark.functions import parse_func
    from lucene_solr_spark.index.read import payloads_postings
    from lucene_solr_spark.textops import relevance_registry

    term = "parse"
    per_doc = (
        payloads_postings(spark, pay_index, [term])
        .groupBy("segment_id", "doc_id")
        .agg(F.avg("payload").alias(f"payload_{term}"))
    )
    docs = spark.read.parquet(pay_index + "/docs").select(
        "segment_id", "doc_id", "repo", "path"
    )
    frame = docs.join(per_doc, ["segment_id", "doc_id"], "left")
    stats = {"df": {}, "ttf": {}, "numdocs": 1, "maxdoc": 1, "sumttf": 0}
    col = parse_func(
        f"payload(content,'{term}',-1)", registry=relevance_registry(stats)
    )
    got = {
        (r.repo, r.path): r.p for r in frame.select("repo", "path", col.alias("p")).collect()
    }

    # independent oracle from the raw stream
    want_rows = payloads_postings(spark, pay_index, [term]).join(
        docs, ["segment_id", "doc_id"]
    ).collect()
    agg: dict = {}
    for r in want_rows:
        agg.setdefault((r.repo, r.path), []).append(r.payload)
    n_with = 0
    for k, v in got.items():
        if k in agg:
            assert v == pytest.approx(sum(agg[k]) / len(agg[k]), rel=1e-6)
            n_with += 1
        else:
            assert v == -1.0
    assert n_with == len(agg) > 0
