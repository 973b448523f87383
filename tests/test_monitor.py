"""Monitor (percolation / reverse search): presearcher anchor extraction,
match parity against the pure-python OracleIndex matcher, partitioning
invariance, batch-vocabulary MultiTermQuery expansion, and streaming
percolation (stream-of-docs past standing queries == batch matches)."""

import os

import pytest

from lucene_solr_spark.monitor import Monitor, anchor_terms
from lucene_solr_spark.search.query import (
    BooleanQuery,
    BoostQuery,
    DisjunctionMaxQuery,
    FuzzyQuery,
    MatchAllQuery,
    MatchNoneQuery,
    MultiPhraseQuery,
    PhraseQuery,
    PrefixQuery,
    Query,
    RegexpQuery,
    SloppyPhraseQuery,
    SpanNearQuery,
    SynonymQuery,
    TermInSetQuery,
    TermQuery,
    TermRangeQuery,
    WildcardQuery,
    parse_query,
)

# the standing-query set used across tests — every algebra family
STANDING = {
    "q_term": TermQuery("parse"),
    "q_and": parse_query("buffer AND stream", "code"),
    "q_or": parse_query("merge OR writer", "code"),
    "q_not": parse_query("+index -segment", "code"),
    "q_msm": BooleanQuery(
        should=(TermQuery("index"), TermQuery("merge"), TermQuery("stream")),
        min_should_match=2,
    ),
    "q_phrase": parse_query('"index writer"', "code"),
    "q_sloppy": parse_query('"index writer"~2', "code"),
    "q_syn": SynonymQuery(("buffer", "channel")),
    "q_dismax": DisjunctionMaxQuery((TermQuery("parse"), TermQuery("http")), 0.1),
    "q_prefix": PrefixQuery(prefix="par"),
    "q_wild": WildcardQuery(pattern="s*eam"),
    "q_regex": RegexpQuery(pattern="pars.*"),
    "q_fuzzy": FuzzyQuery(term="parze", max_edits=1),
    "q_range": TermRangeQuery(lower="par", upper="pas"),
    "q_inset": TermInSetQuery(set_terms=("http", "nosuchterm")),
    "q_span": SpanNearQuery(clauses=("index", "writer"), slop=3, in_order=False),
    "q_multiphrase": MultiPhraseQuery(
        slots=(("index",), ("writer", "merge")), positions=(0, 1)
    ),
    "q_all": MatchAllQuery(),
    "q_none": MatchNoneQuery(),
    "q_boost": BoostQuery(TermQuery("parse"), 2.0),
}


@pytest.fixture(scope="module")
def corpus_df(spark, tiny_corpus):
    import pyspark.sql.functions as F

    df = spark.createDataFrame(tiny_corpus).withColumn(
        "key", F.concat_ws("\x00", "repo", "path", "commit")
    )
    return df.select("key", "content")


# ---------------------------------------------------------------------------
# independent brute-force matcher (per-doc, pure python — no engine code)

def _brute(q: Query, tset: set, pos: dict) -> bool:
    """Does the doc (term set + term->sorted positions) match q?"""
    import re

    from lucene_solr_spark.monitor import _levenshtein

    if isinstance(q, MatchAllQuery):
        return True
    if isinstance(q, MatchNoneQuery):
        return False
    if isinstance(q, TermQuery):
        return q.term in tset
    if isinstance(q, SynonymQuery):
        return any(t in tset for t in q.syn_terms)
    if isinstance(q, (BoostQuery,)):
        return _brute(q.inner, tset, pos)
    if isinstance(q, DisjunctionMaxQuery):
        return any(_brute(d, tset, pos) for d in q.disjuncts)
    if isinstance(q, PrefixQuery):
        return any(t.startswith(q.prefix) for t in tset)
    if isinstance(q, WildcardQuery):
        rx = re.compile(
            "".join(".*" if c == "*" else "." if c == "?" else re.escape(c) for c in q.pattern)
        )
        return any(rx.fullmatch(t) for t in tset)
    if isinstance(q, RegexpQuery):
        rx = re.compile(f"(?:{q.pattern})")
        return any(rx.fullmatch(t) for t in tset)
    if isinstance(q, FuzzyQuery):
        return any(
            abs(len(t) - len(q.term)) <= q.max_edits
            and t.startswith(q.term[: q.prefix_len])
            and _levenshtein(t, q.term) <= q.max_edits
            for t in tset
        )
    if isinstance(q, TermRangeQuery):
        def ok(t):
            if q.lower is not None and (t < q.lower or (t == q.lower and not q.include_lower)):
                return False
            if q.upper is not None and (t > q.upper or (t == q.upper and not q.include_upper)):
                return False
            return True
        return any(ok(t) for t in tset)
    if isinstance(q, TermInSetQuery):
        return any(t in tset for t in q.set_terms)
    if isinstance(q, PhraseQuery):
        if any(t not in tset for t in q.phrase_terms):
            return False
        base = q.phrase_terms[0]
        r0 = q.positions[0]
        return any(
            all((p - r0 + r) in pos[t] for t, r in zip(q.phrase_terms, q.positions))
            for p in pos[base]
        )
    if isinstance(q, SloppyPhraseQuery):
        if any(t not in tset for t in q.phrase_terms):
            return False
        import itertools

        adj = [ [p - r for p in pos[t]] for t, r in zip(q.phrase_terms, q.positions) ]
        if len(adj) == 2:
            return any(abs(a - b) <= q.slop for a in adj[0] for b in adj[1])
        return any(
            max(c) - min(c) <= q.slop for c in itertools.product(*adj)
        )
    if isinstance(q, MultiPhraseQuery):
        slot_pos = []
        for slot, r in zip(q.slots, q.positions):
            ps = sorted({p - r for t in slot if t in pos for p in pos[t]})
            if not ps:
                return False
            slot_pos.append(set(ps))
        return any(all(p in sp for sp in slot_pos[1:]) for p in slot_pos[0])
    if isinstance(q, SpanNearQuery):
        # term-clause-only brute (the tests use flat clauses)
        terms = [c for c in q.clauses]
        if any(t not in tset for t in terms):
            return False
        import itertools

        for combo in itertools.product(*[pos[t] for t in terms]):
            spans = [(p, p + 1) for p in combo]
            if q.in_order:
                if not all(spans[i + 1][0] >= spans[i][1] for i in range(len(spans) - 1)):
                    continue
            lo = min(s for s, _ in spans)
            hi = max(e for _, e in spans)
            if (hi - lo) - len(terms) <= q.slop:
                return True
        return False
    if isinstance(q, BooleanQuery):
        if any(not _brute(c, tset, pos) for c in q.must):
            return False
        if any(not _brute(c, tset, pos) for c in q.filter):
            return False
        if any(_brute(c, tset, pos) for c in q.must_not):
            return False
        n_should = sum(_brute(c, tset, pos) for c in q.should)
        if q.must or q.filter:
            return n_should >= q.min_should_match
        return n_should >= max(q.min_should_match, 1) if q.should else True
    raise TypeError(type(q))


@pytest.fixture(scope="module")
def analyzed_corpus(tiny_corpus):
    from lucene_solr_spark.analysis import ANALYZERS

    analyze = ANALYZERS["code"]
    out = {}
    for i in range(len(tiny_corpus)):
        row = tiny_corpus.iloc[i]
        key = "\x00".join(str(row[c]) for c in ("repo", "path", "commit"))
        terms, positions = analyze(row["content"] or "")
        pos: dict = {}
        for t, p in zip(terms, positions):
            pos.setdefault(t, []).append(p)
        out[key] = (set(terms), {t: sorted(ps) for t, ps in pos.items()})
    return out


def test_anchor_extraction():
    assert anchor_terms(TermQuery("parse")) == {"parse"}
    # conjunction picks ONE child — the longest (weight-max) term
    assert anchor_terms(parse_query("buffer AND stream", "code")) in (
        {"buffer"},
        {"stream"},
    )
    assert anchor_terms(PhraseQuery(("index", "writer"), (0, 1))) == {"writer"}
    # disjunction needs ALL children anchored
    assert anchor_terms(parse_query("merge OR writer", "code")) == {
        "merge",
        "writer",
    }
    # a disjunction with an unanchorable child is unanchorable
    assert (
        anchor_terms(BooleanQuery(should=(TermQuery("a"), PrefixQuery(prefix="x"))))
        is None
    )
    # but a conjunction with one anchorable child is anchorable
    assert anchor_terms(
        BooleanQuery(must=(TermQuery("index"), PrefixQuery(prefix="x")))
    ) == {"index"}
    # pure must_not and MatchAll are always-check
    assert anchor_terms(BooleanQuery(must_not=(TermQuery("a"),))) is None
    assert anchor_terms(MatchAllQuery()) is None
    # MatchNone gets the empty set → never selected
    assert anchor_terms(MatchNoneQuery()) == frozenset()
    assert anchor_terms(SynonymQuery(("a", "b"))) == {"a", "b"}
    assert anchor_terms(
        MultiPhraseQuery(slots=(("a",), ("bb", "cc")), positions=(0, 1))
    ) == {"bb", "cc"}


def test_anchor_soundness_on_corpus(analyzed_corpus):
    """Soundness: every doc matching q contains at least one anchor term —
    checked for every standing query on the 200-doc corpus."""
    for qid, q in STANDING.items():
        anch = anchor_terms(q)
        if anch is None:
            continue
        for key, (tset, pos) in analyzed_corpus.items():
            if _brute(q, tset, pos):
                assert tset & anch, f"{qid}: anchors miss matching doc {key!r}"


def test_match_equals_brute_force(spark, analyzed_corpus, corpus_df):
    """The distributed monitor == an independent per-doc python matcher,
    for every query-algebra family at once."""
    m = Monitor(analyzer="code")
    for qid, q in STANDING.items():
        m.register(qid, q)
    got = {
        (r.query_id, r.key)
        for r in m.match(corpus_df, content_col="content", key_col="key").collect()
    }
    want = {
        (qid, key)
        for qid, q in STANDING.items()
        for key, (tset, pos) in analyzed_corpus.items()
        if _brute(q, tset, pos)
    }
    assert got == want
    # sanity: the corpus actually exercises the families
    matched_qids = {qid for qid, _ in want}
    assert {"q_term", "q_phrase", "q_prefix", "q_all"} <= matched_qids


def test_match_partitioning_invariance(spark, corpus_df):
    m = Monitor(analyzer="code")
    for qid, q in STANDING.items():
        m.register(qid, q)
    a = sorted(
        (r.query_id, r.key)
        for r in m.match(corpus_df.repartition(13), content_col="content", key_col="key").collect()
    )
    b = sorted(
        (r.query_id, r.key)
        for r in m.match(corpus_df.coalesce(1), content_col="content", key_col="key").collect()
    )
    assert a == b and len(a) > 0


def test_empty_and_null_docs(spark):
    docs = spark.createDataFrame(
        [(1, None), (2, ""), (3, "parse the buffer")], "doc_id long, text string"
    )
    m = Monitor(analyzer="simple")
    m.register("q", "parse")
    m.register("all", MatchAllQuery())
    got = sorted((r.query_id, r.doc_id) for r in m.match(docs).collect())
    assert got == [("all", 1), ("all", 2), ("all", 3), ("q", 3)]


def test_unregister_and_len(spark):
    m = Monitor()
    m.register("a", "x")
    m.register("b", "y")
    assert len(m) == 2
    m.unregister("a")
    assert len(m) == 1


def test_streaming_percolation(spark, tiny_corpus, corpus_df, tmp_path_factory):
    """match() applied to a readStream == match() applied to the batch —
    the streaming-alert topology, stateless per micro-batch."""
    root = tmp_path_factory.mktemp("monitor_stream")
    src = str(root / "src")
    out_rows = []

    # write the corpus as two parquet files (two micro-batches) — split
    # deterministically so the halves partition the corpus exactly
    import pyspark.sql.functions as F

    even = F.crc32(F.col("key")) % 2 == 0
    corpus_df.filter(even).coalesce(1).write.parquet(src + "/a")
    corpus_df.filter(~even).coalesce(1).write.parquet(src + "/b")

    m = Monitor(analyzer="code")
    for qid in ("q_term", "q_and", "q_phrase", "q_prefix"):
        m.register(qid, STANDING[qid])

    schema = corpus_df.schema
    stream = spark.readStream.schema(schema).parquet(src + "/*")
    matches = m.match(stream, content_col="content", key_col="key")

    def sink(batch_df, _epoch):
        out_rows.extend(
            (r.query_id, r.key) for r in batch_df.collect()
        )

    q = matches.writeStream.foreachBatch(sink).trigger(availableNow=True).start()
    q.awaitTermination(120)

    want = sorted(
        (r.query_id, r.key)
        for r in m.match(corpus_df, content_col="content", key_col="key").collect()
    )
    assert sorted(out_rows) == want and len(want) > 0


def test_scored_percolation_equals_search(spark, tiny_corpus, corpus_df, tmp_path_factory):
    """Percolation with stats_from=searcher produces EXACTLY the (doc, score)
    rows that searching the index with the same queries produces — the
    ScoringMatch mode, rank/score parity against search_many."""
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    index_dir = str(tmp_path_factory.mktemp("mon_scored") / "idx")
    docs = spark.createDataFrame(tiny_corpus).withColumn(
        "key", F.concat_ws("\x00", "repo", "path", "commit")
    )
    build_index(spark, docs, index_dir, num_segments=4, analyzer="code",
                key_cols=("key",), content_col="content")
    s = IndexSearcher(spark, index_dir, analyzer="code", precision="f64")

    queries = {
        "q_term": STANDING["q_term"],
        "q_and": STANDING["q_and"],
        "q_phrase": STANDING["q_phrase"],
        "q_dismax": STANDING["q_dismax"],
        "q_sloppy": STANDING["q_sloppy"],
        # MultiTermQuerys with every rewrite method: scored percolation
        # pre-expands against the stats index's dictionary with the
        # executor's rewrite dispatch, so scores (constant-score 1.0s,
        # scoring-boolean idf sums, df-ranked top_terms truncation) must all
        # be identical to search_many on the same index
        "q_prefix_cs": PrefixQuery(prefix="par"),
        "q_prefix_sb": PrefixQuery(prefix="par", rewrite_method="scoring_boolean"),
        "q_prefix_tt": PrefixQuery(prefix="par", rewrite_method="top_terms_2"),
        "q_fuzzy_tt": FuzzyQuery(term="parse", max_edits=1,
                                 rewrite_method="top_terms_3"),
    }
    m = Monitor(analyzer="code")
    for qid, q in queries.items():
        m.register(qid, q)
    got = {
        (r.query_id, r.key, round(float(r.score), 9))
        for r in m.match(
            docs.select("key", "content"), content_col="content",
            key_col="key", stats_from=s,
        ).collect()
    }

    hits = s.search_many({i: q for i, (_, q) in enumerate(sorted(queries.items()))}, k=None)
    stored = spark.read.parquet(os.path.join(index_dir, "docs")).select(
        "segment_id", "doc_id", "key"
    )
    qid_names = sorted(queries)
    want = {
        (qid_names[r.qid], r.key, round(float(r.score), 9))
        for r in hits.join(stored, ["segment_id", "doc_id"]).collect()
    }
    assert got == want and len(want) > 0


def test_distributed_percolation_equals_broadcast(spark, corpus_df):
    from lucene_solr_spark.monitor import percolate_distributed

    reg = [
        ("q1", "parse"),
        ("q2", "buffer AND stream"),
        ("q3", '"index writer"'),
        ("q4", "+index -segment"),
        ("q5", '"merge the segments"'),
    ]
    queries_df = spark.createDataFrame(reg, "query_id string, query string")
    got = sorted(
        (r.query_id, r.key)
        for r in percolate_distributed(
            queries_df, corpus_df, analyzer="code",
            content_col="content", key_col="key",
        ).collect()
    )
    m = Monitor(analyzer="code")
    for qid, qs in reg:
        m.register(qid, qs)
    want = sorted(
        (r.query_id, r.key)
        for r in m.match(corpus_df, content_col="content", key_col="key").collect()
    )
    assert got == want and len(want) > 0


def test_distributed_percolation_always_check_and_cap(spark, corpus_df):
    import pytest as _pytest

    from lucene_solr_spark.monitor import percolate_distributed

    # one unanchorable query (leading wildcard via MultiTermQuery syntax is
    # not parseable by the flat parser, so use *:* MatchAll)
    queries_df = spark.createDataFrame(
        [("qa", "*:*"), ("qt", "parse")], "query_id string, query string"
    )
    rows = percolate_distributed(
        queries_df, corpus_df, analyzer="code",
        content_col="content", key_col="key",
    ).collect()
    n_docs = corpus_df.count()
    assert sum(1 for r in rows if r.query_id == "qa") == n_docs
    assert 0 < sum(1 for r in rows if r.query_id == "qt") < n_docs


def test_interval_query_anchors_and_percolation(spark):
    from lucene_solr_spark.search.intervals import (
        IMaxGaps,
        IOr,
        IOrdered,
        ITerm,
        IntervalQuery,
    )

    q = IntervalQuery(source=IMaxGaps(IOrdered(("alpha", "beta")), 1))
    # conjunction: picks one child (the longest term)
    assert anchor_terms(q) == {"alpha"}
    q_or = IntervalQuery(source=IOr((ITerm("alpha"), ITerm("beta"))))
    assert anchor_terms(q_or) == {"alpha", "beta"}

    docs = spark.createDataFrame(
        [(1, "alpha x beta"), (2, "beta then alpha"), (3, "alpha x y z beta"), (4, "gamma")],
        "doc_id long, text string",
    )
    m = Monitor(analyzer="simple")
    m.register("iq", q)
    got = sorted(r.doc_id for r in m.match(docs).collect())
    assert got == [1]  # gap 1 ok; doc 2 wrong order; doc 3 gap 3 > 1
