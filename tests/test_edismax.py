"""(e)DisMax parser/executor: the mm calculator against Solr's own test
vectors (SolrPluginUtilsTest.testMinShouldMatchCalculator), clause splitting,
and per-clause dismax execution cross-checked against per-field brute-force
scores from the single-field engines."""

import pytest

from lucene_solr_spark.search.edismax import (
    MUST,
    MUST_NOT,
    SHOULD,
    calculate_min_should_match,
    split_clauses,
)


# Solr test vectors, verbatim (reference
# solr/core/src/test/org/apache/solr/util/SolrPluginUtilsTest.java:260-315)
MM_VECTORS = [
    (0, 5, "0"), (0, 5, "0%"), (0, 5, " -5 "), (0, 5, "\n -100% \n"),
    (3, 5, " \n3\n "), (2, 5, "-3"), (3, 3, "3"), (0, 3, "-3"),
    (3, 3, "5"), (0, 3, "-5"),
    (0, 3, " \n25% \n"), (1, 4, "25%"), (1, 5, " 25% "), (2, 10, "25%"),
    (3, 3, " \n-25%\n "), (3, 4, "-25%"), (4, 5, "-25%"), (8, 10, "-25%"),
    (1, 1, "3<0"), (2, 2, "3<0"), (3, 3, "3<0"), (0, 4, "3<0"), (0, 5, "3<0"),
    (1, 1, "3<25%"), (2, 2, " 3\n<\n25% "), (3, 3, "3<25%"),
    (1, 4, "\n 3 < \n25%\n "), (1, 5, "3<25%"),
    (1, 1, "\n3 < -25% 10 < -3 \n"), (2, 2, " 3 < -25% 10 < -3\n"),
    (3, 3, " 3 < -25% \n 10 < -3 \n"), (3, 4, " 3 < -25% 10 < -3 "),
    (4, 5, " 3 < -25% 10 < -3"), (5, 6, "3<-25% 10<-3"),
    (6, 7, " 3 < -25% 10 < -3 "), (6, 8, " 3 < -25% 10 \n < -3\n"),
    (7, 9, " 3 < -25% 10 < -3 \n"), (8, 10, " 3 < -25% 10 < -3"),
    (8, 11, "3<-25% 10<-3"), (9, 12, "3<-25% 10<-3"),
    (97, 100, "3<-25% 10<-3"),
]


def test_calculate_mm_matches_solr_vectors():
    for want, n, spec in MM_VECTORS:
        assert calculate_min_should_match(n, spec) == want, (n, spec)
    assert calculate_min_should_match(5, None) == 0


def test_split_clauses():
    assert split_clauses("fast hash") == [
        (SHOULD, None, "fast"),
        (SHOULD, None, "hash"),
    ]
    assert split_clauses("+vector -hash scan") == [
        (MUST, None, "vector"),
        (MUST_NOT, None, "hash"),
        (SHOULD, None, "scan"),
    ]
    assert split_clauses('"exact phrase"~2 word') == [
        (SHOULD, None, '"exact phrase"~2'),
        (SHOULD, None, "word"),
    ]
    assert split_clauses('title:scan body:"a b" other') == [
        (SHOULD, "title", "scan"),
        (SHOULD, "body", '"a b"'),
        (SHOULD, None, "other"),
    ]
    # AND/OR are connector noise; NOT negates the next clause; escaped
    # colon stays literal
    assert split_clauses("a AND b OR NOT c") == [
        (SHOULD, None, "a"),
        (SHOULD, None, "b"),
        (MUST_NOT, None, "c"),
    ]
    assert split_clauses(r"foo\:bar") == [(SHOULD, None, r"foo\:bar")]


@pytest.fixture(scope="module")
def two_field_indexes(spark, tmp_path_factory):
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    corpus = synth_corpus_local(150)
    corpus = corpus.assign(title=corpus["path"].str.replace(r"[/.]", " ", regex=True))
    docs = spark.createDataFrame(corpus)
    root = tmp_path_factory.mktemp("edm")
    d_body = str(root / "body")
    d_title = str(root / "title")
    build_index(spark, docs, d_body, num_segments=3, analyzer="code",
                content_col="content")
    build_index(spark, docs, d_title, num_segments=3, analyzer="code",
                content_col="title")
    return d_body, d_title


def _scores(searcher, queries):
    """{qid: {(seg, doc): score}} from one batched exhaustive pass."""
    out = {q: {} for q in queries}
    for r in searcher.search_many(queries, k=None).collect():
        out[r.qid][(r.segment_id, r.doc_id)] = float(r.score)
    return out


def _brute_edismax(fields_scores, boosts, tie, clauses_occurs, mm_n, pf_scores=None):
    """Per-clause dismax + mm/must/not pivot, in plain python."""
    all_coords = set()
    for per_clause in fields_scores.values():
        for sc in per_clause.values():
            all_coords |= set(sc)
    expect = {}
    for c in all_coords:
        total, n_should, n_must, n_not = 0.0, 0, 0, 0
        for qid, occ in enumerate(clauses_occurs):
            parts = [
                boosts[f] * fields_scores[f][qid][c]
                for f in fields_scores
                if c in fields_scores[f][qid]
            ]
            if not parts:
                continue
            cs = max(parts) + tie * (sum(parts) - max(parts))
            if occ == SHOULD:
                n_should += 1
                total += cs
            elif occ == MUST:
                n_must += 1
                total += cs
            else:
                n_not += 1
        if n_not or n_must != sum(1 for o in clauses_occurs if o == MUST):
            continue
        has_should = any(o == SHOULD for o in clauses_occurs)
        n_must_total = sum(1 for o in clauses_occurs if o == MUST)
        if has_should and (n_should < mm_n or (not n_must_total and n_should == 0)):
            continue
        if pf_scores and c in pf_scores:
            total += pf_scores[c]
        expect[c] = total
    return expect


def test_edismax_per_clause_dismax(spark, two_field_indexes):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, d_title = two_field_indexes
    tie = 0.3
    boosts = {"body": 1.0, "title": 2.0}
    ed = EDisMaxSearcher(
        spark,
        {"body": (d_body, 1.0), "title": (d_title, 2.0)},
        analyzer="code",
        precision="f64",
        tie=tie,
    )
    q = "parse buffer store"
    got = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search(q, k=None).collect()
    }
    qd = {0: "parse", 1: "buffer", 2: "store"}
    fs = {
        "body": _scores(
            IndexSearcher(spark, d_body, analyzer="code", precision="f64"), qd
        ),
        "title": _scores(
            IndexSearcher(spark, d_title, analyzer="code", precision="f64"), qd
        ),
    }
    expect = _brute_edismax(fs, boosts, tie, [SHOULD] * 3, mm_n=0)
    assert got.keys() == expect.keys()
    for c in expect:
        assert got[c] == pytest.approx(expect[c], rel=1e-9)


def test_edismax_mm_filters(spark, two_field_indexes):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, d_title = two_field_indexes
    ed = EDisMaxSearcher(
        spark,
        {"body": (d_body, 1.0), "title": (d_title, 2.0)},
        analyzer="code",
        precision="f64",
    )
    q = "parse buffer store"
    qd = {0: "parse", 1: "buffer", 2: "store"}
    fs = {
        "body": _scores(
            IndexSearcher(spark, d_body, analyzer="code", precision="f64"), qd
        ),
        "title": _scores(
            IndexSearcher(spark, d_title, analyzer="code", precision="f64"), qd
        ),
    }
    for mm, mm_n in [("2", 2), ("100%", 3), ("-1", 2)]:
        got = {
            (r.segment_id, r.doc_id)
            for r in ed.search(q, mm=mm, k=None).collect()
        }
        expect = _brute_edismax(fs, {"body": 1.0, "title": 2.0}, 0.0,
                                [SHOULD] * 3, mm_n=mm_n)
        assert got == expect.keys(), mm
    # mm="2" must be a strict subset of mm=None on this corpus
    loose = {
        (r.segment_id, r.doc_id) for r in ed.search(q, k=None).collect()
    }
    tight = {
        (r.segment_id, r.doc_id) for r in ed.search(q, mm="2", k=None).collect()
    }
    assert tight < loose


def test_edismax_must_not_and_field_override(spark, two_field_indexes):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, d_title = two_field_indexes
    ed = EDisMaxSearcher(
        spark,
        {"body": (d_body, 1.0), "title": (d_title, 1.0)},
        analyzer="code",
        precision="f64",
    )
    got = {
        (r.segment_id, r.doc_id)
        for r in ed.search("+parse -buffer", k=None).collect()
    }
    body = IndexSearcher(spark, d_body, analyzer="code", precision="f64")
    title = IndexSearcher(spark, d_title, analyzer="code", precision="f64")
    qd = {0: "parse", 1: "buffer"}
    b, t = _scores(body, qd), _scores(title, qd)
    has_parse = set(b[0]) | set(t[0])
    has_buffer = set(b[1]) | set(t[1])
    assert got == has_parse - has_buffer and got

    # title:parse restricts the clause to the title field only
    got_t = {
        (r.segment_id, r.doc_id)
        for r in ed.search("title:parse", k=None).collect()
    }
    assert got_t == set(t[0]) and got_t != has_parse


def test_edismax_pf_phrase_boost(spark, two_field_indexes):
    """pf adds the whole-query phrase score on the pf field to docs passing
    the main query; it never ADMITS new docs."""
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, _ = two_field_indexes
    body = IndexSearcher(spark, d_body, analyzer="code", precision="f64")
    # find a real adjacent bigram in the corpus so pf matches something
    phrase_hits = {}
    q2 = None
    for cand in ('"parse buffer"', '"hash table"', '"index merge"'):
        hits = {
            (r.segment_id, r.doc_id): float(r.score)
            for r in body.search_many({0: cand}, k=None).collect()
        }
        if hits:
            q2, phrase_hits = cand, hits
            break
    if q2 is None:
        pytest.skip("corpus has no candidate bigram")
    w1, w2 = q2.strip('"').split()
    ed = EDisMaxSearcher(
        spark, {"body": (d_body, 1.0)}, analyzer="code", precision="f64"
    )
    base = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search(f"{w1} {w2}", k=None).collect()
    }
    boosted = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search(f"{w1} {w2}", pf={"body": 2.5}, k=None).collect()
    }
    assert boosted.keys() == base.keys()
    for c, s in boosted.items():
        want = base[c] + 2.5 * phrase_hits.get(c, 0.0)
        assert s == pytest.approx(want, rel=1e-9), c


def test_edismax_pf2_pf3_shingles(spark, two_field_indexes):
    """pf2/pf3 add every consecutive bigram/trigram of the positive bare
    terms as phrase boosts (addShingledPhraseQueries): score == base +
    boost * sum of per-shingle phrase scores."""
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, _ = two_field_indexes
    body = IndexSearcher(spark, d_body, analyzer="code", precision="f64")
    terms = ["parse", "buffer", "store"]
    q = " ".join(terms)
    bigrams = [f'"{terms[i]} {terms[i+1]}"~1' for i in range(2)]
    trigram = ['"' + " ".join(terms) + '"']
    sh_scores = {}
    for t in bigrams + trigram:
        sh_scores[t] = {
            (r.segment_id, r.doc_id): float(r.score)
            for r in body.search_many({0: t}, k=None).collect()
        }
    ed = EDisMaxSearcher(
        spark, {"body": (d_body, 1.0)}, analyzer="code", precision="f64"
    )
    base = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search(q, k=None).collect()
    }
    boosted = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search(
            q, pf2={"body": 2.0}, ps2=1, pf3={"body": 3.0}, k=None
        ).collect()
    }
    assert boosted.keys() == base.keys()
    for c, s in boosted.items():
        want = base[c]
        for t in bigrams:
            want += 2.0 * sh_scores[t].get(c, 0.0)
        want += 3.0 * sh_scores[trigram[0]].get(c, 0.0)
        assert s == pytest.approx(want, rel=1e-9), c


def test_edismax_topk_rank_shape(spark, two_field_indexes):
    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, d_title = two_field_indexes
    ed = EDisMaxSearcher(
        spark, {"body": (d_body, 1.0), "title": (d_title, 2.0)}, analyzer="code"
    )
    rows = ed.search("parse buffer", k=5).collect()
    assert 0 < len(rows) <= 5
    assert [r.rank for r in rows] == list(range(1, len(rows) + 1))
    scores = [r.score for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_edismax_bq_boost_query(spark, two_field_indexes):
    """bq adds the boost query's dismaxed score to matching docs without
    admitting new docs or moving the mm bar."""
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, _ = two_field_indexes
    body = IndexSearcher(spark, d_body, analyzer="code", precision="f64")
    ed = EDisMaxSearcher(
        spark, {"body": (d_body, 1.0)}, analyzer="code", precision="f64"
    )
    base = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search("parse", k=None).collect()
    }
    boosted = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search("parse", bq=["buffer^3.0"], k=None).collect()
    }
    assert boosted.keys() == base.keys()
    bq_scores = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in body.search_many({0: "buffer"}, k=None).collect()
    }
    changed = 0
    for c, s in boosted.items():
        want = base[c] + 3.0 * bq_scores.get(c, 0.0)
        if c in bq_scores:
            changed += 1
        assert s == pytest.approx(want, rel=1e-9), c
    assert changed > 0


def test_edismax_bf_and_boost_functions(spark, two_field_indexes):
    """bf adds the parsed function value per doc; boost multiplies by it
    (edismax bf/boost -> FunctionQuery / BoostedQuery). Functions evaluate
    over the docs-table columns of the qf index."""
    import os

    from lucene_solr_spark.search.edismax import EDisMaxSearcher

    d_body, _ = two_field_indexes
    ed = EDisMaxSearcher(
        spark, {"body": (d_body, 1.0)}, analyzer="code", precision="f64"
    )
    base = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search("parse", k=None).collect()
    }
    docs = {
        (r.segment_id, r.doc_id): (r.path, r.commit)
        for r in spark.read.parquet(os.path.join(d_body, "docs")).collect()
    }

    def lev(a, b):
        prev = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            cur = [i]
            for j, cb in enumerate(b, 1):
                cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
            prev = cur
        return prev[-1]

    def strdist(a, b):
        return 1.0 - lev(a, b) / max(len(a), len(b))

    # bf: score + strdist(path, commit) — per-doc varying function value
    with_bf = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search("parse", bf=["strdist(path, commit)"], k=None).collect()
    }
    assert with_bf.keys() == base.keys()
    varying = set()
    for c, s in with_bf.items():
        want = base[c] + strdist(*docs[c])
        assert s == pytest.approx(want, rel=1e-9), c
        varying.add(round(s - base[c], 6))
    assert len(varying) > 1  # the function value genuinely varies per doc

    # boost: score * 2.5 (constant function — exact multiplicative check)
    with_boost = {
        (r.segment_id, r.doc_id): float(r.score)
        for r in ed.search("parse", boost=["sum(2.0, 0.5)"], k=None).collect()
    }
    for c, s in with_boost.items():
        assert s == pytest.approx(base[c] * 2.5, rel=1e-9), c
