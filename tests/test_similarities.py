"""Alternative similarities (SURVEY §2.7): ClassicSimilarity (TF-IDF) and
LMDirichletSimilarity on the shared (freq, norm_byte) scoring seam. Each is
verified against a plain-python recomputation from raw token counts, and the
pruned top-k paths must agree with exhaustive collection under every sim."""

import math

import numpy as np
import pytest

from lucene_solr_spark.smallfloat import byte4_to_int, int_to_byte4

MU = 2000.0


@pytest.fixture(scope="module")
def sim_index(spark, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    docs = spark.createDataFrame(
        [
            ("r", f"f{i}.py", "c", text)
            for i, text in enumerate(
                [
                    "parse the buffer quickly",
                    "parse parse parse buffer",
                    "buffer overflow in the parser code",
                    "unrelated content entirely here",
                    "parse",
                    "the quick brown fox jumps over the lazy dog " * 5,
                ]
            )
        ],
        "repo string, path string, commit string, content string",
    )
    d = str(tmp_path_factory.mktemp("sim") / "idx")
    build_index(spark, docs, d, num_segments=2, analyzer="code")
    return d


def _naive_stats(spark, index_dir):
    """Token stats straight from the docs table (independent recompute)."""
    from lucene_solr_spark.analysis import analyze_code

    rows = spark.read.parquet(index_dir + "/docs").collect()
    per_doc = {}
    for r in rows:
        terms, _ = analyze_code(r.content)
        per_doc[(r.segment_id, r.doc_id)] = terms
    doc_count = sum(1 for t in per_doc.values() if t)
    total = sum(len(t) for t in per_doc.values())
    return per_doc, doc_count, total


def _quantized_len(n):
    return int(byte4_to_int(int_to_byte4(np.array([n], np.int64)))[0])


def test_classic_scores(spark, sim_index):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="classic",
                      precision="f64")
    per_doc, doc_count, _ = _naive_stats(spark, sim_index)
    df = sum(1 for t in per_doc.values() if "parse" in t)
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    assert hits
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        idf = 1.0 + math.log((doc_count + 1) / (df + 1))
        expect = idf * math.sqrt(tf) / math.sqrt(_quantized_len(len(terms)))
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_lmd_scores(spark, sim_index):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="lmd",
                      precision="f64")
    per_doc, _, total = _naive_stats(spark, sim_index)
    ttf = sum(t.count("parse") for t in per_doc.values())
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    p = ttf / total
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            continue
        dl = _quantized_len(len(terms))
        expect = max(0.0, math.log1p(tf / (MU * p)) + math.log(MU / (dl + MU)))
        if expect > 0:
            assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_lmjm_scores(spark, sim_index):
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.kernels import LMJM_LAMBDA

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="lmjm",
                      precision="f64")
    per_doc, _, total = _naive_stats(spark, sim_index)
    ttf = sum(t.count("parse") for t in per_doc.values())
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    p = ttf / total
    lam = LMJM_LAMBDA
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        expect = math.log1p((1 - lam) / lam * (tf / dl) / p)
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_inl2_scores(spark, sim_index):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="inl2",
                      precision="f64")
    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    df = sum(1 for t in per_doc.values() if "parse" in t)
    avgdl = total / doc_count
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        tfn = tf * math.log2(1 + avgdl / dl)
        expect = math.log2((doc_count + 1) / (df + 0.5)) * tfn / (tfn + 1)
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_dfi_scores(spark, sim_index):
    """DFISimilarity.java:55-64 + IndependenceStandardized.java:37:
    expected = (ttf+1)·dl/(T+1); score = log2((tf−e)/sqrt(e) + 1), 0 if tf≤e."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="dfi",
                      precision="f64")
    per_doc, _, total = _naive_stats(spark, sim_index)
    ttf = sum(t.count("parse") for t in per_doc.values())
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    assert hits
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            continue
        dl = _quantized_len(len(terms))
        e = (ttf + 1.0) * dl / (total + 1.0)
        if tf <= e:
            expect = 0.0
        else:
            expect = math.log2((tf - e) / math.sqrt(e) + 1.0)
        if expect > 0:
            assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_ibll_scores(spark, sim_index):
    """IBSimilarity.java:77-82 with DistributionLL/LambdaDF/NormalizationH2:
    λ=(df+1)/(N+1), tfn = tf·log2(1+avgdl/dl), score = ln(1 + tfn/λ)."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="ibll",
                      precision="f64")
    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    df = sum(1 for t in per_doc.values() if "parse" in t)
    avgdl = total / doc_count
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    lam = (df + 1.0) / (doc_count + 1.0)
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        tfn = tf * math.log2(1 + avgdl / dl)
        expect = math.log1p(tfn / lam)
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_ax2exp_scores(spark, sim_index):
    """AxiomaticF2EXP.java:91-101 (s=0.25, k=0.35):
    score = ((N+1)/df)^k · tf/(tf + s + s·dl/avgdl)."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="ax2exp",
                      precision="f64")
    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    df = sum(1 for t in per_doc.values() if "parse" in t)
    avgdl = total / doc_count
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        idf = ((doc_count + 1) / df) ** 0.35
        expect = idf * tf / (tf + 0.25 + 0.25 * dl / avgdl)
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


@pytest.mark.parametrize(
    "sim",
    [
        "classic", "lmd", "lmjm", "inl2", "dfi", "ibll", "ax2exp",
        "gl2", "ifl2", "inel2", "ax1log", "ax2log", "ax3exp", "ax3log",
    ],
)
def test_pruned_paths_match_exhaustive_under_sim(spark, sim_index, sim):
    """topk_term_pruned / WAND / BlockMaxConjunction bounds stay admissible
    under every similarity (monotone in freq, anti-monotone in length)."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity=sim)
    queries = ["parse", "buffer OR parse", "parse AND buffer", "the AND parse"]
    topk = s.search_many({i: q for i, q in enumerate(queries)}, k=3).collect()
    # exhaustive k=None reference, re-ranked
    full = s.search_many({i: q for i, q in enumerate(queries)}, k=None).collect()
    by_q = {}
    for r in full:
        by_q.setdefault(r.qid, []).append((-(round(r.score, 7)), r.segment_id, r.doc_id))
    for qid, rows in by_q.items():
        rows.sort()
        got = sorted(
            (r.rank, r.segment_id, r.doc_id)
            for r in topk
            if r.qid == qid
        )
        exp = [(i + 1, segd, d) for i, (_, segd, d) in enumerate(rows[:3])]
        assert got == exp, (qid, got, exp)


def test_dfi_synonym_single_smoothing(spark, sim_index):
    """SynonymQuery under DFI: the pseudo-term expected count uses ONE
    smoothing over the SUMMED ttf ((Σttf+1)/(T+1)), not one per member."""
    import math

    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import SynonymQuery

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="dfi",
                      precision="f64")
    per_doc, _, total = _naive_stats(spark, sim_index)
    terms = ("parse", "buffer")
    ttf = sum(t.count(terms[0]) + t.count(terms[1]) for t in per_doc.values())
    hits = {
        (r.segment_id, r.doc_id): r.score
        for r in s.search_many({0: SynonymQuery(terms)}, k=None).collect()
    }
    assert hits
    w = (ttf + 1.0) / (total + 1.0)
    for coord, toks in per_doc.items():
        tf = toks.count(terms[0]) + toks.count(terms[1])
        if tf == 0:
            continue
        dl = _quantized_len(len(toks))
        e = w * dl
        expect = math.log2((tf - e) / math.sqrt(e) + 1.0) if tf > e else 0.0
        if expect > 0:
            assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_gl2_scores(spark, sim_index):
    """BasicModelG + AfterEffectL + H2 (BasicModelG.java:36-49):
    λ = (F+1)/(N+F+1); score = B − (B−A)/(1+tfn)."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="gl2",
                      precision="f64")
    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    F = sum(t.count("parse") for t in per_doc.values())
    avgdl = total / doc_count
    lam = (F + 1.0) / (doc_count + F + 1.0)
    A = math.log2(1 + lam)
    B = math.log2((1 + lam) / lam)
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    assert hits
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        tfn = tf * math.log2(1 + avgdl / dl)
        expect = B - (B - A) / (1 + tfn)
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_ifl2_and_inel2_scores(spark, sim_index):
    """BasicModelIF.java:34-44 / BasicModelIne.java:34-44 with
    AfterEffectL + H2: score = A · tfn/(tfn+1)."""
    from lucene_solr_spark.search import IndexSearcher

    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    F = sum(t.count("parse") for t in per_doc.values())
    avgdl = total / doc_count
    N = float(doc_count)
    ne = N * (1 - ((N - 1) / N) ** F)
    expectations = {
        "ifl2": math.log2(1 + (doc_count + 1) / (F + 0.5)),
        "inel2": math.log2((doc_count + 1) / (ne + 0.5)),
    }
    for sim, A in expectations.items():
        s = IndexSearcher(spark, sim_index, analyzer="code", similarity=sim,
                          precision="f64")
        hits = {
            (r.segment_id, r.doc_id): r.score
            for r in s.search("parse", k=10).collect()
        }
        assert hits
        for coord, terms in per_doc.items():
            tf = terms.count("parse")
            if tf == 0:
                assert coord not in hits
                continue
            dl = _quantized_len(len(terms))
            tfn = tf * math.log2(1 + avgdl / dl)
            assert hits[coord] == pytest.approx(A * tfn / (tfn + 1), rel=1e-6), (
                sim, coord,
            )


def test_ax2log_scores(spark, sim_index):
    """AxiomaticF2LOG.java:60-79: score = ln((N+1)/df) ·
    tf/(tf + s + s·dl/avgdl), s = 0.25."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="ax2log",
                      precision="f64")
    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    df = sum(1 for t in per_doc.values() if "parse" in t)
    avgdl = total / doc_count
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    assert hits
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        expect = math.log((doc_count + 1) / df) * tf / (
            tf + 0.25 + 0.25 * dl / avgdl
        )
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_ax1log_scores(spark, sim_index):
    """AxiomaticF1LOG.java:54-80: score = (1+ln(1+ln(tf+1))) ·
    (avgdl+s)/(avgdl+dl·s) · ln((N+1)/df), s = 0.25."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="ax1log",
                      precision="f64")
    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    df = sum(1 for t in per_doc.values() if "parse" in t)
    avgdl = total / doc_count
    hits = {(r.segment_id, r.doc_id): r.score for r in s.search("parse", k=10).collect()}
    assert hits
    for coord, terms in per_doc.items():
        tf = terms.count("parse")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        expect = (
            (1 + math.log(1 + math.log(tf + 1)))
            * ((avgdl + 0.25) / (avgdl + dl * 0.25))
            * math.log((doc_count + 1) / df)
        )
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord


def test_ax3_scores(spark, sim_index):
    """AxiomaticF3EXP.java:75-109 / AxiomaticF3LOG.java:66-99: score =
    max(0, (1+ln(1+ln(tf+1))) · idf − γ), γ = (dl−queryLen)·s·queryLen/avgdl
    (s=0.25; queryLen an explicit constructor parameter)."""
    from lucene_solr_spark.search import IndexSearcher

    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    df = sum(1 for t in per_doc.values() if "parse" in t)
    avgdl = total / doc_count
    for sim, qlen in (("ax3exp", 1), ("ax3log", 3)):
        s = IndexSearcher(spark, sim_index, analyzer="code", similarity=sim,
                          precision="f64", ax3_query_len=qlen)
        idf = (
            ((doc_count + 1) / df) ** 0.35
            if sim == "ax3exp"
            else math.log((doc_count + 1) / df)
        )
        hits = {
            (r.segment_id, r.doc_id): r.score
            for r in s.search("parse", k=100).collect()
        }
        assert hits
        for coord, terms in per_doc.items():
            tf = terms.count("parse")
            if tf == 0:
                assert coord not in hits
                continue
            dl = _quantized_len(len(terms))
            gamma = (dl - qlen) * 0.25 * qlen / avgdl
            expect = max(0.0, (1 + math.log(1 + math.log(tf + 1))) * idf - gamma)
            assert hits[coord] == pytest.approx(expect, rel=1e-6, abs=1e-12), (
                sim, coord,
            )


def test_ax2log_synonym_weight(spark, sim_index):
    """Regression: SynonymQuery under ax2log must use the F2LOG idf
    ln((N+1)/max df) for the pseudo-term (SynonymQuery.java:204-218), not
    fall through to the BM25 idf."""
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark.search.query import SynonymQuery

    s = IndexSearcher(spark, sim_index, analyzer="code", similarity="ax2log",
                      precision="f64")
    per_doc, doc_count, total = _naive_stats(spark, sim_index)
    avgdl = total / doc_count
    dfs = {
        t: sum(1 for terms in per_doc.values() if t in terms)
        for t in ("parse", "buffer")
    }
    hits = {
        (r.segment_id, r.doc_id): r.score
        for r in s.search_many(
            {0: SynonymQuery(("parse", "buffer"))}, k=None
        ).collect()
    }
    assert hits
    idf = math.log((doc_count + 1) / max(dfs.values()))
    for coord, terms in per_doc.items():
        tf = terms.count("parse") + terms.count("buffer")
        if tf == 0:
            assert coord not in hits
            continue
        dl = _quantized_len(len(terms))
        expect = idf * tf / (tf + 0.25 + 0.25 * dl / avgdl)
        assert hits[coord] == pytest.approx(expect, rel=1e-6), coord
