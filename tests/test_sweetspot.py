"""SweetSpotSimilarity (lucene/misc SweetSpotSimilarity.java): plateau
lengthNorm + baselineTf over the classic idf — the first NON-monotone-in-
length similarity, exercising the UNPRUNABLE_SIMS bypass (pruned kernels'
(max_freq, min_norm) bounds are inadmissible for a plateau)."""

import numpy as np
import pytest


def test_norm_table_formula():
    from lucene_solr_spark.search import bm25
    from lucene_solr_spark.smallfloat import byte4_to_int

    t = bm25.sweetspot_norm_cache(3, 12, 0.5)
    lens = byte4_to_int(np.arange(256, dtype=np.uint8)).astype(np.float64)
    for b in (1, 3, 7, 12, 13, 40, 255):
        l = lens[b]
        expect = 1.0 / np.sqrt(0.5 * (abs(l - 3) + abs(l - 12) - 9) + 1.0)
        assert t[b] == pytest.approx(expect, rel=1e-12), b
    assert t[0] == 0.0
    # plateau: flat 1.0 inside [3,12], lower on BOTH sides
    assert t[3] == t[12] == 1.0
    assert t[1] < 1.0 and t[40] < 1.0


@pytest.fixture(scope="module")
def ss_index(spark, tmp_path_factory):
    from lucene_solr_spark.index import build_index

    texts = [
        "hit",                                   # len 1 (below plateau)
        "hit alpha beta gamma delta",            # len 5 (inside plateau)
        "hit " + " ".join(f"w{i}" for i in range(39)),  # len 40 (above)
        "hit hit alpha beta",                    # len 4, tf 2
        "no match doc",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "ext_id bigint, text string"
    )
    d = str(tmp_path_factory.mktemp("ss") / "idx")
    build_index(spark, docs, d, num_segments=1, analyzer="simple",
                key_cols=("ext_id",), content_col="text")
    return d


def test_scores_match_manual(spark, ss_index):
    from lucene_solr_spark.index.read import norms_table, term_postings
    from lucene_solr_spark.search import IndexSearcher, bm25
    from lucene_solr_spark import smallfloat as sf

    s = IndexSearcher(spark, ss_index, analyzer="simple",
                      similarity="sweetspot", precision="f64")
    got = {r.doc_id: float(r.score)
           for r in s.search_many({0: "hit"}, k=None).collect()}
    assert len(got) == 4
    posts = term_postings(spark, ss_index, ["hit"]).collect()
    norms = {r.doc_id: r.norm_byte for r in norms_table(spark, ss_index).collect()}
    df = len(posts)
    n_docs = s.doc_count
    # classic_idf rounds to float32 (ClassicSimilarity parity), like the
    # engine's weights_for does for classic AND sweetspot
    idf = float(bm25.classic_idf(np.array([df]), n_docs)[0])
    table = bm25.sweetspot_norm_cache(
        IndexSearcher.SS_MIN, IndexSearcher.SS_MAX, IndexSearcher.SS_STEEP
    )
    for r in posts:
        expect = idf * np.sqrt(r.freq) * table[norms[r.doc_id]]
        assert got[r.doc_id] == pytest.approx(float(expect), rel=1e-9)


def test_plateau_beats_short_doc(spark, ss_index):
    """The distinguishing behavior vs classic: a doc inside the sweet spot
    outranks a shorter doc with the same tf (classic would rank the short
    doc first)."""
    from lucene_solr_spark.search import IndexSearcher

    ext = {r.doc_id: r.ext_id for r in
           spark.read.parquet(ss_index + "/docs")
           .select("doc_id", "ext_id").collect()}
    ss = IndexSearcher(spark, ss_index, analyzer="simple",
                       similarity="sweetspot", precision="f64")
    got = {ext[r.doc_id]: float(r.score)
           for r in ss.search_many({0: "hit"}, k=None).collect()}
    assert got[1] > got[0]  # len-5 plateau doc beats len-1 doc
    cl = IndexSearcher(spark, ss_index, analyzer="simple",
                       similarity="classic", precision="f64")
    gotc = {ext[r.doc_id]: float(r.score)
            for r in cl.search_many({0: "hit"}, k=None).collect()}
    assert gotc[0] > gotc[1]  # classic prefers the shorter doc


def test_topk_equals_exhaustive_unprunable(spark, ss_index):
    """k-bounded searches must bypass the pruned kernels (UNPRUNABLE_SIMS)
    and still return the exhaustive top-k, for term / OR / AND shapes."""
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, ss_index, analyzer="simple",
                      similarity="sweetspot", precision="f64")
    for q in ("hit", "hit OR alpha", "hit AND alpha"):
        top = [((r.segment_id, r.doc_id), round(float(r.score), 9))
               for r in s.search_many({0: q}, k=3).orderBy("rank").collect()]
        allm = sorted(
            (((r.segment_id, r.doc_id), round(float(r.score), 9))
             for r in s.search_many({0: q}, k=None).collect()),
            key=lambda x: (-x[1], x[0]),
        )[:3]
        assert top == allm, q
