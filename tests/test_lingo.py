"""Lingo role (Carrot2 ``CarrotClusteringEngine.java`` — Osiński & Weiss
SVD-based search-results clustering): deterministic deflated power
iteration in 6-dp cross-engine lockstep; labels-first via concept↔candidate
cosine with greedy dedupe; docs assigned to their best LABEL. Value parity
with the unrolled-CTE DuckDB twin runs in tests/test_entry.py
(lingo_clusters, hash-exact at sf0.001 and sf0.01)."""

SF = "/root/testdata/sf0.001"


def test_lingo_output_shape_and_determinism(spark):
    from lucene_solr_spark.textops import lingo_clusters

    a = lingo_clusters(spark, SF).collect()
    b = lingo_clusters(spark, SF).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # fully deterministic
    rows = {r["doc_id"]: (r["cluster"], r["label"]) for r in a}
    assert len(rows) == len(a)  # one cluster per doc
    # labels are deduped across concepts (the greedy lab{c} chain)
    by_cluster = {}
    for c, lab in rows.values():
        by_cluster[c] = lab
    assert len(set(by_cluster.values())) == len(by_cluster)
    # at least two populated clusters with topical (feature-term) labels
    assert len(by_cluster) >= 2
    for lab in by_cluster.values():
        assert all(t.isalnum() for t in lab.split(" "))


def test_lingo_concepts_decorrelate(spark):
    """Deflation works: the top-2 concept vectors from the engine's power
    iteration are near-orthogonal (|cos| < 0.2 after 6-dp rounding)."""
    import math

    from lucene_solr_spark import textops as T

    # reuse the op's own machinery by re-deriving B and iterating like
    # lingo_clusters does (pure driver math over the collected Gram matrix)
    from pyspark.sql import functions as F

    hits = (
        T._docs(spark, SF)
        .filter(F.lower(F.col("text")).contains(T._LINGO_FILTER))
        .select("doc_id", F.lower(F.col("text")).alias("text"))
    )
    n = hits.count()
    tf = (
        hits.select(
            "doc_id",
            F.explode(
                F.expr("regexp_extract_all(text, '[a-z0-9]+', 0)")
            ).alias("term"),
        )
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    feats = {
        r["term"]: math.log((n + 1.0) / (r["df"] + 1.0))
        for r in dfreq.orderBy(F.col("df").desc(), F.col("term").asc())
        .limit(T._LINGO_FEATURES)
        .collect()
    }
    idf_map = F.create_map(*[F.lit(v) for kv in feats.items() for v in kv])
    x = tf.filter(F.col("term").isin(list(feats))).select(
        "doc_id", "term",
        F.round(idf_map[F.col("term")] * (1.0 + F.log(F.col("tf").cast("double"))), 6).alias("xv"),
    )
    b_rows = (
        x.alias("a").join(x.alias("b"), "doc_id")
        .groupBy(F.col("a.term").alias("ti"), F.col("b.term").alias("tj"))
        .agg(F.round(F.sum(F.col("a.xv") * F.col("b.xv")), 6).alias("bv"))
        .collect()
    )
    terms = sorted({r["ti"] for r in b_rows})
    B = {(r["ti"], r["tj"]): r["bv"] for r in b_rows}
    us = []
    for _c in range(2):
        v = {t: 1.0 for t in terms}
        for _t in range(T._LINGO_ITERS):
            w = {ti: sum(B.get((ti, tj), 0.0) * v[tj] for tj in terms) for ti in terms}
            nrm = math.sqrt(sum(wv * wv for wv in w.values()))
            v = {t: (0.0 if nrm == 0 else round(w[t] / nrm, 6)) for t in terms}
        lam = round(sum(B.get((ti, tj), 0.0) * v[ti] * v[tj] for ti in terms for tj in terms), 6)
        B = {(ti, tj): round(B.get((ti, tj), 0.0) - lam * v[ti] * v[tj], 6)
             for ti in terms for tj in terms}
        us.append(v)
    dot = sum(us[0][t] * us[1][t] for t in terms)
    assert abs(dot) < 0.2
