"""Carrot2 STC role — suffix-tree clustering as distributed frequent-phrase
mining + overlap-merge components (Zamir & Etzioni STC; dispatched by
``solr/contrib/clustering``'s ClusteringComponent). The DuckDB-oracled
corpus op is gated in tests/test_entry.py (``stc_clusters``); here: the
algorithm separates topically distinct doc groups and merges base clusters
only above the 50%-both-ways overlap bar."""

from lucene_solr_spark.textops import stc_clusters


def _write_docs(spark, tmp_path, rows):
    df = spark.createDataFrame(rows, "doc_id long, text string")
    df.write.parquet(str(tmp_path / "documents.parquet"))
    return str(tmp_path)


def test_two_topics_two_clusters(spark, tmp_path):
    rows = []
    for i in range(6):
        rows.append((i, "spark query engine runs the spark query engine fast"))
    for i in range(6, 12):
        rows.append((i, "index merge policy compacts the index merge policy"))
    sf = _write_docs(spark, tmp_path, rows)
    out = stc_clusters(spark, sf, min_df=3, top_k=10).collect()
    labels = {r["label"]: r for r in out}
    # two disjoint topics → at least two clusters, each covering its 6 docs
    assert len(labels) >= 2
    sizes = sorted(r["n_docs"] for r in out)
    assert sizes[-1] == 6 and sizes[-2] == 6
    # every label belongs to exactly one topic's phrase space
    for lab in labels:
        assert ("spark" in lab or "query" in lab or "engine" in lab or "fast" in lab or "runs" in lab or lab == "the") ^ (
            "index" in lab or "merge" in lab or "policy" in lab or "compacts" in lab
        ) or lab == "the"


def test_overlap_below_threshold_does_not_merge(spark, tmp_path):
    # phrase A covers docs 0-5, phrase B covers docs 4-9: overlap 2/6 < 50%
    rows = []
    for i in range(6):
        rows.append((i, "alpha beta alpha beta alpha beta"))
    for i in range(4, 10):
        rows.append((i + 100, "gamma delta gamma delta gamma delta"))
    sf = _write_docs(spark, tmp_path, rows)
    out = stc_clusters(spark, sf, min_df=3, top_k=10).collect()
    assert len(out) >= 2  # disjoint doc sets stay separate clusters


def test_non_merging_singleton_cluster_survives(spark, tmp_path):
    # "zeta" docs contain one word, so the only base cluster they produce is
    # the single phrase "zeta" — it has no >50%-both-ways merge partner.
    # connected_components drops self-pairs, so without the isolated-pid
    # re-add the singleton vanished while the oracle's recursive CTE kept it
    # (ADVICE r4 high).
    rows = []
    for i in range(6):
        rows.append((i, "alpha beta alpha beta alpha beta"))
    for i in range(3):
        rows.append((i + 100, "zeta"))
    sf = _write_docs(spark, tmp_path, rows)
    out = stc_clusters(spark, sf, min_df=3, top_k=10).collect()
    labels = {r["label"]: r for r in out}
    assert "zeta" in labels
    assert labels["zeta"]["n_docs"] == 3
