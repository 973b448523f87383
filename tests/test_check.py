"""CheckIndex analogue: a freshly built index, a merged index, and a
streaming-extended index must all pass every structural invariant; a
corrupted posting row must be caught."""

import os

import numpy as np
import pytest


def _assert_clean(result):
    bad = {k: v for k, v in result.items() if k.startswith("bad_") and v != 0}
    assert not bad, bad


def test_fresh_index_clean(spark, tiny_index):
    from lucene_solr_spark.check import check_index

    res = check_index(spark, tiny_index[0])
    assert res["segments_checked"] == 4
    _assert_clean(res)


def test_merged_index_clean(spark, tiny_corpus, tmp_path_factory):
    from lucene_solr_spark.check import check_index
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.index.manifest import live_segments
    from lucene_solr_spark.index.merge import delete_docs, merge_segments

    d = str(tmp_path_factory.mktemp("chk") / "idx")
    df = spark.createDataFrame(tiny_corpus)
    build_index(spark, df, d, num_segments=5, analyzer="code")
    import pyspark.sql.functions as F

    docs = spark.read.parquet(os.path.join(d, "docs"))
    delete_docs(spark, d, docs.filter(F.col("doc_id") % 7 == 0))
    merge_segments(spark, d, live_segments(spark, d), hot_df_threshold=50)
    res = check_index(spark, d)
    assert res["segments_checked"] == 1
    _assert_clean(res)


def test_corruption_detected(spark, tiny_corpus, tmp_path_factory):
    """Flip a posting blob's df → the checker must flag it."""
    import pandas as pd
    import pyspark.sql.functions as F

    from lucene_solr_spark.check import check_index
    from lucene_solr_spark.index import build_index

    d = str(tmp_path_factory.mktemp("chk") / "bad")
    df = spark.createDataFrame(tiny_corpus)
    build_index(spark, df, d, num_segments=2, analyzer="code")
    idx = spark.read.parquet(os.path.join(d, "index"))
    # append a bogus posting row: df=999 but a 1-doc blob
    row = idx.filter(F.col("kind") == 0).limit(1).toPandas()
    row["df"] = 999
    spark.createDataFrame(row).select(*idx.columns).write.mode("append").partitionBy(
        "kind"
    ).parquet(os.path.join(d, "index"))
    res = check_index(spark, d)
    assert res["bad_df"] >= 1


def test_full_block_index_clean(spark, tmp_path_factory):
    """Terms with df >= 128 produce FOR-packed full blocks — the checker must
    decode the blocked format (it silently passed on VByte-only tiny corpora
    before)."""
    from lucene_solr_spark.check import check_index
    from lucene_solr_spark.index import build_index

    rows = [
        ("r", f"f{i}.py", "c", f"common token{i % 37} filler{i % 11} x{i}")
        for i in range(1200)
    ]
    df = spark.createDataFrame(
        rows, "repo string, path string, commit string, content string"
    )
    d = str(tmp_path_factory.mktemp("chk") / "blocks")
    build_index(spark, df, d, num_segments=2, analyzer="code")
    # sanity: the corpus really has multi-block terms
    import pyspark.sql.functions as F

    idx = spark.read.parquet(os.path.join(d, "index"))
    max_df = idx.filter(F.col("kind") == 0).agg(F.max("df")).collect()[0][0]
    assert max_df >= 256
    _assert_clean(check_index(spark, d))


def test_check_offsets_invariant(spark, tmp_path_factory):
    """Offset streams verify clean on an offsets build; a posting row whose
    off_blob holds the wrong occurrence count is detected."""
    import os

    import pyspark.sql.functions as F

    from lucene_solr_spark.check import check_index
    from lucene_solr_spark.corpus import synth_corpus_local
    from lucene_solr_spark.index import build_index

    d = str(tmp_path_factory.mktemp("chk_off") / "idx")
    docs = spark.createDataFrame(synth_corpus_local(80))
    build_index(spark, docs, d, num_segments=2, analyzer="code", store_offsets=True)
    res = check_index(spark, d)
    assert res["bad_offsets"] == 0

    # corrupt: append a posting row whose off stream is the POS stream (a
    # valid vbyte chain with ttf values — half the required 2*ttf)
    idx = spark.read.parquet(os.path.join(d, "index"))
    row = idx.filter((F.col("kind") == 0) & (F.col("ttf") > 1)).limit(1).toPandas()
    row["off_blob"] = row["pos_blob"]
    spark.createDataFrame(row).select(*idx.columns).write.mode("append").partitionBy(
        "kind"
    ).parquet(os.path.join(d, "index"))
    res2 = check_index(spark, d)
    assert res2["bad_offsets"] >= 1
