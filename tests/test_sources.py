"""Source wrappers: CSV/JSON/text ingest → canonical doc schema → index →
search parity with the parquet path (format must not change results)."""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def corpus_pdf(tiny_corpus):
    return tiny_corpus


def _search_scores(spark, index_dir, q="parse AND http"):
    from lucene_solr_spark.search import IndexSearcher

    s = IndexSearcher(spark, index_dir, analyzer="code")
    return sorted(
        float(np.float32(r.score)) for r in s.search(q, k=None).collect()
    )


def test_csv_roundtrip_index(spark, corpus_pdf, tmp_path_factory):
    from lucene_solr_spark.sources import index_docs, read_docs

    root = tmp_path_factory.mktemp("src")
    csv_path = str(root / "docs_csv")
    df = spark.createDataFrame(corpus_pdf)
    df.select("repo", "path", "commit", "lang", "content").write.option(
        "header", True
    ).option("escape", '"').csv(csv_path)

    docs = read_docs(spark, csv_path, fmt="csv")
    assert sorted(docs.columns) == sorted(["repo", "path", "commit", "lang", "content"])
    assert docs.count() == len(corpus_pdf)

    idx = str(root / "idx_csv")
    metrics = index_docs(spark, csv_path, idx, fmt="csv", num_segments=4)
    assert metrics["max_doc"] == len(corpus_pdf)

    # parity with the parquet-built index
    pq_idx = str(root / "idx_pq")
    from lucene_solr_spark.index import build_index

    build_index(spark, df, pq_idx, num_segments=4, analyzer="code")
    assert _search_scores(spark, idx) == _search_scores(spark, pq_idx)


def test_json_ingest_with_mapping(spark, corpus_pdf, tmp_path_factory):
    from lucene_solr_spark.sources import read_docs

    root = tmp_path_factory.mktemp("srcj")
    json_path = str(root / "docs_json")
    df = spark.createDataFrame(corpus_pdf)
    df.selectExpr(
        "repo AS repository", "path AS file_path", "commit", "lang", "content AS body"
    ).write.json(json_path)

    docs = read_docs(
        spark,
        json_path,
        fmt="json",
        mapping={"repo": "repository", "path": "file_path", "content": "body"},
    )
    assert docs.count() == len(corpus_pdf)
    orig = {(r.repo, r.path) for r in df.select("repo", "path").collect()}
    got = {(r.repo, r.path) for r in docs.select("repo", "path").collect()}
    assert got == orig


def test_text_ingest_synthesizes_keys(spark, tmp_path_factory):
    from lucene_solr_spark.sources import normalize_docs

    df = spark.createDataFrame(
        [("some parse http content",), ("another buffer line",)], ["content"]
    )
    docs = normalize_docs(df)
    rows = docs.collect()
    assert {r.repo for r in rows} == {"default"}
    assert all(len(r.path) == 64 for r in rows)  # sha256 identity


def test_xml_ingest(spark, tmp_path):
    """Solr update-XML: <add><doc><field name=..>..</field></doc></add>."""
    from lucene_solr_spark.sources import read_xml_docs

    xml = """<add>
      <doc>
        <field name="repo">org/r1</field>
        <field name="path">src/a.py</field>
        <field name="commit">c1</field>
        <field name="content">parse the buffer</field>
      </doc>
      <doc>
        <field name="path">src/b.py</field>
        <field name="content">read file</field>
      </doc>
    </add>"""
    src = tmp_path / "batch1.xml"
    src.write_text(xml)
    docs = read_xml_docs(spark, str(tmp_path))
    rows = {r.path: r for r in docs.collect()}
    assert set(rows) == {"src/a.py", "src/b.py"}
    assert rows["src/a.py"].repo == "org/r1"
    assert rows["src/a.py"].content == "parse the buffer"
    assert rows["src/b.py"].repo == "default"  # synthesized defaults
    assert rows["src/b.py"].commit == "HEAD"


def test_verify_content_sha(spark, tiny_corpus, tiny_index):
    from lucene_solr_spark.check import verify_content_sha

    index_dir, _ = tiny_index
    docs = spark.createDataFrame(tiny_corpus)
    ok = verify_content_sha(spark, docs, index_dir)
    assert ok == {"missing_in_index": 0, "extra_in_index": 0, "sha_mismatch": 0}
    # a corrupted source row must be flagged
    import pyspark.sql.functions as F

    bad = docs.withColumn(
        "content",
        F.when(F.col("path") == docs.collect()[0].path, F.lit("tampered")).otherwise(
            F.col("content")
        ),
    )
    flagged = verify_content_sha(spark, bad, index_dir)
    assert flagged["sha_mismatch"] >= 1


def test_spark_submit_entry_runs_locally(spark, tiny_corpus, tmp_path_factory):
    """Drive scripts/spark_submit_job.py's command functions in-process (the
    cluster invocation differs only in session ownership)."""
    import json
    import subprocess
    import sys
    import os

    base = str(tmp_path_factory.mktemp("submit"))
    src = f"{base}/docs.parquet"
    spark.createDataFrame(tiny_corpus).write.parquet(src)
    idx = f"{base}/idx"
    env = dict(os.environ, PYTHONPATH="/root/repo")
    r1 = subprocess.run(
        [sys.executable, "scripts/spark_submit_job.py", "build",
         "--input", src, "--index", idx, "--segments", "4"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r1.returncode == 0, r1.stderr[-2000:]
    built = json.loads(r1.stdout.strip().splitlines()[-1])
    assert built["max_doc"] == len(tiny_corpus)
    r2 = subprocess.run(
        [sys.executable, "scripts/spark_submit_job.py", "query",
         "--index", idx, "--q", "parse AND http", "--k", "3"],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r2.returncode == 0, r2.stderr[-2000:]
    hits = json.loads(r2.stdout.strip().splitlines()[-1])["hits"]
    assert 0 < len(hits) <= 3 and "score" in hits[0]
    r3 = subprocess.run(
        [sys.executable, "scripts/spark_submit_job.py", "check",
         "--index", idx, "--input", src],
        capture_output=True, text=True, cwd="/root/repo", env=env, timeout=300,
    )
    assert r3.returncode == 0, r3.stderr[-2000:]
    chk = json.loads(r3.stdout.strip().splitlines()[-1])
    assert chk["structural"]["segments_checked"] == 4, chk
    assert all(
        v == 0 for k, v in chk["structural"].items() if k != "segments_checked"
    ), chk
    assert all(v == 0 for v in chk["content_sha"].values()), chk


def test_read_jdbc_against_live_derby(spark, tmp_path):
    """JDBCStream against a LIVE database (embedded Derby ships with the
    Spark distro): write a table over JDBC, read it back through read_jdbc
    with a pushed predicate and range-partitioned parallel connections.
    Derby folds unquoted identifiers to uppercase, hence the column names."""
    from lucene_solr_spark.sources import read_jdbc

    url = f"jdbc:derby:{tmp_path}/jdbc_db;create=true"
    driver = "org.apache.derby.jdbc.EmbeddedDriver"
    spark.range(0, 100).selectExpr("id AS ID", "id * 2 AS V").write.format(
        "jdbc"
    ).option("url", url).option("dbtable", "probe").option(
        "driver", driver
    ).mode("overwrite").save()

    out = read_jdbc(
        spark, url, "probe",
        partition_column="ID", lower_bound=0, upper_bound=100,
        num_partitions=4, predicate="ID < 50", driver=driver,
    )
    assert out.rdd.getNumPartitions() == 4  # parallel range connections
    rows = out.collect()
    assert len(rows) == 50  # predicate executed remotely
    assert sum(r.V for r in rows) == 2 * sum(range(50))


def test_sql_handler_rejects_dml(spark):
    import pytest

    from lucene_solr_spark.sqlhandler import sql_handler

    sf = "/root/testdata/sf0.001"
    assert sql_handler(spark, sf, "SELECT count(*) AS n FROM region").first().n == 5
    assert sql_handler(spark, sf, "WITH x AS (SELECT 1 AS a) SELECT * FROM x").count() == 1
    for bad in ("DROP TABLE region", "INSERT INTO region VALUES (9)", "UPDATE region SET r_name='x'"):
        with pytest.raises(ValueError):
            sql_handler(spark, sf, bad)
