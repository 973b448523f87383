"""Driver-contract conformance: run every queries() entry in Spark AND its
oracle_sql() in DuckDB on the same parquet, compare row-count + sorted-value
equality — a local replica of the driver's CORRECTNESS gate (sf0.001 for
speed; the driver runs sf0.01)."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(SF_DIR, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # driver-style value compare at 4dp-rounded data; normalize -0.0 etc
        return round(v, 6)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def _rows_to_set(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


def _compare(spark, ddb, name, fn, sql):
    sdf = fn(spark, SF_DIR)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    rel = ddb.sql(sql)
    dcols = rel.columns
    drows = rel.fetchall()
    assert sorted(scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch {scols} vs {dcols}"
    )
    a = _rows_to_set(scols, srows)
    b = _rows_to_set([c.lower() for c in dcols], drows)
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    mismatches = [(x, y) for x, y in zip(a, b) if x != y]
    assert not mismatches, f"{name}: {len(mismatches)} value mismatches, first: {mismatches[:3]}"


def _all_ops():
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from lucene_solr_spark.graph import GRAPH_EXTRA_OPS, GRAPH_OPS
    from lucene_solr_spark.multimodal import MULTIMODAL_OPS
    from lucene_solr_spark.relational import RELATIONAL_EXTRA_OPS, RELATIONAL_OPS
    from lucene_solr_spark.textops import (
        FT_EXTRA_OPS,
        FT_OPS,
        TRAINING_EXTRA_OPS,
        TRAINING_OPS,
    )

    ops = {}
    for reg in (
        FT_OPS,
        RELATIONAL_OPS,
        GRAPH_OPS,
        TRAINING_OPS,
        MULTIMODAL_OPS,
        # folded per-variant ops — pytest-gated even though only the compound
        # form is in the driver's 50-entry window
        FT_EXTRA_OPS,
        RELATIONAL_EXTRA_OPS,
        TRAINING_EXTRA_OPS,
        GRAPH_EXTRA_OPS,
    ):
        ops.update(reg)
    return ops


OPS = _all_ops()


@pytest.mark.parametrize("name", sorted(OPS))
def test_query_vs_duckdb(spark, ddb, name):
    fn, sql = OPS[name]
    if sql is None:
        df = fn(spark, SF_DIR)
        assert df.count() >= 0
        return
    _compare(spark, ddb, name, fn, sql)


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert {"doc_id", "score", "rank"} <= set(df.columns)
    names = set(e.queries())
    assert set(e.oracle_sql()) <= names
    # the driver gates only the FIRST 50 queries() entries — the registry must
    # fit entirely inside that window so every op gets a CORRECTNESS row
    assert len(names) <= 50, f"driver window overflow: {len(names)} ops"


def test_freetext_suggest_survives_empty_docs(spark, tmp_path):
    """A zero-token document (no [a-z0-9] runs) must not crash the bigram
    slice (slice length is clamped to >= 0)."""
    from lucene_solr_spark.textops import freetext_suggest

    docs = spark.createDataFrame(
        [(0, "hash index scan"), (1, ""), (2, "!!! ???"), (3, "hash join")],
        "doc_id long, text string",
    )
    docs.write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    rows = freetext_suggest(spark, str(tmp_path)).collect()
    got = {(r.context, r.suggestion): r.weight for r in rows}
    assert got[("hash", "index")] == 1
    assert got[("hash", "join")] == 1
