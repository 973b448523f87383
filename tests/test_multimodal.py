"""Catalyst vs Arrow parity for the multimodal kernels + plan assertions.

The driver-gated ops run the pure-Catalyst path (no Python in the plan);
the mapInPandas kernels are the seam for real media decoders — both paths
must produce identical rows on the same payloads.
"""

import os

import pytest
from pyspark.sql import functions as F

from lucene_solr_spark.multimodal import (
    decode_image,
    extract_features,
    extract_features_arrow,
    sample_frames,
    sample_frames_arrow,
    with_payload,
)

SF_DIR = os.environ.get("LSS_TEST_SF_DIR", "/root/testdata/sf0.001")


@pytest.fixture(scope="module")
def payloads(spark):
    docs = spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))
    return with_payload(docs).cache()


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_features_catalyst_equals_arrow(payloads):
    assert _rows(extract_features(payloads)) == _rows(extract_features_arrow(payloads))


def test_frames_catalyst_equals_arrow(payloads):
    assert _rows(sample_frames(payloads, every=4)) == _rows(
        sample_frames_arrow(payloads, every=4)
    )


def test_catalyst_plan_has_no_python(payloads):
    for df in (extract_features(payloads), sample_frames(payloads)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "MapInPandas" not in plan and "BatchEvalPython" not in plan, plan


def test_empty_payload_semantics(spark):
    docs = spark.createDataFrame(
        [(1, "abc"), (2, "")], "doc_id bigint, text string"
    )
    p = with_payload(docs)
    feats = {r.doc_id: r for r in extract_features(p).collect()}
    assert feats[2].n_bytes == 0 and feats[2].byte_sum == 0 and feats[2].n_frames == 0
    assert feats[1].byte_sum == ord("a") + ord("b") + ord("c")
    # empty payloads emit no frames on either path
    assert sample_frames(p).filter(F.col("doc_id") == 2).count() == 0
    assert sample_frames_arrow(p).filter(F.col("doc_id") == 2).count() == 0


def test_decode_image_is_an_explicit_stub():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG")


def test_arrow_threshold_routes_large_payloads(spark):
    """With arrow_threshold set, rows straddling the threshold split between
    the Catalyst projection and the Arrow kernel — results identical to the
    pure-Catalyst path at every size, and the big rows really do leave the
    codegen'd branch (MapInPandas appears in the plan ONLY when asked for)."""
    sizes = [0, 1, 100, 4096, 4097, 65536]  # straddle threshold=4096
    docs = spark.createDataFrame(
        [(i, "x" * n) for i, n in enumerate(sizes)], "doc_id bigint, text string"
    )
    p = with_payload(docs)
    pure = _rows(extract_features(p))
    hybrid = _rows(extract_features(p, arrow_threshold=4096))
    assert hybrid == pure

    plan = extract_features(p, arrow_threshold=4096)._jdf.queryExecution()
    assert "MapInPandas" in plan.executedPlan().toString()
    gate_plan = extract_features(p)._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" not in gate_plan
