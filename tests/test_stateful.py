"""applyInPandasWithState sessionization: the streaming operator must emit
exactly the sessions its batch twin computes, across multi-batch delivery
with keyed state carrying open sessions between micro-batches."""

import os
import shutil

import pytest


@pytest.fixture(scope="module")
def events_pdf(spark):
    return (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .select("user_id", "ts", "value")
        .toPandas()
        .sort_values("ts")
        .reset_index(drop=True)
    )


def test_stream_sessions_equal_batch(spark, events_pdf, tmp_path_factory):
    from lucene_solr_spark.streaming.stateful import sessionize_batch, sessionize_stream

    base = str(tmp_path_factory.mktemp("sess"))
    src, out, ckpt = f"{base}/src", f"{base}/out", f"{base}/ckpt"
    os.makedirs(src)

    # 3 micro-batches in event-time order + a far-future closer per key so
    # every real session closes inside the stream
    import pandas as pd

    n = len(events_pdf)
    cuts = [0, n // 3, 2 * n // 3, n]
    spark_parts = [events_pdf.iloc[cuts[i] : cuts[i + 1]] for i in range(3)]
    closers = pd.DataFrame(
        {
            "user_id": sorted(events_pdf["user_id"].unique()),
            "ts": pd.Timestamp("2030-01-01"),
            "value": 0.0,
        }
    )
    spark_parts.append(closers)

    schema = "user_id bigint, ts timestamp, value double"
    # write the batches first, sequentially — FileStreamSource orders files
    # by modification timestamp, so maxFilesPerTrigger=1 replays them as
    # four micro-batches in event-time order
    import time

    for part in spark_parts:
        spark.createDataFrame(part, schema).coalesce(1).write.mode("append").parquet(src)
        time.sleep(1.1)

    stream = spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800.0)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    got = spark.read.parquet(out)
    batch = sessionize_batch(
        spark.createDataFrame(events_pdf, schema), gap_seconds=1800.0
    ).select("user_id", "session_start", "session_end", "n_events", "sum_value")

    def norm(rows):
        return sorted(
            (r.user_id, r.session_start, r.session_end, r.n_events, round(r.sum_value, 6))
            for r in rows
        )

    assert norm(got.collect()) == norm(batch.collect())


def test_batch_twin_matches_duckdb_oracle(spark):
    """The driver-gate replica covers sessionize_events; assert here the
    session COUNT is stable so a refactor can't silently change the gap."""
    from lucene_solr_spark.relational import sessionize_events

    df = sessionize_events(spark, "/root/testdata/sf0.001")
    n_sessions = df.count()
    n_events = df.agg({"n_events": "sum"}).collect()[0][0]
    assert n_events == 1000
    assert 15 <= n_sessions <= 1000
