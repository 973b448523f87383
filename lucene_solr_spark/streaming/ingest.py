"""Structured-Streaming ingest — near-real-time indexing.

The reference's "streaming" is NRT segment publishing, not event-time
processing (SURVEY §2.11): ``IndexWriter`` flushes new immutable segments and
``SearcherManager`` (``search/SearcherManager.java:58``,
``ControlledRealTimeReopenThread.java:38``) refreshes readers onto the new
commit point; Solr's ``UpdateStream``/``CommitStream``
(``solr/solrj/.../io/stream/UpdateStream.java:52``) are the ingest pipes and
``TopicStream``/``DaemonStream`` the checkpointed consumers.

Spark-native shape:

- ``readStream`` (any source) → ``writeStream.foreachBatch(ingest_batch)``:
  every micro-batch becomes a set of NEW immutable segments appended to the
  index (segment ids allocated above the current max — the flush), and the
  manifest append is the commit point flip. A fresh ``IndexSearcher`` sees the
  new segments (reader refresh); existing searchers keep their snapshot
  (SearcherManager semantics via the manifest snapshot taken at open).
- **Exactly-once across restarts**: foreachBatch may replay an epoch after a
  failure. The commit marker IS the manifest row — each batch's manifest rows
  carry ``{"stream": <stream_id>, "epoch": N}`` in their lineage json, keyed
  by the stream's checkpoint identity (so a second stream, or the same stream
  restarted with a fresh checkpoint dir whose epochs restart at 0, never
  collides). There is no separate marker file, hence no crash window between
  data commit and marker: segments are visible exactly when the epoch is
  committed, and ``build_index``'s per-artifact resume makes a half-written
  replay converge without duplicate rows.
- Merges keep running as ordinary jobs over the manifest
  (``run_merges``) — exactly the reference's ConcurrentMergeScheduler
  running beside the writer.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession

from ..index.build import DEFAULT_KEY, build_index
from ..index.manifest import next_segment_id, read_manifest


def _epoch_committed(
    spark: SparkSession, index_dir: str, stream_id: str, epoch_id: int
) -> bool:
    """True iff some manifest row's lineage records this (stream, epoch) —
    the manifest is the commit log, no side files."""
    if not os.path.exists(os.path.join(index_dir, "manifest")):
        return False
    from pyspark.sql import functions as F

    # pushed-down JSON probe: the manifest grows one row per segment, so a
    # collect-and-parse loop on the driver would cost O(index age) per
    # micro-batch; this stays a distributed limit-1 scan
    return (
        read_manifest(spark, index_dir)
        .filter(
            (F.get_json_object("lineage", "$.stream") == stream_id)
            & (F.get_json_object("lineage", "$.epoch") == str(epoch_id))
        )
        .limit(1)
        .count()
        > 0
    )


def ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    segments_per_batch: int = 4,
    analyzer: str = "code",
    key_cols=DEFAULT_KEY,
    content_col: str = "content",
    stored_cols: tuple = (),
    stream_id: str = "default",
) -> dict | None:
    """foreachBatch body: one micro-batch → ``segments_per_batch`` new
    segments. Idempotent per (stream_id, epoch) — replay-safe; the manifest
    append inside build_index is the atomic commit."""
    spark = batch_df.sparkSession
    if _epoch_committed(spark, index_dir, stream_id, int(epoch_id)):
        return None  # epoch replayed after failure — already committed
    if os.path.exists(os.path.join(index_dir, "manifest")):
        base = next_segment_id(spark, index_dir)
    else:
        base = 0
    return build_index(
        spark,
        batch_df,
        index_dir,
        num_segments=segments_per_batch,
        analyzer=analyzer,
        key_cols=key_cols,
        content_col=content_col,
        stored_cols=stored_cols,
        segment_base=base,
        resume=True,
        extra_lineage={"stream": stream_id, "epoch": int(epoch_id)},
    )


def topic_stream(
    spark: SparkSession,
    index_dir: str,
    query,
    checkpoint_path: str,
    k: int | None = None,
    analyzer: str = "code",
    auto_commit: bool = True,
):
    """TopicStream analogue (``solr/solrj/.../io/stream/TopicStream.java:71``):
    a checkpointed pub/sub over query results — each call returns hits from
    segments that appeared since the last call.

    Segments are immutable and the manifest is append-only, so "new docs
    since checkpoint" ≡ "docs in segments not yet seen" (a merge republishes
    nothing: merged segments contain only already-seen docs, so merge outputs
    whose sources were ALL seen are marked seen too; a merge with any unseen
    source is delivered whole, which re-emits its seen sources' docs — the
    documented at-least-once corner, same as TopicStream after a shard merge).

    Delivery contract: with ``auto_commit=True`` (default) the checkpoint
    advances eagerly — at-most-once if the consumer's downstream action fails.
    With ``auto_commit=False`` the call returns ``(hits, commit)``; invoke
    ``commit()`` AFTER the hits are durably consumed for at-least-once (the
    checkpointed TopicStream contract).
    """
    import json as _json

    from ..index.manifest import live_segments, manifest_rows
    from ..search import IndexSearcher

    seen: set[int] = set()
    if os.path.exists(checkpoint_path):
        with open(checkpoint_path) as f:
            seen = set(_json.load(f)["seen_segments"])

    rows = manifest_rows(spark, index_dir)
    merged_from = {
        int(r["segment_id"]): set(
            _json.loads(r.get("lineage") or "{}").get("merged_from", [])
        )
        for r in rows
    }
    # a merged segment whose sources were all seen carries no new docs
    for seg, sources in merged_from.items():
        if sources and sources <= seen:
            seen.add(seg)

    live = set(live_segments(spark, index_dir))
    new_segments = sorted(live - seen)
    searcher = IndexSearcher(spark, index_dir, analyzer=analyzer)
    if new_segments:
        searcher.live = new_segments  # restrict collection to unseen segments
    hits = (
        searcher.search_many({0: query}, k=k)
        if new_segments
        else spark.createDataFrame([], "qid int, segment_id int, doc_id bigint, score double")
    )
    out = hits.drop("qid") if "qid" in hits.columns else hits

    def commit() -> None:
        tmp = checkpoint_path + ".tmp"
        with open(tmp, "w") as f:
            _json.dump({"seen_segments": sorted(seen | live)}, f)
        os.replace(tmp, checkpoint_path)

    if auto_commit:
        commit()
        return out
    return out, commit


def index_stream(
    stream_df: DataFrame,
    index_dir: str,
    checkpoint_dir: str,
    segments_per_batch: int = 4,
    analyzer: str = "code",
    key_cols=DEFAULT_KEY,
    content_col: str = "content",
    stored_cols: tuple = (),
    trigger: dict | None = None,
):
    """Start the NRT indexing stream. ``trigger`` defaults to availableNow
    (drain-and-stop, the CommitStream pattern); pass
    ``{"processingTime": "10 seconds"}`` for a DaemonStream-style loop."""

    # commit identity = the stream's checkpoint dir: epochs restart at 0 in a
    # fresh checkpoint, so the (stream_id, epoch) pair stays unique per stream
    stream_id = os.path.realpath(checkpoint_dir)

    def _body(df: DataFrame, epoch: int) -> None:
        ingest_batch(
            df,
            epoch,
            index_dir,
            segments_per_batch=segments_per_batch,
            analyzer=analyzer,
            key_cols=key_cols,
            content_col=content_col,
            stored_cols=stored_cols,
            stream_id=stream_id,
        )

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(**trigger)
    return writer.start()
