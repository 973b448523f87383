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
  failure. Each (checkpoint, epoch) commit is recorded in
  ``<index_dir>/stream_commits``; a replayed epoch is skipped — combined with
  the per-partition resume of ``build_index`` this is the north-rule
  checkpoint/lineage story extended to continuous ingest.
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


def _commits_path(index_dir: str) -> str:
    return os.path.join(index_dir, "stream_commits")


def _committed_epochs(index_dir: str) -> dict[str, int]:
    p = _commits_path(index_dir)
    if not os.path.exists(p):
        return {}
    with open(p) as f:
        return json.load(f)


def _record_epoch(index_dir: str, epoch_id: int, base: int) -> None:
    commits = _committed_epochs(index_dir)
    commits[str(epoch_id)] = base
    p = _commits_path(index_dir)
    tmp = p + ".tmp"
    with open(tmp, "w") as f:
        json.dump(commits, f)
    os.replace(tmp, p)  # atomic commit marker


def ingest_batch(
    batch_df: DataFrame,
    epoch_id: int,
    index_dir: str,
    segments_per_batch: int = 4,
    analyzer: str = "code",
    key_cols=DEFAULT_KEY,
    content_col: str = "content",
    stored_cols: tuple = (),
) -> dict | None:
    """foreachBatch body: one micro-batch → ``segments_per_batch`` new
    segments. Idempotent per epoch (replay-safe)."""
    if str(epoch_id) in _committed_epochs(index_dir):
        return None  # epoch replayed after failure — already committed
    spark = batch_df.sparkSession
    if os.path.exists(os.path.join(index_dir, "manifest")):
        base = next_segment_id(spark, index_dir)
    else:
        base = 0
    metrics = build_index(
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
    )
    _record_epoch(index_dir, epoch_id, base)
    return metrics


def topic_stream(
    spark: SparkSession,
    index_dir: str,
    query,
    checkpoint_path: str,
    k: int | None = None,
    analyzer: str = "code",
):
    """TopicStream analogue (``solr/solrj/.../io/stream/TopicStream.java:71``):
    a checkpointed pub/sub over query results — each call returns hits from
    segments that appeared since the last call, then advances the checkpoint.

    Segments are immutable and the manifest is append-only, so "new docs
    since checkpoint" ≡ "docs in segments not yet seen" (a merge republishes
    nothing: merged segments contain only already-seen docs, so merge outputs
    whose sources were all seen are marked seen too).
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

    tmp = checkpoint_path + ".tmp"
    with open(tmp, "w") as f:
        _json.dump({"seen_segments": sorted(seen | live)}, f)
    os.replace(tmp, checkpoint_path)
    return out


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
        )

    writer = stream_df.writeStream.foreachBatch(_body).option(
        "checkpointLocation", checkpoint_dir
    )
    if trigger is None:
        writer = writer.trigger(availableNow=True)
    else:
        writer = writer.trigger(**trigger)
    return writer.start()
