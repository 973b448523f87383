"""Segment manifest — the commit-point / segments_N analogue.

The reference records the live segment set in a generation file
(``index/SegmentInfos.java``; a commit point = the set of segments named by
``segments_N``). Here the manifest is an append-only parquet log: one row per
segment ever built or merged, carrying metrics (docs/terms/postings — the
north-rule lineage requirement) and, for merged segments, the source segment
ids in the ``lineage`` json. The LIVE set is derived: a segment is live iff no
later manifest row lists it as a merge source. Readers resolve the live set
once per searcher open (the DirectoryReader snapshot analogue,
``index/DirectoryReader.java:53``).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F


def manifest_path(index_dir: str) -> str:
    return os.path.join(index_dir, "manifest")


# ---------------------------------------------------------------------------
# term_stats generations — snapshot isolation for the global stats table.
#
# term_stats is the ONE derived table that must be recomputed when the live
# set changes (builds, delete-compacting merges). Overwriting it in place
# would break open searchers (their cached DataFrame handle points at deleted
# files). Instead each recompute publishes a NEW ``gen=N`` subdirectory
# (written to a tmp dir, then atomically renamed in) and readers bind to the
# latest generation at open — the SearcherManager snapshot semantics the
# append-only index/docs tables already have. Old generations are left for
# storage GC, like dead segments.

def term_stats_root(index_dir: str) -> str:
    return os.path.join(index_dir, "term_stats")


def _term_stats_gens(index_dir: str) -> list[int]:
    root = term_stats_root(index_dir)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d[4:]) for d in os.listdir(root) if d.startswith("gen=") and d[4:].isdigit()
    )


def latest_term_stats_dir(index_dir: str) -> str:
    """Directory of the newest published term_stats generation (falls back to
    the flat legacy layout if no generation subdir exists)."""
    gens = _term_stats_gens(index_dir)
    if not gens:
        return term_stats_root(index_dir)
    return os.path.join(term_stats_root(index_dir), f"gen={gens[-1]}")


def publish_term_stats(df: DataFrame, index_dir: str) -> str:
    """Write a new term_stats generation: parquet into a tmp dir, then one
    atomic rename to ``gen=N`` (single-writer; a concurrent publisher loses
    the rename and fails loudly rather than corrupting)."""
    root = term_stats_root(index_dir)
    os.makedirs(root, exist_ok=True)
    gens = _term_stats_gens(index_dir)
    gen = (gens[-1] + 1) if gens else 0
    tmp = os.path.join(root, f"_tmp_gen_{gen}")
    df.write.mode("overwrite").parquet(tmp)
    final = os.path.join(root, f"gen={gen}")
    os.rename(tmp, final)
    return final


def read_manifest(spark: SparkSession, index_dir: str) -> DataFrame:
    return spark.read.parquet(manifest_path(index_dir))


def manifest_rows(spark: SparkSession, index_dir: str) -> list[dict]:
    return [r.asDict() for r in read_manifest(spark, index_dir).collect()]


def live_segments(
    spark: SparkSession, index_dir: str, as_of: int | None = None
) -> list[int]:
    """Segment ids not consumed by any merge — the current commit point.

    ``as_of``: resolve the live set AS OF commit ``as_of`` (a segment id
    from :func:`list_commits`) — only manifest rows with
    ``segment_id <= as_of`` participate, so merges and builds that landed
    later are invisible. The ``DirectoryReader.open(IndexCommit)`` /
    ``IndexDeletionPolicy`` role (``reference lucene/core/src/java/org/
    apache/lucene/index/DirectoryReader.java:79-95``, ``listCommits:104``):
    segment ids are assigned monotonically (``next_segment_id``), so the
    id-prefix of the append-only log IS the historical commit state.
    Delete tombstones are versioned per commit: each carries the commit
    watermark at delete time in its max_doc slot, and a time-traveled
    searcher applies only tombstones with watermark < commit (see
    ``merge.delete_docs`` / ``IndexSearcher.commit``)."""
    rows = manifest_rows(spark, index_dir)
    if as_of is not None:
        rows = [r for r in rows if r["segment_id"] <= as_of]
    merged_away: set[int] = set()
    for r in rows:
        lineage = json.loads(r.get("lineage") or "{}")
        merged_away.update(lineage.get("merged_from", []))
    return sorted({r["segment_id"] for r in rows} - merged_away)


def list_commits(spark: SparkSession, index_dir: str) -> list[int]:
    """All commit points, oldest→newest, as the segment ids that can be
    passed to ``live_segments(as_of=…)`` / ``IndexSearcher(commit=…)``
    (``DirectoryReader.listCommits`` analogue). Every manifest row is a
    valid point-in-time state (segments commit atomically per row batch;
    any id-prefix of the log is consistent because segments are
    self-contained)."""
    return sorted({r["segment_id"] for r in manifest_rows(spark, index_dir)})


def next_segment_id(spark: SparkSession, index_dir: str) -> int:
    row = read_manifest(spark, index_dir).agg(F.max("segment_id").alias("m")).collect()[0]
    return int(row.m) + 1


def live_stats(
    spark: SparkSession, index_dir: str, as_of: int | None = None
) -> dict:
    """Collection statistics over the live segments only."""
    live = live_segments(spark, index_dir, as_of=as_of)
    agg = (
        read_manifest(spark, index_dir)
        .filter(F.col("segment_id").isin(live))
        .agg(
            F.sum("doc_count").alias("dc"),
            F.sum("sum_len").alias("sl"),
            F.sum("max_doc").alias("md"),
            F.count("*").alias("n"),
        )
        .collect()[0]
    )
    return {
        "doc_count": int(agg.dc or 0),
        "sum_total_term_freq": int(agg.sl or 0),
        "max_doc": int(agg.md or 0),
        "segments": int(agg.n or 0),
        "live": live,
    }
