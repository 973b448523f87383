"""Index replication — the ReplicationHandler / IndexFetcher role.

The reference replicates by pulling the files of the master's latest commit
point that the slave is missing, confirming the generation, moving them into
place, and committing (``solr/core/src/java/org/apache/solr/handler/
IndexFetcher.java`` — ``fetchLatestIndex``: compare generations, build the
missing-file list from the commit's file manifest, download, then make the
new ``segments_N`` visible; ``ReplicationHandler.java`` serves the file
list). Segments are immutable, so replication is incremental by
construction: only segments absent from the replica move.

Here the same protocol runs over the parquet layout:

1. diff the MANIFESTS (the segments_N analogue) — a segment is missing iff
   its manifest row is absent at the replica; manifest ids are globally
   monotone so the diff is exact,
2. copy the missing segments' index rows (postings/norms/stats — one
   distributed filtered scan, no driver data path),
3. copy the missing segments' stored-docs files (one immutable file per
   segment) and any term_stats / dv_updates GENERATIONS the replica lacks
   (generation dirs are immutable once renamed in, like segment files),
4. diff-and-append tombstones (IndexFetcher re-fetches the changed
   liveDocs files of existing segments; kind=3 rows are append-only, so
   the diff is an anti-join),
5. append the missing manifest rows LAST — the replica's commit point.
   A crash anywhere earlier leaves invisible rows that the next
   replicate() run converges over (same per-artifact resume contract as
   ``build_index``).

A replica synced this way is searchable with byte-identical scores: every
posting/norm blob is copied verbatim and the manifest lineage (commit
history, stream epochs) rides along, so ``IndexSearcher(commit=N)``
time-travel works on the replica too.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import SparkSession, functions as F

from .manifest import manifest_path, read_manifest, term_stats_root

KIND_DELETES = 3


def _exists(path: str) -> bool:
    """True iff the table has any parquet data file (the index table is
    partitioned by ``kind`` so files sit in subdirectories — walk)."""
    if not os.path.isdir(path):
        return False
    for _root, _dirs, files in os.walk(path):
        if any(f.endswith(".parquet") for f in files):
            return True
    return False


def _copy_missing_gens(src_root: str, dst_root: str) -> int:
    """Copy ``gen=N`` subdirectories present at src but not dst (atomic:
    tmp copy + rename, matching publish_term_stats)."""
    if not os.path.isdir(src_root):
        return 0
    copied = 0
    for d in sorted(os.listdir(src_root)):
        if not d.startswith("gen="):
            continue
        dst = os.path.join(dst_root, d)
        if os.path.isdir(dst):
            continue
        os.makedirs(dst_root, exist_ok=True)
        tmp = os.path.join(dst_root, f"_tmp_{d}")
        shutil.rmtree(tmp, ignore_errors=True)
        shutil.copytree(os.path.join(src_root, d), tmp)
        os.rename(tmp, dst)
        copied += 1
    return copied


def replicate_index(spark: SparkSession, src_dir: str, dst_dir: str) -> dict:
    """Incrementally sync ``dst_dir`` to ``src_dir``'s latest commit point.

    Returns ``{"segments_copied", "tombstones_copied", "generations_copied",
    "up_to_date"}``. Idempotent: a second call right after a sync copies
    nothing (the IndexFetcher equal-generation fast path). Single writer
    per replica dir (the same write.lock assumption as builds/merges).
    """
    src_man = manifest_path(src_dir)
    dst_man = manifest_path(dst_dir)
    src_rows = read_manifest(spark, src_dir)
    have: set[int] = set()
    if _exists(dst_man):
        have = {
            r.segment_id
            for r in spark.read.parquet(dst_man).select("segment_id").collect()
        }
    src_ids = {r.segment_id for r in src_rows.select("segment_id").collect()}
    missing = sorted(src_ids - have)

    seg_copied = 0
    if missing:
        os.makedirs(dst_dir, exist_ok=True)
        # postings/norms/stats rows of the missing segments — tombstones are
        # handled by the diff below so a torn earlier run can't double-copy
        src_idx = os.path.join(src_dir, "index")
        dst_idx = os.path.join(dst_dir, "index")
        rows = (
            spark.read.parquet(src_idx)
            .filter(F.col("kind") != KIND_DELETES)
            .filter(F.col("segment_id").isin([int(s) for s in missing]))
        )
        if _exists(dst_idx):
            # resume: skip segments whose rows already landed (crash between
            # index copy and manifest append)
            present = {
                r.segment_id
                for r in spark.read.parquet(dst_idx)
                .filter(F.col("segment_id").isin([int(s) for s in missing]))
                .select("segment_id").distinct().collect()
            }
            rows = rows.filter(~F.col("segment_id").isin([int(s) for s in present]))
        rows.write.mode("append").partitionBy("kind").parquet(dst_idx)
        # stored docs: one immutable file per segment
        dst_docs = os.path.join(dst_dir, "docs")
        os.makedirs(dst_docs, exist_ok=True)
        for seg in missing:
            name = f"part-seg{seg}.parquet"
            src_f = os.path.join(src_dir, "docs", name)
            dst_f = os.path.join(dst_docs, name)
            if os.path.isfile(src_f) and not os.path.isfile(dst_f):
                tmp = dst_f + ".tmp"
                shutil.copyfile(src_f, tmp)
                os.replace(tmp, dst_f)
                seg_copied += 1

    # tombstones: append-only kind=3 rows → anti-join diff (the changed
    # liveDocs re-fetch of IndexFetcher). Runs on every sync, not just when
    # segments moved — a delete on an already-replicated segment must flow.
    tomb_copied = 0
    src_idx = os.path.join(src_dir, "index")
    dst_idx = os.path.join(dst_dir, "index")
    src_tombs = (
        spark.read.parquet(src_idx).filter(F.col("kind") == KIND_DELETES)
        if _exists(src_idx)
        else None
    )
    if src_tombs is not None:
        new_tombs = src_tombs
        if _exists(dst_idx):
            dst_tombs = (
                spark.read.parquet(dst_idx)
                .filter(F.col("kind") == KIND_DELETES)
                .select("segment_id", "doc_blob", "max_doc")
            )
            new_tombs = src_tombs.join(
                dst_tombs, ["segment_id", "doc_blob", "max_doc"], "left_anti"
            )
        new_tombs = new_tombs.persist()
        tomb_copied = new_tombs.count()
        if tomb_copied:
            new_tombs.write.mode("append").partitionBy("kind").parquet(dst_idx)
        new_tombs.unpersist()

    # derived generations: term_stats + dv_updates sidecars (immutable dirs)
    gens = _copy_missing_gens(term_stats_root(src_dir), term_stats_root(dst_dir))
    src_dv = os.path.join(src_dir, "dv_updates")
    if os.path.isdir(src_dv):
        for field in sorted(os.listdir(src_dv)):
            gens += _copy_missing_gens(
                os.path.join(src_dv, field),
                os.path.join(dst_dir, "dv_updates", field),
            )

    # manifest append — the replica's commit point, LAST
    if missing:
        (
            src_rows.filter(F.col("segment_id").isin([int(s) for s in missing]))
            .write.mode("append").parquet(dst_man)
        )

    return {
        "segments_copied": len(missing),
        "docs_files_copied": seg_copied,
        "tombstones_copied": int(tomb_copied),
        "generations_copied": gens,
        "up_to_date": not missing and not tomb_copied and not gens,
    }
