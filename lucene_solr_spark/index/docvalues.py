"""Numeric doc-values updates — ``IndexWriter.updateNumericDocValue``.

Reference: ``lucene/core/src/java/org/apache/lucene/index/IndexWriter.java``
(updateNumericDocValue) + ``NumericDocValuesFieldUpdates.java`` /
``ReadersAndUpdates.java``: Lucene never rewrites a segment for a DV
update — it publishes a NEW generation of sidecar .dvd/.dvm files
(``dvGen`` in FieldInfos) and readers resolve field values through the
newest generation. This module is that design on parquet:

- ``update_numeric_docvalue`` resolves external keys to (segment_id,
  doc_id) with one distributed join against the docs table and publishes
  ``dv_updates/<field>/gen=N`` (tmp-dir write + atomic rename — the same
  single-writer snapshot protocol as ``manifest.publish_term_stats``).
  Every row is stamped with the commit watermark (max committed segment
  id at publish time), mirroring the versioned-tombstone scheme in
  ``merge.delete_docs``.
- ``numeric_docvalues`` reads the patched view: the base docs column
  left-joined with all visible generations, newest generation winning
  per doc (``gen`` is a Spark partition column of the layout — no
  manifest bookkeeping needed). A time-traveled reader at commit N sees
  only updates with ``watermark < N`` — exactly the tombstone visibility
  rule, so deletes and DV updates time-travel consistently.

Scale shape: updates tables are tiny next to the corpus — the patch join
broadcasts under AQE; the per-doc "newest gen wins" window is partitioned
by (segment_id, doc_id), never global. Base column values never move:
segments stay immutable, only the sidecar grows.

Documented limitation: a compacting merge rebases doc ids but does NOT
remap dv_update rows (Lucene folds DV updates into the merged segment's
new DV generation) — updates addressed at merged-away segments stop
applying. Re-publish updates (one `update_numeric_docvalue` call with the
same external keys) after merging, or fold before merging.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .manifest import live_segments, next_segment_id


def dv_root(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, "dv_updates", field)


def _dv_gens(index_dir: str, field: str) -> list[int]:
    root = dv_root(index_dir, field)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d[4:]) for d in os.listdir(root) if d.startswith("gen=") and d[4:].isdigit()
    )


def update_numeric_docvalue(
    spark: SparkSession,
    index_dir: str,
    field: str,
    updates: DataFrame,
    key_cols: list[str] | str = "ext_id",
) -> str:
    """Publish one generation of numeric doc-values updates.

    ``updates`` columns: ``(*key_cols, value)`` — external document keys
    and the new long value. Keys that match no live document are dropped
    silently (Lucene's updateNumericDocValue(term, ...) on a non-matching
    term is a no-op). Returns the published generation directory.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    live = live_segments(spark, index_dir)
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "doc_id", *keys)
    )
    watermark = next_segment_id(spark, index_dir) - 1
    # one value per key per generation (duplicate keys in one batch have no
    # defined order here, unlike IndexWriter's sequenced updates — resolve
    # deterministically to the max)
    resolved = (
        updates.select(*keys, F.col("value").cast("long").alias("value"))
        .groupBy(*keys)
        .agg(F.max("value").alias("value"))
        .join(docs, keys)
        .select(
            "segment_id",
            "doc_id",
            "value",
            F.lit(watermark).cast("long").alias("watermark"),
        )
    )
    root = dv_root(index_dir, field)
    os.makedirs(root, exist_ok=True)
    gens = _dv_gens(index_dir, field)
    gen = (gens[-1] + 1) if gens else 0
    tmp = os.path.join(root, f"_tmp_gen_{gen}")
    resolved.write.mode("overwrite").parquet(tmp)
    final = os.path.join(root, f"gen={gen}")
    os.rename(tmp, final)
    return final


def numeric_docvalues(
    spark: SparkSession,
    index_dir: str,
    field: str,
    base_col: str | None = None,
    commit: int | None = None,
) -> DataFrame:
    """The patched per-doc numeric view: ``(segment_id, doc_id, value)``.

    ``base_col``: docs-table column holding the original value (None →
    docs without any update resolve to null, like a DV never written).
    ``commit``: time-travel — only updates with ``watermark < commit``
    apply (the versioned-tombstone visibility rule).
    """
    from pyspark.sql import Window

    # docs/ is append-only (merged-away and uncommitted segments keep their
    # rows) — resolve the view against the live set as of the commit, like
    # every reader in this engine
    live = live_segments(spark, index_dir, as_of=commit)
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).filter(
        F.col("segment_id").isin(live)
    )
    base = docs.select(
        "segment_id",
        "doc_id",
        (
            F.col(base_col).cast("long") if base_col else F.lit(None).cast("long")
        ).alias("base_value"),
    )
    gens = _dv_gens(index_dir, field)
    if not gens:
        return base.select(
            "segment_id", "doc_id", F.col("base_value").alias("value")
        )
    ups = spark.read.parquet(dv_root(index_dir, field))
    if commit is not None:
        ups = ups.filter(F.col("watermark") < commit)
    w = Window.partitionBy("segment_id", "doc_id").orderBy(F.col("gen").desc())
    latest = (
        ups.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .select("segment_id", "doc_id", F.col("value").alias("new_value"))
    )
    return base.join(latest, ["segment_id", "doc_id"], "left").select(
        "segment_id",
        "doc_id",
        F.coalesce("new_value", "base_value").alias("value"),
    )
