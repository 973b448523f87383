"""Doc-values updates — ``IndexWriter.updateNumericDocValue`` /
``updateBinaryDocValue`` / ``updateDocValues``.

Reference: ``lucene/core/src/java/org/apache/lucene/index/IndexWriter.java``
(updateNumericDocValue:1705, updateBinaryDocValue:1742) +
``NumericDocValuesFieldUpdates.java`` / ``BinaryDocValuesFieldUpdates.java`` /
``ReadersAndUpdates.java``: Lucene never rewrites a segment for a DV
update — it publishes a NEW generation of sidecar .dvd/.dvm files
(``dvGen`` in FieldInfos) and readers resolve field values through the
newest generation. This module is that design on parquet, one protocol
for all three value types:

- ``update_{numeric,binary,sortedset}_docvalue`` resolves external keys to
  (segment_id, doc_id) with one distributed join against the docs table and
  publishes ``dv_updates/<field>/gen=N`` (tmp-dir write + atomic rename —
  the same single-writer snapshot protocol as
  ``manifest.publish_term_stats``). Every row is stamped with the commit
  watermark (max committed segment id at publish time), mirroring the
  versioned-tombstone scheme in ``merge.delete_docs``.
- ``{numeric,binary,sortedset}_docvalues`` reads the patched view: the base
  docs column left-joined with all visible generations, newest generation
  winning per doc (``gen`` is a Spark partition column of the layout — no
  manifest bookkeeping needed). A time-traveled reader at commit N sees
  only updates with ``watermark < N`` — exactly the tombstone visibility
  rule, so deletes and DV updates time-travel consistently.
- One DV type per field (Lucene throws IllegalArgumentException when an
  update names a field with a different DV type — ``IndexWriter.java``
  updateDocValues javadoc): the sidecar root records the type in a
  ``_dv_type`` marker file at first publish (the leading underscore keeps
  parquet readers from treating it as data); a later publish of another
  type raises ``ValueError``.

Per-type semantics for duplicate keys inside ONE update batch (unlike
IndexWriter's sequenced updates, a batch has no defined order — resolution
must be deterministic): numeric → max, binary → lexicographic max,
sorted-set → the UNION of the sets. Sorted-set values are stored
sorted + deduped, matching the ordinal-order contract of
``SortedSetDocValues`` (``lucene/core/src/java/org/apache/lucene/index/
SortedSetDocValues.java`` — ords ascend, each value once). Across
generations, newest REPLACES (all three types — a generation is a full
per-doc value, not a delta).

Scale shape: updates tables are tiny next to the corpus — the patch join
broadcasts under AQE; the per-doc "newest gen wins" window is partitioned
by (segment_id, doc_id), never global. Base column values never move:
segments stay immutable, only the sidecar grows.

Merges FOLD pending updates (``ReadersAndUpdates.writeFieldUpdates``,
``lucene/core/src/java/org/apache/lucene/index/ReadersAndUpdates.java:510``
— merge interplay documented at ``:66-80``): ``merge_segments`` calls
:func:`fold_dv_updates` with the same docmap that remapped postings and
stored fields, publishing ONE new generation per field addressed at the
merged segment BEFORE the merge's manifest row lands. Crash between fold
and commit leaves a generation addressed at a segment that never became
live — invisible to every reader, re-published by the retry. Original
generations are never touched (append-only), so time travel to a commit
before the merge still resolves through the source-addressed rows; each
folded row keeps its original watermark.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

from .manifest import live_segments, next_segment_id

_TYPE_MARKER = "_dv_type"


def dv_root(index_dir: str, field: str) -> str:
    return os.path.join(index_dir, "dv_updates", field)


def _dv_gens(index_dir: str, field: str) -> list[int]:
    root = dv_root(index_dir, field)
    if not os.path.isdir(root):
        return []
    return sorted(
        int(d[4:]) for d in os.listdir(root) if d.startswith("gen=") and d[4:].isdigit()
    )


def _bind_type(root: str, field: str, dv_type: str) -> None:
    """Record the field's DV type at first publish; reject a later publish
    of another type (Lucene: wrong-type DV update → IllegalArgumentException)."""
    os.makedirs(root, exist_ok=True)
    marker = os.path.join(root, _TYPE_MARKER)
    if os.path.exists(marker):
        with open(marker) as f:
            existing = f.read().strip()
        if existing != dv_type:
            raise ValueError(
                f"DV type mismatch for field {field!r}: published as "
                f"{existing!r}, update is {dv_type!r} — one DV type per field"
            )
    else:
        with open(marker, "w") as f:
            f.write(dv_type)


def _publish_docvalue(
    spark: SparkSession,
    index_dir: str,
    field: str,
    updates: DataFrame,
    key_cols: list[str] | str,
    dv_type: str,
    value_expr: Column,
    combine: Column,
) -> str:
    """Shared publish path: resolve keys → one generation dir, atomically.

    ``value_expr`` normalizes the incoming ``value`` column; ``combine`` is
    the per-key aggregate resolving duplicate keys within the batch.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    root = dv_root(index_dir, field)
    _bind_type(root, field, dv_type)
    live = live_segments(spark, index_dir)
    docs = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .filter(F.col("segment_id").isin(live))
        .select("segment_id", "doc_id", *keys)
    )
    watermark = next_segment_id(spark, index_dir) - 1
    resolved = (
        updates.select(*keys, value_expr.alias("value"))
        .groupBy(*keys)
        .agg(combine.alias("value"))
        .join(docs, keys)
        .select(
            "segment_id",
            "doc_id",
            "value",
            F.lit(watermark).cast("long").alias("watermark"),
        )
    )
    gens = _dv_gens(index_dir, field)
    gen = (gens[-1] + 1) if gens else 0
    tmp = os.path.join(root, f"_tmp_gen_{gen}")
    resolved.write.mode("overwrite").parquet(tmp)
    final = os.path.join(root, f"gen={gen}")
    os.rename(tmp, final)
    return final


def dv_fields(index_dir: str) -> list[str]:
    """Fields with at least one published DV-update generation."""
    root = os.path.join(index_dir, "dv_updates")
    if not os.path.isdir(root):
        return []
    return sorted(
        f
        for f in os.listdir(root)
        if not f.startswith("_") and _dv_gens(index_dir, f)
    )


def fold_dv_updates(
    spark: SparkSession,
    index_dir: str,
    sources: list[int],
    new_segment_id: int,
    docmap: DataFrame,
) -> list[str]:
    """Fold the sources' pending DV updates into the merged segment — the
    ``ReadersAndUpdates.writeFieldUpdates`` role (``ReadersAndUpdates.java:
    510``): for every field with a sidecar, resolve each source doc's
    newest generation, remap (segment_id, doc_id) through the merge's
    docmap, and publish ONE folded generation addressed at
    ``new_segment_id``.

    ``docmap``: ``(segment_id int, doc_id bigint, new_doc_id bigint)``
    covering exactly the SURVIVING docs of ``sources`` — tombstoned docs
    are absent, so their pending updates are dropped with them (Lucene's
    docmap maps deleted docs to -1). Must be the SAME map that remapped
    postings and stored fields.

    Called BEFORE the merge's manifest append: a crash leaves only rows
    addressed at a segment that never became live (invisible; the retry
    re-publishes). Original generations stay in place for time travel;
    folded rows keep their original per-row watermark, so visibility
    rules are unchanged on both sides of the merge commit.

    Returns the published generation dirs (one per folded field).
    """
    from pyspark.sql import Window

    published = []
    src_set = [int(s) for s in sources]
    for field in dv_fields(index_dir):
        root = dv_root(index_dir, field)
        ups = spark.read.parquet(root).filter(F.col("segment_id").isin(src_set))
        w = Window.partitionBy("segment_id", "doc_id").orderBy(F.col("gen").desc())
        latest = (
            ups.withColumn("_rk", F.row_number().over(w))
            .filter(F.col("_rk") == 1)
            .select("segment_id", "doc_id", "value", "watermark")
        )
        folded = (
            latest.join(docmap, ["segment_id", "doc_id"])
            .select(
                F.lit(new_segment_id).cast("int").alias("segment_id"),
                F.col("new_doc_id").cast("bigint").alias("doc_id"),
                "value",
                F.col("watermark").cast("long").alias("watermark"),
            )
            # the fold must materialize BEFORE the gen allocation below;
            # and its lineage reads dv_updates/<field>, which the publish
            # itself extends — cut it
            .localCheckpoint(eager=True)
        )
        if folded.isEmpty():
            continue
        gens = _dv_gens(index_dir, field)
        gen = (gens[-1] + 1) if gens else 0
        tmp = os.path.join(root, f"_tmp_gen_{gen}")
        folded.write.mode("overwrite").parquet(tmp)
        final = os.path.join(root, f"gen={gen}")
        os.rename(tmp, final)
        published.append(final)
    return published


def _docvalues_view(
    spark: SparkSession,
    index_dir: str,
    field: str,
    value_type: str,
    base_col: str | None,
    commit: int | None,
) -> DataFrame:
    """Shared patched view: ``(segment_id, doc_id, value)`` of ``value_type``."""
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
            F.col(base_col).cast(value_type)
            if base_col
            else F.lit(None).cast(value_type)
        ).alias("base_value"),
    )
    gens = _dv_gens(index_dir, field)
    if not gens:
        return base.select("segment_id", "doc_id", F.col("base_value").alias("value"))
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
    return _publish_docvalue(
        spark,
        index_dir,
        field,
        updates,
        key_cols,
        "numeric",
        F.col("value").cast("long"),
        F.max("value"),
    )


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
    return _docvalues_view(spark, index_dir, field, "long", base_col, commit)


def update_binary_docvalue(
    spark: SparkSession,
    index_dir: str,
    field: str,
    updates: DataFrame,
    key_cols: list[str] | str = "ext_id",
) -> str:
    """``IndexWriter.updateBinaryDocValue`` (IndexWriter.java:1742): same
    sidecar protocol as numeric, value type binary. Duplicate keys within a
    batch resolve to the lexicographically greatest value (deterministic
    stand-in for IndexWriter's sequence numbers)."""
    return _publish_docvalue(
        spark,
        index_dir,
        field,
        updates,
        key_cols,
        "binary",
        F.col("value").cast("binary"),
        F.max("value"),
    )


def binary_docvalues(
    spark: SparkSession,
    index_dir: str,
    field: str,
    base_col: str | None = None,
    commit: int | None = None,
) -> DataFrame:
    """Patched per-doc binary view; ``base_col`` (e.g. a string column) is
    cast to binary for unpatched docs."""
    return _docvalues_view(spark, index_dir, field, "binary", base_col, commit)


def update_sortedset_docvalue(
    spark: SparkSession,
    index_dir: str,
    field: str,
    updates: DataFrame,
    key_cols: list[str] | str = "ext_id",
) -> str:
    """Sorted-set sidecar updates (engine extension — the reference updates
    only numeric/binary DVs; ``SortedSetDocValues`` ordinal order is the
    storage contract being matched). ``value`` is ``array<string>``; values
    are stored sorted + deduped, and duplicate keys within one batch
    resolve to the UNION of their sets. Across generations, newest
    REPLACES (same gen semantics as numeric/binary)."""
    return _publish_docvalue(
        spark,
        index_dir,
        field,
        updates,
        key_cols,
        "sortedset",
        F.col("value").cast("array<string>"),
        F.array_sort(F.array_distinct(F.flatten(F.collect_list("value")))),
    )


def sortedset_docvalues(
    spark: SparkSession,
    index_dir: str,
    field: str,
    base_col: str | None = None,
    commit: int | None = None,
) -> DataFrame:
    """Patched per-doc sorted-set view: ``(segment_id, doc_id, value)``
    with ``value: array<string>`` sorted + deduped."""
    return _docvalues_view(spark, index_dir, field, "array<string>", base_col, commit)
