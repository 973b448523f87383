"""Solr atomic updates — per-field operations against the current stored
document, then delete + re-add.

Reference: ``AtomicUpdateDocumentMerger.merge`` (``solr/core/src/java/org/
apache/solr/update/processor/AtomicUpdateDocumentMerger.java:100-146``) with
the six ops its switch dispatches (add / set / remove / removeregex / inc /
add-distinct, lines 108-123), the id-field guard (line 136), and
``DistributedUpdateProcessor.getUpdatedDocument``'s fetch-merge-reindex
shape: the current version comes from the RealTimeGet view, the merged
document replaces it as delete + re-add (``IndexWriter.java:1276``
updateDocument semantics — this engine's ``delete_docs`` + ``build_index``
with a fresh ``segment_base``).

DataFrame shape (the batch analogue of Solr's per-doc op maps): ``updates``
carries the key columns plus one column per field being changed; ``ops``
maps field → op for every row of the batch. A field present in ``updates``
but not in ``ops`` is a ``set`` (the reference treats plain fields as set,
line 142). Mixed per-row op sets are separate batches. ``set`` with NULL
removes the field (``doSet``/schema-less null), so rows must carry real
values for every ops column they name — one batch per op-shape.

Scale shape: the whole update is three distributed jobs — a broadcast key
join against the stored docs (RealTimeGet point-lookup pruning), one
tombstone append, one segment build of only the touched rows. No driver
loop over documents; a 10^6-doc atomic batch is the same plan as 10.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql import types as T

ATOMIC_OPS = ("set", "add", "add-distinct", "remove", "removeregex", "inc")


def _full_match(val, pattern):
    # doRemoveRegex uses Pattern.matcher(...).matches() — a FULL match;
    # regexp_like finds, so anchor the pattern the way Java matches() does
    return F.regexp_like(
        val.cast("string"), F.concat(F.lit("^(?:"), pattern, F.lit(")$"))
    )


def atomic_update(
    spark: SparkSession,
    index_dir: str,
    updates: DataFrame,
    ops: dict | None = None,
    key_cols: tuple | None = None,
    content_col: str = "content",
    num_segments: int = 1,
) -> dict:
    """Apply one batch of atomic updates and commit a new segment.

    Returns ``{"updated": n, "created": n, "build": build_metrics}``.
    Rows whose key has no live document CREATE one from the given fields
    (the reference's upsert path — ops against a missing doc start from an
    empty document). Updating a key column raises, like the reference's
    "Invalid update of id field" guard.
    """
    from .build import build_index
    from .manifest import manifest_path, next_segment_id
    from .merge import delete_docs
    from .read import realtime_get

    ops = dict(ops or {})
    for op in ops.values():
        if op not in ATOMIC_OPS:
            raise ValueError(
                f"Unknown operation for an atomic update, operation ignored: {op!r}"
                f" — expected one of {ATOMIC_OPS}"
            )

    man = spark.read.parquet(manifest_path(index_dir))
    last = (
        man.filter(F.col("lineage").isNotNull())
        .orderBy(F.col("segment_id").desc())
        .select("lineage")
        .first()
    )
    lin = json.loads(last["lineage"] or "{}") if last else {}
    key_cols = tuple(key_cols or lin.get("key") or ("repo", "path", "commit"))
    analyzer = lin.get("analyzer", "code")

    bad = [k for k in key_cols if k in ops]
    if bad:
        raise ValueError(f"Invalid update of id field: {bad}")

    docs_schema = spark.read.parquet(os.path.join(index_dir, "docs")).schema
    doc_cols = [
        f.name
        for f in docs_schema
        if f.name not in ("segment_id", "doc_id", "content_sha256")
    ]
    stored_cols = tuple(
        c for c in doc_cols if c not in key_cols and c != content_col
    )
    unknown = [
        c for c in updates.columns if c not in doc_cols and c not in key_cols
    ]
    if unknown:
        raise ValueError(f"atomic_update: fields not stored in this index: {unknown}")

    cur = realtime_get(
        spark, index_dir, updates.select(*key_cols).distinct(), key_cols
    ).alias("c")
    upd = updates.alias("u")
    joined = cur.join(upd, list(key_cols), "right")

    types = {f.name: f.dataType for f in docs_schema}

    def merged(colname: str):
        c = F.col(f"c.{colname}")
        if colname not in updates.columns:
            return c.alias(colname)
        u = F.col(f"u.{colname}")
        op = ops.get(colname, "set")
        if op in ("add", "add-distinct", "remove"):
            if not isinstance(types[colname], T.ArrayType):
                raise ValueError(
                    f"atomic_update: {op!r} needs an array field, "
                    f"{colname} is {types[colname].simpleString()}"
                )
            # scalar update values wrap to one-element lists (Solr accepts
            # both a value and a list for these ops)
            uvals = u if isinstance(updates.schema[colname].dataType, T.ArrayType) else F.array(u)
            base = F.coalesce(
                c, F.expr(f"cast(array() as {types[colname].simpleString()})")
            )
            if op == "add":
                out = F.concat(base, uvals)
            elif op == "add-distinct":
                # doAddDistinct appends values not yet present, one at a
                # time — a later duplicate in the SAME list is skipped too
                out = F.aggregate(
                    uvals,
                    base,
                    lambda acc, v: F.when(
                        F.array_contains(acc, v), acc
                    ).otherwise(F.concat(acc, F.array(v))),
                )
            else:  # remove: ALL occurrences of each listed value, order kept
                out = F.filter(base, lambda x: ~F.array_contains(uvals, x))
            return F.when(u.isNull(), c).otherwise(out).alias(colname)
        if op == "removeregex":
            if not isinstance(types[colname], T.ArrayType):
                raise ValueError(
                    f"atomic_update: 'removeregex' needs an array field, "
                    f"{colname} is {types[colname].simpleString()}"
                )
            out = F.filter(c, lambda x: ~_full_match(x, u))
            return F.when(u.isNull(), c).otherwise(out).alias(colname)
        if op == "inc":
            return F.when(
                u.isNull(), c
            ).otherwise(F.coalesce(c, F.lit(0)) + u).alias(colname)
        # set — NULL sets the field to null (doSet of a null removes it)
        return u.alias(colname)

    out_cols = [F.col(f"u.{k}").alias(k) for k in key_cols] + [
        merged(cname) for cname in doc_cols if cname not in key_cols
    ]
    # localCheckpoint BOTH frames before mutating the index: their lineage
    # reads the live-docs view, and the writes below would otherwise change
    # what a recomputation resolves (build_index's jobs re-evaluate the
    # plan). Checkpoint = materialize once, cut the lineage.
    new_docs = joined.select(*out_cols).localCheckpoint()
    created = new_docs.count()
    n_keys = updates.select(*key_cols).distinct().count()
    if created != n_keys:
        # a right join against the per-key RealTimeGet view indexes one new
        # doc PER update row — duplicate keys in one batch would leave two
        # live docs with the same unique key (Solr applies them in arrival
        # order; a DataFrame has no row order to apply)
        raise ValueError(
            f"atomic_update: updates must carry ONE row per key per batch "
            f"({created} rows over {n_keys} distinct keys) — split into "
            f"sequential batches to apply multiple ops to the same document"
        )

    # Victims are ALL live rows matching the batch's keys (pre-dedup), not
    # realtime_get's newest-wins view: after a crash between the replacement
    # commit and the tombstone append BOTH versions are live, and a replayed
    # update must sweep the stale original too — the deduped view would
    # tombstone only the crashed replacement, leaving a search-visible
    # duplicate forever (/get would still resolve, but searches would not).
    victims = (
        realtime_get(
            spark,
            index_dir,
            updates.select(*key_cols).distinct(),
            key_cols,
            all_versions=True,
        )
        .select("segment_id", "doc_id")
        .localCheckpoint()
    )
    # keys with a live prior version — counted BEFORE the mutation below
    # (n_deleted can exceed this after a crash replay sweeps two versions
    # of the same key, and "created" must not go negative there)
    n_existing = cur.count()

    # Commit ORDER: the replacement segment's manifest append lands FIRST,
    # the tombstones for the superseded rows land after. A crash between
    # the two leaves BOTH versions visible (RealTimeGet still resolves the
    # newer segment; a replayed update converges — for search visibility
    # too, because victims above cover every live version of the keys) —
    # the safe failure mode. Tombstoning first would make a crash lose the
    # document entirely (tombstones apply to every commit; the replacement
    # never lands).
    base_id = next_segment_id(spark, index_dir)
    metrics = build_index(
        spark,
        new_docs,
        index_dir,
        num_segments=num_segments,
        analyzer=analyzer,
        key_cols=list(key_cols),
        content_col=content_col,
        stored_cols=stored_cols,
        segment_base=base_id,
        index_sort=lin.get("index_sort"),
        store_offsets=bool(lin.get("store_offsets")),
        store_payloads=bool(lin.get("store_payloads")),
        extra_lineage={"atomic_update": True},
    )
    n_deleted = delete_docs(spark, index_dir, victims)
    return {
        "updated": int(n_deleted),
        "created": int(created - n_existing),
        "build": metrics,
    }
