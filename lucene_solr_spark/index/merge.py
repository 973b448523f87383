"""Segment merging — TieredMergePolicy planner + distributed merge job.

Reference semantics (SURVEY §2.4):

- ``TieredMergePolicy.findMerges`` (``index/TieredMergePolicy.java:312,378-530``)
  computes an allowed segment budget from geometric tiers (segsPerTier=10,
  maxMergeAtOnce=10, floor size, max merged size) and scores candidate merges
  with ``mergeScore = skew * totBytes^0.05 * nonDelRatio^2``
  (``TieredMergePolicy.java:566-623``, lower is better). The planner below is
  driver-side pure Python over the manifest — no Spark job.
- ``SegmentMerger.merge`` (``index/SegmentMerger.java:97-185``) +
  ``MultiTermsEnum`` (``index/MultiTermsEnum.java:35``) do a sorted merge of
  term dictionaries with docID remapping via ``DocIDMerger``
  (``index/DocIDMerger.java:49-90``): sequential concatenation with per-source
  doc bases, skipping deleted docs (compaction).

Spark shape — one job per planned merge, built so the 100-TB case never
funnels through the driver:

1. *Map side*: every (term, source-segment) posting row is independently
   rebased — blk_last += doc_base; rows from segments with tombstones are
   fully re-encoded (deleted docs dropped, ids compacted) while clean rows
   keep their byte-identical delta blobs (only the first VByte value of a
   posting blob ever needs patching, because within-list deltas are invariant
   under a constant doc-base shift).
2. *One narrow shuffle on `term`*: a window ``lag(last_doc) over (partition by
   term order by seg_order)`` supplies the chaining delta, then the first
   VByte of each blob is patched so concatenated blobs decode with a single
   cumsum. Per-term groups have ≤ maxMergeAtOnce rows, so the shuffle is
   skew-free by construction.
3. *Reduce*: cold terms concatenate into one merged posting row via JVM-side
   ``aggregate(array<binary>, concat)``; **hot terms (merged df >
   hot_df_threshold) stay sharded** — one row per source shard keyed by
   ``(term, shard)`` — which is the salted-repartition requirement of the
   north rule: no single shuffle row ever exceeds a source-segment posting
   blob, and query-time decoding concatenates shards in order.

The manifest is append-only; a merged segment's ``lineage`` json records
``merged_from`` (sources), making the old segments dead (see manifest.py) —
exactly Lucene's commit-point flip. Old segment rows/files are left in place
(immutable storage; Iceberg snapshot expiry would GC them).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.window import Window

from ..codec import (
    BLOCK_SIZE,
    decode_doc_deltas,
    decode_freq_values,
    delta_decode_lists,
    delta_encode_lists,
    encode_posting_row,
    first_vbyte_val,
    normalize_first_vbyte,
    vbyte_decode,
    vbyte_encode,
)
from .build import KIND_NORMS, KIND_POSTING, KIND_STATS, UNIFIED_SCHEMA
from .manifest import live_segments, manifest_path, next_segment_id, read_manifest

KIND_DELETES = 3

DEFAULT_HOT_DF = 1_000_000


# ---------------------------------------------------------------------------
# TieredMergePolicy planner (driver-side pure Python)

def merge_score(sizes: list[int], del_ratio: float = 0.0) -> float:
    """``TieredMergePolicy.score`` (TieredMergePolicy.java:566-623): lower is
    better. skew = largest/total (floored sizes), times totBytes^0.05, times
    nonDelRatio^2 (reclaiming deletes is rewarded)."""
    tot = float(sum(sizes))
    if tot <= 0:
        return 0.0
    skew = max(sizes) / tot
    non_del = 1.0 - del_ratio
    return skew * (tot ** 0.05) * (non_del ** 2)


def plan_merges(
    segments: list[dict],
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
    floor_size: int = 2_000,
    max_merged_size: int = 5_000_000_000,
    size_key: str = "sum_len",
) -> list[list[int]]:
    """``TieredMergePolicy.findMerges`` (:312,378-530) over manifest rows.

    ``segments`` are live-segment manifest dicts; size proxy = token count
    (``sum_len``), the analogue of segment bytes. An optional ``del_count``
    key per segment feeds the nonDelRatio² reward of ``merge_score`` —
    windows rich in tombstoned docs score better (lower), so delete
    reclamation is prioritized exactly like TieredMergePolicy. Returns a
    list of merges, each a list of source segment_ids.
    """
    segs = [
        {
            "id": int(s["segment_id"]),
            "size": max(int(s[size_key]), 1),
            "dels": int(s.get("del_count", 0) or 0),
            "docs": max(int(s.get("max_doc", 0) or 0), 1),
        }
        for s in segments
    ]
    if len(segs) <= 1:
        return []
    # allowed budget from geometric tiers (TieredMergePolicy.java:378-401)
    tot = sum(s["size"] for s in segs)
    floored = lambda sz: max(sz, floor_size)
    level = float(floor_size)
    allowed = 0.0
    remaining = float(tot)
    while True:
        seg_count_level = remaining / level
        if seg_count_level < segs_per_tier or level >= max_merged_size:
            allowed += min(seg_count_level, segs_per_tier)
            break
        allowed += segs_per_tier
        remaining -= segs_per_tier * level
        level *= max_merge_at_once
    if len(segs) <= max(2, int(allowed)):
        return []

    # candidate scan (doFindMerges:407-530): sort by size desc, score windows
    segs.sort(key=lambda s: -s["size"])
    best, best_score = None, None
    for start in range(len(segs)):
        window = []
        wsize = 0
        for s in segs[start:]:
            if len(window) >= max_merge_at_once:
                break
            if wsize + s["size"] > max_merged_size and window:
                continue
            window.append(s)
            wsize += s["size"]
        if len(window) < 2:
            continue
        w_dels = sum(s["dels"] for s in window)
        w_docs = sum(s["docs"] for s in window)
        del_ratio = min(w_dels / w_docs, 1.0) if w_docs else 0.0
        score = merge_score([floored(s["size"]) for s in window], del_ratio)
        if best_score is None or score < best_score:
            best, best_score = window, score
    if best is None:
        return []
    return [[s["id"] for s in best]]


# ---------------------------------------------------------------------------
# tombstones

def delete_docs(spark: SparkSession, index_dir: str, doc_keys: DataFrame) -> int:
    """Mark (segment_id, doc_id) rows deleted — live-docs tombstones
    (``codecs/lucene50/Lucene50LiveDocsFormat.java``). Append-only kind=3 rows
    in the index table: doc_blob = int64 array of deleted local doc ids.
    Updates in the reference are delete + re-add (``IndexWriter.java:1276``).

    Fully distributed: tombstones are encoded per segment inside
    ``applyInPandas`` — no key ever passes through the driver (deleting 1% of
    10^12 docs stays a one-shuffle Spark job).

    Soft-delete versioning (``SoftDeletesRetentionMergePolicy.java`` /
    per-commit liveDocs): each tombstone row records the commit watermark
    at delete time — the max manifest segment id — in its ``max_doc``
    field (unused by tombstones, -1 historically). A time-traveled
    ``IndexSearcher(commit=N)`` applies a tombstone only when
    ``watermark < N``: like Lucene, a delete buffered after commit W is
    absent from commit W and first appears in the NEXT commit (and in the
    live NRT view). Legacy -1 tombstones stay unversioned (apply
    everywhere). Merges always compact ALL tombstones — compaction is a
    new commit, and earlier commits keep resolving from the pre-merge
    segments via the manifest id-prefix.
    """
    keys = doc_keys.select(
        F.col("segment_id").cast("int"), F.col("doc_id").cast("bigint")
    ).distinct()
    # persist: the distinct shuffle runs once, shared by the gate count and
    # the tombstone write (also pins the key set if doc_keys is
    # non-deterministic, so the returned count matches what was written)
    keys.persist()
    n = keys.count()
    if n == 0:
        keys.unpersist()
        return 0
    watermark = next_segment_id(spark, index_dir) - 1

    def to_tombstone(pdf: pd.DataFrame) -> pd.DataFrame:
        seg = int(pdf["segment_id"].iloc[0])
        arr = np.sort(pdf["doc_id"].to_numpy(np.int64))
        return pd.DataFrame(
            {
                "segment_id": np.array([seg], dtype=np.int32),
                "kind": np.array([KIND_DELETES], dtype=np.int32),
                "term": [None],
                "df": np.array([len(arr)], dtype=np.int64),
                "ttf": np.array([0], dtype=np.int64),
                "doc_blob": [arr.tobytes()],
                "freq_blob": [b""],
                "pos_blob": [b""],
                "blk_last": [b""],
                "blk_maxf": [b""],
                "blk_minn": [b""],
                "blk_len": [b""],
                "blk_doc_boff": [b""],
                "blk_freq_boff": [b""],
                "blk_pos_boff": [b""],
                "off_blob": [b""],
                "blk_off_boff": [b""],
                "pay_blob": [b""],
                "blk_pay_boff": [b""],
                # soft-delete commit watermark (see docstring) — NOT a doc
                # count; tombstones reuse this otherwise-unused slot
                "max_doc": np.array([watermark], dtype=np.int64),
                "doc_count": np.array([-1], dtype=np.int64),
                "sum_len": np.array([-1], dtype=np.int64),
                "shard": np.array([0], dtype=np.int32),
            }
        )

    (
        keys.groupBy("segment_id")
        .applyInPandas(to_tombstone, UNIFIED_SCHEMA)
        .write.mode("append")
        .partitionBy("kind")
        .parquet(os.path.join(index_dir, "index"))
    )
    keys.unpersist()
    return n


def deleted_docs_by_segment(
    spark: SparkSession, index_dir: str, segment_ids: list[int]
) -> dict[int, np.ndarray]:
    """Union of tombstone rows per segment → sorted int64 arrays."""
    if not segment_ids:
        return {}
    rows = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter((F.col("kind") == KIND_DELETES) & F.col("segment_id").isin(segment_ids))
        .select("segment_id", "doc_blob")
        .collect()
    )
    out: dict[int, list] = {}
    for r in rows:
        out.setdefault(int(r.segment_id), []).append(
            np.frombuffer(r.doc_blob, dtype=np.int64)
        )
    return {
        seg: np.unique(np.concatenate(chunks)) for seg, chunks in out.items()
    }


# ---------------------------------------------------------------------------
# merge executor

def _with_off_cols(df: DataFrame) -> DataFrame:
    """Read-compat shim: indexes written before offset/payload support lack
    those blob columns — present them as empty blobs."""
    if "off_blob" not in df.columns:
        df = df.withColumn("off_blob", F.lit(b"")).withColumn(
            "blk_off_boff", F.lit(b"")
        )
    if "pay_blob" not in df.columns:
        df = df.withColumn("pay_blob", F.lit(b"")).withColumn(
            "blk_pay_boff", F.lit(b"")
        )
    return df


def _block_meta(docs: np.ndarray, freqs: np.ndarray, norms_of_doc: np.ndarray):
    """(blk_last, blk_maxf, blk_minn) for one posting list (local doc ids)."""
    n = len(docs)
    starts = np.arange(0, n, BLOCK_SIZE)
    ends = np.minimum(starts + BLOCK_SIZE, n)
    last = docs[ends - 1].astype(np.int32)
    maxf = np.maximum.reduceat(freqs, starts).astype(np.int32)
    minn = np.minimum.reduceat(norms_of_doc, starts).astype(np.uint8)
    lens = (ends - starts).astype(np.int32)
    return last.tobytes(), maxf.tobytes(), minn.tobytes(), lens.tobytes()


def merge_segments(
    spark: SparkSession,
    index_dir: str,
    sources: list[int],
    hot_df_threshold: int = DEFAULT_HOT_DF,
    new_segment_id: int | None = None,
) -> dict:
    """Merge ``sources`` into one new segment (deletes compacted).

    When every source segment was built with the same ``index_sort`` field,
    the merge is a SORTED merge (the reference's sorted-index path:
    ``MergeState`` docmaps feeding ``DocIDMerger`` sorted mode,
    ``index/DocIDMerger.java:49-90``): the merged doc-id order is the sort
    order, the manifest keeps the ``index_sort`` marker, and
    ``search_sorted`` early termination survives compaction. Mixing sorted
    and unsorted sources (or different sort fields) raises."""
    t0 = time.time()
    sources = sorted(int(s) for s in sources)
    man = read_manifest(spark, index_dir)
    src_rows = {
        int(r["segment_id"]): r.asDict()
        for r in man.filter(F.col("segment_id").isin(sources)).collect()
    }
    if len(src_rows) != len(sources):
        raise ValueError(f"unknown source segments: {set(sources) - set(src_rows)}")
    if new_segment_id is None:
        new_segment_id = next_segment_id(spark, index_dir)

    deleted = deleted_docs_by_segment(spark, index_dir, sources)
    idx_path = os.path.join(index_dir, "index")

    sort_fields = {
        json.loads(src_rows[s].get("lineage") or "{}").get("index_sort")
        for s in sources
    }
    if len(sort_fields) > 1:
        raise ValueError(
            f"cannot merge segments with mixed index_sort {sort_fields} — "
            "a sorted and an unsorted segment have incompatible doc orders"
        )
    off_flags = {
        bool(json.loads(src_rows[s].get("lineage") or "{}").get("store_offsets"))
        for s in sources
    }
    if len(off_flags) > 1:
        raise ValueError(
            "cannot merge segments with mixed store_offsets — offset and "
            "offset-free posting rows have incompatible blob layouts"
        )
    has_offsets = off_flags.pop()
    pay_flags = {
        bool(json.loads(src_rows[s].get("lineage") or "{}").get("store_payloads"))
        for s in sources
    }
    if len(pay_flags) > 1:
        raise ValueError(
            "cannot merge segments with mixed store_payloads — payload and "
            "payload-free posting rows have incompatible blob layouts"
        )
    has_payloads = pay_flags.pop()

    sort_field = next(iter(sort_fields)) if sort_fields else None
    if sort_field:
        return _merge_segments_sorted(
            spark, index_dir, sources, src_rows, deleted, sort_field,
            hot_df_threshold, new_segment_id, t0, has_offsets, has_payloads,
        )

    # ---- per-source doc bases + compaction maps (DocIDMerger.java:49-90) ---
    # alive[seg] = bool mask over local ids; base[seg] = global offset of the
    # segment's first surviving doc in the merged id space.
    norms_rows = (
        spark.read.parquet(idx_path)
        .filter((F.col("kind") == KIND_NORMS) & F.col("segment_id").isin(sources))
        .select("segment_id", "doc_blob")
        .collect()
    )
    old_norms = {int(r.segment_id): np.frombuffer(r.doc_blob, np.uint8) for r in norms_rows}
    bases: dict[int, int] = {}
    alive_masks: dict[int, np.ndarray] = {}
    new_norm_parts = []
    base = 0
    for seg in sources:
        max_doc = int(src_rows[seg]["max_doc"])
        mask = np.ones(max_doc, dtype=bool)
        if seg in deleted:
            mask[deleted[seg]] = False
        alive_masks[seg] = mask
        bases[seg] = base
        base += int(mask.sum())
        new_norm_parts.append(old_norms.get(seg, np.zeros(max_doc, np.uint8))[mask])
    merged_norms = (
        np.concatenate(new_norm_parts) if new_norm_parts else np.empty(0, np.uint8)
    )
    merged_max_doc = int(base)
    # block metadata (blk_last) and the merge rebase arithmetic are int32 —
    # fail loudly before a doc id silently wraps (the per-segment ceiling is
    # Lucene's own IndexWriter.MAX_DOCS ~ 2^31; shard across segments instead)
    if merged_max_doc >= 2**31:
        raise ValueError(
            f"merged segment would have {merged_max_doc} docs >= 2^31 — "
            "doc ids and block metadata are int32; lower max_merged_size"
        )
    merged_doc_count = int((merged_norms != 0).sum())

    dirty = {s for s in sources if s in deleted and len(deleted[s])}
    seg_order = {s: i for i, s in enumerate(sources)}
    bc = spark.sparkContext.broadcast(
        {
            "bases": bases,
            "alive": {s: alive_masks[s] for s in dirty},
            "norms": {s: old_norms.get(s) for s in dirty},
            "order": seg_order,
            "dirty": dirty,
        }
    )

    # ---- pass 1 (map-side): rebase blocks; re-encode dirty rows ------------
    posts = (
        _with_off_cols(spark.read.parquet(idx_path))
        .filter((F.col("kind") == KIND_POSTING) & F.col("segment_id").isin(sources))
        .select(
            "segment_id", "shard", "term", "df", "ttf",
            "doc_blob", "freq_blob", "pos_blob",
            "blk_last", "blk_maxf", "blk_minn", "blk_len",
            "blk_doc_boff", "blk_freq_boff", "blk_pos_boff",
            "off_blob", "blk_off_boff", "pay_blob", "blk_pay_boff",
        )
    )

    BLOB_COLS = [
        "doc_blob", "freq_blob", "pos_blob",
        "blk_last", "blk_maxf", "blk_minn", "blk_len",
        "blk_doc_boff", "blk_freq_boff", "blk_pos_boff",
        "off_blob", "blk_off_boff", "pay_blob", "blk_pay_boff",
    ]
    PASS1_SCHEMA = (
        "seg_order int, shard int, term string, df bigint, ttf bigint, "
        + ", ".join(f"{c} binary" for c in BLOB_COLS)
        + ", first_doc bigint, last_doc bigint"
    )

    def _pass1_clean(cl, st):
        """Vectorized rebase for rows of delete-free segments — the common
        case. Per row the work is (a) blk_last += base, (b) normalize the
        leading vbyte to fixed-5 and shift the other block byte offsets,
        (c) first/last doc extraction: all flat batch passes over the
        concatenated int32 arrays / leading bytes, with one cheap slice per
        row to re-split (no per-row numpy calls — see CLAUDE.md hot-path
        rule)."""
        cl = cl.reset_index(drop=True)  # align Series with the positional lists
        n = len(cl)
        cbase = cl["segment_id"].map(st["bases"]).to_numpy(np.int64)

        # blk_last += base over the whole batch at once
        bl_blobs = cl["blk_last"].tolist()
        counts = np.fromiter((len(b) >> 2 for b in bl_blobs), np.int64, n)
        big = np.frombuffer(b"".join(bl_blobs), np.int32).astype(np.int64)
        big += np.repeat(cbase, counts)
        bounds = np.zeros(n + 1, np.int64)
        np.cumsum(counts, out=bounds[1:])
        buf = memoryview(big.astype(np.int32).tobytes())
        blk_last_out = [bytes(buf[bounds[i] * 4 : bounds[i + 1] * 4]) for i in range(n)]
        last_doc = big[bounds[1:] - 1]  # every posting row has >= 1 block

        # decode every row's leading vbyte in one (n, 5) pass
        dblobs = cl["doc_blob"].tolist()
        first5 = np.frombuffer(
            b"".join(b[:5].ljust(5, b"\x00") for b in dblobs), np.uint8
        ).reshape(n, 5)
        cont = (first5 & 0x80) != 0
        v0 = np.where(cont.all(axis=1), 5, np.argmin(cont, axis=1) + 1)
        sel = np.arange(5)[None, :] < v0[:, None]
        first_val = (
            ((first5 & np.uint8(0x7F)).astype(np.int64) << (7 * np.arange(5))) * sel
        ).sum(axis=1)
        enc5 = np.empty((n, 5), np.uint8)
        for i in range(5):
            enc5[:, i] = ((first_val >> (7 * i)) & 0x7F) | (0x80 if i < 4 else 0)
        e5 = memoryview(enc5.tobytes())
        doc_blob_out = [
            b if v == 5 else bytes(e5[j * 5 : j * 5 + 5]) + b[v:]
            for j, (b, v) in enumerate(zip(dblobs, v0))
        ]

        # blk_doc_boff[1:] += (5 - v0): add to all, subtract back at row heads
        shift = (5 - v0).astype(np.int64)
        bo_blobs = cl["blk_doc_boff"].tolist()
        bcounts = np.fromiter((len(b) >> 2 for b in bo_blobs), np.int64, n)
        bbig = np.frombuffer(b"".join(bo_blobs), np.int32).astype(np.int64)
        bbig += np.repeat(shift, bcounts)
        bstarts = np.zeros(n + 1, np.int64)
        np.cumsum(bcounts, out=bstarts[1:])
        bbig[bstarts[:-1]] -= shift
        bbuf = memoryview(bbig.astype(np.int32).tobytes())
        boff_out = [bytes(bbuf[bstarts[i] * 4 : bstarts[i + 1] * 4]) for i in range(n)]

        return pd.DataFrame(
            {
                "seg_order": cl["segment_id"].map(st["order"]).astype("int32"),
                "shard": cl["shard"].astype("int32"),
                "term": cl["term"],
                "df": cl["df"].astype("int64"),
                "ttf": cl["ttf"].astype("int64"),
                "doc_blob": doc_blob_out,
                "freq_blob": cl["freq_blob"],
                "pos_blob": cl["pos_blob"],
                "blk_last": blk_last_out,
                "blk_maxf": cl["blk_maxf"],
                "blk_minn": cl["blk_minn"],
                "blk_len": cl["blk_len"],
                "blk_doc_boff": boff_out,
                "blk_freq_boff": cl["blk_freq_boff"],
                "blk_pos_boff": cl["blk_pos_boff"],
                # offsets are per-(term,doc)-list deltas and payloads are
                # doc-id-free fixed-width floats — both doc-base invariant
                "off_blob": cl["off_blob"],
                "blk_off_boff": cl["blk_off_boff"],
                "pay_blob": cl["pay_blob"],
                "blk_pay_boff": cl["blk_pay_boff"],
                "first_doc": first_val + cbase,
                "last_doc": last_doc,
            }
        )

    def pass1(it):
        st = bc.value
        for pdf in it:
            if not len(pdf):
                continue
            dirty_mask = (
                pdf["segment_id"].isin(st["dirty"]).to_numpy()
                if st["dirty"]
                else np.zeros(len(pdf), bool)
            )
            cl = pdf[~dirty_mask]
            if len(cl):
                yield _pass1_clean(cl, st)
            if not dirty_mask.any():
                continue
            out = {
                k: []
                for k in (
                    "seg_order", "shard", "term", "df", "ttf",
                    *BLOB_COLS, "first_doc", "last_doc",
                )
            }
            for r in pdf[dirty_mask].itertuples(index=False):
                seg = int(r.segment_id)
                b = st["bases"][seg]
                # full re-encode with deleted docs dropped + ids compacted
                mask = st["alive"][seg]
                newid = np.cumsum(mask) - 1  # old local id -> new local id
                deltas = decode_doc_deltas(r.doc_blob, r.blk_doc_boff, r.blk_len)
                docs = np.cumsum(deltas)
                freqs = decode_freq_values(r.freq_blob, r.blk_freq_boff, r.blk_len)
                keep = mask[docs]
                if not keep.any():
                    continue
                pdeltas = vbyte_decode(np.frombuffer(r.pos_blob, np.uint8)).astype(np.int64)
                occ_starts = np.zeros(len(freqs), dtype=np.int64)
                np.cumsum(freqs[:-1], out=occ_starts[1:])
                pos = delta_decode_lists(pdeltas, occ_starts)
                occ_keep = np.repeat(keep, freqs)
                docs2 = newid[docs[keep]]
                freqs2 = freqs[keep]
                pos2 = pos[occ_keep]
                occ_starts2 = np.zeros(len(freqs2), dtype=np.int64)
                np.cumsum(freqs2[:-1], out=occ_starts2[1:])
                enc = encode_posting_row(docs2, freqs2)
                p_enc, p_nb = vbyte_encode(
                    delta_encode_lists(pos2, occ_starts2).astype(np.uint64)
                )
                byte_cum_p = np.concatenate(([0], np.cumsum(p_nb)))
                blk_pos_boff = byte_cum_p[occ_starts2[enc["blk_flat"]]].astype(np.int32)
                norms_alive = st["norms"][seg][mask]
                bl, bm, bn, _ = _block_meta(docs2, freqs2, norms_alive[docs2])
                bl_g = (np.frombuffer(bl, np.int32) + b).astype(np.int32).tobytes()
                # normalize the leading vbyte to the fixed 5-byte form so
                # the later chain-patch is length-invariant
                dblob, dboff, _ = normalize_first_vbyte(
                    enc["doc_blob"], np.frombuffer(enc["blk_doc_boff"], np.int32)
                )
                out["df"].append(len(docs2))
                out["ttf"].append(int(freqs2.sum()))
                out["doc_blob"].append(dblob)
                out["freq_blob"].append(enc["freq_blob"])
                out["pos_blob"].append(p_enc.tobytes())
                out["blk_last"].append(bl_g)
                out["blk_maxf"].append(bm)
                out["blk_minn"].append(bn)
                out["blk_len"].append(enc["blk_len"].tobytes())
                out["blk_doc_boff"].append(dboff.tobytes())
                out["blk_freq_boff"].append(enc["blk_freq_boff"])
                out["blk_pos_boff"].append(blk_pos_boff.tobytes())
                if len(r.off_blob):
                    # offset start-deltas reset per (term, doc) list, so
                    # dropping whole docs keeps surviving chains intact —
                    # filter the interleaved (delta, len) pairs, re-vbyte
                    off_vals = vbyte_decode(
                        np.frombuffer(r.off_blob, np.uint8)
                    ).astype(np.uint64)
                    off2 = off_vals.reshape(-1, 2)[occ_keep].ravel()
                    o_enc, o_nb = vbyte_encode(off2)
                    byte_cum_o = np.concatenate(([0], np.cumsum(o_nb)))
                    out["off_blob"].append(o_enc.tobytes())
                    out["blk_off_boff"].append(
                        byte_cum_o[2 * occ_starts2[enc["blk_flat"]]]
                        .astype(np.int32)
                        .tobytes()
                    )
                else:
                    out["off_blob"].append(b"")
                    out["blk_off_boff"].append(b"")
                if len(r.pay_blob):
                    # fixed-width float32 per occurrence: drop deleted docs'
                    # occurrences, block byte offset = 4 * occ index
                    pay2 = np.frombuffer(r.pay_blob, np.float32)[occ_keep]
                    out["pay_blob"].append(pay2.tobytes())
                    out["blk_pay_boff"].append(
                        (4 * occ_starts2[enc["blk_flat"]]).astype(np.int32).tobytes()
                    )
                else:
                    out["pay_blob"].append(b"")
                    out["blk_pay_boff"].append(b"")
                out["first_doc"].append(int(docs2[0]) + b)
                out["last_doc"].append(int(docs2[-1]) + b)
                out["seg_order"].append(st["order"][seg])
                out["shard"].append(int(r.shard))
                out["term"].append(r.term)
            yield pd.DataFrame(out)

    p1 = posts.mapInPandas(pass1, PASS1_SCHEMA)

    # ---- chaining window + first-VByte patch (one shuffle on term) ---------
    w = Window.partitionBy("term").orderBy("seg_order", "shard")
    wb = w.rowsBetween(Window.unboundedPreceding, -1)
    # cold rows get a chaining delta (they will be concatenated into one
    # blob); hot rows stay separate shard rows and must remain SELF-CONTAINED
    # (first VByte = absolute global docid) so any future merge can rebase
    # them again — this invariant is what makes merges composable. The *_bbase
    # sums are each row's byte offset inside the concatenated cold blobs
    # (pass1 normalized every leading vbyte to 5 bytes, so post-patch lengths
    # equal these pre-patch lengths).
    p2 = (
        p1.withColumn("prev_last", F.lag("last_doc").over(w))
        .withColumn("term_df", F.sum("df").over(Window.partitionBy("term")))
        .withColumn(
            "patch_val",
            F.when(
                F.col("term_df") > hot_df_threshold, F.col("first_doc")
            ).otherwise(
                F.col("first_doc") - F.coalesce(F.col("prev_last"), F.lit(0))
            ),
        )
        .withColumn("out_shard", F.row_number().over(w) - 1)
        .withColumn("doc_bbase", F.coalesce(F.sum(F.octet_length("doc_blob")).over(wb), F.lit(0)))
        .withColumn("freq_bbase", F.coalesce(F.sum(F.octet_length("freq_blob")).over(wb), F.lit(0)))
        .withColumn("pos_bbase", F.coalesce(F.sum(F.octet_length("pos_blob")).over(wb), F.lit(0)))
        .withColumn("off_bbase", F.coalesce(F.sum(F.octet_length("off_blob")).over(wb), F.lit(0)))
        .withColumn("pay_bbase", F.coalesce(F.sum(F.octet_length("pay_blob")).over(wb), F.lit(0)))
    )

    PATCH_SCHEMA = (
        "seg_order int, shard int, out_shard int, term string, df bigint, "
        "ttf bigint, term_df bigint, "
        + ", ".join(f"{c} binary" for c in BLOB_COLS)
    )

    def patch(it):
        for pdf in it:
            pdf = pdf.reset_index(drop=True)
            n = len(pdf)
            hot_mask = (pdf["term_df"] > hot_df_threshold).to_numpy()
            # leading vbyte is 5 bytes (pass1 normalized) — length-stable.
            # Encode every row's patch value in one (n, 5) pass.
            vals = pdf["patch_val"].to_numpy(np.int64)
            enc5 = np.empty((n, 5), np.uint8)
            for i in range(5):
                enc5[:, i] = ((vals >> (7 * i)) & 0x7F) | (0x80 if i < 4 else 0)
            e5 = memoryview(enc5.tobytes())
            doc_blobs = [
                bytes(e5[j * 5 : j * 5 + 5]) + blob[5:]
                for j, blob in enumerate(pdf["doc_blob"])
            ]
            # hot rows keep their self-contained offsets; cold rows' offsets
            # rebase into the concatenated cold blobs — batched per column
            dboffs = pdf["blk_doc_boff"].tolist()
            fboffs = pdf["blk_freq_boff"].tolist()
            pboffs = pdf["blk_pos_boff"].tolist()
            oboffs = pdf["blk_off_boff"].tolist()
            pboffs2 = pdf["blk_pay_boff"].tolist()
            cold_idx = np.flatnonzero(~hot_mask)
            if len(cold_idx):
                for col, base_col, outlist in (
                    ("blk_doc_boff", "doc_bbase", dboffs),
                    ("blk_freq_boff", "freq_bbase", fboffs),
                    ("blk_pos_boff", "pos_bbase", pboffs),
                    ("blk_off_boff", "off_bbase", oboffs),
                    ("blk_pay_boff", "pay_bbase", pboffs2),
                ):
                    blobs = [outlist[j] for j in cold_idx]
                    add = pdf[base_col].to_numpy(np.int64)[cold_idx]
                    counts = np.fromiter(
                        (len(b) >> 2 for b in blobs), np.int64, len(blobs)
                    )
                    big = np.frombuffer(b"".join(blobs), np.int32).astype(np.int64)
                    big += np.repeat(add, counts)
                    bounds = np.zeros(len(blobs) + 1, np.int64)
                    np.cumsum(counts, out=bounds[1:])
                    buf = memoryview(big.astype(np.int32).tobytes())
                    for k, j in enumerate(cold_idx):
                        outlist[j] = bytes(buf[bounds[k] * 4 : bounds[k + 1] * 4])
            cols = [
                "seg_order", "shard", "out_shard", "term", "df", "ttf", "term_df",
                "freq_blob", "pos_blob", "blk_last", "blk_maxf", "blk_minn", "blk_len",
            ]
            pdf2 = pdf[cols].copy()
            pdf2.insert(7, "doc_blob", doc_blobs)
            pdf2["blk_doc_boff"] = dboffs
            pdf2["blk_freq_boff"] = fboffs
            pdf2["blk_pos_boff"] = pboffs
            pdf2["off_blob"] = pdf["off_blob"]
            pdf2["blk_off_boff"] = oboffs
            pdf2["pay_blob"] = pdf["pay_blob"]
            pdf2["blk_pay_boff"] = pboffs2
            yield pdf2

    patched = p2.mapInPandas(patch, PATCH_SCHEMA)

    # ---- reduce: cold terms concat to one row; hot terms stay sharded ------
    cold = patched.filter(F.col("term_df") <= hot_df_threshold)
    hot = patched.filter(F.col("term_df") > hot_df_threshold)

    def _concat(col):
        arr = F.array_sort(
            F.collect_list(
                F.struct(F.col("seg_order"), F.col("shard"), F.col(col).alias("b"))
            )
        )
        return F.aggregate(
            arr, F.lit(b""), lambda acc, x: F.concat(acc, x["b"])
        ).alias(col)

    cold_m = cold.groupBy("term").agg(
        F.sum("df").alias("df"),
        F.sum("ttf").alias("ttf"),
        *[_concat(c) for c in BLOB_COLS],
    ).withColumn("shard", F.lit(0))

    # salted path: shard id = dense rank of (source, source-shard) — query-time
    # decode concatenates shards in shard order (SegmentPostings)
    hot_m = hot.select(
        "term", "df", "ttf", *BLOB_COLS,
        F.col("out_shard").alias("shard"),
    )

    merged = cold_m.unionByName(hot_m).select(
        F.lit(new_segment_id).cast("int").alias("segment_id"),
        F.lit(KIND_POSTING).alias("kind"),
        "term", "df", "ttf", *BLOB_COLS,
        F.lit(-1).cast("bigint").alias("max_doc"),
        F.lit(-1).cast("bigint").alias("doc_count"),
        F.lit(-1).cast("bigint").alias("sum_len"),
        "shard",
    )
    # segment aggregates ride the write itself (CollectMetrics) — no re-scan
    # of the just-written postings. n_terms = shard-0 row count: every term
    # has exactly ONE shard-0 row (cold rows concat to shard 0; hot shards
    # are numbered from 0), and DISTINCT aggregates aren't allowed in observe.
    from pyspark.sql import Observation

    obs = Observation("merge_agg")
    merged = merged.observe(
        obs,
        F.sum(F.when(F.col("shard") == 0, 1).otherwise(0)).alias("n_terms"),
        F.sum("df").alias("n_postings"),
        F.sum("ttf").alias("sum_len"),
    )
    merged.write.mode("append").partitionBy("kind").parquet(idx_path)
    from collections import namedtuple

    _Agg = namedtuple("Agg", ["n_terms", "n_postings", "sum_len"])
    got = obs.get
    agg = _Agg(got["n_terms"], got["n_postings"], got["sum_len"])
    merged_sum_len = int(agg.sum_len or 0)

    # ---- norms + stats rows ------------------------------------------------
    extra = pd.DataFrame(
        {
            "segment_id": [new_segment_id, new_segment_id],
            "kind": [KIND_NORMS, KIND_STATS],
            "term": [None, None],
            "df": [merged_max_doc, int(agg.n_terms or 0)],
            "ttf": [0, int(agg.n_postings or 0)],
            "doc_blob": [merged_norms.tobytes(), b""],
            "freq_blob": [b"", b""],
            "pos_blob": [b"", b""],
            "blk_last": [b"", b""],
            "blk_maxf": [b"", b""],
            "blk_minn": [b"", b""],
            "blk_len": [b"", b""],
            "blk_doc_boff": [b"", b""],
            "blk_freq_boff": [b"", b""],
            "blk_pos_boff": [b"", b""],
            "off_blob": [b"", b""],
            "blk_off_boff": [b"", b""],
            "pay_blob": [b"", b""],
            "blk_pay_boff": [b"", b""],
            "max_doc": [merged_max_doc, merged_max_doc],
            "doc_count": [merged_doc_count, merged_doc_count],
            "sum_len": [merged_sum_len, merged_sum_len],
            "shard": [0, 0],
        }
    )
    spark.createDataFrame(extra, schema=UNIFIED_SCHEMA).write.mode("append").partitionBy(
        "kind"
    ).parquet(idx_path)

    # ---- docs table: remapped stored-field rows for the new segment --------
    docs = spark.read.parquet(os.path.join(index_dir, "docs"))
    src_docs = docs.filter(F.col("segment_id").isin(sources))
    if dirty:
        del_keys = []
        for seg in dirty:
            for d in deleted[seg]:
                del_keys.append((seg, int(d)))
        del_df = spark.createDataFrame(del_keys, "segment_id int, doc_id bigint")
        src_docs = src_docs.join(del_df, ["segment_id", "doc_id"], "left_anti")
    base_df = spark.createDataFrame(
        [(s, bases[s], seg_order[s]) for s in sources],
        "segment_id int, doc_base bigint, seg_order int",
    )
    remap_w = Window.partitionBy("segment_id").orderBy("doc_id")
    new_docs = (
        src_docs.withColumn("new_local", F.row_number().over(remap_w) - 1)
        .join(F.broadcast(base_df), "segment_id")
        .withColumn("new_doc_id", F.col("new_local") + F.col("doc_base"))
        .drop("segment_id", "doc_id", "new_local", "doc_base", "seg_order")
        .withColumnRenamed("new_doc_id", "doc_id")
        .withColumn("segment_id", F.lit(new_segment_id).cast("int"))
    )
    new_docs.select(
        [F.col(c).cast(docs.schema[c].dataType) for c in docs.columns]
    ).write.mode("append").parquet(os.path.join(index_dir, "docs"))

    # ---- fold pending DV updates through the same docmap -------------------
    # (ReadersAndUpdates.writeFieldUpdates role; BEFORE the manifest commit
    # so a crash leaves only rows addressed at a never-live segment)
    from .docvalues import dv_fields, fold_dv_updates

    if dv_fields(index_dir):
        docmap = (
            src_docs.select("segment_id", "doc_id")
            .withColumn("new_local", F.row_number().over(remap_w) - 1)
            .join(F.broadcast(base_df), "segment_id")
            .select(
                "segment_id",
                "doc_id",
                (F.col("new_local") + F.col("doc_base")).alias("new_doc_id"),
            )
        )
        fold_dv_updates(spark, index_dir, sources, new_segment_id, docmap)

    # ---- manifest commit ---------------------------------------------------
    max_gen = int(
        man.filter(F.col("segment_id").isin(sources)).agg(F.max("generation")).collect()[0][0]
    )
    lineage_d = {
        "merged_from": sources,
        "compacted_deletes": sorted(dirty),
        "merged_at": t0,
        "hot_df_threshold": hot_df_threshold,
    }
    if has_offsets:
        lineage_d["store_offsets"] = True
    if has_payloads:
        lineage_d["store_payloads"] = True
    if has_payloads:
        lineage_d["store_payloads"] = True
    lineage = json.dumps(lineage_d)
    man_row = (
        spark.range(1)
        .select(
            F.lit(new_segment_id).cast("int").alias("segment_id"),
            F.lit(int(agg.n_terms or 0)).cast("long").alias("n_terms"),
            F.lit(int(agg.n_postings or 0)).cast("long").alias("n_postings"),
            F.lit(merged_max_doc).cast("long").alias("max_doc"),
            F.lit(merged_doc_count).cast("long").alias("doc_count"),
            F.lit(merged_sum_len).cast("long").alias("sum_len"),
            F.lit(max_gen + 1).cast("int").alias("generation"),
            F.lit(lineage).alias("lineage"),
        )
    )
    man_row.select(*man.columns).write.mode("append").parquet(manifest_path(index_dir))

    # ---- global term stats: rebuild iff deletes were compacted (df changed)
    if dirty:
        rebuild_term_stats(spark, index_dir)

    bc.destroy()
    return {
        "segment_id": new_segment_id,
        "sources": sources,
        "max_doc": merged_max_doc,
        "doc_count": merged_doc_count,
        "sum_len": merged_sum_len,
        "n_terms": int(agg.n_terms or 0),
        "compacted_deletes": sorted(dirty),
        "seconds": time.time() - t0,
    }


def _encode_term_rows(
    term: str,
    docs: np.ndarray,
    freqs: np.ndarray,
    pos: np.ndarray,
    norms: np.ndarray,
    hot_df_threshold: int,
    offs: np.ndarray | None = None,
    pays: np.ndarray | None = None,
) -> list[dict]:
    """Encode ONE merged term's postings (global doc ids, already sorted
    ascending) into final UNIFIED_SCHEMA-shaped rows. Terms with df >
    hot_df_threshold split into contiguous shard rows, each self-contained
    (first VByte = absolute global doc id), matching the salted-row format
    contract so any FUTURE merge can rebase them again.

    ``offs``: optional (n_occurrences, 2) int64 array of ABSOLUTE char
    (start, length) pairs aligned with ``pos`` — re-encoded as the
    interleaved per-(term, doc) delta stream of the build kernel.
    ``pays``: optional float32 payload per occurrence aligned with ``pos``
    — sliced per shard, fixed-width (no re-encoding needed)."""
    n = len(docs)
    if n <= hot_df_threshold:
        bounds = [(0, n)]
    else:
        nsh = -(-n // hot_df_threshold)
        cuts = np.linspace(0, n, nsh + 1).astype(np.int64)
        bounds = list(zip(cuts[:-1], cuts[1:]))
    occ_cum = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(freqs, out=occ_cum[1:])
    rows = []
    for shard, (a, b) in enumerate(bounds):
        d = docs[a:b]
        f = freqs[a:b]
        p = pos[occ_cum[a] : occ_cum[b]]
        occ_starts = np.zeros(len(f), dtype=np.int64)
        np.cumsum(f[:-1], out=occ_starts[1:])
        enc = encode_posting_row(d, f)
        p_enc, p_nb = vbyte_encode(
            delta_encode_lists(p, occ_starts).astype(np.uint64)
        )
        byte_cum = np.concatenate(([0], np.cumsum(p_nb)))
        blk_pos_boff = byte_cum[occ_starts[enc["blk_flat"]]].astype(np.int32)
        bl, bm, bn, _ = _block_meta(d, f, norms[d])
        if offs is not None:
            o = offs[occ_cum[a] : occ_cum[b]]
            inter = np.empty(2 * len(o), dtype=np.uint64)
            inter[0::2] = delta_encode_lists(
                o[:, 0].astype(np.int64), occ_starts
            ).astype(np.uint64)
            inter[1::2] = o[:, 1].astype(np.uint64)
            o_enc, o_nb = vbyte_encode(inter)
            byte_cum_o = np.concatenate(([0], np.cumsum(o_nb)))
            off_blob = o_enc.tobytes()
            blk_off_boff = (
                byte_cum_o[2 * occ_starts[enc["blk_flat"]]].astype(np.int32).tobytes()
            )
        else:
            off_blob, blk_off_boff = b"", b""
        if pays is not None:
            pay_blob = np.ascontiguousarray(
                pays[occ_cum[a] : occ_cum[b]]
            ).tobytes()
            blk_pay_boff = (
                (4 * occ_starts[enc["blk_flat"]]).astype(np.int32).tobytes()
            )
        else:
            pay_blob, blk_pay_boff = b"", b""
        rows.append(
            {
                "term": term,
                "df": int(len(d)),
                "ttf": int(f.sum()),
                "doc_blob": enc["doc_blob"],
                "freq_blob": enc["freq_blob"],
                "pos_blob": p_enc.tobytes(),
                "blk_last": bl,
                "blk_maxf": bm,
                "blk_minn": bn,
                "blk_len": enc["blk_len"].tobytes(),
                "blk_doc_boff": enc["blk_doc_boff"],
                "blk_freq_boff": enc["blk_freq_boff"],
                "blk_pos_boff": blk_pos_boff.tobytes(),
                "off_blob": off_blob,
                "blk_off_boff": blk_off_boff,
                "pay_blob": pay_blob,
                "blk_pay_boff": blk_pay_boff,
                "shard": shard,
            }
        )
    return rows


def _merge_segments_sorted(
    spark: SparkSession,
    index_dir: str,
    sources: list[int],
    src_rows: dict[int, dict],
    deleted: dict[int, np.ndarray],
    sort_field: str,
    hot_df_threshold: int,
    new_segment_id: int,
    t0: float,
    has_offsets: bool = False,
    has_payloads: bool = False,
) -> dict:
    """Sorted merge: the merged doc order is the index-sort order, so
    ``search_sorted`` early termination survives compaction.

    Reference shape (``index/DocIDMerger.java:49-90`` sorted mode fed by
    ``MergeState`` docmaps): every source doc gets a new id from the GLOBAL
    sort of (sort value, source order, local id); since each source segment
    is already internally sorted, this is a stable merge of sorted runs and
    each per-segment docmap is monotone — remapped posting rows stay
    doc-ascending and the per-term reduce is a k-way merge.

    Unlike the concatenating merge (which chain-patches one VByte per clean
    row), a sorted merge interleaves doc ids across sources, so EVERY posting
    row is decoded, remapped and re-encoded — the same cost the reference
    pays (sorted merges rewrite postings through docmaps). The docmap itself
    is O(maxDoc-of-the-merge) int32s held once and broadcast, exactly the
    reference's in-RAM MergeState docmap, bounded by max_merged_size.
    """
    idx_path = os.path.join(index_dir, "index")
    seg_order = {s: i for i, s in enumerate(sources)}

    # ---- stage 0: docmaps from the stored sort column ----------------------
    docs_tbl = spark.read.parquet(os.path.join(index_dir, "docs"))
    map_pdf = (
        docs_tbl.filter(F.col("segment_id").isin(sources))
        .select("segment_id", "doc_id", sort_field)
        .toPandas()
    )
    map_pdf["seg_order"] = map_pdf["segment_id"].map(seg_order)
    # drop tombstoned docs before assigning new ids (compaction)
    if deleted:
        dead = pd.concat(
            [
                pd.DataFrame({"segment_id": s, "doc_id": d})
                for s, d in deleted.items()
            ]
        )
        dead["__dead"] = True
        map_pdf = map_pdf.merge(dead, on=["segment_id", "doc_id"], how="left")
        map_pdf = map_pdf[map_pdf["__dead"].isna()].drop(columns="__dead")
    map_pdf = map_pdf.sort_values(
        [sort_field, "seg_order", "doc_id"], kind="mergesort"
    ).reset_index(drop=True)
    map_pdf["new_doc_id"] = np.arange(len(map_pdf), dtype=np.int64)
    merged_max_doc = int(len(map_pdf))
    if merged_max_doc >= 2**31:
        raise ValueError(
            f"merged segment would have {merged_max_doc} docs >= 2^31 — "
            "doc ids and block metadata are int32; lower max_merged_size"
        )

    docmaps: dict[int, np.ndarray] = {}
    for seg in sources:
        dm = np.full(int(src_rows[seg]["max_doc"]), -1, dtype=np.int32)
        part = map_pdf[map_pdf["segment_id"] == seg]
        dm[part["doc_id"].to_numpy(np.int64)] = part["new_doc_id"].to_numpy(np.int32)
        docmaps[seg] = dm

    # ---- merged norms via the docmap ---------------------------------------
    norms_rows = (
        spark.read.parquet(idx_path)
        .filter((F.col("kind") == KIND_NORMS) & F.col("segment_id").isin(sources))
        .select("segment_id", "doc_blob")
        .collect()
    )
    old_norms = {int(r.segment_id): np.frombuffer(r.doc_blob, np.uint8) for r in norms_rows}
    merged_norms = np.zeros(merged_max_doc, dtype=np.uint8)
    for seg in sources:
        dm = docmaps[seg]
        alive = dm >= 0
        src_n = old_norms.get(seg)
        if src_n is not None and alive.any():
            merged_norms[dm[alive]] = src_n[: len(dm)][alive]
    merged_doc_count = int((merged_norms != 0).sum())

    bc = spark.sparkContext.broadcast({"docmaps": docmaps, "norms": merged_norms})

    # ---- stage 1 (map): decode + remap each posting row --------------------
    posts = (
        _with_off_cols(spark.read.parquet(idx_path))
        .filter((F.col("kind") == KIND_POSTING) & F.col("segment_id").isin(sources))
        .select(
            "segment_id", "term", "doc_blob", "freq_blob", "pos_blob",
            "blk_doc_boff", "blk_freq_boff", "blk_len",
            "off_blob", "pay_blob",
        )
    )

    DECODED_SCHEMA = (
        "term string, docs binary, freqs binary, pos binary, offs binary, "
        "pays binary"
    )

    def remap(it):
        docmaps_b = bc.value["docmaps"]
        for pdf in it:
            out = {"term": [], "docs": [], "freqs": [], "pos": [], "offs": [],
                   "pays": []}
            # per posting ROW (one term's whole blob each — numpy inside),
            # same granularity as the concatenating merge's dirty path
            for r in pdf.itertuples(index=False):
                dm = docmaps_b[int(r.segment_id)]
                deltas = decode_doc_deltas(r.doc_blob, r.blk_doc_boff, r.blk_len)
                docs = np.cumsum(deltas)
                freqs = decode_freq_values(
                    r.freq_blob, r.blk_freq_boff, r.blk_len
                ).astype(np.int32)
                new_ids = dm[docs]
                keep = new_ids >= 0
                if not keep.any():
                    continue
                pdeltas = vbyte_decode(
                    np.frombuffer(r.pos_blob, np.uint8)
                ).astype(np.int64)
                occ_starts = np.zeros(len(freqs), dtype=np.int64)
                np.cumsum(freqs[:-1], out=occ_starts[1:])
                pos = delta_decode_lists(pdeltas, occ_starts)
                occ_keep = np.repeat(keep, freqs)
                out["term"].append(r.term)
                out["docs"].append(new_ids[keep].tobytes())
                out["freqs"].append(freqs[keep].tobytes())
                out["pos"].append(pos[occ_keep].astype(np.int32).tobytes())
                if has_offsets and len(r.off_blob):
                    # decode the interleaved (start-delta, len) stream to
                    # ABSOLUTE (start, len) pairs so the reduce side can
                    # permute occurrences freely before re-delta-encoding
                    ovals = vbyte_decode(
                        np.frombuffer(r.off_blob, np.uint8)
                    ).astype(np.int64)
                    pair = np.empty((len(ovals) // 2, 2), np.int64)
                    pair[:, 0] = delta_decode_lists(ovals[0::2], occ_starts)
                    pair[:, 1] = ovals[1::2]
                    out["offs"].append(pair[occ_keep].tobytes())
                else:
                    out["offs"].append(b"")
                if has_payloads and len(r.pay_blob):
                    pay = np.frombuffer(r.pay_blob, np.float32)
                    out["pays"].append(pay[occ_keep].tobytes())
                else:
                    out["pays"].append(b"")
            yield pd.DataFrame(out)

    decoded = posts.mapInPandas(remap, DECODED_SCHEMA)

    # ---- stage 2 (reduce, one shuffle on term): k-way merge + re-encode ----
    def reduce_term(pdf: pd.DataFrame) -> pd.DataFrame:
        norms = bc.value["norms"]
        term = pdf["term"].iloc[0]
        docs = np.frombuffer(b"".join(pdf["docs"]), np.int32).astype(np.int64)
        freqs = np.frombuffer(b"".join(pdf["freqs"]), np.int32).astype(np.int64)
        pos = np.frombuffer(b"".join(pdf["pos"]), np.int32).astype(np.int64)
        # rows never share a doc (each doc lives in one source), and each
        # row is already ascending (monotone docmaps) — argsort = run merge
        order = np.argsort(docs, kind="stable")
        docs_s = docs[order]
        freqs_s = freqs[order]
        occ_starts = np.zeros(len(freqs), dtype=np.int64)
        np.cumsum(freqs[:-1], out=occ_starts[1:])
        occ_perm = np.repeat(occ_starts[order], freqs_s) + (
            np.arange(int(freqs_s.sum()), dtype=np.int64)
            - np.repeat(
                np.concatenate(([0], np.cumsum(freqs_s)[:-1])), freqs_s
            )
        )
        offs = None
        if has_offsets:
            offs = np.frombuffer(b"".join(pdf["offs"]), np.int64).reshape(-1, 2)[
                occ_perm
            ]
        pays = None
        if has_payloads:
            pays = np.frombuffer(b"".join(pdf["pays"]), np.float32)[occ_perm]
        rows = _encode_term_rows(
            term, docs_s, freqs_s, pos[occ_perm], norms, hot_df_threshold,
            offs=offs, pays=pays,
        )
        out = pd.DataFrame(rows)
        out.insert(0, "segment_id", np.int32(new_segment_id))
        out.insert(1, "kind", np.int32(KIND_POSTING))
        out["max_doc"] = np.int64(-1)
        out["doc_count"] = np.int64(-1)
        out["sum_len"] = np.int64(-1)
        cols = [c.split()[0] for c in UNIFIED_SCHEMA.split(", ")]
        return out[cols]

    merged = decoded.groupBy("term").applyInPandas(reduce_term, UNIFIED_SCHEMA)

    from pyspark.sql import Observation

    obs = Observation("sorted_merge_agg")
    merged = merged.observe(
        obs,
        F.sum(F.when(F.col("shard") == 0, 1).otherwise(0)).alias("n_terms"),
        F.sum("df").alias("n_postings"),
        F.sum("ttf").alias("sum_len"),
    )
    merged.write.mode("append").partitionBy("kind").parquet(idx_path)
    got = obs.get
    n_terms = int(got["n_terms"] or 0)
    n_postings = int(got["n_postings"] or 0)
    merged_sum_len = int(got["sum_len"] or 0)

    # ---- norms + stats rows -------------------------------------------------
    extra = pd.DataFrame(
        {
            "segment_id": [new_segment_id, new_segment_id],
            "kind": [KIND_NORMS, KIND_STATS],
            "term": [None, None],
            "df": [merged_max_doc, n_terms],
            "ttf": [0, n_postings],
            "doc_blob": [merged_norms.tobytes(), b""],
            "freq_blob": [b"", b""],
            "pos_blob": [b"", b""],
            "blk_last": [b"", b""],
            "blk_maxf": [b"", b""],
            "blk_minn": [b"", b""],
            "blk_len": [b"", b""],
            "blk_doc_boff": [b"", b""],
            "blk_freq_boff": [b"", b""],
            "blk_pos_boff": [b"", b""],
            "off_blob": [b"", b""],
            "blk_off_boff": [b"", b""],
            "pay_blob": [b"", b""],
            "blk_pay_boff": [b"", b""],
            "max_doc": [merged_max_doc, merged_max_doc],
            "doc_count": [merged_doc_count, merged_doc_count],
            "sum_len": [merged_sum_len, merged_sum_len],
            "shard": [0, 0],
        }
    )
    spark.createDataFrame(extra, schema=UNIFIED_SCHEMA).write.mode("append").partitionBy(
        "kind"
    ).parquet(idx_path)

    # ---- docs table: new ids from the docmap --------------------------------
    map_df = spark.createDataFrame(
        map_pdf[["segment_id", "doc_id", "new_doc_id"]]
    ).select(
        F.col("segment_id").cast("int"),
        F.col("doc_id").cast("bigint"),
        F.col("new_doc_id").cast("bigint"),
    )
    src_docs = docs_tbl.filter(F.col("segment_id").isin(sources))
    new_docs = (
        src_docs.join(map_df, ["segment_id", "doc_id"])  # inner: drops deleted
        .drop("segment_id", "doc_id")
        .withColumnRenamed("new_doc_id", "doc_id")
        .withColumn("segment_id", F.lit(new_segment_id).cast("int"))
    )
    new_docs.select(
        [F.col(c).cast(docs_tbl.schema[c].dataType) for c in docs_tbl.columns]
    ).write.mode("append").parquet(os.path.join(index_dir, "docs"))

    # ---- fold pending DV updates through the sorted docmap ------------------
    from .docvalues import dv_fields, fold_dv_updates

    if dv_fields(index_dir):
        fold_dv_updates(spark, index_dir, sources, new_segment_id, map_df)

    # ---- manifest commit (keeps the index_sort marker) ----------------------
    man = read_manifest(spark, index_dir)
    max_gen = int(
        man.filter(F.col("segment_id").isin(sources)).agg(F.max("generation")).collect()[0][0]
    )
    dirty = sorted(s for s in sources if s in deleted and len(deleted[s]))
    lineage_d = {
        "merged_from": sources,
        "compacted_deletes": dirty,
        "merged_at": t0,
        "hot_df_threshold": hot_df_threshold,
        "index_sort": sort_field,
    }
    if has_offsets:
        lineage_d["store_offsets"] = True
    lineage = json.dumps(lineage_d)
    man_row = (
        spark.range(1)
        .select(
            F.lit(new_segment_id).cast("int").alias("segment_id"),
            F.lit(n_terms).cast("long").alias("n_terms"),
            F.lit(n_postings).cast("long").alias("n_postings"),
            F.lit(merged_max_doc).cast("long").alias("max_doc"),
            F.lit(merged_doc_count).cast("long").alias("doc_count"),
            F.lit(merged_sum_len).cast("long").alias("sum_len"),
            F.lit(max_gen + 1).cast("int").alias("generation"),
            F.lit(lineage).alias("lineage"),
        )
    )
    man_row.select(*man.columns).write.mode("append").parquet(manifest_path(index_dir))

    if dirty:
        rebuild_term_stats(spark, index_dir)

    bc.destroy()
    return {
        "segment_id": new_segment_id,
        "sources": sources,
        "max_doc": merged_max_doc,
        "doc_count": merged_doc_count,
        "sum_len": merged_sum_len,
        "n_terms": n_terms,
        "compacted_deletes": dirty,
        "index_sort": sort_field,
        "seconds": time.time() - t0,
    }


def rebuild_term_stats(spark: SparkSession, index_dir: str) -> None:
    """Recompute global (term, df, ttf) from the LIVE posting rows —
    term-sorted for parquet min/max pushdown (the FST term-index analogue).
    Publishes a NEW term_stats generation (manifest.publish_term_stats);
    open searchers keep reading their own generation."""
    from .manifest import publish_term_stats

    live = live_segments(spark, index_dir)
    post = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter((F.col("kind") == KIND_POSTING) & F.col("segment_id").isin(live))
        .select("term", "df", "ttf")
    )
    publish_term_stats(
        post.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        .repartitionByRange(max(1, len(live) // 8), "term")
        .sortWithinPartitions("term"),
        index_dir,
    )


def run_merges(
    spark: SparkSession,
    index_dir: str,
    segs_per_tier: int = 10,
    max_merge_at_once: int = 10,
    floor_size: int = 2_000,
    max_merged_size: int = 5_000_000_000,
    hot_df_threshold: int = DEFAULT_HOT_DF,
    max_rounds: int = 20,
) -> list[dict]:
    """Driver merge loop (ConcurrentMergeScheduler analogue,
    ``index/ConcurrentMergeScheduler.java:65`` — merges are just Spark jobs;
    the scheduler is this loop). Plans with TieredMergePolicy until the
    segment population fits the tier budget."""
    results = []
    for _ in range(max_rounds):
        live = set(live_segments(spark, index_dir))
        rows = [
            r.asDict()
            for r in read_manifest(spark, index_dir).collect()
            if int(r["segment_id"]) in live
        ]
        # tombstone counts per live segment (sum of kind=3 row dfs — an upper
        # bound when a doc is deleted twice; plan_merges caps the ratio at 1)
        del_rows = (
            spark.read.parquet(os.path.join(index_dir, "index"))
            .filter((F.col("kind") == KIND_DELETES) & F.col("segment_id").isin(list(live)))
            .groupBy("segment_id")
            .agg(F.sum("df").alias("dels"))
            .collect()
        )
        dels = {int(r.segment_id): int(r.dels) for r in del_rows}
        for r in rows:
            r["del_count"] = dels.get(int(r["segment_id"]), 0)
        plans = plan_merges(
            rows,
            segs_per_tier=segs_per_tier,
            max_merge_at_once=max_merge_at_once,
            floor_size=floor_size,
            max_merged_size=max_merged_size,
        )
        if not plans:
            break
        for sources in plans:
            results.append(
                merge_segments(
                    spark, index_dir, sources, hot_df_threshold=hot_df_threshold
                )
            )
    return results
