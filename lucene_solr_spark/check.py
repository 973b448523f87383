"""CheckIndex — structural invariant verification over the index tables.

The reference's ``CheckIndex`` (``index/CheckIndex.java:85,496,1124``)
validates postings order, stats consistency and norms presence across every
segment. Same checks here, expressed as distributed DataFrame assertions
over the live commit point (decode runs in ``mapInArrow``, the verdict is a
tiny collected summary):

- postings sorted: per (segment, term) docIDs strictly ascending, in-range
- df/ttf consistency: stored df == decoded posting count, ttf == Σ freq,
  1 ≤ freq, df ≤ ttf (CollectionStatistics invariants :30-40)
- block metadata: per-block last_doc matches decoded docs; Σ blk_len == df
- norms: one norm byte per doc (blob length == max_doc); empty ⇔ norm 0
- term_stats: global df/ttf equal the per-segment sums over live segments
- manifest: doc_count ≤ max_doc, sum_len == Σ ttf
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession, functions as F

from .codec import decode_doc_deltas, decode_freq_values
from .index.manifest import live_segments, read_manifest


def check_index(spark: SparkSession, index_dir: str) -> dict:
    """Run all invariant checks; returns {check: n_violations} (all 0 = OK)."""
    live = live_segments(spark, index_dir)
    idx = spark.read.parquet(os.path.join(index_dir, "index"))
    posts = idx.filter((F.col("kind") == 0) & F.col("segment_id").isin(live))

    CHECK_SCHEMA = (
        "bad_sort bigint, bad_df bigint, bad_ttf bigint, bad_freq bigint, "
        "bad_blocks bigint, bad_blklen bigint, bad_boffs bigint"
    )

    def verify(it):
        for pdf in it:
            bad_sort = bad_df = bad_ttf = bad_freq = 0
            bad_blocks = bad_blklen = bad_boffs = 0
            for r in pdf.itertuples(index=False):
                docs = np.cumsum(decode_doc_deltas(r.doc_blob, r.blk_doc_boff, r.blk_len))
                freqs = decode_freq_values(r.freq_blob, r.blk_freq_boff, r.blk_len)
                if len(docs) > 1 and not (np.diff(docs) > 0).all():
                    bad_sort += 1
                if len(docs) != r.df:
                    bad_df += 1
                if freqs.sum() != r.ttf:
                    bad_ttf += 1
                if len(freqs) == 0 or (freqs < 1).any():
                    bad_freq += 1
                blk_last = np.frombuffer(r.blk_last, np.int32)
                blk_len = np.frombuffer(r.blk_len, np.int32).astype(np.int64)
                if blk_len.sum() != len(docs):
                    bad_blklen += 1
                else:
                    ends = np.cumsum(blk_len) - 1
                    if not np.array_equal(docs[ends], blk_last.astype(np.int64)):
                        bad_blocks += 1
                # skip-pointer integrity: one offset per block, monotone
                # ascending from 0, within the blob (Lucene50SkipWriter fp role)
                n_blk = len(blk_len)
                for boff_b, blob in (
                    (r.blk_doc_boff, r.doc_blob),
                    (r.blk_freq_boff, r.freq_blob),
                    (r.blk_pos_boff, r.pos_blob),
                ):
                    bo = np.frombuffer(boff_b, np.int32).astype(np.int64)
                    if (
                        len(bo) != n_blk
                        # hot shard rows are self-contained, so EVERY row's
                        # first block offset must be 0 (shard>0 included)
                        or (n_blk and bo[0] != 0)
                        or (np.diff(bo) < 0).any()
                        or (n_blk and bo[-1] > len(blob))
                    ):
                        bad_boffs += 1
            yield pd.DataFrame(
                {
                    "bad_sort": [bad_sort],
                    "bad_df": [bad_df],
                    "bad_ttf": [bad_ttf],
                    "bad_freq": [bad_freq],
                    "bad_blocks": [bad_blocks],
                    "bad_blklen": [bad_blklen],
                    "bad_boffs": [bad_boffs],
                }
            )

    agg = (
        posts.select(
            "segment_id", "shard", "df", "ttf", "doc_blob", "freq_blob", "pos_blob",
            "blk_last", "blk_len", "blk_doc_boff", "blk_freq_boff", "blk_pos_boff",
        )
        .mapInPandas(verify, CHECK_SCHEMA)
        .agg(*[F.sum(c).alias(c) for c in (
            "bad_sort", "bad_df", "bad_ttf", "bad_freq", "bad_blocks",
            "bad_blklen", "bad_boffs",
        )])
        .collect()[0]
    )
    out = {k: int(agg[k] or 0) for k in agg.asDict()}

    # ---- norms: blob length == max_doc -------------------------------------
    norm_rows = (
        idx.filter((F.col("kind") == 1) & F.col("segment_id").isin(live))
        .select("segment_id", F.octet_length("doc_blob").alias("nb"), "max_doc")
        .collect()
    )
    out["bad_norm_len"] = sum(1 for r in norm_rows if int(r.nb) != int(r.max_doc))

    # ---- offsets: vbyte stream is exactly (start-delta, length) per
    # occurrence, lengths positive (PostingsEnum.OFFSETS; CheckIndex.java
    # checkpostings' startOffset/endOffset validation role) -----------------
    if "off_blob" in idx.columns:
        from .codec import vbyte_decode

        offp = posts.filter(F.octet_length("off_blob") > 0).select("ttf", "off_blob")

        def ver_off(it):
            for pdf in it:
                bad = 0
                for r in pdf.itertuples(index=False):
                    vals = vbyte_decode(np.frombuffer(r.off_blob, np.uint8))
                    if len(vals) != 2 * r.ttf or (vals[1::2] <= 0).any():
                        bad += 1
                yield pd.DataFrame({"bad": [bad]})

        row = offp.mapInPandas(ver_off, "bad bigint").agg(F.sum("bad")).collect()[0]
        out["bad_offsets"] = int(row[0] or 0)
        # presence consistency: within one segment every posting row stores
        # offsets or none does (an index is built with store_offsets or not)
        mix = (
            posts.groupBy("segment_id")
            .agg(
                F.min((F.octet_length("off_blob") > 0).cast("int")).alias("lo"),
                F.max((F.octet_length("off_blob") > 0).cast("int")).alias("hi"),
            )
            .filter(F.col("lo") != F.col("hi"))
            .count()
        )
        out["bad_offsets"] += int(mix)
    else:
        out["bad_offsets"] = 0

    # ---- payloads: fixed-width stream is exactly 4 bytes per occurrence ----
    # (PostingsEnum.PAYLOADS layout; one boff per block, like the others)
    if "pay_blob" in idx.columns:
        out["bad_payloads"] = posts.filter(
            (F.octet_length("pay_blob") > 0)
            & (
                (F.octet_length("pay_blob") != 4 * F.col("ttf"))
                | (F.octet_length("blk_pay_boff") != F.octet_length("blk_len"))
            )
        ).count()
    else:
        out["bad_payloads"] = 0

    # ---- global term stats equal per-segment sums --------------------------
    per_seg = posts.groupBy("term").agg(
        F.sum("df").alias("df2"), F.sum("ttf").alias("ttf2")
    )
    from .index.manifest import latest_term_stats_dir

    ts = spark.read.parquet(latest_term_stats_dir(index_dir))
    joined = ts.join(per_seg, "term", "full_outer").filter(
        (F.col("df") != F.col("df2"))
        | (F.col("ttf") != F.col("ttf2"))
        | F.col("df").isNull()
        | F.col("df2").isNull()
    )
    out["bad_term_stats"] = joined.count()

    # ---- manifest consistency ----------------------------------------------
    man = read_manifest(spark, index_dir).filter(F.col("segment_id").isin(live))
    seg_sums = posts.groupBy("segment_id").agg(F.sum("ttf").alias("sum_ttf"))
    bad_man = (
        man.join(seg_sums, "segment_id", "left")
        .filter(
            (F.col("doc_count") > F.col("max_doc"))
            | (F.coalesce(F.col("sum_ttf"), F.lit(0)) != F.col("sum_len"))
        )
        .count()
    )
    out["bad_manifest"] = int(bad_man)

    # ---- index sort: docID order follows the declared sort field ----------
    # (CheckIndex verifies the index sort on sorted segments —
    # ``index/CheckIndex.java:745-780`` testSort; here: a per-segment lag
    # window over the docs table, partitioned — never a global window)
    import json as _json

    sort_fields: dict[str, set[int]] = {}
    for r in man.select("segment_id", "lineage").collect():
        f = _json.loads(r.lineage or "{}").get("index_sort")
        if f:
            sort_fields.setdefault(f, set()).add(int(r.segment_id))
    bad_sorted = 0
    if sort_fields:
        from pyspark.sql import Window

        docs_t = spark.read.parquet(os.path.join(index_dir, "docs"))
        w = Window.partitionBy("segment_id").orderBy("doc_id")
        for f, segs in sort_fields.items():
            bad_sorted += (
                docs_t.filter(F.col("segment_id").isin(sorted(segs)))
                .select("segment_id", "doc_id", F.col(f).alias("v"))
                .withColumn("prev", F.lag("v").over(w))
                .filter(F.col("prev").isNotNull() & (F.col("v") < F.col("prev")))
                .count()
            )
    out["bad_index_sort"] = int(bad_sorted)
    out["segments_checked"] = len(live)
    return out


def verify_content_sha(
    spark: SparkSession,
    source_docs,
    index_dir: str,
    key_cols=("repo", "path", "commit"),
) -> dict:
    """Per-row content invariant vs the source of truth: every stored
    document's content must be byte-identical (sha256) to the input table's
    row with the same key, and no rows may be lost or invented. Distributed:
    a full-outer join on the keys comparing ``sha2(content, 256)`` — only
    the violation COUNTS are collected.

    The role of the reference's stored-fields checksum verification
    (``CheckIndex.testStoredFields`` + per-file CRC in ``codecs/``): prove
    the index round-trips its payload exactly.
    """
    src = source_docs.select(
        *key_cols, F.sha2(F.col("content"), 256).alias("src_sha")
    )
    stored = (
        spark.read.parquet(os.path.join(index_dir, "docs"))
        .select(*key_cols, F.sha2(F.col("content"), 256).alias("idx_sha"))
    )
    joined = src.join(stored, on=list(key_cols), how="full_outer")
    agg = joined.agg(
        F.sum(F.when(F.col("idx_sha").isNull(), 1).otherwise(0)).alias("missing"),
        F.sum(F.when(F.col("src_sha").isNull(), 1).otherwise(0)).alias("extra"),
        F.sum(
            F.when(
                F.col("src_sha").isNotNull()
                & F.col("idx_sha").isNotNull()
                & (F.col("src_sha") != F.col("idx_sha")),
                1,
            ).otherwise(0)
        ).alias("sha_mismatch"),
    ).collect()[0]
    return {
        "missing_in_index": int(agg.missing or 0),
        "extra_in_index": int(agg.extra or 0),
        "sha_mismatch": int(agg.sha_mismatch or 0),
    }
