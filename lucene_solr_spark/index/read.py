"""Index readers — decode posting/norm blobs back into relational rows.

The PostingsEnum / NormsProducer analogue (``index/PostingsEnum.java:28``,
``codecs/lucene80/Lucene80NormsFormat.java``): expose the compressed segment
structures as DataFrames for inspection, CheckIndex-style invariant tests and
the DuckDB oracle comparisons. Decoding runs distributed in ``mapInArrow``
(one vectorized pass per posting row), never on the driver.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..codec import (
    decode_doc_deltas,
    decode_freq_values,
    delta_decode_lists,
    vbyte_decode,
)


def sql_in(col: str, values):
    """``col IN (...)`` built as ONE parsed SQL expression.

    ``Column.isin(*values)`` ships every literal through its own py4j round
    trip (~1 ms each); for the 1000-term filter of a bulk query batch that
    is the dominant driver-side plan-build cost. Catalyst parses this to the
    same ``In`` predicate, so parquet pushdown is unchanged."""
    vals = list(values)
    if not vals:
        return F.lit(False)
    # Spark SQL string literals treat backslash as an escape; double it first
    quoted = ", ".join(
        "'" + str(v).replace("\\", "\\\\").replace("'", "\\'") + "'" for v in vals
    )
    return F.expr(f"`{col}` IN ({quoted})")


def term_postings(spark: SparkSession, index_dir: str, terms=None) -> DataFrame:
    """(segment_id, term, doc_id, freq) rows decoded from the posting blobs."""
    df = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter(F.col("kind") == 0)
        .select(
            "segment_id", "term", "doc_blob", "freq_blob",
            "blk_doc_boff", "blk_freq_boff", "blk_len",
        )
    )
    if terms:
        df = df.filter(sql_in("term", terms))

    def decode(it):
        for batch in it:
            pdf = batch.to_pandas()
            segs, ts, docs, freqs = [], [], [], []
            for _, r in pdf.iterrows():
                d = np.cumsum(decode_doc_deltas(r["doc_blob"], r["blk_doc_boff"], r["blk_len"]))
                f = decode_freq_values(r["freq_blob"], r["blk_freq_boff"], r["blk_len"])
                segs.append(np.full(len(d), r["segment_id"], np.int32))
                ts.extend([r["term"]] * len(d))
                docs.append(d)
                freqs.append(f)
            if not segs:
                continue
            out = pd.DataFrame(
                {
                    "segment_id": np.concatenate(segs),
                    "term": ts,
                    "doc_id": np.concatenate(docs),
                    "freq": np.concatenate(freqs),
                }
            )
            yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return df.mapInArrow(decode, "segment_id int, term string, doc_id bigint, freq bigint")


def offsets_postings(spark: SparkSession, index_dir: str, terms=None) -> DataFrame:
    """(segment_id, term, doc_id, pos, start_off, end_off) — the exploded
    offset index (``PostingsEnum.OFFSETS``, ``index/PostingsEnum.java:34-46``).

    Only meaningful for indexes built with ``store_offsets=True``; rows of
    offset-free segments decode to an empty frame. The offset stream is the
    interleaved per-(term, doc) (start-delta, length) VByte chain written by
    ``build_segment_frame`` — start deltas reset per doc list, so shard rows
    and merged rows decode identically."""
    OFF_SCHEMA = (
        "segment_id int, term string, doc_id bigint, pos bigint, "
        "start_off bigint, end_off bigint"
    )
    raw = spark.read.parquet(os.path.join(index_dir, "index"))
    if "off_blob" not in raw.columns:  # pre-offsets index layout
        return spark.createDataFrame([], OFF_SCHEMA)
    df = raw.filter((F.col("kind") == 0) & (F.octet_length("off_blob") > 0)).select(
        "segment_id", "term", "doc_blob", "freq_blob", "pos_blob",
        "blk_doc_boff", "blk_freq_boff", "blk_len", "off_blob",
    )
    if terms:
        df = df.filter(sql_in("term", terms))

    def decode(it):
        for batch in it:
            pdf = batch.to_pandas()
            for _, r in pdf.iterrows():
                d = np.cumsum(decode_doc_deltas(r["doc_blob"], r["blk_doc_boff"], r["blk_len"]))
                f = decode_freq_values(r["freq_blob"], r["blk_freq_boff"], r["blk_len"])
                occ_starts = np.zeros(len(f), dtype=np.int64)
                np.cumsum(f[:-1], out=occ_starts[1:])
                pdeltas = vbyte_decode(np.frombuffer(r["pos_blob"], np.uint8)).astype(np.int64)
                pos = delta_decode_lists(pdeltas, occ_starts)
                ovals = vbyte_decode(np.frombuffer(r["off_blob"], np.uint8)).astype(np.int64)
                starts = delta_decode_lists(ovals[0::2], occ_starts)
                ends = starts + ovals[1::2]
                out = pd.DataFrame(
                    {
                        "segment_id": np.full(len(pos), r["segment_id"], np.int32),
                        "term": r["term"],
                        "doc_id": np.repeat(d, f),
                        "pos": pos,
                        "start_off": starts,
                        "end_off": ends,
                    }
                )
                yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return df.mapInArrow(decode, OFF_SCHEMA)


def payloads_postings(spark: SparkSession, index_dir: str, terms=None) -> DataFrame:
    """(segment_id, term, doc_id, pos, payload) — the exploded payload index
    (``PostingsEnum.PAYLOADS``, ``index/PostingsEnum.java:48-56``).

    Only meaningful for indexes built with ``store_payloads=True``. Payloads
    are fixed-width float32 per occurrence in position order — no delta
    chain, so shard rows and merged rows decode identically."""
    PAY_SCHEMA = (
        "segment_id int, term string, doc_id bigint, pos bigint, payload float"
    )
    raw = spark.read.parquet(os.path.join(index_dir, "index"))
    if "pay_blob" not in raw.columns:  # pre-payloads index layout
        return spark.createDataFrame([], PAY_SCHEMA)
    df = raw.filter((F.col("kind") == 0) & (F.octet_length("pay_blob") > 0)).select(
        "segment_id", "term", "doc_blob", "freq_blob", "pos_blob",
        "blk_doc_boff", "blk_freq_boff", "blk_len", "pay_blob",
    )
    if terms:
        df = df.filter(sql_in("term", terms))

    def decode(it):
        for batch in it:
            pdf = batch.to_pandas()
            for _, r in pdf.iterrows():
                d = np.cumsum(decode_doc_deltas(r["doc_blob"], r["blk_doc_boff"], r["blk_len"]))
                f = decode_freq_values(r["freq_blob"], r["blk_freq_boff"], r["blk_len"])
                occ_starts = np.zeros(len(f), dtype=np.int64)
                np.cumsum(f[:-1], out=occ_starts[1:])
                pdeltas = vbyte_decode(np.frombuffer(r["pos_blob"], np.uint8)).astype(np.int64)
                pos = delta_decode_lists(pdeltas, occ_starts)
                pay = np.frombuffer(r["pay_blob"], np.float32)
                out = pd.DataFrame(
                    {
                        "segment_id": np.full(len(pos), r["segment_id"], np.int32),
                        "term": r["term"],
                        "doc_id": np.repeat(d, f),
                        "pos": pos,
                        "payload": pay,
                    }
                )
                yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return df.mapInArrow(decode, PAY_SCHEMA)


def norms_table(spark: SparkSession, index_dir: str) -> DataFrame:
    """(segment_id, doc_id, norm_byte) rows decoded from the norm blobs."""
    df = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter(F.col("kind") == 1)
        .select("segment_id", "doc_blob")
    )

    def decode(it):
        for batch in it:
            pdf = batch.to_pandas()
            for _, r in pdf.iterrows():
                norms = np.frombuffer(r["doc_blob"], np.uint8)
                out = pd.DataFrame(
                    {
                        "segment_id": np.full(len(norms), r["segment_id"], np.int32),
                        "doc_id": np.arange(len(norms), dtype=np.int64),
                        "norm_byte": norms.astype(np.int32),
                    }
                )
                yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return df.mapInArrow(decode, "segment_id int, doc_id bigint, norm_byte int")


def positions_postings(spark: SparkSession, index_dir: str, terms=None) -> DataFrame:
    """(segment_id, term, doc_id, pos) — fully exploded position index."""
    df = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter(F.col("kind") == 0)
        .select(
            "segment_id", "term", "doc_blob", "freq_blob", "pos_blob",
            "blk_doc_boff", "blk_freq_boff", "blk_len",
        )
    )
    if terms:
        df = df.filter(sql_in("term", terms))

    def decode(it):
        for batch in it:
            pdf = batch.to_pandas()
            for _, r in pdf.iterrows():
                d = np.cumsum(decode_doc_deltas(r["doc_blob"], r["blk_doc_boff"], r["blk_len"]))
                f = decode_freq_values(r["freq_blob"], r["blk_freq_boff"], r["blk_len"])
                deltas = vbyte_decode(np.frombuffer(r["pos_blob"], np.uint8)).astype(np.int64)
                occ_starts = np.zeros(len(f), dtype=np.int64)
                np.cumsum(f[:-1], out=occ_starts[1:])
                pos = delta_decode_lists(deltas, occ_starts)
                out = pd.DataFrame(
                    {
                        "segment_id": np.full(len(pos), r["segment_id"], np.int32),
                        "term": r["term"],
                        "doc_id": np.repeat(d, f),
                        "pos": pos,
                    }
                )
                yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return df.mapInArrow(decode, "segment_id int, term string, doc_id bigint, pos bigint")

def deleted_docs_table(
    spark: SparkSession, index_dir: str, commit: int | None = None
) -> DataFrame:
    """(segment_id, doc_id) tombstoned pairs — kind=3 live-docs rows decoded
    (``Lucene50LiveDocsFormat`` analogue; blobs are sorted int64 arrays).
    ``commit``: only tombstones whose watermark < commit (the soft-delete
    visibility rule, see ``merge.delete_docs``); None = all (live view)."""
    df = (
        spark.read.parquet(os.path.join(index_dir, "index"))
        .filter(F.col("kind") == 3)
        .select("segment_id", "doc_blob", "max_doc")
    )
    if commit is not None:
        df = df.filter(F.col("max_doc") < commit)
    df = df.select("segment_id", "doc_blob")

    def decode(it):
        for batch in it:
            pdf = batch.to_pandas()
            for _, r in pdf.iterrows():
                ids = np.frombuffer(r["doc_blob"], np.int64)
                out = pd.DataFrame(
                    {
                        "segment_id": np.full(len(ids), r["segment_id"], np.int32),
                        "doc_id": ids,
                    }
                )
                yield pa.RecordBatch.from_pandas(out, preserve_index=False)

    return df.mapInArrow(decode, "segment_id int, doc_id bigint").distinct()


def realtime_get(
    spark: SparkSession,
    index_dir: str,
    keys,
    key_cols: tuple[str, ...] = ("ext_id",),
    all_versions: bool = False,
) -> DataFrame:
    """Solr ``/get`` (RealTimeGetComponent role, ``solr/core/src/java/org/
    apache/solr/handler/component/RealTimeGetComponent.java``): fetch the
    LATEST live version of documents by unique key, independent of any
    searcher's commit snapshot. In this engine the manifest append is the
    commit point, so "realtime" = the newest manifest prefix: live segments,
    ALL tombstones applied (updates are delete + re-add, so the superseded
    row is tombstoned the moment the update commits).

    ``keys``: list of key values (single key column) or a DataFrame with
    ``key_cols``. Returns full stored rows; if a key somehow has multiple
    live rows the newest segment wins (one row per key, like /get).
    ``all_versions=True`` skips that newest-wins window and returns EVERY
    live row matching the keys — the delete-by-key candidate set (atomic
    updates tombstone all versions so a replay after a crash between the
    replacement commit and the tombstone append sweeps the stale original
    too, not just the newest row).

    Shape at scale: the key set broadcasts into the docs join (point
    lookups prune on parquet stats); the tombstone anti-join touches only
    the candidates' rows.
    """
    from .manifest import live_segments

    live = live_segments(spark, index_dir)
    docs = spark.read.parquet(os.path.join(index_dir, "docs")).filter(
        F.col("segment_id").isin([int(s) for s in live])
    )
    if isinstance(keys, DataFrame):
        cand = docs.join(F.broadcast(keys.select(*key_cols).distinct()), list(key_cols))
    else:
        vals = list(keys)
        if not vals:
            return docs.limit(0)
        col = key_cols[0]
        if all(isinstance(v, (int, np.integer)) for v in vals):
            pred = F.expr(f"`{col}` IN ({', '.join(str(int(v)) for v in vals)})")
        else:
            pred = sql_in(col, vals)
        cand = docs.filter(pred)
    tombs = deleted_docs_table(spark, index_dir)
    out = cand.join(tombs, ["segment_id", "doc_id"], "left_anti")
    if all_versions:
        return out
    from pyspark.sql.window import Window

    w = Window.partitionBy(*key_cols).orderBy(
        F.col("segment_id").desc(), F.col("doc_id").desc()
    )
    return (
        out.withColumn("_rk", F.row_number().over(w))
        .filter(F.col("_rk") == 1)
        .drop("_rk")
    )
