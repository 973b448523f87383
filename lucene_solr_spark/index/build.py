"""Distributed segment build — the Spark analogue of Lucene's indexing chain.

Reference lifecycle (SURVEY §3.1): ``IndexWriter.addDocument`` →
thread-private ``DocumentsWriterPerThread`` buffers an in-RAM inverted index →
flush writes an immutable segment (``index/DefaultIndexingChain.java:386-848``,
``index/DocumentsWriterPerThread.java:49,427``,
``codecs/lucene50/Lucene50PostingsWriter.java:223-399``).

Spark shape: one **segment = one shuffle group**. Documents get a
deterministic ``segment_id`` (content-addressed hash of the doc key, so the
assignment is identical at any parallelism level / cluster size), are shuffled
once by segment, and each group is built into a complete immutable segment by
one vectorized ``applyInPandas`` kernel — the DWPT equivalent, embarrassingly
parallel, no driver involvement. DocIDs are dense ints in arrival (key-sorted)
order within the segment, mirroring segment-local docIDs
(``index/IndexWriter.java:222``, ``LeafReaderContext.docBase``).

Index layout under ``index_dir`` (all parquet):

- ``index/kind=0`` postings: one row per (segment, term) with VByte/blocked
  blobs for docID-deltas, freqs, position-deltas, and per-128-block impact
  metadata (last_doc, max_freq, min_norm) — the skip/impact data of
  ``Lucene50SkipWriter.java:52,153-205``.
- ``index/kind=1`` norms: one row per segment, blob of SmallFloat norm bytes
  (one byte per doc — ``codecs/lucene80/Lucene80NormsFormat.java:78``).
- ``index/kind=2`` per-segment stats (the manifest source): max_doc,
  doc_count, sum_len, n_terms, n_postings.
- ``term_stats``: global (term, df, ttf), term-sorted for parquet min/max
  pushdown — the role of the FST term index (``BlockTreeTermsWriter``).
- ``docs``: the stored-fields table (segment_id, doc_id, <original columns>,
  content_sha256) — ``Lucene50StoredFieldsFormat`` analogue.
- ``manifest``: one row per segment with lineage + metrics; used for
  checkpoint/resume (a re-run skips segments already present) and as the
  merge planner's input.

Per-partition checkpointing (north_rule): the build is keyed by segment_id;
``resume=True`` reads the manifest and only (re)builds missing segments.
"""

from __future__ import annotations

import hashlib
import json
import os
import time

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..analysis import analyze_batch
from ..codec import (
    BLOCK_SIZE,
    block_starts_for_lists,
    delta_encode_lists,
    encode_blocked,
    vbyte_encode,
)
from ..smallfloat import int_to_byte4

UNIFIED_SCHEMA = (
    "segment_id int, kind int, term string, df bigint, ttf bigint, "
    "doc_blob binary, freq_blob binary, pos_blob binary, "
    "blk_last binary, blk_maxf binary, blk_minn binary, blk_len binary, "
    "blk_doc_boff binary, blk_freq_boff binary, blk_pos_boff binary, "
    "off_blob binary, blk_off_boff binary, "
    "pay_blob binary, blk_pay_boff binary, "
    "max_doc bigint, doc_count bigint, sum_len bigint, shard int"
)

KIND_POSTING, KIND_NORMS, KIND_STATS = 0, 1, 2

DEFAULT_KEY = ("repo", "path", "commit")


def segment_of(key: str, num_segments: int, segment_base: int = 0) -> int:
    """Deterministic segment assignment — pure function of the doc key.

    Same function on the Spark side (sha2) and in the pure-Python oracle, so
    (segment_id, doc_id) coordinates agree everywhere. ``segment_base``
    offsets the id range (streaming micro-batches / incremental builds get
    non-colliding segment ids).
    """
    h = hashlib.sha256(key.encode("utf-8")).hexdigest()
    return segment_base + int(h[:15], 16) % num_segments


def with_segment_id(
    df: DataFrame, num_segments: int, key_cols=DEFAULT_KEY, segment_base: int = 0
) -> DataFrame:
    """Spark-side equivalent of :func:`segment_of` (sha2-based, no UDF)."""
    key = F.concat_ws("\x00", *[F.col(c) for c in key_cols])
    seg = (
        F.pmod(
            F.conv(F.substring(F.sha2(key, 256), 1, 15), 16, 10).cast("long"),
            F.lit(num_segments),
        )
        + F.lit(segment_base)
    ).cast("int")
    return df.withColumn("segment_id", seg)


def _slice_blob(buf: np.ndarray, offsets: np.ndarray) -> list[bytes]:
    """Slice a flat byte buffer into per-term bytes by offsets (len = n+1)."""
    raw = buf.tobytes()
    return [raw[offsets[i] : offsets[i + 1]] for i in range(len(offsets) - 1)]


def build_segment_frame(
    content, doc_ids: np.ndarray, segment_id: int, analyzer: str,
    store_offsets: bool = False, store_payloads: bool = False,
) -> pd.DataFrame:
    """Build one complete segment from documents — all flat numpy.

    This is the vectorized equivalent of DefaultIndexingChain.processDocument
    + FreqProxTermsWriter.flush + Lucene50PostingsWriter: tokenize the batch,
    sort occurrences by (term, doc, pos), derive postings runs, delta+VByte
    encode every term's lists in ONE flat pass, then slice per-term blobs.

    ``store_offsets`` additionally indexes each occurrence's char span
    (``PostingsEnum.OFFSETS``, ``index/PostingsEnum.java:34-46``) as an
    interleaved (start-delta, length) VByte stream per term — start deltas
    reset per (term, doc) list, so offsets need NO patching when merges
    rebase doc ids. Off by default (Lucene's IndexOptions default): ~2
    bytes/occurrence, paid only by indexes that serve offset highlighting.
    """
    if store_payloads:
        # DelimitedPayloadTokenFilter chain (PostingsEnum.PAYLOADS role,
        # ``index/PostingsEnum.java:48-56``): one float32 per occurrence,
        # stored fixed-width beside positions. The payload chain IS the
        # analyzer (whitespace + delimited-payload + lowercase).
        from ..analysis import analyze_batch_payloads

        (terms_flat, pos_flat, doc_lens, _doc_starts, norm_lens,
         pay_flat) = analyze_batch_payloads(content)
    elif store_offsets:
        from ..analysis import analyze_batch_offsets

        (terms_flat, pos_flat, doc_lens, _doc_starts, norm_lens,
         off_s_flat, off_e_flat) = analyze_batch_offsets(content, analyzer)
    else:
        terms_flat, pos_flat, doc_lens, _doc_starts, norm_lens = analyze_batch(
            content, analyzer
        )
    max_doc = len(content)
    # norms count position slots, not emitted tokens (discountOverlaps);
    # doc_lens (emitted tokens) segments the flat occurrence arrays below
    norm_bytes = int_to_byte4(norm_lens.astype(np.int64))  # 0 for empty docs
    doc_count = int((norm_lens > 0).sum())
    sum_len = int(norm_lens.astype(np.int64).sum())

    rows: dict = {}
    if len(terms_flat) > 0:
        # ---- occurrence table sorted by (term, doc, pos) ----
        # factorize(sort=True): codes ordered by term byte order — this IS the
        # sorted term dictionary (FreqProxTermsWriter.sortPostings analogue).
        codes, uniq_terms = pd.factorize(pd.array(terms_flat), sort=True)
        doc_of_occ = np.repeat(doc_ids.astype(np.int64), doc_lens)
        order = np.lexsort((pos_flat, doc_of_occ, codes))
        tc = codes[order].astype(np.int64)
        dc = doc_of_occ[order]
        pc = pos_flat[order].astype(np.int64)

        # ---- postings runs: one per (term, doc) ----
        occ_break = np.empty(len(tc), dtype=bool)
        occ_break[0] = True
        occ_break[1:] = (tc[1:] != tc[:-1]) | (dc[1:] != dc[:-1])
        occ_start = np.flatnonzero(occ_break)
        freqs = np.diff(np.append(occ_start, len(tc))).astype(np.int64)
        post_term = tc[occ_start]
        post_doc = dc[occ_start]
        n_post = len(post_doc)

        # ---- per-term posting list boundaries ----
        term_break = np.empty(n_post, dtype=bool)
        term_break[0] = True
        term_break[1:] = post_term[1:] != post_term[:-1]
        term_start = np.flatnonzero(term_break)
        df_per_term = np.diff(np.append(term_start, n_post)).astype(np.int64)
        ttf_per_term = np.add.reduceat(freqs, term_start)

        # ---- block structure first (the encoder is block-aware) ----
        ends = np.append(term_start[1:], n_post)
        blk_flat, blk_list = block_starts_for_lists(term_start, n_post)
        blk_ends = np.append(blk_flat[1:], n_post)
        # a block's end is min(next block start, its own list end)
        list_end = ends[blk_list]
        blk_end = np.minimum(blk_ends, list_end)
        blk_len = (blk_end - blk_flat).astype(np.int64)

        # ---- encode docID deltas + freqs: FOR(128) full blocks + VByte
        # tails (codec.encode_blocked — Lucene50PostingsWriter layout) ----
        n_terms = len(term_start)
        doc_deltas = delta_encode_lists(post_doc, term_start)
        doc_buf, doc_off, blk_doc_boff = encode_blocked(
            doc_deltas.astype(np.uint64), blk_flat, blk_len, blk_list, n_terms, prefix=True
        )
        freq_buf, freq_off, blk_freq_boff = encode_blocked(
            freqs.astype(np.uint64), blk_flat, blk_len, blk_list, n_terms, prefix=False
        )

        # ---- positions: delta per occurrence within (term, doc) ----
        pos_deltas = delta_encode_lists(pc, occ_start)
        pos_buf, pos_nb = vbyte_encode(pos_deltas.astype(np.uint64))
        byte_cum_p = np.concatenate(([0], np.cumsum(pos_nb)))
        # per-term occurrence boundaries: occurrences of term t span
        # occ indices [occ_start_of_first_posting .. ) — use flat token index
        tok_ends = np.append(occ_start[term_start[1:]], len(tc)) if len(term_start) > 1 else np.array([len(tc)])
        tok_starts = occ_start[term_start]
        pos_off = np.zeros(len(term_start) + 1, dtype=np.int64)
        pos_off[0] = byte_cum_p[tok_starts[0]]
        pos_off[1:] = byte_cum_p[tok_ends]
        # per-block byte offset into the term's pos blob (skip-pointer role)
        blk_pos_boff = (
            byte_cum_p[occ_start[blk_flat]] - pos_off[blk_list]
        ).astype(np.int32)

        # ---- offsets: interleaved (start-delta, length) per occurrence ----
        # start deltas reset per (term, doc) list — invariant under doc-id
        # rebasing, so merges never patch off_blob
        if store_offsets:
            oc_s = off_s_flat[order]
            oc_len = off_e_flat[order] - oc_s
            off_deltas = delta_encode_lists(oc_s, occ_start)
            inter = np.empty(2 * len(oc_s), dtype=np.uint64)
            inter[0::2] = off_deltas.astype(np.uint64)
            inter[1::2] = oc_len.astype(np.uint64)
            off_buf, off_nb = vbyte_encode(inter)
            byte_cum_o = np.concatenate(([0], np.cumsum(off_nb)))
            off_off = np.zeros(len(term_start) + 1, dtype=np.int64)
            off_off[0] = byte_cum_o[2 * tok_starts[0]]
            off_off[1:] = byte_cum_o[2 * tok_ends]
            blk_off_boff = (
                byte_cum_o[2 * occ_start[blk_flat]] - off_off[blk_list]
            ).astype(np.int32)

        # ---- payloads: fixed-width float32 per occurrence --------------
        # no delta chain, no doc-id dependence: concatenating merges append
        # blobs untouched; per-block byte offset = 4·(occurrence index at
        # block start − occurrence index at list start)
        if store_payloads:
            pay_sorted = np.ascontiguousarray(pay_flat[order].astype(np.float32))
            pay_off = np.zeros(len(term_start) + 1, dtype=np.int64)
            pay_off[0] = 4 * tok_starts[0]
            pay_off[1:] = 4 * tok_ends
            blk_pay_boff = (
                4 * occ_start[blk_flat] - pay_off[blk_list]
            ).astype(np.int32)

        # ---- per-128-posting block impact metadata ----
        blk_last = post_doc[blk_end - 1].astype(np.int32)
        blk_maxf = np.maximum.reduceat(freqs, blk_flat).astype(np.int32)
        norm_of_post = norm_bytes[np.searchsorted(doc_ids, post_doc)]
        blk_minn = np.minimum.reduceat(norm_of_post, blk_flat).astype(np.uint8)
        # per-term block count for slicing
        nblk_per_term = np.bincount(blk_list, minlength=n_terms)
        blk_off = np.concatenate(([0], np.cumsum(nblk_per_term)))

        rows = {
            "segment_id": np.full(n_terms, segment_id, dtype=np.int32),
            "kind": np.full(n_terms, KIND_POSTING, dtype=np.int32),
            "term": uniq_terms[post_term[term_start]].astype(object),
            "df": df_per_term,
            "ttf": ttf_per_term,
            "doc_blob": _slice_blob(doc_buf, doc_off),
            "freq_blob": _slice_blob(freq_buf, freq_off),
            "pos_blob": _slice_blob(pos_buf, pos_off),
            "blk_last": _slice_blob(blk_last.view(np.uint8), blk_off * 4),
            "blk_maxf": _slice_blob(blk_maxf.view(np.uint8), blk_off * 4),
            "blk_minn": _slice_blob(blk_minn, blk_off),
            "blk_len": _slice_blob(blk_len.astype(np.int32).view(np.uint8), blk_off * 4),
            "blk_doc_boff": _slice_blob(blk_doc_boff.view(np.uint8), blk_off * 4),
            "blk_freq_boff": _slice_blob(blk_freq_boff.view(np.uint8), blk_off * 4),
            "blk_pos_boff": _slice_blob(blk_pos_boff.view(np.uint8), blk_off * 4),
            "off_blob": (
                _slice_blob(off_buf, off_off) if store_offsets else [b""] * n_terms
            ),
            "blk_off_boff": (
                _slice_blob(blk_off_boff.view(np.uint8), blk_off * 4)
                if store_offsets
                else [b""] * n_terms
            ),
            "pay_blob": (
                _slice_blob(pay_sorted.view(np.uint8), pay_off)
                if store_payloads
                else [b""] * n_terms
            ),
            "blk_pay_boff": (
                _slice_blob(blk_pay_boff.view(np.uint8), blk_off * 4)
                if store_payloads
                else [b""] * n_terms
            ),
            "max_doc": np.full(n_terms, -1, dtype=np.int64),
            "doc_count": np.full(n_terms, -1, dtype=np.int64),
            "sum_len": np.full(n_terms, -1, dtype=np.int64),
            "shard": np.zeros(n_terms, dtype=np.int32),
        }
        out = pd.DataFrame(rows)
        n_postings_total = n_post
        n_terms_total = n_terms
    else:
        out = pd.DataFrame(
            {k: pd.Series([], dtype=d) for k, d in _EMPTY_DTYPES.items()}
        )
        n_postings_total = 0
        n_terms_total = 0

    extra = pd.DataFrame(
        {
            "segment_id": np.array([segment_id, segment_id], dtype=np.int32),
            "kind": np.array([KIND_NORMS, KIND_STATS], dtype=np.int32),
            "term": [None, None],
            "df": np.array([max_doc, n_terms_total], dtype=np.int64),
            "ttf": np.array([0, n_postings_total], dtype=np.int64),
            "doc_blob": [norm_bytes.tobytes(), b""],
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
            "max_doc": np.array([max_doc, max_doc], dtype=np.int64),
            "doc_count": np.array([doc_count, doc_count], dtype=np.int64),
            "sum_len": np.array([sum_len, sum_len], dtype=np.int64),
            "shard": np.zeros(2, dtype=np.int32),
        }
    )
    return pd.concat([out, extra], ignore_index=True)


_EMPTY_DTYPES = {
    "segment_id": "int32",
    "kind": "int32",
    "term": "object",
    "df": "int64",
    "ttf": "int64",
    "doc_blob": "object",
    "freq_blob": "object",
    "pos_blob": "object",
    "blk_last": "object",
    "blk_maxf": "object",
    "blk_minn": "object",
    "blk_len": "object",
    "blk_doc_boff": "object",
    "blk_freq_boff": "object",
    "blk_pos_boff": "object",
    "off_blob": "object",
    "blk_off_boff": "object",
    "pay_blob": "object",
    "blk_pay_boff": "object",
    "max_doc": "int64",
    "doc_count": "int64",
    "sum_len": "int64",
    "shard": "int32",
}


def build_index(
    spark: SparkSession,
    docs: DataFrame,
    index_dir: str,
    num_segments: int = 32,
    analyzer: str = "code",
    key_cols=DEFAULT_KEY,
    content_col: str = "content",
    resume: bool = True,
    stored_cols: tuple = (),
    segment_base: int = 0,
    auto_merge: bool = False,
    merge_policy: dict | None = None,
    extra_lineage: dict | None = None,
    index_sort: str | None = None,
    store_offsets: bool = False,
    store_payloads: bool = False,
) -> dict:
    """Build (or resume) the full index. Returns build metrics.

    ``index_sort``: sort docs within every segment by this column before
    docID assignment (``IndexWriterConfig.setIndexSort``,
    ``reference lucene/core/src/java/org/apache/lucene/index/IndexWriterConfig.java:439-468``
    / ``index/Sorter.java``): local docID order == sort order, so a
    sorted-field top-k can terminate each segment's collection after k
    docs (``TopFieldCollector`` early termination on a sorted index). The
    sort field is recorded in the manifest lineage; ``IndexSearcher.
    search_sorted`` requires it. The field rides ``key_cols`` as the
    leading sort key (key_cols stay the tie-break, keeping builds
    deterministic), and is stored in the docs table.

    Scale notes: one shuffle (by segment_id) for the build; term_stats is a
    map-side-combinable groupBy over (term, df, ttf) only — blobs are never
    shuffled (column pruning). Segment size is governed by num_segments
    (the FlushByRamOrCountsPolicy analogue: pick num_segments so a segment's
    docs fit an executor ~ Lucene's 16MB RAM budget scaled up).

    Crash-safe resume: the three persisted artifacts (index rows, docs rows,
    manifest rows) are each an atomic Spark job commit, written in that
    order. Resume tracks completion PER ARTIFACT — segments already present
    in the index parquet are not re-built, segments already in docs are not
    re-written, manifest append covers whatever the manifest is missing — so
    a replay after a crash between any two commits converges to exactly-once
    (no duplicate rows) instead of double-appending. The manifest row is the
    commit point: a segment is invisible to readers until it lands.
    """
    t0 = time.time()
    key_cols = list(key_cols)
    manifest_path = os.path.join(index_dir, "manifest")
    idx_path = os.path.join(index_dir, "index")
    docs_path = os.path.join(index_dir, "docs")

    done_manifest: set[int] = set()
    done_index: set[int] = set()
    if resume:
        if _exists(manifest_path):
            done_manifest = {
                r.segment_id
                for r in spark.read.parquet(manifest_path).select("segment_id").collect()
            }
        # restrict to this build's id range — min/max row-group pruning keeps
        # the presence probe cheap for streaming micro-batches
        if _exists(idx_path):
            done_index = {
                r.segment_id
                for r in spark.read.parquet(idx_path)
                .filter((F.col("kind") == KIND_STATS) & (F.col("segment_id") >= segment_base))
                .select("segment_id")
                .distinct()
                .collect()
            }

    tagged = with_segment_id(docs, num_segments, key_cols, segment_base)
    sort_cols = ([index_sort] if index_sort else []) + key_cols
    keep = ["segment_id", "doc_id", *sort_cols, *stored_cols, content_col, "content_sha256"]
    seen = set()
    keep = [c for c in keep if not (c in seen or seen.add(c))]
    os.makedirs(docs_path, exist_ok=True)

    # Pin the stored-file Arrow schema from the Spark schema — from_pandas
    # INFERS types per segment otherwise, and a segment whose array column
    # holds only empty lists writes list<null>, corrupting the
    # merged-schema read of the whole docs table (found by atomic-update
    # churn leaving an all-empty tags column in a 1-doc segment).
    from pyspark.sql.pandas.types import to_arrow_schema
    from pyspark.sql.types import LongType, StringType, StructField, StructType

    tag_fields = {f.name: f for f in tagged.schema.fields}
    tag_fields["doc_id"] = StructField("doc_id", LongType())
    tag_fields["content_sha256"] = StructField("content_sha256", StringType())
    docs_arrow_schema = to_arrow_schema(StructType([tag_fields[c] for c in keep]))

    def build_group(pdf: pd.DataFrame) -> pd.DataFrame:
        """One segment = one task: invert the postings AND write the segment's
        stored-fields parquet as a side-channel file (the Iceberg-writer
        pattern — data files written by tasks, made visible by the manifest
        commit). ONE corpus shuffle total; the old separate docs pass was a
        second full-corpus shuffle. The per-segment file is written to a tmp
        name and atomically renamed, so task retries/speculation are safe
        (content is deterministic), and a crashed job's orphans are invisible
        until a manifest row lands (or overwritten identically on replay).
        POSIX-rename semantics assumed (local/HDFS; object stores would use
        their committer)."""
        import uuid

        pdf = pdf.sort_values(sort_cols, kind="mergesort", ignore_index=True)
        seg = int(pdf["segment_id"].iloc[0])
        n = len(pdf)
        stored = pdf.copy()
        stored["doc_id"] = np.arange(n, dtype=np.int64)
        stored["content_sha256"] = [
            hashlib.sha256((c or "").encode("utf-8")).hexdigest()
            for c in stored[content_col]
        ]
        stored = stored[keep]
        import pyarrow as pa
        import pyarrow.parquet as pq

        tmp = os.path.join(docs_path, f"_tmp-{uuid.uuid4().hex}.parquet")
        pq.write_table(
            pa.Table.from_pandas(
                stored, schema=docs_arrow_schema, preserve_index=False
            ),
            tmp,
        )
        os.replace(tmp, os.path.join(docs_path, f"part-seg{seg}.parquet"))

        doc_ids = np.arange(n, dtype=np.int64)
        return build_segment_frame(
            pdf[content_col].tolist(), doc_ids, seg, analyzer,
            store_offsets=store_offsets, store_payloads=store_payloads,
        )

    to_build = tagged
    if done_index:
        to_build = to_build.filter(~F.col("segment_id").isin(*[int(s) for s in done_index]))
    unified = to_build.groupBy("segment_id").applyInPandas(build_group, UNIFIED_SCHEMA)
    unified.write.mode("append").partitionBy("kind").parquet(idx_path)

    # ---- manifest (lineage + metrics per segment; drives resume + merge) ---
    # the COMMIT POINT: only segments recorded here are visible to readers
    stats = (
        spark.read.parquet(idx_path)
        .filter(F.col("kind") == KIND_STATS)
        .select(
            "segment_id",
            F.col("df").alias("n_terms"),
            F.col("ttf").alias("n_postings"),
            "max_doc",
            "doc_count",
            "sum_len",
        )
    )
    if done_manifest:
        stats = stats.filter(~F.col("segment_id").isin(*[int(s) for s in done_manifest]))
    if segment_base:
        # incremental builds only commit their own id range — never re-commit
        # (or steal) another build's orphaned rows
        stats = stats.filter(F.col("segment_id") >= segment_base)
    lineage_d = {
        "analyzer": analyzer,
        "key": key_cols,
        "num_segments": num_segments,
        "built_at": t0,
    }
    if index_sort:
        lineage_d["index_sort"] = index_sort
    if store_offsets:
        lineage_d["store_offsets"] = True
    if store_payloads:
        lineage_d["store_payloads"] = True
    if extra_lineage:
        lineage_d.update(extra_lineage)
    lineage = json.dumps(lineage_d)
    (
        stats.withColumn("generation", F.lit(0))
        .withColumn("lineage", F.lit(lineage))
        .coalesce(1)  # single-file append → the commit flip is atomic
        .write.mode("append")
        .parquet(manifest_path)
    )

    # ---- global term stats over LIVE segments, term-sorted for pushdown ---
    from .manifest import live_segments as _live, publish_term_stats

    live = _live(spark, index_dir)
    post = (
        spark.read.parquet(idx_path)
        .filter((F.col("kind") == KIND_POSTING) & F.col("segment_id").isin(live))
        .select("term", "df", "ttf")
    )
    nparts = max(1, len(live) // 8)
    publish_term_stats(
        post.groupBy("term")
        .agg(F.sum("df").alias("df"), F.sum("ttf").alias("ttf"))
        .repartitionByRange(nparts, "term")
        .sortWithinPartitions("term"),
        index_dir,
    )

    # background merging analogue: ConcurrentMergeScheduler runs beside the
    # writer; here the merge loop runs after the flush when requested
    merges = []
    if auto_merge:
        from .merge import run_merges

        merges = run_merges(spark, index_dir, **(merge_policy or {}))

    from .manifest import live_segments as _live_final

    live_now = _live_final(spark, index_dir)
    man = spark.read.parquet(manifest_path).filter(F.col("segment_id").isin(live_now))
    agg = man.agg(
        F.count("*").alias("segments"),
        F.sum("max_doc").alias("max_doc"),
        F.sum("doc_count").alias("doc_count"),
        F.sum("sum_len").alias("sum_len"),
        F.sum("n_terms").alias("n_terms"),
        F.sum("n_postings").alias("n_postings"),
    ).collect()[0]
    return {
        "seconds": time.time() - t0,
        "merges": len(merges),
        "segments": agg.segments,
        "max_doc": agg.max_doc,
        "doc_count": agg.doc_count,
        "sum_len": agg.sum_len,
        "n_terms": agg.n_terms,
        "n_postings": agg.n_postings,
        "skipped_segments": len(done_index),
    }


def _exists(path: str) -> bool:
    return os.path.exists(os.path.join(path, "_SUCCESS")) or (
        os.path.isdir(path) and any(f.endswith(".parquet") for f in os.listdir(path))
    )
