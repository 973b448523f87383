"""Multimodal (binary-payload) column plumbing for training-data pipelines.

At 100-TB scale, image/audio/video assets ride through Spark as opaque
``binary`` columns with typed metadata. Two execution paths:

1. **Catalyst path** (default, used by the driver-gated ops): byte-level
   features and frame sampling as pure built-in expressions — ``octet_length``
   / ``md5`` / ``substring`` on binary, ``sequence``+``explode`` for frames,
   ``aggregate(transform(...))`` for byte sums. Whole-stage-codegen'd, no
   Python in the plan at all.
2. **Arrow path** (``extract_features_arrow`` / ``sample_frames_arrow``): the
   ``mapInPandas`` kernels that a REAL media decoder (PIL/ffmpeg/soundfile)
   would plug into — the decoders themselves are absent in this container, so
   ``decode_image`` is an explicit stub, but the batching/schema/partitioning
   plumbing is real and pytest-asserted equal to the Catalyst path.

Test payloads derive deterministically from the driver's ``documents`` table
(``CAST(text AS BINARY)``, pure ASCII → byte semantics equal character
semantics, so DuckDB oracles the same features).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

FRAME_BYTES = 256  # stand-in for a video frame / audio window


def decode_image(payload: bytes):
    """Real decoder stub — would be ``PIL.Image.open(io.BytesIO(payload))``.

    Deliberately unimplemented: media libs are absent in this environment.
    The surrounding pipeline (schema, batching, partitioning) is real.
    """
    raise NotImplementedError(
        "media decoding requires PIL/ffmpeg; use extract_features (byte-level)"
    )


def with_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Attach the opaque binary column + typed metadata — the ingest shape of
    a multimodal table: (id, payload: binary, meta: struct)."""
    return docs.select(
        "doc_id",
        F.col(text_col).cast("binary").alias("payload"),
        F.struct(
            F.octet_length(F.col(text_col)).alias("n_bytes"),
            F.lit("application/octet-stream").alias("mime"),
        ).alias("meta"),
    )


# --------------------------------------------------------------- Catalyst --

# byte values via lossless latin-1 round-trip: decode(payload,'ISO-8859-1')
# maps byte b -> codepoint b, so ascii(char) == byte value for ALL bytes.
# SCALE CAUTION: this materializes ONE single-char string per byte — JVM-side
# but O(bytes) array allocation per row. Fine for the gate's document-sized
# payloads (≤ ~64 KiB); for real media blobs (MBs) pass arrow_threshold to
# extract_features so large rows take the Arrow kernel instead.
_BYTE_SUM = (
    "aggregate(transform(filter(split(decode(payload, 'ISO-8859-1'), ''),"
    " c -> c <> ''), c -> cast(ascii(c) AS BIGINT)),"
    " cast(0 AS BIGINT), (acc, x) -> acc + x)"
)


def extract_features(
    payloads: DataFrame, arrow_threshold: int | None = None
) -> DataFrame:
    """Byte-level feature extraction.

    Default (``arrow_threshold=None``, the driver-gated path): pure Catalyst
    expressions — the plan is one whole-stage-codegen'd projection, no Python
    anywhere. The byte-sum expression allocates one single-char string per
    byte (see ``_BYTE_SUM``), which is fine at document sizes but bloats on
    real media blobs.

    With ``arrow_threshold=N`` (recommended N=65536 for media tables): rows
    with ``octet_length(payload) > N`` route through the Arrow kernel
    (:func:`extract_features_arrow` — one numpy pass per payload, no per-byte
    object allocation) while small rows keep the codegen'd projection; the
    two branches union. pytest asserts both paths produce identical rows at
    sizes straddling the threshold.
    """
    n_bytes = F.octet_length("payload")
    catalyst_src = (
        payloads
        if arrow_threshold is None
        else payloads.filter(n_bytes <= int(arrow_threshold))
    )
    catalyst = catalyst_src.select(
        "doc_id",
        n_bytes.cast("long").alias("n_bytes"),
        F.ceil(n_bytes / F.lit(float(FRAME_BYTES))).cast("long").alias("n_frames"),
        F.expr(_BYTE_SUM).alias("byte_sum"),
        F.md5("payload").alias("payload_md5"),
    )
    if arrow_threshold is None:
        return catalyst
    big = payloads.filter(n_bytes > int(arrow_threshold))
    return catalyst.unionByName(extract_features_arrow(big))


def sample_frames(payloads: DataFrame, every: int = 4) -> DataFrame:
    """Frame sampling via ``sequence``+``explode``+``substring`` on the raw
    binary — one row per kept frame, fully JVM-side. Empty payloads produce
    no frames (same as the Arrow kernel)."""
    n_frames = F.ceil(F.octet_length("payload") / F.lit(float(FRAME_BYTES))).cast("int")
    kept = payloads.filter(F.octet_length("payload") > 0).select(
        "doc_id",
        "payload",
        F.explode(
            F.sequence(F.lit(0), n_frames - 1, F.lit(int(every)))
        ).alias("frame_id"),
    )
    chunk = F.expr(f"substring(payload, frame_id * {FRAME_BYTES} + 1, {FRAME_BYTES})")
    return kept.select(
        "doc_id",
        F.col("frame_id").cast("long").alias("frame_id"),
        F.octet_length(chunk).cast("long").alias("frame_bytes"),
        F.md5(chunk).alias("frame_md5"),
    )


# ------------------------------------------------------------------ Arrow --

def extract_features_arrow(payloads: DataFrame) -> DataFrame:
    """Arrow-batched ``mapInPandas`` form of :func:`extract_features` — the
    seam a real media decoder plugs into (swap the numpy byte pass for
    ``decode_image``/ffmpeg per batch). pytest asserts it equals the Catalyst
    path on the same payloads."""

    schema = "doc_id bigint, n_bytes bigint, n_frames bigint, byte_sum bigint, payload_md5 string"

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            n = len(pdf)
            n_bytes = np.empty(n, dtype=np.int64)
            byte_sum = np.empty(n, dtype=np.int64)
            md5s = []
            for i, b in enumerate(pdf["payload"]):
                arr = np.frombuffer(b, dtype=np.uint8)
                n_bytes[i] = len(arr)
                byte_sum[i] = int(arr.sum())
                md5s.append(hashlib.md5(b).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].to_numpy(),
                    "n_bytes": n_bytes,
                    "n_frames": (n_bytes + FRAME_BYTES - 1) // FRAME_BYTES,
                    "byte_sum": byte_sum,
                    "payload_md5": md5s,
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(kernel, schema)


def sample_frames_arrow(payloads: DataFrame, every: int = 4) -> DataFrame:
    """Arrow-batched form of :func:`sample_frames` (keyframe-decoder seam)."""

    schema = "doc_id bigint, frame_id bigint, frame_bytes bigint, frame_md5 string"

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, fids, fbytes, fmd5 = [], [], [], []
            for doc_id, b in zip(pdf["doc_id"], pdf["payload"]):
                nf = (len(b) + FRAME_BYTES - 1) // FRAME_BYTES
                for fi in range(0, nf, every):
                    chunk = b[fi * FRAME_BYTES : (fi + 1) * FRAME_BYTES]
                    ids.append(doc_id)
                    fids.append(fi)
                    fbytes.append(len(chunk))
                    fmd5.append(hashlib.md5(chunk).hexdigest())
            yield pd.DataFrame(
                {
                    "doc_id": np.array(ids, dtype=np.int64),
                    "frame_id": np.array(fids, dtype=np.int64),
                    "frame_bytes": np.array(fbytes, dtype=np.int64),
                    "frame_md5": fmd5,
                }
            )

    return payloads.select("doc_id", "payload").mapInPandas(kernel, schema)


# ---------------------------------------------------------------------------
# driver-contract ops over the documents table (+ DuckDB oracles; text is
# pure ASCII so byte features == character features)

def mm_features(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return extract_features(with_payload(docs))


MM_FEATURES_SQL = f"""
SELECT doc_id,
       length(text) AS n_bytes,
       CAST(ceil(length(text) / {FRAME_BYTES}.0) AS BIGINT) AS n_frames,
       CAST(list_aggregate(list_transform(string_split_regex(text, ''), x -> ascii(x)), 'sum') AS BIGINT) AS byte_sum,
       md5(text) AS payload_md5
FROM documents WHERE length(text) > 0
UNION ALL
SELECT doc_id, 0, 0, 0, md5('') FROM documents WHERE length(text) = 0
"""


def mm_frame_sample(spark, sf_dir):
    import os

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    return sample_frames(with_payload(docs), every=4)


MM_FRAME_SQL = f"""
WITH f AS (
  SELECT doc_id,
         (i - 1) * 4 AS frame_id,
         substr(text, (i - 1) * 4 * {FRAME_BYTES} + 1, {FRAME_BYTES}) AS chunk
  FROM documents,
       LATERAL (SELECT unnest(generate_series(1,
                 CAST(ceil(ceil(length(text) / {FRAME_BYTES}.0) / 4.0) AS BIGINT))) AS i)
  WHERE length(text) > 0
)
SELECT doc_id, frame_id, length(chunk) AS frame_bytes, md5(chunk) AS frame_md5 FROM f
"""


MULTIMODAL_OPS: dict[str, tuple] = {
    "mm_features": (mm_features, MM_FEATURES_SQL),
    "mm_frame_sample": (mm_frame_sample, MM_FRAME_SQL),
}
