"""SmallFloat norm quantization — exact reimplementation, vectorized.

Semantics from the reference ``lucene/core/src/java/org/apache/lucene/util/
SmallFloat.java:101-169`` (``longToInt4`` / ``int4ToLong`` / ``intToByte4`` /
``byte4ToInt``): a float-like, order-preserving encoding of non-negative ints
into one byte with 4 significant bits, exact for values below
``NUM_FREE_VALUES = 255 - longToInt4(Integer.MAX_VALUE) = 24``.

BM25 decodes norms through a 256-entry table
(``BM25Similarity.java:106-112`` LENGTH_TABLE); we expose the same table.
Exactness matters: the quantized length changes BM25 ranks, so the engine and
the oracle must share these bit-exact functions.
"""

from __future__ import annotations

import numpy as np


def long_to_int4(i: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.longToInt4`` (reference SmallFloat.java:101-121)."""
    i = np.asarray(i, dtype=np.int64)
    if (i < 0).any():
        raise ValueError("only supports positive values")
    # numBits = 64 - numberOfLeadingZeros(i); for i == 0 -> 0
    num_bits = np.zeros_like(i)
    nz = i > 0
    num_bits[nz] = np.floor(np.log2(i[nz].astype(np.float64))).astype(np.int64) + 1
    # float log2 is exact for int64 < 2^53; corpus lengths are < 2^31
    out = np.empty_like(i)
    sub = num_bits < 4
    out[sub] = i[sub]
    shift = num_bits - 4
    norm = ~sub
    enc = (i[norm] >> shift[norm]) & 0x07
    out[norm] = enc | ((shift[norm] + 1) << 3)
    return out


def int4_to_long(i: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.int4ToLong`` (reference SmallFloat.java:126-138)."""
    i = np.asarray(i, dtype=np.int64)
    bits = i & 0x07
    shift = (i >> 3) - 1
    out = np.where(shift == -1, bits, (bits | 0x08) << np.maximum(shift, 0))
    return out


MAX_INT4 = int(long_to_int4(np.array([2**31 - 1]))[0])  # == 231
NUM_FREE_VALUES = 255 - MAX_INT4  # == 24


def int_to_byte4(i: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.intToByte4`` (reference SmallFloat.java:144-156).

    Returns uint8 norm bytes. Exact for 0..23; 4-significant-bit float above.
    """
    i = np.asarray(i, dtype=np.int64)
    if (i < 0).any():
        raise ValueError("only supports positive values")
    out = np.empty(i.shape, dtype=np.uint8)
    small = i < NUM_FREE_VALUES
    out[small] = i[small].astype(np.uint8)
    big = ~small
    out[big] = (NUM_FREE_VALUES + long_to_int4(i[big] - NUM_FREE_VALUES)).astype(
        np.uint8
    )
    return out


def byte4_to_int(b: np.ndarray) -> np.ndarray:
    """Vectorized ``SmallFloat.byte4ToInt`` (reference SmallFloat.java:161-169)."""
    u = np.asarray(b, dtype=np.uint8).astype(np.int64)
    out = np.where(u < NUM_FREE_VALUES, u, NUM_FREE_VALUES + int4_to_long(u - NUM_FREE_VALUES))
    return out


# BM25Similarity.java:106-112 — LENGTH_TABLE[i] = byte4ToInt((byte) i), as float32
LENGTH_TABLE = byte4_to_int(np.arange(256, dtype=np.uint8)).astype(np.float32)
