"""BM25 scoring — float32-parity reimplementation of the reference.

Semantics from ``lucene/core/src/java/org/apache/lucene/search/similarities/
BM25Similarity.java``:

- ``idf = (float) log(1 + (docCount - df + 0.5) / (df + 0.5))``  (:70-72)
  using the **field's docCount**, not maxDoc (:150-157).
- ``avgdl = (float) (sumTotalTermFreq / (double) docCount)``  (:79-82)
- per-norm-byte cache ``cache[i] = k1 * ((1-b) + b * LENGTH_TABLE[i]/avgdl)``
  computed in float32 (:188-191)
- ``score = weight * (float)(freq / (freq + (double) cache[normByte]))`` where
  ``weight = boost * idf`` in float32 (:222-226). Note Lucene 9 dropped the
  classical ``(k1+1)`` numerator factor — rank-neutral, value-visible.
- phrase idf = sum of per-term float32 idfs accumulated in double, cast to
  float32 (:172-181); phrase freq = number of exact phrase occurrences.

All kernels are numpy-vectorized and replicate Java's float arithmetic order
so scores match the reference bit-for-bit (or to within 1 ulp).
"""

from __future__ import annotations

import numpy as np

from ..smallfloat import LENGTH_TABLE

K1 = np.float32(1.2)
B = np.float32(0.75)


def idf(df: np.ndarray, doc_count: int) -> np.ndarray:
    """float32 idf per term. Reference BM25Similarity.java:70-72."""
    df = np.asarray(df, dtype=np.float64)
    return np.log1p((doc_count - df + 0.5) / (df + 0.5)).astype(np.float32)


def avgdl(sum_total_term_freq: int, doc_count: int) -> np.float32:
    """Reference BM25Similarity.java:79-82."""
    return np.float32(sum_total_term_freq / float(doc_count))


def norm_cache(avg_dl: np.float32, k1: np.float32 = K1, b: np.float32 = B) -> np.ndarray:
    """256-entry float32 cache, reference BM25Similarity.java:188-191.

    cache[i] = k1 * ((1 - b) + b * LENGTH_TABLE[i] / avgdl), float32 math.
    """
    one = np.float32(1.0)
    return (k1 * ((one - b) + b * LENGTH_TABLE / np.float32(avg_dl))).astype(np.float32)


def score(
    freq: np.ndarray, norm_bytes: np.ndarray, weight: np.float32, cache: np.ndarray
) -> np.ndarray:
    """Vectorized ``BM25Scorer.score`` (reference BM25Similarity.java:222-226).

    freq: float32 array; norm_bytes: uint8 array; weight = boost*idf float32.
    Java computes ``freq / (freq + (double) cache[norm])`` in double, casts the
    quotient to float, then multiplies by the float weight.
    """
    f64 = np.asarray(freq, dtype=np.float64)
    norm = cache[np.asarray(norm_bytes, dtype=np.uint8)].astype(np.float64)
    tf = (f64 / (f64 + norm)).astype(np.float32)
    return (np.float32(weight) * tf).astype(np.float32)


def term_weight(term_idf: np.float32, boost: float = 1.0) -> np.float32:
    """weight = boost * idf, float32 (reference BM25Similarity.java:218)."""
    return np.float32(np.float32(boost) * np.float32(term_idf))


def phrase_idf(term_idfs: np.ndarray) -> np.float32:
    """Sum float32 idfs in double, cast to float32 (BM25Similarity.java:172-181)."""
    return np.float32(np.asarray(term_idfs, dtype=np.float64).sum())


# --------------------------------------------------------------------------
# alternative similarities on the same (freq, norm_byte) seam — each is
# monotone increasing in freq and non-increasing in doc length, so the
# block-max bound score(max_freq, min_norm_byte) stays admissible for all.

def classic_idf(df: np.ndarray, doc_count: int) -> np.ndarray:
    """ClassicSimilarity idf (``similarities/TFIDFSimilarity.java:330`` /
    ``ClassicSimilarity.java:64``): 1 + ln((docCount+1)/(df+1))."""
    df = np.asarray(df, dtype=np.float64)
    return (1.0 + np.log((doc_count + 1) / (df + 1.0))).astype(np.float32)


def classic_norm_cache() -> np.ndarray:
    """lengthNorm table: 1/sqrt(decoded length) per norm byte
    (``ClassicSimilarity.java:52`` lengthNorm over the stored length).
    Returned in float64 — IndexSearcher round-trips through float32 in
    parity mode. The single source for the formula (no inline copies)."""
    table = LENGTH_TABLE.astype(np.float64)
    with np.errstate(divide="ignore"):
        t = 1.0 / np.sqrt(table)
    t[table == 0] = 0.0
    return t


def lmd_norm_cache(mu: float = 2000.0) -> np.ndarray:
    """LMDirichlet document-length component: ln(mu / (dl + mu)) per norm
    byte (``similarities/LMDirichletSimilarity.java:79-83``). float64."""
    table = LENGTH_TABLE.astype(np.float64)
    return np.log(mu / (table + mu))


def lmjm_norm_cache() -> np.ndarray:
    """LMJelinekMercer per-norm-byte 1/dl table
    (``LMJelinekMercerSimilarity.java:60-76``). float64."""
    table = LENGTH_TABLE.astype(np.float64)
    with np.errstate(divide="ignore"):
        t = 1.0 / table
    t[table == 0] = 0.0
    return t


def inl2_norm_cache(avgdl: float) -> np.ndarray:
    """DFR I(n)L2 normalized-length table log2(1 + avgdl/dl)
    (``DFRSimilarity.java:63``, NormalizationH2 c=1). float64.
    Also the tfn table for IB LL/D/H2 (``IBSimilarity.java:79``,
    same NormalizationH2)."""
    table = LENGTH_TABLE.astype(np.float64)
    with np.errstate(divide="ignore"):
        t = np.log2(1.0 + avgdl / table)
    t[table == 0] = 0.0
    return t


def raw_len_cache() -> np.ndarray:
    """Decoded document length per norm byte — the docLen input of
    DFISimilarity.score (``DFISimilarity.java:55-64``). float64."""
    return LENGTH_TABLE.astype(np.float64)


def sweetspot_norm_cache(l: int = 3, h: int = 12, steepness: float = 0.5) -> np.ndarray:
    """SweetSpotSimilarity plateau lengthNorm table
    (``lucene/misc/src/java/org/apache/lucene/misc/SweetSpotSimilarity.java:
    117-133``): 1/sqrt(steepness·(|len−l| + |len−h| − (h−l)) + 1) per norm
    byte — flat 1.0 for lengths inside [l, h], falling off on BOTH sides.
    NOT monotone in length (short docs are penalized too), so the
    (max_freq, min_norm) block bounds are inadmissible — sweetspot is in
    ``kernels.UNPRUNABLE_SIMS`` and always evaluates exhaustively. float64."""
    table = LENGTH_TABLE.astype(np.float64)
    t = 1.0 / np.sqrt(
        steepness * (np.abs(table - l) + np.abs(table - h) - (h - l)) + 1.0
    )
    t[table == 0] = 0.0
    return t


def ax2exp_norm_cache(avgdl: float, s: float = 0.25) -> np.ndarray:
    """Axiomatic F2EXP denominator table s + s·dl/avgdl per norm byte
    (``AxiomaticF2EXP.java:91-93`` tfln; Axiomatic defaults s=0.25,
    ``Axiomatic.java:100``). With weight = ((N+1)/df)^k this makes F2EXP
    exactly the BM25-shaped ``w·f/(f+norm)`` kernel branch. float64."""
    table = LENGTH_TABLE.astype(np.float64)
    return s + s * table / max(avgdl, 1e-12)


def axf1_norm_cache(avgdl: float, s: float = 0.25) -> np.ndarray:
    """Axiomatic F1 family document-length component (avgdl+s)/(avgdl+dl·s)
    per norm byte (``AxiomaticF1LOG.java:63-64`` ln(); same for F1EXP;
    Axiomatic default s=0.25, ``Axiomatic.java:100``). Decreasing in dl, so
    the block-max bound stays admissible. float64."""
    table = LENGTH_TABLE.astype(np.float64)
    return (avgdl + s) / (avgdl + table * s)


def ax3_gamma_cache(avgdl: float, query_len: int = 1, s: float = 0.25) -> np.ndarray:
    """Axiomatic F3 family gamma table (dl − queryLen)·s·queryLen/avgdl per
    norm byte (``AxiomaticF3EXP.java:106-109`` / ``AxiomaticF3LOG.java:96-99``
    gamma(); defaults s=0.25, queryLen=1, ``Axiomatic.java:99-101``). The F3
    score is tf·idf − gamma (ln = tfln = 1), clamped at 0
    (``Axiomatic.java:104-112``): gamma grows with dl, so the score stays
    monotone ↓ in length and the block-max bound admissible. float64."""
    table = LENGTH_TABLE.astype(np.float64)
    return (table - query_len) * s * query_len / max(avgdl, 1e-12)


def max_block_score(
    max_freq: np.ndarray, min_norm_byte: np.ndarray, weight: np.float32, cache: np.ndarray
) -> np.ndarray:
    """Admissible per-block upper bound for block-max pruning.

    BM25 is monotone increasing in freq and decreasing in encoded length, and
    SmallFloat encoding is order-preserving, so score(max_freq, min_norm_byte)
    >= the true max in the block. This is the role of the competitive impacts
    of the reference (CompetitiveImpactAccumulator.java:31,66-121;
    MaxScoreCache.java:61-96), slightly looser than the full pareto set but
    safe for pruning.
    """
    return score(np.asarray(max_freq, np.float64), min_norm_byte, weight, cache)
