"""Approximate nearest neighbour search — trained IVF over embedding columns.

The scale path for similarity search on `array<float>` columns (driver
requirement; the role HNSW plays in the reference's `KnnVectorQuery`
lineage, re-expressed for a partitioned warehouse):

1. ``ivf_train``: k-means centroids fitted driver-side on a bounded sample
   (vectorized numpy Lloyd iterations — the training set is a sample, the
   model is k·d floats; this is how IVF indexes are actually trained).
2. ``ivf_assign``: every vector gets its nearest-centroid bucket via an
   Arrow-batched matmul kernel. At warehouse scale the table is WRITTEN
   partitioned/bucketed by ``bucket`` so probes become partition-pruned
   scans.
3. ``ivf_search``: a query probes only its ``nprobe`` nearest centroids'
   buckets — candidate generation is `bucket IN (...)` (partition pruning)
   + one vectorized cosine kernel + TakeOrdered(k). Recall grows with
   nprobe; nprobe == n_centroids degenerates to exact brute force
   (tested).

Everything is deterministic given ``seed`` (k-means++-style farthest-point
init on the sample).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F


def _as_matrix(col: pd.Series) -> np.ndarray:
    return np.vstack([np.asarray(v, dtype=np.float64) for v in col])


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_train(
    emb_df: DataFrame,
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 8,
    sample: int = 20000,
    seed: int = 13,
) -> np.ndarray:
    """Fit spherical k-means centroids on a bounded sample. Returns a
    (n_centroids, dim) float64 array — the broadcastable IVF model."""
    rows = emb_df.select(vec_col).limit(int(sample)).collect()
    x = _normalize(_as_matrix(pd.Series([r[0] for r in rows])))
    rng = np.random.RandomState(seed)
    # farthest-point init (k-means++ flavoured, deterministic)
    cents = [x[rng.randint(len(x))]]
    for _ in range(n_centroids - 1):
        sims = np.max(np.stack([x @ c for c in cents]), axis=0)
        cents.append(x[int(np.argmin(sims))])
    c = np.vstack(cents)
    for _ in range(iters):
        assign = np.argmax(x @ c.T, axis=1)
        for j in range(n_centroids):
            m = assign == j
            if m.any():
                c[j] = x[m].mean(axis=0)
        c = _normalize(c)
    return c


def ivf_assign(
    emb_df: DataFrame, centroids: np.ndarray, vec_col: str = "embedding"
) -> DataFrame:
    """Add the nearest-centroid ``bucket`` column (Arrow-batched matmul —
    one BLAS call per batch, no per-row Python)."""
    cents = centroids.copy()
    cols = emb_df.columns

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            x = _normalize(_as_matrix(pdf[vec_col]))
            pdf = pdf.copy()
            pdf["bucket"] = np.argmax(x @ cents.T, axis=1).astype(np.int32)
            yield pdf

    from pyspark.sql.types import IntegerType, StructField, StructType

    # exact schema extension — simpleString round-trips break on column
    # names/types that need quoting in DDL
    schema = StructType(
        list(emb_df.schema.fields) + [StructField("bucket", IntegerType())]
    )
    return emb_df.mapInPandas(kernel, schema)


def ivf_search(
    assigned: DataFrame,
    centroids: np.ndarray,
    query_vec,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Top-k by cosine among the ``nprobe`` nearest centroids' buckets.

    The bucket filter is a Catalyst IN-predicate — with the table
    partitioned by ``bucket`` this is a partition-pruned scan touching
    nprobe/n_centroids of the data; the cosine kernel is one matmul per
    Arrow batch; the reduce is TakeOrdered(k).
    """
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    probes = np.argsort(-(centroids @ qn))[: int(nprobe)]
    cand = assigned.filter(F.col("bucket").isin(*[int(b) for b in probes]))

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = _normalize(_as_matrix(pdf[vec_col]))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cosine": x @ qn}
            )

    scored = cand.mapInPandas(kernel, f"{id_col} bigint, cosine double")
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(int(k))


def brute_force_topk(
    emb_df: DataFrame, query_vec, k: int = 10,
    vec_col: str = "embedding", id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k — the recall baseline (and the nprobe=max case)."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)

    def kernel(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            if not len(pdf):
                continue
            x = _normalize(_as_matrix(pdf[vec_col]))
            yield pd.DataFrame(
                {id_col: pdf[id_col].to_numpy(), "cosine": x @ qn}
            )

    scored = emb_df.select(id_col, vec_col).mapInPandas(
        kernel, f"{id_col} bigint, cosine double"
    )
    return scored.orderBy(F.col("cosine").desc(), F.col(id_col).asc()).limit(int(k))
