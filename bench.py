#!/usr/bin/env python
"""Benchmark harness — one JSON line to stdout.

Headline workloads:
- index_build: full segment build over the deterministic synthetic
  source-code corpus (code analyzer, compression, norms, stats, manifest);
  reported as gb_per_hour.
- q_term / q_bool / q_phrase: the reference-style query set (modeled on
  lucene/benchmark/conf/query-terms.txt / query-phrases.txt) as batched
  top-10 BM25 searches; reported as queries_per_sec.
- relational + fulltext + training ops at $SPARK_GRAFT_SF_DIR (default
  /root/testdata/sf0.1).
- **scaling evidence (north rule)**: the same index build + query batch runs
  at two parallelism levels (local[N] and local[4N], same input, same
  segmentation) in fresh Spark sessions; reports throughput at both and
  scaling_efficiency = speedup / (core ratio). The sandbox has no real
  cluster — two local parallelism levels stand in for N vs 4N executors
  (per BASELINE.md).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_DOCS
(synthetic corpus size, default 12000), SPARK_GRAFT_SCALING=0 to skip the
low-parallelism pass.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
CPUS_LOW = max(1, CPUS // 4)
N_DOCS = int(os.environ.get("SPARK_GRAFT_DOCS", "12000"))
RUN_SCALING = os.environ.get("SPARK_GRAFT_SCALING", "1") != "0"

TERM_QUERIES = ["parse", "buffer", "cache", "merge", "segment", "stream", "token", "sd"]
BOOL_QUERIES = [
    "parse AND http",
    "read AND file",
    "buffer OR stream OR channel",
    "index OR writer",
    "+merge -segment",
    "+cache +query -lock",
]
PHRASE_QUERIES = [
    '"index writer"',
    '"merge the segments"',
    '"read the file into a buffer"',
    '"main entry point"',
]
ALL_QUERIES = TERM_QUERIES + BOOL_QUERIES + PHRASE_QUERIES


def _fresh_spark(cores: int):
    from pyspark.sql import SparkSession

    active = SparkSession.getActiveSession()
    if active is not None:
        active.stop()
        time.sleep(1)
    from lucene_solr_spark.session import get_spark

    spark = get_spark(cores=cores, shuffle_partitions=cores, driver_mem="48g")
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _build_and_query(spark, cores: int, reps_q: int = 3) -> dict:
    """One controlled build+query pass. Same input and num_segments at every
    parallelism level — only the executor-thread count varies."""
    from lucene_solr_spark.corpus import synth_corpus
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher

    index_dir = f"/tmp/lss_bench_index/{N_DOCS}_p{cores}"
    shutil.rmtree(index_dir, ignore_errors=True)
    docs = synth_corpus(spark, N_DOCS, n_partitions=cores)
    input_bytes = docs.selectExpr("sum(octet_length(content)) b").collect()[0].b
    t0 = time.time()
    build_index(spark, docs, index_dir, num_segments=32, analyzer="code")
    build_s = time.time() - t0

    searcher = IndexSearcher(spark, index_dir, analyzer="code")
    # warm-up (JIT/page cache), then timed batches — all queries in ONE job
    searcher.search_many({i: q for i, q in enumerate(ALL_QUERIES)}, k=10).count()
    t0 = time.time()
    for _ in range(reps_q):
        n = searcher.search_many(
            {i: q for i, q in enumerate(ALL_QUERIES)}, k=10
        ).count()
        assert n > 0
    query_s = (time.time() - t0) / reps_q
    return {
        "build_s": build_s,
        "gb": input_bytes / 1e9,
        "gb_per_hour": input_bytes / 1e9 / (build_s / 3600),
        "query_batch_s": query_s,
        "qps": len(ALL_QUERIES) / query_s,
    }


def main() -> None:
    results: dict[str, float] = {}
    extra: dict[str, float] = {}

    # ---- scaling evidence: local[N] vs local[4N], same input ---------------
    if RUN_SCALING:
        spark = _fresh_spark(CPUS_LOW)
        low = _build_and_query(spark, CPUS_LOW)
        extra[f"build_gbph_p{CPUS_LOW}"] = round(low["gb_per_hour"], 3)
        extra[f"qps_p{CPUS_LOW}"] = round(low["qps"], 3)

    spark = _fresh_spark(CPUS)
    high = _build_and_query(spark, CPUS)
    results["index_build"] = round(high["build_s"], 3)
    extra["input_gb"] = round(high["gb"], 4)
    extra["gb_per_hour"] = round(high["gb_per_hour"], 3)
    extra[f"build_gbph_p{CPUS}"] = round(high["gb_per_hour"], 3)
    extra[f"qps_p{CPUS}"] = round(high["qps"], 3)

    if RUN_SCALING:
        ratio = CPUS / CPUS_LOW
        extra["scaling_efficiency_build"] = round(
            (high["gb_per_hour"] / low["gb_per_hour"]) / ratio, 3
        )
        extra["scaling_efficiency_query"] = round(
            (high["qps"] / low["qps"]) / ratio, 3
        )

    # ---- BM25 query batches (per family, at full parallelism) -------------
    from lucene_solr_spark.search import IndexSearcher

    index_dir = f"/tmp/lss_bench_index/{N_DOCS}_p{CPUS}"
    searcher = IndexSearcher(spark, index_dir, analyzer="code")
    for name, batch in (
        ("q_term", TERM_QUERIES),
        ("q_bool", BOOL_QUERIES),
        ("q_phrase", PHRASE_QUERIES),
    ):
        t0 = time.time()
        n = searcher.search_many({i: q for i, q in enumerate(batch)}, k=10).count()
        dt = time.time() - t0
        results[name] = round(dt, 3)
        extra[f"{name}_qps"] = round(len(batch) / dt, 3)
        assert n > 0

    # ---- relational ops at SF_DIR ------------------------------------------
    from lucene_solr_spark import relational, textops

    for name in ("rollup_lineitem", "hash_join_part_revenue", "timeseries_events",
                 "group_topk_orders"):
        fn, _ = relational.RELATIONAL_OPS[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        results[name] = round(time.time() - t0, 3)

    # ---- fulltext + training ops over `documents` at SF_DIR ----------------
    t0 = time.time()
    textops.FT_OPS["ft_bool_and"][0](spark, SF_DIR).count()
    results["ft_bool_and"] = round(time.time() - t0, 3)
    for name in ("minhash_signatures", "simhash16", "emb_knn_threshold"):
        fn, _ = textops.TRAINING_OPS[name]
        t0 = time.time()
        fn(spark, SF_DIR).count()
        results[name] = round(time.time() - t0, 3)

    total = round(sum(results.values()), 3)
    sf = os.path.basename(os.path.normpath(SF_DIR)).replace("sf", "")
    try:
        sf_val = float(sf)
    except ValueError:
        sf_val = sf
    print(
        json.dumps(
            {
                "metric": "index-build + BM25 query + relational/training ops wall time",
                "value": total,
                "unit": "sec",
                "queries": results,
                "sf": sf_val,
                "cpus": CPUS,
                "n_docs": N_DOCS,
                **extra,
            }
        )
    )


if __name__ == "__main__":
    main()
