#!/usr/bin/env python
"""Benchmark harness — one JSON line to stdout.

Headline workloads:
- index_build: full segment build over the deterministic synthetic
  source-code corpus (code analyzer, compression, norms, stats, manifest);
  also reported as gb_per_hour.
- q_term / q_bool / q_phrase: the reference-style query set (modeled on
  lucene/benchmark/conf/query-terms.txt / query-phrases.txt) as batched
  top-10 BM25 searches; also reported as queries_per_sec.
- relational + fulltext ops at $SPARK_GRAFT_SF_DIR (default
  /root/testdata/sf0.1).

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_DOCS
(synthetic corpus size, default 12000).
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
N_DOCS = int(os.environ.get("SPARK_GRAFT_DOCS", "12000"))

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


def main() -> None:
    from lucene_solr_spark.session import get_spark
    from lucene_solr_spark.corpus import synth_corpus
    from lucene_solr_spark.index import build_index
    from lucene_solr_spark.search import IndexSearcher
    from lucene_solr_spark import relational, textops

    spark = get_spark(cores=CPUS, shuffle_partitions=CPUS, driver_mem="48g")
    spark.sparkContext.setLogLevel("ERROR")

    results: dict[str, float] = {}
    extra: dict[str, float] = {}

    # ---- index build over the synthetic source-code corpus ----------------
    index_dir = f"/tmp/lss_bench_index/{N_DOCS}_{CPUS}"
    shutil.rmtree(index_dir, ignore_errors=True)
    docs = synth_corpus(spark, N_DOCS, n_partitions=CPUS)
    input_bytes = docs.selectExpr("sum(octet_length(content)) b").collect()[0].b
    t0 = time.time()
    build_index(spark, docs, index_dir, num_segments=CPUS, analyzer="code")
    build_s = time.time() - t0
    results["index_build"] = round(build_s, 3)
    extra["input_gb"] = round(input_bytes / 1e9, 4)
    extra["gb_per_hour"] = round(input_bytes / 1e9 / (build_s / 3600), 3)

    # ---- BM25 query batches ------------------------------------------------
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
