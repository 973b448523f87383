#!/usr/bin/env python
"""Cluster entry point — run the engine via spark-submit on a real cluster.

    zip -r lucene_solr_spark.zip lucene_solr_spark
    spark-submit --py-files lucene_solr_spark.zip scripts/spark_submit_job.py \
        build  --input <path-or-table> --format iceberg --index s3://bucket/idx \
               --segments 4096 --analyzer code
    spark-submit --py-files lucene_solr_spark.zip scripts/spark_submit_job.py \
        query  --index s3://bucket/idx --q 'parse AND http' --k 10
    spark-submit --py-files lucene_solr_spark.zip scripts/spark_submit_job.py \
        merge  --index s3://bucket/idx
    spark-submit --py-files lucene_solr_spark.zip scripts/spark_submit_job.py \
        check  --index s3://bucket/idx [--input <path> --format iceberg]

The session comes from spark-submit (no master/memory settings here — the
cluster owns those). ``--format iceberg`` reads the input as an Iceberg
table through the generic DataSource API (needs the Iceberg runtime jar on
the cluster; every other format — parquet/csv/json/text — works anywhere).
Build is resumable: re-submitting after a partial failure skips finished
segments via the manifest (per-partition lineage + metrics). Each command
prints ONE JSON line so workflow schedulers can parse the outcome.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    sub = p.add_subparsers(dest="cmd", required=True)

    b = sub.add_parser("build")
    b.add_argument("--input", required=True)
    b.add_argument("--format", default="parquet")
    b.add_argument("--index", required=True)
    b.add_argument("--segments", type=int, default=1024)
    b.add_argument("--analyzer", default="code")

    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--analyzer", default="code")
    q.add_argument("--similarity", default="bm25")

    m = sub.add_parser("merge")
    m.add_argument("--index", required=True)
    m.add_argument("--hot-df-threshold", type=int, default=5_000_000)

    c = sub.add_parser("check")
    c.add_argument("--index", required=True)
    c.add_argument("--input", default=None)
    c.add_argument("--format", default="parquet")

    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.getOrCreate()  # owned by spark-submit

    if args.cmd == "build":
        from lucene_solr_spark.index import build_index
        from lucene_solr_spark.sources import read_docs

        docs = read_docs(spark, args.input, fmt=args.format)
        out = build_index(
            spark, docs, args.index, num_segments=args.segments, analyzer=args.analyzer
        )
    elif args.cmd == "query":
        from lucene_solr_spark.search import IndexSearcher

        s = IndexSearcher(
            spark, args.index, analyzer=args.analyzer, similarity=args.similarity
        )
        rows = s.fetch(s.search(args.q, k=args.k)).orderBy("rank").collect()
        out = {"query": args.q, "hits": [r.asDict() for r in rows]}
    elif args.cmd == "merge":
        from lucene_solr_spark.index.merge import run_merges

        merges = run_merges(spark, args.index, hot_df_threshold=args.hot_df_threshold)
        out = {"merges": len(merges), "details": merges}
    else:
        from lucene_solr_spark.check import check_index, verify_content_sha

        out = {"structural": check_index(spark, args.index)}
        if args.input:
            from lucene_solr_spark.sources import read_docs

            out["content_sha"] = verify_content_sha(
                spark, read_docs(spark, args.input, fmt=args.format), args.index
            )
    print(json.dumps(out, default=str))


if __name__ == "__main__":
    main()
