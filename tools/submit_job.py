"""spark-submit entry point (north rule: "runs via spark-submit --py-files
on multi-executor clusters").

Usage (see tools/run_spark_submit.sh, which zips the package and submits):

    spark-submit --py-files search_engine_spark.zip tools/submit_job.py \
        build  --corpus <parquet_dir> --index <index_dir> [--n-convs N]
    spark-submit --py-files search_engine_spark.zip tools/submit_job.py \
        query  --index <index_dir> --q "spark index" [--k 10] [--engine wand]

On a cluster, pass --master/--num-executors etc. to spark-submit as usual;
the job itself builds no session config beyond what it is handed.
"""

from __future__ import annotations

import argparse
import json
import sys

from pyspark.sql import SparkSession


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    b = sub.add_parser("build")
    b.add_argument("--corpus", help="transcripts parquet dir (generated if absent)")
    b.add_argument("--index", required=True)
    b.add_argument("--n-convs", type=int, default=1000)
    q = sub.add_parser("query")
    q.add_argument("--index", required=True)
    q.add_argument("--q", required=True)
    q.add_argument("--k", type=int, default=10)
    q.add_argument("--engine", default="df", choices=["df", "wand"])
    args = ap.parse_args()

    spark = SparkSession.builder.appName("search_engine_spark_job").getOrCreate()

    from search_engine_spark.index.builder import build_index
    from search_engine_spark.index.storage import IndexStore
    from search_engine_spark.query.pipeline import search

    if args.cmd == "build":
        if args.corpus:
            df = spark.read.parquet(args.corpus)
        else:
            from search_engine_spark.corpus import generate_spark

            df = generate_spark(spark, args.n_convs, seed=42)
        store = build_index(spark, df, args.index)
        print(json.dumps({"built": args.index, **store.corpus_stats()}))
    else:
        store = IndexStore(args.index)
        rows = search(spark, store, args.q, k=args.k, engine=args.engine).collect()
        for r in rows:
            print(json.dumps({k: str(v) for k, v in r.asDict().items()}))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
