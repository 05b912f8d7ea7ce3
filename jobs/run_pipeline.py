"""spark-submit entry point for the parse -> enrich -> route ->
aggregate pipeline (the north rule's deployment shape: ``spark-submit
--py-files <package.zip> jobs/run_pipeline.py``).

The script only uses the SparkSession given to it by spark-submit (no
master/conf opinions beyond AQE defaults), reads the tokenized-log
table, runs the micro-batch checkpointed pipeline, and prints one JSON
line of observed metrics. Re-running after a kill resumes from the
lineage manifests (plans/checkpoint.py).

Usage:
    python -m console_log_parser_spark.tools ...   # (not needed)
    spark-submit --master local[8] \
        --py-files /tmp/console_log_parser_spark.zip \
        jobs/run_pipeline.py --in-dir DATA --out-dir OUT \
        [--batches 8] [--salt-buckets 16]
"""
from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--in-dir", required=True)
    ap.add_argument("--out-dir", required=True)
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--salt-buckets", type=int, default=16)
    ap.add_argument("--tokens-table", default=None,
                    help="Iceberg identifier for the tokenized corpus "
                         "(catalog.db.table; needs the runtime jar + "
                         "catalog conf); default: parquet in --in-dir")
    ap.add_argument("--max-batches", type=int, default=None,
                    help="stop after N uncommitted batches (kill test)")
    args = ap.parse_args()

    spark = (SparkSession.builder
             .appName("console_log_parser_spark.pipeline")
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.sql.adaptive.skewJoin.enabled", "true")
             .config("spark.sql.session.timeZone", "UTC")
             .getOrCreate())
    spark.sparkContext.setLogLevel("WARN")

    from console_log_parser_spark.plans.checkpoint import (
        run_with_checkpoints)
    from console_log_parser_spark.plans.pipeline import PipelineConfig

    cfg = PipelineConfig(in_dir=args.in_dir, out_dir=args.out_dir,
                         salt_buckets=args.salt_buckets,
                         tokens_table=args.tokens_table)
    result = run_with_checkpoints(spark, cfg, n_batches=args.batches,
                                  max_batches=args.max_batches)
    print(json.dumps({"job": "pipeline", **result}))
    spark.stop()


if __name__ == "__main__":
    main()
