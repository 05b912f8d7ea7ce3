"""Diagnostic probe for the 8->32 scaling gap (not part of the claim
ledger — BENCH/scaling_history.jsonl stays the only evidence channel).

Runs ONLY the pipeline job at a given (cpus, amplify), few runs, and
prints per-run times as one JSON line. Used to decompose run time into
serial (per-run fixed) and parallel (per-doc) components by comparing
two amplifications at the same cpu level:

    T(k, A) = S_k + A * w_k      =>  w_k = (T(k,A2)-T(k,A1))/(A2-A1)

The harness emulates a k-executor cluster with taskset, same as
tools/bench_scaling.py; run this via

    taskset -c 0-(k-1) python tools/scaling_probe.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_warm = int(os.environ.get("PROBE_WARM", "2"))
    n_timed = int(os.environ.get("PROBE_TIMED", "3"))

    import bench
    from console_log_parser_spark.session import get_spark

    spark = get_spark(app="probe", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    tokens_path = bench.ensure_tokens_table(spark, sf_dir)
    tbl_bytes = sum(
        os.path.getsize(os.path.join(tokens_path, f))
        for f in os.listdir(tokens_path) if f.endswith(".parquet"))
    split = min(max(tbl_bytes // (int(cpus) * 3), 1 << 20), 128 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    aggs, routed = bench.build_pipeline(spark, sf_dir, tokens_path)
    from pyspark.sql import functions as F
    mrow = routed.agg(F.count(F.lit(1)).alias("rows"),
                      F.sum("n_tok").alias("tokens")).collect()[0]
    n_docs, n_tokens = int(mrow["rows"]), int(mrow["tokens"])
    runs = []
    for _ in range(n_warm + n_timed):
        t0 = time.time()
        bench._noop(aggs)
        runs.append(round(time.time() - t0, 3))
    timed = sorted(runs[n_warm:])
    med = timed[len(timed) // 2]
    print(json.dumps({
        "cpus": int(cpus), "amplify": bench.AMPLIFY,
        "n_docs": n_docs, "runs": runs, "median_timed": med,
        "seq_per_sec": round(n_docs / med, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
