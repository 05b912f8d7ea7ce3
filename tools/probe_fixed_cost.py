"""One-off diagnostic: decompose the per-run fixed cost of the bench
pipeline action (protocol-2 plan-reuse loop shows ~2.6 s/run of
scale-invariant overhead at local[32] — derived from AMPLIFY=20 vs 80
throughput: 400k/9.8s vs 100k/4.43s => fixed ~2.64 s, rate ~56k/s).

Times, in one JVM at local[$SPARK_GRAFT_CPUS]:
  a) trivial job            _noop(range(1e6))            -- bare job overhead
  b) scan-only agg          sum(n_tok) over tokens table -- no python stage
  c) parse-only             parse_stage -> count agg     -- python stage, no route
  d) full pipeline agg      severity_histogram(routed)   -- the bench action
  e) full agg, AQE off
Each 5x after 3 warmups of (d). Prints one JSON line.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from bench import build_pipeline, ensure_tokens_table, _noop  # noqa: E402
from console_log_parser_spark.session import get_spark  # noqa: E402


def t(fn, n=5):
    out = []
    for _ in range(n):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return out


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="probe_fixed", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    tokens_path = ensure_tokens_table(spark, sf_dir)
    tbl_bytes = sum(os.path.getsize(os.path.join(tokens_path, f))
                    for f in os.listdir(tokens_path) if f.endswith(".parquet"))
    split = min(max(tbl_bytes // (int(cpus) * 3), 1 << 20), 128 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    aggs, routed = build_pipeline(spark, sf_dir, tokens_path)
    logs = spark.read.parquet(tokens_path)

    res = {"amplify": os.environ.get("SPARK_GRAFT_AMPLIFY", "20"),
           "cpus": cpus}
    # warm the JVM/JIT/python workers on the real action first
    res["warm_full"] = t(lambda: _noop(aggs), 4)
    res["trivial"] = t(lambda: _noop(spark.range(1000000)), 5)
    res["scan_only"] = t(
        lambda: _noop(logs.agg(F.sum("n_tok").alias("s"))), 5)
    from console_log_parser_spark.operators.parse import parse_stage
    parsed_cnt = parse_stage(logs).agg(F.count(F.lit(1)).alias("c"))
    res["parse_only"] = t(lambda: _noop(parsed_cnt), 5)
    res["full"] = t(lambda: _noop(aggs), 5)
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    aggs2, _ = build_pipeline(spark, sf_dir, tokens_path)
    res["full_aqe_off"] = t(lambda: _noop(aggs2), 5)
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
