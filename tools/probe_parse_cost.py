"""One-off diagnostic #2: where does the Arrow parse stage's time go?

Variants over the same tokens table (A=$SPARK_GRAFT_AMPLIFY, 32 cores):
  in_only     mapInArrow that reads the batch, returns (doc_id, n_tok)
              -- JVM->Python Arrow transfer + worker/task overhead only
  decode_only in_only + decode_token_lists (UTF-32 decode, no regex)
  parse_light full ansi.parse_doc but emit ONLY light columns
              (no stripped re-encode, no seq_hist map, no cmd_lines)
  parse_full  the real parse_stage
Each -> count agg via noop, 4 runs after 2 warmups of parse_full.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyarrow as pa  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from bench import ensure_tokens_table, _noop  # noqa: E402
from console_log_parser_spark.session import get_spark  # noqa: E402


def t(fn, n=4):
    out = []
    for _ in range(n):
        t0 = time.time()
        fn()
        out.append(round(time.time() - t0, 3))
    return out


def in_only(it):
    for b in it:
        yield pa.RecordBatch.from_arrays(
            [b.column("doc_id"), b.column("n_tok").cast(pa.int32())],
            names=["doc_id", "n_tok"])


def decode_only(it):
    from console_log_parser_spark.operators.parse import decode_token_lists
    for b in it:
        docs, _ = decode_token_lists(b.column("tokens"))
        yield pa.RecordBatch.from_arrays(
            [b.column("doc_id"),
             pa.array([len(d) for d in docs], pa.int32())],
            names=["doc_id", "n_tok"])


def parse_light(it):
    from console_log_parser_spark.operators.parse import decode_token_lists
    from console_log_parser_spark.functions import ansi
    for b in it:
        docs, _ = decode_token_lists(b.column("tokens"))
        parsed = [ansi.parse_doc(d) for d in docs]
        yield pa.RecordBatch.from_arrays(
            [b.column("doc_id"),
             pa.array([p["severity"] for p in parsed], pa.string()),
             pa.array([p["n_events"] for p in parsed], pa.int32())],
            names=["doc_id", "severity", "n_events"])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(app="probe_parse", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    tokens_path = ensure_tokens_table(spark, sf_dir)
    tbl_bytes = sum(os.path.getsize(os.path.join(tokens_path, f))
                    for f in os.listdir(tokens_path) if f.endswith(".parquet"))
    split = min(max(tbl_bytes // (int(cpus) * 3), 1 << 20), 128 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    logs = spark.read.parquet(tokens_path)

    from console_log_parser_spark.operators.parse import parse_stage
    full = parse_stage(logs).agg(F.count(F.lit(1)).alias("c"))
    d_in = logs.mapInArrow(in_only, "doc_id string, n_tok int") \
        .agg(F.count(F.lit(1)).alias("c"))
    d_dec = logs.mapInArrow(decode_only, "doc_id string, n_tok int") \
        .agg(F.count(F.lit(1)).alias("c"))
    d_light = logs.mapInArrow(
        parse_light, "doc_id string, severity string, n_events int") \
        .agg(F.count(F.lit(1)).alias("c"))

    res = {"amplify": os.environ.get("SPARK_GRAFT_AMPLIFY", "20"),
           "cpus": cpus}
    res["warm"] = t(lambda: _noop(full), 2)
    res["in_only"] = t(lambda: _noop(d_in))
    res["decode_only"] = t(lambda: _noop(d_dec))
    res["parse_light"] = t(lambda: _noop(d_light))
    res["parse_full"] = t(lambda: _noop(full))
    spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
