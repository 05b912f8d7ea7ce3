"""One-off diagnostic #3: is the 1.6 s Arrow-in cost JVM scan,
per-task overhead, or per-batch overhead?

  jvm_only   sum(size(tokens)) -- JVM reads+decompresses tokens column,
             no python at all
  in_96_2k   in_only at 96 tasks, arrow batch 2048 (current config)
  in_96_16k  batch 16384
  in_24_16k  24 tasks (maxPartitionBytes raised), batch 16384
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


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="probe_arrow", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    tokens_path = ensure_tokens_table(spark, sf_dir)
    tbl_bytes = sum(os.path.getsize(os.path.join(tokens_path, f))
                    for f in os.listdir(tokens_path) if f.endswith(".parquet"))
    logs = spark.read.parquet(tokens_path)
    d_in = logs.mapInArrow(in_only, "doc_id string, n_tok int") \
        .agg(F.count(F.lit(1)).alias("c"))
    jvm = logs.select(F.size("tokens").alias("s")).agg(F.sum("s").alias("t"))

    res = {"tbl_mb": round(tbl_bytes / 1e6, 1)}
    split96 = min(max(tbl_bytes // (int(cpus) * 3), 1 << 20), 128 << 20)

    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split96))
    res["warm"] = t(lambda: _noop(d_in), 2)
    res["jvm_only"] = t(lambda: _noop(jvm))
    res["in_96_2k"] = t(lambda: _noop(d_in))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16384")
    res["in_96_16k"] = t(lambda: _noop(d_in))
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split96 * 4))
    res["in_24_16k"] = t(lambda: _noop(d_in))
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
    res["in_24_2k"] = t(lambda: _noop(d_in))
    spark.stop()
    print(json.dumps(res))


if __name__ == "__main__":
    main()
