"""One-off diagnostic #4: per-task overhead in the full parse stage.

parse_full -> count at 96 / 32 / 24 tasks (maxPartitionBytes packing),
plus worker-reuse check (python worker PIDs across two runs).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def worker_pids():
    import subprocess
    out = subprocess.run(["ps", "-eo", "pid,cmd"], capture_output=True,
                         text=True).stdout
    return sorted(int(l.split()[0]) for l in out.splitlines()
                  if "pyspark.daemon" in l or "pyspark.worker" in l)


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app="probe_task", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    tokens_path = ensure_tokens_table(spark, sf_dir)
    tbl_bytes = sum(os.path.getsize(os.path.join(tokens_path, f))
                    for f in os.listdir(tokens_path) if f.endswith(".parquet"))
    logs = spark.read.parquet(tokens_path)
    from console_log_parser_spark.operators.parse import parse_stage
    full = parse_stage(logs).agg(F.count(F.lit(1)).alias("c"))

    res = {"tbl_mb": round(tbl_bytes / 1e6, 1)}

    def set_tasks(n):
        split = max(tbl_bytes // n + (1 << 16), 1 << 20)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))

    set_tasks(96)
    res["warm"] = t(lambda: _noop(full), 2)
    res["pids_a"] = worker_pids()
    res["t96"] = t(lambda: _noop(full))
    res["pids_b"] = worker_pids()
    set_tasks(32)
    res["t32"] = t(lambda: _noop(full))
    set_tasks(24)
    res["t24"] = t(lambda: _noop(full))
    set_tasks(96)
    res["t96_again"] = t(lambda: _noop(full))
    res["pids_c"] = worker_pids()
    spark.stop()
    res["reuse"] = res["pids_a"] == res["pids_b"] == res["pids_c"]
    res["n_workers"] = len(res.pop("pids_a")), len(res.pop("pids_b")), \
        len(res.pop("pids_c"))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
