"""One-off diagnostic #5: same-process A=20 vs A=80 pipeline throughput
at local[32] AND local[8]-emulation is impossible in one process, so
this runs 32-core only; the level-8 check runs via taskset separately.

Alternates A20/A80 runs (ABAB) so window drift cancels.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import build_pipeline, _noop  # noqa: E402
from console_log_parser_spark.session import get_spark  # noqa: E402

T20 = "/dev/shm/bench_tokens_sf0.1_x20_s42_p96_237dee63"
T80 = "/dev/shm/bench_tokens_sf0.1_x80_s42_p96_237dee63"


def main():
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf_dir = "/root/testdata/sf0.1"
    spark = get_spark(app="probe_amp", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))
    tbl_bytes = sum(os.path.getsize(os.path.join(T80, f))
                    for f in os.listdir(T80) if f.endswith(".parquet"))
    split = min(max(tbl_bytes // (int(cpus) * 3), 1 << 20), 128 << 20)
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
    a20, _ = build_pipeline(spark, sf_dir, T20)
    a80, _ = build_pipeline(spark, sf_dir, T80)
    # warm both
    _noop(a80)
    _noop(a20)
    _noop(a80)
    r = {"cpus": cpus, "t20": [], "t80": []}
    for _ in range(4):
        t0 = time.time()
        _noop(a20)
        r["t20"].append(round(time.time() - t0, 3))
        t0 = time.time()
        _noop(a80)
        r["t80"].append(round(time.time() - t0, 3))
    med20 = sorted(r["t20"])[1]
    med80 = sorted(r["t80"])[1]
    r["seq_s_20"] = round(100000 / med20)
    r["seq_s_80"] = round(400000 / med80)
    r["fixed_cost_est_s"] = round((4 * med20 - med80) / 3, 3)
    spark.stop()
    print(json.dumps(r))


if __name__ == "__main__":
    main()
