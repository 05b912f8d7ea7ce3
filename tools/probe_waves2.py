"""Within-process straggler-tail A/B (round 5, second instrument).

tools/probe_waves.py alternates subprocess bench runs ~6 min apart;
this box's hypervisor windows drift faster than that (an 8-core A-A
pair measured 19.5k then 12.4k seq/s — ±30% between reps of the SAME
config), so the subprocess probe can only resolve effects >> 30%.

This probe alternates INSIDE one Spark session every ~10-30 s: it
prebuilds the pipeline plan over the 96-file table (3-wave split) and
the 192-file table (6-wave split) for the SAME AMPLIFY=80 rows, warms
both, then times A-B-A-B-... x reps, flipping maxPartitionBytes before
each run (the split is read at job submission, so per-run flips are
honored). Fast alternation turns window drift into common-mode noise —
the same trick the marginal estimator uses for its S-B pairs.

Run: python tools/probe_waves2.py [cpus] [reps]   (default 32 6)
"""
from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 6
    # confine the whole process tree (JVM + Arrow workers inherit the
    # affinity mask) exactly like the harness's taskset wrapper —
    # local[k] alone lets helper threads spill onto idle cores
    os.sched_setaffinity(0, set(range(cpus)))
    os.environ["SPARK_GRAFT_CPUS"] = str(cpus)
    import bench
    from bench import ensure_tokens_table, build_pipeline, _noop
    spark = bench.get_spark(app="probe_waves2", master=f"local[{cpus}]",
                            shuffle_partitions=max(cpus, 8))
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    # pin ONE storage medium for both tables before building either:
    # the per-call auto choice can put table 1 in tmpfs and push
    # table 2 to disk, turning the wave A/B into a media A/B (the
    # same confound marginal_pipeline_bench pins base= for)
    import shutil
    import tempfile
    base = os.environ.get("SPARK_GRAFT_TOKENS_DIR") or (
        "/dev/shm" if os.path.isdir("/dev/shm") and
        spark.read.parquet(f"{sf_dir}/documents.parquet").count()
        * 80 * 6000 * 2 <= shutil.disk_usage("/dev/shm").free // 2
        else tempfile.gettempdir())
    plans = {}
    n_docs = None
    for name, parts, waves in (("A_96f_3w", 96, 3),
                               ("B_192f_6w", 192, 6)):
        os.environ["SPARK_GRAFT_TOKENS_PARTS"] = str(parts)
        path = ensure_tokens_table(spark, sf_dir, 80, base=base)
        tbl_bytes = sum(os.path.getsize(os.path.join(path, f))
                        for f in os.listdir(path) if f.endswith(".parquet"))
        split = min(max(tbl_bytes // (cpus * waves), 1 << 20), 128 << 20)
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
        aggs, routed = build_pipeline(spark, sf_dir, path)
        n = routed.agg(bench.F.count(bench.F.lit(1))).collect()[0][0]
        n_docs = n_docs or n
        assert n == n_docs, "both tables must hold the same rows"
        plans[name] = (aggs, split)
        _noop(aggs)  # warm (JIT + page-in) per plan
        _noop(aggs)
    times = {k: [] for k in plans}
    for _ in range(reps):
        for name, (aggs, split) in plans.items():
            spark.conf.set("spark.sql.files.maxPartitionBytes", str(split))
            t0 = time.time()
            _noop(aggs)
            dt = time.time() - t0
            times[name].append(dt)
            print(json.dumps({"config": name, "sec": round(dt, 3),
                              "seq_per_sec": round(n_docs / dt, 1)}),
                  flush=True)
    med = {k: statistics.median(v) for k, v in times.items()}
    out = {"probe": "scan_waves_inproc", "cpus": cpus, "reps": reps,
           "n_docs": n_docs,
           "median_sec": {k: round(v, 3) for k, v in med.items()},
           "median_seq_per_sec": {k: round(n_docs / v, 1)
                                  for k, v in med.items()},
           "b_over_a": round(med["A_96f_3w"] / med["B_192f_6w"], 4)}
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
