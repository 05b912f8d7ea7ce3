"""Straggler-tail A/B: 3 vs 6 scan waves per level (round 5).

The protocol-3 pipeline scans cpus*3 partitions per level (3 waves).
The last wave of the WIDE level pays the full straggler tail: with 32
concurrent tasks and per-task sigma ~10%, the slowest of the final 32
tasks idles 31 cores while it drains, and a 3-wave run amortizes that
over only 3 waves — the 8-core level's narrower waves hide it better,
which depresses the measured 8->32 efficiency for a reason a real 4N
cluster would also see (and would also fix by raising tasks/core).

This probe runs bench.py in marginal mode (protocol-3 estimator) as
subprocesses, interleaved A-B-A-B on the same box, where
  A = 96-file table, SCAN_WAVES=3  (the protocol-3 shape)
  B = 192-file table, SCAN_WAVES=6 (twice the waves, half the task)
and prints the marginal + pointwise-big rates for each run. Decision
rule (pre-registered): flip the default (as a protocol bump) only if
the B median marginal rate beats A by >3% at cpus=32 AND is not worse
at cpus=8; otherwise record the result here and keep protocol 3.

Run: python tools/probe_waves.py [cpus] [reps]   (default 32 2)
"""
from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    "A_96f_3w": {"SPARK_GRAFT_TOKENS_PARTS": "96",
                 "SPARK_GRAFT_SCAN_WAVES": "3"},
    "B_192f_6w": {"SPARK_GRAFT_TOKENS_PARTS": "192",
                  "SPARK_GRAFT_SCAN_WAVES": "6"},
}


def run_one(cpus: int, cfg: dict) -> dict:
    env = dict(os.environ, SPARK_GRAFT_MARGINAL="1",
               SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_AMPLIFY="80", **cfg)
    # same cpuset confinement as the harness's run_bench: local[8]
    # alone lets Arrow python workers + GC spill onto the idle cores,
    # so an unconfined sub-32 arm measures the wrong shape (r5 review
    # finding — the first 8-core readings of this probe did that)
    r = subprocess.run(["taskset", "-c", f"0-{cpus - 1}",
                        sys.executable, os.path.join(REPO, "bench.py")],
                       env=env, capture_output=True, text=True,
                       timeout=1800)
    if r.returncode != 0:
        raise RuntimeError(
            f"bench.py failed rc={r.returncode}: {r.stderr[-2000:]}")
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    p = json.loads(line)["pipeline"]
    return {"marginal": p["seq_per_sec"],
            "big": p["pointwise_seq_per_sec"]["big"],
            "ok": p["marginal_ok"] and p["pointwise_monotone_ok"]}


def main():
    cpus = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    results = {k: [] for k in CONFIGS}
    for i in range(reps):
        for name, cfg in CONFIGS.items():
            out = run_one(cpus, cfg)
            results[name].append(out)
            print(json.dumps({"rep": i, "config": name,
                              "cpus": cpus, **out}), flush=True)
    summary = {}
    for name, rows in results.items():
        okrows = [r for r in rows if r["ok"]] or rows
        summary[name] = {
            "median_marginal": statistics.median(
                r["marginal"] for r in okrows),
            "median_big": statistics.median(r["big"] for r in okrows),
            "n_ok": sum(r["ok"] for r in rows), "n": len(rows)}
    a, b = summary["A_96f_3w"], summary["B_192f_6w"]
    summary["b_over_a_marginal"] = round(
        b["median_marginal"] / a["median_marginal"], 4)
    summary["b_over_a_big"] = round(
        b["median_big"] / a["median_big"], 4)
    print(json.dumps({"probe": "scan_waves", "cpus": cpus, **summary}),
          flush=True)


if __name__ == "__main__":
    main()
