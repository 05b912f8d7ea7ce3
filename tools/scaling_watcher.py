"""Window watcher: run the scaling harness only in an honest window.

Polls the spin-loop hardware ceiling AND the deliverable memory
bandwidth (the axis run 10 exposed); when both clear their gates,
launches tools/bench_scaling.py (which re-checks both gates itself
before touching the ledger). Keeps watching until
``SPARK_GRAFT_WATCH_ROWS`` harness runs complete (default 1) or the
deadline passes. This automates the round-1 ADVICE discipline — "re-run
the harness in a window where the concurrently measured spin ceiling is
high" — instead of hand-timing it.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import hardware_ceiling_med3, membw_best2  # noqa: E402


def main():
    gate = float(os.environ.get("SPARK_GRAFT_MIN_CEILING", "0.85"))
    bw_gate = float(os.environ.get("SPARK_GRAFT_MIN_MEMBW_GBS", "110"))
    target_rows = int(os.environ.get("SPARK_GRAFT_WATCH_ROWS", "1"))
    deadline = time.time() + float(
        os.environ.get("SPARK_GRAFT_WATCH_SECS", "7200"))
    poll = float(os.environ.get("SPARK_GRAFT_WATCH_POLL", "300"))
    lock = os.environ.get("SPARK_GRAFT_DEV_LOCK",
                          "/tmp/spark_graft_dev.lock")
    done = 0
    while time.time() < deadline and done < target_rows:
        if os.path.exists(lock):
            # developer is running their own Spark work; their JVMs
            # would contaminate the level timings (and vice versa)
            print(json.dumps({"watcher": "dev lock present, waiting"}),
                  flush=True)
            time.sleep(poll)
            continue
        # instantaneous busy-core probe (1 s /proc/stat delta): the
        # 1-min loadavg decays far slower than real activity and was
        # observed blocking an otherwise-qualifying window
        from tools.bench_scaling import _total_busy_cpu_secs
        b0 = _total_busy_cpu_secs()
        time.sleep(1.0)
        busy_cores = _total_busy_cpu_secs() - b0
        # median-of-3, same instrument AND same probe durations as the
        # harness gates (secs=4.0 / 2.0 — a shorter poll here would be
        # handed off as the pre-gate below while the ledger labels it
        # with the harness instrument, r5 review finding): the old
        # single-sample poll green-lit transient spikes (0.985 polls
        # followed by 0.829 pre-gate skips) and wasted window time
        probe_t0 = time.time()
        hw = hardware_ceiling_med3(secs=4.0)
        eff = hw["efficiency"]
        bw = membw_best2(secs=2.0)
        print(json.dumps({"watch_ceiling": round(eff, 3),
                          "watch_samples": hw.get("samples"),
                          "watch_membw_gbs": round(bw["gbs_wide"], 1),
                          "busy_cores": round(busy_cores, 2),
                          "rows_done": done}),
              flush=True)
        # the probes themselves need an idle box to be meaningful;
        # require a near-idle VM AND both passing ceilings
        if (eff >= gate and bw["gbs_wide"] >= bw_gate
                and busy_cores < 2.0 and not os.path.exists(lock)):
            # hand the qualifying reading to the harness as its
            # pre-gate (same instrument, seconds old — see
            # bench_scaling._watcher_pregate): re-probing the same
            # window 40 s later was observed to flap-abort it
            # age the reading from the START of the probe burst, not
            # env-construction time — the ~15 s of probing above is
            # part of the reading's age (r5 review finding)
            env = dict(os.environ,
                       SPARK_GRAFT_MIN_CEILING=str(gate),
                       SPARK_GRAFT_MIN_MEMBW_GBS=str(bw_gate),
                       SPARK_GRAFT_PREGATE_TS=str(probe_t0),
                       SPARK_GRAFT_PREGATE_CEILING=str(eff),
                       SPARK_GRAFT_PREGATE_SAMPLES=json.dumps(
                           hw.get("samples")),
                       SPARK_GRAFT_PREGATE_MEMBW=str(bw["gbs_wide"]))
            r = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "bench_scaling.py")],
                env=env, capture_output=True, text=True, timeout=5400)
            out = r.stdout.strip().splitlines()
            print(r.stdout[-4000:], flush=True)
            if r.returncode == 0 and out:
                last = json.loads(out[-1])
                if "skipped" not in last and not last.get("invalid"):
                    done += 1  # one completed, honestly-windowed,
                    continue  # VALID run — invalid rows stay in the
                    # ledger as evidence but don't advance the target
        time.sleep(poll)
    print(json.dumps({"watcher": "exit", "rows_done": done,
                      "deadline_reached": time.time() >= deadline}),
          flush=True)


if __name__ == "__main__":
    main()
