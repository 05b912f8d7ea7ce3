"""Window watcher: run the scaling harness only in an honest window.

Polls the spin-loop hardware ceiling; when it clears the gate, launches
tools/bench_scaling.py (which re-checks the gate itself before touching
the ledger). Exits after the first completed harness run or when the
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

from tools.bench_scaling import hardware_ceiling  # noqa: E402


def main():
    gate = float(os.environ.get("SPARK_GRAFT_MIN_CEILING", "0.85"))
    deadline = time.time() + float(
        os.environ.get("SPARK_GRAFT_WATCH_SECS", "7200"))
    poll = float(os.environ.get("SPARK_GRAFT_WATCH_POLL", "300"))
    lock = os.environ.get("SPARK_GRAFT_DEV_LOCK",
                          "/tmp/spark_graft_dev.lock")
    while time.time() < deadline:
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
        hw = hardware_ceiling(secs=4.0)
        eff = hw["efficiency"]
        print(json.dumps({"watch_ceiling": round(eff, 3),
                          "busy_cores": round(busy_cores, 2)}),
              flush=True)
        # the spin probe itself needs an idle box to be meaningful;
        # require a near-idle VM AND a passing ceiling
        if eff >= gate and busy_cores < 2.0 and not os.path.exists(lock):
            env = dict(os.environ, SPARK_GRAFT_MIN_CEILING=str(gate))
            r = subprocess.run(
                [sys.executable,
                 os.path.join(REPO, "tools", "bench_scaling.py")],
                env=env, capture_output=True, text=True, timeout=5400)
            out = r.stdout.strip().splitlines()
            print(r.stdout[-4000:], flush=True)
            if r.returncode == 0 and out:
                last = json.loads(out[-1])
                if "skipped" not in last:
                    return  # one completed, honestly-windowed run
        time.sleep(poll)
    print(json.dumps({"watcher": "deadline reached, no qualifying "
                                 "window"}), flush=True)


if __name__ == "__main__":
    main()
