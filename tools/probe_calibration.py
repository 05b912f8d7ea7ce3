"""One-off instrument calibration for the scaling-gate probes.

Two questions the round-4 ledger raised (three of five protocol-2 runs
auto-invalidated; two of them raw-PASS rows killed by a post-run spin
reading taken seconds after a ~10-minute full-load bench):

1. **Idle noise**: what is the sample-to-sample spread of a single
   ``hardware_ceiling`` spin-efficiency reading on an idle box? The
   watcher log shows consecutive 150s-apart polls of 0.74 -> 0.985 ->
   0.829 — if a single sample swings that much, a pre/post gate keyed
   to one sample vetoes windows at random.

2. **Self-induced wake**: does a just-finished long full-32-core burn
   suppress the IMMEDIATE next spin probe (hypervisor fair-share
   settling after our own load), independent of any real window
   change? If yes, the post-run gate as instrumented measures our own
   wake, not the window, and needs a settle delay + multi-sample
   median.

Writes one JSON line per measurement to
``BENCH/probe_calibration_r4.jsonl``. Run on an otherwise-idle box
with the dev lock held (this script IS the load; nothing else may
run).
"""
from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from tools.bench_scaling import hardware_ceiling, membw_best2  # noqa: E402

OUT = os.path.join(REPO, "BENCH", "probe_calibration_r4.jsonl")


def emit(rec):
    rec["t"] = round(time.time(), 1)
    with open(OUT, "a") as f:
        f.write(json.dumps(rec) + "\n")
    print(json.dumps(rec), flush=True)


def _burn(stop_t):
    x = 1
    while time.time() < stop_t:
        for _ in range(100000):
            x = (x * 1103515245 + 12345) & 0x7fffffff


def full_load(secs: float, nproc: int = 32):
    stop_t = time.time() + secs
    ps = [mp.Process(target=_burn, args=(stop_t,)) for _ in range(nproc)]
    for p in ps:
        p.start()
    for p in ps:
        p.join()


def main():
    # --- experiment 0: idle-state noise, 6 back-to-back samples ---
    for i in range(6):
        hw = hardware_ceiling(secs=4.0)
        emit({"exp": "idle_noise", "i": i,
              "eff": round(hw["efficiency"], 3),
              "rate8": round(hw["spin_rate"][8]),
              "rate32": round(hw["spin_rate"][32])})
    bw = membw_best2(secs=1.5)
    emit({"exp": "idle_membw", "gbs": round(bw["gbs_wide"], 1)})

    # --- experiment 1: self-induced wake after a 3-min 32-core burn ---
    emit({"exp": "load_start", "secs": 180})
    full_load(180.0)
    emit({"exp": "load_end"})
    for delay in (0, 45, 90, 150):
        # measure immediately, then after increasing settle times; the
        # probe itself takes ~10 s, so nominal delays drift — t stamps
        # carry the truth
        if delay:
            time.sleep(delay)
        hw = hardware_ceiling(secs=4.0)
        emit({"exp": "post_load", "nominal_delay": delay,
              "eff": round(hw["efficiency"], 3),
              "rate8": round(hw["spin_rate"][8]),
              "rate32": round(hw["spin_rate"][32])})
    bw = membw_best2(secs=1.5)
    emit({"exp": "post_load_membw", "gbs": round(bw["gbs_wide"], 1)})


if __name__ == "__main__":
    main()
