"""Measurement-harness unit tests (tools/bench_scaling.py): the
scaling claim rests on this tooling, so its primitives get the same
test discipline as the engine."""
from __future__ import annotations

import os
import subprocess
import sys
import threading
import time

from tools.bench_scaling import (_median, _total_busy_cpu_secs,
                                 _tree_cpu_sampler)


def test_median_odd_even():
    assert _median([3]) == 3
    assert _median([1, 9]) == 5
    assert _median([9, 1, 5]) == 5
    assert _median([4, 1, 9, 5]) == 4.5


def test_total_busy_cpu_monotone():
    a = _total_busy_cpu_secs()
    time.sleep(0.2)
    assert _total_busy_cpu_secs() >= a


def test_tree_sampler_attributes_grandchildren():
    # "ours" = a child that forks its own CPU-burning child (the
    # bench -> JVM -> worker shape that getrusage(RUSAGE_CHILDREN)
    # cannot see, ledger row 7); the sampler must attribute the
    # grandchild's CPU to the tree.
    code = ("import subprocess, sys\n"
            "p = subprocess.Popen([sys.executable, '-c',"
            "'import time\\nt=time.time()\\n"
            "while time.time()-t<2.5: pass'])\n"
            "p.wait()\n")
    proc = subprocess.Popen([sys.executable, "-c", code])
    acc: dict = {}
    ev = threading.Event()
    th = threading.Thread(target=_tree_cpu_sampler,
                          args=(proc.pid, acc, ev), daemon=True)
    t0 = time.time()
    th.start()
    proc.wait()
    ev.set()
    th.join(5)
    wall = time.time() - t0
    ours = sum(acc.values()) / os.sysconf("SC_CLK_TCK")
    # the grandchild burned ~2.5 CPU-seconds; sampling loses at most
    # the final second — well over half must be attributed
    assert ours >= 1.2, (ours, wall, acc)


def test_main_reporting_path_end_to_end(tmp_path, monkeypatch, capsys):
    """The reporting half of main() — summary fields, ledger append,
    protocol stamp, per-protocol medians, BASELINE.md and README
    rendering — runs against STUBBED measurements, so a render bug can
    never be discovered by (and waste) a real ceiling-gated run."""
    import json

    import tools.bench_scaling as bs

    repo = tmp_path / "repo"
    (repo / "BENCH").mkdir(parents=True)
    (repo / "README.md").write_text(
        "# x\n\n"
        "<!-- SCALING_CLAIM_BEGIN: rendered from "
        "BENCH/scaling_history.jsonl by tools/bench_scaling.py; "
        "do not hand-edit -->\n"
        "<!-- SCALING_CLAIM_END -->\n")
    # a legacy ledger row (no protocol field, position 1 -> protocol 1)
    (repo / "BENCH" / "scaling_history.jsonl").write_text(json.dumps(
        {"value": 0.5, "seq_per_sec": {"8": 1000, "32": 2000},
         "normalized_to_hw_ceiling": 0.6}) + "\n")
    monkeypatch.setattr(bs, "REPO", str(repo))
    monkeypatch.setattr(bs, "FIRST_PROTOCOL2_ROW", 2)
    monkeypatch.setattr(bs, "hardware_ceiling",
                        lambda *a, **k: {"efficiency": 0.9,
                                         "spin_rate": {8: 1, 32: 3.6}})
    monkeypatch.setattr(bs, "membw_ceiling",
                        lambda *a, **k: {"efficiency": 0.5,
                                         "gbs_wide": 150.0,
                                         "bytes_per_sec": {8: 1, 32: 2}})

    def fake_run_bench(cpus, sf_dir):
        seq = {8: 1000.0, 32: 3400.0}[cpus]
        return {"pipeline": {"seq_per_sec": seq, "tok_per_sec": seq * 100,
                             "marginal_ok": True,
                             "pointwise_seq_per_sec": {
                                 "small": seq * 0.7, "big": seq * 0.9}},
                "foreign_cores": 0.1}
    monkeypatch.setattr(bs, "run_bench", fake_run_bench)
    monkeypatch.setenv("SPARK_GRAFT_SCALING_LEVELS", "8,32")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_MIN_CEILING", "0.85")
    monkeypatch.setenv("SPARK_GRAFT_MIN_MEMBW_GBS", "110")
    monkeypatch.setenv("SPARK_GRAFT_POST_SETTLE_SECS", "0")
    bs.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["value"] == 0.85  # 3400/1000/4
    assert out["protocol"] == bs.PROTOCOL
    assert out["pass"] is True
    assert out["membw_pre_gbs"] == 150.0
    assert "invalid" not in out
    # gate-instrument provenance: med3 samples recorded pre and post
    assert out["gate_instrument"].startswith("spin_med3")
    assert out["hw_ceiling_samples_pre"] == [0.9, 0.9, 0.9]
    assert out["hw_ceiling_samples_post"] == [0.9, 0.9, 0.9]
    # protocol-3 provenance: estimator stamp + pointwise supplementary
    assert out["estimator"] == "marginal_2pt"
    # pointwise big rates: 900 @8, 3060 @32 -> (3060/900)/4 = 0.85
    assert out["efficiency_pointwise_big"] == 0.85
    hist = [json.loads(ln) for ln in
            (repo / "BENCH" / "scaling_history.jsonl").read_text()
            .splitlines()]
    assert len(hist) == 2 and hist[1]["protocol"] == bs.PROTOCOL
    baseline = (repo / "BENCH" / "BASELINE.md").read_text()
    assert "0.850" in baseline and "Primary comparable claim" in baseline
    # runs=1 renders the single-invocation sentence, never the
    # "median of 1 invocations" template artifact (VERDICT r4 #5)
    assert "median of 1 invocations" not in baseline.lower()
    assert "single invocation" in baseline
    readme = (repo / "README.md").read_text()
    # all-history median (0.5, 0.85) = 0.675; protocol-3 median = 0.85
    assert "0.675 raw" in readme and "0.850" in readme


def test_readme_claim_honest_when_no_current_protocol_rows(
        tmp_path, monkeypatch):
    """A protocol bump starts the comparable-rows set at zero; the
    README must say so, not silently relabel older-protocol rows as
    current-protocol (r5 review finding: the `or all_vals` fallback
    rendered an all-protocol median under a current-protocol
    caption)."""
    import json

    import tools.bench_scaling as bs

    repo = tmp_path / "repo"
    (repo / "BENCH").mkdir(parents=True)
    (repo / "README.md").write_text(
        "# x\n\n"
        "<!-- SCALING_CLAIM_BEGIN: rendered from "
        "BENCH/scaling_history.jsonl by tools/bench_scaling.py; "
        "do not hand-edit -->\n"
        "<!-- SCALING_CLAIM_END -->\n")
    # two valid rows, both OLDER protocol (position 1 -> protocol 1,
    # explicit stamp 2) — zero protocol-3 rows
    rows = [{"value": 0.5, "normalized_to_hw_ceiling": 0.6},
            {"value": 0.7, "protocol": 2,
             "normalized_to_hw_ceiling": 0.8}]
    (repo / "BENCH" / "scaling_history.jsonl").write_text(
        "".join(json.dumps(r) + "\n" for r in rows))
    monkeypatch.setattr(bs, "REPO", str(repo))
    bs.render_readme_claim()
    readme = (repo / "README.md").read_text()
    assert f"no valid protocol-{bs.PROTOCOL} rows yet" in readme
    assert "0.600 raw" in readme  # all-history median still rendered
    # the honest caption replaced the mislabeled one entirely
    assert "valid current-protocol rows" not in readme


def test_main_degenerate_marginal_invalidation(tmp_path, monkeypatch,
                                               capsys):
    """A level whose big-vs-small time difference collapsed into noise
    (bench reports marginal_ok=False) must auto-invalidate the row —
    a difference of noise is not a throughput measurement."""
    import json

    import tools.bench_scaling as bs

    repo = tmp_path / "repo"
    (repo / "BENCH").mkdir(parents=True)
    monkeypatch.setattr(bs, "REPO", str(repo))
    monkeypatch.setattr(bs, "hardware_ceiling",
                        lambda *a, **k: {"efficiency": 0.9})
    monkeypatch.setattr(bs, "membw_ceiling",
                        lambda *a, **k: {"efficiency": 0.5,
                                         "gbs_wide": 150.0,
                                         "bytes_per_sec": {8: 1, 32: 2}})
    monkeypatch.setattr(
        bs, "run_bench",
        lambda cpus, sf_dir: {"pipeline": {
            "seq_per_sec": {8: 1000.0, 32: 3400.0}[cpus],
            "tok_per_sec": 1.0,
            "marginal_ok": cpus != 32}, "foreign_cores": 0.1})
    monkeypatch.setenv("SPARK_GRAFT_SCALING_LEVELS", "8,32")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_MIN_CEILING", "0.85")
    monkeypatch.setenv("SPARK_GRAFT_MIN_MEMBW_GBS", "110")
    monkeypatch.setenv("SPARK_GRAFT_POST_SETTLE_SECS", "0")
    bs.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["invalid"] is True
    assert "marginal estimator degenerate" in out["invalid_reason"]
    assert "[32]" in out["invalid_reason"]


def test_marginal_estimate_math_and_guard():
    """Protocol-3 arithmetic: rate = ddocs/dt; fixed-cost recovery;
    degeneracy guard trips when dt <= 25% of t_big."""
    from bench import marginal_estimate

    # 100k docs in 4.0s, 400k in 10.0s -> marginal 300k/6s = 50k/s,
    # fixed = 4.0 - 100000/50000 = 2.0s
    est = marginal_estimate((100000, 1000000), (400000, 4000000),
                            4.0, 10.0)
    assert est["ok"] is True
    assert est["seq_per_sec"] == 50000.0
    assert est["tok_per_sec"] == 500000.0
    assert abs(est["fixed_cost_sec"] - 2.0) < 1e-9
    # degenerate: dt = 0.5s on a 10s big run (5% < 25%) -> pointwise
    est = marginal_estimate((100000, 1000000), (400000, 4000000),
                            9.5, 10.0)
    assert est["ok"] is False
    assert est["seq_per_sec"] == 40000.0
    assert est["fixed_cost_sec"] is None


def test_pointwise_monotone_noise_margin():
    """The monotonicity validity gate tolerates inversions inside the
    5% timing-noise margin: a zero-margin gate censors exactly the
    rows whose 2-run-median noise went one way — a value-correlated
    filter that would bias the surviving-row median upward."""
    from bench import pointwise_monotone

    assert pointwise_monotone(30000.0, 33000.0)        # normal
    assert pointwise_monotone(30000.0, 28600.0)        # -4.7%: noise
    assert not pointwise_monotone(30000.0, 28000.0)    # -6.7%: real
    # ledger row 23's real inversion (31.8k -> 28.2k, -11%) still trips
    assert not pointwise_monotone(31788.3, 28249.0)


def test_main_post_run_membw_invalidation(tmp_path, monkeypatch, capsys):
    """Bandwidth collapsing mid-run must auto-invalidate the row."""
    import json

    import tools.bench_scaling as bs

    repo = tmp_path / "repo"
    (repo / "BENCH").mkdir(parents=True)
    monkeypatch.setattr(bs, "REPO", str(repo))
    monkeypatch.setattr(bs, "hardware_ceiling",
                        lambda *a, **k: {"efficiency": 0.9})
    # pre-gate takes best-of-2 (150), post-run best-of-2 (60): a
    # SUSTAINED collapse, which is exactly what must invalidate
    bws = iter([{"efficiency": 0.5, "gbs_wide": g,
                 "bytes_per_sec": {8: 1, 32: 2}}
                for g in (150.0, 150.0, 60.0, 60.0)])
    monkeypatch.setattr(bs, "membw_ceiling", lambda *a, **k: next(bws))
    monkeypatch.setattr(
        bs, "run_bench",
        lambda cpus, sf_dir: {"pipeline": {
            "seq_per_sec": {8: 1000.0, 32: 3400.0}[cpus],
            "tok_per_sec": 1.0}, "foreign_cores": 0.1})
    monkeypatch.setenv("SPARK_GRAFT_SCALING_LEVELS", "8,32")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_MIN_CEILING", "0.85")
    monkeypatch.setenv("SPARK_GRAFT_MIN_MEMBW_GBS", "110")
    monkeypatch.setenv("SPARK_GRAFT_POST_SETTLE_SECS", "0")
    bs.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["invalid"] is True
    assert "memory bandwidth" in out["invalid_reason"]


def test_med3_takes_median_not_best(monkeypatch):
    """A ratio instrument must use the MEDIAN: a transient stomp during
    the 8-proc phase inflates single samples, so best-of would pick the
    contaminated one."""
    import tools.bench_scaling as bs

    effs = iter([0.74, 0.985, 0.829])
    monkeypatch.setattr(bs, "hardware_ceiling",
                        lambda *a, **k: {"efficiency": next(effs)})
    hw = bs.hardware_ceiling_med3()
    assert hw["efficiency"] == 0.829
    assert hw["samples"] == [0.74, 0.985, 0.829]


def test_pipeline_only_env_reaches_bench(monkeypatch):
    """run_bench must ship SPARK_GRAFT_PIPELINE_ONLY to bench.py so a
    scaling invocation never burns core-minutes on the ad-hoc headline
    queries (signal-free load feeds the fair-share wake)."""
    import tools.bench_scaling as bs

    captured = {}

    class FakeProc:
        pid = os.getpid()
        returncode = 0

        def communicate(self, timeout=None):
            return '{"pipeline": {"seq_per_sec": 1.0}}', ""

    def fake_popen(cmd, env=None, **kw):
        captured["env"] = env
        return FakeProc()

    monkeypatch.setattr(bs.subprocess, "Popen", fake_popen)
    r = bs.run_bench(8, "/tmp/x")
    assert captured["env"]["SPARK_GRAFT_PIPELINE_ONLY"] == "1"
    assert captured["env"]["SPARK_GRAFT_MARGINAL"] == "1"
    assert "foreign_cores" in r

def test_watcher_pregate_passthrough(tmp_path, monkeypatch, capsys):
    """A fresh watcher reading (same med3 instrument, seconds old)
    serves as the pre-gate: the harness must NOT re-probe before the
    run (the duplicate probe was observed flap-aborting qualifying
    windows), must record the reading and its age, and the post-run
    gates must still use a fresh probe."""
    import json
    import time as _time

    import tools.bench_scaling as bs

    repo = tmp_path / "repo"
    (repo / "BENCH").mkdir(parents=True)
    (repo / "README.md").write_text(
        "# x\n\n"
        "<!-- SCALING_CLAIM_BEGIN: rendered from "
        "BENCH/scaling_history.jsonl by tools/bench_scaling.py; "
        "do not hand-edit -->\n"
        "<!-- SCALING_CLAIM_END -->\n")
    (repo / "BENCH" / "scaling_history.jsonl").write_text("")
    monkeypatch.setattr(bs, "REPO", str(repo))
    calls = {"n": 0}

    def fake_med3(*a, **k):
        calls["n"] += 1
        return {"efficiency": 0.9, "samples": [0.9, 0.9, 0.9],
                "spin_rate": {8: 1, 32: 3.6}}
    monkeypatch.setattr(bs, "hardware_ceiling_med3", fake_med3)
    monkeypatch.setattr(bs, "membw_ceiling",
                        lambda *a, **k: {"efficiency": 0.5,
                                         "gbs_wide": 150.0,
                                         "bytes_per_sec": {8: 1, 32: 2}})

    def fake_run_bench(cpus, sf_dir):
        seq = {8: 1000.0, 32: 3400.0}[cpus]
        return {"pipeline": {"seq_per_sec": seq, "tok_per_sec": seq * 100,
                             "marginal_ok": True,
                             "pointwise_seq_per_sec": {
                                 "small": seq * 0.7, "big": seq * 0.9}},
                "foreign_cores": 0.1}
    monkeypatch.setattr(bs, "run_bench", fake_run_bench)
    monkeypatch.setenv("SPARK_GRAFT_SCALING_LEVELS", "8,32")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_MIN_CEILING", "0.85")
    monkeypatch.setenv("SPARK_GRAFT_MIN_MEMBW_GBS", "110")
    monkeypatch.setenv("SPARK_GRAFT_POST_SETTLE_SECS", "0")
    # the watcher's reading: distinct from the stub so provenance is
    # provable in the output
    monkeypatch.setenv("SPARK_GRAFT_PREGATE_TS", str(_time.time()))
    monkeypatch.setenv("SPARK_GRAFT_PREGATE_CEILING", "0.88")
    monkeypatch.setenv("SPARK_GRAFT_PREGATE_SAMPLES",
                       "[0.85, 0.88, 0.9]")
    monkeypatch.setenv("SPARK_GRAFT_PREGATE_MEMBW", "149.0")
    bs.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["hw_ceiling_pre_run"] == 0.88          # watcher value
    assert out["hw_ceiling_samples_pre"] == [0.85, 0.88, 0.9]
    assert out["pre_gate_from_watcher_age_sec"] is not None
    # provenance labeled per axis: BOTH pregates came from the
    # watcher in this scenario
    assert out["gate_instrument"].endswith(
        "+watcher_pregate_hw+watcher_pregate_membw")
    assert out["membw_pre_gbs"] == 149.0
    # post gate still measured fresh: exactly ONE med3 probe ran
    assert calls["n"] == 1
    assert out["hw_ceiling_spin_efficiency"] == 0.9   # the post probe
    assert "invalid" not in out


def test_watcher_pregate_stale_reading_ignored(monkeypatch):
    import time as _time

    import tools.bench_scaling as bs
    monkeypatch.setenv("SPARK_GRAFT_PREGATE_TS",
                       str(_time.time() - 300))
    monkeypatch.setenv("SPARK_GRAFT_PREGATE_CEILING", "0.9")
    assert bs._watcher_pregate() is None
    assert bs._watcher_pregate_membw() is None

def test_main_pointwise_inversion_invalidation(tmp_path, monkeypatch,
                                               capsys):
    """A level whose pointwise big rate fell BELOW its small rate ran
    on a machine that changed mid-measurement (fixed cost amortizes
    better at the bigger size, so the rate is strictly increasing in
    input size on a stable window) — the row must auto-invalidate
    (prospective gate after ledger row 23)."""
    import json

    import tools.bench_scaling as bs

    repo = tmp_path / "repo"
    (repo / "BENCH").mkdir(parents=True)
    monkeypatch.setattr(bs, "REPO", str(repo))
    monkeypatch.setattr(bs, "hardware_ceiling",
                        lambda *a, **k: {"efficiency": 0.9})
    monkeypatch.setattr(bs, "membw_ceiling",
                        lambda *a, **k: {"efficiency": 0.5,
                                         "gbs_wide": 150.0,
                                         "bytes_per_sec": {8: 1, 32: 2}})

    def fake_run_bench(cpus, sf_dir):
        seq = {8: 1000.0, 32: 3400.0}[cpus]
        return {"pipeline": {"seq_per_sec": seq, "tok_per_sec": seq * 100,
                             "marginal_ok": True,
                             # 32-level inversion: big < small
                             "pointwise_monotone_ok": cpus != 32,
                             "pointwise_seq_per_sec": {
                                 "small": seq * 0.9, "big": seq * 0.8}},
                "foreign_cores": 0.1}
    monkeypatch.setattr(bs, "run_bench", fake_run_bench)
    monkeypatch.setenv("SPARK_GRAFT_SCALING_LEVELS", "8,32")
    monkeypatch.setenv("SPARK_GRAFT_SCALING_RUNS", "1")
    monkeypatch.setenv("SPARK_GRAFT_MIN_CEILING", "0.85")
    monkeypatch.setenv("SPARK_GRAFT_MIN_MEMBW_GBS", "110")
    monkeypatch.setenv("SPARK_GRAFT_POST_SETTLE_SECS", "0")
    bs.main()
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert out["invalid"] is True
    assert "INVERTED" in out["invalid_reason"]
    assert "[32]" in out["invalid_reason"]
