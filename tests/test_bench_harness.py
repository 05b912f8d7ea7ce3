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
