"""One-off diagnostic: `regex` module vs CPython `re` for the parse
hot path (VERDICT r4 item 8, evidence-gated).

Protocol per SCALE.md §2.1: same-process, alternating A/B, min-of-7
per engine — host windows swing single runs ±15%, so nothing but a
paired min-of-N carries a conclusion. The B variant recompiles every
module-level pattern in functions/ansi.py with `regex.compile`
(patterns are referenced as module globals at call time, so swapping
the globals swaps the engine for parse_doc + build_line_counted).

Run: python tools/probe_regex_ab.py   (pure CPU, no Spark; take the
dev lock anyway — it shares cores with the scaling watcher's probes)
"""
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from console_log_parser_spark import datagen  # noqa: E402
from console_log_parser_spark.functions import ansi  # noqa: E402

N_DOCS = 800
ROUNDS = 7


def main():
    try:
        import regex
    except ImportError:
        print(json.dumps({"result": "regex module not installed"}))
        return

    texts = [datagen.gen_doc(i)[0] for i in range(N_DOCS)]
    originals = {name: obj for name, obj in vars(ansi).items()
                 if isinstance(obj, re.Pattern)}
    swapped = {}
    for name, pat in originals.items():
        # regex accepts re's flag constants; VERSION0 keeps re-compatible
        # semantics (no nested-set/POSIX surprises)
        swapped[name] = regex.compile(pat.pattern,
                                      pat.flags | regex.VERSION0)

    def run_once():
        t0 = time.perf_counter()
        for t in texts:
            ansi.parse_doc(t)
        return time.perf_counter() - t0

    # verify identical results before timing anything
    base = [ansi.parse_doc(t) for t in texts[:100]]
    for name, obj in swapped.items():
        setattr(ansi, name, obj)
    alt = [ansi.parse_doc(t) for t in texts[:100]]
    for name, obj in originals.items():
        setattr(ansi, name, obj)
    if base != alt:
        diffs = sum(1 for a, b in zip(base, alt) if a != b)
        print(json.dumps({"result": "SEMANTIC MISMATCH",
                          "n_diff_docs": diffs,
                          "verdict": "regex engine NOT a drop-in"}))
        return

    times = {"re": [], "regex": []}
    for _ in range(ROUNDS):          # alternating ABAB pairs
        times["re"].append(run_once())
        for name, obj in swapped.items():
            setattr(ansi, name, obj)
        times["regex"].append(run_once())
        for name, obj in originals.items():
            setattr(ansi, name, obj)

    m_re, m_rx = min(times["re"]), min(times["regex"])
    print(json.dumps({
        "n_docs": N_DOCS, "rounds": ROUNDS,
        "re_min_sec": round(m_re, 4), "regex_min_sec": round(m_rx, 4),
        "re_docs_per_sec": round(N_DOCS / m_re, 1),
        "regex_docs_per_sec": round(N_DOCS / m_rx, 1),
        "speedup_regex_over_re": round(m_re / m_rx, 3),
        "re_all": [round(x, 4) for x in times["re"]],
        "regex_all": [round(x, 4) for x in times["regex"]],
    }))


if __name__ == "__main__":
    main()
