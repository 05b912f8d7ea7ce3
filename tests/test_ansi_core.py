"""Engine (vectorized regex, functions/ansi.py) vs oracle (char-at-a-time
FSM, oracle.py) vs generator intent (datagen.py) — the per-doc
correctness core."""
import pytest

from console_log_parser_spark import datagen, oracle
from console_log_parser_spark.functions import ansi

KEYS = ["stripped", "seq_hist", "n_events", "n_csi", "n_osc", "n_esc",
        "n_dcs", "n_sgr", "n_c1", "severity", "n_debug", "n_info",
        "n_warn", "n_error", "ts_min", "ts_max", "prompt_count",
        "cmd_lines", "n_vim", "n_unparsed"]


@pytest.mark.parametrize("lo,hi", [(0, 150), (150, 300), (5000, 5100)])
def test_engine_matches_oracle_on_synthetic(lo, hi):
    for i in range(lo, hi):
        text, exp = datagen.gen_doc(i)
        e = ansi.parse_doc(text)
        o = oracle.oracle_parse_doc(text)
        for k in KEYS:
            assert e[k] == o[k], f"doc {i} key {k}"
        assert e["cmd_lines"] == exp["cmd_lines"], f"doc {i} intent"
        assert e["n_vim"] == exp["n_vim"]
        assert e["prompt_count"] == exp["prompt_count"]


@pytest.mark.parametrize("text", [
    "",
    "plain text only\nsecond line\n",
    "colors \x1b[31mred\x1b[0m done\n",
    "trunc csi \x1b[12",
    "trunc osc \x1b]0;title-without-bel",
    "trunc esc \x1b",
    "trunc esc-int \x1b(",
    "c1 csi \x9b31mred\x9b0m\n",
    "c1 single \x85 next\n",
    "lone esc mid \x1b\ndoc\n",
    "osc st \x1b]2;t\x1b\\after\n",
    "dcs \x1bPq#0;2;0;0;0#0~~\x1b\\after\n",
    "alice@host:~$ echo hi\r\n",
    "alice@host:~$ ech\x08\x08\x08echo x\x1b[K\r\n",
    "tab\tand\x0bvt\n",
    "\x1b[22;0;0tvim stuff\x1b[23;0;0t\r\nalice@h:~$ after\r\n",
    # fuzz-found margins: BS editing INTO the prompt prefix must kill
    # the prompt match (`~` is only legal as the leading cwd char,
    # terminalparser.py:28), and cursor-forward at a G-drifted column
    # appends one space per step (terminal2html.py:480-488)
    "alice@box:~/w$ \x08\x08\x08~\r\n",
    "\x1b[5Galice@box:~/w$ \x1b[3C\r\n",
])
def test_edge_cases_engine_eq_oracle(text):
    e = ansi.parse_doc(text)
    o = oracle.oracle_parse_doc(text)
    for k in KEYS:
        assert e[k] == o[k], k


def test_strip_removes_all_escapes():
    text, _ = datagen.gen_doc(7)
    s = ansi.strip_ansi(text)
    assert "\x1b" not in s
    assert not any(0x80 <= ord(c) <= 0x9F for c in s)


def test_tokens_roundtrip():
    text, _ = datagen.gen_doc(3)
    toks = datagen.text_to_tokens(text)
    assert len(toks) == len(text)
    assert "".join(map(chr, toks)) == text


def test_severity_order_and_counts():
    r = ansi.parse_doc("2025-01-01T00:00:00 INFO a: x\n"
                       "2025-01-01T00:00:01 ERROR b: y\n"
                       "2025-01-02 03:04:05 WARN c: z\n")
    assert r["severity"] == "ERROR"
    assert (r["n_info"], r["n_error"], r["n_warn"], r["n_debug"]) == (1, 1, 1, 0)
    assert r["ts_min"] == "2025-01-01T00:00:00"
    assert r["ts_max"] == "2025-01-02 03:04:05"


def test_editing_ops_unit():
    # CSI @ insert, C forward, D back, K clear, P delete, X erase
    assert ansi.build_line("abdef\x1b[3D\x1b[@c\x1b[3C") == "abcdef"
    assert ansi.build_line("abcZZZ\x1b[3D\x1b[3P") == "abc"
    assert ansi.build_line("abcdef\x1b[4D\x1b[2X") == "ab  ef"
    assert ansi.build_line("abcdefxy\x08\x08\x1b[K") == "abcdef"
    assert ansi.build_line("junk\rgood") == "good"
    assert ansi.build_line("ab\x1b[5Cz") == "ab     z"
    assert ansi.build_line("hello\x1b[2G_") == "h_llo"
