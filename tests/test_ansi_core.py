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


# --- P5 / UTF-8 margin tests (SURVEY §7 risk register) --------------------

@pytest.mark.parametrize("text", [
    # GR range 0xA0-0xFF is printable data (the reference folds GR to
    # GL through its table, vtparser.py:204-213; the engine's
    # decode-before-match design sees the decoded characters directly)
    "caf\xe9 latte \xa0\xff\xfe\r\n",
    "alice@box:~/w$ echo na\xefve\r\n",
    "\x1b[31m\xe9\xa0\x1b[0m styled GR\n",
    "GR next to C1: \xa0\x85\xff\n",
    "GR inside OSC \x1b]0;caf\xe9\x07 and after\n",
    # truncated escapes at end-of-document, each introducer family
    "truncated csi at eod \x1b[38;5",
    "truncated csi interm \x1b[1;2 ",
    "truncated osc at eod \x1b]0;half title",
    "truncated dcs at eod \x1bPq#0;partial",
    "truncated esc at eod \x1b",
    "truncated esc interm at eod \x1b(",
    "gr then truncation \xe9\x1b[12",
])
def test_p5_gr_and_eod_margins_engine_eq_oracle(text):
    e = ansi.parse_doc(text)
    o = oracle.oracle_parse_doc(text)
    for k in KEYS:
        assert e[k] == o[k], (k, repr(text))


def test_p5_gr_chars_survive_strip_and_replay():
    # GR chars are kept by the strip (they are data, not control) and
    # flow through the LineBuilder replay unchanged
    s = ansi.strip_ansi("\x1b[31m\xa0caf\xe9\xff\x1b[0m")
    assert s == "\xa0caf\xe9\xff"
    assert ansi.build_line("x\xa0y\x08z") == "x\xa0z"


@pytest.mark.parametrize("text", [
    # dangling ESC (matched by no ANSI_RE branch): retained by the
    # strip, dropped by the replay layer — the edit-hint fast path must
    # fall back to the LineBuilder walk (ADVICE r3 high)
    "alice@box:~/w$ echo hi\x1b\x85tail\n",
    "alice@box:~/w$ echo hi\x1b\x1btail\n",
    "alice@box:~/w$ a\x1b\x7fb\n",
    "alice@box:~/w$ a\x1b\xffb\n",
    "alice@box:~/w$ x\x1b\x9b1Cy\n",
    # multi-param / malformed params on editing finals: leading numeric
    # parameter + one warning, never a ValueError (ADVICE r3 low)
    "alice@box:~/w$ ab\x1b[1;5Ccd\n",
    "alice@box:~/w$ ab\x1b[;Dcd\n",
    "alice@box:~/w$ abcd\x1b[1:3P\n",
    "alice@box:~/w$ ab\x1b[2;0Kcd\n",
    "alice@box:~/w$ ab\x1b[1<2Ccd\n",
])
def test_dangling_esc_and_multiparam_margins_engine_eq_oracle(text):
    e = ansi.parse_doc(text)
    o = oracle.oracle_parse_doc(text)
    for k in KEYS:
        assert e[k] == o[k], (k, repr(text))


def test_dangling_esc_dropped_from_cmd_line():
    # the ADVICE repro: fast path retained the ESC before the fix
    e = ansi.parse_doc("alice@box:~/w$ echo hi\x1b\x85tail\n")
    assert e["cmd_lines"] == ["echo hitail"]
    # stripped keeps the dangling ESC (it is unparsed input, counted)
    assert e["n_unparsed"] == 1


def test_multiparam_edit_csi_no_valueerror():
    # CSI 1;5C replays as cursor-forward 1 and counts one warning
    line, warns = ansi.build_line_counted("ab\x1b[1;5Ccd")
    assert line == "ab cd"
    assert warns == 1
    line, warns = ansi.build_line_counted("ab\x1b[;Dcd")
    assert line == "acd"
    assert warns == 1


def test_invalid_codepoint_tokens_decode_to_replacement():
    # invalid-UTF-32 boundary at the Arrow decode (operators/parse.py
    # decode_token_lists, errors="replace"): surrogates and
    # out-of-range values become U+FFFD, never an exception, and list
    # offsets stay aligned (one output char per token)
    import pyarrow as pa

    from console_log_parser_spark.operators.parse import decode_token_lists

    vals = [0x41, 0xD800, 0x42, 0x7FFFFFFF, 0x1F600, -1, 0x43]
    col = pa.ListArray.from_arrays(
        pa.array([0, len(vals)], pa.int32()), pa.array(vals, pa.int32()))
    docs, offsets = decode_token_lists(col)
    assert docs == ["A�B�\U0001F600�C"]
    assert list(offsets) == [0, len(vals)]
    # and the engine/oracle twins agree on the replaced text
    e = ansi.parse_doc(docs[0])
    o = oracle.oracle_parse_doc(docs[0])
    for k in KEYS:
        assert e[k] == o[k], k
