"""Property-based fuzz: the vectorized engine (functions/ansi.py) and
the char-FSM oracle (oracle.py) must agree on every generated stream.

Atoms are self-contained (complete escape sequences, whole prompt
lines), composed in random order, with optional truncated sequences at
end-of-doc only — the one documented divergence (an ESC inside an
unterminated OSC/DCS body that is not an ST terminator, oracle.py
module docstring) is thereby excluded from the generated domain, and
everything else is fair game: SGR stacks, cursor-edit replay on prompt
lines, C1 introducers, vim spans, DCS payloads, severity words and
timestamps.
"""
from hypothesis import given, settings, strategies as st

from console_log_parser_spark import oracle
from console_log_parser_spark.functions import ansi
from console_log_parser_spark.operators import extract_sets

KEYS = ["stripped", "seq_hist", "n_events", "n_csi", "n_osc", "n_esc",
        "n_dcs", "n_sgr", "n_c1", "severity", "n_debug", "n_info",
        "n_warn", "n_error", "ts_min", "ts_max", "prompt_count",
        "cmd_lines", "n_vim", "n_unparsed",
        "n_app_mode", "n_devstat", "n_edit_warnings"]

# GR-range material (P5, vtparser.py:204-213): 0xA0-0xFF characters are
# printable data to both implementations — between words, inside
# escape-adjacent positions, and as bare atoms
_WORDS = ["make", "test", "ok", "x=1", "INFO", "ERROR", "WARN", "DEBUG",
          "path/to", "2024-03-01 10:20:30", "2024-03-01T10:20:30.5",
          "a", "~", "$", "@", ";", "end.",
          "caf\xe9", "\xa0", "\xff\xfe", "na\xefve"]

_SGR = ["\x1b[0m", "\x1b[m", "\x1b[1m", "\x1b[31m", "\x1b[31;44m",
        "\x1b[38;5;208m", "\x1b[48;2;10;20;30m", "\x1b[22m", "\x1b[24m",
        "\x1b[27m", "\x1b[39m", "\x1b[49m", "\x1b[7;4m", "\x1b[99m"]

_EDITS = ["\x08", "\x08\x08", "\r", "\x1b[K", "\x1b[1K", "\x1b[2K",
          "\x1b[3C", "\x1b[2D", "\x1b[1P", "\x1b[2X", "\x1b[4@",
          "\x1b[5G", "\x1b[10C",
          # multi-param / malformed params on editing finals: replayed
          # as the leading numeric parameter + one warning, never a
          # ValueError (ADVICE r3: int(par) crash on CSI 1;5C)
          "\x1b[1;5C", "\x1b[;D", "\x1b[1:3P", "\x1b[2;0K", "\x1b[?1;2K",
          # ill-formed par (stray private marker mid-params): stripped
          # and histogrammed, but never replayed by either twin
          "\x1b[1<2C"]

# dangling ESC: ESC followed by a byte that begins no sequence (ESC,
# DEL, C1, GR) — stripped output retains the ESC, the line-replay layer
# drops it (ADVICE r3 high: the edit-hint fast path must not keep it)
_DANGLING = ["\x1b\x85", "\x1b\x7f", "\x1b\xff", "\x1b\x1b[0m",
             "\x1b\x9b0m"]

_OTHER_SEQ = ["\x1b]0;win title\x07", "\x1b]2;t\x1b\\", "\x1b(B",
              "\x1b=", "\x1b>", "\x1bPq#0;1;2~~\x1b\\", "\x9b31m",
              "\x9b0m", "\x85", "\x84", "\x9d0;c1 title\x07",
              "\x1b[?25h", "\x1b[?25l", "\x1b[6n", "\x1b[0c",
              # A8 set-collection margins: DCS with 8-bit introducer /
              # ST terminator, DCS with params+intermediates before the
              # final, headerless DCS (no final -> nothing collected),
              # SOS/PM/APC strings (never collected), OSC with ST,
              # OSC with GR payload
              "\x90q8bit\x9c", "\x1bP1;2 !q data\x1b\\", "\x1bP;;\x1b\\",
              "\x1bXsos str\x1b\\", "\x1b^pm\x9c", "\x9fapc\x1b\\",
              "\x1b]52;c;Zm9v\x9c", "\x1b]0;caf\xe9 \xa0title\x07",
              # P8 app-mode material: adjacent pairs (enter/exit),
              # bare halves, near-miss (text between), \x9b form, DA
              "\x1b[?1h\x1b=", "\x1b[?1l\x1b>", "\x1b[?1h", "\x1b[?1l",
              "\x1b[?1hX\x1b=", "\x9b?1h\x1b=", "\x1b[c", "\x1b[>c"]

_TRUNC = ["", "\x1b", "\x1b[", "\x1b[12", "\x1b]0;half", "\x1bP partial",
          "\x1b[38;5"]


@st.composite
def _prompt_line(draw):
    cmd_bits = draw(st.lists(
        st.one_of(st.sampled_from(_WORDS), st.sampled_from(_EDITS),
                  st.sampled_from(_SGR), st.just(" ")),
        max_size=8))
    return "alice@box:~/w$ " + "".join(cmd_bits) + "\r\n"


@st.composite
def _mingw_block(draw):
    """Two-line MINGW64 prompt material (P6 OSC-title correlation,
    terminalparser.py:101-141): the header only counts when the
    PREVIOUS line carried an OSC 0 title — armed, unarmed (scrollback
    redraw, must NOT count) and non-matching-header variants all
    compose with everything else."""
    armed = draw(st.booleans())
    osc_line = "\x1b]0;MINGW64:/c/proj\x07\r\n" if armed else "plain\r\n"
    hdr_user = draw(st.sampled_from(["bob", "a.b", "Bad_User"]))
    header = f"{hdr_user}@HOST-1 MINGW64 ~/proj (master)\r\n"
    cmd_bits = draw(st.lists(
        st.one_of(st.sampled_from(_WORDS), st.sampled_from(_EDITS),
                  st.sampled_from(_SGR), st.just(" ")),
        max_size=5))
    return osc_line + header + "$ " + "".join(cmd_bits) + "\r\n"


@st.composite
def _vim_span(draw):
    body = " ".join(draw(st.lists(st.sampled_from(_WORDS), max_size=5)))
    multi = draw(st.booleans())
    if multi:
        return ansi.VIM_START_MARK + body + "\r\n~\r\n" + \
            ansi.VIM_END_MARK + "\r\n"
    return ansi.VIM_START_MARK + body + ansi.VIM_END_MARK + "\r\n"


_ATOM = st.one_of(
    st.sampled_from(_WORDS),
    st.just(" "),
    st.just("\n"),
    st.just("\r\n"),
    st.just("\t"),
    # stray C0 controls (BEL, VT, FF, SUB): data in the stripped
    # stream, DROPPED by the line-replay layer — exercises the
    # fast/slow path split in build_line_counted
    st.sampled_from(["\x07", "\x0b", "\x0c", "\x1a"]),
    st.sampled_from(_SGR),
    st.sampled_from(_OTHER_SEQ),
    st.sampled_from(_EDITS),
    st.sampled_from(_DANGLING),
    _prompt_line(),
    _mingw_block(),
    _vim_span(),
)


@settings(max_examples=250, deadline=None)
@given(st.lists(_ATOM, max_size=30), st.sampled_from(_TRUNC))
def test_engine_eq_oracle_fuzz(atoms, tail):
    text = "".join(atoms) + tail
    e = ansi.parse_doc(text)
    o = oracle.oracle_parse_doc(text)
    for k in KEYS:
        assert e[k] == o[k], (k, repr(text))
    # A8 twins: regex set-extractors vs the FSM's collected lists
    assert extract_sets.os_commands(text) == o["os_commands"], repr(text)
    assert extract_sets.dcs_strings(text) == o["dcs_strings"], repr(text)
