"""Pure-Python char-at-a-time oracle for the parse semantics.

Used ONLY by tests and by the correctness gate: a clean-room,
deliberately *different* implementation style (explicit FSM over single
characters, string-based line editing) from the engine's vectorized
regex passes (``functions/ansi.py``). The two must agree; the oracle is
itself validated against the reference's golden transcripts
(``/root/reference/test/resources/result_*.txt``, see
tests/test_goldens.py).

State model follows the reference's VT500 parser states
(vtparser.py:8-25) collapsed to the five that matter for stripping and
event classification: GROUND, ESCAPE, CSI, OSC, DCS.

Known, documented divergence from the engine (never produced by
datagen, never tested): an ESC embedded inside an OSC/DCS body that is
not the start of an ST terminator.
"""
from __future__ import annotations

GROUND, ESCAPE, CSI, OSC, DCS = 0, 1, 2, 3, 4

_SEVERITIES = ("DEBUG", "INFO", "WARN", "ERROR")


class _Event:
    __slots__ = ("kind", "priv", "par", "interm", "final", "osc_sel", "c1")

    def __init__(self, kind, priv="", par="", interm="", final="",
                 osc_sel="", c1=-1):
        self.kind = kind
        self.priv = priv
        self.par = par
        self.interm = interm
        self.final = final
        self.osc_sel = osc_sel
        self.c1 = c1

    def key(self) -> str:
        if self.kind == "CSI":
            return f"CSI:{self.priv}{self.par}{self.final}"
        if self.kind == "OSC":
            return f"OSC:{self.osc_sel}"
        if self.kind == "DCS":
            return "DCS"
        if self.kind == "ESC":
            return f"ESC:{self.interm}{self.final}"
        return f"C1:{self.c1:02x}"


class _VisibleLine:
    """String-based editing replay (intentionally not the engine's
    list-based LineBuilder). ``warn`` counts edit-bound violations
    (F5): BS clamped at column 0, CSI D clamped at column 0, and the
    CSI 1K / 2K forms the reference refuses."""

    def __init__(self) -> None:
        self.s = ""
        self.col = 0
        self.warn = 0

    def put(self, ch: str) -> None:
        o = ord(ch)
        if o >= 0x20 or o == 0x09:
            if self.col >= len(self.s):
                self.s += ch
            else:
                self.s = self.s[: self.col] + ch + self.s[self.col + 1:]
            self.col += 1
        elif o == 0x08:
            if self.col > 0:
                self.col -= 1
            else:
                self.warn += 1
        elif o == 0x0D:
            self.col = 0

    def csi(self, par: str, final: str) -> None:
        if final not in "@CDGKPX":
            return  # not a line-editing op
        if par and not par.isdigit():
            # multi-param / malformed param on an editing op: replay the
            # leading numeric parameter and count a warning — mirrors
            # LineBuilder.csi (one bad row must not throw).
            self.warn += 1
            head = ""
            for ch in par:
                if not ch.isdigit():
                    break
                head += ch
            par = head
        c, s = self.col, self.s
        if final == "@":
            self.s = s[:c] + " " * (int(par) if par else 1) + s[c:]
        elif final == "C":
            n = int(par) if par else 1
            # one space appended per step at/past EOL (reference
            # terminal2html.py:480-488), NOT a pad of the whole
            # cursor gap — the two differ when col has drifted past
            # the end via a prior G
            self.s = s + " " * max(0, n - max(0, len(s) - c))
            self.col = c + n
        elif final == "D":
            nd = int(par) if par else 1
            if nd > c:
                self.warn += 1
            self.col = max(0, c - nd)
        elif final == "K":
            if par in ("", "0"):
                self.s = s[:c]
            elif par == "1":
                self.warn += 1
                k = min(c + 1, len(s))
                self.s = " " * k + s[k:]
            elif par == "2":
                self.warn += 1
                self.s = " " * len(s)
        elif final == "P":
            n = int(par) if par else 1
            self.s = s[:c] + s[c + n:]
        elif final == "X":
            n = int(par) if par else 1
            end = min(c + n, len(s))
            if end > c:
                self.s = s[:c] + " " * (end - c) + s[end:]
        elif final == "G":
            col = int(par) if par else 1
            self.col = max(0, col - 1)


def _ascii_user_ch(ch: str) -> bool:
    """User-field charset — ASCII only, like the reference's regex
    class ``[a-z0-9._-]`` (terminalparser.py:27-28); Unicode
    ``str.islower()`` would admit GR-range letters the regex refuses."""
    return ("a" <= ch <= "z") or ("0" <= ch <= "9") or ch in "._-"


def _ascii_host_ch(ch: str) -> bool:
    """Host-field charset — ASCII ``[-a-zA-Z0-9]`` only."""
    return ("a" <= ch <= "z") or ("A" <= ch <= "Z") \
        or ("0" <= ch <= "9") or ch == "-"


def _is_mingw_header(line: str) -> bool:
    """Manual check for `user@host MINGW64 cwd` two-line prompt headers."""
    if " MINGW64 " not in line or not line or not (
            "a" <= line[0] <= "z" or line[0] == "."):
        return False
    i, n = 0, len(line)
    while i < n and _ascii_user_ch(line[i]):
        i += 1
    if i == 0 or i >= n or line[i] != "@":
        return False
    i += 1
    h0 = i
    while i < n and _ascii_host_ch(line[i]):
        i += 1
    if i == h0 or not line[i:].startswith(" MINGW64 "):
        return False
    rest = line[i + 9:]
    # cwd: `~` only leading, non-empty, then only trailing whitespace
    # (reference header cwd grammar, terminalparser.py:27)
    j, m = 0, len(rest)
    if j < m and rest[j] == "~":
        j += 1
    while j < m and (rest[j].isalnum() or rest[j] in "-./_ ()"):
        j += 1
    if j == 0:
        return False
    return all(ch in " \r\t" for ch in rest[j:])


def _split_prompt(line: str):
    """Manual (regex-free) prompt recognition: `user@host:cwd$ `.

    Returns (prompt_len, command) or None.
    """
    if not line or not ("a" <= line[0] <= "z"):
        return None
    i, n = 0, len(line)
    while i < n and _ascii_user_ch(line[i]):
        i += 1
    if i == 0 or i >= n or line[i] != "@":
        return None
    i += 1
    h0 = i
    while i < n and _ascii_host_ch(line[i]):
        i += 1
    if i == h0 or i >= n or line[i] != ":":
        return None
    i += 1
    # cwd: `~` only as the leading char, at least one char total
    # (reference cwd grammar `(~?[-.\w/ ]+|~)`, terminalparser.py:28)
    c0 = i
    if i < n and line[i] == "~":
        i += 1
    while i < n and (line[i].isalnum() or line[i] in "-./_ "):
        i += 1
    if i == c0:
        return None
    if i >= n or line[i] != "$" or i + 1 >= n or line[i + 1] != " ":
        return None
    return i + 2, line[i + 2:]


def _dcs_data_string(body: str) -> str | None:
    """Data-string part of a DCS body: the chars after the header's
    final character (params ``0-?``, intermediates ``SP-/``, one final
    ``@-~``), or None when no final ever arrived (the reference's hook
    action never fired, so its unhook collects nothing)."""
    i, n = 0, len(body)
    while i < n and "0" <= body[i] <= "?":
        i += 1
    while i < n and " " <= body[i] <= "/":
        i += 1
    if i < n and "@" <= body[i] <= "~":
        return body[i + 1:]
    return None


class OracleParser:
    """Feed a whole decoded transcript; read columns off the attributes."""

    def __init__(self) -> None:
        self.state = GROUND
        self.buf = ""          # collected sequence body after the introducer
        self.priv = ""
        self.par = ""
        self.interm = ""
        self.stripped: list[str] = []
        self.events: list[_Event] = []
        # A8 distinct-string sets (reference vtparser.py:714 unhook
        # collects device_control_strings, :738 osc_end collects
        # os_commands); kept as ordered lists here — set semantics are
        # the aggregation layer's job
        self.os_commands: list[str] = []
        self.dcs_strings: list[str] = []
        self._dcs_is_p = False  # true DCS (ESC P / 0x90) vs SOS/PM/APC
        # line layer
        self.vline = _VisibleLine()
        self.in_vim = False
        self.n_vim = 0
        self.prompt_count = 0
        self.cmd_lines: list[str] = []
        self.mingw_imminent = False
        self.osc_armed = False
        self.line_had_osc0 = False
        self._osc_escape_pending = False
        # P8 app-mode FSM (absolute char offsets; see functions/ansi.py
        # classify_and_strip docstring for the reference mapping)
        self._nread = 0
        self._ckm_set = -10
        self._ckm_reset = -10
        self._app_active = False
        self.n_app_mode = 0
        # F5 edit-warning accounting over replay-qualifying lines
        self.n_edit_warnings = 0
        self._rawline: list[str] = []

    # --- sequence layer -------------------------------------------------
    def feed(self, text: str) -> None:
        for ch in text:
            self._input(ch)
        self._eof()

    def _input(self, ch: str) -> None:
        self._nread += 1
        self._rawline.append(ch)
        st = self.state
        if st == GROUND:
            self._ground(ch)
        elif st == ESCAPE:
            self._escape(ch)
        elif st == CSI:
            self._csi(ch)
        elif st == OSC:
            self._osc(ch)
        else:
            self._dcs(ch)

    def _ground(self, ch: str) -> None:
        o = ord(ch)
        if o == 0x1B:
            self.state = ESCAPE
            self.buf = ""
        elif 0x80 <= o <= 0x9F:
            if o == 0x9B:
                self._enter_csi()
            elif o == 0x9D:
                self.state = OSC
                self.buf = ""
            elif o in (0x90, 0x98, 0x9E, 0x9F):
                self.state = DCS
                self.buf = ""
                self._dcs_is_p = o == 0x90
            else:
                self.events.append(_Event("C1", c1=o))
        else:
            self._emit(ch)

    def _escape(self, ch: str) -> None:
        o = ord(ch)
        if ch == "[":
            self._enter_csi()
        elif ch == "]":
            self.state = OSC
            self.buf = ""
        elif ch in "PX^_":
            self.state = DCS
            self.buf = ""
            self._dcs_is_p = ch == "P"
        elif 0x20 <= o <= 0x2F:
            self.buf += ch
        elif 0x30 <= o <= 0x7E:
            self.events.append(_Event("ESC", interm=self.buf, final=ch))
            if not self.buf:
                # DECKPAM/DECKPNM adjacency: this ESC started at
                # _nread - 2, exactly where the DECCKM set/reset ended
                if ch == "=":
                    if self._ckm_set == self._nread - 2 \
                            and not self._app_active:
                        self._app_active = True
                        self.n_app_mode += 1
                elif ch == ">":
                    if self._ckm_reset == self._nread - 2 \
                            and self._app_active:
                        self._app_active = False
            self.state = GROUND
        else:
            # invalid: the ESC did not begin a sequence; ESC and any
            # collected intermediates are data (matches the engine regex)
            self._emit("\x1b")
            for c in self.buf:
                self._emit(c)
            self.state = GROUND
            self._ground(ch)

    def _enter_csi(self) -> None:
        self.state = CSI
        self.priv = self.par = self.interm = ""
        self._csi_phase = 0  # 0 = params, 1 = intermediates

    def _csi(self, ch: str) -> None:
        o = ord(ch)
        if 0x40 <= o <= 0x7E:
            ev = _Event("CSI", priv=self.priv, par=self.par,
                        interm=self.interm, final=ch)
            self.events.append(ev)
            if ev.priv == "?" and ev.par == "1" and ev.interm == "":
                if ch == "h":
                    self._ckm_set = self._nread
                elif ch == "l":
                    self._ckm_reset = self._nread
            self.state = GROUND
            self._csi_event(ev)
        elif ch in "<=>?" and not self.par and not self.interm \
                and not self.priv and self._csi_phase == 0:
            self.priv = ch
        elif 0x30 <= o <= 0x3F and self._csi_phase == 0:
            self.par += ch
        elif 0x20 <= o <= 0x2F:
            self._csi_phase = 1
            self.interm += ch
        else:
            # invalid char: introducer is stripped, body re-emitted as data
            for c in self.priv + self.par + self.interm:
                self._emit(c)
            self.state = GROUND
            self._ground(ch)

    def _osc(self, ch: str) -> None:
        if self._osc_escape_pending:
            self._osc_escape_pending = False
            if ch == "\\":
                self._end_osc()
                return
            self.buf += "\x1b" + ch  # divergence case, documented
            return
        if ch == "\x07" or ord(ch) == 0x9C:
            self._end_osc()
        elif ch == "\x1b":
            self._osc_escape_pending = True
        else:
            self.buf += ch

    def _end_osc(self) -> None:
        sel = self.buf.split(";", 1)[0]
        self.events.append(_Event("OSC", osc_sel=sel))
        # A8: the reference's osc_put/osc_end collect the FULL control
        # string (vtparser.py:729-738), terminator excluded
        self.os_commands.append(self.buf)
        if sel == "0":
            self.line_had_osc0 = True
        self.state = GROUND

    def _end_dcs(self) -> None:
        self.events.append(_Event("DCS"))
        if self._dcs_is_p:
            # A8: the reference collects the DATA string only — chars
            # after the header's final (hook fires at the final,
            # vtparser.py:687-703; put collects after it, unhook adds
            # the string, :704-714). A DCS terminated before any final
            # char never hooks, so nothing is collected. SOS/PM/APC
            # (X ^ _ introducers) are ignore-state strings in the
            # reference, never collected.
            data = _dcs_data_string(self.buf)
            if data is not None:
                self.dcs_strings.append(data)
        self.state = GROUND

    def _dcs(self, ch: str) -> None:
        if self._osc_escape_pending:
            self._osc_escape_pending = False
            if ch == "\\":
                self._end_dcs()
                return
            self.buf += "\x1b" + ch
            return
        if ord(ch) == 0x9C:
            self._end_dcs()
        elif ch == "\x1b":
            self._osc_escape_pending = True
        else:
            self.buf += ch

    def _eof(self) -> None:
        # truncated sequence at end-of-doc: dropped entirely
        if self.state == GROUND:
            self._finish_line(final=True)
        else:
            self.state = GROUND
            self._finish_line(final=True)

    # --- line layer -------------------------------------------------------
    def _emit(self, ch: str) -> None:
        self.stripped.append(ch)
        if ch == "\n":
            self._finish_line()
        elif not self.in_vim:
            self.vline.put(ch)

    def _csi_event(self, ev: _Event) -> None:
        if ev.final == "t" and ev.par == "22;0;0":
            if not self.in_vim:
                self.in_vim = True
                self.n_vim += 1
                self.vline = _VisibleLine()
                self._rawline = []  # engine skips the pre-marker text
                self.mingw_imminent = False
                self.osc_armed = False
                self.line_had_osc0 = False
        elif ev.final == "t" and ev.par == "23;0;0":
            if self.in_vim:
                # prompt may share the line with the end marker
                # (RE_PROMPT_INLINE): remainder is a fresh visible line
                self.in_vim = False
                self.vline = _VisibleLine()
                self._rawline = []  # engine replays only the remainder
        elif not self.in_vim:
            # The engine only replays a CSI whose record re-parses under
            # CSI_PARTS_RE (par chars limited to [0-9;:]); a par that
            # swallowed stray private markers (e.g. "1?2") is stripped
            # but never replayed there, so skip it here too.
            if all(c.isdigit() or c in ";:" for c in ev.par):
                self.vline.csi(ev.par, ev.final)

    def _finish_line(self, final: bool = False) -> None:
        raw = "".join(self._rawline)
        self._rawline = []
        if final and not raw:
            return  # text ended in "\n": engine's trailing "" split
            # element is a no-op, so is this. (Keyed on the RAW line —
            # the engine processes any non-empty raw final line even
            # when its visible text replays to empty, and its F5
            # warnings still count.)
        if self.in_vim:
            self.vline = _VisibleLine()
            self.line_had_osc0 = False
            return
        line = self.vline.s
        was_imminent, self.mingw_imminent = self.mingw_imminent, False
        was_armed, self.osc_armed = self.osc_armed, self.line_had_osc0
        self.line_had_osc0 = False
        # F5 warning accounting mirrors the engine's replay domain:
        # lines it builds AND counts — any line whose RAW text contains
        # '$', or a MINGW64 header line while OSC-armed that matched
        is_mingw = ("MINGW64" in raw and was_armed
                    and _is_mingw_header(line))
        if "$" in raw or is_mingw:
            self.n_edit_warnings += self.vline.warn
        if was_armed and _is_mingw_header(line):
            self.mingw_imminent = True
        elif was_imminent and line.startswith("$"):
            self.prompt_count += 1
            if line.startswith("$ ") and len(line) > 2:
                self.cmd_lines.append(line[2:])
        else:
            sp = _split_prompt(line)
            if sp:
                self.prompt_count += 1
                if sp[1]:
                    self.cmd_lines.append(sp[1])
        self.vline = _VisibleLine()


def oracle_parse_doc(text: str) -> dict:
    """Parse one transcript -> the same column dict as
    functions.ansi.parse_doc."""
    p = OracleParser()
    p.feed(text)
    stripped = "".join(p.stripped)

    hist: dict[str, int] = {}
    n = {"CSI": 0, "OSC": 0, "ESC": 0, "DCS": 0, "C1": 0}
    n_sgr = 0
    n_devstat = 0
    for ev in p.events:
        k = ev.key()
        hist[k] = hist.get(k, 0) + 1
        n[ev.kind] += 1
        if ev.kind == "CSI":
            if ev.final == "m":
                n_sgr += 1
            elif ev.final == "n" or (ev.final == "c"
                                     and ev.par in ("", "0")):
                n_devstat += 1  # F2: would trigger a terminal response

    sev_counts = {s: 0 for s in _SEVERITIES}
    i = 0
    words = _word_scan(stripped)
    for w in words:
        if w in sev_counts:
            sev_counts[w] += 1
    severity = None
    for s in ("ERROR", "WARN", "INFO", "DEBUG"):
        if sev_counts[s]:
            severity = s
            break
    tss = _ts_scan(stripped)

    return {
        "stripped": stripped,
        "seq_hist": hist,
        "n_events": len(p.events),
        "n_csi": n["CSI"],
        "n_osc": n["OSC"],
        "n_esc": n["ESC"],
        "n_dcs": n["DCS"],
        "n_c1": n["C1"],
        "n_sgr": n_sgr,
        "severity": severity,
        "n_debug": sev_counts["DEBUG"],
        "n_info": sev_counts["INFO"],
        "n_warn": sev_counts["WARN"],
        "n_error": sev_counts["ERROR"],
        "ts_min": min(tss) if tss else None,
        "ts_max": max(tss) if tss else None,
        "prompt_count": p.prompt_count,
        "cmd_lines": p.cmd_lines,
        "n_vim": p.n_vim,
        "n_unparsed": sum(1 for c in stripped
                          if c == "\x1b" or c == "\ufffd"),
        "n_app_mode": p.n_app_mode,
        "n_devstat": n_devstat,
        "n_edit_warnings": p.n_edit_warnings,
        "os_commands": list(p.os_commands),
        "dcs_strings": list(p.dcs_strings),
    }


def _word_scan(text: str) -> list[str]:
    """Word-boundary scan without regex (independent of the engine)."""
    out, cur = [], []
    for ch in text:
        if ch.isalnum() or ch == "_":
            cur.append(ch)
        else:
            if cur:
                out.append("".join(cur))
                cur = []
    if cur:
        out.append("".join(cur))
    return out


def _ts_scan(text: str) -> list[str]:
    """Find ISO timestamps `YYYY-MM-DD[T ]hh:mm:ss(.frac)?` manually."""
    out = []
    n = len(text)
    i = 0
    while i + 19 <= n:
        c = text[i]
        if c.isdigit():
            seg = text[i : i + 19]
            if (seg[:4].isdigit() and seg[4] == "-" and seg[5:7].isdigit()
                    and seg[7] == "-" and seg[8:10].isdigit()
                    and seg[10] in "T " and seg[11:13].isdigit()
                    and seg[13] == ":" and seg[14:16].isdigit()
                    and seg[16] == ":" and seg[17:19].isdigit()):
                j = i + 19
                if j < n and text[j] == ".":
                    k = j + 1
                    while k < n and text[k].isdigit():
                        k += 1
                    if k > j + 1:
                        j = k
                out.append(text[i:j])
                i = j
                continue
        i += 1
    return out
