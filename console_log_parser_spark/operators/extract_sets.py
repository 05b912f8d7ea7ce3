"""A8 distinct-string-set extractor columns.

The reference's parser accumulates two string SETS while it runs:
``os_commands`` — every OSC control string (vtparser.py:729-738,
``osc_put`` collects the chars, ``osc_end`` adds the string) — and
``device_control_strings`` — every DCS *data* string, i.e. the chars
after the DCS header's final character (vtparser.py:687-714: ``hook``
fires at the final, ``put`` collects after it, ``unhook`` adds the
string; a DCS terminated before any final never hooks and collects
nothing; SOS/PM/APC strings are ignore-state, never collected).

Engine form: two :class:`~..operators.parse.Extractor` plugins that
emit ``array<string>`` columns per document inside the existing
single MapInArrow parse stage — opt-in, so the hot path pays nothing
unless a query asks for them. Set semantics (distinct, per sink or
global) are then ordinary ``explode`` + ``count_distinct`` /
``collect_set`` aggregates; at 10^12 rows the same plan swaps the
exact distinct for ``approx_count_distinct``.

The independent oracle twin is ``oracle.OracleParser.os_commands`` /
``.dcs_strings`` (char-at-a-time FSM); tests reconcile both on
synthetic OSC/DCS margins the corpus itself doesn't exercise.
"""
from __future__ import annotations

import re

import pyarrow as pa

from ..functions import ansi
from .parse import Extractor

# Per-sequence body parsers, applied with fullmatch() to sequences the
# MASTER alternation (ansi.ANSI_RE) already isolated — a standalone
# finditer of these patterns could mis-tokenize a sequence nested
# inside another sequence's body (e.g. a 0x90 inside an OSC payload),
# which the left-to-right master scan structurally cannot.
# Truncated-at-EOD sequences don't fullmatch -> never collected, same
# as the FSM never dispatching them.
_OSC_BODY_RE = re.compile(
    r"(?:\x1b\]|\x9d)([^\x07\x1b\x9c]*)(?:\x07|\x1b\\|\x9c)", re.DOTALL)

# Complete true-DCS (ESC P / 0x90 only): header params + intermediates
# + final, then the data string up to the terminator. A DCS whose body
# has no final char matches the no-header alternative: no collection.
_DCS_DATA_RE = re.compile(
    r"(?:\x1bP|\x90)"
    r"(?:[0-?]*[ -/]*(?P<final>[@-~])(?P<data>[^\x1b\x9c]*)|[^\x1b\x9c]*)"
    r"(?:\x1b\\|\x9c)", re.DOTALL)


def os_commands(text: str) -> list[str]:
    """All OSC control strings of one decoded transcript, in order."""
    out = []
    for m in ansi.ANSI_RE.finditer(text):
        mo = _OSC_BODY_RE.fullmatch(m.group(0))
        if mo:
            out.append(mo.group(1))
    return out


def dcs_strings(text: str) -> list[str]:
    """All DCS data strings of one decoded transcript, in order."""
    out = []
    for m in ansi.ANSI_RE.finditer(text):
        md = _DCS_DATA_RE.fullmatch(m.group(0))
        if md and md.group("final") is not None:
            out.append(md.group("data"))
    return out


def os_commands_extractor() -> Extractor:
    return Extractor("os_commands", "array<string>",
                     pa.list_(pa.string()),
                     lambda text, _parsed: os_commands(text))


def dcs_strings_extractor() -> Extractor:
    return Extractor("dcs_strings", "array<string>",
                     pa.list_(pa.string()),
                     lambda text, _parsed: dcs_strings(text))

