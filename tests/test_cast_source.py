"""Asciinema cast source: version gate, frame parse, re-timing
quantization, and the two-stream hop interleave vs a dual-cursor
Python simulation of the reference's twebber merge."""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def cast_lines(spark):
    from console_log_parser_spark.sources import asciinema
    ids = spark.range(0, 30).select(F.col("id").alias("doc_id"))
    return asciinema.synth_cast_lines(ids)


def test_version_gate_drops_invalid_casts(spark):
    from console_log_parser_spark.sources import asciinema
    lines = spark.createDataFrame(
        [(1, -1, '{"version": 2, "width": 80, "height": 24, '
                 '"timestamp": 1700000000}'),
         (1, 0, '[0.0, "o", "ok"]'),
         (2, -1, '{"version": 1, "width": 80, "height": 24, '
                 '"timestamp": 1700000000}'),
         (2, 0, '[0.0, "o", "old format"]'),
         (3, 0, '[0.0, "o", "headerless"]')],
        "doc_id long, line_no int, line string")
    hd = asciinema.headers(lines).collect()
    assert {r["doc_id"]: r["valid"] for r in hd} == {1: True, 2: False}
    fr = asciinema.frames(lines)
    assert [r["doc_id"] for r in fr.collect()] == [1]


def test_frames_parse_and_numbering(cast_lines):
    from console_log_parser_spark.sources import asciinema
    fr = asciinema.frames(cast_lines)
    rows = fr.filter(F.col("doc_id") == 7).orderBy("frame_no").collect()
    assert len(rows) == 5 + 7 % 20
    assert [r["frame_no"] for r in rows] == list(range(len(rows)))
    assert all(r["kind"] == "o" for r in rows)
    assert rows[3]["data"] == "frame 3 of doc 7\r\n"
    step = (7 % 100 + 1) * 0.05
    assert rows[1]["ts"] == pytest.approx(step, abs=1e-9)


def test_retime_quantized_buckets(cast_lines):
    from console_log_parser_spark.sources import asciinema
    fr = asciinema.frames(cast_lines)
    q = asciinema.retime_quantized(fr)
    got = {r["doc_id"]: r["q"] for r in
           q.select("doc_id", "q").distinct().collect()}
    for doc_id, bucket in got.items():
        s = (doc_id % 100 + 1) * 0.05
        expected = 0.03
        for b in asciinema.QUANT_BUCKETS:
            if s >= b:
                expected = b
                break
        assert bucket == expected, (doc_id, s)


def test_hops_match_dual_cursor_simulation(spark, cast_lines):
    from console_log_parser_spark.sources import asciinema
    fr = asciinema.frames(cast_lines)
    left = fr.filter(F.col("doc_id") % 2 == 0)
    right = fr.filter(F.col("doc_id") % 2 == 1)
    h = asciinema.hops(left, right)
    n_hops = h.filter("is_hop").count()

    # brute-force simulation: merge all frames by (ts, side, doc_id),
    # count side switches — the reference's dual-cursor walk produces
    # exactly this sequence for globally time-sorted streams
    def side_rows(df, side):
        return [(r["ts"], side, r["doc_id"])
                for r in df.select("ts", "doc_id").collect()]

    merged = sorted(side_rows(left, "left") + side_rows(right, "right"))
    switches = sum(1 for a, b in zip(merged, merged[1:]) if a[1] != b[1])
    assert n_hops == switches


def test_vim_sessions_match_reference_retiming(spark):
    """vim_sessions must reproduce the reference VimRecording
    frame_time walk (asciinema2html.py:226-247): rel_k = rel_{k-1} +
    quantize(ts_k - ts_{k-1}), rebased to the span start."""
    from console_log_parser_spark.sources import asciinema

    ids = spark.createDataFrame([(i,) for i in range(40)],
                                "doc_id long")
    fr = asciinema.frames(asciinema.synth_cast_lines(ids))
    got = {}
    for r in asciinema.vim_sessions(fr).collect():
        got.setdefault((r["doc_id"], r["session_id"]), []).append(
            (r["frame_no"], r["rel_ts_q4"]))

    def quantize(ts):
        for q in (4.0, 2.0, 1.0, 0.5, 0.3, 0.18, 0.1, 0.03):
            if ts >= q:
                return q
        return ts

    want = {}
    for d in range(40):
        if d % 4 != 2:
            continue
        n = 5 + d % 20
        step = (d % 100 + 1) * 0.05
        ts = [round(i * step, 4) for i in range(n)]
        s, e = 1, min(n - 1, 3 + d % 3)
        rel = 0
        frames = []
        last = ts[s]
        for i in range(s, e + 1):
            dt = round(ts[i] - last, 4)
            rel += int(round(10000 * quantize(dt)))
            last = ts[i]
            frames.append((i, rel))
        want[(d, 1)] = frames
    for k in want:
        assert sorted(got[k]) == want[k], (k, got.get(k), want[k])
    assert set(got) == set(want)


def test_non_vim_docs_have_no_sessions(spark):
    from pyspark.sql import functions as F

    from console_log_parser_spark.sources import asciinema
    ids = spark.createDataFrame([(i,) for i in range(20)],
                                "doc_id long")
    fr = asciinema.frames(asciinema.synth_cast_lines(ids))
    docs = {r["doc_id"] for r in
            asciinema.vim_sessions(fr).select("doc_id")
            .distinct().collect()}
    assert docs == {d for d in range(20) if d % 4 == 2}


def test_hop_target_renumber_matches_reference_walk(spark):
    """hop_target_renumber == HopTarget.get_target_cmd
    (terminal2html.py:16-38): cmdnum = hop - |{filter cmd <= hop}|."""
    from console_log_parser_spark.operators.enrich import (
        hop_target_renumber)

    suppress = {"a": [2, 5, 6], "b": [1], "c": []}
    n_cmds = 9
    rows = [(doc, no, no in sup) for doc, sup in suppress.items()
            for no in range(1, n_cmds + 1)]
    commands = spark.createDataFrame(
        rows, "doc_id string, cmd_no int, suppressed boolean")
    hops = spark.createDataFrame(
        [(d, t) for d in suppress for t in (1, 2, 5, 7, 9)],
        "doc_id string, cmd_no int")
    got = {(r["doc_id"], r["cmd_no"]): r["renumbered"]
           for r in hop_target_renumber(commands, hops).collect()}

    def ref_walk(hop, filt):  # terminal2html.py:33-38
        cmdnum = hop
        for cmd in filt:
            if hop < cmd:
                break
            cmdnum -= 1
        return cmdnum

    for d, filt in suppress.items():
        for t in (1, 2, 5, 7, 9):
            assert got[(d, t)] == ref_walk(t, sorted(filt)), (d, t)
