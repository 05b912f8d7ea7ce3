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
