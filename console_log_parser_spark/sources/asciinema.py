"""Asciinema v2 cast source: JSONL header + frame parsing as DataFrame
ops (reference: asciinema2html.py:281-308, 348-373; twebber.py:22-105).

A cast file is one JSON header line ``{"version":2,"width":..,
"height":..,"timestamp":..}`` followed by frame lines ``[ts,"o",data]``.
Here a corpus of casts is a table ``(doc_id, line_no, line)`` — one row
per JSONL line — and everything is built-in expressions (``from_json``,
``get_json_object``, window functions): no Python in the parse at all.

Operators:
- ``headers`` / ``frames``: split + validate (the version-2 gate is
  reference F4, asciinema2html.py:353-355);
- ``retime_quantized``: P12 frame re-timing — ``lag(ts)`` deltas
  quantized to the reference's bucket list (asciinema2html.py:226-243);
- ``hops``: J4 two-stream interleave — union both sides, order by
  absolute time, a hop is every side switch (twebber.py:26-105 replays
  a dual-cursor merge; ordered-window ``lag`` is the shuffle-light
  Spark equivalent);
- ``synth_cast_lines``: deterministic cast corpus derived from numeric
  doc ids with closed-form timing (so SQL oracles can verify the full
  parse round trip without a JSON parser).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# reference quantize_ts buckets (asciinema2html.py:236-243)
QUANT_BUCKETS = (4.0, 2.0, 1.0, 0.5, 0.3, 0.18, 0.1, 0.03)

FRAME_SCHEMA = "array<string>"


def headers(cast_lines: DataFrame) -> DataFrame:
    """Header rows with the version gate applied (invalid casts are
    routed out, not crashed on — one bad file must not kill the job)."""
    hdr = cast_lines.filter(F.col("line").startswith("{"))
    return hdr.select(
        "doc_id",
        F.get_json_object("line", "$.version").cast("int").alias("version"),
        F.get_json_object("line", "$.width").cast("int").alias("width"),
        F.get_json_object("line", "$.height").cast("int").alias("height"),
        F.get_json_object("line", "$.timestamp").cast("double")
        .alias("start_ts"),
    ).withColumn("valid", F.col("version") == 2)


def frames(cast_lines: DataFrame) -> DataFrame:
    """Frame rows ``(doc_id, frame_no, ts, kind, data)``; only frames of
    version-2 casts survive (broadcast semi-join against valid headers).
    """
    valid = headers(cast_lines).filter("valid").select("doc_id")
    fr = (cast_lines.filter(F.col("line").startswith("["))
          .join(F.broadcast(valid), "doc_id", "left_semi"))
    arr = F.from_json("line", FRAME_SCHEMA)
    w = Window.partitionBy("doc_id").orderBy("line_no")
    return (fr.select(
        "doc_id",
        F.col("line_no"),
        F.element_at(arr, 1).cast("double").alias("ts"),
        F.element_at(arr, 2).alias("kind"),
        F.element_at(arr, 3).alias("data"))
        .withColumn("frame_no", F.row_number().over(w) - F.lit(1))
        .drop("line_no"))


def quantize_expr(col):
    """Largest reference bucket <= value, else the RAW value — the
    exact Spark expression form of quantize_ts (asciinema2html.py:236:
    the loop returns ``ts`` itself when no bucket is <= it)."""
    expr = col
    for b in QUANT_BUCKETS[::-1]:
        expr = F.when(col >= F.lit(b), F.lit(b)).otherwise(expr)
    return expr


def retime_quantized(fr: DataFrame) -> DataFrame:
    """P12: inter-frame delta, rounded to 4dp (prefix-sum float noise
    guard) and quantized to the reference buckets."""
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    dt = F.round(F.col("ts") - F.lag("ts").over(w), 4)
    return (fr.withColumn("dt", dt)
            .filter(F.col("dt").isNotNull())
            .withColumn("q", quantize_expr(F.col("dt"))))


def hops(left: DataFrame, right: DataFrame) -> DataFrame:
    """J4: interleave two frame streams by absolute time; a hop is a
    row whose side differs from the previous row's (twebber.py:95-102).
    Returns (side, ts, prev_side, is_hop).

    The global merge order is realized with a range-partitioned lag
    (operators/windows.py) — the reference's dual-cursor merge is a
    global order too, but a bare ``Window.orderBy`` would sort the
    whole corpus in ONE task at scale."""
    from ..operators.windows import range_partitioned_lag
    l_ = left.select(F.lit("left").alias("side"), "doc_id", "ts")
    r_ = right.select(F.lit("right").alias("side"), "doc_id", "ts")
    u = l_.unionByName(r_)
    flagged = range_partitioned_lag(
        u, ["ts", "side", "doc_id"], "side", "prev_side")
    return flagged.withColumn(
        "is_hop",
        F.col("prev_side").isNotNull()
        & (F.col("side") != F.col("prev_side")))


VIM_START_MARK = "\x1b[22;0;0t"
VIM_END_MARK = "\x1b[23;0;0t"


def vim_sessions(fr: DataFrame) -> DataFrame:
    """S8: per-(doc, session) vim capture with reference re-timing
    (asciinema2html.py:201-258 ``VimRecording``): a session spans the
    frame carrying the 22;0;0t title-stack push through the frame
    carrying the 23;0;0t pop (inclusive); captured frames are REBASED
    to a fresh time axis where each step is the QUANTIZED inter-frame
    delta (``frame_time``: rel_k = rel_{k-1} + quantize(ts_k -
    ts_{k-1})).

    The rebased axis is carried as ``rel_ts_q4`` — integer 1e-4 s
    units — so the cumulative sum is exact integer arithmetic in any
    engine (the reference accumulates per-step-rounded floats; the two
    agree to 1e-5 by construction since every quantized step is an
    exact multiple of 1e-4 after the 4dp delta rounding).

    All windows are partitioned by doc (and session) — scale-safe.
    Returns (doc_id, session_id, frame_no, data, rel_ts_q4).
    """
    start = F.col("data").contains(VIM_START_MARK).cast("int")
    end = F.col("data").contains(VIM_END_MARK).cast("int")
    w = Window.partitionBy("doc_id").orderBy("frame_no")
    wprev = w.rowsBetween(Window.unboundedPreceding, -1)
    marked = (fr
              .withColumn("_starts", F.sum(start).over(w))
              .withColumn("_ends_before",
                          F.coalesce(F.sum(end).over(wprev), F.lit(0))))
    in_sess = (marked.filter(F.col("_starts") > F.col("_ends_before"))
               .withColumn("session_id", F.col("_starts")))
    ws = Window.partitionBy("doc_id", "session_id").orderBy("frame_no")
    dt = F.round(F.col("ts")
                 - F.coalesce(F.lag("ts").over(ws), F.col("ts")), 4)
    qi = F.round(quantize_expr(dt) * 10000).cast("long")
    rel = F.sum(qi).over(ws.rowsBetween(Window.unboundedPreceding, 0))
    return (in_sess
            .withColumn("rel_ts_q4", rel)
            .select("doc_id", "session_id", "frame_no", "data",
                    "rel_ts_q4"))


def vim_session_stats(fr: DataFrame) -> DataFrame:
    """Per-session dump stats: (doc_id, session_id, n_frames,
    duration_q4) — the table a ``dump_vim_sessions`` sink
    (asciinema2html.py:192-197) would write one file per row of."""
    sess = vim_sessions(fr)
    return (sess.groupBy("doc_id", "session_id")
            .agg(F.count("*").alias("n_frames"),
                 F.max("rel_ts_q4").alias("duration_q4")))


# --- deterministic synthesis (closed forms shared with SQL oracles) -------

def n_frames_expr(doc_id):
    return (F.lit(5) + F.pmod(doc_id, F.lit(20))).cast("int")


def step_expr(doc_id):
    """Per-doc inter-frame step: (doc_id % 100 + 1) * 0.05 — spans every
    reference quantize bucket across a corpus."""
    return (F.pmod(doc_id, F.lit(100)) + 1) * F.lit(0.05)


def vim_span_exprs(d, n):
    """Closed-form vim-session span for synthetic casts: docs with
    ``doc_id % 4 == 2`` carry one session from frame 1 through frame
    ``min(n - 1, 3 + doc_id % 3)`` (shared with the SQL oracles)."""
    is_vim = F.pmod(d, F.lit(4)) == 2
    s = F.lit(1)
    e = F.least(n - 1, F.lit(3) + F.pmod(d, F.lit(3)))
    return is_vim, s, e


def synth_cast_lines(ids: DataFrame) -> DataFrame:
    """(doc_id: long) -> cast JSONL lines (header + frames), built
    entirely from JVM-side expressions (format_string/concat) — the
    synthesis itself is part of the declarative plan. Docs with
    ``doc_id % 4 == 2`` embed a vim session: the span-start frame
    carries the 22;0;0t title-stack push (JSON-escaped ESC) and the
    span-end frame the 23;0;0t pop, mirroring real recordings."""
    d = F.col("doc_id")
    hdr = ids.select(
        "doc_id",
        F.lit(-1).alias("line_no"),
        F.format_string(
            '{"version": 2, "width": %d, "height": 24, "timestamp": %d}',
            (F.lit(80) + F.pmod(d, F.lit(40))).cast("int"),
            (F.lit(1700000000) + d).cast("long")).alias("line"))
    i = F.col("i")
    is_vim, s, e = vim_span_exprs(d, n_frames_expr(d))
    payload = (
        F.when(is_vim & (i == s),
               F.format_string('\\u001b[22;0;0tvim doc %d', d))
        .when(is_vim & (i == e), F.lit('\\u001b[23;0;0t:wq'))
        .otherwise(F.format_string('frame %d of doc %d\\r\\n', i, d)))
    fr = (ids.select("doc_id", F.explode(
        F.sequence(F.lit(0), n_frames_expr(d) - 1)).alias("i"))
        .select(
            "doc_id",
            F.col("i").alias("line_no"),
            F.concat(
                F.format_string(
                    '[%.4f, "o", ',
                    F.round(F.col("i") * step_expr(F.col("doc_id")), 4)),
                F.lit('"'), payload, F.lit('"]')).alias("line")))
    return hdr.unionByName(fr)
