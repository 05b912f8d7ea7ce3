"""Exact corpus telemetry — per-stratum order statistics WITHOUT a
sort.

Every curation pipeline publishes distribution dashboards (document
length percentiles per language/source, before/after each filter
stage). The naive plan — rank every row per stratum — is a full
per-stratum sort: the single most expensive shape at 100 TB. But the
values being summarized (token counts, char counts, quality scores)
live in a SMALL INTEGER DOMAIN, and exact percentiles over a bounded
domain need no sort at all:

1. ``groupBy(stratum, value).count()`` — the only corpus-wide
   exchange, carrying at most |strata| x |value domain| rows (a few
   thousand), with full map-side partial aggregation;
2. a cumulative sum over that TINY histogram frame (window
   partitioned by stratum — never unpartitioned, and the frame is
   domain-bounded, not corpus-bounded);
3. nearest-rank lookup: percentile p = the smallest value whose
   cumulative count reaches ``ceil(p * n / 100)`` (the
   ``percentile_disc`` definition), folded as conditional aggregates.

Everything is integer arithmetic (``(p*n + 99) div 100`` with
non-negative operands, so Spark's truncating ``div`` == the oracle's
flooring ``//``) — exact on every engine, no approx-percentile
epsilon to reconcile. At 10^12 rows the plan is one partial+final
hash aggregation plus a kilobyte-scale window: the same cost as a
``count(*)`` per group, and immune to stratum skew because the
histogram, not the corpus, is what gets windowed.

For genuinely unbounded domains (floats, byte lengths of huge blobs)
bucket first (``F.floor(col / width)``) and the same machinery yields
exact bucket-resolution percentiles with an explicit error bound of
one bucket width.
"""
from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def value_histogram(df: DataFrame, value_col: str,
                    strat_col: str) -> DataFrame:
    """Per-stratum value histogram with cumulative and total counts:
    ``(strat, v, cnt, cum, n)``. The one corpus-wide exchange; the
    result frame is bounded by |strata| x |value domain|."""
    hist = (df.select(F.col(strat_col).alias("strat"),
                      F.col(value_col).cast("long").alias("v"))
              .groupBy("strat", "v")
              .agg(F.count("*").alias("cnt")))
    by_strat = Window.partitionBy("strat")
    return (hist
            .withColumn("cum", F.sum("cnt").over(
                by_strat.orderBy("v")))
            .withColumn("n", F.sum("cnt").over(by_strat)))


def histogram_percentiles(df: DataFrame, value_col: str,
                          strat_col: str,
                          pcts: Sequence[int] = (25, 50, 75, 95),
                          ) -> DataFrame:
    """Exact nearest-rank percentiles per stratum from the bounded
    value histogram: one row per stratum with ``n_docs``, ``min_v``,
    ``p<P>`` for each requested integer percent, and ``max_v``.
    Percentile P is the smallest value whose cumulative count reaches
    ``ceil(P * n / 100)`` — ``percentile_disc``'s definition, stated
    in integers so every engine agrees bit-for-bit."""
    cum = value_histogram(df, value_col, strat_col)
    aggs = [F.max("n").cast("long").alias("n_docs"),
            F.min("v").cast("long").alias("min_v")]
    for p in pcts:
        rank = F.expr(f"CAST(({int(p)} * n + 99) div 100 AS BIGINT)")
        aggs.append(F.min(F.when(F.col("cum") >= rank, F.col("v")))
                    .cast("long").alias(f"p{int(p)}"))
    aggs.append(F.max("v").cast("long").alias("max_v"))
    return (cum.groupBy(F.col("strat").alias(strat_col))
            .agg(*aggs).orderBy(strat_col))
