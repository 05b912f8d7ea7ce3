"""Sketch-prefiltered EXACT heavy hitters (frequent items).

Part of the graft's training-data extension surface: "which keys
exceed support 1/k" (heavy users, dominant domains, runaway sessions)
over a corpus whose distinct-key domain is itself web-scale.

Why not a plain groupBy-count? Its exchange width is
sum_p(distinct keys in p) — for heavy-tailed key domains (10^9+
users/URLs) that is within a constant of the row count, and the
partial-aggregation map-side combine cannot help a key that appears
once per partition.  The classic two-pass answer:

1. **Candidate pass** — per-partition Misra-Gries with ``width = 2k``
   counters (bounded memory O(k) per partition, NOT per-distinct-key;
   the decrement prune subtracts the (width+1)-th largest count from
   every counter, removing >= cut*(width+1) mass, so any key's
   undercount is <= n_p/(width+1)).  A key with partition frequency
   cnt_p*k > n_p therefore survives with mg*2k > n_p — and by the
   averaging argument ANY key with global frequency cnt*k > n is
   locally frequent in at least one partition, under every possible
   partitioning.  The only exchange is the candidate set:
   <= width keys per partition.
2. **Exact recount** — broadcast semi-join of the input on the tiny
   candidate set, exact count, final exact threshold
   ``cnt * k > total``.  The sketch can only ever ADD candidates, so
   the result is provably exact and partition-invariant; the oracle
   is the plain one-pass SQL.

The ``total`` row count is a third scan, but a count(*)-only parquet
scan materializes no columns (row-group row counts drive empty
vectorized batches), so at 100 TB it is metadata-speed, not
data-speed.  Integer cross-multiplication (`cnt * k > total`)
everywhere — no float support ratio to drift between engines.
"""
from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def mg_merge(vc: "pd.Series | None", batch_counts: pd.Series,
             width: int) -> pd.Series:
    """Merge a batch's exact value counts into a Misra-Gries summary
    of at most ``width`` counters (vectorized decrement prune)."""
    vc = batch_counts if vc is None else (
        vc.add(batch_counts, fill_value=0).astype("int64"))
    if len(vc) > width:
        cut = int(vc.nlargest(width + 1).iloc[-1])
        vc = (vc - cut)
        vc = vc[vc > 0]
    return vc


def frequent_items(df: DataFrame, key_col: str, k: int) -> DataFrame:
    """All keys with global frequency ``cnt * k > total`` — exact, as
    (key, cnt) ordered by key. ``k`` is the support denominator
    (support threshold 1/k); per-partition sketch width is ``2k``."""
    width = 2 * k
    key_field = df.schema[key_col]

    def local_frequent(batches):
        vc = None
        n = 0
        proto = None
        for pdf in batches:
            n += len(pdf)
            vc = mg_merge(vc, pdf[key_col].value_counts(), width)
            proto = pdf
        if vc is None or n == 0:
            return
        # survival bound: true local cnt_p >= mg, and
        # cnt_p <= mg + n_p/(width+1) < mg + n_p/(2k); a key with
        # cnt_p * k > n_p therefore has mg * 2k > n_p.
        keep = vc[vc * 2 * k > n].index
        yield pd.DataFrame(
            {key_col: pd.Series(keep, dtype=proto[key_col].dtype)})

    keyed = df.select(key_col)
    cands = (keyed
             .mapInPandas(local_frequent, keyed.schema)
             .distinct())
    total = df.select(F.count(F.lit(1)).alias("total"))
    return (df
            .join(F.broadcast(cands), key_col, "left_semi")
            .groupBy(key_col)
            .agg(F.count(F.lit(1)).cast("long").alias("cnt"))
            .crossJoin(F.broadcast(total))
            .filter(F.col("cnt") * k > F.col("total"))
            .select(key_col, "cnt")
            .orderBy(key_col))
