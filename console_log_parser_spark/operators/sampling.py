"""Deterministic sampling / dataset mixing for training-data pipelines.

A 100 TB curation pipeline needs to (a) downsample a corpus to a
target budget and (b) mix strata (languages, sources, quality tiers)
at configured proportions — and it must do both DETERMINISTICALLY so a
resumed or re-run job selects byte-identical rows (the same resume
requirement the salted router has, BASELINE.json:14; ``rand()``-based
``DataFrame.sample`` re-draws per run and per task retry).

Mechanism: a portable md5 bucket in basis points,

    bucket_bp(key) = int(md5(salt || key)[:8], 16) % 10000

so "keep at rate r" is ``bucket_bp < r`` — a pure map-side FILTER:
no shuffle, no state, identical on any engine (the same bytes hash the
same in Spark, DuckDB, or a Python oracle), stable under repartition,
retry and resume. Mixing joins a broadcast (stratum -> rate_bp)
dimension and applies the same filter; the fact side never shuffles.
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BP = 10000  # basis points: rates are integers, no float boundaries


def bucket_bp(col, salt: str = "mix42"):
    """Deterministic basis-point bucket [0, 10000) for a key column."""
    return (F.conv(F.substring(F.md5(F.concat(F.lit(salt), col)), 1, 8),
                   16, 10).cast("long") % BP)


def deterministic_sample(df: DataFrame, rate_bp: int,
                         key_col: str = "doc_id",
                         salt: str = "mix42") -> DataFrame:
    """Keep rows whose bucket falls below ``rate_bp`` (exact expected
    rate rate_bp/10000, deterministic in (salt, key))."""
    return df.filter(bucket_bp(F.col(key_col), salt) < rate_bp)


def epoch_key(epoch: int, col, salt: str = "shuf42"):
    """Deterministic per-epoch shuffle key: md5 over (salt, epoch, key).
    Changing ``epoch`` re-permutes the whole corpus; the same
    (salt, epoch, key) maps to the same position on any engine and any
    retry — the training-order analog of ``bucket_bp``."""
    return F.md5(F.concat(F.lit(f"{salt}:{epoch}:"), col.cast("string")))


def epoch_shuffle(df: DataFrame, epoch: int, key_col: str = "doc_id",
                  salt: str = "shuf42") -> DataFrame:
    """Global deterministic training order for one epoch: every row
    gets ``shuffle_key`` = ``epoch_key`` and the frame is
    range-partitioned + sorted on it, so reading the output partitions
    in partition order IS the epoch order — a total order with NO
    global window and no single-task sort. At 10^12 rows this is one
    range exchange (sampled boundaries) with sorted parquet files per
    partition; per-row global positions, when needed, are partition
    offset + local row number (the two-pass prefix-sum pattern of
    ``packing.pack_sequences``), never a one-partition window."""
    keyed = df.withColumn("shuffle_key", epoch_key(epoch, F.col(key_col),
                                                   salt))
    return (keyed.repartitionByRange("shuffle_key", key_col)
                 .sortWithinPartitions("shuffle_key", key_col))


def weighted_mix(df: DataFrame, rates: DataFrame,
                 strat_col: str = "source", key_col: str = "doc_id",
                 salt: str = "mix42") -> DataFrame:
    """Mix strata at configured rates: ``rates`` is a tiny
    (strat_col, rate_bp) dimension, broadcast-joined; rows keep when
    their bucket falls below their stratum's rate. Unlisted strata
    drop (rate 0) — coalesce the join for an explicit default."""
    dim = F.broadcast(rates.select(strat_col, "rate_bp"))
    joined = df.join(dim, strat_col, "left")
    return (joined
            .filter(bucket_bp(F.col(key_col), salt)
                    < F.coalesce(F.col("rate_bp"), F.lit(0)))
            .drop("rate_bp"))
