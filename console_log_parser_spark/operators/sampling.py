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
