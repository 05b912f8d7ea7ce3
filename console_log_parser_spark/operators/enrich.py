"""Enrich stage: broadcast source->route metadata join.

The analog of the reference's config-driven routing (main.py:161-278:
id -> file/options lookup). The dimension is tiny (one row per source)
relative to the fact table (10^12 sequences), so the join MUST be a
broadcast hash join — never a shuffle of the fact side. Unmatched
sources get the dead-letter route (the reference would KeyError;
at scale one unknown source must not kill the job).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

DEAD_LETTER_ROUTE = "route_dead_letter"
DEAD_LETTER_SINK = "sink_dead_letter"


def load_route_metadata(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def enrich_stage(parsed: DataFrame, routes: DataFrame) -> DataFrame:
    """Left broadcast-join parse output with the route dimension;
    coalesce unmatched to the dead-letter route/sink."""
    dim = F.broadcast(
        routes.select("source", "route", "sink", "suppress_cmds", "title"))
    out = parsed.join(dim, on="source", how="left")
    return (out
            .withColumn("route", F.coalesce("route",
                                            F.lit(DEAD_LETTER_ROUTE)))
            .withColumn("sink", F.coalesce("sink", F.lit(DEAD_LETTER_SINK)))
            .withColumn("matched", F.col("title").isNotNull()))


def apply_suppress_filter(enriched: DataFrame) -> DataFrame:
    """Drop suppressed command numbers from cmd_lines per route config
    (reference: terminal2html.py:390-395, set via main.py:243-245).

    Command numbers are 1-based positions within the doc. Pure built-in
    array ops (JVM-side): filter by index against the broadcast-joined
    suppress list.
    """
    has = F.col("suppress_cmds").isNotNull() & (F.size("suppress_cmds") > 0)
    filtered = F.filter(
        "cmd_lines",
        lambda _x, i: ~F.array_contains(
            F.col("suppress_cmds"), (i + F.lit(1)).cast("int")))
    return (enriched
            .withColumn("cmd_lines_routed",
                        F.when(has, filtered).otherwise(F.col("cmd_lines")))
            .withColumn("n_cmd_routed", F.size("cmd_lines_routed")))
