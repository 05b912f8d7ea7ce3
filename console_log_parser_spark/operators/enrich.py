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


def hop_target_renumber(commands: DataFrame, hops: DataFrame,
                        id_col: str = "doc_id") -> DataFrame:
    """J2: hop-target lookup with filtered renumbering
    (terminal2html.py:16-38 ``HopTarget.get_target_cmd`` +
    :376-388 ``add_hopto_link``).

    When a hop links to command ``t`` of a target document whose
    suppress filter hides some commands, the DISPLAYED number is
    ``t - |{suppressed s : s <= t}|`` (the reference walks the sorted
    filter list decrementing while ``cmd <= hop``). Here that walk is
    a running ``sum(suppressed)`` window per document (partitioned —
    scale-safe) and the hop table, tiny by construction (a handful of
    cross-file links per corpus), joins broadcast.

    commands: (id_col, cmd_no, suppressed) — one row per command.
    hops: (id_col, cmd_no) — hop targets to renumber.
    Returns hops + ``renumbered``.
    """
    from pyspark.sql import Window
    w = (Window.partitionBy(id_col).orderBy("cmd_no")
         .rowsBetween(Window.unboundedPreceding, 0))
    numbered = commands.withColumn(
        "renumbered",
        F.col("cmd_no")
        - F.sum(F.col("suppressed").cast("int")).over(w))
    # hops is the small side: broadcast it so the command fact side
    # never shuffles for the lookup
    return (numbered.select(id_col, "cmd_no", "renumbered")
            .join(F.broadcast(hops), [id_col, "cmd_no"], "inner"))


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
