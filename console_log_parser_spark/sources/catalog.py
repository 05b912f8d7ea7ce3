"""Tokenized-sequence table I/O: Iceberg first, partitioned Parquet
fallback.

The production deployment (BASELINE.json input_hint / SCALE.md §1)
reads the 10^12-sequence corpus from an Iceberg table — partition
pruning, hidden partitioning on ``bucket(source)``, snapshot isolation
for resume, and schema evolution come from the table format, not from
this engine. The sandbox ships no Iceberg runtime jar, so every entry
point here probes for the DataSourceV2 provider and falls back to
plain partitioned Parquet with identical dataframe semantics; the
rest of the pipeline is format-agnostic (it sees a DataFrame either
way — that is the point of keeping the scan declarative).

To enable Iceberg on a real cluster, submit with::

    spark-submit \
      --packages org.apache.iceberg:iceberg-spark-runtime-4.0_2.13:<v> \
      --conf spark.sql.catalog.logs=org.apache.iceberg.spark.SparkCatalog \
      --conf spark.sql.catalog.logs.type=hadoop \
      --conf spark.sql.catalog.logs.warehouse=<warehouse-uri> ...

and address tables as ``logs.db.tokenized_logs``.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True when an Iceberg SparkCatalog class is loadable in this
    JVM (i.e. the runtime jar was shipped)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


def read_tokens(spark: SparkSession, location: str) -> DataFrame:
    """Read the tokenized-log table.

    ``location`` is either an Iceberg table identifier
    (``catalog.db.table`` — requires the runtime jar + catalog conf)
    or a Parquet directory path. Either way the result is the same
    4-column DataFrame contract (doc_id, tokens, n_tok, source) and
    Catalyst still gets pushdown + pruning: Iceberg via DataSourceV2
    scan planning, Parquet via the native file source.
    """
    if "/" not in location and iceberg_available(spark):
        return spark.read.format("iceberg").load(location)
    return spark.read.parquet(location)


def write_routed(routed: DataFrame, location: str,
                 mode: str = "append") -> None:
    """Fan-out write of the routed table, partitioned by sink.

    Iceberg identifier -> ``writeTo`` with hidden partitioning (the
    v2 path gives atomic commits + snapshot history, which is what
    the checkpoint manifests coordinate with at scale); Parquet path
    -> hive-style ``partitionBy`` directories.
    """
    spark = routed.sparkSession
    if "/" not in location and iceberg_available(spark):
        writer = routed.writeTo(location).using("iceberg")
        if mode == "append":
            # Gate the create-fallback on table EXISTENCE, not on
            # append raising: an append can fail for many reasons
            # (commit conflict, schema mismatch, transient I/O) and
            # falling back to createOrReplace() on any of them would
            # silently REPLACE — i.e. destroy — the existing table.
            # The checkpoint/resume story depends on append-only
            # semantics, so real append failures must propagate.
            if spark.catalog.tableExists(location):
                writer.append()
            else:
                writer.partitionedBy(routed.sink).createOrReplace()
        else:
            writer.createOrReplace()
        return
    routed.write.mode(mode).partitionBy("sink").parquet(location)
