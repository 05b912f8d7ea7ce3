"""Token-aware sequence packing — the concat-then-chunk layout a
training pipeline uses to turn variable-length documents into
fixed-length training sequences (documents are concatenated in a
deterministic global order, then the token stream is cut into
``seq_len``-token windows; a document may straddle a cut).

The core primitive is a GLOBAL running token offset, i.e.
``sum(n_tok) OVER (ORDER BY order_key)`` — which must NOT be a global
window (a single-task sort dies at 10^12 docs). It is computed as a
distributed two-pass prefix sum, the same family as
``operators.windows.range_partitioned_lag``:

1. range-partition by the order key; in-partition cumulative sum
   (ordinary partitioned window — parallel);
2. per-partition totals (one row per range partition, cluster-width
   sized, never data-sized) get their EXCLUSIVE prefix via a broadcast
   triangular join (O(P^2) over P = #partitions rows — trivial to
   ~1e5 partitions, and it avoids re-introducing an unpartitioned
   window, which this repo bans);
3. broadcast the offsets back and add.

Determinism: the order key defaults to ``md5(cast(id as string))`` —
content-independent, skew-free (md5 is uniform), and byte-identical on
re-run/resume, so a killed packing job resumes with identical sequence
boundaries (the checkpoint/lineage requirement of BASELINE.json).
"""
from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def global_prefix_sum(df: DataFrame, order_cols: list[str],
                      value_col: str, out_col: str,
                      num_partitions: int | None = None) -> DataFrame:
    """INCLUSIVE running sum of ``value_col`` under the global order of
    ``order_cols`` (which must be a unique key tuple), with no
    single-partition sort. Output schema = input + ``out_col``."""
    spark = df.sparkSession
    n = (int(num_partitions) if num_partitions is not None else
         int(spark.conf.get("spark.sql.shuffle.partitions", "32")))
    ranged = (df.repartitionByRange(n, *order_cols)
              .withColumn("_pid", F.spark_partition_id()))
    in_part = Window.partitionBy("_pid").orderBy(*order_cols)
    local = ranged.withColumn("_cum", F.sum(value_col).over(in_part))
    totals = ranged.groupBy("_pid").agg(F.sum(value_col).alias("_psum"))
    offs = (totals.select(F.col("_pid").alias("_xpid"))
            .join(F.broadcast(totals.select(
                F.col("_pid").alias("_ypid"), "_psum")),
                F.col("_ypid") < F.col("_xpid"))
            .groupBy("_xpid")
            .agg(F.sum("_psum").alias("_off"))
            .select(F.col("_xpid").alias("_pid"), "_off"))
    return (local.join(F.broadcast(offs), "_pid", "left")
            .withColumn(out_col,
                        F.col("_cum") + F.coalesce(F.col("_off"),
                                                   F.lit(0)))
            .drop("_pid", "_cum", "_off"))


def pack_sequences(docs: DataFrame, seq_len: int,
                   id_col: str = "doc_id", n_tok_col: str = "n_tok",
                   num_partitions: int | None = None) -> DataFrame:
    """Per-document packing coordinates under concat-then-chunk:
    ``tok_end`` (exclusive global token offset), ``first_seq`` /
    ``last_seq`` (the fixed ``seq_len``-token windows the document's
    tokens land in; a doc spanning a cut has last_seq > first_seq;
    an empty doc occupies no window and gets first_seq > last_seq).
    All-integer arithmetic, so the DuckDB oracle agrees exactly."""
    keyed = docs.withColumn(
        "_okey", F.md5(F.col(id_col).cast("string")))
    cum = global_prefix_sum(keyed, ["_okey", id_col], n_tok_col,
                            "tok_end", num_partitions)
    # all-INTEGER division (DIV), never float floor(); the one negative
    # operand case — an empty doc at global offset 0, where Spark's DIV
    # truncates toward zero but DuckDB's // floors — is pinned by the
    # explicit CASE, identical in the oracle SQL.
    return cum.selectExpr(
        id_col,
        "CAST(tok_end AS BIGINT) AS tok_end",
        f"CAST((tok_end - {n_tok_col}) DIV {seq_len} AS BIGINT) "
        "AS first_seq",
        "CASE WHEN tok_end = 0 THEN CAST(-1 AS BIGINT) "
        f"ELSE CAST((tok_end - 1) DIV {seq_len} AS BIGINT) END "
        "AS last_seq")
