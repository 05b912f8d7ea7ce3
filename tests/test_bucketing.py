"""Bucketed-table co-located joins — the shuffle-elimination strategy
for REPEATED doc-keyed joins over the persistent corpus (dedup index
probes, enrichment joins, incremental ingest) at 100-TB scale.

A table bucketed by the join key at write time pins every key to a
bucket file; a join between two tables bucketed the same way (same
key, same bucket count) plans as a SortMergeJoin with NO Exchange on
either side — the shuffle was paid once at write time and amortizes
over every subsequent join. These tests pin that plan shape with the
native (non-Hive) catalog, which is exactly what
`sources/catalog.py`'s Iceberg path would give via bucket-partition
transforms (`bucket(N, doc_id)`) on a real deployment.
"""
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    # spark.sql.warehouse.dir is static — the managed tables land in
    # the session default and are DROPPED (files removed) on teardown
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    spark.sql("DROP TABLE IF EXISTS corpus_bkt")
    spark.sql("DROP TABLE IF EXISTS scores_bkt")
    (docs.select("doc_id", "text", "n_chars")
     .write.bucketBy(8, "doc_id").sortBy("doc_id")
     .mode("overwrite").saveAsTable("corpus_bkt"))
    (docs.select("doc_id",
                 (F.col("n_chars") % 100).alias("score"))
     .write.bucketBy(8, "doc_id").sortBy("doc_id")
     .mode("overwrite").saveAsTable("scores_bkt"))
    yield "corpus_bkt", "scores_bkt"
    spark.sql("DROP TABLE IF EXISTS corpus_bkt")
    spark.sql("DROP TABLE IF EXISTS scores_bkt")


def test_bucketed_join_plans_without_exchange(spark, bucketed_tables):
    ca, cb = bucketed_tables
    # disable auto-broadcast: at test scale AQE broadcasts these tiny
    # tables, hiding the bucketed shape this test exists to pin (at
    # 100 TB neither side broadcasts — SMJ is the real plan)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (spark.table(ca).join(spark.table(cb), "doc_id")
             .select("doc_id", "score"))
        plan = j._jdf.queryExecution().executedPlan().toString()
        # the co-located join: SortMergeJoin with ZERO shuffle exchanges
        assert "SortMergeJoin" in plan, plan[:2000]
        assert "Exchange hashpartitioning" not in plan, plan[:2000]
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def test_bucketed_join_matches_plain_join(spark, bucketed_tables):
    ca, cb = bucketed_tables
    got = (spark.table(ca).join(spark.table(cb), "doc_id")
           .agg(F.count(F.lit(1)).alias("n"),
                F.sum("score").alias("s")).collect()[0])
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    want = (docs.select("doc_id")
            .join(docs.select("doc_id",
                              (F.col("n_chars") % 100).alias("score")),
                  "doc_id")
            .agg(F.count(F.lit(1)).alias("n"),
                 F.sum("score").alias("s")).collect()[0])
    assert (got["n"], got["s"]) == (want["n"], want["s"])


def test_bucketed_groupby_avoids_exchange(spark, bucketed_tables):
    ca, _ = bucketed_tables
    # aggregation on the bucket key also reuses the bucketing
    agg = spark.table(ca).groupBy("doc_id").agg(
        F.sum("n_chars").alias("s"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
