"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on
local[$SPARK_GRAFT_CPUS]; prints ONE JSON line.

The flagship measurement is the parse->enrich->route->aggregate
pipeline over deterministically synthesized tokenized transcripts
(seed=42, cardinality derived from the sf documents table with 4x
amplification), reported as elapsed seconds plus sequences/sec and
tokens/sec. Remaining entries time the headline relational / dedup /
similarity operators against the driver tables. Actions use the noop
sink so timings measure compute, not driver materialization.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as em  # noqa: E402
from console_log_parser_spark.session import get_spark  # noqa: E402

AMPLIFY = int(os.environ.get("SPARK_GRAFT_AMPLIFY", "20"))


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def pipeline_job(spark, sf_dir):
    """Full pipeline; returns (n_docs, n_tokens) from observed metrics."""
    from pyspark.sql import Observation

    from console_log_parser_spark import datagen
    from console_log_parser_spark.operators import aggregate as agg_ops
    from console_log_parser_spark.operators.enrich import (
        apply_suppress_filter, enrich_stage)
    from console_log_parser_spark.operators.parse import (
        parse_stage, synth_tokens_stage)
    from console_log_parser_spark.operators.route import route_stage

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_base = docs.count()
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    ids = (docs.select(F.col("doc_id").cast("long").alias("base_id"))
           .crossJoin(spark.range(AMPLIFY).withColumnRenamed("id", "k"))
           .select((F.col("base_id") * AMPLIFY + F.col("k"))
                   .alias("doc_id_num"))
           # 3 partitions per core: stragglers rebalance instead of
           # serializing the stage on its slowest partition
           .repartition(cpus * 3))
    logs = synth_tokens_stage(ids)
    routes = spark.createDataFrame(datagen.route_metadata_rows())
    parsed = parse_stage(logs)
    routed = route_stage(apply_suppress_filter(enrich_stage(parsed, routes)))
    obs = Observation("bench")
    routed = routed.observe(obs, F.count(F.lit(1)).alias("rows"),
                            F.sum("n_tok").alias("tokens"))
    aggs = agg_ops.severity_histogram(routed)
    _noop(aggs)
    m = dict(obs.get)
    return int(m["rows"]), int(m["tokens"])


def main():
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) \
        if "sf" in sf_dir else 0.0
    spark = get_spark(app="bench", master=f"local[{cpus}]",
                      shuffle_partitions=max(int(cpus), 8))

    timings: dict[str, float] = {}

    # Protocol (BASELINE.md): discard one warm run (python-worker pool
    # fork + numpy/pyarrow imports are one-time costs a cluster job
    # amortizes), then report the median of 3 timed runs.
    runs = []
    n_docs = n_tokens = 0
    for i in range(4):
        t0 = time.time()
        n_docs, n_tokens = pipeline_job(spark, sf_dir)
        runs.append(time.time() - t0)
    pipeline_sec = sorted(runs[1:])[1]  # median of the 3 timed runs
    timings["pipeline_parse_route_aggregate"] = round(pipeline_sec, 3)

    bench_queries = [
        "q1_pricing_summary", "q3_shipping_priority", "q5_local_supplier",
        "q_top_customers_window", "events_sessionize",
        "events_asof_interleave", "doc_dedup_exact", "doc_token_count",
        "doc_minhash_dedup", "doc_simhash_pairs", "ann_bruteforce_top10",
    ]
    qs = em.queries()
    for name in bench_queries:
        t0 = time.time()
        _noop(qs[name](spark, sf_dir))
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "cpus": int(cpus),
        "pipeline": {
            "n_docs": n_docs,
            "n_tokens": n_tokens,
            "seq_per_sec": round(n_docs / pipeline_sec, 1),
            "tok_per_sec": round(n_tokens / pipeline_sec, 1),
            "runs_sec": [round(r, 2) for r in runs],
        },
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
