"""Spark parse stage (operators/parse.py mapInArrow) vs the pure-Python
oracle: exact token-array equality per doc_id (BASELINE.json:15) plus
every derived column."""
from pyspark.sql import functions as F

from console_log_parser_spark import datagen, oracle
from console_log_parser_spark.operators.parse import parse_stage


def test_parse_stage_matches_oracle(spark, small_dataset):
    df = spark.read.parquet(f"{small_dataset}/tokenized_logs.parquet")
    parsed = parse_stage(df)
    rows = {r["doc_id"]: r for r in parsed.collect()}
    assert len(rows) == 300

    for i in range(300):
        doc_id = f"doc_{i:08d}"
        text, _ = datagen.gen_doc(i)
        o = oracle.oracle_parse_doc(text)
        r = rows[doc_id]
        assert r["ansi_stripped"] == o["stripped"], doc_id
        assert r["n_stripped"] == len(o["stripped"])
        assert r["severity"] == o["severity"], doc_id
        assert r["cmd_lines"] == o["cmd_lines"], doc_id
        assert r["prompt_count"] == o["prompt_count"]
        assert r["n_vim"] == o["n_vim"]
        assert dict(r["seq_hist"]) == o["seq_hist"], doc_id
        assert (r["n_debug"], r["n_info"], r["n_warn"], r["n_error"]) == (
            o["n_debug"], o["n_info"], o["n_warn"], o["n_error"])
        assert r["ts_min"] == o["ts_min"] and r["ts_max"] == o["ts_max"]
        assert r["n_events"] == o["n_events"]


def test_parse_plan_is_arrow_only(spark, small_dataset):
    """No row-at-a-time BatchEvalPython anywhere in the physical plan —
    the parse must cross the JVM boundary via Arrow (SURVEY.md §7)."""
    df = spark.read.parquet(f"{small_dataset}/tokenized_logs.parquet")
    parsed = parse_stage(df).groupBy("severity").count()
    plan = parsed._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "MapInArrow" in plan or "ArrowEvalPython" in plan


def test_parse_stage_column_pruning(spark, small_dataset):
    """Aggregating on parse outputs must not force reading unrelated
    columns... the scan still needs tokens (input to the UDF), but a
    query on the raw table alone prunes to the selected columns."""
    df = spark.read.parquet(f"{small_dataset}/tokenized_logs.parquet")
    q = df.groupBy("source").agg(F.sum("n_tok").alias("s"))
    plan = q.queryExecution if False else q._jdf.queryExecution().executedPlan().toString()
    assert "tokens" not in plan.split("ReadSchema")[-1][:200]


def test_parse_stage_extractor_plugin(spark, small_dataset):
    """SURVEY §2.8 extension surface: a plugin adds one column computed
    inside the SAME single MapInArrow stage (analog of the reference's
    handler slots, vtparser.py:524-530) — no extra python stage, no
    per-row UDF."""
    import pyarrow as pa

    from console_log_parser_spark.operators.parse import Extractor

    ex = Extractor(
        "n_dollar", "int", pa.int32(),
        lambda text, parsed: text.count("$"))
    df = spark.read.parquet(f"{small_dataset}/tokenized_logs.parquet")
    out = parse_stage(df, extractors=(ex,))
    rows = {r["doc_id"]: r for r in
            out.select("doc_id", "n_dollar", "severity").collect()}

    from console_log_parser_spark import datagen
    for doc_id, r in list(rows.items())[:50]:
        text, _ = datagen.gen_doc(int(doc_id.split("_")[1]), 42)
        assert r["n_dollar"] == text.count("$"), doc_id

    plan = out._jdf.queryExecution().executedPlan().toString()
    assert plan.count("MapInArrow") == 1
    assert "BatchEvalPython" not in plan


def test_extract_sets_columns_through_arrow_stage(spark):
    # A8 extractor columns through the REAL Arrow stage, with synthetic
    # OSC + DCS content (the corpus has no DCS): schema, batch shape
    # and values must match the char-FSM oracle's collected lists
    from console_log_parser_spark import oracle
    from console_log_parser_spark.operators.extract_sets import (
        dcs_strings_extractor, os_commands_extractor)
    from console_log_parser_spark.operators.parse import parse_stage

    texts = [
        "\x1b]0;alpha\x07plain\r\n",
        "\x1bP1;2q data-one\x1b\\middle\x1b]2;beta\x1b\\\r\n",
        "\x90!~eight-bit\x9c and \x1bP;;\x1b\\headerless\r\n",
        "\x1bXsos ignored\x1b\\no sets here\r\n",
        "truncated \x1b]0;half",
    ]
    rows = [(f"d{i}", [int(c) for c in map(ord, t)], len(t), "src_000")
            for i, t in enumerate(texts)]
    df = spark.createDataFrame(
        rows, "doc_id string, tokens array<int>, n_tok int, source string")
    out = parse_stage(df, extractors=(
        os_commands_extractor(), dcs_strings_extractor()))
    got = {r["doc_id"]: (r["os_commands"], r["dcs_strings"])
           for r in out.select("doc_id", "os_commands",
                               "dcs_strings").collect()}
    for i, t in enumerate(texts):
        o = oracle.oracle_parse_doc(t)
        assert got[f"d{i}"] == (o["os_commands"], o["dcs_strings"]), t
    # explicit expectations, independent of both implementations
    assert got["d0"] == (["0;alpha"], [])
    assert got["d1"] == (["2;beta"], [" data-one"])
    assert got["d2"] == ([], ["eight-bit"])
    assert got["d3"] == ([], [])
    assert got["d4"] == ([], [])


def test_a8_approx_count_distinct_within_rsd(spark):
    """The documented 10^12-row scale swap (extract_sets.py: exact
    count_distinct -> approx_count_distinct) is executable fact: on the
    sf0.01 corpus the HLL++ estimate agrees with the exact distinct
    count per sink within 3x the configured rsd (plus one count of
    integer slack at tiny cardinalities). HLL++ is deterministic for
    fixed data + rsd, so this is a hard pin, not a flaky bound."""
    from console_log_parser_spark.operators.enrich import enrich_stage
    from console_log_parser_spark.operators.extract_sets import (
        dcs_strings_extractor, os_commands_extractor)
    from console_log_parser_spark.operators.parse import synth_tokens_stage

    sf_dir = "/root/testdata/sf0.01"
    rsd = 0.05
    ids = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .select(F.col("doc_id").cast("long").alias("doc_id_num")))
    logs = synth_tokens_stage(ids)
    routes = spark.createDataFrame(datagen.route_metadata_rows())
    parsed = parse_stage(logs, extractors=(
        os_commands_extractor(), dcs_strings_extractor()))
    enr = enrich_stage(parsed, routes).select(
        "sink", "os_commands", "dcs_strings")
    agg = (enr.select("sink", F.explode("os_commands").alias("s"))
           .groupBy("sink")
           .agg(F.countDistinct("s").alias("exact"),
                F.approx_count_distinct("s", rsd).alias("approx"))
           .collect())
    assert agg, "no OSC strings in the sf0.01 corpus?"
    for r in agg:
        tol = max(1, 3 * rsd * r["exact"])
        assert abs(r["approx"] - r["exact"]) <= tol, \
            (r["sink"], r["exact"], r["approx"])
