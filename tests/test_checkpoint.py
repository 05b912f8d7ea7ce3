"""Kill/resume: a killed run resumes without recomputing committed
micro-batches and converges to the same result (BASELINE.md resume
row)."""
import json
import os

from console_log_parser_spark.plans.checkpoint import (
    read_manifests, run_with_checkpoints)
from console_log_parser_spark.plans.pipeline import PipelineConfig


def test_kill_resume_no_recompute(spark, small_dataset, tmp_path):
    out = str(tmp_path / "ckpt")
    cfg = PipelineConfig(in_dir=small_dataset, out_dir=out)

    # phase 1: "killed" after 2 of 4 micro-batches
    r1 = run_with_checkpoints(spark, cfg, n_batches=4, max_batches=2)
    assert r1["ran"] == [0, 1] and not r1["complete"]
    manifests = read_manifests(out)
    assert set(manifests) == {0, 1}
    mtimes = {b: os.path.getmtime(
        f"{out}/_manifests/batch_{b:05d}.json") for b in (0, 1)}

    # simulate a partial uncommitted write of batch 2
    os.makedirs(f"{out}/routed/batch=2/sink=sink_0", exist_ok=True)
    with open(f"{out}/routed/batch=2/sink=sink_0/garbage.parquet", "w") as f:
        f.write("partial")

    # phase 2: resume
    r2 = run_with_checkpoints(spark, cfg, n_batches=4)
    assert r2["skipped"] == [0, 1]
    assert r2["ran"] == [2, 3]
    assert r2["complete"]
    # committed manifests untouched (no recomputation)
    for b in (0, 1):
        assert os.path.getmtime(
            f"{out}/_manifests/batch_{b:05d}.json") == mtimes[b]

    # converges to the full-pipeline result
    routed = spark.read.parquet(f"{out}/routed")
    assert routed.count() == 300
    assert routed.select("doc_id").distinct().count() == 300
    assert r2["rows"] == 300

    # manifests carry lineage predicates + metrics
    m = json.load(open(f"{out}/_manifests/batch_00003.json"))
    assert "pmod(xxhash64(doc_id), 4) = 3" == m["predicate"]
    assert m["rows"] + sum(
        read_manifests(out)[b]["rows"] for b in (0, 1, 2)) == 300


def test_checkpoint_totals_match_plain_run(spark, small_dataset, tmp_path):
    out = str(tmp_path / "ckpt2")
    cfg = PipelineConfig(in_dir=small_dataset, out_dir=out)
    r = run_with_checkpoints(spark, cfg, n_batches=3)
    assert r["complete"] and r["rows"] == 300
    summ = spark.read.parquet(f"{out}/agg_sink_summary")
    assert summ.groupBy().sum("n_rows").collect()[0][0] == 300
