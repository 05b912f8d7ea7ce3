"""Distilled linear quality model (operators/classify.py)."""
from __future__ import annotations

from console_log_parser_spark.operators.classify import (
    DEFAULT_THRESHOLDS, DEFAULT_WEIGHTS, score_quality)


def _score(text):
    words = text.split(" ")
    w = DEFAULT_WEIGHTS
    return (w["bias"] + w["n_chars"] * len(text)
            + w["n_words"] * len(words)
            + w["n_distinct_words"] * len(set(words))
            + w["max_word_len"] * max(len(x) for x in words))


def test_score_matches_python_reference(spark):
    texts = ["a b c", "one two two three", "x" * 900,
             "the quick brown fox jumps over the lazy dog"]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r for r in score_quality(df).collect()}
    t0, t1 = DEFAULT_THRESHOLDS
    for i, t in enumerate(texts):
        exp = _score(t)
        assert got[i]["q_score"] == exp
        exp_bucket = ("low" if exp < t0 else
                      "mid" if exp < t1 else "high")
        assert got[i]["q_bucket"] == exp_bucket


def test_custom_weights_fold_to_pure_projection(spark):
    df = spark.createDataFrame([(1, "a bb ccc")],
                               "doc_id long, text string")
    out = score_quality(df, weights={"bias": 10, "n_words": 100},
                        thresholds=(0, 1000))
    row = out.collect()[0]
    assert row["q_score"] == 10 + 100 * 3 and row["q_bucket"] == "mid"
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
