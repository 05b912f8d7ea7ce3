"""Bigram-LM document scoring (operators/lm.py)."""
from __future__ import annotations

from collections import Counter

from console_log_parser_spark.operators.lm import (
    bigram_stream, lm_bits_per_doc)

DOCS = [
    ("1", "the cat sat on the mat"),
    ("2", "the cat sat"),
    ("3", "zebra  quark"),        # double space -> empty word dropped
    ("4", "single"),              # <2 words: no bigrams, no output row
    ("5", ""),
    ("6", "the cat the cat"),     # repeated bigram occurrences count
]


def _frame(spark):
    return spark.createDataFrame(DOCS, "doc_id string, text string")


def _brute():
    """Pure-python reference: per-doc (n_bigrams, sum_bits)."""
    grams = {}
    for did, text in DOCS:
        ws = [w for w in text.split(" ") if w]
        grams[did] = [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    corpus = Counter(g for gs in grams.values() for g in gs)
    out = {}
    for did, gs in grams.items():
        if not gs:
            continue
        bits = sum(corpus[g].bit_length() - 1 for g in gs)
        out[did] = (len(gs), bits, bits * 100 // len(gs))
    return out


def test_bigram_stream_keeps_repetition_and_drops_empties(spark):
    got = sorted((r["doc_id"], r["bigram"])
                 for r in bigram_stream(_frame(spark)).collect())
    assert ("3", "zebra quark") in got          # empty word skipped
    assert got.count(("6", "the cat")) == 2     # occurrences, not set
    assert not [g for g in got if g[0] in ("4", "5")]


def test_lm_bits_match_brute_force(spark):
    got = {r["doc_id"]: (r["n_bigrams"], r["sum_bits"],
                         r["avg_bits_x100"])
           for r in lm_bits_per_doc(_frame(spark), hot_df=2).collect()}
    assert got == _brute()


def test_hot_cold_split_covers_every_occurrence(spark):
    # any hot_df must give identical totals: the split is a plan
    # strategy, never a semantics knob
    base = {r["doc_id"]: r["sum_bits"]
            for r in lm_bits_per_doc(_frame(spark), hot_df=10 ** 9)
            .collect()}
    for hot_df in (0, 1, 3):
        got = {r["doc_id"]: r["sum_bits"]
               for r in lm_bits_per_doc(_frame(spark), hot_df=hot_df)
               .collect()}
        assert got == base, hot_df


def test_plan_broadcasts_hot_side_and_stays_jvm(spark):
    plan = (lm_bits_per_doc(_frame(spark), hot_df=1)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan
    assert "BroadcastHashJoin" in plan  # the Zipf-head path
