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


def _brute_buckets(cuts=(33, 66)):
    scores = {d: s for d, (_, _, s) in _brute().items()}
    bits = {d: b for d, (_, b, _) in _brute().items()}
    vals = sorted(scores.values())
    n = len(vals)

    def pct(p):
        rank = (p * n + 99) // 100
        cum = 0
        for v in sorted(set(vals)):
            cum += vals.count(v)
            if cum >= rank:
                return v
    lo, hi = pct(cuts[0]), pct(cuts[1])
    out = {}
    for d, s in scores.items():
        b = "tail" if s <= lo else ("middle" if s <= hi else "head")
        n_docs, mn, mx, sb = out.get(b, (0, 10 ** 9, -1, 0))
        out[b] = (n_docs + 1, min(mn, s), max(mx, s), sb + bits[d])
    return out


def test_quality_buckets_match_brute_force(spark):
    from console_log_parser_spark.operators.lm import quality_buckets
    got = {r["bucket"]: (r["n_docs"], r["min_score"], r["max_score"],
                         r["sum_bits"])
           for r in quality_buckets(
               lm_bits_per_doc(_frame(spark), hot_df=2)).collect()}
    assert got == _brute_buckets()


def test_quality_buckets_all_equal_scores_single_bucket(spark):
    # every doc scores identically -> p33 == p66 == the value, and
    # score <= p33 puts the whole corpus in "tail" (ties sit low)
    from console_log_parser_spark.operators.lm import quality_buckets
    df = spark.createDataFrame([(str(i), "a b") for i in range(6)],
                               "doc_id string, text string")
    rows = quality_buckets(lm_bits_per_doc(df, hot_df=0)).collect()
    assert [r["bucket"] for r in rows] == ["tail"]
    assert rows[0]["n_docs"] == 6


def test_quality_buckets_no_unpartitioned_window(spark):
    from console_log_parser_spark.operators.lm import quality_buckets
    from tests.test_windows import _has_unpartitioned_window
    out = quality_buckets(lm_bits_per_doc(_frame(spark), hot_df=2))
    assert not _has_unpartitioned_window(out)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
