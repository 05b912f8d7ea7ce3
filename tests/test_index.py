"""Posting-list build (operators/index.py): distinct-per-doc
semantics, the hot-term guard, sorted-postings determinism, and the
plan shape (hot terms excluded via a broadcast BEFORE collect_list).
"""
from pyspark.sql import functions as F

from console_log_parser_spark.operators.index import (
    build_postings, document_frequencies)


def _df(spark, docs):
    return spark.createDataFrame(list(docs.items()),
                                 "doc_id long, text string") \
        .select(F.col("doc_id"), F.col("text"))


CORPUS = {1: "a b b c", 2: "b c c", 3: "a  a", 4: "the the b"}


def test_document_frequencies_distinct_per_doc(spark):
    got = {r["term"]: r["df_docs"] for r in
           document_frequencies(_df(spark, CORPUS)).collect()}
    # repetition inside a doc counts once; the double space in doc 3
    # yields an empty token that must be dropped
    assert got == {"a": 2, "b": 3, "c": 2, "the": 1}


def test_build_postings_sorted_bounded_and_hot_separated(spark):
    postings, hot = build_postings(_df(spark, CORPUS), max_df=2)
    built = {r["term"]: (r["df_docs"], r["postings"])
             for r in postings.collect()}
    assert built == {"a": (2, [1, 3]), "c": (2, [1, 2]),
                     "the": (1, [4])}
    assert all(len(p) <= 2 for _, p in built.values())
    assert {r["term"]: r["df_docs"] for r in hot.collect()} == {"b": 3}


def test_postings_deterministic_under_repartition(spark):
    df = _df(spark, {i: "x y" if i % 2 else "x" for i in range(40)})
    a, _ = build_postings(df, max_df=100)
    b, _ = build_postings(df.repartition(7), max_df=100)
    assert sorted(map(tuple, a.collect())) == \
        sorted(map(tuple, b.collect()))
    [x] = a.filter(F.col("term") == "y").collect()
    assert x["postings"] == sorted(x["postings"])


def test_rare_terms_rank_and_ties(spark):
    from console_log_parser_spark.operators.index import (
        rare_terms_per_doc)
    # df: a=2, b=3, c=2, the=1 (from CORPUS); doc 1 has {a,b,c}:
    # rarest-2 = (the absent) -> a(2) then c(2) by term tie-break
    got = {r["doc_id"]: ([s["term"] for s in r["keywords"]],
                         r["rarest_df"])
           for r in rare_terms_per_doc(_df(spark, CORPUS),
                                       k=2).collect()}
    assert got[1] == (["a", "c"], 2)       # tie at df=2: term order
    assert got[2] == (["c", "b"], 2)       # c(2) before b(3)
    assert got[3] == (["a"], 2)            # fewer terms than k
    assert got[4] == (["the", "b"], 1)     # the(1) rarest overall


def test_hot_guard_is_broadcast_before_collect(spark):
    plan = build_postings(_df(spark, CORPUS), max_df=2)[0] \
        ._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "collect_list" in plan
    # the HOT guard is the hinted broadcast (a LeftAnti BHJ): hot rows
    # — the bulk of the token mass — are pruned map-side before any
    # exchange, and the hot set is bounded by |postings|/max_df by
    # construction. The cold df_docs lookup is deliberately UNHINTED
    # (AQE broadcasts it at test scale, shuffles at web-vocabulary
    # scale), so the initial plan may show SortMergeJoin there.
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
