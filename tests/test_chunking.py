"""Sliding context-window chunking (operators/chunking.py)."""
from __future__ import annotations

import pytest

from console_log_parser_spark.operators.chunking import sliding_windows


def _frame(spark, ns):
    return spark.createDataFrame(
        [(str(i), n) for i, n in enumerate(ns)],
        "doc_id string, n_tok int")


def _brute(n, L, S):
    if n < 1:
        return []
    wins, w = [], 0
    while True:
        start = w * S
        wins.append((w, start, min(L, n - start)))
        if start + L >= n:
            return wins
        w += 1


@pytest.mark.parametrize("L,S", [(128, 64), (128, 128), (7, 3), (1, 1)])
def test_windows_match_brute_force(spark, L, S):
    ns = [0, 1, 2, S, L - 1, L, L + 1, 2 * L, 2 * L + 1, 337]
    got = {}
    rows = sliding_windows(_frame(spark, ns), L, S).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["win_id"], r["win_start"], r["win_len"]))
    for i, n in enumerate(ns):
        assert sorted(got.get(str(i), [])) == _brute(n, L, S), (n, L, S)


def test_every_token_covered_and_only_last_window_short(spark):
    ns = list(range(1, 400, 7))
    rows = sliding_windows(_frame(spark, ns), 128, 64).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(int(r["doc_id"]), []).append(r)
    for i, n in enumerate(ns):
        ws = sorted(per_doc[i], key=lambda r: r["win_id"])
        covered = set()
        for w in ws:
            assert w["win_len"] >= 1
            covered |= set(range(w["win_start"],
                                 w["win_start"] + w["win_len"]))
        assert covered == set(range(n)), n
        assert all(w["win_len"] == 128 for w in ws[:-1]), n


def test_invalid_stride_rejected(spark):
    with pytest.raises(ValueError):
        sliding_windows(_frame(spark, [10]), 4, 5)
    with pytest.raises(ValueError):
        sliding_windows(_frame(spark, [10]), 4, 0)


def test_plan_has_zero_exchanges(spark):
    plan = (sliding_windows(_frame(spark, [100, 200]), 128, 64)
            ._jdf.queryExecution().executedPlan().toString())
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
