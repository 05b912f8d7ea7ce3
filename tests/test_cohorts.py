"""Cohort retention matrix (operators/cohorts.py)."""
from __future__ import annotations

import datetime as dt
from collections import defaultdict

from console_log_parser_spark.operators.cohorts import retention_matrix

# (user, day-number) events; repeated same-day events must not double-
# count a user
EVENTS = [
    ("a", 0), ("a", 0), ("a", 1), ("a", 3),
    ("b", 0), ("b", 3),
    ("c", 1), ("c", 1), ("c", 2),
    ("d", 3),
]
BASE = dt.datetime(2024, 1, 1, 12, 0, 0)


def _frame(spark):
    rows = [(u, BASE + dt.timedelta(days=d, minutes=i))
            for i, (u, d) in enumerate(EVENTS)]
    return spark.createDataFrame(rows, "user_id string, ts timestamp")


def _brute():
    days = defaultdict(set)
    for u, d in EVENTS:
        days[u].add(d)
    cells = defaultdict(set)
    for u, ds in days.items():
        first = min(ds)
        for d in ds:
            cells[(first, d - first)].add(u)
    out = {}
    for (cd, off), users in cells.items():
        size = len(cells[(cd, 0)])
        day = (BASE + dt.timedelta(days=cd)).strftime("%Y-%m-%d")
        out[(day, off)] = (len(users), len(users) * 100 // size)
    return out


def test_matrix_matches_brute_force(spark):
    got = {(r["cohort_day"], r["day_offset"]):
           (r["n_users"], r["pct_x100"])
           for r in retention_matrix(_frame(spark)).collect()}
    assert got == _brute()
    # sanity on the fixture itself: cohort day-0 is always 100%
    assert all(v[1] == 100 for k, v in got.items() if k[1] == 0)


def test_offsets_and_cohorts_are_exactly_the_expected_set(spark):
    got = retention_matrix(_frame(spark)).collect()
    # cohorts: day 0 (a, b), day 1 (c), day 3 (d)
    assert {(r["cohort_day"], r["day_offset"]) for r in got} == {
        ("2024-01-01", 0), ("2024-01-01", 1), ("2024-01-01", 3),
        ("2024-01-02", 0), ("2024-01-02", 1),
        ("2024-01-04", 0),
    }
