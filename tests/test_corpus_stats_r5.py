"""Round-5 corpus statistics queries (token coverage curve, exact-dup
survivorship, char diversity, user-activity percentiles) against
pure-Python references."""
from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import functions as F


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, n_chars long")


def _write_docs(spark, tmp_path, texts):
    d = str(tmp_path)
    _docs(spark, texts).write.mode("overwrite").parquet(
        f"{d}/documents.parquet")
    return d


def test_token_coverage_matches_pure_python(spark, tmp_path):
    import __spark_entry__ as em
    texts = ["a a a b b c", "a b  d", "e f g a", ""]
    d = _write_docs(spark, tmp_path, texts)
    got = [(r["top_k"], r["tokens_covered"], r["coverage_bp"])
           for r in em.doc_token_coverage(spark, d).collect()]
    words = [w for t in texts for w in t.split(" ") if w]
    cnt = Counter(words)
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())
    want = []
    for k in (1, 3, 10, 30, 100):
        cov = sum(c for _, c in ranked[:k])
        want.append((k, cov, cov * 10000 // total))
    assert got == want


def test_dedup_survivorship_matches_pure_python(spark, tmp_path):
    import __spark_entry__ as em
    texts = ["dup one", "dup one", "dup one", "solo a", "pair x",
             "pair x", "solo b"]
    d = _write_docs(spark, tmp_path, texts)
    got = {r["group_size"]: (r["n_groups"], r["docs_removed"],
                             r["chars_removed"])
           for r in em.doc_dedup_survivorship(spark, d).collect()}
    # the query PLANTS every 25th doc twice more (both engines do) —
    # replicate: doc 0 ("dup one") gains 2 copies
    corpus = texts + [texts[0], texts[0]]
    groups = Counter(corpus)
    want: dict = {}
    for t, sz in groups.items():
        g, dr, cr = want.get(sz, (0, 0, 0))
        want[sz] = (g + 1, dr + (sz - 1), cr + (sz - 1) * len(t))
    assert got == want
    # the planted texts guarantee a sz > 1 bucket is exercised
    assert any(sz > 1 for sz in got)
    assert sum(v[1] for v in got.values()) == len(corpus) - len(groups)


def test_char_diversity_matches_pure_python(spark, tmp_path):
    import __spark_entry__ as em
    texts = ["aaaa", "abcd", "aabbccdd", "zzzzzzzy", ""]
    d = _write_docs(spark, tmp_path, texts)
    got = {r["doc_id"]: (r["n_chars"], r["n_distinct_chars"],
                         r["surprisal"])
           for r in em.doc_char_diversity(spark, d).collect()}

    def bits(c):
        return c.bit_length() - 1

    want = {}
    for i, t in enumerate(texts):
        if not t:
            continue
        cnt = Counter(t)
        n = len(t)
        want[i] = (n, len(cnt),
                   sum(c * (bits(n) - bits(c)) for c in cnt.values()))
    assert got == want
    # the uniform doc must beat the constant doc of the same length
    assert want[1][2] > want[0][2]


def test_user_activity_percentiles_match_pure_python(spark, tmp_path):
    import __spark_entry__ as em
    rows = []
    eid = 0
    for u, k, t in [(1, 3, "view"), (2, 1, "view"), (3, 7, "view"),
                    (1, 2, "click"), (4, 2, "click"), (5, 5, "view")]:
        for _ in range(k):
            rows.append((eid, u, t))
            eid += 1
    df = (spark.createDataFrame(
        [(e, "2024-01-01 00:00:00", u, t, 0.0, "{}")
         for e, u, t in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string")
        .withColumn("ts", F.to_timestamp("ts")))
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["event_type"]: (r["n_users"], r["min_v"], r["p25"],
                             r["p50"], r["p75"], r["p95"], r["max_v"])
           for r in em.events_user_activity(spark, d).collect()}

    def nr(vals, p):
        # nearest-rank: smallest value at cumulative rank
        # ceil(p*n/100) — the small-n ceiling edges (p95 on n=4 ->
        # rank 4, p25 -> rank 1) are exactly where an off-by-one in
        # (p*n+99) div 100 would bite (r5 review finding)
        vals = sorted(vals)
        return vals[max(0, math.ceil(p * len(vals) / 100) - 1)]

    def full(vals):
        return (len(vals), min(vals), nr(vals, 25), nr(vals, 50),
                nr(vals, 75), nr(vals, 95), max(vals))

    assert got == {"view": full([3, 7, 5, 1]), "click": full([2, 2])}

def test_dau_wau_matches_pure_python(spark, tmp_path):
    import datetime as dt

    import __spark_entry__ as em
    # users active across a 10-day span with churn
    rows, eid = [], 0
    base = dt.datetime(2024, 3, 1)
    for day, users in enumerate([[1, 2], [1], [3], [], [1, 4],
                                 [2], [1], [5], [1, 2, 3], [1]]):
        for u in users:
            rows.append((eid, base + dt.timedelta(days=day, hours=3),
                         u))
            eid += 1
    df = spark.createDataFrame(
        [(e, t, u, "view", 0.0, "{}") for e, t, u in rows],
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double, props string")
    d = str(tmp_path)
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["day"]: (r["dau"], r["wau"], r["stickiness_bp"])
           for r in em.events_dau_wau(spark, d).collect()}
    by_day: dict = {}
    for _e, t, u in rows:
        by_day.setdefault(t.date(), set()).add(u)
    want = {}
    for day, users in by_day.items():
        wau_users = set()
        for back in range(7):
            wau_users |= by_day.get(day - dt.timedelta(days=back),
                                    set())
        dau, wau = len(users), len(wau_users)
        want[day.strftime("%Y-%m-%d")] = (dau, wau,
                                          dau * 10000 // wau)
    assert got == want
    # WAU >= DAU everywhere, strictly greater once churn kicks in
    assert all(w >= d_ for d_, w, _ in got.values())
    assert any(w > d_ for d_, w, _ in got.values())


def test_ngram_novelty_matches_pure_python(spark, tmp_path):
    """doc_ngram_novelty: first-seen attribution goes to the MINIMUM
    doc_id per trigram; repeated trigrams inside one doc count once;
    docs with < 3 words are absent."""
    import __spark_entry__ as em
    texts = [
        "the cat sat on the mat",          # doc 0: all novel
        "the cat sat on the mat today",    # doc 1: mostly doc-0 reruns
        "a brand new sentence here",       # doc 2: all novel
        "the cat sat",                     # doc 3: one trigram, seen
        "tiny doc",                        # doc 4: no trigrams
        "the cat sat the cat sat on",      # doc 5: distinct-once
    ]
    d = _write_docs(spark, tmp_path, texts)
    got = [(r["doc_id"], r["n_tri"], r["n_novel"], r["novelty_bp"])
           for r in em.doc_ngram_novelty(spark, d).collect()]

    firsts: dict = {}
    per_doc: list = []
    for i, t in enumerate(texts):
        ws = t.split(" ")
        tris = {" ".join(ws[j:j + 3]) for j in range(len(ws) - 2)}
        per_doc.append(tris)
        for s in tris:
            firsts.setdefault(s, i)
    want = []
    for i, tris in enumerate(per_doc):
        if not tris:
            continue
        novel = sum(1 for s in tris if firsts[s] == i)
        want.append((i, len(tris), novel,
                     novel * 10000 // len(tris)))
    assert got == want
    # doc 0 fully novel, doc 3 fully seen, doc 4 absent
    as_map = {r[0]: r for r in got}
    assert as_map[0][3] == 10000
    assert as_map[3] == (3, 1, 0, 0)
    assert 4 not in as_map
