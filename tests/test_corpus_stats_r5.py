"""Round-5 corpus statistics queries (token coverage curve, exact-dup
survivorship) against pure-Python references."""
from __future__ import annotations

from collections import Counter


def _docs(spark, rows):
    return spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(rows)],
        "doc_id long, text string, n_chars long")


def test_token_coverage_matches_pure_python(spark):
    import tempfile

    import __spark_entry__ as em
    texts = ["a a a b b c", "a b  d", "e f g a", ""]
    df = _docs(spark, texts)
    # drive the query through its real contract: a documents.parquet
    # under a temp sf_dir
    d = tempfile.mkdtemp(prefix="cov_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
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


def test_dedup_survivorship_matches_pure_python(spark):
    import tempfile

    import __spark_entry__ as em
    texts = ["dup one", "dup one", "dup one", "solo a", "pair x",
             "pair x", "solo b"]
    df = _docs(spark, texts)
    d = tempfile.mkdtemp(prefix="surv_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
    got = {r["group_size"]: (r["n_groups"], r["docs_removed"],
                             r["chars_removed"])
           for r in em.doc_dedup_survivorship(spark, d).collect()}
    groups = Counter(texts)
    want: dict = {}
    for t, sz in groups.items():
        g, dr, cr = want.get(sz, (0, 0, 0))
        want[sz] = (g + 1, dr + (sz - 1), cr + (sz - 1) * len(t))
    assert got == want
    # invariant: removing survivors leaves exactly one doc per text
    assert sum(v[1] for v in got.values()) == len(texts) - len(groups)

def test_char_diversity_matches_pure_python(spark):
    import tempfile

    import __spark_entry__ as em
    texts = ["aaaa", "abcd", "aabbccdd", "zzzzzzzy", ""]
    df = _docs(spark, texts)
    d = tempfile.mkdtemp(prefix="chd_")
    df.write.mode("overwrite").parquet(f"{d}/documents.parquet")
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


def test_user_activity_percentiles_match_pure_python(spark):
    import tempfile

    import __spark_entry__ as em
    rows = []
    eid = 0
    for u, k, t in [(1, 3, "view"), (2, 1, "view"), (3, 7, "view"),
                    (1, 2, "click"), (4, 2, "click"), (5, 5, "view")]:
        for _ in range(k):
            rows.append((eid, u, t))
            eid += 1
    df = spark.createDataFrame(
        [(e, "2024-01-01 00:00:00", u, t, 0.0, "{}")
         for e, u, t in rows],
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string").withColumn(
        "ts", __import__("pyspark.sql.functions",
                         fromlist=["F"]).to_timestamp("ts"))
    d = tempfile.mkdtemp(prefix="ua_")
    df.write.mode("overwrite").parquet(f"{d}/events.parquet")
    got = {r["event_type"]: (r["n_users"], r["min_v"], r["p50"],
                             r["max_v"])
           for r in em.events_user_activity(spark, d).collect()}

    def nearest_rank(vals, p):
        vals = sorted(vals)
        import math
        return vals[max(0, math.ceil(p * len(vals) / 100) - 1)]

    view = [3, 7, 5, 1]
    click = [2, 2]
    want = {"view": (4, 1, nearest_rank(view, 50), 7),
            "click": (2, 2, nearest_rank(click, 50), 2)}
    assert got == want
