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
