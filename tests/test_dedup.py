"""MinHash-LSH / SimHash operators vs an independent pure-Python
reference implementation, on the driver documents table (sf0.001)."""
import hashlib

import pytest
from pyspark.sql import functions as F

from console_log_parser_spark.operators import dedup

SF = "/root/testdata/sf0.001"
P = dedup.MERSENNE_P
MASK64 = (1 << 64) - 1


def _shingles(text, k=3):
    ws = text.split(" ")
    if len(ws) < k:
        return set()
    return {" ".join(ws[i:i + k]) for i in range(len(ws) - k + 1)}


def _h60(s):
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _minhash_sig(text, n_perm=8, k=3):
    hs = [_h60(s) % P for s in _shingles(text, k)]
    return [min((a * h + b) % P for h in hs) if hs else None
            for a, b in dedup.PERMS[:n_perm]]


def _simhash(text):
    counts = {}
    for w in text.split(" "):
        counts[w] = counts.get(w, 0) + 1
    sums = [0] * 64
    for w, c in counts.items():
        hx = hashlib.md5(w.encode()).hexdigest()
        lo = int(hx[:15], 16)
        hi = int(hx[15:30], 16)
        h = (lo ^ ((hi & ((1 << 59) - 1)) << 4)) & MASK64
        for i in range(64):
            sums[i] += c if (h >> i) & 1 else -c
    out = 0
    for i in range(64):
        if sums[i] > 0:
            out |= 1 << i
    return out - (1 << 64) if out >= (1 << 63) else out  # signed long


@pytest.fixture(scope="module")
def docs(spark):
    return (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").limit(60).cache())


def test_minhash_signatures_match_reference(spark, docs):
    got = {r["doc_id"]: list(r["sig"])
           for r in dedup.minhash_signatures(docs).collect()}
    for r in docs.collect():
        exp = _minhash_sig(r["text"])
        assert got[r["doc_id"]] == exp, r["doc_id"]


def test_minhash_lsh_candidates_match_reference(spark, docs):
    rows = docs.collect()
    sigs = {r["doc_id"]: _minhash_sig(r["text"]) for r in rows}
    exp_pairs = set()
    buckets = {}
    for d, sig in sigs.items():
        for b in range(4):
            key = (b, tuple(sig[b * 2:(b + 1) * 2]))
            buckets.setdefault(key, []).append(d)
    for ds in buckets.values():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                exp_pairs.add((ds[i], ds[j]))
    got = {(r["doc_a"], r["doc_b"])
           for r in dedup.minhash_lsh_candidates(docs).collect()}
    assert got == exp_pairs


def test_simhash_matches_reference(spark, docs):
    got = {r["doc_id"]: r["simhash"] for r in dedup.simhash(docs).collect()}
    for r in docs.collect():
        assert got[r["doc_id"]] == _simhash(r["text"]), r["doc_id"]


def test_simhash_pairs_self_duplicate(spark):
    """A doc duplicated with one word changed must surface as a
    near-dup pair; unrelated docs must not."""
    base = " ".join(f"tok{i % 17}" for i in range(60))
    near = base.replace("tok3", "tokX", 1)
    far = " ".join(f"zz{i}" for i in range(60))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    pairs = {(r["doc_a"], r["doc_b"]): r["hamming"]
             for r in dedup.simhash_pairs(df, max_hamming=8).collect()}
    assert (1, 2) in pairs
    assert (1, 3) not in pairs and (2, 3) not in pairs


def test_minhash_dedup_detects_near_duplicate(spark):
    base = " ".join(f"w{i}" for i in range(50))
    near = "w0 " + base  # one extra token at the front
    far = " ".join(f"q{i}" for i in range(50))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"])
           for r in dedup.minhash_dedup_pairs(df).collect()}
    assert (1, 2) in got
    assert all(3 not in p for p in got)


def test_minhash_plan_has_no_python_udf(spark, docs):
    plan = dedup.minhash_signatures(docs)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan  # pure built-in expressions


def test_ngram_prefix_jaccard_equals_bruteforce(spark):
    """Prefix-filter completeness on adversarial data: hot shingles
    (shared boilerplate in EVERY doc) + true near-dup pairs + unique
    tails. The prefix join must return exactly the brute-force pairs."""
    from console_log_parser_spark.operators import dedup
    boiler = "the quick brown fox jumps over the lazy dog again and"
    rows = []
    for i in range(40):
        uniq = " ".join(f"tok{i}_{j}" for j in range(10))
        rows.append((i, f"{boiler} {uniq}"))
    # near-dup pairs: 100/101 and 102/103 differ by one trailing word
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa " \
           "lam mu nu xi omicron pi rho sigma tau upsilon"
    rows += [(100, base + " endone"), (101, base + " endtwo"),
             (102, boiler + " " + base), (103, boiler + " " + base)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r["doc_a"], r["doc_b"]): (r["common"], r["size_a"], r["size_b"])
           for r in dedup.ngram_jaccard_pairs_prefix(docs).collect()}

    # brute force in python
    def sh3(t):
        ws = t.split(" ")
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)} \
            if len(ws) >= 3 else set()
    sets = {i: sh3(t) for i, t in rows}
    want = {}
    ids = sorted(sets)
    for x in range(len(ids)):
        for y in range(x + 1, len(ids)):
            a, b = ids[x], ids[y]
            c = len(sets[a] & sets[b])
            if 2 * c >= len(sets[a]) + len(sets[b]) - c:
                want[(a, b)] = (c, len(sets[a]), len(sets[b]))
    assert got == want
    assert (100, 101) in got and (102, 103) in got


def test_ngram_prefix_matches_old_selfjoin_at_sf(spark):
    import os
    sf_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(sf_dir):
        pytest.skip("driver testdata not present")
    from console_log_parser_spark.operators import dedup
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet") \
        .select("doc_id", "text")
    got = {(r["doc_a"], r["doc_b"], r["common"], r["size_a"], r["size_b"])
           for r in dedup.ngram_jaccard_pairs_prefix(docs).collect()}
    # naive reference: unbounded shingle self-join (test-only)
    from pyspark.sql import functions as F
    sh = dedup.shingles(docs)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = sh.select(F.col("doc_id").alias("doc_a"), "shingle")
    b = sh.select(F.col("doc_id").alias("doc_b"), "shingle")
    pairs = (a.join(b, "shingle").filter(F.col("doc_a") < F.col("doc_b"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("common")))
    sa = sizes.select(F.col("doc_id").alias("doc_a"),
                      F.col("n").alias("size_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"),
                      F.col("n").alias("size_b"))
    want = {(r["doc_a"], r["doc_b"], r["common"], r["size_a"], r["size_b"])
            for r in (pairs.join(sa, "doc_a").join(sb, "doc_b")
                      .filter(F.col("common") * 2 >= F.col("size_a")
                              + F.col("size_b") - F.col("common"))
                      ).collect()}
    assert got == want


def test_incremental_dedup_audit_statuses_and_precedence(spark):
    from console_log_parser_spark.operators.dedup import (
        incremental_dedup_audit)
    corpus = spark.createDataFrame(
        [(10, "AAA"), (11, "BBB")], "doc_id long, text string")
    # ids 1 and 5 both match corpus text AAA: corpus-match outranks
    # batch canonicality, so BOTH are dup_in_corpus (never "kept").
    batch = spark.createDataFrame(
        [(1, "AAA"), (2, "CCC"), (3, "CCC"), (5, "AAA")],
        "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in
           incremental_dedup_audit(batch, corpus).collect()}
    assert got == {1: "dup_in_corpus", 5: "dup_in_corpus",
                   2: "kept", 3: "dup_in_batch"}


def test_incremental_dedup_empty_corpus_is_batch_dedup(spark):
    from console_log_parser_spark.operators.dedup import (
        incremental_dedup_audit)
    corpus = spark.createDataFrame([], "doc_id long, text string")
    batch = spark.createDataFrame(
        [(7, "X"), (9, "X")], "doc_id long, text string")
    got = {r["doc_id"]: r["status"] for r in
           incremental_dedup_audit(batch, corpus).collect()}
    assert got == {7: "kept", 9: "dup_in_batch"}


def test_incremental_dedup_no_python_udf(spark):
    from console_log_parser_spark.operators.dedup import (
        incremental_dedup_audit)
    corpus = spark.createDataFrame([(1, "A")], "doc_id long, text string")
    batch = spark.createDataFrame([(2, "B")], "doc_id long, text string")
    plan = (incremental_dedup_audit(batch, corpus)
            ._jdf.queryExecution().executedPlan().toString())
    assert "BatchEvalPython" not in plan


def test_crossdup_minhash_matches_reference(spark, docs):
    """Cross-corpus near-dup vs a brute-force reference: candidates by
    band equality across the split, verified by exact set Jaccard.
    The 60-doc sf0.001 subset has no organic cross-split near-dups, so
    the batch side is DERIVED from corpus texts (one word appended ->
    Jaccard stays >= 1/2) plus one unrelated doc as a negative."""
    corpus_rows = docs.collect()
    corpus_texts = {r["doc_id"]: r["text"] for r in corpus_rows}
    batch_texts = {10_000 + d: corpus_texts[d] + " trailing"
                   for d in sorted(corpus_texts)[:5]}
    batch_texts[10_999] = "entirely unrelated words with no overlap"
    exp = {}
    for a, ta in batch_texts.items():
        sa, ga = _shingles(ta), _minhash_sig(ta)
        for b, tb in corpus_texts.items():
            if not any(ga[i * 2:(i + 1) * 2]
                       == _minhash_sig(tb)[i * 2:(i + 1) * 2]
                       for i in range(4)):
                continue
            sb = _shingles(tb)
            common = len(sa & sb)
            if 2 * common >= len(sa) + len(sb) - common:
                exp[(a, b)] = (common, len(sa), len(sb))
    new = spark.createDataFrame(sorted(batch_texts.items()),
                                "doc_id long, text string")
    got = {(r["batch_id"], r["corpus_id"]):
           (r["common"], r["size_a"], r["size_b"])
           for r in dedup.crossdup_minhash_pairs(new, docs).collect()}
    assert got == exp
    # each derived batch doc must at least pair with its source
    for d in sorted(corpus_texts)[:5]:
        assert (10_000 + d, d) in got
    assert not any(a == 10_999 for a, _ in got)
