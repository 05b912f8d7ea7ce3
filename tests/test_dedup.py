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
