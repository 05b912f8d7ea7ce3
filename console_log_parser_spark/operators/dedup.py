"""Near-duplicate detection operators for training-data pipelines.

All hashing is engine-portable and deterministic: shingle/word hashes
come from md5 hex prefixes (same bytes in any engine, no dependence on
Spark's xxhash seed or Python's randomized str hash), and permutations
use fixed (a, b) constants modulo a 31-bit prime, so results are
reproducible across runs, partitionings and resume — a requirement the
salted router shares (BASELINE.json:14).

Scale design: every operator is expressed as explode -> hash ->
groupBy/join on the *hash* (never on raw text), so the shuffle keys
are small and skew-resistant. The MinHash-LSH candidate join is the
standard band-bucket equi-join: only documents sharing a band bucket
meet, turning the O(n^2) pair space into O(sum bucket^2).
"""
from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MERSENNE_P = 2147483647  # 2^31 - 1

# fixed permutation constants (generated once from a seeded PRNG;
# hard-coded so every engine/run agrees)
PERMS = [
    (1203077387, 528034983), (885961883, 1723930551),
    (1817469788, 1236687677), (602982498, 1106438810),
    (2006519551, 927473217), (460128514, 1597226340),
    (1106819081, 342973211), (1378749216, 79380292),
    (1602569885, 984282217), (733023313, 1474557139),
    (559671147, 1947485988), (1953610326, 178881001),
    (1444794699, 876868812), (255892115, 1610216395),
    (1961256669, 1304574783), (680874309, 476067152),
]


def _words(text_col: str = "text"):
    return F.split(F.col(text_col), " ")


def shingles(df: DataFrame, k: int = 3, id_col: str = "doc_id",
             text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, shingle) distinct k-word shingles."""
    expr = (
        f"array_distinct(CASE WHEN size(split({text_col}, ' ')) >= {k} "
        f"THEN transform(sequence(1, size(split({text_col}, ' ')) - {k - 1}), "
        + "i -> concat_ws(' ', "
        + ", ".join(f"element_at(split({text_col}, ' '), i + {j})"
                    for j in range(k))
        + ")) ELSE array() END)"
    )
    return (df.select(id_col, F.explode(F.expr(expr)).alias("shingle")))


def shingle_hash(col):
    """Portable 60-bit integer hash: md5 hex prefix -> bigint."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def minhash_signatures(df: DataFrame, k: int = 3, n_perm: int = 8,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, sig: array<long>[n_perm]).

    Signature j = min over shingles of (a_j * h + b_j) mod p, h = the
    portable shingle hash mod p. Computed as one explode + cross of the
    tiny permutation table + two-level min aggregate.
    """
    sh = shingles(df, k, id_col, text_col).withColumn(
        "h", shingle_hash(F.col("shingle")) % MERSENNE_P)
    perms = sh.sparkSession.createDataFrame(
        [(j, a, b) for j, (a, b) in enumerate(PERMS[:n_perm])],
        "j int, a long, b long")
    vals = (sh.crossJoin(F.broadcast(perms))
            .select(id_col, "j",
                    ((F.col("a") * F.col("h") + F.col("b"))
                     % MERSENNE_P).alias("v")))
    mins = vals.groupBy(id_col, "j").agg(F.min("v").alias("mv"))
    return (mins.groupBy(id_col)
            .agg(F.expr("transform(array_sort(collect_list(struct(j, mv))),"
                        " s -> s.mv)").alias("sig")))


def minhash_lsh_candidates(df: DataFrame, k: int = 3, n_perm: int = 8,
                           n_bands: int = 4, id_col: str = "doc_id",
                           text_col: str = "text") -> DataFrame:
    """LSH banding: docs sharing any band bucket become candidate pairs
    (doc_a < doc_b, distinct)."""
    rows_per_band = n_perm // n_bands
    sigs = minhash_signatures(df, k, n_perm, id_col, text_col)
    bands = sigs.select(
        id_col,
        F.posexplode(F.expr(
            f"transform(sequence(0, {n_bands - 1}), b -> "
            f"concat_ws(':', b, "
            f"concat_ws('_', slice(sig, b * {rows_per_band} + 1, "
            f"{rows_per_band}))))")).alias("band", "bucket"))
    a = bands.select(F.col(id_col).alias("doc_a"), "bucket")
    b = bands.select(F.col(id_col).alias("doc_b"), "bucket")
    return (a.join(b, "bucket")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b").distinct())


def minhash_dedup_pairs(df: DataFrame, k: int = 3, n_perm: int = 8,
                        n_bands: int = 4, jaccard_num: int = 1,
                        jaccard_den: int = 2, id_col: str = "doc_id",
                        text_col: str = "text") -> DataFrame:
    """Candidates verified by exact shingle Jaccard >= num/den
    (integer cross-multiplication — no float boundary)."""
    cands = minhash_lsh_candidates(df, k, n_perm, n_bands, id_col, text_col)
    sh = shingles(df, k, id_col, text_col)
    sizes = sh.groupBy(id_col).agg(F.count("*").alias("n_sh"))
    a = sh.select(F.col(id_col).alias("doc_a"), "shingle")
    b = sh.select(F.col(id_col).alias("doc_b"), "shingle")
    common = (cands.join(a, "doc_a").join(b, ["doc_b", "shingle"])
              .groupBy("doc_a", "doc_b").agg(F.count("*").alias("common")))
    sa = sizes.select(F.col(id_col).alias("doc_a"),
                      F.col("n_sh").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"),
                      F.col("n_sh").alias("size_b"))
    return (common.join(sa, "doc_a").join(sb, "doc_b")
            .filter(F.col("common") * jaccard_den
                    >= jaccard_num * (F.col("size_a") + F.col("size_b")
                                      - F.col("common")))
            .select("doc_a", "doc_b", "common", "size_a", "size_b"))


def simhash(df: DataFrame, bits: int = 64, id_col: str = "doc_id",
            text_col: str = "text") -> DataFrame:
    """(id, text) -> (id, simhash: long).

    Word-level 64-bit SimHash: each distinct word hashes to a portable
    60-bit value spread to 64 bits; bit i of the result is 1 when the
    weighted sum of bit i over words is positive. Fully built-in
    (explode + bit ops + groupBy), no Python at runtime.
    """
    words = df.select(
        id_col, F.explode(F.expr(
            f"split({text_col}, ' ')")).alias("w"))
    wc = words.groupBy(id_col, "w").agg(F.count("*").alias("cnt"))
    # two md5 halves -> one 63-bit value (portable; hi is masked to 59
    # bits before the shift so no engine can overflow a signed 64-bit)
    h_lo = F.conv(F.substring(F.md5(F.col("w")), 1, 15), 16, 10) \
        .cast("long")
    h_hi = F.conv(F.substring(F.md5(F.col("w")), 16, 15), 16, 10) \
        .cast("long")
    h = h_lo.bitwiseXOR(
        F.shiftleft(h_hi.bitwiseAND(F.lit((1 << 59) - 1)), 4))
    hashed = wc.select(id_col, "cnt", h.alias("h"))
    bit_cols = F.expr(
        "transform(sequence(0, 63), i -> "
        "CASE WHEN ((h >> i) & 1) = 1 THEN cnt ELSE -cnt END)")
    per_doc = (hashed.select(id_col, bit_cols.alias("contrib"))
               .groupBy(id_col)
               .agg(F.expr(
                   "aggregate(collect_list(contrib), "
                   "transform(sequence(0, 63), i -> 0L), "
                   "(acc, x) -> zip_with(acc, x, (p, q) -> p + q))")
                   .alias("sums")))
    return per_doc.select(
        id_col,
        F.expr("aggregate(sequence(0, 63), 0L, (acc, i) -> "
               "CASE WHEN element_at(sums, i + 1) > 0 "
               "THEN acc | (1L << i) ELSE acc END)").alias("simhash"))


def simhash_pairs(df: DataFrame, max_hamming: int = 3,
                  id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming,
    using 4x16-bit block LSH (a pair within distance 3 must agree on
    at least one of 4 blocks) to avoid the O(n^2) comparison."""
    sh = simhash(df, 64, id_col, text_col)
    blocks = sh.select(
        id_col, "simhash",
        F.posexplode(F.expr(
            "transform(sequence(0, 3), b -> "
            "concat_ws(':', b, (simhash >> (b * 16)) & 65535))"))
        .alias("block", "bucket"))
    a = blocks.select(F.col(id_col).alias("doc_a"),
                      F.col("simhash").alias("sh_a"), "bucket")
    b = blocks.select(F.col(id_col).alias("doc_b"),
                      F.col("simhash").alias("sh_b"), "bucket")
    cand = (a.join(b, "bucket")
            .filter(F.col("doc_a") < F.col("doc_b"))
            .select("doc_a", "doc_b", "sh_a", "sh_b").distinct())
    return (cand.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b"))))
        .filter(F.col("hamming") <= max_hamming)
        .select("doc_a", "doc_b", "hamming"))
