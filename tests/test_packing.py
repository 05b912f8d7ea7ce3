"""Sequence packing (operators/packing.py): the distributed two-pass
prefix sum must equal the naive global window exactly, the packing
coordinates must equal an independent Python recompute under the same
md5 order, and no plan may contain an unpartitioned window."""
import hashlib

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from console_log_parser_spark.operators.packing import (
    global_prefix_sum, pack_sequences)
from tests.test_windows import _has_unpartitioned_window


def _df(spark, vals):
    return spark.createDataFrame(
        [(i, v) for i, v in enumerate(vals)], "doc_id int, n_tok int")


@pytest.mark.parametrize("n_parts", [1, 4, 16])
def test_prefix_sum_matches_naive_window(spark, n_parts):
    import random
    rng = random.Random(7)
    vals = [rng.randint(0, 50) for _ in range(300)]
    df = _df(spark, vals)
    got = {r["doc_id"]: r["cum"] for r in global_prefix_sum(
        df, ["doc_id"], "n_tok", "cum", n_parts).collect()}
    w = Window.orderBy("doc_id")
    want = {r["doc_id"]: r["cum"] for r in
            df.withColumn("cum", F.sum("n_tok").over(w)).collect()}
    assert got == want


def test_prefix_sum_zero_and_empty_partitions(spark):
    # zeros everywhere + more partitions than rows (empty partitions)
    df = _df(spark, [0, 0, 5, 0, 3])
    got = {r["doc_id"]: r["cum"] for r in global_prefix_sum(
        df, ["doc_id"], "n_tok", "cum", 16).collect()}
    assert got == {0: 0, 1: 0, 2: 5, 3: 5, 4: 8}


def test_pack_sequences_matches_python_recompute(spark):
    import random
    rng = random.Random(11)
    vals = [rng.randint(0, 4000) for _ in range(200)]
    df = _df(spark, vals)
    got = {r["doc_id"]: (r["tok_end"], r["first_seq"], r["last_seq"])
           for r in pack_sequences(df, 1000, "doc_id", "n_tok",
                                   num_partitions=8).collect()}
    # independent recompute: same md5 order (hashlib hex == Spark md5)
    order = sorted(range(len(vals)),
                   key=lambda i: (hashlib.md5(str(i).encode())
                                  .hexdigest(), i))
    end = 0
    want = {}
    for i in order:
        end += vals[i]
        first = (end - vals[i]) // 1000
        last = -1 if end == 0 else (end - 1) // 1000
        want[i] = (end, first, last)
    assert got == want


def test_pack_sequences_no_unpartitioned_window(spark):
    df = _df(spark, [10] * 50)
    out = pack_sequences(df, 16, "doc_id", "n_tok", num_partitions=4)
    assert not _has_unpartitioned_window(out)
