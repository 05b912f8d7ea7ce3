"""Integer Lloyd k-means (operators/cluster.py) vs an independent
numpy reference on the driver embeddings table (sf0.001)."""
import numpy as np
import pyarrow.parquet as pq

from console_log_parser_spark.operators.cluster import (PACK, kmeans_stats,
                                                        quantized)

SF = "/root/testdata/sf0.001"
K, DIM = 10, 64


def _round_half_away(v: np.ndarray) -> np.ndarray:
    # Spark round() and DuckDB round() are half-AWAY-FROM-ZERO;
    # np.round is half-to-even — the reference must match the engines
    return np.where(v >= 0, np.floor(v + 0.5),
                    np.ceil(v - 0.5)).astype(np.int64)


def _ref(n_iters: int):
    t = pq.read_table(f"{SF}/embeddings.parquet")
    vid = np.array(t.column("vec_id").to_pylist())
    emb = np.array(t.column("embedding").to_pylist(), dtype=np.float64)
    q = _round_half_away(emb * 1000)
    order = np.argsort(vid)
    vid, q = vid[order], q[order]
    cent = {int(vid[i]): q[i].copy() for i in range(K)}

    def assign(cent):
        cids = sorted(cent)
        c = np.stack([cent[i] for i in cids])
        d = ((q[:, None, :] - c[None, :, :]) ** 2).sum(axis=2)
        comb = d * PACK + np.array(cids)[None, :]
        best = comb.min(axis=1)
        return best % PACK, best // PACK

    for _ in range(n_iters):
        cid, _ = assign(cent)
        cent = {int(c): np.floor_divide(q[cid == c].sum(axis=0),
                                        (cid == c).sum())
                for c in np.unique(cid)}
    cid, dist = assign(cent)
    return {int(c): (int((cid == c).sum()),
                     int(dist[cid == c].sum()),
                     int(vid[cid == c].min()))
            for c in np.unique(cid)}


def test_kmeans_matches_numpy_reference(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {r["cluster_id"]: (r["n_vecs"], r["inertia"], r["min_vec_id"])
           for r in kmeans_stats(emb, k=K, n_iters=2, dim=DIM).collect()}
    assert got == _ref(2)


def test_kmeans_zero_iters_is_seed_assignment(spark):
    # n_iters=0 -> pure nearest-seed assignment, still exact
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    got = {r["cluster_id"]: (r["n_vecs"], r["inertia"], r["min_vec_id"])
           for r in kmeans_stats(emb, k=K, n_iters=0, dim=DIM).collect()}
    assert got == _ref(0)
    # every seed is distance 0 from itself, so each cluster contains
    # its own seed
    assert all(got[c][2] == c for c in range(K))


def test_quantized_roundtrip(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet").limit(5)
    rows = quantized(emb).collect()
    raw = {r["vec_id"]: r["embedding"] for r in emb.collect()}
    for r in rows:
        expect = _round_half_away(
            np.array(raw[r["vec_id"]], dtype=np.float64) * 1000)
        assert list(r["q"]) == expect.tolist()


def test_kmeans_assign_consistent_with_stats(spark):
    from console_log_parser_spark.operators.cluster import (
        PACK, kmeans_assign)
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    assign = kmeans_assign(emb, k=K, n_iters=2, dim=DIM)
    got = {}
    for r in assign.collect():
        c = r["comb"] % PACK
        n, inertia, mn = got.get(c, (0, 0, 1 << 62))
        got[c] = (n + 1, inertia + r["comb"] // PACK,
                  min(mn, r["vec_id"]))
    assert got == _ref(2)
