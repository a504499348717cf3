"""MLlib-backed index builds: KMeans IVF + BucketedRandomProjectionLSH."""

from __future__ import annotations

from pg_vectorize_spark.operators.ann import (
    assign_ivf_cells,
    brute_force_topk,
    ivf_topk,
    mllib_lsh_neighbors,
    train_ivf_centroids_kmeans,
)
from pg_vectorize_spark.providers.local import LocalHashEmbedder

EMB = LocalHashEmbedder(dim=16)

CORPUS = [
    (i, f"database query engine optimizer plan number {i}") for i in range(12)
] + [
    (i, f"music guitar melody rhythm song track {i}") for i in range(12, 24)
]


def _emb_df(spark):
    rows = [(i, EMB.embed_one(t)) for i, t in CORPUS]
    return spark.createDataFrame(rows, "id long, vec array<double>")


def test_kmeans_centroids_shape_and_determinism(spark):
    df = _emb_df(spark)
    c1 = train_ivf_centroids_kmeans(df, "id", "vec", n_centroids=2, seed=42)
    rows = c1.collect()
    assert len(rows) == 2
    assert all(len(r["centroid_vec"]) == 16 for r in rows)
    c2 = train_ivf_centroids_kmeans(df, "id", "vec", n_centroids=2, seed=42)
    assert sorted(map(str, c1.collect())) == sorted(map(str, c2.collect()))


def test_kmeans_ivf_separates_clusters(spark):
    df = _emb_df(spark)
    cents = train_ivf_centroids_kmeans(df, "id", "vec", n_centroids=2, seed=42)
    assigned = assign_ivf_cells(df, cents, "id", "vec")
    cells = {r["id"]: r["cell"] for r in assigned.collect()}
    # the two lexical clusters land in different kmeans cells
    db_cells = {cells[i] for i in range(12)}
    music_cells = {cells[i] for i in range(12, 24)}
    assert len(db_cells) == 1 and len(music_cells) == 1
    assert db_cells != music_cells


def test_kmeans_ivf_search_recall(spark):
    df = _emb_df(spark)
    cents = train_ivf_centroids_kmeans(df, "id", "vec", n_centroids=2, seed=42)
    q = EMB.embed_one("database engine optimizer")
    exact = {r["id"] for r in brute_force_topk(df, "id", "vec", q, k=5).collect()}
    approx = {
        r["id"]
        for r in ivf_topk(df, cents, "id", "vec", q, k=5, nprobe=1).collect()
    }
    # perfect clusters + probing the right cell -> full recall
    assert approx == exact


def test_mllib_lsh_finds_near_neighbors(spark):
    df = _emb_df(spark)
    q = EMB.embed_one("music guitar melody")
    out = mllib_lsh_neighbors(df, "id", "vec", q, k=5).collect()
    assert 0 < len(out) <= 5
    # all results should be from the music cluster (clearly separated data)
    assert all(r["id"] >= 12 for r in out)
    dists = [r["dist_euclidean"] for r in out]
    assert dists == sorted(dists)
