"""Recall floors for the approximate search paths, on a clustered corpus
(the regime real embeddings live in — see scripts/ann_recall.py, whose
SCALING.md table also covers the adversarial uniform-random testdata).

These floors are the contract behind the 100-TB story: IVF reads ~12% of
the data and must keep >= 0.9 of brute-force recall@10; multi-probe
sign-bit LSH reads ~15% and must keep its measured floor. Margins are ~5
points under the measured means (0.987 / 0.73) so real regressions fail
but sampling noise doesn't."""

from __future__ import annotations

import pytest

from pg_vectorize_spark.operators.ann import (
    assign_ivf_cells,
    brute_force_topk,
    ivf_topk,
    signbit_lsh_topk,
    train_ivf_centroids_kmeans,
)

N_QUERIES = 8
K = 10


@pytest.fixture(scope="module")
def clustered(spark):
    import sys

    sys.path.insert(0, "/root/repo")
    from scripts.ann_recall import clustered_vectors

    emb = spark.createDataFrame(
        clustered_vectors(), "vec_id long, embedding array<double>"
    )
    emb.cache().count()
    queries = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(f"vec_id % {2000 // N_QUERIES} = 0")
        .orderBy("vec_id")
        .limit(N_QUERIES)
        .collect()
    ]
    exact = [
        {
            r["vec_id"]
            for r in brute_force_topk(
                emb, "vec_id", "embedding", qv, K
            ).collect()
        }
        for qv in queries
    ]
    return emb, queries, exact


def _mean_recall(queries, exact, run):
    total = 0.0
    for qv, truth in zip(queries, exact):
        got = {r["vec_id"] for r in run(qv).collect()}
        total += len(truth & got) / K
    return total / len(queries)


def test_ivf_recall_floor(spark, clustered):
    emb, queries, exact = clustered
    cents = train_ivf_centroids_kmeans(
        emb, "vec_id", "embedding", n_centroids=16, seed=42
    )
    cents.cache().count()
    assigned = assign_ivf_cells(emb, cents, "vec_id", "embedding")
    assigned.cache().count()
    recall = _mean_recall(
        queries,
        exact,
        lambda qv: ivf_topk(
            emb, cents, "vec_id", "embedding", qv, k=K,
            nprobe=2, assigned_df=assigned,
        ),
    )
    assert recall >= 0.9, f"IVF nprobe=2 recall@10 fell to {recall:.3f}"


def test_multiprobe_lsh_recall_floor(spark, clustered):
    emb, queries, exact = clustered
    recall = _mean_recall(
        queries,
        exact,
        lambda qv: signbit_lsh_topk(
            emb, "vec_id", "embedding", qv, k=K, nbits=8, probe_hamming=3
        ),
    )
    single = _mean_recall(
        queries,
        exact,
        lambda qv: signbit_lsh_topk(
            emb, "vec_id", "embedding", qv, k=K, nbits=8, probe_hamming=0
        ),
    )
    assert recall >= 0.6, f"multi-probe LSH recall@10 fell to {recall:.3f}"
    # multi-probe must actually buy recall over the single bucket
    assert recall > single
