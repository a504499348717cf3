"""ANN recall harness: recall@k of the approximate search paths
(ivf_topk, signbit_lsh_topk) against brute_force_topk ground truth.

Usage: python scripts/ann_recall.py [sf_dir] [n_queries]

Prints a markdown table (paste into SCALING.md) of mean recall@10 and
mean candidate-set fraction per configuration — the evidence that the
bucketed paths trade a bounded, measured amount of recall for their scan
pruning. Query vectors are the first ``n_queries`` corpus vectors by
vec_id (deterministic).
"""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def mean_recall(spark, emb, queries, approx_fn, k=10):
    """approx_fn(query_vec) -> DataFrame with vec_id column."""
    from pg_vectorize_spark.operators.ann import brute_force_topk

    total = 0.0
    cand_frac = 0.0
    n_corpus = emb.count()
    for qv in queries:
        exact = {
            r["vec_id"]
            for r in brute_force_topk(emb, "vec_id", "embedding", qv, k).collect()
        }
        approx_df, n_cand = approx_fn(qv)
        got = {r["vec_id"] for r in approx_df.collect()}
        total += len(exact & got) / k
        cand_frac += n_cand / n_corpus
    return total / len(queries), cand_frac / len(queries)


def clustered_vectors(n_clusters=50, per_cluster=40, dim=64, noise=0.15, seed=7):
    """Deterministic clustered corpus: unit cluster centers + gaussian
    noise, re-normalized. The structure real text/image embeddings have —
    and the regime ANN indexes are designed for (the uniform-random
    testdata embeddings are the adversarial no-structure case)."""
    import numpy as np

    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(n_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    pts = np.repeat(centers, per_cluster, axis=0) + noise * rng.normal(
        size=(n_clusters * per_cluster, dim)
    )
    pts /= np.linalg.norm(pts, axis=1, keepdims=True)
    return [(i, [float(x) for x in row]) for i, row in enumerate(pts)]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_queries = int(sys.argv[2]) if len(sys.argv) > 2 else 15

    from pyspark.sql import SparkSession

    from pg_vectorize_spark.operators.ann import (
        assign_ivf_cells,
        brute_force_topk,
        ivf_topk,
        signbit_bucket_expr,
        signbit_lsh_topk,
        train_ivf_centroids_kmeans,
    )

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir == "clustered":
        emb = spark.createDataFrame(
            clustered_vectors(), "vec_id long, embedding array<double>"
        )
    else:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
            "vec_id", "embedding"
        )
    n_corpus = emb.cache().count()
    stride = max(1, n_corpus // n_queries)  # spread queries across the corpus
    queries = [
        [float(x) for x in r["embedding"]]
        for r in emb.filter(F.col("vec_id") % stride == 0)
        .orderBy("vec_id")
        .limit(n_queries)
        .collect()
    ]

    print(f"## ANN recall@10 ({sf_dir}, {n_queries} queries)\n")
    print("| path | params | mean recall@10 | mean candidate frac |")
    print("|---|---|---|---|")

    for n_centroids in (8, 16):
        cents = train_ivf_centroids_kmeans(
            emb, "vec_id", "embedding", n_centroids=n_centroids, seed=42
        )
        cents.cache().count()
        assigned = assign_ivf_cells(emb, cents, "vec_id", "embedding")
        assigned.cache().count()
        cell_sizes = {
            r["cell"]: r["n"]
            for r in assigned.groupBy("cell").agg(F.count("*").alias("n")).collect()
        }
        for nprobe in (1, 2, 4):

            def ivf(qv, _c=cents, _a=assigned, _np=nprobe):
                # candidate count = sum of probed cell sizes
                probed = (
                    _c.select(
                        "centroid_id",
                        F.aggregate(
                            F.zip_with(
                                F.col("centroid_vec"),
                                F.array(*[F.lit(x) for x in qv]),
                                lambda a, b: a * b,
                            ),
                            F.lit(0.0),
                            lambda acc, x: acc + x,
                        ).alias("_d"),
                    )
                    .orderBy(F.desc("_d"), F.asc("centroid_id"))
                    .limit(_np)
                    .collect()
                )
                n_cand = sum(cell_sizes.get(r["centroid_id"], 0) for r in probed)
                return (
                    ivf_topk(
                        emb, _c, "vec_id", "embedding", qv,
                        nprobe=_np, assigned_df=_a,
                    ),
                    n_cand,
                )

            r, cf = mean_recall(spark, emb, queries, ivf)
            print(
                f"| ivf_topk | n_centroids={n_centroids} nprobe={nprobe} "
                f"| {r:.3f} | {cf:.3f} |"
            )

    from pg_vectorize_spark.operators.ann import _hamming_ball

    for nbits, probe in ((4, 0), (6, 0), (8, 0), (8, 1), (8, 2), (8, 3)):
        bucketed = emb.withColumn(
            "_bkt", signbit_bucket_expr(F.col("embedding"), nbits)
        )
        bucketed.cache().count()
        bucket_sizes = {
            r["_bkt"]: r["n"]
            for r in bucketed.groupBy("_bkt").agg(F.count("*").alias("n")).collect()
        }

        def lsh(qv, _nb=nbits, _h=probe, _sizes=bucket_sizes):
            from pg_vectorize_spark.operators.ann import query_signbit_bucket

            qb = query_signbit_bucket(qv, _nb)
            n_cand = sum(
                _sizes.get(b, 0) for b in _hamming_ball(qb, _nb, _h)
            )
            return (
                signbit_lsh_topk(
                    emb, "vec_id", "embedding", qv, nbits=_nb,
                    probe_hamming=_h,
                ),
                n_cand,
            )

        r, cf = mean_recall(spark, emb, queries, lsh)
        print(
            f"| signbit_lsh_topk | nbits={nbits} probe_hamming={probe} "
            f"| {r:.3f} | {cf:.3f} |"
        )


if __name__ == "__main__":
    main()
