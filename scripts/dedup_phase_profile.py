"""Phase-level timing of the ingest dedup filter + upsert for one
micro-batch stream: where do the seconds go (filter probe vs embed vs
snapshot merges vs band-index maintenance), local path vs Spark path.

python scripts/dedup_phase_profile.py [sf_dir] [local_max_rows]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_BATCHES = 6
PER_BATCH = 200


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    local_max = int(sys.argv[2]) if len(sys.argv) > 2 else 8192

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("dedup-phase-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.engine import VectorizeSession

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select(F.col("doc_id").alias("id"), F.col("text").alias("content"))
        .filter(F.col("id") < N_BATCHES * PER_BATCH)
        .collect()
    )

    root = tempfile.mkdtemp(prefix="pvs_phase_")
    try:
        src = f"{root}/src"
        spark.createDataFrame([], "id bigint, content string").write.parquet(
            src
        )
        sess = VectorizeSession(spark, workspace=f"{root}/ws")
        sess.create_job(
            "rt",
            src,
            columns=["content"],
            primary_key="id",
            run_initial_load=False,
            dedup_params={
                "min_jaccard": 0.7,
                "local_max_rows": local_max,
            },
        )
        job = sess.catalog.get("rt")
        emb_ds = sess._emb_ds("rt")
        for i in range(N_BATCHES):
            rows = docs[i * PER_BATCH : (i + 1) * PER_BATCH]
            bdf = spark.createDataFrame(
                rows, "id bigint, content string"
            ).localCheckpoint()
            t0 = time.time()
            prior = None
            if emb_ds.exists():
                keys = bdf.select("id")
                prior = (
                    emb_ds.read_for_keys(keys, "id")
                    .join(keys, "id", "left_semi")
                    .select("id")
                    .localCheckpoint()
                )
            t1 = time.time()
            changed, sigs = sess._dedup_filter_new(
                job, bdf, prior_keys=prior
            )
            changed = changed.localCheckpoint()
            t2 = time.time()
            embedded = sess._embed_changed(
                job, changed, api_key=None, with_tokens=False
            )
            t3 = time.time()
            emb_ds.merge_upsert(embedded.drop("search_tokens"), "id")
            t4 = time.time()
            sess._dedup_upsert(job, changed, sigs=sigs)
            t5 = time.time()
            print(
                f"batch {i}: prior={t1-t0:.2f} filter={t2-t1:.2f} "
                f"embed={t3-t2:.2f} emb_merge={t4-t3:.2f} "
                f"dedup_upsert={t5-t4:.2f} total={t5-t0:.2f}"
            )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
