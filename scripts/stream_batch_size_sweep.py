"""Realtime CDF latency at production batch sizes (VERDICT r9 #5): the
100-TB story says per-batch FIXED cost amortizes as batches grow — show
it. Sweeps per-batch rows x {dedup off, dedup on (driver-side local
path), dedup on (Spark path, local_max_rows=0)} through the CDF
changelog pipeline and prints p50/p95 trigger latency per cell.

python scripts/stream_batch_size_sweep.py [docs_parquet] [sizes_csv]
  default docs: /root/repo/.scaling/sf1.0/documents.parquet (50k rows)
  default sizes: 200,1000,5000
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

N_BATCHES = 6


def _pct(vals, p):
    s = sorted(vals)
    idx = min(len(s) - 1, max(0, int(round(p / 100.0 * (len(s) - 1)))))
    return s[idx]


def main() -> None:
    docs_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/repo/.scaling/sf1.0/documents.parquet"
    )
    sizes = [
        int(x)
        for x in (sys.argv[2] if len(sys.argv) > 2 else "200,1000,5000").split(
            ","
        )
    ]

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("stream-batch-size-sweep")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.engine import VectorizeSession
    from pg_vectorize_spark.streaming.incremental import ChangeFeedPipeline

    all_docs = spark.read.parquet(docs_path).select(
        F.col("doc_id").alias("id"), F.col("text").alias("content")
    )

    configs = [
        ("off", None),
        ("on_local", {"min_jaccard": 0.7}),
        ("on_spark", {"min_jaccard": 0.7, "local_max_rows": 0}),
    ]
    for per_batch in sizes:
        docs = all_docs.filter(
            F.col("id") < N_BATCHES * per_batch
        ).localCheckpoint()
        for label, dedup in configs:
            root = tempfile.mkdtemp(prefix=f"pvs_sweep_{label}_")
            try:
                src = f"{root}/src"
                feed = f"{root}/feed"
                docs.filter("id < 0").write.parquet(src)
                sess = VectorizeSession(spark, workspace=f"{root}/ws")
                sess.create_job(
                    "rt",
                    src,
                    columns=["content"],
                    primary_key="id",
                    run_initial_load=False,
                    dedup_params=dedup,
                )
                for i in range(N_BATCHES):
                    batch = docs.filter(
                        (F.col("id") >= i * per_batch)
                        & (F.col("id") < (i + 1) * per_batch)
                    ).select(
                        "id",
                        "content",
                        F.lit("insert").alias("_change_type"),
                        F.lit(i).alias("_version"),
                    )
                    if i > 0:
                        dels = docs.filter(
                            (F.col("id") >= (i - 1) * per_batch)
                            & (
                                F.col("id")
                                < (i - 1) * per_batch + per_batch // 10
                            )
                        ).select(
                            "id",
                            F.lit(None).cast("string").alias("content"),
                            F.lit("delete").alias("_change_type"),
                            F.lit(i).alias("_version"),
                        )
                        batch = batch.unionByName(dels)
                    batch.coalesce(1).write.mode("append").parquet(feed)
                pipe = ChangeFeedPipeline(
                    sess,
                    "rt",
                    max_files_per_trigger=1,
                    version_col="_version",
                )
                q = pipe.start(source_dir=feed, available_now=True)
                q.awaitTermination(1200)
                durs = []
                for prog in q.recentProgress:
                    p = (
                        json.loads(prog.json)
                        if hasattr(prog, "json")
                        else prog
                    )
                    if p.get("numInputRows", 0) > 0:
                        durs.append(
                            p["durationMs"]["triggerExecution"] / 1000.0
                        )
                n_ing = sess._emb_ds("rt").read().count()
                print(
                    f"batch_rows={per_batch} dedup={label}: "
                    f"p50={_pct(durs, 50):.2f}s p95={_pct(durs, 95):.2f}s "
                    f"per_krow_p50={1000 * _pct(durs, 50) / per_batch:.2f}s "
                    f"n_batches={len(durs)} rows_ingested={n_ing}",
                    flush=True,
                )
            finally:
                shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
