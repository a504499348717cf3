"""Per-micro-batch cost of the ingest-time quality gate (late r10): A/B
of the realtime file-stream pipeline with curate_params off vs on (all
five rules enabled), same batches — the freshness-budget number for
SCALING.md (sibling of scripts/dedup_stream_cost.py).

python scripts/curate_stream_cost.py [sf_dir]   # default sf0.1
Writes results to /tmp/curate_stream_cost.txt (the file-output rule).
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile

sys.path.insert(0, "/root/repo")

N_BATCHES = 6
PER_BATCH = 200
OUT = "/tmp/curate_stream_cost.txt"


def _percentile(vals, p):
    s = sorted(vals)
    idx = min(len(s) - 1, max(0, int(round(p / 100.0 * (len(s) - 1)))))
    return s[idx]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = open(OUT, "w", buffering=1)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("curate-stream-cost")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.engine import VectorizeSession
    from pg_vectorize_spark.streaming.incremental import RealtimePipeline

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        F.col("doc_id").alias("id"), F.col("text").alias("content")
    )
    docs = docs.filter(F.col("id") < N_BATCHES * PER_BATCH)

    gate = {
        "min_tokens": 5,
        "max_tokens": 100_000,
        "min_quality": 0.2,
        "langs": ["en", "de", "fr", "es", "unknown"],
        "require_c4": False,
    }
    for label, curate in [("off", None), ("on", gate)]:
        root = tempfile.mkdtemp(prefix=f"pvs_csc_{label}_")
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
                curate_params=curate,
            )
            for i in range(N_BATCHES):
                docs.filter(
                    (F.col("id") >= i * PER_BATCH)
                    & (F.col("id") < (i + 1) * PER_BATCH)
                ).coalesce(1).write.mode("append").parquet(feed)
            pipe = RealtimePipeline(sess, "rt", max_files_per_trigger=1)
            q = pipe.start(source_dir=feed, available_now=True)
            q.awaitTermination(600)
            durs = []
            for prog in q.recentProgress:
                p = json.loads(prog.json) if hasattr(prog, "json") else prog
                if p.get("numInputRows", 0) > 0:
                    durs.append(
                        p["durationMs"]["triggerExecution"] / 1000.0
                    )
            n_ing = sess._emb_ds("rt").read().count()
            print(
                f"curate={label}: p50={_percentile(durs, 50):.2f}s "
                f"p95={_percentile(durs, 95):.2f}s n_batches={len(durs)} "
                f"rows_ingested={n_ing}",
                file=out,
            )
        finally:
            shutil.rmtree(root, ignore_errors=True)
    print("DONE", file=out)
    spark.stop()


if __name__ == "__main__":
    main()
