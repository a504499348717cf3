"""Phase-level timing of one CDF micro-batch with deletes (VERDICT r10
#1): where do the seconds go when a batch carries inserts AND deletes
— event prep, guard probes, per-family combined writes, index
maintenance. Mirrors stream_batch_size_sweep.py's dedup-on cell
(local path, 200-row batches, 10% deletes of the prior batch).

python scripts/cdf_phase_profile.py [docs_parquet] [per_batch]
Writes /tmp/cdf_phase_profile.json (standing probe rule: progress bars
corrupt stdout).
"""

from __future__ import annotations

import functools
import json
import shutil
import sys
import tempfile
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

N_BATCHES = 6

PHASES: dict[str, list[float]] = defaultdict(list)


def timed(name):
    def deco(fn):
        @functools.wraps(fn)
        def wrap(*a, **k):
            t0 = time.monotonic()
            try:
                return fn(*a, **k)
            finally:
                PHASES[name].append(time.monotonic() - t0)

        return wrap

    return deco


def main() -> None:
    docs_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/repo/.scaling/sf1.0/documents.parquet"
    )
    per_batch = int(sys.argv[2]) if len(sys.argv) > 2 else 200

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("cdf-phase-profile")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pg_vectorize_spark.engine as eng
    import pg_vectorize_spark.streaming.incremental as inc
    from pg_vectorize_spark.engine import VectorizeSession
    from pg_vectorize_spark.sources import parquet_snapshot as snap

    # --- instrument the seams ------------------------------------------
    VS = VectorizeSession
    VS._curate_filter = timed("curate_filter")(VS._curate_filter)
    VS._dedup_filter_new = timed("dedup_filter")(VS._dedup_filter_new)
    VS._embed_changed = timed("embed")(VS._embed_changed)
    VS._dedup_upsert = timed("dedup_upsert")(VS._dedup_upsert)
    VS._dedup_delete = timed("dedup_delete")(VS._dedup_delete)
    VS._tokens_upsert = timed("tokens_upsert_total")(VS._tokens_upsert)
    VS._tokens_delete = timed("tokens_delete")(VS._tokens_delete)
    VS._fts_delete = timed("fts_delete")(VS._fts_delete)
    VS._index_upsert = timed("index_upsert")(VS._index_upsert)
    VS._index_delete = timed("index_delete")(VS._index_delete)
    BS = snap.BucketedSnapshotDataset
    BS.merge_upsert = timed("snap_merge_upsert")(BS.merge_upsert)
    BS.delete_keys = timed("snap_delete_keys")(BS.delete_keys)
    BS.append_rows = timed("snap_append_rows")(BS.append_rows)
    BS.read_for_keys = timed("snap_read_for_keys")(BS.read_for_keys)

    from pg_vectorize_spark import fts_index as fidx

    FM = fidx.JobFtsIndexManager
    FM.overlay_ingest = timed("fts_overlay_ingest")(FM.overlay_ingest)
    FM.add = timed("fts_add")(FM.add)
    FM.upsert = timed("fts_upsert")(FM.upsert)
    FM.delete = timed("fts_index_delete")(FM.delete)
    FM.delete_with_tokens = timed("fts_index_delete")(
        FM.delete_with_tokens
    )
    FM.maybe_compact = timed("fts_compact")(FM.maybe_compact)

    from pg_vectorize_spark import dedup_index as didx

    DM = didx.MinHashBandIndexManager
    DM.upsert_local = timed("band_upsert_local")(DM.upsert_local)
    DM.upsert = timed("band_upsert")(DM.upsert)
    DM.delete = timed("band_delete")(DM.delete)
    DM.maybe_compact = timed("band_compact")(DM.maybe_compact)

    # whole apply + the CDF prep around it
    CF = inc.ChangeFeedPipeline
    CF.process_batch = timed("process_batch_total")(CF.process_batch)
    RP = inc.RealtimePipeline
    RP._apply_batch = timed("apply_batch")(RP._apply_batch)

    all_docs = spark.read.parquet(docs_path).select(
        F.col("doc_id").alias("id"), F.col("text").alias("content")
    )
    docs = all_docs.filter(
        F.col("id") < N_BATCHES * per_batch
    ).localCheckpoint()

    root = tempfile.mkdtemp(prefix="pvs_cdfprof_")
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
            dedup_params={"min_jaccard": 0.7},
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
                    & (F.col("id") < (i - 1) * per_batch + per_batch // 10)
                ).select(
                    "id",
                    F.lit(None).cast("string").alias("content"),
                    F.lit("delete").alias("_change_type"),
                    F.lit(i).alias("_version"),
                )
                batch = batch.unionByName(dels)
            batch.coalesce(1).write.mode("append").parquet(feed)
        pipe = inc.ChangeFeedPipeline(
            sess, "rt", max_files_per_trigger=1, version_col="_version"
        )
        q = pipe.start(source_dir=feed, available_now=True)
        q.awaitTermination(1200)

        durs = []
        for prog in q.recentProgress:
            p = json.loads(prog.json) if hasattr(prog, "json") else prog
            if p.get("numInputRows", 0) > 0:
                durs.append(p["durationMs"]["triggerExecution"] / 1000.0)
        out = {
            "per_batch_rows": per_batch,
            "trigger_secs": [round(d, 2) for d in durs],
            "phases": {
                k: {
                    "n": len(v),
                    "total": round(sum(v), 2),
                    "per_call": [round(x, 2) for x in v],
                }
                for k, v in sorted(
                    PHASES.items(), key=lambda kv: -sum(kv[1])
                )
            },
        }
        with open("/tmp/cdf_phase_profile.json", "w") as f:
            json.dump(out, f, indent=1)
        print(json.dumps({k: v["total"] for k, v in out["phases"].items()}))
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
