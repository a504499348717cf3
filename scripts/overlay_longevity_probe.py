"""Overlay longevity probe (VERDICT r9 #6): the FTS probe overlays
main∖tombstones∪pending while the overlay lives, and the pending store
is NOT term-bucketed — every probe scans all of it (term-filtered
only). The fold is op-count cadenced (compact_every), so the question
is whether probe cost stays bounded across the longest overlay life the
cadence allows, and how it grows if the cadence is raised.

Builds the index over the sf1.0 corpus (50k docs), turns fastupdate on
with the fold disabled, applies K successive 200-row update batches
(tombstone + pending growth, no fold), and measures probe latency +
overlay size each step.

python scripts/overlay_longevity_probe.py [docs_parquet] [n_batches]
"""

from __future__ import annotations

import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

PER_BATCH = 200


def main() -> None:
    docs_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/root/repo/.scaling/sf1.0/documents.parquet"
    )
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 32

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("overlay-longevity")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.fts_index import JobFtsIndexManager
    from pg_vectorize_spark.functions import text as T

    terms = T.analyze_query("spark window merge batch data")
    docs = (
        spark.read.parquet(docs_path)
        .select("doc_id", "text")
        .localCheckpoint()
    )
    tokens = docs.select(
        "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
    )

    root = tempfile.mkdtemp(prefix="pvs_overlay_lng_")
    try:
        mgr = JobFtsIndexManager(
            spark,
            f"{root}/idx",
            {"fastupdate": True, "compact_every": 10_000},
        )
        mgr.build(tokens, "doc_id")

        def probe_secs() -> float:
            best = float("inf")
            for _ in range(3):
                t0 = time.time()
                mgr.probe_scores(terms).collect()
                best = min(best, time.time() - t0)
            return best

        print(f"baseline (no overlay): probe={probe_secs():.3f}s", flush=True)
        for b in range(n_batches):
            lo, hi = b * PER_BATCH, (b + 1) * PER_BATCH
            upd = docs.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            ).select(
                "doc_id",
                T.tokens_expr(
                    F.concat_ws(" ", F.col("text"), F.lit(f"probe{b}"))
                ).alias("search_tokens"),
            )
            old = tokens.filter(
                (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            )
            mgr.upsert(upd, "doc_id", old)
            if (b + 1) % 4 == 0 or b == 0:
                pend = mgr._pending_ds()
                tomb = mgr._tomb_ds()
                n_pend = pend.read().count() if pend.exists() else 0
                n_tomb = tomb.read().count() if tomb.exists() else 0
                print(
                    f"batches={b + 1} pending_rows={n_pend} "
                    f"tombstones={n_tomb} probe={probe_secs():.3f}s",
                    flush=True,
                )
        t0 = time.time()
        mgr.maybe_compact(force=True)
        fold_s = time.time() - t0
        print(
            f"fold after {n_batches} batches: {fold_s:.2f}s; "
            f"post-fold probe={probe_secs():.3f}s",
            flush=True,
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)
    spark.stop()


if __name__ == "__main__":
    main()
