"""GIN-fastupdate crossover measurement (VERDICT r7 #6): decide the
``fts_params={"fastupdate": ...}`` default with numbers.

The pending-list path makes each update/delete batch O(batch) — one
tombstone merge + one pending merge, zero main-bucket rewrites — at the
price of an overlay on EVERY probe (main minus tombstoned keys, union
pending) until the op-count compaction folds it in. The default path
pays a bucket-local rewrite per batch and keeps probes overlay-free.
So the tradeoff is write-amplification vs read-amplification, and the
right default depends on the read/write ratio:

  breakeven probes-per-batch = (t_upsert_default - t_upsert_fast)
                             / (t_probe_overlay - t_probe_plain)

Workload: B batches re-writing the SAME U keys (the update-heavy
realtime shape the pending list exists for), alternating text variants
so every batch genuinely changes terms; probes use the bench 5-term
query. Identical key/term sequences in both modes.

python scripts/fts_fastupdate_probe.py [sf_dir]   # default sf0.1
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

N_BATCHES = 8
N_KEYS = 200


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("fts-fastupdate-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from pg_vectorize_spark.fts_index import JobFtsIndexManager
    from pg_vectorize_spark.functions import text as T

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    upd_keys = docs.filter(F.col("doc_id") < N_KEYS)

    def variant_tokens(batch: int):
        """Tokens for the update keys at batch state `batch` (-1 = the
        as-built state); each batch flips the marker word so terms
        really change and both old and new buckets get touched."""
        if batch < 0:
            return upd_keys.select(
                "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
            )
        return upd_keys.select(
            "doc_id",
            T.tokens_expr(
                F.concat(F.col("text"), F.lit(f" updmarker{batch % 2}"))
            ).alias("search_tokens"),
        )

    results = {}
    for mode, params in [
        ("default", {"term_buckets": 64}),
        ("fastupdate", {"term_buckets": 64, "fastupdate": True}),
    ]:
        idx_dir = tempfile.mkdtemp(prefix=f"pvs_fup_{mode}_")
        shutil.rmtree(idx_dir, ignore_errors=True)
        mgr = JobFtsIndexManager(spark, idx_dir, params)
        mgr.build(
            docs.select(
                "doc_id", T.tokens_expr(F.col("text")).alias("search_tokens")
            ),
            "doc_id",
        )

        upsert_times = []
        for b in range(N_BATCHES):
            new_t = variant_tokens(b).localCheckpoint()
            old_t = variant_tokens(b - 1).localCheckpoint()
            t0 = time.time()
            mgr.upsert(new_t, "doc_id", old_t)
            upsert_times.append(time.time() - t0)

        def probe_time(n=5):
            best = float("inf")
            for _ in range(n):
                t0 = time.time()
                mgr.probe(entrymod.QUERY_TERMS).write.format("noop").mode(
                    "overwrite"
                ).save()
                best = min(best, time.time() - t0)
            return best

        t_probe_pre = probe_time()  # fastupdate: overlay live
        t0 = time.time()
        folded = mgr.maybe_compact(force=True)
        t_fold = time.time() - t0
        t_probe_post = probe_time()  # overlay folded away

        results[mode] = {
            "upsert_total": sum(upsert_times),
            "upsert_mean": sum(upsert_times) / len(upsert_times),
            "probe_pre_fold": t_probe_pre,
            "fold": t_fold,
            "probe_post_fold": t_probe_post,
            "folded_parts": folded,
        }
        print(f"{mode}: {results[mode]}")
        shutil.rmtree(idx_dir, ignore_errors=True)

    d, f = results["default"], results["fastupdate"]
    save_per_batch = d["upsert_mean"] - f["upsert_mean"]
    overlay_cost = f["probe_pre_fold"] - f["probe_post_fold"]
    print(
        f"\nn_docs={n_docs} batches={N_BATCHES} keys/batch={N_KEYS}\n"
        f"write saving/batch (default-fast): {save_per_batch:.2f} s\n"
        f"probe overlay cost: {overlay_cost:.3f} s\n"
        f"fold cost (amortized over compact_every batches): "
        f"{f['fold']:.2f} s"
    )
    if overlay_cost > 1e-3:
        print(
            f"breakeven probes per update batch: "
            f"{save_per_batch / overlay_cost:.1f}"
        )
    print("\nmarkdown:\n")
    print(
        "| mode | upsert mean/batch | probe (overlay) | probe (folded) "
        "| force-fold |"
    )
    print("|---|---|---|---|---|")
    for mode in ("default", "fastupdate"):
        r = results[mode]
        print(
            f"| {mode} | {r['upsert_mean']:.2f} s | "
            f"{r['probe_pre_fold']:.3f} s | {r['probe_post_fold']:.3f} s | "
            f"{r['fold']:.2f} s |"
        )
    spark.stop()


if __name__ == "__main__":
    main()
