"""Band-bucket sizing for the MinHash band index (VERDICT r8 #3).

The probe prunes its index scan to the buckets the batch's band keys
hash into — but a micro-batch's band rows (batch x bands distinct
(band, band_key) values) can occupy most of a small bucket space, at
which point "pruned" degrades to a full columnar scan of the band
index (the hot-term FTS convergence argument, here measured). This
script quantifies that: for band_buckets in {64, 256, 1024}, build the
index over the sf1.0 corpus (ONE shared signature computation), then
probe with batch sizes {50, 200, 1000} and report seconds + the
occupied-bucket fraction the PartitionFilters IN list actually keeps.

python scripts/band_bucket_sizing.py [sf_dir]   # default .scaling/sf1.0
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

BUCKET_GRID = (64, 256, 1024)
BATCH_SIZES = (50, 200, 1000)
PARAMS = {"num_hashes": 16, "bands": 4, "shingle_k": 3}


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaling/sf1.0"

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("band-bucket-sizing")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    n_corpus = docs.count()
    # fixed probe batches drawn from OUTSIDE the corpus keyspace (suffix
    # marker makes them near-dup probes, not exact re-scans)
    max_batch = max(BATCH_SIZES)
    probe_pool = (
        docs.limit(max_batch)
        .select(
            (F.col("doc_id") + 10_000_000).alias("doc_id"),
            F.concat_ws(" ", F.col("text"), F.lit("probe marker")).alias(
                "text"
            ),
        )
        .localCheckpoint()
    )
    print(f"corpus={n_corpus} docs ({sf_dir})", flush=True)

    # one signature computation shared across all three builds
    ref_mgr = MinHashBandIndexManager(
        spark, tempfile.mkdtemp(prefix="bbs_sig_"), {**PARAMS,
                                                     "band_buckets": 64}
    )
    t0 = time.time()
    corpus_sigs = ref_mgr.signatures(docs, "doc_id", "text").localCheckpoint()
    corpus_sigs.count()
    print(f"corpus signatures: {time.time() - t0:.1f}s", flush=True)

    print(
        f"{'buckets':>8} {'build_s':>8} {'batch':>6} {'probe_s':>8} "
        f"{'occupied':>9} {'frac':>6} {'pairs':>7}",
        flush=True,
    )
    for nb in BUCKET_GRID:
        mgr = MinHashBandIndexManager(
            spark,
            tempfile.mkdtemp(prefix=f"bbs_{nb}_"),
            {**PARAMS, "band_buckets": nb},
        )
        t0 = time.time()
        mgr.build(docs, "doc_id", "text", sigs=corpus_sigs)
        build_s = time.time() - t0
        for bs in BATCH_SIZES:
            batch = probe_pool.limit(bs).localCheckpoint()
            batch_sigs = mgr.signatures(
                batch, "doc_id", "text"
            ).localCheckpoint()
            occupied = (
                mgr._band_rows(batch_sigs, "doc_id")
                .select(mgr.PART_COL)
                .distinct()
                .count()
            )
            # warm + timed probe (best of 2, reusing precomputed sigs so
            # the timing isolates the INDEX-side cost)
            times = []
            for _ in range(2):
                t0 = time.time()
                n_pairs = mgr.probe(
                    batch, "doc_id", "text", sigs=batch_sigs
                ).count()
                times.append(time.time() - t0)
            print(
                f"{nb:>8} {build_s:>8.1f} {bs:>6} {min(times):>8.2f} "
                f"{occupied:>9} {occupied / nb:>6.2f} {n_pairs:>7}",
                flush=True,
            )
        mgr.drop()


if __name__ == "__main__":
    main()
