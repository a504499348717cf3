"""Job-count + equality probe for the MinHash index probe path (C1:
lazy-fused checkpoints). Builds a small index, runs probe(), and reports
(a) how many Spark jobs the probe's construction + one consumption
launches, (b) that the result rows are identical to a reference
computation. Run from a tree to compare before/after.

Usage: python scripts/probe_jobs_probe.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("probe-jobs")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 20 != 7)
    batch = docs.filter(F.col("doc_id") % 20 == 7)

    with tempfile.TemporaryDirectory() as root:
        mgr = MinHashBandIndexManager(
            spark,
            os.path.join(root, "idx"),
            {"num_hashes": 16, "bands": 4, "shingle_k": 3},
        )
        mgr.build(corpus, "doc_id", "text")

        tracker = spark.sparkContext.statusTracker()
        # warmup probe (absorbs listing caches)
        mgr.probe(batch, "doc_id", "text").collect()

        n_runs = int(os.environ.get("N_RUNS", "5"))
        bests = []
        for i in range(n_runs):
            before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            out = mgr.probe(batch, "doc_id", "text")
            t_construct = time.time() - t0
            mid = set(tracker.getJobIdsForGroup(None) or [])
            rows = sorted(
                (r[0], r[1], r[2].hex()) for r in out.collect()
            )
            t_total = time.time() - t0
            after = set(tracker.getJobIdsForGroup(None) or [])
            bests.append((t_total, t_construct, len(mid - before), len(after - before), len(rows)))
        bests.sort()
        t_total, t_construct, jobs_construct, jobs_total, n = bests[0]
        print(
            f"PROBE best total {t_total:.3f}s construct {t_construct:.3f}s "
            f"jobs_construct {jobs_construct} jobs_total {jobs_total} rows {n}"
        )
        # stable fingerprint of the result for before/after equality
        import hashlib

        h = hashlib.md5()
        out = mgr.probe(batch, "doc_id", "text")
        for r in sorted((r[0], r[1], r[2].hex()) for r in out.collect()):
            h.update(str(r).encode())
        print("RESULT_MD5", h.hexdigest())
    spark.stop()


if __name__ == "__main__":
    main()
