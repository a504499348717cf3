"""In-process interleaved A/B for the MinHash probe's lazy-fused
checkpoints (r13 optimization round). One Spark session, one prebuilt
index; variants ALTERNATE probe-by-probe so box drift hits both
equally:

- variant "eager": DataFrame.localCheckpoint monkeypatched to force
  eager=True — byte-for-byte the pre-change probe behavior (the change
  is exactly eager->lazy at the three probe-path checkpoint sites).
- variant "lazy": the shipped code path.

Asserts identical result rows between variants before reporting
timings. Reports best / median per variant plus per-probe job counts.

Usage: python scripts/probe_lazy_ab.py  [N_ROUNDS=10]
"""

from __future__ import annotations

import os
import statistics
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def main() -> None:
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("probe-lazy-ab")
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

    # Spark 4: pyspark.sql.DataFrame is the abstract base; classic-mode
    # instances are pyspark.sql.classic.dataframe.DataFrame which
    # OVERRIDES localCheckpoint — patch the concrete class.
    from pyspark.sql.classic.dataframe import DataFrame as ClassicDF

    orig_lc = ClassicDF.localCheckpoint

    def eager_lc(self, eager=True):  # force the pre-change behavior
        return orig_lc(self, eager=True)

    tracker = spark.sparkContext.statusTracker()
    n_rounds = int(os.environ.get("N_ROUNDS", "10"))

    with tempfile.TemporaryDirectory() as root:
        mgr = MinHashBandIndexManager(
            spark,
            os.path.join(root, "idx"),
            {"num_hashes": 16, "bands": 4, "shingle_k": 3},
        )
        mgr.build(corpus, "doc_id", "text")

        def run_probe():
            before = set(tracker.getJobIdsForGroup(None) or [])
            t0 = time.time()
            rows = sorted(
                (r[0], r[1], r[2].hex())
                for r in mgr.probe(batch, "doc_id", "text").collect()
            )
            dt = time.time() - t0
            jobs = len(set(tracker.getJobIdsForGroup(None) or []) - before)
            return dt, jobs, rows

        run_probe()  # warmup (listing caches, codegen)
        ref_rows = None
        times: dict[str, list[float]] = {"eager": [], "lazy": []}
        jobs: dict[str, set[int]] = {"eager": set(), "lazy": set()}
        for i in range(n_rounds):
            for variant in ("eager", "lazy") if i % 2 == 0 else ("lazy", "eager"):
                if variant == "eager":
                    ClassicDF.localCheckpoint = eager_lc
                try:
                    dt, nj, rows = run_probe()
                finally:
                    ClassicDF.localCheckpoint = orig_lc
                if ref_rows is None:
                    ref_rows = rows
                assert rows == ref_rows, f"variant {variant} rows diverged"
                times[variant].append(dt)
                jobs[variant].add(nj)
        for v in ("eager", "lazy"):
            ts = sorted(times[v])
            print(
                f"{v}: best {ts[0]:.3f}s median {statistics.median(ts):.3f}s "
                f"mean {statistics.mean(ts):.3f}s jobs {sorted(jobs[v])} "
                f"runs {[round(t, 3) for t in ts]}"
            )
    spark.stop()


if __name__ == "__main__":
    main()
