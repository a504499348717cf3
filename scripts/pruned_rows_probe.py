"""Interleaved A/B for the probe-widening row count (r13).

``JobIndexManager._pruned_rows`` is the widening check every
``min_rows`` search pays when ``nprobe < n_centroids`` (the deployed
default: nprobe=4 of 8). Before: a Spark count() job over the pruned
index scan — metadata-only but still a scheduled job on the query
critical path. After: the probed partitions' parquet footers are read
driver-side (``_partition_rows_local``), zero Spark jobs.

This probe builds a deployment-shaped IVF index (nprobe < n_centroids)
at sf0.1 and alternates the two paths WITHIN one session: the local
path as shipped, the Spark path by forcing the fallback. Counts are
asserted equal for every (query, nprobe) first.

Usage: python scripts/pruned_rows_probe.py [sf_dir] [rounds]
"""

from __future__ import annotations

import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

from pg_vectorize_spark.index_manager import JobIndexManager  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("pruned-rows-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").alias("embeddings")
    )
    idx_dir = tempfile.mkdtemp(prefix="pvs_pruned_rows_probe_")
    mgr = JobIndexManager(
        spark, idx_dir, "ivf", {"n_centroids": 8, "nprobe": 4}
    )
    mgr.build(emb, "vec_id")
    queries = [
        [float(x) for x in r["embeddings"]]
        for r in emb.orderBy("vec_id").limit(5).collect()
    ]

    def local_path(qv, nprobe):
        return mgr._pruned_rows(qv, nprobe=nprobe)

    def spark_path(qv, nprobe):
        orig = mgr._partition_rows_local
        mgr._partition_rows_local = lambda *a, **k: None
        try:
            return mgr._pruned_rows(qv, nprobe=nprobe)
        finally:
            mgr._partition_rows_local = orig

    # ---- equality first ----
    for qv in queries:
        for nprobe in (1, 2, 4, 8):
            a = local_path(qv, nprobe)
            b = spark_path(qv, nprobe)
            assert a == b, (nprobe, a, b)
    print("equality: counts identical for 5 queries x 4 widths")

    # ---- interleaved timing: one widening check per call (nprobe=4) ----
    best = {"local": 1e9, "spark": 1e9}
    tot = {"local": 0.0, "spark": 0.0}
    n = 0
    for rnd in range(rounds):
        for name, fn in (("local", local_path), ("spark", spark_path)):
            t0 = time.monotonic()
            for qv in queries:
                fn(qv, 4)
            dt = (time.monotonic() - t0) / len(queries)
            best[name] = min(best[name], dt)
            tot[name] += dt
            print(f"round {rnd} {name}: {dt * 1000:.1f} ms/check")
        n += 1
    print(
        {
            k: f"best {best[k] * 1000:.1f} ms, "
            f"mean {tot[k] / n * 1000:.1f} ms"
            for k in best
        }
    )


if __name__ == "__main__":
    main()
