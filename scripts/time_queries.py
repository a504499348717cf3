"""Standalone best-of-N timer for a subset of registry queries.

Usage: python scripts/time_queries.py q1 [q2 ...]
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1),
     SPARK_GRAFT_CPUS (default 32), N_RUNS (default 5).
Same methodology as bench.py: noop sink, best-of-N, untimed warmup.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    n_runs = int(os.environ.get("N_RUNS", "5"))

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{cpus}]")
        .config("spark.sql.shuffle.partitions", cpus)
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("time-queries")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    qs["token_count"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    for name in names:
        fn = qs[name]
        runs = []
        for _ in range(n_runs):
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        best = min(runs)
        spread = (max(runs) - best) / best if best else 0.0
        print(
            f"TIMING {name}: best {best:.3f}s spread {spread:.2f} "
            f"runs {[round(r, 3) for r in runs]}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
