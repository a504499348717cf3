"""Scale probe for the late-r10 operators: sequence_pack, line_dedup,
bpe_token_count at sf0.1 (5k docs) vs the tiled sf1.0 (50k docs).

Evidence question: do the new ops keep the linear, shuffle-light shape
their docstrings claim across a decade? Writes results to
/tmp/new_ops_scale.txt (Spark stderr progress bars corrupt grep
filters — the standing file-output rule).

Run exclusively (no concurrent Spark work):
  python scripts/new_ops_scale_probe.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/tmp/new_ops_scale.txt"
RUNS = 3


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as E

    out = open(OUT, "w", buffering=1)
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    for sf_dir in ["/root/testdata/sf0.1", "/root/repo/.scaling/sf1.0"]:
        for name in ["sequence_pack", "line_dedup", "bpe_token_count"]:
            times = []
            for _ in range(RUNS):
                t0 = time.monotonic()
                df = qs[name](spark, sf_dir)
                n = df.write.format("noop").mode("overwrite").save()
                times.append(time.monotonic() - t0)
            rows = qs[name](spark, sf_dir).count()
            print(
                f"PROBE {sf_dir.split('/')[-1]} {name} "
                f"best={min(times):.2f}s all={[round(t, 2) for t in times]} "
                f"rows={rows}",
                file=out,
            )
    print("DONE", file=out)
    spark.stop()


if __name__ == "__main__":
    main()
