"""Second/fourth-decade rows for the r12 gates (VERDICT r11 #5 + the
new-gate decade bar): corpus_to_shards at sf1.0 vs sf10 (the composite's
missing second decade — expected growing term: banded-dedup pair
density), and fts_multilang_stemmed (per-row expression analyzer —
expect ~linear scan-bound). curate_job_search_e2e is workspace-cached
by design (repeated invocations time the QUERY path), so its decade
story is job_hybrid_e2e's; it is probed at sf1.0 only for a sanity row.

Run exclusively. Writes /tmp/r12_sf10_ops.txt (standing probe rule).
Prereq: scripts/make_scaling_sf10.py (gitignored ~1.2 GB).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r12_sf10_ops.txt"
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

    plan = [
        ("/root/repo/.scaling/sf1.0", ["corpus_to_shards",
                                       "fts_multilang_stemmed",
                                       "curate_job_search_e2e"]),
        ("/root/repo/.scaling/sf10", ["corpus_to_shards",
                                      "fts_multilang_stemmed"]),
    ]
    for sf_dir, gates in plan:
        for gate in gates:
            times = []
            for _ in range(RUNS):
                t0 = time.monotonic()
                qs[gate](spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                times.append(time.monotonic() - t0)
            print(
                f"PROBE {sf_dir.rstrip('/').split('/')[-1]} {gate} "
                f"best={min(times):.2f}s "
                f"all={[round(t, 2) for t in times]}",
                file=out,
            )
    out.close()


if __name__ == "__main__":
    main()
