"""Fourth-decade rows for the late-r10 training operators (VERDICT r10
#6): sequence_pack, perplexity_buckets, bpe encode (bpe_token_count
gate shape), and sample_weighted at sf1.0 (50k docs) vs the tiled sf10
(500k docs) — the same two-decade bar the index probes meet.

Scaling terms under test (one sentence per op, mirrored in SCALING.md):
- sequence_pack: keyed shuffle into order buckets + per-bucket window +
  driver prefix of 64 bucket totals — expect ~linear.
- perplexity_buckets: per-row LM score + score-range partitioning +
  driver prefix sum over (language x range) cells — expect ~linear.
- bpe encode: broadcast-merges mapInPandas with per-batch word cache —
  per-row map, expect ~linear.
- sample_weighted: per-row race key + TakeOrderedAndProject(k=25) —
  expect ~linear scan-bound.

Run exclusively. Writes /tmp/r11_sf10_ops.txt (standing probe rule).
Prereq: python scripts/make_scaling_sf10.py (gitignored ~1.2 GB).
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

OUT = "/tmp/r11_sf10_ops.txt"
RUNS = 3
GATES = [
    "sequence_pack",
    "perplexity_buckets",
    "bpe_token_count",
    "sample_weighted",
]


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

    for sf_dir in ["/root/repo/.scaling/sf1.0", "/root/repo/.scaling/sf10"]:
        for gate in GATES:
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
