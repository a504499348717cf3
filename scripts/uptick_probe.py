"""Standalone best-of-5 adjudication probe for r10 driver upticks
(VERDICT r10 wrong #2 / BENCH_NOTES adjudication rule: a driver
delta that clears its recorded spread gets a standalone best-of-5 on
a quiet box before it counts as a regression).

Runs each flagged gate best-of-5 with the bench harness's noop-sink
form and writes ONE JSON object to /tmp/uptick_probe.json (progress
bars corrupt stdout grep — standing probe rule).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

# r12 adjudication set (VERDICT r11 wrong #1): driver-to-driver
# upticks that cleared their recorded r11 spreads.
GATES = [
    "knn_join",      # driver 1.09 -> 1.38 s (+26%, spread 0.197)
    "token_count",   # 0.30 -> 0.36 (+21%, spread 0.19)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("uptick-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # untimed warmup (bench.py pattern) — a neutral gate, NOT one
    # under adjudication, so the first measured run of each flagged
    # gate still pays only the usual warm-session cost
    qs["change_detection"](spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()

    out: dict = {}
    for name in GATES:
        runs = []
        for _ in range(5):
            t0 = time.monotonic()
            qs[name](spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            runs.append(round(time.monotonic() - t0, 3))
        best = min(runs)
        out[name] = {
            "best": best,
            "runs": runs,
            "spread": round((max(runs) - best) / best, 3),
        }
    with open("/tmp/uptick_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
