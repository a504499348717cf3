"""A/B the deferred-delete fold cost: monolithic (full_fold=True, the
r11 behavior and the maintain() knob) vs bucket-sliced cadence folds
(fold_bucket_cap, r12). Builds a band index over the sf1.0 documents,
tombstones a realistic delete set, then times each strategy on twin
copies. Writes ONE JSON object to /tmp/fold_slice_probe.json (standing
probe rule: progress bars corrupt stdout).

python scripts/fold_slice_probe.py [n_docs] [n_tombstones]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 30000
    n_tomb = int(sys.argv[2]) if len(sys.argv) > 2 else 2500

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", "8g")
        .appName("fold-slice-probe")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    from pg_vectorize_spark.dedup_index import MinHashBandIndexManager

    # sf1.0 holds 50k docs; the 10x decade probe (300k) reads sf10
    src_sf = "sf1.0" if n_docs <= 50_000 else "sf10"
    docs = (
        spark.read.parquet(
            f"/root/repo/.scaling/{src_sf}/documents.parquet"
        )
        .select(F.col("doc_id"), F.col("text"))
        .filter(F.col("doc_id") < n_docs)
    )
    root = tempfile.mkdtemp(prefix="pvs_foldslice_")
    out: dict = {"n_docs": n_docs, "n_tombstones": n_tomb}
    try:
        base_dir = os.path.join(root, "base")
        base = MinHashBandIndexManager(spark, base_dir, {})
        base.build(docs, "doc_id", "text")
        base.delete_local(list(range(n_tomb)), "doc_id", "bigint")
        assert len(base._load_tombstones()) == n_tomb

        # A: monolithic fold (full_fold — maintain()/overflow path)
        a_dir = os.path.join(root, "mono")
        shutil.copytree(base_dir, a_dir)
        mono = MinHashBandIndexManager(spark, a_dir, {})
        t0 = time.monotonic()
        mono.maybe_compact(force=True, full_fold=True)
        out["monolithic_secs"] = round(time.monotonic() - t0, 2)
        assert not mono._load_tombstones()

        # B: sliced cadence folds (default fold_bucket_cap)
        b_dir = os.path.join(root, "sliced")
        shutil.copytree(base_dir, b_dir)
        sl = MinHashBandIndexManager(spark, b_dir, {})
        out["fold_bucket_cap"] = sl.fold_bucket_cap
        slices = []
        for _ in range(100):
            if not sl._load_tombstones():
                break
            t0 = time.monotonic()
            sl.maybe_compact(force=True)
            slices.append(round(time.monotonic() - t0, 2))
        assert not sl._load_tombstones()
        out["slice_secs"] = slices
        out["worst_slice_secs"] = max(slices)
        out["n_slices"] = len(slices)
    finally:
        shutil.rmtree(root, ignore_errors=True)
    with open("/tmp/fold_slice_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    os._exit(0)


if __name__ == "__main__":
    main()
